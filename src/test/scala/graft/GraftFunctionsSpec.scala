package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftFunctions

/** SQL-surface registration: the function library must compose from plain
  * `spark.sql`.
  */
class GraftFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftFunctions.register(s)
    s
  }

  test("goldrush_matchkey works from SQL") {
    val payload =
      """{"marc":{"leader":"01010ccm a2200289   4500","fields":[
        |{"001":"a1"},{"245":{"ind1":"0","ind2":"0","subfields":[{"a":"Symphony, op. 38"}]}}]}}"""
        .stripMargin.replace("\n", "")
    val got = spark.sql(
      s"SELECT goldrush_matchkey('${payload.replace("'", "''")}') AS k")
      .collect().head.getString(0)
    assert(got.startsWith("symphonyop38"))
    assert(got.length > 100)
  }

  test("jsonpath_strings and minhash pipeline from SQL") {
    import spark.implicits._
    Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "zz yy xx ww vv"))
      .toDF("id", "text").createOrReplaceTempView("docs")
    val rows = spark.sql(
      """SELECT id, graft_band_hashes(graft_shingles(text, 3), 8, 4) AS bands
        |FROM docs""".stripMargin).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(byId(1L) == byId(2L), "identical text, identical bands")
    assert(byId(1L) != byId(3L))
    val js = spark.sql(
      """SELECT jsonpath_strings('{"a":{"b":["x","y"]}}', '$.a.b[*]') AS v""")
      .collect().head.getSeq[String](0)
    assert(js == Seq("x", "y"))
  }
}
