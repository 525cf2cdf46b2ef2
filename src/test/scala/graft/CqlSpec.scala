package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cql.Cql
import graft.cql.Cql.{NumberField, TextField}

/** CQL front-end tests (reference query shapes from
  * MainVerticleTest.java:636-1100 cluster/record listings).
  */
class CqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val fields = Map(
    "localId" -> TextField, "sourceId" -> TextField,
    "sourceVersion" -> NumberField)

  private def df = {
    import spark.implicits._
    Seq(("S101", "SRC1", 1), ("S102", "SRC1", 2), ("S103", "SRC2", 1))
      .toDF("localId", "sourceId", "sourceVersion")
  }

  private def ids(q: String): Seq[String] =
    Cql.parse(q, fields)(df).collect().map(_.getString(0)).toSeq

  test("exact equality") { assert(ids("localId = S101") == Seq("S101")) }

  test("quoted term") { assert(ids("localId = \"S101\"") == Seq("S101")) }

  test("and / or / parens") {
    assert(ids("sourceId = SRC1 and sourceVersion = 2") == Seq("S102"))
    assert(ids("localId = S101 or localId = S103").toSet == Set("S101", "S103"))
    assert(ids("(localId = S101 or localId = S102) and sourceVersion = 1") ==
      Seq("S101"))
  }

  test("binary not") {
    assert(ids("sourceId = SRC1 not sourceVersion = 2") == Seq("S101"))
  }

  test("numeric compare") {
    assert(ids("sourceVersion > 1") == Seq("S102"))
    assert(ids("sourceVersion <> 1") == Seq("S102"))
  }

  test("match-all") {
    assert(ids("cql.allRecords = 1").size == 3)
    assert(Cql.parse(null, fields)(df).count() == 3)
  }

  test("sortBy with direction") {
    assert(ids("sourceId = SRC1 sortBy localId/sort.descending") ==
      Seq("S102", "S101"))
    assert(ids("cql.allRecords = 1 sortBy localId") ==
      Seq("S101", "S102", "S103"))
  }

  test("unknown index rejected") {
    assertThrows[IllegalArgumentException] { ids("bogus = 1") }
  }

  test("predicates push down to the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("cqlspec").toString
    df.write.mode("overwrite").parquet(dir)
    val plan = Cql.parse("localId = S101", fields)(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(localId,S101)"), plan)
  }
}
