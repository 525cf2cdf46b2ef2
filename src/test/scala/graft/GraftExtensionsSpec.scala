package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions path: a session created with the extensions
  * class gets the native goldrush_matchkey expression with null semantics
  * and constant folding.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // other suites may have created the shared session (and registered the
    // plain-UDF variant); force a fresh session so the extensions class and
    // the native expression are what resolve here
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // config("spark.sql.extensions", ...) is the production path, but it is
    // read from the SparkContext conf at first-context creation — in a
    // shared-JVM test run the context already exists, so apply the same
    // class programmatically
    SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new graft.api.GraftExtensions()(_))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  private val payload =
    """{"marc":{"leader":"01010ccm a2200289   4500","fields":[
      |{"001":"a1"},{"245":{"ind1":"0","ind2":"0","subfields":[{"a":"Symphony, op. 38"}]}}]}}"""
      .stripMargin.replace("\n", "")

  test("native expression resolves through SQL") {
    val k = spark.sql(
      s"SELECT goldrush_matchkey('${payload.replace("'", "''")}') AS k")
      .collect().head.getString(0)
    assert(k.startsWith("symphonyop38"))
  }

  test("null propagates; broken payloads yield null (not a crash)") {
    val rows = spark.sql(
      """SELECT goldrush_matchkey(CAST(NULL AS STRING)) AS a,
        |       goldrush_matchkey('not json') AS b""".stripMargin)
      .collect().head
    assert(rows.isNullAt(0) && rows.isNullAt(1))
  }

  test("literal input is constant-folded by the optimizer") {
    val plan = spark.sql(
      s"SELECT goldrush_matchkey('${payload.replace("'", "''")}') AS k")
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("goldrush_matchkey"),
      s"expression folded to a literal at plan time:\n$plan")
  }

  test("dot_product and cosine_sim resolve through SQL") {
    val r = spark.sql(
      """SELECT dot_product(CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>),
        |                   CAST(array(3.0, 4.0) AS ARRAY<DOUBLE>)) AS d,
        |       cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<DOUBLE>)) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    assert(r.getDouble(1) == 1.0)
  }
}
