package graft

import java.io.StringWriter
import java.nio.file.Files

import javax.xml.XMLConstants
import javax.xml.transform.stream.StreamSource
import javax.xml.validation.SchemaFactory

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{CodeModule, MatchKeyConfig, ModuleInvocation, Render, Reservoir}

/** S9/S10 sink tests (items-JSON envelope; OAI XML validated against the
  * reference's OAI-PMH.xsd) and module-registry tests (§2.11).
  */
class RenderModulesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshReservoir(): Reservoir = {
    val dir = Files.createTempDirectory("graft-render").toString
    new Reservoir(spark, dir, "t1")
  }

  private def batch(r: Reservoir, rows: (String, Seq[String])*) = {
    import spark.implicits._
    rows.toSeq.map { case (lid, issn) =>
      val arr = issn.map(s => s""""$s"""").mkString("[", ",", "]")
      (lid, "SRC", 1,
        s"""{"marc":{"leader":"x","fields":[{"001":"$lid"}]},"inventory":{"issn":$arr}}""",
        false)
    }.toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete")
  }

  test("module registry: invocation parse, jsonpath + native resolve, cache reload") {
    val r = freshReservoir()
    assert(ModuleInvocation.parse("issn-matcher::extract") ==
      ModuleInvocation("issn-matcher", Some("extract")))
    r.modules.put(CodeModule("issn-matcher", "jsonpath", "$.inventory.issn[*]"))
    r.modules.put(CodeModule("gr2021", "native", "goldrush2021"))
    val f = r.modules.resolveMatcher("issn-matcher")
    assert(f("""{"inventory":{"issn":["11","22"]}}""") == Seq("11", "22"))
    assert(r.modules.list().map(_.id).toSet == Set("issn-matcher", "gr2021"))
    // javascript type is rejected with guidance
    r.modules.put(CodeModule("js", "javascript", "(x) => x"))
    assertThrows[UnsupportedOperationException] { r.modules.resolveMatcher("js") }
    r.modules.delete("js")
    assert(r.modules.get("js").isEmpty)
    // a module-backed pool clusters end-to-end
    r.putMatchKeyConfig(MatchKeyConfig("viamod", "module:issn-matcher"))
    r.ingest(batch(r, "A" -> Seq("x"), "B" -> Seq("x")))
    assert(r.clusters("viamod").count() == 1)
  }

  test("items JSON envelope matches the reference's list shape") {
    val r = freshReservoir()
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    r.ingest(batch(r, "A" -> Seq("1")))
    val df = r.records().select(to_json(struct(
      col("globalId"), col("localId"), col("sourceId")))).toDF("j")
    val w = new StringWriter()
    Render.itemsJson(df, w)
    val s = w.toString
    assert(s.startsWith("{\"items\":[{"))
    assert(s.contains("\"localId\":\"A\""))
    assert(s.contains("\"resultInfo\":{\"totalRecords\":1,"))
    // parses as JSON
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)
  }

  test("OAI ListRecords XML validates against the reference OAI-PMH.xsd") {
    val r = freshReservoir()
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    r.ingest(batch(r, "A" -> Seq("1"), "B" -> Seq("2")))
    val page = r.listRecords("issn", limit = 1)
    assert(page.resumptionToken.isDefined)
    val w = new StringWriter()
    Render.oaiList(page, "ListRecords", "http://localhost/oai", "issn", w)
    validate(w.toString)
    assert(w.toString.contains("<resumptionToken>"))

    val w2 = new StringWriter()
    Render.oaiIdentify("http://localhost/oai", "graft", w2)
    validate(w2.toString)

    val w3 = new StringWriter()
    Render.oaiError("badVerb", "nope", "http://localhost/oai", w3)
    validate(w3.toString)

    val w4 = new StringWriter()
    Render.oaiGetRecord(None, "http://localhost/oai", w4)
    validate(w4.toString)
  }

  test("deleted clusters serialize with status=deleted and no metadata") {
    val r = freshReservoir()
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    r.ingest(batch(r, "A" -> Seq("1")))
    import spark.implicits._
    r.ingest(Seq(("A", "SRC", 1, null: String, true))
      .toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete"))
    val page = r.listRecords("issn", limit = 10)
    val w = new StringWriter()
    Render.oaiList(page, "ListRecords", "http://localhost/oai", "issn", w)
    assert(w.toString.contains("status=\"deleted\""))
    assert(!w.toString.contains("<metadata>"))
    validate(w.toString)
  }

  private def validate(xml: String): Unit = {
    val sf = SchemaFactory.newInstance(XMLConstants.W3C_XML_SCHEMA_NS_URI)
    val schema = sf.newSchema(new java.io.File(
      "/root/reference/server/src/test/resources/OAI-PMH.xsd"))
    schema.newValidator().validate(
      new StreamSource(new java.io.StringReader(xml)))
  }
}
