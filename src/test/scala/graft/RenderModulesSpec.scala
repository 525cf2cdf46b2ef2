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

  test("the reference's stock javascript module configs load verbatim") {
    import java.nio.file.{Files, Paths}
    val r = freshReservoir()
    // the exact shipped config JSONs (js/matchkeys/*/config-matchkeys-*.json)
    val cfg2024 = Files.readString(Paths.get(
      "/root/reference/js/matchkeys/goldrush2024/config-matchkeys-goldrush2024.json"))
    val cfg2021 = Files.readString(Paths.get(
      "/root/reference/js/matchkeys/goldrush/config-matchkeys-goldrush.json"))
    val m1 = r.modules.putJson(cfg2024)
    val m2 = r.modules.putJson(cfg2021)
    assert(m1.id == "goldrush2024-matcher" && m1.mtype == "javascript")
    assert(m2.id == "goldrush-matcher")

    val payload =
      """{"marc":{"leader":"01010ccm a2200289   4500","fields":[
        |{"001":"a1"},{"245":{"ind1":"0","ind2":"0","subfields":[{"a":"Symphony, op. 38"}]}},
        |{"260":{"ind1":" ","ind2":" ","subfields":[{"b":"Lehman,"},{"c":"1967"}]}}]}}"""
        .stripMargin.replace("\n", "")
    // both resolve through the javascript→native alias table to the
    // golden-verified ports
    val k2024 = r.modules.resolveMatcher("goldrush2024-matcher")(payload)
    val k2021 = r.modules.resolveMatcher("goldrush-matcher")(payload)
    assert(k2024.length == 1 && k2024.head.nonEmpty)
    assert(k2021.length == 1 && k2021.head.nonEmpty)
    assert(k2024 == Seq(graft.functions.GoldRush.matchkeyFromPayload(payload)))
    assert(k2021 == Seq(graft.functions.GoldRush2021.matchkeyFromPayload(payload)))

    // an unrecognized user script still fails with guidance
    r.modules.putJson("""{"id":"custom","type":"javascript",
      "url":"https://example.com/my-matcher.mjs"}""")
    val e = intercept[UnsupportedOperationException] {
      r.modules.resolveMatcher("custom")
    }
    assert(e.getMessage.contains("registerNative"), e.getMessage)
  }

  test("registerNative SPI: a custom Scala matcher clusters end-to-end") {
    val r = freshReservoir()
    // the documented replacement for the reference's user-JS matchers: a
    // Scala lambda registered at startup, addressed via a native module
    graft.api.ModuleRegistry.registerNative("first-issn-upper",
      p => try {
        val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(p)
        Option(node.at("/inventory/issn/0")).filterNot(_.isMissingNode)
          .map(_.asText.toUpperCase).toSeq
      } catch { case _: Exception => Nil })
    r.modules.put(CodeModule("my-matcher", "native", "first-issn-upper"))
    assert(r.modules.resolveMatcher("my-matcher")(
      """{"inventory":{"issn":["x77"]}}""") == Seq("X77"))
    // an unregistered native name fails with the registration hint
    r.modules.put(CodeModule("ghost", "native", "not-registered"))
    val e = intercept[IllegalArgumentException](r.modules.resolveMatcher("ghost"))
    assert(e.getMessage.contains("registerNative"), e.getMessage)
    // end-to-end: the custom matcher keys the pool (case-folded ISSN match)
    r.putMatchKeyConfig(MatchKeyConfig("custom-pool", "module:my-matcher"))
    r.ingest(batch(r, "A" -> Seq("q1"), "B" -> Seq("Q1"), "C" -> Seq("z9")))
    val byCluster = r.clusters("custom-pool").collect()
    assert(byCluster.length == 2, s"expected {A,B} and {C}: ${byCluster.length}")
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

  test("OAI verb dispatcher routes all four verbs and error paths, XSD-valid") {
    import graft.api.OaiEndpoint
    import graft.oai.OaiIdentifier
    val r = freshReservoir()
    r.putOaiConfig("graft repo", "http://localhost/oai")
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    r.ingest(batch(r, "A" -> Seq("1"), "B" -> Seq("2")))
    def call(params: (String, String)*): String = {
      val w = new StringWriter()
      OaiEndpoint.handle(r, params.toMap, w)
      w.toString
    }
    // the four verbs
    val identify = call("verb" -> "Identify")
    validate(identify)
    assert(identify.contains("<repositoryName>graft repo</repositoryName>"))
    val list = call("verb" -> "ListRecords", "set" -> "issn",
      "metadataPrefix" -> "marcxml")
    validate(list)
    assert(list.contains("<ListRecords>") && list.contains("<metadata>"))
    val idents = call("verb" -> "ListIdentifiers", "set" -> "issn")
    validate(idents)
    assert(idents.contains("<ListIdentifiers>") && !idents.contains("<metadata>"))
    val cid = r.clusters("issn").select("clusterId").collect().head.getString(0)
    val got = call("verb" -> "GetRecord",
      "identifier" -> OaiIdentifier.encode(cid))
    validate(got)
    assert(got.contains("<GetRecord>") && got.contains(cid))
    // resumption-token continuation through the dispatcher
    val p1 = r.listRecords("issn", limit = 1)
    val cont = call("verb" -> "ListRecords",
      "resumptionToken" -> p1.resumptionToken.get)
    validate(cont)
    assert(cont.contains("<ListRecords>"))
    // error paths
    val badVerb = call("verb" -> "Frobnicate")
    validate(badVerb)
    assert(badVerb.contains("""<error code="badVerb">"""))
    val noVerb = call()
    validate(noVerb)
    assert(noVerb.contains("""<error code="badVerb">"""))
    val badArg = call("verb" -> "GetRecord")
    validate(badArg)
    assert(badArg.contains("""<error code="badArgument">"""))
    val noSet = call("verb" -> "ListRecords", "set" -> "nope")
    validate(noSet)
    assert(noSet.contains("""<error code="badArgument">"""))
    val missing = call("verb" -> "GetRecord", "identifier" ->
      OaiIdentifier.encode("00000000-0000-0000-0000-000000000000"))
    validate(missing)
    assert(missing.contains("""<error code="idDoesNotExist">"""))
    val badFmt = call("verb" -> "ListRecords", "set" -> "issn",
      "metadataPrefix" -> "oai_dc")
    validate(badFmt)
    assert(badFmt.contains("""<error code="cannotDisseminateFormat">"""))
    val badTok = call("verb" -> "ListRecords", "resumptionToken" -> "%%%")
    validate(badTok)
    assert(badTok.contains("""<error code="badResumptionToken">"""))
    val badDate = call("verb" -> "ListRecords", "set" -> "issn",
      "from" -> "not-a-date")
    validate(badDate)
    assert(badDate.contains("""<error code="badArgument">"""))
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
