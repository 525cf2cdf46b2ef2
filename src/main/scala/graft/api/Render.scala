package graft.api

import java.io.Writer

import org.apache.spark.sql.DataFrame

import graft.marc.MarcXml
import graft.oai.{OaiDates, OaiIdentifier}

/** Result serializers — the presentation half of the reference's HTTP
  * surface:
  *   - S9: chunked JSON `{"items":[…],"resultInfo":{totalRecords,…}}`
  *     (Storage.java:1115-1259)
  *   - S10: OAI-PMH XML responses with headers, deleted status and
  *     resumption tokens (OaiService.java:303-350, ClusterRecordStream.java:88-127)
  *
  * Both stream row-by-row through `toLocalIterator` — bounded driver memory
  * regardless of result size (the reference streams from a DB cursor the
  * same way).
  */
object Render {

  /** S9: stream `df`'s rows as the items array with a resultInfo footer.
    * Rows must carry a single JSON-string column (pre-serialize with
    * `to_json(struct(...))`).
    */
  def itemsJson(df: DataFrame, out: Writer, countExact: Boolean = true): Unit = {
    val total = if (countExact) Some(df.count()) else None
    out.write("{\"items\":[")
    val it = df.toLocalIterator()
    var first = true
    while (it.hasNext) {
      if (!first) out.write(",")
      out.write(it.next().getString(0))
      first = false
    }
    out.write("],\"resultInfo\":{")
    total.foreach(t => out.write(s""""totalRecords":$t,"""))
    out.write("\"diagnostics\":[],\"facets\":[]}}")
  }

  private def xmlEsc(s: String): String = MarcXml.encodeXmlText(s)

  private def oaiHeader(out: Writer, verb: String, baseUrl: String,
      params: Seq[(String, String)]): Unit = {
    out.write("""<?xml version="1.0" encoding="UTF-8"?>""")
    out.write("\n<OAI-PMH xmlns=\"http://www.openarchives.org/OAI/2.0/\"")
    out.write(" xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\"")
    out.write(" xsi:schemaLocation=\"http://www.openarchives.org/OAI/2.0/")
    out.write(" http://www.openarchives.org/OAI/2.0/OAI-PMH.xsd\">\n")
    out.write(s"  <responseDate>${OaiDates.formatOaiDateTime(
      java.time.LocalDateTime.now(java.time.ZoneOffset.UTC))}</responseDate>\n")
    val attrs = params.map { case (k, v) => s"""$k="${xmlEsc(v)}"""" }
    out.write(s"""  <request${if (verb.nonEmpty) s""" verb="$verb"""" else ""}${
      if (attrs.nonEmpty) " " + attrs.mkString(" ") else ""}>${
      xmlEsc(baseUrl)}</request>\n""")
  }

  /** S10: a full ListRecords / ListIdentifiers response. */
  def oaiList(page: OaiPage, verb: String, baseUrl: String, set: String,
      out: Writer): Unit = {
    oaiHeader(out, verb, baseUrl, Seq("set" -> set, "metadataPrefix" -> "marcxml"))
    if (page.items.isEmpty) {
      out.write("  <error code=\"noRecordsMatch\"/>\n")
    } else {
      out.write(s"  <$verb>\n")
      page.items.foreach { item =>
        if (verb == "ListRecords") {
          // ListRecords wraps header+metadata in <record>; ListIdentifiers
          // carries bare <header> elements (OAI-PMH.xsd)
          out.write("    <record>\n")
          writeItemHeader(out, item)
          item.metadataXml.foreach { xml =>
            out.write("      <metadata>")
            out.write(xml)
            out.write("</metadata>\n")
          }
          out.write("    </record>\n")
        } else writeItemHeader(out, item)
      }
      page.resumptionToken.foreach(t =>
        out.write(s"    <resumptionToken>${xmlEsc(t)}</resumptionToken>\n"))
      out.write(s"  </$verb>\n")
    }
    out.write("</OAI-PMH>\n")
  }

  private def writeItemHeader(out: Writer, item: OaiItem): Unit = {
    val status = if (item.deleted) " status=\"deleted\"" else ""
    out.write(s"      <header$status>\n")
    out.write(s"        <identifier>${xmlEsc(OaiIdentifier.encode(item.clusterId))}</identifier>\n")
    out.write(s"        <datestamp>${OaiDates.formatOaiDateTime(
      item.datestamp.toLocalDateTime)}</datestamp>\n")
    out.write("      </header>\n")
  }

  /** S10: GetRecord (single cluster) or idDoesNotExist error. */
  def oaiGetRecord(item: Option[OaiItem], baseUrl: String, out: Writer): Unit = {
    oaiHeader(out, "GetRecord", baseUrl, Nil)
    item match {
      case None => out.write("  <error code=\"idDoesNotExist\"/>\n")
      case Some(i) =>
        out.write("  <GetRecord>\n    <record>\n")
        writeItemHeader(out, i)
        i.metadataXml.foreach(x =>
          out.write(s"      <metadata>$x</metadata>\n"))
        out.write("    </record>\n  </GetRecord>\n")
    }
    out.write("</OAI-PMH>\n")
  }

  /** S10: Identify response (OaiService Identify verb). */
  def oaiIdentify(baseUrl: String, repositoryName: String, out: Writer): Unit = {
    oaiHeader(out, "Identify", baseUrl, Nil)
    out.write("  <Identify>\n")
    out.write(s"    <repositoryName>${xmlEsc(repositoryName)}</repositoryName>\n")
    out.write(s"    <baseURL>${xmlEsc(baseUrl)}</baseURL>\n")
    out.write("    <protocolVersion>2.0</protocolVersion>\n")
    out.write("    <adminEmail>admin@example.org</adminEmail>\n")
    out.write("    <earliestDatestamp>1970-01-01T00:00:00Z</earliestDatestamp>\n")
    out.write("    <deletedRecord>persistent</deletedRecord>\n")
    out.write("    <granularity>YYYY-MM-DDThh:mm:ssZ</granularity>\n")
    out.write("  </Identify>\n</OAI-PMH>\n")
  }

  /** S10: protocol error response (badVerb / badArgument / …). */
  def oaiError(code: String, message: String, baseUrl: String, out: Writer): Unit = {
    oaiHeader(out, "", baseUrl, Nil)
    out.write(s"""  <error code="${xmlEsc(code)}">${xmlEsc(message)}</error>\n""")
    out.write("</OAI-PMH>\n")
  }
}
