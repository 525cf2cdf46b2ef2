package graft.functions

import java.io.{StringReader, StringWriter}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import javax.xml.transform.{Templates, TransformerFactory}
import javax.xml.transform.stream.{StreamResult, StreamSource}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory, ObjectNode}

import graft.marc.{MarcJson, MarcRecord, MarcXml}

/** XSLT ingest-transformation chain (F7/F8): MARCXML → XSLT pipeline →
  * inventory XML → JSON with the reference's `arr`/`i` array convention and
  * `original` element skip (IngestRecord.java:52-65, InventoryToXml.java:48-143).
  * The stock stylesheets are XSLT 1.0 — the JDK transformer handles them
  * with no extra dependency.
  *
  * Scale note: `Templates` is thread-safe but not serializable; distributed
  * stages compile the stylesheet strings once per partition.
  */
object XsltIngest {

  private val nf = JsonNodeFactory.instance

  def compile(xsltSources: Seq[String]): Seq[Templates] = {
    val tf = TransformerFactory.newInstance()
    xsltSources.map(s => tf.newTemplates(new StreamSource(new StringReader(s))))
  }

  def compileFiles(paths: Seq[String]): Seq[Templates] = {
    val tf = TransformerFactory.newInstance()
    paths.map(p => tf.newTemplates(new StreamSource(new java.io.File(p))))
  }

  /** F8: apply the stylesheet chain to an XML string. */
  def transformChain(xml: String, templates: Seq[Templates]): String =
    templates.foldLeft(xml) { (acc, t) =>
      val out = new StringWriter()
      t.newTransformer().transform(
        new StreamSource(new StringReader(acc)), new StreamResult(out))
      out.toString
    }

  /** F7: inventory-XML → JSON. Elements become object fields; an `arr`
    * element becomes a JSON array of its children's contents (the `i`
    * convention); `skip`-named elements are dropped; text-only elements
    * become strings.
    */
  def inventoryXmlToJson(xml: String, skip: String = "original"): ObjectNode = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, java.lang.Boolean.FALSE)
    f.setProperty(XMLInputFactory.IS_COALESCING, java.lang.Boolean.TRUE)
    val r = f.createXMLStreamReader(new StringReader(xml))
    try {
      r.next() // position on the root START_ELEMENT
      // the root element's name becomes a key of the result
      // (InventoryToXml.inventoryXmlToJson wraps: {"record": {...}})
      val root = nf.objectNode()
      root.set(r.getLocalName, convert(r, skip))
      root
    } finally r.close()
  }

  /** Convert the element currently at START_ELEMENT; returns its JSON value
    * and leaves the reader on the matching END_ELEMENT. An `arr` child turns
    * the ENCLOSING element's value into a JSON array of the arr children's
    * contents (the reference's arr/i convention).
    */
  private def convert(r: XMLStreamReader, skip: String): JsonNode = {
    var obj: ObjectNode = null
    var text: StringBuilder = null
    var arr: ArrayNode = null
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val name = r.getLocalName
          if (name == skip) skipElement(r)
          else if (name == "arr" && obj == null && arr == null)
            arr = parseArr(r, skip)
          else {
            if (obj == null) obj = nf.objectNode()
            obj.set(name, convert(r, skip))
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (text == null) text = new StringBuilder
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    // precedence mirrors InventoryToXml.xmlToJsonObject: arrays first, then
    // child objects, then raw text (NOT trimmed — leading spaces in MARC
    // control fields are significant)
    if (arr != null) arr
    else if (obj != null) obj
    else if (text != null) nf.textNode(text.toString)
    else nf.nullNode()
  }

  /** positioned at the `<arr>` START_ELEMENT: array of each child's content */
  private def parseArr(r: XMLStreamReader, skip: String): ArrayNode = {
    val a = nf.arrayNode()
    var done = false
    while (!done && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => a.add(convert(r, skip))
        case XMLStreamConstants.END_ELEMENT => done = true
        case _ => ()
      }
    }
    a
  }

  private def skipElement(r: XMLStreamReader): Unit = {
    var level = 1
    while (level > 0 && r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => level += 1
        case XMLStreamConstants.END_ELEMENT => level -= 1
        case _ => ()
      }
    }
  }

  /** The full pipeline for one record: MARCXML through the chain to an
    * ingest envelope `{localId, payload:{marc, inventory}}`
    * (IngestRecord.createIngestRecord).
    */
  def createIngestRecord(marcXml: String, templates: Seq[Templates]): ObjectNode = {
    val transformed = transformChain(marcXml, templates)
    var inv = inventoryXmlToJson(transformed)
    if (inv.has("collection")) inv = inv.get("collection") match {
      case o: ObjectNode => o
      case _ => inv
    }
    val rec = inv.get("record") match {
      case o: ObjectNode => o
      case _ => throw new IllegalArgumentException(
        "inventory xml: missing record property")
    }
    val localId = Option(rec.get("localIdentifier")).filter(_.isTextual)
      .map(_.asText).getOrElse(throw new IllegalArgumentException(
        "inventory xml: missing record/localIdentifier string"))
    rec.remove("original")
    val marcRec: MarcRecord = MarcXml.parseCollection(marcXml).headOption
      .getOrElse(throw new IllegalArgumentException("no MARC record in input"))
    val out = nf.objectNode()
    out.put("localId", localId)
    val payload = out.putObject("payload")
    payload.set("marc", MarcJson.toNode(marcRec))
    payload.set("inventory", rec)
    out
  }
}
