package graft.marc

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Lossless MARC-in-JSON codec (reference shape:
  * util/.../XmlMetadataParserMarcInJson.java:54-105 and FIXTURES.md §1).
  *
  * {"leader": "...", "fields": [ {"001": "v"},
  *   {"245": {"ind1":"1","ind2":"0","subfields":[{"a":"T"}]}} ]}
  *
  * Uses Jackson (ships with Spark) — pure driver/executor-side functions.
  */
object MarcJson {

  private val mapper = new ObjectMapper()

  final class MarcJsonException(msg: String) extends IllegalArgumentException(msg)

  /** Parse a bare MARC-in-JSON object string. */
  def parse(json: String): MarcRecord = fromNode(mapper.readTree(json))

  /** Parse a `{"marc": {...}}` payload envelope with the reference's
    * validation semantics (goldrush.mjs loadMarcJson:3-15): missing fields →
    * error; non-array fields → error; missing leader → default.
    */
  def parsePayload(json: String): MarcRecord = {
    val root = mapper.readTree(json)
    val marc = root.get("marc")
    if (marc == null || marc.get("fields") == null)
      throw new MarcJsonException("MARC fields array is missing.")
    if (!marc.get("fields").isArray)
      throw new MarcJsonException("MARC fields is not an array.")
    val rec = fromNode(marc)
    if (rec.leader.forall(_.isEmpty))
      rec.copy(leader = Some("00000nam a22000000a 4500"))
    else rec
  }

  def fromNode(n: JsonNode): MarcRecord = {
    val leader = Option(n.get("leader")).filter(_.isTextual).map(_.asText)
    val fields = Option(n.get("fields")).toSeq.flatMap(_.elements.asScala).flatMap { fo =>
      fo.properties.asScala.headOption.map { e =>
        val tag = e.getKey
        val body = e.getValue
        if (body.isTextual) MarcField(tag, Some(body.asText), Nil, Nil)
        else {
          val inds = body.properties.asScala.toSeq
            .filter(p => p.getKey.startsWith("ind"))
            .sortBy(_.getKey)
            .map(p => Indicator(p.getKey, p.getValue.asText))
          val sfs = Option(body.get("subfields")).toSeq
            .flatMap(_.elements.asScala)
            .flatMap(_.properties.asScala.headOption)
            .map(p => Subfield(p.getKey, p.getValue.asText))
          MarcField(tag, None, inds, sfs.toSeq)
        }
      }
    }
    MarcRecord(leader, fields.toSeq)
  }

  def toNode(r: MarcRecord): ObjectNode = {
    val root = mapper.createObjectNode()
    r.leader.foreach(root.put("leader", _))
    val arr = root.putArray("fields")
    r.fields.foreach { f =>
      val fo = arr.addObject()
      f.value match {
        case Some(v) => fo.put(f.tag, v)
        case None =>
          val body = fo.putObject(f.tag)
          f.indicators.foreach(i => body.put(i.name, i.value))
          val sfs = body.putArray("subfields")
          f.subfields.foreach(s => sfs.addObject().put(s.code, s.value))
      }
    }
    root
  }

  def toJson(r: MarcRecord): String = mapper.writeValueAsString(toNode(r))

  /** Serialize a JsonNode (helper for payload assembly). */
  def nodeToJson(n: JsonNode): String = mapper.writeValueAsString(n)
}
