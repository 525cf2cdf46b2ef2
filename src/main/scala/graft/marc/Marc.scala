package graft.marc

/** Normalized MARC schema for Spark.
  *
  * MARC-in-JSON is schema-hostile (field objects keyed by tag), so the engine
  * uses this normalized shape as the canonical columnar representation
  * (SURVEY.md §1.3) with lossless codecs at the edges:
  *   - control field: `value` set, no indicators/subfields
  *   - data field: indicators (ind1..ind9 as present) + ordered subfields
  *
  * Shapes follow the reference's MARC-in-JSON contract
  * (util/.../XmlMetadataParserMarcInJson.java:54-105: up to 9 indicators;
  * MarcInJsonUtil.java:74-80: control/data polymorphism).
  */
final case class Subfield(code: String, value: String)

final case class Indicator(name: String, value: String)

final case class MarcField(
    tag: String,
    value: Option[String],
    indicators: Seq[Indicator],
    subfields: Seq[Subfield]) {
  def isControl: Boolean = value.isDefined

  /** first subfield value with the given code, if any */
  def subfield(code: String): Option[String] =
    subfields.collectFirst { case Subfield(`code`, v) => v }
}

final case class MarcRecord(leader: Option[String], fields: Seq[MarcField]) {

  def fieldsWithTag(tag: String): Seq[MarcField] = fields.filter(_.tag == tag)

  def hasField(tag: String): Boolean = fields.exists(_.tag == tag)

  /** First field with `tag`: its first `sf` subfield if it has subfields,
    * else its control value (mirrors goldrush.mjs getField:23-44).
    */
  def firstValue(tag: String, sf: Option[String]): Option[String] =
    fieldsWithTag(tag).headOption.flatMap { f =>
      if (f.subfields.nonEmpty) sf.flatMap(c => f.subfield(c))
      else f.value
    }

  /** First `sf` subfield across all repeats of `tag`
    * (goldrush.mjs getRelevantSubField:46-65).
    */
  def firstSubfield(tag: String, sf: String): Option[String] =
    fieldsWithTag(tag).flatMap(_.subfield(sf)).headOption

  /** All `sf` subfield values across all repeats of `tag`
    * (goldrush.mjs getMultiSubfields:67-82).
    */
  def allSubfields(tag: String, sf: String): Seq[String] =
    fieldsWithTag(tag).flatMap(_.subfields.collect {
      case Subfield(`sf`, v) => v
    })
}
