package graft.model

import graft.marc.{MarcJson, MarcRecord}

/** The ingest envelope (reference: IngestRecord.java:22-40, FIXTURES.md §2):
  * `{localId, sourceId, sourceVersion, payload, delete?}` where payload keeps
  * the nested document as a raw JSON string column (schema-hostile
  * MARC-in-JSON stays opaque; the normalized MarcRecord is derived on demand).
  */
final case class GlobalRecord(
    localId: Option[String],
    sourceId: String,
    sourceVersion: Int,
    payloadJson: Option[String],
    delete: Boolean)

object GlobalRecord {

  /** sourceId validation + upper-casing (util/.../SourceId.java:7-22) */
  def normalizeSourceId(raw: String): String = {
    require(raw != null && raw.matches("^[a-zA-Z0-9:/-]{1,16}$"),
      s"invalid sourceId: '$raw'")
    raw.toUpperCase
  }
}

/** F10: order-sensitive grouping of a parsed MARC stream into global records
  * (MarcJsonToIngestMapper.java:26-88): leader pos 5 == 'd' → delete; records
  * bearing an 004 field are holdings attached to the preceding bib as
  * `marcHoldings`; localId comes from the first field when it is 001.
  * Runs inside one file's partition via mapPartitions (file order is the
  * grouping contract, so this must not cross partition boundaries).
  */
object IngestMapper {

  def isHolding(r: MarcRecord): Boolean = r.hasField("004")

  def isDeleted(r: MarcRecord): Boolean =
    r.leader.exists(l => l.length >= 24 && l.charAt(5) == 'd')

  def localIdOf(r: MarcRecord): Option[String] =
    r.fields.headOption.filter(_.tag == "001").flatMap(_.value).map(_.trim)

  final case class Grouped(bib: MarcRecord, holdings: Seq[MarcRecord]) {
    def payloadJson: String = {
      val sb = new StringBuilder("{\"marc\":")
      sb.append(MarcJson.toJson(bib))
      if (holdings.nonEmpty) {
        sb.append(",\"marcHoldings\":[")
        sb.append(holdings.map(MarcJson.toJson).mkString(","))
        sb.append("]")
      }
      sb.append("}")
      sb.toString
    }

    def toGlobalRecord(sourceId: String, sourceVersion: Int): GlobalRecord =
      GlobalRecord(localIdOf(bib), sourceId, sourceVersion,
        Some(payloadJson), isDeleted(bib))
  }

  /** Group a file-ordered record iterator: bib + following holdings. A
    * leading holdings record (no parent) is an error, like the reference.
    */
  def group(records: Iterator[MarcRecord]): Iterator[Grouped] =
    new Iterator[Grouped] {
      private val it = records.buffered
      def hasNext: Boolean = it.hasNext
      def next(): Grouped = {
        val bib = it.next()
        if (isHolding(bib))
          throw new IllegalArgumentException("Parent MARC record is holding")
        val holdings = Seq.newBuilder[MarcRecord]
        while (it.hasNext && isHolding(it.head)) holdings += it.next()
        Grouped(bib, holdings.result())
      }
    }
}
