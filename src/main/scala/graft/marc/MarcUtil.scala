package graft.marc

/** MARC field manipulation (F4-F6, reference MarcInJsonUtil.java:24-114) on
  * the normalized model, plus the default OAI cluster→MARC merge transformer
  * (F9, OaiService.getMetadataJava:224-263).
  */
object MarcUtil {

  /** F4: first data field with tag and (optional) matching ind1/ind2 —
    * returns its subfields.
    */
  def lookupDataField(r: MarcRecord, tag: String, ind1: Option[String],
      ind2: Option[String]): Option[MarcField] =
    r.fields.find { f =>
      f.tag == tag && !f.isControl &&
        ind1.forall(v => f.indicators.find(_.name == "ind1").map(_.value).contains(v)) &&
        ind2.forall(v => f.indicators.find(_.name == "ind2").map(_.value).contains(v))
    }

  /** F5: insert a new data field, ordered by tag (stable for equal tags —
    * appended after existing ones with the same tag).
    */
  def createDataField(r: MarcRecord, tag: String, ind1: String, ind2: String,
      subfields: Seq[Subfield]): MarcRecord = {
    val nf = MarcField(tag, None,
      Seq(Indicator("ind1", ind1), Indicator("ind2", ind2)), subfields)
    val idx = r.fields.lastIndexWhere(_.tag <= tag) + 1
    r.copy(fields = (r.fields.take(idx) :+ nf) ++ r.fields.drop(idx))
  }

  /** F6: remove all fields with tag */
  def removeField(r: MarcRecord, tag: String): MarcRecord =
    r.copy(fields = r.fields.filterNot(_.tag == tag))

  /** One cluster record as seen by the transformer. */
  final case class ClusterRecordDoc(
      localId: String, sourceId: String, sourceVersion: Int, marc: MarcRecord)

  /** F9: the default OAI metadata — merge all cluster records' MARC into the
    * first record, folding ind=' '/' ' 999s together and appending a
    * 999 ind1=1 ind2=0 identifier field: $i clusterId, $m per match value,
    * then $l/$s/$v per record. Returns None for an empty (deleted) cluster.
    */
  def defaultClusterMarc(clusterId: String, matchValues: Seq[String],
      records: Seq[ClusterRecordDoc]): Option[MarcRecord] = {
    if (records.isEmpty) return None
    val identifiers = Seq.newBuilder[Subfield]
    identifiers += Subfield("i", clusterId)
    matchValues.foreach(mv => identifiers += Subfield("m", mv))

    var combined = records.head.marc
    records.foreach { rec =>
      if (rec ne records.head) {
        val f999 = lookupDataField(rec.marc, "999", Some(" "), Some(" "))
        val c999 = lookupDataField(combined, "999", Some(" "), Some(" "))
        (f999, c999) match {
          case (Some(f), Some(c)) =>
            val mergedField = c.copy(subfields = c.subfields ++ f.subfields)
            combined = combined.copy(fields =
              combined.fields.map(x => if (x eq c) mergedField else x))
          case _ => ()
        }
      }
      identifiers += Subfield("l", rec.localId)
      identifiers += Subfield("s", rec.sourceId)
      identifiers += Subfield("v", rec.sourceVersion.toString)
    }
    Some(createDataField(combined, "999", "1", "0", identifiers.result()))
  }
}
