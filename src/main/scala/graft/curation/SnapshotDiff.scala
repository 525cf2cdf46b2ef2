package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-crawl bookkeeping report: between
  * two snapshots of the same id space, how many documents per slice were
  * added, removed, changed (same id, different content), or untouched. The
  * numbers that decide whether an incremental dedup/index refresh suffices
  * or the slice needs a full rebuild — and the drift alarm when a "stable"
  * source suddenly churns.
  *
  * Scale shape: both sides project to (id, group, md5) at the scan — the
  * full outer join exchanges hash-sized rows only, never text; the status
  * rollup partial-aggregates. Content compare is md5-of-text, so "changed"
  * means byte-level change (normalize upstream with
  * [[graft.dedup.Normalize]] for cosmetic-change tolerance).
  */
object SnapshotDiff {

  /** (groupCol, n_added, n_removed, n_changed, n_unchanged) per slice;
    * a document's slice comes from the NEW side when present (added/
    * changed/unchanged), else the OLD side (removed). */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String, groupCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("_graft_id"),
      col(groupCol).as("_graft_go"), md5(col(textCol)).as("_graft_ho"))
    val n = newDf.select(col(idCol).as("_graft_id"),
      col(groupCol).as("_graft_gn"), md5(col(textCol)).as("_graft_hn"))
    o.join(n, Seq("_graft_id"), "full_outer")
      .select(coalesce(col("_graft_gn"), col("_graft_go")).as("_graft_g"),
        when(col("_graft_ho").isNull, "added")
          .when(col("_graft_hn").isNull, "removed")
          .when(col("_graft_ho") =!= col("_graft_hn"), "changed")
          .otherwise("unchanged").as("_graft_st"))
      .groupBy(col("_graft_g"))
      .agg(
        sum(when(col("_graft_st") === "added", 1L).otherwise(0L)).as("n_added"),
        sum(when(col("_graft_st") === "removed", 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("_graft_st") === "changed", 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("_graft_st") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"))
      .withColumnRenamed("_graft_g", groupCol)
  }
}
