package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Suffix/prefix stitch detection: find ordered pairs where the last k
  * tokens of one document equal the first k tokens of another — the
  * signature of crawl truncation and pagination splits (one logical
  * document fetched as two). Downstream, matched pairs reassemble (dedup
  * the overlap, concatenate) or mark both fragments for refetch.
  *
  * Scale shape: each side contributes ONE row per document (the k-token
  * boundary string and its md5); candidates come from an md5 equi-join —
  * exchange rows are hash-sized, never text — and the carried boundary
  * strings verify equality exactly, so an md5 collision cannot produce a
  * false pair. Documents shorter than k tokens have no boundary and drop
  * out on both sides.
  */
object Stitch {

  /** (head_id, tail_id, overlap) — head's k-token suffix == tail's k-token
    * prefix, self-pairs excluded */
  def stitchPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(col(idCol).cast("long").as("_graft_id"),
        filter(TextFunctions.tokens(col(textCol)), t => t =!= lit(""))
          .as("_graft_t"))
      .filter(size(col("_graft_t")) >= k)
    val heads = toks.select(col("_graft_id").as("head_id"),
      concat_ws(" ", slice(col("_graft_t"), -k, k)).as("_graft_sfx"))
      .select(col("head_id"), col("_graft_sfx"),
        md5(col("_graft_sfx")).as("_graft_h"))
    val tails = toks.select(col("_graft_id").as("tail_id"),
      concat_ws(" ", slice(col("_graft_t"), 1, k)).as("_graft_pfx"))
      .select(col("tail_id"), col("_graft_pfx"),
        md5(col("_graft_pfx")).as("_graft_h"))
    heads.join(tails, Seq("_graft_h"))
      .filter(col("head_id") =!= col("tail_id") &&
        col("_graft_sfx") === col("_graft_pfx"))
      .select(col("head_id"), col("tail_id"), col("_graft_sfx").as("overlap"))
  }
}
