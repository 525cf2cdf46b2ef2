package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label-quality audits over an embedding column — the two checks a
  * labeled training corpus gets before the labels are trusted:
  *
  *  - [[knnLabelAgreement]]: does each example's label agree with its
  *    nearest neighbors' labels? (the classical kNN label-noise screen —
  *    low-agreement rows are the mislabeled-example candidates that
  *    confident-learning pipelines route to re-annotation);
  *  - [[truncationFidelity]]: how much neighbor structure survives
  *    truncating the embedding to its leading dimensions? (the
  *    accept-or-retune gate for Matryoshka-style dimension cuts, where
  *    storing 16 of 64 dims cuts the ANN index 4× IF recall holds).
  *
  * Both take a BOUNDED probe frame (a deterministic sample of the corpus —
  * compose with `Sampling.hashSample`) that is broadcast, so the corpus is
  * scanned, never shuffled; ranking is the bounded top-k aggregate from
  * [[Similarity]]. At 100 TB the probe set sizes the audit, not the corpus.
  */
object LabelAudit {

  /** Per-probe agreement between its own label and its k nearest corpus
    * neighbors' labels (self excluded, exact cosine, ties → smaller id —
    * the q27 contract). `suspect` flags minority rows (`2·agree < k_found`):
    * the label-noise candidates.
    *
    * Two corpus scans (one for neighbors, one for the bounded label
    * join — the top-k frame is |probes|·k rows and is broadcast back).
    */
  def knnLabelAgreement(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val top = Similarity.cosineTopK(probes, corpus, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val clab = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("_graft_nlab"))
    val plab = probes.select(col(idCol).as("query_id"),
      col(labelCol).as("_graft_qlab"))
    clab.join(broadcast(top), "neighbor_id")
      .join(broadcast(plab), "query_id")
      .groupBy(col("query_id"), col("_graft_qlab"))
      .agg(count(lit(1)).as("k_found"),
        sum(when(col("_graft_nlab") === col("_graft_qlab"), 1L)
          .otherwise(0L)).as("n_agree"))
      .select(col("query_id").as("vec_id"), col("_graft_qlab").as("label"),
        col("k_found").cast("long").as("k_found"), col("n_agree"),
        expr("(n_agree * 1000000) div k_found").as("agree_ppm"),
        (col("n_agree") * 2 < col("k_found")).as("suspect"))
  }

  /** Per-probe top-k overlap between the FULL-dimension neighbor list and
    * the list recomputed on the leading `dims` dimensions only (cosine
    * renormalizes, so no explicit rescale is needed). `overlap_ppm` is the
    * per-probe recall@k of the truncated space against the full space —
    * the number that decides whether a Matryoshka cut ships.
    *
    * Two corpus scans (one per space); each probe's lists are k-bounded,
    * so the intersection is a per-row array op on a |probes|-row frame.
    */
  def truncationFidelity(probes: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dims: Int, k: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    require(k >= 1, s"k must be >= 1, got $k")
    def nn(p: DataFrame, c: DataFrame, out: String): DataFrame =
      Similarity.cosineTopK(p, c, idCol, vecCol, k)
        .groupBy(col("query_id"))
        .agg(sort_array(collect_list(col("neighbor_id"))).as(out))
    def cut(df: DataFrame): DataFrame =
      df.withColumn(vecCol, slice(col(vecCol), 1, dims))
    nn(probes, corpus, "_graft_full")
      .join(broadcast(nn(cut(probes), cut(corpus), "_graft_trunc")),
        "query_id")
      .select(col("query_id").as("vec_id"),
        size(col("_graft_full")).cast("long").as("k_full"),
        size(array_intersect(col("_graft_full"), col("_graft_trunc")))
          .cast("long").as("overlap"))
      .select(col("vec_id"), col("k_full"), col("overlap"),
        expr("(overlap * 1000000) div k_full").as("overlap_ppm"))
  }
}
