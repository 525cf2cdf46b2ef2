package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic record linkage (JASA 1969) — the scoring
  * half of the reference's match-key world: where a matchkey
  * (cluster/Clusterize) declares two records equal by exact key identity,
  * FS grades CANDIDATE pairs by summing per-field log-likelihood-ratio
  * weights — log(m/u) when a field agrees (m = P(agree | match),
  * u = P(agree | non-match)), log((1−m)/(1−u)) when it disagrees — and the
  * score's distribution is what a deployment thresholds into
  * link / review / non-link bands.
  *
  * Scale shape: candidates come from BLOCKING (equi-join on the block key),
  * never all pairs — the quadratic cost is bounded by the largest block,
  * the same bound as [[SortedNeighborhood]]'s window; at 100 TB you size
  * blocks (multi-attribute keys) exactly like LSH bucket caps. Weights are
  * integer milli-units fixed at plan time, so scores are exact integers and
  * the score histogram aggregates partial (types-of-agreement-pattern many
  * distinct values, here ≤ 2^fields).
  */
object RecordLinkage {

  /** One compared field: `name` is the column, `agree` the agreement
    * predicate over the pair's two sides, weights in integer milli
    * log-likelihood units (positive for agreement, negative for
    * disagreement, per FS). */
  final case class FsField(name: String, agree: (Column, Column) => Column,
      agreeMilli: Long, disagreeMilli: Long)

  /** Score every within-block pair (a.id < b.id) and return the exact
    * score histogram: (score_milli, n_pairs). The input should already
    * carry derived comparison columns (quantized amounts, phonetic codes).
    */
  def scoreHistogram(df: DataFrame, idCol: String, blockCols: Seq[String],
      fields: Seq[FsField]): DataFrame = {
    require(blockCols.nonEmpty, "blocking columns required — all-pairs " +
      "linkage is quadratic in the table, not a supported shape")
    require(fields.nonEmpty, "at least one compared field required")
    val a = df.as("a")
    val b = df.as("b")
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && (col(s"a.$idCol") < col(s"b.$idCol"))
    val score = fields.map(f =>
      when(f.agree(col(s"a.${f.name}"), col(s"b.${f.name}")),
        lit(f.agreeMilli)).otherwise(lit(f.disagreeMilli))).reduce(_ + _)
    a.join(b, cond)
      .select(score.as("score_milli"))
      .groupBy(col("score_milli"))
      .agg(count(lit(1)).as("n_pairs"))
  }
}
