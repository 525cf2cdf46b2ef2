package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Exact ranking-quality metrics for curation-signal audits: does a score
  * (quality classifier log-odds, perplexity, heuristic signal) actually
  * separate the population it claims to? AUC is the standard answer — the
  * probability a random positive outscores a random negative — computed here
  * EXACTLY via the Mann-Whitney rank identity with midrank tie handling, in
  * pure integer arithmetic (scores must be integers, the repo's micro-unit
  * convention).
  *
  * Scale shape: one `groupBy(score)` collapses the corpus to its distinct
  * score values (partial-agg'd); the running rank offsets come from the
  * [[PrefixSum]] two-pass scan, NOT a single-partition global window; the
  * final reduction is a 1-row aggregate. Nothing ever sorts the full corpus
  * in one task.
  *
  * Determinism: with 2·R₁ kept as an integer (midranks are half-integers),
  * auc_ppm = ((2·R₁ − n₊·(n₊+1)) · 10⁶) div (2·n₊·n₋) is exact — no float
  * ever appears.
  */
object RankEval {

  /** One row: (n_pos, n_neg, auc_ppm) for integer `scoreCol` against boolean
    * `labelCol`; auc_ppm is null when either class is empty. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String,
      numPartitions: Int = 32): DataFrame = {
    val groups = df
      .select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("_graft_lab"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("g"),
        sum(when(col("_graft_lab"), 1L).otherwise(0L)).as("g1"))
    val cum = PrefixSum.runningTotals(groups, Seq(col("s")), Seq("g"),
      numPartitions)
    // ranks in a tie group of size g ending at cumulative count c are
    // (c-g+1)..c → 2·midrank = 2c - g + 1, so 2·R1 = Σ g1·(2c - g + 1)
    cum
      .agg(sum(col("g1")).as("n_pos"),
        sum(col("g") - col("g1")).as("n_neg"),
        sum(col("g1") * (lit(2L) * col("cum_g") - col("g") + lit(1L)))
          .as("_graft_r2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0L || col("n_neg") === 0L,
          lit(null).cast("long"))
          .otherwise(expr(
            "((_graft_r2 - n_pos * (n_pos + 1)) * 1000000) div " +
              "(2 * n_pos * n_neg)"))
          .as("auc_ppm"))
  }
}
