package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Distribution-drift monitoring for corpus slices: per-stratum KL
  * divergence of the slice's token distribution against the whole corpus —
  * the data-card number that says "this source/language/snapshot looks
  * different" (domain balance checks, ingest regression alarms).
  *
  * KL(P_s || P) = Σ_t p_s(t) · ln(p_s(t) / p(t)), summed over the slice's
  * tokens (p_s(t) > 0 implies p(t) > 0 — the slice is part of the corpus,
  * so the divergence is always finite).
  *
  * Scale shape: the (stratum, token) count aggregate is the only
  * corpus-token shuffle; logically the marginals re-aggregate that result,
  * though Spark's partial exchange reuse still plans a second pruned text
  * scan for the token marginal (PlanSpec pins ≤ 2 scans) — persist the
  * pair counts upstream for a strict single pass. The stratum and grand
  * marginals join by broadcast (bounded by stratum count); the
  * vocabulary-sized token marginal is deliberately unhinted — it
  * auto-broadcasts when small and degrades to a token-keyed shuffle join
  * at web-vocabulary scale. Exactness: each token's log-ratio quantizes to integer
  * micro-nats and is weighted by its integer count, so the per-stratum sum
  * is exact integer arithmetic — partition-order-independent and
  * cross-engine comparable (`kl_micro_times_n` = KL × n_tokens × 1e6).
  */
object DistributionDrift {

  /** one row per stratum: n_tokens, exact `kl_micro_times_n`, and the
    * human-facing `kl_nats` = that / n_tokens / 1e6
    */
  def klByStratum(docs: DataFrame, textCol: String,
      stratumCol: String): DataFrame =
    klFromPairCounts(
      docs
        .select(col(stratumCol), explode(TextFunctions.tokens(col(textCol))).as("token"))
        .filter(col("token") =!= "") // split("") yields a phantom "" element
        .groupBy(col(stratumCol), col("token"))
        .agg(count(lit(1)).as("cnt_s")),
      stratumCol)

  /** [[klByStratum]] over already-aggregated (stratum, token, cnt_s) pair
    * counts — every marginal re-aggregates THIS frame, so a caller handing
    * a persisted pair-count frame (vocabulary × strata rows, tiny next to
    * the corpus) gets a strict single scan+tokenization of the raw text.
    * The convenience entry above re-plans the text scan under the token
    * marginal (PlanSpec pins its ≤ 2 scans).
    */
  def klFromPairCounts(pairCountsIn: DataFrame, stratumCol: String,
      tokenCol: String = "token", cntCol: String = "cnt_s"): DataFrame = {
    val pairCounts = pairCountsIn
      .select(col(stratumCol), col(tokenCol).as("token"), col(cntCol).as("cnt_s"))
    val tokenTotals = pairCounts.groupBy(col("token"))
      .agg(sum(col("cnt_s")).as("cnt"))
    val stratumTotals = pairCounts.groupBy(col(stratumCol))
      .agg(sum(col("cnt_s")).as("total_s"))
    val grand = tokenTotals.agg(sum(col("cnt")).as("total"))
    // lq = round(ln((cnt_s * total) / (cnt * total_s)) * 1e6): the per-token
    // log-ratio, quantized BEFORE the weighted sum
    pairCounts
      .join(tokenTotals, Seq("token"))
      .join(broadcast(stratumTotals), Seq(stratumCol))
      .crossJoin(broadcast(grand))
      .select(col(stratumCol), col("cnt_s"), col("total_s"),
        round(log((col("cnt_s").cast("double") * col("total").cast("double")) /
          (col("cnt").cast("double") * col("total_s").cast("double"))) * 1e6)
          .cast("long").as("lq_micro"))
      .groupBy(col(stratumCol))
      .agg(sum(col("cnt_s") * col("lq_micro")).as("_raw"),
        max(col("total_s")).as("n_tokens"))
      // clamp at 0: KL >= 0 in exact math, but per-token rounding can dip a
      // near-identical stratum epsilon-negative — preserve the invariant
      .select(col(stratumCol), col("n_tokens"),
        greatest(lit(0L), col("_raw")).as("kl_micro_times_n"))
      .select(col(stratumCol), col("n_tokens"), col("kl_micro_times_n"),
        (col("kl_micro_times_n").cast("double") / 1e6 /
          col("n_tokens").cast("double")).as("kl_nats"))
  }
}
