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

  /** Position-discount table for [[ndcgMrrAudit]]: disc_micro(p) =
    * round(10^6 / log2(p+1)) for p = 1..k. Computed ONCE here and embedded
    * as literals in both the Spark plan and the generated oracle SQL, so
    * the only float (the log2) can never disagree across engines.
    */
  def ndcgDiscountsMicro(k: Int): Seq[Long] =
    (1 to k).map(p => math.round(1e6 / (math.log(p + 1.0) / math.log(2.0))))

  /** Ideal DCG numerator for a truth list of exactly k graded items
    * (rel = k..1): Σ (k+1−p)·disc_micro(p) — a compile-time constant. */
  def idcgMicro(k: Int): Long = {
    val d = ndcgDiscountsMicro(k)
    (1 to k).map(p => (k + 1 - p).toLong * d(p - 1)).sum
  }

  /** Calibration (reliability-diagram) audit for a classifier score: does
    * "the model says 80%" mean 80% of those rows are actually positive?
    * AUC (above) is threshold-free ranking quality; calibration is the
    * complementary deployment question for any score used as a FILTER
    * PROBABILITY (keep-rate budgeting, soft-dedup weighting). Scores in
    * integer micro log-odds map through one per-row quantized sigmoid to
    * p_micro, bucket into ten fixed-width probability bands (data-
    * independent — no quantile pass, pure per-row), and each band reports
    * observed positive rate vs mean claimed confidence; ece_ppm is the
    * n-weighted mean absolute gap (expected calibration error), repeated
    * on every row like the other audit summaries.
    */
  /** Precision/recall at score-quantile operating points — the threshold-
    * selection table AUC (one scalar) can't give: for each requested
    * quantile of the SCORE distribution (type-1 order statistic via the
    * scalable [[graft.operators.Quantiles]] histogram search), treat
    * `score >= threshold` as the positive prediction and emit exact
    * integer precision/recall. The bounded threshold frame is broadcast
    * and the corpus aggregated ONCE across all operating points (each row
    * fans out to at most |quantiles| threshold buckets inside a
    * partial-agg'd groupBy — never a per-threshold scan).
    *
    * Emits nothing when the corpus has no positive rows (recall is 0/0;
    * the engine-divergent-division guard, both engines).
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
      qsPpm: Seq[Long] = (1L to 9L).map(_ * 100000L)): DataFrame = {
    val base = df.select(col(scoreCol).cast("long").as("s"),
        col(labelCol).cast("boolean").as("_graft_lab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thr = graft.operators.Quantiles.exactQuantiles(
        base.select(lit("all").as("g"), col("s")), "g", "s", qsPpm)
      .select(col("q_ppm"), col("value").as("threshold"))
    val tot = base.agg(
      sum(when(col("_graft_lab"), 1L).otherwise(0L)).as("n_pos"))
    base.crossJoin(broadcast(thr))
      .filter(col("s") >= col("threshold"))
      .groupBy(col("q_ppm"), col("threshold"))
      .agg(count(lit(1)).as("n_pred"),
        sum(when(col("_graft_lab"), 1L).otherwise(0L)).as("tp"))
      .crossJoin(broadcast(tot))
      .filter(col("n_pos") > 0L)
      .select(col("q_ppm"), col("threshold"), col("n_pred"), col("tp"),
        expr("(tp * 1000000) div n_pred").as("precision_ppm"),
        expr("(tp * 1000000) div n_pos").as("recall_ppm"))
  }

  def calibrationAudit(df: DataFrame, scoreMicroCol: String,
      labelCol: String): DataFrame = {
    val p = round(lit(1e6) /
      (lit(1.0) + exp(-col(scoreMicroCol).cast("double") / lit(1e6))))
      .cast("long")
    val per = df
      .select(p.as("p_micro"), col(labelCol).cast("boolean").as("_graft_lab"))
      .select(least(expr("p_micro div 100000"), lit(9L)).as("bucket"),
        col("p_micro"), col("_graft_lab"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("_graft_lab"), 1L).otherwise(0L)).as("n_pos"),
        sum(col("p_micro")).as("_graft_sp"))
      .select(col("bucket"), col("n"), col("n_pos"),
        expr("(n_pos * 1000000) div n").as("rate_ppm"),
        expr("_graft_sp div n").as("conf_ppm"))
    val ece = per.agg(
      expr("sum(n * abs(rate_ppm - conf_ppm)) div sum(n)").as("ece_ppm"))
    per.crossJoin(broadcast(ece))
  }

  /** Exact Kendall rank correlation (tau-a) between two BOUNDED ranked
    * lists (top-k frames à la [[RankFusion.topRanked]]) over their common
    * items: concordant/discordant pair counts and tau in integer ppm.
    * The pair enumeration is quadratic BY DESIGN and the contract is
    * list-scale inputs (k ≤ a few thousand) — rank agreement between two
    * corpus-scale scores belongs to a sampled/bucketed formulation, not
    * this operator. One row: (n_common, n_pairs, concordant, discordant,
    * tau_ppm); tau_ppm null when fewer than 2 common items.
    */
  def kendallTau(r1: DataFrame, r2: DataFrame, idCol: String,
      rankCol: String): DataFrame = {
    val j = r1.select(col(idCol).as("_graft_id"), col(rankCol).as("_graft_r1"))
      .join(r2.select(col(idCol).as("_graft_id"), col(rankCol).as("_graft_r2")),
        "_graft_id")
    val a = j.as("a")
    val b = j.as("b")
    a.join(b, col("a._graft_id") < col("b._graft_id"))
      .select(((col("a._graft_r1") - col("b._graft_r1")) *
        (col("a._graft_r2") - col("b._graft_r2"))).as("_graft_prod"))
      .agg(sum(when(col("_graft_prod") > 0, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("_graft_prod") < 0, 1L).otherwise(0L)).as("discordant"),
        count(lit(1)).as("n_pairs"))
      .crossJoin(broadcast(j.agg(count(lit(1)).as("n_common"))))
      .select(col("n_common"), col("n_pairs"),
        coalesce(col("concordant"), lit(0L)).as("concordant"),
        coalesce(col("discordant"), lit(0L)).as("discordant"),
        when(col("n_pairs") > 0, expr(
          "((concordant - discordant) * 1000000) div n_pairs"))
          .as("tau_ppm"))
  }

  /** Graded ranking-quality audit for a retrieval system against exact
    * ground truth — the metrics ANN recall@k (a set measure) can't see:
    * NDCG@k rewards putting the BEST neighbors early (graded relevance
    * rel = k+1 − exact_rank), and MRR reports how deep a user scrolls for
    * the first true hit. Both exact integers: DCG sums rel·disc_micro(p)
    * over the system's positions, NDCG normalizes by the constant ideal
    * DCG with a ppm div, and RR is 10^6 div first-hit-position.
    *
    * Inputs are two (query, item, rank) frames of ≤ queries·k rows (e.g.
    * [[graft.similarity.Similarity.cosineTopK]] as `truth`, `annTopK` as
    * `system`) — everything here is query-scale, never corpus-scale.
    * Queries the system missed entirely surface as hard zeros via the
    * truth-side left join, mirroring `recallAtK`.
    */
  def ndcgMrrAudit(truth: DataFrame, system: DataFrame, queryCol: String,
      itemCol: String, rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val disc = ndcgDiscountsMicro(k)
    val discArr = array(disc.map(lit): _*)
    val idcg = idcgMicro(k)
    val t = truth.select(col(queryCol).as("query_id"), col(itemCol).as("_graft_item"),
      (lit(k + 1) - col(rankCol)).cast("long").as("_graft_rel"))
    val sys = system.select(col(queryCol).as("query_id"),
      col(itemCol).as("_graft_item"), col(rankCol).cast("int").as("_graft_p"))
    val perQuery = sys.join(t, Seq("query_id", "_graft_item"), "left")
      .select(col("query_id"), col("_graft_p"),
        coalesce(col("_graft_rel"), lit(0L)).as("_graft_relv"))
      .groupBy(col("query_id"))
      .agg(sum(col("_graft_relv") * element_at(discArr, col("_graft_p")))
          .as("dcg_microsum"),
        min(when(col("_graft_relv") > 0, col("_graft_p"))).as("_graft_first"))
    t.select(col("query_id")).distinct()
      .join(perQuery, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("dcg_microsum"), lit(0L)).as("dcg_microsum"),
        coalesce(col("_graft_first"), lit(null)).as("_graft_first"))
      .select(col("query_id"), col("dcg_microsum"),
        expr(s"(dcg_microsum * 1000000) div $idcg").as("ndcg_ppm"),
        coalesce(expr("CAST(1000000 div _graft_first AS BIGINT)"), lit(0L))
          .as("rr_ppm"))
  }
}
