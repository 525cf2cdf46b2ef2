package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Split-conformal screening calibration — the distribution-free way to
  * turn ANY per-document quality score into an accept/reject threshold
  * with a finite-sample coverage guarantee: calibrate the cutoff on a
  * deterministic hash-split so that at most an α-fraction of truly-good
  * documents would be rejected, then report the EMPIRICAL held-out
  * coverage beside the guarantee. The screen a 100 TB curation pass wants
  * before committing a filter threshold: "if I cut at this score, what
  * fraction of good data do I provably keep?"
  *
  * Everything is exact-integer and engine-reproducible: the split is the
  * [[Sampling.hashSample]] md5 draw, scores are caller-quantized longs
  * (micro/ppm units), and the threshold is a type-1 order statistic.
  */
object Conformal {

  /** For each α in `alphasPpm`: the conformal threshold
    * `thr = k-th smallest calibration-positive score` with
    * `k = ⌊α·(n_cal+1)⌋` (type-1 rank; `k = 0` → no cut, accept all),
    * plus held-out acceptance stats for the rule `score ≥ thr`. The
    * standard split-conformal guarantee: a fresh positive is accepted
    * with probability ≥ 1−α.
    *
    * Scale shape: ONE partial-agg'd pass collapses calibration-positive
    * scores to a (score → count) histogram — bounded by score
    * GRANULARITY (ppm scores have ≤ 10⁶+1 distinct values), not corpus
    * size — thresholds come from a cumulative window over that bounded
    * frame, and the held-out pass aggregates once against the broadcast
    * |alphas|-row threshold frame. The corpus is scanned twice (hash
    * split on both sides pushes to the scan), never shuffled.
    *
    * Output per α: (alpha_ppm, n_cal, k_rank, thr_score [null when
    * k = 0], n_eval_pos, n_eval_pos_kept, coverage_ppm [null when the
    * held-out slice has no positives], n_eval, n_eval_kept, accept_ppm).
    *
    * Caching note: the internal split frame persists (MEMORY_AND_DISK)
    * and — the result being lazy — stays pinned until the caller runs
    * `spark.catalog.clearCache()` after its last action (the Verify gate
    * does this between queries).
    */
  def conformalScreen(df: DataFrame, idCol: String, scoreCol: Column,
      labelCol: Column, calFraction: Double, salt: String,
      alphasPpm: Seq[Long]): DataFrame = {
    // the slim split frame feeds the threshold derivation AND the eval
    // pass — persist it or the caller's score expression (typically a
    // corpus tokenization) re-runs per reference (the r14 composition
    // finding)
    val base = calSplit(df, idCol, scoreCol, labelCol, calFraction, salt)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val thresholds = conformalThresholds(base, alphasPpm)
    val eval = base.filter(!col("_graft_cal"))
    eval.crossJoin(broadcast(thresholds))
      .groupBy(col("alpha_ppm"), col("n_cal"), col("k_rank"),
        col("thr_score"))
      .agg(
        sum(when(col("_graft_lab"), 1L).otherwise(0L)).as("n_eval_pos"),
        sum(when(col("_graft_lab") &&
            (col("thr_score").isNull || col("_graft_s") >= col("thr_score")),
          1L).otherwise(0L)).as("n_eval_pos_kept"),
        count(lit(1)).as("n_eval"),
        sum(when(col("thr_score").isNull ||
            col("_graft_s") >= col("thr_score"), 1L).otherwise(0L))
          .as("n_eval_kept"))
      .select(col("alpha_ppm"), col("n_cal"), col("k_rank"),
        col("thr_score"),
        col("n_eval_pos"), col("n_eval_pos_kept"),
        when(col("n_eval_pos") > 0L,
          expr("(n_eval_pos_kept * 1000000) div n_eval_pos"))
          .as("coverage_ppm"),
        col("n_eval"), col("n_eval_kept"),
        expr("(n_eval_kept * 1000000) div n_eval").as("accept_ppm"))
  }

  /** the deterministic calibration/eval split + quantized score + label
    * projection both entry points share
    */
  private def calSplit(df: DataFrame, idCol: String, scoreCol: Column,
      labelCol: Column, calFraction: Double, salt: String): DataFrame = {
    val thr = Sampling.fractionThreshold(calFraction)
    df.select(col(idCol).as("_graft_id"),
      scoreCol.cast("long").as("_graft_s"), labelCol.as("_graft_lab"),
      (Sampling.hashDraw(col(idCol), salt) < lit(thr)).as("_graft_cal"))
  }

  /** the (alpha_ppm, n_cal, k_rank, thr_score) threshold frame over a
    * [[calSplit]] base — |alphas| rows, built from the score-granularity-
    * bounded calibration histogram (see [[conformalScreen]])
    */
  private def conformalThresholds(base: DataFrame,
      alphasPpm: Seq[Long]): DataFrame = {
    require(alphasPpm.nonEmpty && alphasPpm.forall(a => a > 0 && a < 1000000L),
      s"alphasPpm must be in (0, 1e6), got $alphasPpm")
    // a repeated alpha would pass through the VALUES frame and the held-out
    // crossJoin as duplicated (inflated) output rows — reject it up front
    require(alphasPpm.distinct.size == alphasPpm.size,
      s"alphasPpm must be distinct, got $alphasPpm")
    // calibration-positive (score -> count) histogram: bounded by score
    // granularity, so the global cumulative window below is safe
    val hist = base.filter(col("_graft_cal") && col("_graft_lab"))
      .groupBy(col("_graft_s")).agg(count(lit(1)).as("_graft_c"))
    val cum = hist.withColumn("_graft_cum",
        sum(col("_graft_c")).over(
          Window.orderBy(col("_graft_s"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_graft_n", sum(col("_graft_c")).over(
        Window.partitionBy(lit(1))))
    val alphas = alphasPpm.map(a => s"($a)").mkString(", ")
    val ranks = cum.sparkSession
      .sql(s"SELECT * FROM VALUES $alphas AS t(alpha_ppm)")
      .crossJoin(broadcast(cum.select(max(col("_graft_n")).as("n_cal"))))
      .withColumn("n_cal", coalesce(col("n_cal"), lit(0L)))
      .withColumn("k_rank",
        expr("(alpha_ppm * (n_cal + 1)) div 1000000"))
    // type-1 order statistic per alpha: smallest score whose cumulative
    // count reaches the rank (k = 0 joins nothing -> null threshold)
    ranks.join(cum,
        col("_graft_cum") >= col("k_rank") && col("k_rank") >= lit(1),
        "left")
      .groupBy(col("alpha_ppm"), col("n_cal"), col("k_rank"))
      .agg(min(col("_graft_s")).as("thr_score"))
  }

  /** APPLY the α-calibrated rule — the composition a curation pipeline
    * wants: calibrate the threshold exactly as [[conformalScreen]] does
    * (same split, same type-1 rank), then keep every input row with
    * `score ≥ thr` (everything when `k = 0` → null threshold). Returns the
    * input columns plus (alpha_ppm, n_cal, k_rank, thr_score) carried on
    * each row, so downstream stages inherit the coverage guarantee's
    * parameters alongside the data. The 1−α acceptance guarantee formally
    * covers rows OUTSIDE the calibration slice; the rule is applied
    * uniformly (standard practice — the calibration rows are not special
    * at serving time).
    *
    * Scale shape: identical to [[conformalScreen]] — the corpus is scanned,
    * never shuffled; the 1-row threshold frame broadcasts. The input is
    * read TWICE (threshold derivation + the final filter): callers whose
    * `df` is itself an expensive plan (a dedup join, a heavy projection)
    * should persist it first, as the q214 gate query does.
    *
    * The appended column names (alpha_ppm, n_cal, k_rank, thr_score, plus
    * the transient _graft_keep_s) are RESERVED: inputs already carrying
    * any of them are rejected up front rather than producing an ambiguous
    * frame.
    */
  def calibratedKeep(df: DataFrame, idCol: String, scoreCol: Column,
      labelCol: Column, calFraction: Double, salt: String,
      alphaPpm: Long): DataFrame = {
    // the output appends these fixed-name columns onto the caller's frame;
    // an input already carrying one would yield duplicate/ambiguous columns
    val reserved =
      Seq("alpha_ppm", "n_cal", "k_rank", "thr_score", "_graft_keep_s")
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"calibratedKeep input must not carry reserved output columns: " +
        clash.mkString(", "))
    val base = calSplit(df, idCol, scoreCol, labelCol, calFraction, salt)
    val thr = conformalThresholds(base, Seq(alphaPpm))
    df.withColumn("_graft_keep_s", scoreCol.cast("long"))
      .crossJoin(broadcast(thr))
      .filter(col("thr_score").isNull ||
        col("_graft_keep_s") >= col("thr_score"))
      .drop("_graft_keep_s")
  }
}
