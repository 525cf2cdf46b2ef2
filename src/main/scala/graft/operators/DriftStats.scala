package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-sample Kolmogorov–Smirnov drift per corpus slice — the
  * distribution-shape alarm that complements the token-level KL drift
  * (q64): for every source, the KS statistic between ITS metric
  * distribution (e.g. document length) and the REST of the corpus.
  *
  * Exact integers throughout: with per-source cumulative counts `cum_s`
  * and complementary `cum_rest = cum_all − cum_s` over the shared value
  * grid, `D = max_v |cum_s·n_rest − cum_rest·n_s| / (n_s·n_rest)` — the
  * cross-multiplied ECDF difference, quantized by integral division to
  * ppm only at the end (DECIMAL(38)/HUGEINT keeps the product exact at
  * web scale).
  *
  * Scale shape: the corpus collapses to a (sources × distinct metric
  * values) grid in ONE partial-agg'd groupBy; every window after that
  * runs on the bounded grid (the metric domain — document lengths,
  * scores in fixed units — is value-bounded by construction, the same
  * contract as [[ChangePoint.cusumDaily]]'s calendar; pre-bucket truly
  * continuous metrics upstream).
  */
object DriftStats {

  def ksDriftBySource(df: DataFrame, valueCol: Column, sourceCol: String): DataFrame = {
    val base = df.select(col(sourceCol).as("src"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val values = counts.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      // bounded-grid global CDF (see scaladoc); tiny frame, single window.
      // n_all rides the same frame as a whole-frame window sum (r17: one
      // broadcast subplan + its job fewer than the separate scalar agg)
      .withColumn("cum_all", sum(col("cv")).over(Window.orderBy(col("v"))))
      .withColumn("n_all", sum(col("cv")).over(
        Window.partitionBy(lit(1))))
      .select(col("v"), col("cum_all"), col("n_all"))
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n_src"))
    val grid = totals.crossJoin(broadcast(values))
      .join(counts, Seq("src", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_src", sum(col("c")).over(
        Window.partitionBy(col("src")).orderBy(col("v"))))
    grid
      .select(col("src"), col("n_src"), (col("n_all") - col("n_src")).as("n_rest"),
        abs(expr("CAST(cum_src AS DECIMAL(38,0)) * (n_all - n_src) " +
          "- CAST(cum_all - cum_src AS DECIMAL(38,0)) * n_src")).as("_d"))
      .groupBy(col("src"))
      .agg(max(col("n_src")).as("n_src"), max(col("n_rest")).as("n_rest"),
        max(col("_d")).as("_dmax"))
      // one-source corpora have no "rest" to compare against: drop the
      // degenerate n_rest = 0 row (div-by-zero is engine-divergent — Spark
      // nulls, DuckDB raises), same guard shape as giniBySlice's sum_x > 0
      .filter(col("n_rest") > 0)
      .select(col("src"), col("n_src"), col("n_rest"),
        expr("CAST((_dmax * 1000000) div " +
          "(CAST(n_src AS DECIMAL(38,0)) * n_rest) AS BIGINT)").as("ks_ppm"))
  }

  /** Wasserstein-1 (earth mover's) distance per slice vs the rest of the
    * corpus — the integrated-shift drift metric in the VALUE's own units
    * (a 50-char median length shift reads as ~50), complementing KS
    * (max-point, unit-free) and PSI (binned, density-ratio): for 1-D
    * distributions W₁ = ∫ |F_s(v) − F_rest(v)| dv, which over the bounded
    * distinct-value grid is the exact integer sum
    * `Σ_i |cum_s·n_rest − cum_rest·n_s| · (v_{i+1} − v_i)` divided by
    * `n_s·n_rest`, reported in milli value-units. Same ONE partial-agg'd
    * (source × value) grid and n_rest > 0 guard as [[ksDriftBySource]];
    * the gap factor comes from a lead() on the tiny grid.
    */
  def wasserstein1BySource(df: DataFrame, valueCol: Column,
      sourceCol: String): DataFrame = {
    val base = df.select(col(sourceCol).as("src"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val values = counts.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("cum_all", sum(col("cv")).over(Window.orderBy(col("v"))))
      .withColumn("gap",
        lead(col("v"), 1).over(Window.orderBy(col("v"))) - col("v"))
      // n_all on the same tiny frame (see ksDriftBySource)
      .withColumn("n_all", sum(col("cv")).over(
        Window.partitionBy(lit(1))))
      .select(col("v"), col("cum_all"), col("gap"), col("n_all"))
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n_src"))
    totals.crossJoin(broadcast(values))
      .join(counts, Seq("src", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("cum_src", sum(col("c")).over(
        Window.partitionBy(col("src")).orderBy(col("v"))))
      .filter(col("gap").isNotNull) // last grid point spans no interval
      .select(col("src"), col("n_src"), (col("n_all") - col("n_src")).as("n_rest"),
        (abs(expr("CAST(cum_src AS DECIMAL(38,0)) * (n_all - n_src) " +
          "- CAST(cum_all - cum_src AS DECIMAL(38,0)) * n_src")) *
          col("gap")).as("_t"))
      .groupBy(col("src"))
      .agg(max(col("n_src")).as("n_src"), max(col("n_rest")).as("n_rest"),
        sum(col("_t")).as("_w"))
      .filter(col("n_rest") > 0)
      .select(col("src"), col("n_src"), col("n_rest"),
        expr("CAST((_w * 1000) div " +
          "(CAST(n_src AS DECIMAL(38,0)) * n_rest) AS BIGINT)").as("w1_milli"))
  }

  /** Population Stability Index per slice against the whole corpus — the
    * scorecard-monitoring drift number (rule of thumb: < 0.1 stable,
    * > 0.25 act), complementary to KS (which keys on the single worst
    * point; PSI integrates shift across the distribution).
    *
    * Bins are the corpus's 10 equal-count bins over the bounded value
    * grid: `bin(v) = ((cum_all(v) − 1)·10) div N`, so every engine and
    * every slice shares ONE binning. Per (slice, bin) with slice count c,
    * global count g: `term = (c·10⁶ div n_s − g·10⁶ div N) ·
    * round(ln((c·N)/(g·n_s))·10⁶) div 10⁶` micro-nats, summed over bins
    * where the slice has mass (empty-bin terms are skipped, documented —
    * the usual ε-smoothing is arbitrary and breaks exactness). Same
    * bounded-grid contract as [[ksDriftBySource]].
    */
  def psiBySource(df: DataFrame, valueCol: Column, sourceCol: String): DataFrame = {
    val base = df.select(col(sourceCol).as("src"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // r17: ONE binned dimension carries (bin, n_all) — n_all as a
    // whole-frame window sum instead of a separate scalar-agg broadcast —
    // and the per-bin global mass + per-src totals come from window sums
    // over the bounded (src × bin) frame instead of two more
    // broadcast-join subplans (each was its own Spark job at ~60-300 ms
    // of pure orchestration; the frame is ≤ sources × 10 rows by the
    // bounded-grid contract)
    val binned = counts.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("_cum", sum(col("cv")).over(Window.orderBy(col("v"))))
      .withColumn("n_all", sum(col("cv")).over(
        Window.partitionBy(lit(1))))
      .select(col("v"), expr("((_cum - 1) * 10) div n_all").as("bin"),
        col("n_all"))
    val withBin = counts.join(broadcast(binned), "v")
    val bySrc = withBin.groupBy(col("src"), col("bin"))
      .agg(sum(col("c")).as("c"), max(col("n_all")).as("n_all"))
    bySrc
      .withColumn("g", sum(col("c")).over(
        Window.partitionBy(col("bin"))))
      .withColumn("n_src", sum(col("c")).over(
        Window.partitionBy(col("src"))))
      .select(col("src"), col("n_src"),
        expr("""((c * 1000000 div n_src) - (g * 1000000 div n_all)) *
               |  CAST(round(ln((CAST(c AS DOUBLE) * CAST(n_all AS DOUBLE)) /
               |    (CAST(g AS DOUBLE) * CAST(n_src AS DOUBLE))) * 1000000.0)
               |    AS BIGINT) div 1000000""".stripMargin).as("_t"))
      .groupBy(col("src"))
      .agg(max(col("n_src")).as("n_src"), count(lit(1)).as("n_bins"),
        sum(col("_t")).as("psi_micro"))
  }

  /** Classical ε-smoothed PSI per slice — the variant every scorecard
    * library ships, beside [[psiBySource]]'s exact empty-bin-skip
    * contract (which is the reproducible one; smoothing is an arbitrary
    * ε choice, so it lives in its OWN operator and the exact one never
    * changes). Per (slice, bin) over the DENSE slice × bin grid (zero-mass
    * bins materialized — the whole point of smoothing is that a bin the
    * slice never hits contributes `(ε − q)·ln(ε/q)`):
    * `p = max(c·10⁶ div n_s, ε)`, `q = max(g·10⁶ div N, ε)` in ppm, term
    * `(p − q) · round(ln(p/q)·10⁶) div 10⁶` micro-nats. Same binning,
    * same bounded-grid shape, one extra broadcast of the ≤10-row bin dim.
    */
  def psiBySourceSmoothed(df: DataFrame, valueCol: Column, sourceCol: String,
      epsPpm: Long = 100L): DataFrame = {
    require(epsPpm > 0, s"epsPpm must be > 0, got $epsPpm")
    val base = df.select(col(sourceCol).as("src"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // binned carries n_all (window sum — see psiBySource); the dense
    // src × bin grid still needs the cross join (zero-mass bins are the
    // point of smoothing), but global rides it with n_all attached, so
    // the separate scalar broadcast goes away
    val binned = counts.groupBy(col("v")).agg(sum(col("c")).as("cv"))
      .withColumn("_cum", sum(col("cv")).over(Window.orderBy(col("v"))))
      .withColumn("n_all", sum(col("cv")).over(
        Window.partitionBy(lit(1))))
      .select(col("v"), expr("((_cum - 1) * 10) div n_all").as("bin"),
        col("n_all"))
    val withBin = counts.join(broadcast(binned), "v")
    val bySrc = withBin.groupBy(col("src"), col("bin")).agg(sum(col("c")).as("c"))
    val global = withBin.groupBy(col("bin"))
      .agg(sum(col("c")).as("g"), max(col("n_all")).as("n_all"))
    val totals = bySrc.groupBy(col("src")).agg(sum(col("c")).as("n_src"))
    val dense = totals.crossJoin(broadcast(global))
      .join(bySrc, Seq("src", "bin"), "left")
      .na.fill(0L, Seq("c"))
    dense
      .select(col("src"), col("n_src"),
        greatest(expr("c * 1000000 div n_src"), lit(epsPpm)).as("_p"),
        greatest(expr("g * 1000000 div n_all"), lit(epsPpm)).as("_q"))
      .select(col("src"), col("n_src"),
        expr("""(_p - _q) * CAST(round(ln(CAST(_p AS DOUBLE) /
               |  CAST(_q AS DOUBLE)) * 1000000.0) AS BIGINT)
               |div 1000000""".stripMargin).as("_t"))
      .groupBy(col("src"))
      .agg(max(col("n_src")).as("n_src"), count(lit(1)).as("n_bins"),
        sum(col("_t")).as("psi_micro"))
  }
}
