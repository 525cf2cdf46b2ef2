package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-sided CUSUM change-point detection over per-day event-type volumes —
  * the drift alarm a 100 TB ingest pipeline runs on its own telemetry
  * (crawler output collapsing, one source flooding, a schema break zeroing
  * a feed).
  *
  * Exact integer formulation: with D grid days and T total events of a
  * type, day i's deviation is `dev_i = c_i·D − T` (count·days units, mean
  * exactly 0 over the grid), and the one-sided CUSUM is
  * `S_i = max(0, S_{i−1} + dev_i)`. The alarm fires while
  * `S_i·10⁶ ≥ hPpm·T` — h in units of "mean-days of excess volume"
  * (S grows by T per day running at 2× the mean). No floats anywhere.
  *
  * Scale: the corpus-sized input collapses to a (types × days) grid in ONE
  * partial-agg'd groupBy — the recursion then runs on the tiny grid. The
  * per-type day array is bounded by the calendar (a year of days, not data
  * volume), same bounded-by-construction contract as `mixtureSample`'s
  * strata; `maxDays` makes it crash-proof.
  *
  * The day grid is the DENSE calendar `sequence(min(day), max(day))`, not
  * the distinct observed days: a calendar day with zero events
  * corpus-wide — a total outage, the loudest alarm this detector exists to
  * fire on — still contributes `dev = −T` to every type's CUSUM, matching
  * the streaming twin's silent-gap finalization.
  */
object ChangePoint {

  def cusumDaily(events: DataFrame, tsCol: String, typeCol: String,
      hPpm: Long, maxDays: Int = 4096): DataFrame = {
    require(hPpm > 0, s"hPpm must be > 0, got $hPpm")
    // ONE corpus scan: the grid-sized count frame is the only reduction;
    // day and type dimensions derive from it (days as the DENSE calendar
    // between min and max observed day, so silent days are on the grid)
    val counts = events.select(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = counts.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val nDays = days.limit(maxDays + 1).count() // bounded probe, fails fast
    if (nDays > maxDays) throw new IllegalArgumentException(
      s"cusumDaily: more than $maxDays grid days — the per-type fold is " +
        "calendar-bounded by contract; raise maxDays deliberately for " +
        "multi-decade grids")
    val types = counts.select(col("event_type")).distinct()
    val grid = types.crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val perType = grid.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"), col("c")))).as("_g"),
        sum(col("c")).as("tot"))
    // left fold over the bounded day array: acc = (running S, emitted rows)
    val folded = perType.select(col("event_type"), col("tot"),
      aggregate(col("_g"),
        struct(lit(0L).as("s"),
          array().cast("array<struct<day:date,c:bigint,s:bigint>>").as("out")),
        (acc, x) => struct(
          greatest(lit(0L), acc.getField("s") + x.getField("c") * size(col("_g")) - col("tot")).as("s"),
          concat(acc.getField("out"), array(struct(
            x.getField("day").as("day"), x.getField("c").as("c"),
            greatest(lit(0L), acc.getField("s") + x.getField("c") * size(col("_g")) - col("tot")).as("s"))))
            .as("out")),
        acc => acc.getField("out")).as("_rows"))
    folded.select(col("event_type"), col("tot"), explode(col("_rows")).as("r"))
      .select(col("event_type"), col("r.day").as("day"), col("r.c").as("c"),
        col("r.s").as("cusum"),
        (col("r.s") * 1000000L >= col("tot") * hPpm).as("alarm"))
  }

  /** Lag-k autocorrelation of per-day volume per event type — the
    * weekly-seasonality / trend-persistence report next to the CUSUM
    * alarm: `r_k = Σ_t dev_t·dev_{t+k} / Σ_t dev_t²` in exact ppm, where
    * `dev_t = c_t·D − T` is the same zero-mean integer deviation the
    * CUSUM uses (zero-filled dense grid, so silent days count — including
    * globally silent calendar days, same dense `sequence(min, max)` grid
    * as the CUSUM). The lag join is day-arithmetic on the bounded grid;
    * negative correlations divide consistently (both engines truncate
    * toward zero). Constant series (den 0) report null.
    */
  def dailyAutocorrelation(events: DataFrame, tsCol: String, typeCol: String,
      lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"bad lags $lags")
    // same one-scan shape as cusumDaily: dims derive from the count frame
    val counts = events.select(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = counts.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val types = counts.select(col("event_type")).distinct()
    val stats = counts.groupBy(col("event_type"))
      .agg(sum(col("c")).as("tot"))
    val dd = days.agg(count(lit(1)).as("nd"))
    val grid = types.crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(stats), "event_type")
      .crossJoin(broadcast(dd))
      .select(col("event_type"), col("day"),
        (col("c") * col("nd") - col("tot")).as("dev"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val den = grid.groupBy(col("event_type"))
      .agg(sum(expr("CAST(dev AS DECIMAL(38,0)) * dev")).as("_den"))
    val lagDim = grid.sparkSession.createDataFrame(
      lags.map(l => Tuple1(l))).toDF("lag")
    grid.as("a").crossJoin(broadcast(lagDim))
      .join(grid.as("b"),
        col("a.event_type") === col("b.event_type") &&
          expr("date_add(a.day, lag)") === col("b.day"))
      .groupBy(col("a.event_type").as("event_type"), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(expr("CAST(a.dev AS DECIMAL(38,0)) * b.dev")).as("_num"))
      .join(broadcast(den), "event_type")
      .select(col("event_type"), col("lag").cast("int").as("lag"), col("n_pairs"),
        when(col("_den") > 0,
          expr("CAST((_num * 1000000) div _den AS BIGINT)")).as("r_ppm"))
  }

  /** Day-of-week seasonality χ² per event type — the "is this feed's
    * weekly rhythm real" test next to the autocorrelation report: observed
    * volume per weekday vs the uniform-rate expectation, where the
    * expectation honors how many of EACH weekday the dense calendar span
    * actually contains (`exp_w = tot·d_w / D` — a Monday-to-Wednesday span
    * is not 1/7 per weekday). Exact integers: per-weekday deviation
    * `dev_num = obs_w·D − tot·d_w` (zero iff exactly uniform), per-term
    * `term_micro = ⌊dev_num²·10⁶ / (D·tot·d_w)⌋` (algebraically exactly
    * the χ² term ×10⁶), `chi2_micro` the per-type total.
    * Weekdays are 0=Sunday..6 (Spark `dayofweek − 1` ≡ DuckDB
    * `dayofweek`). Types with no events and weekdays absent from the
    * span (d_w = 0, only for sub-week grids) are dropped in both engines.
    *
    * Same one-scan shape as [[cusumDaily]]: the corpus collapses to the
    * (type, day) count frame; the weekday marginals come from the bounded
    * calendar; everything after is arithmetic on a (types × 7) frame.
    */
  /** Wald's Sequential Probability Ratio Test over per-day event-type
    * volumes — the SEQUENTIAL complement of [[cusumDaily]]: CUSUM alarms
    * on sustained deviation from an in-sample mean; SPRT tests two
    * explicit Poisson hypotheses (H0: the baseline week's daily rate λ0,
    * H1: rate λ1 = 1.5·λ0) with CONTROLLED error rates, stopping the
    * moment the evidence crosses either Wald boundary:
    *   per test day with count k:  llr = k·ln(λ1/λ0) − (λ1 − λ0)
    *   reject H0 when Σllr ≥ ln((1−β)/α);  accept when ≤ ln(β/(1−α))
    * with α = β = 0.05. Baseline λ0 is the mean daily count over the
    * first `baselineDays` grid days; testing starts the day after.
    *
    * Cross-engine determinism: ln(λ1/λ0) = ln(1.5) and the two Wald
    * boundaries are computed ONCE here and embedded as the same double
    * literal in both engines, so only IEEE mult/sub/div (bit-exact) and a
    * shared round-to-micro per DAY remain; the cumulative sum then runs
    * in exact integers. Returns one row per type: (event_type,
    * lam0_micro, n_test_days, decision ∈ reject_h0|accept_h0|continue,
    * decision_day — FIRST boundary crossing, null while continuing —
    * final_llr_micro).
    *
    * Scale shape: identical to [[cusumDaily]] — one partial-agg'd
    * (types × days) grid reduction, cumulative sums and decisions on the
    * calendar-bounded grid.
    */
  def sprtDaily(events: DataFrame, tsCol: String, typeCol: String,
      baselineDays: Int = 7): DataFrame = {
    require(baselineDays >= 1, s"baselineDays must be >= 1, got $baselineDays")
    val lnRatio = math.log(1.5)
    val aMicro = math.round(math.log(19.0) * 1e6) // ln((1-β)/α), α=β=0.05
    val bMicro = -aMicro                          // ln(β/(1-α)) symmetric
    val counts = events.select(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = counts.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val types = counts.select(col("event_type")).distinct()
    val grid = types.crossJoin(broadcast(days))
      .join(counts, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))))
    val lam0 = grid.filter(col("rn") <= baselineDays)
      .groupBy(col("event_type"))
      .agg((sum(col("c")).cast("double") / baselineDays.toDouble)
        .as("lam0"))
    val llr = grid.filter(col("rn") > baselineDays)
      .join(lam0, Seq("event_type"))
      .withColumn("llr_micro",
        round((col("c").cast("double") * lit(lnRatio)
          - lit(0.5) * col("lam0")) * 1e6).cast("long"))
      .withColumn("cum_micro", sum(col("llr_micro")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .withColumn("dec",
        when(col("cum_micro") >= aMicro, lit("reject_h0"))
          .when(col("cum_micro") <= bMicro, lit("accept_h0")))
    llr.groupBy(col("event_type"))
      .agg(max(round(col("lam0") * 1e6).cast("long")).as("lam0_micro"),
        count(lit(1)).as("n_test_days"),
        expr("min_by(dec, day) FILTER (WHERE dec IS NOT NULL)")
          .as("first_dec"),
        min(when(col("dec").isNotNull, col("day"))).as("decision_day"),
        expr("max_by(cum_micro, day)").as("final_llr_micro"))
      .select(col("event_type"), col("lam0_micro"), col("n_test_days"),
        coalesce(col("first_dec"), lit("continue")).as("decision"),
        col("decision_day"), col("final_llr_micro"))
  }

  def dowSeasonality(events: DataFrame, tsCol: String,
      typeCol: String): DataFrame = {
    val counts = events.select(col(typeCol).as("event_type"),
        to_date(col(tsCol)).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = counts.agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
      .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
      .select(col("day"), (dayofweek(col("day")) - 1).cast("long").as("dow"))
    val dowDim = days.groupBy(col("dow")).agg(count(lit(1)).as("days_w"))
    val dd = days.agg(count(lit(1)).as("nd"))
    val obs = counts
      .select(col("event_type"),
        (dayofweek(col("day")) - 1).cast("long").as("dow"), col("c"))
      .groupBy(col("event_type"), col("dow"))
      .agg(sum(col("c")).as("obs"))
    val tot = counts.groupBy(col("event_type")).agg(sum(col("c")).as("tot"))
    val cells = tot.crossJoin(broadcast(dowDim))
      .join(obs, Seq("event_type", "dow"), "left")
      .na.fill(0L, Seq("obs"))
      .crossJoin(broadcast(dd))
      .filter(col("tot") > 0 && col("days_w") > 0)
      .select(col("event_type"), col("dow"), col("days_w"), col("obs"),
        (col("obs") * col("nd") - col("tot") * col("days_w")).as("dev_num"),
        expr("""CAST((CAST(obs * nd - tot * days_w AS DECIMAL(38,0))
               |  * (obs * nd - tot * days_w) * 1000000)
               |  div (CAST(nd AS DECIMAL(38,0)) * tot * days_w) AS BIGINT)"""
          .stripMargin).as("term_micro"))
    val chi = cells.groupBy(col("event_type"))
      .agg(sum(col("term_micro")).as("chi2_micro"))
    cells.join(broadcast(chi), "event_type")
      .select(col("event_type"), col("dow"), col("days_w"), col("obs"),
        col("dev_num"), col("term_micro"), col("chi2_micro"))
  }
}
