package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel and cohort-retention analytics over an event log — the
  * two classic product/pipeline progress reports (how far do users get
  * through a staged flow; how long do cohorts stay active), built scale-
  * first: every pass is keyed by user, so the whole computation rides ONE
  * hash partitioning that Catalyst reuses across the chained window
  * projections and the final per-user aggregate. No self-join of the event
  * log, no collect, no per-stage scan — stage k's "earliest qualifying
  * time" is a conditional window min that references stage k-1's column.
  *
  * At 100 TB the event log shuffles once by user; skew is bounded by the
  * busiest user (same bound as [[Sessions]]); the funnel/retention outputs
  * are per-user / per-(cohort, offset) — many orders of magnitude smaller
  * than the input.
  */
object Funnel {

  /** Per-user ordered funnel: for `stages = Seq(a, b, c, ...)` find
    * t1 = min ts of an `a` event, t2 = min ts of a `b` event STRICTLY after
    * t1, t3 = min ts of a `c` event strictly after t2, … — the standard
    * strict-sequence funnel (an earlier `b` that precedes the first `a`
    * does not count). `horizonSec`, when set, additionally requires each
    * step to land within that many seconds of the PREVIOUS step's time
    * (per-step conversion window, not whole-funnel).
    *
    * Output: one row per user — `user_id`, `stage` (0..n stages reached),
    * and `us_to_stageK` epoch-micro deltas from the previous stage (null
    * where the stage wasn't reached).
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String],
      horizonSec: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val w = Window.partitionBy(col(userCol))
    val base = events.select(col(userCol).as("user_id"),
      col(tsCol).as("_graft_ts"), col(typeCol).as("_graft_et"))
    val staged = stages.zipWithIndex.foldLeft(base) { case (df, (st, i)) =>
      val hit = col("_graft_et") === lit(st)
      val cond =
        if (i == 0) hit
        else {
          val prev = col(s"_graft_t$i") // 1-based: stage i-1 wrote _graft_t{i}
          val after = hit && prev.isNotNull && col("_graft_ts") > prev
          horizonSec.fold(after)(h => after &&
            unix_micros(col("_graft_ts")) <= unix_micros(prev) + h * 1000000L)
        }
      df.withColumn(s"_graft_t${i + 1}",
        min(when(cond, col("_graft_ts"))).over(w))
    }
    val n = stages.size
    val tCols = (1 to n).map(i => min(col(s"_graft_t$i")).as(s"_graft_t$i"))
    val perUser = staged.groupBy(col("user_id"))
      .agg(tCols.head, tCols.tail: _*)
    // ascending fold so the HIGHEST reached stage's `when` lands outermost
    val stage = (1 to n).foldLeft(lit(0)) { (acc, i) =>
      when(col(s"_graft_t$i").isNotNull, lit(i)).otherwise(acc)
    }
    val deltas = (2 to n).map(i =>
      (unix_micros(col(s"_graft_t$i")) - unix_micros(col(s"_graft_t${i - 1}")))
        .as(s"us_to_stage$i"))
    perUser.select(col("user_id") +: stage.cast("int").as("stage") +: deltas: _*)
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * count every adjacent (prev_type → type) pair in (ts, tieBreak) order
    * within each user's stream and normalize rows to transition
    * probabilities in exact integer ppm. One user-keyed window pass (the
    * q34 lag shape) + a types²-sized aggregate; the row marginals broadcast
    * back onto the tiny matrix.
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String, typeCol: String): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreakCol))
    val counts = events
      .withColumn("_graft_prev", lag(col(typeCol), 1).over(byUser))
      .filter(col("_graft_prev").isNotNull)
      .groupBy(col("_graft_prev").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    val marginals = counts.groupBy(col("from_type"))
      .agg(sum(col("n")).as("_graft_tot"))
    counts.join(broadcast(marginals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div _graft_tot").as("p_ppm"))
  }

  /** Weekly cohort retention: cohort = ISO week of the user's first event;
    * a user counts as retained at offset k if they have ANY event in the
    * k-th week after their cohort week. Output: one row per
    * (cohort_week, offset_weeks) with the distinct-user count and the
    * retention rate in ppm of the cohort's size (offset 0 is the cohort
    * size itself by construction).
    *
    * Shape: the cohort assignment is a per-user window min over the
    * week-truncated events (one user-keyed shuffle); the distinct
    * (cohort, week, user) triples partial-aggregate before the final
    * count, and cohort sizes broadcast back onto the tiny result.
    */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
    val weekUs = 7L * 86400L * 1000000L
    val active = events
      .select(col(userCol).as("user_id"),
        date_trunc("week", col(tsCol)).as("_graft_wk"))
      .withColumn("_graft_cohort", min(col("_graft_wk")).over(w))
      .select(col("_graft_cohort").as("cohort_week"),
        expr(s"(unix_micros(_graft_wk) - unix_micros(_graft_cohort)) div $weekUs")
          .as("offset_weeks"),
        col("user_id"))
      .distinct()
    val counts = active
      .groupBy(col("cohort_week"), col("offset_weeks"))
      .agg(countDistinct(col("user_id")).as("n_users"))
    val sizes = counts.filter(col("offset_weeks") === 0L)
      .select(col("cohort_week"), col("n_users").as("_graft_n0"))
    counts.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("offset_weeks"), col("n_users"),
        expr("(n_users * 1000000) div _graft_n0").as("retained_ppm"))
  }

  /** Per-user inter-arrival burstiness: the index of dispersion
    * `D = Var(gap)/Mean(gap)` over the gaps (in whole seconds) between a
    * user's consecutive events — D ≈ mean for a Poisson user, ≫ mean for a
    * bursty bot/batch writer, the standard traffic-shape triage signal.
    *
    * Exact integers: gaps are `µs-diff div 10⁶`; with n gaps, Σg and Σg²,
    * `D·10³ = (n·Σg² − (Σg)²)·10³ div (n·Σg)` — the numerator is ≥ 0 by
    * Cauchy–Schwarz and the denominator > 0 whenever any gap is, so
    * truncating division agrees across engines. One user-keyed shuffle
    * (the lag window and the aggregate share the partitioning); output is
    * one row per user with ≥ 2 events and a positive gap sum.
    */
  def interArrivalDispersion(events: DataFrame, userCol: String,
      tsCol: String, idCol: String): DataFrame = {
    events
      .select(col(userCol).as("user_id"), unix_micros(col(tsCol)).as("_graft_us"),
        col(idCol).as("_graft_id"))
      .withColumn("_graft_gap",
        expr("(_graft_us - lag(_graft_us) over (partition by user_id " +
          "order by _graft_us, _graft_id)) div 1000000"))
      .filter(col("_graft_gap").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("_graft_gap")).as("sum_gap_s"),
        sum(col("_graft_gap") * col("_graft_gap")).as("_graft_sg2"))
      .filter(col("sum_gap_s") > 0)
      .select(col("user_id"), col("n_gaps"), col("sum_gap_s"),
        expr("(n_gaps * _graft_sg2 - sum_gap_s * sum_gap_s) * 1000 " +
          "div (n_gaps * sum_gap_s)").as("dispersion_milli"))
  }
}
