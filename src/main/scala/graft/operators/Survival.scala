package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival over user activity lifetimes — the product-limit
  * retention curve (how long does a user/source/crawl seed stay active)
  * with correct right-censoring: a user still active on the last observed
  * day hasn't churned, they're censored — dropping them (or counting them
  * as churned) biases the curve, which is exactly the mistake the naive
  * retention query makes.
  *
  * Lifetime t = last-active-day − first-active-day (days); churn is
  * OBSERVED iff the user's last activity predates the global end of
  * observation, else the lifetime is censored at t. At each distinct
  * lifetime: n_t = Σ_{s≥t}(d_s + c_s) at risk, and the survival recursion
  * `S(t) = S(t−)·(n_t − d_t)/n_t` quantized per step to integer micro
  * units (`S_micro·(n−d) div n` — deterministic truncation both engines).
  *
  * Scale: the event log collapses to per-user (first, last) in one
  * user-keyed partial agg, then to a lifetime histogram whose size is
  * bounded by the observation window in days (the [[ChangePoint]]
  * calendar contract) — the sequential product runs on that tiny bounded
  * array, never on data-scaled rows.
  */
object Survival {

  def kaplanMeierDaily(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    // ONE corpus scan: the per-user span is the only reduction; the
    // observation horizon derives from it (max last-active = max day)
    val span = events.select(col(userCol).as("user_id"),
        to_date(col(tsCol)).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val horizon = span.agg(max(col("last_day")).as("end_day"))
    val lives = span.crossJoin(broadcast(horizon))
      .select(datediff(col("last_day"), col("first_day")).cast("long").as("t"),
        (col("last_day") < col("end_day")).as("churned"))
    val hist = lives.groupBy(col("t"))
      .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("d"),
        sum(when(col("churned"), 0L).otherwise(1L)).as("c"))
    // bounded by the observation window in days: fold the sorted histogram
    val folded = hist
      .groupBy()
      .agg(sort_array(collect_list(struct(col("t"), col("d"), col("c")))).as("_h"),
        sum(col("d") + col("c")).as("_n0"))
      .select(expr("""aggregate(_h,
        |  named_struct(
        |    'at_risk', _n0, 's', CAST(1000000 AS BIGINT),
        |    'out', CAST(array() AS
        |      array<struct<t:bigint,n_risk:bigint,d:bigint,c:bigint,s_micro:bigint>>)),
        |  (acc, x) -> named_struct(
        |    'at_risk', acc.at_risk - x.d - x.c,
        |    's', (acc.s * (acc.at_risk - x.d)) div acc.at_risk,
        |    'out', concat(acc.out, array(named_struct(
        |      't', x.t, 'n_risk', acc.at_risk, 'd', x.d, 'c', x.c,
        |      's_micro', (acc.s * (acc.at_risk - x.d)) div acc.at_risk)))),
        |  acc -> acc.out)""".stripMargin).as("_rows"))
    folded.select(explode(col("_rows")).as("r")).select(col("r.*"))
  }
}
