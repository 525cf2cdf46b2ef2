package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch session-window aggregation — the bounded-data twin of
  * `streaming.StreamingIngest.streamingSessionWindowsEventTime`: gap-based
  * session ids assigned with one per-user window pass (lag + running sum,
  * exactly the q34 shape), then one partial aggregate to a (user, session)
  * row carrying start/end/count. Two shuffles total, both keyed by user —
  * AQE coalesces them; the window never sees more than one user's events
  * per partition, so skew is bounded by the busiest user.
  */
object Sessions {

  /** The per-event session-id assignment (lag + strictly-greater gap test +
    * running sum over one per-user window): input columns plus
    * `session_id`, numbered from 1 per user in (ts, tieBreak) order. The
    * single definition of the gap semantics — q34's per-event view and the
    * window aggregate both build on it.
    */
  def assignSessionIds(events: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieBreakCol))
    events
      .withColumn("_graft_prev_ts", lag(col(tsCol), 1).over(byUser))
      .withColumn("_graft_new_session",
        when(col("_graft_prev_ts").isNull ||
          unix_micros(col(tsCol)) - unix_micros(col("_graft_prev_ts")) >
            gapSeconds * 1000000L, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_graft_new_session")).over(byUser
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_graft_prev_ts", "_graft_new_session")
  }

  /** one row per (user, session): session_id, start/end in epoch micros,
    * event count. Timestamps surface as BIGINT micros so cross-engine
    * comparisons never hit sub-microsecond parquet precision.
    */
  def sessionWindows(events: DataFrame, userCol: String, tsCol: String,
      tieBreakCol: String, gapSeconds: Long): DataFrame =
    assignSessionIds(events, userCol, tsCol, tieBreakCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(min(unix_micros(col(tsCol))).as("session_start_us"),
        max(unix_micros(col(tsCol))).as("session_end_us"),
        count(lit(1)).as("n_events"))
}
