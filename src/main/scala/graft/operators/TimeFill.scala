package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-grid imputation: resample an irregular per-key event stream onto a
  * fixed step grid and forward-fill gaps with the last observation
  * (LOCF) — the feature-engineering primitive behind "value of X as of every
  * hour" training frames and gap-tolerant monitoring rollups. Distinct from
  * the as-of JOIN (q51): there a probe table brings its own timestamps;
  * here the grid is generated, so coverage is uniform by construction.
  *
  * Semantics: the grid spans each key's [min, max] observation slot
  * (half-open slots of `stepSeconds`, aligned to the epoch). A slot's value
  * is the LAST observation inside it (max event time; exact-tie ties take
  * the max value, a total, engine-portable rule); empty slots inherit the
  * previous slot's value with `filled = true`.
  *
  * Scale shape: slot assignment and slot-level last-observation collapse are
  * partial-agg'd `groupBy`s (one shuffle); grid generation is a per-key
  * `sequence` + `explode` (rows ∝ span/step per key, documented); the fill
  * itself is the gaps-and-islands trick — a running non-null count assigns
  * each gap row to its island, `max` over (key, island) propagates the
  * value — two per-key-partitioned windows, skew bounded by the longest
  * single key's grid, never a global sort.
  */
object TimeFill {

  /** (keyCol, slot_start, value_cents, filled) on a `stepSeconds` grid;
    * `value_cents` = round(value·100) of the slot's last observation. */
  def locfGrid(events: DataFrame, keyCol: String, tsCol: String,
      valCol: String, stepSeconds: Long): DataFrame = {
    require(stepSeconds > 0, s"stepSeconds must be positive, got $stepSeconds")
    val stepUs = stepSeconds * 1000000L
    val obs = events.select(col(keyCol).as("k"),
        unix_micros(col(tsCol)).cast("long").as("_graft_us"),
        round(col(valCol) * 100).cast("long").as("_graft_cents"))
      .withColumn("slot", expr(s"_graft_us div ${stepUs}L"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // last observation per occupied slot: max event time, ties → max value
    val slotLast = obs.groupBy(col("k"), col("slot"))
      .agg(max(col("_graft_us")).as("_graft_last"))
      .join(obs, Seq("k", "slot"))
      .filter(col("_graft_us") === col("_graft_last"))
      .groupBy(col("k"), col("slot"))
      .agg(max(col("_graft_cents")).as("_graft_v"))
    val spans = obs.groupBy(col("k"))
      .agg(min(col("slot")).as("_graft_lo"), max(col("slot")).as("_graft_hi"))
    val grid = spans.select(col("k"),
      explode(sequence(col("_graft_lo"), col("_graft_hi"))).as("slot"))
    val wOrd = Window.partitionBy(col("k")).orderBy(col("slot"))
    val joined = grid.join(slotLast, Seq("k", "slot"), "left")
      .withColumn("_graft_isl", count(col("_graft_v")).over(wOrd))
    val wIsl = Window.partitionBy(col("k"), col("_graft_isl"))
    joined
      .select(col("k").as(keyCol),
        timestamp_micros(col("slot") * lit(stepUs)).as("slot_start"),
        max(col("_graft_v")).over(wIsl).as("value_cents"),
        col("_graft_v").isNull.as("filled"))
  }
}
