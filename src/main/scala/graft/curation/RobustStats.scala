package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Quantiles

/** Robust per-group outlier screening: median / MAD, the estimator pair
  * whose 50% breakdown point survives exactly the contamination (spam
  * bursts, truncated scrapes, template floods) that wrecks mean/stddev
  * z-scores — the outlier rule a corpus-length or quality-score column
  * actually needs.
  */
object RobustStats {

  /** Per-group median, MAD (median absolute deviation), and the count of
    * rows with `|v − med| · 10 > kTenths · mad` (kTenths = 35 ≈ the
    * classical 3.5σ-equivalent cut) — all exact integers: both medians are
    * type-1 order statistics from [[Quantiles.exactQuantiles]] (value at
    * rank ⌈n/2⌉ — the scalable histogram-refinement search, never a
    * per-group sort), deviations are integer absolute differences, and
    * the cut is cross-multiplied, so no engine ever divides.
    *
    * Groups whose MAD is 0 (a majority-constant column) flag every
    * off-median row — the correct reading for template-flood detection;
    * `mad` is emitted so consumers can gate on it.
    *
    * Two quantile searches + one counting pass over the persisted
    * (g, v) projection — each an O(log valueRange) sequence of
    * partial-agg'd histogram passes, nothing corpus-sized on the driver.
    */
  /** The row-filter twin of [[madOutliers]]: KEEP rows within the cut
    * (`|v − med| · 10 <= kTenths · mad`), dropping the outliers — the
    * composable screen a curation pipeline chains after dedup. Zero-MAD
    * groups (majority-constant) keep only their exact-median rows, the
    * same reading as the audit. Adds the two quantile searches on top of
    * the input plan; the returned frame preserves the caller's columns.
    */
  def madKeep(df: DataFrame, groupCol: String, valueCol: String,
      kTenths: Int = 35): DataFrame = {
    require(kTenths >= 0, s"kTenths must be >= 0, got $kTenths")
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = Quantiles.exactQuantiles(base, "g", "v", Seq(500000L))
      .select(col("g"), col("value").as("_graft_med"))
    val mad = Quantiles.exactQuantiles(
        base.join(broadcast(med), "g")
          .select(col("g"), abs(col("v") - col("_graft_med")).as("dv")),
        "g", "dv", Seq(500000L))
      .select(col("g"), col("value").as("_graft_mad"))
    // the join-side group key gets the _graft_ prefix like every other
    // helper column — a caller frame may legitimately own a column "g"
    val stats = med.join(mad, "g").withColumnRenamed("g", "_graft_g")
    df.join(broadcast(stats),
        col(groupCol).cast("string") === col("_graft_g"))
      .filter(abs(col(valueCol).cast("long") - col("_graft_med")) * 10
        <= lit(kTenths.toLong) * col("_graft_mad"))
      .drop("_graft_g", "_graft_med", "_graft_mad")
  }

  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      kTenths: Int = 35): DataFrame = {
    require(kTenths >= 0, s"kTenths must be >= 0, got $kTenths")
    val base = df.select(col(groupCol).cast("string").as("g"),
        col(valueCol).cast("long").as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = Quantiles.exactQuantiles(base, "g", "v", Seq(500000L))
      .select(col("g"), col("value").as("med"))
    val dev = base.join(broadcast(med), "g")
      .select(col("g"), col("v"), col("med"),
        abs(col("v") - col("med")).as("dv"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mad = Quantiles.exactQuantiles(dev.select(col("g"), col("dv")),
        "g", "dv", Seq(500000L))
      .select(col("g"), col("value").as("mad"))
    dev.join(broadcast(mad), "g")
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("dv") * 10 > lit(kTenths.toLong) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col("g"), col("n"), col("med"), col("mad"), col("n_outliers"),
        expr("(n_outliers * 1000000) div n").as("outlier_ppm"))
  }
}
