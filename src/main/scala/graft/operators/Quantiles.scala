package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed order statistics: value at rank ⌈q·n⌉ (type-1 /
  * discrete quantile, 1-based ascending) per group, by iterative histogram
  * refinement — the scalable alternative to the per-group sort that exact
  * medians naively require (a window sort puts each group's every row
  * through one task; percentile_approx trades exactness away).
  *
  * Each round buckets every active search's remaining [lo, hi] value range
  * into `bins` equi-width integer cells with ONE partial-aggregated pass
  * over the (persisted) fact table, narrows each search to the cell
  * containing its target rank, and repeats until the cell's ROW population
  * fits `smallEnough`; the terminal in-cell selection sorts one bounded
  * collect_list per search. O(log_bins(valueRange)) passes total — at
  * 100 TB with 64 bins and cent-valued money columns that is ≤ 6 passes,
  * each a map-side-combined aggregate, never a full shuffle of the facts.
  *
  * The weighted variant ranks on cumulative WEIGHT (⌈q·W⌉ over total
  * weight W) — "the document length below which half the corpus TOKENS
  * sit", the form batching and mixture decisions actually need; rows with
  * non-positive weight are dropped.
  *
  * Search state lives on the driver: one row per (group, quantile) —
  * bounded by construction for profiling workloads (groups are flags /
  * sources / languages), made crash-proof by `maxSearches` exactly like
  * `Sampling.mixtureSample`'s stratum guard.
  *
  * Values must be integer-valued longs (quantize money upstream — the q49
  * integer-cents scheme); groups must be strings.
  */
object Quantiles {

  private case class Search(g: String, qPpm: Long, n: Long, rank: Long,
      var lo: Long, var hi: Long, var r: Long, var done: Boolean)

  /** g, q_ppm, n, rank, value — exact value at rank ⌈q_ppm·n/1e6⌉ per group */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qsPpm: Seq[Long], bins: Int = 64, smallEnough: Int = 8192,
      maxSearches: Int = 100000): DataFrame =
    core(df, groupCol, valueCol, None, qsPpm, bins, smallEnough, maxSearches)

  /** [[exactQuantiles]] ranking on cumulative weight: value v such that
    * the total weight of rows with value ≤ v first reaches ⌈q·W⌉. `n` in
    * the output is total weight W.
    */
  def exactWeightedQuantiles(df: DataFrame, groupCol: String,
      valueCol: String, weightCol: String, qsPpm: Seq[Long], bins: Int = 64,
      smallEnough: Int = 8192, maxSearches: Int = 100000): DataFrame =
    core(df, groupCol, valueCol, Some(weightCol), qsPpm, bins, smallEnough,
      maxSearches)

  private def core(df: DataFrame, groupCol: String, valueCol: String,
      weightCol: Option[String], qsPpm: Seq[Long], bins: Int,
      smallEnough: Int, maxSearches: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    require(smallEnough >= 1, s"smallEnough must be >= 1")
    require(qsPpm.nonEmpty && qsPpm.forall(q => q > 0 && q <= 1000000L),
      s"quantiles must be in (0, 1e6] ppm, got $qsPpm")
    val spark = df.sparkSession
    import spark.implicits._

    val base0 = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v"),
      weightCol.map(w => col(w).cast("long")).getOrElse(lit(1L)).as("w"))
    val base = (if (weightCol.isDefined) base0.filter($"w" > 0) else base0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val stats = base.groupBy($"g")
        .agg(sum($"w").as("n"), count(lit(1)).as("rows"),
          min($"v").as("lo"), max($"v").as("hi"))
        .collect()
      require(stats.length.toLong * qsPpm.size <= maxSearches,
        s"${stats.length} groups x ${qsPpm.size} quantiles exceeds " +
          s"maxSearches=$maxSearches; exact quantiles keep per-search state " +
          "on the driver — raise the cap only if that product is truly bounded")
      val searches = stats.flatMap { row =>
        val (g, n, nRows) = (row.getString(0), row.getLong(1), row.getLong(2))
        val (lo, hi) = (row.getLong(3), row.getLong(4))
        qsPpm.map { q =>
          val rank = (q * n + 999999L) / 1000000L
          // a group already small enough skips refinement entirely
          Search(g, q, n, rank, lo, hi, rank, done = nRows <= smallEnough)
        }
      }

      // refinement rounds: one aggregate pass each, all searches advance
      var guard = 0
      while (searches.exists(s => !s.done && s.lo < s.hi) && guard < 64) {
        guard += 1
        val active = searches.filter(s => !s.done && s.lo < s.hi)
        val spec = spark.createDataFrame(active.toSeq
            .map(s => (s.g, s.qPpm, s.lo, s.hi)))
          .toDF("g", "q_ppm", "lo", "hi")
        val counts = base.join(broadcast(spec), Seq("g"))
          .filter($"v" >= $"lo" && $"v" <= $"hi")
          .withColumn("cw", expr(s"(hi - lo + $bins) div $bins"))
          .groupBy($"g", $"q_ppm", expr("(v - lo) div cw").as("cell"))
          .agg(sum($"w").as("wsum"), count(lit(1)).as("rows"))
          .collect()
          .groupBy(r => (r.getString(0), r.getLong(1)))
          .map { case (k, rs) =>
            k -> rs.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
              .sortBy(_._1)
          }
        active.foreach { s =>
          val cells = counts((s.g, s.qPpm))
          val w = (s.hi - s.lo + bins) / bins
          var cum = 0L
          var i = 0
          while (cum + cells(i)._2 < s.r) { cum += cells(i)._2; i += 1 }
          val (cell, _, cellRows) = cells(i)
          s.r -= cum
          s.lo = s.lo + cell * w
          s.hi = math.min(s.hi, s.lo + w - 1)
          if (cellRows <= smallEnough) s.done = true
        }
      }
      require(guard < 64, "quantile refinement failed to converge")

      val (direct, terminal) = searches.partition(s => s.lo == s.hi)
      val directDf = spark.createDataFrame(direct.toSeq
          .map(s => (s.g, s.qPpm, s.n, s.rank, s.lo)))
        .toDF("g", "q_ppm", "n", "rank", "value")
      if (terminal.isEmpty) directDf
      else {
        // terminal in-cell selection: ROW population <= smallEnough per
        // search; walk the sorted (v, w) list to the residual weight rank
        val spec = spark.createDataFrame(terminal.toSeq
            .map(s => (s.g, s.qPpm, s.n, s.rank, s.lo, s.hi, s.r)))
          .toDF("g", "q_ppm", "n", "rank", "lo", "hi", "r")
        val picked = base.join(broadcast(spec), Seq("g"))
          .filter($"v" >= $"lo" && $"v" <= $"hi")
          .groupBy($"g", $"q_ppm", $"n", $"rank", $"r")
          .agg(sort_array(collect_list(struct($"v", $"w"))).as("vs"))
          .select($"g", $"q_ppm", $"n", $"rank",
            expr("""aggregate(vs, named_struct('c', CAST(0 AS BIGINT),
                   |    'res', CAST(NULL AS BIGINT)),
                   |  (acc, x) -> IF(acc.res IS NOT NULL, acc,
                   |    named_struct('c', acc.c + x.w,
                   |      'res', IF(acc.c + x.w >= r, x.v,
                   |        CAST(NULL AS BIGINT))))).res""".stripMargin)
              .as("value"))
        directDf.unionByName(picked)
      }
    } finally base.unpersist()
  }
}
