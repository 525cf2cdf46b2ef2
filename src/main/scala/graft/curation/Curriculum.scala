package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Curriculum phase assignment — order a corpus by a per-document score
  * and cut it into `nPhases` equal-count stages (easy→hard scheduling for
  * staged pre-training). The naive formulation (`ntile` over a global
  * ORDER BY) funnels the corpus through ONE partition; here the cuts come
  * from the score HISTOGRAM instead: integer scores partial-aggregate to a
  * bounded (score → count) frame, the phase boundaries are read off its
  * cumulative counts, and every document gets its phase by comparing
  * against the broadcast boundary list — one bounded exchange, no global
  * sort, no corpus-sized window.
  *
  * Boundary rule (exact integer rationals, no float quantiles): boundary i
  * (1-based, i < nPhases) is the smallest score whose cumulative count
  * reaches i/nPhases of the corpus (`cum * nPhases >= i * N`); a document
  * lands in phase `1 + |{i : boundary_i < score}|`. Ties share a phase by
  * construction (equal scores are indistinguishable to a curriculum), so
  * phases are equal-sized only up to tie mass — the honest semantics, vs
  * ntile's arbitrary tie splits.
  */
object Curriculum {

  /** `df` plus a `phase` column in 1..nPhases (1 = lowest scores).
    * `scoreCol` must be integral (the repo's ppm-score convention keeps
    * the histogram bounded by the score domain, ≤ ~1e6 rows).
    */
  def assignPhases(df: DataFrame, scoreCol: Column,
      nPhases: Int): DataFrame = {
    require(nPhases >= 2, s"nPhases must be >= 2, got $nPhases")
    val hist = df.select(scoreCol.cast("long").as("_graft_s"))
      .groupBy(col("_graft_s")).agg(count(lit(1)).as("_graft_c"))
    // bounded frame: the windows run over ≤ |score domain| rows
    val cum = hist
      .withColumn("_graft_cum", sum(col("_graft_c")).over(
        Window.orderBy(col("_graft_s"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_graft_n", sum(col("_graft_c")).over(
        Window.partitionBy(lit(1))))
    val bounds = cum
      .select(col("_graft_s"), col("_graft_cum"), col("_graft_n"),
        explode(sequence(lit(1L), lit((nPhases - 1).toLong)))
          .as("_graft_i"))
      .filter(col("_graft_cum") * nPhases >= col("_graft_i") * col("_graft_n"))
      .groupBy(col("_graft_i")).agg(min(col("_graft_s")).as("_graft_b"))
    val boundArr = bounds
      .agg(sort_array(collect_list(col("_graft_b"))).as("_graft_bs"))
    df.crossJoin(broadcast(boundArr))
      .withColumn("phase",
        (lit(1) + size(filter(col("_graft_bs"),
          b => b < scoreCol.cast("long")))).cast("int"))
      .drop("_graft_bs")
  }
}
