package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Mann–Whitney U between every pair of corpus slices — the
  * nonparametric "is slice A's metric stochastically larger than B's"
  * comparison (the right tool when distributions are skewed and means
  * mislead), with the rank-biserial effect size `1 − 2U/(n₁n₂)` in ppm.
  *
  * Tie-exact integer formulation: pooled average ranks double to stay
  * integral (`r₂(v) = 2·#{< v} + #{= v} + 1`), so
  * `2R₁ = Σ_v c_a(v)·r₂(v)` and `2U₁ = 2n₁n₂ + n₁(n₁+1) − 2R₁` are exact;
  * the effect size divides once at the end. DECIMAL(38)/HUGEINT covers
  * web-scale counts.
  *
  * Scale: one partial-agg'd (slice, value) count is the only corpus-sized
  * exchange; the pairwise stage runs on the (slices² × value grid)
  * bounded frame — the [[DriftStats]] grid contract (slices are sources/
  * languages; the metric domain is value-bounded).
  */
object RankCompare {

  def mannWhitneyPairs(df: DataFrame, valueCol: Column,
      sourceCol: String): DataFrame = {
    val base = df.select(col(sourceCol).as("src"), valueCol.cast("long").as("v"))
    val counts = base.groupBy(col("src"), col("v")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val values = counts.select(col("v")).distinct()
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val grid = totals.crossJoin(broadcast(values))
      .join(counts, Seq("src", "v"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("_cum", sum(col("c")).over(
        Window.partitionBy(col("src")).orderBy(col("v"))))
      .select(col("src"), col("v"), col("c"), col("n"),
        (col("_cum") - col("c")).as("_lt"))
    grid.as("a").join(grid.as("b"),
        col("a.v") === col("b.v") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        col("a.n").as("n_a"), col("b.n").as("n_b"),
        (col("a.c") * (lit(2L) * (col("a._lt") + col("b._lt"))
          + col("a.c") + col("b.c") + lit(1L))).as("_t"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        sum(col("_t")).as("_r2"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        expr("2 * n_a * n_b + n_a * (n_a + 1) - _r2").as("u2x"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("u2x"),
        expr("""CAST(1000000 - (CAST(u2x AS DECIMAL(38,0)) * 1000000) div
               |  (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"""
          .stripMargin).as("rb_ppm"))
  }
}
