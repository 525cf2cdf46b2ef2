package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chi-square association between two categorical columns, reported as
  * Cramér's V SQUARED in ppm — the normalized effect size ("how strongly
  * does slice determine label", 0 = independent, 10⁶ = fully determined)
  * that complements the MI decomposition (q164: per-slice contributions;
  * this: one corpus-level number with the classical normalization).
  *
  * Exact integers: over the DENSE (rows × cols) grid — zero cells
  * contribute `R·C/N`, which the naive present-cells-only sum silently
  * drops — each cell's χ² term is `((O·N − R·C)²·10⁶) div (N·R·C)`
  * (DECIMAL(38)/HUGEINT), summed to `chi2_micro`; `v2_ppm = chi2_micro
  * div (N·min(r−1, c−1))`. No sqrt (V² is monotone in V).
  *
  * Scale: one partial-agg'd contingency count; the grid stage is
  * (cardinality_a × cardinality_b)-bounded by construction.
  */
object Association {

  def cramersV2(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.cast("string").as("_a"), bCol.cast("string").as("_b"))
      .groupBy(col("_a"), col("_b")).agg(count(lit(1)).as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = cells.groupBy(col("_a")).agg(sum(col("o")).as("r"))
    val cols = cells.groupBy(col("_b")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    val dense = rows.crossJoin(broadcast(cols))
      .join(cells, Seq("_a", "_b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(n))
    val chi2 = dense.agg(
      sum(expr("""((CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                 |  * (CAST(o AS DECIMAL(38,0)) * n - CAST(r AS DECIMAL(38,0)) * c)
                 |  * 1000000)
                 |div (CAST(n AS DECIMAL(38,0)) * r * c)""".stripMargin))
        .as("chi2_micro"),
      countDistinct(col("_a")).as("n_rows"),
      countDistinct(col("_b")).as("n_cols"),
      max(col("n")).as("n"))
    chi2.select(col("n"), col("n_rows").cast("long").as("n_rows"),
      col("n_cols").cast("long").as("n_cols"),
      expr("CAST(chi2_micro AS BIGINT)").as("chi2_micro"),
      expr("""CASE WHEN least(n_rows - 1, n_cols - 1) > 0 THEN
             |  CAST(chi2_micro div (n * least(n_rows - 1, n_cols - 1)) AS BIGINT)
             |END""".stripMargin).as("v2_ppm"))
  }

  /** Rank-biased overlap (RBO, Webber et al. 2010) between every pair of
    * slices' top-k ranked vocabularies — the "did this source's
    * characteristic vocabulary churn" drift number that raw set overlap
    * misses (RBO weights agreement at the TOP of the lists).
    *
    * `RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d` with the powers of
    * p precomputed as an exact integer-ppm fold (the q128 `powPpm`
    * convention) and INLINED as literals into both engines, so each
    * depth's term `(p^{d−1}·ov_d·(1−p)_ppm) div (d·10⁶)` is identical
    * integer arithmetic. Ranking ties break by token (deterministic).
    *
    * The pair UNIVERSE is every src_a < src_b pair of slices that have at
    * least one token: two slices whose top-k lists share ZERO tokens — the
    * maximally-churned pairs a vocabulary-drift ranking exists to surface —
    * emit an explicit `rbo_micro = 0` row, never a silent absence.
    *
    * Scale: one (slice, token) partial agg; per-slice top-k via a
    * k-bounded rank window; the pair stage runs on slices × k rows plus a
    * slices² universe frame (slices bounded by construction).
    */
  def rboTopK(df: DataFrame, textCol: String, sourceCol: String, k: Int,
      pPpm: Long): DataFrame = {
    require(k >= 1 && pPpm > 0 && pPpm < 1000000L, s"bad k/p: $k/$pPpm")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(sourceCol).as("src"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
    val ranked = toks.withColumn("rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("c").desc, col("w"))))
      .filter(col("rk") <= k)
      .select(col("src"), col("w"), col("rk"))
    val joined = ranked.as("a").join(ranked.as("b"),
        col("a.w") === col("b.w") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        greatest(col("a.rk"), col("b.rk")).as("m"))
    val pow = powersPpm(pPpm, k) // p^0 .. p^(k-1), exact integer fold
    val depth = df.sparkSession.createDataFrame(
      (1 to k).map(d => (d.toLong, pow(d - 1)))).toDF("d", "ppow")
    val scored = joined.join(broadcast(depth), col("m") <= col("d"))
      .groupBy(col("src_a"), col("src_b"), col("d"), col("ppow"))
      .agg(count(lit(1)).as("ov"))
      .select(col("src_a"), col("src_b"),
        expr(s"(ppow * ov * ${1000000L - pPpm}) div (d * 1000000)").as("_t"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("_t")).as("_rbo"))
    val srcs = ranked.select(col("src")).distinct()
    srcs.as("ua").join(broadcast(srcs).as("ub"), col("ua.src") < col("ub.src"))
      .select(col("ua.src").as("src_a"), col("ub.src").as("src_b"))
      .join(scored, Seq("src_a", "src_b"), "left")
      .select(col("src_a"), col("src_b"),
        coalesce(col("_rbo"), lit(0L)).as("rbo_micro"))
  }

  /** exact integer p^0..p^(k-1) in ppm via repeated `x·p div 10⁶` */
  def powersPpm(pPpm: Long, k: Int): Seq[Long] =
    Iterator.iterate(1000000L)(x => x * pPpm / 1000000L).take(k).toSeq
}
