package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MinHash-LSH parameter planner: the S-curve P(candidate | jaccard s) =
  * 1 − (1 − s^r)^b evaluated over a similarity grid for each candidate
  * (bands b, rows r) layout — the table that picks the q25 configuration
  * for a target threshold before burning a 100 TB pass (read off each
  * layout's false-negative rate above the threshold and candidate-volume
  * rate below it).
  *
  * Everything is exact integer arithmetic in ppm: powers are left-folds of
  * `x ← ⌊x·s_ppm/10⁶⌋` (a per-row Catalyst HOF over `sequence`), so the
  * probabilities are engine-reproducible (the DuckDB oracle replays the
  * same fold with a recursive CTE) and any two runs agree bit-for-bit —
  * the floor bias is ≤ r+b ppm, far inside planning tolerance.
  *
  * Scale: the output is |configs| × |grid| rows; no shuffle at all (the
  * grid cross join is a broadcast of a literal frame).
  */
object LshPlanner {

  /** Integer-ppm x^n via HOF fold: acc ← ⌊acc·x_ppm/10⁶⌋ applied n times.
    * The long product is ≤ 10¹² < 2⁵³, so the double division's floor is
    * exact — bit-identical to DuckDB's integer `//`. */
  private def powPpm(xPpm: org.apache.spark.sql.Column,
      n: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(sequence(lit(1), n), lit(1000000L),
      (acc, _) => floor((acc * xPpm) / lit(1000000L)).cast("long"))

  /** (bands, rows, s_ppm, p_band_ppm, p_cand_ppm) for each layout × grid
    * point; `sGridStepPpm` spaces the similarity grid (50000 → 5%..95%). */
  def sCurve(spark: SparkSession, configs: Seq[(Int, Int)],
      sGridStepPpm: Long = 50000L): DataFrame = {
    require(configs.nonEmpty, "need at least one (bands, rows) layout")
    require(sGridStepPpm >= 1000L && sGridStepPpm < 1000000L,
      s"grid step out of range: $sGridStepPpm")
    import spark.implicits._
    val conf = configs.toDF("bands", "rows")
    val grid = spark.range(1, 1000000L / sGridStepPpm)
      .select((col("id") * sGridStepPpm).as("s_ppm"))
    conf.crossJoin(broadcast(grid))
      .withColumn("p_band_ppm", powPpm(col("s_ppm"), col("rows")))
      .withColumn("p_cand_ppm",
        lit(1000000L) - powPpm(lit(1000000L) - col("p_band_ppm"), col("bands")))
      .select(col("bands"), col("rows"), col("s_ppm"),
        col("p_band_ppm"), col("p_cand_ppm"))
  }
}
