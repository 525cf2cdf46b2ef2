package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter sizing planner — the capacity arithmetic run BEFORE a
  * broadcast decontamination screen (q93) ships: given the MEASURED
  * distinct-gram count of the blocklist side and a menu of target
  * false-positive rates, the classical optimum is
  *
  *   m = ⌈n·|ln p| / (ln 2)²⌉  bits,   k = round((m/n)·ln 2)  hashes.
  *
  * Engine parity: the only irrational inputs (|ln p|, (ln 2)², ln 2) are
  * quantized ONCE here in Scala and embedded as integer micro literals in
  * both the plan and the generated oracle SQL (the q139 discount-literal
  * pattern) — the arithmetic after that is exact integer ceil/round
  * division, so the two engines cannot drift.
  *
  * One distinct partial-agg over the gram side is the only corpus-sized
  * work; the plan table is |fprs| rows.
  */
object BloomPlanner {

  private val Ln2Micro = math.round(math.log(2) * 1e6) // 693147
  private val Ln2SqMicro = math.round(math.log(2) * math.log(2) * 1e6) // 480453

  /** |ln p|·10⁶ for a target FPR given in ppm */
  def lnFprMicro(fprPpm: Long): Long = {
    require(fprPpm > 0 && fprPpm < 1000000L, s"fpr_ppm in (0, 1e6): $fprPpm")
    math.round(-math.log(fprPpm / 1e6) * 1e6)
  }

  /** (fpr_ppm, n_items, m_bits, filter_bytes, k_hashes) per target FPR,
    * n_items = distinct shingle count of `df`'s `textCol` at `shingleLen`.
    */
  def plan(df: DataFrame, textCol: String, shingleLen: Int,
      fprsPpm: Seq[Long]): DataFrame = {
    require(fprsPpm.nonEmpty, "need at least one target FPR")
    val spark = df.sparkSession
    // n_items = 0 (every doc shorter than shingleLen) would make the
    // k_hashes division engine-divergent (Spark null vs DuckDB error, the
    // ksDrift n_rest lesson) — an empty plan is the honest answer
    val n = df
      .select(explode(Dedup.shingles(col(textCol), shingleLen)).as("g"))
      .agg(countDistinct(col("g")).as("n_items"))
      .filter(col("n_items") > 0)
    val fprs = spark.createDataFrame(
        fprsPpm.map(p => (p, lnFprMicro(p))))
      .toDF("fpr_ppm", "_lnp_micro")
    // DECIMAL(38,0) intermediates: n·|ln p|·10⁶ passes 2⁶³ near 10¹²
    // distinct grams — the regime this planner exists for
    n.crossJoin(broadcast(fprs))
      .select(col("fpr_ppm"), col("n_items"),
        expr(s"""CAST((CAST(n_items AS DECIMAL(38,0)) * _lnp_micro
                |  + ${Ln2SqMicro - 1}) div $Ln2SqMicro AS BIGINT)"""
          .stripMargin).as("m_bits"))
      .select(col("fpr_ppm"), col("n_items"), col("m_bits"),
        expr("(m_bits + 7) div 8").as("filter_bytes"),
        greatest(lit(1L),
          expr(s"""CAST((2 * CAST(m_bits AS DECIMAL(38,0)) * $Ln2Micro
                  |  + CAST(n_items AS DECIMAL(38,0)) * 1000000)
                  |  div (2 * CAST(n_items AS DECIMAL(38,0)) * 1000000)
                  |  AS BIGINT)""".stripMargin)).as("k_hashes"))
  }

  /** the oracle-side literals, exposed so generated SQL can't drift */
  def ln2Micro: Long = Ln2Micro
  def ln2SqMicro: Long = Ln2SqMicro
}
