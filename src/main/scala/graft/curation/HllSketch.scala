package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet & Meunier,
  * AofA 2007) — completes the fixed-memory sketch family next to
  * [[CmsSketch]] (marginals), Bloom decontamination (membership) and
  * Misra-Gries (heavy hitters): m = 2^p registers estimate the number of
  * DISTINCT values in a stream with ~1.04/sqrt(m) relative error, and the
  * register array is a trivially mergeable max-aggregate, so 1000 executors
  * sketch their splits independently and a reduce takes elementwise max.
  *
  * This is the audit formulation (like the CMS/ANN audits): build the
  * sketch AND the exact distinct count from the same stream, report the
  * registers' rho histogram plus the estimate and its signed error — the
  * evidence a deployment needs before trusting sketch-only cardinalities
  * (e.g. distinct n-grams per shard at 100 TB, where exact distinct is a
  * full shuffle but the sketch is 64 longs).
  *
  * Determinism: the hash is the salted-md5 60-bit value (top p bits pick
  * the register, rho = leading-zero count of the remaining bits + 1, via
  * the engine-portable `55 − length(ltrim(bin(rest),'0'))` for p=6); the
  * harmonic sum is carried as the EXACT integer numerator
  * S·2^(60−p−1) = Σ 2^(60−p+1−rho) (each term a power of two, all
  * representable in one BIGINT), so only the final alpha·m²/S division is
  * floating — one identically-ordered IEEE expression in both engines,
  * quantized to milli units. The small-range linear-counting branch
  * (m·ln(m/V)) quantizes through ln like every other ln in the gate.
  *
  * Scale shape: one partial-agg'd max-aggregate over (register) — the
  * exchange carries at most m rows per upstream partition; the exact
  * distinct count (audit-only) is the usual count-distinct shuffle; the
  * final estimate row broadcasts back onto the m-row register frame.
  */
object HllSketch {

  /** m = 64 registers: the only p this audit ships (alpha_64 = 0.709 is
    * the paper's exact constant; a formula-computed alpha would have to be
    * float-identical across engines).
    */
  val P = 6
  val M = 1 << P
  private val Alpha64 = 0.709
  private val RestBits = 60 - P // 54

  /** 60-bit salted-md5 value as a long (15 hex chars; matches h60Sql) */
  def h60(value: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt + ":"), value.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** Register audit over a value stream (duplicates welcome — max absorbs
    * them): one row per rho value present among the m registers
    * (`rho`, `n_regs`), with the sketch summary repeated on every row:
    * `n_exact` (exact distinct, audit-only), `snum` (exact integer
    * harmonic-sum numerator), `est_milli` (HLL estimate in milli-units,
    * linear counting below 2.5m), `err_ppm` (signed relative error).
    */
  def distinctAudit(values: DataFrame, valCol: String,
      salt: String = "hll"): DataFrame = {
    val hashed = values.select(h60(col(valCol), salt).as("_graft_h"))
      .select(shiftright(col("_graft_h"), RestBits).as("reg"),
        (col("_graft_h") % lit(1L << RestBits)).as("_graft_rest"))
      // rho = (leading zeros of the 54-bit rest) + 1 = 55 - bitlength(rest);
      // bin() drops leading zeros in both engines and ltrim '0' makes
      // rest=0 read as bitlength 0 (rho 55) consistently
      .select(col("reg"),
        (lit(RestBits + 1) -
          length(ltrim(bin(col("_graft_rest")), "0"))).cast("long").as("rho"))
    // 64 rows; persisted because both the summary and the histogram read it
    // (without the pin the corpus-scale register aggregate would run twice)
    val regs = registerIds(values, M)
      .join(hashed.groupBy(col("reg")).agg(max(col("rho")).as("rho")),
        Seq("reg"), "left")
      .select(col("reg"), coalesce(col("rho"), lit(0)).as("rho"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = values.agg(
      count_distinct(col(valCol)).as("n_exact"))
    // snum = sum(2^(55-rho)): rho in [0,55] so each term is an exact
    // power-of-two long; v = empty registers (rho=0) for linear counting
    val summary = regs
      .agg(sum(expr(s"shiftleft(cast(1 as bigint), cast(${RestBits + 1} - rho as int))")).as("snum"),
        sum(when(col("rho") === 0, 1L).otherwise(0L)).as("v"))
      .crossJoin(exact)
      .select(col("n_exact"), col("snum"),
        raw(col("snum")).as("_graft_raw"), col("v"))
      .select(col("n_exact"), col("snum"),
        when(col("_graft_raw") <= lit(2.5 * M) && col("v") > 0,
            round(lit(M.toDouble) * log(lit(M.toDouble) / col("v").cast("double")) * 1000.0d))
          .otherwise(round(col("_graft_raw") * 1000.0d))
          .cast("long").as("est_milli"))
      .select(col("n_exact"), col("snum"), col("est_milli"),
        expr("((est_milli - n_exact * 1000) * 1000000) div (n_exact * 1000)")
          .as("err_ppm"))
    regs.groupBy(col("rho")).agg(count(lit(1)).cast("long").as("n_regs"))
      .crossJoin(broadcast(summary))
      .select(col("rho"), col("n_regs"), col("n_exact"), col("snum"),
        col("est_milli"), col("err_ppm"))
  }

  /** raw HLL estimate alpha·m²·2^55 / snum — ONE double expression, same
    * literal order as the oracle so both engines round identically
    */
  private def raw(snum: Column): Column =
    lit(Alpha64) * lit((M.toLong * M.toLong).toDouble) *
      lit(math.pow(2.0, RestBits + 1).toLong.toDouble) / snum.cast("double")

  /** all m register ids, from the values frame's session */
  private def registerIds(values: DataFrame, m: Int): DataFrame =
    values.sparkSession.range(m).select(col("id").cast("long").as("reg"))
}
