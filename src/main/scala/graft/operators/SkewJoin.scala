package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling: the diagnostic that FINDS hot join keys, and the salted
  * join that survives them.
  *
  * At 100 TB a single hot key (the null-surrogate customer, the default
  * shard, the empty-string URL) puts its entire fact-side population
  * through ONE reducer of a shuffle join — AQE's skew-join splitting
  * handles sort-merge spills, but a key whose build side also explodes, or
  * a deliberately co-partitioned pipeline, still wants explicit salting:
  * spread the fact side across `saltFactor` sub-keys and replicate the
  * dimension side once per sub-key. The join result is EXACTLY the plain
  * inner join (each fact row carries one salt value; the dimension row
  * exists for every salt value) — the gate proves it by hash-matching the
  * unsalted oracle.
  */
object SkewJoin {

  /** Per-key-column skew profile: one row per profiled column with the
    * numbers a salting decision needs — total rows, distinct keys, the
    * heaviest key and its count, and skew_ratio_ppm = max_cnt · n_keys /
    * n_rows · 1e6 (1e6 = perfectly uniform; a 50× ratio says the hot key's
    * reducer gets 50× the average). One partial-agg'd count per column,
    * then a 1-row collapse; nothing driver-side beyond the summary.
    */
  def skewProfile(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    keyCols.map { k =>
      df.select(col(k).cast("string").as("_graft_key"))
        .groupBy(col("_graft_key")).agg(count(lit(1)).as("_graft_cnt"))
        // top key = lexicographic max of "zero-padded count|key": engine-
        // portable arg-max with a (count, key) total order
        .agg(count(lit(1)).as("n_keys"), sum(col("_graft_cnt")).as("n_rows"),
          max(col("_graft_cnt")).as("max_cnt"),
          max(format_string("%020d|%s", col("_graft_cnt"), col("_graft_key")))
            .as("_graft_top"))
        .select(lit(k).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_cnt"), substring(col("_graft_top"), 22, 1 << 20).as("top_key"),
          expr("(max_cnt * n_keys * 1000000) div n_rows").as("skew_ratio_ppm"))
    }.reduce(_ unionByName _)
  }

  /** Inner equi-join with explicit salting: the left (fact) side scatters
    * each row to one of `saltFactor` sub-keys via a deterministic hash of
    * `saltBy` (pick a column set that varies WITHIN a hot key — a line
    * number, a row id); the right (dimension) side replicates once per
    * sub-key. Both shuffles key on (join key, salt), so a hot key's rows
    * spread over `saltFactor` reducers. Right-side cost: `saltFactor` ×
    * |right| rows — size it like a broadcast decision (this operator is
    * for the middle ground where the dimension is too big to broadcast but
    * small enough to replicate a few ways).
    *
    * Exactness: every left row joins the one replica matching its salt, so
    * the result is row-for-row the plain inner join (the q117 gate
    * hash-matches the unsalted oracle).
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, saltBy: Seq[Column],
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 2, s"saltFactor must be >= 2, got $saltFactor")
    val l = left.withColumn("_graft_salt",
      pmod(xxhash64(saltBy: _*), lit(saltFactor.toLong)))
    val r = right.withColumn("_graft_salt",
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    l.join(r, l(leftKey) === r(rightKey)
        && l("_graft_salt") === r("_graft_salt"))
      .drop("_graft_salt")
  }
}
