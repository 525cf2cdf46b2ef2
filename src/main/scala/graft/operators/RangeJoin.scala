package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless interval-overlap join (range join) — the second classic operator
  * Spark lacks: a raw `a.start <= b.end AND b.start <= a.end` join plans as
  * a broadcast-nested-loop / cartesian, quadratic in intervals. Here each
  * interval explodes into the fixed-width time bins it touches, candidate
  * pairs come from a bin equi-join (a plain shuffled hash join keyed on the
  * bin), and exact overlap is verified on candidates only. With the bin
  * width on the order of the typical interval length each interval lands in
  * O(1) bins, so candidates — and the shuffle — stay near-linear for sparse
  * overlap structure. Pairs touching several shared bins are deduplicated.
  */
object RangeJoin {

  /** all overlapping pairs (id1 < id2) of `(idCol, startCol, endCol)`
    * timestamp intervals, with both intervals and the overlap length in µs
    */
  def intervalOverlaps(df: DataFrame, idCol: String, startCol: String,
      endCol: String, binMicros: Long): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val b = df.select(col(idCol).as("id"),
        col(startCol).as("s"), col(endCol).as("e"),
        explode(sequence(
          (unix_micros(col(startCol)) / binMicros).cast("long"),
          (unix_micros(col(endCol)) / binMicros).cast("long"))).as("bin"))
    b.as("a").join(b.as("b"),
        col("a.bin") === col("b.bin") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.s").as("s1"), col("a.e").as("e1"),
        col("b.s").as("s2"), col("b.e").as("e2"))
      // verify BEFORE distinct: non-overlapping bin cohabitants never
      // reach the dedup exchange (the filter is deterministic per pair,
      // so the surviving set is identical)
      .filter(col("s1") <= col("e2") && col("s2") <= col("e1"))
      .distinct()
      .withColumn("overlap_us",
        unix_micros(least(col("e1"), col("e2")))
          - unix_micros(greatest(col("s1"), col("s2"))))
  }
}
