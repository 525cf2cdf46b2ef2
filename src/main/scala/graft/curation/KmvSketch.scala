package graft.curation

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al., RANDOM
  * 2002; Beyer et al., SIGMOD 2007) — the third distinct-cardinality story
  * next to exact count-distinct and [[HllSketch]]: keep the k SMALLEST
  * distinct hash values seen; the k-th minimum's position in hash space
  * estimates the cardinality as (k−1)·2^60 / h_k. What KMV adds over HLL
  * is the SET-ALGEBRA of the sketches themselves: the union of two groups'
  * sketches (merge, re-take k minima) IS the sketch of the union, so
  * per-shard / per-source sketches computed independently at 100 TB
  * compose into corpus-wide cardinalities without touching the data again
  * — exactly how the ALL row here is produced.
  *
  * Audit formulation like the CMS/HLL/ANN audits: sketch AND exact distinct
  * from the same stream, estimate + signed error per group and for the
  * merged ALL row. Exact arithmetic throughout: h is the salted-md5 60-bit
  * value, the estimator is one 128-bit integer multiply-divide (decimal /
  * hugeint), and err_ppm is the repo's cross-engine integer ppm.
  *
  * Scale shape: the sketch is a bounded (≤ k values) mergeable aggregate —
  * partial aggregation sends at most k longs per (group, partition) to the
  * exchange; the exact counts are the usual distinct shuffle (audit-only);
  * the ALL row reads the ≤ groups·k sketch values, never the stream.
  */
object KmvSketch {

  /** Per-group + merged-ALL distinct audit over a value stream (duplicates
    * welcome — the sketch aggregate and count_distinct both absorb them).
    * Output: (src, n_exact, n_sketch, hk, est, err_ppm) per group value and
    * one 'ALL' row; `hk` is null (and est = n_sketch, exact by the KMV
    * small-set rule) when a group has fewer than k distinct hashes.
    */
  def groupedDistinctAudit(df: DataFrame, valCol: String, groupCol: String,
      k: Int, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val values = df
      .select(col(groupCol).cast("string").as("src"), col(valCol).as("_graft_v"),
        HllSketch.h60(col(valCol), salt).as("_graft_h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kmv = udaf(new KmvAgg(k))
    val perGroup = values.groupBy(col("src"))
      .agg(kmv(col("_graft_h")).as("_graft_mins"),
        count_distinct(col("_graft_v")).as("n_exact"))
    val allSketch = perGroup
      .select(explode(col("_graft_mins")).as("_graft_h"))
      .agg(kmv(col("_graft_h")).as("_graft_mins"))
      .crossJoin(values.agg(count_distinct(col("_graft_v")).as("n_exact")))
      .select(lit("ALL").as("src"), col("_graft_mins"), col("n_exact"))
    val est = perGroup.select(col("src"), col("_graft_mins"), col("n_exact"))
      .unionByName(allSketch)
      .select(col("src"), col("n_exact"),
        size(col("_graft_mins")).cast("long").as("n_sketch"),
        when(size(col("_graft_mins")) === k,
          element_at(col("_graft_mins"), k)).as("hk"))
      .select(col("src"), col("n_exact"), col("n_sketch"),
        col("hk"),
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * " +
            "CAST(1152921504606846976 AS DECIMAL(38,0))) div hk AS BIGINT)"))
          .as("est"))
    est.select(col("src"), col("n_exact"), col("n_sketch"), col("hk"),
      col("est"),
      expr("((est - n_exact) * 1000000) div n_exact").as("err_ppm"))
  }
}

/** Bounded mergeable k-minimum-DISTINCT-values aggregate: the buffer is the
  * ascending-sorted vector of the k smallest distinct longs seen, so each
  * upstream partition contributes at most k values to the exchange and
  * merge order can't change the result.
  */
final class KmvAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[Long] = Vector.empty

  override def reduce(b: Seq[Long], a: Long): Seq[Long] =
    if (b.contains(a)) b
    else if (b.length < k) (b :+ a).sorted
    else if (a < b.last) (b.init :+ a).sorted
    else b

  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
