package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.PrefixSum

/** Sorted-neighborhood dedup (Hernández & Stolfo's classic record-linkage
  * method): sort the corpus by a blocking key (here the normalized-text
  * prefix), slide a window of `w` positions, and compare only documents
  * whose GLOBAL sort positions are within the window — the candidate scheme
  * of choice when duplicates share prefixes but differ in tails (forms,
  * templates, re-typed records) where shingle-based LSH needs high overlap
  * everywhere.
  *
  * Distributed shape: the global ordering comes from the [[PrefixSum]]
  * two-pass scan (range partition + partition-local running counts) — a
  * 100 TB corpus is never sorted through one task and there is NO
  * empty-`partitionBy` window anywhere. Window pairing is an equi-join on
  * the position bucket ⌊pos/w⌋: a pair at distance ≤ w either shares a
  * bucket or sits in adjacent ones, so the probe side explodes to 2 keys
  * and the join stays hash-partitioned. Each candidate is verified with the
  * exact 3-gram Jaccard (integer ppm).
  *
  * Output: (id_a, id_b, pos_a, pos_b, jac_ppm), pairs at position distance
  * ≤ w ordered (pos_a < pos_b); documents with < 3 tokens verify at 0 ppm.
  */
object SortedNeighborhood {

  def neighborPairs(docs: DataFrame, idCol: String, textCol: String,
      w: Int, keyLen: Int = 16, numPartitions: Int = 32): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    require(keyLen >= 1, s"keyLen must be >= 1, got $keyLen")
    val spark = docs.sparkSession
    val base = graft.operators.Parallelism.ensure(
        docs.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("_graft_text")))
      .select(col("doc_id"),
        substring(Normalize.normalizeText(col("_graft_text")), 1, keyLen)
          .as("_graft_key"),
        Dedup.shingles(col("_graft_text"), 3).as("_graft_sh"))
      .withColumn("_graft_one", lit(1L))
    val pos = PrefixSum.runningTotals(base,
        Seq(col("_graft_key"), col("doc_id")), Seq("_graft_one"),
        numPartitions)
      .select(col("doc_id"), col("_graft_sh"),
        col("cum__graft_one").as("pos"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wL = w.toLong
    val left = pos.select(col("doc_id").as("id_a"), col("pos").as("pos_a"),
      col("_graft_sh").as("_graft_sha"),
      explode(array(expr(s"pos div ${wL}L"), expr(s"pos div ${wL}L + 1L")))
        .as("_graft_bkt"))
    val right = pos.select(col("doc_id").as("id_b"), col("pos").as("pos_b"),
      col("_graft_sh").as("_graft_shb"),
      expr(s"pos div ${wL}L").as("_graft_bkt"))
    left.join(right, Seq("_graft_bkt"))
      .filter(col("pos_b") > col("pos_a") &&
        col("pos_b") - col("pos_a") <= wL)
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        size(array_intersect(col("_graft_sha"), col("_graft_shb")))
          .cast("long").as("_graft_i"),
        (size(col("_graft_sha")) + size(col("_graft_shb"))).cast("long")
          .as("_graft_ns"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        when(col("_graft_ns") - col("_graft_i") === 0L, lit(0L))
          .otherwise(expr("(_graft_i * 1000000) div (_graft_ns - _graft_i)"))
          .as("jac_ppm"))
  }
}
