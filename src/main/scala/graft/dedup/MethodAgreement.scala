package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Agreement matrix between dedup methods — the meta-audit that tells a
  * pipeline owner whether the cheap screen (exact hashing) is a safe
  * proxy for the expensive one (near-dup), and how much the normalized
  * variant reveals beyond raw hashing: per document, a duplicate verdict
  * under each method, then pairwise verdict-set Jaccard and raw agreement
  * in exact ppm.
  *
  * Methods: `exact` (raw md5 group > 1), `normalized` (casefold/punct/ws-
  * collapsed md5 group > 1, [[Normalize]]), `near` (member of any exact-
  * Jaccard pair at the threshold via [[Dedup.prefixFilterJaccard]] —
  * identical documents share all shingles, so near ⊇ exact on shingle-
  * bearing docs by construction; sub-shingle-length docs can only be
  * exact/normalized).
  *
  * One corpus scan builds both hashes (persisted — the q121 lesson); the
  * near side rides the prefix-filtered pair join; the matrix itself is
  * ONE aggregate over the flag frame emitting all three method pairs.
  */
object MethodAgreement {

  def dedupMethodAgreement(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, nearThreshold: Double): DataFrame = {
    val withH = graft.operators.Parallelism.ensure(
        df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_t")))
      .select(col("doc_id"), md5(col("_t")).as("_rh"),
        md5(Normalize.normalizeText(col("_t"))).as("_nh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rawG = withH.groupBy(col("_rh")).agg(count(lit(1)).as("_rc"))
    val nrmG = withH.groupBy(col("_nh")).agg(count(lit(1)).as("_nc"))
    val pairs = Dedup.prefixFilterJaccard(df, idCol, textCol, shingleLen,
      nearThreshold)
    val nearIds = pairs.select(col("id1").as("doc_id"))
      .union(pairs.select(col("id2").as("doc_id")))
      .distinct().withColumn("_near", lit(true))
    val flags = withH
      .join(rawG, "_rh").join(nrmG, "_nh")
      .join(nearIds, Seq("doc_id"), "left")
      .select(col("doc_id"), (col("_rc") > 1).as("ex"), (col("_nc") > 1).as("nm"),
        coalesce(col("_near"), lit(false)).as("nr"))
    def both(a: String, b: String) = sum(when(col(a) && col(b), 1L).otherwise(0L))
    def either(a: String, b: String) = sum(when(col(a) || col(b), 1L).otherwise(0L))
    def agree(a: String, b: String) = sum(when(col(a) === col(b), 1L).otherwise(0L))
    val m = flags.agg(count(lit(1)).as("n"),
      both("ex", "nm").as("b1"), either("ex", "nm").as("e1"), agree("ex", "nm").as("a1"),
      both("ex", "nr").as("b2"), either("ex", "nr").as("e2"), agree("ex", "nr").as("a2"),
      both("nm", "nr").as("b3"), either("nm", "nr").as("e3"), agree("nm", "nr").as("a3"))
    def rowOf(ma: String, mb: String, b: String, e: String, a: String) =
      m.select(lit(ma).as("method_a"), lit(mb).as("method_b"),
        col(b).as("n_both"), col(e).as("n_either"),
        when(col(e) > 0, expr(s"($b * 1000000) div $e")).as("jaccard_ppm"),
        expr(s"($a * 1000000) div n").as("agree_ppm"))
    rowOf("exact", "near", "b2", "e2", "a2")
      .unionAll(rowOf("exact", "normalized", "b1", "e1", "a1"))
      .unionAll(rowOf("normalized", "near", "b3", "e3", "a3"))
  }
}
