package graft.similarity

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Brute-force cosine top-k is the exact baseline (one broadcast join, no
  * shuffle of the corpus). The scale path is random-hyperplane LSH: an
  * L-table bit-signature index whose buckets gate the candidate set, so the
  * per-query cost is O(bucket) instead of O(corpus). Hyperplanes are
  * deterministic (md5-derived ±1 components) so results are reproducible
  * across runs and engines.
  */
object Similarity {

  /** dot product of two double arrays (sequential fold → deterministic) */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Exact brute-force cosine top-k: for each row of `queries`, the k nearest
    * corpus rows (self excluded), ranked by (cosine desc, id asc).
    * The query side is broadcast — the corpus is scanned once, never shuffled.
    */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    broadcast(q).join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Deterministic ±1 hyperplane components: parity of the first hex nibble
    * of md5("plane:j:i"). Same formula is reproducible in the SQL oracle.
    */
  def planeComponent(j: Int, i: Int): Double = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s"plane:$j:$i".getBytes("UTF-8"))
    if (((d(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map(j => (0 until dim).map(i => planeComponent(j, i)))

  /** Bit signature: bit j = (v · plane_j) >= 0. Returns an array of L bucket
    * strings, `bitsPerTable` bits each (multi-table LSH: candidates share at
    * least one table bucket).
    */
  def lshBuckets(vec: Column, nPlanes: Int, dim: Int, bitsPerTable: Int): Column = {
    val ps = planes(nPlanes, dim)
    val bits: Seq[Column] = ps.map { p =>
      val planeLit = array(p.map(lit): _*)
      when(dot(vec, planeLit) >= 0, lit("1")).otherwise(lit("0"))
    }
    val tables = bits.grouped(bitsPerTable).toSeq
    array(tables.zipWithIndex.map { case (tb, t) =>
      concat(lit(s"$t:"), concat(tb: _*))
    }: _*)
  }

  /** IVF-style ANN: a deterministic coarse quantizer (every `centroidStride`-th
    * corpus row is a centroid — reproducible in the SQL oracle without a
    * training step), each corpus row assigned to its nearest centroid
    * (inverted lists), and each query probing the `nProbe` nearest lists.
    * At 100 TB the inverted lists are the partition key: a query touches
    * nProbe/nLists of the corpus instead of all of it.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, centroidStride: Int = 50,
      nProbe: Int = 2): DataFrame = {
    val cents = corpus.filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("cent_id"), asDouble(col(vecCol)).as("cv"))
    def assign(df: DataFrame, id: String, n: Int) = {
      val w = Window.partitionBy(col(id)).orderBy(col("ccos").desc, col("cent_id"))
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(s"v_$id"))
        .crossJoin(broadcast(cents))
        .withColumn("ccos", cosine(col(s"v_$id"), col("cv")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .select(col(id), col(s"v_$id"), col("cent_id"))
    }
    val lists = assign(corpus, "neighbor_id", 1)
    val probes = assign(queries, "query_id", nProbe)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(lists, Seq("cent_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("v_query_id").as("qv"),
        col("neighbor_id"), col("v_neighbor_id").as("cv2"))
      .distinct()
      .withColumn("cos", cosine(col("qv"), col("cv2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** ANN top-k via multi-table hyperplane LSH: candidates = corpus rows
    * sharing any bucket with the query, then exact cosine rank within
    * candidates. May return fewer than k per query (approximate recall) —
    * that's the contract of ANN; increase tables/lower bits for recall.
    */
  def annTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nPlanes: Int = 24, dim: Int = 64,
      bitsPerTable: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame, id: String) =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(s"v_$id"),
          lshBuckets(asDouble(col(vecCol)), nPlanes, dim, bitsPerTable).as(s"b_$id"))
        .select(col(id), col(s"v_$id"), explode(col(s"b_$id")).as(s"bk_$id"))
    val q = withBuckets(queries, "query_id")
    val c = withBuckets(corpus, "neighbor_id")
    val cand = broadcast(q).join(c,
        col("bk_query_id") === col("bk_neighbor_id")
          && col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("v_query_id").as("qv"),
        col("neighbor_id"), col("v_neighbor_id").as("cv"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("cos", cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
