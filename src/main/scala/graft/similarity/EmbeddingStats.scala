package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Embedding-space monitoring: per-group centroid drift against the global
  * centroid — the standard alarm for a 100 TB embedding pipeline (a model
  * revision, a bad batch, or a domain shift moves one slice's centroid
  * while the corpus centroid stays put).
  *
  * Determinism: per-element values quantize to integer micro units at the
  * scan, so ALL distributed sums (per-dimension, per-group, global) are
  * exact integer arithmetic — float summation order never matters. The
  * final cosine divides with one rounded double expression per group.
  *
  * Scale shape: the per-(group, dim) explode partial-aggregates map-side,
  * so the exchange carries at most groups × dims partial rows per
  * partition — never the vector rows; the 64-row global-centroid frame
  * joins back by broadcast.
  */
object EmbeddingStats {

  /** Per group: vector count and the cosine (in exact integer micro units)
    * between the group's mean vector and the corpus-wide mean vector.
    * Degenerate all-zero centroids report cosine 0.
    */
  def centroidDrift(emb: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val perDim = emb
      .select(col(groupCol),
        posexplode(col(vecCol).cast(ArrayType(DoubleType))).as(Seq("_graft_d", "_graft_x")))
      .select(col(groupCol), col("_graft_d"),
        round(col("_graft_x") * 1000000.0d).cast("long").as("_graft_xm"))
      .groupBy(col(groupCol), col("_graft_d"))
      .agg(sum(col("_graft_xm")).as("s"), count(lit(1)).as("n"))
    val globalDim = perDim.groupBy(col("_graft_d"))
      .agg(sum(col("s")).as("gs"), sum(col("n")).as("gn"))
    val m: Column = (col("s").cast("double") / 1000000.0d) / col("n").cast("double")
    val gm: Column = (col("gs").cast("double") / 1000000.0d) / col("gn").cast("double")
    perDim.join(broadcast(globalDim), Seq("_graft_d"))
      .select(col(groupCol), col("n"),
        round(m * gm * 1000000.0d).cast("long").as("_graft_dot"),
        round(m * m * 1000000.0d).cast("long").as("_graft_mm"),
        round(gm * gm * 1000000.0d).cast("long").as("_graft_gg"))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("_graft_dot")).as("_graft_dot"),
        sum(col("_graft_mm")).as("_graft_mm"),
        sum(col("_graft_gg")).as("_graft_gg"))
      .select(col(groupCol), col("n_vecs"),
        when(col("_graft_mm") === 0L || col("_graft_gg") === 0L, lit(0L))
          .otherwise(round(lit(1000000.0d) * col("_graft_dot").cast("double") /
            sqrt(col("_graft_mm").cast("double") * col("_graft_gg").cast("double")))
            .cast("long"))
          .as("cos_micro"))
  }

  /** Per-group embedding norm health: the cheap drift alarm run on every
    * embedding batch before ANN indexing — zero vectors (failed encodes)
    * and norm blow-ups (encoder regressions, mixed checkpoints) surface as
    * counts, not as silently-wrong neighbor lists downstream.
    *
    * Output: (groupCol, n_vecs, mean_sq_milli2, n_zero, n_outliers) where
    * mean_sq_milli2 = ⌊Σ‖v‖²/n⌋ over milli-quantized components and an
    * outlier is ‖v‖² > 4 × mean (cross-multiplied — no division per row).
    *
    * Determinism: components quantize to integer MILLI units at the scan
    * (squares ≤ ~10⁸ per vector — corpus sums stay long-safe at 10⁹+
    * vectors); every comparison is integer. Scale shape: the squared norm
    * is a per-row fold; group totals are one partial-agg'd exchange,
    * broadcast back for the outlier compare (group counts are label-sized).
    */
  def normHealth(emb: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val sq = emb.select(col(groupCol),
        aggregate(transform(col(vecCol).cast(ArrayType(DoubleType)),
            x => round(x * 1000.0d).cast("long")),
          lit(0L), (a, x) => a + x * x).as("_graft_sq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = sq.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_vecs"), sum(col("_graft_sq")).as("_graft_tot"),
        sum(when(col("_graft_sq") === 0L, 1L).otherwise(0L)).as("n_zero"))
    sq.join(broadcast(totals), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("n_vecs")).as("n_vecs"),
        max(col("_graft_tot")).as("_graft_tot"),
        max(col("n_zero")).as("n_zero"),
        sum(when(col("_graft_sq") * col("n_vecs") > lit(4L) * col("_graft_tot"),
          1L).otherwise(0L)).as("n_outliers"))
      .select(col(groupCol), col("n_vecs"),
        expr("_graft_tot div n_vecs").as("mean_sq_milli2"),
        col("n_zero"), col("n_outliers"))
  }

  /** SSL-prototypes data pruning (Sorscher et al., NeurIPS 2022 "Beyond
    * neural scaling laws"): rank every vector by cosine to its OWN label's
    * centroid and flag the most prototypical fifth — the pruning metric
    * that beats random keeps when data outgrows the model (easy,
    * redundant examples go first). The q88 integer-quantization scheme
    * makes the ranking engine-exact: components quantize to micro ints at
    * the scan, centroid sums are exact integers, and every per-dimension
    * product rounds to an integer BEFORE the distributed sum, so float
    * summation order never exists; ties break on the vector id.
    *
    * Scale shape: one label-keyed explode aggregate for centroids (at most
    * labels × dims partial rows per partition), centroids broadcast back,
    * per-vector dot/norm terms partial-agg by vec id, then ONE label-keyed
    * rank window (skew bounded by the largest label — the operator's
    * honest cost; a per-label TakeOrdered would lose the full ranking the
    * prune fraction needs).
    */
  def prototypicalityPrune(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, keepOneIn: Int = 5): DataFrame = {
    require(keepOneIn >= 2, s"keepOneIn must be >= 2, got $keepOneIn")
    val comps = emb.select(col(idCol), col(labelCol),
        posexplode(col(vecCol).cast(ArrayType(DoubleType))).as(Seq("_graft_d", "_graft_x")))
      .select(col(idCol), col(labelCol), col("_graft_d"),
        round(col("_graft_x") * 1000000.0d).cast("long").as("_graft_xm"))
    val centroid = comps.groupBy(col(labelCol), col("_graft_d"))
      .agg(sum(col("_graft_xm")).as("s"), count(lit(1)).as("n"))
    val md: Column = (col("s").cast("double") / 1000000.0d) / col("n").cast("double")
    val terms = comps.join(broadcast(centroid), Seq(labelCol, "_graft_d"))
      .select(col(idCol), col(labelCol),
        round(col("_graft_xm").cast("double") / 1000000.0d * md * 1000000000.0d)
          .cast("long").as("_graft_dot"),
        (col("_graft_xm") * col("_graft_xm")).as("_graft_xx"),
        round(md * md * 1000000.0d).cast("long").as("_graft_mm"),
        col("n"))
      .groupBy(col(idCol), col(labelCol))
      .agg(sum(col("_graft_dot")).as("_graft_dot"),
        sum(col("_graft_xx")).as("_graft_xx"),
        sum(col("_graft_mm")).as("_graft_mm"),
        max(col("n")).as("_graft_n"))
      .select(col(idCol), col(labelCol), col("_graft_n"),
        when(col("_graft_xx") === 0L || col("_graft_mm") === 0L, lit(0L))
          .otherwise(round(lit(1000000.0d) * col("_graft_dot").cast("double") /
            sqrt(col("_graft_xx").cast("double") * col("_graft_mm").cast("double")))
            .cast("long"))
          .as("cos_micro"))
    terms
      .withColumn("_graft_rank", row_number().over(
        Window.partitionBy(col(labelCol))
          .orderBy(col("cos_micro").desc, col(idCol))))
      .select(col(idCol), col(labelCol), col("cos_micro"),
        when(col("_graft_rank") <= expr(s"_graft_n div $keepOneIn"), lit(1L))
          .otherwise(lit(0L)).as("prune"))
  }

  /** Exact (quantized) covariance matrix of an embedding column — the
    * PCA/whitening prep audit: per pair of dimensions (i <= j) the
    * population-covariance NUMERATOR  n·Σxᵢxⱼ − Σxᵢ·Σxⱼ  over
    * milli-quantized components, all integer arithmetic.
    *
    * Scale shape: ONE pass, no row blowup — a typed Aggregator carries the
    * d + d(d+1)/2 running sums as its buffer, so each partition contributes
    * one partial state to the exchange regardless of row count (a
    * posexplode-squared formulation would shuffle d²/2 rows PER VECTOR).
    * The d(d+1)/2-row result explodes from the single finished state.
    *
    * Determinism: components quantize to milli ints at the scan; every
    * distributed sum is exact integer arithmetic (order-free). Magnitudes:
    * |x| <= 4 → products <= 1.6e7, so the Σxᵢxⱼ accumulator stays exact to
    * ~5e11 rows; beyond that shard the input and combine numerators
    * per-shard (documented contract, audit-scale operator).
    */
  /** Equi-depth (quantile-codebook) scalar quantization audit — the
    * data-adaptive counterpart of uniform SQ8 (q82): per dimension, the
    * codebook is the exact quartile boundaries from
    * [[graft.operators.Quantiles.exactQuantiles]] (the scale-safe
    * histogram-refinement core — never a per-dimension sort in one task),
    * each component encodes to the 2-bit bucket `1 + Σ (v > b_q)`, and the
    * reconstruction value is the bucket's integer-mean micro value. The
    * audit reports, per (dim, code): population, reconstruction level, and
    * the EXACT integer sum of squared reconstruction errors — derived from
    * (n, Σv, Σv²) alone, so one partial-agg'd pass over the components
    * computes it (no second join of recon back onto rows).
    *
    * All arithmetic integer-exact on micro-quantized components: recon =
    * Σv div n, sse = Σv² − 2·recon·Σv + n·recon².
    */
  def equiDepthCodebookAudit(emb: DataFrame, vecCol: String): DataFrame = {
    val comps = emb
      .select(posexplode(col(vecCol)).as(Seq("dim", "_graft_x")))
      .select(col("dim"),
        expr("CAST(round(CAST(_graft_x AS DOUBLE) * 1000000.0) AS BIGINT)")
          .as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = graft.operators.Quantiles.exactQuantiles(comps, "dim", "v",
        qsPpm = Seq(250000L, 500000L, 750000L))
      .groupBy(col("g"))
      .agg(max(when(col("q_ppm") === 250000L, col("value"))).as("_graft_b1"),
        max(when(col("q_ppm") === 500000L, col("value"))).as("_graft_b2"),
        max(when(col("q_ppm") === 750000L, col("value"))).as("_graft_b3"))
    comps
      .join(broadcast(bounds), comps("dim").cast("string") === bounds("g"))
      .select(col("dim"), col("v"),
        (lit(1) + (col("v") > col("_graft_b1")).cast("int")
          + (col("v") > col("_graft_b2")).cast("int")
          + (col("v") > col("_graft_b3")).cast("int")).as("code"))
      .groupBy(col("dim"), col("code"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("_graft_sv"),
        sum(col("v") * col("v")).as("_graft_svv"))
      .select(col("dim"), col("code"), col("n"),
        expr("_graft_sv div n").as("recon_micro"),
        col("_graft_sv"), col("_graft_svv"))
      .select(col("dim"), col("code"), col("n"), col("recon_micro"),
        (col("_graft_svv") - lit(2L) * col("recon_micro") * col("_graft_sv")
          + col("n") * col("recon_micro") * col("recon_micro")).as("sse"))
  }

  def covarianceAudit(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    val quant = emb.select(
      transform(col(vecCol).cast(ArrayType(DoubleType)),
        x => round(x * lit(1000.0d)).cast("long")).as("q"))
    implicit val seqEnc: org.apache.spark.sql.Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    val agg = new OuterProductAgg(dim)
    // Dataset[Buf] flattens the case class to top-level columns (n, s, p)
    val state = quant.as[Seq[Long]].select(agg.toColumn).toDF()
    // flat upper-triangle index -> (i, j), same loop order as the kernel
    val iIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    val jIdx = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < dim) { var j = i; while (j < dim) { iIdx += i; jIdx += j; j += 1 }; i += 1 }
    state
      .select(col("n"), col("s"), posexplode(col("p")).as(Seq("_graft_k", "_graft_pk")))
      .select(
        element_at(typedLit(iIdx.toSeq), col("_graft_k") + 1).cast("long").as("i"),
        element_at(typedLit(jIdx.toSeq), col("_graft_k") + 1).cast("long").as("j"),
        col("n"),
        (col("n") * col("_graft_pk") -
          element_at(col("s"), element_at(typedLit(iIdx.toSeq), col("_graft_k") + 1) + 1) *
          element_at(col("s"), element_at(typedLit(jIdx.toSeq), col("_graft_k") + 1) + 1))
          .as("cov_num"))
  }

  /** Simplified-silhouette clustering audit over a label/cluster column —
    * the accept-or-retune gate for any partitioning (IVF cells, semantic
    * clusters, dedup components): how separated are the clusters the
    * pipeline is about to rely on?
    *
    * The trick that makes it 100 TB-shaped: the classical silhouette is
    * all-pairs, but with SQUARED distances the mean distance from point x
    * to cluster L collapses to sufficient statistics —
    * `Σ_{j∈L} ‖x−x_j‖² = n_L·‖x‖² + Q_L − 2·x·S_L` with (n, S=Σx, Q=Σ‖x‖²)
    * per cluster. One partial-agg'd pass builds the k×(d+2) stats frame,
    * a broadcast join scores every point — O(n·k·d), never O(n²).
    *
    * Exact integers: vectors quantize to milli units at the scan; a(x) =
    * own-cluster mean (div n−1, excluding self), b(x) = min over other
    * clusters (div n, ties → smaller label), silhouette
    * `(b−a)·10³ div max(a,b)` (negative numerator is fine — both engines
    * truncate toward zero). Singleton-cluster points are excluded (a is
    * undefined), reported upstream by cluster size if needed.
    */
  def silhouetteAudit(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val pts = graft.operators.Parallelism.ensure(
        emb.select(col(idCol).as("vec_id"), col(labelCol).as("label"),
          transform(col(vecCol).cast(ArrayType(DoubleType)),
            x => round(x * lit(1000.0d)).cast("long")).as("q")))
      .withColumn("nsq",
        aggregate(col("q"), lit(0L), (acc, x) => acc + x * x))
    val dimStats = pts.select(col("label"), col("nsq"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("v")).as("sv"))
      .groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("dim"), col("sv")))).as("_sp"))
      .select(col("label"), transform(col("_sp"), s => s.getField("sv")).as("svec"))
    val szStats = pts.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("nsq")).as("qq"))
    val stats = dimStats.join(szStats, "label")
      .select(col("label").as("other"), col("svec"), col("n"), col("qq"))
    val scored = pts.crossJoin(broadcast(stats))
      .select(col("vec_id"), col("label"), col("other"), col("n"),
        (col("n") * col("nsq") + col("qq") - lit(2L) *
          aggregate(zip_with(col("q"), col("svec"), (x, y) => x * y),
            lit(0L), (acc, x) => acc + x)).as("ssd"))
    val own = scored.filter(col("label") === col("other") && col("n") >= 2)
      .select(col("vec_id"), col("label"), expr("ssd div (n - 1)").as("a"))
    val best = scored.filter(col("label") =!= col("other"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("vec_id"))
          .orderBy(expr("ssd div n"), col("other"))))
      .filter(col("_r") === 1)
      .select(col("vec_id"), col("other").as("best_other"),
        expr("ssd div n").as("b"))
    own.join(best, "vec_id")
      .select(col("vec_id"), col("label"), col("a"), col("best_other"), col("b"),
        expr("(b - a) * 1000 div greatest(a, b, 1)").as("sil_milli"))
  }
}

/** mergeable outer-product accumulator: (count, per-dim sums, upper-triangle
  * product sums) — partial-aggregates map-side like any Spark aggregate
  */
final class OuterProductAgg(d: Int)
    extends org.apache.spark.sql.expressions.Aggregator[Seq[Long], OuterProductAgg.Buf, OuterProductAgg.Buf] {
  import OuterProductAgg.Buf
  private val np = d * (d + 1) / 2

  override def zero: Buf = Buf(0L, new Array[Long](d), new Array[Long](np))

  override def reduce(b: Buf, v: Seq[Long]): Buf = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val arr = v.toArray
    val s = b.s
    val p = b.p
    var i = 0
    var k = 0
    while (i < d) {
      s(i) += arr(i)
      var j = i
      while (j < d) { p(k) += arr(i) * arr(j); k += 1; j += 1 }
      i += 1
    }
    Buf(b.n + 1, s, p)
  }

  override def merge(x: Buf, y: Buf): Buf = {
    val s = x.s.clone()
    val p = x.p.clone()
    var i = 0
    while (i < d) { s(i) += y.s(i); i += 1 }
    var k = 0
    while (k < np) { p(k) += y.p(k); k += 1 }
    Buf(x.n + y.n, s, p)
  }

  override def finish(r: Buf): Buf = r

  override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: org.apache.spark.sql.Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object OuterProductAgg {
  final case class Buf(n: Long, s: Array[Long], p: Array[Long])
}
