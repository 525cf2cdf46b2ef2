package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Margin-based neighbor scoring (the LASER/CCMatrix bitext-mining
  * criterion, Artetxe & Schwenk 2019) and eval-set semantic decontamination
  * — both over a BOUNDED probe side broadcast against the corpus.
  *
  * Exactness: raw cosine ranking needs float sqrt at compare time, so
  * instead every vector is L2-normalized ONCE and quantized to integer
  * milli-units (`unitMilli`); all pairwise scores are then exact 64-bit
  * integer dot products (≈ cosine × 10⁶) and every downstream aggregate,
  * margin, and rank is exact integer arithmetic the DuckDB oracle
  * reproduces bit-for-bit. The only float step is the per-vector
  * normalize+round, identical IEEE ops on both engines.
  *
  * Scale: the probe side (mining queries / benchmark eval set) is bounded
  * by construction; the pair frame is |probe| × corpus rows built by a
  * broadcast join — linear in the corpus, never corpus × corpus. Ranking
  * windows partition by corpus id (|probe| rows per group) or probe id
  * (top-k via one partial-agg'd sort), so no global sort appears anywhere.
  *
  * Contract: probe and corpus are DISTINCT frames; every (probe, corpus)
  * row pair is scored, including pairs whose ids happen to collide — ids
  * from the two frames are unrelated namespaces, so no exclusion predicate
  * is applied (a probe that also appears in the corpus under the same id
  * IS its own nearest neighbor, which is the correct mining semantics).
  * Callers who pass overlapping frames must pre-filter themselves.
  */
object MarginKnn {

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** L2-normalize then quantize to integer milli-units: one float
    * sqrt/divide per vector, exact integers ever after. Null/zero-norm
    * vectors quantize to null (callers filter).
    */
  def unitMilli(vec: Column): Column = {
    val v = asDouble(vec)
    val norm = sqrt(aggregate(v, lit(0.0d), (acc, x) => acc + x * x))
    when(norm > 0.0d,
      transform(v, x => round(x * 1000.0d / norm).cast("long")))
      .otherwise(lit(null).cast("array<long>"))
  }

  /** exact integer dot of two milli-quantized vectors (≈ cos × 10⁶) */
  def dotMicro(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  private def quantized(df: DataFrame, idCol: String, vecCol: String,
      id: String, q: String): DataFrame =
    df.select(col(idCol).as(id), unitMilli(col(vecCol)).as(q))
      .filter(col(q).isNotNull)

  /** Distance-margin mining: for probe x and corpus y,
    * `margin2k = 2k·cos(x,y) − (Σ_{z∈NNk(x)} cos(x,z) + Σ_{z∈NNk(y)} cos(y,z))`
    * — the 'distance' margin scaled by 2k so it stays a pure integer
    * subtraction (ranking is invariant to the positive scale). NNk(x) is
    * taken within the corpus side, NNk(y) within the probe side, both from
    * the ONE pair frame. Emits the top `topN` corpus rows per probe by
    * margin (ties → smaller corpus id).
    */
  def marginTopK(probe: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, topN: Int): DataFrame = {
    require(k >= 1 && topN >= 1, s"k/topN must be >= 1, got $k/$topN")
    val p = quantized(probe, idCol, vecCol, "probe_id", "_pq")
    val c = graft.operators.Parallelism.ensure(
      quantized(corpus, idCol, vecCol, "cand_id", "_cq"))
    val pairs = c.crossJoin(broadcast(p))
      .select(col("probe_id"), col("cand_id"),
        dotMicro(col("_pq"), col("_cq")).as("dot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val probeNn = pairs
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("dot").desc, col("cand_id"))))
      .filter(col("_r") <= k)
      .groupBy(col("probe_id")).agg(sum(col("dot")).as("_pnn"))
    val candNn = pairs
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("cand_id")).orderBy(col("dot").desc, col("probe_id"))))
      .filter(col("_r") <= k)
      .groupBy(col("cand_id")).agg(sum(col("dot")).as("_cnn"))
    pairs
      .join(broadcast(probeNn), "probe_id")
      .join(candNn, "cand_id")
      .select(col("probe_id"), col("cand_id"),
        (col("dot") * (2 * k) - col("_pnn") - col("_cnn")).as("margin2k"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("probe_id"))
          .orderBy(col("margin2k").desc, col("cand_id"))))
      .filter(col("rank") <= topN)
      .select(col("probe_id"), col("rank").cast("int").as("rank"),
        col("cand_id"), col("margin2k"))
  }

  /** Embedding-space decontamination screen: flag every corpus vector whose
    * best cosine against the (bounded, broadcast) eval set reaches
    * `tauMicro` — the semantic twin of the exact-gram screens (q44/q93),
    * catching paraphrased benchmark leakage n-grams miss. One corpus scan;
    * the per-corpus-row argmax is a |eval|-row window, never a shuffle of
    * the corpus beyond the ranking partition.
    */
  def semanticScreen(eval: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, tauMicro: Long): DataFrame = {
    val e = quantized(eval, idCol, vecCol, "eval_id", "_eq")
    val c = graft.operators.Parallelism.ensure(
      quantized(corpus, idCol, vecCol, "vec_id", "_cq"))
    c.crossJoin(broadcast(e))
      .select(col("vec_id"), col("eval_id"),
        dotMicro(col("_cq"), col("_eq")).as("dot"))
      .withColumn("_r", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dot").desc, col("eval_id"))))
      .filter(col("_r") === 1 && col("dot") >= tauMicro)
      .select(col("vec_id"), col("eval_id").as("best_eval_id"),
        col("dot").as("best_dot_micro"))
  }
}
