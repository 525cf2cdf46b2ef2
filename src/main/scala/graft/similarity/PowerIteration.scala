package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dominant principal direction of the embedding cloud by fixed-iteration
  * power method on the exact integer covariance — the "is the embedding
  * space collapsing onto one axis" health check (anisotropy / dimensional
  * collapse is the classic failure of pooled sentence embeddings; its
  * signature is one direction soaking up the variance).
  *
  * Everything stays engine-reproducible integer arithmetic: the covariance
  * numerators come from the one-pass [[OuterProductAgg]] (q100's kernel),
  * get pre-scaled by `s = max(1, max|M| div 10⁶)` (a DATA-DERIVED constant,
  * identical in the oracle) so per-iteration products fit in 64 bits, and
  * each iteration is `y = M·v; v ← y·10³ div max|y|` — max-norm
  * renormalization with integral division, so after every step |v|∞ = 10³
  * exactly and the fixpoint is bit-reproducible. The DuckDB oracle unrolls
  * the same iterations (the q149 PageRank pattern).
  *
  * Output: one row per dimension with the iterated direction in milli
  * units, plus dim = −1 carrying the dominant-eigenvalue proxy
  * `max|M·v| div 10³` (in scaled-covariance units) and dim = −2 carrying
  * the scale divisor so absolute magnitudes are recoverable.
  *
  * Scale: the covariance pass is the only corpus-sized stage (partial-agg'd
  * mergeable aggregate); iterations run on the d²-bounded matrix frame.
  */
object PowerIteration {

  def dominantDirection(emb: DataFrame, vecCol: String, dim: Int,
      iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 8, s"iterations 1..8, got $iterations")
    // persist the d²-bounded covariance frame: the corpus-sized aggregate
    // behind it must run ONCE, not once per downstream consumer
    val cov = EmbeddingStats.covarianceAudit(emb, vecCol, dim)
      .select(col("i"), col("j"), col("cov_num"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val full = cov.unionAll(cov.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("cov_num")))
    val scale = full.agg(greatest(lit(1L),
      expr("max(abs(cov_num)) div 1000000")).as("mscale"))
    val m = full.crossJoin(broadcast(scale))
      .select(col("i"), col("j"), expr("cov_num div mscale").as("ms"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spark = emb.sparkSession
    import spark.implicits._
    var v: DataFrame = (0 until dim).map(d => (d.toLong, 1000L)).toDF("dim", "v")
    var lastMax: DataFrame = null
    for (_ <- 1 to iterations) {
      val y = m.join(broadcast(v), col("j") === col("dim"))
        .groupBy(col("i")).agg(sum(col("ms") * col("v")).as("y"))
      val mx = y.agg(greatest(lit(1L), max(abs(col("y")))).as("mx"))
      v = y.crossJoin(broadcast(mx))
        .select(col("i").as("dim"), expr("(y * 1000) div mx").as("v"))
      lastMax = mx
    }
    val dims = v.select(col("dim"), col("v").as("v_milli"))
    val lambda = lastMax.select(lit(-1L).as("dim"), expr("mx div 1000").as("v_milli"))
    val sc = scale.select(lit(-2L).as("dim"), col("mscale").as("v_milli"))
    dims.unionAll(lambda).unionAll(sc)
  }
}
