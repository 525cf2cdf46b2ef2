package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sign-random-projection (Johnson–Lindenstrauss) compression of an
  * embedding column: out_j = Σ_i s(i,j)·x_i with deterministic ±1 signs, the
  * standard cheap dimensionality reduction before clustering / ANN when the
  * full embedding width is too expensive to shuffle (a 64→16 projection cuts
  * every downstream exchange 4×, and JL guarantees pairwise distances are
  * preserved within ~1/sqrt(outDim)).
  *
  * Determinism/oracle contract: inputs are quantized to integer micro-units
  * (round(x·1e6), the q101 scheme) and the signs come from bit 16 of the
  * glibc-constants LCG `1103515245·k + 12345` with k = i·outDim + j + 1 —
  * the whole projection is exact 64-bit integer arithmetic, reproducible
  * bit-for-bit in any engine (no float summation order, no libm).
  *
  * Scale shape: pure per-row higher-order functions (one quantize pass, one
  * aggregate per output dim) — no shuffle, no UDF; the posexplode emits
  * outDim rows per vector only because the gate wants a long table; callers
  * keeping the array form skip it.
  */
object Projection {

  /** vec_id, j (0-based output dim), comp (integer micro-unit component) */
  def signProjection(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val q = graft.operators.Parallelism.ensure(
        df.select(col(idCol).as("vec_id"), col(vecCol).as("_v")))
      .select(col("vec_id"),
        expr("transform(_v, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
          .as("xq"))
    q.select(col("vec_id"), posexplode(expr(
        s"""transform(sequence(0, ${outDim - 1}), j ->
           |  aggregate(sequence(0, size(xq) - 1), CAST(0 AS BIGINT),
           |    (acc, i) -> acc + CASE WHEN
           |        ((CAST(1103515245 AS BIGINT) * (i * $outDim + j + 1)
           |          + 12345) div 65536) % 2 = 1
           |      THEN element_at(xq, i + 1)
           |      ELSE -element_at(xq, i + 1) END))""".stripMargin))
        .as(Seq("j", "comp")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("comp"))
  }
}
