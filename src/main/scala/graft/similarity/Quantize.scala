package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Scalar int8 embedding quantization (the FAISS `SQ8` / blockwise-absmax
  * family): each vector is quantized independently with its own absmax
  * scale, `code_i = round(v_i / (absmax/127))` clamped to [−127, 127] —
  * a 4× memory cut that is the standard prerequisite for serving a
  * 100 TB embedding corpus from an ANN index.
  *
  * Everything is a per-row projection over the vector column — no shuffle,
  * no UDF: cast-to-double, HOF `transform`s, and integer-micro error
  * aggregation all stay inside whole-stage codegen. Intermediates (the cast
  * array, absmax, scale) are bound to attributes BEFORE the lambdas that
  * use them, so Catalyst re-evaluates only attribute references inside the
  * HOFs (the repo-wide lambda gotcha).
  *
  * Determinism: float→double widening is exact; `/`, `*`, `−` are single
  * correctly-rounded IEEE ops; per-element errors are quantized to integer
  * micro units BEFORE the list sum, so every reported number is an exact
  * integer any engine reproduces bit-for-bit.
  */
object Quantize {

  /** Per-vector absmax-SQ8 reconstruction stats:
    * (idCol, absmax_micro, max_err_micro, sum_err_micro) where errors are
    * |v_i − dequant(quant(v_i))| in integer micro units. A zero vector
    * (absmax = 0) quantizes to all-zero codes with zero error.
    */
  def sq8Stats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val errMicro: Column = {
      val scale = col("_graft_scale")
      transform(col("_graft_v"), x => {
        val code = when(scale === 0.0d, lit(0.0d))
          .otherwise(greatest(least(round(x / scale), lit(127.0d)), lit(-127.0d)))
        round(abs(x - code * scale) * 1000000.0d).cast("long")
      })
    }
    emb
      .select(col(idCol), col(vecCol).cast(ArrayType(DoubleType)).as("_graft_v"))
      .select(col(idCol), col("_graft_v"),
        array_max(transform(col("_graft_v"), x => abs(x))).as("_graft_absmax"))
      .select(col(idCol), col("_graft_v"), col("_graft_absmax"),
        (col("_graft_absmax") / 127.0d).as("_graft_scale"))
      .select(col(idCol),
        round(col("_graft_absmax") * 1000000.0d).cast("long").as("absmax_micro"),
        errMicro.as("_graft_errm"))
      .select(col(idCol),
        col("absmax_micro"),
        array_max(col("_graft_errm")).as("max_err_micro"),
        aggregate(col("_graft_errm"), lit(0L), (acc, e) => acc + e)
          .as("sum_err_micro"))
  }
}
