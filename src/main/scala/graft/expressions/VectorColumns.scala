package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.GraftSqlBridge

/** Column builders for the native vector expressions. Inputs are cast to
  * `array<double>` so callers can pass float embeddings directly.
  */
object VectorColumns {

  private def toDoubleArray(c: Column): Column = c.cast("array<double>")

  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(toDoubleArray(a)),
      GraftSqlBridge.expression(toDoubleArray(b))))

  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(CosineSimilarity(
      GraftSqlBridge.expression(toDoubleArray(a)),
      GraftSqlBridge.expression(toDoubleArray(b))))
}
