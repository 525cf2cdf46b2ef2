package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native vector kernels for the similarity operators.
  *
  * The pure-Column formulations (`aggregate(zip_with(a, b, _ * _), ...)`)
  * are kept in [[graft.similarity.Similarity]] as documentation and oracle
  * mirrors, but Catalyst's higher-order functions don't participate in
  * whole-stage codegen and allocate an intermediate array per evaluation —
  * on a scored |Q|x|C| join that's the hot path. These expressions generate
  * a tight primitive loop (`doGenCode`), keep the surrounding stage inside
  * WholeStageCodegen, and evaluate in strictly the same fold order as the
  * HOF form, so results are bit-identical (VectorExprSpec pins equivalence).
  */
object VectorExpressions {

  /** Both operands must be `array<double>` ([[VectorColumns]] casts on the
    * way in; SQL callers must cast explicitly — no implicit coercion here).
    */
  private[expressions] def checkDoubleArrays(
      name: String, left: Expression, right: Expression): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
}

/** `dot_product(a, b)`: sequential-fold dot product of two double arrays.
  * Bit-identical to `aggregate(zip_with(a, b, _ * _), 0d, _ + _)` on
  * equal-length null-free arrays; null on null input or length mismatch.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var s = 0.0
      var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override def prettyName: String = "dot_product"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cosine_sim(a, b)`: cosine similarity in one pass (three accumulators,
  * one array traversal). Each accumulator folds in the same sequential order
  * as the HOF form `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, so the
  * result is bit-identical; null on null input, length mismatch, or a zero
  * denominator (matching Spark's null-on-zero-divisor `Divide`).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sab = 0.0
      var saa = 0.0
      var sbb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getDouble(i)
        val yv = y.getDouble(i)
        sab += xv * yv; saa += xv * xv; sbb += yv * yv
        i += 1
      }
      val denom = math.sqrt(saa) * math.sqrt(sbb)
      if (denom == 0.0) null else sab / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val denom = ctx.freshName("denom")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $xv = $x.getDouble($i);
         |    final double $yv = $y.getDouble($i);
         |    $sab += $xv * $yv; $saa += $xv * $xv; $sbb += $yv * $yv;
         |  }
         |  final double $denom = java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb);
         |  if ($denom == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $sab / $denom;
         |  }
         |}
       """.stripMargin
    })

  override def prettyName: String = "cosine_sim"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
