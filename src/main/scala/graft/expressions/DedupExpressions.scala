package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dedup.Dedup

/** Native expression forms of the dedup kernels. A `ScalaUDF` pays a
  * CatalystTypeConverters round-trip per row (ArrayData → Seq[String] →
  * ArrayData, materializing java Strings); these expressions consume
  * `UTF8String` bytes straight out of the columnar row and emit ArrayData
  * directly. The kernels are digest-bound, so `CodegenFallback` costs
  * nothing — the win is the skipped conversion layer. Output is
  * byte-identical to the UDF forms (DedupKernelSpec pins kernel↔column
  * equivalence; the q25/q26/q30 oracle hashes pin end-to-end).
  */
object DedupExpressions {

  /** text → distinct n-word shingles (column form of [[Dedup.shinglesOf]]) */
  def shingles(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShinglesExpr(GraftSqlBridge.expression(text), n))

  /** shingles → band-qualified LSH bucket hashes
    * (column form of `bandHashesOf(minhashOf(sh, k), bands, k / bands)`)
    */
  def minhashBands(shingles: Column, k: Int, bands: Int): Column =
    GraftSqlBridge.column(
      MinHashBandsExpr(GraftSqlBridge.expression(shingles), k, bands))

  /** shingles → k-element minhash signature */
  def minhashSig(shingles: Column, k: Int): Column =
    GraftSqlBridge.column(
      MinHashSigExpr(GraftSqlBridge.expression(shingles), k))
}

case class ShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n > 0, s"shingle length must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"shingles expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val sh = Dedup.shinglesOf(input.asInstanceOf[UTF8String].toString, n)
    new GenericArrayData(sh.map(UTF8String.fromString).toArray[Any])
  }

  override def prettyName: String = "shingles"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** base for the minhash-consuming expressions: pulls the shingle bytes out
  * of the input ArrayData without materializing Strings
  */
trait MinhashInput { self: UnaryExpression =>

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<string> shingles, got ${dt.catalogString}")
    }

  /** null elements are skipped (arrays from joins/HOFs are often typed
    * containsNull=true even when no null ever occurs)
    */
  protected def shingleBytes(input: Any): Array[Array[Byte]] = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Array[Byte]](n)
    var i = 0
    var j = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        out(j) = arr.getUTF8String(i).getBytes
        j += 1
      }
      i += 1
    }
    if (j == n) out else java.util.Arrays.copyOf(out, j)
  }
}

case class MinHashBandsExpr(child: Expression, k: Int, bands: Int)
    extends UnaryExpression with MinhashInput with CodegenFallback {

  require(k > 0 && bands > 0 && k % bands == 0,
    s"k must be a positive multiple of bands, got k=$k bands=$bands")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bh = Dedup.bandHashesOf(
      Dedup.minhashOfBytes(shingleBytes(input), k), bands, k / bands)
    new GenericArrayData(bh.map(UTF8String.fromString).toArray[Any])
  }

  override def prettyName: String = "minhash_bands"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with MinhashInput with CodegenFallback {

  require(k > 0, s"k must be positive, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullSafeEval(input: Any): Any = {
    val sig = Dedup.minhashOfBytes(shingleBytes(input), k)
    new GenericArrayData(sig.map(s =>
      if (s == null) null else UTF8String.fromString(s)).toArray[Any])
  }

  override def prettyName: String = "minhash_sig"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
