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

  /** text → distinct winnowing fingerprints (single-pass native form of
    * the [[graft.dedup.Winnowing]] HOF pipeline)
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowExpr(GraftSqlBridge.expression(text), k, w))
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

/** Single-pass winnowing kernel: all k-gram md5 prefixes, the w-window
  * sliding minimum, and the per-document distinct in ONE traversal of the
  * input bytes. The HOF formulation (`Winnowing.fingerprintsHof`, kept as
  * the executable spec) pays per gram: a `substring` UTF8String copy, a
  * fresh MessageDigest inside Spark's `md5`, a 32-char hex UTF8String plus
  * its 16-char prefix copy, and per WINDOW a w-element `slice` array — all
  * inside interpreted HOF lambdas. This kernel reuses one thread-local
  * digest, compares hashes as unsigned longs (the first 8 md5 bytes —
  * lexicographic on the 16 lowercase hex chars ≡ unsigned numeric on the
  * big-endian value), takes the sliding minimum with a monotonic deque
  * (O(1) amortized per window vs O(w) slice+min), and only materializes
  * hex strings for the distinct survivors (~2/(w+1) density). Output rows
  * are byte-identical to the HOF pipeline (DedupKernelSpec property-pins
  * it; the q66 oracle hash pins it end-to-end vs DuckDB).
  *
  * Character semantics match Spark's `substring`: positions count Unicode
  * code points, and each gram is hashed over its UTF-8 bytes — the byte
  * walk below starts a character at every non-continuation byte.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 2 && w >= 1, s"bad k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nB = bytes.length
    // char-start byte offsets, one extra slot for the end. The walk must
    // advance by the LEAD byte's declared length (UTF8String
    // .numBytesForFirstByte — exactly what numChars/substring do), not by
    // skipping continuation bytes: on malformed UTF-8 (a truncated
    // multibyte lead followed by ASCII) the two disagree, and gram
    // boundaries must match Spark's substring for the HOF/oracle parity.
    val offs = new Array[Int](nB + 1)
    var nChars = 0
    var b = 0
    while (b < nB) {
      offs(nChars) = b
      nChars += 1
      b += UTF8String.numBytesForFirstByte(bytes(b))
    }
    offs(nChars) = nB
    if (nChars < k + w - 1) return new GenericArrayData(Array.empty[Any])

    val h = nChars - k + 1
    val md = WinnowExpr.md5.get()
    val out16 = new Array[Byte](16)
    val hashes = new Array[Long](h)
    var i = 0
    while (i < h) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      md.digest(out16, 0, 16)
      hashes(i) =
        ((out16(0) & 0xffL) << 56) | ((out16(1) & 0xffL) << 48) |
        ((out16(2) & 0xffL) << 40) | ((out16(3) & 0xffL) << 32) |
        ((out16(4) & 0xffL) << 24) | ((out16(5) & 0xffL) << 16) |
        ((out16(6) & 0xffL) << 8) | (out16(7) & 0xffL)
      i += 1
    }

    // monotonic deque of indices; head holds the current window's minimum.
    // On ties the later index wins (same VALUE emitted, longer lifetime).
    val distinct = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](h)
    var head = 0
    var tail = 0
    var j = 0
    while (j < h) {
      while (tail > head &&
          java.lang.Long.compareUnsigned(hashes(deque(tail - 1)), hashes(j)) >= 0)
        tail -= 1
      deque(tail) = j
      tail += 1
      if (deque(head) <= j - w) head += 1
      if (j >= w - 1) distinct.add(hashes(deque(head)))
      j += 1
    }

    val arr = new Array[Any](distinct.size)
    val it = distinct.iterator()
    var x = 0
    while (it.hasNext) {
      arr(x) = UTF8String.fromString(f"${it.next().longValue()}%016x")
      x += 1
    }
    new GenericArrayData(arr)
  }

  override def prettyName: String = "winnow_fingerprints"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  /** MessageDigest is stateful and tasks can share a deserialized
    * expression tree in local mode — one digest per thread
    */
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}
