package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.DupSpans

/** Semantics of exact duplicated-span detection + removal that the q70
  * oracle row can't pin: span maximality/disjointness, within-document
  * repeats, the strip action, and the no-duplicates case.
  */
class DupSpansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def spans(rows: Seq[(Long, String)], n: Int) =
    DupSpans.duplicatedSpans(rows.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("cross-document duplicated n-gram yields the covering span in both docs") {
    val shared = "one two three four"            // one 4-gram, shared
    val got = spans(Seq(
      (1L, s"alpha $shared beta"),
      (2L, s"$shared gamma delta"),
      (3L, "no overlap at all here")), n = 4)
    // doc 1: tokens alpha one two three four beta → gram start 1, covers 1..4
    // doc 2: gram start 0 covers 0..3
    assert(got == Seq((1L, 1L, 4L, 4L), (2L, 0L, 3L, 4L)))
  }

  test("overlapping and adjacent duplicated grams coalesce into one maximal span") {
    // two docs share a 6-word passage → three overlapping 4-grams each;
    // coverage must merge into ONE span per doc, not three
    val p = "a b c d e f"
    val got = spans(Seq((1L, s"x $p"), (2L, s"$p y")), n = 4)
    assert(got == Seq((1L, 1L, 6L, 6L), (2L, 0L, 5L, 6L)))
  }

  test("within-document repetition counts as duplication") {
    val got = spans(Seq((1L, "p q r s junk1 junk2 p q r s")), n = 4)
    assert(got == Seq((1L, 0L, 3L, 4L), (1L, 6L, 9L, 4L)))
  }

  test("corpus with no repeated n-gram yields no spans; short docs are safe") {
    val got = spans(Seq(
      (1L, "w1 w2 w3 w4 w5"), (2L, "v1 v2 v3 v4 v5"), (3L, "tiny")), n = 4)
    assert(got.isEmpty)
  }

  test("stripDuplicatedSpans removes exactly the covered words, keeps order") {
    val df = Seq(
      (1L, "alpha one two three four beta"),
      (2L, "one two three four gamma delta")).toDF("doc_id", "text")
    val got = DupSpans.stripDuplicatedSpans(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "alpha beta", 2L -> "gamma delta"))
  }

  test("a fully-duplicated document strips to no output row") {
    val df = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = DupSpans.stripDuplicatedSpans(df, "doc_id", "text", n = 4)
      .collect()
    assert(got.isEmpty)
  }

  test("zero-token documents survive the strip (nothing was duplicated)") {
    val df = Seq(
      (1L, "a b c d"), (2L, "a b c d"),   // fully duplicated: dropped
      (3L, "   "),                        // whitespace-only: no tokens
      (4L, "unique words only here")      // untouched
    ).toDF("doc_id", "text")
    val got = DupSpans.stripDuplicatedSpans(df, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "", 4L -> "unique words only here"), got.toString)
  }

  test("precomputed-spans overload matches the convenience entry") {
    val df = Seq(
      (1L, "alpha one two three four beta"),
      (2L, "one two three four gamma delta")).toDF("doc_id", "text")
    val spans = DupSpans.duplicatedSpans(df, "doc_id", "text", n = 4)
    val viaSpans = DupSpans.stripDuplicatedSpans(df, "doc_id", "text", spans)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaSpans == Map(1L -> "alpha beta", 2L -> "gamma delta"))
  }

  private def cdc(rows: Seq[(Long, String)]) =
    graft.dedup.CdcChunks.chunks(rows.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id", "chunk_seq")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getString(4)))

  test("CDC chunks tile the document exactly") {
    // varied text: thousands of distinct windows so the 1/64 boundary
    // residue is hit many times (a short repeating unit can tile the whole
    // doc into one chunk if none of its few distinct windows hits)
    val text = (1 to 400).map(i => s"tok$i word$i").mkString(" ")
    val got = cdc(Seq((1L, text)))
    assert(got.length > 1, s"expected multiple chunks, got ${got.length}")
    // contiguous tiling: starts follow ends, lengths sum to the text
    assert(got.head._3 == 1L)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + a._4, s"gap between $a and $b")
    case _ => }
    assert(got.map(_._4).sum == text.length)
  }

  test("CDC boundaries are shift-resistant: a prefix edit only moves chunk 1") {
    val base = (1 to 300).map(i => s"item$i value${i * 7}").mkString(" ")
    val edited = "INSERTED-PREFIX " + base
    val a = cdc(Seq((1L, base))).map(_._5)
    val b = cdc(Seq((1L, edited))).map(_._5)
    assert(a.length > 2, s"fixture too short: ${a.length} chunks")
    // every chunk after the first is content-addressed past the edit:
    // identical hash sequence (fixed-size chunking would shift them all)
    assert(a.drop(1).toSeq == b.drop(1).toSeq,
      s"tails differ:\n${a.mkString(",")}\n${b.mkString(",")}")
  }

  test("CDC short and empty documents") {
    val got = cdc(Seq((1L, "tiny"), (2L, "")))
    // sub-window doc: one whole-text chunk; empty doc: dropped
    assert(got.toSeq == Seq((1L, 0, 1L, 4L,
      java.security.MessageDigest.getInstance("MD5").digest("tiny".getBytes)
        .map("%02x".format(_)).mkString)))
  }
}
