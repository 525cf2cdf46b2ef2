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

  // ---- SubstringDedup: planted-substring semantics the q203/q204 oracle
  // rows can't isolate — keep-one canonical choice, cross-doc floor vs
  // within-doc repetition, and cluster separation by full-span content

  private def substringFixture(rows: Seq[(Long, String)], minWords: Int) = {
    import graft.dedup.SubstringDedup
    val toks = SubstringDedup.tokenFrame(rows.toDF("doc_id", "text"),
      "doc_id", "text").persist()
    val spans = SubstringDedup.crossDocSpans(toks, "doc_id", minWords)
    (SubstringDedup.substringClusters(spans, "doc_id").collect()
       .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
         r.getLong(4), r.getLong(5))).toSeq,
     SubstringDedup.dedupVerdicts(spans, "doc_id").collect()
       .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5)))
       .sortBy(t => (t._1, t._2)).toSeq)
  }

  test("planted substring across 3 docs: one cluster, first occurrence kept") {
    val planted = (1 to 6).map(i => s"dup$i").mkString(" ") // 6 shared words
    val (clusters, verdicts) = substringFixture(Seq(
      (10L, s"pre1 pre2 $planted post1"),
      (20L, s"$planted tail1 tail2"),
      (30L, s"a b c d $planted"),
      (40L, "entirely unrelated words only here")), minWords = 5)
    assert(clusters.size == 1)
    val c = clusters.head
    // 6-word span in all three docs, canonical = (10, start 2)
    assert((c._2, c._3, c._4, c._5, c._6) == (6L, 3L, 3L, 10L, 2L))
    assert(verdicts == Seq((10L, 2L, true), (20L, 0L, false),
      (30L, 4L, false)))
  }

  test("within-doc-only repetition is NOT cross-document duplication") {
    // the same 5 words twice in ONE doc: DupSpans.minCount=2 would fire,
    // the distinct-doc floor must not
    val p = "r1 r2 r3 r4 r5"
    val (clusters, verdicts) =
      substringFixture(Seq((1L, s"$p mid $p"), (2L, "other stuff entirely")),
        minWords = 5)
    assert(clusters.isEmpty && verdicts.isEmpty)
  }

  test("applyKeepOne strips non-canonical spans; re-run finds no cross-doc dups") {
    import graft.dedup.SubstringDedup
    val planted = (1 to 6).map(i => s"dup$i").mkString(" ")
    val docs = Seq(
      (10L, s"pre1 pre2 $planted post1"),
      (20L, s"$planted tail1 tail2"),
      (30L, s"a b c d $planted"),
      (40L, "entirely unrelated words only here"),
      (50L, planted) // nothing BUT the duplicated span: fully removed
    ).toDF("doc_id", "text")
    val toks = SubstringDedup.tokenFrame(docs, "doc_id", "text").persist()
    val spans = SubstringDedup.crossDocSpans(toks, "doc_id", minWords = 5)
    val verdicts = SubstringDedup.dedupVerdicts(spans, "doc_id")
    val audit = SubstringDedup.applyKeepOne(toks, verdicts, "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    // doc 10 is canonical (keeps all 9 tokens); 20/30 lose the 6 planted
    // words; 40 untouched; 50 fully stripped
    assert(audit == Seq((10L, 9L, 9L, 0L), (20L, 8L, 2L, 1L),
      (30L, 10L, 4L, 1L), (40L, 5L, 5L, 0L), (50L, 6L, 0L, 1L)))
    val texts = SubstringDedup.keepOneText(toks, verdicts, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(10L) == s"pre1 pre2 $planted post1")
    assert(texts(20L) == "tail1 tail2")
    assert(texts(30L) == "a b c d")
    assert(texts(50L) == "")
    // the Lee et al. keep-one invariant: re-running crossDocSpans on the
    // STRIPPED corpus finds no cross-document duplicated substring — only
    // the canonical occurrence survives anywhere
    val toks2 = SubstringDedup.tokenFrame(
      SubstringDedup.keepOneText(toks, verdicts, "doc_id"), "doc_id", "text")
    assert(SubstringDedup.crossDocSpans(toks2, "doc_id", minWords = 5)
      .count() == 0L)
  }

  test("asymmetric surroundings split clusters by full-span content") {
    // docs 1+2 share "s1..s6"; doc 1 ALSO shares its neighboring words
    // with doc 3, so doc 1's maximal island extends past the 6 shared
    // words → its span content differs from doc 2's exact span: separate
    // clusters (membership asserts exact full-span equality)
    val core = "s1 s2 s3 s4 s5 s6"
    val ext = s"e1 e2 e3 e4 $core"
    val (clusters, _) = substringFixture(Seq(
      (1L, ext),                       // island covers all 10 words
      (2L, s"x1 x2 $core"),            // island covers the 6 core words
      (3L, s"$ext y1")), minWords = 5)
    // doc1+doc3 share the 10-word span (one cluster, n_docs=2); doc 2's
    // 6-word span is content-distinct (its own cluster, n_docs=1)
    assert(clusters.size == 2)
    val bySize = clusters.sortBy(_._2)
    assert((bySize(0)._2, bySize(0)._3) == (6L, 1L))
    assert((bySize(1)._2, bySize(1)._3) == (10L, 2L))
  }

  test("memorizationRisk: occurrence-counted (within-doc repeats), exact ppm") {
    val docs = Seq(
      // the 8-gram "w1..w8" occurs at pos 0 AND pos 9 (within-doc repeat)
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 x w1 w2 w3 w4 w5 w6 w7 w8"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8"), // third occurrence -> k=3 floor met
      (3L, "a b c d e f g h i")).toDF("doc_id", "text")
    val grams = DupSpans.gramStarts(docs, "doc_id", "text", 8)
    val got = DupSpans.memorizationRisk(grams, "doc_id", k = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      1L -> ((10L, 2L, 200000L)),
      2L -> ((1L, 1L, 1000000L)),
      3L -> ((2L, 0L, 0L))))
  }

  test("gramStartsFromTokens over a token frame equals gramStarts over " +
      "text (the q225 no-retokenize claim)") {
    import graft.dedup.SubstringDedup
    // messy whitespace: the token frame and the text path must agree
    // because cleanTokens drops empties on both routes
    val docs = Seq(
      (1L, "  a b\tc d e  f g h i "),
      (2L, "x y z w v u t s r q p")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getStruct(2).getLong(0), r.getStruct(2).getLong(1))).toSet
    val direct = rows(DupSpans.gramStarts(docs, "doc_id", "text", 8))
    val viaToks = rows(DupSpans.gramStartsFromTokens(
      SubstringDedup.tokenFrame(docs, "doc_id", "text"),
      "doc_id", "_graft_toks", 8))
    assert(direct == viaToks && direct.nonEmpty, direct.toString)
  }

  test("keep-one strip strictly reduces memorization exposure (q225 pair)") {
    import graft.dedup.SubstringDedup
    // a 10-word passage in 3 docs: its 8-grams occur 3× (>= k) before the
    // strip; keep-one leaves ONE copy, so every count drops to 1 (< k)
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10"
    val docs = Seq(
      (1L, s"$passage u1 u2 u3 u4 u5 u6 u7 u8"),
      (2L, s"v1 v2 v3 v4 v5 v6 v7 v8 $passage"),
      (3L, s"x1 x2 x3 $passage y1 y2 y3")).toDF("doc_id", "text")
    def riskyTotal(d: org.apache.spark.sql.DataFrame): Long =
      DupSpans.memorizationRisk(
          DupSpans.gramStarts(d, "doc_id", "text", 8), "doc_id", k = 3)
        .agg(org.apache.spark.sql.functions.sum("n_risky")).head.getLong(0)
    val before = riskyTotal(docs)
    val toks = SubstringDedup.tokenFrame(docs, "doc_id", "text")
    val verdicts = SubstringDedup.dedupVerdicts(
      SubstringDedup.crossDocSpans(toks, "doc_id", minWords = 5,
        minDocs = 2), "doc_id")
    val after = riskyTotal(SubstringDedup.keepOneText(toks, verdicts,
      "doc_id"))
    assert(before == 9L, s"before=$before") // 3 grams/occurrence × 3 docs
    assert(after == 0L, s"after=$after")    // surviving copy occurs once
  }
}
