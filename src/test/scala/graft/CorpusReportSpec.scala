package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.{CorpusStats, QualitySignals, RankEval, TfIdf}
import graft.dedup.Normalize
import graft.operators.TimeFill

/** Round-10 operators vs driver-side truth: normalization-aware dedup
  * grouping, first-seen novelty attribution, APSS cosine against a naive
  * reference, rule attribution on rule-tripping fixtures, LOCF fill
  * semantics, keyness direction, and exact AUC vs the O(n²) pair count.
  */
class CorpusReportSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("normalizedDedupAudit groups case/punct/ws variants, keeps min id") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World!"),
      (2L, "hello   world"),
      (3L, "HELLO WORLD."),
      (4L, "hello world"),
      (5L, "something else"),
      (6L, "something else")   // raw dup of 5
    ).toDF("doc_id", "text")
    val got = Normalize.normalizedDedupAudit(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 4L, true, true),
      (2L, 1L, 4L, false, true),
      (3L, 1L, 4L, false, true),
      (4L, 1L, 4L, false, true),
      (5L, 2L, 2L, true, false),
      (6L, 2L, 2L, false, false)))
  }

  test("gramNovelty attributes each gram to its first document") {
    import spark.implicits._
    val docs = Seq(
      (10L, "a b c"),        // grams "a b", "b c" -> both novel
      (20L, "a b b c"),      // "a b", "b b", "b c" -> only "b b" novel
      (30L, "a b b c")       // nothing novel
    ).toDF("doc_id", "text")
    val got = CorpusStats.gramNovelty(docs, "text", "doc_id", n = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 2L, 2L, 1000000L),
      (20L, 3L, 1L, 333333L),
      (30L, 3L, 0L, 0L)))
  }

  test("cosinePairs matches the naive exact-integer reference") {
    import spark.implicits._
    val rnd = new Random(11)
    val vocab = (1 to 8).map(i => s"t$i")
    val docs = (1 to 18).map { i =>
      (i.toLong, (1 to (3 + rnd.nextInt(8)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // naive reference with the operator's exact integer semantics
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, g) => (id, w, g.length.toLong) }
    }
    val n = tf.map(_._1).distinct.size
    val dfm = tf.groupBy(_._2).map { case (w, rows) => w -> rows.size.toLong }
    val w = tf.map { case (id, t, f) =>
      (id, t, f * math.round(math.log(n.toDouble / dfm(t)) * 1e3))
    }.filter(_._3 > 0)
    val ss = w.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map(r => r._3 * r._3).sum }
    val byDoc = w.groupBy(_._1).map { case (id, rows) =>
      id -> rows.map(r => r._2 -> r._3).toMap }
    val expect = (for {
      a <- byDoc.keys; b <- byDoc.keys if a < b
      num = byDoc(a).keysIterator.filter(byDoc(b).contains)
        .map(t => byDoc(a)(t) * byDoc(b)(t)).sum
      if num > 0
      cos2 = (BigInt(num) * num * 1000000 / (BigInt(ss(a)) * ss(b))).toLong
    } yield (a, b, num, cos2)).toSet
    val got = TfIdf.cosinePairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", t2Ppm = 0L)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expect)
  }

  test("cosinePairs relative cap fails fast past maxRelativeCapDocs") {
    import spark.implicits._
    val docs = (1 to 20).map(i => (i.toLong, s"alpha beta w$i"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TfIdf.cosinePairs(docs, "doc_id", "text", t2Ppm = 0L,
        maxDfPpm = Some(500000L), maxRelativeCapDocs = 10L).collect()
    }
    assert(e.getMessage.contains("maxDf"))
    // absolute cap stays unguarded (the scale path)
    assert(TfIdf.cosinePairs(docs, "doc_id", "text", t2Ppm = 0L,
      maxDf = Some(100L), maxRelativeCapDocs = 10L).count() >= 0)
    // raising the limit re-admits the relative mode explicitly
    assert(TfIdf.cosinePairs(docs, "doc_id", "text", t2Ppm = 0L,
      maxDfPpm = Some(500000L), maxRelativeCapDocs = 100L).count() >= 0)
  }

  test("ruleAttribution counts each tripped rule once per document") {
    import spark.implicits._
    val longOk = (1 to 60).map(i => "word" + ('a' + i % 17).toChar).mkString(" ") +
      " the of and to in is it" // stopwords + length + diversity pass
    val docs = Seq(
      ("a", longOk),                                   // passes all rules
      ("a", "short doc"),                              // r_short only? also stopword/mean
      ("b", ("spam " * 30).trim)                       // repetition + short-ish
    ).toDF("source", "text")
    val got = QualitySignals.ruleAttribution(docs, "text", "source")
      .orderBy("source")
      .select("source", "n_docs", "f_short", "f_repeat", "n_pass")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val a = got.head; val b = got(1)
    assert(a._1 == "a" && a._2 == 2L && a._3 == 1L && a._5 == 1L)
    assert(b._1 == "b" && b._2 == 1L && b._3 == 1L && b._4 == 1L &&
      b._5 == 0L)
  }

  test("locfGrid forward-fills gaps and breaks slot ties by last event") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val events = Seq(
      (1L, ts(0L), 1.0),      // slot 0
      (1L, ts(5L), 2.0),      // slot 0, later -> slot 0 value = 200
      (1L, ts(30L), 7.5),     // slot 3 (step 10s); slots 1-2 filled with 200
      (2L, ts(12L), 4.0)      // single-slot key
    ).toDF("user_id", "ts", "value")
    val got = TimeFill.locfGrid(events, "user_id", "ts", "value", 10L)
      .select(col("user_id"), unix_micros(col("slot_start")).as("us"),
        col("value_cents"), col("filled"))
      .orderBy("user_id", "us")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 200L, false),
      (1L, 10000000L, 200L, true),
      (1L, 20000000L, 200L, true),
      (1L, 30000000L, 750L, false),
      (2L, 10000000L, 400L, false)))
  }

  test("keynessTopK ranks a group-exclusive term first, enriched") {
    import spark.implicits._
    val docs = Seq(
      ("a", "zebra zebra zebra zebra zebra common common common"),
      ("b", "common common common common common other other other")
    ).toDF("source", "text")
    val got = CorpusStats.keynessTopK(docs, "text", "source",
        minCount = 3L, k = 2)
      .orderBy("source", "rank")
      .select("source", "rank", "term", "enriched", "g2_micro")
      .as[(String, Int, String, Boolean, Long)].collect().toSeq
    val topA = got.find(_._1 == "a").get
    assert(topA._3 == "zebra" && topA._4 && topA._5 > 0)
    val topB = got.find(_._1 == "b").get
    assert(topB._3 == "other" && topB._4)
  }

  test("aucExact matches the O(n²) pair count incl. ties across partitions") {
    import spark.implicits._
    val rnd = new Random(23)
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(12).toLong, rnd.nextBoolean()) // heavy score ties
    }
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 2L else if (p == q) 1L else 0L).sum
    val expect = wins * 1000000L / (2L * pos.size * neg.size)
    for (parts <- Seq(1, 3, 16)) {
      val got = RankEval.aucExact(
        rows.toDF("score", "lab").repartition(7), "score", "lab",
        numPartitions = parts)
        .as[(Long, Long, Long)].collect().head
      assert(got == ((pos.size.toLong, neg.size.toLong, expect)),
        s"parts=$parts")
    }
    // degenerate: single class -> null auc
    val one = RankEval.aucExact(
      Seq((5L, true), (6L, true)).toDF("score", "lab"), "score", "lab")
      .select("auc_ppm").collect().head
    assert(one.isNullAt(0))
  }

  test("LshPlanner.sCurve matches the BigInt fold and is monotone in s") {
    val configs = Seq((2, 8), (4, 4), (16, 1))
    val got = graft.dedup.LshPlanner.sCurve(spark, configs)
      .orderBy(col("bands"), col("rows"), col("s_ppm"))
      .select("bands", "rows", "s_ppm", "p_band_ppm", "p_cand_ppm")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    def pow(x: Long, n: Int): Long =
      (1 to n).foldLeft(1000000L)((a, _) => a * x / 1000000L)
    val expect = for {
      (b, r) <- configs.sorted; k <- 1L until 20L
      s = k * 50000L; pb = pow(s, r)
    } yield (b, r, s, pb, 1000000L - pow(1000000L - pb, b))
    assert(got == expect)
    // S-curve sanity: candidate probability nondecreasing in s per layout
    got.groupBy(t => (t._1, t._2)).values.foreach { rows =>
      val ps = rows.sortBy(_._3).map(_._5)
      assert(ps.zip(ps.tail).forall { case (a, c) => a <= c })
      assert(ps.forall(p => p >= 0L && p <= 1000000L))
    }
  }

  test("neighborPairs equals the local sorted-window reference, any partitioning") {
    import spark.implicits._
    val rnd = new Random(31)
    val docs = (1 to 80).map { i =>
      val base = (1 to 6).map(_ => s"w${rnd.nextInt(9)}").mkString(" ")
      // inject prefix-sharing near-dups the window should pair
      (i.toLong, if (i % 7 == 0) base + " extra tail" else base)
    }
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9 \t\n\r\f]+", " ")
      .replaceAll("[ \t\n\r\f]+", " ").trim.take(16)
    def sh(s: String) = graft.dedup.Dedup.shinglesOf(s, 3).toSet
    val pos = docs.sortBy { case (id, t) => (norm(t), id) }
      .zipWithIndex.map { case ((id, t), i) => (id, t, i + 1L) }
    val w = 4
    val expect = (for {
      (ia, ta, pa) <- pos; (ib, tb, pb) <- pos
      if pb > pa && pb - pa <= w
      i = sh(ta).intersect(sh(tb)).size.toLong
      u = sh(ta).size + sh(tb).size - i
    } yield (ia, ib, pa, pb, if (u == 0) 0L else i * 1000000L / u)).toSet
    for (parts <- Seq(1, 5)) {
      val got = graft.dedup.SortedNeighborhood.neighborPairs(
        docs.toDF("doc_id", "text").repartition(3), "doc_id", "text",
        w = w, keyLen = 16, numPartitions = parts)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got == expect, s"parts=$parts")
    }
  }

  test("normHealth counts zero vectors and 4x-mean outliers") {
    import spark.implicits._
    val emb = ((1 to 8).map(i => (i.toLong, Seq(1.0f, 0.0f), 0)) ++ Seq(
      (9L, Seq(0.0f, 0.0f), 0),   // zero vector
      (10L, Seq(10.0f, 0.0f), 0)  // sq = 100e6; 100e6·10 > 4·108e6
    )).toDF("vec_id", "embedding", "label")
    val got = graft.similarity.EmbeddingStats
      .normHealth(emb, "embedding", "label")
      .select("label", "n_vecs", "mean_sq_milli2", "n_zero", "n_outliers")
      .as[(Int, Long, Long, Long, Long)].collect().head
    // sums: 8·1e6 + 0 + 100e6 = 108e6; mean = 10_800_000
    assert(got == ((0, 10L, 10800000L, 1L, 1L)))
  }

  test("diffCounts classifies added/removed/changed/unchanged per slice") {
    import spark.implicits._
    val prev = Seq((1L, "aa", "s1"), (2L, "bb", "s1"), (3L, "cc", "s2"))
      .toDF("doc_id", "text", "source")
    val next = Seq((1L, "aa", "s1"), (2L, "bb CHANGED", "s1"),
      (4L, "dd", "s2")).toDF("doc_id", "text", "source")
    val got = graft.curation.SnapshotDiff
      .diffCounts(prev, next, "doc_id", "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 0L, 0L, 1L, 1L),     // 2 changed, 1 unchanged
      ("s2", 1L, 1L, 0L, 0L)))    // 4 added, 3 removed
  }

  test("stitchPairs joins k-token suffix to prefix, verified exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z a b c"),   // suffix "a b c"
      (2L, "a b c q r s"),   // prefix "a b c" -> pair (1, 2)
      (3L, "a b"),           // too short, drops out
      (4L, "a b c")          // suffix == prefix == "a b c": pairs with 1, 2
    ).toDF("doc_id", "text")
    val got = graft.dedup.Stitch.stitchPairs(docs, "doc_id", "text", 3)
      .orderBy("head_id", "tail_id")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, "a b c"), (1L, 4L, "a b c"),
      (4L, 2L, "a b c")))
  }

  test("rebalanceRates hits the bottleneck source exactly") {
    import spark.implicits._
    val docs = Seq(
      ("big", (1 to 300).map(_ => "w").mkString(" ")),
      ("small", (1 to 100).map(_ => "w").mkString(" "))
    ).toDF("source", "text")
    val got = graft.sampling.Sampling.rebalanceRates(docs, "text", "source")
      .orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // uniform target 500000 ppm each; bottleneck = small: T' = 200
    // big: keep 100 of 300 -> rate 333333; small: keep 100 of 100 -> 1e6
    assert(got == Seq(
      ("big", 300L, 750000L, 500000L, 333333L, 100L),
      ("small", 100L, 250000L, 500000L, 1000000L, 100L)))
  }

  test("weightedJaccardAudit separates multiset from set similarity") {
    import spark.implicits._
    // identical SHINGLE SETS (so the pair is an LSH candidate with set
    // jaccard 1.0) but different token multiplicities
    val docs = Seq(
      (1L, "a b c a b c"),         // tf a2 b2 c2, S=6
      (2L, "a b c a b c a b c")    // tf a3 b3 c3, S=9
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup
      .weightedJaccardAudit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // wjac = 6/(15-6) = 666666 ppm; set jac = 1e6
    assert(got == Seq((1L, 2L, 1000000L, 666666L, -333334L)))
  }

  test("bbitMinhashAudit: identical gram sets agree on every bit, est 1.0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e"),     // identical -> candidate, 16/16 bits, J=1
      (3L, "p q r s t u")    // disjoint; only a candidate if bands collide
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.bbitMinhashAudit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val pair = got.find(p => p._1 == 1L && p._2 == 2L).get
    assert(pair == ((1L, 2L, 16L, 1000000L, 1000000L, 0L)))
    // any colliding disjoint pair must report jac 0 and est in [-1e6, 1e6]
    got.filterNot(p => p._1 == 1L && p._2 == 2L).foreach { p =>
      assert(p._5 == 0L && p._4 >= -1000000L && p._4 <= 1000000L)
    }
  }
}
