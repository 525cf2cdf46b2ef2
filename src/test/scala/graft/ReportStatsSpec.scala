package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Correlation, DriftStats, Survival}
import graft.sampling.Sampling

/** Unit semantics for the q159–q162 reporting operators: KS drift edge
  * cases, Kaplan–Meier censoring arithmetic, exact correlation signs, and
  * the content-addressed bootstrap weight law.
  */
class ReportStatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("ksDrift: identical distributions → 0; disjoint supports → ~1e6") {
    import spark.implicits._
    // a and b share the same values; c sits entirely above both
    val df = (Seq.tabulate(20)(i => ("a", i % 5)) ++
      Seq.tabulate(20)(i => ("b", i % 5)) ++
      Seq.tabulate(10)(i => ("c", 100 + i))).toDF("src", "v")
    val got = DriftStats.ksDriftBySource(df, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // a vs rest(b ∪ c): b matches a exactly but c drags the rest ECDF down
    // at a's support: D = |1 − 20/30| = 1/3 at v=4
    assert(got("a") == 333333L)
    assert(got("b") == 333333L)
    // c vs rest: at v=4 rest ECDF=1, c ECDF=0 → D=1
    assert(got("c") == 1000000L)
  }

  test("wasserstein1: constant shift reads in value units; identical → 0") {
    import spark.implicits._
    // a: 20 values at v; b: the same shape shifted by +7 → W1(a vs b) = 7
    val df = (Seq.tabulate(20)(i => ("a", i % 5)) ++
      Seq.tabulate(20)(i => ("b", (i % 5) + 7))).toDF("src", "v")
    val got = DriftStats.wasserstein1BySource(df, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got("a") == 7000L && got("b") == 7000L, got.toString)
    val twin = (Seq.tabulate(20)(i => ("x", i % 5)) ++
      Seq.tabulate(20)(i => ("y", i % 5))).toDF("src", "v")
    val g2 = DriftStats.wasserstein1BySource(twin, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(g2("x") == 0L && g2("y") == 0L, g2.toString)
    // single source → empty (n_rest guard)
    assert(DriftStats.wasserstein1BySource(
      Seq.tabulate(5)(i => ("only", i)).toDF("src", "v"), col("v"), "src")
      .count() == 0L)
  }

  test("ksDrift: single-source corpus has no 'rest' → empty, not div-by-zero") {
    import spark.implicits._
    val df = Seq.tabulate(10)(i => ("only", i)).toDF("src", "v")
    assert(DriftStats.ksDriftBySource(df, col("v"), "src").count() == 0L)
  }

  test("kaplanMeier: censored users never count as deaths; product-limit steps") {
    import spark.implicits._
    import java.sql.Timestamp
    def ev(u: Long, day: Int) = (u, Timestamp.valueOf(f"2024-02-$day%02d 10:00:00"))
    // observation ends day 10. u1: days 1-2 (t=1, churn); u2: days 1-10
    // (t=9, censored); u3: day 3 only (t=0, churn); u4: days 2-10 (t=8, censored)
    val df = (Seq(ev(1, 1), ev(1, 2), ev(3, 3), ev(4, 2)) ++
      Seq(ev(2, 1), ev(2, 10), ev(4, 10))).toDF("user_id", "ts")
    val got = Survival.kaplanMeierDaily(df, "user_id", "ts")
      .orderBy("t").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // t=0: risk 4, d=1 → S = 750000; t=1: risk 3, d=1 → 750000·2/3 = 500000
    // t=8: risk 2, d=0 c=1 → S stays 500000; t=9: risk 1, d=0 c=1 → 500000
    assert(got.toSeq == Seq(
      (0L, 4L, 1L, 0L, 750000L), (1L, 3L, 1L, 0L, 500000L),
      (8L, 2L, 0L, 1L, 500000L), (9L, 1L, 0L, 1L, 500000L)))
  }

  test("groupedCorrSquared: perfect line +1e6, anti-line −1e6, constant null") {
    import spark.implicits._
    val df = (Seq.tabulate(10)(i => ("up", i, 2 * i + 3)) ++
      Seq.tabulate(10)(i => ("down", i, -5 * i)) ++
      Seq.tabulate(10)(i => ("flat", i, 7))).toDF("g", "x", "y")
    val got = Correlation.groupedCorrSquared(df, "g", col("x"), col("y"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(got("up").contains(1000000L))
    assert(got("down").contains(-1000000L))
    assert(got("flat").isEmpty)
  }

  test("modularity: disjoint cliques score 1/4 each, trivial partition scores 0") {
    import spark.implicits._
    import graft.cluster.GraphStats
    // two disjoint triangles
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("id1", "id2")
    val byComp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "component")
    val got = GraphStats.modularity(edges, "id1", "id2", byComp, "id", "component")
      .orderBy("comp").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per clique: m=6, e_c=3, d_c=6 → (4·6·3 − 36)/(4·36) = 36/144 = 1/4
    assert(got.toSeq == Seq((-1L, 6L, 6L, 12L, 500000L),
      (1L, 3L, 3L, 6L, 250000L), (4L, 3L, 3L, 6L, 250000L)))
    // one community holding everything → Q = 0 exactly
    val trivial = Seq(1L, 2L, 3L, 4L, 5L, 6L).map((_, 9L)).toDF("id", "component")
    val q0 = GraphStats.modularity(edges, "id1", "id2", trivial, "id", "component")
      .filter(col("comp") === -1L).collect().head.getLong(4)
    assert(q0 == 0L)
  }

  test("sliceWordMI: disjoint vocabularies → ln 2 per token; identical → 0") {
    import spark.implicits._
    import graft.curation.CorpusStats
    val disjoint = Seq(("a", "x x"), ("b", "y y")).toDF("source", "text")
    val g1 = CorpusStats.sliceWordMI(disjoint, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(g1("a") == 693147L && g1("b") == 693147L) // round(ln(2)·1e6)
    val same = Seq(("a", "x y"), ("b", "x y")).toDF("source", "text")
    val g2 = CorpusStats.sliceWordMI(same, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(g2("a") == 0L && g2("b") == 0L)
  }

  test("simpsonConcentration: single type → 1e6, all distinct → 0") {
    import spark.implicits._
    import graft.curation.CorpusStats
    val df = Seq(("a", "x x x x"), ("b", "p q r s")).toDF("source", "text")
    val got = CorpusStats.simpsonConcentration(df, "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(got("a") == 1000000L && got("b") == 0L)
  }

  test("effectiveSampleSize: uniform → 1e6, concentrated → collapses") {
    import spark.implicits._
    val df = (Seq.fill(10)(("u", 5L)) ++ Seq(("c", 1000000L), ("c", 1L)))
      .toDF("g", "w")
    val got = Sampling.effectiveSampleSize(df, "g", col("w"))
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got("u") == 1000000L)
    // (1e6+1)²·1e6 div (2·(1e12+1)) — heavily concentrated ≈ half
    val sw = 1000001L
    val expected = (BigInt(sw) * sw * 1000000L /
      (BigInt(2) * (BigInt(1000000L) * 1000000L + 1L))).toLong
    assert(got("c") == expected && expected < 510000L)
  }

  test("psiBySource: identical slices → exactly 0; concentrated slice → large") {
    import spark.implicits._
    val twin = (1 to 100).flatMap(v => Seq(("a", v), ("b", v))).toDF("src", "v")
    val g1 = DriftStats.psiBySource(twin, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(g1("a") == 0L && g1("b") == 0L)
    val skewed = ((1 to 100).map(v => ("a", v)) ++
      (1 to 100).map(_ => ("c", 99))).toDF("src", "v")
    val g2 = DriftStats.psiBySource(skewed, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    // both slices are far from the pooled distribution → both past the
    // 0.25 action threshold (a's is LARGER: it has mass in every bin, so
    // every divergent bin contributes, while c's empty-bin terms are
    // skipped by the documented no-smoothing contract)
    assert(g2("c") > 250000L, g2.toString)
    assert(g2("a") > g2("c"), g2.toString)
  }

  test("psiBySourceSmoothed: zero-mass bins contribute via eps; identical → 0") {
    import spark.implicits._
    val twin = (1 to 100).flatMap(v => Seq(("a", v), ("b", v))).toDF("src", "v")
    val g1 = DriftStats.psiBySourceSmoothed(twin, col("v"), "src")
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(3)))).toMap
    // p = q in every bin → every term ln 1 = 0; dense grid has all 10 bins
    assert(g1("a") == ((10L, 0L)) && g1("b") == ((10L, 0L)), g1.toString)
    val skewed = ((1 to 100).map(v => ("a", v)) ++
      (1 to 100).map(_ => ("c", 99))).toDF("src", "v")
    val gx = DriftStats.psiBySource(skewed, col("v"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    val gs = DriftStats.psiBySourceSmoothed(skewed, col("v"), "src")
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getLong(3)))).toMap
    // c hits one bin only: the exact contract SKIPS its empty bins, the
    // smoothed one materializes them at eps — so smoothed strictly exceeds
    // exact for c, and every slice reports the SAME dense bin count (the
    // tie-lumped global binning yields < 10 occupied bins here; dense means
    // all slices share that grid, not that 10 always materialize)
    assert(gs("c")._1 == gs("a")._1 && gs("c")._1 > 1L, gs.toString)
    assert(gs("c")._2 > gx("c"), s"smoothed ${gs("c")} vs exact ${gx("c")}")
  }

  test("empiricalRecallCurve: exact duplicates are always caught by banding") {
    import spark.implicits._
    import graft.dedup.LshPlanner
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = Seq((1L, base), (2L, base), (3L, base + " x y z q r s t u v"),
      (4L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = LshPlanner.empiricalRecallCurve(docs, "doc_id", "text",
        shingleLen = 3, numHashes = 16, bands = 4, minJacPpm = 100000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    // the identical pair (1,2) sits in bucket 10 and MUST be caught
    val top = got.find(_._1 == 10L).get
    assert(top._2 >= 1L && top._4 == 1000000L, got.toString)
    // doc 4 shares nothing — no pair involving it can appear
    assert(got.map(_._2).sum <= 3L)
  }

  test("empiricalRecallCurveSampled ≡ full audit on the kept slice; f=1 keeps all") {
    import spark.implicits._
    import graft.dedup.LshPlanner
    import graft.sampling.Sampling
    val base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    val docs = (1L to 40L).map(i => (i, base + s" t$i u$i v$i"))
      .toDF("doc_id", "text")
    def curve(df: org.apache.spark.sql.DataFrame) =
      LshPlanner.empiricalRecallCurve(df, "doc_id", "text", 3, 16, 4, 100000L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // the sampled audit IS the full audit on the q39-kept slice — same
    // buckets, same exact-pair and caught counts, bit for bit
    val sampled = LshPlanner.empiricalRecallCurveSampled(docs, "doc_id",
        "text", 3, 16, 4, 100000L, fraction = 0.5, salt = "sp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val kept = Sampling.hashSample(docs, "doc_id", 0.5, "sp")
    assert(kept.count() > 0 && kept.count() < 40, "draw must be a strict subset")
    assert(sampled == curve(kept), s"$sampled vs ${curve(kept)}")
    // fraction 1 degenerates to the exact audit
    assert(LshPlanner.empiricalRecallCurveSampled(docs, "doc_id", "text",
      3, 16, 4, 100000L, 1.0, "sp").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == curve(docs))
  }

  test("powerIteration finds the dominant axis of an anisotropic cloud") {
    import spark.implicits._
    import graft.similarity.PowerIteration
    // variance concentrated on dim 0; dim 1 is near-constant noise
    val vecs = Seq(Seq(2.0f, 0.01f), Seq(-2.0f, 0.02f), Seq(1.5f, 0.0f),
      Seq(-1.6f, 0.01f), Seq(1.9f, 0.02f), Seq(-1.8f, 0.0f))
      .map(Tuple1(_)).toDF("embedding")
    val got = PowerIteration.dominantDirection(vecs, "embedding", dim = 2,
        iterations = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(math.abs(got(0L)) == 1000L, got.toString) // max-norm lands on dim 0
    assert(math.abs(got(1L)) < 100L, got.toString)
    assert(got(-1L) > 0L && got(-2L) >= 1L)
  }

  test("mannWhitneyPairs: clean separation → rb ±1e6; full ties → 0") {
    import spark.implicits._
    import graft.operators.RankCompare
    val df = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)) ++
      Seq(9, 9).map(("t1", _)) ++ Seq(9, 9).map(("t2", _))).toDF("src", "v")
    val got = RankCompare.mannWhitneyPairs(df, col("v"), "src")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(4), r.getLong(5)))).toMap
    // every b exceeds every a → U(a)=0, u2x=2·U(b)=18, rb(a vs b) = −1e6
    assert(got(("a", "b")) == (18L, -1000000L), got.toString)
    // identical tied samples → rb exactly 0
    assert(got(("t1", "t2"))._2 == 0L, got.toString)
  }

  test("dailyAutocorrelation: alternating volume → strongly negative lag-1, " +
      "positive lag-2; constant series → null") {
    import spark.implicits._
    import java.sql.Timestamp
    import graft.operators.ChangePoint
    // type "alt": 3,1,3,1,... over 10 days; type "flat": 2 every day
    val rows = (0 until 10).flatMap { day =>
      val altN = if (day % 2 == 0) 3 else 1
      (0 until altN).map(i => (s"alt-$day-$i",
        Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"), "alt")) ++
        (0 until 2).map(i => (s"flat-$day-$i",
          Timestamp.valueOf(f"2024-03-${day + 1}%02d 12:00:00"), "flat"))
    }
    val df = rows.toDF("event_id", "ts", "event_type")
    val got = ChangePoint.dailyAutocorrelation(df, "ts", "event_type",
        lags = Seq(1, 2))
      .collect().map(r => ((r.getString(0), r.getInt(1)),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // exact: dev alternates ±10 (c·D−T = 3·10−20 / 1·10−20); 9 lag-1 pairs
    // each −100, den = 10·100 → r1 = −900·1e6/1000
    assert(got(("alt", 1)).contains(-900000L), got.toString)
    assert(got(("alt", 2)).contains(800000L), got.toString)
    assert(got(("flat", 1)).isEmpty && got(("flat", 2)).isEmpty)
  }

  test("giniBySlice: uniform mass → 0, fully concentrated → (n−1)/n") {
    import spark.implicits._
    import graft.curation.Inequality
    val df = (Seq.tabulate(4)(i => ("u", i.toLong, 5L)) ++
      Seq(("c", 0L, 0L), ("c", 1L, 0L), ("c", 2L, 0L), ("c", 3L, 10L)))
      .toDF("src", "id", "x")
    val got = Inequality.giniBySlice(df, "id", col("x"), "src")
      .collect().map(r => (r.getString(0), r.getLong(3))).toMap
    assert(got("u") == 0L)
    assert(got("c") == 750000L) // (2·40 − 5·10)/(4·10)
  }

  test("dedupMethodAgreement: hand-built corpus with known verdict sets") {
    import spark.implicits._
    import graft.dedup.MethodAgreement
    val long = (1 to 11).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "dup dup dup dup"), (2L, "dup dup dup dup"),      // exact pair
      (3L, "Alpha beta gamma delta!"), (4L, "alpha beta gamma delta"), // norm-only
      (5L, long + " xx"), (6L, long + " yy"),                // near-only (jac 9/11)
      (7L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = MethodAgreement.dedupMethodAgreement(docs, "doc_id", "text",
        shingleLen = 3, nearThreshold = 0.8)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // ex={1,2}, nm={1,2,3,4}, nr={1,2,5,6}, n=7
    assert(got(("exact", "near")) == (2L, 4L, 500000L, 714285L), got.toString)
    assert(got(("exact", "normalized")) == (2L, 4L, 500000L, 714285L), got.toString)
    assert(got(("normalized", "near")) == (2L, 6L, 333333L, 428571L), got.toString)
  }

  test("cramersV2: perfect association → exactly 1e6; independence → 0") {
    import spark.implicits._
    import graft.operators.Association
    val perfect = (Seq.fill(5)(("x", "p")) ++ Seq.fill(5)(("y", "q")))
      .toDF("a", "b")
    val g1 = Association.cramersV2(perfect, col("a"), col("b")).collect().head
    assert(g1.getLong(4) == 1000000L, g1.toString)
    val indep = (for (a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 3)
      yield (a, b)).toDF("a", "b")
    val g2 = Association.cramersV2(indep, col("a"), col("b")).collect().head
    assert(g2.getLong(3) == 0L && g2.getLong(4) == 0L, g2.toString)
  }

  test("rboTopK: identical ranked vocabularies → 1 − p^k (quantized)") {
    import spark.implicits._
    import graft.operators.Association
    // same text in both sources → identical top-k lists at every depth
    val text = (1 to 25).map(i => Seq.fill(26 - i)(s"w$i").mkString(" ")).mkString(" ")
    val df = Seq(("a", text), ("b", text), ("c", "zz qq")).toDF("source", "text")
    val got = Association.rboTopK(df, "text", "source", k = 20, pPpm = 900000L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val expected = Association.powersPpm(900000L, 20)
      .map(p => p * 100000L / 1000000L).sum
    assert(got(("a", "b")) == expected, s"${got(("a", "b"))} vs $expected")
    // c shares no top-k token with a/b → explicit rbo 0 rows from the
    // pair universe (the most-churned pairs must never silently vanish)
    assert(got(("a", "c")) == 0L && got(("b", "c")) == 0L, got.toString)
  }

  test("jsDivergencePairs: identical slices → 0; near-disjoint → near ln 2") {
    import spark.implicits._
    import graft.curation.CorpusStats
    val df = Seq(("a", "x y z x"), ("b", "x y z x"),
      ("c", "p q r s x"), ("d", "x x x x"), ("e", "mm nn")).toDF("source", "text")
    val got = CorpusStats.jsDivergencePairs(df, "text", "source")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(4))).toMap
    assert(got(("a", "b")) == 0L, got.toString) // identical → every term ln 1
    // c vs d share only 'x' (1/5 vs 4/4): heavy disjoint mass → large JS
    assert(got(("c", "d")) > 400000L && got(("c", "d")) < 693147L, got.toString)
    // symmetric-by-construction sanity: a-vs-d equals the mirrored formula
    assert(got.contains(("a", "d")))
    // FULLY disjoint vocabularies — the maximal-divergence alarm — emit an
    // explicit ln2 row, never a silent absence (universe covers all pairs)
    assert(got(("d", "e")) == 693147L, got.toString)
    assert(got.size == 10, got.toString) // C(5,2) pairs, no drops
  }

  test("bootstrapMeans: weights follow the md5 hex-digit law, means exact") {
    import spark.implicits._
    val df = Seq((7L, 100L), (8L, 200L)).toDF("id", "m")
    val got = Sampling.bootstrapMeans(df, "id", col("m"), replicas = 3, salt = "t")
      .orderBy("replica").collect()
    def w(rep: Int, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"t:$rep:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      hex.count(c => c == '0' || c == '1').toLong
    }
    got.foreach { r =>
      val rep = r.getInt(0)
      val wts = Seq(7L -> 100L, 8L -> 200L).map { case (id, m) => (w(rep, id), m) }
      val nEff = wts.map(_._1).sum
      assert(nEff > 0, s"replica $rep empty in this fixture")
      assert(r.getLong(1) == nEff)
      assert(r.getLong(2) == wts.map { case (wt, m) => wt * m }.sum * 1000 / nEff)
    }
    // all three replicas present unless a replica zeroed both weights
    assert(got.length == (0 until 3).count(rep => Seq(7L, 8L).exists(w(rep, _) > 0)))
  }
}
