package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.{BigramModel, Bm25, Decontaminate, Pipeline, QualitySignals, Redact}

/** Curation-operator semantics not covered by the oracle gate: the clean
  * decontaminated corpus, repetition edge cases, banding of negatives, and
  * the plan shapes that keep these linear at scale.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("repetitionStats counts duplicate and top n-grams") {
    val df = Seq(
      (1L, "a b a b a b"),        // 2-grams: ab ba ab ba ab → top "a b"=3, n=5
      (2L, "x y z w"),            // all distinct: 3 grams, top 1
      (3L, "solo")                // < 2 tokens: zeros
    ).toDF("doc_id", "text")
    val got = QualitySignals.repetitionStats(df, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((5, 3L, 3.0 / 5, 3.0 / 5)))
    assert(got(2L) == ((3, 1L, 0.0, 1.0 / 3)))
    assert(got(3L) == ((0, 0L, 0.0, 0.0)))
  }

  test("maxElementCount handles empties, singletons, and all-equal") {
    val df = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("q")),
      (3L, Seq("q", "q", "q")),
      (4L, Seq("b", "a", "b", "c", "a", "b"))
    ).toDF("id", "arr")
    val got = df.select(col("id"),
        QualitySignals.maxElementCount(col("arr")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("decontaminated drops benchmark members and overlapping docs only") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // bench member
      (2L, "alpha beta gamma epsilon"), // shares 3-gram "alpha beta gamma"
      (3L, "one two three four"),       // clean
      (4L, "five six seven eight")      // clean
    ).toDF("doc_id", "text")
    val bench = corpus.filter(col("doc_id") === 1L)
    val clean = Decontaminate.decontaminated(corpus, bench, "doc_id", "text", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L, 4L))
    val hits = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits == Map(2L -> 1L), "bench member itself is never flagged")
  }

  test("band floors negatives toward -inf and pseudonyms are salted") {
    val df = Seq((1L, "alice", -250.5), (2L, "bob", 1999.99))
      .toDF("k", "name", "bal")
    val got = Redact.pseudonymize(df, Seq("name"), "s",
        Map("bal" -> 1000L)).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L)._2 == -1000L)
    assert(got(2L)._2 == 1000L)
    assert(got(1L)._1.length == 16 && got(1L)._1 != "alice")
    // different salt → different pseudonym (not just an unsalted hash)
    val other = Redact.pseudonymize(df, Seq("name"), "t", Map.empty)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(other(1L) != got(1L)._1)
  }

  test("bm25 ranks term-dense short docs highest; no corpus shuffle join") {
    val df = Seq(
      (1L, "spark spark spark"),
      (2L, "spark and a lot of other words besides the one that matters here"),
      (3L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val scored = Bm25.score(df, "doc_id", "text", Seq("spark"))
    val got = scored.collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(got(1L) > got(2L) && got(2L) > 0.0 && got(3L) == 0.0)
    // scale shape: corpus side joins the 1-row stats via broadcast — no
    // SortMergeJoin and no Exchange keyed on the corpus
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = scored.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
      assert(!p.contains("SortMergeJoin"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("bm25 scoreTokens over a pre-tokenized corpus matches score") {
    val df = Seq(
      (1L, "spark spark spark"),
      (2L, "spark and a lot of other words besides the one that matters here"),
      (3L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val terms = Seq("spark", "words")
    val viaText = Bm25.score(df, "doc_id", "text", terms).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    // a caller-persisted tokenized projection (the single-raw-scan shape)
    val tokenized = df.select(col("doc_id"),
      graft.text.TextFunctions.tokens(col("text")).as("toks")).localCheckpoint(true)
    val viaTokens = Bm25.scoreTokens(tokenized, "doc_id", "toks", terms)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("score")).toMap
    assert(viaText == viaTokens)
  }

  test("tokenEntropy matches hand-computed values") {
    val df = Seq(
      (1L, Seq("a", "a", "a", "a")),          // uniform single token → 0
      (2L, Seq("a", "b", "c", "d")),          // uniform distinct → ln 4
      (3L, Seq("a", "a", "b")),               // ln 3 − (2 ln 2)/3
      (4L, Seq.empty[String])                 // empty → 0
    ).toDF("id", "toks")
    val got = df.select(col("id"),
        QualitySignals.tokenEntropy(col("toks")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - math.log(4)) < 1e-12, got(2L).toString)
    assert(math.abs(got(3L) - (math.log(3) - 2 * math.log(2) / 3)) < 1e-12,
      got(3L).toString)
    assert(got(4L) == 0.0)
    // null elements are dropped, not allowed to corrupt the fold
    val withNulls = Seq((9L, Seq("a", null, "a", null)))
      .toDF("id", "toks")
      .select(QualitySignals.tokenEntropy(col("toks")).as("h"))
      .collect()(0).getDouble(0)
    assert(withNulls == 0.0, s"two 'a' tokens → H = 0, got $withNulls")
  }

  test("curation pipeline composes: dedup keeps min id, output is stable") {
    val longText = (1 to 60).map(i => s"w$i").mkString(" ") // quality ≥ 0.5
    val df = Seq(
      (5L, longText, "en"),
      (2L, longText, "en"),              // exact dup — min id 2 survives
      (7L, "tiny", "en"),                // fails the quality floor
      (9L, (1 to 60).map(i => s"v$i").mkString(" "), "de")
    ).toDF("doc_id", "text", "lang")
    val cfg = Pipeline.CurationConfig(benchFraction = 0.0, sampleFraction = 1.0)
    val got = Pipeline.curate(df, "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 9L), got.toString)
    // deterministic under re-partitioning
    val again = Pipeline.curate(df.repartition(7), "doc_id", "text", cfg)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
  }

  test("unigram log-prob scores rare-token docs higher than common ones") {
    import graft.curation.UnigramModel
    val df = Seq(
      (1L, "the the the the the the the the"),   // only the commonest token
      (2L, "the the the the quux zorblat vex"),  // mixes in singletons
      (3L, "the and of to in the and of to in") // common-ish filler
    ).toDF("doc_id", "text")
    val got = UnigramModel.unigramLogProb(df, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getAs[Double]("avg_neg_logp")))
      .toMap
    assert(got(1L)._1 == 8L && got(2L)._1 == 7L)
    // doc 1 is all corpus-dominant tokens: strictly the lowest surprise
    // (docs 2 and 3 both carry tokens rare in this tiny corpus)
    assert(got(1L)._2 < got(2L)._2 && got(1L)._2 < got(3L)._2, got.toString)
  }

  test("KL drift is exactly zero for identically-distributed strata") {
    import graft.curation.DistributionDrift
    val text = "alpha beta beta gamma gamma gamma"
    val df = Seq(
      ("s1", text), ("s2", text),            // identical distributions
      ("s3", "omega omega omega omega")      // concentrated elsewhere
    ).toDF("lang", "text")
    val got = DistributionDrift.klByStratum(df, "text", "lang").collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getAs[Double]("kl_nats")))
      .toMap
    // s1/s2 each match ... themselves + each other; their token ratios to
    // the corpus are NOT 1 (s3's tokens dilute the corpus), so only assert
    // symmetry and positivity; the exact-zero case needs the stratum to BE
    // the corpus distribution
    assert(got("s1") == got("s2"), "identical strata must score identically")
    assert(got("s3")._2 > got("s1")._2,
      "the concentrated stratum diverges more")
    // exact zero: a corpus of ONE stratum is its own distribution
    val solo = DistributionDrift.klByStratum(
      Seq(("only", text)).toDF("lang", "text"), "text", "lang").collect()
    assert(solo.head.getLong(2) == 0L, "KL(P||P) must be exactly 0 micro-nats")
  }

  test("boilerplateGrams finds the common gram with a deterministic cut") {
    val df = Seq(
      (1L, "the end of file marker here"),
      (2L, "the end of file marker again"),
      (3L, "the end of file stuff"),
      (4L, "unrelated words entirely different")
    ).toDF("doc_id", "text")
    val top = QualitySignals.boilerplateGrams(df, "doc_id", "text", 3, 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // both 3-doc grams tie; the (count desc, gram asc) cut is deterministic
    assert(top.toSeq == Seq(("end of file", 3L), ("the end of", 3L)))
  }

  test("bigram LM: deterministic word order scores zero, shuffled order scores high") {
    // context "a" has two successors: c(a,.) = 3 with (a,b)x2 and (a,c)x1,
    // so P(b|a) = 2/3 and P(c|a) = 1/3; context "b" is deterministic
    // ((b,a) only) and contributes exactly 0 micro-nats
    val df = Seq(
      (1L, "a b a b"),            // pairs: ab, ba, ab
      (2L, "a c")                 // pair: ac
    ).toDF("doc_id", "text")
    val got = BigramModel.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L)._1 == 3 && got(2L)._1 == 1, got.toString)
    val lnAb = math.round(math.log(3.0 / 2.0) * 1e6)
    val lnAc = math.round(math.log(3.0 / 1.0) * 1e6)
    assert(got(1L)._2 == 2 * lnAb, got.toString)   // ba is deterministic: 0
    assert(got(2L)._2 == lnAc, got.toString)
    // sub-2-token docs drop out
    val tiny = BigramModel.bigramLogProb(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text").collect()
    assert(tiny.isEmpty)
  }

  test("BPE merges: classic low/lower/lowest fixture, deterministic ties") {
    // word freqs: low x3, lower x1, lowest x1 — round-1 counts (l,o)=5 and
    // (o,w)=5 tie, (l,o) wins on l_sym order; then (lo,w)=5, (low,</w>)=3,
    // (lowe? no: (low,e)=2), and at all-1 ties (lowe,r) wins on r_sym
    val df = Seq((1L, "low lower low lowest low")).toDF("doc_id", "text")
    val got = graft.curation.BpeMerges.learnMerges(df, "text", rounds = 5)
      .orderBy("merge_round")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1, "l", "o", "lo", 5L),
      (2, "lo", "w", "low", 5L),
      (3, "low", "</w>", "low</w>", 3L),
      (4, "low", "e", "lowe", 2L),
      (5, "lowe", "r", "lower", 1L)), got.mkString("\n"))
  }

  test("BPE merge application is greedy left-to-right (overlap + adjacency)") {
    // 'aaaaaa' under (a,a) must become [aa,aa,aa], not [aa,a,aa,a] — the
    // single-space-join replace bug misses every second occurrence (shared
    // delimiter), which would surface in the round-2/3 counts
    val df = Seq((1L, "aaaaaa")).toDF("doc_id", "text")
    val got = graft.curation.BpeMerges.learnMerges(df, "text", rounds = 3)
      .orderBy("merge_round")
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("a", "a", 5L),        // 5 adjacent pairs in a^6
      ("aa", "aa", 2L),      // greedy: [aa,aa,aa,</w>]
      ("aa", "</w>", 1L)),   // tie (aaaa,aa)=(aa,</w>)=1 → l_sym order
      got.mkString("\n"))
  }

  test("BPE merges stop early when the vocab runs out of pairs") {
    val df = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // pairs: (a,b)=3 → ab; (ab,</w>)=3 → ab</w>; then single-symbol words
    val got = graft.curation.BpeMerges.learnMerges(df, "text", rounds = 10)
      .collect()
    assert(got.length == 2, got.mkString("\n"))
  }

  test("BPE encode counts tokens under the learned merges") {
    // after 5 merges on low/lower/lowest (see fixture above): low → 1
    // symbol (low</w>), lower → 2 (lower, </w>), lowest → 4 (lowe, s, t,
    // </w>); doc = 5 words, 3·1 + 2 + 4 = 9 BPE tokens
    val df = Seq((1L, "low lower low lowest low")).toDF("doc_id", "text")
    val got = graft.curation.BpeMerges
      .encodeTokenCounts(df, "doc_id", "text", rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 5L, 9L)), got.mkString("\n"))
  }

  test("DSIR weights separate target-like from raw-like documents") {
    // target docs are all 'wiki', raw docs all 'web'; a held-out wiki-like
    // doc must out-weight a web-like one, and n_grams = unigrams + bigrams
    val df = Seq(
      (1L, "wiki wiki wiki", true),
      (2L, "wiki wiki wiki", true),
      (3L, "web web web", false),
      (4L, "web web web", false),
      (5L, "wiki wiki wiki", false),  // wiki-looking raw doc
      (6L, "a b c", false)
    ).toDF("doc_id", "text", "is_t")
    val got = graft.curation.Dsir.importanceWeights(
        df, "doc_id", "text", col("is_t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(6L)._1 == 5, got.toString)         // 3 unigrams + 2 bigrams
    assert(got(5L)._2 > got(3L)._2, got.toString) // wiki-like ≫ web-like
    assert(got(1L)._2 == got(5L)._2, got.toString) // same text, same weight
  }

  test("DSIR weights are exact integers: partition-order invariant") {
    val rows = (0L until 64L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 3} tok${i % 11}", i % 4 == 0))
    val df = rows.toDF("doc_id", "text", "is_t")
    def run(parts: Int): Map[Long, Long] =
      graft.curation.Dsir.importanceWeights(
          df.repartition(parts), "doc_id", "text", col("is_t"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(run(1) == run(13))
  }

  test("CMS never underestimates; wide grid is exact, narrow grid collides") {
    val toks = (0 until 200).map(i => s"tok${i % 40}").toDF("token")
    // width far above the 40-token vocabulary: every estimate exact
    val wide = graft.curation.CmsSketch
      .topKOverestimate(toks, "token", depth = 4, width = 4096, topK = 40)
      .collect()
    assert(wide.length == 40)
    wide.foreach(r => assert(r.getAs[Long]("est_cnt") == r.getAs[Long]("exact_cnt"),
      r.toString))
    // width 4 forces collisions: still never BELOW exact, and at least one
    // estimate must absorb a colliding token's count
    val narrow = graft.curation.CmsSketch
      .topKOverestimate(toks, "token", depth = 2, width = 4, topK = 40)
      .collect()
    narrow.foreach(r => assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"),
      r.toString))
    assert(narrow.exists(r => r.getAs[Long]("over_ppm") > 0L),
      narrow.mkString("\n"))
  }

  test("CMS estimates are partition-order invariant") {
    val toks = (0 until 300).map(i => s"w${i % 23}").toDF("token")
    def run(parts: Int) = graft.curation.CmsSketch
      .topKOverestimate(toks.repartition(parts), "token", 3, 8, 23)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(run(1) == run(7))
  }

  test("Bloom screen has no false negatives; tiny filter shows false positives") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over dogs"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "the quick brown fox went home early"),
      (4L, "entirely disjoint words appear here now")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox jumps high")).toDF("doc_id", "text")
    val exact = Decontaminate.contaminationHits(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = graft.curation.Decontaminate
      .bloomContamination(corpus, bench, "doc_id", "text", 3,
        mBits = 1 << 16, kHashes = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("bloom_grams"), r.getAs[Long]("exact_grams")))).toMap
    // every exactly-contaminated doc is flagged with the same exact count
    exact.foreach { case (id, hits) =>
      assert(bloom.contains(id), s"doc $id missed — false negative")
      assert(bloom(id)._2 == hits, s"doc $id exact_grams ${bloom(id)} vs $hits")
      assert(bloom(id)._1 >= hits, bloom(id).toString)
    }
    // an 8-bit filter saturated by a long benchmark doc flags everything:
    // the disjoint doc 4 must now collide in as pure false positives
    val bigBench = Seq((100L,
      "the quick brown fox jumps high and keeps running far past every " +
        "fence gate wall hedge ditch stream meadow barn silo")).toDF("doc_id", "text")
    val tiny = graft.curation.Decontaminate
      .bloomContamination(corpus, bigBench, "doc_id", "text", 3,
        mBits = 8, kHashes = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("fp_grams")).toMap
    assert(tiny.getOrElse(4L, 0L) > 0L, tiny.toString)
  }

  test("perplexity buckets: balanced per-group tiles, rare-token docs in the tail") {
    val docs = (
      (1L to 8L).map(i => (i, "en", "common common common")) ++
      Seq((9L, "en", "zzyzx qwfp vexing"),   // rare tokens → highest ppl
          (10L, "en", "common common zzyzx")) ++
      (11L to 15L).map(i => (i, "de", "der der der"))
    ).toDF("doc_id", "lang", "text")
    val got = graft.curation.UnigramModel
      .perplexityBuckets(docs, "doc_id", "text", "lang", nBuckets = 5)
      .collect()
    val en = got.filter(_.getString(1) == "en")
    // 10 en docs into 5 tiles → exactly 2 per bucket
    assert(en.groupBy(_.getAs[Int]("bucket")).forall(_._2.length == 2),
      en.mkString("\n"))
    // the all-rare doc lands in the last bucket, all-common docs in bucket 1
    assert(en.find(_.getLong(0) == 9L).get.getAs[Int]("bucket") == 5)
    assert(en.find(_.getLong(0) == 1L).get.getAs[Int]("bucket") == 1)
    // de group tiles independently: 5 docs into 5 buckets of 1
    val de = got.filter(_.getString(1) == "de")
    assert(de.map(_.getAs[Int]("bucket")).sorted.toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("piiCounts/scrubPii: counts per type and typed placeholders") {
    import spark.implicits._
    import graft.curation.Redact
    val df = Seq(
      (1L, "mail a.b-c@foo.example.com and x@y.io, host 192.168.0.1 call +44 123 4567"),
      (2L, "no pii here, just words and 3.14 and 1.2.3 (three octets only)"),
      (3L, "")).toDF("id", "t")
    val got = Redact.piiCounts(df, "t")
      .select(col("id"), col("n_email"), col("n_ipv4"), col("n_phone"),
        Redact.scrubPii(col("t")).as("s"))
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 1L && got(1L)._3 == 1L, got.toString)
    assert(got(1L)._4 ==
      "mail [EMAIL] and [EMAIL], host [IP] call [PHONE]", got(1L)._4)
    assert(got(2L) == ((0L, 0L, 0L,
      "no pii here, just words and 3.14 and 1.2.3 (three octets only)")))
    assert(got(3L) == ((0L, 0L, 0L, "")))
  }

  test("Curriculum.assignPhases: histogram boundaries, tie mass shares a phase") {
    val df = Seq(1L, 1L, 1L, 1L, 2L, 3L, 4L, 4L).toDF("s")
    val got = graft.curation.Curriculum.assignPhases(df, col("s"), 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("phase"))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // hist 1->4, 2->1, 3->1, 4->2 (N=8): boundaries b1=b2=1 (the tie mass
    // covers both quarter marks), b3=3 -> score 1 is phase 1, scores 2 and
    // 3 land in phase 3 (phase 2 is EMPTY: tie semantics), 4 in phase 4
    assert(got == Map(1L -> Set(1), 2L -> Set(3), 3L -> Set(3), 4L -> Set(4)))

    val uniform = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L).toDF("s")
    val gotU = graft.curation.Curriculum.assignPhases(uniform, col("s"), 4)
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("phase")).toMap
    assert(gotU == Map(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 3,
      6L -> 3, 7L -> 4, 8L -> 4))
  }

  test("CorpusStats.vocabRichness: Chao1 / Good-Turing / hapax exact integers") {
    val docs = Seq(("g1", "a a b c"), ("g2", "x y")).toDF("src", "text")
    val got = graft.curation.CorpusStats.vocabRichness(docs, "text", "src")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    // g1: D=3 N=4 f1=2 f2=1 -> chao1 = 3000 + 2*1*1000/(2*2) = 3500
    assert(got("g1") == ((3L, 4L, 2L, 1L, 3500L, 500000L, 666666L)))
    // g2: D=2 N=2 f1=2 f2=0 -> chao1 = 2000 + 2*1*1000/2 = 3000
    assert(got("g2") == ((2L, 2L, 2L, 0L, 3000L, 1000000L, 1000000L)))
  }
}
