package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.BoundedTopKAgg
import graft.text.TextFunctions

/** one bounded-top-k keyness candidate: exact integer G², token, counts */
final case class KeynessTerm(g2: Long, term: String, a: Long, b: Long,
    enriched: Boolean)

/** Corpus-distribution audits. The first is the classic Zipf rank-frequency
  * check: a healthy natural-language slice has log-frequency falling
  * ~linearly in log-rank with slope ≈ −1; machine-generated or boilerplate-
  * heavy slices flatten or step. Running it per source/per shard is a cheap
  * drift alarm for a 100 TB ingestion pipeline.
  *
  * Scale shape: one corpus-token shuffle builds the per-group vocabulary
  * (partial-agg map-side combine); the ranking window and the least-squares
  * fold then run on the VOCABULARY (≤ `topN` rows per group), not the
  * corpus, so the window's per-group sort is bounded by construction.
  *
  * Determinism: ln(rank) and ln(freq) quantize to integer micro-nats per
  * term (the q62/q64 convention) BEFORE the regression sums, so all five
  * sums are exact integers; the final slope divides two in-range longs with
  * one rounded double division, identical on any IEEE engine.
  */
object CorpusStats {

  /** Chao1 species-richness + Good–Turing unseen-mass audit per group —
    * the "how much vocabulary haven't we seen yet" report a corpus census
    * quotes beside raw type counts. With D observed types, f1 singletons,
    * f2 doubletons and N tokens:
    *   chao1   = D + f1·(f1−1) / (2·(f2+1))   (bias-corrected estimator
    *             of TOTAL vocabulary incl. unseen; exact integer milli)
    *   GT P0   = f1 / N                        (Good–Turing probability
    *             mass of unseen types; integer ppm)
    *   hapax   = f1 / D                        (singleton share; ppm)
    * Returns (groupCol, vocab, n_tokens, f1, f2, chao1_milli,
    * gt_unseen_ppm, hapax_ppm), all exact integers. The (f2+1) in the
    * corrected Chao1 keeps the f2 = 0 edge finite in both engines.
    *
    * Scale shape: one (group, token) exchange with partial agg; the
    * frequency-of-frequencies reduction and every estimator run on the
    * bounded per-group frame. Complements [[vocabSaturation]] (growth
    * CURVE) with a closed-form asymptote estimate.
    */
  def vocabRichness(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("g"),
        explode(filter(TextFunctions.tokens(col(textCol)),
          t => t =!= lit(""))).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("c"))
    counts.groupBy(col("g"))
      .agg(count(lit(1)).as("vocab"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
      .select(col("g"), col("vocab"), col("n_tokens"), col("f1"),
        col("f2"),
        // the chao1 numerator f1·(f1−1)·1000 blows signed 64-bit past
        // f1 ≈ 9.6e7 hapaxes per group — Spark would wrap silently while
        // DuckDB raises (the engine-divergent overflow class the q206 de
        // convention eliminates). Run it in DECIMAL(38,0) (HUGEINT in the
        // q218 oracle); `div` (IntegralDivide) returns BIGINT.
        (col("vocab") * 1000 + TextFunctions.integralDiv(
          col("f1").cast("decimal(38,0)") * (col("f1") - 1) * 1000,
          ((col("f2") + 1) * 2).cast("decimal(38,0)"))).as("chao1_milli"),
        TextFunctions.integralDiv(col("f1") * 1000000L, col("n_tokens"))
          .as("gt_unseen_ppm"),
        TextFunctions.integralDiv(col("f1") * 1000000L, col("vocab"))
          .as("hapax_ppm"))
  }

  /** Out-of-vocabulary audit: per group, the share of corpus word n-grams
    * absent from a reference slice's n-gram vocabulary (the tokenizer's or
    * embedding table's training data) — the coverage check run before
    * committing a tokenizer to a new source. n = 1 audits single tokens;
    * n = 2 audits bigram contexts (far more discriminative once the token
    * vocabulary saturates). Returns (groupCol, n_grams, n_oov, oov_ppm)
    * with exact integer ppm.
    *
    * Scale shape: the reference vocabulary is distinct-n-gram-sized and
    * broadcasts; the corpus gram stream probes it with a broadcast left
    * join (never shuffled), and the only exchange is the final per-group
    * count (partial-agg'd). Token arrays bind to an attribute before the
    * gram HOF (the repo-wide lambda gotcha).
    */
  def oovRate(docs: DataFrame, textCol: String, groupCol: String,
      vocabDocs: DataFrame, vocabTextCol: String, n: Int = 1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    def grams(df: DataFrame, tcol: String, extra: Seq[String]): DataFrame =
      df.select(extra.map(col) :+
          filter(TextFunctions.tokens(col(tcol)), t => t =!= lit(""))
            .as("_graft_toks"): _*)
        .select(extra.map(col) :+
          explode(QualitySignals.ngrams(col("_graft_toks"), n))
            .as("_graft_gram"): _*)
    val vocab = grams(vocabDocs, vocabTextCol, Seq.empty)
      .distinct()
      .withColumn("_graft_in", lit(1L))
    grams(docs, textCol, Seq(groupCol))
      .join(broadcast(vocab), Seq("_graft_gram"), "left")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_graft_in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("(n_oov * 1000000) div n_grams"))
  }

  /** Least-squares slope of ln(freq) on ln(rank) over each group's `topN`
    * most frequent tokens: (groupCol, n_types, slope_micro). Rank ties
    * break by token string so the fit set is total-ordered. Groups with one
    * distinct token (degenerate regression) report slope 0.
    */
  /** Vocabulary-saturation report per group: Good-Turing unseen mass
    * (P₀ = N₁/N — the probability the NEXT token is a new type; Gale &
    * Sampson 1995) plus the unbiased Simpson repeat-probability
    * Σc(c−1)/(N(N−1)) — together the "is this source exhausted or still
    * yielding novelty, and how template-heavy is it" gauge a crawl
    * scheduler reads. Both exact integer ppm.
    *
    * Scale shape: one (group, token) count (partial-agg'd) feeding one
    * per-group aggregate — the same two-exchange shape as every
    * vocabulary audit here; nothing driver-side.
    */
  def vocabSaturation(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val counts = graft.operators.Parallelism.ensure(
        docs.select(col(groupCol).as("src"), col(textCol)))
      .select(col("src"),
        explode(graft.text.TextFunctions.tokens(col(textCol))).as("tk"))
      .filter(col("tk") =!= "")
      .groupBy(col("src"), col("tk"))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col("src"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("v_types"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c") === 2L, 1L).otherwise(0L)).as("n_dis"),
        sum(col("c") * (col("c") - 1L)).as("_graft_rep"))
      .select(col("src"), col("n_tokens"), col("v_types"), col("n_hapax"),
        col("n_dis"),
        expr("(n_hapax * 1000000) div n_tokens").as("p0_ppm"),
        // 128-bit intermediates: N(N-1) overflows a long past ~3e9 tokens
        // per group (decimal here, hugeint in the oracle)
        expr("CAST((CAST(_graft_rep AS DECIMAL(38,0)) * 1000000) div " +
          "(CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1)) AS BIGINT)")
          .as("simpson_ppm"))
  }

  def zipfSlope(docs: DataFrame, textCol: String, groupCol: String,
      topN: Int = 100): DataFrame = {
    require(topN >= 2, s"topN must be >= 2, got $topN")
    val vocab = docs
      .select(col(groupCol), explode(TextFunctions.tokens(col(textCol))).as("_graft_tok"))
      .groupBy(col(groupCol), col("_graft_tok"))
      .agg(count(lit(1)).as("_graft_freq"))
    val ranked = vocab
      .withColumn("_graft_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(col("_graft_freq").desc, col("_graft_tok"))))
      .filter(col("_graft_rank") <= topN)
      .select(col(groupCol),
        round(log(col("_graft_rank").cast("double")) * 1000000.0d)
          .cast("long").as("_graft_lr"),
        round(log(col("_graft_freq").cast("double")) * 1000000.0d)
          .cast("long").as("_graft_lf"))
    ranked
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_types"),
        sum(col("_graft_lr")).as("_graft_sx"),
        sum(col("_graft_lf")).as("_graft_sy"),
        sum(col("_graft_lr") * col("_graft_lf")).as("_graft_sxy"),
        sum(col("_graft_lr") * col("_graft_lr")).as("_graft_sxx"))
      .select(col(groupCol), col("n_types"),
        expr("""CASE WHEN n_types * _graft_sxx - _graft_sx * _graft_sx = 0
               |  THEN CAST(0 AS BIGINT)
               |  ELSE CAST(round(1000000.0 *
               |    CAST(n_types * _graft_sxy - _graft_sx * _graft_sy AS DOUBLE) /
               |    CAST(n_types * _graft_sxx - _graft_sx * _graft_sx AS DOUBLE))
               |    AS BIGINT) END""".stripMargin).as("slope_micro"))
  }

  /** Per-document n-gram novelty under an explicit processing order — the
    * "how much NEW content does each increment add" curve of an ever-growing
    * crawl: every distinct corpus gram is attributed to the FIRST document
    * (by `orderCol`, ascending) containing it; a document's novelty is the
    * share of its distinct grams it introduced. Near-1 novelty throughout
    * means the corpus is still growing content; decaying novelty quantifies
    * saturation (and a sudden novelty collapse flags a re-crawl).
    *
    * Output: (orderCol, n_grams, n_novel, novel_ppm) per document, exact
    * integer ppm.
    *
    * Scale shape: one shuffle groups the distinct (doc, gram) stream by
    * gram for the min-owner aggregate (partial-agg'd map-side); the
    * ownership table joins back onto the same per-doc gram stream; the
    * per-doc counts partial-agg again. No windows, no driver state — the
    * attribution is a pure `min` so shard arrival order never matters.
    */
  def gramNovelty(docs: DataFrame, textCol: String, orderCol: String,
      n: Int = 2): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val docGrams = docs
      .select(col(orderCol).cast("long").as("_graft_ord"),
        filter(TextFunctions.tokens(col(textCol)), t => t =!= lit(""))
          .as("_graft_toks"))
      .select(col("_graft_ord"),
        explode(QualitySignals.ngrams(col("_graft_toks"), n)).as("_graft_gram"))
      .distinct()
    val owners = docGrams.groupBy(col("_graft_gram"))
      .agg(min(col("_graft_ord")).as("_graft_first"))
    docGrams.join(owners, "_graft_gram")
      .groupBy(col("_graft_ord"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("_graft_ord") === col("_graft_first"), 1L)
          .otherwise(0L)).as("n_novel"))
      .select(col("_graft_ord").as(orderCol), col("n_grams"), col("n_novel"),
        expr("(n_novel * 1000000) div n_grams").as("novel_ppm"))
  }

  /** Per-group keyness: which terms are statistically over-represented in
    * each slice vs the REST of the corpus, ranked by Dunning's log-likelihood
    * G² (the corpus-linguistics standard — robust where raw ratio or χ²
    * explodes on rare terms). For term w in group g with in-group count a,
    * rest count b, group token total Na, rest total Nb:
    * G² = 2·(a·ln(a/E1) + b·ln(b/E2)), E1 = Na·(a+b)/(Na+Nb),
    * E2 = Nb·(a+b)/(Na+Nb); a zero count contributes zero. The practical
    * use: per-source vocabulary drift ("what does THIS crawl talk about"),
    * contamination fingerprints, domain labeling.
    *
    * Output: (groupCol, rank, term, a, b, enriched, g2_micro) — top `k`
    * terms per group by (G² desc, term), `enriched` true when the term is
    * OVER-represented in the group (a·Nb > b·Na, exact cross-multiply).
    *
    * Determinism: both ln terms quantize to micro-nats per term before the
    * ×2 and the integer multiply by a/b — the q62/q112 convention — so the
    * ranking key is an exact long. Scale shape: ONE corpus-token shuffle
    * builds (group, term) counts; term totals re-aggregate that result
    * (vocabulary-sized); group totals broadcast; the per-group top-k is a
    * bounded aggregate (k rows per group per partition on the exchange),
    * never a window sort.
    */
  def keynessTopK(docs: DataFrame, textCol: String, groupCol: String,
      minCount: Long = 5L, k: Int = 10): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = docs
      .select(col(groupCol).as("_graft_g"),
        explode(TextFunctions.tokens(col(textCol))).as("_graft_tok"))
      .filter(col("_graft_tok") =!= "")
      .groupBy(col("_graft_g"), col("_graft_tok"))
      .agg(count(lit(1)).as("a"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val termTotals = counts.groupBy(col("_graft_tok"))
      .agg(sum(col("a")).as("_graft_ct"))
    val groupTotals = counts.groupBy(col("_graft_g"))
      .agg(sum(col("a")).as("_graft_na"))
    val grand = groupTotals.agg(sum(col("_graft_na")).as("_graft_n"))
    val scored = counts
      .join(termTotals, "_graft_tok")
      .join(broadcast(groupTotals), "_graft_g")
      .crossJoin(broadcast(grand))
      .withColumn("b", col("_graft_ct") - col("a"))
      .withColumn("_graft_nb", col("_graft_n") - col("_graft_na"))
      .filter(col("a") + col("b") >= minCount)
      .withColumn("_graft_l1",
        round(log((col("a") * col("_graft_n")).cast("double") /
          (col("_graft_na") * (col("a") + col("b"))).cast("double")) * 1e6)
          .cast("long"))
      .withColumn("_graft_l2",
        when(col("b") === 0L, 0L).otherwise(
          round(log((col("b") * col("_graft_n")).cast("double") /
            (col("_graft_nb") * (col("a") + col("b"))).cast("double")) * 1e6)
            .cast("long")))
      .select(col("_graft_g"), col("_graft_tok"), col("a"), col("b"),
        (lit(2L) * (col("a") * col("_graft_l1") + col("b") * col("_graft_l2")))
          .as("g2_micro"),
        (col("a") * col("_graft_nb") > col("b") * col("_graft_na"))
          .as("enriched"))
    val tk = udaf(new BoundedTopKAgg[KeynessTerm](k,
      Ordering.by((t: KeynessTerm) => (-t.g2, t.term))))
    scored.groupBy(col("_graft_g"))
      .agg(tk(col("g2_micro"), col("_graft_tok"), col("a"), col("b"),
        col("enriched")).as("top"))
      .select(col("_graft_g"), posexplode(col("top")))
      .select(col("_graft_g").as(groupCol),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.term").as("term"), col("col.a").as("a"), col("col.b").as("b"),
        col("col.enriched").as("enriched"), col("col.g2").as("g2_micro"))
  }

  /** Top-k collocations by pointwise mutual information over ADJACENT word
    * pairs: PMI(w1,w2) = ln(p(w1,w2) / (p(w1)·p(w2))) with bigram
    * probability over total bigram count and unigram probabilities over
    * total token count — the classic collocation extractor (multi-word
    * expressions, named entities) and a tokenizer-merge-candidate signal.
    * `minCount` suppresses the low-frequency PMI explosion (a hapax pair
    * of two hapax words maxes PMI by definition).
    *
    * Output: (w1, w2, c12, pmi_micro), top `k` by (pmi desc, w1, w2) — a
    * bounded TakeOrdered, never a global sort.
    *
    * Scale shape: one bigram-count shuffle (partial-agg'd) + one
    * unigram-count shuffle; the unigram table joins back onto the bigram
    * table (vocabulary-sized, broadcast when small). The ln runs on one
    * integer ratio and rounds to micro-nats (the q62/q83 convention) — the
    * only float op in the operator.
    */
  def pmiCollocations(docs: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 20): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("_graft_w"))
    val bigrams = toks
      .select(explode(TextFunctions.ngrams(col("_graft_w"), 2)).as("_graft_bg"))
      .select(split(col("_graft_bg"), " ").getItem(0).as("w1"),
        split(col("_graft_bg"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val unigrams = toks
      .select(explode(col("_graft_w")).as("_graft_tok"))
      .groupBy(col("_graft_tok")).agg(count(lit(1)).as("_graft_c"))
    val nuTotal = unigrams.agg(sum(col("_graft_c")).as("nu"))
    // the bigram probability base must be ALL bigrams, not just the
    // >= minCount survivors — count from the corpus directly
    val nbTotal = toks.select(
      sum(greatest(size(col("_graft_w")) - 1, lit(0)).cast("long")).as("nb"))
    bigrams
      .join(unigrams.select(col("_graft_tok").as("w1"),
        col("_graft_c").as("c1")), "w1")
      .join(unigrams.select(col("_graft_tok").as("w2"),
        col("_graft_c").as("c2")), "w2")
      .crossJoin(broadcast(nuTotal))
      .crossJoin(broadcast(nbTotal))
      .select(col("w1"), col("w2"), col("c12"),
        expr("""CAST(round(ln((CAST(c12 AS DOUBLE) / CAST(nb AS DOUBLE)) /
               |  ((CAST(c1 AS DOUBLE) / CAST(nu AS DOUBLE)) *
               |   (CAST(c2 AS DOUBLE) / CAST(nu AS DOUBLE)))) * 1000000.0)
               |  AS BIGINT)""".stripMargin).as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** Windowed co-occurrence counts — the GloVe/word2vec training-corpus
    * statistic: for every ordered token position i, count the unordered
    * pairs {w_i, w_j} with i < j ≤ i+window. Pair generation is PER ROW
    * (a higher-order-function expansion of the token array — map-side,
    * zero shuffle), so the only exchange is the final pair-count groupBy,
    * partial-aggregated so stopword-pair skew is absorbed map-side. The
    * pair space is vocabulary², not corpus-sized; `minCount` keeps the
    * output to the dense head.
    *
    * Pairs are canonicalized (w_a ≤ w_b) so "fast table" and "table fast"
    * pool, matching symmetric-window embedding objectives; self-pairs
    * (same word co-occurring with itself) count too.
    */
  def windowCooccurrence(docs: DataFrame, textCol: String, window: Int,
      minCount: Long): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val toks = docs.select(
        filter(TextFunctions.tokens(col(textCol)), w => w =!= "").as("_w"))
      .filter(size(col("_w")) >= 2)
    // flatten(transform(positions, i -> transform(offsets, o -> pair)))
    val pairs = toks.select(explode(flatten(
      transform(sequence(lit(1), size(col("_w")) - 1), i =>
        transform(sequence(lit(1), least(lit(window), size(col("_w")) - i)), o =>
          struct(
            least(element_at(col("_w"), i), element_at(col("_w"), i + o)).as("w_a"),
            greatest(element_at(col("_w"), i), element_at(col("_w"), i + o)).as("w_b"))))))
      .as("p"))
    pairs.select(col("p.w_a").as("w_a"), col("p.w_b").as("w_b"))
      .groupBy(col("w_a"), col("w_b")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }

  /** Per-slice mutual-information decomposition MI(slice; word) — "how
    * distinctive is each source's vocabulary": a source whose word
    * distribution matches the corpus scores ≈ 0; a source with its own
    * jargon scores high. The per-source number is the average log-lift of
    * its tokens, `Σ_w c_sw·ln(c_sw·N / (c_s·c_w)) / c_s`, in integer
    * micro-nats — each term's ln is quantized to micro BEFORE the sum
    * (the q64/q112 convention), so distributed summation order never
    * matters.
    *
    * One (slice × word) partial-agg'd count is the only corpus-sized
    * exchange; marginals derive from it and broadcast back.
    */
  def sliceWordMI(docs: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val toks = docs.select(col(groupCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val csw = toks.groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cs = csw.groupBy(col("src")).agg(sum(col("c")).as("cs"))
    val cw = csw.groupBy(col("w")).agg(sum(col("c")).as("cw"))
    val n = csw.agg(sum(col("c")).as("n"))
    csw.join(broadcast(cs), "src").join(cw, "w").crossJoin(broadcast(n))
      .select(col("src"), col("cs"), col("c"),
        expr("""c * CAST(round(ln((CAST(c AS DOUBLE) * CAST(n AS DOUBLE)) /
               |  (CAST(cs AS DOUBLE) * CAST(cw AS DOUBLE))) * 1000000.0)
               |  AS BIGINT)""".stripMargin).as("_t"))
      .groupBy(col("src"))
      .agg(max(col("cs")).as("n_tokens"), sum(col("_t")).as("_sum"))
      .select(col("src"), col("n_tokens"),
        expr("_sum div n_tokens").as("mi_micro"))
  }

  /** Pairwise Jensen–Shannon divergence between slice unigram
    * distributions in integer micro-nats — the symmetric, ALWAYS-FINITE
    * corpus-comparison number (KL explodes on disjoint support; JS caps at
    * ln 2), the pairwise complement of the per-stratum-vs-global KL (q64).
    *
    * Exact decomposition that needs only the SHARED-support join: for word
    * w with counts (c_a, c_b) and totals (n_a, n_b),
    * `p/m = 2·c_a·n_b / (c_a·n_b + c_b·n_a)`; words in A∖B contribute
    * exactly `c_a·ln 2`, so each side's KL(side‖mixture) is
    * `(Σ_{A∩B} c_a·lnq(p/m) + (n_a − Σ_{A∩B} c_a)·ln2_micro) div n_a`
    * with per-term micro-quantized ln (the q64/q164 convention) — no
    * full-outer join, no zero-fill grid. JS = the two sides' mean.
    *
    * The pair UNIVERSE is every src_a < src_b pair from the totals frame,
    * not just pairs sharing support: two slices with fully DISJOINT
    * vocabularies — the maximal-divergence case this drift report exists
    * to flag — emit an explicit `js_micro = ln2_micro` row (shared-support
    * sums left-joined and coalesced to 0), never a silent absence.
    *
    * One (slice, word) partial agg feeds everything; the pair join fans
    * each word to (slices-sharing-it)² rows — slices are bounded by
    * construction, and the universe frame is slices² rows of totals.
    */
  def jsDivergencePairs(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val ln2Micro = 693147L // round(ln(2)·1e6), shared literal both engines
    val counts = docs.select(col(groupCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = counts.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val inter = counts.as("a").join(counts.as("b"),
        col("a.w") === col("b.w") && col("a.src") < col("b.src"))
      .join(broadcast(totals).as("ta"), col("a.src") === col("ta.src"))
      .join(broadcast(totals).as("tb"), col("b.src") === col("tb.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        col("ta.n").as("n_a"), col("tb.n").as("n_b"),
        col("a.c").as("ca"), col("b.c").as("cb"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"), col("ca"), col("cb"),
        expr("""ca * CAST(round(ln((2.0 * ca * n_b) /
               |  (CAST(ca AS DOUBLE) * n_b + CAST(cb AS DOUBLE) * n_a))
               |  * 1000000.0) AS BIGINT)""".stripMargin).as("_ta"),
        expr("""cb * CAST(round(ln((2.0 * cb * n_a) /
               |  (CAST(ca AS DOUBLE) * n_b + CAST(cb AS DOUBLE) * n_a))
               |  * 1000000.0) AS BIGINT)""".stripMargin).as("_tb"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("ca")).as("_sca"), sum(col("cb")).as("_scb"),
        sum(col("_ta")).as("_sta"), sum(col("_tb")).as("_stb"))
    val universe = totals.as("ua").join(broadcast(totals).as("ub"),
        col("ua.src") < col("ub.src"))
      .select(col("ua.src").as("src_a"), col("ub.src").as("src_b"),
        col("ua.n").as("n_a"), col("ub.n").as("n_b"))
    universe.join(inter, Seq("src_a", "src_b"), "left")
      .na.fill(0L, Seq("_sca", "_scb", "_sta", "_stb"))
      .select(col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        expr(s"""(((_sta + (n_a - _sca) * $ln2Micro) div n_a)
                |  + ((_stb + (n_b - _scb) * $ln2Micro) div n_b)) div 2"""
          .stripMargin).as("js_micro"))
  }

  /** Simpson concentration per slice: the probability two random tokens of
    * the slice are the same TYPE, `Σ_w c_w(c_w−1) / (N(N−1))` in exact ppm
    * — the diversity collapse alarm (a template-spam source concentrates;
    * healthy prose stays low), complementary to entropy (q57/q99) because
    * it is exactly rational, dominated by the head, and mergeable from
    * the same (slice, word) counts every other vocab audit uses.
    */
  def simpsonConcentration(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val toks = docs.select(col(groupCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    toks.groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("src"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * (c - 1)")).as("_ss"))
      .filter(col("n_tokens") >= 2)
      .select(col("src"), col("n_tokens"),
        expr("""CAST((_ss * 1000000) div
               |  (CAST(n_tokens AS DECIMAL(38,0)) * (n_tokens - 1))
               |  AS BIGINT)""".stripMargin).as("simpson_ppm"))
  }
}
