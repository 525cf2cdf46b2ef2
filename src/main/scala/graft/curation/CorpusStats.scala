package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

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
}
