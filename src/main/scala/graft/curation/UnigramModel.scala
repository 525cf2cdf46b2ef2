package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus-unigram language-model scoring — the CCNet-style perplexity proxy
  * used to rank pretraining documents by "ordinariness": a document's score
  * is the mean negative log-probability of its tokens under the corpus's
  * own unigram distribution (low = common language, high = rare/garbled).
  * A real KenLM is an external artifact; the unigram model is the standard
  * self-contained first cut and needs nothing but the corpus.
  *
  * Scale shape: ONE corpus token shuffle builds the vocabulary (partial
  * count agg), its grand total is a 1-row broadcast, and scoring joins the
  * exploded tokens to the vocabulary — broadcast when the vocabulary fits
  * (natural-language vocabularies do; `broadcastVocab = false` falls back
  * to a token-keyed shuffle join for adversarial corpora), then one
  * per-document partial agg. Hand [[unigramLogProbTokens]] a persisted
  * token frame to scan and tokenize the raw text exactly once — the
  * convenience entry re-plans the scan under both consumers.
  *
  * Determinism: per-token log-probs are quantized to integer micro-nats
  * BEFORE summing, so the per-document sum is exact integer arithmetic —
  * partition-order-independent and reproducible cross-engine (the same
  * fixed-order trick BM25 uses, adapted to an aggregation).
  */
object UnigramModel {

  /** (idCol, n_tokens, neg_logp_micro, avg_neg_logp) per document —
    * `neg_logp_micro` is the EXACT integer micro-nat sum (the
    * cross-engine-comparable form; `avg_neg_logp` = that / 1e6 / n_tokens
    * is the human-facing score). Documents with zero tokens are dropped
    * (no distribution to score against) — including empty/whitespace-only
    * texts, whose split() yields a phantom "" element that must not reach
    * the vocabulary.
    */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      broadcastVocab: Boolean = true): DataFrame =
    unigramLogProbTokens(
      docs.select(col(idCol),
          explode(TextFunctions.tokens(col(textCol))).as("token"))
        .filter(col("token") =!= ""),
      idCol, "token", broadcastVocab)

  /** [[unigramLogProb]] over already-exploded (id, token) rows — the
    * `Bm25.scoreTokens` pattern: `tokenRows` feeds both the vocabulary
    * aggregate and the scoring join, so a caller handing a PERSISTED token
    * frame gets the corpus scanned and tokenized exactly once (the
    * unpersisted convenience entry above plans the text scan twice).
    * Empty-string tokens must already be filtered out.
    */
  def unigramLogProbTokens(tokenRows: DataFrame, idCol: String,
      tokenCol: String, broadcastVocab: Boolean = true,
      carryCols: Seq[String] = Seq.empty): DataFrame = {
    val keys = col(idCol) +: carryCols.map(col)
    val toks = tokenRows.select(keys :+ col(tokenCol).as("token"): _*)
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val scored = vocab.crossJoin(broadcast(total))
      .select(col("token"),
        round(log(col("total").cast("double") / col("cnt").cast("double")) * 1e6)
          .cast("long").as("lp_micro"))
    val lookup = if (broadcastVocab) broadcast(scored) else scored
    toks.join(lookup, Seq("token"))
      .groupBy(keys: _*)
      .agg(sum(col("lp_micro")).as("neg_logp_micro"),
        count(lit(1)).as("n_tokens"))
      .select(keys ++ Seq(col("n_tokens"), col("neg_logp_micro"),
        (col("neg_logp_micro").cast("double") / 1e6 /
          col("n_tokens").cast("double")).as("avg_neg_logp")): _*)
  }

  /** CCNet-style perplexity bucketing: per `groupCol` (CCNet buckets per
    * language — a score ordinary in German is exotic in English), rank
    * documents by mean per-token negative log-prob and cut the ranking
    * into `nBuckets` equal tiles; bucket 1 is the "head" (most ordinary
    * language), the last tile the "tail" CCNet drops or down-weights.
    *
    * Determinism: the ranking key is `neg_logp_micro div n_tokens` — EXACT
    * integer division of the exact micro-nat sum (non-negative, so
    * truncation == floor on both engines) — tie-broken by id, so the ntile
    * assignment is a pure function of the corpus.
    *
    * Scale shape: scoring is [[unigramLogProbTokens]] (one token shuffle +
    * broadcast vocab); the bucketing window shuffles only the DOC-level
    * score rows by group — skew bounded by the largest language, rows are
    * 4 columns wide. Output: (id, group, n_tokens, ppl_micro_tok, bucket).
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, nBuckets: Int = 10,
      broadcastVocab: Boolean = true): DataFrame =
    perplexityBucketsTokens(
      docs.select(col(idCol), col(groupCol),
          explode(TextFunctions.tokens(col(textCol))).as("token"))
        .filter(col("token") =!= ""),
      idCol, "token", groupCol, nBuckets, broadcastVocab)

  /** [[perplexityBuckets]] over already-exploded (id, group, token) rows —
    * hand it a PERSISTED token frame so the raw text is scanned and
    * tokenized once under both the vocabulary aggregate and the scoring
    * join (the unpersisted convenience entry plans the scan twice).
    */
  def perplexityBucketsTokens(tokenRows: DataFrame, idCol: String,
      tokenCol: String, groupCol: String, nBuckets: Int = 10,
      broadcastVocab: Boolean = true): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    unigramLogProbTokens(tokenRows, idCol, tokenCol, broadcastVocab,
        carryCols = Seq(groupCol))
      .withColumn("ppl_micro_tok", expr("neg_logp_micro div n_tokens"))
      .withColumn("bucket",
        ntile(nBuckets).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(groupCol))
          .orderBy(col("ppl_micro_tok"), col(idCol))))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        col("ppl_micro_tok"), col("bucket"))
  }
}
