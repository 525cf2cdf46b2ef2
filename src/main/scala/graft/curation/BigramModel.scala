package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Corpus-bigram conditional language model — one order up from the
  * unigram proxy ([[UnigramModel]]): a document's score is the mean
  * negative log of P(w₂|w₁) = c(w₁,w₂) / c(w₁·) over its adjacent token
  * pairs, the standard next step in the CCNet-style perplexity-filter
  * ladder (unigram ranks "rare words", the bigram ranks "improbable word
  * ORDER" — shuffled or machine-mangled text scores high even when every
  * word is common).
  *
  * Scale shape mirrors q62 one level up: ONE pair shuffle builds the
  * bigram counts; the context totals derive from the already-aggregated
  * bigram table (no second corpus pass); scoring joins the pairs to the
  * model — broadcast when it fits (`broadcastModel = false` falls back to
  * a pair-keyed shuffle join for web-scale bigram tables). Hand
  * [[bigramLogProbPairs]] a persisted pair frame to scan and tokenize the
  * corpus exactly once.
  *
  * Determinism: per-pair log-probs quantize to integer micro-nats BEFORE
  * summing (the q62 trick), so per-document sums are exact integer
  * arithmetic. Self-scoring a corpus needs no smoothing — every scored
  * bigram is in the model by construction; documents with < 2 tokens have
  * no bigram and drop out (mirroring q62's zero-token drop).
  */
object BigramModel {

  /** (idCol, n_bigrams, neg_logp_micro, avg_neg_logp) per document */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      broadcastModel: Boolean = true): DataFrame =
    bigramLogProbPairs(pairRows(docs, idCol, textCol), idCol, broadcastModel)

  /** one row per adjacent token pair: (idCol, w1, w2), empty tokens
    * stripped before pairing
    */
  def pairRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
        filter(TextFunctions.tokens(col(textCol)), t => t =!= lit(""))
          .as("_graft_toks"))
      .filter(size(col("_graft_toks")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(0), size(col("_graft_toks")) - 2),
          j => struct(element_at(col("_graft_toks"), j + 1).as("w1"),
            element_at(col("_graft_toks"), j + 2).as("w2"))))
          .as("_graft_bg"))
      .select(col(idCol), col("_graft_bg.w1").as("w1"),
        col("_graft_bg.w2").as("w2"))

  /** Interpolated Kneser–Ney smoothed bigram scoring (Kneser & Ney 1995;
    * the KenLM default) — unlike the raw conditional ([[bigramLogProb]]),
    * the smoothed model is usable for scoring text the model was NOT
    * trained on: every probability interpolates with the continuation
    * unigram P_cont(w₂) = N₁₊(·w₂)/N₁₊(··), so unseen CONTEXTS degrade
    * gracefully instead of dividing by zero.
    *
    *   P(w₂|w₁) = (c(w₁w₂) − d)/c(w₁·) + d·N₁₊(w₁·)/c(w₁·) · P_cont(w₂)
    *
    * Every model quantity (c₂, c₁, follower-type and continuation-type
    * counts, total bigram types) derives from the aggregated bigram table —
    * no extra corpus pass; the absolute discount subtraction needs no
    * max(·,0) clamp because every scored bigram has c₂ ≥ 1 > d. Per-pair
    * −ln P quantizes to integer micro-nats before the per-document sum
    * (the q62/q75 convention). Scale shape identical to
    * [[bigramLogProbPairs]]: one pair shuffle, model joins by broadcast
    * (or pair-keyed shuffle with `broadcastModel = false`), the 1-row
    * type-total crossJoin is a broadcast.
    *
    * Returns (idCol, n_bigrams, kn_neg_logp_micro) per document.
    */
  def kneserNeyLogProbPairs(pairs: DataFrame, idCol: String,
      discount: Double = 0.75, broadcastModel: Boolean = true): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0,1), got $discount")
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("n1"))
    val ncont = c2.groupBy(col("w2")).agg(count(lit(1)).as("nc"))
    val ntypes = c2.agg(count(lit(1)).as("nt"))
    val p =
      (col("c2").cast("double") - lit(discount)) / col("c1").cast("double") +
        lit(discount) * col("n1").cast("double") / col("c1").cast("double") *
          (col("nc").cast("double") / col("nt").cast("double"))
    val lp = c2.join(c1, Seq("w1")).join(ncont, Seq("w2"))
      .crossJoin(broadcast(ntypes))
      .select(col("w1"), col("w2"),
        round(-log(p) * 1e6).cast("long").as("kn_micro"))
    val model = if (broadcastModel) broadcast(lp) else lp
    pairs.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("kn_micro")).as("kn_neg_logp_micro"))
  }

  /** [[bigramLogProb]] over pre-exploded (id, w1, w2) rows — hand a
    * PERSISTED frame to feed the count build and the scoring join from one
    * tokenization
    */
  def bigramLogProbPairs(pairs: DataFrame, idCol: String,
      broadcastModel: Boolean = true): DataFrame = {
    val c2 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // context totals from the aggregated bigram table, not the corpus:
    // c(w1·) = Σ_w2 c(w1,w2) — no second pass over the pairs
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val lp = c2.join(c1, Seq("w1"))
      .select(col("w1"), col("w2"),
        round(log(col("c1").cast("double") / col("c2").cast("double")) * 1e6)
          .cast("long").as("lp_micro"))
    val model = if (broadcastModel) broadcast(lp) else lp
    pairs.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp_micro")).as("neg_logp_micro"))
      .select(col(idCol), col("n_bigrams"), col("neg_logp_micro"),
        (col("neg_logp_micro").cast("double") / 1e6 /
          col("n_bigrams").cast("double")).as("avg_neg_logp"))
  }

  /** Per-group bigram conditional entropy rate H(w₂|w₁) =
    * Σ_xy c(xy)/N · ln(c(x·)/c(xy)) in exact integer micro-nats per
    * bigram — the corpus DIVERSITY audit (Shannon 1951's printed-English
    * estimate, run per source): template-generated or boilerplate-heavy
    * slices score near 0 (next token predictable), diverse prose scores
    * high. The complement of the per-document repetition signals: this is
    * the property of the SLICE, not the document.
    *
    * `pairs` is a (groupCol, w1, w2) frame ([[pairRows]] with the group
    * column as id) — hand it a persisted frame when other bigram consumers
    * share it. Every ln is quantized per DISTINCT (group, bigram) before
    * the exact integer weighted sum, so distributed order never matters;
    * the aggregates partial-agg map-side and shuffle at most the distinct
    * bigram vocabulary per group.
    */
  def conditionalEntropy(pairs: DataFrame, groupCol: String): DataFrame = {
    val cxy = pairs.groupBy(col(groupCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("cxy"))
    val cx = cxy.groupBy(col(groupCol), col("w1"))
      .agg(sum(col("cxy")).as("cx"))
    cxy.join(cx, Seq(groupCol, "w1"))
      .select(col(groupCol), col("cxy"),
        (col("cxy") *
          round(log(col("cx").cast("double") / col("cxy").cast("double")) * 1e6)
            .cast("long")).as("_graft_term_micro"))
      .groupBy(col(groupCol))
      .agg(sum(col("cxy")).as("n_bigrams"),
        count(lit(1)).as("n_distinct"),
        sum(col("_graft_term_micro")).as("_graft_h_micro"))
      .select(col(groupCol), col("n_bigrams"), col("n_distinct"),
        expr("_graft_h_micro div n_bigrams").as("cond_entropy_micro"))
  }
}
