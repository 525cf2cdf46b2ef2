package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Distilled token quality classifier — the CCNet/fastText-style filter
  * loop: take a cheap pseudo-label over part of the corpus (a heuristic
  * rule, a curated slice, a reference corpus), learn Laplace-smoothed
  * Naive-Bayes log-odds per token, and score EVERY document with the
  * learned weights. The expensive heuristic runs once; the distilled
  * linear model is a per-token lookup + sum, cheap enough for the full
  * 100 TB pass. (No reference counterpart — builder's brief; the standard
  * pipeline citation is CCNet's fastText quality filter.)
  *
  * Scale shape: ONE token shuffle learns the weights (per-token
  * conditional counts, partial-agg), class totals and vocabulary size are
  * a 1-row broadcast, and scoring is a broadcast (or optionally shuffled)
  * vocabulary join + per-document partial agg — exactly the q62 unigram
  * topology with a class dimension.
  *
  * Determinism: each class log-likelihood is quantized to integer
  * micro-nats BEFORE the subtraction and the per-document sum, so scores
  * are exact integer arithmetic — partition-order-independent and
  * cross-engine-reproducible (the q62/q64 trick).
  */
object QualityClassifier {

  /** Per-token Naive-Bayes log-odds weights from labeled (token, label)
    * rows: weight_micro = round(1e6·ln((c₊+1)/(T₊+V))) −
    * round(1e6·ln((c₋+1)/(T₋+V))) with c the token's count inside the
    * class, T the class token total and V the overall vocabulary size
    * (Laplace smoothing — unseen-in-class tokens still score). Positive
    * weight ⇒ evidence for the positive class.
    */
  def trainTokens(tokenRows: DataFrame, tokenCol: String,
      labelCol: String): DataFrame = {
    val counts = tokenRows
      .groupBy(col(tokenCol).as("token"))
      .agg(count_if(col(labelCol)).as("c_pos"),
        count_if(!col(labelCol)).as("c_neg"))
    val totals = counts.agg(
      sum(col("c_pos")).as("t_pos"), sum(col("c_neg")).as("t_neg"),
      count(lit(1)).as("v"))
    def lpMicro(c: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
      round(log((c + lit(1)).cast("double") / (t + col("v")).cast("double")) * 1e6)
        .cast("long")
    counts.crossJoin(broadcast(totals))
      .select(col("token"),
        (lpMicro(col("c_pos"), col("t_pos")) -
          lpMicro(col("c_neg"), col("t_neg"))).as("weight_micro"))
  }

  /** (idCol, n_tokens, score_micro) per document over pre-exploded
    * (id, token) rows and trained weights — score_micro is the exact
    * integer micro-nat log-odds sum; > 0 ⇒ the positive class is more
    * likely under the model. Tokens absent from the weight table (unseen
    * at training time) contribute nothing — the conventional fastText
    * behavior for out-of-vocabulary tokens.
    */
  def scoreTokens(tokenRows: DataFrame, idCol: String, tokenCol: String,
      weights: DataFrame, broadcastWeights: Boolean = true): DataFrame = {
    val w = if (broadcastWeights) broadcast(weights) else weights
    tokenRows.select(col(idCol), col(tokenCol).as("token"))
      .join(w, Seq("token"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("weight_micro")).as("score_micro"))
  }

  /** train-on-pseudo-label + score-everything in one call: `labelCol` is a
    * boolean column of `docs` (the cheap heuristic); every document with
    * ≥1 token in the training vocabulary gets a score. Hand a persisted
    * token frame to [[trainTokens]]/[[scoreTokens]] directly to tokenize
    * the corpus exactly once.
    */
  def distill(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, broadcastWeights: Boolean = true): DataFrame = {
    val tokenRows = docs.select(col(idCol), col(labelCol),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
    scoreTokens(tokenRows, idCol, "token",
      trainTokens(tokenRows, "token", labelCol), broadcastWeights)
  }
}
