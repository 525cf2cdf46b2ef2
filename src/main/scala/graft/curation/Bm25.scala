package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** BM25 keyword relevance over a document corpus for a fixed term set —
  * the lexical retrieval/quality-weighting primitive of a data pipeline
  * (e.g. "score documents against a topic seed list").
  *
  * Scale shape: term frequencies are per-row scalar columns (a `filter`
  * count over the bound token array per term — no explode, no join, no
  * shuffle of the corpus). The corpus-level inputs (N, avgdl, per-term
  * document frequencies) are ONE global aggregate producing a single row,
  * broadcast back via crossJoin. The corpus is never shuffled, but
  * [[score]] scans and tokenizes it twice (once under the stats aggregate,
  * once for scoring) — at 100 TB hand [[scoreTokens]] a persisted tokenized
  * projection instead, which eliminates the second raw-text scan and the
  * re-tokenization.
  *
  * Determinism: per-term contributions are summed as one fixed-order column
  * expression, not a float groupBy reduction, so scores are bit-stable under
  * any partitioning. Callers who need cross-engine comparability should
  * quantize (`round(score * 1e4)`): the formula is IEEE-exact up to the
  * `ln`, whose last ulp may differ across math libraries.
  */
object Bm25 {

  /** doc_id, dl (token count), per-term tf columns, and the BM25 score with
    * parameters k1, b over `terms`. Non-matching documents score 0.0 and are
    * kept (callers filter or rank).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreTokens(
      df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t")),
      idCol, "t", terms, k1, b)

  /** [[score]] over an already-tokenized corpus (`tokensCol`: array of
    * terms). The caller controls materialization: a persisted/written
    * tokenized projection is scanned twice but the raw text only once, and
    * tokenization runs once — the shape to use when the corpus is large or
    * the same tokens feed several term sets.
    */
  def scoreTokens(tokenized: DataFrame, idCol: String, tokensCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val tfCols = terms.map(t =>
      size(filter(col("t"), w => w === t)).cast("long").as(s"tf_$t"))
    val toks = tokenized
      .select(col(idCol), col(tokensCol).as("t"))
      .select(col(idCol) +: size(col("t")).cast("long").as("dl") +: tfCols: _*)

    // ONE corpus-level aggregate: N, avgdl, df per term — a single row
    val statCols = count(lit(1)).as("n_docs") +: avg(col("dl")).as("avgdl") +:
      terms.map(t => sum((col(s"tf_$t") > 0).cast("long")).as(s"df_$t"))
    val stats = toks.agg(statCols.head, statCols.tail: _*)

    val scored = toks.crossJoin(broadcast(stats))
    // fixed-order sum of per-term contributions: idf(t) * saturated tf
    val contribs = terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val dfT = col(s"df_$t").cast("double")
      val idf = log((col("n_docs").cast("double") - dfT + lit(0.5))
        / (dfT + lit(0.5)) + lit(1.0))
      when(tf > 0,
        idf * (tf * (k1 + 1.0))
          / (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
        .otherwise(lit(0.0))
    }
    val total = contribs.reduceLeft(_ + _)
    scored.select(col(idCol) +: col("dl") +: terms.map(t => col(s"tf_$t")) :+
      total.as("score"): _*)
  }
}
