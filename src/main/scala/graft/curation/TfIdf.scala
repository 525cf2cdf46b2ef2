package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.BoundedTopKAgg
import graft.text.TextFunctions

/** one bounded-top-k candidate: exact integer score, token, raw tf */
final case class TfIdfTerm(score: Long, token: String, tf: Long)

/** Per-document top-k characteristic terms by TF-IDF — the classic
  * keyword-extraction / topic-labeling primitive of a corpus pipeline
  * (what is this document about; which slice does it belong to).
  *
  * Scale shape: ONE corpus token shuffle builds the (doc, token, tf)
  * aggregate; document frequencies re-aggregate that result (vocabulary-
  * sized — persist the tf frame upstream for a strict single text scan,
  * the `UnigramModel.unigramLogProbTokens` pattern); the document count is
  * a 1-row broadcast. The per-document top-k is a bounded aggregate, not a
  * `row_number` window: partials cap the exchange at k rows per document
  * per upstream partition, so a 100 TB corpus never sorts a document's
  * full vocabulary in one partition.
  *
  * Determinism: idf quantizes to integer micro-nats per TERM
  * (`round(ln(N/df) * 1e6)`), so `score_micro = tf * idf_micro` is exact
  * integer arithmetic — partition-order-independent and cross-engine
  * comparable (the q62/q64 trick applied to ranking, which also makes the
  * top-k selection itself reproducible, not just the reported scores).
  */
object TfIdf {

  /** (idCol, rank, token, tf, score_micro) — top `k` terms per document by
    * exact integer tf-idf, rank 1-based, ties broken by token order
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame =
    topTermsFromTf(
      docs.select(col(idCol),
          explode(TextFunctions.tokens(col(textCol))).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col(idCol), col("token"))
        .agg(count(lit(1)).as("tf")),
      docs.count(), idCol, k = k)

  /** [[topTerms]] over a pre-aggregated (id, token, tf) frame and an
    * externally-known document count — hand a persisted tf frame to scan
    * the corpus text exactly once
    */
  def topTermsFromTf(tf: DataFrame, nDocs: Long, idCol: String,
      tokenCol: String = "token", tfCol: String = "tf",
      k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(nDocs > 0, s"nDocs must be positive, got $nDocs")
    val rows = tf.select(col(idCol), col(tokenCol).as("token"),
      col(tfCol).cast("long").as("tf"))
    val dfs = rows.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val scored = rows.join(dfs, Seq("token"))
      .select(col(idCol), col("token"), col("tf"),
        (col("tf") * round(log(lit(nDocs.toDouble) / col("df").cast("double")) * 1e6)
          .cast("long")).as("score_micro"))
    val tk = udaf(new BoundedTopKAgg[TfIdfTerm](k,
      Ordering.by((t: TfIdfTerm) => (-t.score, t.token))))
    scored.groupBy(col(idCol))
      .agg(tk(col("score_micro"), col("token"), col("tf")).as("top"))
      .select(col(idCol), posexplode(col("top")))
      .select(col(idCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.token").as("token"), col("col.tf").as("tf"),
        col("col.score").as("score_micro"))
  }
}
