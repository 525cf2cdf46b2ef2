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

  /** All-pairs document similarity by TF-IDF cosine over the shared-term
    * inverted index (Bayardo et al.'s APSS shape) — the weighted
    * complement to gram-set Jaccard (q24/q25): near-topical pairs surface
    * even when exact shingles don't repeat. Every candidate comes from the
    * token equi-join (a pair with no shared term has cosine 0), so the plan
    * is index-join → pair partial-agg → norm join: never a cross product.
    *
    * Determinism: weights are exact longs (tf × milli-nat idf, idf
    * quantized per TERM), numerators and squared norms are exact integer
    * sums, and the reported `cos2_ppm` = ⌊num²·10⁶ / (‖a‖²·‖b‖²)⌋ is an
    * integral decimal division — the SQUARED cosine, monotone in cosine
    * since weights are nonnegative, so thresholding at `t2Ppm` =
    * round(t²·10⁶) is order-identical to thresholding cosine at t.
    *
    * Scale: candidate volume is Σ_token df² — `maxDf` caps the boilerplate
    * tail (dropping a term with df near N also drops near-zero idf weight,
    * so the cap is a bounded-error knob, unlike Jaccard prefix filtering
    * it is NOT lossless; the gate runs uncapped). Magnitude bounds
    * (documented, enforced upstream): tf·idf ≤ ~2×10⁶ and ≤ ~10⁴ distinct
    * terms/doc keep num² · 10⁶ inside DECIMAL(38,0)/HUGEINT.
    *
    * FOOT-GUN GUARD (the `maxStrata` pattern): the RELATIVE cap
    * (`maxDfPpm`) scales the allowed df with the corpus, so a
    * per-slice-dense token (one language's stopwords on a multilingual
    * corpus) can hide under a global 20% cap and pair all-vs-all within
    * its slice — measured 195× wall at 10× data. Past
    * `maxRelativeCapDocs` distinct documents the relative mode fails fast
    * with guidance toward the absolute `maxDf` mode (the shipped scale
    * path, q187); raise the limit explicitly to accept the quadratic
    * risk on a corpus you know is slice-homogeneous.
    */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
      t2Ppm: Long, maxDf: Option[Long] = None,
      maxDfPpm: Option[Long] = None,
      maxRelativeCapDocs: Long = 1000000L): DataFrame = {
    require(t2Ppm >= 0 && t2Ppm <= 1000000L,
      s"t2Ppm must be in [0, 1e6], got $t2Ppm")
    require(maxDf.isEmpty || maxDfPpm.isEmpty,
      "pass maxDf (absolute) or maxDfPpm (fraction of corpus), not both")
    val tf = graft.operators.Parallelism.ensure(
        docs.select(col(idCol).cast("long").as("doc_id"),
          col(textCol).as("_graft_t")))
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("_graft_t"))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = tf.select(col("doc_id")).distinct().count()
    if (maxDfPpm.isDefined && nDocs > maxRelativeCapDocs)
      throw new IllegalArgumentException(
        s"cosinePairs relative cap (maxDfPpm) on $nDocs distinct documents" +
          s" exceeds maxRelativeCapDocs=$maxRelativeCapDocs: a" +
          " per-slice-dense token under a relative cap pairs all-vs-all" +
          " within its slice (quadratic wall at scale). Use the absolute" +
          " maxDf cap instead, or raise maxRelativeCapDocs explicitly if" +
          " the corpus is known slice-homogeneous.")
    val dfs0 = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // the relative cap resolves against the corpus it runs on, so a query
    // keeps its selectivity across scale factors where an absolute cap
    // silently empties (or floods) at 10×
    val dfs1 = maxDfPpm.fold(dfs0)(ppm =>
      dfs0.filter(col("df") * 1000000L <= lit(nDocs * ppm)))
    val dfs = maxDf.fold(dfs1)(cap => dfs1.filter(col("df") <= cap))
    val w = tf.join(dfs, "token")
      .select(col("doc_id"), col("token"),
        (col("tf") * round(log(lit(nDocs.toDouble) / col("df").cast("double"))
          * 1e3).cast("long")).as("w"))
      .filter(col("w") > 0) // df = N terms carry zero idf: thin the index
    val norms = w.groupBy(col("doc_id"))
      .agg(sum(col("w") * col("w")).as("_graft_ss"))
    val pairs = w.as("a").join(w.as("b"),
        col("a.token") === col("b.token") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(sum(col("a.w") * col("b.w")).as("num"))
    pairs
      .join(norms.select(col("doc_id").as("id_a"), col("_graft_ss").as("_graft_sa")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("_graft_ss").as("_graft_sb")), "id_b")
      .select(col("id_a"), col("id_b"), col("num"),
        expr("""(CAST(num AS DECIMAL(38,0)) * num * 1000000) div
               |  (CAST(_graft_sa AS DECIMAL(38,0)) * _graft_sb)""".stripMargin)
          .cast("long").as("cos2_ppm"))
      .filter(col("cos2_ppm") >= t2Ppm)
  }
}
