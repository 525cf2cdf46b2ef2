package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Data Selection with Importance Resampling (DSIR, Xie et al., NeurIPS
  * 2023) — score every document by how much it "looks like" a target
  * domain, using hashed n-gram features: cheap enough to run over a raw
  * 100 TB crawl, strong enough to pick the Wikipedia-like slice out of it.
  *
  * Features are the document's unigrams + bigrams hashed into a fixed
  * bucket space (here: the first `hexChars` hex chars of md5 → 16^hexChars
  * buckets — the md5-prefix idiom every other gate hash uses, portable to
  * any engine). Two bag-of-buckets distributions are estimated from the
  * corpus itself — the target slice and the raw remainder — and a
  * document's importance weight is the log-likelihood ratio of its buckets:
  *
  *   weight(d) = Σ_{g ∈ grams(d)} [ ln p̂_target(b(g)) − ln p̂_raw(b(g)) ]
  *
  * with add-1 smoothing over the full bucket space. High weight = the
  * target distribution explains the document better than the raw one;
  * resampling by weight (e.g. top-k or Gumbel) yields the DSIR subset.
  *
  * Scale shape: ONE corpus scan explodes grams; one ≤16^hexChars-row
  * aggregate builds both distributions (partial-agg'd conditional sums, no
  * per-side scans); the λ table is a broadcast joined back to the gram
  * stream; one per-document partial agg produces the weights. Nothing
  * driver-side, nothing quadratic; the gram explosion is the only wide
  * exchange and it carries (id, 2-hex-char bucket) pairs, not text.
  *
  * Determinism: per-bucket log-ratios are quantized to integer micro-nats
  * BEFORE the per-document sum (the [[UnigramModel]] trick), so document
  * weights are exact integer arithmetic — partition-order-independent and
  * reproducible cross-engine.
  */
object Dsir {

  /** unigrams + bigrams of a (pre-filtered, no-empty-string) token array */
  private def grams(toks: Column): Column =
    concat(toks,
      when(size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2), i =>
          concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>")))

  /** The exploded (id, is_target, bucket) feature stream — one row per
    * gram, bucketed by md5-hex prefix. PERSIST this before handing it to
    * [[importanceWeightsBuckets]] and the corpus is scanned and gram-hashed
    * exactly once under both consumers (the `UnigramModel` token-frame
    * pattern); the inline convenience entry below plans the scan twice.
    */
  def bucketRows(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hexChars: Int = 2): DataFrame = {
    val toks = filter(TextFunctions.tokens(col(textCol)), t => t =!= "")
    docs.select(col(idCol), isTarget.as("is_target"),
        explode(grams(toks)).as("gram"))
      .select(col(idCol), col("is_target"),
        substring(md5(col("gram")), 1, hexChars).as("bucket"))
  }

  /** (idCol, n_grams, weight_micro) per document — `weight_micro` is the
    * exact integer micro-nat importance weight (sum of quantized per-bucket
    * log-ratios). Documents with zero tokens are dropped (no features).
    *
    * @param isTarget  boolean column over `docs` marking the target-domain
    *                  slice whose distribution the weights chase
    * @param hexChars  md5-hex-prefix length; bucket space = 16^hexChars
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hexChars: Int = 2): DataFrame =
    importanceWeightsBuckets(
      bucketRows(docs, idCol, textCol, isTarget, hexChars),
      idCol, "bucket", "is_target", math.pow(16, hexChars))

  /** [[importanceWeights]] over already-exploded (id, bucket, is_target)
    * rows — hand this a PERSISTED bucket frame and the corpus is scanned
    * and gram-hashed exactly once under both consumers (distribution
    * estimate + scoring join), the `UnigramModel.unigramLogProbTokens`
    * pattern.
    */
  def importanceWeightsBuckets(bucketRows: DataFrame, idCol: String,
      bucketCol: String, isTargetCol: String, nBuckets: Double): DataFrame = {
    val b = bucketRows.select(col(idCol), col(bucketCol).as("bucket"),
      col(isTargetCol).as("is_target"))
    // both distributions from ONE bucket-keyed aggregate
    val counts = b.groupBy(col("bucket")).agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("tc"),
      sum(when(col("is_target"), 0L).otherwise(1L)).as("rc"))
    val totals = counts.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
    val lambda = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        round((log((col("tc").cast("double") + 1.0) /
                   (col("tt").cast("double") + nBuckets)) -
               log((col("rc").cast("double") + 1.0) /
                   (col("rt").cast("double") + nBuckets))) * 1e6)
          .cast("long").as("lam"))
    b.join(broadcast(lambda), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lam")).as("weight_micro"))
      .select(col(idCol), col("n_grams"), col("weight_micro"))
  }

  /** DuckDB CTE chain shared by every DSIR oracle (q76/q78): `documents` →
    * per-doc weights as `w(doc_id, n_grams, weight_micro)`. Kept in ONE
    * place so the Scala and SQL formulations can only desync in one spot.
    *
    * @param targetsSql SQL list literal of target source ids,
    *                   e.g. `"'src0','src1','src2'"`
    */
  def oracleCtes(targetsSql: String): String =
    s"""tok AS (
       |  SELECT doc_id, source IN ($targetsSql) AS is_t,
       |    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, is_t,
       |    unnest(t || list_transform(range(1, len(t)),
       |      i -> t[CAST(i AS INT)] || ' ' || t[CAST(i+1 AS INT)])) AS gram
       |  FROM tok),
       |b AS (SELECT doc_id, is_t, substr(md5(gram), 1, 2) AS bucket FROM g),
       |c AS (SELECT bucket,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS tc,
       |    sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS rc
       |  FROM b GROUP BY bucket),
       |tot AS (SELECT CAST(sum(tc) AS BIGINT) AS tt,
       |    CAST(sum(rc) AS BIGINT) AS rt FROM c),
       |lam AS (SELECT bucket,
       |    CAST(round((ln((CAST(tc AS DOUBLE) + 1.0) / (CAST(tt AS DOUBLE) + 256.0))
       |              - ln((CAST(rc AS DOUBLE) + 1.0) / (CAST(rt AS DOUBLE) + 256.0)))
       |         * 1e6) AS BIGINT) AS lam
       |  FROM c CROSS JOIN tot),
       |w AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(lam) AS BIGINT) AS weight_micro
       |  FROM b JOIN lam USING (bucket) GROUP BY doc_id)""".stripMargin
}
