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

  /** (idCol, n_grams, weight_micro) per document — `weight_micro` is the
    * exact integer micro-nat importance weight (sum of quantized per-bucket
    * log-ratios). Documents with zero tokens are dropped (no features).
    *
    * @param isTarget  boolean column over `docs` marking the target-domain
    *                  slice whose distribution the weights chase
    * @param hexChars  md5-hex-prefix length; bucket space = 16^hexChars
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, hexChars: Int = 2): DataFrame = {
    val nBuckets = math.pow(16, hexChars)
    val toks = filter(TextFunctions.tokens(col(textCol)), t => t =!= "")
    val bucketed = docs
      .select(col(idCol), isTarget.as("is_target"),
        explode(grams(toks)).as("gram"))
      .select(col(idCol), col("is_target"),
        substring(md5(col("gram")), 1, hexChars).as("bucket"))
    importanceWeightsBuckets(bucketed, idCol, "bucket", "is_target", nBuckets)
  }

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
}
