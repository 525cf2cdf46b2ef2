package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Within-document repetition signals (the Gopher/RefinedWeb-style quality
  * rules: drop documents dominated by repeated n-grams) and corpus-level
  * boilerplate mining (the C4-style "common line" sweep).
  *
  * Everything per-document is scalar column work over an already-bound token
  * array attribute — no shuffle, embarrassingly parallel at 100 TB. The only
  * exchanges are in boilerplate mining: one partial-aggregated groupBy on the
  * gram plus a bounded global top-k (TakeOrdered, never a full sort).
  *
  * Reference scope: the reference engine has no corpus-quality surface; these
  * are the training-data-pipeline additions the build mandates.
  */
object QualitySignals {

  /** all overlapping word n-grams, in order WITH duplicates (the repetition
    * unit — unlike TextFunctions.shingles, which deduplicates for LSH).
    * `toks` must be a bound attribute (select it first), not a raw `split`
    * expression: Catalyst re-evaluates outer expressions inside HOF lambdas.
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Highest occurrence count of any single element in the array, computed
    * per-row: sort, then fold counting the longest equal-adjacent run. O(n
    * log n) per document with no per-element array rescans (the naive
    * `filter(arr, y -> y = x)` per element is O(n^2) under HOF re-evaluation).
    * Empty array → 0.
    */
  def maxElementCount(arr: Column): Column =
    aggregate(
      array_sort(arr),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  /** Per-document repetition profile over word n-grams:
    *   - `n_grams`       total n-gram occurrences
    *   - `top_gram_count` occurrences of the most repeated n-gram
    *   - `dup_gram_frac` fraction of occurrences beyond each gram's first
    *   - `top_gram_frac` top_gram_count / n_grams
    * Documents shorter than n tokens report 0 / 0 / 0.0 / 0.0.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
    val g = toks.select(col(idCol), ngrams(col("t"), n).as("grams"))
    val stats = g.select(
      col(idCol),
      size(col("grams")).as("n_grams"),
      size(array_distinct(col("grams"))).as("n_distinct"),
      maxElementCount(col("grams")).as("top_gram_count"))
    stats.select(
      col(idCol),
      col("n_grams"),
      col("top_gram_count"),
      when(col("n_grams") > 0,
        (col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"))
        .otherwise(lit(0.0)).as("dup_gram_frac"),
      when(col("n_grams") > 0,
        col("top_gram_count").cast("double") / col("n_grams"))
        .otherwise(lit(0.0)).as("top_gram_frac"))
  }

  /** Shannon entropy of the token distribution (nats): H = ln(n) − (Σ c·ln c)/n
    * over per-token counts c — low entropy flags repetitive/templated text
    * (a Gopher-family quality signal). Computed per-row on the SORTED token
    * array with one run-length fold accumulating Σ c·ln c as each equal-run
    * closes — no per-row explode, no shuffle. Empty arrays → 0.0.
    *
    * Goes through `ln`, so cross-engine comparison should quantize
    * (`round(H * 1e4)`), like BM25. Null elements are dropped first — a
    * null inside the fold would void the run-close comparison and corrupt
    * the accumulated sum.
    */
  def tokenEntropy(arr: Column): Column = {
    val folded = aggregate(
      array_sort(filter(arr, x => x.isNotNull)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("s"),
        lit(0L).as("n")),
      (acc, x) => {
        val closes = x =!= acc("prev") && acc("run") > 0
        val closedS = when(closes,
          acc("s") + acc("run").cast("double") * log(acc("run").cast("double")))
          .otherwise(acc("s"))
        val run = when(x === acc("prev"), acc("run") + lit(1L)).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"), closedS.as("s"),
          (acc("n") + lit(1L)).as("n"))
      },
      acc => when(acc("n") === 0, lit(0.0)).otherwise(
        log(acc("n").cast("double"))
          - (acc("s") + acc("run").cast("double") * log(acc("run").cast("double")))
            / acc("n").cast("double")))
    folded
  }

  /** Corpus-level boilerplate candidates: the k word n-grams appearing in the
    * most documents (each document votes once per distinct gram). The groupBy
    * partial-aggregates map-side; the final top-k is a TakeOrdered over
    * (count desc, gram) — a total order, so results are deterministic.
    */
  def boilerplateGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    val toks = df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
    toks.select(explode(array_distinct(ngrams(col("t"), n))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("gram"))
      .limit(k)
  }
}
