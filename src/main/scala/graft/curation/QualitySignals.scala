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

  /** Gopher-style filter-rule ATTRIBUTION per slice: not just "how many docs
    * survive" but which rule kills what, per source — the report that decides
    * whether a rule is miscalibrated for a domain (code trips the symbol
    * rule, tables trip the digit rule) before a 100 TB filtering run.
    *
    * Rules (all integer compares; ratios cross-multiplied so no float ever
    * appears):
    *   short      token count < minTokens
    *   long       token count > maxTokens
    *   mean_len   mean token length outside [3, 10]
    *   symbol     non-alphanumeric, non-whitespace chars > 10% of text
    *   digit      digit chars > 20% of text
    *   stopword   < 2 distinct stopwords present
    *   repeat     most frequent token > 20% of all tokens
    *
    * Output: one row per group — (groupCol, n_docs, f_short, f_long,
    * f_mean_len, f_symbol, f_digit, f_stopword, f_repeat, n_pass) where
    * n_pass counts documents failing NO rule.
    *
    * Scale shape: every rule is a per-row codegen'd fold (the repetition
    * rule reuses the O(n log n) sorted-run fold); the only exchange is the
    * final per-group count aggregate, partial-agg'd map-side.
    */
  def ruleAttribution(df: DataFrame, textCol: String, groupCol: String,
      stops: Seq[String] = TextFunctions.DefaultStopwords,
      minTokens: Int = 50, maxTokens: Int = 100000): DataFrame = {
    val base = df.select(col(groupCol).as("_graft_g"),
        col(textCol).as("_graft_text"),
        TextFunctions.tokens(col(textCol)).as("_graft_t"))
      .select(col("_graft_g"), col("_graft_text"), col("_graft_t"),
        size(col("_graft_t")).cast("long").as("_graft_nt"),
        aggregate(col("_graft_t"), lit(0L), (a, x) => a + length(x))
          .as("_graft_sumlen"),
        length(regexp_replace(col("_graft_text"),
          "[A-Za-z0-9 \\t\\n\\r\\f]", "")).cast("long").as("_graft_sym"),
        length(regexp_replace(col("_graft_text"), "[^0-9]", ""))
          .cast("long").as("_graft_dig"),
        length(col("_graft_text")).cast("long").as("_graft_len"),
        size(array_intersect(array_distinct(col("_graft_t")),
          array(stops.map(lit): _*))).as("_graft_nstop"),
        maxElementCount(col("_graft_t")).as("_graft_top"))
    val flagged = base.select(col("_graft_g"),
      (col("_graft_nt") < minTokens).as("r_short"),
      (col("_graft_nt") > maxTokens).as("r_long"),
      (col("_graft_sumlen") < lit(3L) * col("_graft_nt") ||
        col("_graft_sumlen") > lit(10L) * col("_graft_nt")).as("r_mean"),
      (col("_graft_sym") * 10L > col("_graft_len")).as("r_sym"),
      (col("_graft_dig") * 5L > col("_graft_len")).as("r_dig"),
      (col("_graft_nstop") < 2).as("r_stop"),
      (col("_graft_top") * 5L > col("_graft_nt")).as("r_rep"))
    def f(c: String) = sum(when(col(c), 1L).otherwise(0L))
    flagged.groupBy(col("_graft_g"))
      .agg(count(lit(1)).as("n_docs"),
        f("r_short").as("f_short"), f("r_long").as("f_long"),
        f("r_mean").as("f_mean_len"), f("r_sym").as("f_symbol"),
        f("r_dig").as("f_digit"), f("r_stop").as("f_stopword"),
        f("r_rep").as("f_repeat"),
        sum(when(!col("r_short") && !col("r_long") && !col("r_mean") &&
          !col("r_sym") && !col("r_dig") && !col("r_stop") && !col("r_rep"),
          1L).otherwise(0L)).as("n_pass"))
      .withColumnRenamed("_graft_g", groupCol)
  }
}
