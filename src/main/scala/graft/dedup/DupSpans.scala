package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Exact duplicated-SPAN detection — the substring-level complement of
  * whole-document dedup (q19) and passage fingerprinting (q66): find every
  * maximal run of words covered by a word n-gram that occurs more than once
  * in the corpus, the distributed re-expression of suffix-array training-data
  * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better"; reference repo has no counterpart — builder's brief).
  * A suffix array is a single-machine artifact; the Spark-native shape is
  * the n-gram inverted index the engine already uses for dedup:
  *
  *  1. per row: whitespace tokens → all word n-grams with their start
  *     positions (one HOF pipeline, no shuffle);
  *  2. grams occurring ≥ `minCount` times across the corpus (ONE gram
  *     shuffle with partial aggregation — same cost shape as the q62
  *     vocabulary build);
  *  3. duplicated gram starts cover words [p, p+n−1]; merge covered words
  *     into maximal islands per document (gaps-and-islands over a per-doc
  *     window — skew bounded by the longest document).
  *
  * Word positions index the empty-token-filtered whitespace token list —
  * stable across engines (the DuckDB oracle builds the identical list).
  * `n` is the minimum span length in WORDS (Lee et al. use 50 BPE tokens;
  * word-grams are the tokenizer-free equivalent). Spans from overlapping
  * or adjacent duplicated grams coalesce automatically because coverage is
  * computed word-wise, so output spans are maximal and disjoint per doc.
  */
object DupSpans {

  private def cleanTokens(textCol: String): Column =
    filter(TextFunctions.tokens(col(textCol)), t => t =!= lit(""))

  /** (idCol, span_start, span_end, span_words) — maximal word spans covered
    * by any n-gram occurring ≥ minCount times corpus-wide; positions are
    * 0-based indexes into the whitespace token list
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minCount: Int = 2): DataFrame =
    duplicatedSpansFromGrams(gramStarts(docs, idCol, textCol, n),
      idCol, n, minCount)

  /** [[duplicatedSpans]] over pre-computed [[gramStarts]] rows — the
    * `Bm25.scoreTokens` pattern: the gram frame feeds both the dup-count
    * aggregate and the coverage join, so hand a PERSISTED frame to scan
    * and gram-assemble the corpus exactly once (the convenience entry
    * re-plans the text scan under both consumers). The dup-gram set after
    * the count floor is small (duplication is the exception), so AQE turns
    * the coverage join into a broadcast — the gram rows themselves are
    * never shuffled twice.
    */
  def duplicatedSpansFromGrams(grams: DataFrame, idCol: String,
      n: Int, minCount: Int = 2): DataFrame = {
    require(n >= 1 && minCount >= 2, s"bad n=$n minCount=$minCount")
    val dup = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("_graft_cnt"))
      .filter(col("_graft_cnt") >= minCount)
      .select(col("gram"))
    // coverage islands via interval merge over gram START positions (the
    // r14 crossDocSpans rewrite): a dup gram at start p covers words
    // [p, p+n−1]; starts sorted per doc with equal lengths make the
    // previous start's end the running max, so a new island begins
    // exactly when pos > lag(pos) + n — no n× covered-word explode and
    // no corpus-sized distinct. span_words of a contiguous island is
    // span_end − span_start + 1.
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    grams.join(dup, Seq("gram"))
      .select(col(idCol), col("pos"))
      .withColumn("_graft_brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + n, 1L)
          .otherwise(0L))
      .withColumn("_graft_grp", sum(col("_graft_brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("_graft_grp"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + (n - 1)).as("span_end"))
      .drop("_graft_grp", "_graft_brk")
      .withColumn("span_words", col("span_end") - col("span_start") + 1)
  }

  /** texts with every duplicated span removed (tokens rejoined with single
    * spaces): the dedup ACTION over [[duplicatedSpans]]'s detection — keeps
    * each document's non-duplicated words in order, dropping ONLY documents
    * whose every word is covered (a document with no tokens at all has
    * nothing duplicated and survives as the empty string). Re-plans the
    * text scan under three consumers — at corpus scale persist
    * [[gramStarts]] and hand [[duplicatedSpansFromGrams]]'s output to the
    * spans overload below instead.
    */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minCount: Int = 2): DataFrame =
    stripDuplicatedSpans(docs, idCol, textCol,
      duplicatedSpans(docs, idCol, textCol, n, minCount))

  /** [[stripDuplicatedSpans]] over pre-computed [[duplicatedSpans]] rows —
    * the persisted-frame composition path (detection and removal each read
    * the gram frame once instead of re-assembling it per consumer)
    */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val cuts = spans
      .select(col(idCol).as("_graft_cut_id"),
        explode(sequence(col("span_start"), col("span_end"))).as("_graft_cut"))
    val toks = docs.select(col(idCol), cleanTokens(textCol).as("_graft_toks"))
    val kept = toks
      .select(col(idCol),
        posexplode(col("_graft_toks")).as(Seq("_graft_pos", "_graft_tok")))
      .join(cuts,
        col(idCol) === col("_graft_cut_id") &&
          col("_graft_pos").cast("long") === col("_graft_cut"),
        "left_anti")
      .groupBy(col(idCol))
      .agg(array_join(
        transform(array_sort(collect_list(
            struct(col("_graft_pos"), col("_graft_tok")))),
          s => s.getField("_graft_tok")), " ").as(textCol))
    // zero-token docs emit no posexplode rows and would vanish from the
    // agg; they have no duplicated span, so they must survive (as "")
    toks.select(col(idCol), size(col("_graft_toks")).as("_graft_n"))
      .join(kept, Seq(idCol), "left")
      .filter(col(textCol).isNotNull || col("_graft_n") === 0)
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol))
  }

  /** one row per (doc, gram start): 0-based `pos` (long) + the n-word gram */
  /** Memorization-exposure score per document (the Carlini et al.
    * "quantifying memorization" risk signal, corpus-side): the share of a
    * document's word n-grams that occur ≥ `k` times corpus-wide — content
    * a model sees k+ times is what extraction attacks recover first, so
    * docs with high `risk_ppm` are the ones a dedup/suppression pass must
    * handle before release. Counts OCCURRENCES (within-doc repeats
    * included), deliberately non-distinct: a boilerplate block repeated
    * 50× inside one doc is exactly as memorizable as one spread over 50
    * docs. Returns (idCol, n_grams, n_risky, risk_ppm) for every doc with
    * ≥ 1 gram.
    *
    * Takes the PERSISTED [[gramStarts]] frame (read under the occurrence
    * count and the per-doc reduction — the `duplicatedSpansFromGrams`
    * convention). One gram exchange with partial agg; the risky-gram set
    * after the floor is small, so AQE broadcasts the probe join.
    */
  def memorizationRisk(grams: DataFrame, idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val risky = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("_graft_occ"))
      .filter(col("_graft_occ") >= k)
      .select(col("gram"))
    val perDoc = grams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val riskyPerDoc = grams.join(risky, Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_risky"))
    perDoc.join(riskyPerDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_risky"), lit(0L)).as("n_risky"),
        TextFunctions.integralDiv(
          coalesce(col("n_risky"), lit(0L)) * 1000000L, col("n_grams"))
          .as("risk_ppm"))
  }

  def gramStarts(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    // spread a poorly-split scan before the CPU-bound explode
    gramStartsFromTokens(
      graft.operators.Parallelism.ensure(
        docs.select(col(idCol), cleanTokens(textCol).as("_graft_toks"))),
      idCol, "_graft_toks", n)

  /** [[gramStarts]] over a pre-tokenized (idCol, toksCol) frame — lets a
    * pipeline that already holds token arrays (the keep-one strip, a
    * persisted [[SubstringDedup.tokenFrame]]) gram-index WITHOUT the
    * rebuild-text-then-retokenize round trip.
    *
    * Gram key: two independently-seeded xxhash64s over the token-slice
    * ARRAY, packed in one struct — the [[SubstringDedup.crossDocSpans]]
    * convention: 16 bytes on every exchange (an 8-word gram string is
    * ~55) and NO per-position string assembly in the hot explode.
    * Consumers only ever compare grams for equality (occurrence counts,
    * dup floors), and the oracles count raw strings — equal modulo
    * 128-bit collisions (~n²/2¹²⁹, md5's league).
    */
  def gramStartsFromTokens(toks: DataFrame, idCol: String, toksCol: String,
      n: Int): DataFrame =
    toks
      .filter(size(col(toksCol)) >= n)
      .select(col(idCol),
        posexplode(transform(
          sequence(lit(0), size(col(toksCol)) - n),
          i => slice(col(toksCol), i + 1, lit(n))))
          .as(Seq("_graft_p", "_graft_gram")))
      .select(col(idCol), col("_graft_p").cast("long").as("pos"),
        struct(
          xxhash64(col("_graft_gram")).as("h1"),
          SubstringDedup.xx64Seeded(col("_graft_gram"),
            0x9E3779B97F4A7C15L).as("h2")).as("gram"))
}
