package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines.
  *
  * Everything here is built from Spark SQL built-ins (codegen'd, no UDFs,
  * no shuffles) so whole-stage codegen keeps the hot path vectorized at
  * 100 TB — per-document work is embarrassingly parallel.
  */
object TextFunctions {

  /** Whitespace class shared with the DuckDB oracles: explicit characters,
    * because Java's `\s` includes vertical tab (\x0B) where RE2's does not —
    * an implicit `\s+` on both sides diverges on exotic whitespace.
    */
  val WhitespaceRegex: String = "[ \\t\\n\\r\\f]+"

  /** whitespace tokenization */
  def tokens(text: Column): Column = split(text, WhitespaceRegex)

  /** distinct word n-gram shingles, the dedup unit (empty if < n tokens) */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*))))
      .otherwise(array().cast("array<string>"))

  /** all word n-grams in document order, duplicates INCLUDED (the
    * type-token-ratio / diversity unit; [[shingles]] distincts for dedup)
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** token count */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pretokenizer pattern ("BPE-ish"): contractions,
    * space-prefixed letter runs, digit runs, punctuation runs — the
    * standard proxy for LLM token budgets when the real tokenizer is an
    * external artifact. Restricted to the RE2-compatible subset (no
    * lookahead) so SQL oracles reproduce the count exactly.
    */
  val BpeishRegex: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \\t\\n\\r\\f]+"

  /** number of BPE-ish pretokens in `text` (codegen'd regexp_count) */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishRegex))

  /** sentence count for readability scoring: runs of terminal punctuation,
    * floored at 1 so fragment-only documents don't divide by zero */
  def sentenceCount(text: Column): Column =
    greatest(regexp_count(text, lit("[.!?]+")), lit(1))

  /** syllable proxy for readability scoring: vowel-group runs across the
    * text (= per-word vowel groups summed); the standard cheap stand-in
    * where a hyphenation dictionary would be overkill */
  def syllableProxyCount(text: Column): Column =
    regexp_count(text, lit("[aeiouyAEIOUY]+"))

  /** Flesch-Kincaid grade level in exact integer milli-grades:
    * 0.39·(W/S) + 11.8·(Y/W) − 15.59, cross-multiplied to
    * (390·W² + 11800·Y·S − 15590·S·W) div (S·W) so no float ever appears.
    * W floored at 1 like S; pure per-row codegen'd regexp counting.
    */
  def fleschKincaidMilli(text: Column): Column = {
    val w = greatest(tokenCount(text), lit(1)).cast("long")
    val s = sentenceCount(text).cast("long")
    val y = syllableProxyCount(text).cast("long")
    integralDiv(
      lit(390L) * w * w + lit(11800L) * y * s - lit(15590L) * s * w,
      s * w)
  }

  /** `a div b` as a composable Column (truncating integral division — the
    * repo's cross-engine convention, matching DuckDB `//`) */
  def integralDiv(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftSqlBridge
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** type-token ratio (lexical diversity) */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks)

  /** mean token length */
  def avgTokenLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0),
      (acc, x) => acc + x).cast("double") / size(toks)

  /** fraction of punctuation characters */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^\\p{Punct}]", "")).cast("double") / length(text)

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** fraction of tokens that are stopwords */
  def stopwordRatio(toks: Column, stops: Seq[String] = DefaultStopwords): Column =
    size(filter(toks, t => t.isin(stops.map(x => x: Any): _*)))
      .cast("double") / size(toks)

  /** Composite quality score in [0,1]: favors mid-length docs with diverse
    * vocabulary and a sane stopword rate (LLM-corpus filtering heuristic).
    */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val lenScore = least(size(t).cast("double") / 100.0, lit(1.0))
    val diversity = typeTokenRatio(t)
    val stop = stopwordRatio(t)
    (lenScore * 0.4 + diversity * 0.4 + least(stop * 5.0, lit(1.0)) * 0.2)
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des", "en", "du", "que"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "den", "mit", "ein", "zu"))

  /** Language-ID heuristic: CJK-character ratio decides zh; otherwise the
    * stopword profile with the most hits wins (ties: profile order).
    * Scalar column logic only — scales linearly, no shuffle.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))
    // score struct array sorted desc by (hits, reverse profile priority)
    val scored = LangProfiles.zipWithIndex.map { case ((lang, stops), i) =>
      struct(
        size(filter(toks, t => t.isin(stops.map(x => x: Any): _*))).as("hits"),
        lit(LangProfiles.size - i).as("prio"),
        lit(lang).as("lang"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0).getField("lang")
    when(cjk * 3 > length(text), lit("zh")).otherwise(best)
  }

  /** Canonical document fingerprint: hash of the sorted distinct token set
    * (whitespace/order/duplication-insensitive).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Salted-md5 bucket in [0, m): the independent hash family behind the
    * count-min sketch and Bloom-filter operators. The draw is the md5's
    * first 8 hex digits as an unsigned 32-bit int (the same prefix every
    * sampler here uses), reduced mod m — engine-portable: the DuckDB
    * oracles reproduce it with the nibble-parse
    * `list_sum(list_transform(range(1,9), i -> (strpos('0123456789abcdef',
    * substr(md5(s), i, 1)) - 1) << ((8-i)*4))) % m`.
    */
  def hashMod(value: Column, salt: String, m: Int): Column =
    pmod(conv(substring(md5(concat(lit(salt + ":"), value.cast("string"))),
      1, 8), 16, 10).cast("long"), lit(m.toLong))
}
