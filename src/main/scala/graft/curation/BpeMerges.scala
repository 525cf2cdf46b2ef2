package graft.curation

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

import graft.text.TextFunctions

/** Distributed BPE merge induction (Sennrich et al. 2016) — learn the first
  * K byte-pair-encoding merge rules from the corpus itself, the standard
  * first step of training a tokenizer over a new pretraining mix.
  *
  * Scale shape — the exact shape of a production BPE trainer:
  *   - the corpus is scanned ONCE, into a (distinct word, frequency) vocab
  *     (Zipf: the vocab is orders of magnitude smaller than the corpus);
  *   - each merge round is one tiny shuffle over the vocab's adjacent
  *     symbol pairs (partial-agg'd weighted counts) plus a 1-row collect of
  *     the argmax pair — K rounds = K small Spark jobs, never re-touching
  *     the raw text;
  *   - merge application is a distributed per-row `replace`, no driver
  *     data path.
  *
  * Merge application uses a double-space symbol encoding that makes ONE
  * LEFT-TO-RIGHT `replace` pass exactly equal to greedy non-overlapping BPE
  * merging: a word's symbols are joined with two spaces and flanked by two
  * spaces (`"  a  b  c  "`), and merging pair (a,b) replaces `" a  b "`
  * with `" ab "`. The pattern consumes one space of each flanking pair and
  * the replacement restores it, so (i) consecutive disjoint occurrences
  * all match in a single pass (a plain single-space join misses every
  * second one — its occurrences share the delimiter the scan consumed) and
  * (ii) overlapping occurrences (`a a a` under (a,a)) are skipped exactly
  * like the reference greedy scan. Both Spark's and DuckDB's `replace` are
  * single-pass left-to-right non-overlapping, so the oracle replays the
  * identical algorithm.
  *
  * Ties on pair count break by (left, right) binary string order —
  * deterministic and engine-portable (symbols are drawn from the corpus +
  * the ASCII `</w>` end-of-word marker).
  */
object BpeMerges {

  private val mergeSchema = StructType(Seq(
    StructField("merge_round", IntegerType, nullable = false),
    StructField("l_sym", StringType, nullable = false),
    StructField("r_sym", StringType, nullable = false),
    StructField("merged", StringType, nullable = false),
    StructField("pair_count", LongType, nullable = false)))

  /** distinct-word frequency table with the initial symbol encoding:
    * chars + `</w>`, double-space joined and flanked
    */
  def vocab(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    words.select(col("word"),
      concat(lit("  "),
        array_join(transform(sequence(lit(1), length(col("word"))), i =>
          substring(col("word"), i, lit(1)).cast("string")), "  "),
        lit("  </w>  ")).as("repr"),
      col("freq"))
  }

  /** Learn the first `rounds` merge rules. Returns one row per learned
    * merge: (merge_round, l_sym, r_sym, merged, pair_count), where
    * `pair_count` is the corpus-weighted frequency of the winning pair at
    * the time it was chosen. Stops early if the vocab runs out of pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val (learned, _, cleanup) = mergeLoop(vocab(docs, textCol), rounds)
    cleanup()
    spark.createDataFrame(
      spark.sparkContext.parallelize(learned, 1), mergeSchema)
  }

  /** Encode the corpus with the merges learned from it: per-document word
    * and BPE-token counts under the final symbol vocabulary — token-budget
    * estimation with the actual tokenizer instead of a regex proxy. The
    * final (word → symbols) vocab joins the exploded corpus words; set
    * `broadcastVocab = false` for corpora whose distinct-word table
    * outgrows a broadcast.
    */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
      rounds: Int, broadcastVocab: Boolean = true): DataFrame =
    encodeCountsBy(docs, idCol, textCol, rounds, broadcastVocab)

  /** Per-group tokenizer fertility under the learned merges: for each value
    * of `groupCol` (language, source, shard), total corpus words, total BPE
    * tokens, and `fertility_ppm` = BPE tokens per word in parts-per-million
    * (exact integer division). A tokenizer trained on a skewed mixture
    * over-segments the under-represented languages — this is the standard
    * per-language fairness audit for a multilingual tokenizer, run with the
    * actual learned merges rather than a proxy.
    */
  def fertilityByGroup(docs: DataFrame, groupCol: String, textCol: String,
      rounds: Int, broadcastVocab: Boolean = true): DataFrame =
    encodeCountsBy(docs, groupCol, textCol, rounds, broadcastVocab)
      .withColumn("fertility_ppm", expr("(bpe_tokens * 1000000) div n_words"))

  /** shared encode pipeline: corpus words joined to the final vocab's
    * symbol counts, aggregated by the named key column
    */
  private def encodeCountsBy(docs: DataFrame, key: String,
      textCol: String, rounds: Int, broadcastVocab: Boolean): DataFrame = {
    val (_, vFinal, cleanup) = mergeLoop(vocab(docs, textCol), rounds)
    // swap the cached full vocab (word, repr, freq) for the smaller
    // (word, n_syms) projection the encode join actually needs, so only
    // that frame stays session-cached (the gate-query persist convention;
    // ScaleBench/tests clear it via clearCache)
    val nSyms = vFinal.select(col("word"),
        size(split(trim(col("repr")), "  ")).cast("long").as("n_syms"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    nSyms.count()
    cleanup()
    val lookup = if (broadcastVocab) broadcast(nSyms) else nSyms
    docs
      .select(col(key), explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .join(lookup, Seq("word"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("bpe_tokens"))
  }

  /** K merge rounds over an initial vocab; returns the learned merges, the
    * PERSISTED final vocab, and a cleanup thunk that unpersists everything
    * still cached (call it after materializing whatever you derive from the
    * final vocab).
    *
    * One Spark job per round: each round's topPair action is what
    * materializes the lazily-persisted vocab (no extra count() jobs), and a
    * round's PARENT vocab is only unpersisted after the round's own cache
    * is live — dropping it earlier would cascade a recompute chain back to
    * the corpus scan.
    */
  private def mergeLoop(v0: DataFrame, rounds: Int)
      : (Seq[Row], DataFrame, () => Unit) = {
    var v = v0.persist(StorageLevel.MEMORY_AND_DISK)
    var parent: DataFrame = null
    val learned = scala.collection.mutable.ArrayBuffer.empty[Row]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      topPair(v) match { // action: v's cache is live past this point
        case Some((a, b, cnt)) =>
          learned += Row(r, a, b, a + b, cnt)
          if (parent != null) parent.unpersist()
          parent = v
          v = v.select(col("word"),
              regexp_replace(col("repr"),
                lit(java.util.regex.Pattern.quote(s" $a  $b ")),
                lit(java.util.regex.Matcher.quoteReplacement(s" $a$b ")))
                .as("repr"),
              col("freq"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        case None => exhausted = true
      }
      r += 1
    }
    val (vv, pp) = (v, parent)
    (learned.toSeq, vv,
      () => { vv.unpersist(); if (pp != null) pp.unpersist() })
  }

  /** corpus-weighted adjacent-pair counts over the current vocab */
  def pairCounts(v: DataFrame): DataFrame = {
    val syms = split(trim(col("repr")), "  ")
    // guard: a fully-merged word is ONE symbol — sequence(0, -1) would
    // descend and element_at(_, 0) would throw
    val pairs = when(size(syms) >= 2,
        transform(sequence(lit(0), size(syms) - 2), i =>
          struct(element_at(syms, i + 1).as("l_sym"),
            element_at(syms, i + 2).as("r_sym"))))
      .otherwise(array().cast("array<struct<l_sym:string,r_sym:string>>"))
    v.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.l_sym").as("l_sym"), col("p.r_sym").as("r_sym"))
      .agg(sum(col("freq")).as("cnt"))
  }

  private def topPair(v: DataFrame): Option[(String, String, Long)] =
    pairCounts(v)
      .orderBy(col("cnt").desc, col("l_sym"), col("r_sym"))
      .limit(1).collect().headOption
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  /** DuckDB replica of [[learnMerges]] for the oracle gate: `rounds`
    * chained CTE stages, each recomputing pair counts, taking the same
    * (cnt DESC, l_sym, r_sym) argmax, and applying the same single-pass
    * replace on the same double-space encoding.
    */
  def oracleSql(rounds: Int): String = {
    val unions = (1 to rounds).map { k =>
      s"""SELECT $k AS merge_round, l_sym, r_sym, l_sym || r_sym AS merged,
         |  cnt AS pair_count FROM t$k""".stripMargin
    }
    s"""WITH ${mergeCtes(rounds)}
       |SELECT CAST(merge_round AS INTEGER) AS merge_round, l_sym, r_sym,
       |  merged, pair_count FROM (
       |${unions.mkString("\nUNION ALL\n")})
       |ORDER BY merge_round""".stripMargin
  }

  /** DuckDB replica of [[encodeTokenCounts]]: the same merge-round chain,
    * then the corpus word stream joined to the final vocab's symbol counts.
    */
  def encodeOracleSql(rounds: Int): String =
    s"""WITH ${mergeCtes(rounds)},
       |nsym AS (SELECT word,
       |    CAST(len(regexp_split_to_array(trim(repr), '  ')) AS BIGINT) AS n_syms
       |  FROM w$rounds),
       |tok AS (SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
       |  FROM documents)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_syms) AS BIGINT) AS bpe_tokens
       |FROM tok JOIN nsym USING (word)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** DuckDB replica of [[fertilityByGroup]]: the encode pipeline aggregated
    * by `groupCol` with the exact-integer ppm division.
    */
  def fertilityOracleSql(rounds: Int, groupCol: String): String =
    s"""WITH ${mergeCtes(rounds)},
       |nsym AS (SELECT word,
       |    CAST(len(regexp_split_to_array(trim(repr), '  ')) AS BIGINT) AS n_syms
       |  FROM w$rounds),
       |tok AS (SELECT $groupCol, unnest(list_filter(
       |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS word
       |  FROM documents)
       |SELECT $groupCol, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_syms) AS BIGINT) AS bpe_tokens,
       |  (CAST(sum(n_syms) AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
       |    AS fertility_ppm
       |FROM tok JOIN nsym USING (word)
       |GROUP BY $groupCol ORDER BY $groupCol""".stripMargin

  /** w0..wK / p_k / t_k CTE chain shared by both oracles. An exhausted
    * vocab (t_k empty before round K) must leave w_k = w_{k-1}, matching
    * the Scala early stop — hence the LEFT JOIN + CASE, never a CROSS JOIN
    * (which would collapse every later w_k, and the encode oracle with it,
    * to zero rows).
    */
  private def mergeCtes(rounds: Int): String = {
    val w0 =
      """w0 AS (
        |  SELECT word, '  ' || array_to_string(list_transform(range(1, len(word)+1),
        |      i -> substr(word, CAST(i AS INT), 1)), '  ') || '  </w>  ' AS repr,
        |    freq
        |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
        |      SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |        x -> x <> '')) AS word FROM documents)
        |    GROUP BY word))""".stripMargin
    val stages = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT u.l AS l_sym, u.r AS r_sym, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_transform(range(1, len(l)),
         |      i -> {'l': l[CAST(i AS INT)], 'r': l[CAST(i+1 AS INT)]})) AS u
         |    FROM (SELECT freq, regexp_split_to_array(trim(repr), '  ') AS l
         |      FROM w${k - 1}))
         |  GROUP BY u.l, u.r),
         |t$k AS (SELECT l_sym, r_sym, cnt FROM p$k
         |  ORDER BY cnt DESC, l_sym, r_sym LIMIT 1),
         |w$k AS (SELECT word,
         |    CASE WHEN l_sym IS NULL THEN repr
         |      ELSE replace(repr, ' ' || l_sym || '  ' || r_sym || ' ',
         |        ' ' || l_sym || r_sym || ' ') END AS repr, freq
         |  FROM w${k - 1} LEFT JOIN t$k ON true)""".stripMargin
    }
    s"""$w0,
       |${stages.mkString(",\n")}""".stripMargin
  }
}
