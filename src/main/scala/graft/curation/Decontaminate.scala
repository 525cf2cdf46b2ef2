package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Benchmark decontamination: flag (or drop) training documents that share
  * word n-grams with a held-out benchmark set — the standard guard against
  * test-set leakage in pretraining corpora.
  *
  * Scale shape: the benchmark side is small by construction (an eval suite,
  * not the corpus), so its distinct gram set is broadcast and the corpus side
  * streams through a broadcast hash join — the 100 TB corpus is never
  * shuffled. Corpus grams explode ~`tokens` rows per document but are
  * filtered by the join before any exchange; the only shuffle is the final
  * per-document hit count, keyed by the document id.
  */
object Decontaminate {

  /** Distinct word n-grams per document, exploded to (id, gram) rows.
    * Token array is bound to an attribute before the gram HOF (outer
    * expressions re-evaluate inside lambdas otherwise).
    */
  private def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("t"))
      .select(col(idCol),
        explode(array_distinct(QualitySignals.ngrams(col("t"), n))).as("gram"))

  /** Corpus documents (excluding the benchmark itself) that share at least
    * one n-gram with any benchmark document, with their distinct-gram hit
    * count. `bench` needs only `idCol` + `textCol`.
    */
  def contaminationHits(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchIds = bench.select(col(idCol)).distinct()
    val benchGrams = docGrams(bench, idCol, textCol, n)
      .select(col("gram")).distinct()
    docGrams(corpus, idCol, textCol, n)
      .join(broadcast(benchIds), Seq(idCol), "left_anti")
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol).agg(count(lit(1)).as("n_hit_grams"))
  }

  /** Fuzzy passage-level contamination via winnowing fingerprints
    * ([[graft.dedup.Winnowing]]): where [[contaminationHits]] needs a whole
    * word n-gram to match verbatim, the winnowed fingerprint set is
    * guaranteed to fire on ANY shared character substring of length
    * ≥ k + w − 1 — the "quote was lightly reworded / re-tokenized"
    * leakage that exact n-gram screens miss.
    *
    * Per corpus document (bench members excluded by the caller's split):
    * `n_fp` distinct fingerprints, `n_shared` of them that also occur
    * anywhere in the benchmark, and `shared_ppm` = parts-per-million
    * shared (exact integer division — engine-portable, no floats).
    *
    * Scale shape: mirrors the n-gram screen — the benchmark fingerprint
    * set is benchmark-sized, so it broadcasts; corpus fingerprints are a
    * per-row kernel pipeline ([[graft.expressions.WinnowExpr]]) and the
    * only corpus shuffle is the final per-document count. The 100 TB
    * corpus is never joined shuffle-to-shuffle.
    */
  def winnowContamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 5, w: Int = 4): DataFrame = {
    import graft.dedup.Winnowing
    val benchFps = Winnowing.fingerprints(bench, idCol, textCol, k, w)
      .select(col("fingerprint")).distinct()
      .withColumn("_graft_hit", lit(1L))
    Winnowing.fingerprints(corpus, idCol, textCol, k, w)
      .join(broadcast(benchFps), Seq("fingerprint"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_fp"),
        sum(coalesce(col("_graft_hit"), lit(0L))).as("n_shared"))
      .withColumn("shared_ppm", expr("(n_shared * 1000000) div n_fp"))
  }

  /** Bloom-filter contamination screen — the fixed-memory scale path for
    * [[contaminationHits]]: instead of broadcasting the benchmark's full
    * distinct-gram set (strings), broadcast only the SET BIT POSITIONS of
    * an `mBits`-bit Bloom filter with `kHashes` salted-md5 hashes
    * ([[graft.text.TextFunctions.hashMod]]). A corpus gram is flagged iff
    * all k of its positions are set — no false negatives ever (every true
    * hit flags), false positives at the classic (1 − e^(−kn/m))^k rate.
    * The audit columns make the trade explicit: per flagged document the
    * Bloom hit count AND the exact hit count over the same grams
    * (`fp_grams` = collision-only flags), so a deployment can size m
    * before trusting Bloom-only screens at 100 TB.
    *
    * Scale shape: the corpus side never shuffles — each of the k probe
    * positions is its own broadcast inner join (a gram survives only by
    * matching ALL k), so the corpus stream thins at every join; the exact
    * check joins the (tiny) Bloom survivors against the benchmark gram
    * set; the only exchange is the per-document count of surviving grams.
    * The position set is ≤ min(mBits, benchGrams·k) longs regardless of
    * benchmark string sizes — the reason this beats the exact broadcast
    * when the benchmark is large.
    */
  def bloomContamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, mBits: Int = 1 << 20,
      kHashes: Int = 3): DataFrame = {
    require(mBits >= 2, s"mBits must be >= 2, got $mBits")
    require(kHashes >= 1 && kHashes <= 16,
      s"kHashes must be in [1,16], got $kHashes")
    val benchIds = bench.select(col(idCol)).distinct()
    val benchGrams = docGrams(bench, idCol, textCol, n)
      .select(col("gram")).distinct()
    val setBits = (0 until kHashes).map(j =>
        benchGrams.select(
          graft.text.TextFunctions.hashMod(col("gram"), s"bf$j", mBits)
            .as("pos")))
      .reduce(_ unionAll _).distinct()
    val probed = (0 until kHashes).foldLeft(
        docGrams(corpus, idCol, textCol, n)
          .join(broadcast(benchIds), Seq(idCol), "left_anti")) {
      case (df, j) =>
        df.withColumn(s"_graft_p$j",
            graft.text.TextFunctions.hashMod(col("gram"), s"bf$j", mBits))
          .join(broadcast(setBits.withColumnRenamed("pos", s"_graft_p$j")),
            Seq(s"_graft_p$j"))
    }
    probed
      .join(broadcast(benchGrams.withColumn("_graft_exact", lit(1L))),
        Seq("gram"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("bloom_grams"),
        sum(coalesce(col("_graft_exact"), lit(0L))).as("exact_grams"))
      .withColumn("fp_grams", col("bloom_grams") - col("exact_grams"))
  }

  /** The clean corpus: documents with zero benchmark n-gram overlap (and not
    * benchmark members themselves). Anti-join against the flagged set — the
    * corpus passes through with its full schema intact.
    *
    * `gramSource` optionally computes the contamination grams from a
    * DIFFERENT (superset) frame than the one being filtered — e.g. the
    * pre-dedup rows, so an expensive dedup subplan is not re-evaluated
    * under the gram branch (Pipeline.curate). Flagged ids not present in
    * `corpus` anti-join away harmlessly.
    */
  def decontaminated(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int,
      gramSource: Option[DataFrame] = None): DataFrame = {
    // dirty is bounded by the benchmark-overlap count (same scale class as
    // the other broadcast sides) — without the hint a large overlap would
    // tip the anti-join into a full-corpus sort-merge shuffle
    val dirty = contaminationHits(gramSource.getOrElse(corpus), bench, idCol,
        textCol, n)
      .select(col(idCol))
    corpus
      .join(broadcast(bench.select(col(idCol)).distinct()), Seq(idCol), "left_anti")
      .join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
