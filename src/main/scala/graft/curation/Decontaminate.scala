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
