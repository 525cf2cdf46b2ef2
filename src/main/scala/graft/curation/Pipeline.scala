package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sampling.Sampling
import graft.text.TextFunctions

/** End-to-end corpus curation: the standard pretraining prep chain
  * (quality-filter → exact-dedup → decontaminate → sample) as ONE composed
  * DataFrame — each stage is an already-verified operator, and the whole
  * chain stays lazy so Catalyst plans it as a single job (filters merge,
  * projections prune through every stage).
  *
  * Scale shape: quality is per-row scalar work; exact dedup is one
  * hash-keyed aggregate + semi-join; decontamination joins against a
  * broadcast benchmark gram set; sampling is a per-row filter. Nothing
  * shuffles the corpus more than the dedup aggregate.
  */
object Pipeline {

  final case class CurationConfig(
      minQuality: Double = 0.5,
      benchFraction: Double = 0.05,
      benchSalt: String = "dc",
      contaminationNgram: Int = 4,
      sampleFraction: Double = 0.5,
      sampleSalt: String = "cur")

  /** documents(idCol, textCol, ...) → the curated subset with its `quality`
    * score attached. Keeps the min-id representative of each exact-duplicate
    * group, drops benchmark members and any document sharing an n-gram with
    * the benchmark, then hash-samples the survivors.
    *
    * Plan shape (sized for one pass over a 100 TB corpus): the dedup is ONE
    * `min_by(struct)` aggregate — a single corpus shuffle, replacing the
    * agg + corpus-wide semi-join formulation that shuffled twice — and the
    * contamination grams are computed from the PRE-dedup rows, so the dedup
    * shuffle never re-runs under the gram branch. Pre-dedup contamination
    * is provably the same output: exact duplicates have identical grams, so
    * a kept representative is flagged iff any of its copies would be. The
    * text column is read under three branches (dedup aggregate, corpus gram
    * explode, benchmark grams) plus two id-only pruned scans for the
    * benchmark anti-joins; at petabyte scale materialize the (stable)
    * benchmark slice upstream and pass it to [[Decontaminate]] directly to
    * drop the text reads to two. (r17 A/B note: see the dedup comment
    * below — the decide-small/attach-by-id variant was measured and kept
    * on file for the corpus scale where the dedup exchange dominates.)
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: CurationConfig = CurationConfig()): DataFrame = {
    val scored = docs.withColumn("quality",
      TextFunctions.qualityScore(col(textCol)))
    val qual = scored.filter(col("quality") >= cfg.minQuality)
    // exact dedup: the min-id row per content hash survives, one aggregate.
    // r17 A/B (interleaved, 3 rounds, sf0.1): the narrow min-id agg +
    // id join-back variant — which column-prunes text off every exchange —
    // measured 1.35-1.54 s vs 0.76-1.18 s for this min_by shape (the two
    // extra stages cost more than the SortAggregate at bench scale), so
    // min_by stays; at a scale where the dedup exchange dominates, the
    // decide-small/attach-by-id variant (plans/r17/ab_round1_queries.txt)
    // is the one to revisit.
    val deduped = qual
      .groupBy(md5(col(textCol)).as("_h"))
      .agg(min_by(struct(qual.columns.map(col).toSeq: _*), col(idCol)).as("_r"))
      .select(col("_r.*"))
    // decontaminate against a deterministic held-out benchmark slice,
    // computing the grams from the cheap pre-dedup rows (see the
    // decontaminated scaladoc — the dedup shuffle is not re-evaluated)
    val bench = Sampling.hashSample(docs, idCol, cfg.benchFraction, cfg.benchSalt)
    val clean = Decontaminate.decontaminated(deduped, bench, idCol, textCol,
      cfg.contaminationNgram, gramSource = Some(qual))
    Sampling.hashSample(clean, idCol, cfg.sampleFraction, cfg.sampleSalt)
  }
}
