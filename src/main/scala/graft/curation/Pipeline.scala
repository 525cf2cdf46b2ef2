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
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      cfg: CurationConfig = CurationConfig()): DataFrame = {
    val scored = docs.withColumn("quality",
      TextFunctions.qualityScore(col(textCol)))
    val qual = scored.filter(col("quality") >= cfg.minQuality)
    // exact dedup: min id per content hash survives
    val keep = qual.groupBy(md5(col(textCol)).as("_h"))
      .agg(min(col(idCol)).as(idCol)).select(col(idCol))
    val deduped = qual.join(keep, Seq(idCol), "left_semi")
    // decontaminate against a deterministic held-out benchmark slice
    val bench = Sampling.hashSample(docs, idCol, cfg.benchFraction, cfg.benchSalt)
    val clean = Decontaminate.decontaminated(deduped, bench, idCol, textCol,
      cfg.contaminationNgram)
    Sampling.hashSample(clean, idCol, cfg.sampleFraction, cfg.sampleSalt)
  }
}
