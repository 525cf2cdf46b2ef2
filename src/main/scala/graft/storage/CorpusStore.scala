package graft.storage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.{Normalize, SubstringDedup}

/** The training-data pipeline's terminal step: run the curation front half
  * (normalized exact dedup → Lee-et-al keep-one substring strip) and COMMIT
  * the deduplicated corpus through [[Catalog]]'s snapshot protocol, so the
  * pipeline ends in a versioned, partition-pruned TABLE rather than a lazy
  * frame (r12 verdict item 7). The write path is the S11 MERGE pattern's
  * partitioned commit (reference mod-reservoir Storage.java:251-264 analog):
  * one Spark write job, one manifest, one atomic `_LATEST` flip — concurrent
  * readers always see a complete snapshot, and a reader pinning a version
  * keeps it across pagination.
  *
  * Scale shape: the strip is [[SubstringDedup]]'s shape unchanged (one
  * 8-byte gram-hash exchange + bounded joins against one persisted token
  * frame); the commit adds a single partitioned write with NO extra
  * shuffle beyond the write job's own partitioning, and `touched` is the
  * bounded per-source list (the Reservoir.ingest convention — source count
  * is config-bounded, never corpus-sized).
  */
object CorpusStore {

  /** The stored corpus frame: (idCol, sourceCol, text, n_tokens_before,
    * n_tokens_after, n_spans_removed) — normalized exact dedup keeps the
    * min-id doc per normalized-text hash, then cross-document duplicated
    * substrings (≥ `minWords` tokens, ≥ `minDocs` distinct docs) are
    * stripped keep-one, leaving each cluster's canonical first occurrence
    * in place. A post-store re-run of [[SubstringDedup.crossDocSpans]]
    * finds nothing (the Lee et al. invariant, pinned by CorpusStoreSpec).
    */
  def strippedCorpus(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, minWords: Int = 50, minDocs: Int = 2): DataFrame = {
    val base = docs.select(col(idCol), col(sourceCol), col(textCol),
      md5(encode(Normalize.normalizeText(col(textCol)), "UTF-8"))
        .as("_graft_grp"))
    val canon = base.groupBy(col("_graft_grp"))
      .agg(min(col(idCol)).as("_graft_canon"))
    val kept = base.join(canon, "_graft_grp")
      .filter(col(idCol) === col("_graft_canon"))
      .select(col(idCol), col(sourceCol), col(textCol))
    val toks = SubstringDedup.tokenFrame(kept, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = SubstringDedup.crossDocSpans(toks, idCol, minWords, minDocs)
    val verdicts = SubstringDedup.dedupVerdicts(spans, idCol)
    SubstringDedup.keepOneStripped(toks, verdicts, idCol)
      .join(kept.select(col(idCol), col(sourceCol)), Seq(idCol))
      .select(col(idCol), col(sourceCol), col("text"),
        col("n_tokens_before"), col("n_tokens_after"),
        col("n_spans_removed"))
  }

  /** Dedup `docs` with [[strippedCorpus]] and commit the result as the next
    * version of `table`, partitioned by `sourceCol` (only touched source
    * partitions are written; a re-run with new data for one source leaves
    * the others' files untouched). Returns the committed version.
    */
  def writeDeduped(cat: Catalog, table: String, docs: DataFrame,
      idCol: String, textCol: String, sourceCol: String,
      minWords: Int = 50, minDocs: Int = 2): Long = {
    val out = strippedCorpus(docs, idCol, textCol, sourceCol, minWords,
      minDocs)
    // bounded: one row per SOURCE (config-scale), the Reservoir.ingest
    // touched-partition convention — never a corpus-sized collect
    val touched = out.select(col(sourceCol)).distinct()
      .collect().map(_.getString(0)).toSeq
    cat.overwritePartitions(table, out, sourceCol, touched)
  }
}
