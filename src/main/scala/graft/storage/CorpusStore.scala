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
    // caching discipline (the r14 composition finding): Spark re-runs
    // md5(normalize(text)) over BOTH join sides on EVERY reference to the
    // dedup frame — persist the slim (id, source, grp) hash frame so
    // normalization runs EXACTLY once (canon agg + probe both read the
    // cache), persist the kept-id projection, and rebuild the kept text
    // via an id semi-join, however many consumers the strip chain fans
    // into
    val base = docs.select(col(idCol), col(sourceCol),
      md5(encode(Normalize.normalizeText(col(textCol)), "UTF-8"))
        .as("_graft_grp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val canon = base.groupBy(col("_graft_grp"))
      .agg(min(col(idCol)).as("_graft_canon"))
    val keptIds = base.join(canon, "_graft_grp")
      .filter(col(idCol) === col("_graft_canon"))
      .select(col(idCol), col(sourceCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = docs.select(col(idCol), col(textCol))
      .join(keptIds.select(col(idCol)), Seq(idCol))
    val toks = SubstringDedup.tokenFrame(kept, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val spans = SubstringDedup.crossDocSpans(toks, idCol, minWords, minDocs)
    val verdicts = SubstringDedup.dedupVerdicts(spans, idCol)
    SubstringDedup.keepOneStripped(toks, verdicts, idCol)
      .join(keptIds, Seq(idCol))
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
    // the stripped frame is consumed THREE times (touched-source collect,
    // staging write, and nothing else reads it) — persist so the strip
    // chain runs once, not once per consumer (the r14 composition finding)
    val out = strippedCorpus(docs, idCol, textCol, sourceCol, minWords,
      minDocs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded: one row per SOURCE (config-scale), the Reservoir.ingest
      // touched-partition convention — never a corpus-sized collect
      val touched = out.select(col(sourceCol)).distinct()
        .collect().map(_.getString(0)).toSeq
      cat.overwritePartitions(table, out, sourceCol, touched)
    } finally { out.unpersist(); () }
  }

  /** the stored-corpus schema ([[strippedCorpus]]'s output) */
  def storedSchema(idCol: String, sourceCol: String,
      textCol: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, LongType),
      StructField(sourceCol, StringType), StructField(textCol, StringType),
      StructField("n_tokens_before", LongType),
      StructField("n_tokens_after", LongType),
      StructField("n_spans_removed", LongType)))
  }

  /** Incremental ingest commit — one streaming micro-batch (or one batch
    * increment) landed as the next snapshot version of `table`:
    *
    *  1. already-committed batch ids SKIP (the `<table>__stream_state`
    *    high-water mark): an at-least-once foreachBatch replay after
    *    restart commits each batch id at most once, so snapshot versions
    *    stay monotone with NO duplicate content commits;
    *  2. stored rows of the batch's touched sources merge with the batch
    *    (batch rows override same-id stored rows — latest-version-wins,
    *    the T6 upsert semantics), untouched source partitions keep their
    *    files;
    *  3. the merged working set re-runs the SAME normalize-dedup +
    *    keep-one strip the batch path uses, so a new document duplicating
    *    stored content is stripped against it (the stored copy, with the
    *    smaller id, stays canonical).
    *
    * Returns the committed version, or the current version when the batch
    * was a replay / empty. Contracts: the keep-one strip applies within
    * the commit's WORKING SET (batch + stored rows of touched sources) —
    * cross-source dups against untouched sources are caught by the next
    * full [[writeDeduped]]; stored text is already stripped, so the audit
    * counters (`n_tokens_before` &c.) describe this commit's increment,
    * not the document's original form. The state write lands after the
    * data commit: a crash between the two re-commits that batch id once
    * (idempotent content, one extra version) — never loses it.
    */
  def ingestBatch(cat: Catalog, table: String, batch: DataFrame,
      batchId: Long, idCol: String, textCol: String, sourceCol: String,
      minWords: Int = 50, minDocs: Int = 2): Long = {
    val stateTable = s"${table}__stream_state"
    val spark = batch.sparkSession
    import org.apache.spark.sql.types._
    val stateSchema = StructType(Seq(StructField("batch_id", LongType)))
    val committed = cat.readOr(stateTable, stateSchema)
      .agg(max(col("batch_id"))).head()
    val highWater = if (committed.isNullAt(0)) Long.MinValue
      else committed.getLong(0)
    if (batchId <= highWater || batch.isEmpty) return cat.version(table)
    val incoming = batch.select(col(idCol).cast("long").as(idCol),
      col(sourceCol).cast("string").as(sourceCol),
      col(textCol).cast("string").as(textCol))
      .dropDuplicates(idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded: one row per touched SOURCE (config-scale)
      val touched = incoming.select(col(sourceCol)).distinct()
        .collect().map(_.getString(0)).toSeq
      val stored = cat.readPartitionsOr(table,
          storedSchema(idCol, sourceCol, textCol), touched)
        .select(col(idCol), col(sourceCol), col(textCol))
        .join(incoming.select(col(idCol)), Seq(idCol), "left_anti")
      val out = strippedCorpus(stored.unionByName(incoming), idCol,
        textCol, sourceCol, minWords, minDocs)
      val v = cat.overwritePartitions(table, out, sourceCol, touched)
      import spark.implicits._
      cat.write(stateTable, Seq(batchId).toDF("batch_id"))
      v
    } finally { incoming.unpersist(); () }
  }
}
