package graft.storage

import org.apache.spark.sql.{Column, DataFrame}
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
      sourceCol: String, minWords: Int = 50, minDocs: Int = 2): DataFrame =
    strippedCorpusWithCleanup(docs, idCol, textCol, sourceCol, minWords,
      minDocs)._1

  /** [[strippedCorpus]] plus a cleanup thunk releasing its internal
    * persisted frames (the slim hash frame, kept-id projection, and token
    * frame) — call it after the LAST action consuming the result, as
    * [[writeDeduped]]/[[ingestBatch]] do in their `finally`. The plain
    * [[strippedCorpus]] leaves them pinned for the session (a lazy result
    * can't know when its consumer is done); library callers composing it
    * directly should use this variant or `spark.catalog.clearCache()`.
    */
  def strippedCorpusWithCleanup(docs: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minWords: Int = 50,
      minDocs: Int = 2): (DataFrame, () => Unit) = {
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
    val out = SubstringDedup.keepOneStripped(toks, verdicts, idCol)
      .join(keptIds, Seq(idCol))
      .select(col(idCol), col(sourceCol), col("text").as(textCol),
        col("n_tokens_before"), col("n_tokens_after"),
        col("n_spans_removed"))
    (out, () => { base.unpersist(); keptIds.unpersist(); toks.unpersist(); () })
  }

  /** Dedup `docs` with [[strippedCorpus]] and commit the result as the next
    * version of `table`, partitioned by `sourceCol` (only touched source
    * partitions are written; a re-run with new data for one source leaves
    * the others' files untouched). The two dedup index tables' touched
    * partitions rebuild from the committed rows (see the index note
    * below), so subsequent [[ingestBatch]] commits can probe the store.
    * Returns the committed version.
    */
  def writeDeduped(cat: Catalog, table: String, docs: DataFrame,
      idCol: String, textCol: String, sourceCol: String,
      minWords: Int = 50, minDocs: Int = 2, winnowW: Int = 8,
      buckets: Int = 16): Long = {
    // the stripped frame is consumed THREE times (touched-source collect,
    // staging write, and nothing else reads it) — persist so the strip
    // chain runs once, not once per consumer (the r14 composition finding)
    val (strippedF, cleanup) = strippedCorpusWithCleanup(docs, idCol,
      textCol, sourceCol, minWords, minDocs)
    val out = strippedF
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // verify the index pins BEFORE the data commit (mirrors
      // ingestBatch's fail-fast, r15 ADVICE): a mismatched pin otherwise
      // threw only after the data version advanced with the new strip
      // while the index kept the old pin and entries
      requireIndexReady(cat, table, minWords, winnowW, buckets)
      // bounded: one row per SOURCE (config-scale), the Reservoir.ingest
      // touched-partition convention — never a corpus-sized collect
      val touched = out.select(col(sourceCol)).distinct()
        .collect().map(_.getString(0)).toSeq
      val v = cat.overwritePartitions(table, out, sourceCol, touched)
      commitIndexes(cat, table, out, idCol, textCol, sourceCol, minWords,
        winnowW, buckets, touched)
      v
    } finally { out.unpersist(); cleanup(); () }
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

  // ---------------- store-wide dedup indexes ----------------
  // ONE slim group table (`<table>__idx`) rides alongside every corpus
  // table, holding two sub-tables committed ATOMICALLY (one manifest, one
  // `_LATEST` flip — the Catalog group-commit machinery), each partitioned
  // by (bucket, source) — the source dimension keeps rewrites
  // commit-granular (a commit that rewrites source S's data rewrites S's
  // index partitions and no others), the bucket dimension makes the
  // per-batch PROBE prunable (see below):
  //   docs   (id, source)          — one row per stored doc,
  //       bucketed by pmod(id, b)
  //   grams  (h1, h2, id, source)  — one row per WINNOW-SELECTED
  //       (minWords-gram, doc) — SubstringDedup.winnowedGramKeys, the
  //       same 16-byte key definition queries and probes share —
  //       bucketed by pmod(h1, b), sorted by h1 within each bucket's
  //       files (row groups cover narrow h1 ranges)
  // They are what lets ingestBatch enforce store-WIDE semantics while
  // touching only the batch's partitions: the docs index finds a doc_id
  // re-ingested under a different source (its old partition must drop the
  // old copy — same-id upsert across partitions), and the gram index finds
  // a batch passage duplicating an UNTOUCHED source's text (the reference's
  // indexed cluster_values probe, Storage.java:370-400).
  //
  // Probe cost at scale (the r15 "one thing between ingestBatch and
  // 100 TB"): winnowing cuts index rows AND probe keys to ~2/(w+1) of
  // gram positions, and the probe reads ONLY the index buckets named by
  // the batch's own key set — with the bucket count `b` sized to the
  // store (fixed target bucket bytes; rebuildIndexes re-buckets as the
  // store grows, like a B-tree splitting), per-batch probe I/O is
  // O(batch keys × bucket size), the B-tree-leaf bound, instead of
  // O(store index). Detection floor: shared spans ≥ minWords + w − 1
  // words are ALWAYS caught (the winnowing guarantee, documented at
  // winnowedGramKeys); shorter shared spans heal at the next full
  // writeDeduped. (minWords, w, b) are pinned per table in the conf sub.
  //
  // Staleness discipline: the index group commits AFTER the data table and
  // BEFORE the stream-state high-water mark. A crash between data and index
  // commits re-runs the whole batch on replay (the state mark is last), so
  // missing index entries heal; EXTRA/stale gram entries can never
  // over-strip because hits are confirmed against the hit docs' CURRENT
  // stored text (the context re-gram below) before any word is removed.
  // Both sub-tables share the commit, so they can never drift from each
  // other — only (within the one crash window) from the data.

  private def indexTable(table: String) = s"${table}__idx"

  /** index partition value: zero-padded bucket + '#' + source. Bucket
    * digits never contain '#', so the FIRST '#' splits unambiguously even
    * when the source value itself carries one.
    */
  private def idxPart(bucket: Column, source: Column): Column =
    concat(format_string("%05d", bucket), lit("#"), source)

  private def partBucket(p: String): Long = p.takeWhile(_ != '#').toLong

  private def partSource(p: String): String = p.drop(p.indexOf('#') + 1)

  /** one sub-table's partition values in a pinned group manifest */
  private def subParts(manifest: Map[String, Long],
      sub: String): Seq[String] = {
    val prefix = s"$sub/"
    manifest.keysIterator.filter(_.startsWith(prefix))
      .map(_.stripPrefix(prefix)).toSeq
  }

  /** the docs-index schema: one (id, source) row per stored document */
  def docsIndexSchema(idCol: String, sourceCol: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, LongType),
      StructField(sourceCol, StringType)))
  }

  /** the gram-index schema: one (h1, h2, id, source) row per
    * winnow-selected distinct (gram, doc) — h1/h2 are
    * [[SubstringDedup.gramKeys]]'s two seeded xxhash64s, sampled by
    * [[SubstringDedup.winnowedGramKeys]] at the pinned window
    */
  def gramIndexSchema(idCol: String, sourceCol: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("h1", LongType), StructField("h2", LongType),
      StructField(idCol, LongType), StructField(sourceCol, StringType)))
  }

  private def confSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("min_words", LongType),
      StructField("w", LongType), StructField("b", LongType),
      StructField("p", StringType)))
  }

  /** The index shape the group was built at — every commit of a table
    * must use the SAME (minWords, winnowW, buckets): a probe at a
    * different gram length or winnow window slices/samples different
    * token windows and silently finds nothing, and a different bucket
    * count prunes the wrong partitions. The triple is pinned in a
    * one-row `conf` sub-table written with the FIRST index commit;
    * later commits verify against it instead of trusting the caller.
    * A conf row missing the (w, b) columns is a pre-winnowing (r15)
    * index — refused with a pointer at [[rebuildIndexes]].
    */
  private def requireConf(cat: Catalog, table: String,
      manifest: Map[String, Long], minWords: Int, winnowW: Int,
      buckets: Int): Boolean = {
    val present = manifest.contains("conf/0")
    if (present) {
      val row = cat.readGroupOr(indexTable(table), manifest, "conf",
        confSchema).head()
      require(!row.isNullAt(1) && !row.isNullAt(2),
        s"corpus table '$table' carries a pre-winnowing dedup index " +
          "(no (w, b) pins in its conf sub-table); run rebuildIndexes " +
          "to migrate it to the winnowed bucketed layout")
      def pin(i: Int, name: String, got: Long): Unit =
        require(row.getLong(i) == got,
          s"corpus table '$table' has its dedup index built at $name=" +
            s"${row.getLong(i)} but this commit passed $name=$got; all " +
            "commits of a table must use one index shape " +
            "(rebuildIndexes migrates)")
      pin(0, "minWords", minWords.toLong)
      pin(1, "winnowW", winnowW.toLong)
      pin(2, "buckets", buckets.toLong)
    }
    present
  }

  /** The fail-fast every committer runs BEFORE its data commit: the pin
    * check above, plus the half-indexed-store guard (r15 ADVICE): a data
    * table committed before the index feature existed has an EMPTY index
    * manifest, so a silent probe would no-op, commitIndexes would index
    * only the batch's touched sources, and every LATER batch would pass
    * the pin check while store-wide dedup silently skipped all legacy
    * sources — the exact guarantee this layer documents. Committed data
    * with no conf pin must go through [[rebuildIndexes]] first.
    */
  private def requireIndexReady(cat: Catalog, table: String, minWords: Int,
      winnowW: Int, buckets: Int): Unit = {
    val confPresent = requireConf(cat, table,
      cat.snapshot(indexTable(table))._2, minWords, winnowW, buckets)
    require(confPresent || cat.version(table) == 0L,
      s"corpus table '$table' has committed data but no dedup index " +
        "group; run rebuildIndexes before committing (a probe against an " +
        "empty index would silently skip store-wide dedup for every " +
        "already-stored source)")
  }

  /** Rebuild both index sub-tables' `touched` partitions from the freshly
    * committed rows (`out`, the [[strippedCorpus]] output — post-strip, so
    * index grams describe exactly what the store holds) in ONE atomic
    * group commit, pinning (minWords, winnowW, buckets) in the conf sub
    * on first write. Runs after the data commit; see the staleness
    * discipline note above.
    */
  private def commitIndexes(cat: Catalog, table: String, out: DataFrame,
      idCol: String, textCol: String, sourceCol: String, minWords: Int,
      winnowW: Int, buckets: Int, touched: Seq[String]): Unit = {
    val toks = SubstringDedup.tokenFrame(
      out.select(col(idCol), col(textCol)), idCol, textCol)
    val gramRows = SubstringDedup
      .winnowedGramKeys(toks, idCol, minWords, winnowW)
      .select(col("gram_h.h1").as("h1"), col("gram_h.h2").as("h2"),
        col(idCol))
      .join(out.select(col(idCol), col(sourceCol)), Seq(idCol))
      .select(col("h1"), col("h2"), col(idCol), col(sourceCol))
    cat.overwriteGroupIf(indexTable(table),
      indexBatches(cat, table, gramRows,
        out.select(col(idCol), col(sourceCol)), idCol, sourceCol, minWords,
        winnowW, buckets, touched), -1L)
    ()
  }

  /** Bucket, lay out, and enumerate one index sub-table's commit batch:
    * rows gain the `_graft_part` partition value ([[idxPart]]), shuffle
    * so each bucket partition lands in ONE task (one file per bucket
    * dir), and sort within partitions by the probe key so parquet row
    * groups cover narrow key ranges (the at-scale footer-stats path).
    * The touched partition set = existing index parts of the touched
    * SOURCES (so emptied buckets drop from the manifest — including
    * legacy source-only part values during migration) ∪ the new rows'
    * own part values (one bounded collect, ≤ touched sources × buckets).
    */
  private def idxBatch(sub: String, rows: DataFrame, bucket: Column,
      sortKey: String, sourceCol: String, existing: Seq[String],
      touched: Seq[String]): GroupBatch = {
    val df = rows.withColumn("_graft_part", idxPart(bucket, col(sourceCol)))
      .repartition(col("_graft_part"))
      .sortWithinPartitions(col("_graft_part"), col(sortKey))
    val tset = touched.toSet
    val old = existing.filter(p => tset.contains(partSource(p)))
    val fresh = df.select(col("_graft_part")).distinct()
      .collect().map(_.getString(0)).toSeq
    GroupBatch(sub, df, "_graft_part", (old ++ fresh).distinct)
  }

  /** the grams/docs group batches for one index commit, plus the one-row
    * conf pin when the group doesn't carry it yet (first commit — the
    * pins themselves were verified by the caller's pre-data-commit
    * [[requireIndexReady]])
    */
  private def indexBatches(cat: Catalog, table: String, gramRows: DataFrame,
      docRows: DataFrame, idCol: String, sourceCol: String, minWords: Int,
      winnowW: Int, buckets: Int, touched: Seq[String]): Seq[GroupBatch] = {
    val manifest = cat.snapshot(indexTable(table))._2
    val b = buckets.toLong
    val base = Seq(
      idxBatch("grams", gramRows, pmod(col("h1"), lit(b)), "h1",
        sourceCol, subParts(manifest, "grams"), touched),
      idxBatch("docs", docRows, pmod(col(idCol), lit(b)), idCol,
        sourceCol, subParts(manifest, "docs"), touched))
    if (manifest.contains("conf/0")) base
    else base :+ confBatch(docRows.sparkSession, minWords, winnowW, buckets)
  }

  private def confBatch(spark: org.apache.spark.sql.SparkSession,
      minWords: Int, winnowW: Int, buckets: Int): GroupBatch = {
    import org.apache.spark.sql.Row
    val conf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(minWords.toLong, winnowW.toLong, buckets.toLong, "0")), 1),
      confSchema)
    GroupBatch("conf", conf, "p", Seq("0"))
  }


  /** Build (or rebuild) the dedup index group for an EXISTING corpus
    * table from its current committed text — the migration path for
    * stores committed before the indexes existed, and the repair path
    * after an index table was lost: one pass over the stored corpus, one
    * atomic group commit covering every stored source (plus any stale
    * index partitions of sources no longer in the store, which are
    * dropped). Returns the committed index version. writeDeduped /
    * ingestBatch maintain the index incrementally — this full rebuild is
    * never needed in the steady state.
    */
  def rebuildIndexes(cat: Catalog, table: String, idCol: String,
      textCol: String, sourceCol: String, minWords: Int = 50,
      winnowW: Int = 8, buckets: Int = 16): Long = {
    val stored = cat.readPartitionedOr(table,
        storedSchema(idCol, sourceCol, textCol))
      .select(col(idCol), col(sourceCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val manifest = cat.snapshot(indexTable(table))._2
      val toks = SubstringDedup.tokenFrame(
        stored.select(col(idCol), col(textCol)), idCol, textCol)
      val gramRows = SubstringDedup
        .winnowedGramKeys(toks, idCol, minWords, winnowW)
        .select(col("gram_h.h1").as("h1"), col("gram_h.h2").as("h2"),
          col(idCol))
        .join(stored.select(col(idCol), col(sourceCol)), Seq(idCol))
        .select(col("h1"), col("h2"), col(idCol), col(sourceCol))
      val docRows = stored.select(col(idCol), col(sourceCol))
      // touched = EVERY existing index partition (whatever its layout —
      // the pre-bucketing source-only names included, so legacy and
      // vanished-source entries drop) ∪ the rebuilt rows' own parts; a
      // full rebuild REPLACES the (minWords, w, b) pin (this IS the
      // migration path for changing the index shape) — conf overwritten,
      // not verified. idxBatch's existing-parts filter keys on touched
      // SOURCES, so hand it every stored source plus every source an
      // existing part names.
      val b = buckets.toLong
      val storedSources = stored.select(col(sourceCol)).distinct()
        .collect().map(_.getString(0)).toSeq
      def allSources(sub: String) =
        (storedSources ++ subParts(manifest, sub).map(partSource)).distinct
      cat.overwriteGroupIf(indexTable(table), Seq(
        idxBatch("grams", gramRows, pmod(col("h1"), lit(b)), "h1",
          sourceCol, subParts(manifest, "grams"), allSources("grams")),
        idxBatch("docs", docRows, pmod(col(idCol), lit(b)), idCol,
          sourceCol, subParts(manifest, "docs"), allSources("docs")),
        confBatch(stored.sparkSession, minWords, winnowW, buckets)), -1L)
    } finally { stored.unpersist(); () }
  }

  /** the whole stored corpus at a PINNED snapshot version (the manifest a
    * past commit wrote — empty once vacuumed past the retention window)
    */
  def readVersion(cat: Catalog, table: String, v: Long, idCol: String,
      sourceCol: String, textCol: String): DataFrame = {
    val mf = cat.snapshotAt(table, v)
    cat.readManifestParts(table, mf,
      storedSchema(idCol, sourceCol, textCol), mf.keys.toSeq)
  }

  /** Snapshot DIFF — what changed between two committed versions of a
    * corpus table, per source: row classes keyed on (id, source) so a
    * document that MOVED source shows as a removal from the old source
    * and an addition to the new one (the per-partition accounting a
    * storage audit wants), `changed` = same (id, source) with different
    * text bytes (md5). Returns one row per source present in either
    * version: (sourceCol, n_added, n_removed, n_changed, n_same,
    * tokens_v1, tokens_v2) with the token totals summing each side's
    * post-strip `n_tokens_after`. The reproducibility tool q222's time
    * travel reads AROUND — not "what does v say" but "what did the
    * commit do".
    *
    * Scale shape: two pinned-snapshot scans projected slim (id, source,
    * md5(text), n_tokens_after), one (id, source)-keyed full-outer join
    * — a diff is inherently one co-shuffle of both versions — then a
    * partial-agg'd census bounded by source count. Works within the
    * catalog's two-version retention window (older manifests may be
    * vacuumed).
    */
  def diffVersions(cat: Catalog, table: String, v1: Long, v2: Long,
      idCol: String, sourceCol: String, textCol: String): DataFrame = {
    def slim(v: Long, tag: String) =
      readVersion(cat, table, v, idCol, sourceCol, textCol)
        .select(col(idCol), col(sourceCol),
          md5(col(textCol)).as(s"_graft_h$tag"),
          col("n_tokens_after").as(s"_graft_t$tag"))
    slim(v1, "1").join(slim(v2, "2"), Seq(idCol, sourceCol), "full_outer")
      .groupBy(col(sourceCol))
      .agg(
        sum(when(col("_graft_h1").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("_graft_h2").isNull, 1L).otherwise(0L))
          .as("n_removed"),
        sum(when(col("_graft_h1").isNotNull && col("_graft_h2").isNotNull
          && col("_graft_h1") =!= col("_graft_h2"), 1L).otherwise(0L))
          .as("n_changed"),
        sum(when(col("_graft_h1") === col("_graft_h2"), 1L).otherwise(0L))
          .as("n_same"),
        sum(coalesce(col("_graft_t1"), lit(0L))).as("tokens_v1"),
        sum(coalesce(col("_graft_t2"), lit(0L))).as("tokens_v2"))
  }

  /** Incremental ingest commit — one streaming micro-batch (or one batch
    * increment) landed as the next snapshot version of `table`:
    *
    *  1. already-committed batch ids SKIP (the `<table>__stream_state`
    *    high-water mark): an at-least-once foreachBatch replay after
    *    restart commits each batch id at most once, so snapshot versions
    *    stay monotone with NO duplicate content commits;
    *  2. a doc id re-ingested under a DIFFERENT source is found in the
    *    docs index and its old partition joins the touched set, so the
    *    old copy is dropped — same-id upsert holds across partitions,
    *    never just within one;
    *  3. stored rows of the touched sources merge with the batch
    *    (batch rows override same-id stored rows — latest-version-wins,
    *    the T6 upsert semantics), untouched source partitions keep their
    *    files;
    *  4. the batch PROBES the store-wide gram index: a batch passage
    *    duplicating an UNTOUCHED source's text is confirmed against that
    *    doc's current stored text and stripped from the batch doc before
    *    the merge (the stored copy is canonical unconditionally — it
    *    committed first), so store-wide keep-one holds at ingest, not
    *    just at the next full [[writeDeduped]];
    *  5. the merged working set re-runs the SAME normalize-dedup +
    *    keep-one strip the batch path uses (within-batch and
    *    touched-source dups, min-id canonical);
    *  6. both index tables' touched partitions rebuild from the committed
    *    rows, then the high-water mark advances.
    *
    * Returns the committed version, or the current version when the batch
    * was a replay / empty. Contracts: `minWords`/`minDocs`/`winnowW`/
    * `buckets` must be the same values every commit of `table` uses (the
    * index shape is pinned; [[rebuildIndexes]] migrates); cross-source
    * duplication against UNTOUCHED sources is caught with the winnowing
    * guarantee — shared spans ≥ `minWords + winnowW − 1` words always,
    * shorter ones best-effort (and whole-doc exact dups only when the doc
    * carries ≥ `minWords` tokens — the strip's granularity floor); the
    * next full [[writeDeduped]] still collapses everything ≥ `minWords`.
    * Stored text is already stripped, so the audit counters
    * (`n_tokens_before` &c.) describe this commit's increment, not the
    * document's original form. Commit order is data → index group →
    * state mark: the state write lands last, so a crash anywhere re-runs
    * the whole batch on replay (idempotent content, one extra version)
    * and missing index entries heal; stale gram entries can never
    * over-strip (hits confirm against current stored text before any
    * removal).
    *
    * Scale shape: both probes read ONLY the index bucket partitions named
    * by the batch's own key sets (winnowed gram keys / doc ids — the
    * pruning is lossless: a matching index row's bucket is by definition
    * in the batch's bucket set), hash-joined against the broadcast batch
    * keys. With `buckets` sized to the store (fixed target bucket bytes;
    * [[rebuildIndexes]] re-buckets as the store grows), per-batch probe
    * I/O is O(batch keys × bucket size) — the B-tree-leaf bound of the
    * reference's indexed cluster_values probe (Storage.java:370-400) —
    * not O(store index). The confirmation re-read is bounded by hit
    * docs; everything else touches only batch-sized or touched-partition
    * frames.
    */
  def ingestBatch(cat: Catalog, table: String, batch: DataFrame,
      batchId: Long, idCol: String, textCol: String, sourceCol: String,
      minWords: Int = 50, minDocs: Int = 2, winnowW: Int = 8,
      buckets: Int = 16): Long = {
    val stateTable = s"${table}__stream_state"
    val spark = batch.sparkSession
    import org.apache.spark.sql.types._
    val stateSchema = StructType(Seq(StructField("batch_id", LongType)))
    val committed = cat.readOr(stateTable, stateSchema)
      .agg(max(col("batch_id"))).head()
    val highWater = if (committed.isNullAt(0)) Long.MinValue
      else committed.getLong(0)
    if (batchId <= highWater) {
      // make a skipped batch VISIBLE: a fresh streaming query without a
      // checkpoint restarts batch ids at 0, and the high-water mark would
      // silently drop every batch against an existing table (the
      // documented streamIntoCorpusStore caveat — enforce it here too, at
      // the layer every caller goes through)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"ingestBatch: batch $batchId <= high-water $highWater for " +
          s"'$table' - treated as an at-least-once REPLAY and skipped. " +
          "If this is a fresh streaming query (ids restarted at 0), set " +
          "a checkpointLocation or use a fresh table.")
      return cat.version(table)
    }
    if (batch.isEmpty) return cat.version(table)
    val incoming = batch.select(col(idCol).cast("long").as(idCol),
      col(sourceCol).cast("string").as(sourceCol),
      col(textCol).cast("string").as(textCol))
      .dropDuplicates(idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    try {
      // the touched set = batch sources ∪ same-id-different-source
      // CONFLICT sources (docs-index probe: a doc_id re-ingested under a
      // new source leaves an old copy whose partition must rewrite
      // without it). One union, ONE collect — bounded by source count
      // (config-scale, the Reservoir.ingest convention); the batch id
      // set broadcasts (micro-batch-bounded), the index side reads only
      // the id-buckets the batch names.
      // ONE pinned index snapshot serves the whole batch; the index-shape
      // pins and the half-indexed-store guard run BEFORE any probe and
      // before the data commit (fail fast — a mismatched pin or a legacy
      // store would silently find nothing)
      requireIndexReady(cat, table, minWords, winnowW, buckets)
      val (_, idxManifest) = cat.snapshot(indexTable(table))
      val b = buckets.toLong
      def prunedParts(sub: String, batchBuckets: Set[Long],
          excludeSources: Set[String]): Seq[String] =
        subParts(idxManifest, sub).filter(p =>
          batchBuckets.contains(partBucket(p)) &&
            !excludeSources.contains(partSource(p)))
      val idBuckets = incoming
        .select(pmod(col(idCol), lit(b)).as("_graft_b")).distinct()
        .collect().map(_.getLong(0)).toSet // bounded: <= buckets values
      val docsIdx = cat.readManifestParts(indexTable(table), idxManifest,
        docsIndexSchema(idCol, sourceCol),
        prunedParts("docs", idBuckets, Set.empty), "docs")
      val conflictSources = docsIdx
        .join(broadcast(incoming.select(col(idCol),
          col(sourceCol).as("_graft_new_src"))), Seq(idCol))
        .filter(col(sourceCol) =!= col("_graft_new_src"))
        .select(col(sourceCol))
      val touched = incoming.select(col(sourceCol))
        .unionByName(conflictSources).distinct()
        .collect().map(_.getString(0)).toSeq
      val stored = cat.readPartitionsOr(table,
          storedSchema(idCol, sourceCol, textCol), touched)
        .select(col(idCol), col(sourceCol), col(textCol))
        .join(incoming.select(col(idCol)), Seq(idCol), "left_anti")
      // gram-probe the UNTOUCHED rest of the store (touched sources'
      // stored rows are in the working set — keep-one handles them with
      // min-id canonicality, and a replaced doc's stale grams must not
      // strip its own new version). Both probe sides winnow with the SAME
      // pinned window, so the detection guarantee above holds; only the
      // index buckets named by the batch's own key set are read.
      val batchToks = SubstringDedup.tokenFrame(
          incoming.select(col(idCol), col(textCol)), idCol, textCol)
        .persist(lvl) // feeds the probe grams AND the pre-strip
      val batchKeys = SubstringDedup
        .winnowedGramKeys(batchToks, idCol, minWords, winnowW)
        .select(col("gram_h.h1").as("h1"), col("gram_h.h2").as("h2"))
        .distinct()
        .persist(lvl) // consumed by the bucket collect AND the probe join
      val keyBuckets = batchKeys
        .select(pmod(col("h1"), lit(b)).as("_graft_b")).distinct()
        .collect().map(_.getLong(0)).toSet // bounded: <= buckets values
      val gramsIdx = cat.readManifestParts(indexTable(table), idxManifest,
        gramIndexSchema(idCol, sourceCol),
        prunedParts("grams", keyBuckets, touched.toSet), "grams")
      val hits = gramsIdx.join(broadcast(batchKeys), Seq("h1", "h2"))
        .select(col(idCol), col(sourceCol)).distinct()
        .persist(lvl) // consumed by the source collect AND the id semi-join
      try {
        // bounded: one row per hit SOURCE (config-scale)
        val hitSources = hits.select(col(sourceCol)).distinct()
          .collect().map(_.getString(0)).toSeq
        // confirmation + pre-strip: hit docs re-gram from their CURRENT
        // stored text (a stale index entry yields no confirmed gram), and
        // every batch span covered by a confirmed gram is removed — the
        // stored copy stays canonical and its partition stays untouched
        val context = cat.readPartitionsOr(table,
            storedSchema(idCol, sourceCol, textCol), hitSources)
          .join(hits.select(col(idCol)), Seq(idCol))
          .select(col(idCol), col(textCol))
        val ctxToks = SubstringDedup.tokenFrame(context, idCol, textCol)
        val preSpans = SubstringDedup.containedSpans(batchToks, ctxToks,
          idCol, minWords)
        val pre = SubstringDedup.keepOneStripped(batchToks,
            SubstringDedup.removeAllVerdicts(preSpans, idCol), idCol)
          .persist(lvl) // feeds the working set AND the audit merge
        try {
          val preDocs = pre
            .join(incoming.select(col(idCol), col(sourceCol)), Seq(idCol))
            .select(col(idCol), col(sourceCol),
              col("text").as(textCol)) // keepOneStripped's literal name
          val (strippedF, cleanup) = strippedCorpusWithCleanup(
            stored.unionByName(preDocs), idCol, textCol, sourceCol,
            minWords, minDocs)
          try {
            // merge the pre-strip audit into the working-set audit: batch
            // docs report their ORIGINAL token count and total removed
            // spans; stored pass-through rows (null pre columns) keep the
            // working-set values
            val preAudit = pre.select(col(idCol),
              col("n_tokens_before").as("_graft_pre_b"),
              col("n_spans_removed").as("_graft_pre_r"))
            val out = strippedF.join(preAudit, Seq(idCol), "left")
              .select(col(idCol), col(sourceCol), col(textCol),
                coalesce(col("_graft_pre_b"), col("n_tokens_before"))
                  .as("n_tokens_before"),
                col("n_tokens_after"),
                (col("n_spans_removed") +
                  coalesce(col("_graft_pre_r"), lit(0L)))
                  .as("n_spans_removed"))
              .persist(lvl) // data write + two index rebuilds
            try {
              val v = cat.overwritePartitions(table, out, sourceCol,
                touched)
              commitIndexes(cat, table, out, idCol, textCol, sourceCol,
                minWords, winnowW, buckets, touched)
              import spark.implicits._
              cat.write(stateTable, Seq(batchId).toDF("batch_id"))
              v
            } finally { out.unpersist(); () }
          } finally { cleanup() }
        } finally { pre.unpersist(); () }
      } finally {
        hits.unpersist(); batchKeys.unpersist(); batchToks.unpersist(); ()
      }
    } finally { incoming.unpersist(); () }
  }
}
