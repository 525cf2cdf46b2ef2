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
      // verify the index pins and data layout BEFORE the data commit
      // (mirrors ingestBatch's fail-fast, r15 ADVICE): a mismatched pin
      // otherwise threw only after the data version advanced with the new
      // strip while the index kept the old pin and entries
      requireIndexReady(cat, table, minWords, winnowW, buckets)
      requireDataLayout(cat, table)
      // bounded: one row per SOURCE (config-scale), the Reservoir.ingest
      // touched-partition convention — never a corpus-sized collect
      val touched = out.select(col(sourceCol)).distinct()
        .collect().map(_.getString(0)).toSeq
      val v = commitData(cat, table, out, idCol, sourceCol, buckets,
        touched)
      commitIndexes(cat, table, out, idCol, textCol, sourceCol, minWords,
        winnowW, buckets, touched)
      v
    } finally { out.unpersist(); cleanup(); () }
  }

  /** Commit `out` as the full new content of the `touched` SOURCES of the
    * bucketed data table: rows land in `pmod(id, b)#source` partitions
    * (one file per bucket, sorted by id), and every existing bucket of a
    * touched source is in the overwrite set so emptied buckets drop.
    * Bucketing the DATA like the indexes is what bounds an incremental
    * commit's write amplification: a small batch into a huge source
    * rewrites only the id-buckets it lands in, never the whole source
    * (the r15 hot-source finding).
    */
  private def commitData(cat: Catalog, table: String, out: DataFrame,
      idCol: String, sourceCol: String, buckets: Int,
      touched: Seq[String]): Long = {
    val tset = touched.toSet
    val old = cat.partitionManifest(table).keysIterator
      .filter(p => tset.contains(partSource(p))).toSeq
    val fresh = out.select(idxPart(pmod(col(idCol), lit(buckets.toLong)),
        col(sourceCol)).as("_graft_part"))
      .distinct().collect().map(_.getString(0)).toSeq
    commitDataParts(cat, table, out, idCol, sourceCol, buckets,
      (old ++ fresh).distinct)
  }

  /** commit `out` as the full new content of exactly the `touched` data
    * partitions (part values, not sources) — the incremental-commit core:
    * one file per bucket dir, sorted by id
    */
  private def commitDataParts(cat: Catalog, table: String, out: DataFrame,
      idCol: String, sourceCol: String, buckets: Int,
      touched: Seq[String]): Long = {
    val df = out.withColumn("_graft_part",
        idxPart(pmod(col(idCol), lit(buckets.toLong)), col(sourceCol)))
      .repartition(col("_graft_part"))
      .sortWithinPartitions(col("_graft_part"), col(idCol))
    cat.overwritePartitions(table, df, "_graft_part", touched)
  }

  /** the data-layout fail-fast twin of [[requireIndexReady]]: a store
    * whose data partitions are source-named (committed before data
    * bucketing, r16) must be migrated by [[rebuildIndexes]] before any
    * incremental commit — part names are how dirty buckets resolve, so a
    * legacy part would silently hide its stored rows from the merge
    */
  private def requireDataLayout(cat: Catalog, table: String): Unit = {
    val legacy = cat.partitionManifest(table).keysIterator
      .filter(!_.contains('#')).toSeq
    require(legacy.isEmpty,
      s"corpus table '$table' has source-partitioned (pre-bucketing) data " +
        s"partitions ${legacy.take(3).mkString("[", ", ", "]")}…; run " +
        "rebuildIndexes to migrate the store to the bucketed layout")
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
  // table, holding three sub-tables committed ATOMICALLY (one manifest,
  // one `_LATEST` flip — the Catalog group-commit machinery), each
  // partitioned by (bucket, source) like the data table itself — the
  // source dimension keeps full-source rewrites commit-granular, the
  // bucket dimension makes both the per-batch PROBE and the per-batch
  // WRITE prunable (see below):
  //   docs   (id, source)          — one row per stored doc,
  //       bucketed by pmod(id, b)
  //   grams  (h1, h2, id, source)  — one row per WINNOW-SELECTED
  //       (minWords-gram, doc) — SubstringDedup.winnowedGramKeys, the
  //       same 16-byte key definition queries and probes share —
  //       bucketed by pmod(h1, b), sorted by h1 within each bucket's
  //       files (row groups cover narrow h1 ranges)
  //   hashes (th, id, source)      — one row per stored doc, th =
  //       xxhash64(normalized text), bucketed by pmod(th, b)
  // They are what lets ingestBatch enforce store-WIDE semantics while
  // touching only the batch's partitions: the docs index finds a doc_id
  // re-ingested under a different source (its old bucket must drop the
  // old copy — same-id upsert across partitions), the gram index finds a
  // batch passage duplicating any stored doc's text (the reference's
  // indexed cluster_values probe, Storage.java:370-400), and the hash
  // index finds whole-document exact duplicates with no length floor.
  //
  // Probe and write cost at scale (the r15 "one thing between
  // ingestBatch and 100 TB", items 1+2): winnowing cuts gram-index rows
  // AND probe keys to ~2/(w+1) of gram positions; each probe reads ONLY
  // the index buckets named by the batch's own key set; the data commit
  // rewrites ONLY the id-buckets the batch lands in. With the bucket
  // count `b` sized to the store (fixed target bucket bytes;
  // rebuildIndexes re-buckets as the store grows, like a B-tree
  // splitting), per-batch I/O is O(batch keys × bucket size), the
  // B-tree-leaf bound, instead of O(store index) or O(hottest source).
  // Detection floor: shared spans ≥ minWords + w − 1 words are ALWAYS
  // caught (the winnowing guarantee, documented at winnowedGramKeys);
  // exact whole-doc dups always (hash index); shorter shared spans heal
  // at the next full writeDeduped. (minWords, w, b) are pinned per table
  // in the conf sub.
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

  /** the hash-index schema: one (th, id, source) row per stored doc with
    * th = xxhash64 of the doc's NORMALIZED committed text — the
    * whole-document exact-dup probe key (no gram-length floor: a 3-token
    * exact dup is as findable as a 3000-token one). 64-bit collisions and
    * stale entries are both neutralized by the probe's confirmation
    * re-read of the hit docs' current text. Bucketed by pmod(th, b).
    */
  def hashIndexSchema(idCol: String, sourceCol: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("th", LongType),
      StructField(idCol, LongType), StructField(sourceCol, StringType)))
  }

  /** the exact-dup probe key: xxhash64 over the normalized text (the SAME
    * normalization [[strippedCorpus]]'s exact-dedup groups by)
    */
  private def thCol(textCol: String): Column =
    xxhash64(Normalize.normalizeText(col(textCol)))

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
        out.select(col(idCol), col(sourceCol)),
        out.select(thCol(textCol).as("th"), col(idCol), col(sourceCol)),
        idCol, sourceCol, minWords, winnowW, buckets, touched), -1L)
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
      docRows: DataFrame, hashRows: DataFrame, idCol: String,
      sourceCol: String, minWords: Int, winnowW: Int, buckets: Int,
      touched: Seq[String]): Seq[GroupBatch] = {
    val manifest = cat.snapshot(indexTable(table))._2
    val b = buckets.toLong
    val base = Seq(
      idxBatch("grams", gramRows, pmod(col("h1"), lit(b)), "h1",
        sourceCol, subParts(manifest, "grams"), touched),
      idxBatch("docs", docRows, pmod(col(idCol), lit(b)), idCol,
        sourceCol, subParts(manifest, "docs"), touched),
      idxBatch("hashes", hashRows, pmod(col("th"), lit(b)), "th",
        sourceCol, subParts(manifest, "hashes"), touched))
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
    val full = cat.readPartitionedOr(table,
        storedSchema(idCol, sourceCol, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      full.count() // materialize BEFORE any data rewrite below
      // migrate the DATA layout when needed: source-partitioned legacy
      // parts, or a bucket-count pin change (part names are how dirty
      // buckets resolve, so data bucketing must track the conf pin).
      // Every existing part is in the overwrite set so old names drop.
      val dataMf = cat.partitionManifest(table)
      val confMf = cat.snapshot(indexTable(table))._2
      val oldB: Option[Long] =
        if (!confMf.contains("conf/0")) None
        else {
          val row = cat.readGroupOr(indexTable(table), confMf, "conf",
            confSchema).head()
          if (row.isNullAt(2)) None else Some(row.getLong(2))
        }
      val needRewrite = dataMf.nonEmpty &&
        (dataMf.keysIterator.exists(!_.contains('#')) ||
          !oldB.contains(buckets.toLong))
      if (needRewrite) {
        val fresh = full.select(idxPart(pmod(col(idCol),
            lit(buckets.toLong)), col(sourceCol)).as("_graft_part"))
          .distinct().collect().map(_.getString(0)).toSeq
        commitDataParts(cat, table, full, idCol, sourceCol, buckets,
          (dataMf.keys.toSeq ++ fresh).distinct)
      }
      val stored = full.select(col(idCol), col(sourceCol), col(textCol))
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
      val hashRows = stored.select(thCol(textCol).as("th"), col(idCol),
        col(sourceCol))
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
        idxBatch("hashes", hashRows, pmod(col("th"), lit(b)), "th",
          sourceCol, subParts(manifest, "hashes"), allSources("hashes")),
        confBatch(stored.sparkSession, minWords, winnowW, buckets)), -1L)
    } finally { full.unpersist(); () }
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
    *  2. same-id upsert, store-wide: a re-ingested doc id replaces its
    *    stored copy wherever it lives — same bucket partition when the
    *    source matches, and across sources via the docs-index conflict
    *    probe (the old copy's bucket joins the dirty set and drops it);
    *  3. the batch probes the store-wide HASH index first: a batch doc
    *    whose normalized text exactly equals an unreplaced stored doc's
    *    is dropped entirely — whole-document exact dedup with NO length
    *    floor, confirmed against current stored text;
    *  4. the surviving docs probe the store-wide GRAM index: a batch
    *    passage duplicating ANY unreplaced stored doc's text is
    *    confirmed against that doc's current stored text and stripped
    *    from the batch doc (the stored copy is canonical
    *    unconditionally — it committed first), so store-wide keep-one
    *    holds at ingest, not just at the next full [[writeDeduped]];
    *  5. the batch alone then runs the normalize-dedup + keep-one strip
    *    (min-id canonical WITHIN the batch); stored rows are never
    *    re-deduped, re-stripped, or rewritten at ingest — per-batch
    *    compute and I/O are O(batch + hits + dirty buckets), never
    *    O(source) (the r15 hot-source finding);
    *  6. the index group's touched bucket partitions merge incrementally
    *    ([[mergeIndexes]]), then the high-water mark advances.
    *
    * Returns the committed version, or the current version when the batch
    * was a replay / empty. Contracts: `minWords`/`minDocs`/`winnowW`/
    * `buckets` must be the same values every commit of `table` uses (the
    * index shape is pinned; [[rebuildIndexes]] migrates); duplication
    * against stored docs is caught with the winnowing guarantee — shared
    * spans ≥ `minWords + winnowW − 1` words always, shorter ones
    * best-effort, whole-document exact dups always (the hash index);
    * stored-canonical at ingest means a batch doc never displaces an
    * unreplaced stored doc, whatever their ids — the next full
    * [[writeDeduped]] restores global min-id canonicality and collapses
    * anything ≥ `minWords` the winnowed probe sampled past. Stored text
    * is already stripped, so the audit counters (`n_tokens_before` &c.)
    * describe this commit's increment, not the document's original form.
    * Commit order is data → index group → state mark: the state write
    * lands last, so a crash anywhere re-runs the whole batch on replay
    * (idempotent content, one extra version) and missing index entries
    * heal; stale index entries can never over-strip or over-drop (every
    * hit confirms against current stored text before any action — see
    * [[mergeIndexes]] for the one bounded stale-row window).
    *
    * Scale shape: all three probes read ONLY the index bucket partitions
    * named by the batch's own key sets (winnowed gram keys / doc ids /
    * text hashes — the pruning is lossless: a matching index row's
    * bucket is by definition in the batch's bucket set), hash-joined
    * against the broadcast batch keys. With `buckets` sized to the store
    * (fixed target bucket bytes; [[rebuildIndexes]] re-buckets as the
    * store grows), per-batch probe I/O is O(batch keys × bucket size) —
    * the B-tree-leaf bound of the reference's indexed cluster_values
    * probe (Storage.java:370-400) — not O(store index). The data write
    * rewrites only dirty bucket partitions; confirmation re-reads are
    * bounded by hit docs.
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
      // fail fast BEFORE any probe or commit: index-shape pins, the
      // half-indexed-store guard, and the data-layout guard
      requireIndexReady(cat, table, minWords, winnowW, buckets)
      requireDataLayout(cat, table)
      // ONE pinned snapshot of each table serves the whole batch
      val (_, idxManifest) = cat.snapshot(indexTable(table))
      val (_, dataManifest) = cat.snapshot(table)
      val b = buckets.toLong
      def prunedParts(sub: String, batchBuckets: Set[Long]): Seq[String] =
        subParts(idxManifest, sub)
          .filter(p => batchBuckets.contains(partBucket(p)))
      def partVals(df: DataFrame, bucket: Column): Seq[String] =
        df.select(idxPart(bucket, col(sourceCol)).as("_graft_part"))
          .distinct().collect().map(_.getString(0)).toSeq
      def bucketsOf(df: DataFrame, c: Column): Set[Long] =
        df.select(pmod(c, lit(b)).as("_graft_b")).distinct()
          .collect().map(_.getLong(0)).toSet
      val batchIds = incoming.select(col(idCol))
      // DIRTY data partitions = the buckets the batch's ids land in, plus
      // the buckets holding a conflicting old copy (same id re-ingested
      // under a DIFFERENT source — found in the docs index, pruned to the
      // batch's id-buckets; bucket is a function of id alone, so the old
      // copy shares the batch doc's bucket number under its old source).
      // Every collect here is bounded by batch size × bucket count.
      val idBuckets = bucketsOf(incoming, col(idCol))
      val docsIdx = cat.readManifestParts(indexTable(table), idxManifest,
        docsIndexSchema(idCol, sourceCol), prunedParts("docs", idBuckets),
        "docs")
      val conflictParts = partVals(
        docsIdx.join(broadcast(incoming.select(col(idCol),
            col(sourceCol).as("_graft_new_src"))), Seq(idCol))
          .filter(col(sourceCol) =!= col("_graft_new_src")),
        pmod(col(idCol), lit(b)))
      val dirtyParts =
        (partVals(incoming, pmod(col(idCol), lit(b))) ++ conflictParts)
          .distinct
      // dirty-part stored rows split into REPLACED (ids this batch
      // re-ingests — the old copies leave the store, and their index
      // entries merge out below) and PASS-THROUGH bucket neighbours,
      // committed again verbatim: stored rows are never re-deduped or
      // re-stripped at ingest
      val dirty = cat.readManifestParts(table, dataManifest,
          storedSchema(idCol, sourceCol, textCol), dirtyParts)
        .persist(lvl) // replaced + passThrough both read it
      val replaced = dirty.join(broadcast(batchIds), Seq(idCol))
        .persist(lvl) // old-key recompute ×2 in the index merge
      val passThrough = dirty.join(broadcast(batchIds), Seq(idCol),
        "left_anti")
      // whole-document exact-dup probe FIRST (hash index): a batch doc
      // whose NORMALIZED text exactly equals an unreplaced stored doc's
      // is DROPPED entirely (stored-wins, like the batch path's
      // normalize-dedup drop) — confirmed against the stored docs'
      // current text, so stale entries and 64-bit collisions can never
      // wrongly drop. No gram-length floor: this closes the old "short
      // exact dups slip through until the next writeDeduped" caveat for
      // whole documents. Runs BEFORE the gram pre-strip, so an exact dup
      // is dropped, never stripped-to-empty-and-kept.
      val inTh = incoming.select(col(idCol).as("_graft_bid"),
        thCol(textCol).as("th"))
      val thBuckets = bucketsOf(inTh, col("th"))
      val hashesIdx = cat.readManifestParts(indexTable(table),
        idxManifest, hashIndexSchema(idCol, sourceCol),
        prunedParts("hashes", thBuckets), "hashes")
      val cand = hashesIdx.join(broadcast(inTh), Seq("th"))
        .join(broadcast(batchIds), Seq(idCol), "left_anti")
        .persist(lvl) // part collect + the confirm join
      val candParts = partVals(cand, pmod(col(idCol), lit(b)))
      val candStored = cat.readManifestParts(table, dataManifest,
          storedSchema(idCol, sourceCol, textCol), candParts)
        .select(col(idCol),
          Normalize.normalizeText(col(textCol)).as("_graft_sn"))
      val dropIds = cand.select(col(idCol), col("_graft_bid"))
        .join(candStored, Seq(idCol))
        .join(incoming.select(col(idCol).as("_graft_bid"),
          Normalize.normalizeText(col(textCol)).as("_graft_bn")),
          Seq("_graft_bid"))
        .filter(col("_graft_sn") === col("_graft_bn"))
        .select(col("_graft_bid").as(idCol)).distinct()
      val kept = incoming.join(dropIds, Seq(idCol), "left_anti")
      // gram-probe the store with the surviving docs: stored docs are
      // canonical at ingest (they committed first) — a batch passage
      // duplicating ANY unreplaced stored doc's text is confirmed
      // against that doc's CURRENT text (a stale index entry yields no
      // confirmed gram) and stripped from the batch. Only the ids this
      // batch replaces are excluded (their stale grams must not strip
      // their own new versions). Both probe sides winnow with the SAME
      // pinned window; only the index buckets named by the batch's own
      // key set are read.
      val batchToks = SubstringDedup.tokenFrame(
          kept.select(col(idCol), col(textCol)), idCol, textCol)
        .persist(lvl) // feeds the probe grams AND the pre-strip
      val batchKeys = SubstringDedup
        .winnowedGramKeys(batchToks, idCol, minWords, winnowW)
        .select(col("gram_h.h1").as("h1"), col("gram_h.h2").as("h2"))
        .distinct()
        .persist(lvl) // consumed by the bucket collect AND the probe join
      val keyBuckets = bucketsOf(batchKeys, col("h1"))
      val gramsIdx = cat.readManifestParts(indexTable(table), idxManifest,
        gramIndexSchema(idCol, sourceCol),
        prunedParts("grams", keyBuckets), "grams")
      val hits = gramsIdx.join(broadcast(batchKeys), Seq("h1", "h2"))
        .select(col(idCol), col(sourceCol)).distinct()
        .join(broadcast(batchIds), Seq(idCol), "left_anti")
        .persist(lvl) // consumed by the part collect AND the id semi-join
      try {
        val hitParts = partVals(hits, pmod(col(idCol), lit(b)))
        val context = cat.readManifestParts(table, dataManifest,
            storedSchema(idCol, sourceCol, textCol), hitParts)
          .join(hits.select(col(idCol)), Seq(idCol))
          .select(col(idCol), col(textCol))
        val ctxToks = SubstringDedup.tokenFrame(context, idCol, textCol)
        val preSpans = SubstringDedup.containedSpans(batchToks, ctxToks,
          idCol, minWords)
        // EAGER localCheckpoint, not persist: `pre` is referenced (via
        // bdocs / the audit merge) repeatedly, and a persist keeps the
        // whole probe chain in every consumer's LOGICAL plan — the
        // composed plan string grew multiplicatively and OOM'd the
        // driver at AQE's explain formatting. Checkpointing truncates
        // lineage to a flat scan of the (batch-sized) materialized rows;
        // a lost-executor recompute is impossible, but a failed ingest
        // job just fails the commit and the at-least-once replay redoes
        // the batch (the state-mark protocol).
        val pre = SubstringDedup.keepOneStripped(batchToks,
            SubstringDedup.removeAllVerdicts(preSpans, idCol), idCol)
          .localCheckpoint(true)
        // the batch-only working set: normalize-dedup (min id) +
        // keep-one strip WITHIN the batch — stored rows never join it,
        // so per-batch compute is O(batch), never O(source)
        val bdocs = pre
          .join(kept.select(col(idCol), col(sourceCol)), Seq(idCol))
          .select(col(idCol), col(sourceCol),
            col("text").as(textCol)) // keepOneStripped's literal name
        val (strippedF, cleanup) = strippedCorpusWithCleanup(bdocs,
          idCol, textCol, sourceCol, minWords, minDocs)
        try {
          // merge the pre-strip audit into the batch audit: batch docs
          // report their ORIGINAL token count and the total removed
          // spans across both strip passes
          val preAudit = pre.select(col(idCol),
            col("n_tokens_before").as("_graft_pre_b"),
            col("n_spans_removed").as("_graft_pre_r"))
          val batchOut = strippedF.join(preAudit, Seq(idCol), "left")
            .select(col(idCol), col(sourceCol), col(textCol),
              coalesce(col("_graft_pre_b"), col("n_tokens_before"))
                .as("n_tokens_before"),
              col("n_tokens_after"),
              (col("n_spans_removed") +
                coalesce(col("_graft_pre_r"), lit(0L)))
                .as("n_spans_removed"))
            // lineage cut (see `pre`): the data write + three index
            // merges all start from a flat scan of the batch rows
            .localCheckpoint(true)
          val v = commitDataParts(cat, table,
            passThrough.unionByName(batchOut), idCol, sourceCol,
            buckets, dirtyParts)
          mergeIndexes(cat, table, batchOut, replaced, batchIds,
            idCol, textCol, sourceCol, minWords, winnowW, buckets)
          import spark.implicits._
          cat.write(stateTable, Seq(batchId).toDF("batch_id"))
          v
        } finally { cleanup() }
      } finally {
        hits.unpersist(); batchKeys.unpersist(); batchToks.unpersist()
        cand.unpersist(); replaced.unpersist(); dirty.unpersist(); ()
      }
    } finally { incoming.unpersist(); () }
  }

  /** Incremental index maintenance for one ingest commit: for each
    * sub-table, the touched partitions are exactly those holding the NEW
    * rows (keys of the batch's committed docs) or the REPLACED docs' OLD
    * rows — old keys recomputed from the old stored text read off the
    * dirty data partitions with the same deterministic functions and
    * pins, so the removal set's buckets are exact. Each touched
    * partition's next content = its current rows minus ALL batch ids,
    * plus the new rows; untouched partitions keep their files. One
    * atomic group commit. O(batch + replaced), never O(source).
    *
    * Crash window: a replay after a crash between the data commit and
    * this merge can no longer read a replaced doc's OLD text (the data
    * commit dropped it), so that doc's stale index rows in buckets the
    * replay doesn't otherwise touch can linger — harmless (every probe
    * confirms hits against current stored text before acting) and reaped
    * by the next [[rebuildIndexes]].
    */
  private def mergeIndexes(cat: Catalog, table: String, batchOut: DataFrame,
      replaced: DataFrame, batchIds: DataFrame, idCol: String,
      textCol: String, sourceCol: String, minWords: Int, winnowW: Int,
      buckets: Int): Unit = {
    val b = buckets.toLong
    val manifest = cat.snapshot(indexTable(table))._2
    def gramsOf(df: DataFrame) =
      SubstringDedup.winnowedGramKeys(
          SubstringDedup.tokenFrame(df.select(col(idCol), col(textCol)),
            idCol, textCol), idCol, minWords, winnowW)
        .select(col("gram_h.h1").as("h1"), col("gram_h.h2").as("h2"),
          col(idCol))
        .join(df.select(col(idCol), col(sourceCol)), Seq(idCol))
        .select(col("h1"), col("h2"), col(idCol), col(sourceCol))
    def hashesOf(df: DataFrame) =
      df.select(thCol(textCol).as("th"), col(idCol), col(sourceCol))
    def merged(sub: String, newRows: DataFrame, oldRows: DataFrame,
        bucket: Column, sortKey: String,
        schema: org.apache.spark.sql.types.StructType): GroupBatch = {
      def partOf(df: DataFrame): Seq[String] =
        df.select(idxPart(bucket, col(sourceCol)).as("_graft_part"))
          .distinct().collect().map(_.getString(0)).toSeq
      val parts = (partOf(newRows) ++ partOf(oldRows)).distinct
      val content = cat.readManifestParts(indexTable(table), manifest,
          schema, parts, sub)
        .join(broadcast(batchIds), Seq(idCol), "left_anti")
        .unionByName(newRows)
        .withColumn("_graft_part", idxPart(bucket, col(sourceCol)))
        .repartition(col("_graft_part"))
        .sortWithinPartitions(col("_graft_part"), col(sortKey))
      GroupBatch(sub, content, "_graft_part", parts)
    }
    val base = Seq(
      merged("grams", gramsOf(batchOut), gramsOf(replaced),
        pmod(col("h1"), lit(b)), "h1", gramIndexSchema(idCol, sourceCol)),
      merged("docs", batchOut.select(col(idCol), col(sourceCol)),
        replaced.select(col(idCol), col(sourceCol)),
        pmod(col(idCol), lit(b)), idCol,
        docsIndexSchema(idCol, sourceCol)),
      merged("hashes", hashesOf(batchOut), hashesOf(replaced),
        pmod(col("th"), lit(b)), "th", hashIndexSchema(idCol, sourceCol)))
    val batches = if (manifest.contains("conf/0")) base
      else base :+ confBatch(batchOut.sparkSession, minWords, winnowW,
        buckets)
    cat.overwriteGroupIf(indexTable(table), batches, -1L)
    ()
  }
}
