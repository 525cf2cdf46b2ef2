package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Thrown when an optimistic commit (`writeIf` / `overwritePartitionsIf`)
  * finds the table no longer at the version the caller's batch was computed
  * against. Callers re-read the fresh snapshot and retry the batch — the
  * reference's retry-once loop around its PG transaction
  * (Storage.java:251-264).
  */
final case class CommitConflict(table: String, expected: Long, found: Long)
  extends RuntimeException(
    s"concurrent write to '$table': batch computed at version $expected " +
      s"but the table is now at $found")

/** Tenant-namespaced table layout on parquet with a snapshot-commit protocol
  * (SURVEY.md §7.1 step 3): each table lives at
  * `<root>/<tenant>/<table>/v=<N>`; `_LATEST` names the committed version and
  * is replaced atomically (write-temp + rename), so concurrent readers always
  * see a complete snapshot and resumption-token pagination can pin a version
  * (SURVEY.md §7.4 risk 5). Replaces the reference's per-tenant PostgreSQL
  * schemas (Storage.java:81-92) and its MVCC isolation.
  *
  * Writer-writer safety: committers serialize on an exclusive versioned claim
  * marker (`_COMMIT.v=N`, created with overwrite=false — atomic on HDFS-like
  * stores), so two writers can never both commit the same version; a claim
  * left by a crashed writer is taken over after
  * `spark.graft.catalog.claimTimeoutMs` (default 60s). Read-modify-write
  * callers additionally pass the snapshot version their batch was computed
  * against (`writeIf` / `overwritePartitionsIf` / `updateWith`); if the table
  * moved, the commit fails with [[CommitConflict]] instead of silently losing
  * the other writer's update, and the caller recomputes against the fresh
  * snapshot.
  */
final class Catalog(val spark: SparkSession, root: String, tenant: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(name: String) = new Path(s"$root/$tenant/$name")

  private def latestFile(name: String) = new Path(tableDir(name), "_LATEST")

  private def confLong(key: String, default: Long): Long =
    spark.conf.getOption(key).map(_.toLong).getOrElse(default)

  private def claimTimeoutMs: Long =
    confLong("spark.graft.catalog.claimTimeoutMs", 60000L)

  /** every N-th partitioned commit opportunistically vacuums data dirs no
    * snapshot within the retention window references (0 disables)
    */
  private def autoVacuumEvery: Long =
    confLong("spark.graft.catalog.autoVacuumEvery", 64L)

  def latestVersion(name: String): Option[Long] = {
    val f = latestFile(name)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** committed version as a plain number: 0 = table absent. This is the value
    * optimistic writers pass back as `expected`.
    */
  def version(name: String): Long = latestVersion(name).getOrElse(0L)

  def exists(name: String): Boolean = latestVersion(name).isDefined

  /** read the latest committed snapshot */
  def read(name: String): Option[DataFrame] =
    readVersion(name, latestVersion(name))

  /** read a pinned snapshot version (None → empty not allowed here) */
  def readVersion(name: String, version: Option[Long]): Option[DataFrame] =
    version.map(v => spark.read.parquet(new Path(tableDir(name), s"v=$v").toString))

  /** read the latest snapshot, or an empty frame with `schema` */
  def readOr(name: String, schema: StructType): DataFrame =
    read(name).getOrElse(
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))

  // ---------------- commit protocol ----------------

  private def claimFile(name: String, v: Long) =
    new Path(tableDir(name), s"_COMMIT.v=$v")

  /** exclusively claim version v (create with overwrite=false) */
  private def tryClaim(name: String, v: Long): Boolean = {
    fs.mkdirs(tableDir(name))
    try {
      val out = fs.create(claimFile(name, v), false)
      try out.write(
        s"${java.util.UUID.randomUUID()} ${System.currentTimeMillis()}"
          .getBytes("UTF-8"))
      finally out.close()
      true
    } catch { case _: java.io.IOException => false }
  }

  /** Claim the next version, serializing with concurrent committers. When
    * `expected >= 0`, enforce optimistic concurrency: fail with
    * [[CommitConflict]] the moment the committed version differs from what
    * the caller's batch was computed against. A claim whose holder stopped
    * making progress for `claimTimeoutMs` is treated as crashed and taken
    * over.
    */
  private def claimNext(name: String, expected: Long): Long = {
    val deadline = System.currentTimeMillis() + 2 * claimTimeoutMs
    while (true) {
      val base = version(name)
      if (expected >= 0 && base != expected)
        throw CommitConflict(name, expected, base)
      val v = base + 1
      if (tryClaim(name, v)) return v
      // another writer holds the claim for v: wait for its _LATEST flip, or
      // take over a stale claim (crashed writer)
      val cf = claimFile(name, v)
      val stale =
        try System.currentTimeMillis() - fs.getFileStatus(cf).getModificationTime > claimTimeoutMs
        catch { case _: java.io.IOException => false } // claim already gone
      if (stale) fs.delete(cf, false)
      else if (System.currentTimeMillis() > deadline)
        sys.error(s"timed out waiting for a concurrent commit of '$name' v=$v")
      else Thread.sleep(20)
    }
    sys.error("unreachable")
  }

  /** flip the _LATEST pointer to v (write-temp + rename) */
  private def flipLatest(name: String, v: Long): Unit = {
    val tmp = new Path(tableDir(name), s"_LATEST.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, latestFile(name))) {
      fs.delete(latestFile(name), false)
      fs.rename(tmp, latestFile(name))
    }
  }

  /** retain the two latest versions (data, manifests, claim markers) for
    * in-flight readers; GC everything older. Other writers' live staging
    * dirs are never touched.
    */
  private def gcVersions(name: String, v: Long): Unit = {
    def olderThan(n: String, prefix: String): Boolean =
      n.startsWith(prefix) && {
        val suffix = n.stripPrefix(prefix)
        suffix.nonEmpty && suffix.forall(_.isDigit) && suffix.toLong < v - 1
      }
    fs.listStatus(tableDir(name)).foreach { st =>
      val n = st.getPath.getName
      if (olderThan(n, "v=") || olderThan(n, "_COMMIT.v=") ||
          olderThan(n, "_MANIFEST.v=") || olderThan(n, "_LATEST.tmp.") ||
          olderThan(n, "_MANIFEST.tmp."))
        fs.delete(st.getPath, true)
    }
  }

  /** Write the next version and commit it atomically. Blind overwrite: safe
    * without a version check because the staged snapshot does not depend on
    * the current one (concurrent blind writers serialize; both versions
    * commit in claim order). For read-modify-write, use [[writeIf]] or
    * [[updateWith]].
    */
  def write(name: String, df: DataFrame): Long = writeIf(name, df, -1L)

  /** Optimistic whole-table write: stage `df` once, then commit the next
    * version only if the table is still at `expected` (as returned by
    * [[version]]; -1 skips the check). Throws [[CommitConflict]] otherwise —
    * the staged data is cleaned up and the caller recomputes.
    */
  def writeIf(name: String, df: DataFrame, expected: Long): Long = {
    val staging = new Path(tableDir(name),
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("overwrite").parquet(staging.toString)
    val v =
      try claimNext(name, expected)
      catch { case e: Throwable => fs.delete(staging, true); throw e }
    val dest = new Path(tableDir(name), s"v=$v")
    if (fs.exists(dest)) fs.delete(dest, true) // leftover of a crashed claimant
    if (!fs.rename(staging, dest))
      sys.error(s"failed to commit $name v=$v")
    flipLatest(name, v)
    gcVersions(name, v)
    v
  }

  /** Read-modify-write with optimistic retry: `f` maps the current snapshot
    * to the full next contents; a concurrent commit between read and commit
    * re-runs `f` against the fresh snapshot (up to `maxRetries` times) so no
    * writer's update is silently lost.
    */
  def updateWith(name: String, schema: StructType, maxRetries: Int = 3)(
      f: DataFrame => DataFrame): Long = {
    var attempt = 0
    while (true) {
      val base = version(name)
      val next = f(readOr(name, schema))
      try return writeIf(name, next, base)
      catch {
        case c: CommitConflict =>
          if (attempt >= maxRetries) throw c
          attempt += 1
      }
    }
    sys.error("unreachable")
  }

  // ---------------- partitioned copy-on-write tables ----------------
  // Layout: <table>/_LATEST names manifest version N; <table>/_MANIFEST.v=N
  // maps each partition value to its current data version; data files live at
  // <table>/parts/<urlencoded(part)>/v=M. A batch that touches partitions S
  // rewrites ONLY those partitions' data dirs plus one small manifest file —
  // per-batch I/O is O(touched partitions), not O(table) — while readers
  // keep full snapshot isolation (the committed manifest only ever names
  // complete data dirs; the previous manifest and its dirs are retained for
  // in-flight readers).

  private def enc(part: String): String = Catalog.encodePart(part)

  private def manifestFile(name: String, v: Long) =
    new Path(tableDir(name), s"_MANIFEST.v=$v")

  private def partDataDir(name: String, part: String, v: Long) =
    new Path(tableDir(name), s"parts/${enc(part)}/v=$v")

  private def manifestAt(name: String, v: Long): Map[String, Long] = {
    val f = manifestFile(name, v)
    if (!fs.exists(f)) Map.empty
    else {
      val in = fs.open(f)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.split("\n").filter(_.nonEmpty).map { line =>
        val Array(ver, part) = line.split("\t", 2)
        java.net.URLDecoder.decode(part, "UTF-8") -> ver.toLong
      }.toMap
    }
  }

  /** current partition manifest: part value → data version (empty if none) */
  def partitionManifest(name: String): Map[String, Long] =
    latestVersion(name) match {
      case None => Map.empty
      case Some(v) => manifestAt(name, v)
    }

  /** read the given partitions of a partitioned table (missing parts skipped) */
  def readPartitionsOr(name: String, schema: StructType,
      parts: Seq[String]): DataFrame = {
    val mf = partitionManifest(name)
    val dirs = parts.distinct.sorted.flatMap(p =>
      mf.get(p).map(v => partDataDir(name, p, v).toString))
    if (dirs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dirs: _*)
  }

  /** read every partition of a partitioned table */
  def readPartitionedOr(name: String, schema: StructType): DataFrame =
    readPartitionsOr(name, schema, partitionManifest(name).keys.toSeq)

  /** Overwrite exactly the `touched` partitions with `df`'s rows (df must
    * contain only rows whose `partCol` is in `touched`; a touched partition
    * with no rows in df is dropped). One Spark write job for all touched
    * partitions, one manifest commit. Untouched partitions' files are not
    * read, written, or moved. Blind w.r.t. version: concurrent writers
    * serialize on the commit claim and both batches' partitions land (a
    * partition touched by both keeps the later committer's rows). For
    * read-modify-write, use [[overwritePartitionsIf]].
    */
  def overwritePartitions(name: String, df: DataFrame, partCol: String,
      touched: Seq[String]): Long =
    overwritePartitionsIf(name, df, partCol, touched, -1L)

  /** Optimistic partitioned overwrite: stage once, then commit only if the
    * table is still at `expected` ([[version]]; -1 skips the check). On
    * [[CommitConflict]] the staged data is cleaned up and the caller re-reads
    * and recomputes its batch — no update is silently lost.
    */
  def overwritePartitionsIf(name: String, df: DataFrame, partCol: String,
      touched: Seq[String], expected: Long): Long = {
    val staging = new Path(tableDir(name),
      s".staging-${java.util.UUID.randomUUID().toString.take(8)}")
    // duplicate the partition column: partitionBy consumes `_p`, keeping
    // partCol itself inside the data files. The value is URL-encoded first
    // so staging dir names stay ASCII regardless of the JVM's filesystem
    // encoding (non-ASCII partition values are otherwise unwritable on a
    // POSIX-locale driver).
    val encUdf = org.apache.spark.sql.functions.udf(Catalog.encodePart _)
    df.withColumn("_p", encUdf(org.apache.spark.sql.functions.col(partCol)))
      .write.partitionBy("_p").mode("overwrite").parquet(staging.toString)

    val v =
      try claimNext(name, expected)
      catch { case e: Throwable => fs.delete(staging, true); throw e }
    // under the claim the base manifest is stable: no other writer can commit
    val mf = partitionManifest(name)
    var next = mf
    touched.distinct.foreach { p =>
      val stagedDir = new Path(staging,
        "_p=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(enc(p)))
      if (fs.exists(stagedDir)) {
        val nv = mf.getOrElse(p, 0L) + 1
        val dest = partDataDir(name, p, nv)
        fs.mkdirs(dest.getParent)
        if (fs.exists(dest)) fs.delete(dest, true) // leftover of a crashed claimant
        if (!fs.rename(stagedDir, dest))
          sys.error(s"failed to commit partition $p of $name")
        next = next + (p -> nv)
      } else next = next - p // partition emptied by this batch
    }
    fs.delete(staging, true)

    val body = next.toSeq.sortBy(_._1)
      .map { case (p, ver) => s"$ver\t${enc(p)}" }.mkString("\n")
    val tmp = new Path(tableDir(name), s"_MANIFEST.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (fs.exists(manifestFile(name, v))) // leftover of a crashed claimant
      fs.delete(manifestFile(name, v), false)
    if (!fs.rename(tmp, manifestFile(name, v)))
      sys.error(s"failed to write manifest v=$v for $name")
    flipLatest(name, v)

    // GC: keep current + previous data version per touched partition and the
    // two latest manifests/claims; everything older goes
    touched.distinct.foreach { p =>
      next.get(p).foreach { nv =>
        val pd = partDataDir(name, p, nv).getParent
        if (fs.exists(pd)) fs.listStatus(pd).foreach { st =>
          val n = st.getPath.getName
          if (n.startsWith("v=") && n.stripPrefix("v=").toLong < nv - 1)
            fs.delete(st.getPath, true)
        }
      }
    }
    gcVersions(name, v)
    if (autoVacuumEvery > 0 && v % autoVacuumEvery == 0)
      vacuumPartitions(name, retainPrevious = true)
    v
  }

  // (companion at end of file holds the serializable partition-value codec)

  /** Remove partition data dirs the current manifest no longer references
    * (emptied partitions keep their last data dir on disk until vacuumed —
    * in-flight readers of the previous snapshot may still need it, so run
    * this only once those readers are done).
    */
  def vacuumPartitions(name: String): Int =
    vacuumPartitions(name, retainPrevious = false)

  /** Vacuum variant safe to run while readers of the previous snapshot are
    * still in flight: retains every data dir referenced by the current OR the
    * previous manifest (the commit retention window). This is what the
    * auto-vacuum hook (`spark.graft.catalog.autoVacuumEvery`) calls.
    */
  def vacuumPartitions(name: String, retainPrevious: Boolean): Int = {
    val v = version(name)
    val current = manifestAt(name, v)
    val previous = if (retainPrevious && v > 1) manifestAt(name, v - 1) else Map.empty[String, Long]
    val keep: Map[String, Set[Long]] = (current.toSeq ++ previous.toSeq)
      .groupBy(_._1).map { case (p, vs) => p -> vs.map(_._2).toSet }
    val partsRoot = new Path(tableDir(name), "parts")
    if (!fs.exists(partsRoot)) return 0
    var removed = 0
    fs.listStatus(partsRoot).foreach { pd =>
      val part = java.net.URLDecoder.decode(pd.getPath.getName, "UTF-8")
      keep.get(part) match {
        case None =>
          fs.delete(pd.getPath, true); removed += 1
        case Some(vers) =>
          fs.listStatus(pd.getPath).foreach { vd =>
            val n = vd.getPath.getName
            if (n.startsWith("v=") && !vers.contains(n.stripPrefix("v=").toLong)) {
              fs.delete(vd.getPath, true); removed += 1
            }
          }
      }
    }
    removed
  }
}

object Catalog {
  /** URL-encode a partition value for use as a directory name (kept in the
    * companion so the staging write's UDF closure stays serializable).
    */
  private[storage] def encodePart(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
}
