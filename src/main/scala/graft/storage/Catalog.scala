package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Tenant-namespaced table layout on parquet with a snapshot-commit protocol
  * (SURVEY.md §7.1 step 3): each table lives at
  * `<root>/<tenant>/<table>/v=<N>`; `_LATEST` names the committed version and
  * is replaced atomically (write-temp + rename), so concurrent readers always
  * see a complete snapshot and resumption-token pagination can pin a version
  * (SURVEY.md §7.4 risk 5). Replaces the reference's per-tenant PostgreSQL
  * schemas (Storage.java:81-92) and its MVCC isolation.
  */
final class Catalog(val spark: SparkSession, root: String, tenant: String) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(name: String) = new Path(s"$root/$tenant/$name")

  private def latestFile(name: String) = new Path(tableDir(name), "_LATEST")

  def latestVersion(name: String): Option[Long] = {
    val f = latestFile(name)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

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

  /** Write the next version and commit it atomically. Returns the version. */
  def write(name: String, df: DataFrame): Long = {
    val v = latestVersion(name).getOrElse(0L) + 1
    df.write.mode("overwrite").parquet(new Path(tableDir(name), s"v=$v").toString)
    val tmp = new Path(tableDir(name), s"_LATEST.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, latestFile(name))) {
      fs.delete(latestFile(name), false)
      fs.rename(tmp, latestFile(name))
    }
    // retain the two latest versions for in-flight readers; GC the rest
    val keep = Set(s"v=$v", s"v=${v - 1}", "_LATEST")
    if (fs.exists(tableDir(name))) {
      fs.listStatus(tableDir(name)).foreach { st =>
        if (!keep.contains(st.getPath.getName)) fs.delete(st.getPath, true)
      }
    }
    v
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

  /** current partition manifest: part value → data version (empty if none) */
  def partitionManifest(name: String): Map[String, Long] =
    latestVersion(name) match {
      case None => Map.empty
      case Some(v) =>
        val in = fs.open(manifestFile(name, v))
        val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        text.split("\n").filter(_.nonEmpty).map { line =>
          val Array(ver, part) = line.split("\t", 2)
          java.net.URLDecoder.decode(part, "UTF-8") -> ver.toLong
        }.toMap
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
    * read, written, or moved.
    */
  def overwritePartitions(name: String, df: DataFrame, partCol: String,
      touched: Seq[String]): Long = {
    val mf = partitionManifest(name)
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

    var next = mf
    touched.distinct.foreach { p =>
      val stagedDir = new Path(staging,
        "_p=" + org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .escapePathName(enc(p)))
      if (fs.exists(stagedDir)) {
        val nv = mf.getOrElse(p, 0L) + 1
        val dest = partDataDir(name, p, nv)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(stagedDir, dest))
          sys.error(s"failed to commit partition $p of $name")
        next = next + (p -> nv)
      } else next = next - p // partition emptied by this batch
    }
    fs.delete(staging, true)

    val v = latestVersion(name).getOrElse(0L) + 1
    val body = next.toSeq.sortBy(_._1)
      .map { case (p, ver) => s"$ver\t${enc(p)}" }.mkString("\n")
    val tmp = new Path(tableDir(name), s"_MANIFEST.tmp.$v")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, manifestFile(name, v)))
      sys.error(s"failed to write manifest v=$v for $name")
    val lt = new Path(tableDir(name), s"_LATEST.tmp.$v")
    val lo = fs.create(lt, true)
    try lo.write(v.toString.getBytes("UTF-8")) finally lo.close()
    if (!fs.rename(lt, latestFile(name))) {
      fs.delete(latestFile(name), false)
      fs.rename(lt, latestFile(name))
    }

    // GC: keep current + previous data version per touched partition and the
    // two latest manifests; everything older goes
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
    fs.listStatus(tableDir(name)).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith("_MANIFEST.v=") &&
          n.stripPrefix("_MANIFEST.v=").toLong < v - 1)
        fs.delete(st.getPath, false)
    }
    v
  }

  // (companion at end of file holds the serializable partition-value codec)

  /** Remove partition data dirs no longer referenced by the current
    * manifest (emptied partitions keep their last data dir on disk until
    * vacuumed — in-flight readers of the previous snapshot may still need
    * it, so run this only once those readers are done).
    */
  def vacuumPartitions(name: String): Int = {
    val mf = partitionManifest(name)
    val partsRoot = new Path(tableDir(name), "parts")
    if (!fs.exists(partsRoot)) return 0
    var removed = 0
    fs.listStatus(partsRoot).foreach { pd =>
      val part = java.net.URLDecoder.decode(pd.getPath.getName, "UTF-8")
      mf.get(part) match {
        case None =>
          fs.delete(pd.getPath, true); removed += 1
        case Some(ver) =>
          fs.listStatus(pd.getPath).foreach { vd =>
            val n = vd.getPath.getName
            if (n.startsWith("v=") && n.stripPrefix("v=").toLong < ver - 1) {
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
