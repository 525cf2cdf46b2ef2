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
}
