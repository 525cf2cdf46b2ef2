package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":…,"value":N,"unit":"sec","queries":{…}}.
  *
  * Each query is forced end-to-end with a noop write (count() alone could
  * skip work via column pruning on non-aggregating plans).
  */
object Bench {

  /** the session shape every bench main shares */
  def benchSession(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** one warmup pass (JIT + codegen + parquet footer cache) then one timed
    * pass of the headline set against `dir`; failures log and score their
    * elapsed time
    */
  def timeHeadline(spark: SparkSession, dir: String): Seq[(String, Double)] =
    timeSet(spark, dir, SparkEntry.allQ.filter(_.headline))

  /** [[timeHeadline]] for an explicit query-name list (ScaleBench slopes
    * over non-headline operators); unknown names are ignored
    */
  def timeNamed(spark: SparkSession, dir: String,
      names: Seq[String]): Seq[(String, Double)] = {
    val byName = SparkEntry.allQ.map(q => q.name -> q).toMap
    timeSet(spark, dir, names.flatMap(byName.get))
  }

  private def timeSet(spark: SparkSession, dir: String,
      qs: Seq[graft.operators.Q]): Seq[(String, Double)] = {
    qs.foreach { q =>
      try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    // best of 2 timed passes per query: transient box contention inflates a
    // single pass by 5-30x (observed r6/r8); min-of-2 keeps the honest cost
    qs.map { q =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      q.name -> times.min
    }
  }

  /** the driver-contract single JSON result line; `extra` is appended
    * verbatim inside the object (the box-state sentinel fields)
    */
  def jsonLine(results: Seq[(String, Double)], sfLabel: String,
      extra: String = ""): String = {
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfLabel"$extra}"""
  }

  /** first three /proc/loadavg fields as a JSON array ("[0.42,1.10,1.55]");
    * "[]" where the proc file is unavailable
    */
  def loadavgJson(): String =
    try scala.io.Source.fromFile("/proc/loadavg").mkString.trim
      .split("\\s+").take(3).mkString("[", ",", "]")
    catch { case _: Throwable => "[]" }

  /** Fixed-cost calibration probe: sum 10⁹ longs through whole-stage
    * codegen — data-independent constant work, so its wall time moves ONLY
    * with box contention. Recorded beside every timed set (min of 2, like
    * the queries) so an artifact reader can tell load noise from a plan
    * regression without rerunning (the r11 8.06 s-vs-6.25 s lesson).
    */
  def calibrationSec(spark: SparkSession): Double =
    (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1000000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min

  /** the sentinel JSON fields for one timed set: loadavg read AFTER the
    * set (what the measurements just competed with) + the calibration
    * probe's seconds in the same JVM
    */
  def sentinelJson(spark: SparkSession): String =
    f""","loadavg":${loadavgJson()},"calibration_sec":${calibrationSec(spark)}%.3f"""

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = benchSession("graft-bench")
    val results = timeHeadline(spark, sfDir)
    println(jsonLine(results, sfDir, sentinelJson(spark)))
    spark.stop()
  }
}
