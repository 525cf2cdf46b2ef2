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

  /** Cold/warm pass split for persisted-input queries (r12 finding 1):
    * QBench's plain min-of-2-after-warmup reads any query whose plan hits
    * the CacheManager (a persist()ed input frame, or a structurally
    * identical cached plan from the previous pass) CACHE-WARM, so its
    * at-scale cost was inferred, never observed. Here every COLD pass is
    * preceded by `spark.catalog.clearCache()` (so persist() inputs really
    * recompute — their materialization is part of the honest cold cost),
    * and the WARM passes re-run without clearing. One untimed warmup pass
    * first keeps JIT/codegen out of the cold figure: cold means
    * cache-cold, not JVM-cold. Returns (name, coldSec, warmSec), each
    * min-of-2.
    */
  def timeColdWarm(spark: SparkSession, dir: String,
      names: Seq[String]): Seq[(String, Double, Double)] = {
    val byName = SparkEntry.allQ.map(q => q.name -> q).toMap
    names.flatMap(byName.get).map { q =>
      def pass(): Double = {
        val t0 = System.nanoTime()
        try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable => System.err.println(s"[bench] ${q.name} failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      pass() // untimed: JIT + codegen + parquet footers
      val cold = (1 to 2).map { _ => spark.catalog.clearCache(); pass() }.min
      val warm = (1 to 2).map(_ => pass()).min
      (q.name, cold, warm)
    }
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
    scala.util.Using(scala.io.Source.fromFile("/proc/loadavg"))(
      _.mkString.trim.split("\\s+").take(3).mkString("[", ",", "]"))
      .getOrElse("[]")

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
    * probe's seconds in the same JVM. Pass `loadavgBefore` (captured with
    * [[loadavgJson]] BEFORE the timed set) so the artifact separates
    * pre-existing box load from the bench's own contribution — the
    * after-read's 1-min field includes the bench itself (r12 finding 3).
    */
  def sentinelJson(spark: SparkSession, loadavgBefore: String = ""): String = {
    val before =
      if (loadavgBefore.isEmpty) "" else s""","loadavg_before":$loadavgBefore"""
    f"""$before,"loadavg":${loadavgJson()},"calibration_sec":${calibrationSec(spark)}%.3f"""
  }

  /** 1-minute loadavg, or 0.0 where /proc is unavailable */
  def loadavg1m(): Double =
    scala.util.Using(scala.io.Source.fromFile("/proc/loadavg"))(
      _.mkString.trim.split("\\s+").head.toDouble).getOrElse(0.0)

  /** Refuse to measure on a hot box (r14 verdict item 2: BENCH_r14 went
    * out 21% slow at loadavg 5.68 — the one cross-round artifact box
    * state can still poison). Wait for 1-min loadavg <= `threshold`,
    * polling every `sleepSec`, up to `maxWaitSec`; returns true when the
    * box settled, false when the wait expired (the caller then emits
    * `"contended": true` so tooling can flag the artifact instead of a
    * reader mistaking load noise for a regression).
    */
  def awaitIdle(threshold: Double = 2.0, sleepSec: Int = 30,
      maxWaitSec: Int = 300): Boolean = {
    val deadline = System.currentTimeMillis() + maxWaitSec * 1000L
    var load = loadavg1m()
    while (load > threshold && System.currentTimeMillis() < deadline) {
      System.err.println(
        f"[bench] box is hot (loadavg $load%.2f > $threshold%.1f); " +
          s"waiting ${sleepSec}s for it to settle")
      Thread.sleep(sleepSec * 1000L)
      load = loadavg1m()
    }
    load <= threshold
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val settled = awaitIdle()
    val loadBefore = loadavgJson()
    val spark = benchSession("graft-bench")
    // page-cache warmup: the per-query warmup pass in timeSet covers JIT +
    // codegen, but a cold OS page cache still inflated a first idle run by
    // ~35% (r12 finding 3: 8.81 s vs 6.56 s with an idle CPU calibration).
    // One discarded full pass touches every input file before any timing.
    timeHeadline(spark, sfDir)
    // r15 verdict item 4: BENCH_r15 passed the 1-min loadavg gate and
    // still read 34% over idle — the tell was the warmup calibration
    // (0.191 s vs the ~0.15 idle floor) while the 5-min loadavg was 6.2.
    // Gate on the signal that actually predicted contention: after the
    // discarded warmup, the calibration probe must be at/below the
    // ceiling; one sleep-and-retry, else the artifact carries
    // "contended": true.
    val calCeiling =
      sys.env.getOrElse("SPARK_GRAFT_CAL_CEILING", "0.17").toDouble
    var calGate = calibrationSec(spark)
    var calSettled = calGate <= calCeiling
    if (!calSettled) {
      System.err.println(f"[bench] warmup calibration exceeded the " +
        f"$calCeiling%.2f s idle ceiling; sleeping 60s and retrying once")
      Thread.sleep(60000L)
      calGate = calibrationSec(spark)
      calSettled = calGate <= calCeiling
    }
    val results = timeHeadline(spark, sfDir)
    // the heavy-path regression canary (r13 verdict item 3): the 8-query
    // headline set is all sub-second and no longer exercises the
    // operator class that dominates real cost (q212's full substring
    // strip pipeline). Timed with the cold/warm split, reported as a
    // separate `heavy` object so the historic `value` total stays
    // comparable across rounds.
    val heavy = timeColdWarm(spark, sfDir, Seq("q212_curation_v3"))
    val heavyJson = heavy.map { case (k, c, w) =>
      "\"" + k + f"""\":{"cold":$c%.3f,"warm":$w%.3f}"""
    }.mkString("{", ",", "}")
    // r16 verdict item 4: the gate decided on `calGate` but the JSON's
    // calibration_sec was a LATER sentinel probe — an artifact could read
    // over-ceiling while claiming settled. Report BOTH probes, and flag
    // `contended` whenever the post-set probe itself exceeds the ceiling,
    // so no over-ceiling reading ever ships unflagged.
    val calAfter = calibrationSec(spark)
    val sentinel = f""","loadavg_before":$loadBefore""" +
      f""","loadavg":${loadavgJson()}""" +
      f""","calibration_sec":$calAfter%.3f""" +
      f""","calibration_gate_sec":$calGate%.3f"""
    val contended =
      if (settled && calSettled && calAfter <= calCeiling) ""
      else ""","contended":true"""
    println(jsonLine(results, sfDir,
      s""","heavy":$heavyJson$sentinel$contended"""))
    spark.stop()
  }
}
