package graft.tools

/** Full-registry timing sweep (diagnostic, r17 optimization round): times
  * EVERY registered gate query on `sfDir` — one untimed warmup pass then
  * min-of-`passes` noop-forced passes per query, clearing the SQL cache
  * between queries (persist() lifetimes are per-query, as in Verify) — and
  * prints one `[sweep] <name> <sec>` line per query AS IT FINISHES, so a
  * long run has incremental results. Ends with the standard one-line JSON.
  *
  * usage: run_main.sh graft.tools.SweepBench <sfDir> [passes] [startAt]
  */
object SweepBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = args.lift(1).map(_.toInt).getOrElse(2)
    val startAt = args.lift(2).getOrElse("")
    val spark = graft.Bench.benchSession("graft-sweep")
    val qs = graft.SparkEntry.allQ.dropWhile(q =>
      startAt.nonEmpty && q.name != startAt)
    val results = qs.map { q =>
      spark.sparkContext.setJobDescription(q.name)
      def pass(): Double = {
        val t0 = System.nanoTime()
        try q.fn(spark, dir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          System.err.println(s"[sweep] ${q.name} FAILED: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      pass() // warmup: JIT + codegen + footers
      val best = (1 to passes).map(_ => pass()).min
      spark.catalog.clearCache()
      println(f"[sweep] ${q.name}%-34s $best%8.3f s")
      Console.flush()
      q.name -> best
    }
    println(graft.Bench.jsonLine(results, dir,
      graft.Bench.sentinelJson(spark)))
    spark.stop()
  }
}
