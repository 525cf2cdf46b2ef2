package graft.tools

/** Ad-hoc timing of named gate queries while iterating on an operator:
  * `runMain graft.tools.QBench <sfDir> <qname> [<qname> …]` — one warmup
  * plus one timed pass each (same harness as the driver bench), one JSON
  * line out.
  *
  * With `--coldwarm` as the first argument, each query instead gets the
  * [[graft.Bench.timeColdWarm]] treatment: COLD passes preceded by
  * `clearCache()` (persist()ed inputs genuinely recompute) and WARM
  * passes that reuse the cache — so persisted-input queries (q214 &c.)
  * land a directly-measured cold at-scale figure in the artifact instead
  * of an inferred bound. The JSON line then carries `queries` = cold
  * seconds and a parallel `warm` object.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val coldWarm = args.headOption.contains("--coldwarm")
    val rest = if (coldWarm) args.tail else args
    require(rest.length >= 2,
      "usage: QBench [--coldwarm] <sfDir> <qname> [<qname> ...]")
    val dir = rest.head
    val loadBefore = graft.Bench.loadavgJson()
    val spark = graft.Bench.benchSession("graft-qbench")
    if (coldWarm) {
      val cw = graft.Bench.timeColdWarm(spark, dir, rest.tail.toSeq)
      val warm = cw.map { case (k, _, w) => "\"" + k + f"""\":$w%.3f""" }
        .mkString("{", ",", "}")
      println(graft.Bench.jsonLine(cw.map { case (k, c, _) => (k, c) }, dir,
        s""","warm":$warm${graft.Bench.sentinelJson(spark, loadBefore)}"""))
    } else {
      val results = graft.Bench.timeNamed(spark, dir, rest.tail.toSeq)
      println(graft.Bench.jsonLine(results, dir,
        graft.Bench.sentinelJson(spark, loadBefore)))
    }
    spark.stop()
  }
}

/** prints every registered gate-query name, one per line — the name
  * source for tools/run_gate.sh's slice-policy exclusion list
  */
object PrintQueries {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.allQ.foreach(q => println(q.name))
}
