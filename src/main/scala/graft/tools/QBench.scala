package graft.tools

/** Ad-hoc timing of named gate queries while iterating on an operator:
  * `runMain graft.tools.QBench <sfDir> <qname> [<qname> …]` — one warmup
  * plus one timed pass each (same harness as the driver bench), one JSON
  * line out.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QBench <sfDir> <qname> [<qname> ...]")
    val dir = args.head
    val spark = graft.Bench.benchSession("graft-qbench")
    val results = graft.Bench.timeNamed(spark, dir, args.tail.toSeq)
    println(graft.Bench.jsonLine(results, dir, graft.Bench.sentinelJson(spark)))
    spark.stop()
  }
}
