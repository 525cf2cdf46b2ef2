package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Per-JOB wall-time breakdown of one gate query (diagnostic, r17
  * optimization round): runs the named query once warm, then re-runs it
  * with a listener recording every job's (description, wall seconds,
  * task count), and prints jobs in submission order plus a by-description
  * rollup. Where a query is a long orchestration (the corpus-store
  * builds), this attributes the wall to phases without the Spark UI.
  *
  * usage: run_main.sh graft.tools.JobProbe <sfDir> <queryName>
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.lift(1).getOrElse("q216_corpus_store")
    val spark = graft.Bench.benchSession("graft-jobprobe")
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.allQ.find(_.name == name)
      .getOrElse(sys.error(s"unknown query $name"))

    def pass(): Double = {
      val t0 = System.nanoTime()
      q.fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    pass() // warmup
    spark.catalog.clearCache()

    case class J(id: Int, desc: String, submitted: Long, var ended: Long = 0L,
      var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = jobs.synchronized {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs(e.jobId) = J(e.jobId, d, e.time,
          tasks = e.stageInfos.map(_.numTasks).sum)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(e.jobId).foreach(_.ended = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val wall = pass()
    Thread.sleep(1000) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)

    val js = jobs.values.toSeq
    println(f"[jobprobe] $name total wall $wall%.2f s, ${js.size} jobs, " +
      f"sum-of-jobs ${js.map(j => (j.ended - j.submitted) / 1e3).sum}%.2f s")
    js.foreach { j =>
      val sec = (j.ended - j.submitted) / 1e3
      println(f"[job] ${j.id}%4d ${sec}%7.3f s ${j.tasks}%5d tasks  ${j.desc.take(90)}")
    }
    println("[rollup by description]")
    js.groupBy(_.desc).map { case (d, g) =>
      (g.map(j => (j.ended - j.submitted) / 1e3).sum, g.size, d)
    }.toSeq.sortBy(-_._1).foreach { case (s, n, d) =>
      println(f"[rollup] $s%7.3f s  $n%3d jobs  ${d.take(90)}")
    }
    spark.stop()
  }
}
