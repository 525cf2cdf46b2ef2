package graft.tools

import org.apache.spark.sql.SparkSession

import graft.cluster.Clusterize

/** Chain-graph stress for connectedComponents (worst-case diameter). */
object CCDebug {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (0 until n).flatMap(i =>
      Seq((f"r$i%04d", s"k$i"), (f"r$i%04d", s"k${i + 1}")))
      .toDF("id", "key")
    val t0 = System.nanoTime()
    val comps = Clusterize.connectedComponents(edges)
    val distinct = comps.select("component").distinct().count()
    println(f"[ccdebug] n=$n components=$distinct elapsed=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
