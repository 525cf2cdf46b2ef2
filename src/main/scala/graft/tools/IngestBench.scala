package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.{MatchKeyConfig, Reservoir}

/** Domain-path soak: synthesize N records with controlled key-collision
  * structure, then measure initial ingest+clustering, an incremental batch,
  * cluster listing, stats, and an OAI page.
  *
  * Usage: runMain graft.tools.IngestBench [nRecords] [batchSize]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(50000)
    val batch = args.lift(1).map(_.toInt).getOrElse(5000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("graft-soak").toString
    val r = new Reservoir(spark, root, "bench")
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))

    // every ~3 records share an issn -> clusters of ~3 (the PALCI shape:
    // ~3 match entries per bib, database/create-shared-index-database.sql:97)
    def mkBatch(from: Int, count: Int) = {
      spark.range(from, from + count).select(
        concat(lit("L"), col("id")).as("localId"),
        lit("SRC1").as("sourceId"),
        lit(1).as("sourceVersion"),
        concat(lit("""{"marc":{"leader":"x","fields":[{"001":"L"""), col("id"),
          lit(""""}]},"inventory":{"issn":["K"""), (col("id") / 3).cast("long"),
          lit(""""]}}""")).as("payloadJson"),
        lit(false).as("delete"))
    }

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[soak] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      v
    }

    val s1 = time(s"initial ingest+cluster of $n") { r.ingest(mkBatch(0, n)) }
    println(s"[soak] stats: $s1")
    val s2 = time(s"incremental batch of $batch") {
      r.ingest(mkBatch(n, batch))
    }
    println(s"[soak] stats: $s2")
    time("cluster count") { println("[soak] clusters: " + r.clusters("issn").count()) }
    time("cql cluster lookup") {
      println("[soak] hit: " + r.clusters("issn", "localId = L42").count())
    }
    time("pool stats") { r.stats("issn").show(5, truncate = false) }
    time("oai page (1000)") {
      val p = r.listRecords("issn", limit = 1000)
      println(s"[soak] page items=${p.items.length} token=${p.resumptionToken.isDefined}")
    }
    spark.stop()
  }
}
