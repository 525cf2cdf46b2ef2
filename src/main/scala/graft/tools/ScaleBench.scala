package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling-slope datapoint: materializes an N×-replicated copy of a
  * driver-generated sf directory (facts key-shifted so joins stay 1:1,
  * dimensions copied as-is, document text perturbed per replica so the
  * dedup rate is preserved rather than multiplied), then times the headline
  * bench set on it. With N=10 over sf0.1 this approximates sf1 — the 10×
  * point that shows whether the headline plans scale linearly or hide a
  * super-linear stage.
  *
  * Usage: runMain graft.tools.ScaleBench [mult] [srcDir] [workDir]
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(2).getOrElse("/tmp/graft-scalebench")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalebench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(work), true)

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      // split into many files so scans parallelize like a real big input
      df.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(s"$work/$t.parquet")

    /** replicate `mult`× shifting `keys` by replica × (max+1) — replica 0 is
      * the original, so per-key join fan-in/fan-out is unchanged
      */
    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val spans = keys.map(k =>
        k -> (df.agg(max(col(k))).head.getLong(0) + 1L)).toMap
      val rep = df.withColumn("_r", explode(sequence(lit(0L), lit(mult - 1L))))
      keys.foldLeft(rep)((d, k) =>
        d.withColumn(k, col(k) + col("_r") * lit(spans(k)))).drop("_r")
    }

    // dimensions: copy; facts: key-shifted replicas
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))
    write(replicate(read("orders"), Seq("o_orderkey")), "orders")
    write(replicate(read("lineitem"), Seq("l_orderkey")), "lineitem")
    // Per-replica text salting keeps exact/near-dup DENSITY constant
    // instead of making every doc a 10-way near-duplicate of its copies: a
    // replica token interleaved every 4 words shifts most 3-gram shingle
    // windows, pushing cross-replica jaccard far below the 0.5 threshold
    // while each replica's own dup groups stay intact (replica 0 = the
    // original corpus verbatim).
    val docMax = read("documents").agg(max(col("doc_id"))).head.getLong(0) + 1L
    write(replicate(read("documents"), Seq("doc_id"))
      .withColumn("text", udf { (text: String, docId: Long) =>
        val rep = docId / docMax
        if (rep == 0L) text
        else text.split(" ").grouped(4)
          .map(g => (g :+ s"rep$rep").mkString(" ")).mkString(" ")
      }.apply(col("text"), col("doc_id"))), "documents")
    write(replicate(read("embeddings"), Seq("vec_id")), "embeddings")

    val headline = graft.SparkEntry.allQ.filter(_.headline)
    headline.foreach { q => // warmup: JIT + codegen + footer cache
      try q.fn(spark, work).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    val results = headline.map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, work).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[scalebench] ${q.name} failed: $e") }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"${mult}x($src)"}""")
    fs.delete(new Path(work), true)
    spark.stop()
  }
}
