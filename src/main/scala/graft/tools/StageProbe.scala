package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stage-level cost probe for the composed dedup→strip pipeline (the
  * q212/q216 shape): materializes each intermediate with a noop write and
  * prints its wall seconds, so a composition that costs 10× the sum of its
  * stages (observed at 10× in round 14) can be attributed to ONE stage
  * instead of guessed at. Diagnostic only — not part of the gate.
  *
  * usage: run_main.sh graft.tools.StageProbe <sfDir>
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Bench.benchSession("graft-stageprobe")
    val t = graft.Tables(spark, dir)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def force(label: String, df: DataFrame): Unit =
      time(label)(df.write.format("noop").mode("overwrite").save())

    val base = t.documents.select(col("doc_id"), col("source"),
      md5(encode(graft.dedup.Normalize.normalizeText(col("text")), "UTF-8"))
        .as("grp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("base (normalize+md5)")(base.count())
    val canon = base.groupBy(col("grp"))
      .agg(min(col("doc_id")).as("_graft_canon"))
    val keptIds = base.join(canon, "grp")
      .filter(col("doc_id") === col("_graft_canon"))
      .select(col("doc_id"), col("source"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("keptIds")(keptIds.count())
    val kept = t.documents.select(col("doc_id"), col("text"))
      .join(keptIds.select(col("doc_id")), "doc_id")

    val toks = graft.dedup.SubstringDedup.tokenFrame(kept, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("toks materialize")(toks.count())

    val spans = graft.dedup.SubstringDedup.crossDocSpans(toks, "doc_id",
      minWords = 50, minDocs = 2)
    force("spans", spans)
    val verdicts = graft.dedup.SubstringDedup.dedupVerdicts(spans, "doc_id")
    force("verdicts", verdicts)
    val stripped = graft.dedup.SubstringDedup
      .applyKeepOne(toks, verdicts, "doc_id")
      .join(keptIds, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    force("stripped+src", stripped)
    val screened = graft.curation.RobustStats.madKeep(
      stripped, "source", "n_tokens_after", kTenths = 35)
    force("mad screen", screened)
    force("census", screened.groupBy(col("source").as("g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens_after")).as("tokens_after")))
    spark.stop()
  }
}
