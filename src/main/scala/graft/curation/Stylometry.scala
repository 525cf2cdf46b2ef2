package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Burrows' Delta stylometric distance between corpus slices — the
  * register/style drift report (is source A suddenly writing like source
  * B?) built entirely from function-word rates, the classic
  * authorship-attribution signal that survives topic shift.
  *
  * Exact integer formulation (MAD variant): per (source, function word),
  * rate `r = c·10⁶ div N_source` ppm; per word, the across-source mean
  * `µ = Σr div S` and mean absolute deviation `mad = Σ|r−µ| div S`; the
  * pairwise distance is `Σ_w |r₁−r₂|·10³ div mad` over words with mad > 0
  * (|r₁−r₂| is non-negative, so truncating division agrees across
  * engines). Using MAD instead of the classical stddev keeps every step
  * closed over the integers — no sqrt anywhere.
  *
  * Scale: one corpus-scan partial-agg'd groupBy produces the
  * (sources × function words) grid — bounded by construction (a source
  * catalog × a fixed word list), so the z-score/pair stage runs on a tiny
  * frame no matter the corpus size. Zero-count cells are materialized via
  * the grid cross join: a word a source NEVER uses is exactly the signal
  * Delta wants.
  */
object Stylometry {

  def burrowsDelta(df: DataFrame, textCol: String, sourceCol: String,
      words: Seq[String] = TextFunctions.DefaultStopwords): DataFrame = {
    require(words.nonEmpty, "burrowsDelta needs a non-empty word list")
    // ONE corpus scan: aggregate to the vocab-bounded (src, word) grid
    // first; token totals and function-word counts both derive from it
    val tokCounts = df.select(col(sourceCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = tokCounts.groupBy(col("src")).agg(sum(col("c")).as("n"))
    val counts = tokCounts.filter(col("w").isInCollection(words))
      .select(col("src"), col("w"), col("c"))
    val wordDim = totals.sparkSession.createDataFrame(
      words.map(Tuple1(_))).toDF("w")
    val rates = totals.crossJoin(broadcast(wordDim))
      .join(counts, Seq("src", "w"), "left")
      .na.fill(0L, Seq("c"))
      .select(col("src"), col("w"), expr("c * 1000000 div n").as("r"))
    val nSrc = count(lit(1))
    val stats = rates.groupBy(col("w"))
      .agg(sum(col("r")).as("_sr"), nSrc.as("_s"),
        collect_list(struct(col("src"), col("r"))).as("_rs"))
      .select(col("w"), expr("_sr div _s").as("mu"), col("_rs"), col("_s"))
      .select(col("w"), col("mu"),
        aggregate(col("_rs"), lit(0L),
          (acc, x) => acc + abs(x.getField("r") - col("mu"))).as("_sad"),
        col("_s"))
      .select(col("w"), col("mu"), expr("_sad div _s").as("mad"))
    val z = rates.join(broadcast(stats), "w").filter(col("mad") > 0)
    z.as("a").join(z.as("b"),
        col("a.w") === col("b.w") && col("a.src") < col("b.src"))
      .select(col("a.src").as("src_a"), col("b.src").as("src_b"),
        expr("abs(a.r - b.r) * 1000 div a.mad").as("_d"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_words"), sum(col("_d")).as("delta_milli_sum"))
  }
}
