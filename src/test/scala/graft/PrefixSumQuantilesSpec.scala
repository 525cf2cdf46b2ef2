package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PrefixSum, Quantiles}

/** Distributed-scan primitives vs sequential truth: PrefixSum.runningTotals
  * must equal a driver-side scanLeft under every partitioning, and
  * Quantiles.exactQuantiles must equal the sorted-rank definition including
  * when forced through multiple refinement rounds.
  */
class PrefixSumQuantilesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("runningTotals equals sequential scan under any partitioning") {
    import spark.implicits._
    val rnd = new Random(7)
    val rows = (1 to 500).map(i => (f"k$i%04d", rnd.nextInt(1000).toLong))
    val expected = rows.sortBy(_._1)
      .scanLeft(("", 0L, 0L)) { case ((_, cum, rank), (k, v)) =>
        (k, cum + v, rank + 1)
      }.drop(1)
    for (parts <- Seq(1, 3, 16, 100)) {
      val df = rows.toDF("k", "v").repartition(7)
        .withColumn("one", lit(1L))
      val got = PrefixSum.runningTotals(df, Seq(col("k")), Seq("v", "one"), parts)
        .select("k", "cum_v", "cum_one").as[(String, Long, Long)]
        .collect().sortBy(_._1)
      assert(got.toSeq == expected, s"parts=$parts")
    }
  }

  test("runningTotals rejects non-long value columns") {
    import spark.implicits._
    val df = Seq(("a", 1)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      PrefixSum.runningTotals(df, Seq(col("k")), Seq("v"), 2)
    }
  }

  test("exactQuantiles equals sorted-rank truth across refinement depths") {
    import spark.implicits._
    val rnd = new Random(13)
    // three groups with very different sizes, ranges, and tie densities
    val rows =
      (1 to 4000).map(i => ("wide", rnd.nextInt(1000000).toLong)) ++
      (1 to 900).map(i => ("ties", rnd.nextInt(7).toLong)) ++
      (1 to 3).map(i => ("tiny", i * 100L))
    val qs = Seq(1L, 250000L, 500000L, 900000L, 1000000L)
    def truth(g: String, q: Long): Long = {
      val vs = rows.filter(_._1 == g).map(_._2).sorted
      vs(((q * vs.size + 999999L) / 1000000L).toInt - 1)
    }
    // smallEnough=1 forces refinement to single-value convergence;
    // 10^6 default range with bins=4 needs ~10 rounds
    for ((bins, smallEnough) <- Seq((64, 8192), (64, 16), (4, 1))) {
      val got = Quantiles.exactQuantiles(rows.toDF("g", "v"), "g", "v", qs,
          bins = bins, smallEnough = smallEnough)
        .select("g", "q_ppm", "value").as[(String, Long, Long)]
        .collect().map { case (g, q, v) => (g, q) -> v }.toMap
      for (g <- Seq("wide", "ties", "tiny"); q <- qs)
        assert(got((g, q)) == truth(g, q),
          s"bins=$bins smallEnough=$smallEnough $g q=$q")
    }
  }

  test("exactWeightedQuantiles equals weighted sorted truth across depths") {
    import spark.implicits._
    val rnd = new Random(29)
    val rows = (1 to 3000).map { _ =>
      ("a", rnd.nextInt(100000).toLong, 1L + rnd.nextInt(50))
    } ++ (1 to 400).map(_ => ("ties", rnd.nextInt(5).toLong, 1L + rnd.nextInt(9)))
    val qs = Seq(100000L, 500000L, 900000L, 1000000L)
    def truth(g: String, q: Long): Long = {
      val vs = rows.filter(_._1 == g).map(t => (t._2, t._3)).sortBy(_._1)
      val w = vs.map(_._2).sum
      val target = (q * w + 999999L) / 1000000L
      var cum = 0L
      vs.find { case (_, wi) => cum += wi; cum >= target }.get._1
    }
    for ((bins, smallEnough) <- Seq((64, 8192), (8, 4))) {
      val got = Quantiles.exactWeightedQuantiles(rows.toDF("g", "v", "w"),
          "g", "v", "w", qs, bins = bins, smallEnough = smallEnough)
        .select("g", "q_ppm", "value").as[(String, Long, Long)]
        .collect().map { case (g, q, v) => (g, q) -> v }.toMap
      for (g <- Seq("a", "ties"); q <- qs)
        assert(got((g, q)) == truth(g, q),
          s"bins=$bins smallEnough=$smallEnough $g q=$q")
    }
  }

  test("exactQuantiles maxSearches guard fails fast") {
    import spark.implicits._
    val df = (1 to 100).map(i => (s"g$i", i.toLong)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(df, "g", "v", Seq(500000L), maxSearches = 10)
    }
  }
}
