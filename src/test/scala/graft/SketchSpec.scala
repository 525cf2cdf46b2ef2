package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MisraGriesAgg

/** Misra-Gries guarantees (not exact values — that's the sketch contract):
  * every item over the frequency threshold is present, counts underestimate
  * by at most n/(k+1), and both hold under any partitioning.
  */
class SketchSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // zipf-ish stream: item i appears ~N/i times
  private def items: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"item$i"))

  private def trueCounts: Map[String, Int] =
    items.groupBy(identity).view.mapValues(_.size).toMap

  test("guarantees hold under different partitionings") {
    import spark.implicits._
    val n = items.size
    val k = 9
    val bound = n.toDouble / (k + 1)
    for (parts <- Seq(1, 4, 13)) {
      val ds = items.toDS().repartition(parts)
      val got = ds.select(new MisraGriesAgg(k).toColumn).collect().head
      assert(got.size <= k, s"parts=$parts: more than $k counters")
      // completeness: every true heavy hitter survives
      trueCounts.foreach { case (item, c) =>
        if (c > bound)
          assert(got.contains(item), s"parts=$parts: lost heavy hitter $item ($c > $bound)")
      }
      // accuracy: reported counts never exceed truth, underestimate ≤ bound
      got.foreach { case (item, est) =>
        val truth = trueCounts(item)
        assert(est <= truth, s"parts=$parts: $item overestimated ($est > $truth)")
        assert(truth - est <= bound,
          s"parts=$parts: $item error ${truth - est} > $bound")
      }
    }
  }

  test("small streams with few distinct items are exact") {
    import spark.implicits._
    val ds = Seq("a", "a", "b", "c", "a", "b").toDS()
    val got = ds.select(new MisraGriesAgg(10).toColumn).collect().head
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("KMV keeps the k smallest DISTINCT values under any partitioning") {
    import spark.implicits._
    import org.apache.spark.sql.functions.udaf
    // duplicates + shuffled order; truth = 5 smallest distinct
    val vals: Seq[Long] = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 2L, 9L, 4L, 2L)
    val want = vals.distinct.sorted.take(5)
    val kmv = udaf(new graft.curation.KmvAgg(5))
    for (parts <- Seq(1, 3, 7)) {
      val got = spark.createDataset(vals).repartition(parts)
        .select(kmv($"value")).collect().head.getSeq[Long](0)
      assert(got == want, s"parts=$parts")
    }
  }

  test("KMV merge of group sketches equals the sketch of the union") {
    val a = Seq(1L, 4L, 9L, 16L, 25L).foldLeft(Vector.empty[Long]: Seq[Long])(
      new graft.curation.KmvAgg(4).reduce)
    val b = Seq(2L, 4L, 6L, 8L, 10L).foldLeft(Vector.empty[Long]: Seq[Long])(
      new graft.curation.KmvAgg(4).reduce)
    val merged = new graft.curation.KmvAgg(4).merge(a, b)
    val direct = (Seq(1L, 4L, 9L, 16L, 25L) ++ Seq(2L, 4L, 6L, 8L, 10L))
      .distinct.sorted.take(4)
    assert(merged == direct)
  }
}
