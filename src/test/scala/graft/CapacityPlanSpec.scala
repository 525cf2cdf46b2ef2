package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CapacityPlan

class CapacityPlanSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("serpentinePack deals ranked groups in a zigzag with balanced loads") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 9L), ("c", 8L), ("d", 7L),
      ("e", 6L), ("f", 5L), ("g", 4L), ("h", 3L)).toDF("g", "w")
    val got = CapacityPlan.serpentinePack(df, "g", col("w"), nShards = 3)
      .collect().map(r => (r.getString(0), (r.getInt(2), r.getLong(3)))).toMap
    // ranks desc: a..h -> zigzag 0,1,2,2,1,0,0,1
    assert(got.view.mapValues(_._1).toMap == Map("a" -> 0, "b" -> 1, "c" -> 2,
      "d" -> 2, "e" -> 1, "f" -> 0, "g" -> 0, "h" -> 1), got.toString)
    // loads: 19 / 18 / 15 of 52
    assert(got("a")._2 == 19L && got("b")._2 == 18L && got("c")._2 == 15L)
    // zigzag keeps every shard within ~10% of ideal on this tail
    val imb = CapacityPlan.serpentinePack(df, "g", col("w"), 3)
      .select(col("imbalance_ppm")).collect().map(_.getLong(0))
    assert(imb.forall(v => math.abs(v) < 150000L), imb.mkString(","))
  }

  test("waterfill: equal share capped at capacity, exact boundary level") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("b", 20L), ("c", 40L), ("d", 100L)).toDF("g", "c")
    val got = CapacityPlan.waterfill(df, "g", col("c"), budget = 60L)
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getBoolean(3)))).toMap
    // a fully funded (10); level λ = (60-10) div 3 = 16 for the rest
    assert(got == Map("a" -> ((10L, true)), "b" -> ((16L, false)),
      "c" -> ((16L, false)), "d" -> ((16L, false))), got.toString)
    // slack budget: everyone funded at cap
    val all = CapacityPlan.waterfill(df, "g", col("c"), budget = 1000L)
      .collect().map(r => (r.getString(0), (r.getLong(2), r.getBoolean(3)))).toMap
    assert(all.forall { case (g, (a, f)) => f &&
      a == Map("a" -> 10L, "b" -> 20L, "c" -> 40L, "d" -> 100L)(g) }, all.toString)
    // tight budget: nobody funded, flat level budget div n
    val none = CapacityPlan.waterfill(
      Seq(("x", 50L), ("y", 60L)).toDF("g", "c"), "g", col("c"), budget = 40L)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(none == Map("x" -> 20L, "y" -> 20L), none.toString)
  }
}
