package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: latest right row with time <= left time, inclusive
  * boundary, per-key isolation, null when nothing precedes.
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matches latest prior-or-equal right row per key, null before any") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 105.0),
      (2L, ts("2024-01-01 10:01:00"), 200.0)
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 09:59:59")), // before any quote → null
      (11L, 1L, ts("2024-01-01 10:00:00")), // equal boundary → 100
      (12L, 1L, ts("2024-01-01 10:04:59")), // between → 100
      (13L, 1L, ts("2024-01-01 11:00:00")), // after both → 105
      (14L, 2L, ts("2024-01-01 10:30:00"))  // other key → 200, never key 1's
    ).toDF("trade_id", "user_id", "ts")
    val got = AsOfJoin.asOf(trades, quotes, "user_id", "ts")
      .select(col("trade_id"), col("asof.px"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(
      10L -> None, 11L -> Some(100.0), 12L -> Some(100.0),
      13L -> Some(105.0), 14L -> Some(200.0)))
  }

  test("range join finds overlaps across bins without a nested loop") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val iv = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 14:00:00")), // long: 4h
      (2L, ts("2024-01-01 13:30:00"), ts("2024-01-01 13:45:00")), // inside 1
      (3L, ts("2024-01-01 14:00:00"), ts("2024-01-01 15:00:00")), // touches 1's end
      (4L, ts("2024-01-01 20:00:00"), ts("2024-01-01 21:00:00"))  // disjoint
    ).toDF("sid", "start_ts", "end_ts")
    val got = RangeJoin.intervalOverlaps(iv, "sid", "start_ts", "end_ts",
        binMicros = 1800L * 1000000)
      .select("id1", "id2", "overlap_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.keySet == Set((1L, 2L), (1L, 3L)), got.toString)
    assert(got((1L, 2L)) == 15L * 60 * 1000000, "full containment: 15 min")
    assert(got((1L, 3L)) == 0L, "boundary touch counts with zero length")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = RangeJoin.intervalOverlaps(iv, "sid", "start_ts", "end_ts",
          1800L * 1000000).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        "binned equi-join expected, not a nested loop:\n" + p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("NULL keys and times never match, left rows are preserved") {
    import spark.implicits._
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (None, Some(ts("2024-01-01 09:00:00")), 666.0), // null key: matches nothing
      (Some(2L), None, 777.0)                          // null time: matches nothing
    ).toDF("user_id", "ts", "px")
    val trades = Seq(
      (10L, Some(1L), Some(ts("2024-01-01 11:00:00"))), // normal match → 100
      (11L, None, Some(ts("2024-01-01 11:00:00"))),     // null key → null asof
      (12L, Some(2L), Some(ts("2024-01-01 11:00:00"))), // only null-time quote → null
      (13L, Some(1L), None)                             // null time → null asof
    ).toDF("trade_id", "user_id", "ts")
    val got = graft.operators.AsOfJoin.asOf(trades, quotes, "user_id", "ts")
      .select(col("trade_id"), col("asof.px"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got == Map(10L -> Some(100.0), 11L -> None, 12L -> None, 13L -> None),
      got.toString)
  }

  test("as-of join agrees with a brute-force reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // unique (key, time) per side so the match is unambiguous
    val leftRows = Seq.tabulate(300)(i =>
      (i.toLong, (rnd.nextInt(5) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L + i)))
    val rightRows = Seq.tabulate(200)(i =>
      ((rnd.nextInt(5) + 1).toLong,
        new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L + 500000L + i),
        i.toDouble))
    val l = leftRows.toDF("lid", "k", "ts")
    val r = rightRows.toDF("k", "ts", "v")
    val got = graft.operators.AsOfJoin.asOf(l, r, "k", "ts")
      .select(col("lid"), col("asof.v"))
      .collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getDouble(1))))
      .toMap
    leftRows.foreach { case (lid, k, lts) =>
      val want = rightRows.filter(rr => rr._1 == k && !rr._2.after(lts))
        .sortBy(_._2.getTime).lastOption.map(_._3)
      assert(got(lid) == want, s"lid=$lid k=$k ts=$lts")
    }
  }

  test("range join result is invariant to bin width and matches brute force") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(7)
    val ivRows = Seq.tabulate(200) { i =>
      val s = 1700000000000L + rnd.nextInt(500000) * 1000L
      // lengths up to 60s: the 1s-bin case still spans ~60 bins per interval
      (i.toLong, new Timestamp(s), new Timestamp(s + rnd.nextInt(60000) * 1000L))
    }
    val iv = ivRows.toDF("sid", "start_ts", "end_ts")
    val want = (for {
      a <- ivRows; b <- ivRows
      if a._1 < b._1 && !a._2.after(b._3) && !b._2.after(a._3)
    } yield (a._1, b._1)).toSet
    for (binMs <- Seq(1000L, 60000L, 3600000L)) {
      val got = RangeJoin.intervalOverlaps(iv, "sid", "start_ts", "end_ts",
          binMicros = binMs * 1000)
        .select("id1", "id2").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == want, s"binMs=$binMs: ${got.diff(want)} extra, ${want.diff(got)} missing")
    }
  }

  test("single shuffle shape: no join operator in the plan, one window") {
    import spark.implicits._
    val l = Seq((1L, ts("2024-01-01 10:00:00"), "a")).toDF("k", "ts", "x")
    val r = Seq((1L, ts("2024-01-01 09:00:00"), 9.0)).toDF("k", "ts", "v")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = AsOfJoin.asOf(l, r, "k", "ts").queryExecution.executedPlan.toString
      assert(!p.contains("Join"), "composed via union+window, not a range join:\n" + p)
      assert(p.contains("Window"), p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
