package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Semantic checks for the ordered funnel beyond what the q136 oracle pins:
  * strict-sequence ordering (an early stage-2 event before stage 1 doesn't
  * count), the per-step horizon window, and cohort-retention offsets.
  */
class FunnelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ev(u: Long, ms: Long, et: String) = (u, new Timestamp(ms), et)

  test("strict sequence: a click before the first view does not convert") {
    import spark.implicits._
    val events = Seq(
      ev(1, 1000, "click"), // too early — precedes the first view
      ev(1, 2000, "view"),
      ev(2, 1000, "view"), ev(2, 3000, "click"), ev(2, 9000, "purchase"),
      ev(3, 500, "purchase") // purchase alone reaches stage 0
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 1, 2L -> 3, 3L -> 0))
  }

  test("horizon bounds each step against the PREVIOUS stage time") {
    import spark.implicits._
    val events = Seq(
      // user 1: click 5s after view (inside 10s horizon), purchase 11s
      // after click (outside) — stage 2
      ev(1, 0, "view"), ev(1, 5000, "click"), ev(1, 16001, "purchase"),
      // user 2: click at exactly horizon boundary (10s) still counts;
      // purchase 10s after the click counts too — stage 3
      ev(2, 0, "view"), ev(2, 10000, "click"), ev(2, 20000, "purchase"),
      // user 3: a later in-horizon click must NOT resurrect the funnel
      // once the earliest qualifying click is chosen... the funnel takes
      // the EARLIEST in-horizon click (3s), so the 25s purchase is out
      ev(3, 0, "view"), ev(3, 3000, "click"), ev(3, 9000, "click"),
      ev(3, 25000, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.funnelTimes(events, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), horizonSec = Some(10L))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 2, 2L -> 3, 3L -> 2))
  }

  test("cohort retention counts distinct users per week offset") {
    import spark.implicits._
    val week = 7L * 86400L * 1000L
    // week 0 starts Mon 1970-01-05 (epoch day 4) in ISO truncation
    val base = 4L * 86400L * 1000L
    val events = Seq(
      ev(1, base, "view"), ev(1, base + week + 1000, "view"),    // w0, w1
      ev(2, base + 1000, "view"), ev(2, base + 2 * week, "view"),// w0, w2
      ev(3, base + week, "view")                                  // w1 cohort
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.cohortRetention(events, "user_id", "ts")
      .collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == Set(
      (base, 0L, 2L, 1000000L),        // cohort w0: both users
      (base, 1L, 1L, 500000L),         // user 1 back in w1
      (base, 2L, 1L, 500000L),         // user 2 back in w2
      (base + week, 0L, 1L, 1000000L)  // cohort w1: user 3
    ))
  }
}
