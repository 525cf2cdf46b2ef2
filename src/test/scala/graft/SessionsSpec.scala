package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sessions

/** Semantic checks for batch session windows: known gap structures produce
  * exactly the expected (start, end, count) rows, and boundary events
  * exactly `gap` apart stay in one session (strictly-greater split).
  */
class SessionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("session windows split strictly after the gap, per user") {
    import spark.implicits._
    def ev(u: Long, id: Long, ms: Long) = (u, id, new Timestamp(ms))
    val events = Seq(
      // user 1: [0s, 5s] then (gap of exactly 10s keeps 15s in session 1)
      ev(1, 1, 0), ev(1, 2, 5000), ev(1, 3, 15000),
      // 10s + 1ms after 15s: next session
      ev(1, 4, 25001),
      // user 2: a single event
      ev(2, 5, 1000)
    ).toDF("user_id", "event_id", "ts")
    val got = Sessions.sessionWindows(events, "user_id", "ts", "event_id",
        gapSeconds = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 1L, 0L, 15000000L, 3L),       // 0s..15s, 3 events
      (1L, 2L, 25001000L, 25001000L, 1L), // the post-gap singleton
      (2L, 1L, 1000000L, 1000000L, 1L)))
  }

  test("session windows agree with per-event session ids aggregated") {
    import spark.implicits._
    // deterministic pseudo-random events: 5 users, bursty arrivals
    val events = (0 until 400).map { i =>
      val u = (i % 5).toLong
      val base = (i / 5) * 7000L + (i % 3) * 400L
      (u, i.toLong, new Timestamp(base))
    }.toDF("user_id", "event_id", "ts")
    val windows = Sessions.sessionWindows(events, "user_id", "ts", "event_id",
      gapSeconds = 5)
    val nEvents = windows.agg(org.apache.spark.sql.functions.sum("n_events"))
      .head.getLong(0)
    assert(nEvents == 400, "every event lands in exactly one session")
    // within each user, sessions are disjoint and ordered
    windows.collect().groupBy(_.getLong(0)).foreach { case (u, rows) =>
      val spans = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      spans.foreach { case (_, s, e) => assert(s <= e) }
      spans.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) =>
          assert(s2 - e1 > 5000000L, s"user $u: adjacent sessions within gap")
        case _ => ()
      }
    }
  }
}
