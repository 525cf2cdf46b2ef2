package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.{CorpusStats, Stylometry}
import graft.operators.{ChangePoint, Funnel}
import graft.similarity.{EmbeddingStats, MarginKnn}
import graft.text.Blocklist

/** Unit semantics for the screening/monitoring operators (q151–q158):
  * tiny inputs with hand-computed expectations, plus the invariants that
  * matter at scale (overlap counting, reset behavior, sufficient-stats ≡
  * brute force).
  */
class ScreeningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AhoCorasick counts every overlapping occurrence, suffix patterns included") {
    val ac = Blocklist.AhoCorasick.forPatterns(Seq("aba", "ba", "fast table", "able"))
    // "ababa": aba at 0 and 2 (overlapping), ba at 1 and 3
    val c1 = ac.countAll("ababa")
    assert(c1.toSeq == Seq(2L, 2L, 0L, 0L))
    // "able" must fire inside "fast table" (suffix-link path)
    val c2 = ac.countAll("a fast table")
    assert(c2.toSeq == Seq(0L, 0L, 1L, 1L))
    assert(ac.countAll("").toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("screenCounts emits only matched patterns, one row per doc × pattern") {
    import spark.implicits._
    val df = Seq((1L, "fast fast table"), (2L, "nothing here"), (3L, null: String))
      .toDF("doc_id", "text")
    val got = Blocklist.screenCounts(df, "doc_id", "text", Seq("fast", "table", "zzz"))
      .orderBy("doc_id", "pattern").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "fast", 2L), (1L, "table", 1L)))
  }

  test("cusumDaily accumulates excess, resets at zero, and alarms on sustained drift") {
    import spark.implicits._
    import java.sql.Timestamp
    // 6 days, one type: counts 1,1,1,1,4,4 → T=12, D=6, dev = c*6-12
    val rows = Seq(1, 1, 1, 1, 4, 4).zipWithIndex.flatMap { case (c, day) =>
      (0 until c).map(i => (day.toLong * 100 + i,
        Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), "tick"))
    }
    val df = rows.toDF("event_id", "ts", "event_type")
    val got = ChangePoint.cusumDaily(df, "ts", "event_type", hPpm = 1000000L)
      .orderBy("day").collect()
    // dev for c=1: -6; cusum clamps at 0 for the flat head
    assert(got.take(4).forall(r => r.getLong(3) == 0L))
    // c=4: dev = 12 → cusum 12 then 24; alarm at >= T (h=1 mean-day, T=12)
    assert(got(4).getLong(3) == 12L && got(4).getBoolean(4))
    assert(got(5).getLong(3) == 24L && got(5).getBoolean(4))
  }

  test("cusumDaily grid is the dense calendar: a totally silent day still counts") {
    import spark.implicits._
    import java.sql.Timestamp
    // events on days 1,2,4 (3 each); day 3 is silent CORPUS-WIDE.
    // dense grid: D=4, T=9 → dev = c·4−9: +3,+3,−9,+3; cusum 3,6,0,3
    val rows = Seq(1, 2, 4).flatMap { day =>
      (0 until 3).map(i => (day.toLong * 100 + i,
        Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), "tick"))
    }
    val got = ChangePoint.cusumDaily(rows.toDF("event_id", "ts", "event_type"),
        "ts", "event_type", hPpm = 1000000L)
      .orderBy("day").collect()
    assert(got.length == 4, got.mkString("; ")) // day 3 materialized with c=0
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 3L, 0L, 3L))
    assert(got.map(_.getLong(3)).toSeq == Seq(3L, 6L, 0L, 3L))
  }

  test("burrowsDelta materializes zero-count cells and scales by MAD") {
    import spark.implicits._
    // srcA uses 'the' heavily, srcB never does; 'and' identical rates
    val df = Seq(
      ("a", "the the the x"), ("b", "and y z w"),
      ("a", "and x y z"), ("b", "x y z w")).toDF("src", "text")
    val got = Stylometry.burrowsDelta(df, "text", "src", Seq("the", "and"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 1)
    val (sa, sb, nWords, delta) = got.head
    // rates ppm — the: a=375000 b=0 (mu=187500, mad=187500);
    // and: identical 125000 both → mad=0 → excluded from the distance
    assert(sa == "a" && sb == "b" && nWords == 1)
    // |375000 - 0| * 1000 div 187500 = 2000
    assert(delta == 2000L)
  }

  test("silhouetteAudit sufficient-stats equals brute-force on a tiny set") {
    import spark.implicits._
    val pts = Seq(
      (0L, 0, Seq(0.0f, 0.0f)), (1L, 0, Seq(0.001f, 0.0f)),
      (2L, 1, Seq(1.0f, 1.0f)), (3L, 1, Seq(1.001f, 1.0f)),
      (4L, 2, Seq(5.0f, 5.0f)), (5L, 2, Seq(5.0f, 5.001f)))
    val df = pts.toDF("vec_id", "label", "embedding")
    val got = EmbeddingStats.silhouetteAudit(df, "vec_id", "embedding", "label")
      .orderBy("vec_id").collect()
    assert(got.length == 6)
    // brute force in milli-quantized ints
    val q = pts.map { case (id, l, v) => (id, l, v.map(x => math.round(x * 1000.0).toLong)) }
    def d2(a: Seq[Long], b: Seq[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    got.foreach { r =>
      val id = r.getLong(0); val lab = r.getInt(1)
      val me = q.find(_._1 == id).get._3
      val own = q.filter(p => p._2 == lab && p._1 != id)
      val a = own.map(p => d2(me, p._3)).sum / own.size
      val others = q.filter(_._2 != lab).groupBy(_._2).map { case (l, ps) =>
        (l, ps.map(p => d2(me, p._3)).sum / ps.size) }
      val (bestL, b) = others.toSeq.minBy { case (l, v) => (v, l) }
      assert(r.getLong(2) == a, s"a mismatch for $id")
      assert(r.getInt(3) == bestL && r.getLong(4) == b, s"b mismatch for $id")
      assert(r.getLong(5) == (b - a) * 1000 / math.max(math.max(a, b), 1L))
    }
    // well-separated clusters → strongly positive silhouettes
    assert(got.forall(_.getLong(5) > 900))
  }

  test("marginTopK margin is 2k·dot − probeNN − candNN (hand-checked)") {
    import spark.implicits._
    // 1-D unit vectors quantize to ±1000: margins collapse to dot signs
    val probe = Seq((100L, Seq(1.0f))).toDF("vec_id", "embedding")
    val cands = Seq((1L, Seq(1.0f)), (2L, Seq(-1.0f)), (3L, Seq(1.0f)))
      .toDF("vec_id", "embedding")
    val got = MarginKnn.marginTopK(probe, cands, "vec_id", "embedding", k = 2, topN = 3)
      .orderBy("rank").collect()
      .map(r => (r.getLong(2), r.getLong(3)))
    // dots: c1=1e6, c3=1e6, c2=-1e6; probeNN(k=2)=2e6; candNN = its only dot
    // margin(c1) = 4e6·1 − 2e6 − 1e6 = 1e6; c3 same; c2 = −4e6 −2e6 +1e6... :
    assert(got.head == (1L, 1000000L))
    assert(got(1) == (3L, 1000000L))
    assert(got(2)._1 == 2L)
    assert(got(2)._2 == -1000000L * 4 - 2000000L + 1000000L)
  }

  test("semanticScreen flags only corpus vectors at/above tau with the argmax eval id") {
    import spark.implicits._
    val eval = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val corp = Seq((10L, Seq(1.0f, 0.0f)), (11L, Seq(0.7f, 0.7f)), (12L, Seq(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = MarginKnn.semanticScreen(eval, corp, "vec_id", "embedding", 500000L)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 10 → eval 0 (cos 1); 11 → tie cos≈0.707 both, argmax tie → eval 0; 12 excluded
    assert(got == Seq((10L, 0L), (11L, 0L)))
  }

  test("semanticScreen CONTRACT: an id on both sides scores itself at 1e6") {
    import spark.implicits._
    // probe/corpus are disjoint NAMESPACES by contract — no inequality
    // predicate is applied, so overlapping frames self-match. This test
    // pins that advertised behavior so a future 'fix' can't silently
    // reintroduce the id-exclusion predicate the contract dropped.
    val both = Seq((5L, Seq(1.0f, 0.0f)), (6L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = MarginKnn.semanticScreen(both, both, "vec_id", "embedding",
        900000L)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((5L, 5L, 1000000L), (6L, 6L, 1000000L)))
  }

  test("interArrivalDispersion: constant gaps → dispersion 0, bursty ≫ uniform") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(s * 1000L)
    val uniform = (0 to 10).map(i => (i.toLong, ts(i * 60), 1L))
    val bursty = (0 to 4).map(i => (100L + i, ts(i), 2L)) ++
      Seq((105L, ts(3000), 2L)) ++ (0 to 4).map(i => (106L + i, ts(3001 + i), 2L))
    val df = (uniform ++ bursty).toDF("event_id", "ts", "user_id")
    val got = Funnel.interArrivalDispersion(df, "user_id", "ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(got(1L) == 0L)
    assert(got(2L) > 1000L)
  }

  test("windowCooccurrence counts symmetric pairs within the window only") {
    import spark.implicits._
    val df = Seq(Tuple1("b a c a")).toDF("text")
    val got = CorpusStats.windowCooccurrence(df, "text", window = 2, minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // positions: b a c a; window 2 pairs: (b,a),(b,c),(a,c),(a,a),(c,a) → canon
    assert(got(("a", "b")) == 1L)
    assert(got(("b", "c")) == 1L)
    assert(got(("a", "c")) == 2L)
    assert(got(("a", "a")) == 1L)
    assert(got.values.sum == 5L)
  }

  test("PrivacyAudit.kAnonymity: group sizes, linkage risk, min l-diversity") {
    import spark.implicits._
    val df = Seq(
      ("s", "A", "x"), ("s", "A", "x"), ("s", "A", "y"), // qi A: sz 3, l 2
      ("s", "B", "z"))                                   // qi B: singleton
      .toDF("src", "qi", "sens")
    val got = graft.curation.PrivacyAudit.kAnonymity(df, col("src"),
        Seq(col("src"), col("qi")), col("sens"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq(("s", 4L, 2L, 1L, 1L, 250000L, 1L)))
  }

  test("sprtDaily: Wald boundaries, first-crossing decision, exact walk") {
    import spark.implicits._
    // type t: 2/day for the 7 baseline days, a 20-event burst on day 8,
    // back to 2 on days 9-10; type u: flat 2/day throughout
    val rows = (for {
      day <- 1 to 10
      (tp, n) <- Seq(
        ("t", if (day == 8) 20 else 2),
        ("u", 2))
      i <- 1 to n
    } yield (f"2024-01-$day%02d 00:$i%02d:00", tp)).toSeq
    val events = rows.toDF("tss", "event_type")
      .select(to_timestamp(col("tss")).as("ts"), col("event_type"))
    val got = ChangePoint.sprtDaily(events, "ts", "event_type")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getString(3), Option(r.getDate(4)).map(_.toString).orNull,
        r.getLong(5))).toMap
    // lam0 = 2.0; llr(k=20) = round((20 ln1.5 - 1)e6) = 7109302 crosses
    // +2944439 on day 8 -> reject; llr(k=2) = -189070/day never crosses
    // -2944439 in 3 test days -> continue
    assert(got("t") == ((2000000L, 3L, "reject_h0", "2024-01-08",
      7109302L - 2L * 189070L)))
    assert(got("u") == ((2000000L, 3L, "continue", null,
      -3L * 189070L)))
  }
}
