package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{ClusterState, Clusterize}

/** Re-expression of the reference's clustering-semantics tests
  * (MainVerticleTest.java: same-key union :1319-1367, >600-char truncation
  * :1368-1404, move/merge :1404-1567, empty keys :1679-1758, delete
  * tombstones :1568-1678) as DataFrame-level tests.
  */
class ClusterizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def t(s: String) = Timestamp.valueOf(s)

  private def batch(rows: (String, Seq[String])*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("recordId", "keys")
  }

  private def assignMap(s: ClusterState): Map[String, String] =
    s.assignments.collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("records sharing a key cluster together; disjoint keys do not") {
    val s = Clusterize.initialize(
      batch("r1" -> Seq("isbn:1"), "r2" -> Seq("isbn:1", "isbn:2"),
        "r3" -> Seq("isbn:3")),
      "issn", t("2024-01-01 00:00:00"))
    val a = assignMap(s)
    assert(a("r1") == a("r2"))
    assert(a("r1") != a("r3"))
    assert(s.meta.count() == 2)
  }

  test("match values are truncated to 600 chars before matching") {
    val long1 = "x" * 700
    val long2 = "x" * 600 + "DIFFERENT-TAIL"
    val s = Clusterize.initialize(
      batch("r1" -> Seq(long1), "r2" -> Seq(long2)),
      "k", t("2024-01-01 00:00:00"))
    val a = assignMap(s)
    assert(a("r1") == a("r2"), "600-char prefixes equal → same cluster")
  }

  test("a new record bridging two clusters merges them (min survivor)") {
    val s1 = Clusterize.initialize(
      batch("r1" -> Seq("a"), "r2" -> Seq("b")),
      "k", t("2024-01-01 00:00:00"))
    assert(assignMap(s1)("r1") != assignMap(s1)("r2"))
    val s2 = Clusterize.ingestBatch(s1,
      batch("r3" -> Seq("a", "b")), "k", t("2024-01-02 00:00:00"))
    val a = assignMap(s2)
    assert(a("r1") == a("r2") && a("r2") == a("r3"))
    assert(a("r1") == Seq(assignMap(s1)("r1"), assignMap(s1)("r2")).min,
      "survivor is the min of the merged cluster ids")
    // the absorbed cluster remains as a touched tombstone
    assert(s2.meta.count() == 2)
    val absorbed = Seq(assignMap(s1)("r1"), assignMap(s1)("r2")).max
    val tomb = s2.meta.filter(col("clusterId") === absorbed).collect()
    assert(tomb.length == 1 && tomb(0).getTimestamp(1) == t("2024-01-02 00:00:00"))
  }

  test("a record whose new keys match nothing moves to a fresh cluster") {
    val s1 = Clusterize.initialize(
      batch("r1" -> Seq("a"), "r2" -> Seq("a")),
      "k", t("2024-01-01 00:00:00"))
    val c0 = assignMap(s1)("r1")
    val s2 = Clusterize.ingestBatch(s1,
      batch("r1" -> Seq("brand-new")), "k", t("2024-01-02 00:00:00"))
    val a = assignMap(s2)
    assert(a("r1") != c0, "moved off the old cluster")
    assert(a("r2") == c0, "the other record stays")
    // the old value 'a' is never garbage-collected
    assert(s2.values.filter(col("value") === "a").count() == 1)
    // old cluster is touched (datestamp bumped)
    val oldMeta = s2.meta.filter(col("clusterId") === c0).collect()
    assert(oldMeta(0).getTimestamp(1) == t("2024-01-02 00:00:00"))
  }

  test("re-ingesting with a key owned by an abandoned cluster rejoins it") {
    val s1 = Clusterize.initialize(batch("r1" -> Seq("a")), "k",
      t("2024-01-01 00:00:00"))
    val c0 = assignMap(s1)("r1")
    val s2 = Clusterize.ingestBatch(s1, batch("r1" -> Seq("b")), "k",
      t("2024-01-02 00:00:00"))
    assert(assignMap(s2)("r1") != c0)
    // 'a' still points at c0 — components never split retroactively
    val s3 = Clusterize.ingestBatch(s2, batch("r2" -> Seq("a")), "k",
      t("2024-01-03 00:00:00"))
    assert(assignMap(s3)("r2") == c0)
  }

  test("zero-key records each get their own cluster") {
    val s = Clusterize.initialize(
      batch("r1" -> Seq(), "r2" -> Seq()),
      "k", t("2024-01-01 00:00:00"))
    val a = assignMap(s)
    assert(a("r1") != a("r2"))
    assert(s.meta.count() == 2)
  }

  test("deleting a record leaves its cluster as a touched tombstone") {
    import spark.implicits._
    val s1 = Clusterize.initialize(batch("r1" -> Seq("a")), "k",
      t("2024-01-01 00:00:00"))
    val c0 = assignMap(s1)("r1")
    val s2 = Clusterize.deleteRecords(s1, Seq("r1").toDF("recordId"),
      t("2024-01-05 00:00:00"))
    assert(s2.assignments.count() == 0)
    val m = s2.meta.collect()
    assert(m.length == 1 && m(0).getString(0) == c0
      && m(0).getTimestamp(1) == t("2024-01-05 00:00:00"))
  }

  test("chained keys produce one transitive component") {
    val s = Clusterize.initialize(
      batch("r1" -> Seq("a"), "r2" -> Seq("a", "b"), "r3" -> Seq("b", "c"),
        "r4" -> Seq("c"), "r5" -> Seq("z")),
      "k", t("2024-01-01 00:00:00"))
    val a = assignMap(s)
    assert(Set(a("r1"), a("r2"), a("r3"), a("r4")).size == 1)
    assert(a("r5") != a("r1"))
  }

  test("long chains converge fast (pointer jumping)") {
    // 400 records pairwise linked into one chain — naive propagation would
    // need ~400 rounds; pointer jumping needs ~log2(400). Force the
    // distributed loop (a chain this small would otherwise take the
    // driver-local union-find fast path).
    spark.conf.set("spark.graft.cc.localMaxEdges", "0")
    try {
      val rows = (0 until 400).map(i =>
        f"r$i%04d" -> Seq(s"k$i", s"k${i + 1}"))
      val t0 = System.nanoTime()
      val s = Clusterize.initialize(batch(rows: _*), "k", t("2024-01-01 00:00:00"))
      val a = assignMap(s)
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(a.values.toSet.size == 1, "one component")
      assert(elapsed < 120, f"chain clustering took $elapsed%.1f s")
    } finally spark.conf.unset("spark.graft.cc.localMaxEdges")
  }

  test("CC converges with reliable checkpointing enabled") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set("spark.graft.checkpointDir", dir)
    spark.conf.set("spark.graft.cc.localMaxEdges", "0") // exercise the loop
    try {
      val rows = (0 until 50).map(i => f"r$i%03d" -> Seq(s"k$i", s"k${i + 1}"))
      val s = Clusterize.initialize(batch(rows: _*), "k", t("2024-01-01 00:00:00"))
      assert(assignMap(s).values.toSet.size == 1, "one chained component")
      // reliable checkpoint files actually got written
      val fs = new java.io.File(dir)
      assert(fs.listFiles != null && fs.listFiles.nonEmpty, "checkpoint dir used")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      spark.conf.unset("spark.graft.cc.localMaxEdges")
    }
  }

  test("stats histogram reflects cluster sizes with samples") {
    val s = Clusterize.initialize(
      batch("r1" -> Seq("a"), "r2" -> Seq("a"), "r3" -> Seq("b")),
      "k", t("2024-01-01 00:00:00"))
    val rows = Clusterize.stats(s).collect()
    // one cluster with 2 records/1 value, one with 1 record/1 value
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      Set((1L, 1L, 1L), (2L, 1L, 1L)))
  }

  test("componentSizeHistogram buckets component sizes") {
    import spark.implicits._
    // components: {1,2,3}, {4,5}, {6}, {7} → sizes 3,2,1,1
    val cc = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L)).toDF("id", "component")
    val got = Clusterize.componentSizeHistogram(cc)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 1L, 2L -> 1L, 1L -> 2L), got.toString)
  }
}
