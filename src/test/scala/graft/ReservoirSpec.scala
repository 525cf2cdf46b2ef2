package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{MatchKeyConfig, Reservoir}

/** The minimum end-to-end slice (SURVEY.md §7.2): ingest a records-in.json
  * style batch with an issn jsonpath pool (the fixture of
  * MainVerticleTest.java:1238-1262), query clusters via CQL, check cluster
  * document shape, version precedence, deletes, and OAI keyset export with
  * resumption-token round-trips.
  */
class ReservoirSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def freshReservoir(): Reservoir = {
    val dir = Files.createTempDirectory("graft-reservoir").toString
    val r = new Reservoir(spark, dir, "tenant1")
    r.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    r
  }

  private def rec(localId: String, sourceId: String, version: Int,
      issn: Seq[String], delete: Boolean = false): (String, String, Int, String, Boolean) = {
    val issnJson = issn.map(s => s""""$s"""").mkString("[", ",", "]")
    (localId, sourceId, version,
      s"""{"marc":{"leader":"x","fields":[{"001":"$localId"}]},"inventory":{"issn":$issnJson}}""",
      delete)
  }

  private def batchDf(rows: (String, String, Int, String, Boolean)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete")
  }

  test("end-to-end: ingest, cluster, CQL query, OAI export") {
    val r = freshReservoir()
    val stats = r.ingest(batchDf(
      rec("S101", "SOURCE-1", 1, Seq("01")),
      rec("S102", "SOURCE-1", 1, Seq("01", "02")),
      rec("S103", "SOURCE-1", 1, Seq("03"))))
    assert(stats == graft.api.IngestStats(3, 3, 0, 0, 0))

    // S101+S102 share issn 01 → one cluster; S103 alone
    val all = r.clusters("issn").collect()
    assert(all.length == 2)

    // CQL by localId returns the whole containing cluster
    val hit = r.clusters("issn", "localId = S101").collect()
    assert(hit.length == 1)
    val doc = hit.head
    assert(doc.getSeq[String](2) == Seq("01", "02"), "sorted matchValues")
    val members = doc.getSeq[org.apache.spark.sql.Row](3)
    assert(members.map(_.getString(2)) == Seq("S101", "S102"),
      "records sorted by (sourceId, sourceVersion, localId)")

    // matchValue CQL index
    assert(r.clusters("issn", "matchValue = 03").collect().length == 1)

    // OAI: full page, then token round-trip with limit 1
    val page = r.listRecords("issn", limit = 10)
    assert(page.items.length == 2 && page.resumptionToken.isEmpty)
    assert(page.items.forall(!_.deleted))
    assert(page.items.forall(_.metadataXml.exists(x =>
      x.contains("<record") && x.contains("999"))))

    val p1 = r.listRecords("issn", from = Some("2000-01-01"), limit = 1)
    assert(p1.items.length == 1 && p1.resumptionToken.isDefined)
    val p2 = r.listRecords("issn",
      resumptionToken = p1.resumptionToken, limit = 1)
    assert(p2.items.length == 1)
    assert(p1.items.head.clusterId != p2.items.head.clusterId)
    assert((p1.items.map(_.clusterId) ++ p2.items.map(_.clusterId)).toSet ==
      all.map(_.getString(0)).toSet)
  }

  test("pinSnapshot: a paged OAI export is one consistent snapshot under ingest") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a")), rec("S2", "SRC", 1, Seq("b")),
      rec("S3", "SRC", 1, Seq("c")), rec("S4", "SRC", 1, Seq("d"))))
    val initial = r.clusters("issn").collect().map(_.getString(0)).toSet
    assert(initial.size == 4)

    val p1 = r.listRecords("issn", limit = 2, pinSnapshot = true)
    assert(p1.items.length == 2 && p1.resumptionToken.isDefined)

    // ingest lands between pages: every initial cluster's datestamp bumps
    // (their records re-ingest at sourceVersion 2 — unpinned keyset would
    // re-serve the already-exported ones past the cursor) and a brand-new
    // cluster appears
    Thread.sleep(5)
    r.ingest(batchDf(rec("S1", "SRC", 2, Seq("a")), rec("S2", "SRC", 2, Seq("b")),
      rec("S3", "SRC", 2, Seq("c")), rec("S4", "SRC", 2, Seq("d")),
      rec("S5", "SRC", 1, Seq("e"))))

    val p2 = r.listRecords("issn", resumptionToken = p1.resumptionToken,
      limit = 10)
    val served = (p1.items ++ p2.items).map(_.clusterId)
    assert(served.toSet == initial && served.distinct.length == served.length,
      s"pinned export must serve each initial cluster exactly once, got $served")
    assert(p2.resumptionToken.isEmpty)

    // the unpinned default keeps reference per-request semantics: a fresh
    // export now sees all five clusters at their live datestamps
    val live = r.listRecords("issn", limit = 10)
    assert(live.items.map(_.clusterId).toSet.size == 5)

    // token byte-compat: the unpinned token carries no snapshot field
    val tokPlain = r.listRecords("issn", limit = 1).resumptionToken
    assert(tokPlain.isEmpty || !new String(
      java.util.Base64.getDecoder.decode(tokPlain.get), "UTF-8").contains(" v="))
    val tokPinned = r.listRecords("issn", limit = 1, pinSnapshot = true)
      .resumptionToken
    assert(tokPinned.exists(t => new String(
      java.util.Base64.getDecoder.decode(t), "UTF-8").matches("(?s).* v=\\d+")))
  }

  test("localIdPath extracts ids from the payload; missing ids are ignored") {
    import spark.implicits._
    val r = freshReservoir()
    val b = Seq(
      (null: String, "SRC", 1,
        """{"marc":{"fields":[{"001":"  X1 "}]}}""", false),
      (null: String, "SRC", 1,
        """{"marc":{"fields":[{"002":"no-001"}]}}""", false))
      .toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete")
    val st = r.ingest(b, Some("$.marc.fields[*].001"))
    assert(st.ignored == 1 && st.inserted == 1)
    assert(r.records().select("localId").collect().map(_.getString(0)).toSeq
      == Seq("X1"), "extracted and trimmed")
  }

  test("version precedence: cluster doc keeps latest sourceVersion per source") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    r.ingest(batchDf(rec("S1", "SRC", 2, Seq("a"))))
    val doc = r.clusters("issn", "localId = S1").collect().head
    val members = doc.getSeq[org.apache.spark.sql.Row](3)
    assert(members.length == 1 && members.head.getInt(1) == 2,
      "only sourceVersion 2 is served")
    // both versions exist in the record store
    assert(r.records("localId = S1").count() == 2)
  }

  test("upsert is idempotent and preserves globalId") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    val g1 = r.records().collect().head.getString(0)
    val s2 = r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    assert(s2.updated == 1 && s2.inserted == 0)
    assert(r.records().collect().head.getString(0) == g1)
    assert(r.records().count() == 1)
  }

  test("delete produces an OAI-visible tombstone") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    val st = r.ingest(batchDf(rec("S1", "SRC", 1, Nil, delete = true)))
    assert(st.deleted == 1)
    assert(r.records().count() == 0)
    val page = r.listRecords("issn", limit = 10)
    assert(page.items.length == 1 && page.items.head.deleted)
    assert(page.items.head.metadataXml.isEmpty)
  }

  test("touch bumps datestamps of matching clusters") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a")), rec("S2", "SRC", 1, Seq("b"))))
    val before = r.clusters("issn").select("clusterId", "datestamp").collect()
      .map(x => x.getString(0) -> x.getTimestamp(1)).toMap
    Thread.sleep(5)
    val n = r.touch("issn", "localId = S1")
    assert(n == 1)
    val after = r.clusters("issn").select("clusterId", "datestamp").collect()
      .map(x => x.getString(0) -> x.getTimestamp(1)).toMap
    val changed = after.filter { case (k, v) => before(k) != v }
    assert(changed.size == 1)
  }

  test("initialize rebuilds a manual pool") {
    val r = freshReservoir()
    r.putMatchKeyConfig(MatchKeyConfig("manualpool",
      "jsonpath:$.inventory.issn[*]", update = "manual"))
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("x")), rec("S2", "SRC", 1, Seq("x"))))
    // manual pool untouched by ingest
    assert(r.clusters("manualpool").count() == 0)
    r.initialize("manualpool")
    assert(r.clusters("manualpool").count() == 1)
  }

  test("tenants are fully isolated under one root") {
    val dir = Files.createTempDirectory("graft-tenants").toString
    val t1 = new Reservoir(spark, dir, "tenantA")
    val t2 = new Reservoir(spark, dir, "tenantB")
    t1.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    t2.putMatchKeyConfig(MatchKeyConfig("issn", "jsonpath:$.inventory.issn[*]"))
    t1.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    assert(t1.records().count() == 1)
    assert(t2.records().count() == 0)
    assert(t2.clusters("issn").count() == 0)
    // same natural key in both tenants → different globalIds
    t2.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    val g1 = t1.records().select("globalId").collect().head.getString(0)
    val g2 = t2.records().select("globalId").collect().head.getString(0)
    assert(g1 != g2)
  }

  test("OAI page assembly is O(page): every aggregate sits above the id filter") {
    val r = freshReservoir()
    r.ingest(batchDf(
      rec("S1", "SRC", 1, Seq("a")), rec("S2", "SRC", 1, Seq("b")),
      rec("S3", "SRC", 1, Seq("c")), rec("S4", "SRC", 1, Seq("d"))))
    val ids = r.clusters("issn").select("clusterId").collect()
      .map(_.getString(0)).sorted.take(2).toSeq
    val df = r.pageClusterDocs("issn", ids)

    // parity with the full assembly restricted to the same ids
    val full = r.clusters("issn").filter(col("clusterId").isin(ids: _*))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(df.collect().map(_.getString(0)).sorted.toSeq == full)

    // plan shape: the pool tables are filtered to the page ids BELOW every
    // aggregation, so the window + groupBys never see the whole pool
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val plan = df.queryExecution.optimizedPlan
    val aggs = plan.collect { case a: Aggregate => a }
    assert(aggs.nonEmpty, "expected aggregates in the page plan")
    aggs.foreach { a =>
      val gated = a.exists {
        case f: Filter =>
          val s = f.condition.sql
          s.contains("clusterId") && ids.exists(s.contains)
        case _ => false
      }
      assert(gated, s"aggregate not gated by the page-id filter:\n$a")
    }
  }

  test("vacuum reclaims superseded partition versions; data stays readable") {
    val r = freshReservoir()
    r.ingest(batchDf(rec("S1", "SRC", 1, Seq("a"))))
    r.ingest(batchDf(rec("S1", "SRC", 2, Seq("a"))))
    r.ingest(batchDf(rec("S1", "SRC", 3, Seq("a"))))
    r.vacuum()
    assert(r.records().count() == 3)
    assert(r.clusters("issn").count() == 1)
    // idempotent once clean
    assert(r.vacuum() == 0)
  }

  test("goldrush matcher pools cluster by the computed key") {
    val r = freshReservoir()
    r.putMatchKeyConfig(MatchKeyConfig("gr", "goldrush"))
    val marc =
      """{"marc":{"leader":"01010ccm a2200289   4500","fields":[
        |{"001":"a1"},{"245":{"ind1":"0","ind2":"0","subfields":[{"a":"Symphony, op. 38"}]}},
        |{"260":{"ind1":" ","ind2":" ","subfields":[{"b":"Lehman,"},{"c":"1967"}]}}]}}"""
        .stripMargin.replace("\n", "")
    import spark.implicits._
    val b = Seq(
      ("G1", "SRC", 1, marc, false),
      ("G2", "SRC2", 1, marc, false))
      .toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete")
    r.ingest(b)
    assert(r.clusters("gr").count() == 1, "identical goldrush keys cluster")
  }

  test("concurrent ingests to the same reservoir lose no records or clusters") {
    // ADVICE r6: the records RMW and the pool's three-table commit must be
    // optimistic — two drivers ingesting at once conflict and retry instead
    // of silently losing an update (the pool sub-tables commit atomically)
    val r = freshReservoir()
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map { t =>
      new Thread(() => {
        try {
          for (i <- 1 to 3)
            r.ingest(batchDf(rec(s"T$t-$i", s"CSRC-$t", 1, Seq(s"i$t-$i"))))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"ingest failed: ${Option(errs.peek())}")
    assert(r.records().count() == 6)
    // every record made it into the pool's cluster state
    val assigned = r.clusters("issn")
      .select(explode(col("records.localId")).as("l"))
      .collect().map(_.getString(0)).toSet
    assert(assigned == (for (t <- 1 to 2; i <- 1 to 3) yield s"T$t-$i").toSet)
  }
}
