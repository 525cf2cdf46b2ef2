package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.api.{MatchKeyConfig, Reservoir}
import graft.marc.MarcXml
import graft.model.IngestMapper
import graft.sources.MarcSources

/** Re-expression of the reference's upload matrix tests
  * (UploadTest.java:49-556): per-content-type ingest, missing-id → ignored,
  * leader-d deletes, and malformed-input rejection.
  */
class UploadMatrixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val serverRes = "/root/reference/server/src/test/resources"
  private val utilRes = "/root/reference/util/src/test/resources"

  private def freshReservoir(): Reservoir = {
    val dir = Files.createTempDirectory("graft-upload").toString
    val r = new Reservoir(spark, dir, "t1")
    r.putMatchKeyConfig(MatchKeyConfig("gr", "goldrush"))
    r
  }

  test("MARCXML upload end-to-end: 3 records ingested and clustered") {
    val r = freshReservoir()
    val recs = MarcSources.toGlobalRecords(spark, s"$serverRes/marc3.xml",
      binary = false, sourceId = "S1", sourceVersion = 1)
    import spark.implicits._
    val stats = r.ingest(recs.toDF())
    assert(stats.processed == 3 && stats.inserted == 3 && stats.ignored == 0)
    assert(r.clusters("gr").count() == 3)
  }

  test("ISO2709 upload of the same content matches the XML upload") {
    val r = freshReservoir()
    val recs = MarcSources.toGlobalRecords(spark, s"$serverRes/marc3.marc",
      binary = true, sourceId = "S1", sourceVersion = 1)
    import spark.implicits._
    val stats = r.ingest(recs.toDF())
    assert(stats.inserted == 3)
    assert(r.records().select("localId").collect().map(_.getString(0))
      .distinct.length == 3)
  }

  test("records without 001 are counted ignored (marc3-no-id.xml)") {
    val r = freshReservoir()
    val recs = MarcSources.toGlobalRecords(spark, s"$serverRes/marc3-no-id.xml",
      binary = false, sourceId = "S1", sourceVersion = 1)
    import spark.implicits._
    val stats = r.ingest(recs.toDF())
    assert(stats.ignored > 0, s"expected ignored records, got $stats")
  }

  test("leader-d records delete previously ingested ones (marc1-delete.xml)") {
    val r = freshReservoir()
    // the delete fixture's record, first ingested as a live record
    // the fixture carries a bad control-char entity — the fixer pre-pass
    // (xmlFixing=true in the reference upload) repairs it
    val del = MarcXml.parseCollection(new String(graft.sources.XmlFixer.fix(
      Files.readAllBytes(Paths.get(s"$serverRes/marc1-delete.xml"))), "UTF-8"))
    assert(del.nonEmpty && del.forall(IngestMapper.isDeleted),
      "fixture records carry leader pos5 = d")
    val localIds = del.flatMap(IngestMapper.localIdOf)
    assert(localIds.nonEmpty)
    import spark.implicits._
    val live = localIds.map(id =>
      (id, "S1", 1, s"""{"marc":{"leader":"x","fields":[{"001":"$id"}]}}""", false))
      .toDF("localId", "sourceId", "sourceVersion", "payloadJson", "delete")
    r.ingest(live)
    assert(r.records().count() == localIds.size.toLong)
    val recs = MarcSources.toGlobalRecords(spark, s"$serverRes/marc1-delete.xml",
      binary = false, sourceId = "S1", sourceVersion = 1, xmlFixing = true)
    val stats = r.ingest(recs.toDF())
    assert(stats.deleted == localIds.size.toLong)
    assert(r.records().count() == 0)
  }

  test("garbage (PDF-like) bytes produce zero records, not a crash") {
    val dir = Files.createTempDirectory("graft-bad").toString
    Files.write(Paths.get(s"$dir/fake.pdf"),
      ("%PDF-1.4 " + "x" * 100).getBytes("UTF-8"))
    val asBinary = graft.marc.Iso2709.parseAll(
      Files.readAllBytes(Paths.get(s"$dir/fake.pdf")))
    assert(asBinary.isEmpty, "no 5-digit frame -> no records")
    assertThrows[Exception] {
      MarcXml.parseCollection("%PDF-1.4 not xml at all")
    }
  }

  test("bad.xml and bad-marcxml.xml are rejected by the XML parser") {
    // bad.xml: malformed markup ("<<") — parser throws
    assertThrows[Exception] {
      MarcXml.parseCollection(new String(
        Files.readAllBytes(Paths.get(s"$utilRes/bad.xml")), "UTF-8"))
    }
    // bad-marcxml.xml: invalid UTF-8 bytes inside attributes — the fixer
    // pre-pass substitutes U+FFFD and the parse completes without crashing
    val fixed = new String(graft.sources.XmlFixer.fix(
      Files.readAllBytes(Paths.get(s"$utilRes/bad-marcxml.xml"))), "UTF-8")
    val recs = MarcXml.parseCollection(fixed)
    assert(recs != null)
  }

  test("pennstate fixture parses after byte-level fixing") {
    val raw = Files.readAllBytes(
      Paths.get(s"$utilRes/pennstate-bad-rec-20221216.xml"))
    val fixed = new String(graft.sources.XmlFixer.fix(raw), "UTF-8")
    val recs = MarcXml.parseCollection(fixed)
    assert(recs.nonEmpty)
  }
}
