package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.Catalog

/** Direct tests of the partitioned copy-on-write catalog: per-partition
  * commits, manifest versioning, snapshot retention, partition drops, and
  * vacuum of unreferenced data dirs.
  */
class CatalogSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("v", IntegerType)))

  private def fresh(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft-cat").toString, "t")

  private def df(rows: (String, Int)*) = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private def readAll(c: Catalog): Set[(String, Int)] =
    c.readPartitionedOr("tbl", schema).collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet

  test("overwritePartitions touches only the named partitions") {
    val c = fresh()
    c.overwritePartitions("tbl", df("a" -> 1, "b" -> 2), "k", Seq("a", "b"))
    assert(readAll(c) == Set("a" -> 1, "b" -> 2))
    assert(c.partitionManifest("tbl") == Map("a" -> 1L, "b" -> 1L))

    // rewrite only partition a; b keeps its data version
    c.overwritePartitions("tbl", df("a" -> 10), "k", Seq("a"))
    assert(readAll(c) == Set("a" -> 10, "b" -> 2))
    assert(c.partitionManifest("tbl") == Map("a" -> 2L, "b" -> 1L))
  }

  test("a touched partition with no rows is dropped from the manifest") {
    val c = fresh()
    c.overwritePartitions("tbl", df("a" -> 1, "b" -> 2), "k", Seq("a", "b"))
    c.overwritePartitions("tbl", df(), "k", Seq("a"))
    assert(readAll(c) == Set("b" -> 2))
    assert(c.partitionManifest("tbl") == Map("b" -> 1L))
  }

  test("readPartitionsOr reads only the requested partitions") {
    val c = fresh()
    c.overwritePartitions("tbl", df("a" -> 1, "b" -> 2, "c" -> 3), "k",
      Seq("a", "b", "c"))
    val got = c.readPartitionsOr("tbl", schema, Seq("a", "c", "missing"))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a", "c"))
  }

  test("partition values with special characters round-trip") {
    val c = fresh()
    val weird = "SRC 1/ü=%"
    c.overwritePartitions("tbl", df(weird -> 7), "k", Seq(weird))
    assert(readAll(c) == Set(weird -> 7))
    assert(c.partitionManifest("tbl").keySet == Set(weird))
  }

  test("a reader of the previous snapshot survives one more commit") {
    val c = fresh()
    c.overwritePartitions("tbl", df("a" -> 1), "k", Seq("a"))
    val reader = c.readPartitionedOr("tbl", schema) // plan pinned to v=1 dirs
    c.overwritePartitions("tbl", df("a" -> 2), "k", Seq("a"))
    // previous data version is retained, so the pinned plan still reads
    assert(reader.collect().map(_.getInt(1)).toSeq == Seq(1))
  }

  test("vacuum removes unreferenced partition dirs") {
    val c = fresh()
    c.overwritePartitions("tbl", df("a" -> 1, "b" -> 2), "k", Seq("a", "b"))
    c.overwritePartitions("tbl", df(), "k", Seq("a")) // drop a
    assert(c.vacuumPartitions("tbl") >= 1)
    assert(readAll(c) == Set("b" -> 2))
    // idempotent
    assert(c.vacuumPartitions("tbl") == 0)
  }
}
