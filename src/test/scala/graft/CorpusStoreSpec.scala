package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SubstringDedup
import graft.storage.{Catalog, CorpusStore}

/** The r12 verdict-7 contract: ingest → normalize-dedup → keep-one strip →
  * STORED table round-trips through the Catalog's snapshot protocol, and
  * the stored corpus satisfies the Lee et al. invariant (a re-run of the
  * span detector finds nothing).
  */
class CorpusStoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val storedSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("text", StringType),
    StructField("n_tokens_before", LongType),
    StructField("n_tokens_after", LongType),
    StructField("n_spans_removed", LongType)))

  // a 6-word passage duplicated across docs 1 and 2 (strip floor
  // minWords = 5), doc 3 an exact normalized duplicate of doc 1, doc 4
  // clean — two sources so the partitioned commit has >1 partition
  private val passage = "alpha beta gamma delta epsilon zeta"
  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "web", s"one two three $passage four five six seven"),
      (2L, "web", s"$passage aardvark badger wallaby dingo echidna ferret"),
      (3L, "books", s"ONE  two three $passage four five six seven"),
      (4L, "books", "completely unrelated words nothing shared here at all"))
      .toDF("doc_id", "source", "text")
  }

  private def fresh(): Catalog =
    new Catalog(spark, Files.createTempDirectory("graft-corpus").toString,
      "t")

  test("writeDeduped: dedup + strip + snapshot commit round-trips") {
    val cat = fresh()
    val v = CorpusStore.writeDeduped(cat, "corpus", docs, "doc_id", "text",
      "source", minWords = 5)
    assert(v == 1L)
    val stored = cat.readPartitionedOr("corpus", storedSchema)
    val rows = stored.collect().map(r =>
      r.getLong(0) -> (r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    // doc 3 is a normalized exact dup of doc 1 -> dropped (min id kept)
    assert(rows.keySet == Set(1L, 2L, 4L))
    // doc 1 is the passage's canonical occurrence -> intact
    assert(rows(1L)._2 == s"one two three $passage four five six seven")
    assert(rows(1L)._5 == 0L)
    // doc 2 lost exactly the passage words, audit columns agree
    assert(rows(2L)._2 == "aardvark badger wallaby dingo echidna ferret")
    assert(rows(2L) == (("web", "aardvark badger wallaby dingo echidna ferret",
      12L, 6L, 1L)))
    // untouched doc passes through whole
    assert(rows(4L)._3 == rows(4L)._4 && rows(4L)._5 == 0L)
  }

  test("stored corpus satisfies the keep-one invariant: re-run finds nothing") {
    val cat = fresh()
    CorpusStore.writeDeduped(cat, "corpus", docs, "doc_id", "text",
      "source", minWords = 5)
    val stored = cat.readPartitionedOr("corpus", storedSchema)
    val toks = SubstringDedup.tokenFrame(stored, "doc_id", "text")
    assert(SubstringDedup.crossDocSpans(toks, "doc_id", minWords = 5)
      .isEmpty)
  }

  test("re-store commits a fresh version with identical content") {
    val cat = fresh()
    CorpusStore.writeDeduped(cat, "corpus", docs, "doc_id", "text",
      "source", minWords = 5)
    val first = cat.readPartitionedOr("corpus", storedSchema)
      .collect().map(_.toSeq).toSet
    val v2 = CorpusStore.writeDeduped(cat, "corpus", docs, "doc_id", "text",
      "source", minWords = 5)
    assert(v2 == 2L)
    val second = cat.readPartitionedOr("corpus", storedSchema)
      .collect().map(_.toSeq).toSet
    assert(second == first)
  }

  test("ingestBatch: monotone versions, replay skipped, strip vs stored") {
    import spark.implicits._
    val cat = fresh()
    val b0 = Seq(
      (1L, "web", s"one two three $passage four five six seven"),
      (2L, "web", s"$passage aardvark badger wallaby dingo echidna ferret"))
      .toDF("doc_id", "source", "text")
    assert(CorpusStore.ingestBatch(cat, "c", b0, 0L, "doc_id", "text",
      "source", minWords = 5) == 1L)
    // a later batch re-duplicating the stored passage: stripped against
    // the stored canonical copy (doc 1 keeps it, doc 3 loses it)
    val b1 = Seq((3L, "web", s"zz yy $passage xx ww vv uu tt"))
      .toDF("doc_id", "source", "text")
    assert(CorpusStore.ingestBatch(cat, "c", b1, 1L, "doc_id", "text",
      "source", minWords = 5) == 2L)
    // at-least-once replay of the SAME batch id: skipped, version holds
    assert(CorpusStore.ingestBatch(cat, "c", b1, 1L, "doc_id", "text",
      "source", minWords = 5) == 2L)
    assert(cat.version("c") == 2L)
    val rows = cat.readPartitionedOr("c", storedSchema).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L) == s"one two three $passage four five six seven")
    assert(rows(3L) == "zz yy xx ww vv uu tt")
    // the stored corpus still satisfies the keep-one invariant
    val toks = SubstringDedup.tokenFrame(
      cat.readPartitionedOr("c", storedSchema), "doc_id", "text")
    assert(SubstringDedup.crossDocSpans(toks, "doc_id", minWords = 5)
      .isEmpty)
  }
}
