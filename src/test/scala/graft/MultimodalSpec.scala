package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.MediaCodecs
import graft.similarity.Similarity

/** Multimodal plumbing tests: schema, decode-meta annotation, frame
  * sampling batch shape, embedding extraction feeding similarity search.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mediaDs = {
    import spark.implicits._
    val base = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
      .toDF("id", "seed")
    Multimodal.synthesize(spark, base, "id", "seed")
  }

  test("synthesized media rows decode through the stub codec") {
    val rows = Multimodal.withDecodedMeta(mediaDs.toDF(), "content").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("dec_width")))
      assert(r.getInt(r.fieldIndex("dec_width")) >= 16)
    }
  }

  test("garbage bytes yield null decode metadata, not a crash") {
    import spark.implicits._
    val bad = Seq((9L, Array[Byte](1, 2, 3))).toDF("mediaId", "content")
    val out = Multimodal.withDecodedMeta(bad, "content").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("dec_width")))
  }

  test("frame sampling explodes media into per-frame rows") {
    val frames = Multimodal.sampleFrames(mediaDs, stride = 1, maxFrames = 10)
      .collect()
    // media id N has 1 + N % 5 frames
    assert(frames.count(_.mediaId == 1L) == 2)
    assert(frames.count(_.mediaId == 2L) == 3)
    assert(frames.count(_.mediaId == 3L) == 4)
    assert(frames.forall(_.pixels.length == 16), "stub frame payload shape")
  }

  test("resize rewrites dimensions deterministically") {
    val out = Multimodal.resize(mediaDs, 8, 8).collect()
    assert(out.forall(m => MediaCodecs.decode(m.content).exists(
      d => d._1 == 8 && d._2 == 8)))
    assert(out.forall(_.meta.width == 8))
  }

  test("embeddings are unit vectors and flow into cosine top-k") {
    val withEmb = Multimodal.withEmbedding(mediaDs.toDF(), "content", 32)
      .select(col("mediaId").as("vec_id"), col("embedding"))
    val norms = withEmb.select(
      sqrt(aggregate(transform(col("embedding"), x => x * x),
        lit(0.0d), (a, x) => a + x)).as("n")).collect()
    norms.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-5))
    val topk = Similarity.cosineTopK(withEmb, withEmb, "vec_id", "embedding", 2)
    assert(topk.count() == 6, "3 queries × 2 neighbors")
  }
}
