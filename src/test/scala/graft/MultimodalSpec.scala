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

  test("image header parsing reads real PNG/JPEG/GIF dimensions from bytes") {
    import spark.implicits._
    import graft.multimodal.ImageHeaders

    def png(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
      bb.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h)
      bb.array()
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(2 + 18 + 10)
      bb.put(Array(0xff, 0xd8).map(_.toByte))
      bb.put(Array(0xff, 0xe0).map(_.toByte)).putShort(16)
        .put(new Array[Byte](14)) // APP0 segment to skip over
      bb.put(Array(0xff, 0xc0).map(_.toByte)).putShort(8)
        .put(8.toByte).putShort(h.toShort).putShort(w.toShort)
      bb.array()
    }
    def gif(w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(10)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("GIF89a".getBytes("US-ASCII")).putShort(w.toShort).putShort(h.toShort)
      bb.array()
    }

    // JPEG with legal 0xFF fill padding before the SOF marker (T.81 B.1.1.2)
    val jpegPadded = {
      val base = jpeg(800, 600)
      val out = java.nio.ByteBuffer.allocate(base.length + 2)
      out.put(base, 0, 2).put(0xff.toByte).put(0xff.toByte)
        .put(base, 2, base.length - 2)
      out.array()
    }
    val df = Seq(
      (1L, png(640, 480)), (2L, jpeg(800, 600)), (3L, gif(320, 200)),
      (4L, "not an image".getBytes("UTF-8")), (5L, png(1, 1).take(12)),
      (6L, jpegPadded)
    ).toDF("id", "content")
    val got = ImageHeaders.withImageDims(df, "content")
      .select("id", "img_format", "img_width", "img_height").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some((r.getString(1), r.getInt(2), r.getInt(3))))).toMap
    assert(got(1L) == Some(("png", 640, 480)))
    assert(got(2L) == Some(("jpeg", 800, 600)))
    assert(got(3L) == Some(("gif", 320, 200)))
    assert(got(4L).isEmpty, "garbage bytes parse to null, never throw")
    assert(got(5L).isEmpty, "truncated header parses to null")
    assert(got(6L) == Some(("jpeg", 800, 600)), "0xFF fill bytes are consumed")
  }
}
