package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped for executor-parallel batch processing.
  *
  * PIXEL work is STUBBED behind `MediaCodecs` (this container ships no
  * image/audio libraries): `decode` parses a deterministic fake header
  * instead of invoking a real decoder. Container-level metadata is NOT
  * stubbed — [[ImageHeaders]] reads real PNG/JPEG/GIF dimensions straight
  * from header bytes. Everything around the stub — the schema, the
  * per-partition batching, the column signatures, the partition-parallel
  * execution — is real: swapping in a JNI/javacpp decoder is a
  * one-function change.
  *
  * Scale notes: media rows are large; keep `spark.sql.files.maxPartitionBytes`
  * at the default 128 MB so tasks stay memory-bounded, and store binaries in
  * parquet (or external object store with path columns) partitioned by kind.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int,
      durationMs: Long)

  final case class MediaRow(mediaId: Long, kind: String, content: Array[Byte],
      meta: MediaMeta)

  final case class DecodedFrame(mediaId: Long, frameIndex: Int, width: Int,
      height: Int, pixels: Array[Byte])

  /** STUB codec layer — deterministic fake format:
    * bytes = "GFTM" ++ width(4) ++ height(4) ++ nFrames(4) ++ payload.
    * A real deployment replaces these three functions with actual decoders;
    * the Spark plumbing above them is unchanged.
    */
  object MediaCodecs {

    def encodeFake(width: Int, height: Int, nFrames: Int,
        payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.put("GFTM".getBytes("US-ASCII"))
      bb.putInt(width).putInt(height).putInt(nFrames)
      bb.put(payload)
      bb.array()
    }

    /** STUB decode: header parse only (??? in spirit — no pixel work). */
    def decode(content: Array[Byte]): Option[(Int, Int, Int)] = {
      if (content.length < 16) return None
      val bb = java.nio.ByteBuffer.wrap(content)
      val magic = new Array[Byte](4)
      bb.get(magic)
      if (new String(magic, "US-ASCII") != "GFTM") None
      else Some((bb.getInt, bb.getInt, bb.getInt))
    }

    /** STUB frame extraction: deterministic bytes per frame index. */
    def extractFrame(content: Array[Byte], frame: Int, w: Int, h: Int): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(content)
      md.update(frame.toByte)
      md.digest()
    }

    /** STUB embedding: deterministic unit vector from content hash. */
    def embed(content: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(content)
      val v = Array.tabulate(dim) { i =>
        val b = md(i % md.length)
        ((b.toInt & 0xff) - 128) / 128.0f
      }
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / norm)
    }
  }

  /** Validate + annotate a binary media frame: adds decoded header metadata
    * columns (null when the stub codec rejects the bytes). Runs as a
    * partition-parallel scalar pipeline.
    */
  def withDecodedMeta(df: DataFrame, contentCol: String): DataFrame = {
    val decodeUdf = udf((c: Array[Byte]) => MediaCodecs.decode(c))
    df.withColumn("decoded", decodeUdf(col(contentCol)))
      .withColumn("dec_width", col("decoded._1"))
      .withColumn("dec_height", col("decoded._2"))
      .withColumn("dec_frames", col("decoded._3"))
      .drop("decoded")
  }

  /** Frame sampling: every `stride`-th frame up to `maxFrames` per media row,
    * exploded into one row per frame — batch shape (media × frames) with
    * per-partition decoder reuse via mapPartitions.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      maxFrames: Int): Dataset[DecodedFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // a real decoder would be opened once per partition here
      rows.flatMap { m =>
        MediaCodecs.decode(m.content).toSeq.flatMap { case (w, h, n) =>
          (0 until n by stride).take(maxFrames).map { f =>
            DecodedFrame(m.mediaId, f, w, h,
              MediaCodecs.extractFrame(m.content, f, w, h))
          }
        }
      }
    }
  }

  /** Feature extraction: binary → embedding column (Array[Float]) ready for
    * graft.similarity search.
    */
  def withEmbedding(df: DataFrame, contentCol: String, dim: Int): DataFrame = {
    val embedUdf = udf((c: Array[Byte]) => MediaCodecs.embed(c, dim))
    df.withColumn("embedding", embedUdf(col(contentCol)))
  }

  /** "Resize" stage (STUB): emits the target dims + a deterministic payload
    * of the right conceptual shape, preserving the batch layout.
    */
  def resize(media: Dataset[MediaRow], width: Int,
      height: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.map { m =>
      val resized = MediaCodecs.encodeFake(width, height,
        MediaCodecs.decode(m.content).map(_._3).getOrElse(1),
        MediaCodecs.extractFrame(m.content, 0, width, height))
      m.copy(content = resized,
        meta = m.meta.copy(width = width, height = height))
    }
  }

  /** synthesize a deterministic media table from any keyed text frame —
    * useful for wiring tests and the gate query
    */
  def synthesize(spark: SparkSession, df: DataFrame, idCol: String,
      seedCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    val enc = udf((id: Long, seed: String) => {
      val w = 16 + (id % 16).toInt
      val h = 9 + (id % 9).toInt
      val frames = 1 + (id % 5).toInt
      MediaCodecs.encodeFake(w, h, frames, seed.getBytes("UTF-8"))
    })
    df.select(col(idCol).cast("long").as("mediaId"),
        lit("video").as("kind"),
        enc(col(idCol).cast("long"), col(seedCol)).as("content"))
      .withColumn("meta", struct(lit("video/x-graft-fake").as("mime"),
        lit(0).as("width"), lit(0).as("height"), lit(0L).as("durationMs")))
      .as[MediaRow]
  }
}
