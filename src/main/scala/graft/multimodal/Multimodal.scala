package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages shaped for executor-parallel batch processing.
  *
  * IMAGE and WAV-AUDIO pixel/sample work is REAL: [[ImageCodecs]] decodes
  * PNG/JPEG/GIF/BMP through the JDK's built-in `javax.imageio` (resample,
  * perceptual dHash/aHash, luminance-grid embeddings), and [[AudioCodecs]]
  * decodes RIFF/WAV PCM through `javax.sound.sampled` (RMS, zero-crossing
  * rate, clipping ratio). [[ImageHeaders]] additionally reads dimensions
  * straight from header bytes without a full decode. VIDEO is real for the
  * two containers a pure JVM can fully decode — YUV4MPEG2 raw planes and
  * MJPEG-in-AVI via the JDK JPEG reader ([[VideoCodecs]]): probe,
  * frame-sample, per-frame perceptual hashes, and frame-level video
  * near-dup pairs. ISO-BMFF (MP4/MOV) CONTAINER probing is also real —
  * [[Bmff]] walks the public 14496-12 box tree for brand, per-track codec
  * fourcc, dimensions, timescale/duration, and sample counts without any
  * entropy decoding. Only the compressed BITSTREAM payloads
  * (H.264/HEVC/VP9/compressed audio frames) remain behind the
  * `MediaCodecs` stub — the JDK has no entropy decoder; the schema and
  * batch shapes are identical, so a JNI decoder swaps in as one function.
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

  // ---------------- REAL image operators (JDK ImageIO) ----------------

  /** real decode: adds px_width / px_height (null where no installed
    * reader accepts the bytes) — unlike [[ImageHeaders]]' header-sniffed
    * img_width/img_height (composable alongside: distinct column names)
    * this touches the pixels, so it also validates the payload end-to-end
    */
  def withImagePixelMeta(df: DataFrame, contentCol: String): DataFrame = {
    val dims = udf((c: Array[Byte]) =>
      ImageCodecs.decode(c).map(i => (i.getWidth, i.getHeight)))
    // namespaced temp name: a bare "px" would silently clobber (withColumn
    // replaces) and then delete a user column of the same name
    df.withColumn("_graft_px", dims(col(contentCol)))
      .withColumn("px_width", col("_graft_px._1"))
      .withColumn("px_height", col("_graft_px._2"))
      .drop("_graft_px")
  }

  /** 64-bit perceptual dHash column (null for undecodable rows). Persist
    * the result before self-joining at scale — each downstream use re-runs
    * the decode otherwise.
    */
  def withImageHash(df: DataFrame, contentCol: String): DataFrame = {
    val h = udf((c: Array[Byte]) => ImageCodecs.decode(c).map(ImageCodecs.dHash))
    df.withColumn("dhash", h(col(contentCol)))
  }

  /** Near-duplicate image pairs among pre-hashed rows (`idCol`, `hashCol`
    * 64-bit dHash): the hash is sliced into `maxHamming + 1` bands
    * (pigeonhole — a pair within maxHamming bits agrees on at least one
    * whole band), candidates come from a (band, slice) equi-join, and the
    * exact `bit_count(xor)` verify runs codegen-native. Never an all-pairs
    * comparison — the simhashPairs shape on image bytes.
    */
  def imageNearDupsFromHashes(hashed: DataFrame, idCol: String,
      hashCol: String, maxHamming: Int = 6): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"bad maxHamming $maxHamming")
    val nb = maxHamming + 1
    val base = 64 / nb
    val extra = 64 % nb // first `extra` bands get one more bit
    val offsets = (0 until nb).scanLeft(0)((o, i) =>
      o + base + (if (i < extra) 1 else 0))
    val slices = (0 until nb).map { i =>
      val width = base + (if (i < extra) 1 else 0)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("band"),
        shiftrightunsigned(col("h"), offsets(i)).bitwiseAND(lit(mask)).as("slice"))
    }
    val rows = hashed.select(col(idCol).as("id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
    val banded = rows.select(col("id"), col("h"),
      explode(array(slices: _*)).as("bs"))
    banded.as("l").join(banded.as("r"),
        col("l.bs") === col("r.bs") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id1"), col("r.id").as("id2"),
        col("l.h").as("h1"), col("r.h").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }

  /** hash + pair search in one call (decodes twice across the self-join —
    * persist [[withImageHash]] output instead at corpus scale)
    */
  def imageNearDups(df: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 6): DataFrame =
    imageNearDupsFromHashes(withImageHash(df, contentCol), idCol, "dhash",
      maxHamming)

  /** real luminance-grid embedding column, L2-normalized — feed straight to
    * graft.similarity cosine / ANN operators for image similarity search
    */
  def withImageEmbedding(df: DataFrame, contentCol: String,
      grid: Int = 8): DataFrame = {
    val e = udf((c: Array[Byte]) =>
      ImageCodecs.decode(c).map(ImageCodecs.embedding(_, grid)))
    df.withColumn("embedding", e(col(contentCol)))
  }

  /** real pixel resample of every decodable image to (w, h), re-encoded as
    * PNG (null where decode failed)
    */
  def resizeImages(df: DataFrame, contentCol: String, w: Int,
      h: Int): DataFrame = {
    val r = udf((c: Array[Byte]) => ImageCodecs.decode(c)
      .map(i => ImageCodecs.encodePng(ImageCodecs.resize(i, w, h))))
    df.withColumn("resized", r(col(contentCol)))
  }

  // ---------------- REAL audio operators (JDK javax.sound) ----------------

  /** WAV PCM decode + curation features: audio_duration_ms, audio_rms,
    * audio_zcr, audio_clipping (all null for non-WAV rows)
    */
  def withAudioFeatures(df: DataFrame, contentCol: String): DataFrame = {
    val f = udf((c: Array[Byte]) => AudioCodecs.decodeWav(c).map { p =>
      (p.durationMs, AudioCodecs.rms(p.samples),
        AudioCodecs.zeroCrossingRate(p.samples, p.channels),
        AudioCodecs.clippingRatio(p.samples))
    })
    df.withColumn("_graft_af", f(col(contentCol)))
      .withColumn("audio_duration_ms", col("_graft_af._1"))
      .withColumn("audio_rms", col("_graft_af._2"))
      .withColumn("audio_zcr", col("_graft_af._3"))
      .withColumn("audio_clipping", col("_graft_af._4"))
      .drop("_graft_af")
  }

  // ------------- REAL video operators (pure-JVM containers) -------------

  final case class VideoFrameRow(mediaId: Long, frameIndex: Int, width: Int,
      height: Int, luma: Array[Byte])

  /** real container probe: vid_format / vid_width / vid_height / vid_frames
    * (all null where [[VideoCodecs.probe]] can't decode the container —
    * compressed bitstreams included). Per-row scalar, no shuffle.
    */
  def withVideoMeta(df: DataFrame, contentCol: String): DataFrame = {
    val p = udf((c: Array[Byte]) =>
      VideoCodecs.probe(c).map(i => (i.format, i.width, i.height, i.nFrames)))
    df.withColumn("_graft_vp", p(col(contentCol)))
      .withColumn("vid_format", col("_graft_vp._1"))
      .withColumn("vid_width", col("_graft_vp._2"))
      .withColumn("vid_height", col("_graft_vp._3"))
      .withColumn("vid_frames", col("_graft_vp._4"))
      .drop("_graft_vp")
  }

  /** REAL frame sampling: every `stride`-th decoded luminance frame up to
    * `maxFrames` per row, one output row per frame — the lazy container
    * iterators mean skipped AVI frames are never pixel-decoded (y4m skips
    * are plane slices either way). Executor-parallel via flatMap.
    */
  def sampleVideoFrames(df: DataFrame, idCol: String, contentCol: String,
      stride: Int = 1, maxFrames: Int = Int.MaxValue): Dataset[VideoFrameRow] = {
    require(stride >= 1 && maxFrames >= 1, s"bad stride=$stride maxFrames=$maxFrames")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(contentCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, c) =>
        VideoCodecs.frames(c)
          .filter(_.index % stride == 0).take(maxFrames)
          .map(f => VideoFrameRow(id, f.index, f.width, f.height, f.luma))
      }
  }

  /** per-sampled-frame perceptual dHash rows (mediaId, frameIndex, dhash) —
    * video frames ride the image hash kernel via a grayscale lift
    */
  def videoFrameHashes(df: DataFrame, idCol: String, contentCol: String,
      stride: Int = 1, maxFrames: Int = Int.MaxValue): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    sampleVideoFrames(df, idCol, contentCol, stride, maxFrames)
      .map(f => (f.mediaId, f.frameIndex,
        ImageCodecs.dHash(VideoCodecs.toGrayImage(
          VideoCodecs.LumaFrame(f.frameIndex, f.width, f.height, f.luma)))))
      .toDF("mediaId", "frameIndex", "dhash")
  }

  /** Near-duplicate VIDEO pairs from per-frame hash rows: distinct
    * (video, frame-hash) looks feed the banded image pair search (pigeonhole
    * equi-join, never all-pairs), and a pair survives with the number of
    * near-matching distinct looks — ≥ `minSharedFrames` means the videos
    * share that many visually-distinct frames within `maxHamming` bits.
    * Persist the (small) frame-hash frame before calling at corpus scale.
    */
  def videoNearDupsFromFrameHashes(frameHashes: DataFrame,
      maxHamming: Int = 6, minSharedFrames: Int = 2): DataFrame =
    imageNearDupsFromHashes(
      frameHashes.select(col("mediaId"), col("dhash")).distinct(),
      "mediaId", "dhash", maxHamming)
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  // (shared_frames counts near-matching distinct-look PAIRS: one look of A
  // matching two distinct looks of B contributes 2 — a deliberate
  // similarity-mass semantics, documented rather than deduped)

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
