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

  // ---------------- REAL codecs (JDK ImageIO / javax.sound) ----------------

  /** deterministic pseudo-random 64×64 grayscale PNG per seed */
  private def patternPng(seed: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val c = ((x * 73856093) ^ (y * 19349663) ^ (seed * 83492791)) & 0xff
      img.setRGB(x, y, (c << 16) | (c << 8) | c)
    }
    graft.multimodal.ImageCodecs.encodePng(img)
  }

  /** the same pixels recompressed as lossy JPEG — the classic near-dup */
  private def recompressJpeg(png: Array[Byte]): Array[Byte] = {
    val img = graft.multimodal.ImageCodecs.decode(png).get
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    bos.toByteArray
  }

  test("real image decode, resize, and perceptual hash behave like codecs") {
    import graft.multimodal.ImageCodecs
    val png = patternPng(1)
    val img = ImageCodecs.decode(png).get
    assert(img.getWidth == 64 && img.getHeight == 64)
    val small = ImageCodecs.resize(img, 20, 10)
    assert(small.getWidth == 20 && small.getHeight == 10)
    // PNG is lossless: re-encode + decode preserves the hash exactly
    val again = ImageCodecs.decode(ImageCodecs.encodePng(img)).get
    assert(ImageCodecs.dHash(img) == ImageCodecs.dHash(again))
    // JPEG recompression is lossy but perceptually identical: small hamming
    val jpg = ImageCodecs.decode(recompressJpeg(png)).get
    val dNear = ImageCodecs.hamming(ImageCodecs.dHash(img), ImageCodecs.dHash(jpg))
    assert(dNear <= 10, s"recompressed hash drifted $dNear bits")
    // a different pattern is far away (~32 bits for independent hashes)
    val other = ImageCodecs.decode(patternPng(2)).get
    val dFar = ImageCodecs.hamming(ImageCodecs.dHash(img), ImageCodecs.dHash(other))
    assert(dFar > 16, s"distinct images only $dFar bits apart")
    assert(ImageCodecs.decode("junk".getBytes("UTF-8")).isEmpty)
  }

  test("image near-dup pairs: banded join finds the recompressed copy only") {
    import spark.implicits._
    val png1 = patternPng(10)
    val df = Seq(
      (1L, png1), (2L, recompressJpeg(png1)), (3L, patternPng(11)),
      (4L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "content")
    val pairs = Multimodal.imageNearDups(df, "id", "content", maxHamming = 10)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)), got.toString)
    // scale shape: banded equi-join, never an all-pairs comparison
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("real image embeddings: near-dups at cosine ~1, distinct far below") {
    import spark.implicits._
    val png1 = patternPng(20)
    val df = Seq(
      (1L, png1), (2L, recompressJpeg(png1)), (3L, patternPng(21))
    ).toDF("id", "content")
    val emb = Multimodal.withImageEmbedding(df, "content")
      .select("id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    assert(math.abs(cos(emb(1L), emb(1L)) - 1.0) < 1e-5, "unit norm")
    assert(cos(emb(1L), emb(2L)) > 0.98, s"near-dup cos ${cos(emb(1L), emb(2L))}")
    assert(cos(emb(1L), emb(3L)) < 0.8, s"distinct cos ${cos(emb(1L), emb(3L))}")
  }

  test("real WAV decode recovers duration, energy, and zero crossings") {
    import graft.multimodal.AudioCodecs
    val rate = 8000f
    val n = 2000 // 250 ms
    val amp = 0.5f
    val sine = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * 440 * i / rate)).toFloat)
    val wav = AudioCodecs.encodeWavMono16(sine, rate)
    val pcm = AudioCodecs.decodeWav(wav).get
    assert(pcm.sampleRate == rate && pcm.channels == 1)
    assert(math.abs(pcm.durationMs - 250L) <= 1)
    // sine RMS = amp / sqrt(2); 440 Hz crosses zero 2*440 times per second
    assert(math.abs(AudioCodecs.rms(pcm.samples) - amp / math.sqrt(2)) < 0.01)
    val zcr = AudioCodecs.zeroCrossingRate(pcm.samples)
    assert(math.abs(zcr - 2 * 440 / rate) < 0.01, s"zcr $zcr")
    assert(AudioCodecs.clippingRatio(pcm.samples) == 0.0)
    assert(AudioCodecs.decodeWav("junk".getBytes("UTF-8")).isEmpty)
  }

  test("zero-crossing rate is per-channel, not per interleaved sample") {
    import graft.multimodal.AudioCodecs
    // out-of-phase stereo (L=+0.5, R=-0.5): NO channel ever crosses zero,
    // but the interleaved stream flips sign every sample
    val interleaved = Array.tabulate(1000)(i => if (i % 2 == 0) 0.5f else -0.5f)
    assert(AudioCodecs.zeroCrossingRate(interleaved, channels = 2) == 0.0)
    assert(AudioCodecs.zeroCrossingRate(interleaved, channels = 1) > 0.9,
      "the mono reading of the same array must see the flips")
  }

  test("withAudioFeatures annotates WAV rows and nulls the rest") {
    import spark.implicits._
    import graft.multimodal.AudioCodecs
    val rate = 8000f
    val loud = AudioCodecs.encodeWavMono16(
      Array.tabulate(800)(i => if (i % 18 < 9) 1.0f else -1.0f), rate) // square
    val quiet = AudioCodecs.encodeWavMono16(Array.fill(800)(0.001f), rate)
    val df = Seq((1L, loud), (2L, quiet), (3L, "nope".getBytes("UTF-8")))
      .toDF("id", "content")
    val rows = Multimodal.withAudioFeatures(df, "content")
      .select("id", "audio_duration_ms", "audio_rms", "audio_clipping")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getLong(1), r.getDouble(2), r.getDouble(3))))).toMap
    val (durLoud, rmsLoud, clipLoud) = rows(1L).get
    assert(durLoud == 100L && rmsLoud > 0.9 && clipLoud > 0.9,
      s"square wave: $durLoud ms rms=$rmsLoud clip=$clipLoud")
    val (_, rmsQuiet, clipQuiet) = rows(2L).get
    assert(rmsQuiet < 0.01 && clipQuiet == 0.0)
    assert(rows(3L).isEmpty, "non-WAV bytes yield null features, not a crash")
  }

  // ---- REAL video containers ----

  private def gradientLuma(w: Int, h: Int, phase: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i + phase * 7) % 256).toByte)

  test("y4m round-trip: encode, probe, decode byte-exact luminance planes") {
    import graft.multimodal.VideoCodecs
    val (w, h) = (32, 18)
    val planes = (0 until 4).map(f => gradientLuma(w, h, f))
    val y4m = VideoCodecs.encodeY4m(w, h, planes)
    val info = VideoCodecs.probe(y4m)
    assert(info.contains(VideoCodecs.VideoInfo("y4m", w, h, 4)), info.toString)
    val frames = VideoCodecs.frames(y4m).toSeq
    assert(frames.map(_.index) == Seq(0, 1, 2, 3))
    frames.zip(planes).foreach { case (f, p) =>
      assert(java.util.Arrays.equals(f.luma, p), s"frame ${f.index} luma")
    }
    // truncated stream: complete frames decode, the cut one is dropped
    val cut = java.util.Arrays.copyOf(y4m, y4m.length - 10)
    assert(VideoCodecs.probe(cut).map(_.nFrames).contains(3))
  }

  test("mjpeg-avi round-trip: RIFF walk + JDK JPEG decode per frame") {
    import graft.multimodal.{ImageCodecs, VideoCodecs}
    val imgs = (0 until 3).map { f =>
      val lf = VideoCodecs.LumaFrame(f, 24, 16, gradientLuma(24, 16, f))
      VideoCodecs.toGrayImage(lf)
    }
    val avi = VideoCodecs.encodeAviMjpeg(imgs)
    val info = VideoCodecs.probe(avi)
    assert(info.contains(VideoCodecs.VideoInfo("avi-mjpeg", 24, 16, 3)),
      info.toString)
    val frames = VideoCodecs.frames(avi).toSeq
    assert(frames.length == 3 && frames.forall(f => f.width == 24 && f.height == 16))
    // JPEG is lossy: the decoded frame must still be perceptually identical
    frames.zip(imgs).foreach { case (f, orig) =>
      val hd = ImageCodecs.hamming(
        ImageCodecs.dHash(VideoCodecs.toGrayImage(f)), ImageCodecs.dHash(orig))
      assert(hd <= 4, s"frame ${f.index} perceptual drift $hd bits")
    }
    assert(VideoCodecs.probe("RIFFjunk".getBytes("US-ASCII")).isEmpty)
  }

  test("video operators: probe meta, stride sampling, frame-level near-dups") {
    import spark.implicits._
    import graft.multimodal.VideoCodecs
    val (w, h) = (32, 18)
    def vid(phases: Seq[Int]) =
      VideoCodecs.encodeY4m(w, h, phases.map(gradientLuma(w, h, _)))
    // A and B share two distinct looks (phases 1, 2); C is unrelated noise
    val rnd = new scala.util.Random(7)
    val noisy = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val df = Seq(
      (1L, vid(Seq(1, 2, 3, 4, 5, 6))),
      (2L, vid(Seq(1, 2, 40, 41))),
      (3L, VideoCodecs.encodeY4m(w, h, Seq(noisy))),
      (4L, "not a video".getBytes("UTF-8"))).toDF("id", "content")

    val meta = Multimodal.withVideoMeta(df, "content")
      .select("id", "vid_format", "vid_frames").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getString(1), r.getInt(2))))).toMap
    assert(meta(1L).contains(("y4m", 6)) && meta(2L).contains(("y4m", 4)))
    assert(meta(4L).isEmpty, "non-video bytes must null out, not crash")

    val sampled = Multimodal.sampleVideoFrames(df, "id", "content",
      stride = 2, maxFrames = 2).collect()
    assert(sampled.filter(_.mediaId == 1L).map(_.frameIndex).sorted.toSeq ==
      Seq(0, 2), "every 2nd frame, capped at 2")

    val fh = Multimodal.videoFrameHashes(df, "id", "content")
    val pairs = Multimodal.videoNearDupsFromFrameHashes(fh,
      maxHamming = 2, minSharedFrames = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the two-shared-look pair must survive, got $pairs")
  }

  test("bmff round-trip: multi-track probe recovers brand, codec, dims, timing") {
    import graft.multimodal.Bmff
    val info = Bmff.Info("mp42", 1L, Seq(
      Bmff.Track("vide", "avc1", 1920, 1080, 90000L, 900000L, 240L),
      Bmff.Track("soun", "mp4a", 0, 0, 48000L, 480000L, 469L)))
    val got = Bmff.probe(Bmff.encode(info))
    assert(got.contains(info), s"$got")
  }

  test("bmff probe handles 64-bit largesize boxes and v1 mdhd") {
    import graft.multimodal.Bmff
    val bytes = Bmff.encode(Bmff.Info("isom", 0L,
      Seq(Bmff.Track("vide", "hev1", 640, 360, 600L, 6000L, 100L))))
    // rewrite the top-level moov header to the size==1 + largesize form
    val moovAt = {
      var p = 0; var found = -1
      while (found < 0 && p + 8 <= bytes.length) {
        val sz = ((bytes(p) & 0xffL) << 24) | ((bytes(p + 1) & 0xffL) << 16) |
          ((bytes(p + 2) & 0xffL) << 8) | (bytes(p + 3) & 0xffL)
        if (new String(bytes, p + 4, 4, "ISO-8859-1") == "moov") found = p
        else p += sz.toInt
      }
      found
    }
    assert(moovAt > 0)
    val moovSize = bytes.length - moovAt
    val out = new java.io.ByteArrayOutputStream()
    out.write(bytes, 0, moovAt)
    out.write(Array[Byte](0, 0, 0, 1))           // size == 1 marker
    out.write("moov".getBytes("ISO-8859-1"))
    val ls = moovSize + 8L                       // largesize includes itself
    (7 to 0 by -1).foreach(i => out.write(((ls >> (8 * i)) & 0xff).toInt))
    out.write(bytes, moovAt + 8, moovSize - 8)
    val probed = Bmff.probe(out.toByteArray)
    assert(probed.exists(_.tracks.map(_.codec) == Seq("hev1")), s"$probed")
    // v1 mdhd: hand-build vf=1 layout (timescale at +20, duration 64-bit)
    val mdhdV1 = {
      val b = new java.io.ByteArrayOutputStream()
      def be32(n: Long): Unit = (3 to 0 by -1).foreach(i =>
        b.write(((n >> (8 * i)) & 0xff).toInt))
      be32(44L); b.write("mdhd".getBytes("ISO-8859-1"))
      b.write(1); b.write(new Array[Byte](3))    // version 1, flags
      b.write(new Array[Byte](16))               // 64-bit ctime + mtime
      be32(1000L)                                // timescale
      be32(0L); be32(123456L)                    // 64-bit duration
      b.write(new Array[Byte](4))                // language + pre_defined
      b.toByteArray
    }
    assert(mdhdV1.length == 44)
    // splice: minimal mdia{mdhd(v1), hdlr, minf{stbl{stsd,stsz}}} via encode
    // of a track, then verify the v1 parse standalone through a tiny file
    val hdlr = {
      val b = new java.io.ByteArrayOutputStream()
      def be32(n: Long): Unit = (3 to 0 by -1).foreach(i =>
        b.write(((n >> (8 * i)) & 0xff).toInt))
      be32(21L); b.write("hdlr".getBytes("ISO-8859-1"))
      be32(0L); be32(0L); b.write("soun".getBytes("ISO-8859-1"))
      b.write(new Array[Byte](1))
      b.toByteArray
    }
    def boxOf(t: String, inner: Array[Byte]*): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      val tot = 8 + inner.map(_.length).sum
      (3 to 0 by -1).foreach(i => b.write(((tot >> (8 * i)) & 0xff).toInt))
      b.write(t.getBytes("ISO-8859-1")); inner.foreach(b.write); b.toByteArray
    }
    val stsd = boxOf("stsd", Array[Byte](0, 0, 0, 0, 0, 0, 0, 1),
      boxOf("mp4a", new Array[Byte](8)))
    val stsz = boxOf("stsz", new Array[Byte](8) ++ Array[Byte](0, 0, 0, 7))
    val file = boxOf("ftyp", "isom".getBytes("ISO-8859-1"),
        new Array[Byte](4)) ++
      boxOf("moov", boxOf("trak", boxOf("mdia", mdhdV1, hdlr,
        boxOf("minf", boxOf("stbl", stsd, stsz)))))
    val p2 = Bmff.probe(file)
    assert(p2.exists(_.tracks == Seq(
      Bmff.Track("soun", "mp4a", 0, 0, 1000L, 123456L, 7L))), s"$p2")
  }

  test("bmff probe is crash-proof on garbage and truncation; None without ftyp") {
    import graft.multimodal.Bmff
    assert(Bmff.probe(Array.emptyByteArray).isEmpty)
    assert(Bmff.probe("RIFF1234AVI LIST".getBytes("ISO-8859-1")).isEmpty)
    val good = Bmff.encode(Bmff.Info("isom", 0L,
      Seq(Bmff.Track("vide", "vp09", 320, 240, 600L, 600L, 24L))))
    // truncating anywhere must never throw
    Seq(4, 9, 17, good.length / 2, good.length - 3).foreach { cut =>
      Bmff.probe(java.util.Arrays.copyOfRange(good, 0, cut)) // no exception
    }
    // a truncated moov loses the track but keeps the valid ftyp framing
    val cut = Bmff.probe(java.util.Arrays.copyOfRange(good, 0, 24))
    assert(cut.exists(i => i.brand == "isom" && i.tracks.isEmpty), s"$cut")
  }
}
