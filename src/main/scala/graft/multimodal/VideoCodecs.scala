package graft.multimodal

import java.awt.image.BufferedImage

/** REAL video-container codecs in pure JVM — the round-7 "video stub" was
  * premised on the JDK having no video support, which is true of H.26x/VP9
  * BITSTREAMS but not of two widely-used containers whose frames the JDK
  * can fully decode:
  *
  *   - YUV4MPEG2 (`.y4m`): a plain-text stream header (`YUV4MPEG2 W.. H..
  *     F.. C..`) followed by `FRAME` records of raw planar YUV — the
  *     interchange format of ffmpeg/x264 test pipelines. The Y plane IS
  *     the luminance image, so decode is a header walk + plane slice.
  *   - MJPEG inside AVI (`.avi`): a RIFF chunk tree whose `movi` list
  *     holds one complete JPEG per video chunk (`00dc`/`00db`), each
  *     decodable by the JDK's built-in JPEG reader.
  *
  * Everything is a per-row scalar kernel (no driver work, no shuffle),
  * mirroring [[ImageCodecs]]; frames surface as [[VideoCodecs.LumaFrame]]
  * luminance planes that [[toGrayImage]] lifts into `BufferedImage` so the
  * existing perceptual-hash/embedding kernels apply unchanged. Compressed
  * video bitstreams (H.264 in MP4, VP9 in WebM, …) remain out of scope —
  * the JDK has no entropy decoder for them; `probe` returns None and a
  * deployment wires a JNI decoder through the same two functions.
  */
object VideoCodecs {

  /** container-level facts: format ("y4m" | "avi-mjpeg"), frame dims, count */
  final case class VideoInfo(format: String, width: Int, height: Int,
      nFrames: Int)

  /** one decoded frame as its luminance plane (row-major, unsigned bytes) */
  final case class LumaFrame(index: Int, width: Int, height: Int,
      luma: Array[Byte])

  // ---------------- YUV4MPEG2 ----------------

  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != 0x0A) i += 1
    i
  }

  /** bytes of the two chroma planes per frame for a colorspace tag */
  private def chromaBytes(w: Int, h: Int, cs: String): Option[Int] =
    if (cs.startsWith("420")) Some(2 * (((w + 1) / 2) * ((h + 1) / 2)))
    else if (cs.startsWith("422")) Some(2 * (((w + 1) / 2) * h))
    else if (cs == "444") Some(2 * w * h)
    else if (cs == "mono") Some(0)
    else None // 444alpha / unknown: refuse rather than misframe

  /** (width, height, colorspace, offset past the stream-header line) */
  private def y4mHeader(b: Array[Byte]): Option[(Int, Int, String, Int)] = {
    if (b.length < 10 || new String(b, 0, 9, "US-ASCII") != "YUV4MPEG2")
      return None
    val end = lineEnd(b, 0)
    if (end >= b.length) return None
    var w = -1; var h = -1; var cs = "420jpeg" // spec default
    new String(b, 0, end, "US-ASCII").split(" ").iterator.drop(1).foreach { t =>
      if (t.startsWith("W")) w = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("H")) h = t.drop(1).toIntOption.getOrElse(-1)
      else if (t.startsWith("C")) cs = t.drop(1)
    }
    if (w <= 0 || h <= 0) None else Some((w, h, cs, end + 1))
  }

  /** lazy frame walk (each FRAME record may carry its own parameters, so
    * positions are discovered sequentially); `copyLuma = false` skips the
    * plane copy for counting-only walks
    */
  private def y4mWalk(bytes: Array[Byte],
      copyLuma: Boolean): Option[(Int, Int, Iterator[LumaFrame])] =
    y4mHeader(bytes).flatMap { case (w, h, cs, start) =>
      chromaBytes(w, h, cs).map { cb =>
        val fsize = w * h + cb
        val it = new Iterator[LumaFrame] {
          private var pos = start
          private var idx = 0
          private var nextFrame: LumaFrame = _
          private def advance(): Unit = {
            nextFrame = null
            if (pos + 5 <= bytes.length &&
                new String(bytes, pos, 5, "US-ASCII") == "FRAME") {
              val e = lineEnd(bytes, pos)
              val dataStart = e + 1
              if (e < bytes.length && dataStart + fsize <= bytes.length) {
                val luma =
                  if (copyLuma) java.util.Arrays.copyOfRange(
                    bytes, dataStart, dataStart + w * h)
                  else Array.emptyByteArray
                nextFrame = LumaFrame(idx, w, h, luma)
                idx += 1
                pos = dataStart + fsize
              }
            }
          }
          advance()
          override def hasNext: Boolean = nextFrame != null
          override def next(): LumaFrame = {
            val f = nextFrame; advance(); f
          }
        }
        (w, h, it)
      }
    }

  // ---------------- MJPEG / AVI (RIFF) ----------------

  private def leInt(b: Array[Byte], p: Int): Long =
    (b(p) & 0xffL) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "US-ASCII")

  /** (offset, size) of every video-frame chunk (`##db`/`##dc`), in stream
    * order — a recursive RIFF walk that descends into LIST chunks (`movi`
    * may nest frames under `rec ` lists)
    */
  private def aviFrameChunks(bytes: Array[Byte]): Seq[(Int, Int)] = {
    if (bytes.length < 12 || fourcc(bytes, 0) != "RIFF" ||
        fourcc(bytes, 8) != "AVI ") return Nil
    val out = Seq.newBuilder[(Int, Int)]
    def walk(from: Int, to: Int): Unit = {
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(bytes, p)
        val size = leInt(bytes, p + 4).toInt
        val data = p + 8
        if (size < 0 || data + size > to) return // malformed: stop cleanly
        if (id == "LIST" && size >= 4) walk(data + 4, data + size)
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.endsWith("db") || id.endsWith("dc")) && size > 0)
          out += ((data, size))
        p = data + size + (size & 1) // chunks pad to even
      }
    }
    walk(12, bytes.length)
    out.result()
  }

  /** BT.601 luminance plane of a decoded image — the same formula as
    * [[ImageCodecs.luminanceGrid]], full resolution
    */
  def lumaOf(img: BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < w * h) {
      val rgb = img.getRGB(i % w, i / w)
      val y = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      out(i) = math.min(255, math.round(y)).toByte
      i += 1
    }
    out
  }

  // ---------------- unified surface ----------------

  /** container sniff + frame count + dims; None for anything the pure-JVM
    * path can't decode (compressed bitstream containers included)
    */
  def probe(bytes: Array[Byte]): Option[VideoInfo] =
    if (bytes.length >= 9 &&
        new String(bytes, 0, math.min(9, bytes.length), "US-ASCII") == "YUV4MPEG2")
      y4mWalk(bytes, copyLuma = false).map { case (w, h, it) =>
        VideoInfo("y4m", w, h, it.size)
      }
    else {
      val chunks = aviFrameChunks(bytes)
      if (chunks.isEmpty) None
      else chunks.view.flatMap { case (off, len) =>
        ImageCodecs.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
      }.headOption.map(first =>
        VideoInfo("avi-mjpeg", first.getWidth, first.getHeight, chunks.size))
    }

  /** lazily decoded luminance frames, container-dispatched (empty iterator
    * when `probe` would return None; undecodable AVI chunks are skipped)
    */
  def frames(bytes: Array[Byte]): Iterator[LumaFrame] =
    y4mWalk(bytes, copyLuma = true).map(_._3).getOrElse {
      aviFrameChunks(bytes).iterator.zipWithIndex.flatMap { case ((off, len), i) =>
        ImageCodecs.decode(java.util.Arrays.copyOfRange(bytes, off, off + len))
          .map(img => LumaFrame(i, img.getWidth, img.getHeight, lumaOf(img)))
      }
    }

  /** lift a luminance plane into a grayscale image so [[ImageCodecs]]'
    * perceptual hashes and embeddings apply to video frames unchanged
    */
  def toGrayImage(f: LumaFrame): BufferedImage = {
    val img = new BufferedImage(f.width, f.height, BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, f.width, f.height, f.luma)
    img
  }

  // ---------------- encoders (tests + synthetic pipelines) ----------------

  /** a REAL y4m container from luminance planes: Y as given, chroma planes
    * neutral (128) under C420jpeg — any y4m consumer plays it gray
    */
  def encodeY4m(w: Int, h: Int, lumaFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(lumaFrames.forall(_.length == w * h),
      s"each luma plane must be exactly ${w * h} bytes")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII"))
    val chroma = new Array[Byte](2 * (((w + 1) / 2) * ((h + 1) / 2)))
    java.util.Arrays.fill(chroma, 128.toByte)
    lumaFrames.foreach { y =>
      bos.write("FRAME\n".getBytes("US-ASCII"))
      bos.write(y)
      bos.write(chroma)
    }
    bos.toByteArray
  }

  /** a REAL minimal MJPEG-AVI: RIFF("AVI ") wrapping a `movi` LIST of one
    * `00dc` JPEG chunk per frame (no index — players rebuild it; our reader
    * and ffmpeg both accept index-less AVIs)
    */
  def encodeAviMjpeg(images: Seq[BufferedImage]): Array[Byte] = {
    def jpeg(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      // JPEG writer requires an opaque color model
      val rgb = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      val g = rgb.createGraphics()
      try g.drawImage(img, 0, 0, null) finally g.dispose()
      javax.imageio.ImageIO.write(rgb, "jpg", bos)
      bos.toByteArray
    }
    def le(n: Int): Array[Byte] = Array(
      (n & 0xff).toByte, ((n >> 8) & 0xff).toByte,
      ((n >> 16) & 0xff).toByte, ((n >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    images.foreach { img =>
      val j = jpeg(img)
      movi.write("00dc".getBytes("US-ASCII"))
      movi.write(le(j.length))
      movi.write(j)
      if ((j.length & 1) == 1) movi.write(0)
    }
    val moviBytes = movi.toByteArray
    val riff = new java.io.ByteArrayOutputStream()
    riff.write("RIFF".getBytes("US-ASCII"))
    riff.write(le(4 + 8 + moviBytes.length))
    riff.write("AVI ".getBytes("US-ASCII"))
    riff.write("LIST".getBytes("US-ASCII"))
    riff.write(le(moviBytes.length))
    riff.write(moviBytes)
    riff.toByteArray
  }
}
