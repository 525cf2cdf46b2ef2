package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL (non-stub) image metadata extraction: container dimensions and
  * format parsed straight from the header bytes — PNG IHDR, JPEG SOF
  * segments, GIF logical screen descriptor. No media library involved;
  * this is pure byte reading, so it runs as an executor-parallel scalar
  * stage over binary columns at any scale (unlike pixel decode, which
  * stays behind the documented MediaCodecs stubs until a decoder library
  * is available).
  */
object ImageHeaders {

  final case class ImageInfo(format: String, width: Int, height: Int)

  def parse(bytes: Array[Byte]): Option[ImageInfo] = {
    if (bytes == null || bytes.length < 10) None
    else if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else if (isGif(bytes)) parseGif(bytes)
    else None
  }

  private def u8(b: Byte): Int = b & 0xff

  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b(i)) << 24) | (u8(b(i + 1)) << 16) | (u8(b(i + 2)) << 8) | u8(b(i + 3))

  private def be16(b: Array[Byte], i: Int): Int = (u8(b(i)) << 8) | u8(b(i + 1))

  private def le16(b: Array[Byte], i: Int): Int = u8(b(i)) | (u8(b(i + 1)) << 8)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && java.util.Arrays.equals(b.take(8), PngSig)

  /** signature(8) + chunk length(4) + "IHDR" + width(4 BE) + height(4 BE) */
  private def parsePng(b: Array[Byte]): Option[ImageInfo] =
    if (b.length < 24 || !(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      None
    else Some(ImageInfo("png", be32(b, 16), be32(b, 20)))

  private def isJpeg(b: Array[Byte]): Boolean =
    u8(b(0)) == 0xff && u8(b(1)) == 0xd8

  /** walk FF-marker segments to the first start-of-frame (C0-CF minus the
    * non-frame C4/C8/CC): [len(2) precision(1) height(2 BE) width(2 BE)]
    */
  private def parseJpeg(b: Array[Byte]): Option[ImageInfo] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b(i)) != 0xff) return None // not a marker boundary: corrupt
      val marker = u8(b(i + 1))
      if (marker == 0xff) {
        i += 1 // optional 0xFF fill bytes before a marker (T.81 B.1.1.2)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
        i += 2 // standalone marker, no length field
      } else if (marker >= 0xc0 && marker <= 0xcf
          && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        return if (i + 8 < b.length)
          Some(ImageInfo("jpeg", be16(b, i + 7), be16(b, i + 5)))
        else None
      } else {
        i += 2 + be16(b, i + 2) // skip the segment (length includes itself)
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** header(6) + logical screen width(2 LE) + height(2 LE) */
  private def parseGif(b: Array[Byte]): Option[ImageInfo] =
    Some(ImageInfo("gif", le16(b, 6), le16(b, 8)))

  /** annotate a binary column with (img_format, img_width, img_height) —
    * null for unrecognized or truncated bytes
    */
  def withImageDims(df: DataFrame, contentCol: String): DataFrame = {
    val parseUdf = udf((c: Array[Byte]) => parse(c))
    df.withColumn("_img", parseUdf(col(contentCol)))
      .withColumn("img_format", col("_img.format"))
      .withColumn("img_width", col("_img.width"))
      .withColumn("img_height", col("_img.height"))
      .drop("_img")
  }
}
