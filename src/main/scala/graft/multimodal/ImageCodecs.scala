package graft.multimodal

import java.awt.image.BufferedImage

/** REAL image pixel codecs on the JDK's built-in `javax.imageio` (PNG /
  * JPEG / GIF / BMP readers ship with `java.desktop` — no external media
  * libraries needed): decode, resample, perceptual hashes, and a
  * luminance-grid embedding ready for `graft.similarity`.
  *
  * All functions are per-row scalar kernels — no driver work, no shuffle;
  * they run inside UDF/mapPartitions stages on executors. Decoders are
  * stateless (`ImageIO.read` on a byte array), so partition-level reuse
  * needs no open/close lifecycle.
  *
  * Perceptual hashing: [[dHash]] is the standard 8×8 horizontal-gradient
  * hash (64 bits; robust to rescaling, recompression, small edits). Two
  * images within `maxHamming` bits are near-duplicates; at corpus scale the
  * pair search bands the 64-bit hash into `maxHamming + 1` slices
  * (pigeonhole: any pair within maxHamming agrees on at least one slice)
  * and equi-joins on (band, slice) — exactly the simhashPairs shape
  * (dedup/Dedup.scala), never an all-pairs comparison.
  */
object ImageCodecs {

  /** decode to a BufferedImage; None for bytes no installed reader accepts */
  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** real pixel resample to exactly (w, h), bilinear */
  def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** mean luminance (ITU-R BT.601) of each cell of a g×g grid over the
    * bilinear-resampled image — the shared kernel under the hashes and the
    * embedding
    */
  def luminanceGrid(img: BufferedImage, g: Int): Array[Double] = {
    val s = resize(img, g, g)
    val out = new Array[Double](g * g)
    var i = 0
    while (i < g * g) {
      val rgb = s.getRGB(i % g, i / g)
      out(i) = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      i += 1
    }
    out
  }

  /** average hash: 64 bits, bit i set iff cell i of the 8×8 grid is above
    * the mean luminance
    */
  def aHash(img: BufferedImage): Long = {
    val lum = luminanceGrid(img, 8)
    val mean = lum.sum / lum.length
    lum.zipWithIndex.foldLeft(0L) { case (acc, (l, i)) =>
      if (l > mean) acc | (1L << i) else acc
    }
  }

  /** difference hash: 64 bits from the horizontal gradient of a 9×8
    * luminance grid (bit set iff cell brighter than its right neighbor) —
    * the recommended default perceptual hash
    */
  def dHash(img: BufferedImage): Long = {
    val s = resize(img, 9, 8)
    var acc = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        def lum(xx: Int): Double = {
          val rgb = s.getRGB(xx, y)
          0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)
        }
        if (lum(x) > lum(x + 1)) acc |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    acc
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** mean-centered, L2-normalized g×g luminance grid as a similarity-ready
    * embedding (cosine ≈ 1 for near-identical images; feed to
    * graft.similarity cosine/ANN operators)
    */
  def embedding(img: BufferedImage, grid: Int = 8): Array[Float] = {
    val lum = luminanceGrid(img, grid)
    val mean = lum.sum / lum.length
    val centered = lum.map(_ - mean)
    val norm = math.sqrt(centered.map(x => x * x).sum)
    if (norm == 0) centered.map(_ => 0.0f)
    else centered.map(x => (x / norm).toFloat)
  }
}
