package graft.multimodal

/** REAL audio decode for RIFF/WAV PCM via the JDK's `javax.sound.sampled`
  * (ships with `java.desktop`; no external audio libraries): samples,
  * duration, and the standard lightweight curation features (RMS energy,
  * zero-crossing rate, clipping ratio). Per-row scalar kernels — no
  * shuffle, executor-parallel. Compressed formats (mp3/aac/ogg) have no
  * JDK decoder and remain out of scope; sniff them with
  * [[ImageHeaders]]-style container checks and route to an external
  * service at the pipeline edge.
  */
object AudioCodecs {

  final case class Pcm(sampleRate: Float, channels: Int,
      samples: Array[Float]) {
    def durationMs: Long =
      if (sampleRate <= 0 || channels <= 0) 0L
      else (samples.length.toLong * 1000 / (sampleRate.toLong * channels))
  }

  /** decode a WAV byte array to interleaved [-1, 1] float samples (8/16-bit
    * PCM; None for non-WAV or unsupported encodings)
    */
  def decodeWav(bytes: Array[Byte]): Option[Pcm] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          return None
        val raw = in.readAllBytes()
        val bits = fmt.getSampleSizeInBits
        val n = raw.length / (bits / 8)
        val out = new Array[Float](n)
        var i = 0
        if (bits == 16) {
          // 16-bit PCM is signed in practice; unsigned 16-bit is nonstandard
          // and would decode wrong through a signed ShortBuffer — reject it
          if (fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED) return None
          val order =
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN
          val bb = java.nio.ByteBuffer.wrap(raw).order(order).asShortBuffer()
          while (i < n) { out(i) = bb.get(i) / 32768.0f; i += 1 }
        } else if (bits == 8) {
          val unsigned =
            fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
          while (i < n) {
            out(i) =
              if (unsigned) (((raw(i) & 0xff) - 128) / 128.0f)
              else raw(i) / 128.0f
            i += 1
          }
        } else return None
        Some(Pcm(fmt.getSampleRate, fmt.getChannels, out))
      } finally in.close()
    } catch { case _: Exception => None }

  /** encode mono [-1, 1] floats as 16-bit little-endian PCM WAV (test
    * fixtures + resample sinks)
    */
  def encodeWavMono16(samples: Array[Float], sampleRate: Float): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    val bb = java.nio.ByteBuffer.wrap(data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach { s =>
      val clamped = math.max(-1.0f, math.min(1.0f, s))
      bb.putShort((clamped * 32767).toShort)
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  // feature kernels run per row inside UDFs over multi-million-sample
  // arrays: plain while loops, no intermediate collections

  /** root-mean-square energy in [0, 1] — silence/loudness filter
    * (channel-agnostic: interleaving doesn't change the mean square)
    */
  def rms(samples: Array[Float]): Double = {
    if (samples.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < samples.length) { acc += samples(i).toDouble * samples(i); i += 1 }
    math.sqrt(acc / samples.length)
  }

  /** Fraction of adjacent-sample sign changes WITHIN each channel — crude
    * voicing/noise signal. `channels` matters: interleaved stereo compared
    * sample-to-sample would count spurious L/R sign flips (out-of-phase
    * channels read as ZCR ~1.0 when neither channel crosses zero).
    */
  def zeroCrossingRate(samples: Array[Float], channels: Int = 1): Double = {
    val ch = math.max(1, channels)
    if (samples.length < 2 * ch) return 0.0
    var crossings = 0L
    var i = ch
    while (i < samples.length) {
      if ((samples(i - ch) >= 0) != (samples(i) >= 0)) crossings += 1
      i += 1
    }
    crossings.toDouble / (samples.length - ch)
  }

  /** fraction of samples at or beyond full scale — clipping detector */
  def clippingRatio(samples: Array[Float], threshold: Float = 0.999f): Double = {
    if (samples.isEmpty) return 0.0
    var clipped = 0L
    var i = 0
    while (i < samples.length) {
      if (math.abs(samples(i)) >= threshold) clipped += 1
      i += 1
    }
    clipped.toDouble / samples.length
  }
}
