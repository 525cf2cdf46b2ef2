package graft.multimodal

/** ISO Base Media File Format (ISO/IEC 14496-12 — MP4/MOV/3GP) container
  * probe: a pure box walker over the public format beside [[VideoCodecs]]'
  * RIFF walker. The box tree is length-prefixed big-endian framing —
  * `[size:4][type:4][payload]`, `size == 1` → 64-bit largesize follows,
  * `size == 0` → box runs to end of file — so ftyp brand, per-track codec
  * fourcc, visual dimensions, timescale/duration, and sample counts are
  * all recoverable WITHOUT any entropy decoding. What stays behind the
  * `Multimodal.MediaCodecs` stub is exactly the compressed BITSTREAM
  * (H.264/HEVC/VP9 payload decode); everything container-level is real
  * here.
  *
  * Parsed leaves: `ftyp` (major brand + minor version), per `trak`:
  * `mdhd` (v0/v1 timescale + duration), `hdlr` (handler type), first
  * `stsd` sample entry (codec fourcc; width/height for `vide` handlers),
  * `stsz` (sample count). Unknown/extra boxes are skipped by the size
  * prefix — the walk is forward-only and allocation-free per box.
  *
  * Malformed input (truncated boxes, negative sizes, payload overruns)
  * stops the walk cleanly: `probe` returns what was validly framed before
  * the damage, or None when even `ftyp` is absent — same crash-proof
  * contract as the RIFF walker.
  *
  * [[encode]] synthesizes a structurally-valid skeleton (ftyp + moov with
  * mvhd/tkhd/mdhd/hdlr/stsd/stts/stsc/stsz/stco) for fixtures and tests —
  * real framing with no media payload, the q67 pattern's BMFF twin.
  */
object Bmff {

  /** per-track container facts (no bitstream access) */
  final case class Track(handler: String, codec: String, width: Int,
      height: Int, timescale: Long, duration: Long, nSamples: Long)

  /** file-level probe result */
  final case class Info(brand: String, minorVersion: Long, tracks: Seq[Track])

  // ---------------- big-endian readers ----------------

  private def u16(b: Array[Byte], p: Int): Int =
    ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "ISO-8859-1")

  /** (type, payloadStart, payloadEnd) for each well-framed box in
    * [from, to); stops at the first malformed header */
  private def boxes(b: Array[Byte], from: Int, to: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = from
    var ok = true
    while (ok && p + 8 <= to) {
      val size32 = u32(b, p)
      val tpe = fourcc(b, p + 4)
      var payload = p + 8
      val end: Long =
        if (size32 == 0L) to.toLong // runs to end of enclosing space
        else if (size32 == 1L) {
          if (p + 16 > to) { ok = false; -1L }
          else { payload = p + 16; p + u64(b, p + 8) }
        } else p + size32
      if (ok && (end < payload || end > to)) ok = false
      if (ok) {
        out += ((tpe, payload, end.toInt))
        p = end.toInt
      }
    }
    out.result()
  }

  private def child(bs: Seq[(String, Int, Int)], tpe: String): Option[(Int, Int)] =
    bs.collectFirst { case (`tpe`, s, e) => (s, e) }

  /** mdhd → (timescale, duration); version 0 and 1 layouts */
  private def mdhd(b: Array[Byte], s: Int, e: Int): Option[(Long, Long)] = {
    if (s + 4 > e) return None
    b(s) match {
      case 0 if s + 20 <= e => Some((u32(b, s + 12), u32(b, s + 16)))
      case 1 if s + 32 <= e => Some((u32(b, s + 20), u64(b, s + 24)))
      case _ => None
    }
  }

  /** hdlr → handler_type (payload offset 8) */
  private def hdlr(b: Array[Byte], s: Int, e: Int): Option[String] =
    if (s + 12 <= e) Some(fourcc(b, s + 8)) else None

  /** first stsd sample entry → (codec fourcc, width, height); dims only
    * meaningful for visual entries (offsets 32/34 inside the entry per the
    * VisualSampleEntry layout), 0 otherwise */
  private def stsd(b: Array[Byte], s: Int, e: Int,
      visual: Boolean): Option[(String, Int, Int)] = {
    if (s + 16 > e || u32(b, s + 4) < 1L) return None
    val entry = s + 8
    val entrySize = u32(b, entry)
    if (entrySize < 8L || entry + entrySize > e) return None
    val codec = fourcc(b, entry + 4)
    if (visual && entry + 36 <= e)
      Some((codec, u16(b, entry + 32), u16(b, entry + 34)))
    else Some((codec, 0, 0))
  }

  /** stsz → sample_count (fixed-size shortcut field skipped either way) */
  private def stsz(b: Array[Byte], s: Int, e: Int): Option[Long] =
    if (s + 12 <= e) Some(u32(b, s + 8)) else None

  /** container sniff over the whole byte array; None unless a well-formed
    * `ftyp` leads (the BMFF signature) */
  def probe(bytes: Array[Byte]): Option[Info] = {
    val top = boxes(bytes, 0, bytes.length)
    val ft = child(top, "ftyp").filter { case (s, e) => s + 8 <= e }
      .map { case (s, _) => (fourcc(bytes, s), u32(bytes, s + 4)) }
    ft.map { case (brand, minor) =>
      val tracks = child(top, "moov").toSeq.flatMap { case (ms, me) =>
        boxes(bytes, ms, me).collect { case ("trak", ts, te) =>
          val mdia = child(boxes(bytes, ts, te), "mdia")
          mdia.flatMap { case (ds, de) =>
            val mb = boxes(bytes, ds, de)
            val handler = child(mb, "hdlr")
              .flatMap { case (s, e) => hdlr(bytes, s, e) }.getOrElse("????")
            val timing = child(mb, "mdhd")
              .flatMap { case (s, e) => mdhd(bytes, s, e) }
            val stbl = child(mb, "minf").map { case (s, e) => boxes(bytes, s, e) }
              .flatMap(child(_, "stbl")).map { case (s, e) => boxes(bytes, s, e) }
            val entry = stbl.flatMap(child(_, "stsd"))
              .flatMap { case (s, e) => stsd(bytes, s, e, handler == "vide") }
            val n = stbl.flatMap(child(_, "stsz"))
              .flatMap { case (s, e) => stsz(bytes, s, e) }
            entry.map { case (codec, w, h) =>
              Track(handler, codec, w, h,
                timing.map(_._1).getOrElse(0L), timing.map(_._2).getOrElse(0L), n.getOrElse(0L))
            }
          }
        }.flatten
      }
      Info(brand, minor, tracks)
    }
  }

  // ---------------- encoder (fixtures + synthetic pipelines) ----------------

  private def be16(n: Int): Array[Byte] =
    Array(((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

  private def be32(n: Long): Array[Byte] = Array(
    ((n >> 24) & 0xff).toByte, ((n >> 16) & 0xff).toByte,
    ((n >> 8) & 0xff).toByte, (n & 0xff).toByte)

  private def box(tpe: String, payloads: Array[Byte]*): Array[Byte] = {
    val total = 8 + payloads.map(_.length).sum
    val bos = new java.io.ByteArrayOutputStream(total)
    bos.write(be32(total))
    bos.write(tpe.getBytes("ISO-8859-1"))
    payloads.foreach(bos.write)
    bos.toByteArray
  }

  private def full(tpe: String, payloads: Array[Byte]*): Array[Byte] =
    box(tpe, (Array[Byte](0, 0, 0, 0) +: payloads): _*)

  /** a structurally-valid BMFF skeleton: real box framing, no media data */
  def encode(info: Info): Array[Byte] = {
    require(info.brand.length == 4, s"brand must be 4 chars: ${info.brand}")
    val ftyp = box("ftyp", info.brand.getBytes("ISO-8859-1"),
      be32(info.minorVersion), info.brand.getBytes("ISO-8859-1"))
    val mvhd = full("mvhd",
      new Array[Byte](8),                 // ctime, mtime
      be32(600L), be32(0L),               // timescale, duration
      be32(0x00010000L), be16(0x0100),    // rate 1.0, volume 1.0
      new Array[Byte](10),                // reserved
      unityMatrix, new Array[Byte](24),   // matrix, pre_defined
      be32(info.tracks.size + 1L))        // next_track_ID
    val traks = info.tracks.zipWithIndex.map { case (t, i) =>
      require(t.codec.length == 4 && t.handler.length == 4,
        s"codec/handler must be 4 chars: ${t.codec}/${t.handler}")
      val tkhd = full("tkhd",
        new Array[Byte](8), be32(i + 1L), be32(0L), be32(t.duration),
        new Array[Byte](16), unityMatrix,
        be32(t.width.toLong << 16), be32(t.height.toLong << 16))
      val mdhdB = full("mdhd",
        new Array[Byte](8), be32(t.timescale), be32(t.duration),
        be16(0x55c4), be16(0))            // language 'und', pre_defined
      val hdlrB = full("hdlr", be32(0L),
        t.handler.getBytes("ISO-8859-1"), new Array[Byte](12),
        Array[Byte](0))                   // empty name
      val entry =
        if (t.handler == "vide") box(t.codec,
          new Array[Byte](6), be16(1),    // reserved, data_ref_index
          new Array[Byte](16),            // pre_defined / reserved block
          be16(t.width), be16(t.height),
          be32(0x00480000L), be32(0x00480000L), // 72 dpi
          be32(0L), be16(1),              // reserved, frame_count
          new Array[Byte](32),            // compressorname
          be16(0x0018), be16(0xffff))     // depth, pre_defined
        else box(t.codec, new Array[Byte](6), be16(1), new Array[Byte](20))
      val stsdB = full("stsd", be32(1L), entry)
      val stbl = box("stbl", stsdB, full("stts", be32(0L)),
        full("stsc", be32(0L)),
        full("stsz", be32(0L), be32(t.nSamples)), // sample_size 0 + count
        full("stco", be32(0L)))
      val minf = box("minf", stbl)
      box("trak", tkhd, box("mdia", mdhdB, hdlrB, minf))
    }
    val moov = box("moov", (mvhd +: traks): _*)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(ftyp); bos.write(moov)
    bos.toByteArray
  }

  private def unityMatrix: Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(36)
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(v => bos.write(be32(v)))
    bos.toByteArray
  }
}
