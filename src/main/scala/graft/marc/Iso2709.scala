package graft.marc

import java.nio.charset.StandardCharsets

/** ISO 2709 binary MARC codec (S1/S2).
  *
  * Framing follows the reference's permissive reader (Marc4jMapper.java:29-93):
  * records start with a 5-digit length; up to 4 junk bytes are skipped while
  * searching for the next frame. Record layout is the public ISO 2709
  * standard: 24-byte leader, directory of 12-byte entries terminated by 0x1E,
  * fields terminated by 0x1E, subfields delimited by 0x1F, record terminated
  * by 0x1D. Leader pos 9 == 'a' → UTF-8, else MARC-8 via [[Marc8]] (the
  * reference delegates that transliteration to marc4j's AnselToUnicode).
  */
object Iso2709 {

  final val FieldTerm = 0x1e
  final val SubfieldDelim = 0x1f
  final val RecordTerm = 0x1d

  /** Split a byte stream into individual record frames (permissive: skips up
    * to 4 junk bytes between records, like the reference's lookahead).
    */
  def frame(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var skipped = 0
    while (pos + 5 <= bytes.length && skipped <= 4) {
      val lenStr = new String(bytes, pos, 5, StandardCharsets.US_ASCII)
      if (lenStr.forall(_.isDigit)) {
        val len = lenStr.toInt
        if (len >= 24 && pos + len <= bytes.length) {
          out += java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
          skipped = 0
        } else {
          // malformed length — fall back to scanning for the record terminator
          val end = bytes.indexOf(RecordTerm.toByte, pos)
          if (end < 0) { pos = bytes.length }
          else { out += java.util.Arrays.copyOfRange(bytes, pos, end + 1); pos = end + 1 }
          skipped = 0
        }
      } else {
        pos += 1
        skipped += 1
      }
    }
    out.result()
  }

  /** Parse one framed ISO 2709 record. Leader pos 9 == 'a' → UTF-8;
    * otherwise the payload is MARC-8 and goes through the [[Marc8]]
    * basic/extended-Latin decoder (which passes unsupported ranges through
    * as Latin-1, preserving the previous permissive fallback).
    */
  def parseRecord(rec: Array[Byte]): MarcRecord = {
    val leader = new String(rec, 0, 24, StandardCharsets.US_ASCII)
    val decode: (Array[Byte], Int, Int) => String =
      if (leader.length > 9 && leader(9) == 'a')
        (b, from, until) => new String(b, from, until - from, StandardCharsets.UTF_8)
      else Marc8.decode
    val baseAddress = leader.substring(12, 17).trim.toIntOption.getOrElse(0)

    // directory: 12-byte entries (tag 3, length 4, start 5) until 0x1E
    val entries = Seq.newBuilder[(String, Int, Int)]
    var p = 24
    while (p + 12 <= rec.length && rec(p) != FieldTerm) {
      val tag = new String(rec, p, 3, StandardCharsets.US_ASCII)
      val flen = new String(rec, p + 3, 4, StandardCharsets.US_ASCII).trim.toIntOption.getOrElse(0)
      val fstart = new String(rec, p + 7, 5, StandardCharsets.US_ASCII).trim.toIntOption.getOrElse(0)
      entries += ((tag, flen, fstart))
      p += 12
    }

    val fields = entries.result().flatMap { case (tag, flen, fstart) =>
      val from = baseAddress + fstart
      val until = math.min(from + flen, rec.length)
      if (from >= rec.length || until <= from) None
      else {
        // drop the trailing field terminator
        val rawEnd = if (until > from && rec(until - 1) == FieldTerm) until - 1 else until
        val data = java.util.Arrays.copyOfRange(rec, from, rawEnd)
        Some(parseField(tag, data, decode))
      }
    }
    MarcRecord(Some(leader), fields)
  }

  private def parseField(tag: String, data: Array[Byte],
      decode: (Array[Byte], Int, Int) => String): MarcField = {
    val isControl = tag < "010" && !data.contains(SubfieldDelim.toByte)
    if (isControl) MarcField(tag, Some(decode(data, 0, data.length)), Nil, Nil)
    else {
      // first bytes up to the first subfield delimiter are indicators
      val firstDelim = data.indexOf(SubfieldDelim.toByte) match {
        case -1 => data.length
        case i => i
      }
      val indStr = decode(data, 0, firstDelim)
      val inds = indStr.zipWithIndex.map { case (c, i) =>
        Indicator(s"ind${i + 1}", c.toString)
      }
      val sfs = Seq.newBuilder[Subfield]
      var p = firstDelim
      while (p < data.length) {
        if (data(p) == SubfieldDelim.toByte && p + 1 < data.length) {
          val code = decode(data, p + 1, p + 2)
          var e = p + 2
          while (e < data.length && data(e) != SubfieldDelim.toByte) e += 1
          sfs += Subfield(code, decode(data, p + 2, e))
          p = e
        } else p += 1
      }
      MarcField(tag, None, inds.toSeq, sfs.result())
    }
  }

  def parseAll(bytes: Array[Byte]): Seq[MarcRecord] = frame(bytes).map(parseRecord)

  // ---------------- writer ----------------

  /** Serialize one record to ISO 2709 (UTF-8 payload, leader lengths
    * recomputed).
    */
  def write(rec: MarcRecord): Array[Byte] = {
    val charset = StandardCharsets.UTF_8
    val fieldBytes = rec.fields.map { f =>
      val body = f.value match {
        case Some(v) => v.getBytes(charset)
        case None =>
          val inds =
            if (f.indicators.nonEmpty) f.indicators.map(_.value).mkString
            else "  "
          val sb = new java.io.ByteArrayOutputStream()
          sb.write(inds.getBytes(charset))
          f.subfields.foreach { s =>
            sb.write(SubfieldDelim)
            sb.write(s.code.getBytes(charset))
            sb.write(s.value.getBytes(charset))
          }
          sb.toByteArray
      }
      (f.tag, body :+ FieldTerm.toByte)
    }
    val dir = new StringBuilder
    var offset = 0
    fieldBytes.foreach { case (tag, b) =>
      dir.append(tag).append(f"${b.length}%04d").append(f"$offset%05d")
      offset += b.length
    }
    val dirBytes = dir.toString.getBytes(charset) :+ FieldTerm.toByte
    val base = 24 + dirBytes.length
    val total = base + offset + 1
    val oldLeader = rec.leader.getOrElse(" " * 24).padTo(24, ' ').substring(0, 24)
      .toCharArray
    oldLeader(9) = 'a' // the writer always emits UTF-8
    val leader = f"$total%05d" + new String(oldLeader, 5, 7) +
      f"$base%05d" + new String(oldLeader, 17, 7)
    val out = new java.io.ByteArrayOutputStream(total)
    out.write(leader.getBytes(StandardCharsets.US_ASCII))
    out.write(dirBytes)
    fieldBytes.foreach { case (_, b) => out.write(b) }
    out.write(RecordTerm)
    out.toByteArray
  }
}
