package graft.marc

/** MARC-8 → Unicode decoder for the basic (ASCII) and extended Latin (ANSEL)
  * character sets, from the public Library of Congress MARC-8 code tables.
  * The reference delegates this to marc4j's permissive reader
  * (Marc4jMapper.java:29-93 + marc4j AnselToUnicode); this is a fresh
  * implementation of the same published mapping.
  *
  * Semantics:
  *   - G0 defaults to ASCII, G1 to ANSEL; ESC sequences may designate the
  *     single-byte sets we support (ASCII `B`, ANSEL `E`, Greek symbols `g`,
  *     subscript `b`, superscript `p`, default `s`). Unsupported set
  *     designations (CJK, Cyrillic, Hebrew, Arabic, full Greek) switch the
  *     decoder to a Latin-1 passthrough for that range — permissive, never
  *     throwing, like the reference's reader.
  *   - MARC-8 combining diacritics PRECEDE their base character; Unicode
  *     combining marks follow it. Pending diacritics are buffered and
  *     emitted after the next base character, preserving their order.
  */
object Marc8 {

  /** ANSEL spacing characters (LoC code table 2: Extended Latin). */
  private val ansel: Map[Int, Char] = Map(
    0x8D -> '\u200D', 0x8E -> '\u200C', // zero-width joiner / non-joiner
    0xA1 -> '\u0141', 0xA2 -> '\u00D8', 0xA3 -> '\u0110', 0xA4 -> '\u00DE',
    0xA5 -> '\u00C6', 0xA6 -> '\u0152', 0xA7 -> '\u02B9', 0xA8 -> '\u00B7',
    0xA9 -> '\u266D', 0xAA -> '\u00AE', 0xAB -> '\u00B1', 0xAC -> '\u01A0',
    0xAD -> '\u01AF', 0xAE -> '\u02BC',
    0xB0 -> '\u02BB', 0xB1 -> '\u0142', 0xB2 -> '\u00F8', 0xB3 -> '\u0111',
    0xB4 -> '\u00FE', 0xB5 -> '\u00E6', 0xB6 -> '\u0153', 0xB7 -> '\u02BA',
    0xB8 -> '\u0131', 0xB9 -> '\u00A3', 0xBA -> '\u00F0', 0xBC -> '\u01A1',
    0xBD -> '\u01B0',
    0xC0 -> '\u00B0', 0xC1 -> '\u2113', 0xC2 -> '\u2117', 0xC3 -> '\u00A9',
    0xC4 -> '\u266F', 0xC5 -> '\u00BF', 0xC6 -> '\u00A1', 0xC7 -> '\u00DF',
    0xC8 -> '\u20AC')

  /** ANSEL combining diacritics (precede the base in MARC-8). Like the
    * reference's marc4j path, the two-character ligature and double-tilde
    * pairs become one spanning mark on the first half (U+0361 / U+0360) and
    * the right halves (EC / FB) decode to nothing.
    */
  private val combining: Map[Int, String] = Map(
    0xE0 -> "\u0309", 0xE1 -> "\u0300", 0xE2 -> "\u0301", 0xE3 -> "\u0302",
    0xE4 -> "\u0303", 0xE5 -> "\u0304", 0xE6 -> "\u0306", 0xE7 -> "\u0307",
    0xE8 -> "\u0308", 0xE9 -> "\u030C", 0xEA -> "\u030A", 0xEB -> "\u0361",
    0xEC -> "", 0xED -> "\u0315", 0xEE -> "\u030B", 0xEF -> "\u0310",
    0xF0 -> "\u0327", 0xF1 -> "\u0328", 0xF2 -> "\u0323", 0xF3 -> "\u0324",
    0xF4 -> "\u0325", 0xF5 -> "\u0333", 0xF6 -> "\u0332", 0xF7 -> "\u0326",
    0xF8 -> "\u031C", 0xF9 -> "\u032E", 0xFA -> "\u0360", 0xFB -> "",
    0xFE -> "\u0313")

  private val greekSymbols: Map[Int, Char] =
    Map(0x61 -> '\u03B1', 0x62 -> '\u03B2', 0x63 -> '\u03B3')

  private val subscript: Map[Int, Char] = Map(
    0x28 -> '\u208D', 0x29 -> '\u208E', 0x2B -> '\u208A', 0x2D -> '\u208B') ++
    (0 to 9).map(d => (0x30 + d) -> ('\u2080' + d).toChar)

  private val superscript: Map[Int, Char] = Map(
    0x28 -> '\u207D', 0x29 -> '\u207E', 0x2B -> '\u207A', 0x2D -> '\u207B',
    0x30 -> '\u2070', 0x31 -> '\u00B9', 0x32 -> '\u00B2', 0x33 -> '\u00B3') ++
    (4 to 9).map(d => (0x30 + d) -> ('\u2070' + d).toChar)

  private sealed trait CharSet
  private case object Ascii extends CharSet
  private case object Ansel extends CharSet
  private case object GreekSym extends CharSet
  private case object Sub extends CharSet
  private case object Sup extends CharSet
  private case object Unknown extends CharSet // unsupported set → Latin-1 passthrough

  def decode(bytes: Array[Byte]): String = decode(bytes, 0, bytes.length)

  def decode(bytes: Array[Byte], from: Int, until: Int): String = {
    val out = new StringBuilder(until - from)
    val pending = new StringBuilder(4) // buffered combining marks
    var g0: CharSet = Ascii
    var g1: CharSet = Ansel
    var i = from

    def emitBase(c: Char): Unit = {
      out.append(c)
      if (pending.nonEmpty) { out.append(pending); pending.clear() }
    }

    while (i < until) {
      val b = bytes(i) & 0xff
      if (b == 0x1b && i + 1 < until) { // escape sequence
        val c1 = (bytes(i + 1) & 0xff).toChar
        c1 match {
          case 'g' => g0 = GreekSym; i += 2
          case 'b' => g0 = Sub; i += 2
          case 'p' => g0 = Sup; i += 2
          case 's' => g0 = Ascii; i += 2
          case '(' | ',' | ')' | '-' | '$' =>
            // single- or multi-byte set designation: intermediates then final
            var j = i + 1
            while (j < until && "(),-$!".contains((bytes(j) & 0xff).toChar)) j += 1
            val toG1 = (i + 1 until j)
              .exists(k => (bytes(k) & 0xff) == ')' || (bytes(k) & 0xff) == '-')
            if (j < until) {
              val target = (bytes(j) & 0xff).toChar match {
                case 'B' => Ascii
                case 'E' => Ansel
                case _ => Unknown
              }
              if (toG1) g1 = target else g0 = target
              i = j + 1
            } else i = until
          case _ => emitBase(b.toChar); i += 1 // stray ESC: pass through
        }
      } else if (b < 0x80) {
        val c: Option[Char] = g0 match {
          case GreekSym => greekSymbols.get(b)
          case Sub => subscript.get(b)
          case Sup => superscript.get(b)
          case _ => None
        }
        emitBase(c.getOrElse(b.toChar))
        i += 1
      } else {
        g1 match {
          case Ansel if combining.contains(b) => pending.append(combining(b))
          case Ansel => emitBase(ansel.getOrElse(b, b.toChar))
          case _ => emitBase(b.toChar) // Latin-1 passthrough
        }
        i += 1
      }
    }
    if (pending.nonEmpty) out.append(pending) // trailing orphan diacritics
    out.toString
  }
}
