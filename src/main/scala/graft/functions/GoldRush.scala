package graft.functions

import java.text.Normalizer
import java.util.regex.Pattern

import graft.marc.{MarcJson, MarcRecord}

/** Scala port of the GoldRush match-key algorithm (December2024_0 spec),
  * behavior-matched byte-for-byte against the reference's golden corpus
  * (reference: js/matchkeys/goldrush2024/goldrush.mjs:411-443; assertions in
  * js/test/assertions-goldrush2024.json).
  *
  * The key is 12 fixed-width components concatenated and lowercased:
  * title(70) year(4) pagination(4) edition(3) publisher(5) typeOfRecord(1)
  * titlePart(30) titleNumber(10) author(5) inclusiveDates(15) gdcn(var)
  * electronicIndicator(1).
  *
  * Pure function — registered as a Spark UDF by the matcher registry; at
  * scale it runs inside executors with no shared state.
  */
object GoldRush {

  /** single-pass char set for the punctuation → replacement phase
    * (goldrush.mjs stripPunctuation:93-121)
    */
  private val punctChars: Set[Char] =
    " !\"#$()*+,-./:;<=>?@[\\]^_`|~©".toSet

  private val leadingA = Pattern.compile("^ *[aA] +")
  private val leadingAn = Pattern.compile("^ *[aA]n +")
  private val leadingThe = Pattern.compile("^ *[tT]he +")

  /** Strip punctuation with the reference's exact rule order: %22 → _,
    * % → _, leading article removal (a/an/the), '{} removed, & → "and",
    * then each punctuation char → replaceChar.
    */
  def stripPunctuation(s: String, replaceChar: String): String = {
    var t = s
    t = t.replace("%22", "_")
    t = t.replace("%", "_")
    t = leadingA.matcher(t).replaceFirst("")
    t = leadingAn.matcher(t).replaceFirst("")
    t = leadingThe.matcher(t).replaceFirst("")
    t = t.replaceAll("['{}]", "")
    t = t.replace("&", "and")
    val sb = new StringBuilder(t.length)
    t.foreach { c =>
      if (punctChars(c)) sb.append(replaceChar) else sb.append(c)
    }
    sb.toString
  }

  /** NFD normalize + drop diacritic marks (JS \p{Diacritic} ≈ combining
    * marks + modifier-symbol diacritics after the punctuation phase).
    */
  def normalizeAndUnaccent(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFD)
      .replaceAll("[\\p{Mn}\\p{Me}\\p{Sk}]", "")

  /** squeeze spaces → '_', cut/pad to fixed width */
  def padContent(s: String, length: Int): String = {
    val squeezed = s.replaceAll(" +", " ").replace(' ', '_')
    squeezed.take(length).padTo(length, '_')
  }

  /** JS-style substring: clamps out-of-range indices instead of throwing */
  private def sub(s: String, from: Int, until: Int): String = {
    val a = math.min(math.max(from, 0), s.length)
    val b = math.min(math.max(until, a), s.length)
    s.substring(a, b)
  }

  private val year = Pattern.compile("[1-9][0-9]{3}")

  def doTitle(parts: Seq[Option[String]]): String = {
    val joined = parts.flatten.map(p => stripPunctuation(p, " ").trim).mkString
    padContent(normalizeAndUnaccent(joined.replace(" ", "")), 70)
  }

  def doPublicationYear(parts: Seq[Option[String]]): String = {
    var result = ""
    var n = 0
    while (result.isEmpty && n < parts.length) {
      parts(n).foreach { p =>
        val digits =
          if (n == 0) {
            val dateType = sub(p, 6, 7)
            if (dateType == "r") sub(p, 7, 11).replaceAll("[^0-9]", "")
            else sub(p, 11, 15).replaceAll("[^0-9]", "")
          } else p.replaceAll("[^0-9]", "")
        if (year.matcher(digits).find() && digits != "9999") result = digits
      }
      n += 1
    }
    padContent(if (result.isEmpty) "0000" else result, 4)
  }

  def doPagination(part: Option[String]): String = {
    val m = part.map(p => Pattern.compile("[0-9]{4}").matcher(p))
    padContent(m.filter(_.find()).map(_.group()).getOrElse(""), 4)
  }

  private val editionWords = Map(
    "fir" -> "1", "sec" -> "2", "thi" -> "3", "fou" -> "4", "fif" -> "5",
    "six" -> "6", "sev" -> "7", "eig" -> "8", "nin" -> "9", "ten" -> "10")

  def doEditionStatement(part: Option[String]): String = {
    val result = part.map(p => normalizeAndUnaccent(p).trim).flatMap { s =>
      (3 to 1 by -1).view
        .map(n => Pattern.compile(s"^([0-9]{$n})").matcher(s))
        .collectFirst { case m if m.find() => m.group(1) }
        .orElse {
          val m = Pattern.compile("^([a-zA-Z]{3})").matcher(s)
          if (m.find()) Some(editionWords.getOrElse(m.group(1).toLowerCase, "1"))
          else None
        }
    }
    padContent(result.getOrElse("1"), 3)
  }

  def doPublisherName(parts: Seq[Option[String]]): String = {
    // 264$b preferred; else 260$b (goldrush.mjs:271-287)
    val chosen = parts.headOption.flatten.orElse(parts.lift(1).flatten)
    val s = chosen.map(p => normalizeAndUnaccent(p).toLowerCase).getOrElse("")
    padContent(stripPunctuation(s, " ").replace(" ", ""), 5)
  }

  def doTypeOfRecord(leader: String): String =
    if (leader.length > 10) sub(leader, 6, 7) else ""

  def doTitlePart(parts: Seq[String]): String = {
    val s = parts.drop(1)
      .map(p => stripPunctuation(normalizeAndUnaccent(p).trim, "_").take(10))
      .mkString
    padContent(s, 30)
  }

  def doTitleNumber(part: Option[String]): String =
    padContent(part.map(stripPunctuation(_, "_")).getOrElse(""), 10)

  def doAuthor(parts: Seq[Option[String]]): String = {
    val s = parts.flatten
      .map(p => normalizeAndUnaccent(stripPunctuation(p, "")))
      .mkString
    padContent(s.replaceAll("[^a-zA-Z0-9]", ""), 5)
  }

  def doInclusiveDates(part: Option[String]): String =
    padContent(part.map(p => stripPunctuation(p.replace(" ", ""), "_")).getOrElse(""), 15)

  def doGDCN(part: Option[String]): String =
    part.map(p => normalizeAndUnaccent(stripPunctuation(p, "_")).take(32000))
      .getOrElse("")

  private def matchesWord(s: String, phrase: String): Boolean =
    Pattern.compile("\\b" + phrase + "\\b", Pattern.CASE_INSENSITIVE)
      .matcher(s).find()

  def doElectronicIndicator(r: MarcRecord): String = {
    def rel(tag: String, sf: String): Option[String] =
      r.firstSubfield(tag, sf).map(normalizeAndUnaccent)
    if (rel("245", "h").exists(matchesWord(_, "electronic resource"))) "e"
    else if (rel("590", "a").exists(matchesWord(_, "electronic reproduction"))) "e"
    else if (rel("533", "a").exists(matchesWord(_, "electronic reproduction"))) "e"
    else if (rel("300", "a").exists(matchesWord(_, "online resource"))) "e"
    else if (r.firstValue("007", None).exists(_.startsWith("c"))) "e"
    else if (r.firstValue("337", Some("a")).exists(_.startsWith("c"))) "e"
    else if (r.hasField("086") && r.hasField("856")) "e"
    else "p"
  }

  /** The full key from a normalized MarcRecord. */
  def matchkey(r: MarcRecord): String = {
    val leader = r.leader.getOrElse("00000nam a22000000a 4500")
    val key = new StringBuilder
    key ++= doTitle(Seq(
      r.firstSubfield("245", "a"), r.firstSubfield("245", "b"),
      r.firstSubfield("245", "p")))
    key ++= doPublicationYear(Seq(
      r.firstValue("008", None), r.firstSubfield("264", "c"),
      r.firstSubfield("260", "c")))
    key ++= doPagination(r.firstSubfield("300", "a"))
    key ++= doEditionStatement(r.firstSubfield("250", "a"))
    key ++= doPublisherName(Seq(
      r.firstSubfield("264", "b"), r.firstSubfield("260", "b")))
    key ++= doTypeOfRecord(leader)
    key ++= doTitlePart(r.allSubfields("245", "p"))
    key ++= doTitleNumber(r.firstSubfield("245", "n"))
    key ++= doAuthor(Seq(
      r.firstValue("100", Some("a")), r.firstValue("110", Some("a")),
      r.firstValue("111", Some("a")), r.firstValue("130", Some("a"))))
    key ++= doInclusiveDates(r.firstSubfield("245", "f"))
    key ++= doGDCN(r.firstSubfield("086", "a"))
    key ++= doElectronicIndicator(r)
    key.toString.toLowerCase
  }

  /** The key from a `{"marc": {...}}` payload JSON string (the matcher-module
    * contract, string-in/string-out).
    */
  def matchkeyFromPayload(json: String): String =
    matchkey(MarcJson.parsePayload(json))
}
