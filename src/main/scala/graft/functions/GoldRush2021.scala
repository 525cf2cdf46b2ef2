package graft.functions

import java.util.regex.Pattern

import graft.marc.{MarcJson, MarcRecord}

/** The September 2021 GoldRush variant (reference:
  * js/matchkeys/goldrush/goldrush.mjs, v1.1.0), golden-tested against
  * js/test/assertions-goldrush2021.json. Differences from 2024:
  * first-field-only accessors (getField), spaces preserved in the title,
  * an extra GMD(245$h) component, date2-then-date1 year logic with a
  * leading-zero-tolerant regex, unanchored edition digits with no default,
  * and a 20-wide author with `_` replacement and no 130$a.
  */
object GoldRush2021 {

  import GoldRush.{normalizeAndUnaccent, padContent, stripPunctuation}

  private def sub(s: String, from: Int, until: Int): String = {
    val a = math.min(math.max(from, 0), s.length)
    val b = math.min(math.max(until, a), s.length)
    s.substring(a, b)
  }

  private val year = Pattern.compile("[0-9]{4}")

  /** getField semantics: first field with tag only */
  private def first(r: MarcRecord, tag: String, sf: String): Option[String] =
    r.firstValue(tag, Some(sf))

  def doTitle(parts: Seq[Option[String]]): String = {
    val joined = parts.flatten.map(p => stripPunctuation(p, " ").trim).mkString
    padContent(normalizeAndUnaccent(joined), 70)
  }

  def doGMD(part: Option[String]): String =
    padContent(part.map(p =>
      normalizeAndUnaccent(p).replaceAll("[^a-zA-Z0-9]", "")).getOrElse(""), 5)

  def doPublicationYear(parts: Seq[Option[String]]): String = {
    var result = ""
    var n = 0
    def ok(d: String) = year.matcher(d).find() && d != "9999"
    while (result.isEmpty && n < parts.length) {
      parts(n).foreach { p =>
        if (n == 0) {
          val date2 = sub(p, 11, 15).replaceAll("[^0-9]", "")
          if (ok(date2)) result = date2
          else {
            val date1 = sub(p, 7, 11).replaceAll("[^0-9]", "")
            if (ok(date1)) result = date1
          }
        } else {
          val digits = p.replaceAll("[^0-9]", "")
          if (ok(digits)) result = digits
        }
      }
      n += 1
    }
    padContent(if (result.isEmpty) "0000" else result, 4)
  }

  def doEditionStatement(part: Option[String]): String = {
    val result = part.map(normalizeAndUnaccent).map { s =>
      (3 to 1 by -1).view
        .map(n => Pattern.compile(s"([0-9]{$n})").matcher(s))
        .collectFirst { case m if m.find() => m.group(1) }
        .getOrElse {
          sub(s, 0, 3).toLowerCase match {
            case "fir" => "1"; case "sec" => "2"; case "thi" => "3"
            case "fou" => "4"; case "fif" => "5"; case "six" => "6"
            case "sev" => "7"; case "eig" => "8"; case "nin" => "9"
            case "ten" => "10"; case _ => ""
          }
        }
    }
    padContent(result.getOrElse(""), 3)
  }

  def doAuthor(parts: Seq[Option[String]]): String = {
    val s = parts.flatten
      .map(p => normalizeAndUnaccent(stripPunctuation(p, "_")))
      .mkString
    padContent(s, 20)
  }

  private def matchesWord(s: String, phrase: String): Boolean =
    Pattern.compile("\\b" + phrase + "\\b", Pattern.CASE_INSENSITIVE)
      .matcher(s).find()

  def doElectronicIndicator(r: MarcRecord): String = {
    def f(tag: String, sf: String): Option[String] =
      first(r, tag, sf).map(normalizeAndUnaccent)
    if (f("245", "h").exists(matchesWord(_, "electronic resource"))) "e"
    else if (f("590", "a").exists(matchesWord(_, "electronic reproduction"))) "e"
    else if (f("533", "a").exists(matchesWord(_, "electronic reproduction"))) "e"
    else if (f("300", "a").exists(matchesWord(_, "online resource"))) "e"
    else if (r.firstValue("007", None).exists(_.startsWith("c"))) "e"
    else if (first(r, "337", "a").exists(_.startsWith("c"))) "e"
    else if (r.hasField("086") && r.hasField("856")) "e"
    else "p"
  }

  def matchkey(r: MarcRecord): String = {
    val leader = r.leader.getOrElse("00000nam a22000000a 4500")
    val key = new StringBuilder
    key ++= doTitle(Seq(first(r, "245", "a"), first(r, "245", "b"),
      first(r, "245", "p")))
    key ++= doGMD(first(r, "245", "h"))
    key ++= doPublicationYear(Seq(r.firstValue("008", None),
      first(r, "264", "c"), first(r, "260", "c")))
    key ++= GoldRush.doPagination(first(r, "300", "a"))
    key ++= doEditionStatement(first(r, "250", "a"))
    key ++= GoldRush.doPublisherName(Seq(first(r, "264", "b"),
      first(r, "260", "b")))
    key ++= GoldRush.doTypeOfRecord(leader)
    key ++= GoldRush.doTitlePart(r.allSubfields("245", "p"))
    key ++= GoldRush.doTitleNumber(first(r, "245", "n"))
    key ++= doAuthor(Seq(first(r, "100", "a"), first(r, "110", "a"),
      first(r, "111", "a")))
    key ++= GoldRush.doInclusiveDates(first(r, "245", "f"))
    key ++= GoldRush.doGDCN(first(r, "086", "a"))
    key ++= doElectronicIndicator(r)
    key.toString.toLowerCase
  }

  def matchkeyFromPayload(json: String): String =
    matchkey(MarcJson.parsePayload(json))
}
