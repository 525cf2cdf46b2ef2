package graft.oai

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.time.temporal.ChronoUnit
import java.util.Base64

/** OAI-PMH protocol helpers: resumption tokens (F29, ResumptionToken.java:27-56),
  * date parsing/formatting with the exclusive-until bump (F32-F35,
  * Util.java:41-110), and oai identifiers (F30, OaiService.java:47-54).
  */
object OaiDates {

  def parseIso(s: String): LocalDateTime =
    LocalDateTime.parse(s, DateTimeFormatter.ISO_DATE_TIME)

  /** OAI `from`: date (start-of-day) or datetime (Util.parseFrom) */
  def parseFrom(from: String): LocalDateTime =
    if (from.length == 10) parseIso(from + "T00:00:00") else parseIso(from)

  /** OAI `until` → exclusive bound: +1 day for dates, +1 second for datetimes
    * (Util.parseUntil)
    */
  def parseUntil(until: String): LocalDateTime =
    if (until.length == 10) parseIso(until + "T00:00:00").plusDays(1)
    else parseIso(until).plusSeconds(1)

  /** ISO datestamp, second precision, UTC (Util.formatOaiDateTime) */
  def formatOaiDateTime(d: LocalDateTime): String =
    d.atZone(ZoneOffset.UTC).truncatedTo(ChronoUnit.SECONDS)
      .format(DateTimeFormatter.ISO_OFFSET_DATE_TIME).replace("+00:00", "Z")

  /** watermark bump preserving granularity (Util.getNextOaiDate) */
  def nextOaiDate(datestamp: String): String = {
    val res = parseUntil(datestamp).format(DateTimeFormatter.ISO_DATE_TIME)
    if (datestamp.length == 10) res.substring(0, 10) else res + "Z"
  }

  /** DAYS (date granularity) or HOURS (datetime) between now and datestamp
    * (Util.unitsBetween)
    */
  def unitsBetween(now: LocalDateTime, datestamp: String): Long = {
    val ds = parseFrom(datestamp)
    if (datestamp.length > 10) ChronoUnit.HOURS.between(now, ds)
    else ChronoUnit.DAYS.between(now, ds)
  }
}

/** Keyset-pagination token, byte-compatible with the reference:
  * base64("<from>[/<clusterId>] <until|null> <set>") where `from` is
  * LocalDateTime.toString (ResumptionToken.java:27-56).
  *
  * `snapshotVersion` (set only by snapshot-pinned exports, SURVEY §7.4
  * risk 5) appends a FOURTH field " v=<n>" — absent, the encoding is
  * byte-identical to the reference's, so the compat default round-trips
  * reference tokens unchanged. A set id ending in a literal " v=<digits>"
  * would be mis-split; pool ids are word-like in practice (the reference
  * never validates them either).
  */
final case class ResumptionToken(
    set: String,
    until: Option[String],
    from: Option[LocalDateTime] = None,
    clusterId: Option[String] = None,
    snapshotVersion: Option[Long] = None) {

  def encode: String = {
    val f = from.getOrElse(throw new IllegalStateException("from unset"))
    val s = f.toString + clusterId.map("/" + _).getOrElse("") + " " +
      until.getOrElse("null") + " " + set +
      snapshotVersion.map(v => s" v=$v").getOrElse("")
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  }
}

object ResumptionToken {

  private val SnapSuffix = """(?s)(.*) v=(\d+)""".r

  def decode(coded: String): ResumptionToken = {
    val s = new String(Base64.getDecoder.decode(coded), "UTF-8")
    val i1 = s.indexOf(' ')
    val i2 = s.indexOf(' ', i1 + 1)
    if (i1 == -1 || i2 == -1)
      throw new IllegalArgumentException("Bad resumptiontoken")
    val islash0 = s.indexOf('/')
    val (fromStr, id) =
      if (islash0 > 0 && islash0 < i1)
        (s.substring(0, islash0), Some(s.substring(islash0 + 1, i1)))
      else (s.substring(0, i1), None)
    val untilStr = s.substring(i1 + 1, i2)
    val (setStr, snapV) = s.substring(i2 + 1) match {
      case SnapSuffix(rest, v) => (rest, Some(v.toLong))
      case rest => (rest, None)
    }
    ResumptionToken(
      set = setStr,
      until = if (untilStr == "null") None else Some(untilStr),
      from = Some(OaiDates.parseIso(fromStr)),
      clusterId = id,
      snapshotVersion = snapV)
  }
}

object OaiIdentifier {
  def encode(clusterId: String): String = s"oai:$clusterId"

  def decode(identifier: String): String =
    if (identifier.startsWith("oai:")) identifier.substring(4)
    else throw new IllegalArgumentException(s"bad oai identifier: $identifier")
}
