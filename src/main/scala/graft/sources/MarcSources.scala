package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.marc.{Iso2709, MarcJson, MarcRecord, MarcXml}
import graft.model.{GlobalRecord, IngestMapper}

/** Spark sources for the reference's ingest formats (S1-S5, S7):
  *   - ISO 2709 binary MARC (content-type octet-stream/marc)
  *   - MARCXML collections
  *   - large JSON envelopes `{"sourceId":…, "records":[…]}`
  *
  * Layout: one input file = one task (binaryFile source), framing/parsing
  * inside the partition — at 100 TB, MARC corpora arrive as many files, and
  * per-file parallelism is the natural unit because the holdings-grouping
  * contract (F10) is file-ordered. The XML fixer (S5) is an opt-in byte-level
  * pre-pass, as in the reference (UploadService.java:122).
  */
object MarcSources {

  /** all MARCXML records across the matching files */
  def readMarcXml(spark: SparkSession, path: String,
      xmlFixing: Boolean = false): Dataset[MarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val fixed = if (xmlFixing) XmlFixer.fix(bytes) else bytes
        MarcXml.parseCollection(new String(fixed, StandardCharsets.UTF_8))
      }
  }

  /** all ISO 2709 records across the matching files */
  def readIso2709(spark: SparkSession, path: String): Dataset[MarcRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(bytes => Iso2709.parseAll(bytes))
  }

  /** Parsed MARC → global records with holdings grouping (F10). Grouping is
    * per file, preserving in-file order.
    */
  def toGlobalRecords(spark: SparkSession, path: String, binary: Boolean,
      sourceId: String, sourceVersion: Int,
      xmlFixing: Boolean = false): Dataset[GlobalRecord] = {
    import spark.implicits._
    val sid = GlobalRecord.normalizeSourceId(sourceId)
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap { bytes =>
        val recs =
          if (binary) Iso2709.parseAll(bytes)
          else {
            val fixed = if (xmlFixing) XmlFixer.fix(bytes) else bytes
            MarcXml.parseCollection(new String(fixed, StandardCharsets.UTF_8))
          }
        IngestMapper.group(recs.iterator)
          .map(_.toGlobalRecord(sid, sourceVersion)).toSeq
      }
  }

  /** S4: `{"sourceId":…, "sourceVersion":…, "records":[{localId, payload,
    * delete}]}` → one row per record, payload re-serialized as a JSON string
    * (LargeJsonReadStream.java:10-100 semantics, set-based).
    */
  def readRecordsJson(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    val raw = spark.read.option("multiLine", true).json(path)
    val recFields = raw.schema("records").dataType match {
      case ArrayType(st: StructType, _) => st.fieldNames.toSet
      case other => sys.error(s"records is not an array of objects: $other")
    }
    def opt(name: String, fallback: org.apache.spark.sql.Column) =
      if (recFields.contains(name)) col(s"r.$name") else fallback
    val version =
      if (raw.columns.contains("sourceVersion")) col("sourceVersion").cast("int")
      else lit(1)
    // payload: modern `payload` object, or legacy `marcPayload` /
    // `inventoryPayload` pair folded into {"marc":…, "inventory":…}
    // (IngestRecord.java:22-40)
    val payload =
      if (recFields.contains("payload"))
        when(col("r.payload").isNotNull, to_json(col("r.payload")))
      else if (recFields.contains("marcPayload")) {
        val merged =
          if (recFields.contains("inventoryPayload"))
            struct(col("r.marcPayload").as("marc"),
              col("r.inventoryPayload").as("inventory"))
          else struct(col("r.marcPayload").as("marc"))
        when(col("r.marcPayload").isNotNull, to_json(merged))
      } else lit(null).cast("string")
    raw.select(col("sourceId"), version.as("sourceVersion"),
        explode(col("records")).as("r"))
      .select(
        opt("localId", lit(null).cast("string")).as("localId"),
        col("sourceId"),
        col("sourceVersion"),
        payload.as("payloadJson"),
        coalesce(opt("delete", lit(false)).cast("boolean"), lit(false))
          .as("delete"))
  }
}

/** S5: byte-level repair of malformed XML (XmlFixerMapper.java:6-280
  * semantics): invalid UTF-8 sequences → U+FFFD, XML-illegal control
  * characters → numeric character reference removal, bare '&' not starting a
  * valid entity → &amp;.
  */
object XmlFixer {

  def fix(bytes: Array[Byte]): Array[Byte] = {
    // decode permissively: malformed sequences become U+FFFD
    val s = new String(bytes, StandardCharsets.UTF_8)
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '&' =>
          val rest = s.substring(i + 1, math.min(i + 12, s.length))
          val named = Seq("amp;", "lt;", "gt;", "quot;", "apos;")
            .find(rest.startsWith)
          val dec = "^#([0-9]{1,7});".r.findFirstMatchIn(rest)
          val hexm = "^#x([0-9a-fA-F]{1,6});".r.findFirstMatchIn(rest)
          if (named.isDefined) sb.append('&')
          else if (dec.isDefined || hexm.isDefined) {
            // numeric reference: keep only if the code point is XML-legal;
            // otherwise substitute U+FFFD (the reference's bad-entity repair)
            val (m, cp) = dec.map(m => (m, Integer.parseInt(m.group(1))))
              .getOrElse((hexm.get, Integer.parseInt(hexm.get.group(1), 16)))
            val legal = cp == 0x9 || cp == 0xa || cp == 0xd ||
              (cp >= 0x20 && cp <= 0xd7ff) || (cp >= 0xe000 && cp <= 0xfffd) ||
              (cp >= 0x10000 && cp <= 0x10ffff)
            if (legal) sb.append('&')
            else { sb.append("&#xFFFD;"); i += m.end } // skip the bad entity
          } else sb.append("&amp;")
        case c if c == '\t' || c == '\n' || c == '\r' => sb.append(c)
        case c if c < 0x20 => sb.append('�')
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }
}
