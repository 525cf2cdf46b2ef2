package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.JsonPathLite

/** Scalar-function operators through the gate: OAI date handling (F32-F35)
  * and JSONPath extraction (F28, via the engine's own evaluator as a UDF).
  */
object FunctionQueries {

  val all: Seq[Q] = Seq(
    // ---- F32-F34: date parse/format/exclusive-until bounds
    Q("q32_date_functions",
      (s, d) => {
        val t = Tables(s, d)
        t.events
          .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp")
            && col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"))
          .select(
            col("event_id"),
            date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("oai_datestamp"),
            date_trunc("day", col("ts")).as("day"),
            (date_trunc("day", col("ts")) + expr("INTERVAL 1 DAY")).as("until_excl"),
            year(col("ts")).as("y"),
            month(col("ts")).as("m"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |  strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS oai_datestamp,
             |  date_trunc('day', ts) AS day,
             |  date_trunc('day', ts) + INTERVAL 1 DAY AS until_excl,
             |  CAST(year(ts) AS INTEGER) AS y, CAST(month(ts) AS INTEGER) AS m
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-11 00:00:00'
             |ORDER BY event_id""".stripMargin)),

    // ---- F28: JSONPath string-collection extraction via the engine's
    // evaluator (same semantics the matcher registry uses)
    Q("q33_jsonpath_extract",
      (s, d) => {
        val t = Tables(s, d)
        val jp = udf((json: String) => JsonPathLite.strings(json, "$.k"))
        t.events
          .select(col("event_id"),
            element_at(jp(col("props")), 1).cast("long").as("k"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events ORDER BY event_id""".stripMargin))
  )
}
