package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII handling for training corpora: deterministic pseudonymization of
  * identifier columns and k-anonymity-style generalization of quantitative
  * ones. Pure per-row scalar work (codegen'd built-ins, no UDFs, no
  * shuffle) — linear at 100 TB.
  *
  * Pseudonyms are salted-hash tokens, so the same identity maps to the same
  * token across tables and runs (joins on the pseudonym still work) while
  * the raw value never leaves the scan. Regex scrubbing sticks to explicit
  * character classes so the behavior is engine-portable (Java regex and RE2
  * agree on them).
  */
object Redact {

  /** salted deterministic pseudonym token for an identifier column */
  def pseudonym(c: Column, salt: String, len: Int = 16): Column =
    substring(md5(concat(lit(salt + ":"), c.cast("string"))), 1, len)

  /** generalize a numeric column to its band floor (e.g. width=1000 maps
    * 2345.67 to 2000) — the k-anonymity coarsening for quantitative PII
    */
  def band(c: Column, width: Long): Column =
    floor(c / width).cast("long") * width

  /** replace every decimal digit with `mask` (account/phone-number scrubbing
    * inside free text; digit class is identical in Java regex and RE2)
    */
  def maskDigits(c: Column, mask: String = "#"): Column =
    regexp_replace(c, "[0-9]", mask)

  /** Pseudonymize `idCols` (salted-hash tokens), band `quantCols` to the
    * given widths, pass everything else through unchanged.
    */
  def pseudonymize(df: DataFrame, idCols: Seq[String], salt: String,
      quantCols: Map[String, Long] = Map.empty): DataFrame = {
    val cols = df.columns.map { name =>
      if (idCols.contains(name)) pseudonym(col(name), salt).as(name)
      else quantCols.get(name) match {
        case Some(w) => band(col(name), w).as(name)
        case None => col(name)
      }
    }
    df.select(cols.toSeq: _*)
  }

  /** Free-text PII patterns: (type, regex, replacement). Restricted to the
    * construct subset where Java regex and RE2 agree exactly (explicit
    * classes, bounded counts, `\b`/`\d` ASCII semantics, leftmost-greedy
    * on unambiguous shapes — no backrefs, no lookaround): the same pattern
    * string runs verbatim in Spark and the DuckDB oracle.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("phone", "\\+\\d{1,3} \\d{3} \\d{4}", "[PHONE]"))

  /** Per-row PII match counts over free text — the Dolma/CCNet-style
    * pre-training scrubbing audit: adds one `n_<type>` column per
    * [[PiiPatterns]] entry. Pure codegen'd per-row regex, no shuffle.
    */
  def piiCounts(df: DataFrame, textCol: String): DataFrame =
    PiiPatterns.foldLeft(df) { case (d, (name, re, _)) =>
      // typed-lit pattern (a SQL-string literal would eat the backslashes)
      d.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(re), lit(0))).cast("long"))
    }

  /** Scrub every PII match to its typed placeholder — the redaction pass
    * itself, same patterns, same engine-parity contract.
    */
  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, re, repl)) =>
      regexp_replace(c, re, repl) // placeholders carry no $/\ specials
    }
}
