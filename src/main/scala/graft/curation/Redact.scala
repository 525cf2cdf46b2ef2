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
}
