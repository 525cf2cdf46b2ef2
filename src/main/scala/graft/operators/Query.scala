package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark plan plus (optionally) the equivalent
  * ANSI SQL that DuckDB runs on the same parquet tables as the correctness
  * oracle. Queries without an oracle get a weaker rows-only check.
  *
  * Determinism rules (the driver hash-compares values):
  *   - every query ends in a total ORDER BY on both sides;
  *   - money/double aggregates are converted to exact integers
  *     (`round(x * 10^k)` as BIGINT) so float summation order can't flip bits;
  *   - DuckDB integer sums are cast back to BIGINT (DuckDB widens to INT128).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are timed by graft.Bench */
    headline: Boolean = false)
