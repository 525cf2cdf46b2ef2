package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** k-anonymity / l-diversity release audit — the pre-publication privacy
  * census a training-data pipeline runs before shipping a corpus slice:
  * rows whose quasi-identifier (QI) combination is shared by fewer than k
  * rows are re-identifiable by joining the release against any outside
  * table carrying the same attributes (Sweeney 2002); groups whose
  * sensitive attribute is constant leak it even at k (Machanavajjhala
  * et al.'s l-diversity).
  *
  * Contract: the report column is ITSELF part of the quasi-identifier set
  * (releases are audited slice-by-slice, and a slice label is an
  * attacker-visible attribute). Returns one row per report group:
  * (g, n_rows, n_qi_groups, n_singletons, rows_below_k, risk_ppm, min_l)
  * where `risk_ppm` is the ppm of rows in QI groups smaller than k and
  * `min_l` the smallest number of distinct sensitive values any QI group
  * exposes (1 ⇒ a homogeneity attack works somewhere in the slice).
  *
  * Scale shape: ONE (report, QI) exchange with partial aggregation (the
  * distinct-sensitive count expands map-side and partial-aggregates like
  * any countDistinct); every risk statistic reduces the bounded QI-group
  * frame. No windows, no corpus-sized driver state.
  */
object PrivacyAudit {

  def kAnonymity(df: DataFrame, reportCol: Column, qiCols: Seq[Column],
      sensitiveCol: Column, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val groups = df
      .select(reportCol.as("g"), struct(qiCols: _*).as("_graft_qi"),
        sensitiveCol.as("_graft_sens"))
      .groupBy(col("g"), col("_graft_qi"))
      .agg(count(lit(1)).as("_graft_sz"),
        countDistinct(col("_graft_sens")).as("_graft_l"))
    groups.groupBy(col("g"))
      .agg(sum(col("_graft_sz")).as("n_rows"),
        count(lit(1)).as("n_qi_groups"),
        sum(when(col("_graft_sz") === 1, 1L).otherwise(0L))
          .as("n_singletons"),
        sum(when(col("_graft_sz") < k, col("_graft_sz")).otherwise(0L))
          .as("rows_below_k"),
        min(col("_graft_l")).as("min_l"))
      .select(col("g"), col("n_rows"), col("n_qi_groups"),
        col("n_singletons"), col("rows_below_k"),
        TextFunctions.integralDiv(col("rows_below_k") * 1000000L,
          col("n_rows")).as("risk_ppm"),
        col("min_l"))
  }
}
