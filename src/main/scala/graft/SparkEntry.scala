package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{ClusterQueries, CorpusAuditQueries, CorpusReportQueries, CqlQueries, CurationQueries, EventAnalyticsQueries, FunctionQueries, LabelQualityQueries, PipelineQueries, Q, Relational, SamplingQueries, ScreeningQueries, TextDedupQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All operator queries, grouped by module. */
  def allQ: Seq[Q] =
    Relational.all ++ TextDedupQueries.all ++ ClusterQueries.all ++
      CqlQueries.all ++ FunctionQueries.all ++ PipelineQueries.all ++
      SamplingQueries.all ++ CurationQueries.all ++ CorpusAuditQueries.all ++
      CorpusReportQueries.all ++ EventAnalyticsQueries.all ++ ScreeningQueries.all ++
      LabelQualityQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q03_revenue_by_nation")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQ.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQ.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
