package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gini concentration of a metric across a slice's documents — the
  * inequality data-card number ("is one giant document carrying this
  * source's token mass"), the per-document complement of the per-word
  * Simpson concentration (q165).
  *
  * Exact integer formulation over ascending ranks:
  * `G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)` in ppm, ranks tie-broken by id
  * so both engines rank identically; numerator is ≥ 0 for ascending
  * ranks. DECIMAL(38)/HUGEINT keeps Σ i·x exact at web scale.
  *
  * Scale: one slice-keyed shuffle; the rank window partitions by slice,
  * so skew is bounded by the largest slice (the q92 group-window
  * contract) — never a global sort.
  */
object Inequality {

  def giniBySlice(df: DataFrame, idCol: String, metric: Column,
      sliceCol: String): DataFrame = {
    df.select(col(sliceCol).as("src"), col(idCol).as("_id"),
        metric.cast("long").as("_x"))
      .withColumn("_i", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("_x"), col("_id"))))
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_docs"), sum(col("_x")).as("sum_x"),
        sum(expr("CAST(_i AS DECIMAL(38,0)) * _x")).as("_ix"))
      .filter(col("sum_x") > 0)
      .select(col("src"), col("n_docs"), col("sum_x"),
        expr("""CAST(((2 * _ix - CAST(n_docs + 1 AS DECIMAL(38,0)) * sum_x)
               |  * 1000000) div (CAST(n_docs AS DECIMAL(38,0)) * sum_x)
               |  AS BIGINT)""".stripMargin).as("gini_ppm"))
  }
}
