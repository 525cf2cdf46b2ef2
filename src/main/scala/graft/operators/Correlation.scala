package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact grouped Pearson correlation between two integer metrics — the
  * data-card signal for "does X track Y in this slice" (length vs token
  * count, dup-group size vs quality, score vs label) without ever leaving
  * integer arithmetic: one partial-agg'd pass collects the five sufficient
  * sums, and the correlation is reported as SIGNED SQUARED r in ppm
  * (`sign(num)·num²·10⁶ div (vx·vy)`), monotone in |r| and exactly
  * reproducible — no sqrt, no float accumulation order.
  *
  * `num = n·Σxy − Σx·Σy`, `vx = n·Σx² − (Σx)²`, `vy` likewise; DECIMAL(38)
  * (HUGEINT in the oracle) keeps the cross products exact at web scale.
  * Degenerate groups (either variance zero) report null.
  */
object Correlation {

  def groupedCorrSquared(df: DataFrame, groupCol: String,
      xCol: Column, yCol: Column): DataFrame = {
    df.select(col(groupCol).as("grp"), xCol.cast("long").as("_x"),
        yCol.cast("long").as("_y"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"),
        sum(expr("CAST(_y AS DECIMAL(38,0)) * _y")).as("_syy"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * _y")).as("_sxy"))
      .select(col("grp"), col("n"),
        expr("n * _sxy - CAST(_sx AS DECIMAL(38,0)) * _sy").as("_num"),
        expr("n * _sxx - CAST(_sx AS DECIMAL(38,0)) * _sx").as("_vx"),
        expr("n * _syy - CAST(_sy AS DECIMAL(38,0)) * _sy").as("_vy"))
      .select(col("grp"), col("n"),
        expr("""CASE WHEN _vx > 0 AND _vy > 0 THEN
               |  CAST(CASE WHEN _num < 0 THEN -1 ELSE 1 END *
               |    ((_num * _num * 1000000) div (_vx * _vy)) AS BIGINT)
               |END""".stripMargin).as("r2_signed_ppm"))
  }
}
