package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join — the time-series operator Spark lacks natively: each left row
  * is joined to the latest right row with `right.timeCol <= left.timeCol`
  * for the same key (the semantics of DuckDB/QuestDB ASOF JOIN, kdb aj).
  *
  * Composed from existing operators per the custom-operator preference
  * order — no custom SparkPlan needed: tag both sides, union, and take a
  * running `last(_, ignoreNulls)` of the right payload over a window
  * ordered by (time, side) with right rows first on ties (inclusive <=).
  * Cost at scale: ONE shuffle of both sides keyed by `keyCol` plus the
  * in-partition sort the window needs — the same exchange a sort-merge
  * equi-join would pay; never a per-row range probe or a range cross join.
  *
  * Ties among RIGHT rows at the same (key, time) are resolved by sort
  * order, which is not total beyond (time, side) — pre-deduplicate the
  * right side to one row per (key, time) where that matters.
  */
object AsOfJoin {

  /** left.* plus an `asof` struct holding the matched right row (null when
    * no right row precedes the left row for its key). SQL ASOF equi-key
    * semantics for NULLs come from filtering the RIGHT side only: a
    * null-key/null-time right row never matches; a null-key left row lands
    * in the nulls window partition that then holds no right rows, and a
    * null-time left row sorts first (nulls first) ahead of every surviving
    * right row — both get a null `asof` with the left side preserved, and
    * the left table is still scanned exactly once.
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String): DataFrame = {
    val lType = StructType(left.schema.fields)
    val rType = StructType(right.schema.fields)
    val l = left.select(col(keyCol).as("_k"), col(timeCol).as("_t"),
      lit(1).as("_side"),
      struct(left.columns.map(col).toSeq: _*).as("_lrow"),
      lit(null).cast(rType).as("_rrow"))
    val r = right.filter(col(keyCol).isNotNull && col(timeCol).isNotNull)
      .select(col(keyCol).as("_k"), col(timeCol).as("_t"),
        lit(0).as("_side"),
        lit(null).cast(lType).as("_lrow"),
        struct(right.columns.map(col).toSeq: _*).as("_rrow"))
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("asof", last(col("_rrow"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(c => col(s"_lrow.$c").as(c)).toSeq
        :+ col("asof"): _*)
  }
}
