package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. All reads go
  * through `spark.read.parquet`, so Catalyst predicate pushdown / column
  * pruning applies to every query built on top of these.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.parquet's `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) (vectorized reader rejects it; read nanos
    * as long and convert), timestamp[us] WITHOUT timezone (Spark reads
    * TIMESTAMP_NTZ, which `unix_micros` et al. reject), or a plain
    * session-tz TIMESTAMP. Normalize all three to TimestampType µs so every
    * event-time operator sees one type. The NTZ→TZ cast is epoch-preserving
    * because every graft session pins spark.sql.session.timeZone=UTC.
    */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = t("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
