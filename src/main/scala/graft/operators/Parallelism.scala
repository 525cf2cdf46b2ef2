package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard for CPU-bound per-row kernel stages (shingling, minhash, simhash):
  * a small single-row-group parquet scan plans as ONE task, serializing the
  * kernels on one core no matter how many the session has. Repartition the
  * narrow input — cheap rows, expensive downstream compute — only when the
  * scan's parallelism is under half the session's; a well-partitioned
  * large input (the 100 TB case: thousands of splits) passes through with
  * no added exchange.
  */
object Parallelism {

  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // partition count comes from the physical plan; no job runs
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
