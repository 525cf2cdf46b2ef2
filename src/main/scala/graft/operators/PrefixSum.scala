package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed running totals (prefix sums) over a total ordering — the
  * scan primitive behind rank/CDF/coverage-curve computations — WITHOUT the
  * single-partition window Spark plans for `sum().over(orderBy(...))` with
  * no partitionBy (which serializes the whole frame through one task).
  *
  * Classic two-pass scan: range-partition on the ordering, sort within
  * partitions, pass 1 computes each partition's column sums (one value per
  * partition — collected, this is numPartitions-bounded, not data-bounded),
  * the driver scan-lefts them into per-partition offsets, pass 2 re-reads
  * the persisted sorted frame and emits offset + running per row. The only
  * full exchange is the range partitioner's; both passes are partition-local.
  *
  * Contract: `orderCols` must be a TOTAL order (add a tiebreak column) —
  * rows tied on the ordering would otherwise get arbitrary cumulative
  * values. Value columns must be LongType (cast upstream; integer exactness
  * is what makes prefix sums oracle-comparable). Output appends
  * `cum_<valueCol>` columns. This is one of the few operators where
  * mapPartitions genuinely beats any Catalyst formulation: the running state
  * is inherently sequential per partition, and the cross-partition
  * dependency is exactly one long per partition per column.
  */
object PrefixSum {

  def runningTotals(df: DataFrame, orderCols: Seq[Column],
      valueCols: Seq[String], numPartitions: Int): DataFrame = {
    require(numPartitions > 0, s"numPartitions must be positive")
    require(valueCols.nonEmpty, "need at least one value column")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(numPartitions, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema
    val idxs = valueCols.map { c =>
      val i = schema.fieldIndex(c)
      require(schema(i).dataType == LongType,
        s"value column $c must be LongType, got ${schema(i).dataType}")
      i
    }
    val partSums = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = Array.fill(idxs.size)(0L)
      it.foreach { r =>
        var k = 0
        while (k < idxs.size) { acc(k) += r.getLong(idxs(k)); k += 1 }
      }
      Iterator((pid, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums
      .scanLeft(Array.fill(idxs.size)(0L)) { (a, b) =>
        a.zip(b).map { case (x, y) => x + y }
      }
      .dropRight(1)
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(schema.fields ++
      valueCols.map(c => StructField(s"cum_$c", LongType, nullable = false)))
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        var k = 0
        while (k < idxs.size) { run(k) += r.getLong(idxs(k)); k += 1 }
        Row.fromSeq(r.toSeq ++ run.toList)
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
