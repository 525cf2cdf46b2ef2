package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregate over arbitrary row types: the buffer never holds
  * more than k elements, so with partial aggregation each upstream partition
  * contributes at most k rows per group to the exchange — the per-group
  * top-k over a 100 TB table costs O(groups × k × partitions) exchanged
  * rows, where a row_number window would shuffle (and sort) every input row
  * into the group's single partition.
  *
  * `ord` must be a total order for merge-order-independent, deterministic
  * results (tie-break on a unique key).
  */
final class BoundedTopKAgg[T: TypeTag](k: Int, ord: Ordering[T])
    extends Aggregator[T, Seq[T], Seq[T]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Seq[T] = Vector.empty

  override def reduce(b: Seq[T], a: T): Seq[T] =
    if (b.length < k) (b :+ a).sorted(ord)
    else if (ord.compare(a, b.last) < 0) (b.init :+ a).sorted(ord)
    else b

  override def merge(x: Seq[T], y: Seq[T]): Seq[T] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[T]): Seq[T] = r

  override def bufferEncoder: Encoder[Seq[T]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder()
}
