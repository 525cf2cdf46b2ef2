package graft.similarity

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate: ranking order is (score desc, id asc). */
final case class Scored(score: Double, id: Long)

/** Bounded top-k aggregate over (score, id) pairs.
  *
  * The buffer never holds more than k elements, so with partial aggregation
  * (Spark plans typed Aggregators as ObjectHashAggregate with map-side
  * partials) each upstream partition contributes at most k rows per group to
  * the exchange. That bounds the shuffle at O(groups × k × partitions)
  * instead of the full scored candidate set — the difference between a
  * top-k over 100 TB of scored pairs and one over a few thousand partial
  * buffers. A row_number window, by contrast, must shuffle every scored row.
  *
  * Total order (score desc, id asc) makes the result independent of merge
  * order, so ranks are deterministic and reproducible in a SQL oracle's
  * `row_number() OVER (ORDER BY score DESC, id)`.
  */
final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  private val ord: Ordering[Scored] = Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.length < k) (b :+ a).sorted(ord)
    else if (ord.compare(a, b.last) < 0) (b.init :+ a).sorted(ord)
    else b

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
