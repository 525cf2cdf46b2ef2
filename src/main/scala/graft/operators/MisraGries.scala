package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a mergeable aggregate: at most `k`
  * counters of bounded-memory state per partition, one pass, map-side
  * partials. Guarantees (the reason to use it over an exact groupBy when
  * key cardinality at 100 TB dwarfs executor memory):
  *
  *   - every item with true frequency > n/(k+1) is present in the summary;
  *   - each reported count underestimates the true count by at most
  *     n/(k+1) (n = total items seen).
  *
  * The merge uses the Agarwal et al. mergeable-summaries rule: add
  * counters, then subtract the (k+1)-th largest count and drop non-positive
  * counters — the error bound composes across partitions, so the summary is
  * partition-count-independent in its GUARANTEES (reported counts may vary
  * by merge order within the bound; this is inherent to the sketch family —
  * for exact results use the groupBy path).
  *
  * The q50 gate query keeps exact per-window top-k (BoundedTopKAgg over
  * exact counts); this sketch is the documented alternative for cardinality
  * beyond memory.
  */
final class MisraGriesAgg(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    b.get(item) match {
      case Some(c) => b.update(item, c + 1)
      case None if b.size < k => b.update(item, 1L)
      case None =>
        // decrement every counter; drop the ones that reach zero
        val dead = mutable.Buffer.empty[String]
        b.keysIterator.foreach { key =>
          val c = b(key) - 1
          if (c == 0) dead += key else b.update(key, c)
        }
        dead.foreach(b.remove)
    }
    b
  }

  override def merge(x: mutable.Map[String, Long], y: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    y.foreach { case (key, c) => x.update(key, x.getOrElse(key, 0L) + c) }
    if (x.size > k) {
      val cut = x.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      val dead = x.collect { case (key, c) if c - cut <= 0 => key }.toSeq
      x.mapValuesInPlace((_, c) => c - cut)
      dead.foreach(x.remove)
    }
    x
  }

  override def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
