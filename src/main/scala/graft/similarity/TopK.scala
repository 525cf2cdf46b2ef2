package graft.similarity

/** One scored candidate: ranking order is (score desc, id asc) — a total
  * order, so bounded top-k results are independent of merge order and
  * reproducible in a SQL oracle's `row_number() OVER (ORDER BY score DESC,
  * id)`. Ranked with [[graft.operators.BoundedTopKAgg]].
  */
final case class Scored(score: Double, id: Long)

object Scored {
  val ordering: Ordering[Scored] = Ordering.by((s: Scored) => (-s.score, s.id))
}
