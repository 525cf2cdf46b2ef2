package graft.cluster

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass connected components as a typed aggregate (SURVEY.md §7.3's
  * union-find option): each partition builds a local union-find over its
  * (id, keys) rows, partial structures merge pairwise, and the final buffer
  * maps every id to the min id of its component.
  *
  * One shuffle, no fixpoint iterations — the right tool when the component
  * structure fits in executor memory (up to ~10M nodes); beyond that use
  * `Clusterize.connectedComponents` (iterative, fully distributed). The two
  * are property-tested to agree.
  */
object UnionFind {

  /** mutable union-find keyed by string node names */
  final class Buffer(val parent: mutable.HashMap[String, String])
      extends Serializable {

    def find(x: String): String = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      // path compression
      var cur = x
      while (parent.getOrElse(cur, cur) != root) {
        val next = parent.getOrElse(cur, cur)
        parent.update(cur, root)
        cur = next
      }
      root
    }

    def union(a: String, b: String): Unit = {
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        // deterministic: smaller root wins, so merge order can't matter
        if (ra < rb) parent.update(rb, ra) else parent.update(ra, rb)
      }
    }
  }

  final case class Node(id: String, keys: Seq[String])

  /** the aggregator: Dataset[Node] → Map[id → min id of component] */
  object aggregator extends Aggregator[Node, Buffer, Map[String, String]] {

    override def zero: Buffer = new Buffer(mutable.HashMap.empty)

    override def reduce(b: Buffer, n: Node): Buffer = {
      val rid = "r:" + n.id
      b.parent.getOrElseUpdate(rid, rid)
      n.keys.foreach(k => b.union(rid, "k:" + k))
      b
    }

    override def merge(b1: Buffer, b2: Buffer): Buffer = {
      b2.parent.foreach { case (child, par) => b1.union(child, par) }
      b1
    }

    override def finish(b: Buffer): Map[String, String] = {
      // min record id per component root
      val minOf = mutable.HashMap.empty[String, String]
      val records = b.parent.keysIterator.filter(_.startsWith("r:")).toSeq
      records.foreach { r =>
        val root = b.find(r)
        val id = r.substring(2)
        minOf.get(root) match {
          case Some(m) if m <= id => ()
          case _ => minOf.update(root, id)
        }
      }
      records.map(r => r.substring(2) -> minOf(b.find(r))).toMap
    }

    override def bufferEncoder: Encoder[Buffer] = Encoders.kryo[Buffer]

    override def outputEncoder: Encoder[Map[String, String]] =
      Encoders.kryo[Map[String, String]]
  }

  /** convenience: (id, keys) dataset → (id, component) pairs */
  def connectedComponents(nodes: Dataset[Node]): Map[String, String] = {
    import nodes.sparkSession.implicits._
    nodes.select(aggregator.toColumn).collect().headOption
      .getOrElse(Map.empty)
  }
}
