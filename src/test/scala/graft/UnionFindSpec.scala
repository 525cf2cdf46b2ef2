package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.cluster.{Clusterize, UnionFind}
import graft.cluster.UnionFind.Node

/** The single-pass union-find aggregate must agree with the iterative
  * min-label-propagation operator on random bipartite graphs.
  */
class UnionFindSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def randomNodes(seed: Int, n: Int, nKeys: Int): Seq[Node] = {
    val rnd = new Random(seed)
    (0 until n).map { i =>
      val k = rnd.nextInt(3)
      Node(f"id$i%04d", (0 until k).map(_ => s"k${rnd.nextInt(nKeys)}"))
    }
  }

  test("agrees with iterative connected components on random graphs") {
    import spark.implicits._
    // both Clusterize paths: the driver-local union-find (default here,
    // small graphs) and the distributed fixpoint loop (forced via the
    // threshold conf) must agree with the single-pass aggregate
    for (localMax <- Seq("1000000", "0")) {
      spark.conf.set("spark.graft.cc.localMaxEdges", localMax)
      try {
        for (seed <- Seq(1, 2, 3)) {
          val nodes = randomNodes(seed, 300, 40)
          val uf = UnionFind.connectedComponents(nodes.toDS())
          val edges = nodes.flatMap(n => n.keys.map(k => (n.id, k)))
            .toDF("id", "key")
          val iter = Clusterize.connectedComponents(edges).collect()
            .map(r => r.getString(0) -> r.getString(1)).toMap
          // iterative CC only sees ids with ≥1 key; compare on those
          iter.foreach { case (id, comp) =>
            assert(uf(id) == comp, s"seed=$seed id=$id localMax=$localMax")
          }
          // zero-key nodes are their own component in the aggregate
          nodes.filter(_.keys.isEmpty).foreach(n => assert(uf(n.id) == n.id))
        }
      } finally spark.conf.unset("spark.graft.cc.localMaxEdges")
    }
  }

  test("deterministic across partition counts") {
    import spark.implicits._
    val nodes = randomNodes(7, 500, 30)
    val a = UnionFind.connectedComponents(nodes.toDS().repartition(1))
    val b = UnionFind.connectedComponents(nodes.toDS().repartition(13))
    assert(a == b)
  }
}
