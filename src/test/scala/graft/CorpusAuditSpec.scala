package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.{Dedup, PassageDedup}
import graft.similarity.Projection

/** Round-9 operators vs driver-side truth: passage dedup's first-occurrence
  * + reassembly semantics, containment prefix-filter losslessness on random
  * corpora, and the JL sign projection's exact integer reference.
  */
class CorpusAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("dedupPassages keeps global first occurrences and reassembles in order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),       // passages (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),       // "a b c" dropped (doc 1 owns it)
      (3L, "x y z a b c"),       // both passages seen -> clean_text ""
      (4L, "d e")                // short tail passage "d e"
    ).toDF("doc_id", "text")
    val got = PassageDedup.dedupPassages(docs, "doc_id", "text", 3)
      .orderBy("doc_id")
      .select("doc_id", "n_passages", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, ""),
      (4L, 1L, 1L, "d e")))
  }

  test("containmentJoin equals naive all-pairs truth on random corpora") {
    import spark.implicits._
    val rnd = new Random(5)
    val vocab = (1 to 12).map(i => s"w$i")
    // short docs + long docs built BY CONCATENATING short ones -> real
    // subset structure for containment to find
    val shorts = (1 to 30).map { i =>
      (i.toLong, Seq.fill(6 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }
    val longs = (1 to 10).map { i =>
      val parts = Seq.fill(3)(shorts(rnd.nextInt(shorts.size))._2)
      ((100 + i).toLong, parts.mkString(" "))
    }
    val all = shorts ++ longs
    val t = 0.7
    val sh = all.map { case (id, tx) => id -> Dedup.shinglesOf(tx, 3).toSet }
      .filter(_._2.nonEmpty).toMap
    val truth = (for {
      (a, sa) <- sh.toSeq; (b, sb) <- sh.toSeq if a != b
      inter = (sa & sb).size
      if inter * 1000000L >= math.round(t * 1e6) * sa.size
    } yield (a, b, inter.toLong, inter * 1000000L / sa.size)).sorted
    val got = Dedup.containmentJoin(all.toDF("doc_id", "text"),
        "doc_id", "text", 3, t)
      .select("contained_id", "container_id", "inter", "cont_ppm")
      .as[(Long, Long, Long, Long)].collect().toSeq.sorted
    assert(truth.nonEmpty, "degenerate fixture: no containment pairs")
    assert(got == truth)
  }

  test("containmentJoin maxDf: above-all cap is exact; capped mode only drops pairs") {
    import spark.implicits._
    val rnd = new Random(17)
    val vocab = (1 to 10).map(i => s"w$i")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(8 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" "))
    }.toDF("doc_id", "text")
    def run(maxDf: Option[Long]) =
      Dedup.containmentJoin(docs, "doc_id", "text", 3, 0.5, maxDf)
        .select("contained_id", "container_id").as[(Long, Long)]
        .collect().toSet
    val exact = run(None)
    assert(run(Some(Long.MaxValue)) == exact,
      "a never-binding cap must not change the result")
    val capped = run(Some(2L))
    assert(capped.subsetOf(exact),
      "a binding cap may only DROP pairs, never invent them")
  }

  test("signProjection matches the exact integer reference") {
    import spark.implicits._
    val rnd = new Random(11)
    val vecs = (1 to 20).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextFloat() * 2f - 1f)))
    val outDim = 5
    def ref(v: Array[Float]): Seq[Long] = {
      val xq = v.map(x => math.round(x.toDouble * 1000000.0))
      (0 until outDim).map { j =>
        xq.zipWithIndex.map { case (x, i) =>
          val lcg = (1103515245L * (i * outDim + j + 1) + 12345L) / 65536L
          if (lcg % 2 == 1) x else -x
        }.sum
      }
    }
    val got = Projection.signProjection(
        vecs.toDF("vec_id", "embedding"), "vec_id", "embedding", outDim)
      .orderBy("vec_id", "j")
      .select("vec_id", "comp").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id) == ref(v), s"vec $id")
    }
  }
}
