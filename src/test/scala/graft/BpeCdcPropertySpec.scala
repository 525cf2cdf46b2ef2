package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.curation.BpeMerges
import graft.dedup.CdcChunks

/** Property pins for the two replace/HOF-encoded kernels against
  * independent in-memory reference implementations: the distributed BPE
  * merge loop vs a direct greedy Sennrich trainer on Scala collections,
  * and CDC chunking vs a straightforward rolling loop. Random inputs catch
  * the encoding edge cases fixtures can't enumerate (repeated symbols,
  * merged-symbol adjacency, boundary-at-end, sub-window docs).
  */
class BpeCdcPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // ---- reference BPE trainer: plain Scala, no replace-encoding tricks ----

  private def refMerges(words: Seq[String], rounds: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] = words.groupBy(identity).map {
      case (w, ws) => (w.map(_.toString).toVector :+ "</w>") -> ws.size.toLong
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; p <- syms.sliding(2) if p.size == 2)
        counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, c))
        // greedy left-to-right non-overlapping application
        vocab = vocab.map { case (syms, f) =>
          val res = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              res += (a + b); i += 2
            } else { res += syms(i); i += 1 }
          }
          res.result() -> f
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
      r += 1
    }
    out.toSeq
  }

  // ---- reference CDC chunker: direct rolling loop ----

  private def refChunks(text: String): Seq[(Int, Long, Long)] = {
    import CdcChunks.{W, M, D, Pows}
    val n = text.length
    if (n == 0) return Seq.empty
    val bounds = (W to n).filter { i =>
      val h = (0 until W).map(j => text.charAt(i - 1 - j).toLong * Pows(j) % M)
        .sum % M
      h % D == D - 1
    }
    val ends = if (bounds.nonEmpty && bounds.last == n) bounds
               else bounds :+ n
    val starts = 1 +: ends.dropRight(1).map(_ + 1)
    starts.zip(ends).zipWithIndex.map { case ((s, e), k) =>
      (k, s.toLong, (e - s + 1).toLong)
    }
  }

  private val wordGen = Gen.chooseNum(1, 6)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  private val corpusGen = Gen.chooseNum(1, 40)
    .flatMap(n => Gen.listOfN(n, wordGen))

  test("learnMerges == reference greedy BPE trainer on random corpora") {
    (0 until 15).foreach { i =>
      val words = corpusGen(Gen.Parameters.default, Seed(4000L + i)).get
      val rounds = 1 + i % 5
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val got = BpeMerges.learnMerges(df, "text", rounds)
        .orderBy("merge_round").collect()
        .map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq
      assert(got == refMerges(words, rounds),
        s"corpus=${words.mkString(" ")} rounds=$rounds")
    }
  }

  test("CDC chunks == reference rolling loop on random texts") {
    val textGen = Gen.chooseNum(0, 120)
      .flatMap(n => Gen.listOfN(n,
        Gen.frequency(8 -> Gen.alphaNumChar, 2 -> Gen.const(' ')))
        .map(_.mkString))
    val texts = (0 until 30).map(i =>
      textGen(Gen.Parameters.default, Seed(7000L + i)).get)
    // one Spark job for all samples (id = sample index)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = CdcChunks.chunks(df, "doc_id", "text")
      .orderBy("doc_id", "chunk_seq").collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    texts.zipWithIndex.foreach { case (text, i) =>
      assert(got.getOrElse(i.toLong, Seq.empty) == refChunks(text),
        s"text='${text}'")
    }
  }
}
