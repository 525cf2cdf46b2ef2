package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009) — the
  * standard hybrid-retrieval combiner for training-data curation: merge a
  * lexical ranking (BM25) with any other ranking (semantic cosine, gram
  * overlap, freshness) without score calibration, since only RANKS enter
  * the fused score  RRF(d) = Σ_lists 1/(k + rank_list(d)).
  *
  * Determinism: contributions are exact integers (10^9 div (k + rank)), so
  * the fused score is an exact integer sum — no float comparisons anywhere;
  * ties break on the document id.
  *
  * Scale shape: each input list is already top-bounded (the `topPerList`
  * cut runs as an orderBy+limit — Spark plans TakeOrdered, a per-partition
  * bounded heap + driver merge, never a global sort/window over the
  * corpus); the rank window then runs on ≤ topPerList rows. The fusion
  * joins frames of ≤ topPerList rows — broadcast-sized by construction.
  */
object RankFusion {

  /** rank 1..topPerList by (orderCol desc, idCol asc) — TakeOrdered-bounded
    * before the (tiny) rank window
    */
  def topRanked(df: DataFrame, idCol: String, orderCol: String,
      topPerList: Int): DataFrame = {
    require(topPerList > 0, s"topPerList must be positive, got $topPerList")
    df.orderBy(col(orderCol).desc, col(idCol)).limit(topPerList)
      .withColumn("rank", row_number().over(
        Window.orderBy(col(orderCol).desc, col(idCol))).cast("long"))
      .select(col(idCol), col("rank"))
  }

  /** Fuse ranked lists (label -> frame with `idCol` + long `rank`): output
    * one row per document present in ANY list with per-list rank columns
    * (`rank_<label>`, null when absent), `in_lists`, and the exact integer
    * `rrf_nano` = Σ 10^9 div (kRrf + rank).
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    require(kRrf >= 0, s"kRrf must be >= 0, got $kRrf")
    val renamed = lists.map { case (label, df) =>
      label -> df.select(col(idCol), col("rank").as(s"rank_$label"))
    }
    val joined = renamed.map(_._2).reduce((a, b) =>
      a.join(b, Seq(idCol), "full_outer"))
    // exact integer contribution per list; coalesce(0) for absent docs
    val rrf: Column = renamed.map { case (label, _) =>
      coalesce(expr(s"cast(1000000000 as bigint) div ($kRrf + rank_$label)"),
        lit(0L))
    }.reduce(_ + _)
    val present: Column = renamed.map { case (label, _) =>
      when(col(s"rank_$label").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _)
    joined.select(
      (col(idCol) +: renamed.map { case (l, _) => col(s"rank_$l") }) ++
        Seq(present.as("in_lists"), rrf.as("rrf_nano")): _*)
  }

  /** Maximal-marginal-relevance diversified reranking (Carbonell &
    * Goldstein, SIGIR 1998): greedily pick k items maximizing
    * λ·relevance − (1−λ)·max-similarity-to-already-picked — the standard
    * cure for a top-k page full of near-identical hits. All integer:
    * relevance in ppm, pairwise similarity in ppm, λ in milli, score =
    * λ·rel − (1000−λ)·maxSim; ties break on id ascending.
    *
    * LIST-SCALE BY CONTRACT, like [[RankEval.kendallTau]]: `cands` is a
    * bounded top-n retrieval cut and `sims` its pairwise similarities
    * (≤ n² rows) — the greedy loop collects them to the driver (the
    * corpus-scale work is the upstream retrieval, not this reranker).
    * Output: (rank 1..k, id, mmr_score), rank in pick order.
    */
  def mmrRerank(cands: DataFrame, idCol: String, relPpmCol: String,
      sims: DataFrame, aCol: String, bCol: String, simPpmCol: String,
      k: Int, lambdaMilli: Long = 700L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaMilli >= 0L && lambdaMilli <= 1000L,
      s"lambdaMilli must be in [0, 1000], got $lambdaMilli")
    val spark = cands.sparkSession
    val cs = cands.select(col(idCol).cast("long"), col(relPpmCol).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val simMap = sims
      .select(col(aCol).cast("long"), col(bCol).cast("long"),
        col(simPpmCol).cast("long"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def simOf(x: Long, y: Long): Long =
      simMap.getOrElse((x, y), simMap.getOrElse((y, x), 0L))
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    val remaining = scala.collection.mutable.LinkedHashMap(cs.sortBy(_._1): _*)
    var step = 1
    while (step <= k && remaining.nonEmpty) {
      val (id, sc) = remaining.iterator.map { case (cid, rel) =>
        val maxSim =
          if (chosen.isEmpty) 0L
          else chosen.iterator.map(c => simOf(cid, c._2)).max
        cid -> (lambdaMilli * rel - (1000L - lambdaMilli) * maxSim)
      }.maxBy { case (cid, sc) => (sc, -cid) }
      chosen += ((step, id, sc))
      remaining.remove(id)
      step += 1
    }
    import spark.implicits._
    chosen.toSeq.toDF("rank", "doc_id", "mmr_score")
      .select(col("rank").cast("int").as("rank"),
        col("doc_id").as(idCol), col("mmr_score"))
  }
}
