package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity

/** Plan-shape and equivalence guarantees for the similarity operators:
  * the IVF path must stay free of cartesian products (its quantizer is a
  * constant-size literal set, not a joined table), and the bounded top-k
  * aggregate must rank identically to the row_number window it replaced.
  */
class SimilaritySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** deterministic synthetic embeddings: dim-8 vectors from a hash mix */
  private def corpus(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map { i =>
      val v = (0 until 8).map(j => math.sin(i * 31 + j * 7).toFloat).toArray
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("ivfTopK plan has no cartesian product or nested-loop join") {
    val c = corpus(200)
    val df = Similarity.ivfTopK(c.filter(col("vec_id") < 5), c,
      "vec_id", "embedding", 3, nCentroids = 8, nProbe = 2)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("CartesianProduct"), physical)
    assert(!physical.contains("BroadcastNestedLoopJoin"), physical)
    // sanity: every query gets ranked neighbors starting at 1
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.filter(_.getInt(1) == 1).length == 5, "rank 1 per query")
  }

  test("bounded top-k ranks exactly like the row_number window") {
    val c = corpus(300)
    val got = Similarity.cosineTopK(c.filter(col("vec_id") < 7), c,
        "vec_id", "embedding", 5)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq

    // reference formulation: full window rank over all scored pairs
    val q = c.filter(col("vec_id") < 7).select(col("vec_id").as("query_id"),
      Similarity.asDouble(col("embedding")).as("qv"))
    val cc = c.select(col("vec_id").as("neighbor_id"),
      Similarity.asDouble(col("embedding")).as("cv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val want = q.join(cc, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Similarity.cosine(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq

    assert(got == want)
  }

  test("topK aggregate handles fewer candidates than k") {
    val c = corpus(4)
    val rows = Similarity.cosineTopK(c.filter(col("vec_id") < 2), c,
      "vec_id", "embedding", 10).collect()
    // 3 neighbors per query (self excluded), ranks 1..3
    assert(rows.length == 6)
    assert(rows.map(_.getInt(1)).toSet == Set(1, 2, 3))
  }

  /** three well-separated clusters around orthogonal directions with small
    * deterministic jitter
    */
  private def clustered(nPer: Int): DataFrame = {
    import spark.implicits._
    (0 until 3 * nPer).map { i =>
      val c = i % 3
      val v = (0 until 8).map { j =>
        val base = if (j == c * 2) 1.0f else 0.0f
        base + 0.05f * math.sin(i * 13 + j * 5).toFloat
      }.toArray
      (i.toLong, c, v)
    }.toDF("vec_id", "truth", "embedding")
  }

  test("k-means training converges and recovers separated clusters") {
    val df = clustered(40)
    val model = Similarity.trainCentroidsKMeans(df, "vec_id", "embedding",
      nCentroids = 3, iters = 4)
    // inertia never increases (spherical k-means objective, float slack)
    model.inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: ${model.inertia}")
    }
    assert(model.inertia.last < model.inertia.head,
      s"training made no progress: ${model.inertia}")
    // trained centroids separate the true clusters: nearest-centroid
    // assignment maps each truth label to exactly one centroid
    val assign = Similarity.ivfTopKTrained(
      df.filter(col("vec_id") < 3), df, "vec_id", "embedding",
      k = 5, nCentroids = 3, nProbe = 1, iters = 4)
    // each query's neighbors all share its own truth cluster (queries 0,1,2
    // are one per cluster; clusters are orthogonal so cross-cluster cos ~ 0)
    val truthOf = df.select("vec_id", "truth").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assign.collect().foreach { r =>
      val q = r.getLong(0)
      val n = r.getLong(2)
      assert(truthOf(n) == truthOf(q),
        s"query $q (cluster ${truthOf(q)}) got neighbor $n from cluster ${truthOf(n)}")
    }
  }

  test("each Lloyd iteration is exactly one Spark job") {
    val df = clustered(40).cache()
    df.count() // materialize outside the counted window
    // job-group + statusTracker: poll until the (async) status store
    // stabilizes, then read the group's job count. AQE re-plans each
    // exchange stage as its own scheduler job, so turn it off to make
    // "one action" == "one job".
    def countJobs(iters: Int): Int = {
      val group = s"kmeans-jobcount-$iters"
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.sparkContext.setJobGroup(group, group)
      try Similarity.trainCentroidsKMeans(df, "vec_id", "embedding",
        nCentroids = 3, iters = iters)
      finally {
        spark.sparkContext.clearJobGroup()
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
      def n = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      val deadline = System.currentTimeMillis() + 10000
      var prev = -1
      var cur = n
      while (cur != prev && System.currentTimeMillis() < deadline) {
        prev = cur; Thread.sleep(100); cur = n
      }
      cur
    }
    val seedOnly = countJobs(0)
    val withIters = countJobs(3)
    assert(withIters - seedOnly == 3,
      s"expected 1 job/iteration: seed=$seedOnly, with 3 iters=$withIters")
    df.unpersist()
  }

  test("sampleFraction trains on the deterministic hash sample") {
    val df = clustered(60)
    val full = Similarity.trainCentroidsKMeans(df, "vec_id", "embedding",
      nCentroids = 3, iters = 2)
    val sampled = Similarity.trainCentroidsKMeans(df, "vec_id", "embedding",
      nCentroids = 3, iters = 2, sampleFraction = 0.5)
    // the sample actually changed the training set (different seeds/model)
    assert(sampled.centroids != full.centroids)
    // reproducible: the same content-addressed sample trains the same model
    val again = Similarity.trainCentroidsKMeans(df, "vec_id", "embedding",
      nCentroids = 3, iters = 2, sampleFraction = 0.5)
    assert(sampled.centroids == again.centroids)
    // the spherical objective still never increases on the sampled run
    sampled.inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia rose: ${sampled.inertia}")
    }
  }

  test("semDedupFromPairs: transitive closure, min-id reps, keep flags") {
    import spark.implicits._
    val ids = (0L to 6L).toDF("vec_id")
    // chain 1-2-3 (transitive via pairs (1,2),(2,3)), pair (5,6), solo 0/4
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id1", "id2")
    val got = Similarity.semDedupFromPairs(ids, "vec_id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 0L, true), (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true), (6L, 5L, false)))
  }

  test("semDedup keeps exactly one representative per near-dup component") {
    val c = corpus(60)
    val got = Similarity.semDedup(c, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == 60)                          // one row per input id
    val byRep = got.groupBy(_._2)
    // every component's rep is its min id and is flagged keep
    byRep.foreach { case (rep, members) =>
      assert(members.map(_._1).min == rep)
      assert(members.count(_._3) == 1 && members.find(_._3).get._1 == rep)
    }
    // representatives' pairwise structure: dropping non-reps never drops a
    // vector that has no near-dup (solo components keep themselves)
    val kept = got.filter(_._3).map(_._1).toSet
    assert(kept.size == byRep.size)
  }

  test("recallAtK counts hits per query; absent queries score a hard zero") {
    import spark.implicits._
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 20L), (2L, 21L), (2L, 22L),
      (3L, 30L), (3L, 31L), (3L, 32L)).toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),   // full hit
      (2L, 20L), (2L, 99L), (2L, 98L)    // 1 of 3; query 3 entirely absent
    ).toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx, "query_id", "neighbor_id", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 1000000L)), got.toString)
    assert(got(2L) == ((1L, 333333L)), got.toString)
    assert(got(3L) == ((0L, 0L)), got.toString)
    // approx extras never inflate recall past 1e6
    assert(got.values.forall(_._2 <= 1000000L))
  }
}
