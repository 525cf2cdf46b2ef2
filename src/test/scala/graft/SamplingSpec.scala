package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sampling.Sampling

/** Sampling/packing invariants: content-addressed determinism (same rows in,
  * same sample out — under any partitioning), the per-key bound, packing's
  * capacity contract, and the plan shapes that make them scale.
  */
class SamplingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def docs(parts: Int) = {
    import spark.implicits._
    (0 until 1000).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr",
        Seq.fill(1 + i % 40)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text").repartition(parts)
  }

  test("hashSample is deterministic and partition-invariant") {
    val a = Sampling.hashSample(docs(4), "doc_id", 0.2, "t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs(13), "doc_id", 0.2, "t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // a 20% draw over 1000 uniform hashes lands well inside (10%, 30%)
    assert(a.size > 100 && a.size < 300, s"got ${a.size}")
    // different salt → different (similarly-sized) sample
    val c = Sampling.hashSample(docs(4), "doc_id", 0.2, "u")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(c != a)
  }

  test("fraction 1.0 keeps every row; 0.0 keeps none") {
    assert(Sampling.hashSample(docs(4), "doc_id", 1.0, "t").count() == 1000)
    assert(Sampling.hashSample(docs(4), "doc_id", 0.0, "t").count() == 0)
    val s = Sampling.stratifiedSample(docs(4), "doc_id", "lang",
      Map("en" -> 1.0, "de" -> 0.0), defaultFraction = 1.0, salt = "t")
    val byLang = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") == 334 && byLang("fr") == 333 && !byLang.contains("de"),
      byLang.toString)
  }

  test("perKeySample round-trips non-numeric ids") {
    import spark.implicits._
    val df = (0 until 300).map(i =>
      (f"id-$i%03d-${"abcdef".charAt(i % 6)}", if (i % 2 == 0) "x" else "y"))
      .toDF("uid", "key")
    val got = Sampling.perKeySample(df, "key", "uid", 10, "t").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.length == 20)
    assert(got.forall { case (_, uid) => uid.startsWith("id-") },
      "string ids must survive unchanged, not become null")
    assert(got.groupBy(_._1).forall(_._2.length == 10))
  }

  test("stratifiedSample applies per-stratum fractions") {
    val s = Sampling.stratifiedSample(docs(4), "doc_id", "lang",
        Map("en" -> 0.9, "de" -> 0.05), defaultFraction = 0.3, salt = "t")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // ~334 docs per stratum: en ≈ 300, de ≈ 17, fr ≈ 100
    assert(s("en") > 250, s.toString)
    assert(s.getOrElse("de", 0L) < 60, s.toString)
    assert(s("fr") > 50 && s("fr") < 170, s.toString)
  }

  test("perKeySample keeps at most n per key, deterministically, sans window") {
    val got = Sampling.perKeySample(docs(4), "lang", "doc_id", 25, "t")
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = got.queryExecution.executedPlan.toString
      assert(!p.contains("Window"), "bounded aggregate, not row_number:\n" + p)
      assert(p.contains("partial_"), "map-side partials expected:\n" + p)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.groupBy(_._1).forall(_._2.length == 25))
    val again = Sampling.perKeySample(docs(9), "lang", "doc_id", 25, "t")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSet == again.toSet)
  }

  test("mixtureSample hits per-stratum token budgets; untargeted strata pass whole") {
    import spark.implicits._
    // 400 docs of 10 tokens each per stratum: 4000 tokens per stratum
    val docs = (0 until 800).map { i =>
      val stratum = if (i < 400) "en" else "fr"
      (i.toLong, stratum, Seq.fill(10)(s"w${i % 7}").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val tok = size(split(col("text"), "\\s+"))
    val sampled = Sampling.mixtureSample(docs, "doc_id", tok, "lang",
      Map("en" -> 1000L), salt = "mixtest")
    val kept = sampled.groupBy("lang")
      .agg(sum(tok).as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // en targeted 1000 of 4000 tokens: Bernoulli rate 0.25, so the kept
    // count concentrates near 1000 (400 draws; allow generous noise)
    assert(kept("en") > 500 && kept("en") < 1500, kept.toString)
    assert(kept("fr") == 4000L, "untargeted stratum keeps every row")
    // deterministic: the same inputs keep the same rows
    val again = Sampling.mixtureSample(docs, "doc_id", tok, "lang",
      Map("en" -> 1000L), salt = "mixtest").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("mixtureSample fails fast past maxStrata instead of collecting unbounded") {
    import spark.implicits._
    val docs = (0 until 100).map(i => (i.toLong, s"s$i", "a b c"))
      .toDF("doc_id", "lang", "text")
    val tok = size(split(col("text"), "\\s+"))
    val e = intercept[IllegalArgumentException] {
      Sampling.mixtureSample(docs, "doc_id", tok, "lang",
        Map("s0" -> 1L), salt = "g", maxStrata = 10)
    }
    assert(e.getMessage.contains("maxStrata") ||
      e.getMessage.contains("distinct values"), e.getMessage)
    // at exactly the limit the operator behaves as before
    val ok = Sampling.mixtureSample(docs, "doc_id", tok, "lang",
      Map("s0" -> 1L), salt = "g", maxStrata = 100)
    assert(ok.count() >= 99, "untargeted strata pass whole")
  }

  test("packChunks fills chunks to capacity in bucket order") {
    val capacity = 100
    val packed = Sampling.packChunks(docs(4), "doc_id",
        size(split(col("text"), "\\s+")), capacity)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // within a (bucket, chunk): total tokens stay under capacity + one doc's
    // overflow (a doc never splits; the chunk it starts in owns it)
    packed.groupBy(p => (p._2, p._4)).foreach { case ((b, c), rows) =>
      val total = rows.map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(total < capacity + maxDoc, s"bucket $b chunk $c total=$total")
    }
    // chunk_seq is dense from 0 within each bucket
    packed.groupBy(_._2).foreach { case (b, rows) =>
      val seqs = rows.map(_._4).distinct.sorted
      assert(seqs.sameElements(0L until seqs.length),
        s"bucket $b: ${seqs.mkString(",")}")
    }
    // deterministic under re-partitioning
    val again = Sampling.packChunks(docs(17), "doc_id",
        size(split(col("text"), "\\s+")), capacity)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(packed.toSet == again.toSet)
  }

  test("packChunks bucket count is a parameter; default 256 is the md5 prefix") {
    val capacity = 100
    val tok = size(split(col("text"), "\\s+"))
    def run(nBuckets: Int) = Sampling.packChunks(docs(4), "doc_id", tok,
        capacity, nBuckets).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    for (n <- Seq(16, 1024)) {
      val packed = run(n)
      val buckets = packed.map(_._2).distinct
      assert(buckets.length <= n, s"$n buckets requested, got ${buckets.length}")
      // same packing invariants as the default: capacity respected per
      // (bucket, chunk), chunk_seq dense from 0 per bucket
      packed.groupBy(p => (p._2, p._4)).foreach { case ((b, c), rows) =>
        assert(rows.map(_._3).sum < capacity + rows.map(_._3).max,
          s"n=$n bucket $b chunk $c overfilled")
      }
      packed.groupBy(_._2).foreach { case (b, rows) =>
        val seqs = rows.map(_._4).distinct.sorted
        assert(seqs.sameElements(0L until seqs.length), s"n=$n bucket $b")
      }
    }
    // explicit 256 is byte-identical to the default (the documented two-hex
    // md5 prefix bucketing external reproductions depend on)
    val explicit = run(256)
    val default = Sampling.packChunks(docs(4), "doc_id", tok, capacity)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(explicit.toSet == default.toSet)
    assert(explicit.forall(_._2.length == 2))
  }

  test("temperatureMixture flattens shares by alpha and clamps small strata") {
    import spark.implicits._
    // big stratum 16x the tokens of the small one: natural shares 16/17 vs
    // 1/17; alpha=0.5 flattens weights to 4:1
    val docs = (0 until 1700).map { i =>
      val stratum = if (i < 1600) "big" else "small"
      (i.toLong, stratum, Seq.fill(10)("w").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val tok = size(split(col("text"), "\\s+"))
    val budget = 5000L
    val sampled = Sampling.temperatureMixture(docs, "doc_id", tok, "lang",
      alpha = 0.5, budgetTokens = budget, salt = "t")
    val kept = sampled.groupBy("lang").agg(sum(tok).as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // alpha=0.5 weights: sqrt(16000):sqrt(1000) = 4:1 -> big targets 4000
    // of 16000 (rate .25), small targets 1000 of 1000 (rate 1, clamped)
    assert(kept("small") == 1000L, s"small stratum clamps at keep-all: $kept")
    assert(kept("big") > 2800 && kept("big") < 5200,
      s"big stratum concentrates near 4000 tokens: $kept")
    // alpha=1 reproduces natural proportions: every stratum keeps
    // share*budget = toks*(budget/total) -> a uniform rate
    val nat = Sampling.temperatureMixture(docs, "doc_id", tok, "lang",
      alpha = 1.0, budgetTokens = budget, salt = "t")
      .groupBy("lang").agg(sum(tok).as("toks")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rate = budget.toDouble / 17000.0
    assert(math.abs(nat("big") - 16000 * rate) < 1600, nat.toString)
    assert(math.abs(nat("small") - 1000 * rate) < 400, nat.toString)
    // deterministic under re-run
    val again = Sampling.temperatureMixture(docs, "doc_id", tok, "lang",
      alpha = 0.5, budgetTokens = budget, salt = "t")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == sampled.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("groupSplit keeps every member of a group on the same side") {
    import spark.implicits._
    val members = (0L until 300L).map(i => (i, s"g${i % 40}"))
      .toDF("doc_id", "group")
    val split = Sampling.groupSplit(members, "group", testFraction = 0.25,
      salt = "s")
    val sides = split.groupBy("group")
      .agg(countDistinct(col("split")).as("n")).collect().map(_.getLong(1))
    assert(sides.forall(_ == 1L), "a group must never straddle the split")
    val frac = split.filter(col("split") === "test").count().toDouble / 300.0
    assert(frac > 0.05 && frac < 0.5, s"test share ~0.25, got $frac")
    // deterministic and stable as members arrive: the side depends only on
    // the group key
    val one = Sampling.groupSplit(Seq((999L, "g7")).toDF("doc_id", "group"),
      "group", 0.25, "s").select("split").head.getString(0)
    val inFull = split.filter(col("group") === "g7")
      .select("split").head.getString(0)
    assert(one == inFull)
  }

  test("gumbelTopK: k distinct rows, weight-dominated, partition-invariant") {
    import spark.implicits._
    // weights 100 nats apart dwarf the Gumbel noise (~[-2,+5] nats): the
    // top-10 must be exactly the 10 heaviest rows
    val df = (0L until 50L).map(i => (i, i * 100L * 1000000L))
      .toDF("id", "w_micro")
    val top = Sampling.gumbelTopK(df, "id", col("w_micro"), 10, "t")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(top == (40L until 50L).toSet, top.toString)
    // equal weights: selection is content-addressed — stable under
    // re-partitioning and re-runs
    val eq = (0L until 200L).map(i => (i, 0L)).toDF("id", "w_micro")
    def run(parts: Int): Seq[Long] =
      Sampling.gumbelTopK(eq.repartition(parts), "id", col("w_micro"), 25, "t")
        .orderBy("id").collect().map(_.getLong(0)).toSeq
    val a = run(1)
    assert(a == run(17) && a.size == 25 && a.distinct.size == 25)
  }
}
