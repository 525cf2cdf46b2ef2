package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.{Agreement, RobustStats}
import graft.operators.CapacityPlan
import graft.similarity.LabelAudit

/** Hand-computed contracts for the round-10 label-quality operators:
  * Cohen's κ closed-form cells, median/MAD on a known contaminated group,
  * chunk-count boundary arithmetic, and constructed embedding geometries
  * where the kNN agreement / truncation-overlap answers are forced.
  */
class LabelQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("cohenKappa: chance-level, perfect, and degenerate groups") {
    import spark.implicits._
    val rows =
      // chance-level: marginals 2/2 each side, 2 agreements -> kappa = 0
      Seq(("chance", "x", "x"), ("chance", "x", "y"),
        ("chance", "y", "x"), ("chance", "y", "y"),
        // perfect: a == b on every row -> kappa = 1
        ("perfect", "x", "x"), ("perfect", "x", "x"), ("perfect", "y", "y"),
        // degenerate: both raters constant and equal -> 0/0, dropped
        ("constant", "x", "x"), ("constant", "x", "x"))
    val got = Agreement.cohenKappa(
        rows.toDF("src", "a", "b"), "src", "a", "b")
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Long]("kappa_micro"))
      .toMap
    assert(got == Map("chance" -> 0L, "perfect" -> 1000000L))
  }

  test("madOutliers: known median/MAD, zero-MAD group flags every off-median row") {
    import spark.implicits._
    val rows = Seq.tabulate(5)(i => ("spiky", Seq(1L, 2L, 3L, 4L, 100L)(i))) ++
      Seq(("flat", 7L), ("flat", 7L), ("flat", 7L), ("flat", 9L))
    val got = RobustStats.madOutliers(rows.toDF("src", "v"), "src", "v")
      .collect()
      .map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("med"), r.getAs[Long]("mad"),
          r.getAs[Long]("n_outliers"), r.getAs[Long]("outlier_ppm"))))
      .toMap
    // spiky: med 3 (rank ceil(5/2)=3), devs {2,1,0,1,97} -> mad 1;
    // cut |v-3|*10 > 35 flags only 100
    assert(got("spiky") == ((3L, 1L, 1L, 200000L)))
    // flat: med 7, mad 0 -> every off-median row is an outlier
    assert(got("flat") == ((7L, 0L, 1L, 250000L)))
  }

  test("chunkPlan: boundary counts at window=128 overlap=32 (stride 96)") {
    import spark.implicits._
    val docs = Seq(0, 1, 128, 129, 224, 225).zipWithIndex.map {
      case (n, id) => (id.toLong, Seq.fill(n)("w").mkString(" "))
    }
    val got = CapacityPlan.chunkPlan(
        docs.toDF("doc_id", "text"), "doc_id", "text", 128, 32)
      .collect()
      .map(r => r.getAs[Long]("n_tokens") -> r.getAs[Long]("n_chunks")).toMap
    // the q110 raw-split convention: "" splits to [""] -> 1 token
    assert(got == Map(1L -> 1L, 128L -> 1L, 129L -> 2L,
      224L -> 2L, 225L -> 3L))
    // padded-token bill: 225 tokens over 3 chunks pads to 384
    val waste = CapacityPlan.chunkPlan(
        docs.toDF("doc_id", "text"), "doc_id", "text", 128, 32)
      .filter(col("n_tokens") === 225).collect().head
    assert(waste.getAs[Long]("padded_tokens") == 384L)
    assert(waste.getAs[Long]("waste_ppm") == (384L - 225L) * 1000000L / 384L)
  }

  test("prCurve: hand-computed operating points on a 10-row score ladder") {
    import spark.implicits._
    // scores 1..10, positives are the top 4 (7,8,9,10)
    val df = (1 to 10).map(s => (s.toLong, s >= 7)).toDF("s", "lab")
    val got = graft.curation.RankEval.prCurve(df, "s", "lab",
        qsPpm = Seq(500000L, 900000L))
      .collect().map(r => r.getAs[Long]("q_ppm") ->
        ((r.getAs[Long]("threshold"), r.getAs[Long]("n_pred"),
          r.getAs[Long]("tp"), r.getAs[Long]("precision_ppm"),
          r.getAs[Long]("recall_ppm")))).toMap
    // median threshold = value at rank ceil(0.5*10) = 5 -> s >= 5 predicts 6
    // rows of which 4 positive; p = 4/6, r = 4/4
    assert(got(500000L) == ((5L, 6L, 4L, 666666L, 1000000L)))
    // 0.9 quantile = rank 9 -> s >= 9 predicts 2, both positive; r = 2/4
    assert(got(900000L) == ((9L, 2L, 2L, 1000000L, 500000L)))
  }

  test("prCurve: emits nothing when no positive rows exist") {
    import spark.implicits._
    val df = (1 to 5).map(s => (s.toLong, false)).toDF("s", "lab")
    assert(graft.curation.RankEval.prCurve(df, "s", "lab").count() == 0L)
  }

  test("dowSeasonality: a perfectly uniform week is exactly zero chi-square") {
    import spark.implicits._
    // 14 consecutive days (two full weeks), one event per day -> every
    // weekday has d_w = 2, obs = 2, tot = 14, D = 14: dev_num = 0
    val df = (0 until 14).map(i =>
      (java.sql.Timestamp.valueOf(f"2026-03-${i + 1}%02d 10:00:00"), "t"))
      .toDF("ts", "event_type")
    val got = graft.operators.ChangePoint.dowSeasonality(df, "ts", "event_type")
      .collect()
    assert(got.length == 7)
    got.foreach { r =>
      assert(r.getAs[Long]("days_w") == 2L && r.getAs[Long]("obs") == 2L)
      assert(r.getAs[Long]("dev_num") == 0L &&
        r.getAs[Long]("chi2_micro") == 0L)
    }
  }

  test("dowSeasonality: all mass on one weekday concentrates the chi-square there") {
    import spark.implicits._
    // one full week span, 7 events all on the first day (a Sunday)
    val df = Seq.fill(7)((java.sql.Timestamp.valueOf("2026-03-01 09:00:00"), "t"))
      .++(Seq((java.sql.Timestamp.valueOf("2026-03-07 09:00:00"), "t")))
      .toDF("ts", "event_type")
    val got = graft.operators.ChangePoint.dowSeasonality(df, "ts", "event_type")
      .collect().map(r => r.getAs[Long]("dow") ->
        ((r.getAs[Long]("obs"), r.getAs[Long]("term_micro")))).toMap
    // D = 7 days, tot = 8; Sunday (dow 0): obs 7, exp 8/7 ->
    // dev = 7*7 - 8 = 41, term = 41^2 * 1e6 / (7*8*1) = 30017857
    assert(got(0L) == ((7L, 30017857L)))
    // Saturday (dow 6): obs 1, dev = 7 - 8 = -1, term = 1e6/56 = 17857
    assert(got(6L) == ((1L, 17857L)))
    // silent weekdays: obs 0, dev = -8, term = 64e6/56
    assert(got(2L) == ((0L, 1142857L)))
  }

  test("knnLabelAgreement: planted mislabeled point is the only suspect") {
    import spark.implicits._
    // two tight clusters; id 6 sits in cluster A but carries B's label
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f), 1), (1L, Array(0.99f, 0.01f), 1),
      (2L, Array(0.98f, 0.02f), 1),
      (3L, Array(0.0f, 1.0f), 2), (4L, Array(0.01f, 0.99f), 2),
      (5L, Array(0.02f, 0.98f), 2),
      (6L, Array(0.97f, 0.03f), 2))
    val df = vecs.toDF("vec_id", "embedding", "label")
    val got = LabelAudit.knnLabelAgreement(df, df, "vec_id", "embedding",
        "label", k = 2)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_agree"), r.getAs[Boolean]("suspect")))).toMap
    assert(got(6L) == ((0L, true)), s"mislabeled point must disagree: $got")
    assert(got(3L) == ((2L, false)) && got(4L) == ((2L, false)))
    // cluster-A points see id 6 as a neighbor with the wrong label, but
    // never a MAJORITY of wrong labels
    Seq(0L, 1L, 2L).foreach(id => assert(!got(id)._2, s"$id: $got"))
  }

  test("truncationFidelity: constructed neighbor flip under the cut") {
    import spark.implicits._
    // probe aligns with b in full 4-dim space but with a on the first 2 dims
    val corpus = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (11L, Array(0.8f, 0.1f, 0.0f, 0.9f))).toDF("vec_id", "embedding")
    val probe = Seq((0L, Array(1.0f, 0.0f, 0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val flip = LabelAudit.truncationFidelity(probe, corpus, "vec_id",
        "embedding", dims = 2, k = 1).collect().head
    assert(flip.getAs[Long]("overlap") == 0L &&
      flip.getAs[Long]("overlap_ppm") == 0L)
    // with k = 2 both lists contain both candidates -> full overlap
    val both = LabelAudit.truncationFidelity(probe, corpus, "vec_id",
        "embedding", dims = 2, k = 2).collect().head
    assert(both.getAs[Long]("k_full") == 2L &&
      both.getAs[Long]("overlap_ppm") == 1000000L)
  }

  test("krippendorffAlpha: perfect, chance-vs-kappa split, negative, degenerate") {
    import spark.implicits._
    val rows = Seq(
      // perfect with 2 values: De = 36 - (16+4) = 16 > 0, Do = 0 -> 1.0
      ("perfect", "x", "x"), ("perfect", "x", "x"), ("perfect", "y", "y"),
      // kappa's chance-level cells: N=4, A=2, pooled n_x = n_y = 4,
      // De = 64-32 = 32, Do = 4 -> alpha = 1 - 7*4/32 = 0.125 (kappa = 0
      // here — the pooled-marginal + (n-1) correction IS the difference)
      ("chance", "x", "x"), ("chance", "x", "y"),
      ("chance", "y", "x"), ("chance", "y", "y"),
      // systematic disagreement: N=2, A=0, De = 16-8 = 8, Do = 4
      // -> alpha = 1 - 3*4/8 = -0.5 (pins negative integer division)
      ("anti", "x", "y"), ("anti", "y", "x"),
      // both raters constant and equal -> De = 0, dropped
      ("constant", "x", "x"), ("constant", "x", "x"))
    val got = Agreement.krippendorffAlpha(
        rows.toDF("src", "a", "b"), "src", "a", "b")
      .collect().map(r => r.getAs[String]("g") ->
        r.getAs[Long]("alpha_micro")).toMap
    assert(got == Map("perfect" -> 1000000L, "chance" -> 125000L,
      "anti" -> -500000L))
  }

  test("conformalScreen: thresholds match an independently-computed rank rule") {
    import spark.implicits._
    import java.security.MessageDigest
    val n = 200
    val df = (1 to n).map(i => (i.toLong, i.toLong * 1000L, i % 2 == 0))
      .toDF("id", "score", "lab")
    val alphas = Seq(100000L, 500000L)
    val got = graft.curation.Conformal.conformalScreen(
        df, "id", col("score"), col("lab"), 0.5, "t", alphas)
      .collect().map(r => r.getAs[Long]("alpha_ppm") -> r).toMap

    // independent re-derivation: same md5 split helper, plain Scala rank
    def draw(id: Long): String = MessageDigest.getInstance("MD5")
      .digest(s"t:$id".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.take(8)
    val thr = graft.sampling.Sampling.fractionThreshold(0.5)
    val cal = (1 to n).filter(i => draw(i.toLong) < thr)
    val eval = (1 to n).filterNot(i => draw(i.toLong) < thr)
    val calPos = cal.filter(_ % 2 == 0).map(_.toLong * 1000L).sorted
    val evalPos = eval.filter(_ % 2 == 0).map(_.toLong * 1000L)
    for (a <- alphas) {
      val k = a * (calPos.size + 1) / 1000000L
      val r = got(a)
      assert(r.getAs[Long]("n_cal") == calPos.size.toLong)
      assert(r.getAs[Long]("k_rank") == k)
      val expThr = if (k >= 1) Some(calPos(k.toInt - 1)) else None
      assert(Option(r.getAs[Any]("thr_score"))
        .map(_.asInstanceOf[Long]) == expThr)
      val kept = evalPos.count(s => expThr.forall(s >= _))
      assert(r.getAs[Long]("n_eval_pos_kept") == kept.toLong)
      assert(r.getAs[Long]("coverage_ppm") ==
        kept.toLong * 1000000L / evalPos.size)
      assert(r.getAs[Long]("n_eval") == eval.size.toLong)
    }
  }

  test("ngramPrecisionProfile: hand-computed clipped precisions, one pair") {
    import spark.implicits._
    val docs = Seq((1L, "a b a c"), (2L, "a b b")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L, "g1")).toDF("cand_id", "ref_id", "grp")
    val got = graft.curation.OverlapEval.ngramPrecisionProfile(
        docs, "doc_id", "text", pairs, "cand_id", "ref_id", "grp")
      .collect().map(r => r.getAs[Int]("n") ->
        ((r.getAs[Long]("clipped"), r.getAs[Long]("cand_grams"),
          r.getAs[Long]("p_ppm")))).toMap
    // n=1: cand {a:2,b:1,c:1} vs ref {a:1,b:2} -> clip 2/4
    // n=2: {ab,ba,ac} vs {ab,bb} -> 1/3;  n=3: 0/2;  n=4: 0/1
    assert(got == Map(1 -> ((2L, 4L, 500000L)), 2 -> ((1L, 3L, 333333L)),
      3 -> ((0L, 2L, 0L)), 4 -> ((0L, 1L, 0L))))
  }

  test("budgetedSelect: waterfill allocation + greedy score-ordered fill") {
    import spark.implicits._
    // group a supplies 100 tokens, b supplies 30; budget 80 -> b fully
    // funded (30), a gets the remaining 50. a's docs by score desc:
    // (id 2, s 9, 30tk) cum 30; (id 1, s 5, 40tk) cum 70 > 50? no — 70 > 50
    // -> only doc 2 fits (30 <= 50, next cum 70 overflows). b: one 30tk doc.
    val docs = Seq(
      ("a", 1L, 5L, 40L), ("a", 2L, 9L, 30L), ("a", 3L, 1L, 30L),
      ("b", 4L, 7L, 30L)).toDF("src", "id", "s", "tk")
    val got = CapacityPlan.budgetedSelect(docs, "src", "id",
        col("s"), col("tk"), budget = 80L)
      .collect().map(r => r.getAs[String]("g") ->
        ((r.getAs[Long]("cap"), r.getAs[Long]("alloc"),
          r.getAs[Long]("n_selected"), r.getAs[Long]("tokens_selected"),
          r.getAs[Long]("fill_ppm")))).toMap
    assert(got("b") == ((30L, 30L, 1L, 30L, 1000000L)))
    assert(got("a") == ((100L, 50L, 1L, 30L, 600000L)))
  }

  test("packFragmentation: interval/boundary arithmetic at contextLen=10") {
    import spark.implicits._
    // token counts 4,6,3,10,8 -> cum 4,10,13,23,31; docs 4 and 5 straddle
    val docs = Seq(4, 6, 3, 10, 8).zipWithIndex.map { case (k, i) =>
      (i.toLong, "g", Seq.fill(k)("w").mkString(" "))
    }.toDF("doc_id", "src", "text")
    val r = CapacityPlan.packFragmentation(docs, "src", "doc_id", "text",
      contextLen = 10).collect().head
    assert(r.getAs[Long]("n_docs") == 5L &&
      r.getAs[Long]("total_tokens") == 31L &&
      r.getAs[Long]("windows_used") == 4L &&
      r.getAs[Long]("fragments") == 7L &&
      r.getAs[Long]("n_straddle") == 2L &&
      r.getAs[Long]("straddle_ppm") == 400000L &&
      r.getAs[Long]("tail_pad") == 9L)
  }
}
