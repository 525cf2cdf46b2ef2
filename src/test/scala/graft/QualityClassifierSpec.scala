package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curation.QualityClassifier

/** Distilled-classifier semantics beyond the q71 oracle row: weight signs
  * follow class evidence, scoring generalizes to unlabeled text, OOV
  * tokens contribute nothing, and the micro-nat arithmetic is exact.
  */
class QualityClassifierSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private val train = Seq(
    (1L, "good clean prose here", true),
    (2L, "more good clean text", true),
    (3L, "spam spam buy now", false),
    (4L, "buy spam now cheap", false)).toDF("doc_id", "text", "lab")

  test("log-odds weights separate class-indicative tokens by sign") {
    val tok = train.select(col("doc_id"), col("lab"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val w = QualityClassifier.trainTokens(tok, "token", "lab")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("clean") > 0 && w("good") > 0, w.toString)
    assert(w("spam") < 0 && w("buy") < 0, w.toString)
    // exact integer check of one weight: clean appears twice in pos (8
    // tokens), never in neg (8 tokens), vocab = 10 distinct tokens
    val expect =
      math.round(math.log(3.0 / (8 + 10)) * 1e6) -
        math.round(math.log(1.0 / (8 + 10)) * 1e6)
    assert(w("clean") == expect)
  }

  test("scoring generalizes to unlabeled documents; OOV-only docs drop out") {
    val tok = train.select(col("doc_id"), col("lab"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val w = QualityClassifier.trainTokens(tok, "token", "lab")
    val unseen = Seq(
      (10L, "clean good writing"),        // 2 trained pos tokens + 1 OOV
      (11L, "buy spam spam"),             // trained neg tokens
      (12L, "totally novel words")).toDF("doc_id", "text")
    val unseenTok = unseen.select(col("doc_id"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
      .filter(col("token") =!= "")
    val got = QualityClassifier.scoreTokens(unseenTok, "doc_id", "token", w)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val byId = got.map(t => t._1 -> t).toMap
    assert(byId(10L)._3 > 0, got.toString)         // scores positive
    assert(byId(11L)._3 < 0, got.toString)         // scores negative
    assert(!byId.contains(12L), got.toString)      // all-OOV: no row
    assert(byId(10L)._2 == 2, got.toString)        // only in-vocab tokens count
  }

  test("distill scores every labeled document with exact integer micro-nats") {
    val got = QualityClassifier.distill(train, "doc_id", "text", "lab")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L) > 0 && got(2L) > 0 && got(3L) < 0 && got(4L) < 0,
      got.toString)
  }
}
