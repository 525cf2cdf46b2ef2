package graft.curation

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Count-min sketch over token marginals (Cormode & Muthukrishnan 2005) —
  * the sublinear-memory scale path for distribution monitoring: where
  * [[DistributionDrift]] joins exact vocabulary marginals (fine while a
  * natural-language vocabulary broadcasts), a web-scale or adversarial
  * token stream needs a FIXED-size summary. A depth×width grid of counters
  * (depth independent hashes; estimate = min over rows) never
  * underestimates and overestimates by at most ε·N with probability 1−δ
  * (ε = e/width, δ = e^−depth) — and the grid is a trivially mergeable
  * aggregate, so 1000 executors each sketch their split and the driver
  * (or a reduce) adds grids elementwise.
  *
  * Determinism: counters are exact integer sums and the hash family is the
  * salted-md5 bucket ([[TextFunctions.hashMod]]), so sketch contents are
  * identical across runs, partitionings, and engines — the DuckDB oracle
  * rebuilds the same grid cell-for-cell.
  *
  * Scale shape: the only corpus-scale operation is the token count
  * aggregate (one shuffle, partial-agg'd); the grid builds from the
  * VOCABULARY (one row per distinct token, posexploded to `depth` cells)
  * and is at most depth×width rows regardless of corpus size. Probes are
  * a broadcast join against the grid.
  */
object CmsSketch {

  /** cell coordinates for one value under hash row `j` */
  def bucket(value: Column, j: Int, width: Int): Column =
    TextFunctions.hashMod(value, s"cms$j", width)

  /** The sketch grid (j, bucket, c) from (token, cnt) vocabulary rows:
    * each token adds its count to one cell per hash row. At most
    * depth×width output rows.
    */
  def cellsFromCounts(vocab: DataFrame, tokenCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    vocab
      .select(col(cntCol).cast("long").as("_graft_cnt"),
        posexplode(array((0 until depth).map(j =>
          bucket(col(tokenCol), j, width)): _*)).as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(sum(col("_graft_cnt")).as("c"))
  }

  /** Point-estimate audit: the corpus's exact top-`topK` tokens probed
    * against the sketch built from the SAME corpus — per token the exact
    * count, the CMS estimate (min over depth cells), and the relative
    * overestimate in exact ppm. `est_cnt >= exact_cnt` always (CMS never
    * underestimates); the audit quantifies how much collision noise the
    * chosen width admits before a deployment trusts sketch-only marginals.
    *
    * `tokenRows` is an exploded (token) frame — hand it a persisted
    * projection to share the scan with other token consumers (the q62
    * pattern). Empty-string tokens must already be filtered.
    */
  def topKOverestimate(tokenRows: DataFrame, tokenCol: String,
      depth: Int, width: Int, topK: Int): DataFrame =
    topKOverestimateCounts(
      tokenRows.groupBy(col(tokenCol).as("token"))
        .agg(count(lit(1)).as("cnt")),
      "token", "cnt", depth, width, topK)

  /** [[topKOverestimate]] over pre-aggregated (token, cnt) vocabulary
    * rows — hand it a PERSISTED vocabulary so the corpus-scale token
    * aggregate runs once under both the grid build and the top-k pick
    * (the convenience entry plans the aggregate twice).
    */
  def topKOverestimateCounts(vocab0: DataFrame, tokenCol: String,
      cntCol: String, depth: Int, width: Int, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val vocab = vocab0.select(col(tokenCol).as("token"),
      col(cntCol).cast("long").as("cnt"))
    val grid = cellsFromCounts(vocab, "token", "cnt", depth, width)
    val top = vocab.orderBy(col("cnt").desc, col("token")).limit(topK)
    val probes = top
      .select(col("token"), col("cnt"),
        posexplode(array((0 until depth).map(j =>
          bucket(col("token"), j, width)): _*)).as(Seq("j", "bucket")))
    probes.join(broadcast(grid), Seq("j", "bucket"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("c")).as("est_cnt"))
      .select(col("token"), col("cnt").as("exact_cnt"), col("est_cnt"),
        expr("((est_cnt - exact_cnt) * 1000000) div exact_cnt").as("over_ppm"))
  }
}
