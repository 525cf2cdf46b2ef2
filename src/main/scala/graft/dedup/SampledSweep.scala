package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sampling.Sampling

/** Sampled near-duplicate audits — the q178 move (deterministic hash-sample
  * composed with the exact arm) applied to the two exact-pair reports that
  * dominate BENCH_sf10: the dedup threshold sweep (q114, 292 s at ~sf10)
  * and the cross-source duplication matrix (q115, 163 s). Both ride the
  * SAME sampled prefix-filtered pair frame, built once and persisted, so
  * the tuning audit runs at ANY corpus scale: the exact pair join's cost
  * falls to ~f² of the pairs while per-threshold pair counts stay unbiased
  * (`est_pairs_full = n_pairs · 1/f²` — an unordered pair survives iff both
  * endpoints draw into the sample, independent events of probability f).
  *
  * What is and isn't estimable: PAIR counts scale by 1/f² exactly;
  * docs-removed and the matrix's per-cell counts are reported at sample
  * level too, but their full-corpus inflation has no closed form (a doc is
  * removed iff ≥1 lower-id partner qualifies — a coupon-collector, not a
  * Bernoulli, event), so only the pair columns carry `est_pairs_full`;
  * [[removalRateBootstrap]] brackets the removal-rate estimate with a
  * Poisson-bootstrap CI instead.
  *
  * Determinism: the sample is content-addressed ([[Sampling.hashSample]],
  * never `rand()`), so the audit is reproducible run-to-run and
  * engine-checkable — the DuckDB oracles apply the identical md5-draw
  * predicate.
  */
object SampledSweep {

  /** The shared frame: hash-sample `docs` at `fraction`, then the exact
    * prefix-filtered Jaccard pair join at `threshold` — persisted because
    * both reports (and any further consumer) aggregate it (the q174
    * single-derivation lesson).
    */
  def sampledPairs(docs: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, threshold: Double, fraction: Double,
      salt: String): DataFrame =
    Dedup.prefixFilterJaccard(
        Sampling.hashSample(docs, idCol, fraction, salt),
        idCol, textCol, shingleLen, threshold)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** q114's sweep over a sampled pair frame: sampled pair / docs-removed
    * counts per candidate threshold plus the unbiased full-corpus pair
    * estimate. `invFractionSq` = round(1/f²), passed explicitly so the
    * scale-up stays an exact integer the oracle reproduces (f = 1/2 → 4).
    */
  def thresholdSweep(pairs: DataFrame, thresholdsPpm: Seq[Long],
      invFractionSq: Long): DataFrame = {
    require(thresholdsPpm.nonEmpty, "need at least one threshold")
    require(invFractionSq >= 1, s"invFractionSq must be >= 1")
    val spark = pairs.sparkSession
    import spark.implicits._
    val thresholds = thresholdsPpm.toDF("t_ppm")
    thresholds.join(pairs, lit(true), "left")
      .groupBy(col("t_ppm"))
      .agg(
        count(when(col("jac_ppm") >= col("t_ppm"), 1)).as("n_pairs"),
        countDistinct(when(col("jac_ppm") >= col("t_ppm"), col("id2")))
          .as("n_docs_removed"))
      .select(col("t_ppm"), col("n_pairs"), col("n_docs_removed"),
        (col("n_pairs") * lit(invFractionSq)).as("est_pairs_full"))
      .orderBy(col("t_ppm"))
  }

  /** q162's Binomial(8, 1/8) Poisson-bootstrap weight, content-addressed
    * from (salt, replica, id) — the count of {0,1} hex digits among the
    * first 8 of md5, mean 1, reproduced exactly by the DuckDB oracle
    */
  private def poissonWeight(replica: Column, id: Column,
      salt: String): Column =
    length(regexp_replace(
      substring(md5(concat_ws(":", lit(salt), replica, id)), 1, 8),
      "[^01]", "")).cast("long")

  /** Bootstrap distribution of the SAMPLE-LEVEL removal rate at one
    * threshold — the uncertainty the sweep's point `n_docs_removed` lacks
    * (docs-removed has no closed-form 1/f² inflation: removal is a
    * coupon-collector event, see the object scaladoc). Each replicate
    * reweights every sampled document i.i.d. with the q162 Binomial(8,1/8)
    * content-addressed weight; a document counts as removed in a replicate
    * iff it AND at least one qualifying lower-id partner both survive the
    * resample. Output is one row per replicate (replica, n_eff,
    * n_removed_eff, removed_ppm) whose spread IS the bootstrap CI of the
    * removal rate — order statistics of `removed_ppm` give the interval.
    *
    * Honest scope: the CI quantifies the SAMPLING variability of the
    * rate measured at the sample's pair density. It does not undo the
    * f-thinning bias itself (pairs thin by f² while docs thin by f, so
    * the sample rate UNDERESTIMATES the full-corpus removal rate); it
    * brackets how tightly the sample pins that biased-low estimate,
    * which is the go/no-go signal a threshold decision reads.
    *
    * Scale shape: `sampleDocs` expands ×B map-side and partial-aggregates
    * to B rows before the one exchange (the q162 shape); the pair side is
    * the already-sampled persisted frame — bounded — expanded ×B and
    * distinct-reduced on (replica, doc). No corpus-sized shuffle.
    */
  def removalRateBootstrap(pairs: DataFrame, sampleDocs: DataFrame,
      idCol: String, thresholdPpm: Long, replicas: Int,
      salt: String): DataFrame = {
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    val reps = explode(sequence(lit(0), lit(replicas - 1)))
    val nEff = sampleDocs
      .select(col(idCol).cast("string").as("_graft_id"))
      .withColumn("replica", reps)
      .select(col("replica"),
        poissonWeight(col("replica"), col("_graft_id"), salt).as("_graft_w"))
      .groupBy(col("replica"))
      .agg(sum(col("_graft_w")).as("n_eff"))
    val removed = pairs.filter(col("jac_ppm") >= thresholdPpm)
      .select(col("id1").cast("string").as("_graft_a"),
        col("id2").cast("string").as("_graft_b"))
      .withColumn("replica", reps)
      .select(col("replica"), col("_graft_b"),
        poissonWeight(col("replica"), col("_graft_a"), salt).as("_graft_wa"),
        poissonWeight(col("replica"), col("_graft_b"), salt).as("_graft_wb"))
      .filter(col("_graft_wa") > 0L && col("_graft_wb") > 0L)
      .select(col("replica"), col("_graft_b"), col("_graft_wb"))
      .distinct()
      .groupBy(col("replica"))
      .agg(sum(col("_graft_wb")).as("n_removed_eff"))
    nEff.join(removed, Seq("replica"), "left")
      .filter(col("n_eff") > 0L)
      .select(col("replica"), col("n_eff"),
        coalesce(col("n_removed_eff"), lit(0L)).as("n_removed_eff"))
      .withColumn("removed_ppm",
        expr("(n_removed_eff * 1000000) div n_eff"))
      .orderBy(col("replica"))
  }

  /** q115's provenance matrix over the same sampled pair frame: unordered
    * source pairs with sampled and estimated full-corpus pair counts.
    * `docs` may be the full corpus (ids outside the sample never appear in
    * `pairs`, so the join is a lookup, not a re-sample).
    */
  def crossSourceMatrix(pairs: DataFrame, docs: DataFrame, idCol: String,
      sourceCol: String, invFractionSq: Long): DataFrame = {
    require(invFractionSq >= 1, s"invFractionSq must be >= 1")
    val src = docs.select(col(idCol).cast("long").as("_graft_id"),
      col(sourceCol).as("_graft_src"))
    pairs
      .join(src.select(col("_graft_id").as("id1"),
        col("_graft_src").as("_graft_s1")), "id1")
      .join(src.select(col("_graft_id").as("id2"),
        col("_graft_src").as("_graft_s2")), "id2")
      .select(least(col("_graft_s1"), col("_graft_s2")).as("src_a"),
        greatest(col("_graft_s1"), col("_graft_s2")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("src_a"), col("src_b"), col("n_pairs"),
        (col("n_pairs") * lit(invFractionSq)).as("est_pairs_full"))
      .orderBy(col("src_a"), col("src_b"))
  }
}
