package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Chance-corrected inter-labeler agreement — the scalar that says whether
  * two labeling passes (a heuristic vs a model, two model versions, a
  * model vs declared metadata) actually agree beyond what their marginal
  * label distributions force. Raw accuracy is inflated exactly when one
  * label dominates; Cohen's κ subtracts that chance floor.
  */
object Agreement {

  /** Per-group Cohen's κ between two label columns, exact integer
    * micro-units: with N rows, A agreeing rows, and chance mass
    * `C = Σ_l rowmarg_l · colmarg_l`,
    * `κ = (N·A − C) / (N² − C)`, emitted as
    * `kappa_micro = (N·A − C)·10⁶ div (N² − C)`.
    *
    * One (group, a, b) partial-agg'd count is the only corpus-sized
    * exchange; marginals and the chance term derive from that bounded
    * cell frame. Degenerate groups where both labelers are constant and
    * identical (N² = C, κ is 0/0) are dropped — in BOTH engines, the
    * q159 lesson (a guard beats an engine-divergent division).
    *
    * All products (marginal cross terms, N·A, N², the ×10⁶ scale-up) run
    * in DECIMAL(38,0) — HUGEINT in the oracle — because N·A approaches N²
    * and `N²·10⁶` blows signed 64-bit once a group passes ~3 M rows,
    * exactly the production regime (the dowSeasonality term_micro
    * convention). The emitted `chance` column is cast back to BIGINT for
    * the stable gate schema.
    */
  def cohenKappa(df: DataFrame, groupCol: String, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).cast("string").as("g"),
        col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.groupBy(col("g"))
      .agg(sum(col("c")).as("n"),
        sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val ra = cells.groupBy(col("g"), col("a")).agg(sum(col("c")).as("ra"))
    // rename the self-join side up front: same-lineage column refs would
    // otherwise lean on Spark's dataset-id disambiguation (and its
    // trivially-true-predicate warning)
    val rb = cells.groupBy(col("g").as("_graft_gb"), col("b"))
      .agg(sum(col("c")).as("rb"))
    val chance = ra.join(rb,
        col("g") === col("_graft_gb") && col("a") === col("b"))
      .groupBy(col("g"))
      .agg(sum(col("ra").cast("decimal(38,0)") * col("rb")).as("chance"))
    totals.join(broadcast(chance), Seq("g"), "left")
      .withColumn("chance",
        coalesce(col("chance"), lit(0).cast("decimal(38,0)")))
      .filter(col("n").cast("decimal(38,0)") * col("n") > col("chance"))
      .select(col("g"), col("n"), col("agree"),
        col("chance").cast("long").as("chance"),
        expr("""CAST(((CAST(n AS DECIMAL(38,0)) * agree - chance) * 1000000)
               |  div (CAST(n AS DECIMAL(38,0)) * n - chance) AS BIGINT)"""
          .stripMargin).as("kappa_micro"))
  }

  /** Per-group Krippendorff's α (nominal, two raters, no missing values),
    * exact integer micro-units — the POOLED-marginal, small-sample-
    * corrected complement of [[cohenKappa]]: κ models each rater's own
    * label distribution; α treats both passes as draws from one shared
    * distribution and applies the (n−1) finite-sample correction, which is
    * what annotation-pipeline reliability reports conventionally quote.
    *
    * With N units, A agreeing units, n = 2N pooled values and pooled
    * value marginals n_v = rowmarg_v + colmarg_v:
    *   observed-disagreement numerator  Do = 2·(N − A)
    *   expected-disagreement numerator  De = n² − Σ_v n_v²
    *   α = 1 − (n−1)·Do / De
    * emitted as `alpha_micro = (De − (n−1)·Do)·10⁶ div De`.
    *
    * Same execution shape as κ: ONE (group, a, b) partial-agg'd cell count
    * is the only corpus-sized exchange; marginals and both disagreement
    * terms derive from the bounded cell frame. Degenerate groups where
    * every pooled value is identical (De = 0, α is 0/0) are dropped in
    * BOTH engines. Products (n², Σ n_v², ×10⁶) run in DECIMAL(38,0) /
    * HUGEINT — n² · 10⁶ blows signed 64-bit past ~1.5 M units per group.
    *
    * The DISPLAY column `de` is emitted as DECIMAL(38,0) — De runs up to
    * 4N² per group, which blows signed 64-bit past ~1.5e9 units/group (and
    * Spark's non-ANSI BIGINT cast would null where DuckDB's raises, an
    * engine-divergent edge). Decimal keeps it exact at any N, same as
    * `alpha_micro`'s internal arithmetic.
    *
    * Cache lifetime: `cells` persists at MEMORY_AND_DISK for the three
    * derived aggregates; per the repo-wide convention the CALLER owns
    * unpersisting (a returned lazy frame cannot unpersist its own input
    * before materialization) — long multi-query sessions should
    * `spark.catalog.clearCache()` between batches, as ScaleBench and the
    * Verify dump do.
    */
  def krippendorffAlpha(df: DataFrame, groupCol: String, aCol: String,
      bCol: String): DataFrame = {
    val cells = df.groupBy(col(groupCol).cast("string").as("g"),
        col(aCol).cast("string").as("a"), col(bCol).cast("string").as("b"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val totals = cells.groupBy(col("g"))
      .agg(sum(col("c")).as("n_units"),
        sum(when(col("a") === col("b"), col("c")).otherwise(0L)).as("agree"))
    val ra = cells.groupBy(col("g"), col("a").as("v")).agg(sum(col("c")).as("m"))
    val rb = cells.groupBy(col("g"), col("b").as("v")).agg(sum(col("c")).as("m"))
    // pooled marginal n_v = value count across BOTH raters (union-all then
    // re-agg: bounded frames — at most one row per (group, label, rater))
    val pooled = ra.unionByName(rb)
      .groupBy(col("g"), col("v")).agg(sum(col("m")).as("nv"))
      .groupBy(col("g"))
      .agg(sum(col("nv").cast("decimal(38,0)") * col("nv")).as("sum_nv2"))
    totals.join(broadcast(pooled), Seq("g"))
      .withColumn("de", col("n_units").cast("decimal(38,0)") * col("n_units")
        * lit(4) - col("sum_nv2"))
      .filter(col("de") > lit(0))
      // gate-schema convention: output columns are BIGINT/STRING/DOUBLE/
      // DATE/TIMESTAMP only — decimal-typed outputs trip the driver's
      // hash canonicalization even when values are exact (round-13
      // lesson). Arithmetic stays DECIMAL(38,0) internally; the display
      // cast to BIGINT is overflow-guarded (de = 4n² − Σnv² needs
      // n_units < ~1.5e9 per group; DuckDB's HUGEINT→BIGINT cast raises
      // on overflow, so both engines fail loudly rather than drift).
      .select(col("g"), col("n_units"), col("agree"),
        when(col("de") <= lit(Long.MaxValue).cast("decimal(38,0)"),
          col("de").cast("bigint"))
          .otherwise(raise_error(lit(
            "krippendorffAlpha: de overflows BIGINT — group too large " +
            "for the micro-unit display contract")).cast("bigint"))
          .as("de"),
        expr("""CAST(((de - (CAST(n_units AS DECIMAL(38,0)) * 2 - 1)
               |         * (n_units - agree) * 2) * 1000000)
               |  div de AS BIGINT)""".stripMargin).as("alpha_micro"))
  }
}
