package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.BoundedTopKAgg

/** Deterministic corpus-curation operators for training-data pipelines:
  * hash sampling, stratified sampling, bounded per-key sampling, and
  * concat-and-chunk sequence packing.
  *
  * All sampling here is content-addressed (md5 over a salted id), never
  * `rand()`: the same row set yields the same sample on every run, engine,
  * and partitioning — reproducible pipelines and SQL-oracle-checkable
  * results. Every operator is a per-row filter or a bounded aggregate, so
  * nothing shuffles more than the sample itself at 100 TB.
  */
object Sampling {

  /** md5-prefix of a salted id — the uniform [0,1) draw behind all sampling
    * here, as an 8-hex-digit string compared lexicographically
    */
  def hashDraw(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + ":"), id.cast("string"))), 1, 8)

  /** the threshold under which a draw passes for `fraction`: an 8-hex-digit
    * string for fractional rates; `fraction >= 1.0` short-circuits to "g"
    * (sorts after every hex digit, so every row passes — a strict `<` against
    * "ffffffff" would drop the ~2^-32 of rows whose draw is exactly that),
    * and `fraction <= 0.0` to "00000000" (nothing passes under strict `<`)
    */
  def fractionThreshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0,
      s"fraction must be in [0,1], got $fraction")
    if (fraction >= 1.0) "g"
    else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  /** Bernoulli-style deterministic sample: keeps a row iff
    * md5(salt:id) < threshold(fraction). Pure per-row filter — pushes to the
    * scan, no shuffle, and the kept set is stable under any re-partitioning
    * or re-run (unlike `TABLESAMPLE`/`rand()`).
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      salt: String): DataFrame =
    df.filter(hashDraw(col(idCol), salt) < lit(fractionThreshold(fraction)))

  /** Content-addressed k-fold assignment — leakage-safe cross-validation
    * splits: the fold is a pure function of `keyCol` (pass a NORMALIZED
    * content hash so every member of a duplicate group lands in the SAME
    * fold — the split that makes held-out folds actually held out), cut at
    * the same [[fractionThreshold]] boundaries [[hashSample]] uses, so
    * folds are equal-probability, deterministic under re-partitioning and
    * re-runs, and stable as the corpus grows. One per-row projection —
    * no shuffle, no state.
    */
  def cvFoldAssign(df: DataFrame, keyCol: Column, k: Int,
      salt: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val bounds = (1 until k)
      .map(f => fractionThreshold(f.toDouble / k))
    df.withColumn("_graft_draw", hashDraw(keyCol, salt))
      .withColumn("fold", bounds.foldLeft(lit(0)) { (acc, t) =>
        acc + when(col("_graft_draw") >= lit(t), 1).otherwise(0)
      }.cast("int"))
      .drop("_graft_draw")
  }

  /** Stratified deterministic sample: per-stratum fractions (e.g. downsample
    * the dominant language, keep the tail), same content-addressed draw.
    * Strata absent from `fractions` use `defaultFraction`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double,
      salt: String): DataFrame = {
    val threshold = fractions.foldLeft(
        when(lit(false), lit(""))) { case (acc, (stratum, f)) =>
      acc.when(col(stratumCol) === stratum, lit(fractionThreshold(f)))
    }.otherwise(lit(fractionThreshold(defaultFraction)))
    df.filter(hashDraw(col(idCol), salt) < threshold)
  }

  /** At most `n` rows per key, picked by the content-addressed draw (an
    * unbiased fixed-size subsample per key — the batch analogue of reservoir
    * sampling). Ranked with the bounded top-k aggregate: each upstream
    * partition contributes ≤ n rows per key to the exchange, so a 100 TB
    * skewed key costs O(partitions × n), never a single-partition sort the
    * way `row_number() OVER (PARTITION BY key)` would.
    *
    * Ids ride through the aggregate as strings (so UUID/string ids from
    * record tables round-trip losslessly) and are cast back to the input
    * column's type on output; draw ties break on the id's STRING ordering.
    */
  def perKeySample(df: DataFrame, keyCol: String, idCol: String, n: Int,
      salt: String): DataFrame = {
    val idType = df.schema(idCol).dataType
    val tk = udaf(new BoundedTopKAgg[Drawn](n, Drawn.ordering))
    df.select(col(keyCol).as("key"),
        hashDraw(col(idCol), salt).as("draw"), col(idCol).cast("string").as("id"))
      .groupBy("key")
      .agg(tk(col("draw"), col("id")).as("top"))
      .select(col("key"), explode(col("top")).as("s"))
      .select(col("key").as(keyCol), col("s.id").cast(idType).as(idCol))
  }

  /** Token-budget mixture sampling — the "data mixing" step of pretraining
    * prep: given a target token count per stratum (source, language, …),
    * derive each stratum's Bernoulli rate `min(1, target / actual)` from
    * one aggregation pass and apply the deterministic stratified sample.
    * Strata without a target keep every row. The per-stratum counts come
    * to the driver (strata are sources/languages — bounded by construction,
    * not data-scaled); `maxStrata` makes that contract crash-proof: past it
    * the call fails fast with guidance instead of silently collecting an
    * unbounded aggregate. Everything else is the per-row pushed-down filter
    * of [[stratifiedSample]].
    */
  def mixtureSample(df: DataFrame, idCol: String, tokenCountCol: Column,
      stratumCol: String, targetTokens: Map[String, Long],
      salt: String, maxStrata: Int = 100000): DataFrame = {
    val counts = stratumTokenCounts(df, tokenCountCol, stratumCol,
      maxStrata, "mixtureSample")
    val fractions = targetTokens.flatMap { case (s, tgt) =>
      counts.get(s).filter(_ > 0)
        .map(c => s -> math.min(1.0, tgt.toDouble / c.toDouble))
    }
    stratifiedSample(df, idCol, stratumCol, fractions,
      defaultFraction = 1.0, salt)
  }

  /** Deterministic interleaved mixture ORDER — the scheduling half of data
    * mixing: given per-stratum weights (ppm), emit a sort key under which
    * the strata interleave proportionally (a weight-w stratum contributes
    * one row every 1e9/w key units), so a training loader reading the
    * corpus in key order sees the mixture ratio in every prefix, not
    * source-by-source. Row order within a stratum is a deterministic
    * content-addressed shuffle (the md5 draw every sampler here uses).
    *
    * `sort_key = floor(rn · 1e9 / w)` computed as
    * `(rn div w)·1e9 + ((rn mod w)·1e9) div w` — exact integer arithmetic
    * with no overflow for any long `rn` (the naive `rn·1e9` overflows past
    * 9.2e9 rows per stratum; the split form never multiplies two large
    * numbers). Scale shape: ONE per-stratum window (skew bounded by the
    * largest stratum); no global sort — the caller's writer sorts by the
    * key, which is what a sharded training-data writer does anyway.
    */
  def mixtureOrder(df: DataFrame, idCol: String, stratumCol: String,
      weightsPpm: Map[String, Long], salt: String,
      defaultWeightPpm: Long = 1000000L): DataFrame = {
    require(weightsPpm.values.forall(w => w > 0 && w <= 1000000000L),
      "weights must be in (0, 1e9] ppm")
    require(defaultWeightPpm > 0 && defaultWeightPpm <= 1000000000L,
      "defaultWeightPpm must be in (0, 1e9]")
    val draw = substring(
      md5(concat(lit(s"$salt:"), col(idCol).cast("string"))), 1, 8)
    val w = weightsPpm.foldLeft(lit(defaultWeightPpm)) { case (acc, (s, v)) =>
      when(col(stratumCol) === s, lit(v)).otherwise(acc)
    }
    df.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col(stratumCol))
          .orderBy(draw, col(idCol).cast("string"))).cast("long"))
      .withColumn("_graft_w", w)
      .withColumn("sort_key", expr(
        "(rn div _graft_w) * 1000000000 + ((rn % _graft_w) * 1000000000) div _graft_w"))
      .drop("_graft_w")
  }

  /** Temperature-based mixture sampling — the mT5/XLM-R multilingual
    * mixing rule generalized to any stratum column: stratum weights are
    * token shares flattened by `alpha` (w_s ∝ toks_s^alpha; alpha = 1
    * keeps natural proportions, alpha → 0 approaches uniform), and each
    * stratum keeps `min(1, share_s · budget / toks_s)` of its rows via the
    * deterministic hash sample. Rates derive from ONE aggregation pass
    * (same driver-bounded contract as [[mixtureSample]]); the sampling
    * itself is a pure pushed-down per-row filter.
    *
    * Determinism: `pow` is the one non-correctly-rounded step (libm-
    * dependent), so weights quantize to integer micro-units before the
    * exactly-rounded IEEE divide/multiply chain — the q62 micro-nat trick
    * applied to mixing weights. Upsampling past rate 1.0 is clamped (this
    * operator subsamples; repeat-epoch upsampling is a training-loader
    * concern).
    */
  def temperatureMixture(df: DataFrame, idCol: String, tokenCountCol: Column,
      stratumCol: String, alpha: Double, budgetTokens: Long,
      salt: String, maxStrata: Int = 100000): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val counts = stratumTokenCounts(df, tokenCountCol, stratumCol,
      maxStrata, "temperatureMixture")
    // BigInt: at the operator's own envelope (alpha near 1 over 100 TB
    // corpora) a per-stratum micro-weight can exceed Long range and the
    // sum certainly can; BigInt keeps the sum exact and order-independent,
    // and BigInt→Double is correctly rounded (identical to the oracle's
    // integer→DOUBLE cast at gate scale, where values fit 2^53)
    val wMicro = counts.collect { case (s, c) if c > 0 =>
      s -> BigDecimal(math.pow(c.toDouble, alpha) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toBigInt
    }
    val sumW = wMicro.values.sum
    val fractions = wMicro.map { case (s, wm) =>
      s -> math.min(1.0,
        wm.toDouble / sumW.toDouble * budgetTokens.toDouble /
          counts(s).toDouble)
    }
    stratifiedSample(df, idCol, stratumCol, fractions,
      defaultFraction = 1.0, salt)
  }

  /** Leakage-safe train/eval split: assign every member of a near-dup
    * COMPONENT (from `Clusterize.connectedComponents`, `Similarity
    * .semDedup`, or any (id, group) frame) to the same side, so a
    * near-duplicate of a training document can never land in the eval
    * slice — the split-level complement of decontamination (q44 checks
    * against a FIXED benchmark; this keeps a corpus's own split honest).
    * The side comes from the deterministic hash draw of the GROUP key, so
    * the assignment is reproducible and a group's side never changes as
    * members are added. Pure per-row projection — no shuffle beyond
    * whatever produced the groups.
    */
  def groupSplit(df: DataFrame, groupCol: String, testFraction: Double,
      salt: String): DataFrame =
    df.withColumn("split",
      when(hashDraw(col(groupCol), salt) <
          lit(fractionThreshold(testFraction)), lit("test"))
        .otherwise(lit("train")))

  /** one bounded aggregation pass → per-stratum token totals on the driver.
    * Null-safe and type-agnostic: a stratum of all-null counts sums to
    * null (no rate derivable — dropped, so its rows pass whole via the
    * default fraction), and non-string stratum columns key by their string
    * form (stratifiedSample compares with ===, which coerces). Strata are
    * sources/languages — bounded by construction, not data-scaled;
    * `maxStrata` makes that contract crash-proof: past it the call fails
    * fast with guidance instead of silently collecting an unbounded
    * aggregate.
    */
  private def stratumTokenCounts(df: DataFrame, tokenCountCol: Column,
      stratumCol: String, maxStrata: Int, op: String): Map[String, Long] = {
    require(maxStrata > 0, s"maxStrata must be positive, got $maxStrata")
    val rows = df.groupBy(col(stratumCol))
      .agg(sum(tokenCountCol.cast("long")).as("_toks"))
      .limit(maxStrata + 1) // bounds the collect even when the guard fires
      .collect()
    if (rows.length > maxStrata) throw new IllegalArgumentException(
      s"$op: more than $maxStrata distinct values in " +
        s"'$stratumCol' — per-stratum rates are derived on the driver, so " +
        "the stratum column must be low-cardinality (sources, languages, " +
        "snapshots); raise maxStrata deliberately or derive rates with a " +
        "distributed join for data-scaled strata")
    rows.flatMap { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) None
      else Some(r.get(0).toString -> r.getLong(1))
    }.toMap
  }

  /** Concat-and-chunk sequence packing (the standard LLM-pretraining
    * batching shape): documents are laid out in a deterministic order and
    * cut into chunks of `capacity` tokens; a document's chunk is
    * floor(tokens-before-it / capacity). Packing runs independently inside
    * each of `nBuckets` md5 buckets, so at scale the windows parallelize per
    * bucket and no global sort exists; chunk identity is (bucket,
    * chunk_seq). Size `nBuckets` so one bucket's rows sort comfortably in
    * one task (corpus rows / nBuckets ≲ tens of millions of narrow rows);
    * the default 256 is the canonical two-hex-char md5 prefix.
    */
  def packChunks(df: DataFrame, idCol: String, tokenCountCol: Column,
      capacity: Int, nBuckets: Int = 256): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val draw = md5(col(idCol).cast("string"))
    // powers of 16 keep the bucket as a bare md5 hex prefix (the default 256
    // = width 2, byte-compatible with external reproductions); any other
    // count takes the md5's leading 60 bits mod nBuckets
    val hexWidth = Iterator.iterate(16L)(_ * 16).zipWithIndex.take(8)
      .collectFirst { case (v, i) if v == nBuckets => i + 1 }
    val bucket = hexWidth match {
      case Some(w) => substring(draw, 1, w)
      case None => pmod(conv(substring(draw, 1, 15), 16, 10).cast("long"),
        lit(nBuckets.toLong)).cast("string")
    }
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), bucket.as("bucket"),
        tokenCountCol.cast("long").as("n_tokens"))
      .withColumn("cum_after", sum(col("n_tokens")).over(w))
      .withColumn("chunk_seq",
        floor((col("cum_after") - col("n_tokens")) / capacity).cast("long"))
      .drop("cum_after")
  }

  /** Gumbel-top-k weighted sampling WITHOUT replacement (Vieira 2014; the
    * resampling step of DSIR): drawing the k rows with the largest
    * `log w_i + G_i` — G_i a standard Gumbel — is an exact sample of k
    * distinct rows with probabilities ∝ w_i. One pass, no sequential state:
    * the classic weighted-reservoir alternative (A-ES) needs a driver-side
    * heap; this is a per-row key + a distributed top-k (TakeOrdered — each
    * partition contributes ≤ k candidates, no global sort).
    *
    * Determinism: the Gumbel is content-addressed — u from the row id's
    * salted md5 (8 hex chars → (u32 + 0.5) / 2^32, exact dyadic double) —
    * and quantized to integer micro-nats, so the selection key
    * `log-weight-micro + gumbel-micro` is exact integer arithmetic, stable
    * under re-partitioning, re-runs, and engines.
    *
    * @param logWeightMicro log-weight column in integer micro-nats (e.g.
    *                       [[graft.curation.Dsir]] `weight_micro`)
    */
  def gumbelTopK(df: DataFrame, idCol: String, logWeightMicro: Column,
      k: Int, salt: String): DataFrame = {
    val u32 = conv(hashDraw(col(idCol), salt), 16, 10).cast("double")
    val u = (u32 + 0.5) / 4294967296.0
    val key = logWeightMicro.cast("long") +
      round(-log(-log(u)) * 1e6).cast("long")
    df.withColumn("key_micro", key)
      .orderBy(col("key_micro").desc, col(idCol))
      .limit(k)
  }

  /** Repeat-factor (multi-epoch) upsampling: materialize each stratum at a
    * FRACTIONAL epoch count — the standard move when a mixture solve asks
    * for e.g. 2.4 epochs of a rare high-quality source against 0.5 of a
    * dominant one (Llama/GPT-style data recipes). Every row emits
    * floor(r) copies, plus one more iff its content-addressed draw falls
    * under frac(r) — so the realized rate converges to r per stratum while
    * staying deterministic per ROW (re-runs, re-partitionings, and engines
    * agree on exactly which rows carry the extra epoch).
    *
    * Repeat factors are integer MILLI-epochs (2400 = 2.4 epochs), keeping
    * the fractional part an exact [[fractionThreshold]] comparison.
    * `copy_idx` (1-based) distinguishes the epochs downstream (e.g. for
    * epoch-aware shuffling or curriculum interleaving).
    *
    * Scale shape: pure per-row work — a literal CASE picks the stratum's
    * factor, the draw is one md5, and the explode emits at most
    * ceil(max r) rows per input row; no shuffle, no driver state.
    */
  def repeatUpsample(df: DataFrame, idCol: String, stratumCol: String,
      repeatsMilli: Map[String, Long], defaultMilli: Long,
      salt: String): DataFrame = {
    require((repeatsMilli.values ++ Seq(defaultMilli)).forall(_ >= 0L),
      "repeat factors must be >= 0 milli-epochs")
    def wholeOf(m: Long) = lit(m / 1000L)
    def thrOf(m: Long) = lit(fractionThreshold((m % 1000L) / 1000.0))
    val whole = repeatsMilli.foldLeft(when(lit(false), lit(0L))) {
      case (acc, (stratum, m)) => acc.when(col(stratumCol) === stratum, wholeOf(m))
    }.otherwise(wholeOf(defaultMilli))
    val thr = repeatsMilli.foldLeft(when(lit(false), lit(""))) {
      case (acc, (stratum, m)) => acc.when(col(stratumCol) === stratum, thrOf(m))
    }.otherwise(thrOf(defaultMilli))
    df.withColumn("_graft_nc",
        whole + when(hashDraw(col(idCol), salt) < thr, 1L).otherwise(0L))
      .filter(col("_graft_nc") > 0L)
      .withColumn("copy_idx",
        explode(sequence(lit(1L), col("_graft_nc"))))
      .drop("_graft_nc")
  }

  /** Downsample-only mixture rebalance plan: the per-source sampling rates
    * that reshape the corpus's TOKEN distribution to a uniform target
    * without upsampling anything. The achievable total is set by the
    * bottleneck source (the one already below its target share); every
    * other source downsamples to match — the report run before a q63-style
    * budgeted sample to decide whether the target mixture is even reachable
    * and at what corpus-size cost.
    *
    * Output per source: (groupCol, n_tokens, cur_ppm, target_ppm, rate_ppm,
    * kept_tokens) — exact integer arithmetic throughout: target shares are
    * ⌊10⁶/n⌋, the achievable total T' = min_s ⌊cur_s·10⁶/target_s⌋, kept_s =
    * ⌊target_s·T'/10⁶⌋, rate_s = ⌊kept_s·10⁶/cur_s⌋.
    *
    * Scale shape: ONE corpus scan feeds a per-source partial-agg'd token
    * count; the source count and the bottleneck minimum are 1-row
    * broadcasts. Long arithmetic holds to ~10¹² corpus tokens (documented;
    * switch the two products to decimal beyond).
    */
  def rebalanceRates(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val counts = docs
      .select(col(groupCol).as("_graft_g"),
        graft.text.TextFunctions.tokenCount(col(textCol)).cast("long")
          .as("_graft_nt"))
      .groupBy(col("_graft_g"))
      .agg(sum(col("_graft_nt")).as("n_tokens"))
    val tot = counts.agg(sum(col("n_tokens")).as("_graft_tot"),
      count(lit(1)).as("_graft_ns"))
    val withTarget = counts.crossJoin(broadcast(tot))
      .withColumn("target_ppm", expr("1000000L div _graft_ns"))
      .withColumn("_graft_cap", expr("(n_tokens * 1000000L) div target_ppm"))
    val bottleneck = withTarget.agg(min(col("_graft_cap")).as("_graft_tp"))
    withTarget.crossJoin(broadcast(bottleneck))
      .select(col("_graft_g").as(groupCol), col("n_tokens"),
        expr("(n_tokens * 1000000L) div _graft_tot").as("cur_ppm"),
        col("target_ppm"),
        expr("((target_ppm * _graft_tp) div 1000000L)").as("kept_tokens"))
      .withColumn("rate_ppm", expr("(kept_tokens * 1000000L) div n_tokens"))
      .select(col(groupCol), col("n_tokens"), col("cur_ppm"),
        col("target_ppm"), col("rate_ppm"), col("kept_tokens"))
  }

  /** Deterministic Poisson-style bootstrap over a metric column — the
    * error-bar machinery for corpus statistics ("mean doc length is 298 ±
    * what?"), replacing true with-replacement resampling (which needs
    * global coordination) by the standard Poisson bootstrap: replica b
    * weights each row i.i.d. with a mean-1 integer count, here
    * Binomial(8, 1/8) derived CONTENT-ADDRESSED from the row id — the
    * count of hex digits in {0,1} among the first 8 of md5(salt:b:id),
    * the same md5-draw contract as every sampler in this file, so the
    * oracle reproduces it exactly.
    *
    * One corpus scan computes ALL `replicas` weighted partial sums (the
    * per-row replica expansion explodes to B rows per input row map-side
    * and partial-aggregates before the one exchange); output is B rows of
    * (replica, n_eff, mean_milli) whose spread IS the bootstrap
    * distribution of the mean — order statistics of it give the CI.
    */
  def bootstrapMeans(df: DataFrame, idCol: String, metric: Column,
      replicas: Int, salt: String): DataFrame = {
    require(replicas >= 1, s"replicas must be >= 1, got $replicas")
    df.select(col(idCol).cast("string").as("_graft_id"),
        metric.cast("long").as("_graft_m"))
      .withColumn("replica", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("_graft_w",
        length(regexp_replace(
          substring(md5(concat_ws(":", lit(salt), col("replica"), col("_graft_id"))), 1, 8),
          "[^01]", "")).cast("long"))
      .groupBy(col("replica"))
      .agg(sum(col("_graft_w")).as("n_eff"),
        sum(col("_graft_w") * col("_graft_m")).as("_graft_sum"))
      .filter(col("n_eff") > 0)
      .select(col("replica"), col("n_eff"),
        expr("(_graft_sum * 1000) div n_eff").as("mean_milli"))
  }

  /** Kish effective sample size of an integer weight column per group —
    * the standard "how much data is really left" number for any weighted
    * corpus (dedup soft-weights, DSIR importance weights, mixture rates):
    * `ESS/n = (Σw)² / (n·Σw²)` in exact ppm. Uniform weights → 10⁶;
    * weight mass concentrated on few rows → → 0. One partial-agg'd pass;
    * DECIMAL(38)/HUGEINT keeps (Σw)² exact at scale. Rows with w ≤ 0 are
    * rejected upstream by contract (quantize positive weights to integer
    * units first).
    */
  def effectiveSampleSize(df: DataFrame, groupCol: String,
      weight: Column): DataFrame = {
    df.select(col(groupCol).as("grp"), weight.cast("long").as("_w"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_rows"), sum(col("_w")).as("sum_w"),
        sum(expr("CAST(_w AS DECIMAL(38,0)) * _w")).as("_sw2"))
      .select(col("grp"), col("n_rows"), col("sum_w"),
        expr("""CAST((CAST(sum_w AS DECIMAL(38,0)) * sum_w * 1000000) div
               |  (CAST(n_rows AS DECIMAL(38,0)) * _sw2) AS BIGINT)"""
          .stripMargin).as("ess_ppm"))
  }
}

/** (draw, id) sample candidate: ordered by the hash draw, tie-broken by the
  * id's string form (any id type round-trips; cast back at the edge)
  */
final case class Drawn(draw: String, id: String)

object Drawn {
  val ordering: Ordering[Drawn] =
    Ordering.by((d: Drawn) => (d.draw, d.id))
}
