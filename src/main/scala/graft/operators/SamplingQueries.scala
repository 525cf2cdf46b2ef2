package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.sampling.Sampling

/** Corpus-curation gate queries (training-data pipeline): deterministic hash
  * sampling, stratified sampling, bounded per-key sampling, and
  * concat-and-chunk sequence packing — all content-addressed (md5 draws),
  * so DuckDB reproduces every kept row exactly.
  */
object SamplingQueries {

  private def thr(f: Double): String = Sampling.fractionThreshold(f)

  val all: Seq[Q] = Seq(

    // ---- deterministic Bernoulli sample (10%): per-row filter, no shuffle
    Q("q39_sample_hash",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.hashSample(t.documents, "doc_id", 0.1, "s1")
          .select(col("doc_id"), col("lang"), col("source"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang, source FROM documents
              |WHERE substr(md5('s1:' || CAST(doc_id AS VARCHAR)), 1, 8) < '${thr(0.1)}'
              |ORDER BY doc_id""".stripMargin)),

    // ---- stratified sample: downsample dominant strata, keep the tail
    Q("q40_stratified_sample",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.stratifiedSample(t.documents, "doc_id", "lang",
            Map("en" -> 0.05, "de" -> 0.5), defaultFraction = 0.25, salt = "s2")
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id, lang FROM documents
              |WHERE substr(md5('s2:' || CAST(doc_id AS VARCHAR)), 1, 8) <
              |  CASE WHEN lang = 'en' THEN '${thr(0.05)}'
              |       WHEN lang = 'de' THEN '${thr(0.5)}'
              |       ELSE '${thr(0.25)}' END
              |ORDER BY doc_id""".stripMargin)),

    // ---- bounded per-key sample: ≤20 docs per language, exchanged via the
    // bounded top-k aggregate (partial per partition — no per-key sort)
    Q("q42_per_key_sample",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.perKeySample(t.documents, "lang", "doc_id", 20, "s3")
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""SELECT lang, doc_id FROM (
             |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
             |    ORDER BY substr(md5('s3:' || CAST(doc_id AS VARCHAR)), 1, 8),
             |      CAST(doc_id AS VARCHAR)) AS rn
             |  FROM documents)
             |WHERE rn <= 20
             |ORDER BY lang, doc_id""".stripMargin)),

    // ---- concat-and-chunk sequence packing into 512-token chunks,
    // parallel per 256 md5 buckets (no global sort at scale)
    Q("q41_pack_chunks",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.packChunks(t.documents, "doc_id",
            size(graft.text.TextFunctions.tokens(col("text"))), capacity = 512)
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, bucket, n_tokens,
             |  CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS chunk_seq
             |FROM (
             |  SELECT doc_id, bucket, n_tokens,
             |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
             |  FROM (
             |    SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket,
             |      CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
             |    FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // ---- token-budget mixture ("data mixing"): per-language Bernoulli
    // rates min(1, target/actual) derived from one aggregate; fr has no
    // target and is kept whole
    Q("q63_mixture_sample",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.mixtureSample(t.documents, "doc_id",
            size(graft.text.TextFunctions.tokens(col("text"))), "lang",
            Map("en" -> 2000L, "de" -> 2000L, "es" -> 500L, "zh" -> 500L),
            salt = "mix")
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT lang,
             |    CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS DOUBLE) AS toks
             |  FROM documents GROUP BY lang),
             |tgt(lang, t) AS (VALUES ('en', 2000.0), ('de', 2000.0),
             |  ('es', 500.0), ('zh', 500.0)),
             |thr AS (
             |  SELECT c.lang,
             |    CASE WHEN tgt.t IS NULL OR tgt.t / c.toks >= 1.0 THEN 'g'
             |      ELSE printf('%08x',
             |        CAST(trunc(least(1.0, tgt.t / c.toks) * 4294967296.0) AS BIGINT))
             |    END AS thr
             |  FROM c LEFT JOIN tgt USING (lang))
             |SELECT d.doc_id, d.lang
             |FROM documents d LEFT JOIN thr USING (lang)
             |WHERE substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
             |  < coalesce(thr.thr, 'g')
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- temperature-based mixture sampling (mT5-style alpha-flattened
    // source shares; alpha=0.5, budget 25k tokens → the largest stratum
    // subsamples, the smallest clamps at keep-everything)
    Q("q73_temperature_mixture",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.temperatureMixture(t.documents, "doc_id",
            size(graft.text.TextFunctions.tokens(col("text"))), "lang",
            alpha = 0.5, budgetTokens = 25000L, salt = "temp")
          .select(col("doc_id"), col("lang"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH c AS (
             |  SELECT lang,
             |    CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS toks
             |  FROM documents GROUP BY lang),
             |w AS (SELECT lang, toks,
             |    CAST(round(pow(CAST(toks AS DOUBLE), 0.5) * 1e6) AS BIGINT) AS wm
             |  FROM c WHERE lang IS NOT NULL AND toks > 0),
             |sw AS (SELECT CAST(sum(wm) AS BIGINT) AS s FROM w),
             |thr AS (SELECT lang,
             |    CASE WHEN rate >= 1.0 THEN 'g'
             |      ELSE printf('%08x', CAST(trunc(rate * 4294967296.0) AS BIGINT))
             |    END AS thr
             |  FROM (SELECT lang,
             |      least(1.0, CAST(wm AS DOUBLE) / CAST(s AS DOUBLE) * 25000.0
             |        / CAST(toks AS DOUBLE)) AS rate
             |    FROM w, sw))
             |SELECT d.doc_id, d.lang
             |FROM documents d LEFT JOIN thr USING (lang)
             |WHERE substr(md5('temp:' || CAST(d.doc_id AS VARCHAR)), 1, 8)
             |  < coalesce(thr.thr, 'g')
             |ORDER BY d.doc_id""".stripMargin)),

    // ---- Gumbel-top-k weighted sampling without replacement over DSIR
    // importance weights (the DSIR resampling step): exact ∝-weight sample
    // via integer selection keys + distributed TakeOrdered
    Q("q78_gumbel_topk",
      (s, d) => {
        val t = Tables(s, d)
        // persisted bucket frame: one corpus scan under both DSIR consumers
        val bucketed = graft.curation.Dsir
          .bucketRows(t.documents, "doc_id", "text",
            col("source").isin("src0", "src1", "src2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val weights = graft.curation.Dsir.importanceWeightsBuckets(
          bucketed, "doc_id", "bucket", "is_target", nBuckets = 256.0)
        Sampling.gumbelTopK(weights, "doc_id", col("weight_micro"),
            k = 100, salt = "g1")
          .select(col("doc_id"), col("weight_micro"), col("key_micro"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${graft.curation.Dsir.oracleCtes("'src0','src1','src2'")},
             |keyed AS (SELECT doc_id, weight_micro,
             |    weight_micro + CAST(round(-ln(-ln(
             |      (CAST(list_sum(list_transform(range(1, 9), i ->
             |         CAST(strpos('0123456789abcdef', substr(
             |           md5('g1:' || CAST(doc_id AS VARCHAR)), CAST(i AS INT), 1)) - 1
             |           AS BIGINT) << CAST((8 - i) * 4 AS INT))) AS DOUBLE) + 0.5)
             |      / 4294967296.0)) * 1e6) AS BIGINT) AS key_micro
             |  FROM w),
             |sel AS (SELECT doc_id, weight_micro, key_micro FROM keyed
             |  ORDER BY key_micro DESC, doc_id LIMIT 100)
             |SELECT doc_id, weight_micro, key_micro FROM sel
             |ORDER BY doc_id""".stripMargin)),

    // ---- deterministic interleaved mixture order: per-language weights,
    // overflow-safe exact integer sort keys, one per-stratum window
    Q("q89_mixture_order",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.mixtureOrder(t.documents, "doc_id", "lang",
            Map("en" -> 400000L, "de" -> 250000L, "es" -> 150000L,
              "zh" -> 150000L),
            salt = "ord", defaultWeightPpm = 50000L)
          .select(col("doc_id"), col("lang"), col("rn"), col("sort_key"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id, lang, rn,
             |  (rn // w) * 1000000000 + ((rn % w) * 1000000000) // w AS sort_key
             |FROM (
             |  SELECT doc_id, lang,
             |    CAST(row_number() OVER (PARTITION BY lang
             |      ORDER BY substr(md5('ord:' || CAST(doc_id AS VARCHAR)), 1, 8),
             |        CAST(doc_id AS VARCHAR)) AS BIGINT) AS rn,
             |    CAST(CASE lang WHEN 'en' THEN 400000 WHEN 'de' THEN 250000
             |      WHEN 'es' THEN 150000 WHEN 'zh' THEN 150000
             |      ELSE 50000 END AS BIGINT) AS w
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // ---- repeat-factor (multi-epoch) upsampling: 2.4 epochs of src0,
    // 0.5 of src1, 1.0 elsewhere — fractional epochs via the
    // content-addressed draw, per-row explode, no shuffle
    Q("q102_repeat_upsample",
      (s, d) => {
        val t = Tables(s, d)
        Sampling.repeatUpsample(t.documents, "doc_id", "source",
            Map("src0" -> 2400L, "src1" -> 500L), defaultMilli = 1000L,
            salt = "up")
          .select(col("doc_id"), col("source"), col("copy_idx"))
          .orderBy(col("doc_id"), col("copy_idx"))
      },
      Some(s"""SELECT doc_id, source, unnest(range(1, nc + 1)) AS copy_idx
             |FROM (
             |  SELECT doc_id, source,
             |    (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END)
             |    + (CASE WHEN substr(md5('up:' || CAST(doc_id AS VARCHAR)), 1, 8)
             |        < (CASE source WHEN 'src0' THEN '${thr(0.4)}'
             |           WHEN 'src1' THEN '${thr(0.5)}' ELSE '${thr(0.0)}' END)
             |       THEN 1 ELSE 0 END) AS nc
             |  FROM documents) _t
             |WHERE nc > 0
             |ORDER BY doc_id, copy_idx""".stripMargin)),

    // ---- sample-based quantile estimation audit: exact per-group p50/p90
    // (distributed Quantiles core) vs the same quantiles computed over a
    // content-addressed 10% hash sample — the evidence for when a sampled
    // percentile dashboard is safe and how far it drifts
    Q("q147_sample_quantile_audit",
      (s, d) => {
        val t = Tables(s, d)
        val base = t.lineitem.select(col("l_returnflag").as("g"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"))
        val qs = Seq(500000L, 900000L)
        val exact = Quantiles.exactQuantiles(base, "g", "cents", qs)
          .select(col("g"), col("q_ppm"), col("n"),
            col("value").as("exact_cents"))
        val samp = Quantiles.exactQuantiles(
            Sampling.hashSample(base, "rid", 0.1, "sq"), "g", "cents", qs)
          .select(col("g"), col("q_ppm"), col("n").as("n_sample"),
            col("value").as("sample_cents"))
        exact.join(samp, Seq("g", "q_ppm"))
          .select(col("g"), col("q_ppm"), col("n"), col("n_sample"),
            col("exact_cents"), col("sample_cents"),
            (col("sample_cents") - col("exact_cents")).as("err_cents"))
          .orderBy(col("g"), col("q_ppm"))
      },
      Some(s"""WITH v AS (SELECT l_returnflag AS g,
              |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
              |    l_orderkey * 10 + l_linenumber AS rid FROM lineitem),
              |q AS (SELECT CAST(unnest([500000, 900000]) AS BIGINT) AS q_ppm),
              |r AS (SELECT g, v,
              |    CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rn,
              |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n FROM v),
              |ex AS (SELECT g, q_ppm, n,
              |    min(CASE WHEN rn >= (q_ppm * n + 999999) // 1000000 THEN v END) AS exact_cents
              |  FROM r, q GROUP BY g, q_ppm, n),
              |sv AS (SELECT g, v FROM v
              |  WHERE substr(md5('sq:' || CAST(rid AS VARCHAR)), 1, 8) < '${thr(0.1)}'),
              |sr AS (SELECT g, v,
              |    CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT) AS rn,
              |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n FROM sv),
              |sa AS (SELECT g, q_ppm, n AS n_sample,
              |    min(CASE WHEN rn >= (q_ppm * n + 999999) // 1000000 THEN v END) AS sample_cents
              |  FROM sr, q GROUP BY g, q_ppm, n)
              |SELECT ex.g, ex.q_ppm, ex.n, sa.n_sample, ex.exact_cents,
              |  sa.sample_cents, sa.sample_cents - ex.exact_cents AS err_cents
              |FROM ex JOIN sa ON ex.g = sa.g AND ex.q_ppm = sa.q_ppm
              |ORDER BY ex.g, ex.q_ppm""".stripMargin))
  )
}
