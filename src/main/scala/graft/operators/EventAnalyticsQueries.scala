package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables

/** Event-log product-analytics operators: ordered conversion funnels and
  * weekly cohort retention — the progress/engagement reports every
  * large-scale event pipeline ships alongside sessionization (q34/q61).
  * Both ride a single user-keyed partitioning; outputs are per-user or
  * per-(cohort, offset), vanishingly small next to the input log.
  */
object EventAnalyticsQueries {

  val all: Seq[Q] = Seq(

    // ---- strict-sequence funnel view → click → purchase: stage k's time
    // is the earliest qualifying event strictly after stage k-1's time.
    // One shuffle by user; every stage is a conditional window min on the
    // same partitioning (no per-stage scan of the log, no self-join).
    Q("q136_funnel",
      (s, d) => {
        val t = Tables(s, d)
        Funnel.funnelTimes(t.events, "user_id", "ts", "event_type",
            Seq("view", "click", "purchase"))
          .orderBy(col("user_id"))
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |       WHERE event_type = 'view' GROUP BY user_id),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |       JOIN s1 ON e.user_id = s1.user_id
             |       WHERE e.event_type = 'click' AND e.ts > s1.t1
             |       GROUP BY e.user_id),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |       JOIN s2 ON e.user_id = s2.user_id
             |       WHERE e.event_type = 'purchase' AND e.ts > s2.t2
             |       GROUP BY e.user_id)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |            WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INTEGER) AS stage,
             |  epoch_us(t2) - epoch_us(t1) AS us_to_stage2,
             |  epoch_us(t3) - epoch_us(t2) AS us_to_stage3
             |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
             |  LEFT JOIN s3 USING (user_id)
             |ORDER BY user_id""".stripMargin)),

    // ---- weekly cohort retention: cohort = ISO week of first event;
    // retained at offset k = any event in cohort_week + k weeks. Rates in
    // ppm of the cohort size (offset 0 row IS the cohort size).
    Q("q137_cohort_retention",
      (s, d) => {
        val t = Tables(s, d)
        Funnel.cohortRetention(t.events, "user_id", "ts")
          .orderBy(col("cohort_week"), col("offset_weeks"))
      },
      Some("""WITH wk AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
             |coh AS (SELECT user_id, min(wk) AS cohort_week FROM wk GROUP BY user_id),
             |act AS (SELECT DISTINCT c.cohort_week,
             |    (epoch_us(w.wk) - epoch_us(c.cohort_week)) // 604800000000 AS offset_weeks,
             |    w.user_id
             |  FROM wk w JOIN coh c USING (user_id)),
             |cnt AS (SELECT cohort_week, offset_weeks,
             |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |  FROM act GROUP BY cohort_week, offset_weeks),
             |sz AS (SELECT cohort_week, n_users AS n0 FROM cnt WHERE offset_weeks = 0)
             |SELECT c.cohort_week, c.offset_weeks, c.n_users,
             |  (c.n_users * 1000000) // sz.n0 AS retained_ppm
             |FROM cnt c JOIN sz USING (cohort_week)
             |ORDER BY cohort_week, offset_weeks""".stripMargin)),

    // ---- first-order Markov transition matrix over per-user event
    // sequences: one lag-window pass (q34's shape), types²-sized counts,
    // row-normalized to exact integer ppm
    Q("q140_transition_matrix",
      (s, d) => {
        val t = Tables(s, d)
        Funnel.transitionMatrix(t.events, "user_id", "ts", "event_id",
            "event_type")
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH seq AS (SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events),
             |c AS (SELECT prev AS from_type, event_type AS to_type,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM seq WHERE prev IS NOT NULL GROUP BY prev, event_type),
             |m AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
             |  FROM c GROUP BY from_type)
             |SELECT c.from_type, c.to_type, c.n, (c.n * 1000000) // m.tot AS p_ppm
             |FROM c JOIN m USING (from_type)
             |ORDER BY from_type, to_type""".stripMargin)),

    // ---- equi-depth (quantile-codebook) scalar quantization audit: per
    // dimension, exact quartile boundaries from the distributed Quantiles
    // core, 2-bit codes, integer-mean reconstruction, exact integer SSE
    // from (n, Σv, Σv²) in one partial-agg'd pass
    Q("q141_equidepth_codebook",
      (s, d) => {
        val t = Tables(s, d)
        graft.similarity.EmbeddingStats.equiDepthCodebookAudit(
            t.embeddings, "embedding")
          .orderBy(col("dim"), col("code"))
      },
      Some("""WITH v AS (SELECT vec_id, list_transform(embedding,
             |    x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)) AS xq
             |  FROM embeddings),
             |u AS (SELECT vec_id, unnest(list_transform(range(1, len(xq) + 1),
             |    i -> {'dim': i - 1, 'v': xq[i]})) AS s FROM v),
             |c AS (SELECT CAST(s.dim AS INT) AS dim, s.v AS v FROM u),
             |r AS (SELECT dim, v,
             |    CAST(row_number() OVER (PARTITION BY dim ORDER BY v) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY dim) AS BIGINT) AS n FROM c),
             |b AS (SELECT dim, q_ppm,
             |    min(CASE WHEN rn >= (q_ppm * n + 999999) // 1000000 THEN v END) AS value
             |  FROM r, (SELECT CAST(unnest([250000, 500000, 750000]) AS BIGINT) AS q_ppm) q
             |  GROUP BY dim, q_ppm, n),
             |bp AS (SELECT dim,
             |    max(CASE WHEN q_ppm = 250000 THEN value END) AS b1,
             |    max(CASE WHEN q_ppm = 500000 THEN value END) AS b2,
             |    max(CASE WHEN q_ppm = 750000 THEN value END) AS b3
             |  FROM b GROUP BY dim),
             |coded AS (SELECT c.dim, c.v,
             |    1 + CASE WHEN c.v > b1 THEN 1 ELSE 0 END
             |      + CASE WHEN c.v > b2 THEN 1 ELSE 0 END
             |      + CASE WHEN c.v > b3 THEN 1 ELSE 0 END AS code
             |  FROM c JOIN bp USING (dim)),
             |g AS (SELECT dim, code, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(v) AS BIGINT) AS sv, CAST(sum(v * v) AS BIGINT) AS svv
             |  FROM coded GROUP BY dim, code),
             |f AS (SELECT dim, CAST(code AS INT) AS code, n, sv // n AS recon_micro,
             |    sv, svv FROM g)
             |SELECT dim, code, n, recon_micro,
             |  svv - 2 * recon_micro * sv + n * recon_micro * recon_micro AS sse
             |FROM f ORDER BY dim, code""".stripMargin)),

    // ---- Wald SPRT over daily event-type volume: two explicit Poisson
    // hypotheses (baseline-week rate vs 1.5x) with controlled error
    // rates, stopping at the first Wald-boundary crossing — the
    // sequential complement of q153's CUSUM. ln(1.5) and the boundaries
    // are ONE shared double literal in both engines; the cumulative walk
    // is exact integer micro-nats.
    Q("q220_sprt_drift",
      (s, d) => {
        val t = Tables(s, d)
        ChangePoint.sprtDaily(t.events, "ts", "event_type")
          .orderBy(col("event_type"))
      },
      Some {
        val lnRatio = math.log(1.5)
        val aMicro = math.round(math.log(19.0) * 1e6)
        s"""WITH days AS (
           |  SELECT CAST(unnest(generate_series(
           |      (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events),
           |      (SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events),
           |      INTERVAL 1 DAY)) AS DATE) AS day),
           |types AS (SELECT DISTINCT event_type FROM events),
           |dcnt AS (SELECT event_type,
           |    CAST(date_trunc('day', ts) AS DATE) AS day,
           |    CAST(count(*) AS BIGINT) AS c
           |  FROM events GROUP BY 1, 2),
           |grid AS (SELECT t.event_type, d.day, coalesce(c.c, 0) AS c,
           |    row_number() OVER (PARTITION BY t.event_type
           |      ORDER BY d.day) AS rn
           |  FROM types t CROSS JOIN days d
           |  LEFT JOIN dcnt c ON c.event_type = t.event_type
           |    AND c.day = d.day),
           |l0 AS (SELECT event_type, CAST(sum(c) AS DOUBLE) / 7.0 AS lam0
           |  FROM grid WHERE rn <= 7 GROUP BY event_type),
           |tst AS (SELECT g.event_type, g.day, lam0,
           |    CAST(round((CAST(g.c AS DOUBLE) * $lnRatio - 0.5 * lam0)
           |      * 1000000.0) AS BIGINT) AS llr_micro
           |  FROM grid g JOIN l0 USING (event_type) WHERE rn > 7),
           |cm AS (SELECT event_type, day, lam0,
           |    CAST(sum(llr_micro) OVER (PARTITION BY event_type
           |      ORDER BY day) AS BIGINT) AS cum
           |  FROM tst),
           |dc AS (SELECT event_type, day, lam0, cum,
           |    CASE WHEN cum >= $aMicro THEN 'reject_h0'
           |         WHEN cum <= -$aMicro THEN 'accept_h0' END AS dec
           |  FROM cm)
           |SELECT event_type,
           |  CAST(max(round(lam0 * 1000000.0)) AS BIGINT) AS lam0_micro,
           |  CAST(count(*) AS BIGINT) AS n_test_days,
           |  coalesce(arg_min(dec, day) FILTER (WHERE dec IS NOT NULL),
           |    'continue') AS decision,
           |  min(day) FILTER (WHERE dec IS NOT NULL) AS decision_day,
           |  arg_max(cum, day) AS final_llr_micro
           |FROM dc GROUP BY event_type ORDER BY event_type""".stripMargin
      })
  )
}
