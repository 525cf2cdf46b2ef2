package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.curation.{CorpusStats, Stylometry}
import graft.similarity.{EmbeddingStats, MarginKnn}
import graft.text.{Blocklist, TextFunctions}

/** Round-11 screening / monitoring operators: dictionary blocklist
  * screening, margin-based neighbor mining, CUSUM volume drift, stylometric
  * source distance, silhouette clustering audit, embedding-space
  * decontamination, inter-arrival burstiness, and windowed co-occurrence
  * counts.
  *
  * Oracle parity: the repo-wide integer conventions — exact counts,
  * milli/micro quantization at the scan, integral `div` (both engines
  * truncate toward zero), rank outputs where floats would otherwise
  * surface.
  */
object ScreeningQueries {

  private val ws = "[ \\t\\n\\r\\f]+"

  /** blocklist for the gate query (the operator takes any dictionary) */
  private val BlockPatterns =
    Seq("fast", "fast table", "able", "merge batch", "scan", "a")

  /** function words of the synthetic corpus for the stylometry gate */
  private val StyleWords =
    Seq("a", "the", "table", "value", "query", "fast", "key", "scan", "row", "part")

  def all: Seq[Q] = Seq(

    // ---- Aho–Corasick multi-pattern screen: one corpus pass regardless of
    // dictionary size; counts ALL (overlapping) occurrences per pattern
    Q("q151_blocklist_screen",
      (s, d) => {
        val t = Tables(s, d)
        Blocklist.screenCounts(t.documents, "doc_id", "text", BlockPatterns)
          .orderBy(col("doc_id"), col("pattern"))
      },
      Some(s"""WITH pats AS (SELECT unnest([${BlockPatterns.map(p => s"'$p'").mkString(", ")}]) AS pattern),
              |pos AS (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
              |  FROM documents)
              |SELECT doc_id, pattern, CAST(count(*) AS BIGINT) AS hits
              |FROM pos JOIN pats
              |  ON substr(pos.text, CAST(pos.i AS INTEGER), len(pats.pattern)) = pats.pattern
              |GROUP BY doc_id, pattern
              |ORDER BY doc_id, pattern""".stripMargin)),

    // ---- LASER-style distance-margin mining: probe side bounded +
    // broadcast, exact integer dots over unit-milli vectors, margin is a
    // pure integer subtraction (2k-scaled), rank output.
    // CONTRACT (MarginKnn scaladoc): probe and corpus are DISJOINT frames
    // — no id-inequality predicate is applied, so a row passed on both
    // sides scores itself at dot = 1e6. This query's <8 / >=8 split keeps
    // them disjoint by construction; external callers must pre-filter.
    Q("q152_margin_knn",
      (s, d) => {
        val t = Tables(s, d)
        MarginKnn.marginTopK(
            t.embeddings.filter(col("vec_id") < 8),
            t.embeddings.filter(col("vec_id") >= 8),
            "vec_id", "embedding", k = 4, topN = 3)
          .orderBy(col("probe_id"), col("rank"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
             |n AS (SELECT vec_id, ve,
             |    sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM v),
             |u AS (SELECT vec_id,
             |    list_transform(ve, x -> CAST(round(x * 1000.0 / nrm) AS BIGINT)) AS uq
             |  FROM n WHERE nrm > 0),
             |p AS (SELECT vec_id AS probe_id, uq AS pq FROM u WHERE vec_id < 8),
             |c AS (SELECT vec_id AS cand_id, uq AS cq FROM u WHERE vec_id >= 8),
             |d AS (SELECT probe_id, cand_id,
             |    list_reduce(list_transform(range(1, len(pq) + 1),
             |      i -> pq[i] * cq[i]), (a,b) -> a+b) AS dot
             |  FROM p, c),
             |pn AS (SELECT probe_id, CAST(sum(dot) AS BIGINT) AS pnn FROM (
             |    SELECT probe_id, dot, row_number() OVER (PARTITION BY probe_id
             |      ORDER BY dot DESC, cand_id) AS r FROM d)
             |  WHERE r <= 4 GROUP BY probe_id),
             |cn AS (SELECT cand_id, CAST(sum(dot) AS BIGINT) AS cnn FROM (
             |    SELECT cand_id, dot, row_number() OVER (PARTITION BY cand_id
             |      ORDER BY dot DESC, probe_id) AS r FROM d)
             |  WHERE r <= 4 GROUP BY cand_id),
             |m AS (SELECT d.probe_id, d.cand_id,
             |    CAST(d.dot * 8 - pn.pnn - cn.cnn AS BIGINT) AS margin2k
             |  FROM d JOIN pn USING (probe_id) JOIN cn USING (cand_id))
             |SELECT probe_id, CAST(rank AS INTEGER) AS rank, cand_id, margin2k FROM (
             |  SELECT probe_id, cand_id, margin2k, row_number() OVER (
             |    PARTITION BY probe_id ORDER BY margin2k DESC, cand_id) AS rank
             |  FROM m)
             |WHERE rank <= 3
             |ORDER BY probe_id, rank""".stripMargin)),

    // ---- one-sided CUSUM drift alarm over per-day event-type volume:
    // corpus collapses to a (types × days) grid in one partial agg, exact
    // integer recursion on the bounded grid
    Q("q153_cusum",
      (s, d) => {
        val t = Tables(s, d)
        ChangePoint.cusumDaily(t.events, "ts", "event_type", hPpm = 500000L)
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH RECURSIVE days AS (
             |  SELECT CAST(unnest(generate_series(
             |      (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      (SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      INTERVAL 1 DAY)) AS DATE) AS day),
             |types AS (SELECT DISTINCT event_type FROM events),
             |dcnt AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |grid AS (SELECT t.event_type, d.day, coalesce(c.c, 0) AS c
             |  FROM types t CROSS JOIN days d
             |  LEFT JOIN dcnt c ON c.event_type = t.event_type AND c.day = d.day),
             |m AS (SELECT event_type, CAST(count(*) AS BIGINT) AS dd,
             |    CAST(sum(c) AS BIGINT) AS tot
             |  FROM grid GROUP BY event_type),
             |idx AS (SELECT g.event_type, g.day, g.c,
             |    CAST(g.c * m.dd - m.tot AS BIGINT) AS dev, m.tot,
             |    row_number() OVER (PARTITION BY g.event_type ORDER BY g.day) AS rn
             |  FROM grid g JOIN m USING (event_type)),
             |r AS (
             |  SELECT event_type, day, c, dev, tot, rn,
             |    greatest(CAST(0 AS BIGINT), dev) AS s
             |  FROM idx WHERE rn = 1
             |  UNION ALL
             |  SELECT i.event_type, i.day, i.c, i.dev, i.tot, i.rn,
             |    greatest(CAST(0 AS BIGINT), r.s + i.dev)
             |  FROM idx i JOIN r ON i.event_type = r.event_type AND i.rn = r.rn + 1)
             |SELECT event_type, day, c, s AS cusum,
             |  s * 1000000 >= tot * 500000 AS alarm
             |FROM r
             |ORDER BY event_type, day""".stripMargin)),

    // ---- Burrows' Delta (MAD variant) between sources over a fixed
    // function-word list — exact integer ppm rates, mean absolute
    // deviation scaling, pairwise distance on the tiny grid
    Q("q154_stylometry",
      (s, d) => {
        val t = Tables(s, d)
        Stylometry.burrowsDelta(t.documents, "text", "source", StyleWords)
          .orderBy(col("src_a"), col("src_b"))
      },
      Some(s"""WITH toks AS (SELECT source,
              |    unnest(regexp_split_to_array(text, '$ws')) AS w
              |  FROM documents),
              |t2 AS (SELECT source, w FROM toks WHERE w <> ''),
              |tot AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM t2 GROUP BY source),
              |sw AS (SELECT unnest([${StyleWords.map(w => s"'$w'").mkString(", ")}]) AS w),
              |cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
              |  FROM t2 JOIN sw USING (w) GROUP BY source, w),
              |grid AS (SELECT tot.source, sw.w, coalesce(cnt.c, 0) AS c, tot.n
              |  FROM tot CROSS JOIN sw
              |  LEFT JOIN cnt ON cnt.source = tot.source AND cnt.w = sw.w),
              |r AS (SELECT source, w, c * 1000000 // n AS r FROM grid),
              |st AS (SELECT w, CAST(sum(r) AS BIGINT) AS sr,
              |    CAST(count(*) AS BIGINT) AS cs
              |  FROM r GROUP BY w),
              |mu AS (SELECT w, sr // cs AS mu, cs FROM st),
              |mad AS (SELECT r.w, CAST(sum(abs(r.r - mu.mu)) AS BIGINT) // max(mu.cs) AS mad
              |  FROM r JOIN mu USING (w) GROUP BY r.w),
              |z AS (SELECT r.source, r.w, r.r, mad.mad
              |  FROM r JOIN mad USING (w) WHERE mad.mad > 0)
              |SELECT a.source AS src_a, b.source AS src_b,
              |  CAST(count(*) AS BIGINT) AS n_words,
              |  CAST(sum(abs(a.r - b.r) * 1000 // a.mad) AS BIGINT) AS delta_milli_sum
              |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
              |GROUP BY 1, 2
              |ORDER BY 1, 2""".stripMargin)),

    // ---- simplified-silhouette clustering audit via per-cluster
    // sufficient statistics — O(n·k·d), never all-pairs; exact integers
    Q("q155_silhouette",
      (s, d) => {
        val t = Tables(s, d)
        EmbeddingStats.silhouetteAudit(t.embeddings, "vec_id", "embedding", "label")
          .orderBy(col("vec_id"))
      },
      Some("""WITH q AS (SELECT vec_id, label,
             |    list_transform(CAST(embedding AS DOUBLE[]),
             |      x -> CAST(round(x * 1000.0) AS BIGINT)) AS xq
             |  FROM embeddings),
             |p AS (SELECT vec_id, label, xq,
             |    list_reduce(list_transform(xq, x -> x*x), (a,b) -> a+b) AS nsq
             |  FROM q),
             |u AS (SELECT label, unnest(list_transform(range(1, len(xq) + 1),
             |    i -> {'dim': i - 1, 'v': xq[i]})) AS s FROM p),
             |ds AS (SELECT label, CAST(s.dim AS INT) AS dim,
             |    CAST(sum(s.v) AS BIGINT) AS sv
             |  FROM u GROUP BY 1, 2),
             |sv AS (SELECT label, list(sv ORDER BY dim) AS svec FROM ds GROUP BY label),
             |sz AS (SELECT label, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(nsq) AS BIGINT) AS qq
             |  FROM p GROUP BY label),
             |st AS (SELECT sv.label AS other, svec, n, qq FROM sv JOIN sz USING (label)),
             |sc AS (SELECT p.vec_id, p.label, st.other, st.n,
             |    CAST(st.n * p.nsq + st.qq - 2 * list_reduce(
             |      list_transform(range(1, len(p.xq) + 1),
             |        i -> p.xq[i] * st.svec[i]), (a,b) -> a+b) AS BIGINT) AS ssd
             |  FROM p, st),
             |own AS (SELECT vec_id, label, ssd // (n - 1) AS a
             |  FROM sc WHERE label = other AND n >= 2),
             |oth AS (SELECT vec_id, other AS best_other, ssd // n AS b,
             |    row_number() OVER (PARTITION BY vec_id
             |      ORDER BY ssd // n, other) AS r
             |  FROM sc WHERE label <> other)
             |SELECT own.vec_id, own.label, own.a, oth.best_other, oth.b,
             |  (oth.b - own.a) * 1000 // greatest(own.a, oth.b, 1) AS sil_milli
             |FROM own JOIN oth USING (vec_id)
             |WHERE oth.r = 1
             |ORDER BY own.vec_id""".stripMargin)),

    // ---- embedding-space decontamination: best-cosine-vs-eval screen,
    // eval side broadcast, exact integer dots.
    // CONTRACT (MarginKnn scaladoc): eval and corpus are DISJOINT frames;
    // an id passed on both sides matches itself at dot = 1e6 (no
    // inequality predicate). The <10 / >=10 split here keeps them
    // disjoint by construction; external callers must pre-filter.
    Q("q156_semantic_screen",
      (s, d) => {
        val t = Tables(s, d)
        MarginKnn.semanticScreen(
            t.embeddings.filter(col("vec_id") < 10),
            t.embeddings.filter(col("vec_id") >= 10),
            "vec_id", "embedding", tauMicro = 250000L)
          .orderBy(col("vec_id"))
      },
      Some("""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings),
             |n AS (SELECT vec_id, ve,
             |    sqrt(list_reduce(list_transform(ve, x -> x*x), (a,b) -> a+b)) AS nrm
             |  FROM v),
             |u AS (SELECT vec_id,
             |    list_transform(ve, x -> CAST(round(x * 1000.0 / nrm) AS BIGINT)) AS uq
             |  FROM n WHERE nrm > 0),
             |e AS (SELECT vec_id AS eval_id, uq AS eq FROM u WHERE vec_id < 10),
             |c AS (SELECT vec_id, uq AS cq FROM u WHERE vec_id >= 10),
             |d AS (SELECT vec_id, eval_id,
             |    list_reduce(list_transform(range(1, len(cq) + 1),
             |      i -> cq[i] * eq[i]), (a,b) -> a+b) AS dot
             |  FROM c, e),
             |r AS (SELECT vec_id, eval_id, dot, row_number() OVER (
             |    PARTITION BY vec_id ORDER BY dot DESC, eval_id) AS rk FROM d)
             |SELECT vec_id, eval_id AS best_eval_id, CAST(dot AS BIGINT) AS best_dot_micro
             |FROM r WHERE rk = 1 AND dot >= 250000
             |ORDER BY vec_id""".stripMargin)),

    // ---- per-user inter-arrival dispersion (burstiness): one user-keyed
    // shuffle, exact integer variance-to-mean ratio
    Q("q157_burstiness",
      (s, d) => {
        val t = Tables(s, d)
        Funnel.interArrivalDispersion(t.events, "user_id", "ts", "event_id")
          .orderBy(col("user_id"))
      },
      Some("""WITH g AS (SELECT user_id,
             |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap
             |  FROM events),
             |a AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
             |    CAST(sum(gap) AS BIGINT) AS sum_gap_s,
             |    CAST(sum(gap * gap) AS BIGINT) AS sg2
             |  FROM g WHERE gap IS NOT NULL GROUP BY user_id)
             |SELECT user_id, n_gaps, sum_gap_s,
             |  (n_gaps * sg2 - sum_gap_s * sum_gap_s) * 1000
             |    // (n_gaps * sum_gap_s) AS dispersion_milli
             |FROM a WHERE sum_gap_s > 0
             |ORDER BY user_id""".stripMargin)),

    // ---- GloVe-style windowed co-occurrence: per-row pair expansion
    // (zero shuffle), one partial-agg'd pair count
    Q("q158_cooccurrence",
      (s, d) => {
        val t = Tables(s, d)
        CorpusStats.windowCooccurrence(t.documents, "text", window = 3,
            minCount = 100L)
          .orderBy(col("w_a"), col("w_b"))
      },
      Some(s"""WITH t AS (SELECT list_filter(
              |    regexp_split_to_array(text, '$ws'), w -> w <> '') AS w
              |  FROM documents),
              |t2 AS (SELECT w FROM t WHERE len(w) >= 2),
              |p AS (SELECT unnest(flatten(list_transform(range(1, len(w)), i ->
              |    list_transform(range(1, least(3, len(w) - i) + 1), o ->
              |      {'a': least(w[i], w[i + o]), 'b': greatest(w[i], w[i + o])}))))
              |  AS s FROM t2)
              |SELECT s.a AS w_a, s.b AS w_b, CAST(count(*) AS BIGINT) AS n
              |FROM p GROUP BY 1, 2 HAVING count(*) >= 100
              |ORDER BY 1, 2""".stripMargin)),

    // ---- two-sample KS drift per source vs the rest of the corpus:
    // cross-multiplied exact ECDF difference over the bounded value grid
    Q("q159_ks_drift",
      (s, d) => {
        val t = Tables(s, d)
        DriftStats.ksDriftBySource(t.documents, col("n_chars"), "source")
          .orderBy(col("src"))
      },
      Some("""WITH base AS (SELECT source AS src, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY src, v),
             |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM counts GROUP BY v),
             |valc AS (SELECT v, CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) AS cum_all
             |  FROM vals),
             |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_src
             |  FROM counts GROUP BY src),
             |na AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
             |grid AS (SELECT t.src, t.n_src, vc.v, vc.cum_all, coalesce(c.c, 0) AS c
             |  FROM tot t CROSS JOIN valc vc
             |  LEFT JOIN counts c ON c.src = t.src AND c.v = vc.v),
             |cum AS (SELECT src, n_src, v, cum_all,
             |    CAST(sum(c) OVER (PARTITION BY src ORDER BY v) AS BIGINT) AS cum_src
             |  FROM grid),
             |dd AS (SELECT src, n_src, na.n_all - n_src AS n_rest,
             |    abs(CAST(cum_src AS HUGEINT) * (na.n_all - n_src)
             |      - CAST(cum_all - cum_src AS HUGEINT) * n_src) AS dn
             |  FROM cum, na)
             |SELECT src, n_src, n_rest,
             |  CAST((max(dn) * 1000000) // (CAST(n_src AS HUGEINT) * n_rest)
             |    AS BIGINT) AS ks_ppm
             |FROM dd WHERE n_rest > 0 GROUP BY src, n_src, n_rest
             |ORDER BY src""".stripMargin)),

    // ---- Kaplan–Meier survival over user activity lifetimes with
    // right-censoring at the end of observation; quantized product-limit
    // recursion on the bounded lifetime histogram
    Q("q160_kaplan_meier",
      (s, d) => {
        val t = Tables(s, d)
        Survival.kaplanMeierDaily(t.events, "user_id", "ts")
          .orderBy(col("t"))
      },
      Some("""WITH RECURSIVE dd AS (SELECT user_id,
             |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |span AS (SELECT user_id, min(day) AS f, max(day) AS l
             |  FROM dd GROUP BY user_id),
             |hor AS (SELECT max(day) AS end_day FROM dd),
             |lives AS (SELECT CAST(datediff('day', f, l) AS BIGINT) AS t,
             |    l < hor.end_day AS ch
             |  FROM span, hor),
             |hist AS (SELECT t,
             |    CAST(sum(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT) AS d,
             |    CAST(sum(CASE WHEN ch THEN 0 ELSE 1 END) AS BIGINT) AS c
             |  FROM lives GROUP BY t),
             |idx AS (SELECT t, d, c, row_number() OVER (ORDER BY t) AS rn,
             |    CAST(sum(d + c) OVER () AS BIGINT) AS n0,
             |    CAST(coalesce(sum(d + c) OVER (ORDER BY t
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS consumed
             |  FROM hist),
             |base AS (SELECT t, d, c, rn, n0 - consumed AS n_risk FROM idx),
             |r AS (
             |  SELECT t, d, c, rn, n_risk,
             |    (1000000 * (n_risk - d)) // n_risk AS s
             |  FROM base WHERE rn = 1
             |  UNION ALL
             |  SELECT b.t, b.d, b.c, b.rn, b.n_risk,
             |    (r.s * (b.n_risk - b.d)) // b.n_risk
             |  FROM base b JOIN r ON b.rn = r.rn + 1)
             |SELECT t, n_risk, d, c, CAST(s AS BIGINT) AS s_micro
             |FROM r ORDER BY t""".stripMargin)),

    // ---- exact grouped Pearson correlation (signed squared r in ppm)
    // between document length and token count per source
    Q("q161_length_token_corr",
      (s, d) => {
        val t = Tables(s, d)
        Correlation.groupedCorrSquared(t.documents, "source",
            col("n_chars"),
            size(filter(graft.text.TextFunctions.tokens(col("text")),
              w => w =!= "")))
          .orderBy(col("grp"))
      },
      Some(s"""WITH b AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS x,
              |    CAST(len(list_filter(regexp_split_to_array(text, '$ws'),
              |      w -> w <> '')) AS BIGINT) AS y
              |  FROM documents),
              |a AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
              |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
              |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
              |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
              |  FROM b GROUP BY grp),
              |f AS (SELECT grp, n, n * sxy - sx * sy AS num,
              |    n * sxx - sx * sx AS vx, n * syy - sy * sy AS vy
              |  FROM a)
              |SELECT grp, n,
              |  CASE WHEN vx > 0 AND vy > 0 THEN
              |    CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
              |      * ((num * num * 1000000) // (vx * vy)) AS BIGINT)
              |  END AS r2_signed_ppm
              |FROM f ORDER BY grp""".stripMargin)),

    // ---- deterministic Poisson bootstrap of the mean document length:
    // content-addressed Binomial(8,1/8) weights, all replicas in one scan
    Q("q162_bootstrap_means",
      (s, d) => {
        val t = Tables(s, d)
        graft.sampling.Sampling.bootstrapMeans(t.documents, "doc_id",
            col("n_chars"), replicas = 32, salt = "bs")
          .orderBy(col("replica"))
      },
      Some("""WITH r AS (SELECT unnest(range(0, 32)) AS replica),
             |w AS (SELECT r.replica, d.doc_id, CAST(d.n_chars AS BIGINT) AS m,
             |    CAST(len(regexp_replace(substr(md5(
             |      'bs' || ':' || CAST(r.replica AS VARCHAR) || ':'
             |        || CAST(d.doc_id AS VARCHAR)), 1, 8),
             |      '[^01]', '', 'g')) AS BIGINT) AS wt
             |  FROM documents d CROSS JOIN r),
             |a AS (SELECT replica, CAST(sum(wt) AS BIGINT) AS n_eff,
             |    CAST(sum(wt * m) AS BIGINT) AS s
             |  FROM w GROUP BY replica)
             |SELECT CAST(replica AS INTEGER) AS replica, n_eff,
             |  (s * 1000) // n_eff AS mean_milli
             |FROM a WHERE n_eff > 0
             |ORDER BY replica""".stripMargin)),

    // ---- PSI drift per source vs the corpus over shared equal-count
    // bins: the integrated-shift complement to q159's KS max-point
    Q("q168_psi_drift",
      (s, d) => {
        val t = Tables(s, d)
        DriftStats.psiBySource(t.documents, col("n_chars"), "source")
          .orderBy(col("src"))
      },
      Some("""WITH base AS (SELECT source AS src, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY src, v),
             |na AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
             |binned AS (SELECT v,
             |    ((CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) - 1) * 10)
             |      // na.n_all AS bin
             |  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM counts GROUP BY v), na),
             |wb AS (SELECT counts.src, binned.bin, counts.c
             |  FROM counts JOIN binned USING (v)),
             |bysrc AS (SELECT src, bin, CAST(sum(c) AS BIGINT) AS c
             |  FROM wb GROUP BY src, bin),
             |gl AS (SELECT bin, CAST(sum(c) AS BIGINT) AS g FROM wb GROUP BY bin),
             |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_src
             |  FROM bysrc GROUP BY src),
             |terms AS (SELECT b.src, t.n_src,
             |    ((b.c * 1000000 // t.n_src) - (g.g * 1000000 // na.n_all)) *
             |      CAST(round(ln((CAST(b.c AS DOUBLE) * CAST(na.n_all AS DOUBLE)) /
             |        (CAST(g.g AS DOUBLE) * CAST(t.n_src AS DOUBLE))) * 1000000.0)
             |        AS BIGINT) // 1000000 AS t
             |  FROM bysrc b JOIN gl g USING (bin) JOIN tot t USING (src), na)
             |SELECT src, max(n_src) AS n_src, CAST(count(*) AS BIGINT) AS n_bins,
             |  CAST(sum(t) AS BIGINT) AS psi_micro
             |FROM terms GROUP BY src
             |ORDER BY src""".stripMargin)),

    // ---- Wasserstein-1 drift per source vs the rest: integrated ECDF
    // gap in value units over the bounded grid (KS integrates the max
    // point; this integrates the whole shift, unbinned)
    Q("q184_emd_drift",
      (s, d) => {
        val t = Tables(s, d)
        DriftStats.wasserstein1BySource(t.documents, col("n_chars"), "source")
          .orderBy(col("src"))
      },
      Some("""WITH base AS (SELECT source AS src, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY src, v),
             |vals AS (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM counts GROUP BY v),
             |valc AS (SELECT v, CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) AS cum_all,
             |    lead(v) OVER (ORDER BY v) - v AS gap
             |  FROM vals),
             |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_src
             |  FROM counts GROUP BY src),
             |na AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
             |grid AS (SELECT t.src, t.n_src, vc.v, vc.cum_all, vc.gap,
             |    coalesce(c.c, 0) AS c
             |  FROM tot t CROSS JOIN valc vc
             |  LEFT JOIN counts c ON c.src = t.src AND c.v = vc.v),
             |cum AS (SELECT src, n_src, v, cum_all, gap,
             |    CAST(sum(c) OVER (PARTITION BY src ORDER BY v) AS BIGINT) AS cum_src
             |  FROM grid),
             |dd AS (SELECT src, n_src, na.n_all - n_src AS n_rest,
             |    abs(CAST(cum_src AS HUGEINT) * (na.n_all - n_src)
             |      - CAST(cum_all - cum_src AS HUGEINT) * n_src) * gap AS t
             |  FROM cum, na WHERE gap IS NOT NULL)
             |SELECT src, n_src, n_rest,
             |  CAST((sum(t) * 1000) // (CAST(n_src AS HUGEINT) * n_rest)
             |    AS BIGINT) AS w1_milli
             |FROM dd WHERE n_rest > 0 GROUP BY src, n_src, n_rest
             |ORDER BY src""".stripMargin)),

    // ---- classical eps-smoothed PSI beside q168's exact empty-bin-skip
    // contract: dense slice x bin grid, zero-mass bins contribute
    // (eps - q)*ln(eps/q); the exact variant never changes
    Q("q179_psi_smoothed",
      (s, d) => {
        val t = Tables(s, d)
        DriftStats.psiBySourceSmoothed(t.documents, col("n_chars"), "source",
            epsPpm = 100L)
          .orderBy(col("src"))
      },
      Some("""WITH base AS (SELECT source AS src, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY src, v),
             |na AS (SELECT CAST(sum(c) AS BIGINT) AS n_all FROM counts),
             |binned AS (SELECT v,
             |    ((CAST(sum(cv) OVER (ORDER BY v) AS BIGINT) - 1) * 10)
             |      // na.n_all AS bin
             |  FROM (SELECT v, CAST(sum(c) AS BIGINT) AS cv FROM counts GROUP BY v), na),
             |wb AS (SELECT counts.src, binned.bin, counts.c
             |  FROM counts JOIN binned USING (v)),
             |bysrc AS (SELECT src, bin, CAST(sum(c) AS BIGINT) AS c
             |  FROM wb GROUP BY src, bin),
             |gl AS (SELECT bin, CAST(sum(c) AS BIGINT) AS g FROM wb GROUP BY bin),
             |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n_src
             |  FROM bysrc GROUP BY src),
             |dense AS (SELECT t.src, t.n_src, gl.bin, gl.g,
             |    coalesce(b.c, 0) AS c, na.n_all
             |  FROM tot t CROSS JOIN gl
             |  LEFT JOIN bysrc b ON b.src = t.src AND b.bin = gl.bin, na),
             |pq AS (SELECT src, n_src,
             |    greatest(c * 1000000 // n_src, 100) AS p,
             |    greatest(g * 1000000 // n_all, 100) AS q
             |  FROM dense),
             |terms AS (SELECT src, n_src,
             |    (p - q) * CAST(round(ln(CAST(p AS DOUBLE) / CAST(q AS DOUBLE))
             |      * 1000000.0) AS BIGINT) // 1000000 AS t
             |  FROM pq)
             |SELECT src, max(n_src) AS n_src, CAST(count(*) AS BIGINT) AS n_bins,
             |  CAST(sum(t) AS BIGINT) AS psi_micro
             |FROM terms GROUP BY src
             |ORDER BY src""".stripMargin)),

    // ---- dominant principal direction by integer power iteration on the
    // one-pass covariance: the embedding-collapse health check; oracle
    // unrolls the same 3 renormalized iterations
    Q("q170_power_iteration",
      (s, d) => {
        val t = Tables(s, d)
        graft.similarity.PowerIteration.dominantDirection(
            t.embeddings, "embedding", dim = 64, iterations = 3)
          .orderBy(col("dim"))
      },
      Some("""WITH v AS (SELECT list_transform(CAST(embedding AS DOUBLE[]),
             |    x -> CAST(round(x * 1000.0) AS BIGINT)) AS q FROM embeddings),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
             |sv AS (SELECT CAST(s.dim AS BIGINT) AS i, CAST(sum(s.v) AS BIGINT) AS si
             |  FROM (SELECT unnest(list_transform(range(1, len(q) + 1),
             |    k -> {'dim': k - 1, 'v': q[k]})) AS s FROM v) GROUP BY 1),
             |pp AS (SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
             |    CAST(sum(p.pv) AS BIGINT) AS pij
             |  FROM (SELECT unnest(flatten(list_transform(range(1, len(q) + 1), a ->
             |    list_transform(range(1, len(q) + 1),
             |      b -> {'i': a - 1, 'j': b - 1, 'pv': q[a] * q[b]})))) AS p FROM v)
             |  GROUP BY 1, 2),
             |cov AS (SELECT pp.i, pp.j, n.n * pp.pij - sa.si * sb.si AS cv
             |  FROM pp JOIN sv sa ON sa.i = pp.i JOIN sv sb ON sb.i = pp.j, n),
             |sc AS (SELECT greatest(CAST(1 AS BIGINT),
             |    CAST(max(abs(cv)) AS BIGINT) // 1000000) AS mscale FROM cov),
             |m AS (SELECT i, j, cv // sc.mscale AS ms FROM cov, sc),
             |it0 AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS dim,
             |  CAST(1000 AS BIGINT) AS v),
             |y1 AS (SELECT m.i AS dim, CAST(sum(m.ms * it0.v) AS BIGINT) AS y
             |  FROM m JOIN it0 ON it0.dim = m.j GROUP BY 1),
             |x1 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(y))) AS mx FROM y1),
             |it1 AS (SELECT dim, (y * 1000) // x1.mx AS v FROM y1, x1),
             |y2 AS (SELECT m.i AS dim, CAST(sum(m.ms * it1.v) AS BIGINT) AS y
             |  FROM m JOIN it1 ON it1.dim = m.j GROUP BY 1),
             |x2 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(y))) AS mx FROM y2),
             |it2 AS (SELECT dim, (y * 1000) // x2.mx AS v FROM y2, x2),
             |y3 AS (SELECT m.i AS dim, CAST(sum(m.ms * it2.v) AS BIGINT) AS y
             |  FROM m JOIN it2 ON it2.dim = m.j GROUP BY 1),
             |x3 AS (SELECT greatest(CAST(1 AS BIGINT), max(abs(y))) AS mx FROM y3),
             |it3 AS (SELECT dim, (y * 1000) // x3.mx AS v FROM y3, x3)
             |SELECT dim, v AS v_milli FROM it3
             |UNION ALL SELECT CAST(-1 AS BIGINT), x3.mx // 1000 FROM x3
             |UNION ALL SELECT CAST(-2 AS BIGINT), mscale FROM sc
             |ORDER BY dim""".stripMargin)),

    // ---- exact Mann-Whitney U + rank-biserial effect size between every
    // source pair over document length (tie-exact doubled ranks)
    Q("q171_mann_whitney",
      (s, d) => {
        val t = Tables(s, d)
        RankCompare.mannWhitneyPairs(t.documents, col("n_chars"), "source")
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH base AS (SELECT source AS src, CAST(n_chars AS BIGINT) AS v
             |  FROM documents),
             |counts AS (SELECT src, v, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY src, v),
             |vals AS (SELECT DISTINCT v FROM counts),
             |tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS n FROM counts GROUP BY src),
             |grid AS (SELECT t.src, t.n, va.v, coalesce(c.c, 0) AS c
             |  FROM tot t CROSS JOIN vals va
             |  LEFT JOIN counts c ON c.src = t.src AND c.v = va.v),
             |g2 AS (SELECT src, n, v, c,
             |    CAST(sum(c) OVER (PARTITION BY src ORDER BY v) - c AS BIGINT) AS lt
             |  FROM grid),
             |pair AS (SELECT a.src AS src_a, b.src AS src_b, a.n AS n_a, b.n AS n_b,
             |    a.c * (2 * (a.lt + b.lt) + a.c + b.c + 1) AS t
             |  FROM g2 a JOIN g2 b ON a.v = b.v AND a.src < b.src),
             |agg AS (SELECT src_a, src_b, max(n_a) AS n_a, max(n_b) AS n_b,
             |    CAST(sum(t) AS BIGINT) AS r2
             |  FROM pair GROUP BY src_a, src_b),
             |u AS (SELECT src_a, src_b, n_a, n_b,
             |    2 * n_a * n_b + n_a * (n_a + 1) - r2 AS u2x
             |  FROM agg)
             |SELECT src_a, src_b, n_a, n_b, u2x,
             |  CAST(1000000 - (CAST(u2x AS HUGEINT) * 1000000)
             |    // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS rb_ppm
             |FROM u ORDER BY src_a, src_b""".stripMargin)),

    // ---- lag-1/lag-7 autocorrelation of daily volume per event type:
    // the seasonality/persistence report on the CUSUM's zero-mean grid
    Q("q172_autocorrelation",
      (s, d) => {
        val t = Tables(s, d)
        ChangePoint.dailyAutocorrelation(t.events, "ts", "event_type",
            lags = Seq(1, 7))
          .orderBy(col("event_type"), col("lag"))
      },
      Some("""WITH base AS (SELECT event_type,
             |    CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
             |days AS (SELECT CAST(unnest(generate_series(
             |    (SELECT min(day) FROM base), (SELECT max(day) FROM base),
             |    INTERVAL 1 DAY)) AS DATE) AS day),
             |types AS (SELECT DISTINCT event_type FROM base),
             |counts AS (SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
             |  FROM base GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot
             |  FROM counts GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM days),
             |grid AS (SELECT t.event_type, d.day,
             |    coalesce(c.c, 0) * nd.nd - tot.tot AS dev
             |  FROM types t CROSS JOIN days d
             |  LEFT JOIN counts c ON c.event_type = t.event_type AND c.day = d.day
             |  JOIN tot ON tot.event_type = t.event_type, nd),
             |den AS (SELECT event_type,
             |    CAST(sum(CAST(dev AS HUGEINT) * dev) AS HUGEINT) AS den
             |  FROM grid GROUP BY 1),
             |lagd AS (SELECT CAST(unnest([1, 7]) AS INTEGER) AS lag),
             |num AS (SELECT a.event_type, l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CAST(a.dev AS HUGEINT) * b.dev) AS HUGEINT) AS num
             |  FROM grid a CROSS JOIN lagd l
             |  JOIN grid b ON b.event_type = a.event_type AND b.day = a.day + l.lag
             |  GROUP BY 1, 2)
             |SELECT n.event_type, CAST(n.lag AS INTEGER) AS lag, n.n_pairs,
             |  CASE WHEN d.den > 0
             |    THEN CAST((n.num * 1000000) // d.den AS BIGINT) END AS r_ppm
             |FROM num n JOIN den d USING (event_type)
             |ORDER BY event_type, lag""".stripMargin)),

    // ---- Gini concentration of document length per source: the
    // inequality data-card number, exact over tie-broken ascending ranks
    Q("q173_gini_length",
      (s, d) => {
        val t = Tables(s, d)
        graft.curation.Inequality.giniBySlice(t.documents, "doc_id",
            col("n_chars"), "source")
          .orderBy(col("src"))
      },
      Some("""WITH b AS (SELECT source AS src, doc_id, CAST(n_chars AS BIGINT) AS x
             |  FROM documents),
             |r AS (SELECT src, x, CAST(row_number() OVER (PARTITION BY src
             |    ORDER BY x, doc_id) AS BIGINT) AS i FROM b),
             |a AS (SELECT src, CAST(count(*) AS BIGINT) AS n_docs,
             |    CAST(sum(x) AS BIGINT) AS sum_x,
             |    CAST(sum(CAST(i AS HUGEINT) * x) AS HUGEINT) AS ix
             |  FROM r GROUP BY src)
             |SELECT src, n_docs, sum_x,
             |  CAST(((2 * ix - CAST(n_docs + 1 AS HUGEINT) * sum_x) * 1000000)
             |    // (CAST(n_docs AS HUGEINT) * sum_x) AS BIGINT) AS gini_ppm
             |FROM a WHERE sum_x > 0
             |ORDER BY src""".stripMargin)),

    // ---- dedup-method agreement matrix: is the cheap exact screen a
    // safe proxy for near-dup, and what does normalization reveal?
    Q("q174_dedup_agreement",
      (s, d) => {
        val t = Tables(s, d)
        graft.dedup.MethodAgreement.dedupMethodAgreement(t.documents,
            "doc_id", "text", shingleLen = 3, nearThreshold = 0.8)
          .orderBy(col("method_a"), col("method_b"))
      },
      Some(s"""WITH b AS (SELECT doc_id, md5(text) AS rh,
              |    md5(${graft.dedup.Normalize.normalizeSql("text")}) AS nh
              |  FROM documents),
              |re AS (SELECT rh, CAST(count(*) AS BIGINT) AS rc FROM b GROUP BY rh),
              |rn AS (SELECT nh, CAST(count(*) AS BIGINT) AS nc FROM b GROUP BY nh),
              |${TextDedupQueries.shinglesCte},
              |w AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS w FROM docs),
              |i AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
              |    CAST(count(*) AS BIGINT) AS inter, max(a.n) AS n1, max(b.n) AS n2
              |  FROM w a JOIN w b ON a.w = b.w AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |pr AS (SELECT id1, id2 FROM i
              |  WHERE inter * 1000000 >= 800000 * (n1 + n2 - inter)),
              |ni AS (SELECT DISTINCT doc_id FROM
              |  (SELECT id1 AS doc_id FROM pr UNION ALL SELECT id2 FROM pr)),
              |f AS (SELECT b.doc_id, re.rc > 1 AS ex, rn.nc > 1 AS nm,
              |    ni.doc_id IS NOT NULL AS nr
              |  FROM b JOIN re USING (rh) JOIN rn USING (nh)
              |  LEFT JOIN ni USING (doc_id)),
              |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
              |  CAST(sum(CASE WHEN ex AND nm THEN 1 ELSE 0 END) AS BIGINT) AS b1,
              |  CAST(sum(CASE WHEN ex OR nm THEN 1 ELSE 0 END) AS BIGINT) AS e1,
              |  CAST(sum(CASE WHEN ex = nm THEN 1 ELSE 0 END) AS BIGINT) AS a1,
              |  CAST(sum(CASE WHEN ex AND nr THEN 1 ELSE 0 END) AS BIGINT) AS b2,
              |  CAST(sum(CASE WHEN ex OR nr THEN 1 ELSE 0 END) AS BIGINT) AS e2,
              |  CAST(sum(CASE WHEN ex = nr THEN 1 ELSE 0 END) AS BIGINT) AS a2,
              |  CAST(sum(CASE WHEN nm AND nr THEN 1 ELSE 0 END) AS BIGINT) AS b3,
              |  CAST(sum(CASE WHEN nm OR nr THEN 1 ELSE 0 END) AS BIGINT) AS e3,
              |  CAST(sum(CASE WHEN nm = nr THEN 1 ELSE 0 END) AS BIGINT) AS a3
              |  FROM f)
              |SELECT method_a, method_b, n_both, n_either, jaccard_ppm, agree_ppm
              |FROM (
              |  SELECT 'exact' AS method_a, 'near' AS method_b, b2 AS n_both,
              |    e2 AS n_either,
              |    CASE WHEN e2 > 0 THEN (b2 * 1000000) // e2 END AS jaccard_ppm,
              |    (a2 * 1000000) // n AS agree_ppm FROM m
              |  UNION ALL
              |  SELECT 'exact', 'normalized', b1, e1,
              |    CASE WHEN e1 > 0 THEN (b1 * 1000000) // e1 END,
              |    (a1 * 1000000) // n FROM m
              |  UNION ALL
              |  SELECT 'normalized', 'near', b3, e3,
              |    CASE WHEN e3 > 0 THEN (b3 * 1000000) // e3 END,
              |    (a3 * 1000000) // n FROM m)
              |ORDER BY method_a, method_b""".stripMargin)),

    // ---- day-of-week seasonality χ² per event type: weekly-rhythm
    // realness test; expectation honors how many of each weekday the
    // dense calendar span contains
    Q("q194_dow_seasonality",
      (s, d) => {
        val t = Tables(s, d)
        graft.operators.ChangePoint.dowSeasonality(t.events, "ts", "event_type")
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH days AS (
             |  SELECT CAST(unnest(generate_series(
             |      (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      (SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      INTERVAL 1 DAY)) AS DATE) AS day),
             |dw AS (SELECT dayofweek(day) AS dow,
             |    CAST(count(*) AS BIGINT) AS days_w FROM days GROUP BY 1),
             |dd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM days),
             |dcnt AS (SELECT event_type,
             |    CAST(date_trunc('day', ts) AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |obs AS (SELECT event_type, dayofweek(day) AS dow,
             |    CAST(sum(c) AS BIGINT) AS obs FROM dcnt GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot
             |  FROM dcnt GROUP BY 1),
             |cells AS (SELECT t.event_type, w.dow, w.days_w,
             |    COALESCE(o.obs, 0) AS obs, t.tot, d.nd
             |  FROM tot t CROSS JOIN dw w
             |  LEFT JOIN obs o ON o.event_type = t.event_type
             |    AND o.dow = w.dow, dd d
             |  WHERE t.tot > 0 AND w.days_w > 0),
             |terms AS (SELECT event_type, dow, days_w, obs,
             |    obs * nd - tot * days_w AS dev_num,
             |    CAST((CAST(obs * nd - tot * days_w AS HUGEINT)
             |      * (obs * nd - tot * days_w) * 1000000)
             |      // (CAST(nd AS HUGEINT) * tot * days_w) AS BIGINT)
             |      AS term_micro
             |  FROM cells)
             |SELECT event_type, dow, days_w, obs, dev_num, term_micro,
             |  CAST(sum(term_micro) OVER (PARTITION BY event_type)
             |    AS BIGINT) AS chi2_micro
             |FROM terms
             |ORDER BY event_type, dow""".stripMargin)),

    // ---- robust daily-volume anomaly screen: median/MAD of per-day
    // counts on the DENSE calendar grid (a silent day is a zero, not a
    // missing row) — the outage/flood day counter per event type
    Q("q195_volume_anomaly",
      (s, d) => {
        val t = Tables(s, d)
        val counts = t.events
          .select(col("event_type"), to_date(col("ts")).as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val days = counts
          .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
          .select(explode(sequence(col("_d0"), col("_d1"))).as("day"))
        val grid = counts.select(col("event_type")).distinct()
          .crossJoin(broadcast(days))
          .join(counts, Seq("event_type", "day"), "left")
          .na.fill(0L, Seq("c"))
        graft.curation.RobustStats.madOutliers(grid, "event_type", "c",
            kTenths = 35)
          .orderBy(col("g"))
      },
      Some("""WITH days AS (
             |  SELECT CAST(unnest(generate_series(
             |      (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      (SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events),
             |      INTERVAL 1 DAY)) AS DATE) AS day),
             |types AS (SELECT DISTINCT event_type FROM events),
             |dcnt AS (SELECT event_type,
             |    CAST(date_trunc('day', ts) AS DATE) AS day,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2),
             |grid AS (SELECT t.event_type AS g,
             |    CAST(COALESCE(c.c, 0) AS BIGINT) AS v
             |  FROM types t CROSS JOIN days d
             |  LEFT JOIN dcnt c ON c.event_type = t.event_type
             |    AND c.day = d.day),
             |r AS (SELECT g, v,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY v) AS BIGINT)
             |      AS rn,
             |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
             |  FROM grid),
             |med AS (SELECT g, min(CASE WHEN rn >= (n + 1) // 2 THEN v END)
             |    AS med FROM r GROUP BY g),
             |dv AS (SELECT grid.g, grid.v, med, abs(grid.v - med) AS dv
             |  FROM grid JOIN med USING (g)),
             |r2 AS (SELECT g, dv,
             |    CAST(row_number() OVER (PARTITION BY g ORDER BY dv) AS BIGINT)
             |      AS rn,
             |    CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n FROM dv),
             |mad AS (SELECT g, min(CASE WHEN rn >= (n + 1) // 2 THEN dv END)
             |    AS mad FROM r2 GROUP BY g)
             |SELECT dv.g, CAST(count(*) AS BIGINT) AS n, max(dv.med) AS med,
             |  max(mad) AS mad,
             |  CAST(count(*) FILTER (WHERE dv.dv * 10 > 35 * mad) AS BIGINT)
             |    AS n_outliers,
             |  (CAST(count(*) FILTER (WHERE dv.dv * 10 > 35 * mad) AS BIGINT)
             |    * 1000000) // CAST(count(*) AS BIGINT) AS outlier_ppm
             |FROM dv JOIN mad USING (g) GROUP BY dv.g
             |ORDER BY dv.g""".stripMargin)),

    // ---- k-anonymity / l-diversity release audit per source: QI =
    // (source, lang, 100-char length bucket), sensitive = the document
    // fingerprint's first hex nibble (a stand-in for any per-row secret).
    // Rows in QI groups < 5 are linkage-attack re-identifiable; min_l = 1
    // means a homogeneity attack works somewhere in the slice.
    Q("q219_k_anonymity",
      (s, d) => {
        val t = Tables(s, d)
        graft.curation.PrivacyAudit.kAnonymity(t.documents,
            col("source"),
            Seq(col("source"), col("lang"),
              TextFunctions.integralDiv(col("n_chars"), lit(100L))
                .as("len_bucket")),
            substring(md5(col("text")), 1, 1), k = 5)
          .orderBy(col("g"))
      },
      Some("""WITH b AS (SELECT source AS g,
             |    {s: source, l: lang, lb: n_chars // 100} AS qi,
             |    substring(md5(text), 1, 1) AS sens
             |  FROM documents),
             |grp AS (SELECT g, qi, CAST(count(*) AS BIGINT) AS sz,
             |    CAST(count(DISTINCT sens) AS BIGINT) AS l
             |  FROM b GROUP BY g, qi)
             |SELECT g, CAST(sum(sz) AS BIGINT) AS n_rows,
             |  CAST(count(*) AS BIGINT) AS n_qi_groups,
             |  CAST(count(*) FILTER (WHERE sz = 1) AS BIGINT)
             |    AS n_singletons,
             |  CAST(coalesce(sum(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
             |    AS rows_below_k,
             |  (CAST(coalesce(sum(sz) FILTER (WHERE sz < 5), 0) AS BIGINT)
             |    * 1000000) // CAST(sum(sz) AS BIGINT) AS risk_ppm,
             |  min(l) AS min_l
             |FROM grp GROUP BY g ORDER BY g""".stripMargin))
  )
}
