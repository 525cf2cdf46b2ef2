package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.functions.udaf

import graft.Tables
import graft.similarity.Similarity

/** Additional training-data-pipeline operators: event sessionization
  * (gap-based session windows over the events stream) and embedding-cosine
  * near-duplicate pairs (the brief's embedding near-dup dedup mode).
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    // ---- gap-based sessionization: a new session starts after >30 min idle
    Q("q34_sessionize",
      (s, d) => {
        val t = Tables(s, d)
        Sessions.assignSessionIds(t.events, "user_id", "ts", "event_id", 1800L)
          .select(col("user_id"), col("event_id"), col("session_id"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
             |  CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |FROM (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
             |    THEN 1 ELSE 0 END AS new_session
             |  FROM events)
             |ORDER BY user_id, event_id""".stripMargin)),

    // ---- session WINDOWS: one row per (user, session) with start/end/count
    // (the batch twin of streamingSessionWindowsEventTime)
    Q("q61_session_windows",
      (s, d) => {
        val t = Tables(s, d)
        Sessions.sessionWindows(t.events, "user_id", "ts", "event_id", 1800L)
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             |      OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800000000
             |    THEN 1 ELSE 0 END AS new_session
             |  FROM events),
             |sess AS (
             |  SELECT user_id, ts,
             |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM marked)
             |SELECT user_id, session_id,
             |  min(epoch_us(ts)) AS session_start_us,
             |  max(epoch_us(ts)) AS session_end_us,
             |  count(*) AS n_events
             |FROM sess GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // ---- IVF-bucketed ANN (constant-size md5-sampled quantizer, nProbe=2)
    Q("q36_ann_ivf",
      (s, d) => {
        val t = Tables(s, d)
        Similarity.ivfTopK(
            t.embeddings.filter(col("vec_id") < 10), t.embeddings,
            "vec_id", "embedding", 5, nCentroids = 32, nProbe = 2)
          .select(col("query_id"), col("rank"), col("neighbor_id"))
          .orderBy(col("query_id"), col("rank"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
             |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
             |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 32),
             |assign AS (
             |  SELECT vec_id, v, cent_id, crank FROM (
             |    SELECT e.vec_id, e.v, c.cent_id,
             |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
             |        list_dot_product(e.v, c.cv)
             |          / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) DESC,
             |        c.cent_id) AS crank
             |    FROM e CROSS JOIN cents c)),
             |lists AS (SELECT vec_id AS neighbor_id, v AS nv, cent_id FROM assign WHERE crank <= 1),
             |probes AS (SELECT vec_id AS query_id, v AS qv, cent_id FROM assign
             |           WHERE crank <= 2 AND vec_id < 10),
             |cand AS (
             |  SELECT DISTINCT p.query_id, p.qv, l.neighbor_id, l.nv
             |  FROM probes p JOIN lists l USING (cent_id)
             |  WHERE p.query_id <> l.neighbor_id),
             |scored AS (
             |  SELECT query_id, neighbor_id,
             |    list_dot_product(qv, nv)
             |      / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cos
             |  FROM cand)
             |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id FROM (
             |  SELECT query_id, neighbor_id,
             |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
             |  FROM scored) WHERE rank <= 5
             |ORDER BY query_id, rank""".stripMargin)),

    // ---- LSH-bucketed embedding near-dup pairs (the 100 TB scale path:
    // bucket equi-join, never all-pairs; q35 below is the exact baseline)
    Q("q38_embedding_dupes_lsh",
      (s, d) => {
        val t = Tables(s, d)
        Similarity.nearDupPairsLsh(t.embeddings, "vec_id", "embedding",
            threshold = 0.42, nPlanes = 24, dim = 64, bitsPerTable = 6)
          .orderBy(col("id1"), col("id2"))
      },
      Some(s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |bk AS (SELECT vec_id, v, unnest(${Similarity.lshBucketsSql(24, 64, 6)}) AS bucket FROM e),
              |cand AS (SELECT DISTINCT a.vec_id AS id1, a.v AS v1, b.vec_id AS id2, b.v AS v2
              |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
              |SELECT id1, id2 FROM cand
              |WHERE list_dot_product(v1, v2)
              |  / (sqrt(list_dot_product(v1, v1)) * sqrt(list_dot_product(v2, v2))) >= 0.42
              |ORDER BY id1, id2""".stripMargin)),

    // ---- SemDeDup: semantic dedup groups = transitive closure over the
    // q38 cell-local near-dup pairs; keep the min id per component
    Q("q72_semdedup",
      (s, d) => {
        val t = Tables(s, d)
        Similarity.semDedup(t.embeddings, "vec_id", "embedding",
            threshold = 0.42, nPlanes = 24, dim = 64, bitsPerTable = 6)
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH RECURSIVE
              |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
              |bk AS (SELECT vec_id, v, unnest(${Similarity.lshBucketsSql(24, 64, 6)}) AS bucket FROM e),
              |cand AS (SELECT DISTINCT a.vec_id AS id1, a.v AS v1, b.vec_id AS id2, b.v AS v2
              |  FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |pairs AS (SELECT id1, id2 FROM cand
              |  WHERE list_dot_product(v1, v2)
              |    / (sqrt(list_dot_product(v1, v1)) * sqrt(list_dot_product(v2, v2))) >= 0.42),
              |bidir AS (SELECT id1 AS a, id2 AS b FROM pairs
              |  UNION ALL SELECT id2, id1 FROM pairs),
              |lbl AS (
              |  SELECT vec_id, vec_id AS comp FROM e
              |  UNION
              |  SELECT p.b AS vec_id, l.comp FROM lbl l JOIN bidir p ON p.a = l.vec_id)
              |SELECT vec_id, min(comp) AS rep_id, min(comp) = vec_id AS keep
              |FROM lbl GROUP BY vec_id ORDER BY vec_id""".stripMargin)),

    // ---- embedding-cosine near-duplicate pairs (threshold chosen with a
    // >1e-3 margin to the nearest cosine so float noise can't flip a pair)
    Q("q35_embedding_dupes",
      (s, d) => {
        val t = Tables(s, d)
        val e = t.embeddings.select(col("vec_id"),
          Similarity.asDouble(col("embedding")).as("v"))
        val a = e.select(col("vec_id").as("id1"), col("v").as("v1"))
        val b = e.select(col("vec_id").as("id2"), col("v").as("v2"))
        a.join(b, col("id1") < col("id2"))
          .withColumn("cos", Similarity.cosine(col("v1"), col("v2")))
          .filter(col("cos") >= 0.42)
          .select(col("id1"), col("id2"))
          .orderBy(col("id1"), col("id2"))
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
             |SELECT a.vec_id AS id1, b.vec_id AS id2
             |FROM e a JOIN e b ON a.vec_id < b.vec_id
             |WHERE list_dot_product(a.v, b.v)
             |  / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.42
             |ORDER BY id1, id2""".stripMargin)),

    // ---- per-window heavy hitters: daily top-3 users by event count via
    // the bounded top-k aggregate (each upstream partition contributes <=3
    // rows per day to the exchange; a row_number window would sort every
    // (day, user) count into one partition per day)
    Q("q50_window_heavy_hitters",
      (s, d) => {
        val t = Tables(s, d)
        val tk = udaf(new BoundedTopKAgg[HeavyHitter](3,
          Ordering.by((h: HeavyHitter) => (-h.n, h.userId))))
        t.events
          .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("day"))
          .agg(tk(col("n"), col("user_id")).as("top"))
          .select(col("day"), posexplode(col("top")))
          .select(col("day"), (col("pos") + 1).cast("int").as("rn"),
            col("col.n").as("n"), col("col.userId").as("user_id"))
          .orderBy(col("day"), col("rn"))
      },
      Some("""SELECT day, CAST(rn AS INTEGER) AS rn, n, user_id FROM (
             |  SELECT day, user_id, n, row_number() OVER (PARTITION BY day
             |    ORDER BY n DESC, user_id) AS rn
             |  FROM (SELECT date_trunc('day', ts) AS day, user_id,
             |        CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2))
             |WHERE rn <= 3
             |ORDER BY day, rn""".stripMargin)),

    // ---- as-of join: each click joined to the user's latest prior-or-equal
    // purchase. The purchase dedup aggregates by (user, µs) — one exchange —
    // then the as-of window repartitions by user: two exchanges total on the
    // events side. The oracle is DuckDB's native ASOF LEFT JOIN, compared at
    // the same µs precision Spark's timestamps carry
    Q("q51_asof_join",
      (s, d) => {
        val t = Tables(s, d)
        val ev = t.events
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        // ns→µs truncation can tie purchases at the same (user, µs); keep
        // the max-event_id row so the as-of match is total-ordered on both
        // engines (AsOfJoin requires unique (key, time) on the right)
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("p_event_id"),
            max_by(col("value"), col("event_id")).as("p_value"))
        AsOfJoin.asOf(clicks, purchases, "user_id", "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof.p_event_id").as("p_event_id"),
            col("asof.ts").as("p_ts"),
            round(col("asof.p_value") * 100).cast("long").as("p_value_cents"))
          .orderBy(col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, user_id, make_timestamp(epoch_us(ts)) AS ts
             |           FROM events WHERE event_type = 'click'),
             |p AS (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts,
             |             max(event_id) AS p_event_id,
             |             max_by(value, event_id) AS p_value
             |      FROM events WHERE event_type = 'purchase'
             |      GROUP BY user_id, make_timestamp(epoch_us(ts)))
             |SELECT c.event_id, c.user_id, c.ts, p.p_event_id, p.ts AS p_ts,
             |  CAST(round(p.p_value * 100) AS BIGINT) AS p_value_cents
             |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
             |ORDER BY c.event_id""".stripMargin)),

    // ---- range join: which error-burst sessions overlap in wall-clock time
    // across users. Binned candidates (30-min bins, equi-join) + exact
    // overlap verify — never the quadratic nested-loop a raw inequality
    // join would plan
    Q("q52_range_join",
      (s, d) => {
        val t = Tables(s, d)
        val byU = Window.partitionBy(col("user_id")).orderBy(col("ts"))
        val run = byU.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = t.events.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts"))
          .withColumn("prev", lag(col("ts"), 1).over(byU))
          .withColumn("new_sess",
            when(col("prev").isNull
              || unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000, 1)
              .otherwise(0))
          .withColumn("sess", sum(col("new_sess")).over(run))
          .groupBy(col("user_id"), col("sess"))
          .agg(min(col("ts")).as("start_ts"), max(col("ts")).as("end_ts"))
          .select((col("user_id") * 100000 + col("sess")).as("sid"),
            col("start_ts"), col("end_ts"))
        RangeJoin.intervalOverlaps(sessions, "sid", "start_ts", "end_ts",
            binMicros = 1800L * 1000000)
          .select(col("id1"), col("id2"), col("overlap_us"))
          .orderBy(col("id1"), col("id2"))
      },
      Some("""WITH e AS (SELECT user_id, make_timestamp(epoch_us(ts)) AS ts
             |           FROM events WHERE event_type = 'error'),
             |sess AS (SELECT user_id, ts,
             |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts) AS BIGINT) AS sess
             |  FROM (SELECT user_id, ts,
             |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             |        OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800000000
             |      THEN 1 ELSE 0 END AS new_sess
             |    FROM e)),
             |iv AS (SELECT user_id * 100000 + sess AS sid,
             |         min(ts) AS start_ts, max(ts) AS end_ts
             |       FROM sess GROUP BY user_id, sess)
             |SELECT a.sid AS id1, b.sid AS id2,
             |  epoch_us(least(a.end_ts, b.end_ts)) - epoch_us(greatest(a.start_ts, b.start_ts)) AS overlap_us
             |FROM iv a JOIN iv b
             |  ON a.start_ts <= b.end_ts AND b.start_ts <= a.end_ts AND a.sid < b.sid
             |ORDER BY id1, id2""".stripMargin)),

    // ---- serpentine shard packing: groups ranked by weight dealt into
    // shards in a zigzag — the deterministic one-rank LPT approximation,
    // with per-shard imbalance vs the ideal split
    Q("q185_shard_pack",
      (s, d) => {
        val t = Tables(s, d)
        CapacityPlan.serpentinePack(t.documents, "source", col("n_chars"),
            nShards = 4)
          .orderBy(col("grp"))
      },
      Some("""WITH wts AS (SELECT source AS grp, CAST(sum(n_chars) AS BIGINT) AS w
             |  FROM documents GROUP BY source),
             |r AS (SELECT grp, w,
             |    row_number() OVER (ORDER BY w DESC, grp) - 1 AS r FROM wts),
             |a AS (SELECT grp, w, CAST(CASE WHEN (r // 4) % 2 = 0 THEN r % 4
             |    ELSE 4 - 1 - (r % 4) END AS INTEGER) AS shard FROM r),
             |l AS (SELECT shard, CAST(sum(w) AS BIGINT) AS shard_w
             |  FROM a GROUP BY shard),
             |t AS (SELECT CAST(sum(shard_w) AS BIGINT) AS tw FROM l)
             |SELECT grp, w, shard, shard_w,
             |  (shard_w * 4 * 1000000) // tw - 1000000 AS imbalance_ppm
             |FROM a JOIN l USING (shard), t ORDER BY grp""".stripMargin)),

    // ---- water-filling token-budget allocation: equal share capped at
    // each group's capacity, water level from one bounded window
    Q("q186_waterfill",
      (s, d) => {
        val t = Tables(s, d)
        CapacityPlan.waterfill(t.documents, "source", col("n_chars"),
            budget = 100000L)
          .orderBy(col("grp"))
      },
      Some("""WITH caps AS (SELECT source AS grp, CAST(sum(n_chars) AS BIGINT) AS cap
             |  FROM documents GROUP BY source),
             |r AS (SELECT grp, cap,
             |    CAST(row_number() OVER (ORDER BY cap, grp) AS BIGINT) AS i,
             |    CAST(sum(cap) OVER (ORDER BY cap, grp) AS BIGINT) AS p,
             |    CAST(count(*) OVER () AS BIGINT) AS n
             |  FROM caps),
             |f AS (SELECT grp, cap, i, p, n,
             |    cap * (n - i + 1) + (p - cap) <= 100000 AS funded FROM r),
             |lv AS (SELECT CASE
             |    WHEN max(CASE WHEN funded THEN i END) IS NULL THEN 100000 // max(n)
             |    WHEN max(CASE WHEN funded THEN i END) = max(n) THEN NULL
             |    ELSE (100000 - max(CASE WHEN funded THEN p END))
             |      // (max(n) - max(CASE WHEN funded THEN i END)) END AS lambda
             |  FROM f)
             |SELECT grp, cap,
             |  CASE WHEN funded OR lambda IS NULL THEN cap ELSE lambda END AS alloc,
             |  funded
             |FROM f, lv ORDER BY grp""".stripMargin))
  )
}

/** (count, user) heavy-hitter candidate: count desc, user asc */
final case class HeavyHitter(n: Long, userId: Long)
