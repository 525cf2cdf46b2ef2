package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** payload row of the q12 bounded top-k (price desc, okey, lnum tie-break) */
final case class TopPricedLine(price: Double, okey: Long, lnum: Int)

/** SURVEY.md §2 relational operator inventory (joins J1-J6, aggregations
  * A1-A7, windows W1-W3, sorts/limits O1-O4, set ops U1-U4, upsert S11)
  * expressed as Spark plans over the driver's synthetic tables, each with a
  * DuckDB oracle.
  *
  * Shapes mirror the reference's query surface (file:line cites into
  * /root/reference): cluster expansion joins (Storage.java:628-648), anti-join
  * guard (Storage.java:582-585), DISTINCT ON listing (Storage.java:1234),
  * latest-version-per-source dedup (ClusterBuilder.java:72-96), matchkey
  * stats histogram (Storage.java:881-965), keyset pagination
  * (OaiService.java:170-191), upsert (Storage.java:208-224).
  */
object Relational {

  /** money doubles -> exact cents (BIGINT) so aggregation is order-independent */
  private def cents(c: org.apache.spark.sql.Column) = round(c * 100).cast("long")

  val all: Seq[Q] = Seq(
    // ---- A1/A4: grouped aggregation with exact-integer money sums (TPC-H Q1 shape)
    Q("q01_pricing_summary",
      (s, d) => {
        val t = Tables(s, d)
        t.lineitem
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).cast("long").as("sum_qty"),
            sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long"))
              .as("sum_disc_e4"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
             |  count(*) AS count_order
             |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // ---- S8/P2: scan + filter + projection/rename (pushdown-friendly)
    Q("q02_filter_project",
      (s, d) => {
        val t = Tables(s, d)
        t.lineitem
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
            && col("l_discount") >= 0.05 && col("l_quantity") < 10)
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_quantity").cast("long").as("qty"),
            cents(col("l_extendedprice")).as("price_cents"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
             |  CAST(l_quantity AS BIGINT) AS qty,
             |  CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount >= 0.05 AND l_quantity < 10
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---- J1: multi-way equi-join (cluster-expansion shape) + grouped revenue
    Q("q03_revenue_by_nation",
      (s, d) => {
        val t = Tables(s, d)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
          .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
          .filter(col("c_mktsegment") === "BUILDING"
            && col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
            && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
          .groupBy(col("n_name"))
          .agg(
            sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long"))
              .as("revenue_e4"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("n_name"))
      },
      Some("""SELECT n_name,
             |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS BIGINT) AS revenue_e4,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name ORDER BY n_name""".stripMargin),
      headline = true),

    // ---- J5: semi join (match-value probe shape: EXISTS)
    Q("q04_semi_join",
      (s, d) => {
        val t = Tables(s, d)
        t.orders
          .join(t.lineitem.filter(col("l_quantity") >= 48).select(col("l_orderkey")),
            col("o_orderkey") === col("l_orderkey"), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_orders
             |FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // ---- J4: anti join (NOT EXISTS guard, Storage.java:582-585)
    Q("q05_anti_join",
      (s, d) => {
        val t = Tables(s, d)
        val bigOrders = t.orders.filter(col("o_totalprice") > 300000)
        t.customer
          .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
          .select(col("c_custkey"), col("c_mktsegment"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_mktsegment
             |FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---- A2: DISTINCT ON first-row-per-group (Storage.java:1234).
    // min_by with a struct ordering key instead of a row_number window: the
    // aggregate gets map-side partial aggregation, so each input partition
    // contributes one candidate row per group to the exchange — a window
    // would shuffle and sort every input row
    Q("q06_first_per_group",
      (s, d) => {
        val t = Tables(s, d)
        t.orders
          .groupBy(col("o_custkey"))
          .agg(min_by(struct(col("o_orderkey"), col("o_orderdate")),
            struct(col("o_orderdate"), col("o_orderkey"))).as("first"))
          .select(col("o_custkey"), col("first.o_orderkey"),
            col("first.o_orderdate"))
          .orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate FROM (
             |  SELECT o_custkey, o_orderkey, o_orderdate,
             |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
             |  FROM orders) WHERE rn = 1
             |ORDER BY o_custkey""".stripMargin)),

    // ---- A7/W1: latest-version-per-source dedup (ClusterBuilder.java:72-96)
    // — max_by aggregate for the same partial-aggregation reason as q06
    Q("q07_latest_per_key",
      (s, d) => {
        val t = Tables(s, d)
        t.events
          .groupBy(col("user_id"))
          .agg(max_by(struct(col("event_id"), col("event_type")),
            struct(col("ts"), col("event_id"))).as("latest"))
          .select(col("user_id"), col("latest.event_id"),
            col("latest.event_type"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, event_id, event_type FROM (
             |  SELECT user_id, event_id, event_type,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events) WHERE rn = 1
             |ORDER BY user_id""".stripMargin)),

    // ---- A3: two-level histogram (matchkey stats, Storage.java:881-965)
    Q("q08_cluster_histogram",
      (s, d) => {
        val t = Tables(s, d)
        t.orders
          .groupBy(col("o_custkey")).agg(count(lit(1)).as("cluster_size"))
          .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
          .orderBy(col("cluster_size"))
      },
      Some("""SELECT cluster_size, count(*) AS n_clusters FROM (
             |  SELECT o_custkey, count(*) AS cluster_size FROM orders GROUP BY o_custkey)
             |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin)),

    // ---- U4: union distinct
    Q("q09_union_distinct",
      (s, d) => {
        val t = Tables(s, d)
        val f = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val o = t.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        f.union(o).distinct().orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |UNION
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |ORDER BY o_custkey""".stripMargin)),

    // ---- U2: set difference (insert-only-missing-values, Storage.java:451-477)
    Q("q10_except",
      (s, d) => {
        val t = Tables(s, d)
        val o = t.orders.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        val f = t.orders.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        o.except(f).orderBy(col("o_custkey"))
      },
      Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
             |EXCEPT
             |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |ORDER BY o_custkey""".stripMargin)),

    // ---- O1/O2: order by + limit/offset paging (Storage.java:1230-1237)
    Q("q11_limit_offset",
      (s, d) => {
        val t = Tables(s, d)
        t.orders
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .select(col("o_orderkey"), cents(col("o_totalprice")).as("price_cents"))
          .offset(10).limit(20)
      },
      Some("""SELECT o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
             |FROM orders ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 20 OFFSET 10""".stripMargin)),

    // ---- O4: top-k per group (top-3 samples per bucket, Storage.java:894-899)
    Q("q12_topk_per_group",
      (s, d) => {
        val t = Tables(s, d)
        // bounded top-k aggregate, not a window: a row_number window would
        // shuffle the whole table into one partition per returnflag; the
        // aggregate's partials cap the exchange at 3 rows/group/partition
        val tk = udaf(new BoundedTopKAgg[TopPricedLine](3,
          Ordering.by((r: TopPricedLine) => (-r.price, r.okey, r.lnum))))
        t.lineitem
          .groupBy(col("l_returnflag"))
          .agg(tk(col("l_extendedprice"), col("l_orderkey"),
            col("l_linenumber")).as("top"))
          .select(col("l_returnflag"), posexplode(col("top")))
          .select(col("l_returnflag"), (col("pos") + 1).cast("int").as("rn"),
            col("col.okey").as("l_orderkey"), col("col.lnum").as("l_linenumber"),
            cents(col("col.price")).as("price_cents"))
          .orderBy(col("l_returnflag"), col("rn"))
      },
      Some("""SELECT l_returnflag, CAST(rn AS INTEGER) AS rn, l_orderkey, l_linenumber, price_cents FROM (
             |  SELECT l_returnflag, l_orderkey, l_linenumber,
             |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
             |    row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
             |  FROM lineitem) WHERE rn <= 3
             |ORDER BY l_returnflag, rn""".stripMargin)),

    // ---- W3: keyset (seek) pagination (OaiService.java:170-191)
    Q("q13_keyset_page",
      (s, d) => {
        val t = Tables(s, d)
        val tok = lit("2024-01-15 00:00:00").cast("timestamp")
        t.events
          .filter(col("ts") > tok || (col("ts") === tok && col("event_id") > 0))
          .orderBy(col("ts"), col("event_id"))
          .select(col("event_id"), col("ts"), col("event_type"))
          .limit(100)
      },
      Some("""SELECT event_id, ts, event_type FROM events
             |WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
             |   OR (ts = TIMESTAMP '2024-01-15 00:00:00' AND event_id > 0)
             |ORDER BY ts, event_id LIMIT 100""".stripMargin)),

    // ---- time-bucket rollup (datestamp watermark granularity, Util.java:79-110)
    Q("q14_hourly_rollup",
      (s, d) => {
        val t = Tables(s, d)
        t.events
          .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp")
            && col("ts") < lit("2024-01-07 00:00:00").cast("timestamp"))
          .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))
          .orderBy(col("hour"), col("event_type"))
      },
      Some("""SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
             |  min(value) AS min_value, max(value) AS max_value
             |FROM events
             |WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-07 00:00:00'
             |GROUP BY date_trunc('hour', ts), event_type
             |ORDER BY hour, event_type""".stripMargin)),

    // ---- A1: exact count + distinct count (count=exact, Storage.java:1240-1253)
    Q("q15_count_exact",
      (s, d) => {
        val t = Tables(s, d)
        t.orders.agg(
          count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"))
      },
      Some("""SELECT count(*) AS n_orders, count(DISTINCT o_custkey) AS n_custs
             |FROM orders""".stripMargin)),

    // ---- A4: ingest-stats style group counts over two dims
    Q("q16_group_stats",
      (s, d) => {
        val t = Tables(s, d)
        t.documents
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""SELECT source, lang, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source, lang ORDER BY source, lang""".stripMargin)),

    // ---- S11/T6: MERGE-upsert by natural key, latest version wins
    Q("q17_merge_upsert",
      (s, d) => {
        val t = Tables(s, d)
        val base = t.orders.select(col("o_orderkey"), lit(1).as("version"),
          col("o_totalprice").as("price"))
        val delta = t.orders.filter(col("o_orderkey") % 7 === 0)
          .select(col("o_orderkey"), lit(2).as("version"),
            (col("o_totalprice") + 100).as("price"))
        val w = Window.partitionBy(col("o_orderkey")).orderBy(col("version").desc)
        base.union(delta)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("o_orderkey"), col("version"), cents(col("price")).as("price_cents"))
          .orderBy(col("o_orderkey"))
      },
      Some("""WITH u AS (
             |  SELECT o_orderkey, 1 AS version, o_totalprice AS price FROM orders
             |  UNION ALL
             |  SELECT o_orderkey, 2 AS version, o_totalprice + 100 AS price
             |  FROM orders WHERE o_orderkey % 7 = 0)
             |SELECT o_orderkey, version, CAST(round(price*100) AS BIGINT) AS price_cents FROM (
             |  SELECT o_orderkey, version, price,
             |    row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
             |  FROM u) WHERE rn = 1
             |ORDER BY o_orderkey""".stripMargin)),

    // ---- storage time travel through the oracle gate: two snapshot
    // versions committed via the Catalog protocol, the FIRST read back
    // PINNED after the second landed — proves a reader holding v1 (a
    // pagination session, a reproducible training run) is untouched by
    // later commits. Oracle recomputes both censuses from source.
    Q("q222_catalog_time_travel",
      (s, d) => {
        val t = Tables(s, d)
        val root = graft.storage.Catalog.tempRoot("graft-timetravel")
        val cat = new graft.storage.Catalog(s, root, "gate")
        def census(df: org.apache.spark.sql.DataFrame) =
          df.groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs"),
              sum(col("n_chars")).as("sum_chars"))
        cat.write("corpus_census", census(t.documents))
        cat.write("corpus_census",
          census(t.documents.filter(col("doc_id") % 2 === 0)))
        val v1 = cat.readVersion("corpus_census", Some(1L)).get
          .withColumn("version", lit(1L))
        val v2 = cat.readVersion("corpus_census", Some(2L)).get
          .withColumn("version", lit(2L))
        v1.unionByName(v2)
          .select(col("version"), col("source"), col("n_docs"),
            col("sum_chars"))
          .orderBy(col("version"), col("source"))
      },
      Some("""SELECT CAST(1 AS BIGINT) AS version, source,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
             |FROM documents GROUP BY source
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), source, CAST(count(*) AS BIGINT),
             |  CAST(sum(n_chars) AS BIGINT)
             |FROM documents WHERE doc_id % 2 = 0 GROUP BY source
             |ORDER BY version, source""".stripMargin)),

    // ---- J6 + monthly rollup: join then grouped distinct-count
    Q("q18_monthly_join_stats",
      (s, d) => {
        val t = Tables(s, d)
        t.lineitem
          .join(t.orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
          .agg(count(lit(1)).as("n_lines"),
            countDistinct(col("l_suppkey")).as("n_suppliers"))
          .orderBy(col("month"))
      },
      Some("""SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_lines,
             |  count(DISTINCT l_suppkey) AS n_suppliers
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY date_trunc('month', o_orderdate) ORDER BY month""".stripMargin),
      headline = true),

    // ---- hopping (sliding) windows: 1-hour windows every 15 minutes — the
    // batch twin of the streaming windowed aggregation; each event lands in
    // exactly len/slide windows, assigned per-row (no join)
    Q("q53_hopping_window",
      (s, d) => {
        val t = Tables(s, d)
        t.events
          .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_cents"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n"), col("value_cents"))
          .orderBy(col("window_start"), col("event_type"))
      },
      Some("""SELECT make_timestamp(start_us) AS window_start,
             |  make_timestamp(start_us + 3600000000) AS window_end,
             |  event_type, count(*) AS n,
             |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
             |FROM (
             |  SELECT event_type, value,
             |    (epoch_us(ts) // 900000000 - k) * 900000000 AS start_us
             |  FROM events, unnest(range(0, 4)) AS t(k))
             |GROUP BY start_us, event_type
             |ORDER BY window_start, event_type""".stripMargin)),

    // ---- pivot: per-user event-type count matrix (dynamic column family
    // with an explicit value list, so the schema is plan-time-stable)
    Q("q54_pivot",
      (s, d) => {
        val t = Tables(s, d)
        val types = Seq("click", "error", "purchase", "signup", "view")
        val pivoted = t.events.groupBy(col("user_id"))
          .pivot("event_type", types).agg(count(lit(1)))
        pivoted.select(col("user_id") +: types.map(ty =>
            coalesce(col(ty), lit(0L)).as(ty)): _*)
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---- rollup grouping sets: subtotals per (returnflag, linestatus),
    // per returnflag, and grand total in one aggregation pass
    Q("q55_rollup",
      (s, d) => {
        val t = Tables(s, d)
        t.lineitem
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(cents(col("l_extendedprice"))).as("price_cents"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first)
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
             |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)
             |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // ---- moving-window aggregate: 7-row rolling sum of event value per
    // user, integer cents so accumulation strategy differences (running
    // subtract vs segment tree) cannot flip float bits
    Q("q56_moving_sum",
      (s, d) => {
        val t = Tables(s, d)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, Window.currentRow)
        t.events
          .select(col("user_id"), col("event_id"), col("ts"),
            cents(col("value")).as("value_cents"))
          .withColumn("moving_cents", sum(col("value_cents")).over(w))
          .orderBy(col("user_id"), col("ts"), col("event_id"))
      },
      Some("""SELECT user_id, event_id, ts,
             |  CAST(round(value*100) AS BIGINT) AS value_cents,
             |  CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving_cents
             |FROM (SELECT user_id, event_id, make_timestamp(epoch_us(ts)) AS ts, value
             |      FROM events)
             |ORDER BY user_id, ts, event_id""".stripMargin)),

    // ---- unpivot (melt): the per-user event-type count matrix back to tidy
    // (user_id, event_type, n) rows — the inverse reshape of q54
    Q("q58_unpivot",
      (s, d) => {
        val t = Tables(s, d)
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = t.events.groupBy(col("user_id"))
          .pivot("event_type", types).agg(count(lit(1)))
        wide.unpivot(Array(col("user_id")), types.map(col).toArray,
            "event_type", "n")
          .filter(col("n").isNotNull && col("n") > 0)
          .orderBy(col("user_id"), col("event_type"))
      },
      // the pivot's value list closes the domain on the Spark side, so the
      // oracle restricts to the same set (an unexpected 6th type must fail
      // loudly via the row count, not be silently dropped by one side)
      Some(s"""SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
             |FROM events
             |WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
             |GROUP BY user_id, event_type
             |ORDER BY user_id, event_type""".stripMargin)),

    // ---- edit-distance scalar family: levenshtein agrees across engines
    // (identical DP definition); banded per-row distance to a probe name
    Q("q59_edit_distance",
      (s, d) => {
        val t = Tables(s, d)
        t.customer.select(col("c_custkey"), col("c_name"),
            levenshtein(col("c_name"), lit("Customer#000000001")).as("dist"))
          .filter(col("dist") <= 3)
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey, c_name,
             |  CAST(levenshtein(c_name, 'Customer#000000001') AS INTEGER) AS dist
             |FROM customer
             |WHERE levenshtein(c_name, 'Customer#000000001') <= 3
             |ORDER BY c_custkey""".stripMargin)),

    // ---- grouped exact quartiles: the q49 integer-cents profile per
    // event_type (dyadic interpolation over integers is bit-exact)
    Q("q60_grouped_percentiles",
      (s, d) => {
        val t = Tables(s, d)
        t.events
          .select(col("event_type"), round(col("value") * 100).cast("long").as("c"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            percentile(col("c").cast("double"), lit(0.25)).as("p25"),
            percentile(col("c").cast("double"), lit(0.5)).as("p50"),
            percentile(col("c").cast("double"), lit(0.75)).as("p75"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  quantile_cont(CAST(c AS DOUBLE), 0.25) AS p25,
             |  quantile_cont(CAST(c AS DOUBLE), 0.5) AS p50,
             |  quantile_cont(CAST(c AS DOUBLE), 0.75) AS p75
             |FROM (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
