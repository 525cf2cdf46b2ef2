package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over a pair frame (id1 < id2 edges — e.g. the near-dup
  * graphs q25/q38 emit): the structural reports that tell a dedup pipeline
  * what KIND of duplication it found. Connected components (Clusterize)
  * answer "how many groups"; the triangle census answers "are groups
  * cliquey mirror-sets or chainy near-miss strings" (global clustering
  * coefficient), and PageRank ranks each group's most central member — a
  * better canonical-representative choice than min-id when edges carry
  * real similarity structure.
  *
  * Scale shapes: degrees and wedges are one partial-agg'd exchange;
  * triangles are the standard two-equi-join algorithm on (a<b<c)-oriented
  * edges — never an all-pairs stage, cost bounded by Σ d(v)² (cap hub
  * degrees upstream via the LSH bucket caps exactly like the candidate
  * joins); PageRank is one join + one aggregate per iteration, all keyed
  * by vertex. All outputs exact integers (mass in micro-units, integral
  * divisions — deterministic under any partitioning, reproducible in the
  * DuckDB oracle verbatim).
  */
object GraphStats {

  /** One-row census: vertices, edges, wedges (Σ d(d−1)/2), triangles, and
    * the global clustering coefficient 3·T/wedges in ppm (null when the
    * graph has no wedge). Input must be deduplicated (id1 < id2) edges.
    */
  def triangleCensus(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val base = deg.agg(count(lit(1)).as("n_vertices"),
      sum(col("d")).as("_graft_dd"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
      .select(col("n_vertices"), expr("_graft_dd div 2").as("n_edges"),
        col("n_wedges"))
    // oriented edges a<b<c: e1=(a,b), e2=(b,c), closing edge e3=(a,c) —
    // each triangle is counted exactly once
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .agg(count(lit(1)).as("n_triangles"))
    base.crossJoin(tri)
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("(3 * n_triangles * 1000000) div n_wedges")).as("gcc_ppm"))
  }

  /** Fixed-iteration PageRank in exact integer micro-mass over the
    * undirected pair graph: every vertex starts at 10^6, each iteration
    * sends r div d along every incident edge and settles at
    * 150000 + (850000 · Σ inbound) div 10^6 (damping 0.85). Integral
    * divisions make the fixpoint engine-reproducible; the tiny mass lost
    * to truncation is deterministic. No dangling handling needed — every
    * vertex of a pair graph has degree ≥ 1.
    */
  def pageRank(edges: DataFrame, aCol: String, bCol: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val both = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionAll(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = both.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val withDeg = both.join(deg, "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vertices = deg.select(col("src").as("v"), col("d"))
    var ranks = vertices.select(col("v"), lit(1000000L).as("r"))
    for (_ <- 1 to iterations) {
      val inbound = withDeg
        .join(ranks.select(col("v").as("src"), col("r")), "src")
        .select(col("dst").as("v"), expr("r div d").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      ranks = vertices.select(col("v"))
        .join(inbound, Seq("v"), "left")
        .select(col("v"),
          (lit(150000L) +
            expr("(850000 * coalesce(s, 0)) div 1000000")).as("r"))
    }
    ranks.select(col("v"), col("r").as("rank_micro"))
  }

  /** Newman modularity of a community assignment over the pair graph — the
    * "did the clustering actually find structure" number (Q ≈ 0: the
    * partition is no better than random wiring; Q → 1: dense communities,
    * sparse cut). Per community c with intra-edge count e_c and degree sum
    * d_c, the exact contribution is `(4m·e_c − d_c²) / (4m²)`; the ALL row
    * (community −1) divides the summed numerators ONCE, so the global Q is
    * exact rather than a sum of truncations.
    *
    * Everything is one vertex-keyed join of edges onto the assignment plus
    * two partial-agg'd groupBys; DECIMAL(38)/HUGEINT keeps 4m·e_c exact at
    * web-scale edge counts. Input edges must be deduplicated id1 < id2;
    * the assignment must cover every edge endpoint.
    */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
      assign: DataFrame, idCol: String, compCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the assignment is typically an iterative CC result — pin it so the
    // degree-sum and intra-edge joins don't re-run the whole fixpoint
    val c = assign.select(col(idCol).as("v"), col(compCol).cast("long").as("comp"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val byComp = deg.join(c, "v").groupBy(col("comp"))
      .agg(count(lit(1)).as("n_vertices"), sum(col("d")).as("degree_sum"))
    val intra = e
      .join(c.select(col("v").as("a"), col("comp").as("_ca")), "a")
      .join(c.select(col("v").as("b"), col("comp").as("_cb")), "b")
      .filter(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("comp")).agg(count(lit(1)).as("intra_edges"))
    val m = e.agg(count(lit(1)).as("_m"))
    // comp-bounded frame consumed by BOTH the per-component rows and the
    // ALL summary — pin it so the degree/intra joins over e and c run once
    val per = byComp.join(intra, Seq("comp"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(m))
      .select(col("comp"), col("n_vertices"), col("intra_edges"), col("degree_sum"),
        expr("4 * CAST(_m AS DECIMAL(38,0)) * intra_edges " +
          "- CAST(degree_sum AS DECIMAL(38,0)) * degree_sum").as("_num"),
        col("_m"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = per.select(col("comp"), col("n_vertices"), col("intra_edges"),
      col("degree_sum"),
      expr("CAST((_num * 1000000) div (4 * CAST(_m AS DECIMAL(38,0)) * _m) " +
        "AS BIGINT)").as("q_ppm"))
    val all = per.groupBy()
      .agg(sum(col("n_vertices")).as("n_vertices"),
        sum(col("intra_edges")).as("intra_edges"),
        sum(col("degree_sum")).as("degree_sum"),
        sum(col("_num")).as("_num"), max(col("_m")).as("_m"))
      .select(lit(-1L).as("comp"), col("n_vertices"), col("intra_edges"),
        col("degree_sum"),
        expr("CAST((_num * 1000000) div (4 * CAST(_m AS DECIMAL(38,0)) * _m) " +
          "AS BIGINT)").as("q_ppm"))
    rows.unionAll(all)
  }
}
