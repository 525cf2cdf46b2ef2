package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Capacity-planning operators for laying a 100 TB corpus onto compute:
  * deterministic shard packing and token-budget allocation. Both collapse
  * the corpus to a per-group weight frame in ONE partial-agg'd groupBy and
  * run their (bounded, group-cardinality-sized) planning arithmetic as
  * window functions over that tiny frame — no driver loop, no iteration,
  * exact integers end to end.
  */
object CapacityPlan {

  /** Serpentine (boustrophedon) shard packing: groups ranked by total
    * weight descending are dealt into `nShards` bins in a zigzag
    * (1..n, n..1, 1..n, …), the classical deterministic approximation of
    * longest-processing-time bin packing that needs ONE rank — no greedy
    * state, so it stays a window function (LPT's "least-loaded bin" needs
    * a sequential fold; serpentine is within a few percent on heavy-tailed
    * corpus weights and is engine-reproducible).
    *
    * Output: (grp, w, shard) plus each shard's total and its imbalance vs
    * the ideal `total/nShards` in ppm — the number a scheduler actually
    * checks before committing the layout.
    */
  def serpentinePack(df: DataFrame, groupCol: String, weightCol: Column,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val weights = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(weightCol).as("w"))
    val ranked = weights.withColumn("_r",
      row_number().over(Window.orderBy(col("w").desc, col("grp"))) - 1)
    val assigned = ranked.select(col("grp"), col("w"),
      expr(s"""CASE WHEN (_r div $nShards) % 2 = 0 THEN _r % $nShards
              |ELSE $nShards - 1 - (_r % $nShards) END""".stripMargin)
        .cast("int").as("shard"))
    val loads = assigned.groupBy(col("shard"))
      .agg(sum(col("w")).as("shard_w"))
    val total = loads.agg(sum(col("shard_w")).as("_tw"))
    assigned.join(broadcast(loads), "shard")
      .crossJoin(broadcast(total))
      .select(col("grp"), col("w"), col("shard"), col("shard_w"),
        // imbalance of THIS group's shard vs the ideal equal split
        expr(s"(shard_w * $nShards * 1000000) div _tw - 1000000")
          .as("imbalance_ppm"))
  }

  /** Water-filling token-budget allocation: give every group an equal
    * share of `budget`, capped at the group's own capacity — the standard
    * training-mixture primitive ("N tokens total, no source beyond its
    * cap"). With caps c sorted ascending and prefix sums P, a group is
    * FULLY FUNDED iff `c_i·(n−i+1) + P_{i−1} <= budget` (funding it fully
    * still leaves an equal share for everyone after it); the water level
    * is `λ = (budget − P_k) div (n−k)` at the funded/unfunded boundary k,
    * and every unfunded group gets exactly λ. All exact integers — the
    * ≤ n-token division remainder stays unallocated (documented).
    *
    * Output: (grp, cap, alloc, funded) — Σ alloc = min(budget, Σ cap) −
    * remainder. One bounded window, no iteration.
    */
  def waterfill(df: DataFrame, groupCol: String, capCol: Column,
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val caps = df.groupBy(col(groupCol).as("grp"))
      .agg(sum(capCol).as("cap"))
    val w = Window.orderBy(col("cap"), col("grp"))
    val ranked = caps
      .withColumn("_i", row_number().over(w))
      .withColumn("_p", sum(col("cap")).over(w)) // prefix INCLUDING self
      .withColumn("_n", count(lit(1)).over(
        Window.partitionBy(lit(1))))
      .withColumn("funded",
        expr(s"cap * (_n - _i + 1) + (_p - cap) <= $budget"))
    // water level from the funded prefix: λ = (budget − P_k) div (n − k);
    // when everything is funded the level is irrelevant (alloc = cap)
    val level = ranked.agg(
        max(when(col("funded"), col("_i"))).as("_k"),
        max(when(col("funded"), col("_p"))).as("_pk"),
        max(col("_n")).as("_nn"))
      .select(expr(s"""CASE WHEN _k IS NULL THEN $budget div _nn
                      |WHEN _k = _nn THEN NULL
                      |ELSE ($budget - _pk) div (_nn - _k) END"""
        .stripMargin).as("_lambda"))
    ranked.crossJoin(broadcast(level))
      .select(col("grp"), col("cap"),
        when(col("funded") || col("_lambda").isNull, col("cap"))
          .otherwise(col("_lambda")).as("alloc"),
        col("funded"))
  }

  /** Sliding-window chunk plan — the RAG/context-packing arithmetic: a doc
    * of n tokens cut into `window`-token chunks advancing by
    * `window − overlap` yields `1 + ⌈max(n − window, 0) / stride⌉` chunks
    * (empty docs yield 0), each chunk padded to `window`. Emits per-doc
    * chunk counts plus the padded-token bill and its waste share — the
    * storage/compute multiplier a chunking config costs BEFORE anyone
    * materializes the chunks. Pure per-row integer arithmetic on the
    * token count: no shuffle, no explode — the plan for 100 TB is priced
    * by the same scan that would read it.
    */
  def chunkPlan(docs: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(overlap >= 0 && overlap < window,
      s"overlap must be in [0, window), got $overlap (window $window)")
    val stride = window - overlap
    docs.select(col(idCol).as("doc_id"),
        graft.text.TextFunctions.tokenCount(col(textCol)).cast("long")
          .as("n_tokens"))
      .select(col("doc_id"), col("n_tokens"),
        when(col("n_tokens") === 0L, 0L)
          .otherwise(expr(s"1 + (greatest(n_tokens - $window, 0) + " +
            s"${stride - 1}) div $stride"))
          .as("n_chunks"))
      .select(col("doc_id"), col("n_tokens"), col("n_chunks"),
        (col("n_chunks") * window).as("padded_tokens"),
        when(col("n_chunks") === 0L, 0L)
          .otherwise(expr(s"((n_chunks * $window - n_tokens) * 1000000) " +
            s"div (n_chunks * $window)"))
          .as("waste_ppm"))
  }

  /** Token-budgeted mixture assembly — the end of the curation pipeline:
    * split a global token `budget` across groups by [[waterfill]] (equal
    * shares, capped at each group's own supply), then fill each group's
    * allocation greedily with its highest-`scoreCol` documents (ties by
    * id ascending) until the next doc would overflow it. Emits the
    * per-group census a mixture decision reads: supply, allocation,
    * docs/tokens actually selected, and the fill rate.
    *
    * Scale shape: the allocation derives from ONE partial-agg'd group
    * frame (bounded by group cardinality, broadcast back); the selection
    * is a per-group (score desc, id) cumulative window — one shuffle on
    * the group key, the same shape every per-source ranking here uses.
    * The greedy prefix is deterministic and engine-reproducible; it can
    * under-fill by at most one document per group (documented — the
    * classical knapsack relaxation gap).
    */
  def budgetedSelect(docs: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, tokensCol: Column, budget: Long): DataFrame = {
    val (kept, allocs) =
      selection(docs, groupCol, idCol, scoreCol, tokensCol, budget)
    val census = kept.groupBy(col("g"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("_graft_tk")).as("tokens_selected"))
    allocs.join(census, col("grp") === col("g"), "left")
      .select(col("grp").as("g"), col("cap"), col("alloc"), col("funded"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("tokens_selected"), lit(0L)).as("tokens_selected"),
        when(col("alloc") > 0L,
          expr("(coalesce(tokens_selected, 0) * 1000000) div alloc"))
          .as("fill_ppm"))
  }

  /** shared [[budgetedSelect]]/[[budgetedPackAudit]] core: the greedily
    * selected rows (g, _graft_id, _graft_s, _graft_tk, _graft_cum, alloc)
    * — `_graft_cum` is the running token total in selection order — plus
    * the bounded (grp, cap, alloc, funded) allocation frame
    */
  private def selection(docs: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, tokensCol: Column,
      budget: Long): (DataFrame, DataFrame) = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val base = docs.select(col(groupCol).as("g"), col(idCol).as("_graft_id"),
      scoreCol.as("_graft_s"), tokensCol.cast("long").as("_graft_tk"))
    val allocs = waterfill(base, "g", col("_graft_tk"), budget)
    val w = Window.partitionBy(col("g"))
      .orderBy(col("_graft_s").desc, col("_graft_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val kept = base.withColumn("_graft_cum", sum(col("_graft_tk")).over(w))
      .join(broadcast(allocs.select(col("grp").as("g"), col("alloc"))), "g")
      .filter(col("_graft_cum") <= col("alloc"))
    (kept, allocs)
  }

  /** [[budgetedSelect]] × [[packFragmentation]] in ONE plan — "what does
    * this mixture cost to pack": water-fill the budget, select each
    * group's greedy prefix, then price concat-and-chunk packing of ONLY
    * the selected documents, streamed in selection order (score desc, id).
    * The selection window's running total IS the packer's prefix sum, so
    * the fragmentation audit costs no extra shuffle beyond the selection
    * itself. Per group: the allocation census (cap, alloc, funded,
    * n_selected, tokens_selected, fill_ppm) plus the packing bill
    * (windows_used, fragments, n_straddle, straddle_ppm, tail_pad).
    */
  def budgetedPackAudit(docs: DataFrame, groupCol: String, idCol: String,
      scoreCol: Column, tokensCol: Column, budget: Long,
      contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val (kept, allocs) =
      selection(docs, groupCol, idCol, scoreCol, tokensCol, budget)
    val census = kept
      .select(col("g"), col("_graft_tk"),
        when(col("_graft_tk") === 0L, 0L)
          .otherwise(expr(s"(_graft_cum - 1) div $contextLen" +
            s" - (_graft_cum - _graft_tk) div $contextLen + 1"))
          .as("_graft_frag"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_selected"),
        sum(col("_graft_tk")).as("tokens_selected"),
        sum(col("_graft_frag")).as("fragments"),
        sum(when(col("_graft_frag") > 1L, 1L).otherwise(0L))
          .as("n_straddle"))
    allocs.join(census, col("grp") === col("g"), "left")
      .select(col("grp").as("g"), col("cap"), col("alloc"), col("funded"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("tokens_selected"), lit(0L)).as("tokens_selected"),
        when(col("alloc") > 0L,
          expr("(coalesce(tokens_selected, 0) * 1000000) div alloc"))
          .as("fill_ppm"),
        expr(s"(coalesce(tokens_selected, 0) + ${contextLen - 1})" +
          s" div $contextLen").as("windows_used"),
        coalesce(col("fragments"), lit(0L)).as("fragments"),
        coalesce(col("n_straddle"), lit(0L)).as("n_straddle"),
        when(coalesce(col("n_selected"), lit(0L)) > 0L,
          expr("(coalesce(n_straddle, 0) * 1000000)" +
            " div coalesce(n_selected, 1)")).as("straddle_ppm"),
        expr(s"((coalesce(tokens_selected, 0) + ${contextLen - 1})" +
          s" div $contextLen) * $contextLen" +
          " - coalesce(tokens_selected, 0)").as("tail_pad"))
  }

  /** Concat-and-chunk packing fragmentation audit — the GPT-style
    * pretraining packer (concatenate every document of a stream in a
    * deterministic order, cut the token stream at exact `contextLen`
    * boundaries) costs nothing in padding but SPLITS documents across
    * window boundaries; the training-relevant question is how often. Per
    * group: windows used `⌈total/L⌉`, documents straddling a boundary,
    * the straddle rate, total fragments (a doc spanning w windows
    * contributes w), and the final window's tail padding — the numbers
    * that decide contextLen and whether doc-boundary-respecting packing
    * (q185/q192) is worth its padding bill.
    *
    * The stream order is (orderCol ascending) within each group — a pure
    * prefix-sum window partitioned by group. One shuffle on the group
    * key; per-doc arithmetic after that is window-free. Zero-token docs
    * occupy no interval (0 fragments, never straddle).
    */
  def packFragmentation(docs: DataFrame, groupCol: String, orderCol: String,
      textCol: String, contextLen: Int): DataFrame = {
    require(contextLen >= 1, s"contextLen must be >= 1, got $contextLen")
    val w = Window.partitionBy(col("g")).orderBy(col("_graft_ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(groupCol).as("g"), col(orderCol).as("_graft_ord"),
        graft.text.TextFunctions.tokenCount(col(textCol)).cast("long")
          .as("_graft_n"))
      .withColumn("_graft_cum", sum(col("_graft_n")).over(w))
      .select(col("g"), col("_graft_n"),
        // doc occupies token interval [cum - n, cum); fragments = number
        // of distinct L-windows the interval touches
        when(col("_graft_n") === 0L, 0L)
          .otherwise(expr(s"(_graft_cum - 1) div $contextLen" +
            s" - (_graft_cum - _graft_n) div $contextLen + 1"))
          .as("_graft_frag"),
        col("_graft_cum"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("_graft_n")).as("total_tokens"),
        sum(col("_graft_frag")).as("fragments"),
        sum(when(col("_graft_frag") > 1L, 1L).otherwise(0L))
          .as("n_straddle"))
      .select(col("g"), col("n_docs"), col("total_tokens"),
        expr(s"(total_tokens + ${contextLen - 1}) div $contextLen")
          .as("windows_used"),
        col("fragments"), col("n_straddle"),
        expr("(n_straddle * 1000000) div n_docs").as("straddle_ppm"),
        expr(s"((total_tokens + ${contextLen - 1}) div $contextLen) " +
          s"* $contextLen - total_tokens").as("tail_pad"))
  }
}
