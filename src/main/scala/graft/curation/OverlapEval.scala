package graft.curation

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Clipped n-gram precision profile — the BLEU component audit between
  * paired texts (candidate vs reference): for each n in 1..maxN, the
  * modified precision p_n = Σ_pairs Σ_g min(count_cand(g), count_ref(g))
  * / Σ_pairs (cand n-gram total), plus the exact length totals the
  * brevity penalty needs. The pipeline uses it to score synthetic
  * rewrites, translation pairs, or near-dup candidates against their
  * originals WITHOUT a float in sight: every count is an integer and the
  * precisions are emitted in exact ppm, so the gate can hash-compare
  * them. Composing the geometric mean / exp brevity penalty into a
  * headline BLEU is left to the consumer (it is transcendental; the four
  * precisions and both lengths determine it).
  *
  * Scale shape: each SIDE joins pair ids to the token frame ONCE and
  * derives all (n, gram) rows in ONE explode (the per-n gram arrays are
  * struct-tagged and flattened before the generator), so the pair text is
  * scanned, joined, and shuffled once per side — not once per (side, n),
  * the shape the round-11 version had. Clipping is an equi-join on
  * (pair, n, gram) — work is linear in total pair text volume, and a
  * document appearing in k pairs costs k explosions (callers pair each
  * doc O(1) times). No window over corpus-order rows, no driver state.
  */
object OverlapEval {

  /** `pairs` must carry (candIdCol, refIdCol); texts come from `docs`
    * keyed by `idCol`. Returns one row per (group, n): clipped matches,
    * candidate totals, precision ppm, and the summed candidate/reference
    * token lengths (identical across the n rows of a group — carried on
    * each row for a self-contained report).
    *
    * Caching note: three internal frames persist (MEMORY_AND_DISK) and —
    * the result being lazy — stay pinned until the caller runs
    * `spark.catalog.clearCache()` after its last action (the Verify gate
    * does this between queries).
    */
  def ngramPrecisionProfile(docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, candIdCol: String, refIdCol: String,
      groupCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 8, s"maxN must be in [1,8], got $maxN")
    // the token frame feeds FOUR consumers (cand grams, ref grams, and
    // both sides of the length totals) — persist it or each re-scans and
    // re-tokenizes the corpus (the r14 composition finding); the slim
    // pair frame likewise feeds three joins
    val toks = docs.select(col(idCol).as("_graft_did"),
      TextFunctions.tokens(col(textCol)).as("_graft_w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = pairs.select(col(candIdCol).as("_graft_cid"),
      col(refIdCol).as("_graft_rid"), col(groupCol).as("g"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // ALL n in one generator: tag each n's gram array with its n, flatten,
    // explode once. `_graft_w` is a bound attribute, so the per-n
    // ngrams() calls under array() stay cheap column refs (the HOF-
    // re-evaluation gotcha does not bite: the lambda bodies only touch
    // their own gram element and a literal).
    //
    // r17 optimization (guide §1.2 "don't compute things twice"): gram
    // counts are computed once per DOCUMENT — not once per (pair, side).
    // The r15 shape exploded each pair's text twice (cand pass + ref
    // pass, each keyed (cid, rid, n, gram)); per-doc counts halve the
    // explode + hash-aggregate work, narrow the aggregate key to
    // (did, n, gram), and attach to pairs afterwards by an id equi-join.
    // A doc in k pairs now costs ONE explosion instead of k. Counts are
    // identical by construction (a side's gram counts never depended on
    // the pair, only on the doc's own text).
    val pSlim = p.select(col("_graft_cid"), col("_graft_rid")).distinct()
    val pairDocs = pSlim.select(col("_graft_cid").as("_graft_did"))
      .union(pSlim.select(col("_graft_rid"))).distinct()
    val docGrams = toks.join(pairDocs, Seq("_graft_did"))
      .select(col("_graft_did"),
        explode(flatten(array((1 to maxN).map(n =>
          transform(TextFunctions.ngrams(col("_graft_w"), n),
            gr => struct(lit(n).as("n"), gr.as("gram")))): _*)))
          .as("_graft_ng"))
      .select(col("_graft_did"), col("_graft_ng.n").as("n"),
        col("_graft_ng.gram").as("gram"))
      .groupBy(col("_graft_did"), col("n"), col("gram"))
      .agg(count(lit(1)).as("_graft_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val cand = pSlim.join(docGrams,
        col("_graft_cid") === col("_graft_did"))
      .select(col("_graft_cid"), col("_graft_rid"), col("n"),
        col("gram"), col("_graft_c").as("c_cand"))
    val ref = docGrams.select(col("_graft_did").as("_graft_rid"),
      col("n"), col("gram"), col("_graft_c").as("c_ref"))
    val clipped = cand.join(ref,
        Seq("_graft_rid", "n", "gram"), "left")
      .groupBy(col("_graft_cid"), col("_graft_rid"), col("n"))
      .agg(sum(least(col("c_cand"), coalesce(col("c_ref"), lit(0L))))
          .as("_graft_cl"),
        sum(col("c_cand")).as("_graft_cg"))
      .join(p, Seq("_graft_cid", "_graft_rid"))
      .groupBy(col("g"), col("n"))
      .agg(sum(col("_graft_cl")).as("clipped"),
        sum(col("_graft_cg")).as("cand_grams"))

    // exact token-length totals per group (the brevity-penalty inputs):
    // the lens joins need only a token COUNT per doc, so they probe a
    // slim persisted (id, len) projection instead of dragging the full
    // token-array cache through two more joins
    val lenF = toks.select(col("_graft_did"),
        size(col("_graft_w")).cast("long").as("_graft_len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lens = p
      .join(lenF.withColumnRenamed("_graft_len", "_graft_lc"),
        col("_graft_cid") === col("_graft_did")).drop("_graft_did")
      .join(lenF, col("_graft_rid") === col("_graft_did"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("_graft_lc")).as("cand_tokens"),
        sum(col("_graft_len")).as("ref_tokens"))

    clipped.join(lens, Seq("g"))
      .select(col("g"), col("n"), col("n_pairs"),
        col("clipped"), col("cand_grams"),
        when(col("cand_grams") > 0L,
          expr("(clipped * 1000000) div cand_grams")).as("p_ppm"),
        col("cand_tokens"), col("ref_tokens"))
  }
}
