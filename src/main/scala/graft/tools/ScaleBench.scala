package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scaling-slope datapoint: materializes an N×-replicated copy of a
  * driver-generated sf directory (facts AND the customer dimension
  * key-shifted with one span per key domain so joins stay 1:1, document
  * text salted per replica so the dedup rate is preserved rather than
  * multiplied), then times the headline bench set on it. With N=10 over
  * sf0.1 this approximates sf1 — the 10× point that shows whether the
  * headline plans scale linearly or hide a super-linear stage.
  *
  * Known approximations vs a true sf1: supplier/part stay at source size
  * (outside the headline join graph), and value distributions repeat per
  * replica instead of widening — treat the slope as a lower bound on
  * dimension-side growth effects.
  *
  * Usage: runMain graft.tools.ScaleBench [mult] [srcDir] [workDir] [flags...]
  * Flags: `keep` retains the replicated dir — e.g. as the target of a full
  * oracle-gate correctness run at ~sf1. `wordsalt` switches the text
  * replication to WORD-level salting (every word of a non-zero replica is
  * suffixed with its replica tag, so every 3-gram shingle window changes
  * and cross-replica shingle sharing drops to ZERO, while within-replica
  * dup/near-dup structure is preserved bijectively) and perturbs replica
  * embeddings by a per-replica cyclic dimension shift (an exact isometry
  * within each replica — inner products preserved — while clone pairs
  * across replicas decorrelate). Under `wordsalt` the shingle-join and
  * near-dup-graph operators that the default every-4-words salting
  * poisons (q107/q114/q115/q119/q123/q169/q174/q178, q72/q148/q149/q163)
  * get REAL Nx slopes instead of the documented replication artifact.
  */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val src = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(2).getOrElse("/tmp/graft-scalebench")
    val flags = args.drop(3).toSet
    val keep = flags("keep")
    val wordSalt = flags("wordsalt")
    // `lite`: materialize + headline only (skip both extras passes) — the
    // big-mult mode where per-query slopes come from QBench pairs on the
    // kept dir instead of one multi-hour extras sweep
    val lite = flags("lite")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Bench.benchSession("graft-scalebench")

    val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(work), true)

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      // split into many files so scans parallelize like a real big input
      df.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(s"$work/$t.parquet")

    /** Replicate `mult`× shifting each key column by replica × its DOMAIN
      * span — replica 0 is the original, so per-key join fan-in/fan-out is
      * unchanged. Spans are computed once per key DOMAIN (not per table):
      * orders and lineitem must shift o_orderkey/l_orderkey by the SAME
      * span or replica lineitems become join orphans whenever the
      * highest-keyed order has no lineitems (2.7k sf0.1 orders don't).
      */
    def replicate(df: DataFrame, keys: Map[String, Long]): DataFrame = {
      val rep = df.withColumn("_r", explode(sequence(lit(0L), lit(mult - 1L))))
      keys.foldLeft(rep) { case (d, (k, span)) =>
        d.withColumn(k, col(k) + col("_r") * lit(span))
      }.drop("_r")
    }
    def maxOf(t: String, k: String): Long =
      read(t).agg(max(col(k))).head.getLong(0)

    // one span per key DOMAIN, shared by every table carrying that key
    val orderSpan = math.max(maxOf("orders", "o_orderkey"),
      maxOf("lineitem", "l_orderkey")) + 1L
    val custSpan = math.max(maxOf("customer", "c_custkey"),
      maxOf("orders", "o_custkey")) + 1L

    // small dims (region/nation are fixed-size even at sf1000): copy.
    // customer scales WITH its fact (real sf1 has 10x customers, and the
    // customer join's build side must grow with the data); supplier/part
    // are outside the headline queries' join graph and stay copied.
    Seq("region", "nation", "supplier", "part")
      .foreach(t => write(read(t), t))
    write(replicate(read("customer"), Map("c_custkey" -> custSpan)), "customer")
    write(replicate(read("orders"),
      Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)), "orders")
    write(replicate(read("lineitem"), Map("l_orderkey" -> orderSpan)), "lineitem")
    // Per-replica text salting keeps exact/near-dup DENSITY constant
    // instead of making every doc a 10-way near-duplicate of its copies: a
    // replica token interleaved every 4 words shifts most 3-gram shingle
    // windows, pushing cross-replica jaccard far below the 0.5 threshold
    // while each replica's own dup groups stay intact (replica 0 = the
    // original corpus verbatim).
    val docSpan = maxOf("documents", "doc_id") + 1L
    write(replicate(read("documents"), Map("doc_id" -> docSpan))
      .withColumn("text", udf { (text: String, docId: Long) =>
        val rep = docId / docSpan
        if (rep == 0L) text
        else if (wordSalt)
          // suffix EVERY word: no 3-gram window survives across replicas
          // (zero cross-replica shingle sharing); within a replica the
          // transformation is a bijection on shingle sets, so dup groups
          // and jaccard values are preserved exactly
          text.split(" ").map(w => s"$w~r$rep").mkString(" ")
        else text.split(" ").grouped(4)
          .map(g => (g :+ s"rep$rep").mkString(" ")).mkString(" ")
      }.apply(col("text"), col("doc_id"))), "documents")
    val embSpan = maxOf("embeddings", "vec_id") + 1L
    val embRep = replicate(read("embeddings"), Map("vec_id" -> embSpan))
    write(
      if (!wordSalt) embRep
      else embRep.withColumn("embedding",
        udf { (v: Seq[Float], vecId: Long) =>
          // cyclic dimension shift per replica: an exact isometry within
          // the replica (all inner products preserved), while each clone
          // pair across replicas decorrelates like random vectors
          val rep = (vecId / embSpan).toInt
          if (rep == 0 || v == null || v.isEmpty) v
          else {
            val s = (rep * 13) % v.length
            v.drop(s) ++ v.take(s)
          }
        }.apply(col("embedding"), col("vec_id"))), "embeddings")
    // events replicate by shifting BOTH id domains: 10x users over the same
    // time range (per-user event spans unchanged — the realistic growth for
    // user-keyed session/window operators). ts goes through Tables.events'
    // normalization (nanos-long / TIMESTAMP_NTZ / TIMESTAMP across testdata
    // generations) and is written back as session-tz TIMESTAMP(MICROS), so
    // Spark and DuckDB see identical µs values on the replicated dir — which
    // also makes it a valid target for the full oracle gate.
    val ev = graft.Tables(spark, src).events
    write(replicate(ev,
      Map("event_id" -> (ev.agg(max(col("event_id"))).head.getLong(0) + 1L),
        "user_id" -> (ev.agg(max(col("user_id"))).head.getLong(0) + 1L))),
      "events")

    // non-headline operator slopes (round-7 verdict #2, extended to the
    // round-8 operators), timed at 1x and Nx in the SAME JVM so the pair
    // is box-comparable. q72 is gated past 10x: embeddings replicate
    // UNPERTURBED, so every vector is an exact clone of its replicas and
    // the near-dup pair OUTPUT (and the CC over it) grows quadratically in
    // mult — a property of the synthetic replication, not the operator.
    val extras = Seq("q61_session_windows", "q62_unigram_logprob",
      "q63_mixture_sample", "q64_kl_drift", "q65_bpe_token_count",
      "q66_winnowing", "q67_video_probe", "q68_tfidf_topk",
      "q69_stratum_overlap", "q70_dup_spans", "q71_quality_classifier",
      "q73_temperature_mixture", "q74_leakage_safe_split",
      "q75_bigram_logprob", "q76_dsir_weights", "q77_bpe_merges",
      "q78_gumbel_topk", "q79_bpe_encode", "q80_cdc_chunks",
      "q81_winnow_decontaminate", "q82_sq8_quant", "q83_zipf_slope",
      "q84_incremental_dedup", "q85_kneser_ney", "q86_bpe_fertility",
      "q87_hard_negatives", "q88_centroid_drift", "q89_mixture_order",
      "q90_oov_rate", "q91_cms_audit", "q92_perplexity_buckets",
      "q93_bloom_decontaminate", "q94_ann_recall", "q95_cluster_sizes",
      "q96_prefix_jaccard", "q97_hll_audit", "q98_rrf_fusion",
      "q99_cond_entropy", "q100_embedding_cov", "q101_prototype_prune",
      "q102_repeat_upsample", "q103_minhash_estimate",
      "q104_passage_dedup", "q105_softdedup_weights", "q106_jl_projection",
      "q107_containment_join", "q108_exact_quantiles", "q109_coverage_curve",
      "q110_padding_waste", "q111_ngram_diversity", "q112_pmi_collocations",
      "q113_cluster_representative", "q116_skew_profile", "q117_salted_join",
      "q118_weighted_quantiles", "q119_containment_estimate",
      "q120_source_sketches", "q121_normalized_dedup", "q122_gram_novelty",
      "q124_rule_attribution", "q125_locf_grid", "q126_keyness",
      "q127_classifier_auc", "q128_lsh_plan", "q129_sorted_neighborhood",
      "q130_embedding_health", "q131_snapshot_diff", "q132_stitch_pairs",
      "q133_rebalance_rates", "q134_weighted_jaccard",
      "q135_bbit_minhash", "q136_funnel", "q137_cohort_retention",
      "q138_kmv_distinct", "q139_ndcg_mrr", "q140_transition_matrix",
      "q141_equidepth_codebook", "q142_readability", "q143_fs_linkage",
      "q144_calibration", "q145_kendall_tau", "q146_vocab_saturation",
      "q147_sample_quantile_audit", "q150_mmr_rerank",
      "q151_blocklist_screen", "q152_margin_knn", "q153_cusum",
      "q154_stylometry", "q155_silhouette", "q156_semantic_screen",
      "q157_burstiness", "q158_cooccurrence", "q159_ks_drift",
      "q160_kaplan_meier", "q161_length_token_corr",
      "q162_bootstrap_means", "q164_slice_word_mi", "q165_simpson_index",
      "q166_weight_ess", "q167_langid_confusion", "q168_psi_drift",
      "q170_power_iteration", "q171_mann_whitney",
      "q172_autocorrelation", "q173_gini_length", "q175_cramers_v",
      "q176_rbo_vocab", "q177_js_divergence", "q179_psi_smoothed",
      "q180_bmff_probe", "q182_bcubed", "q183_pii_scan", "q184_emd_drift",
      "q185_shard_pack", "q186_waterfill", "q187_cosine_pairs_capped",
      // round-10/11 additions: label-quality screens, capacity planners,
      // fold assignment, substring dedup (50-gram hashes never cross
      // replicas under either salting), and the capped edit join
      "q188_knn_label_noise", "q189_mrl_fidelity", "q190_lang_kappa",
      "q191_mad_outliers", "q192_chunk_plan", "q193_pr_curve",
      "q194_dow_seasonality", "q195_volume_anomaly", "q196_freq_spectrum",
      "q197_dup_crosstab", "q198_bloom_plan", "q199_cv_folds",
      "q200_curation_v2", "q203_substring_clusters", "q204_substring_dedup",
      "q205_edit_join_capped", "q206_krippendorff", "q207_conformal_screen",
      "q208_bleu_overlap", "q209_pack_fragmentation", "q210_mixture_assembly",
      // round-12 additions: keep-one strip + curation v3 (50-gram hashes,
      // replica-safe like q203/q204), conformal-calibrated pipeline,
      // budget->select->pack audit
      "q211_substring_strip", "q212_curation_v3", "q214_curation_conformal",
      "q215_mixture_pack_audit")
    // near-dup-graph queries: unperturbed embedding replication makes the
    // graph (and everything over it) grow quadratically in mult — under
    // `wordsalt` the cyclic-shift perturbation removes the artifact and
    // they get real Nx slopes at any mult
    val graphGated = Seq("q72_semdedup", "q148_triangle_census",
      "q149_pagerank", "q163_modularity")
    // shingle-join queries: the default every-4-words salting shares ~40%
    // of shingles verbatim across replicas, so t=0.5 prefix joins and the
    // exact recall-audit arm see the q107 artifact magnified; q123 joins
    // them because the per-replica "repN" token lands in EVERY doc of a
    // replica (dense topical-glue term). Under `wordsalt` no shingle
    // crosses replicas — all of them get real Nx slopes.
    val textGated = Seq("q169_lsh_recall", "q174_dedup_agreement",
      "q178_lsh_recall_sampled", "q114_dedup_threshold_sweep",
      "q115_cross_source_dups",
      // the sampled twins ride the same 0.5-threshold prefix join over
      // the sampled slice — cross-replica shingle sharing poisons them
      // exactly like q114/q115 under default salting (q213 rides the
      // same sampled pair frame)
      "q201_sweep_sampled", "q202_cross_source_sampled",
      "q213_removal_bootstrap",
      // default replication leaves every replica's 12-char prefix
      // verbatim -> quadratic identical-key pairs; wordsalt perturbs it
      "q181_edit_join")
    // q123's RELATIVE df cap under-protects a union of disjoint slices —
    // wordsalt makes every replica such a slice, and each replica's dense
    // tokens drop under the global 20% cap (measured 195x at 10x, a real
    // property of relative caps, not of the replication). It runs 1x only;
    // q187 (absolute cap) is the scale path and runs at Nx.
    val oneXOnly = Seq("q123_cosine_pairs")
    val extrasNx = extras ++
      (if (wordSalt) graphGated ++ textGated
       else if (mult <= 10) graphGated else Nil)
    val extras1x = extras ++ graphGated ++ textGated ++ oneXOnly
    val mode = if (wordSalt) " wordsalt" else ""
    if (!lite) {
      val lb = graft.Bench.loadavgJson()
      println(graft.Bench.jsonLine(graft.Bench.timeNamed(spark, src, extras1x),
        s"1x($src) extras", graft.Bench.sentinelJson(spark, lb)))
      spark.catalog.clearCache() // q62/q64 persist per-dir token frames
    }

    val lbHead = graft.Bench.loadavgJson()
    println(graft.Bench.jsonLine(graft.Bench.timeHeadline(spark, work),
      s"${mult}x($src)$mode", graft.Bench.sentinelJson(spark, lbHead)))
    if (!lite) {
      val lb = graft.Bench.loadavgJson()
      println(graft.Bench.jsonLine(graft.Bench.timeNamed(spark, work, extrasNx),
        s"${mult}x($src)$mode extras", graft.Bench.sentinelJson(spark, lb)))
    }
    spark.catalog.clearCache()
    if (!keep) fs.delete(new Path(work), true)
    spark.stop()
  }
}
