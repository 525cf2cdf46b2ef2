package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Passage-level (sub-document) deduplication: split each document into
  * fixed-width word windows ("passages"), keep only the globally FIRST
  * occurrence of every distinct passage, and reassemble the surviving
  * passages into a cleaned document — the paragraph-dedup step of web-corpus
  * pipelines (boilerplate paragraphs repeat across millions of pages even
  * when no two whole documents are near-duplicates).
  *
  * Passage boundary: the natural unit is a paragraph split on a delimiter;
  * the testdata has no newlines, so the operator windows on word count —
  * callers with real paragraph structure pass their own pre-split frame
  * through the same keep/reassemble machinery.
  *
  * Scale shape (deliberately groupBy+join, NOT a window over the passage
  * hash): the first-occurrence owner per passage is a `groupBy(h).agg(min)`,
  * which partial-aggregates map-side — a boilerplate passage duplicated
  * across 10^8 documents contributes one row per map task to the shuffle,
  * where `row_number over (partition by h)` would materialize all 10^8 in
  * one sort partition. The join back to the exploded passages reuses the
  * hash partitioning on `h`. Total: two shuffles on `h` + the final
  * reassembly shuffle on doc_id (skew bounded by the longest document).
  *
  * First-occurrence key packs (doc_id, idx) into one long —
  * `doc_id * 2^20 + idx` — so the group min is a single numeric column;
  * requires idx < 2^20 (a million passages per doc) and doc_id < 2^43,
  * enforced below.
  */
object PassageDedup {

  /** doc_id, n_passages, n_kept, clean_text (word-windowed passages of
    * `passageWords`, global first occurrence kept, survivors rejoined in
    * document order; "" when every passage of a doc occurred earlier).
    */
  def dedupPassages(df: DataFrame, idCol: String, textCol: String,
      passageWords: Int): DataFrame = {
    require(passageWords > 0, s"passageWords must be positive, got $passageWords")
    val p = passageWords
    val docs = graft.operators.Parallelism.ensure(
      df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("_t")))
    val passages = docs
      .select(col("doc_id"), TextFunctions.tokens(col("_t")).as("w"))
      .select(col("doc_id"),
        when(size(col("w")) > 0,
          expr(s"transform(sequence(0, (size(w) - 1) div $p), " +
            s"i -> array_join(slice(w, i * $p + 1, $p), ' '))"))
          .otherwise(array().cast("array<string>")).as("ps"))
      .select(col("doc_id"), posexplode(col("ps")).as(Seq("idx", "passage")))
      .withColumn("h", md5(col("passage")))
      .withColumn("_key", col("doc_id") * lit(1L << 20) + col("idx"))
      // consumed twice (owner aggregate + join back): persist so the
      // split/md5 pipeline runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // owner of each distinct passage = min (doc_id, idx); partial-agg'd
    val owners = passages.groupBy(col("h")).agg(min(col("_key")).as("_owner"))
    passages.join(owners, "h")
      .withColumn("kept", col("_key") === col("_owner"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips the nulls from the un-kept when(); struct sort
        // is by idx (first field), restoring document order
        concat_ws(" ", transform(
          array_sort(collect_list(
            when(col("kept"), struct(col("idx"), col("passage"))))),
          s => s.getField("passage"))).as("clean_text"))
  }

  /** Duplication-aware ("soft dedup") sampling weights: instead of dropping
    * exact duplicates, weight every member of a duplicate group by
    * 1/group_size so the group contributes one document's worth of
    * probability mass to training. Output: doc_id, group_size, weight_ppm.
    *
    * Same groupBy+join shape as [[dedupPassages]]'s owner step (and unlike
    * q19's window formulation): the per-hash count partial-aggregates, so a
    * pathological 10^8-way duplicate costs one shuffle row per map task.
    */
  def softDedupWeights(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"), md5(col(textCol)).as("h"))
    val sizes = docs.groupBy(col("h"))
      .agg(count(lit(1)).as("group_size"))
    docs.join(sizes, "h")
      .select(col("doc_id"), col("group_size"),
        expr("1000000 div group_size").as("weight_ppm"))
  }
}
