package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** Deduplication operators for large-scale corpus pipelines: exact
  * (hash-group), MinHash+LSH (band-bucket candidate generation, the scale
  * path), n-gram Jaccard verification, and SimHash.
  *
  * Scale design: the only shuffles are (a) the band-bucket exchange, keyed by
  * (band, bandHash) — O(docs × bands) rows, and (b) the candidate-pair join.
  * Signatures are computed with higher-order functions per row (no explode of
  * shingles across rows), so the pre-LSH stage is shuffle-free and codegen'd.
  * All-pairs Jaccard is intentionally NOT the default: candidates come from
  * LSH buckets, keeping the pair count near-linear for realistic corpora.
  */
object Dedup {

  /** Annotate each row with an exact-dup hash and the duplicate count. */
  def exactDuplicates(df: DataFrame, text: Column, id: Column): DataFrame = {
    val h = md5(text)
    val w = Window.partitionBy(h)
    df.withColumn("text_md5", h)
      .withColumn("dup_count", count(lit(1)).over(w))
      .withColumn("keep", row_number().over(w.orderBy(id)) === 1)
  }

  /** MinHash signature of a shingle array: k independent permutations
    * simulated as min over md5("seed:shingle"). Pure per-row computation.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(sh, w => md5(concat(i.cast("string"), lit(":"), w)))))

  /** LSH band hashes: the signature is cut into `bands` bands of `rows`
    * minhashes; each band is hashed. Docs sharing any band hash become
    * candidate pairs.
    */
  def lshBandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), j =>
      struct(j.as("band"),
        md5(concat_ws(",", slice(sig, j * rows + 1, lit(rows)))).as("bhash")))

  /** Full MinHash-LSH near-duplicate pipeline over (id, text):
    * shingle → sign → band → bucket-join → Jaccard-verify ≥ threshold.
    * Returns (id1, id2, jaccard) with id1 < id2.
    */
  def nearDuplicatesMinhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val signed = docs.withColumn("sig",
      minhashSignature(col("sh"), numHashes))
    val banded = signed.select(col("doc_id"),
        explode(lshBandHashes(col("sig"), bands, numHashes / bands)).as("b"))
      .select(col("doc_id"), col("b.band"), col("b.bhash"))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"))
      .distinct()
    jaccardVerify(candidates, docs, threshold)
  }

  /** Exact set-Jaccard on candidate pairs against the shingle sets. */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, threshold: Double): DataFrame = {
    val d1 = docs.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val d2 = docs.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    pairs.join(d1, "id1").join(d2, "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** All-pairs n-gram Jaccard via shingle explode + equi-join (exact but
    * quadratic in matching pairs — use the LSH variant at scale).
    */
  def allPairsJaccard(df: DataFrame, idCol: String, textCol: String,
      shingleLen: Int, threshold: Double): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        TextFunctions.shingles(TextFunctions.tokens(col(textCol)), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val words = docs.select(col("doc_id"), explode(col("sh")).as("w"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = words.as("a").join(words.as("b"),
        col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("n").as("n1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("n").as("n2")), "id2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("inter"), col("jaccard"))
  }

  /** 16-bit SimHash over the token multiset. Bit b is set when the sum of
    * ±1 votes (per-token md5 bit b) is positive. Pure per-row arithmetic on
    * hex nibbles — no UDF, portable to the SQL oracle.
    */
  def simhash16(toks: Column): Column = {
    def bitOf(w: Column, b: Int): Column = {
      val nib = (instr(lit("0123456789abcdef"),
        substring(md5(w), b / 4 + 1, 1)) - 1).cast("int")
      val shifted = Seq(8, 4, 2, 1)(b % 4)
      (nib / shifted).cast("int") % 2
    }
    (0 until 16).map { b =>
      val votes = aggregate(toks, lit(0),
        (acc, w) => acc + when(bitOf(w, b) === 1, 1).otherwise(-1))
      when(votes > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** SimHash near-dup pairs: hamming distance ≤ maxHamming over 16-bit
    * simhashes, id1 < id2. (At scale: block on simhash bytes first.)
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    val sh = df.select(col(idCol).as("doc_id"),
      simhash16(TextFunctions.tokens(col(textCol))).as("simhash"))
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("simhash1"), col("b.simhash").as("simhash2"),
        col("hamming"))
  }
}
