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

  // ---- single-pass scalar kernels -------------------------------------
  // The pure-Column formulations below (minhashSignature/lshBandHashes)
  // document the algorithm and match the SQL oracle 1:1, but Catalyst
  // re-evaluates outer expressions inside every higher-order-function
  // lambda (the shingle array would be rebuilt once per seed), which is a
  // 10-100× slowdown. The hot paths therefore use these Scala kernels —
  // one pass per row, byte-identical md5 hex output.

  private val md5tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = md5tl.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val v = bytes(i) & 0xff
      out(i * 2) = hexChars(v >>> 4)
      out(i * 2 + 1) = hexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  private val wsSplit = java.util.regex.Pattern.compile("\\s+")

  /** distinct n-word shingles, first-occurrence order (same set as
    * TextFunctions.shingles)
    */
  def shinglesOf(text: String, n: Int): Seq[String] = {
    val toks = wsSplit.split(text, -1)
    if (toks.length < n) Nil
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= toks.length) {
        val sb = new StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString); i += 1
      }
      import scala.jdk.CollectionConverters._
      seen.asScala.toSeq
    }
  }

  /** k min-hashes over a shingle set (identical to minhashSignature).
    * Byte-identical to min(md5Hex(s + ":" + w)) but allocation-lean: shingle
    * UTF-8 bytes are encoded once, the digest consumes prefix and shingle
    * separately (UTF-8 concatenation is byte concatenation), candidates
    * compare as unsigned byte arrays (hex is order-preserving), and only
    * each seed's winner is hex-encoded.
    */
  def minhashOf(shingles: Seq[String], k: Int): Seq[String] =
    minhashOfBytes(shingles.map(_.getBytes("UTF-8")).toArray, k)

  /** the same kernel over pre-encoded shingles — the native expression path
    * hands in UTF8String bytes directly, skipping String round-trips
    */
  def minhashOfBytes(shingleBytes: Array[Array[Byte]], k: Int): Seq[String] = {
    val d = md5tl.get()
    (0 until k).map { s =>
      val prefix = (s.toString + ":").getBytes("UTF-8")
      var min: Array[Byte] = null
      var i = 0
      while (i < shingleBytes.length) {
        d.reset()
        d.update(prefix)
        d.update(shingleBytes(i))
        val h = d.digest()
        if (min == null || java.util.Arrays.compareUnsigned(h, min) < 0) min = h
        i += 1
      }
      if (min == null) null else hexOf(min)
    }
  }

  private def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      val v = bytes(i) & 0xff
      out(i * 2) = hexChars(v >>> 4)
      out(i * 2 + 1) = hexChars(v & 0xf)
      i += 1
    }
    new String(out)
  }

  /** banded hashes of a signature (identical to lshBandHashes) */
  def bandHashesOf(sig: Seq[String], bands: Int, rows: Int): Seq[String] =
    (0 until bands).map(j =>
      j.toString + ":" + md5Hex(sig.slice(j * rows, j * rows + rows).mkString(",")))

  // ---- column forms: native expressions over UTF8String bytes (no UDF
  // converter round-trip); see graft.expressions.DedupExpressions

  /** text → distinct shingle array (single pass) */
  def shingles(text: Column, n: Int): Column =
    graft.expressions.DedupExpressions.shingles(text, n)

  /** shingles → minhash signature (single pass) */
  def minhashSig(sh: Column, k: Int): Column =
    graft.expressions.DedupExpressions.minhashSig(sh, k)

  /** shingles → band-qualified LSH bucket hashes (single pass) */
  def minhashBands(sh: Column, k: Int, bands: Int): Column =
    graft.expressions.DedupExpressions.minhashBands(sh, k, bands)

  /** legacy udf forms (same kernels behind a ScalaUDF — each row pays the
    * CatalystTypeConverters round-trip; prefer the column forms above)
    */
  def shingleUdf(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => shinglesOf(text, n))

  def minhashUdf(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sh: Seq[String]) => minhashOf(sh, k))

  def bandUdf(k: Int, bands: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sh: Seq[String]) => bandHashesOf(minhashOf(sh, k), bands, k / bands))

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
    *
    * `maxBucketSize` guards the 100 TB skew case: a corpus with a large
    * exact-duplicate group puts every member in the same band buckets, and
    * the self-join then emits |group|² candidate pairs per band. Buckets
    * above the cap are dropped before the join (standard practice in
    * large-scale dedup; run exact dedup first so identical documents never
    * reach this stage, then the cap only skips degenerate buckets). The
    * default is uncapped — exact recall.
    */
  def nearDuplicatesMinhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5,
      maxBucketSize: Int = Int.MaxValue): DataFrame = {
    val docs = graft.operators.Parallelism.ensure(
        df.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), shingles(col(textCol), shingleLen).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = docs.select(col("doc_id"),
      explode(minhashBands(col("sh"), numHashes, bands)).as("bhash"))
    val gated =
      if (maxBucketSize == Int.MaxValue) banded
      else {
        // per-bucket counts share the self-join's bhash partitioning, so
        // this adds no extra exchange of the banded frame
        val ok = banded.groupBy("bhash").agg(count(lit(1)).as("_n"))
          .filter(col("_n") <= maxBucketSize).select("bhash")
        banded.join(ok, "bhash")
      }
    val candidates = gated.as("x").join(gated.as("y"),
        col("x.bhash") === col("y.bhash")
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
    val docs = graft.operators.Parallelism.ensure(
        df.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"), shingles(col(textCol), shingleLen).as("sh"))
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
    * simhashes, id1 < id2.
    *
    * Blocked, not all-pairs: the 16 bits are split into maxHamming+1
    * contiguous bands, and candidates come from an equi-join on
    * (band, band bits). By pigeonhole a pair with ≤ maxHamming differing
    * bits must agree on at least one band, so recall is exact; the
    * per-bucket join keeps the pair count near-linear — the same frame as
    * MinHash-LSH, but lossless. Exact hamming is verified on candidates.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16,
      s"maxHamming must be in [0,15], got $maxHamming")
    val sh = graft.operators.Parallelism.ensure(
        df.select(col(idCol).as("doc_id"), col(textCol)))
      .select(col("doc_id"),
        simhash16(TextFunctions.tokens(col(textCol))).as("simhash"))
    val nBands = maxHamming + 1
    val bounds = (0 to nBands).map(i => i * 16 / nBands)
    val bandKeys = (0 until nBands).map { b =>
      val lo = bounds(b)
      val mask = (1 << (bounds(b + 1) - lo)) - 1
      struct(lit(b).as("band"),
        shiftright(col("simhash"), lo).bitwiseAND(lit(mask)).as("bits"))
    }
    val banded = sh.select(col("doc_id"), col("simhash"),
      explode(array(bandKeys: _*)).as("bk"))
    banded.as("a").join(banded.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"),
        col("a.simhash").as("simhash1"), col("b.simhash").as("simhash2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("simhash1").bitwiseXOR(col("simhash2"))))
      .filter(col("hamming") <= maxHamming)
  }
}
