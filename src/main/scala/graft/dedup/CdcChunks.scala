package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the rsync / LBFS / FastCDC family): cut every
  * document into variable-size chunks whose boundaries depend only on the
  * LOCAL content — a window hash hitting a residue — so an insertion early
  * in a document shifts no later boundary, and chunk-level dedup
  * (`group by chunk_md5`) still matches everything after the edit. The
  * storage-dedup primitive, applied to corpus text: near-identical crawl
  * snapshots share almost all chunks, and a chunk-hash join finds shared
  * content at any offset — complementary to word-n-gram spans (DupSpans,
  * which require token alignment) and winnowing (which samples).
  *
  * A position i (1-based, i ≥ w) is a boundary iff
  *   H(i) = Σ_{j=0}^{w-1} code(c_{i-j}) · B^j  mod M  ≡  M-residue test
  * (here `H(i) mod D == D-1`), giving expected chunk length D with no
  * minimum/maximum clamp: clamps reintroduce sequential state (a boundary
  * then depends on the previous boundary), which would break both the
  * shift-resistance property and the declarative formulation. Expected
  * length D bounds chunk sizes probabilistically; adversarial constant
  * text yields long chunks — cap at the consumer if that matters.
  *
  * Scale shape: pure per-row HOF pipeline over bound attribute arrays
  * (codes → window hashes → boundary ends → starts), all inside
  * whole-stage codegen, NO shuffle of any kind — embarrassingly parallel
  * over a 100 TB corpus. O(w·n) per document with w=16 fixed.
  *
  * Determinism: integer polynomial arithmetic mod M; md5 chunk ids; the
  * oracle SQL is generated from the same (B, M, D, w) constants.
  */
object CdcChunks {

  /** window length */
  val W = 16
  /** polynomial base (coprime to M) */
  val B = 257L
  /** hash modulus (prime; keeps Σ 16·255·M under 2^63) */
  val M = 1000003L
  /** boundary divisor: expected chunk length */
  val D = 64L

  /** B^j mod M for j = 0..w-1 — weight of the char j positions back */
  val Pows: IndexedSeq[Long] =
    Iterator.iterate(1L)(p => p * B % M).take(W).toIndexedSeq

  /** (idCol, chunk_seq, start_pos, chunk_len, chunk_md5) per document —
    * 0-based chunk_seq, 1-based char start_pos. Documents shorter than the
    * window (or any doc with no boundary hit) are one whole-text chunk;
    * empty texts are dropped.
    */
  def chunks(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withCodes = graft.operators.Parallelism.ensure(
        docs.select(col(idCol), col(textCol)))
      .filter(length(col(textCol)) >= 1)
      // bind the code array to an attribute BEFORE the hash HOF: Catalyst
      // re-evaluates outer expressions inside every lambda
      .select(col(idCol), col(textCol).as("_graft_text"),
        length(col(textCol)).cast("long").as("_graft_n"),
        transform(
          filter(split(col(textCol), ""), c => c =!= ""),
          c => ascii(c).cast("long")).as("_graft_codes"))
    val codes = col("_graft_codes")
    val n = col("_graft_n")
    // window hash at end-position i: Σ_j code(i-j) · B^j mod M
    def winHash(i: Column): Column =
      Pows.zipWithIndex.map { case (p, j) =>
        element_at(codes, (i - j).cast("int")) * lit(p)
      }.reduce(_ + _) % lit(M)
    val boundaryEnds = filter(
      when(n >= W, transform(sequence(lit(W.toLong), n), i => i))
        .otherwise(array().cast("array<bigint>")),
      i => winHash(i) % lit(D) === lit(D - 1))
    val withEnds = withCodes.select(col(idCol), col("_graft_text"), n,
      boundaryEnds.as("_graft_bends"))
    // chunk ends = boundaries plus the text end (unless it already is one)
    val bends = col("_graft_bends")
    val ends = when(size(bends) >= 1 && element_at(bends, -1) === n, bends)
      .otherwise(concat(bends, array(n)))
    val withChunks = withEnds.select(col(idCol), col("_graft_text"),
      ends.as("_graft_ends"))
    val endsC = col("_graft_ends")
    val starts = concat(array(lit(1L)),
      when(size(endsC) >= 2,
        transform(sequence(lit(1), size(endsC) - 1), k =>
          element_at(endsC, k) + 1))
        .otherwise(array().cast("array<bigint>")))
    withChunks
      .select(col(idCol), col("_graft_text"),
        posexplode(arrays_zip(starts.as("s"), endsC.as("e"))))
      .select(col(idCol),
        col("pos").as("chunk_seq"),
        col("col.s").as("start_pos"),
        (col("col.e") - col("col.s") + 1L).as("chunk_len"),
        md5(substring(col("_graft_text"), col("col.s").cast("int"),
          (col("col.e") - col("col.s") + 1L).cast("int"))).as("chunk_md5"))
  }

  /** DuckDB replica over `documents`, generated from the same constants */
  def oracleSql: String = {
    val terms = Pows.zipWithIndex.map { case (p, j) =>
      s"ascii(substr(text, CAST(i - $j AS INT), 1)) * $p"
    }.mkString(" + ")
    s"""WITH d AS (SELECT doc_id, text, CAST(len(text) AS BIGINT) AS n
       |    FROM documents WHERE len(text) >= 1),
       |hb AS (SELECT doc_id, text, n,
       |    list_filter(range($W, n + 1),
       |      i -> ($terms) % $M % $D = ${D - 1}) AS bends
       |  FROM d),
       |ec AS (SELECT doc_id, text,
       |    CASE WHEN len(bends) >= 1 AND bends[-1] = n THEN bends
       |      ELSE bends || [n] END AS ends
       |  FROM hb),
       |sc AS (SELECT doc_id, text, ends,
       |    [CAST(1 AS BIGINT)] || list_transform(range(1, len(ends)),
       |      k -> ends[CAST(k AS INT)] + 1) AS starts
       |  FROM ec),
       |ch AS (SELECT doc_id, text,
       |    unnest(list_transform(range(1, len(ends) + 1),
       |      k -> {'seq': k - 1, 's': starts[CAST(k AS INT)],
       |            'e': ends[CAST(k AS INT)]})) AS u
       |  FROM sc)
       |SELECT doc_id, CAST(u.seq AS INTEGER) AS chunk_seq,
       |  u.s AS start_pos, u.e - u.s + 1 AS chunk_len,
       |  md5(substr(text, CAST(u.s AS INT), CAST(u.e - u.s + 1 AS INT)))
       |    AS chunk_md5
       |FROM ch ORDER BY doc_id, chunk_seq""".stripMargin
  }
}
