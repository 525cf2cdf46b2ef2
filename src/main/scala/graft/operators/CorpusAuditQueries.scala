package graft.operators

import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.PassageDedup
import graft.text.TextFunctions

/** Round-9 corpus-engineering operators: passage-level (sub-document)
  * dedup with reassembly, duplication-aware soft-dedup weights,
  * sequence-length bucketing / padding-waste audit, and n-gram diversity
  * (type-token ratio) profiling.
  *
  * Oracle parity: pure integer arithmetic end-to-end (counts, ppm ratios via
  * integer div, power-of-two caps via binary-string length — no libm).
  */
object CorpusAuditQueries {

  def all: Seq[Q] = Seq(

    // ---- passage-level dedup (the paragraph-dedup step of web pipelines):
    // 10-word windows, global first occurrence kept, survivors reassembled
    Q("q104_passage_dedup",
      (s, d) => {
        val t = Tables(s, d)
        PassageDedup.dedupPassages(t.documents, "doc_id", "text",
            passageWords = 10)
          .orderBy(col("doc_id"))
      },
      Some("""WITH ws AS (SELECT doc_id, regexp_split_to_array(text, '\s+') AS w
             |    FROM documents),
             |p AS (SELECT doc_id, u AS idx,
             |    array_to_string(list_slice(w, u*10+1, u*10+10), ' ') AS passage
             |  FROM (SELECT doc_id, w, unnest(range(0, (len(w)+9)//10)) AS u
             |        FROM ws)),
             |k AS (SELECT md5(passage) AS h, min(doc_id*1048576 + idx) AS owner
             |  FROM p GROUP BY 1),
             |m AS (SELECT p.doc_id, p.idx, p.passage,
             |    (p.doc_id*1048576 + p.idx = k.owner) AS kept
             |  FROM p JOIN k ON md5(p.passage) = k.h)
             |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_passages,
             |  CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
             |  coalesce(string_agg(passage, ' ' ORDER BY idx)
             |    FILTER (WHERE kept), '') AS clean_text
             |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // ---- soft dedup: weight duplicate-group members by 1/size instead of
    // dropping them (group+join, partial-agg'd — see PassageDedup scaladoc)
    Q("q105_softdedup_weights",
      (s, d) => {
        val t = Tables(s, d)
        PassageDedup.softDedupWeights(t.documents, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, md5(text) AS m FROM documents),
             |g AS (SELECT m, CAST(count(*) AS BIGINT) AS group_size
             |  FROM h GROUP BY m)
             |SELECT doc_id, group_size,
             |  CAST(1000000 AS BIGINT) // group_size AS weight_ppm
             |FROM h JOIN g ON h.m = g.m ORDER BY doc_id""".stripMargin)),

    // ---- sequence-length bucketing audit: next-pow2 caps (floor 16), the
    // padding a fixed-length batcher would waste per bucket. cap via
    // 1 << bitlength(n-1) — exact integers, no log2 (libm-dependent at
    // powers of two)
    Q("q110_padding_waste",
      (s, d) => {
        val t = Tables(s, d)
        t.documents
          .select(TextFunctions.tokenCount(col("text")).cast("long").as("n"))
          .select(col("n"), greatest(lit(16L),
            when(col("n") <= 1, lit(1L)).otherwise(
              expr("shiftleft(CAST(1 AS BIGINT), length(bin(n - 1)))")))
            .as("cap"))
          .groupBy(col("cap"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("sum_tokens"))
          .select(col("cap"), col("n_docs"), col("sum_tokens"),
            (col("cap") * col("n_docs") - col("sum_tokens")).as("padding_tokens"),
            expr("((cap * n_docs - sum_tokens) * 1000000) div (cap * n_docs)")
              .as("waste_ppm"))
          .orderBy(col("cap"))
      },
      Some("""WITH t AS (SELECT CAST(len(regexp_split_to_array(text, '\s+'))
             |    AS BIGINT) AS n FROM documents),
             |c AS (SELECT n, CAST(greatest(16, CASE WHEN n <= 1 THEN 1
             |    ELSE 1 << length(bin(n - 1)) END) AS BIGINT) AS cap FROM t)
             |SELECT cap, CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n) AS BIGINT) AS sum_tokens,
             |  cap * CAST(count(*) AS BIGINT) - CAST(sum(n) AS BIGINT)
             |    AS padding_tokens,
             |  ((cap * CAST(count(*) AS BIGINT) - CAST(sum(n) AS BIGINT))
             |    * 1000000) // (cap * CAST(count(*) AS BIGINT)) AS waste_ppm
             |FROM c GROUP BY cap ORDER BY cap""".stripMargin)),

    // ---- n-gram diversity (type-token ratio at n=1..3) per source: the
    // template-detection signal (low TTR = generated/boilerplate-heavy)
    Q("q111_ngram_diversity",
      (s, d) => {
        val t = Tables(s, d)
        val base = t.documents
          .select(col("source"), TextFunctions.tokens(col("text")).as("w"))
        (1 to 3).map { n =>
          base.select(col("source"), lit(n).as("n"),
            explode(TextFunctions.ngrams(col("w"), n)).as("g"))
        }.reduce(_ union _)
          .groupBy(col("source"), col("n"))
          .agg(count(lit(1)).as("total"), countDistinct(col("g")).as("types"))
          .select(col("source"), col("n"), col("total"), col("types"),
            expr("(types * 1000000) div total").as("ttr_ppm"))
          .orderBy(col("source"), col("n"))
      },
      Some("""WITH t AS (SELECT source, regexp_split_to_array(text, '\s+') AS w
             |    FROM documents),
             |g AS (
             |  SELECT source, 1 AS n, unnest(w) AS g FROM t
             |  UNION ALL
             |  SELECT source, 2 AS n, unnest(list_transform(range(1, len(w)),
             |    i -> w[i] || ' ' || w[i+1])) AS g FROM t
             |  UNION ALL
             |  SELECT source, 3 AS n, unnest(list_transform(range(1, len(w)-1),
             |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g FROM t)
             |SELECT source, n, CAST(count(*) AS BIGINT) AS total,
             |  CAST(count(DISTINCT g) AS BIGINT) AS types,
             |  (CAST(count(DISTINCT g) AS BIGINT) * 1000000)
             |    // CAST(count(*) AS BIGINT) AS ttr_ppm
             |FROM g GROUP BY source, n ORDER BY source, n""".stripMargin)))
}
