package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-bounded self-join over SHORT strings (titles, names,
  * normalized keys) — the record-linkage fuzzy-match primitive that
  * shingle-Jaccard misses (a one-character typo in a 12-char title moves
  * every 3-gram) and all-pairs levenshtein can't afford.
  *
  * Candidate generation is the deletion-neighborhood method (FastSS,
  * Bocek et al. 2007): every string emits all variants obtainable by at
  * most `maxDist` character DELETIONS; two strings within edit distance d
  * (insert/delete/substitute) always share at least one ≤d-deletion
  * variant, so an equi-join on variants is a LOSSLESS candidate filter —
  * false positives are removed by one exact `levenshtein` check per
  * candidate pair. Neighborhood size is O(|s|^d) per row (bounded: the
  * operator contract is short strings), and the join is a plain shuffle
  * equi-join on the variant — no cartesian product at any scale.
  *
  * `maxDf` caps the document frequency of a variant before the self-join
  * (the containment-join maxDf pattern): a variant shared by more rows
  * than the cap generates no candidates. With a cap the join cost is
  * bounded by maxDf² per variant; recall is complete unless EVERY shared
  * variant of a true pair is above-cap. `maxDf = None` (the gate setting)
  * keeps the operator exact.
  *
  * Output: (id1, id2, s1, s2, dist) for unordered pairs with
  * `dist = levenshtein(s1, s2) <= maxDist`, id1 < id2. Empty strings are
  * excluded (their neighborhoods collapse onto every 1-char string's).
  */
object EditDistance {

  /** all distinct strings reachable by deleting at most one char (SQL
    * fragment over a bound attribute `a`) */
  private def del1(a: String): String =
    s"""array_distinct(concat(array($a), CASE WHEN length($a) < 1
       |  THEN array() ELSE transform(sequence(1, length($a)),
       |    i -> concat(substr($a, 1, i - 1), substr($a, i + 1))) END))"""
      .stripMargin

  /** Caching note: with `maxDf` set, the capped variant frame persists
    * (MEMORY_AND_DISK) and — the result being lazy — stays pinned until
    * the caller runs `spark.catalog.clearCache()` after its last action
    * (the Verify gate does this between queries).
    */
  def deletionNeighborhoodJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int, maxDf: Option[Long] = None): DataFrame = {
    require(maxDist == 1 || maxDist == 2,
      s"maxDist must be 1 or 2 (neighborhoods are O(|s|^d)), got $maxDist")
    val base = graft.operators.Parallelism.ensure(
      df.select(col(idCol).as("_id"), col(strCol).as("_s"))
        .filter(col("_s").isNotNull && length(col("_s")) > 0))
    // bind _s to an attribute BEFORE the HOF (the q62 lesson: Catalyst
    // re-evaluates outer expressions inside every lambda)
    val variants =
      if (maxDist == 1) expr(del1("_s"))
      else expr(s"""array_distinct(flatten(transform(${del1("_s")},
                   |  v -> ${del1("v")})))""".stripMargin)
    // The raw variant explode stays UNPERSISTED even though the self-join
    // references it twice: the dist-1 neighborhood is cheap enough that
    // recomputing it inside each join side's codegen stage beats columnar
    // cache reads (r14 A/B at 10×: persisting ex made q181's warm pass
    // 2.2× SLOWER, cold neutral). The CAPPED frame is different — it
    // carries a full agg+join chain, so its two self-join references
    // would re-run that chain; persisting it won the A/B (q208-style
    // composition finding).
    val ex = base.select(col("_id"), col("_s"), explode(variants).as("_v"))
    val capped = maxDf.fold(ex) { cap =>
      val freq = ex.groupBy(col("_v")).agg(count(lit(1)).as("_df"))
      ex.join(freq.filter(col("_df") <= cap).select(col("_v")), "_v")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    capped.as("a").join(capped.as("b"),
        col("a._v") === col("b._v") && col("a._id") < col("b._id"))
      .select(col("a._id").as("id1"), col("b._id").as("id2"),
        col("a._s").as("s1"), col("b._s").as("s2"))
      .distinct()
      .withColumn("dist", levenshtein(col("s1"), col("s2")).cast("int"))
      .filter(col("dist") <= maxDist)
  }
}
