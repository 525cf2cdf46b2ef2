package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Embedding-space monitoring: per-group centroid drift against the global
  * centroid — the standard alarm for a 100 TB embedding pipeline (a model
  * revision, a bad batch, or a domain shift moves one slice's centroid
  * while the corpus centroid stays put).
  *
  * Determinism: per-element values quantize to integer micro units at the
  * scan, so ALL distributed sums (per-dimension, per-group, global) are
  * exact integer arithmetic — float summation order never matters. The
  * final cosine divides with one rounded double expression per group.
  *
  * Scale shape: the per-(group, dim) explode partial-aggregates map-side,
  * so the exchange carries at most groups × dims partial rows per
  * partition — never the vector rows; the 64-row global-centroid frame
  * joins back by broadcast.
  */
object EmbeddingStats {

  /** Per group: vector count and the cosine (in exact integer micro units)
    * between the group's mean vector and the corpus-wide mean vector.
    * Degenerate all-zero centroids report cosine 0.
    */
  def centroidDrift(emb: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val perDim = emb
      .select(col(groupCol),
        posexplode(col(vecCol).cast(ArrayType(DoubleType))).as(Seq("_graft_d", "_graft_x")))
      .select(col(groupCol), col("_graft_d"),
        round(col("_graft_x") * 1000000.0d).cast("long").as("_graft_xm"))
      .groupBy(col(groupCol), col("_graft_d"))
      .agg(sum(col("_graft_xm")).as("s"), count(lit(1)).as("n"))
    val globalDim = perDim.groupBy(col("_graft_d"))
      .agg(sum(col("s")).as("gs"), sum(col("n")).as("gn"))
    val m: Column = (col("s").cast("double") / 1000000.0d) / col("n").cast("double")
    val gm: Column = (col("gs").cast("double") / 1000000.0d) / col("gn").cast("double")
    perDim.join(broadcast(globalDim), Seq("_graft_d"))
      .select(col(groupCol), col("n"),
        round(m * gm * 1000000.0d).cast("long").as("_graft_dot"),
        round(m * m * 1000000.0d).cast("long").as("_graft_mm"),
        round(gm * gm * 1000000.0d).cast("long").as("_graft_gg"))
      .groupBy(col(groupCol))
      .agg(max(col("n")).as("n_vecs"),
        sum(col("_graft_dot")).as("_graft_dot"),
        sum(col("_graft_mm")).as("_graft_mm"),
        sum(col("_graft_gg")).as("_graft_gg"))
      .select(col(groupCol), col("n_vecs"),
        when(col("_graft_mm") === 0L || col("_graft_gg") === 0L, lit(0L))
          .otherwise(round(lit(1000000.0d) * col("_graft_dot").cast("double") /
            sqrt(col("_graft_mm").cast("double") * col("_graft_gg").cast("double")))
            .cast("long"))
          .as("cos_micro"))
  }
}
