package graft.api

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

import graft.dedup.Dedup
import graft.functions.{GoldRush, GoldRush2021, JsonPathLite}
import graft.text.TextFunctions

/** SQL-surface registration: exposes the engine's scalar function library to
  * `spark.sql(...)` so the operators compose from plain SQL too.
  *
  * Registered names:
  *   goldrush_matchkey(payloadJson), goldrush2021_matchkey(payloadJson),
  *   jsonpath_strings(json, path), graft_shingles(text, n),
  *   graft_minhash(shingles, k), graft_band_hashes(shingles, k, bands)
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("goldrush_matchkey", udf((p: String) =>
      try GoldRush.matchkeyFromPayload(p)
      catch { case e: Exception => null: String }))
    spark.udf.register("goldrush2021_matchkey", udf((p: String) =>
      try GoldRush2021.matchkeyFromPayload(p)
      catch { case e: Exception => null: String }))
    spark.udf.register("jsonpath_strings", udf((json: String, path: String) =>
      JsonPathLite.strings(json, path)))
    spark.udf.register("graft_shingles", udf((text: String, n: Int) =>
      Dedup.shinglesOf(text, n)))
    spark.udf.register("graft_minhash", udf((sh: Seq[String], k: Int) =>
      Dedup.minhashOf(sh, k)))
    spark.udf.register("graft_band_hashes",
      udf((sh: Seq[String], k: Int, bands: Int) =>
        Dedup.bandHashesOf(Dedup.minhashOf(sh, k), bands, k / bands)))
    ()
  }
}
