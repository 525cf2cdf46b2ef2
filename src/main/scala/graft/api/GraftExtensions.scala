package graft.api

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{CosineSimilarity, DotProduct, GoldRushMatchKey}

/** Session-extension entry point: install the engine's native functions into
  * every session created with
  * `spark.sql.extensions=graft.api.GraftExtensions` (no code required on the
  * user side — the idiomatic cluster-wide registration path).
  *
  * Currently injects `goldrush_matchkey` as a native Catalyst expression
  * (null-safe, foldable for literal input); `GraftFunctions.register` remains
  * the programmatic per-session alternative with the full UDF set.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("goldrush_matchkey"),
      new ExpressionInfo(classOf[GoldRushMatchKey].getName, "goldrush_matchkey"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "goldrush_matchkey takes one argument")
        GoldRushMatchKey(children.head)
      }))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product takes two arguments")
        DotProduct(children.head, children(1))
      }))
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "cosine_sim takes two arguments")
        CosineSimilarity(children.head, children(1))
      }))
  }
}
