package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing between graft's native Catalyst expressions
  * and the public Column API. Spark 4 hides Column↔Expression conversion
  * behind `private[sql]` (`classic.ExpressionUtils`), so this object lives in
  * an `org.apache.spark.sql` subpackage to forward the two calls — the same
  * approach every library shipping native expressions uses. Nothing else
  * belongs here.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
