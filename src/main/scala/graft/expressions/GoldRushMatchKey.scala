package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.GoldRush

/** `goldrush_matchkey(payloadJson)` as a native Catalyst expression: proper
  * null propagation, constant folding on literal input, and no UDF
  * serialization overhead (the kernel is string-heavy, so codegen falls back
  * to interpreted eval — the expression form still beats a ScalaUDF by
  * skipping the encoder round-trip).
  */
case class GoldRushMatchKey(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  // broken payloads evaluate to null even for non-null input
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val json = input.asInstanceOf[UTF8String].toString
    try UTF8String.fromString(GoldRush.matchkeyFromPayload(json))
    catch { case _: Exception => null }
  }

  override def prettyName: String = "goldrush_matchkey"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
