/* Lives under org.apache.spark.sql to access the private[sql] Expression<->
 * Column bridge (classic.ExpressionUtils) and AbstractDataType — the standard
 * technique for third-party native-expression libraries. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's HASH_CODE(str) scalar
  * (reference: flink-table/flink-table-runtime-blink/src/main/java/org/apache/flink/
  * table/runtime/functions/SqlFunctionUtils.java `hashCode`), i.e. JVM
  * `String.hashCode` semantics.
  *
  * Implemented with `doGenCode` so it participates in whole-stage codegen —
  * the preferred extension path over a Scala UDF (which would box rows and
  * break the codegen span).
  */
case class JvmHashCodeExpression(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "hash_code"

  override protected def nullSafeEval(input: Any): Any =
    input.asInstanceOf[UTF8String].toString.hashCode

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$c.toString().hashCode()")

  override protected def withNewChildInternal(newChild: Expression): JvmHashCodeExpression =
    copy(child = newChild)
}

/** Expression <-> Column bridge for graft's native expressions. */
object GraftExpressions {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def jvmHashCode(col: Column): Column =
    column(JvmHashCodeExpression(expression(col)))
}
