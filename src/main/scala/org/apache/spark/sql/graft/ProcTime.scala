/* Lives under org.apache.spark.sql for the same private[sql] bridge access
 * as JvmHashCode.scala. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, TimestampType}

/** PROCTIME() — the reference's processing-time attribute
  * (flink-table-planner-blink FlinkSqlOperatorTable PROCTIME,
  * ProcTimeAttribute; SURVEY §1.3 "PROCTIME attribute → custom
  * non-deterministic expression").
  *
  * Unlike `current_timestamp()` (ONE value per query, evaluated at plan
  * time), PROCTIME is the per-record wall clock at evaluation — each row
  * observes the machine time when the operator touches it. Declared
  * `Nondeterministic` so Catalyst never constant-folds it, never pushes it
  * through exchanges, and re-initializes it per partition — exactly the
  * containment rules the reference applies to proc-time expressions.
  */
case class ProcTimeExpression() extends LeafExpression with Nondeterministic {

  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def prettyName: String = "proctime"

  override protected def initializeInternal(partitionIndex: Int): Unit = ()

  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    System.currentTimeMillis() * 1000L // µs since epoch

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    ev.copy(
      code = code"long ${ev.value} = System.currentTimeMillis() * 1000L;",
      isNull = FalseLiteral)
}

object ProcTime {
  /** Column surface: `df.withColumn("pt", ProcTime.proctime())`. */
  def proctime(): Column = ExpressionUtils.column(ProcTimeExpression())
}
