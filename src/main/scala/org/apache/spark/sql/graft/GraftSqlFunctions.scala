/* Lives under org.apache.spark.sql for private[sql] access (sessionState /
 * FunctionRegistry) — see JvmHashCode.scala. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, Multiply, Sqrt}

/** Registers graft's native expressions as SQL functions on an existing
  * session (works on any session, including one we didn't build — the
  * post-hoc equivalent of SparkSessionExtensions#injectFunction, which only
  * applies at session construction).
  *
  * Reference analogue: FlinkSqlOperatorTable registration of built-ins.
  */
object GraftSqlFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "hash_code", (e: Seq[Expression]) => JvmHashCodeExpression(e.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "dot_product", (e: Seq[Expression]) => DotProduct(e(0), e(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "proctime", (_: Seq[Expression]) => ProcTimeExpression(), "scala_udf")
    reg.createOrReplaceTempFunction(
      "cosine_similarity", (e: Seq[Expression]) => {
        Divide(DotProduct(e(0), e(1)),
          Multiply(Sqrt(DotProduct(e(0), e(0))), Sqrt(DotProduct(e(1), e(1)))))
      }, "scala_udf")
  }
}
