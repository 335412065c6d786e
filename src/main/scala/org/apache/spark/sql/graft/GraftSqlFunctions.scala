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

  /** `CREATE FUNCTION name AS 'impl'` support (reference
    * SqlCommandParser.java:151, CreateTempSystemFunctionOperation — there the
    * impl string names a UDF class to instantiate): here impl is either a
    * graft expression class (simple or fully-qualified, the engine's ScalarFunction
    * analogues) or ANY function already registered in the session — Spark
    * builtins included, since the session registry is seeded from them —
    * and `name` registers as an alias for it. */
  def registerAlias(spark: SparkSession, name: String, impl: String): Unit = {
    val reg = spark.sessionState.functionRegistry
    val builder: Seq[Expression] => Expression = impl.trim.toLowerCase match {
      case "org.apache.spark.sql.graft.jvmhashcodeexpression" =>
        e => JvmHashCodeExpression(e.head)
      case "org.apache.spark.sql.graft.dotproduct" =>
        e => DotProduct(e(0), e(1))
      case "org.apache.spark.sql.graft.proctimeexpression" =>
        _ => ProcTimeExpression()
      case other =>
        reg.lookupFunctionBuilder(
            org.apache.spark.sql.catalyst.FunctionIdentifier(other))
          .getOrElse(throw new IllegalArgumentException(
            s"CREATE FUNCTION impl is neither a graft expression class nor a " +
              s"registered function name: $impl"))
    }
    reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }

  /** DROP FUNCTION (reference SqlCommandParser.java:152-154). True iff the
    * function existed in the session registry. */
  def dropFunction(spark: SparkSession, name: String): Boolean =
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))

  /** CHANGELOG_MODE classification (reference ExplainDetail.java:36 — the
    * changelog mode a plan produces, e.g. `changelogMode=[I,UA,D]`): a
    * streaming plan is insert-only iff Spark's OWN append-mode analysis
    * accepts it — the same authority that would reject the query at start —
    * otherwise it produces updates/retractions (the reference's [I,UB,UA,D]).
    * Bounded plans are insert-only by definition. */
  def appendOnly(df: org.apache.spark.sql.DataFrame): Boolean =
    !df.isStreaming || {
      try {
        org.apache.spark.sql.catalyst.analysis.UnsupportedOperationChecker
          .checkForStreaming(df.queryExecution.analyzed,
            org.apache.spark.sql.streaming.OutputMode.Append())
        true
      } catch { case _: org.apache.spark.sql.AnalysisException => false }
    }
}
