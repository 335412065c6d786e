/* Lives under org.apache.spark.sql for private[sql] access (AbstractDataType,
 * ExpressionUtils) — see JvmHashCode.scala. */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native dot product over ArrayType(Float|Double) columns, accumulating in
  * double — the hot kernel of cosine similarity search.
  *
  * Rationale (SURVEY §2 "custom operators" preference order): the
  * zip_with+aggregate higher-order-function formulation is semantically right
  * but evaluates per-element with boxed lambdas and intermediate arrays; this
  * expression emits a tight codegen'd loop over the underlying ArrayData
  * (~10x on the brute-force 500x500x64 search). Float inputs are widened to
  * double per element (exact), so results are bit-identical to casting the
  * arrays to double first — which keeps the DuckDB oracle
  * (list_cosine_similarity over DOUBLE[]) in exact agreement.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
      TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def prettyName: String = "dot_product"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // mismatched lengths or null elements yield NULL, matching the oracle's
  // refusal to produce a value (DuckDB errors on length mismatch) rather
  // than a silently-truncated similarity
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  def dotProduct(a: Column, b: Column): Column =
    GraftExpressions.column(DotProduct(
      GraftExpressions.expression(a), GraftExpressions.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))
  }
}
