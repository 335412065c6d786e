package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar-function surface the reference exposes but Spark lacks under the
  * same name, re-expressed as compositions of codegen'd built-ins (never UDFs,
  * so whole-stage codegen stays intact).
  *
  * Reference catalog: flink-table/flink-table-planner-blink/src/main/java/org/apache/
  * flink/table/planner/functions/sql/FlinkSqlOperatorTable.java (235 entries) and
  * runtime impls in flink-table/flink-table-runtime-blink/src/main/java/org/apache/
  * flink/table/runtime/functions/SqlFunctionUtils.java.
  */
object FlinkFunctions {

  /** SPLIT_INDEX(str, sep, index) — 0-based, null when out of range.
    * Reference: SqlFunctionUtils.splitIndex. `sep` is treated as a literal
    * string (the reference uses a plain separator, Spark's split takes a regex,
    * so we quote it). try_element_at: Flink returns null out-of-range, and
    * Spark 4's ANSI-mode element_at would throw.
    */
  def splitIndex(str: Column, sep: String, index: Int): Column =
    try_element_at(split(str, java.util.regex.Pattern.quote(sep)), lit(index + 1))

  /** IS_DIGIT(str) — true iff the string is entirely ASCII digits.
    * Reference: SqlFunctionUtils.isDigit. */
  def isDigit(str: Column): Column = str.rlike("^[0-9]+$")

  /** IS_ALPHA(str) — true iff the string is entirely ASCII letters.
    * Reference: SqlFunctionUtils.isAlpha. */
  def isAlpha(str: Column): Column = str.rlike("^[A-Za-z]+$")

  /** IS_DECIMAL(str) — true iff the string parses as a decimal number.
    * Reference: SqlFunctionUtils.isDecimal. */
  def isDecimal(str: Column): Column =
    str.rlike("^[-+]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)$")

  /** IFNULL(a, b) — Reference: BuiltInFunctionDefinitions.IF_NULL. */
  def ifNull(a: Column, b: Column): Column = coalesce(a, b)

  /** LISTAGG(col, sep) with deterministic (sorted) element order.
    * Reference: planner/functions/aggfunctions/ListAggFunction.java. The
    * reference emits input order (nondeterministic under retraction); we sort
    * for reproducibility — callers needing arrival order use collect_list
    * over an explicitly ordered window instead.
    */
  def listAgg(col: Column, sep: String): Column =
    array_join(array_sort(collect_list(col)), sep)

  /** HASH_CODE(str) — JVM String.hashCode, as the reference defines it
    * (SqlFunctionUtils.hashCode). A native codegen'd Catalyst expression
    * ([[org.apache.spark.sql.graft.JvmHashCodeExpression]]).
    */
  def hashCode(str: Column): Column =
    org.apache.spark.sql.graft.GraftExpressions.jvmHashCode(str)

  /** Cross-engine stable 31-bit string hash: first 8 hex chars of md5, mod
    * 2^31-1. Used by MinHash/SimHash so a SQL oracle can reproduce it exactly.
    */
  def md5Hash31(str: Column): Column =
    conv(substring(md5(str), 1, 8), 16, 10).cast("long") % 2147483647L

  /** Cross-engine stable 56-bit string hash: first 14 hex chars of md5
    * (always non-negative in a 64-bit long). SimHash's bit source — 56 bits
    * keeps banded-LSH bucket spaces large enough that bucket population
    * stays bounded as the corpus grows (the 10x/100x growth gate caught the
    * 31-bit variant saturating its 8-bit band space and going quadratic). */
  def md5Hash56(str: Column): Column =
    conv(substring(md5(str), 1, 14), 16, 10).cast("long")

  /** Cross-engine stable 64-bit string hash: ALL 16 leading md5 hex chars,
    * as the signed two's-complement long with that bit pattern. Assembled
    * from two 32-bit halves — `conv` emits the UNSIGNED decimal string, and
    * an ANSI cast of a >= 2^63 value to long aborts, so the sign bit must
    * enter through the (wrap-defined, never-aborting) shift, not the cast.
    * The DuckDB oracle mirrors it as UBIGINT -> HUGEINT -> two's-complement
    * fold (see DedupOps.hashed64Sql). Feeds SimhashBanding schemes wider
    * than 56 bits (r18 verdict order: the 64-bit scheme's blocker was
    * exactly this encoding). */
  def md5Hash64(str: Column): Column =
    shiftleft(conv(substring(md5(str), 1, 8), 16, 10).cast("long"), 32)
      .bitwiseOR(conv(substring(md5(str), 9, 8), 16, 10).cast("long"))
}
