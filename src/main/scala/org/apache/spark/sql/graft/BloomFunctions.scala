package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column surface over Spark's INTERNAL bloom-filter expressions (the pair
  * AQE's runtime row-group filters are built from —
  * `BloomFilterAggregate` / `BloomFilterMightContain`; they are not in the
  * public FunctionRegistry). Both sides hash with `xxhash64`, so a filter
  * built by [[bloomFilterAgg]] probes correctly with [[mightContain]].
  *
  * Membership is codegen'd and never false-negative: a Bloom prefilter
  * composed with an exact confirm join is EXACT while pruning the probe
  * side before any shuffle — the pattern for deduplicating an incoming
  * batch against a corpus too large to join wholesale. */
object BloomFunctions {

  /** Aggregate: a serialized bloom filter (binary) over `col`'s values. */
  def bloomFilterAgg(col: Column, expectedItems: Long): Column =
    GraftExpressions.column(
      new BloomFilterAggregate(
        GraftExpressions.expression(xxhash64(col)), expectedItems)
        .toAggregateExpression())

  /** `bloom` must be a CONSTANT (a collected filter re-broadcast as a
    * literal — filters are KB..MB-sized regardless of corpus rows) or an
    * uncorrelated scalar subquery; the expression enforces this itself. */
  def mightContain(bloom: Column, value: Column): Column =
    GraftExpressions.column(BloomFilterMightContain(
      GraftExpressions.expression(bloom),
      GraftExpressions.expression(xxhash64(value))))
}
