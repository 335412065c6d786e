package graft

/** Plan-shape audit across flagship queries — encodes the `.explain`
  * review as assertions so regressions in pushdown/broadcast/codegen are
  * caught (SURVEY "Optimize for scale — concretely"). */
class PlanAuditSpec extends GraftSpec {

  private def phys(q: Q): String =
    q.run(spark, sfDir).queryExecution.executedPlan.toString

  test("q_agg_q1: filter pushed to scan, partial+final hash aggregate, pruned schema") {
    val p = phys(operators.Relational.qAggQ1)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p) // partial + final
    assert(!p.contains("l_orderkey"), s"schema not pruned:\n$p") // unused col not read
  }

  test("q_join_topn: both dims broadcast, top-10 via TakeOrderedAndProject") {
    val p = phys(operators.Relational.qJoinTopN)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 1, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_star_join: small dims broadcast, no cartesian") {
    val p = phys(operators.Relational.qStarJoin)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_calc_filter stays in one whole-stage codegen span") {
    val df = operators.Relational.qCalcFilter.run(spark, sfDir)
    df.collect() // finalize the adaptive plan so codegen stages materialize
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p)
  }

  test("q_cosine_topk: native dot_product present, no UDF in plan") {
    val p = phys(operators.SimilarityOps.qCosineTopK)
    assert(p.contains("dot_product"), p)
    assert(!p.toLowerCase.contains("batchevalpython"), p)
  }

  test("q_topn: rank filter becomes a window group limit (no full materialize)") {
    val p = phys(operators.Relational.qTopN)
    assert(p.contains("WindowGroupLimit") || p.contains("Window"), p)
  }
}
