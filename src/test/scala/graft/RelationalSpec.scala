package graft

import graft.operators.Relational._

class RelationalSpec extends GraftSpec {

  test("q_agg_q1 groups by (returnflag, linestatus) with positive sums") {
    val rows = run(qAggQ1).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val byKey = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(byKey.size == rows.length, "group keys must be unique")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0) // sum_qty
      assert(r.getLong(9) > 0)   // count_order
    }
  }

  test("semi + anti partition customers") {
    val total = Tables.t(spark, sfDir, "customer").count()
    assert(run(qSemiJoin).count() + run(qAntiJoin).count() == total)
  }

  test("left outer keeps every customer") {
    assert(run(qLeftOuter).count() == Tables.t(spark, sfDir, "customer").count())
  }

  test("intersect/except partition the distinct customer nation set") {
    val cNations = Tables.t(spark, sfDir, "customer")
      .select("c_nationkey").distinct().count()
    assert(run(qIntersect).count() + run(qExcept).count() == cNations)
  }

  test("topn emits at most 3 rows per customer, correctly ranked") {
    val rows = run(qTopN).collect()
    val perCust = rows.groupBy(_.getLong(0))
    assert(perCust.values.forall(_.length <= 3))
    perCust.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(3))
      assert(sorted.map(_.getDouble(2)).toSeq.sliding(2).forall {
        case Seq(a, b) => a >= b; case _ => true
      })
    }
  }

  test("dedup_first keeps exactly one row per (user, event_type)") {
    val rows = run(qDedupFirst).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).distinct.length == rows.length)
  }

  test("rollup has grand-total row equal to orders count") {
    val rows = run(qRollup).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getLong(2) == Tables.t(spark, sfDir, "orders").count())
  }

  test("broadcast join plan actually broadcasts part") {
    val plan = run(qBroadcastJoinAgg).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }

  test("calc filter pushes predicates into the parquet scan") {
    val plan = run(qCalcFilter).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("IsNotNull(l_quantity)") || plan.contains("GreaterThan(l_quantity"), plan)
  }
}
