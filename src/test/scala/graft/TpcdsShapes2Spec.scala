package graft

/** Plan audits for the TPC-DS sweep's completing tranche
  * ([[operators.TpcdsShapes2]] — queries 69..103 of the reference's bar).
  * Values are the oracle gate's job; here each distinctive shape must PLAN
  * the way the shape exists to test, and the template-twins must reuse
  * their template's plan under the changed constant/grain/sort. */
class TpcdsShapes2Spec extends GraftSpec {

  import operators.TpcdsShapes2._

  private def finalPlan(q: Q): String = {
    val df = q.run(spark, sfDir)
    df.collect() // finalize AQE so the executed plan is the real one
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q7: four averages are ONE aggregate pass; the priority OR stays on the orders side") {
    val p = finalPlan(q7)
    assert("HashAggregate".r.findAllIn(p).length == 2, p) // partial + final, not per-avg
    assert(!p.contains("Expand"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q27: the four averages survive the rollup through ONE Expand") {
    val p = finalPlan(q27)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q19: the nation inequality is a residual above all-equi joins") {
    val p = finalPlan(q19)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"c_nationkey <> s_nationkey must ride the equi joins as a filter:\n$p")
    assert("Join".r.findAllIn(p).length >= 4, p)
  }

  test("q15: the dims-or-measure disjunction does NOT rewrite to a union of branches") {
    val p = finalPlan(q15)
    assert(!p.contains("Union"), s"OR must stay one residual:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(p).length <= 3, p) // one scan per table
  }

  test("q24: the CTE self-threshold is a scalar subquery, never a per-row re-scan") {
    val p = finalPlan(q24)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q29: the three-epoch chain stays equi-keyed with the order inequality residual") {
    val p = finalPlan(q29)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Join".r.findAllIn(p).length >= 3, p)
  }

  test("q43: the seven-day pivot is ONE aggregate pass over one fact scan") {
    val p = finalPlan(q43)
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
    assert("Scan parquet".r.findAllIn(p).length == 2, p) // lineitem + supplier once each
  }

  test("q50: five latency bands are one pass, returned-leg filter pushed to the scan") {
    val p = finalPlan(q50)
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
    assert(p.contains("EqualTo(l_returnflag,R)"), p)
  }

  test("q53: the quarterly deviation window sits above ONE aggregate pair") {
    val p = finalPlan(q53)
    assert("Window".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q57: the supplier-grain lag/lead stack shares windows like its q47 template") {
    val p = finalPlan(q57)
    assert("Window".r.findAllIn(p).length <= 2, p) // unordered avg + ordered lag/lead
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q56/q60: both union re-aggs keep per-channel partial aggregation below the union") {
    for (q <- Seq(q56, q60)) {
      val p = finalPlan(q)
      assert(p.contains("Union"), p)
      assert("HashAggregate".r.findAllIn(p).length >= 4, p)
      assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    }
  }

  test("q68: the extended-total band evaluates above the trip aggregate it references") {
    val p = finalPlan(q68)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q69: one semi plus TWO stacked anti joins on the same key") {
    val p = finalPlan(q69)
    assert(p.contains("LeftSemi"), p)
    assert("LeftAnti".r.findAllIn(p).length == 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q74: the guarded-ratio YoY compare is an equi self-join of one CTE") {
    val p = finalPlan(q74)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Join".r.findAllIn(p).length >= 2, p)
  }

  test("q79: the composite-grain trip aggregate sits below both dimension joins, top-100 via TakeOrdered") {
    val p = finalPlan(q79)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
  }

  test("q80: the channel rollup is ONE Expand over a single fused scan, no join") {
    val p = finalPlan(q80)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q81: the per-nation return threshold decorrelates to an aggregate equi-join") {
    val p = finalPlan(q81)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("Join"), p)
  }

  test("q86: the pure rollup ranks through ONE Expand with no join below") {
    val p = finalPlan(q86)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q91: the five-table snowflake chain broadcasts every dimension") {
    val p = finalPlan(q91)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q92: the date-banded correlated threshold decorrelates; the band reaches both scans") {
    val p = finalPlan(q92)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
  }

  test("q94: the two-measure distinct aggregate rides the same semi/anti stack as q16") {
    val p = finalPlan(q94)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q99: the month-grain lag matrix stays one aggregate pass, no Expand") {
    val p = finalPlan(q99)
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
    assert("Scan parquet".r.findAllIn(p).length == 2, p)
  }

  test("q14b: the INTERSECT set feeds BOTH period legs as semi joins; the compare is an equi join") {
    val df = q14b.run(spark, sfDir)
    // the semi lowering is a LOGICAL property (ReplaceIntersectWithSemiJoin
    // + RewritePredicateSubquery); AQE's runtime re-plan may legitimately
    // collapse tiny materialized semi stages in the executed plan, so the
    // count asserts on the optimized logical plan
    val lp = df.queryExecution.optimizedPlan.toString
    assert("LeftSemi".r.findAllIn(lp).length >= 2, lp)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // scale note, observed not asserted: at fixture scale the executed
    // plan sometimes shares the INTERSECT chain across both period legs
    // via ReusedExchange (5 scans instead of 8) and sometimes collapses
    // the tiny materialized semi stages outright — both are AQE doing the
    // right thing for the stage sizes at hand; at 100 TB the reuse is the
    // stable outcome because the stages are never tiny. Asserting either
    // exact executed form here would be flaky by construction.
  }

  test("q23b: frequent items semi-join; best customers equi-join back for names") {
    val p = finalPlan(q23b)
    // the b-variant's point: best_customers is a real JOIN (detail output),
    // only the frequent-parts IN stays a semi join (asserted on the
    // optimized logical plan — AQE may collapse tiny semi stages)
    val lp = q23b.run(spark, sfDir).queryExecution.optimizedPlan.toString
    assert("LeftSemi".r.findAllIn(lp).length >= 1, lp)
    assert("Join".r.findAllIn(p).length >= 3, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q42/q52/q55: all three date-dim star templates take the TakeOrdered top-N path") {
    for (q <- Seq(q42, q52, q55)) {
      val p = finalPlan(q)
      assert(p.contains("TakeOrderedAndProject"), s"${q.name}:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"${q.name}:\n$p")
      assert(!p.contains("CartesianProduct"), s"${q.name}:\n$p")
    }
  }

  test("q12/q20: the revenue-share windows sit above the aggregate, band pushed to the scan") {
    for (q <- Seq(q12, q20)) {
      val p = finalPlan(q)
      assert("Window".r.findAllIn(p).length == 1, s"${q.name}:\n$p")
      assert(p.contains("GreaterThanOrEqual(l_shipdate,"), s"${q.name}:\n$p")
    }
    // q20's OVER () is a deliberate single-partition window: it runs over
    // the six AGGREGATE rows (one per p_type), never over fact rows — the
    // one place a global window is scale-safe.
  }

  test("q82: the IN-list band dimension semi-joins the channel-banded fact") {
    val p = finalPlan(q82)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("GreaterThanOrEqual(p_retailprice,940.0)"), p)
    assert(p.contains("EqualTo(l_returnflag,A)"), p)
  }

  test("all completing-tranche shapes plan, and the template-twins return rows at sf0.001") {
    for (q <- operators.TpcdsShapes2.all) {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, q.name)
    }
    // filterless or fixture-wide shapes must be non-vacuous even at sf0.001
    assert(run(q43).count() > 0)
    assert(run(q50).count() > 0)
    assert(run(q80).count() > 0)
    assert(run(q86).count() > 0)
    assert(run(q91).count() > 0)
  }
}
