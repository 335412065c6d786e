package graft

/** Plan audits for the TPC-DS shape sweep ([[operators.TpcdsShapes]]) —
  * each distinctive shape must plan the way the shape exists to test, not
  * merely return rows (the oracle gate covers values). */
class TpcdsShapesSpec extends GraftSpec {

  private def finalPlan(q: Q): String = {
    val df = q.run(spark, sfDir)
    df.collect() // finalize AQE so the executed plan is the real one
    // the AQE toString prints the final plan AND the initial plan — node
    // COUNTS must only see the final section
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q67: ROLLUP plans ONE Expand feeding one Window rank") {
    val p = finalPlan(operators.TpcdsShapes.q67)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("Window"), p)
  }

  test("q36: grouping()-derived lochierarchy reaches the window partition above one Expand") {
    val p = finalPlan(operators.TpcdsShapes.q36)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"), p) // part is a broadcast-sized dim
  }

  test("q88: fused band counts = ONE scan, one aggregate pair, no join") {
    val p = finalPlan(operators.TpcdsShapes.q88)
    assert(!p.contains("Join"), s"fused formulation must not join:\n$p")
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p) // partial + final
  }

  test("q23: both IN filters become semi joins (no materialized distinct blowup)") {
    val p = finalPlan(operators.TpcdsShapes.q23)
    assert("LeftSemi".r.findAllIn(p).length >= 2, p)
  }

  test("q51: full outer channel merge survives with both running windows") {
    val p = finalPlan(operators.TpcdsShapes.q51)
    assert(p.contains("FullOuter"), p)
    assert("Window".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q59: week-over-week self-join is an equi-join, not a cartesian") {
    val p = finalPlan(operators.TpcdsShapes.q59)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q14: INTERSECT chain feeds a semi join on the fact scan") {
    val p = finalPlan(operators.TpcdsShapes.q14)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q33: channel union re-agg keeps partial aggregation below the union") {
    val p = finalPlan(operators.TpcdsShapes.q33)
    assert(p.contains("Union"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 4, p) // per-channel partial+final, then re-agg
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3, p) // part dim broadcast per channel
  }

  test("q31: growth chain self-joins stay equi-joins on the CTE") {
    val p = finalPlan(operators.TpcdsShapes.q31)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q66: wide pivot is ONE aggregate pass over one scan") {
    val p = finalPlan(operators.TpcdsShapes.q66)
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p) // partial + final, not per-column
  }

  test("all 18 shapes return non-vacuous results on the spec fixture or sf0.01") {
    // shapes with year-specific predicates can be empty at sf0.001; the
    // oracle gate runs them at sf0.01 — here just require they all PLAN
    // and the filterless ones return rows
    for (q <- operators.TpcdsShapes.all) {
      val df = q.run(spark, sfDir)
      assert(df.columns.nonEmpty, q.name)
    }
    assert(run(operators.TpcdsShapes.q67).count() > 0)
    assert(run(operators.TpcdsShapes.q88).count() == 1)
  }
}
