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

  test("q72: seven-table star stays equi-joined with the date offset as a filter") {
    val p = finalPlan(operators.TpcdsShapes.q72)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the date-offset predicate must not break the equi-join:\n$p")
    // the four small dims broadcast; the fact side never does
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 4, p)
  }

  test("q64: the twice-sold chain reuses one aggregate shape and stays equi-joined") {
    val p = finalPlan(operators.TpcdsShapes.q64)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q78: both channel anti-joins plan as LeftAnti, channels merge FullOuter") {
    val p = finalPlan(operators.TpcdsShapes.q78)
    assert("LeftAnti".r.findAllIn(p).length == 2, p)
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q35: the EXISTS disjunction decorrelates — no per-row subquery execution") {
    val p = finalPlan(operators.TpcdsShapes.q35)
    // the conjunct EXISTS decorrelates to a semi join; the OR-of-EXISTS
    // must become joins (Spark plans ExistenceJoin, printed as a join with
    // an exists# attr), never a cartesian or nested-loop-per-row
    assert(p.contains("LeftSemi"), p)
    assert(p.toLowerCase.contains("existencejoin") || p.contains("exists#"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q47: three window functions share ONE window sort over the grouped relation") {
    val p = finalPlan(operators.TpcdsShapes.q47)
    // avg (unordered frame) and lag/lead (ordered frame) = 2 Window nodes
    // max, NOT one per function; one aggregate pair below
    assert("Window".r.findAllIn(p).length <= 2, p)
    assert(!p.contains("Join"), p)
  }

  test("q1: the correlated scalar over the CTE decorrelates into one aggregate join") {
    val p = finalPlan(operators.TpcdsShapes.q1)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"the correlated scalar must decorrelate, not nest per row:\n$p")
  }

  test("all shapes in TpcdsShapes.all plan and return non-vacuous results") {
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

  test("q2: week-over-year self-join is an equi-join on the weekly CTE, no cartesian") {
    val p = finalPlan(operators.TpcdsShapes.q2)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q34: the count band evaluates in the aggregate before the customer join") {
    val p = finalPlan(operators.TpcdsShapes.q34)
    // band filter on count(*) must sit between the aggregates and the join,
    // so only band survivors reach the dimension join
    assert(p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q85: disjunctive cross-side bands keep the join tree broadcast-shaped, residual above the joins") {
    val p = finalPlan(operators.TpcdsShapes.q85)
    // nation + customer are dims: expect broadcast joins, no cartesian from the ORs
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q95: both EXISTS decorrelate to semi/anti joins over the fact") {
    val p = finalPlan(operators.TpcdsShapes.q95)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q39: consecutive-month cov self-join is an equi-join of one aggregate shape") {
    val p = finalPlan(operators.TpcdsShapes.q39)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q28: fused band distinct-counts stay ONE scan (multi-distinct Expand, no join)") {
    val p = finalPlan(operators.TpcdsShapes.q28)
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert(p.contains("Expand"), p) // the multi-count-distinct rewrite
  }

  test("q44: opposite-order rank views equi-join on rank position, no cartesian") {
    val p = finalPlan(operators.TpcdsShapes.q44)
    assert(p.contains("Join"), p)
    assert("Window".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q87: the EXCEPT chain plans anti joins, not materialized differences") {
    val p = finalPlan(operators.TpcdsShapes.q87)
    assert("LeftAnti".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q61: two one-row aggregates may nested-loop — the one shape where that is right") {
    val p = finalPlan(operators.TpcdsShapes.q61)
    assert("HashAggregate".r.findAllIn(p).length >= 4, p) // two partial+final pairs
  }

  test("q97: the overlap matrix keeps one FULL OUTER over two distinct projections") {
    val p = finalPlan(operators.TpcdsShapes.q97)
    assert(p.contains("FullOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q21: before/after pivot is one aggregate pass with the ratio band above it") {
    val p = finalPlan(operators.TpcdsShapes.q21)
    assert(!p.contains("Join"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q65: aggregate-of-aggregate join stays an equi-join over the shared CTE shape") {
    val p = finalPlan(operators.TpcdsShapes.q65)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q38: the INTERSECT chain lowers to stacked semi joins over distinct keys") {
    val p = finalPlan(operators.TpcdsShapes.q38)
    assert("LeftSemi".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q70: window-rank subquery becomes a semi join feeding ONE rollup Expand") {
    val p = finalPlan(operators.TpcdsShapes.q70)
    assert(p.contains("LeftSemi"), p)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q83: three channel aggregates, two equi joins, no channel leakage via re-scan sharing") {
    val p = finalPlan(operators.TpcdsShapes.q83)
    assert("Join".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q62: lag bands are ONE aggregate pass above one join — no Expand, no re-scan per band") {
    val p = finalPlan(operators.TpcdsShapes.q62)
    assert(!p.contains("Expand"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p) // partial + final
    assert("Scan parquet".r.findAllIn(p).length == 2, p)  // lineitem + orders once each
  }

  test("q30: the correlated average decorrelates to an aggregate equi-join (no per-row re-scan)") {
    val p = finalPlan(operators.TpcdsShapes.q30)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q45: the IN-list OR IN-subquery plans an ExistenceJoin, not a semi join or cartesian") {
    val p = finalPlan(operators.TpcdsShapes.q45)
    assert(p.contains("ExistenceJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q9: fifteen scalar subqueries, a one-row probe, and NO join anywhere") {
    val df = operators.TpcdsShapes.q9.run(spark, sfDir)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    assert(full.contains("Subquery"), full)
    assert(!full.contains("Join"), s"the probe row must not join:\n$full")
    assert(!full.contains("CartesianProduct"), full)
  }

  test("q58: triple-channel join with the mutual band as a residual filter, no cartesian") {
    val p = finalPlan(operators.TpcdsShapes.q58)
    assert("Join".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q75: channel branches aggregate BELOW the union; YoY self-join is an equi-join") {
    val p = finalPlan(operators.TpcdsShapes.q75)
    assert(p.contains("Union"), p)
    // 3 channel branches x (partial+final) + re-agg pair at least
    assert("HashAggregate".r.findAllIn(p).length >= 8, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q41: dim-only correlated EXISTS with OR bands plans a semi self-join") {
    val p = finalPlan(operators.TpcdsShapes.q41)
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q48: cross-side OR-of-conjunctions stays ONE residual over one equi join") {
    val p = finalPlan(operators.TpcdsShapes.q48)
    assert("Join".r.findAllIn(p).length >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q90: the 1x1 count ratio DOES broadcast-nested-loop — the semantic exemption's second instance") {
    val p = finalPlan(operators.TpcdsShapes.q90)
    // the plan SHOULD contain a BNLJ of two single-row aggregates; the
    // PlanAuditSpec sweep must accept it via the semantic (not name-list)
    // exemption — this test pins the shape actually exercising that path
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q32: per-part excess threshold decorrelates to an aggregate equi-join, scalar output") {
    val p = finalPlan(operators.TpcdsShapes.q32)
    assert(p.contains("Join"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q77: full-outer channel merges under a union under ONE rollup Expand") {
    val p = finalPlan(operators.TpcdsShapes.q77)
    assert(p.contains("FullOuter"), p)
    assert(p.contains("Union"), p)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q4: the six-way growth self-join stays all-equi (no cartesian, no NLJ)") {
    val p = finalPlan(operators.TpcdsShapes.q4)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Join".r.findAllIn(p).length >= 5, p) // five joins over the CTE
  }

  test("q5: the signed-measure channel union rolls up through ONE Expand") {
    val p = finalPlan(operators.TpcdsShapes.q5)
    assert(p.contains("Union"), p)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q6: the dimension-average correlation decorrelates to an equi join") {
    val p = finalPlan(operators.TpcdsShapes.q6)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // part-per-type average joins back on p_type — an aggregate feeding a
    // join, never a per-row re-scan of part
    assert(p.contains("HashAggregate"), p)
  }

  test("q8: the INTERSECT of customer populations feeds semi joins") {
    val p = finalPlan(operators.TpcdsShapes.q8)
    assert("LeftSemi".r.findAllIn(p).length >= 2, p) // IN + INTERSECT
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q16: EXISTS and NOT EXISTS plan as semi AND anti over one fact") {
    val p = finalPlan(operators.TpcdsShapes.q16)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22: the four-level hierarchy rollup is ONE Expand over a broadcast dim join") {
    val p = finalPlan(operators.TpcdsShapes.q22)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q40: returns attach as ONE left outer join under the date pivot") {
    val p = finalPlan(operators.TpcdsShapes.q40)
    assert(p.contains("LeftOuter"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the before/after split is conditional sums in one aggregate pass,
    // not two scans
    assert("Scan parquet".r.findAllIn(p).length <= 5, p)
  }

  test("q46: the trip aggregates BELOW the customer mismatch join") {
    val p = finalPlan(operators.TpcdsShapes.q46)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the mismatch inequality must stay a post-join filter ABOVE the trip
    // aggregate: the aggregate (min trip_nation) appears below a join in
    // the final plan
    assert(p.contains("min("), p)
  }

  test("q71: the three-branch channel union aggregates once, no join") {
    val p = finalPlan(operators.TpcdsShapes.q71)
    assert(p.contains("Union"), p)
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p) // partial + final
  }

  test("q76: the null-padded heterogeneous union re-aggregates in one pass") {
    val p = finalPlan(operators.TpcdsShapes.q76)
    assert(p.contains("Union"), p)
    assert(!p.contains("Join"), p)
    assert("HashAggregate".r.findAllIn(p).length == 2, p)
  }

  test("q84: the literal band dimension broadcast-nested-loops onto the fact") {
    val p = finalPlan(operators.TpcdsShapes.q84)
    // a range-band join against a 5-row VALUES relation: BNLJ with the
    // literal on the build side IS the right plan (the sweep's
    // literal-bounded exemption); a shuffle would be pure cost
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("LocalTableScan"), p)
  }

  test("q25: the three-way fact chain stays equi-keyed with the inequality residual") {
    val p = finalPlan(operators.TpcdsShapes.q25)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Join".r.findAllIn(p).length >= 3, p)
  }

  test("q10: profile stack plans existence + anti joins over one dimension scan") {
    val p = finalPlan(operators.TpcdsShapes.q10)
    assert(p.contains("ExistenceJoin"), p) // the OR-of-EXISTS pair
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("LeftSemi"), p) // the required EXISTS
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q18: multiple averages share ONE rollup Expand") {
    val p = finalPlan(operators.TpcdsShapes.q18)
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13: cross-side OR bands stay one residual, no union-of-branches rewrite") {
    val p = finalPlan(operators.TpcdsShapes.q13)
    assert(!p.contains("Union"), s"OR must not expand to a per-branch union:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert("Scan parquet".r.findAllIn(p).length <= 3, p) // one scan per table
  }

  test("q3: the date-dim star pushes the type filter into the part scan") {
    val p = finalPlan(operators.TpcdsShapes.q3)
    assert(p.contains("PushedFilters: [IsNotNull(p_type), EqualTo(p_type,ECONOMY)")
      || p.contains("EqualTo(p_type,ECONOMY)"), p)
    assert(p.contains("BroadcastHashJoin"), p) // part is broadcast-sized
  }

  test("q96: the count-only probe pushes both band predicates to the scans") {
    val p = finalPlan(operators.TpcdsShapes.q96)
    assert(p.contains("GreaterThanOrEqual(l_quantity,20.0)"), p)
    assert(p.contains("EqualTo(o_orderpriority,2-HIGH)"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q37: the banded dimension semi-joins the time-banded fact") {
    val p = finalPlan(operators.TpcdsShapes.q37)
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("GreaterThanOrEqual(p_retailprice,920.0)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate,"), p)
  }
}
