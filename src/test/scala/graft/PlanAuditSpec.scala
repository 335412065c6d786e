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

  test("q_simhash_banded: first-intact-bucket filter, no distinct re-shuffle") {
    // the LSH candidate join must NOT be followed by a HashAggregate-based
    // distinct: each pair leaves the join exactly once (first intact bucket)
    val df = operators.DedupOps.qSimhashBanded.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val joinPos = p.indexOf("Join")
    assert(joinPos >= 0, p)
    // no aggregate ABOVE the join (plan prints top-down: earlier = higher)
    assert(!p.substring(0, joinPos).contains("HashAggregate"),
      s"distinct aggregate above the candidate join:\n$p")
  }

  test("q_cogroup: one co-partitioned shuffle per side, no broadcast") {
    val df = operators.CoGroupOps.qCoGroup.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CoGroup"), p)
    // both inputs hash-shuffled on the key once — the reference CoGroup shape
    assert("Exchange hashpartitioning".r.findAllIn(p).length >= 2, p)
    assert(!p.contains("BroadcastHashJoin"), p)
  }

  test("q_kafka_roundtrip: scan reads only the projected log columns") {
    val df = operators.CoGroupOps.qKafkaRoundtrip.run(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema"), p)
    assert(!p.contains("ts#"), s"ts column not pruned from the log read:\n$p")
  }

  test("q_tpch_q5: six-way join broadcasts the tiny dims, no cartesian") {
    val p = phys(operators.RelationalSql.qTpchQ5)
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p) // nation + region
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_hint_broadcast: the SQL hint forces a broadcast join") {
    val p = phys(operators.RelationalSql.qHintBroadcast)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q_tpch_q18: HAVING subquery decorrelates to a semi join, no cartesian") {
    val p = phys(operators.TpchSql.qTpchQ18)
    assert(p.contains("LeftSemi"), s"IN-subquery not decorrelated to semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_tpch_q21: EXISTS/NOT EXISTS become semi + anti joins, nation broadcast") {
    val p = phys(operators.TpchSql.qTpchQ21)
    assert(p.contains("LeftSemi"), s"EXISTS not decorrelated to semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS not decorrelated to anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"tiny nation dim not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_tpch_q6: all three predicates reach the parquet scan") {
    val p = phys(operators.TpchSql.qTpchQ6)
    assert(p.contains("PushedFilters:"), p)
    val pushed = p.substring(p.indexOf("PushedFilters:"))
      .linesIterator.next()
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c not pushed to scan: $pushed"))
  }

  test("q_tpch_q15: the revenue aggregate is materialized once, not re-scanned") {
    // Spark inlines the twice-consumed CTE and reuses neither the exchange
    // nor the subquery across the scalar-subquery boundary — the Spark side
    // materializes instead; the FINAL plan must not scan lineitem at all
    val df = operators.TpchSql.qTpchQ15.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("lineitem"), s"fact table re-scanned:\n$p")
  }

  test("q_tpch_q17: correlated scalar avg subquery decorrelates to agg + join") {
    val p = phys(operators.TpchSql.qTpchQ17)
    // the per-part avg must become a grouped aggregate joined back on
    // p_partkey — not a per-row re-executed subquery or a cartesian
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_contamination: probe set broadcast, shingle side never shuffled for the join") {
    val p = phys(operators.TextOps.qContamination)
    assert(p.contains("BroadcastHashJoin"), s"probe set not broadcast:\n$p")
  }

  test("q_pipeline_e2e: filter+dedup+split+stats fuse into exactly two hash shuffles") {
    val p = phys(operators.TextOps.qPipelineE2e)
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(n == 2, s"expected 2 hash exchanges (dedup + final agg), got $n:\n$p")
  }

  test("q_pii_mask: map-only scrub — no hash shuffle, no UDF, regexps codegen'd") {
    val p = phys(operators.TextOps.qPiiMask)
    assert(!p.contains("Exchange hashpartitioning"),
      s"a map-only masking pass must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"), p)
  }

  test("q_bucketed_join: bucket-aligned scans feed the join with zero exchanges below it") {
    val df = operators.BucketedOps.qBucketedJoin.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("SortMergeJoin"), p)
    // everything BELOW the join (the plan prints children after it) must be
    // exchange-free: bucket i of both tables joins locally — the layout
    // paid the shuffle once at write time
    val below = p.substring(p.indexOf("SortMergeJoin"))
    assert(!below.contains("Exchange"),
      s"bucketed join must not shuffle its inputs:\n$p")
    assert(below.contains("Bucketed: true"), s"scans not bucketed:\n$p")
  }

  test("q_line_dedup: keep-first is a partial-aggregated min, NOT a window rank") {
    val p = phys(operators.TextOps.qLineDedup)
    // the design claim: groupBy(chunk).min partial-aggregates map-side where
    // a row_number window would shuffle every row and collapse hot chunks.
    // Since r18 the min is over a (doc_id, pos) STRUCT (the packed-long ord
    // overflowed at the 1000x id range), so it plans as a sort aggregate —
    // pin the partial mode explicitly rather than counting HashAggregates.
    assert(!p.contains("Window"), s"keep-first regressed to a window rank:\n$p")
    assert(p.contains("partial_min(ord"),
      s"keep-first min not partial-aggregated map-side:\n$p")
  }

  test("q_ann_ivf_2level: routing/argmax are map-side partial aggregations, not vector-payload window shuffles") {
    val p = phys(operators.SimilarityOps.qAnnIvf2Level)
    // the r18 re-plan's claim: no window partitioned by vec_id — a
    // row_number over the multiplied candidate rows would shuffle the
    // N x sqrt(C) relation with the 520-byte vector payload attached
    // (~330 GB at the 1000x tree). The only windows allowed are the
    // metadata-scale global centroid ordering and the search top-3 rank
    // (which Spark executes as partial+final WindowGroupLimit).
    assert(!p.contains("windowspecdefinition(vec_id"),
      s"two-level assign regressed to a per-vector window shuffle:\n$p")
    // BOTH levels: bounded TopK partial+final (a 2-entry leaderboard per
    // vector per map task crosses each exchange — level 2 moved from
    // min(struct) to the same TopK in r19 so nprobe=2 is a stored-rank
    // filter, not a recompute)
    assert("partial_topkaggregator".r.findAllIn(p).length >= 2,
      s"routing/assign not partial-aggregated at both levels:\n$p")
    assert(p.contains("ObjectHashAggregate"), p)
    // search rank runs as the bounded WindowGroupLimit, not a full sort rank
    assert(p.contains("WindowGroupLimit"), s"search top-3 lost its group limit:\n$p")
  }

  test("no unbounded cross/nested-loop join in any scale-path query plan") {
    // every non-calibration batch query must avoid CartesianProduct and
    // BroadcastNestedLoopJoin — the two shapes that melt at 100 TB.
    // (q_cross_join is a deliberate 5x5 dims cross; the stream queries
    // can't be explained without starting them.)
    val exempt = SparkEntry.calibrationQueries ++ Set("q_cross_join")
    val batchQs = (operators.Relational.all ++ operators.RelationalSql.all ++
      operators.TpchSql.all ++ operators.TemporalSql.all ++
      operators.GroupWindowSql.all ++ operators.SketchOps.all ++
      operators.CoGroupOps.all ++ operators.GraftSql.all ++
      operators.DedupOps.all ++ operators.SimilarityOps.all ++
      operators.TextOps.all ++ operators.LookupJoin.all ++
      operators.SkewOps.all ++ operators.TimeWindows.all ++
      operators.TpcdsShapes.all ++ operators.GraphOps.all ++
      dsl.TableApiOps.all)
      .filterNot(q => exempt.contains(q.name))
    val offenders = batchQs.filter(q =>
      BnljAudit.unbounded(q.run(spark, sfDir).queryExecution.executedPlan))
      .map(_.name)
    assert(offenders.isEmpty, s"unbounded join shapes in: $offenders")
  }

  test("negative: the BNLJ audit still rejects genuinely unbounded shapes") {
    // the semantic exemptions (single-row, literal VALUES, aggregated
    // index, modulo sample) must not have widened into a hole: each of
    // these plans IS the unbounded blowup the audit exists for, and every
    // one must stay red. Guards the exemption lattice the way
    // requireCovers guards the banding scheme — by construction, not
    // by review.
    import org.apache.spark.sql.functions._
    val sparkS = spark
    import sparkS.implicits._
    val docs = Tables.t(spark, sfDir, "documents").select($"doc_id", $"n_chars")
    val ev = Tables.t(spark, sfDir, "events").select($"event_id", $"user_id")
    def isUnbounded(df: org.apache.spark.sql.DataFrame): Boolean =
      BnljAudit.unbounded(df.queryExecution.executedPlan)
    // 1. raw scan broadcast side — the textbook unbounded BNLJ
    assert(isUnbounded(ev.join(broadcast(docs), $"event_id" > $"doc_id")),
      "unfiltered broadcast side passed the audit")
    // 2. a non-sampling filter (predicate selectivity is data-dependent,
    //    not a declared bounded fraction) must NOT count as a sample
    assert(isUnbounded(
      ev.join(broadcast(docs.filter($"n_chars" > 0)), $"event_id" > $"doc_id")),
      "a value predicate was accepted as a bounded sample")
    // 3. a coarse modulo (% 2 keeps half the relation) is not a bounded
    //    fraction either — the sample exemption requires modulus >= 10
    assert(isUnbounded(
      ev.join(broadcast(docs.filter($"doc_id" % 2 === 0)), $"event_id" > $"doc_id")),
      "a 1/2 'sample' was accepted as bounded")
    // 3b. a modulo sample DISJOINED with a broad predicate keeps an
    //     arbitrarily large fraction — only a top-level CONJUNCT bounds
    //     the filter (ADVICE r19: cond.exists matched the modulo anywhere
    //     in the tree, including under Or)
    assert(isUnbounded(
      ev.join(broadcast(docs.filter($"doc_id" % 25 === 0 || $"n_chars" > 0)),
        $"event_id" > $"doc_id")),
      "a disjoined modulo 'sample' was accepted as bounded")
    // 4. a grouped aggregate on the relation's own identity column is
    //    O(N) groups — aggBounded must refuse identity-keyed grouping
    assert(isUnbounded(
      ev.join(broadcast(docs.groupBy($"doc_id").agg(max($"n_chars").as("m"))),
        $"event_id" > $"doc_id")),
      "an identity-keyed groupBy was accepted as an aggregated index")
    // and the exemptions themselves still hold where they should:
    assert(!isUnbounded(
      ev.join(broadcast(docs.filter($"doc_id" % 25 === 0)), $"event_id" > $"doc_id")),
      "the modulo-sample exemption regressed")
    assert(!isUnbounded(
      ev.join(broadcast(docs.groupBy($"n_chars").agg(count(lit(1)).as("n"))),
        $"event_id" > $"n")),
      "the aggregated-index exemption regressed")
  }
}

/** The BNLJ/cartesian boundedness classifier — shared by the audit sweep
  * and its negative spec so the exemption lattice is itself under test.
  *
  * Exemption lattice (all SEMANTIC — since r19 there is no query-name or
  * column-name allow-list left):
  *  1. single-row x single-row (ungrouped global aggregates): the
  *     scalar-ratio shape (TPC-DS q61) — a 1x1 join at any scale.
  *  2. literal-bounded broadcast side (VALUES relation): compile-time
  *     constant row count (the q84 income-band dimension).
  *  3. aggregated-index broadcast side: tops out in a grouped
  *     FINAL/COMPLETE aggregate whose grouping keys are NOT identity-like
  *     (no `*_id` / `*key` column): the IVF centroid/super-cell tables
  *     (groupBy(label), groupBy(g)) — bounded by distinct groups. The
  *     identity-name refusal closes the ADVICE r18 hole where a
  *     groupBy(doc_id) — O(N) groups by construction — would have passed
  *     structurally; identity-keyed relations are what the fixture's id
  *     columns ARE, so the name shape is the semantic contract here, with
  *     the BroadcastExchange size ceiling as the runtime backstop.
  *  4. modulo-sample broadcast side: a deterministic `col % m = k` filter
  *     with m >= 10 — the declared bounded-fraction probe sample of the
  *     ANN recall methodology (vec_id % 25). A value predicate or a
  *     coarse % 2 does not qualify (selectivity unknown / fraction not
  *     bounded); this retires the r18 three-name broadcastNljOk list.
  */
private[graft] object BnljAudit {
  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
  import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
  import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
  import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression, Literal, Pmod, Remainder}

  def descend(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case r: ReusedExchangeExec    => Seq(r.child)
    // a persist()'d relation (Materialized.of) prints its cached plan but
    // hides it from .children — descend so a BNLJ inside the cached build
    // is judged by the same semantic rules instead of the conservative
    // "printed but unreachable" arm
    case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Seq(m.relation.cachedPlan)
    case other                    => other.children
  }
  def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p +: (descend(p) ++ p.subqueries).flatMap(allNodes)

  // WHITELIST of wrappers known to preserve or reduce rows — default-deny,
  // so an unanticipated row-multiplying unary node (Generate, Expand, a
  // flatMap object operator) can never smuggle an unbounded side past the
  // exemption (r12 review hardening)
  val rowPreserving = Set("ProjectExec", "FilterExec", "SortExec",
    "WholeStageCodegenExec", "InputAdapter", "BroadcastExchangeExec",
    "ShuffleExchangeExec", "ReusedExchangeExec", "CoalesceExec",
    "AQEShuffleReadExec", "ShuffleQueryStageExec", "BroadcastQueryStageExec",
    "AdaptiveSparkPlanExec", "LocalLimitExec", "GlobalLimitExec",
    "TakeOrderedAndProjectExec", "SubqueryExec", "ColumnarToRowExec")

  private def spine(p: SparkPlan)(leaf: SparkPlan => Boolean): Boolean =
    leaf(p) || {
      val kids = descend(p)
      kids.size == 1 && rowPreserving.contains(p.getClass.getSimpleName) &&
        spine(kids.head)(leaf)
    }

  private def finalOrComplete(agg: BaseAggregateExec): Boolean =
    agg.aggregateExpressions.forall(ae =>
      ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Final ||
      ae.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Complete)

  /** FINAL/COMPLETE ungrouped aggregate = one row; a PARTIAL-mode one
    * emits a row per partition and must not qualify. */
  def singleRow(p: SparkPlan): Boolean = spine(p) {
    case agg: BaseAggregateExec =>
      agg.groupingExpressions.isEmpty && finalOrComplete(agg)
    case _ => false
  }

  def literalBounded(p: SparkPlan): Boolean = spine(p) {
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case _ => false
  }

  /** Count a subtree's output rows. Executing a subtree ripped out of its
    * planned query loses the columnar->row transitions the planner
    * inserted around it, so re-insert them: wrap every columnar node
    * (vectorized parquet scans) in ColumnarToRowExec before executing. */
  private def rowCount(p: SparkPlan): Long = {
    val rowed = p.transformUp {
      case c if c.supportsColumnar =>
        org.apache.spark.sql.execution.ColumnarToRowExec(c)
    }
    rowed.execute().count()
  }

  /** The aggregated-index exemption, SEMANTIC form (r20 — retires the r18
    * `*_id`/`*key` column-name refusal, the audit's last naming
    * convention): a broadcast-side aggregate is bounded iff it MEASURABLY
    * COMPRESSES its input on the fixture — distinct groups at most 3/4 of
    * the leaf input rows. An index over row identity (groupBy doc_id)
    * compresses nothing (groups == rows) whatever the column is called; a
    * genuine dictionary/centroid/histogram index collapses many rows per
    * group, and with a fixed key domain it only gets MORE compressive as N
    * grows, so the fixture measurement is conservative in the direction
    * that matters. Executing the agg subtree and its leaves is cheap at
    * audit (fixture) scale; ABSOLUTE broadcast size stays backstopped at
    * runtime by the BroadcastExchange ceiling, which is what bounds a
    * compressive-but-still-huge index at 100 TB. */
  def aggBounded(p: SparkPlan): Boolean = spine(p) {
    case agg: BaseAggregateExec if finalOrComplete(agg) =>
      val groups = rowCount(agg)
      val input = agg.collectLeaves().map(rowCount).sum
      input > 0 && groups * 4 <= input * 3
    case _ => false
  }

  /** `col % m = k` with deterministic col and literal m >= 10: the declared
    * bounded-fraction sample (the ANN recall probe set's vec_id % 25). The
    * modulo EqualTo must be a TOP-LEVEL CONJUNCT: under an Or (or a Not) it
    * does not bound the filter's selectivity — `id % 25 = 0 OR broad_pred`
    * keeps an arbitrarily large fraction (ADVICE r19). */
  private def isModuloSample(cond: Expression): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def modulus(e: Expression): Option[Long] = e match {
      case r: Remainder => r.right match {
        case Literal(m: Long, _) => Some(m)
        case Literal(m: Int, _)  => Some(m.toLong)
        case _ => None
      }
      case pm: Pmod => pm.right match {
        case Literal(m: Long, _) => Some(m)
        case Literal(m: Int, _)  => Some(m.toLong)
        case _ => None
      }
      case _ => None
    }
    conjuncts(cond).exists {
      case EqualTo(l, r) =>
        (r.isInstanceOf[Literal] && l.deterministic && modulus(l).exists(_ >= 10)) ||
        (l.isInstanceOf[Literal] && r.deterministic && modulus(r).exists(_ >= 10))
      case _ => false
    }
  }

  def sampleBounded(p: SparkPlan): Boolean = spine(p) {
    case f: org.apache.spark.sql.execution.FilterExec => isModuloSample(f.condition)
    case _ => false
  }

  /** True iff the plan contains a cartesian product or a BNLJ that no
    * semantic exemption covers. */
  def unbounded(plan: SparkPlan): Boolean = {
    val pStr = plan.toString
    val nljNodes = allNodes(plan).collect { case b: BroadcastNestedLoopJoinExec => b }
    val nljBad =
      if (pStr.contains("BroadcastNestedLoopJoin") && nljNodes.isEmpty)
        true // printed but not reachable by the walk — fail conservatively
      else nljNodes.exists { b =>
        // bounded-side exemptions apply to the BROADCAST side only (the
        // streamed side stays arbitrary — that's the point of a
        // band/assignment/sample join); require it explicitly
        val build = b.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => b.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => b.right
        }
        !(singleRow(b.left) && singleRow(b.right)) &&
          !literalBounded(build) && !aggBounded(build) && !sampleBounded(build)
      }
    pStr.contains("CartesianProduct") || nljBad
  }
}

/** Streaming physical-plan audits: capture lastExecution after a run to
  * assert the stateful operators Spark planned. */
class StreamingPlanAuditSpec extends GraftSpec {

  test("stream-stream outer join plans StreamingSymmetricHashJoin with watermark state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def side(t: String, a: String) = streaming.StreamingOps.streamTable(spark, sfDir, "events")
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
        col("ts").as(s"${a}_ts"))
      .withWatermark(s"${a}_ts", "0 seconds")
    val j = side("purchase", "p").join(side("click", "c"),
      expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
      "leftOuter")
    val ckpt = Tables.scratch(s"plan-audit-join/${java.util.UUID.randomUUID()}")
    val q = j.writeStream.format("memory").queryName("audit_sshj")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val plan = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan.toString
    assert(plan.contains("StreamingSymmetricHashJoin"),
      s"expected symmetric hash join operator:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("bucketed stream-stream join keys state by (uid, time_bucket)") {
    // the r19 skew finding's plan-level fix: the composite key must reach
    // the SSHJ's equi-key list, so per-key state (and probe cost) is
    // bounded by rows-per-bucket, not key heat — if the bucket columns
    // fall out of the key (e.g. a future refactor moves them into the
    // residual condition), the O(k^2) hot-key cliff silently returns
    import org.apache.spark.sql.functions._
    import graft.streaming.{BucketedStreamJoin, StreamingOps}
    val widthUs = 10L * 60 * 1000 * 1000
    def side(t: String, a: String) = StreamingOps.streamTable(spark, sfDir, "events")
      .filter(col("event_type") === t)
      .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
        col("ts").as(s"${a}_ts"))
      .withWatermark(s"${a}_ts", "0 seconds")
    val p = side("purchase", "p")
      .withColumn("p_bkt", BucketedStreamJoin.bucketOf(col("p_ts"), widthUs))
    val c = side("click", "c")
      .withColumn("c_bkt", BucketedStreamJoin.expandBuckets(col("c_ts"), widthUs, 1))
    val j = p.join(c,
      expr("p_uid = c_uid AND p_bkt = c_bkt AND " +
        "c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
      "leftOuter")
    val ckpt = Tables.scratch(s"plan-audit-join/${java.util.UUID.randomUUID()}")
    val q = j.writeStream.format("memory").queryName("audit_sshj_bucketed")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution.executedPlan
    val sshj = exec.collect {
      case s: org.apache.spark.sql.execution.streaming.operators.stateful.join.StreamingSymmetricHashJoinExec => s
    }
    assert(sshj.nonEmpty, s"expected symmetric hash join operator:\n$exec")
    val leftKeys = sshj.head.leftKeys.map(_.toString).mkString(",")
    assert(leftKeys.contains("p_uid") && leftKeys.contains("p_bkt"),
      s"composite (uid, bucket) must be the state key, got: $leftKeys")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
  }

  test("cdc decode: map-only native expressions — no shuffle, no UDF, one generate") {
    import org.apache.spark.sql.functions.col
    val feed = sources.CdcFormats.writeDebeziumFeed(spark, sfDir)
    val decoded = sources.CdcFormats.debezium(
      spark.read.text(feed), sources.CdcFormats.feedSchema)
    val p = decoded.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"decode must not shuffle:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") &&
      !p.toLowerCase.contains("scalaudf"), s"decode must be native:\n$p")
    assert("Generate".r.findAllIn(p).length == 1, s"one explode expected:\n$p")
    // the staged projection parses each message once: exactly one from_json
    assert("from_json".r.findAllIn(p).length == 1,
      s"from_json must be staged, not repeated per field:\n$p")
  }

  test("q_cdc_canal: one hash shuffle (final keyed replay) above the decode") {
    val df = sources.CdcFormats.qCdcCanal.run(spark, sfDir)
    df.collect()
    // the AQE plan string appends the pre-adaptive "Initial Plan" — audit
    // only the final plan or every exchange double-counts
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // groupBy(o_orderkey) is the only hash exchange; the rest is the sort
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one hash shuffle, got $hashEx:\n$p")
  }

  test("q_temporal_fn: the function correlate runs the single-shuffle as-of pass") {
    val df = operators.TemporalFunction.qTemporalFn.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // one keyed shuffle carries the union+window version pass; no join
    // blowup (the correlate is NOT a range/cartesian join)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashEx == 1, s"expected exactly one hash shuffle, got $hashEx:\n$p")
    assert(p.contains("Window"), p)
  }

  test("q_temporal_fn_proctime: latest-version snapshot broadcasts to the probe") {
    val df = operators.TemporalFunction.qTemporalFnProctime.run(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the collapsed per-key snapshot is dim-sized → broadcast equi-join,
    // with partial+final max_by around its own aggregation
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q_sql_session_match: the door lowers SESSION onto session_window, no cartesian") {
    val df = operators.GraftSql.qSqlSessionMatch.run(spark, sfDir)
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("session_window"), analyzed)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("async cached lookup join is one map stage — no shuffle, no UDF") {
    val sparkS = spark
    import sparkS.implicits._
    val f = java.nio.file.Files.createTempFile("dim-plan", ".csv")
    java.nio.file.Files.writeString(f, "1,one\n")
    val probe = Tables.t(spark, sfDir, "events")
      .select($"event_id", $"user_id").as[(Long, Long)]
    val ds = operators.LookupJoin.lookupJoinAsyncCached(
      probe, () => new operators.LookupJoin.CsvFileBackend(f.toString),
      operators.LookupJoin.LookupOptions(100, 60000L, 4))
    val p = ds.queryExecution.executedPlan.toString
    // point lookups ride the probe's partitioning: any Exchange here would
    // mean the lookup operator itself introduced a shuffle
    assert(!p.contains("Exchange"), p)
    assert(p.contains("MapPartitions"), p)
    assert(!p.toLowerCase.contains("batchevalpython"), p)
  }
}
