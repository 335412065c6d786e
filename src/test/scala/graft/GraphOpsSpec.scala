package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Algorithm-property tests for [[operators.GraphOps]] on CONSTRUCTED
  * graphs (fixture values are the oracle gate's job; these pin the
  * algebra: rank conservation, BFS distances, triangle counting). */
class GraphOpsSpec extends GraftSpec {

  private def edgesDf(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.toSeq.toDF("src", "dst")
  }

  test("pageRank on a symmetric 2-node graph is the uniform fixpoint") {
    val e = edgesDf((1L, 2L), (2L, 1L))
    val r = operators.GraphOps.pageRank(e, iters = 5).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12, r)
    assert(math.abs(r(2L) - 0.5) < 1e-12, r)
  }

  test("pageRank conserves total rank mass on a graph with no dangling nodes") {
    // symmetric graphs have no dangling nodes, so Σrank stays 1 exactly
    val e = edgesDf((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    val total = operators.GraphOps.pageRank(e, iters = 4)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9, total)
    // ... and for a NON-default damping too: the teleport term must be
    // (1-d)/n, not a hardcoded 0.15/n
    val total9 = operators.GraphOps.pageRank(e, iters = 4, damping = 0.9)
      .agg(sum("rank")).head.getDouble(0)
    assert(math.abs(total9 - 1.0) < 1e-9, total9)
  }

  test("pageRank: a hub out-ranks its spokes") {
    val e = edgesDf((0L, 1L), (1L, 0L), (0L, 2L), (2L, 0L), (0L, 3L), (3L, 0L))
    val r = operators.GraphOps.pageRank(e, iters = 10).collect()
      .map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r(0L) > r(1L) && r(0L) > r(2L) && r(0L) > r(3L), r)
  }

  test("bfs on a path graph assigns hop distances, bounded by the round count") {
    import spark.implicits._
    val und = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val d = operators.GraphOps.bfs(e, source = 0L, rounds = 3).collect()
      .map(row => row.getLong(0) -> row.getInt(1)).toMap
    assert(d == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3), d) // node 4 beyond 3 rounds
  }

  test("ordered-edge triangle join counts K4's triangles exactly once each") {
    import spark.implicits._
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("u", "v")
    val n = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"), col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
      .count()
    assert(n == 4L, n) // C(4,3)
  }

  test("labelPropagation: a two-clique barbell converges to one label per clique") {
    import spark.implicits._
    // cliques {1,2,3} and {10,11,12} joined by a single bridge 3-10;
    // symmetric edge list
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L),
      (11L, 12L), (3L, 10L))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val labels = operators.GraphOps.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L), labels)
    assert(labels(10L) == labels(11L) && labels(11L) == labels(12L), labels)
  }

  test("labelPropagation tie-break picks the HIGHEST label (reference rule)") {
    import spark.implicits._
    // node 5's two neighbors carry labels 1 and 9 once each → adopt 9
    val und = Seq((5L, 1L), (5L, 9L), (1L, 9L))
    val e = (und ++ und.map(_.swap)).toDF("u", "v")
    val l1 = operators.GraphOps.labelPropagation(e, rounds = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(5L) == 9L, l1)
  }

  test("vertexIterate: a user-supplied max-id kernel labels each component with its max node id") {
    import spark.implicits._
    // two components: a path 1-2-3 and a pair 10-11; symmetric edges
    val und = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val init = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("maxid"))
    // the kernel is entirely user code — scatter my current max along my
    // edges, combine by max, keep the larger of mine and the best message
    val labeled = operators.GraphOps.vertexIterate(e, init, rounds = 3)(
      scatter = df => df.select(col("dst").as("node"), col("maxid").as("msg")),
      gather = m => m.groupBy("node").agg(max("msg").as("msg")),
      apply = (state, g) => state.join(g, Seq("node"), "left")
        .select(col("node"), greatest(col("maxid"), col("msg")).as("maxid")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 10L -> 11L, 11L -> 11L), labeled)
  }

  test("vertexIterate: fixpoint convergence stops the rounds early (Gelly's no-update termination)") {
    import spark.implicits._
    // max-id on a 3-node path converges after 2 effective rounds; with
    // rounds=25 and fixpoint convergence the driver loop must stop well
    // before the cap (observed via the scatter invocation counter — one
    // scatter call per executed round)
    val und = Seq((1L, 2L), (2L, 3L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    val init = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("maxid"))
    var roundsRun = 0
    val labeled = operators.GraphOps.vertexIterate(
      e, init, rounds = 25, converged = operators.GraphOps.fixpoint)(
      scatter = df => { roundsRun += 1; df.select(col("dst").as("node"), col("maxid").as("msg")) },
      gather = m => m.groupBy("node").agg(max("msg").as("msg")),
      apply = (state, g) => state.join(g, Seq("node"), "left")
        .select(col("node"), greatest(col("maxid"), col("msg")).as("maxid")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labeled == Map(1L -> 3L, 2L -> 3L, 3L -> 3L), labeled)
    assert(roundsRun < 25, s"fixpoint convergence should stop early, ran $roundsRun rounds")
    assert(roundsRun >= 2, s"the path graph needs at least 2 rounds, ran $roundsRun")
  }

  test("vertexIterate: scatter sees edge columns alongside the source state") {
    import spark.implicits._
    // weighted edges: the kernel reads the edge's own `w` column — the
    // framework must present edge attrs + src state to scatter (Gelly's
    // ScatterFunction sees the Edge value)
    val e = Seq((1L, 2L, 5L), (2L, 1L, 7L)).toDF("src", "dst", "w")
    val init = Seq((1L, 0L), (2L, 0L)).toDF("node", "acc")
    val out = operators.GraphOps.vertexIterate(e, init, rounds = 1)(
      scatter = df => df.select(col("dst").as("node"), (col("acc") + col("w")).as("msg")),
      gather = m => m.groupBy("node").agg(sum("msg").as("msg")),
      apply = (_, g) => g.select(col("node"), col("msg").as("acc")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 7L, 2L -> 5L), out)
  }

  test("fixture graphs: bipartite ranks conserve mass; degree histogram covers all suppliers") {
    val sf01 = "/root/testdata/sf0.01" // sf0.001's co-supply weights are too uniform
    val ranks = operators.GraphOps.pageRank(
      operators.GraphOps.supplyEdges(spark, sf01), iters = 3)
    assert(math.abs(ranks.agg(sum("rank")).head.getDouble(0) - 1.0) < 1e-9)
    val nodes = operators.GraphOps.partSupp(spark, sf01)
      .select("s").distinct().count()
    val histTotal = operators.GraphOps.qDegrees.run(spark, sf01)
      .agg(sum("n_nodes")).head.getLong(0)
    assert(histTotal == nodes, s"$histTotal vs $nodes")
  }
}
