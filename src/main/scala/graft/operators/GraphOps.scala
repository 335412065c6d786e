package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph algorithms — the reference's Gelly library
  * (flink-libraries/flink-gelly/src/main/java/org/apache/flink/graph/
  * Graph.java; SURVEY maps it to "GraphFrames-style join patterns on two
  * DataFrames", out of core scope but its headline algorithms are cheap to
  * express Spark-first, so they're covered):
  *
  *  - PageRank (Gelly `library/linkanalysis/PageRank.java`): rank(v) =
  *    0.15/n + 0.85 * Σ_in rank(u)/outdeg(u), a fixed number of bulk
  *    iterations. One shuffle per iteration (groupBy dst); the node count
  *    and nothing else crosses the driver — exactly Gelly's numVertices
  *    parameter. At 100 TB: localCheckpoint every few rounds (the
  *    [[IterateOps]] recipe) keeps lineage flat; edges partitioned by src
  *    make the rank join co-located.
  *  - Triangle count (Gelly `library/TriangleEnumerator.java`): the
  *    node-iterator join on ORDERED edges (u < v) — each triangle counted
  *    exactly once, no post-dedup; the standard distributed formulation
  *    (at scale, degree-ordering the edge direction bounds the skew of
  *    the wedge join).
  *  - Single-source shortest paths (Gelly
  *    `library/SingleSourceShortestPaths.java`): Bellman-Ford rounds as
  *    min-aggregated frontier expansion; a fixed round count here (the
  *    oracle unrolls the same rounds as chained CTEs). The open-ended
  *    variant is [[IterateOps.iterateDelta]] — see
  *    [[ConnectedComponents]] for the workset pattern.
  *  - Vertex degrees (Gelly `Graph.outDegrees()`): one aggregate, then
  *    the degree histogram.
  *
  * The graph is built from the fixture's part-supplier association:
  * bipartite supply edges (supplier ↔ part, symmetric, for PageRank and
  * degrees) and a co-supply similarity graph (suppliers sharing ≥1.12×
  * the average number of common parts — the relative threshold adapts
  * across scale factors) for triangles and SSSP. Part node ids are
  * offset by 1,000,000 to keep the two id spaces disjoint.
  */
object GraphOps {

  /** Distinct part-supplier association — the shared base relation. */
  private[graft] def partSupp(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "lineitem")
      .select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
      .distinct()

  /** Symmetric bipartite supply edges (src, dst); part ids offset.
    * Materialized: pageRank's iterations reference the edge relation once
    * per round — persist the derivation instead of re-scanning lineitem. */
  private[graft] def supplyEdges(spark: SparkSession, dir: String): DataFrame =
    Materialized.of(spark, s"graph-supply/$dir") {
      val e0 = partSupp(spark, dir)
        .select(col("s").as("src"), (col("p") + 1000000L).as("dst"))
      e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
    }

  /** Co-supply similarity edges between suppliers, kept when the shared
    * part count is ≥ `1.12 × avg` (relative, so it survives SF changes).
    * `ordered = true` keeps u < v (triangles); else both directions
    * (BFS/LPA). The threshold is one metadata-sized aggregate on the
    * driver — a Gelly-style algorithm parameter, not a data-path collect.
    *
    * MATERIALIZED via [[Materialized]]: the pair join over the
    * part-supplier association is the expensive derivation, it is shared
    * by three queries, and the iterative consumers (BFS rounds, LPA
    * rounds) would otherwise RE-DERIVE it once per round inside one plan —
    * the graph-analytics twin of the dedup family's shared signature
    * store (a 100 TB deployment writes the edge relation once and every
    * algorithm reads it). Only the ORDERED pairs are computed; the
    * symmetric view is a cheap union over the persisted relation. */
  private[graft] def coSupplyEdges(spark: SparkSession, dir: String,
      ordered: Boolean): DataFrame = {
    val e = Materialized.of(spark, s"graph-cosupply/$dir") {
      val ps = partSupp(spark, dir)
      val pairs = ps.as("a")
        .join(ps.as("b"), col("a.p") === col("b.p") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("u"), col("b.s").as("v"))
        .agg(count(lit(1)).as("w"))
      val thr = pairs.agg(avg("w")).head.getDouble(0) * 1.12
      pairs.filter(col("w") >= thr).select("u", "v")
    }
    if (ordered) e
    else e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
  }

  /** Generic vertex-centric iteration — the reference Gelly's reusable
    * iteration MODEL rather than per-algorithm loops (flink-libraries/
    * flink-gelly/.../spargel/ScatterGatherIteration.java; the pregel
    * VertexCentricIteration.java and gsa/GatherSumApplyIteration.java are
    * the same three phases with the compute/combine split drawn
    * differently). A user brings the kernel; the framework runs the rounds:
    *
    *  - `scatter` sees each edge joined with its SOURCE vertex's state
    *    (columns: src, dst, the edge's own columns, the state columns) and
    *    produces message rows keyed by `node` — Gelly's
    *    ScatterFunction.sendMessages / the pregel sendMessageTo.
    *  - `gather` combines the raw messages to one row per `node` — Gelly's
    *    GatherFunction + MessageCombiner (GSA's gather+sum); expressed as a
    *    DataFrame aggregation so Spark's map-side partial agg IS the
    *    combiner, applied before the shuffle like Gelly's combine-on-sender.
    *  - `apply` merges the previous state with the gathered messages into
    *    the next state (node, state…) — GSA's apply /
    *    GatherFunction.updateVertex.
    *
    * Spark-first posture: each phase is declarative (join → project →
    * aggregate per round, all codegen'd; one shuffle for the gather, one
    * for the apply join when the kernel joins), the rounds are a driver
    * loop over [[IterateOps.iterate]] with periodic localCheckpoint to keep
    * lineage flat — the Spark expression of the reference's
    * iteration-aware scheduler. At 100 TB: edges partitioned by src make
    * the scatter join co-located across rounds; state stays (node, …) and
    * never touches the driver. State columns must not collide with edge
    * column names (document, as Gelly requires distinct vertex/edge value
    * types). */
  def vertexIterate(
      edges: DataFrame,
      initial: DataFrame,
      rounds: Int,
      checkpointEvery: Int = 5,
      converged: (DataFrame, DataFrame) => Boolean = (_, _) => false)(
      scatter: DataFrame => DataFrame,
      gather: DataFrame => DataFrame,
      apply: (DataFrame, DataFrame) => DataFrame): DataFrame =
    IterateOps.iterate(initial, rounds, checkpointEvery)(
      step = { state =>
        val scatterIn = edges.join(state.withColumnRenamed("node", "src"), "src")
        apply(state, gather(scatter(scatterIn)))
      },
      converged = converged)

  /** Convergence test for [[vertexIterate]]: the state is a fixpoint when
    * NO row changed between rounds — Gelly's default scatter-gather
    * termination (a superstep in which no vertex updates its value ends
    * the iteration; ScatterGatherIteration.java's convergence behavior).
    * MULTISET equality needs both directions: exceptAll alone proves
    * prev ⊆ next, which a row-accumulating kernel (transitive closure)
    * satisfies from round one while still growing — the count comparison
    * closes that hole. Two jobs per round, the analogue of the reference's
    * per-superstep updated-vertices aggregator. */
  def fixpoint(prev: DataFrame, next: DataFrame): Boolean =
    prev.count() == next.count() && prev.exceptAll(next).isEmpty

  /** Fixed-iteration PageRank over (src, dst) edges, expressed on
    * [[vertexIterate]] (Gelly library/linkanalysis/PageRank.java is itself
    * a scatter-gather program). Every node must appear as a src (symmetric
    * graphs do) so outdeg is total. The out-degree is attached to the edge
    * relation ONCE before iterating — Gelly's Graph.outDegrees() join done
    * outside the loop, so each round is one scatter join + one gather
    * shuffle instead of two joins. */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = 0.85): DataFrame = {
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val n = nodes.count() // Gelly's numVertices — one count job, metadata-sized result
    // r20 (guide §2.4): the degree-annotated edge relation is referenced by
    // EVERY round's scatter join; without a barrier each round re-runs the
    // outdeg aggregation + join. localCheckpoint pins it once (edge-sized,
    // same pattern as ConnectedComponents/iterateDelta).
    val withDeg = edges.join(outdeg, "src").localCheckpoint(eager = true)
    vertexIterate(withDeg, nodes.select(col("node"), lit(1.0 / n).as("rank")), iters)(
      scatter = df => df.select(col("dst").as("node"), (col("rank") / col("outdeg")).as("msg")),
      gather = m => m.groupBy("node").agg(sum("msg").as("acc")),
      apply = (state, g) => state.select("node").join(g, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("acc"), lit(0.0))).as("rank")))
  }

  /** Bellman-Ford rounds of min-aggregated frontier expansion over
    * (u, v) edges, expressed on [[vertexIterate]] (Gelly
    * library/SingleSourceShortestPaths.java is the canonical
    * scatter-gather program); returns (node, dist) for nodes reached in
    * ≤ rounds. The state holds only REACHED nodes — the frontier-sparse
    * representation — so the apply is a full outer merge taking the min
    * distance, exactly the reference's updateVertex-if-smaller rule. */
  def bfs(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    // node = id + source (id is 0) rather than lit(source): a literal key
    // constant-folds the first round's join condition into `u = <const>`,
    // which has no extractable equi-key and plans a nested-loop join —
    // keeping it an attribute keeps every round a hash join
    val init = spark.range(1)
      .select((col("id") + source).as("node"), lit(0).as("dist"))
    vertexIterate(edges.select(col("u").as("src"), col("v").as("dst")), init, rounds)(
      scatter = df => df.select(col("dst").as("node"), (col("dist") + 1).as("msg")),
      gather = m => m.groupBy("node").agg(min("msg").as("msg")),
      // least() skips nulls, so an unreached-then-messaged node takes the
      // message and an unmessaged reached node keeps its distance
      apply = (state, g) => state.join(g, Seq("node"), "full")
        .select(col("node"), least(col("dist"), col("msg")).as("dist")))
  }

  val qPageRank: Q = Q(
    "q_graph_pagerank",
    (s, dir) => {
      val ranks = pageRank(supplyEdges(s, dir), iters = 3)
      ranks.filter(col("node") < 1000000L)
        .select(col("node"), round(col("rank") * 1000000, 6).as("rank_ppm"))
        .orderBy("node")
    },
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
           |e0 AS (SELECT s AS src, p + 1000000 AS dst FROM ps),
           |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
           |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
           |nodes AS (SELECT DISTINCT src AS node FROM edges),
           |pr0 AS (SELECT node, cast(1.0 AS double) / (SELECT count(*) FROM nodes) AS rank FROM nodes),
           |pr1 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
           |               + 0.85 * coalesce(sum(p.rank / o.outdeg), 0) AS rank
           |        FROM nodes n LEFT JOIN edges e ON e.dst = n.node
           |        LEFT JOIN pr0 p ON p.node = e.src LEFT JOIN outdeg o ON o.src = e.src
           |        GROUP BY n.node),
           |pr2 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
           |               + 0.85 * coalesce(sum(p.rank / o.outdeg), 0) AS rank
           |        FROM nodes n LEFT JOIN edges e ON e.dst = n.node
           |        LEFT JOIN pr1 p ON p.node = e.src LEFT JOIN outdeg o ON o.src = e.src
           |        GROUP BY n.node),
           |pr3 AS (SELECT n.node, 0.15 / (SELECT count(*) FROM nodes)
           |               + 0.85 * coalesce(sum(p.rank / o.outdeg), 0) AS rank
           |        FROM nodes n LEFT JOIN edges e ON e.dst = n.node
           |        LEFT JOIN pr2 p ON p.node = e.src LEFT JOIN outdeg o ON o.src = e.src
           |        GROUP BY n.node)
           |SELECT node, round(rank * 1000000, 6) AS rank_ppm FROM pr3
           |WHERE node < 1000000 ORDER BY node""".stripMargin))

  val qTriangles: Q = Q(
    "q_graph_triangles",
    (s, dir) => {
      // Degree-ordered orientation (the optimization Gelly's
      // TriangleEnumerator sorts its edges for): direct each undirected
      // edge from its lower-(degree, id) endpoint to the higher one, then
      // count directed wedges closed by a third edge. The count is
      // orientation-invariant — under any strict total order a triangle
      // {a<b<c} matches the path pattern exactly once (a->b, b->c, a->c) —
      // but the wedge join's intermediate drops from sum(outdeg^2) under
      // id-order to the O(m^1.5) bound: on a heavy-tailed degree
      // distribution (the 100 TB reality) id-ordering lets one hub node
      // explode the join while degree-ordering caps every out-degree at
      // ~sqrt(m). The degree relation is node-sized — AQE broadcasts it
      // when it fits and shuffle-joins it on a billion-node graph.
      val und = coSupplyEdges(s, dir, ordered = false)
      val deg = und.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
      // r20 (guide §2.4): the wedge join references the oriented edge
      // relation THREE times (e1/e2/e3); without a materialization barrier
      // each reference re-derives the orientation (two joins with the
      // degree relation) — three redundant subtree executions, 6 joins
      // instead of 2 before the wedge join even starts. localCheckpoint
      // pins the node-pair-sized oriented edges once (released with the
      // session); the 1000x-scale twin of this barrier is writing the
      // oriented edge relation to the lake before the wedge join.
      val e = und
        .join(deg.as("du"), col("u") === col("du.n"))
        .join(deg.as("dv"), col("v") === col("dv.n"))
        .filter(col("du.d") < col("dv.d") ||
          (col("du.d") === col("dv.d") && col("u") < col("v")))
        .select(col("u"), col("v"))
        .localCheckpoint(eager = true)
      e.as("e1")
        .join(e.as("e2"), col("e1.v") === col("e2.u"))
        .join(e.as("e3"), col("e1.u") === col("e3.u") && col("e2.v") === col("e3.v"))
        .agg(count(lit(1)).as("triangles"))
    },
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
           |e0 AS (SELECT a.s AS u, b.s AS v, count(*) AS w FROM ps a
           |       JOIN ps b ON a.p = b.p AND a.s < b.s GROUP BY a.s, b.s),
           |e AS (SELECT u, v FROM e0 WHERE w >= 1.12 * (SELECT avg(w) FROM e0))
           |SELECT count(*) AS triangles
           |FROM e e1 JOIN e e2 ON e1.v = e2.u
           |JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v""".stripMargin))

  val qSssp: Q = Q(
    "q_graph_sssp",
    (s, dir) =>
      bfs(coSupplyEdges(s, dir, ordered = false), source = 0L, rounds = 3)
        .orderBy("node"),
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
           |e0 AS (SELECT a.s AS u, b.s AS v, count(*) AS w FROM ps a
           |       JOIN ps b ON a.p = b.p AND a.s <> b.s GROUP BY a.s, b.s),
           |eu AS (SELECT u, v FROM e0 WHERE w >= 1.12 * (SELECT avg(w) FROM e0)),
           |d0 AS (SELECT cast(0 AS bigint) AS node, 0 AS dist),
           |d1 AS (SELECT node, min(dist) AS dist FROM (
           |         SELECT node, dist FROM d0
           |         UNION ALL SELECT eu.v, d0.dist + 1 FROM d0 JOIN eu ON d0.node = eu.u) x GROUP BY node),
           |d2 AS (SELECT node, min(dist) AS dist FROM (
           |         SELECT node, dist FROM d1
           |         UNION ALL SELECT eu.v, d1.dist + 1 FROM d1 JOIN eu ON d1.node = eu.u) x GROUP BY node),
           |d3 AS (SELECT node, min(dist) AS dist FROM (
           |         SELECT node, dist FROM d2
           |         UNION ALL SELECT eu.v, d2.dist + 1 FROM d2 JOIN eu ON d2.node = eu.u) x GROUP BY node)
           |SELECT node, dist FROM d3 ORDER BY node""".stripMargin))

  val qDegrees: Q = Q(
    "q_graph_degrees",
    (s, dir) =>
      partSupp(s, dir)
        .groupBy(col("s").as("node")).agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree"),
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
           |deg AS (SELECT s AS node, count(*) AS degree FROM ps GROUP BY s)
           |SELECT degree, count(*) AS n_nodes FROM deg GROUP BY degree
           |ORDER BY degree""".stripMargin))

  /** Label propagation rounds (Gelly `library/LabelPropagation.java`):
    * each node adopts its neighbors' most frequent label, ties to the
    * HIGHEST label (the reference's tie rule). The adopt step is a
    * max-aggregate over (count, label) structs — map-side partial, no
    * window shuffle; the oracle expresses the same pick as a rank-1
    * window because struct ordering isn't portable SQL. */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    // on [[vertexIterate]] (Gelly library/LabelPropagation.java extends
    // ScatterGatherIteration): scatter each node's label along its out
    // edges; the symmetric edge set makes "labels my neighbors sent me"
    // equal the original "labels I collect from my neighbors"
    val init = edges.select(col("u").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    vertexIterate(edges.select(col("u").as("src"), col("v").as("dst")), init, rounds)(
      scatter = df => df.select(col("dst").as("node"), col("label").as("msg")),
      gather = m => m
        .groupBy(col("node"), col("msg")).agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(max(struct(col("c"), col("msg"))).as("m"))
        .select(col("node"), col("m.msg").as("label")),
      // every node has ≥1 neighbor (nodes come from the edge list), so the
      // gathered labels ARE the full next state — GatherFunction.updateVertex
      apply = (_, g) => g)
  }

  val qLabelProp: Q = Q(
    "q_graph_labelprop",
    (s, dir) =>
      labelPropagation(coSupplyEdges(s, dir, ordered = false), rounds = 2)
        .orderBy("node"),
    Some("""WITH ps AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
           |e0 AS (SELECT a.s AS u, b.s AS v, count(*) AS w FROM ps a
           |       JOIN ps b ON a.p = b.p AND a.s <> b.s GROUP BY a.s, b.s),
           |eu AS (SELECT u, v FROM e0 WHERE w >= 1.12 * (SELECT avg(w) FROM e0)),
           |l0 AS (SELECT DISTINCT u AS node, u AS label FROM eu),
           |l1 AS (SELECT node, label FROM (
           |  SELECT c.u AS node, c.label,
           |         row_number() OVER (PARTITION BY c.u ORDER BY c.c DESC, c.label DESC) AS rn
           |  FROM (SELECT e.u, l.label, count(*) AS c FROM eu e JOIN l0 l ON e.v = l.node
           |        GROUP BY e.u, l.label) c) r WHERE rn = 1),
           |l2 AS (SELECT node, label FROM (
           |  SELECT c.u AS node, c.label,
           |         row_number() OVER (PARTITION BY c.u ORDER BY c.c DESC, c.label DESC) AS rn
           |  FROM (SELECT e.u, l.label, count(*) AS c FROM eu e JOIN l1 l ON e.v = l.node
           |        GROUP BY e.u, l.label) c) r WHERE rn = 1)
           |SELECT node, label FROM l2 ORDER BY node""".stripMargin))

  val all: Seq[Q] = Seq(qPageRank, qTriangles, qSssp, qDegrees, qLabelProp)
}
