package graft

import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Large-star/small-star connected components (Kiveris et al. SoCC'14):
  * the O(log n)-round CC used by q_dedup_clusters (headline since round 7). */
class StarCCSpec extends GraftSpec {

  private def labels(nodes: Seq[Long], edges: Seq[(Long, Long)], maxIter: Int = 30) = {
    val sparkS = spark
    import sparkS.implicits._
    ConnectedComponents.componentsStar(
      nodes.toDF("node"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("chain graph resolves to the component min in far fewer rounds than its diameter") {
    // a 64-node chain: label propagation needs 63 rounds; star CC must
    // finish inside 10 (O(log n) structural bound, not O(diameter))
    val nodes = (1L to 64L)
    val edges = (1L until 64L).map(i => (i, i + 1))
    val got = labels(nodes, edges, maxIter = 10)
    assert(got == nodes.map(_ -> 1L).toMap)
  }

  test("multiple components + isolated nodes label independently") {
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 12L, 99L)
    val edges = Seq((2L, 3L), (1L, 2L), (11L, 10L), (11L, 12L))
    val got = labels(nodes, edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("dense + chain mix matches min-label semantics") {
    // star component {5,6,7,8} all linked to 5; chain 20-21-22; bridge 8-20
    // merges them transitively with component min 5
    val nodes = (5L to 8L) ++ (20L to 22L)
    val edges = Seq((5L, 6L), (5L, 7L), (5L, 8L), (20L, 21L), (21L, 22L), (8L, 20L))
    val got = labels(nodes, edges)
    assert(got == nodes.map(_ -> 5L).toMap)
  }
}
