package graft

import graft.operators.IterateOps
import org.apache.spark.sql.functions._

/** Workset iteration semantics (reference DeltaIteration.java): delta rows
  * upsert the solution set by key, the workset drives the next round, and
  * iteration stops on an empty workset. */
class IterateDeltaSpec extends GraftSpec {

  test("delta iteration upserts by key and stops on empty workset") {
    val sparkS = spark
    import sparkS.implicits._
    // min-label propagation on a path graph 1-2-3, plus isolated 9
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val labels0 = Seq((1L, 1L), (2L, 2L), (3L, 3L), (9L, 9L)).toDF("node", "label")
    var rounds = 0
    val result = IterateOps.iterateDelta(labels0, labels0, Seq("node"), maxIter = 10) {
      (solution, workset) =>
        rounds += 1
        val cand = edges.join(workset.withColumnRenamed("node", "src2"), $"src" === $"src2")
          .select($"dst".as("node"), $"label")
          .groupBy($"node").agg(min($"label").as("cand"))
        val delta = cand.join(solution, "node").where($"cand" < $"label")
          .select($"node", $"cand".as("label"))
        (delta, delta)
    }
    val got = result.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
    // path graph: round 1 improves node 2, round 2 improves node 3,
    // round 3 has an empty delta -> workset empties -> stop (not maxIter)
    assert(rounds == 3, s"expected 3 rounds, ran $rounds")
  }

  test("non-empty workset at maxIter fails loudly instead of truncating") {
    val sparkS = spark
    import sparkS.implicits._
    // path graph 1-2-3-4-5-6: min-label propagation needs 5 rounds to push
    // label 1 to node 6; maxIter=3 leaves a non-empty workset mid-iteration
    val edges = (1L to 5L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
      .toDF("src", "dst")
    val nodes = (1L to 6L).map(i => (i, i))
    val labels0 = nodes.toDF("node", "label")
    def propagate(maxIter: Int, failOnMaxIter: Boolean) =
      IterateOps.iterateDelta(labels0, labels0, Seq("node"),
        maxIter = maxIter, failOnMaxIter = failOnMaxIter) { (solution, workset) =>
        val cand = edges.join(workset.withColumnRenamed("node", "src2"), $"src" === $"src2")
          .select($"dst".as("node"), $"label")
          .groupBy($"node").agg(min($"label").as("cand"))
        val delta = cand.join(solution, "node").where($"cand" < $"label")
          .select($"node", $"cand".as("label"))
        (delta, delta)
      }
    val ex = intercept[IterateOps.NonConvergedException] { propagate(3, failOnMaxIter = true) }
    assert(ex.rounds == 3 && ex.worksetSize > 0)
    // opt-out keeps the (partial) solution; a deep-enough budget converges
    val partial = propagate(3, failOnMaxIter = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(partial(6L) != 1L, "3 truncated rounds cannot have labeled node 6")
    val full = propagate(10, failOnMaxIter = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(full == (1L to 6L).map(_ -> 1L).toMap)
  }
}
