package graft.operators

import org.apache.spark.sql.DataFrame

/** Bulk iteration (reference DataSet.iterate:1131 / iterateDelta:1179):
  * Spark has no iteration operator — the idiomatic mapping is a driver-side
  * loop over checkpointed DataFrames (SURVEY §2.3). `iterate` runs `step`
  * until convergence or maxIter, localCheckpoint-ing every few rounds to
  * truncate the growing lineage (the Spark equivalent of the reference's
  * iteration-aware scheduler keeping plans bounded).
  */
object IterateOps {

  def iterate(
      initial: DataFrame,
      maxIter: Int,
      checkpointEvery: Int = 5)(
      step: DataFrame => DataFrame,
      converged: (DataFrame, DataFrame) => Boolean = (_, _) => false): DataFrame = {
    var cur = initial
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = step(cur)
      val nextC =
        if ((i + 1) % checkpointEvery == 0) next.localCheckpoint(eager = true)
        else next
      if (converged(cur, nextC)) done = true
      cur = nextC
      i += 1
    }
    cur
  }

  /** Delta (workset) iteration — reference DataSet.iterateDelta:1179 /
    * DeltaIteration.java: a keyed SOLUTION SET plus a shrinking WORKSET.
    * Each round `step(solution, workset)` returns the solution DELTA (rows
    * to upsert by `keyCols`) and the next workset; iteration stops when the
    * workset is empty or maxIter is hit.
    *
    * Why it beats bulk iterate at scale: the per-round join touches only the
    * frontier (workset), not every element, and convergence is the workset's
    * own emptiness — no separate full-table fixpoint probe per round (the
    * bulk CC needed two full-size scalar aggregations per round). Both
    * solution and workset are localCheckpoint-ed every round to keep lineage
    * flat, matching the reference's iteration-aware scheduling. */
  /** Thrown when [[iterateDelta]] hits maxIter with a non-empty workset:
    * the fixpoint was NOT reached and the solution set is mid-iteration
    * state. Carries the surviving workset size for the error message. */
  final class NonConvergedException(val rounds: Int, val worksetSize: Long)
    extends IllegalStateException(
      s"iterateDelta did not converge: workset still has $worksetSize rows " +
        s"after $rounds rounds — raise maxIter or use a structurally-bounded " +
        s"algorithm (e.g. large-star/small-star for connected components)")

  def iterateDelta(
      initialSolution: DataFrame,
      initialWorkset: DataFrame,
      keyCols: Seq[String],
      maxIter: Int,
      checkpointEvery: Int = 2,
      failOnMaxIter: Boolean = true)(
      step: (DataFrame, DataFrame) => (DataFrame, DataFrame)): DataFrame = {
    var solution = initialSolution.localCheckpoint(eager = true)
    var workset = initialWorkset.localCheckpoint(eager = true)
    var i = 0
    while (i < maxIter && !workset.isEmpty) {
      val (delta, nextWorkset) = step(solution, workset)
      val d = delta.localCheckpoint(eager = true)
      // upsert: drop solution rows whose key appears in the delta, add delta
      solution = solution
        .join(d.select(keyCols.head, keyCols.tail: _*), keyCols, "left_anti")
        .unionByName(d.select(solution.columns.map(d.col): _*))
      // materializing the upserted solution is one extra job per round; a
      // bounded un-checkpointed suffix (depth <= checkpointEvery) keeps the
      // lineage flat enough while halving the per-round barrier count
      if ((i + 1) % checkpointEvery == 0)
        solution = solution.localCheckpoint(eager = true)
      workset =
        if (nextWorkset eq delta) d else nextWorkset.localCheckpoint(eager = true)
      i += 1
    }
    // A silently-truncated iteration is worse than a failed one: with a
    // component of diameter > maxIter (chained near-dups at 100 TB scale)
    // the labels would be WRONG with no signal. Fail loudly by default;
    // callers that want partial results opt out and get a log line.
    if (i == maxIter && !workset.isEmpty) {
      val n = workset.count()
      if (failOnMaxIter) throw new NonConvergedException(i, n)
      else System.err.println(
        s"[iterateDelta] WARNING: converged=false — $n workset rows remain " +
          s"after $i rounds; solution set is mid-iteration state")
    }
    solution
  }
}
