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
  def iterateDelta(
      initialSolution: DataFrame,
      initialWorkset: DataFrame,
      keyCols: Seq[String],
      maxIter: Int,
      checkpointEvery: Int = 2)(
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
    solution
  }
}
