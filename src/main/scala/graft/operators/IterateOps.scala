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
}
