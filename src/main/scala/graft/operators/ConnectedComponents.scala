package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-star / small-star connected components (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
  * structurally-bounded alternative to min-label propagation for the dedup
  * clustering path (reference iterateDelta workloads, DataSet.iterateDelta
  * :1179).
  *
  * Why it matters at 100 TB: label propagation needs O(diameter) rounds —
  * a chain of pairwise near-dups (common in scraped corpora: v1≈v2≈…≈vk)
  * makes the round count data-dependent and unbounded, which is exactly the
  * failure mode the iterateDelta maxIter guard now turns into a hard error.
  * Large-star/small-star converges in O(log n) rounds REGARDLESS of
  * diameter: each round rewires every node toward its neighborhood minimum
  * (large-star: strictly-larger neighbors -> min; small-star: smaller
  * neighbors -> min), provably preserving connectivity while at least
  * halving star-height. n = 10^12 nodes still converges in ~40 rounds.
  *
  * Edges are kept in canonical big->small orientation (u > v always); at
  * the fixpoint the edge set is exactly { (node, componentMin) }.
  */
object ConnectedComponents {

  /** One large-star round: for every node, connect each strictly-larger
    * neighbor to the minimum of the closed neighborhood. */
  private[operators] def largeStar(e: DataFrame): DataFrame = {
    val nbr = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v"))) // both directions
    val m = nbr.groupBy("u").agg(min("v").as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    nbr.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v")) // v > u >= m, canonical
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: for every node, connect its smaller neighbors
    * (and itself) to the smallest of them. */
  private[operators] def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val m = dir.groupBy("u").agg(min("v").as("m"))
    val rewired = dir.join(m, "u")
      .where(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val selfLink = m.select(col("u"), col("m").as("v"))
    rewired.union(selfLink)
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components over an undirected edge list (columns `src`,
    * `dst`). Returns (node, label) for every node of `nodes` (column
    * `node`), label = the component's minimum node id (isolated nodes label
    * themselves). Fails with [[IterateOps.NonConvergedException]] if the
    * edge set has not reached its fixpoint within maxIter rounds — with the
    * O(log n) bound that indicates a bug, not a deep graph. */
  def componentsStar(nodes: DataFrame, edges: DataFrame, maxIter: Int = 30): DataFrame = {
    var e = edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // cheap per-round fingerprint: one aggregate job vs two except jobs.
    // A CHANGED fingerprint proves non-convergence exactly; only a STABLE
    // fingerprint pays the exact set-equality confirmation (so a collision
    // can never declare a false fixpoint — it only costs one extra probe).
    // Overflow-proof arithmetic (the 100x growth rung caught the earlier
    // `sum(u * v % p)` throwing ARITHMETIC_OVERFLOW on ~1e10 node ids —
    // u*v exceeds a long BEFORE the mod; snowflake-style 64-bit ids would
    // hit the same wall in production): reduce each operand mod p first,
    // so the product stays under 2^60, and accumulate every sum in
    // DECIMAL(38,0) so no edge count can overflow the fingerprint itself.
    def fp(df: DataFrame): (Long, String, String, String) = {
      val p = 1000000007L
      val r = df.agg(count(lit(1)),
        sum(col("u").cast("decimal(38,0)")),
        sum(col("v").cast("decimal(38,0)")),
        sum((pmod(col("u"), lit(p)) * pmod(col("v"), lit(p)) % p)
          .cast("decimal(38,0)"))).head()
      def g(i: Int) = if (r.isNullAt(i)) "0" else r.getDecimal(i).toPlainString
      (r.getLong(0), g(1), g(2), g(3))
    }
    var curFp = fp(e)
    var converged = false
    var i = 0
    while (i < maxIter && !converged) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      val nextFp = fp(next)
      // both sides are distinct canonical pair-sets: fixpoint = set
      // equality. One except suffices (r21): the fingerprint equality
      // already proved |next| = |e| (count is the tuple's first field),
      // and for equal-cardinality sets next ⊆ e ⟹ next = e — the second
      // except job was provably redundant.
      converged = nextFp == curFp && next.except(e).isEmpty
      e = next
      curFp = nextFp
      i += 1
    }
    if (!converged) throw new IterateOps.NonConvergedException(i, e.count())
    nodes
      .join(e.select(col("u").as("node"), col("v").as("label")), Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
  }
}
