package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY "Partitioning & shuffle": salting for
  * skew; reference analogue: Blink's adaptive hash-join skew handling and the
  * two-stage agg split).
  *
  * saltedJoin replicates the build side `salt` times and scatters the probe
  * side across the replicas, so one hot key spreads over `salt` reducers
  * instead of melting one. Exact for equi-joins (each probe row meets exactly
  * one replica of its key). At 100 TB this is the difference between a stuck
  * straggler task and an even stage; AQE's skew-join split handles sort-merge
  * cases, but salting also covers hash-partitioned aggregations and
  * stream-state partitioning where AQE can't re-plan.
  */
object SkewOps {

  /** Equi-join with salted keys: `left` (large, possibly skewed) joins
    * `right` (small enough to replicate) on `leftKey == rightKey`. The
    * build-side replication is an explode over a literal 0..salt-1 array —
    * pure projection, no join node — so the whole plan stays a single
    * equi-join on (key, salt). */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt", (rand(seed = 7) * salt).cast("int"))
    val replicas = right.withColumn("__salt",
      explode(lit((0 until salt).toArray)))
    saltedLeft.join(replicas,
      leftKey === rightKey && saltedLeft("__salt") === replicas("__salt"))
      .drop("__salt")
  }

  /** Oracle-checked query: salted join of lineitem (probe) with the 25-row
    * nation-keyed customer counts (build), aggregated back — result must be
    * identical to the plain join. */
  val qSaltedJoin: Q = Q(
    "q_salted_join",
    (s, dir) => {
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      val sup = Tables.t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      saltedJoin(l, sup, $"l_suppkey", $"s_suppkey", salt = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("cnt"),
          graft.operators.Relational.moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
        .orderBy($"s_nationkey")
    },
    Some("""SELECT s_nationkey, count(*) AS cnt,
           |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
           |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin))

  /** The UNSALTED twin of [[qSaltedJoin]] — identical semantics and oracle,
    * naive plan: plain equi-join, no salt scatter. Exists for the zipf
    * skew rung (r18 verdict order #1): on the skewed tree the hot
    * l_suppkey concentrates ~3% of 600M rows in one shuffle partition,
    * and THIS query is where the rung asserts AQE's skew-join split
    * actually fires (`skew=true` in the final adaptive plan —
    * ScaleGrowth.expectAqeSkewSplit), while the salted twin shows the
    * mitigation that also covers what AQE can't re-plan (hash-partitioned
    * aggregations, stream state). At the bench SFs the supplier side is
    * broadcast and the two twins share a plan shape — the divergence under
    * scale+skew is the point. */
  val qUnsaltedJoin: Q = Q(
    "q_unsalted_join",
    (s, dir) => {
      import s.implicits._
      val l = Tables.t(s, dir, "lineitem")
        .select($"l_suppkey", $"l_extendedprice", $"l_discount")
      val sup = Tables.t(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      l.join(sup, $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("cnt"),
          graft.operators.Relational.moneySum($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("revenue"))
        .orderBy($"s_nationkey")
    },
    qSaltedJoin.oracle)

  /** Count windows (reference KeyedStream.countWindow /
    * CountTumblingWindowAssigner): tumbling count-of-N per key, batch form —
    * bucket = (arrival rank - 1) / N. */
  val qCountWindow: Q = Q(
    "q_count_window",
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"event_id")
      Tables.t(s, dir, "events")
        .withColumn("bucket", ((row_number().over(w) - 1) / 5).cast("int"))
        .groupBy($"user_id", $"bucket")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .orderBy($"user_id", $"bucket")
    },
    Some("""SELECT user_id, bucket, count(*) AS cnt, round(sum(value), 2) AS total
           |FROM (
           |  SELECT user_id, value,
           |         CAST((row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1) // 5
           |              AS INTEGER) AS bucket
           |  FROM events)
           |GROUP BY user_id, bucket ORDER BY user_id, bucket""".stripMargin))

  val all: Seq[Q] = Seq(qSaltedJoin, qUnsaltedJoin, qCountWindow)
}
