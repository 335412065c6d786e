package graft.operators

import graft.{Q, Tables}
import graft.functions.FlinkFunctions.md5Hash31
import org.apache.spark.sql.functions._

/** Sketch operators (reference: approximate aggregates in the ecosystem —
  * Flink exposes APPROX_COUNT_DISTINCT via Calcite; the 100 TB engine wants
  * mergeable sketches for distinct counting at scale).
  *
  * KMV (k minimum values) distinct-count sketch: keep the k smallest hash
  * values per group; estimate = (k-1) / normalized kth minimum. Unlike
  * HyperLogLog, KMV over a FIXED hash is fully deterministic, so the driver
  * gate can hash-compare against a DuckDB oracle computing the identical
  * sketch — an oracle-checkable approximate aggregate (the exact-path
  * q_approx_agg stays rows-only for Spark's own HLL/quantile sketches).
  *
  * Scale: the per-group state is k longs (mergeable by keeping the k
  * smallest of the union — exactly what partial aggregation does with the
  * window-free TopK form); the shuffle carries k values per group instead
  * of the distinct set.
  */
object SketchOps {

  private val P31 = 2147483647L
  private val K = 64

  /** Distinct l_partkey per l_returnflag, KMV(k=64) vs the true count. */
  val qKmvDistinct: Q = Q(
    "q_kmv_distinct",
    (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"l_returnflag").orderBy($"h")
      // distinct over (flag, HASH) — not (flag, key) — so a hash collision
      // dedups identically on both engines
      val hashed = Tables.t(s, dir, "lineitem")
        .select($"l_returnflag",
          md5Hash31($"l_partkey".cast("string")).as("h"))
        .distinct()
      hashed
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= K)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_min"), max($"h").as("kth"))
        .select($"l_returnflag",
          when($"n_min" < K, $"n_min")
            .otherwise(round(lit((K - 1).toDouble) * P31 / $"kth"))
            .cast("long").as("est_distinct"))
        .orderBy($"l_returnflag")
    },
    Some(s"""WITH hashed AS (
            |  SELECT DISTINCT l_returnflag,
            |    CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8)) AS BIGINT)
            |      % 2147483647 AS h
            |  FROM lineitem),
            |ranked AS (
            |  SELECT l_returnflag, h,
            |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
            |  FROM hashed),
            |kmv AS (
            |  SELECT l_returnflag, count(*) AS n_min, max(h) AS kth
            |  FROM ranked WHERE rn <= $K GROUP BY l_returnflag)
            |SELECT l_returnflag,
            |       CAST(CASE WHEN n_min < $K THEN n_min
            |                 ELSE round(${K - 1}.0 * 2147483647 / kth) END AS BIGINT)
            |         AS est_distinct
            |FROM kmv ORDER BY l_returnflag""".stripMargin))

  val all: Seq[Q] = Seq(qKmvDistinct)
}
