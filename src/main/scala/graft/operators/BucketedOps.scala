package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hive-style BUCKETED tables — the co-located-join layout (reference:
  * batch-SQL bucket-shuffle join planning in flink-table-planner-blink's
  * BatchExecHashJoin + the partitioned-file connector; in Spark this is the
  * `bucketBy` DataSource layout, FileSourceScanExec's bucketed reads).
  *
  * THE 100 TB pattern this demonstrates: when two fact tables are written
  * bucketed (+sorted) on their join key with the same bucket count, every
  * subsequent join on that key is planned with NO exchange on either side —
  * each task reads bucket i of both tables and joins them locally. The
  * shuffle is paid ONCE at layout time and amortized over every downstream
  * join/aggregate on the key, which is why warehouse fact tables live
  * bucketed. [[PlanAuditSpec]]'s twin asserts the exchange-free plan.
  */
object BucketedOps {

  /** Write `df` as a bucketed external table (idempotent per session run).
    *
    * r20 (guide §6 small files): the writer emits one file per bucket PER
    * TASK, so writing from the session's default shuffle layout (32
    * partitions here; thousands on a cluster) sprayed up to tasks x buckets
    * tiny files per table. Repartitioning by the bucket key into exactly
    * `buckets` partitions first uses the same murmur3 pmod mapping as the
    * bucket id, so each task holds exactly one bucket and writes exactly
    * one file: 8 files per table instead of ~170, and every downstream
    * bucket-aligned scan lists/opens 8 files. (The in-bucket sortBy is
    * per-file, unchanged; results are identical.) */
  def writeBucketed(s: SparkSession, df: DataFrame, name: String,
      key: String, buckets: Int): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", Tables.scratch(s"bucketed/$name"))
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** The bucketed pair: orders + lineitem laid out on the order key. */
  def layOut(s: SparkSession, dir: String): Unit = {
    writeBucketed(s, Tables.t(s, dir, "orders")
      .select("o_orderkey", "o_orderpriority"),
      "graft_orders_bkt", "o_orderkey", 8)
    writeBucketed(s, Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
      "graft_lineitem_bkt", "l_orderkey", 8)
  }

  /** q_bucketed_join: fact-to-fact join on the bucket key — revenue per
    * priority. The MERGE hint pins sort-merge (a broadcast would dodge the
    * layout being demonstrated); with both sides bucketed ×8 on the key the
    * planned join has NO Exchange — bucket-aligned scans feed the join
    * directly. Oracle: the same join/aggregate from the raw tables. */
  val qBucketedJoin: Q = Q(
    "q_bucketed_join",
    (s, dir) => {
      layOut(s, dir)
      val o = s.table("graft_orders_bkt").hint("merge")
      val l = s.table("graft_lineitem_bkt").hint("merge")
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
            .as("revenue"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority,
           |       CAST(count(*) AS BIGINT) AS n_items,
           |       round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  val all: Seq[Q] = Seq(qBucketedJoin)
}
