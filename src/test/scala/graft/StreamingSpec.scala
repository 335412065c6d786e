package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming harness tests — the analogue of the reference's operator harness
  * tests (flink-table-planner-blink/.../runtime/harness/
  * GroupAggregateHarnessTest.scala): drive a stateful operator with explicit
  * elements and assert emitted results per batch. */
class StreamingSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("parquet stream-sink mode returns the same rows as the memory sink") {
    // the growth gate routes append-mode harness runs through a distributed
    // file sink (StreamingOps.SinkKey) so 100x outputs don't measure driver
    // heap; the two paths must be row-identical
    import graft.streaming.StreamingOps
    val q = graft.streaming.StatefulOps.qStreamOverRange // append-mode entry
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).toSeq.sorted
    val viaMemory = rows(q.run(spark, sfDir))
    spark.conf.set(StreamingOps.SinkKey, "parquet")
    try {
      val viaParquet = rows(q.run(spark, sfDir))
      assert(viaParquet == viaMemory,
        s"sink modes diverged: memory=${viaMemory.size} rows, parquet=${viaParquet.size}")
    } finally spark.conf.unset(StreamingOps.SinkKey)
  }

  test("bucketed stream-stream outer join is row-identical to the unbucketed plan") {
    // the time-bucketed decomposition (BucketedStreamJoin) must be
    // invisible to results: same matched pairs, same null-pads, same
    // emission rule — only the state layout (composite (uid, bucket) key)
    // differs. Both SFs' oracles also pin this; the spec keeps the parity
    // under sbt test where the growth trees aren't oracle-checked.
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).toSeq.sorted
    val unbucketed = rows(graft.streaming.DedupSql.qStreamOuterJoin.run(spark, sfDir))
    val bucketed = rows(
      graft.streaming.BucketedStreamJoin.qStreamOuterJoinBucketed.run(spark, sfDir))
    assert(bucketed == unbucketed,
      s"decomposition changed results: ${bucketed.size} vs ${unbucketed.size} rows")
  }

  test("bucketed stream interval join is row-identical to the unbucketed plan") {
    // backward-interval twin (r20): the click side expands FORWARD into
    // {bucket, bucket+1}; inner join, so no null-pad reconciliation —
    // results must still be exactly the un-bucketed operator's
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.mkString("|")).toSeq.sorted
    val unbucketed = rows(
      graft.streaming.StatefulOps.qStreamIntervalJoin.run(spark, sfDir))
    val bucketed = rows(
      graft.streaming.BucketedStreamJoin.qStreamIntervalJoinBucketed.run(spark, sfDir))
    assert(unbucketed.nonEmpty, "fixture produced no interval-join pairs — vacuous")
    assert(bucketed == unbucketed,
      s"decomposition changed results: ${bucketed.size} vs ${unbucketed.size} rows")
  }

  test("streaming tumble agg over MemoryStream matches expected windows") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
      .groupBy(window($"ts", "5 minutes"), $"event_type")
      .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
      .select(unix_timestamp($"window.start").as("wstart"), $"event_type", $"cnt", $"total")
    val q = df.writeStream.format("memory").queryName("mem_tumble")
      .outputMode("complete").start()
    mem.addData(
      (ts("2024-01-01 00:01:00"), "a", 1.0),
      (ts("2024-01-01 00:02:00"), "a", 2.0),
      (ts("2024-01-01 00:06:00"), "a", 4.0),
      (ts("2024-01-01 00:01:30"), "b", 8.0))
    q.processAllAvailable()
    val rows = spark.table("mem_tumble").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val day = ts("2024-01-01 00:00:00").getTime / 1000
    assert(rows == Set(
      (day, "a", 2L, 3.0), (day + 300, "a", 1L, 4.0), (day, "b", 1L, 8.0)))
    q.stop()
  }

  test("streaming dropDuplicates emits each key once across batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
    val q = df.writeStream.format("memory").queryName("mem_dedup")
      .outputMode("append").start()
    mem.addData((1L, "x"), (1L, "x"), (2L, "y"))
    q.processAllAvailable()
    mem.addData((1L, "x"), (2L, "z")) // dup across batches + one new
    q.processAllAvailable()
    val rows = spark.table("mem_dedup").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "x"), (2L, "y"), (2L, "z")))
    assert(spark.table("mem_dedup").count() == 3)
    q.stop()
  }

  test("session windows merge across micro-batches when a bridging event arrives") {
    // reference MergingWindowSet semantics (WindowOperator.java session
    // merging): two OPEN sessions of one key must fuse into one when a
    // later batch delivers an event inside both gaps
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    // 10-minute watermark delay: both fragment sessions must still be OPEN
    // when the bridge arrives (with delay 0 the lagged watermark closes the
    // first fragment and drops the bridge as late data — verified)
    val df = mem.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window($"ts", "1 minute"), $"user_id")
      .agg(count(lit(1)).as("cnt"))
      .select(unix_timestamp($"session_window.start").as("s"),
        unix_timestamp($"session_window.end").as("e"), $"user_id", $"cnt")
    val q = df.writeStream.format("memory").queryName("mem_session_merge")
      .outputMode("append").start()
    // batch 1: two events 90 s apart -> two separate open sessions
    mem.addData(
      (ts("2024-01-01 00:00:00"), 1L, 1.0),
      (ts("2024-01-01 00:01:30"), 1L, 1.0))
    q.processAllAvailable()
    // batch 2: a bridge at 00:00:45 (within 1 min of both) merges them
    mem.addData((ts("2024-01-01 00:00:45"), 1L, 1.0))
    q.processAllAvailable()
    // advance the watermark far past the merged session's end to close it
    mem.addData((ts("2024-01-01 01:00:00"), 2L, 1.0))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 02:00:00"), 2L, 1.0))
    q.processAllAvailable()
    val base = ts("2024-01-01 00:00:00").getTime / 1000
    val key1 = spark.table("mem_session_merge").collect()
      .filter(_.getLong(2) == 1L)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // ONE merged session [00:00:00, 00:02:30) with all 3 events — not the
    // two fragments batch 1 opened
    assert(key1 == Set((base, base + 150, 3L)), s"got $key1")
    q.stop()
  }

  test("file-stream twins equal their batch counterparts") {
    val streamRes = streaming.StreamingOps.qStreamTumble.run(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val batchRes = operators.TimeWindows.qWindowTumble.run(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(streamRes == batchRes)
  }

  test("watermark + append mode emits only closed windows") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val df = mem.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window($"ts", "5 minutes"))
      .agg(sum($"value").as("total"))
      .select(unix_timestamp($"window.start").as("wstart"), $"total")
    val q = df.writeStream.format("memory").queryName("mem_wm")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:01:00"), 1.0))
    q.processAllAvailable()
    // watermark still at batch-1 max - 1min; first window not closed yet
    assert(spark.table("mem_wm").count() == 0)
    mem.addData((ts("2024-01-01 00:20:00"), 9.0)) // advances watermark past 00:05
    q.processAllAvailable()
    val rows = spark.table("mem_wm").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSet == Set((ts("2024-01-01 00:00:00").getTime / 1000, 1.0)))
    q.stop()
  }
}
