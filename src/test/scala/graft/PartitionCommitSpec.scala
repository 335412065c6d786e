package graft

import graft.streaming.PartitionCommit
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming filesystem sink partition commit (reference FLIP-115
  * StreamingFileCommitter + PartitionCommitPolicy): partitions become
  * visible (success-file) only once the watermark passes their end; the
  * open partition stays invisible; commits are idempotent. */
class PartitionCommitSpec extends GraftSpec {

  private def hasSuccess(path: String, hr: Long): Boolean =
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(path, s"hr=$hr", "_SUCCESS"))

  test("partitions commit as the watermark passes; the open one stays invisible") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = Tables.scratch(s"pc-spec/${java.util.UUID.randomUUID()}")
    val mem = MemoryStream[(Long, Double, Long)] // (event_id, value, epochSec)
    val df = mem.toDF().toDF("event_id", "value", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("hr", (floor(col("sec") / 3600) * 3600).cast("long"))
      .select("event_id", "value", "ts", "hr")
    val q = PartitionCommit.foreachBatchPartitioned(df, path, "hr", 3600L, "ts")
      .start()
    // batch 1: rows in hour 0 and hour 3600; max ts 3605 → only hour 0 done
    mem.addData((1L, 1.0, 10L), (2L, 2.0, 3605L))
    q.processAllAvailable()
    assert(hasSuccess(path, 0L) && !hasSuccess(path, 3600L))
    // batch 2: watermark jumps to 7210 → hour 3600 commits, hour 7200 open
    mem.addData((3L, 3.0, 7210L))
    q.processAllAvailable()
    assert(hasSuccess(path, 3600L) && !hasSuccess(path, 7200L))
    // committed-only read = the Hive-consumer view: row 3's partition is
    // still open and therefore absent even though its file is on disk
    val seen = PartitionCommit.readCommitted(spark, path, "hr")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(seen == Seq(1L, 2L))
    // batch 3 re-delivers old data (at-least-once): commit is idempotent,
    // no failure on the existing _SUCCESS markers
    mem.addData((4L, 4.0, 20L))
    q.processAllAvailable()
    assert(hasSuccess(path, 0L))
    q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }

  test("sink.partition-commit.* options parse with reference keys") {
    val o = PartitionCommit.options(Map(
      "sink.partition-commit.trigger" -> "partition-time",
      "sink.partition-commit.delay" -> "1 h",
      "sink.partition-commit.policy.kind" -> "success-file"))
    assert(o == PartitionCommit.Options("partition-time", 3600L, "success-file"))
    assert(PartitionCommit.options(Map.empty) ==
      PartitionCommit.Options("partition-time", 0L, "success-file"))
  }

  test("commit delay holds a ready partition back") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = Tables.scratch(s"pc-delay/${java.util.UUID.randomUUID()}")
    val mem = MemoryStream[(Long, Double, Long)]
    val df = mem.toDF().toDF("event_id", "value", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withColumn("hr", (floor(col("sec") / 3600) * 3600).cast("long"))
      .select("event_id", "value", "ts", "hr")
    val q = PartitionCommit.foreachBatchPartitioned(
      df, path, "hr", 3600L, "ts", delaySec = 600L).start()
    // watermark 3700 passes hour 0's end (3600) but not end+delay (4200)
    mem.addData((1L, 1.0, 100L), (2L, 2.0, 3700L))
    q.processAllAvailable()
    assert(!hasSuccess(path, 0L))
    mem.addData((3L, 3.0, 4300L)) // now 4300 >= 4200: commits
    q.processAllAvailable()
    assert(hasSuccess(path, 0L))
    q.stop()
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
  }
}
