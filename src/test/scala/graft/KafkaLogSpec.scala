package graft

import graft.sources.KafkaLog
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** File-backed Kafka-mapping contract: hash partitioning, monotone offsets,
  * idempotent (exactly-once) segment writes, consumer-offset resume, and
  * streaming tail reads. */
class KafkaLogSpec extends GraftSpec {

  private def tmp(): String =
    Files.createTempDirectory("kafkalog").toString

  test("exactly-once: redelivered batch does not duplicate records") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmp()
    val batch = Seq(("a", "1"), ("b", "2"), ("c", "3")).toDF("key", "value")
    KafkaLog.writeBatch(batch, dir, "t", numPartitions = 2, batchId = 0)
    // redelivery of the same batch id (failure/restart replay)
    KafkaLog.writeBatch(batch, dir, "t", numPartitions = 2, batchId = 0)
    val read = KafkaLog.readBatch(spark, dir, "t")
    assert(read.count() == 3)
    assert(read.select("key").as[String].collect().toSet == Set("a", "b", "c"))
  }

  test("offsets are monotone per partition across batches") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmp()
    KafkaLog.writeBatch(Seq(("a", "1"), ("b", "2")).toDF("key", "value"),
      dir, "t", numPartitions = 2, batchId = 0)
    KafkaLog.writeBatch(Seq(("a", "3"), ("b", "4")).toDF("key", "value"),
      dir, "t", numPartitions = 2, batchId = 1)
    val rows = KafkaLog.readBatch(spark, dir, "t")
      .select("partition", "offset", "key", "value")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getString(3)))
    rows.groupBy(_._1).foreach { case (_, part) =>
      val offs = part.sortBy(_._4).map(_._2) // batch order = value order here
      assert(offs.sorted.sameElements(offs), s"offsets not monotone: ${part.toSeq}")
      assert(offs.distinct.length == offs.length)
    }
    // same key always lands in the same partition (hash partitioner)
    assert(rows.filter(_._3 == "a").map(_._1).distinct.length == 1)
  }

  test("consumer resume: readBatch honors per-partition starting offsets") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmp()
    KafkaLog.writeBatch(Seq(("a", "1"), ("b", "2")).toDF("key", "value"),
      dir, "t", numPartitions = 1, batchId = 0)
    val end = KafkaLog.endOffsets(spark, dir, "t")
    KafkaLog.writeBatch(Seq(("c", "3")).toDF("key", "value"),
      dir, "t", numPartitions = 1, batchId = 1)
    // resuming from the committed end offsets sees only the new record
    val resumed = KafkaLog.readBatch(spark, dir, "t", end)
    assert(resumed.select("value").as[String].collect().toSeq == Seq("3"))
  }

  test("streaming source tails newly appended segments") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = tmp()
    KafkaLog.writeBatch(Seq(("a", "1")).toDF("key", "value"),
      dir, "t", numPartitions = 1, batchId = 0)
    val q = KafkaLog.readStream(spark, dir, "t")
      .writeStream.format("memory").queryName("klog_tail")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("klog_tail").count() == 1)
    KafkaLog.writeBatch(Seq(("b", "2")).toDF("key", "value"),
      dir, "t", numPartitions = 1, batchId = 1)
    q.processAllAvailable()
    assert(spark.table("klog_tail").select("value").as[String].collect().toSet
      == Set("1", "2"))
    q.stop()
  }

  test("end-to-end: streaming pipeline into the exactly-once sink") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp()
    val mem = MemoryStream[(String, String)]
    val q = KafkaLog.exactlyOnceSink(
      mem.toDF().toDF("key", "value"), dir, "out", numPartitions = 4).start()
    mem.addData(("k1", "v1"), ("k2", "v2"))
    q.processAllAvailable()
    mem.addData(("k3", "v3"))
    q.processAllAvailable()
    q.stop()
    val rows = KafkaLog.readBatch(spark, dir, "out")
    assert(rows.count() == 3)
    assert(rows.select("partition").distinct().count() <= 4)
  }
}
