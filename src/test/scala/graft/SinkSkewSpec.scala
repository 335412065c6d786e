package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once file sink + AQE skew-join handling (reference
  * StreamingFileSink/TwoPhaseCommitSinkFunction; Blink adaptive skew join).
  */
class SinkSkewSpec extends GraftSpec {

  test("file sink with checkpoint delivers each row exactly once across restart") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_fsink").toString
    val ckpt = Files.createTempDirectory("graft_fsink_ckpt").toString
    val mem = MemoryStream[(Long, String)]
    def start() = mem.toDF().toDF("id", "v")
      .writeStream.format("parquet")
      .option("path", s"$out/data").option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = start()
    mem.addData((1L, "a"), (2L, "b"))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start() // restart from checkpoint — batch 0 must not re-commit
    mem.addData((3L, "c"))
    q2.processAllAvailable()
    q2.stop()

    val rows = spark.read.parquet(s"$out/data").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "a"), (2L, "b"), (3L, "c")))
    assert(spark.read.parquet(s"$out/data").count() == 3) // no duplicates
  }

  test("AQE splits a skewed join partition") {
    import spark.implicits._
    val prev = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // one hot key on the left (90% of rows), uniform right
      val left = spark.range(200000)
        .select(when($"id" % 10 === 0, $"id" % 100).otherwise(0L).as("k"), $"id".as("payload"))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("attr"))
      val joined = left.join(right, "k").agg(count(lit(1)).as("cnt"), sum($"attr").as("s"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"), s"expected AQE skew split in:\n$plan")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
