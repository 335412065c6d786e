package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Broadcast state UPDATES mid-stream (reference BroadcastProcessFunction /
  * KeyedBroadcastProcessFunction — the rules side is itself a stream and
  * every element sees the latest rules): Spark's translation re-reads the
  * rules table inside foreachBatch, so each micro-batch joins against the
  * rules as of that batch. This spec changes the rules file between two
  * batches and proves the second batch is classified by the NEW rules —
  * the part of the pattern q_stream_static_join (fixed rules) doesn't
  * exercise. */
class BroadcastRulesSpec extends GraftSpec {

  test("rules updated between micro-batches reclassify subsequent events") {
    import spark.implicits._
    val base = Tables.scratch(s"bcast-rules/${java.util.UUID.randomUUID()}")
    // rules v1: threshold 100 — everything below is 'small'
    Seq((100.0, "small")).toDF("threshold", "label").coalesce(1)
      .write.mode("overwrite").parquet(s"$base/rules")
    Seq((1L, 50.0)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in/f0")
    Seq((2L, 50.0)).toDF("id", "v").coalesce(1).write.parquet(s"$base/in/f1")

    val out = scala.collection.mutable.Map[Long, String]()
    val q = spark.readStream.schema("id long, v double")
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the broadcast side is re-read per batch — rules as of THIS batch
        val rules = spark.read.parquet(s"$base/rules")
        val labeled = batch.crossJoin(broadcast(rules))
          .select(col("id"),
            when(col("v") < col("threshold"), col("label")).otherwise(lit("big")).as("cls"))
          .collect()
        labeled.foreach(r => out(r.getLong(0)) = r.getString(1))
        // after batch 0: tighten the threshold — same event value becomes 'big'
        if (batchId == 0)
          Seq((10.0, "small")).toDF("threshold", "label").coalesce(1)
            .write.mode("overwrite").parquet(s"$base/rules")
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // identical event values, different rules epochs
    assert(out == scala.collection.mutable.Map(1L -> "small", 2L -> "big"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
