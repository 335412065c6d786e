package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka-connector mapping over a file-backed log — the API/semantics
  * surface of the reference's Kafka connector (flink-connectors/
  * flink-connector-kafka/.../FlinkKafkaConsumer.java:72,
  * FlinkKafkaProducer.java two-phase commit) re-expressed for a zero-egress
  * environment. The broker is replaced by an append-only directory of
  * parquet segments, but the CONTRACT is Kafka's:
  *
  *  - records are (topic, partition, offset, key, value, ts);
  *  - partition assignment is hash(key) % numPartitions (Kafka's default
  *    partitioner for keyed records);
  *  - offsets are strictly monotone per partition;
  *  - the sink is EXACTLY-ONCE: each micro-batch writes to a batch-id-named
  *    segment directory with overwrite, so redelivery of a batch (the
  *    at-least-once case two-phase commit guards against) is idempotent —
  *    the same recipe as the reference's TwoPhaseCommitSinkFunction but
  *    resting on deterministic file names instead of transactions;
  *  - the source supports batch reads from per-partition starting offsets
  *    (consumer-group resume) and streaming reads (new segments are picked
  *    up by Spark's file-stream source, whose checkpoint tracks consumed
  *    files — the offsets-in-checkpoint exactly-once recipe).
  *
  * At 100 TB this layout IS a production pattern (a partitioned object-store
  * log); nothing here is test-only scaffolding except the local paths.
  */
object KafkaLog {

  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  private def topicDir(dir: String, topic: String) = s"$dir/$topic"

  /** Deterministic per-batch offsets: batchId in the high 32 bits, the
    * row's rank within its partition below — monotone per partition across
    * batches, stable under redelivery. */
  private def withPartitionAndOffset(df: DataFrame, keyCol: String,
      numPartitions: Int, batchId: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("partition").orderBy("key", "value")
    df.withColumn("partition", pmod(hash(col(keyCol)), lit(numPartitions)).cast("int"))
      .withColumn("offset",
        (lit(batchId) * lit(1L << 32)) + row_number().over(w).cast("long") - 1)
  }

  /** Write one batch of (key, value[, ts]) rows as a log segment. Idempotent
    * per (topic, batchId): a redelivered batch whose segment already
    * COMMITTED is a no-op — overwriting would mint new part-file names (and
    * fresh `current_timestamp` values for ts-less inputs), which a
    * file-stream READER's checkpoint has never seen, re-ingesting the whole
    * batch downstream and breaking the exactly-once contract. The _SUCCESS
    * marker Spark drops at write completion is the commit record; a crash
    * MID-write leaves no marker and the redelivery legitimately rewrites. */
  def writeBatch(batch: DataFrame, dir: String, topic: String,
      numPartitions: Int, batchId: Long): Unit = {
    val seg = s"${topicDir(dir, topic)}/segment=$batchId"
    // commit check through the Hadoop FileSystem resolved from the log URI
    // (same discipline as PartitionCommit after the r12 review): a
    // java.io.File probe on a non-local log would always miss, rewriting
    // committed segments on every redelivery and breaking exactly-once
    val segPath = new org.apache.hadoop.fs.Path(seg)
    val fs = segPath.getFileSystem(
      batch.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(segPath, "_SUCCESS")))
      return // redelivery of a committed segment
    val cols = batch.columns.toSet
    val withTs =
      if (cols.contains("ts")) batch
      else batch.withColumn("ts", current_timestamp())
    withPartitionAndOffset(withTs, "key", numPartitions, batchId)
      .select("partition", "offset", "key", "value", "ts")
      .write.mode("overwrite")
      .parquet(seg)
  }

  /** Exactly-once streaming sink: foreachBatch → idempotent segment writes.
    * `df` must have `key` and `value` string columns (Kafka's record
    * contract; serialize upstream, as with Kafka serializers). */
  def exactlyOnceSink(df: DataFrame, dir: String, topic: String,
      numPartitions: Int): org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream.outputMode("append").foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        writeBatch(batch, dir, topic, numPartitions, batchId)
    }

  /** Batch read from per-partition starting offsets (consumer resume).
    * Offsets are inclusive lower bounds, Kafka-style. */
  def readBatch(spark: SparkSession, dir: String, topic: String,
      startingOffsets: Map[Int, Long] = Map.empty): DataFrame = {
    // expand segments ourselves: handing Spark the `segment=*` glob makes
    // resolveRelation probe the literal glob string as a path first, which
    // logs a spurious FileNotFoundException before globbing succeeds
    val base = new org.apache.hadoop.fs.Path(topicDir(dir, topic))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // globStatus returns NULL (not an empty array) when the topic dir does
    // not exist — fold to empty so the caller gets the named require below,
    // not an NPE
    val segments = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(base, "segment=*")))
      .getOrElse(Array.empty).map(_.getPath.toString)
    require(segments.nonEmpty, s"no segments under ${topicDir(dir, topic)}")
    val df = spark.read.schema(schema).parquet(segments.toIndexedSeq: _*)
    if (startingOffsets.isEmpty) df
    else {
      val cond = startingOffsets.map { case (p, o) =>
        col("partition") === p && col("offset") >= o
      }.reduce(_ || _)
      val unlisted = !col("partition").isInCollection(startingOffsets.keys.toSeq)
      df.where(cond || unlisted)
    }
  }

  /** Streaming read: Spark's file-stream source tails new segments; its
    * checkpoint persists which files were consumed (offset tracking). */
  def readStream(spark: SparkSession, dir: String, topic: String): DataFrame =
    spark.readStream.schema(schema)
      .option("basePath", topicDir(dir, topic))
      .parquet(topicDir(dir, topic) + "/segment=*")
      // basePath + segment=* infers a `segment` partition column the record
      // contract (partition, offset, key, value, ts) does not carry; drop it
      // so streaming and batch reads share one schema
      .drop("segment")

  /** Dataset-scoped, CONTENT-STAMPED log directory for fixture-staged
    * topics: segment (topic, batchId) idempotence means a committed segment
    * is never rewritten, so the directory identity must include the source
    * fixture's identity (mtime + size, the CdcFormats.feedStamp recipe) —
    * a driver-regenerated fixture then stages into a FRESH log instead of
    * serving stale records under the old _SUCCESS marker (the r7 fixture-
    * drift class, which would surface as an engine-vs-oracle mismatch). */
  def stagedLogDir(tag: String, dir: String, table: String): String = {
    val p = java.nio.file.Paths.get(dir, s"$table.parquet")
    val stamp = s"${java.nio.file.Files.getLastModifiedTime(p).toMillis}_" +
      s"${java.nio.file.Files.size(p)}"
    graft.Tables.scratch(
      s"$tag/${dir.replaceAll("[^a-zA-Z0-9]", "_")}_$stamp")
  }

  /** Committed (= fully written) end offsets per partition — the
    * `endOffsets` consumer API. */
  def endOffsets(spark: SparkSession, dir: String, topic: String): Map[Int, Long] =
    readBatch(spark, dir, topic)
      .groupBy("partition").agg(max("offset").as("end"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1) + 1)).toMap
}
