package graft.streaming

import org.apache.spark.sql.DataFrame

/** Multi-sink execution — reference StatementSet
  * (flink-table/flink-table-api-java/.../TableEnvironment.java
  * `createStatementSet`; planner merges the INSERTs into ONE job so shared
  * source/transform prefixes are scanned and computed once).
  *
  * Spark shape: persist the shared prefix, then run every sink against the
  * persisted plan — the second and later writes read the cached blocks
  * (InMemoryTableScan) instead of re-scanning the source. The streaming
  * variant does the same per micro-batch inside foreachBatch, which is the
  * standard Structured Streaming multi-sink recipe (one source, one
  * checkpoint, N destinations, each batch written idempotently).
  */
object MultiSink {

  /** Batch fan-out: scan/compute `df` once, feed every sink. */
  def fanOut(df: DataFrame, sinks: Seq[DataFrame => Unit]): Unit = {
    val shared = df.persist()
    try sinks.foreach(write => write(shared))
    finally shared.unpersist()
  }

  /** Streaming fan-out: one query, N sinks per micro-batch. */
  def streamFanOut(stream: DataFrame, sinks: Seq[(DataFrame, Long) => Unit])
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val shared = batch.persist()
      try sinks.foreach(write => write(shared, batchId))
      finally { shared.unpersist(); () }
    }
}
