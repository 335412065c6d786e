package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Changelog (upsert) sink pattern — the Spark mapping of the reference's
  * retraction streams + exactly-once sinks (RowKind +I/+U rows from
  * update-mode aggregates; TwoPhaseCommitSinkFunction.java:77).
  *
  * An update-mode aggregate emits the CURRENT value per key each batch
  * (Spark's condensed +U changelog — no explicit -U/+D rows). A sink that
  * merges batches BY KEY therefore reconstructs the correct table, and
  * because each batch's output is a pure function of (key -> latest value),
  * re-delivery of a batch is idempotent — the exactly-once recipe
  * `checkpointLocation + idempotent keyed write` from SURVEY §2.7.
  *
  * `foreachBatchUpsert` applies that merge into any keyed store. The store
  * here is pluggable (a KV interface); production backends (JDBC upsert,
  * key-partitioned parquet overwrite) implement the same two methods.
  */
object UpsertSink {

  trait KeyedStore extends Serializable {
    def put(key: Seq[Any], row: Seq[Any]): Unit
    def snapshot(): Map[Seq[Any], Seq[Any]]
  }

  /** In-memory reference store (driver-side; tests + small dims). */
  final class InMemoryStore extends KeyedStore {
    private val m = new java.util.concurrent.ConcurrentHashMap[Seq[Any], Seq[Any]]()
    override def put(key: Seq[Any], row: Seq[Any]): Unit = m.put(key, row)
    override def snapshot(): Map[Seq[Any], Seq[Any]] = {
      import scala.jdk.CollectionConverters._
      m.asScala.toMap
    }
  }

  /** Attach an upsert-merging foreachBatch to an update-mode streaming DF. */
  def foreachBatchUpsert(df: DataFrame, keyCols: Seq[String], store: KeyedStore)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] = {
    val cols = df.columns.toSeq
    val keyIdx = keyCols.map(cols.indexOf)
    df.writeStream.outputMode("update").foreachBatch { (batch: DataFrame, _: Long) =>
      // collect is per-batch UPDATED keys only (update mode), not the full
      // state — bounded by churn, not table size
      batch.collect().foreach { r =>
        val row = r.toSeq
        store.put(keyIdx.map(row), row)
      }
    }
  }
}
