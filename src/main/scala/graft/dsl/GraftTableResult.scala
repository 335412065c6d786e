package graft.dsl

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import java.util.concurrent.{CompletableFuture, TimeUnit}

/** The result object `executeSql` returns — 1.11's headline API change
  * (reference flink-table/flink-table-api-java/src/main/java/org/apache/
  * flink/table/api/TableResult.java, new in 1.11: `collect()` returning a
  * row iterator, `print()`, `getResultKind()`, and `getJobClient()` for
  * submitted INSERT jobs with await/cancel semantics).
  *
  * Mapping onto this engine:
  *  - DQL/DDL/SHOW statements execute eagerly (the door returns their
  *    result relation) — `collect()`/`print()` read it; result kind is
  *    SUCCESS_WITH_CONTENT when the relation has columns, SUCCESS for the
  *    contentless acknowledgements (the reference's OK results).
  *  - INSERT statements are SUBMITTED: the door call runs on a daemon
  *    thread and `executeSql` returns immediately — the reference's
  *    job-client posture, where `executeSql(INSERT…)` hands back a
  *    TableResult whose job may still be running. `await()` joins it
  *    (streaming INSERTs drain via AvailableNow, so completion means the
  *    backlog is written); `stop()` is the JobClient.cancel() analogue —
  *    it cancels the submission's Spark job group and interrupts the
  *    runner, which the door's `finally q.stop()` turns into a clean
  *    streaming-query shutdown.
  */
final class GraftTableResult private (
    spark: SparkSession,
    fut: CompletableFuture[DataFrame],
    runner: Option[Thread],
    jobGroup: Option[String]) {

  /** The result relation; blocks until a submitted INSERT finishes
    * (TableResult.await() + collect() composed — every downstream
    * accessor goes through this, so none can observe a half-written
    * sink). A failed submission rethrows its ORIGINAL error, not the
    * CompletionException wrapper. */
  def df: DataFrame =
    try fut.join()
    catch {
      case e: java.util.concurrent.CompletionException if e.getCause != null =>
        throw e.getCause
    }

  /** TableResult.await(): block until the job completes; a failed job
    * rethrows its ORIGINAL error (same contract as [[df]]). */
  def await(): GraftTableResult = { df; this }

  /** TableResult.await(timeout): true iff completed within the timeout;
    * a failed job rethrows its original error. */
  def await(timeoutMs: Long): Boolean =
    try { fut.get(timeoutMs, TimeUnit.MILLISECONDS); true }
    catch {
      case _: java.util.concurrent.TimeoutException => false
      case e: java.util.concurrent.ExecutionException if e.getCause != null =>
        throw e.getCause
    }

  def isDone: Boolean = fut.isDone

  /** TableResult.collect(): iterator over the result rows. Driver-side by
    * contract (the reference streams rows back to the client the same
    * way); toLocalIterator keeps at most one partition in memory. */
  def collect(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** TableResult.print(). */
  def print(): Unit = df.show(100, truncate = false)

  /** TableResult.getTableSchema(). */
  def getTableSchema: org.apache.spark.sql.types.StructType = df.schema

  /** TableResult.getResultKind(): SUCCESS for contentless acknowledgements,
    * SUCCESS_WITH_CONTENT when the statement produced a relation. */
  def getResultKind: String =
    if (df.schema.isEmpty) "SUCCESS" else "SUCCESS_WITH_CONTENT"

  /** Whether a JobClient exists — true for submitted INSERTs (reference
    * TableResult.getJobClient() is non-empty exactly for those). */
  def hasJobClient: Boolean = runner.nonEmpty

  /** JobClient.cancel(): cancel the submitted job. Batch jobs die with the
    * job group; a draining streaming INSERT is interrupted out of
    * awaitTermination, whose `finally` stops the query. No-op for eager
    * statements and completed jobs. */
  def stop(): Unit = if (!fut.isDone) {
    jobGroup.foreach(spark.sparkContext.cancelJobGroup)
    runner.foreach(_.interrupt())
  }
}

object GraftTableResult {

  /** An eagerly-executed statement's result (DQL/DDL/SHOW). */
  def completed(spark: SparkSession, df: DataFrame): GraftTableResult =
    new GraftTableResult(spark, CompletableFuture.completedFuture(df), None, None)

  /** Submit `body` (an INSERT execution) on a daemon thread under its own
    * Spark job group, so `stop()` can cancel it. */
  def submit(spark: SparkSession)(body: => DataFrame): GraftTableResult = {
    val fut = new CompletableFuture[DataFrame]()
    val group = s"graft-table-result-${java.util.UUID.randomUUID()}"
    val t = new Thread(() => {
      try {
        spark.sparkContext.setJobGroup(group, "GraftTableResult INSERT",
          interruptOnCancel = true)
        fut.complete(body)
      } catch {
        case e: Throwable => fut.completeExceptionally(e)
      } finally spark.sparkContext.clearJobGroup()
    }, group)
    t.setDaemon(true)
    t.start()
    new GraftTableResult(spark, fut, Some(t), Some(group))
  }
}
