package graft.operators

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.duration.Duration
import scala.concurrent.{Await, ExecutionContext, Future}

/** Async I/O pattern (reference AsyncDataStream.java:43 /
  * AsyncWaitOperator.java:78): per-partition bounded-concurrency async
  * requests with in-order emission — the mapPartitions shape for external
  * calls (HTTP/KV lookups) where per-record latency would otherwise serialize.
  *
  * `capacity` bounds in-flight futures per partition (reference operator
  * capacity); results are emitted in input order (ORDERED mode). Total
  * cluster concurrency = capacity × partitions — size accordingly.
  */
object AsyncOps {

  /** `f` receives an executor-local ExecutionContext (never serialized). */
  def asyncMapPartitions[T, U: Encoder](
      ds: Dataset[T], capacity: Int, timeout: Duration)(
      f: (T, ExecutionContext) => Future[U]): Dataset[U] =
    asyncMapPartitionsWithSetup(ds, capacity, timeout)(() => ())(
      (t, _, ec) => f(t, ec))

  /** Same sliding-window async shape, with a per-partition `setup` run once
    * before the first record — the hook for partition-scoped resources a
    * per-record `f` can't construct (a connection, a lookup cache). `setup`
    * runs on the executor; register any cleanup on the TaskContext inside
    * it. */
  def asyncMapPartitionsWithSetup[T, R, U: Encoder](
      ds: Dataset[T], capacity: Int, timeout: Duration)(
      setup: () => R)(
      f: (T, R, ExecutionContext) => Future[U]): Dataset[U] = {
    ds.mapPartitions { it =>
      val ec: ExecutionContext = ExecutionContext.global
      val res = setup()
      // sliding window of in-flight futures, emitted in order
      new Iterator[U] {
        private val window = scala.collection.mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (window.size < capacity && it.hasNext)
            window.enqueue(f(it.next(), res, ec))
        override def hasNext: Boolean = { fill(); window.nonEmpty }
        override def next(): U = { fill(); Await.result(window.dequeue(), timeout) }
      }
    }
  }
}
