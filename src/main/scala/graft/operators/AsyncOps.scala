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
      f: (T, ExecutionContext) => Future[U]): Dataset[U] = {
    ds.mapPartitions { it =>
      val ec: ExecutionContext = ExecutionContext.global
      // sliding window of in-flight futures, emitted in order
      new Iterator[U] {
        private val window = scala.collection.mutable.Queue.empty[Future[U]]
        private def fill(): Unit =
          while (window.size < capacity && it.hasNext) window.enqueue(f(it.next(), ec))
        override def hasNext: Boolean = { fill(); window.nonEmpty }
        override def next(): U = { fill(); Await.result(window.dequeue(), timeout) }
      }
    }
  }
}
