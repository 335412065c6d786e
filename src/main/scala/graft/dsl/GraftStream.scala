package graft.dsl

import org.apache.spark.sql.{Column, Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** DataStream-style fluent API (reference §2.2: flink-streaming-java/.../
  * datastream/DataStream.java — map:570, flatMap:607, filter:718, union:205,
  * keyBy:275; KeyedStream.java — reduce:634, process:354) as a thin zero-cost
  * wrapper over Dataset/KeyValueGroupedDataset. Works identically on bounded
  * and streaming Datasets — the same unification the reference's
  * Table/DataStream split aims at, supplied here by Spark itself.
  */
final class GraftStream[T](val ds: Dataset[T]) extends AnyVal {
  def map[U: Encoder](f: T => U): GraftStream[U] = new GraftStream(ds.map(f))
  def flatMap[U: Encoder](f: T => IterableOnce[U]): GraftStream[U] =
    new GraftStream(ds.flatMap(f))
  def filter(f: T => Boolean): GraftStream[T] = new GraftStream(ds.filter(f))
  def union(other: GraftStream[T]): GraftStream[T] = new GraftStream(ds.union(other.ds))
  def keyBy[K: Encoder](f: T => K): GraftKeyedStream[K, T] =
    new GraftKeyedStream(ds.groupByKey(f))
  /** side-output split (reference OutputTag): predicate partitions the stream. */
  def split(pred: T => Boolean): (GraftStream[T], GraftStream[T]) =
    (filter(pred), filter(t => !pred(t)))
}

final class GraftKeyedStream[K, T](val kv: KeyValueGroupedDataset[K, T]) {
  /** KeyedStream#reduce — rolling reduce per key (batch: full reduce). */
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups(f)
  def mapGroups[U: Encoder](f: (K, Iterator[T]) => U): Dataset[U] = kv.mapGroups(f)
  def flatMapGroups[U: Encoder](f: (K, Iterator[T]) => IterableOnce[U]): Dataset[U] =
    kv.flatMapGroups((k: K, it: Iterator[T]) => f(k, it).iterator)
  /** KeyedProcessFunction-equivalent (reference KeyedProcessFunction.java):
    * stateful per-key processing; on streams, state persists across
    * micro-batches. */
  def process[S: Encoder, U: Encoder](mode: OutputMode)(
      f: (K, Iterator[T], GroupState[S]) => Iterator[U]): Dataset[U] =
    kv.flatMapGroupsWithState(mode, GroupStateTimeout.NoTimeout)(f)
}

object GraftStream {
  def apply[T](ds: Dataset[T]): GraftStream[T] = new GraftStream(ds)
}
