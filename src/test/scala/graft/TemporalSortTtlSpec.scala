package graft

import graft.streaming.StatefulOps.{temporalSort, dedupFirstWithTtl, EvT}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Harness tests for temporal sort + event-time TTL (reference
  * RowTimeSortOperator / StateTtlConfig semantics). */
class TemporalSortTtlSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("temporal sort releases watermark-complete rows in event-time order") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val sorted = temporalSort(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT])
    val q = sorted.toDF().writeStream.format("memory")
      .queryName("tsort").outputMode("append").start()

    // batch 1: out-of-order arrivals; watermark is still unset -> buffered
    mem.addData(
      EvT(3, 1L, 3.0, ts("2024-01-01 00:03:00")),
      EvT(1, 1L, 1.0, ts("2024-01-01 00:01:00")),
      EvT(2, 1L, 2.0, ts("2024-01-01 00:02:00")))
    q.processAllAvailable()
    // batch 2: watermark = 00:03 now; everything <= wm emits, sorted
    mem.addData(EvT(9, 1L, 9.0, ts("2024-01-01 00:09:00")))
    q.processAllAvailable()
    val emitted = spark.table("tsort").collect().map(_.getAs[Long]("event_id")).toSeq
    assert(emitted == Seq(1L, 2L, 3L), s"expected ordered release, got $emitted")
    q.stop()
  }

  test("dedup with event-time TTL re-admits a key after expiry") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val out = dedupFirstWithTtl(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT], ttlMs = 60_000)
    val q = out.toDF().writeStream.format("memory")
      .queryName("ttl_dedup").outputMode("append").start()

    // key 1 first seen at 00:00 -> emitted; dup at 00:00:30 -> suppressed
    mem.addData(EvT(1, 1L, 1.0, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    mem.addData(EvT(2, 1L, 2.0, ts("2024-01-01 00:00:30")))
    q.processAllAvailable()
    // advance watermark past TTL (00:01) via another key, firing the timeout
    mem.addData(EvT(3, 2L, 3.0, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // key 1 reappears after expiry -> emitted again
    mem.addData(EvT(4, 1L, 4.0, ts("2024-01-01 00:06:00")))
    q.processAllAvailable()
    val emitted = spark.table("ttl_dedup").collect().map(_.getAs[Long]("event_id")).toSet
    assert(emitted == Set(1L, 3L, 4L), s"got $emitted")
    q.stop()
  }

  test("temporal sort orders same-MILLISECOND rows by their microseconds, not by id") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val sorted = temporalSort(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT])
    val q = sorted.toDF().writeStream.format("memory")
      .queryName("tsort_us").outputMode("append").start()
    // 200µs row has the SMALLER id: an (ms, id) sort would emit it first
    mem.addData(
      EvT(5, 1L, 1.0, ts("2024-01-01 00:00:00.0002")),
      EvT(10, 1L, 2.0, ts("2024-01-01 00:00:00.0001")))
    q.processAllAvailable()
    mem.addData(EvT(99, 1L, 9.0, ts("2024-01-01 00:09:00")))
    q.processAllAvailable()
    val emitted = spark.table("tsort_us").collect().map(_.getAs[Long]("event_id")).toSeq
    assert(emitted == Seq(10L, 5L),
      s"same-ms rows must release in µs event-time order, got $emitted")
    q.stop()
  }

  test("dedup first: within-batch order is (µs ts, id) — a large id cannot outrank an earlier timestamp") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val out = dedupFirstWithTtl(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT], ttlMs = 600_000)
    val q = out.toDF().writeStream.format("memory")
      .queryName("ttl_dedup_ord").outputMode("append").start()
    // same key, same batch: the EARLIER row carries event_id 2,000,000 — a
    // packed ms*1e6+id key would rank it after the later row (id 500) and
    // emit the wrong 'first'
    mem.addData(
      EvT(2000000, 7L, 1.0, ts("2024-01-01 00:00:00")),
      EvT(500, 7L, 2.0, ts("2024-01-01 00:00:00.001")))
    q.processAllAvailable()
    val emitted = spark.table("ttl_dedup_ord").collect()
      .map(_.getAs[Long]("event_id")).toSet
    assert(emitted == Set(2000000L), s"got $emitted")
    q.stop()
  }

  test("time-RANGE bounded OVER emits per-row trailing sums and state shrinks with the watermark") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.overRangePreceding
    val mem = MemoryStream[EvT]
    val out = overRangePreceding(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT],
      rangeUs = 60L * 1000000) // 1-minute trailing frame
    val q = out.toDF().writeStream.format("memory")
      .queryName("over_range").outputMode("append").start()

    // key 1: rows at 00:00:00 / 00:00:30 / 00:01:45; the watermark is one
    // batch behind, so emission needs a later batch to advance it
    mem.addData(
      EvT(1, 1L, 10.0, ts("2024-01-01 00:00:00")),
      EvT(2, 1L, 5.0, ts("2024-01-01 00:00:30")),
      EvT(3, 1L, 2.0, ts("2024-01-01 00:01:45")))
    q.processAllAvailable()
    // each batch advances the watermark to the PREVIOUS batch's max event
    // time (wm updates at batch end), so emission lags one batch
    mem.addData(EvT(9, 2L, 1.0, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    mem.addData(EvT(10, 2L, 1.0, ts("2024-01-01 00:20:00")))
    q.processAllAvailable()
    mem.addData(EvT(11, 2L, 1.0, ts("2024-01-01 00:30:00")))
    q.processAllAvailable()
    val got = spark.table("over_range").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    // frames: id1 = {10}; id2 = {10, 5} (both within 1 min); id3 = {2}
    // (frame [00:00:45, 00:01:45] excludes both earlier rows); id9/id10
    // are each alone in their trailing minute
    val expected = Map(1L -> 10.0, 2L -> 15.0, 3L -> 2.0, 9L -> 1.0, 10L -> 1.0)
    assert(expected.forall { case (k, v) => got.get(k).contains(v) }, s"got $got")

    // watermark (>= 00:20) is far past every key-1 row + range: key 1's
    // buffer drained via evict timers and its state entry was REMOVED;
    // key 2 still has pending timers, so exactly 1 state row remains
    val numRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(numRows == 1L,
      s"expected only key 2's state row to survive watermark-driven eviction, got $numRows")
    q.stop()
  }

  test("changelog TopN emits +I/-U/+U retraction rows across batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.{Ev, topNChangelog}
    val mem = MemoryStream[Ev]
    val q = topNChangelog(mem.toDS()).toDF().writeStream.format("memory")
      .queryName("topn_changelog").outputMode("append").start()

    mem.addData(Ev(1, 1L, "t", 10.0, 1), Ev(2, 1L, "t", 20.0, 2))
    q.processAllAvailable()
    // batch 1: two inserts, ranked 20 > 10
    val b1 = spark.table("topn_changelog").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(b1 == Set(("+I", 1, 2L), ("+I", 2, 1L)))

    mem.addData(Ev(3, 1L, "t", 30.0, 3)) // new leader: ranks 1,2 change, 3 inserted
    q.processAllAvailable()
    val all = spark.table("topn_changelog").collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(all == b1 ++ Set(
      ("-U", 1, 2L), ("+U", 1, 3L),
      ("-U", 2, 1L), ("+U", 2, 2L),
      ("+I", 3, 1L)))
    q.stop()
  }

  test("streaming CEP carries partial matches across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StatefulOps.Ev
    val mem = MemoryStream[Ev]
    val pat = cep.Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
    val matches = cep.CepOps.streamingMatches(mem.toDS(), pat)
    val q = matches.toDF().writeStream.format("memory")
      .queryName("cep_stream").outputMode("append").start()

    mem.addData(Ev(1, 7L, "A", 0.0, 1000000)) // partial match in batch 1
    q.processAllAvailable()
    assert(spark.table("cep_stream").count() == 0)
    mem.addData(Ev(2, 7L, "X", 0.0, 2000000), Ev(3, 7L, "B", 0.0, 3000000))
    q.processAllAvailable() // completes across the batch boundary
    val rows = spark.table("cep_stream").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((7L, 1L, 3L)))
    q.stop()
  }
}
