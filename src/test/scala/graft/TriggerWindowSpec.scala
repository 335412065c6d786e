package graft

import graft.operators.TriggerWindows
import graft.operators.TriggerWindows._
import graft.streaming.StatefulOps.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Trigger/evictor window coverage (reference api/windowing/triggers/ +
  * evictors/): early firing counts, delta triggers, purge semantics,
  * eviction policies. */
class TriggerWindowSpec extends GraftSpec {

  private def ev(id: Long, v: Double, uid: Long = 1L): Ev =
    Ev(id, uid, "t", v, id * 1000000)

  private def batch(evs: Ev*) = {
    val sparkS = spark
    import sparkS.implicits._
    spark.createDataset(evs)
  }

  private def run(out: org.apache.spark.sql.Dataset[(Long, Seq[Long], Long)])
      : List[(Long, Seq[Long], Long)] = out.collect().toList.sortBy(_._3)

  test("count trigger fires every n elements; purging variant tumbles") {
    val sparkS = spark
    import sparkS.implicits._
    val ds = batch((1 to 7).map(i => ev(i, i.toDouble)): _*)
    // sliding: CountTrigger(2), no evictor -> growing window fired at 2,4,6
    val slide = triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(CountTrigger[Ev](2), None)(
      (k, w, t) => (k, w.map(_.event_id), t))
    assert(run(slide).map(_._2) ==
      List(Seq(1L, 2L), Seq(1L, 2L, 3L, 4L), Seq(1L, 2L, 3L, 4L, 5L, 6L)))
    // tumbling: PurgingTrigger(CountTrigger(2)) -> disjoint pairs
    val tumble = triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(PurgingTrigger(CountTrigger[Ev](2)), None)(
      (k, w, t) => (k, w.map(_.event_id), t))
    assert(run(tumble).map(_._2) == List(Seq(1L, 2L), Seq(3L, 4L), Seq(5L, 6L)))
  }

  test("countWindow(size, slide) = sliding count window with bounded buffer") {
    val sparkS = spark
    import sparkS.implicits._
    val ds = batch((1 to 12).map(i => ev(i, i.toDouble)): _*)
    val out = countWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(4, 3)((k, w, t) => (k, w.map(_.event_id), t))
    // fires at 3, 6, 9, 12 with the last min(4, seen) elements
    assert(run(out).map(_._2) == List(
      Seq(1L, 2L, 3L), Seq(3L, 4L, 5L, 6L), Seq(6L, 7L, 8L, 9L),
      Seq(9L, 10L, 11L, 12L)))
  }

  test("delta trigger fires when the value moves past the threshold") {
    val sparkS = spark
    import sparkS.implicits._
    val ds = batch(ev(1, 10.0), ev(2, 12.0), ev(3, 21.0), ev(4, 22.0), ev(5, 40.0))
    val out = triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(
      DeltaTrigger[Ev](8.0, (a, b) => math.abs(b.value - a.value)), None)(
      (k, w, t) => (k, w.map(_.event_id), t))
    // first element seeds (fires); then |21-10|>8 fires at 3; |40-21|>8 at 5
    assert(run(out).map(_._3) == List(1L, 3L, 5L))
  }

  test("time and delta evictors trim the emitted window") {
    val sparkS = spark
    import sparkS.implicits._
    val ds = batch(ev(1, 10.0), ev(2, 11.0), ev(10, 12.0), ev(11, 13.0))
    // TimeEvictor: keep within 2s of newest at fire (ts = id seconds)
    val out = triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(CountTrigger[Ev](4),
      Some(TimeEvictor[Ev](2000, _.ts_us / 1000)))(
      (k, w, t) => (k, w.map(_.event_id), t))
    assert(run(out).map(_._2) == List(Seq(10L, 11L)))
    // DeltaEvictor: drop elements >= 2.5 away from the newest value
    val out2 = triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
      _.user_id, _.event_id)(CountTrigger[Ev](4),
      Some(DeltaEvictor[Ev](2.5, (a, b) => math.abs(b.value - a.value))))(
      (k, w, t) => (k, w.map(_.event_id), t))
    assert(run(out2).map(_._2) == List(Seq(2L, 10L, 11L)))
  }

  test("TwS runtime: same fires as fMGWS for count/delta/purge/evictor combos (batch parity)") {
    val sparkS = spark
    import sparkS.implicits._
    val ds = batch((1 to 12).map(i => ev(i, i * 3.0)): _*)
    def both(tr: Trigger[Ev], evc: Option[Evictor[Ev]]) = {
      val f = run(triggeredWindow[Long, Ev, (Long, Seq[Long], Long)](ds)(
        _.user_id, _.event_id)(tr, evc)((k, w, t) => (k, w.map(_.event_id), t)))
      val n = run(triggeredWindowTws[Long, Ev, (Long, Seq[Long], Long)](ds)(
        _.user_id, _.event_id)(tr, evc)((k, w, t) => (k, w.map(_.event_id), t)))
      assert(f == n, s"runtime divergence for $tr/$evc:\nfMGWS $f\nTwS   $n")
    }
    both(CountTrigger[Ev](3), Some(CountEvictor[Ev](4)))
    both(PurgingTrigger(CountTrigger[Ev](2)), None)
    both(DeltaTrigger[Ev](8.0, (a, b) => math.abs(b.value - a.value)), None)
    both(CountTrigger[Ev](2), Some(TimeEvictor[Ev](3000, _.ts_us / 1000)))
  }

  test("TwS runtime: a count-trigger fire STRADDLES micro-batches (buffer + sinceFire carry)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[Ev]
      val out = triggeredWindowTws[Long, Ev, (Long, Seq[Long], Long)](mem.toDS())(
        _.user_id, _.event_id)(CountTrigger[Ev](3), Some(CountEvictor[Ev](4)))(
        (k, w, t) => (k, w.map(_.event_id), t))
      val emitted = scala.collection.mutable.ArrayBuffer[(Long, Seq[Long], Long)]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (b: org.apache.spark.sql.Dataset[(Long, Seq[Long], Long)], _: Long) =>
          emitted.synchronized { emitted ++= b.collect() }
          ()
      }.start()
      try {
        mem.addData(ev(1, 1.0), ev(2, 2.0)) // 2 of 3: no fire, buffer carries
        q.processAllAvailable()
        assert(emitted.isEmpty, s"premature fire: $emitted")
        mem.addData(ev(3, 3.0)) // 3rd element arrives in the NEXT batch
        q.processAllAvailable()
        assert(emitted.toList == List((1L, Seq(1L, 2L, 3L), 3L)), emitted)
        mem.addData(ev(4, 4.0), ev(5, 5.0), ev(6, 6.0)) // next fire at 6
        q.processAllAvailable()
        assert(emitted.toList.last == ((1L, Seq(3L, 4L, 5L, 6L), 6L)), emitted)
      } finally q.stop()
    }
  }

  test("early-fire counts accumulate across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = countWindow[Long, Ev, (Long, Seq[Long], Long)](mem.toDS())(
      _.user_id, _.event_id)(4, 2)((k, w, t) => (k, w.map(_.event_id), t))
    val q = out.toDF("key", "ids", "total").writeStream.format("memory")
      .queryName("count_win_stream").outputMode("append").start()
    mem.addData(ev(1, 1.0), ev(2, 2.0), ev(3, 3.0)) // fires once at 2
    q.processAllAvailable()
    mem.addData(ev(4, 4.0), ev(5, 5.0), ev(6, 6.0)) // fires at 4 and 6
    q.processAllAvailable()
    val fired = spark.table("count_win_stream").collect()
      .map(r => (r.getAs[Long]("total"),
        r.getAs[scala.collection.Seq[Long]]("ids").toList)).sortBy(_._1)
    assert(fired.map(_._1).toList == List(2L, 4L, 6L))
    assert(fired.last._2 == List(3L, 4L, 5L, 6L)) // buffer carried across batches
    q.stop()
  }
}

/** ContinuousEventTimeTrigger: partial (early) fires at event-time intervals
  * before the window's final fire. */
class ContinuousTriggerSpec extends GraftSpec {
  import graft.streaming.StatefulOps.EvT
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("early fires accumulate, final fire closes and purges the window") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EvT]
    // 10-minute window, 2-minute early-fire interval
    val out = graft.operators.TriggerWindows.continuousEventTimeWindow(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT],
      windowMs = 600000, intervalMs = 120000)
    val q = out.toDF().writeStream.format("memory").queryName("cet_win")
      .outputMode("append").start()

    def rows(): Seq[(Long, Long, Double, Boolean)] =
      spark.table("cet_win").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("cnt"), r.getAs[Double]("total"),
          r.getAs[Boolean]("is_final"))).toSeq

    mem.addData(EvT(1, 1L, 1.0, ts("2024-01-01 00:00:30")),
      EvT(2, 1L, 2.0, ts("2024-01-01 00:01:00")))
    q.processAllAvailable()
    // watermark -> 00:02 boundary not passed yet (wm = 00:01)
    mem.addData(EvT(3, 2L, 9.0, ts("2024-01-01 00:03:00")))
    q.processAllAvailable()
    // wm = 00:03 >= 00:02 boundary: early fire for key 1 with cnt=2
    assert(rows().contains((1L, 2L, 3.0, false)))
    assert(!rows().exists(r => r._1 == 1L && r._4)) // no final yet
    mem.addData(EvT(4, 1L, 4.0, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    // wm = 00:05: another early fire including the new element
    assert(rows().filter(r => r._1 == 1L && !r._4).map(_._2).max == 3L)
    mem.addData(EvT(5, 2L, 1.0, ts("2024-01-01 00:12:00")))
    q.processAllAvailable()
    // wm = 00:12 > window end 00:10: final fire, full aggregate
    assert(rows().contains((1L, 3L, 7.0, true)))
    // LATE element for the finalized [00:00,00:10) window: must be DROPPED
    // (allowed lateness 0) — re-creating the purged window would fire a
    // duplicate, wrong final row
    mem.addData(EvT(6, 1L, 100.0, ts("2024-01-01 00:04:00")))
    q.processAllAvailable()
    mem.addData(EvT(7, 2L, 1.0, ts("2024-01-01 00:25:00")))
    q.processAllAvailable()
    val finals = rows().filter(r => r._1 == 1L && r._4)
    assert(finals == Seq((1L, 3L, 7.0, true)),
      s"late data re-fired a finalized window: $finals")
    q.stop()
  }
}
