package graft

import graft.streaming.StatefulOps.EvT
import graft.streaming.TimerOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

case class TimerSpecSeen(firstTsMs: Long)
case class TimerSpecPending(n: Long)

/** Multi-timer keyed process function (reference KeyedProcessFunction +
  * InternalTimerServiceImpl): several event-time timers per key must fire in
  * timestamp order as the watermark advances, across micro-batches, without
  * requiring new data on the key. */
class TimerOpsSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ms(s: String) = ts(s).getTime

  test("two timers per key fire in order across batches on watermark advance") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EvT]

    val out = TimerOps.processWithTimers[Long, EvT, TimerSpecSeen, (Long, Long)](
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT])(_.user_id, _.event_id)(
      onElement = (_, e, st, ctx) => {
        if (st.isEmpty) {
          ctx.registerTimer(e.ts.getTime + 60000)  // +1 min
          ctx.registerTimer(e.ts.getTime + 120000) // +2 min
        }
        (Some(st.getOrElse(TimerSpecSeen(e.ts.getTime))), Nil)
      },
      onTimer = (k, t, st, _) => (st, Seq((k, t))))

    val q = out.toDF("key", "fired_at").writeStream.format("memory")
      .queryName("timer_heap").outputMode("append").start()

    def fired(): Seq[(Long, Long)] =
      spark.table("timer_heap").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // key 1 registers timers at 00:01 and 00:02; watermark still unset
    mem.addData(EvT(1, 1L, 1.0, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    assert(fired().isEmpty)

    // watermark advances to 00:01:30 (Spark immediately runs a no-data
    // batch after the watermark moves): ONLY the first timer fires, with no
    // new data arriving for key 1 — a pure timeout wake-up
    mem.addData(EvT(2, 2L, 2.0, ts("2024-01-01 00:01:30")))
    q.processAllAvailable()
    assert(fired().filter(_._1 == 1L) == Seq((1L, ms("2024-01-01 00:01:00"))))

    // watermark -> 00:03: the second timer fires too, after the first
    mem.addData(EvT(3, 2L, 3.0, ts("2024-01-01 00:03:00")))
    q.processAllAvailable()
    assert(fired().filter(_._1 == 1L) ==
      Seq((1L, ms("2024-01-01 00:01:00")), (1L, ms("2024-01-01 00:02:00"))))

    // further watermark advance fires nothing more (timer list drained)
    mem.addData(EvT(4, 2L, 4.0, ts("2024-01-01 00:05:00")))
    q.processAllAvailable()
    assert(fired().count(_._1 == 1L) == 2)
    q.stop()
  }

  test("deleted timers never fire") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[EvT]

    
    // every element registers a timer at ts+1min; a second element for the
    // same key CANCELS the pending timer and registers its own
    val out = TimerOps.processWithTimers[Long, EvT, TimerSpecPending, (Long, Long)](
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT])(_.user_id, _.event_id)(
      onElement = (_, e, st, ctx) => {
        st.foreach(s => ctx.deleteTimer(s.n))
        val t = e.ts.getTime + 60000
        ctx.registerTimer(t)
        (Some(TimerSpecPending(t)), Nil)
      },
      onTimer = (k, t, _, _) => (None, Seq((k, t))))

    val q = out.toDF("key", "fired_at").writeStream.format("memory")
      .queryName("timer_cancel").outputMode("append").start()

    mem.addData(EvT(1, 1L, 1.0, ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    mem.addData(EvT(2, 1L, 2.0, ts("2024-01-01 00:00:30"))) // cancels 00:01 timer
    q.processAllAvailable()
    mem.addData(EvT(3, 2L, 3.0, ts("2024-01-01 00:10:00"))) // watermark sweeps past both
    q.processAllAvailable()
    mem.addData(EvT(4, 2L, 4.0, ts("2024-01-01 00:20:00")))
    q.processAllAvailable()
    val fired = spark.table("timer_cancel").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // only the replacement timer (00:01:30) fired for key 1 — never 00:01:00
    assert(fired.filter(_._1 == 1L) == Seq((1L, ms("2024-01-01 00:01:30"))))
    q.stop()
  }
}
