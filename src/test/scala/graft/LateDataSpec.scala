package graft

import graft.streaming.LateData
import graft.streaming.StatefulOps.EvT
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Late-data side output (reference WindowedStream#sideOutputLateData +
  * WindowOperator.isElementLate): an element is late only when EVERY
  * window it belongs to is closed — window-relative, not element-time. */
class LateDataSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def run(windowSec: Long, slideSec: Long = 0L, latenessSec: Long = 0L)
      (batch1: Seq[EvT], batch2: Seq[EvT]): Map[Long, Boolean] = {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val name = s"late_tag_${System.nanoTime()}"
    val tagged = LateData.tagLate(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT],
      windowSec, slideSec, latenessSec)
    val q = tagged.toDF().writeStream.format("memory")
      .queryName(name).outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      spark.table(name).as[LateData.TaggedEv].collect()
        .map(t => t.event_id -> t.is_late).toMap
    } finally q.stop()
  }

  test("an element is late only when its (tumbling) window is closed") {
    val out = run(windowSec = 300)(
      // batch 1: watermark unset (0) -> everything on-time
      Seq(EvT(1, 1L, 1.0, ts("2024-01-01 00:05:00")),
          EvT(2, 1L, 2.0, ts("2024-01-01 00:06:00"))),
      // batch 2: watermark = 00:06.
      //  3, 4: window [00:00,00:05) end <= wm -> late (4: key never seen
      //        before — the watermark is operator-wide);
      //  5: future window -> on-time;
      //  6: ts 00:05:30 is BEHIND the watermark, but its window
      //     [00:05,00:10) is still open -> NOT late (element-time tagging
      //     would wrongly drop it and undercount the open window)
      Seq(EvT(3, 1L, 3.0, ts("2024-01-01 00:02:00")),
          EvT(4, 2L, 4.0, ts("2024-01-01 00:01:00")),
          EvT(5, 1L, 5.0, ts("2024-01-01 00:07:00")),
          EvT(6, 1L, 6.0, ts("2024-01-01 00:05:30"))))
    assert(out == Map(1L -> false, 2L -> false,
      3L -> true, 4L -> true, 5L -> false, 6L -> false))
  }

  test("allowedLateness keeps a just-closed window's elements on-time") {
    val out = run(windowSec = 300, latenessSec = 120)(
      Seq(EvT(1, 1L, 1.0, ts("2024-01-01 00:06:00"))),
      // wm = 00:06. 2: window end 00:05 + 2 min lateness = 00:07 > wm ->
      // on-time; 3: window [23:55,00:00) end + lateness = 00:02 <= wm -> late
      Seq(EvT(2, 1L, 2.0, ts("2024-01-01 00:02:00")),
          EvT(3, 1L, 3.0, ts("2023-12-31 23:58:00"))))
    assert(out == Map(1L -> false, 2L -> false, 3L -> true))
  }

  test("sliding windows: late only when the LAST containing window closed") {
    val out = run(windowSec = 300, slideSec = 60)(
      Seq(EvT(1, 1L, 1.0, ts("2024-01-01 00:06:00"))),
      // wm = 00:06. 2 at 00:02: last sliding window [00:02,00:07) is open
      // -> NOT late (tumbling tagged it late); 3 at 00:00:30: last window
      // [00:00,00:05) end <= wm -> late
      Seq(EvT(2, 1L, 2.0, ts("2024-01-01 00:02:00")),
          EvT(3, 1L, 3.0, ts("2024-01-01 00:00:30"))))
    assert(out == Map(1L -> false, 2L -> false, 3L -> true))
  }
}
