package graft

import graft.streaming.LateData
import graft.streaming.StatefulOps.EvT
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Late-data side output (reference WindowedStream#sideOutputLateData):
  * rows behind the operator watermark are tagged, not dropped. */
class LateDataSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("elements behind the watermark are tagged late, on-time rows are not") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EvT]
    val tagged = LateData.tagLate(
      mem.toDS().withWatermark("ts", "0 seconds").as[EvT])
    val q = tagged.toDF().writeStream.format("memory")
      .queryName("late_tag").outputMode("append").start()
    try {
      // batch 1: watermark unset (Long.Min/0) -> everything on-time
      mem.addData(
        EvT(1, 1L, 1.0, ts("2024-01-01 00:05:00")),
        EvT(2, 1L, 2.0, ts("2024-01-01 00:06:00")))
      q.processAllAvailable()
      // batch 2: watermark = 00:06; event at 00:02 is late, 00:07 is not —
      // including for a key never seen before (watermark is operator-wide)
      mem.addData(
        EvT(3, 1L, 3.0, ts("2024-01-01 00:02:00")),
        EvT(4, 2L, 4.0, ts("2024-01-01 00:01:00")),
        EvT(5, 1L, 5.0, ts("2024-01-01 00:07:00")))
      q.processAllAvailable()
      val out = spark.table("late_tag").as[LateData.TaggedEv].collect()
        .map(t => t.event_id -> t.is_late).toMap
      assert(out == Map(1L -> false, 2L -> false,
        3L -> true, 4L -> true, 5L -> false))
    } finally q.stop()
  }
}
