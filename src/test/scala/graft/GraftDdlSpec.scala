package graft

import graft.streaming.GraftDdl
import org.apache.spark.sql.streaming.Trigger

class GraftDdlSpec extends GraftSpec {

  test("watermarked stream view is queryable via spark.sql") {
    GraftDdl.createStreamView(spark, sfDir, "events", "events_stream", "ts", "10 minutes")
    val agg = spark.sql(
      """SELECT window(ts, '5 minutes').start AS wstart, count(*) AS cnt
        |FROM events_stream GROUP BY 1""".stripMargin)
    assert(agg.isStreaming, "view must stay a streaming source")
    val q = agg.writeStream.format("memory").queryName("ddl_view_agg")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val total = spark.table("ddl_view_agg")
      .agg(org.apache.spark.sql.functions.sum("cnt")).collect().head.getLong(0)
    assert(total == Tables.t(spark, sfDir, "events").count())
    // watermark column really attached (event-time semantics available)
    assert(agg.queryExecution.analyzed.toString.contains("watermark") ||
      spark.table("events_stream").queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    q.stop()
  }
}
