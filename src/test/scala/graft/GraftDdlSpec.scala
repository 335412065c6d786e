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

/** SQL-text DDL surface: the Flink-shaped CREATE TABLE … WATERMARK FOR …
  * WITH (…) statement parses into a watermarked streaming view. */
class GraftDdlTextSpec extends GraftSpec {
  test("CREATE TABLE DDL with WATERMARK clause registers a streaming view") {
    val name = graft.streaming.GraftDdl.executeDdl(spark,
      s"""CREATE TABLE events_ddl (
         |  event_id BIGINT,
         |  ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('connector' = 'filesystem', 'path' = '$sfDir', 'table' = 'events');""".stripMargin)
    assert(name == "events_ddl")
    val df = spark.table("events_ddl")
    assert(df.isStreaming)
    assert(df.queryExecution.analyzed.toString.contains("EventTimeWatermark"))
    assert(df.columns.contains("event_id")) // fixture schema is authoritative
  }

  test("malformed DDL is rejected with a parse error") {
    intercept[IllegalArgumentException] {
      graft.streaming.GraftDdl.executeDdl(spark, "CREATE TABLE x (a INT)")
    }
  }
}
