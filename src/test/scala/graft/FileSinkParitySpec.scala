package graft

/** Cross-checks the two FLIP-115 file-sink queries against their oracle
  * semantics evaluated IN SPARK on the same fixture (the DuckDB oracle text
  * is portable modulo epoch→unix_seconds) — pins the watermark-bound
  * visibility rule (wm = max(ts) − declared bound) end-to-end before the
  * driver's DuckDB gate runs. */
class FileSinkParitySpec extends GraftSpec {

  private def dir = sfDir

  test("q_stream_file_sink matches its visibility oracle (bound 0)") {
    val got = SparkEntry.queries("q_stream_file_sink")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = {
      Tables.registerAll(spark, dir)
      spark.sql(
        """WITH w AS (SELECT max(unix_seconds(ts)) AS wm FROM events)
          |SELECT event_id, value,
          |       CAST(floor(unix_seconds(ts) / 86400) * 86400 AS BIGINT) AS dy
          |FROM events, w
          |WHERE floor(unix_seconds(ts) / 86400) * 86400 + 86400 <= wm
          |ORDER BY event_id""".stripMargin).collect().map(_.toSeq).toSeq
    }
    assert(got.nonEmpty && got == want)
  }

  test("q_file_sink_door matches its visibility oracle (bound 5 s from DDL)") {
    val got = SparkEntry.queries("q_file_sink_door")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val want = {
      Tables.registerAll(spark, dir)
      spark.sql(
        """WITH w AS (SELECT max(unix_seconds(ts)) - 5 AS wm FROM events)
          |SELECT event_id, value,
          |       CAST(floor(unix_seconds(ts) / 86400) * 86400 AS BIGINT) AS dy
          |FROM events, w
          |WHERE floor(unix_seconds(ts) / 86400) * 86400 + 86400 <= wm
          |ORDER BY event_id""".stripMargin).collect().map(_.toSeq).toSeq
    }
    assert(got.nonEmpty && got == want)
  }
}
