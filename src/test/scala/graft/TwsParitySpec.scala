package graft

/** Spark-side parity for the r13 transformWithState migrations before the
  * driver's DuckDB gate runs: the TwS as-of join must agree with the
  * oracle-green fMGWS operator on the driver fixture, and the TwS
  * queryable-state loop must agree with the plain batch aggregate. */
class TwsParitySpec extends GraftSpec {

  test("q_tws_asof matches the fMGWS q_stream_asof on the fixture") {
    val tws = SparkEntry.queries("q_tws_asof")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val fmgws = SparkEntry.queries("q_stream_asof")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(tws.nonEmpty && tws == fmgws)
  }

  test("q_tws_topn / q_tws_dedup_last / q_tws_stream_over match their fMGWS twins") {
    for ((tws, fm) <- Seq(
        "q_tws_topn" -> "q_stream_topn",
        "q_tws_dedup_last" -> "q_stream_dedup_last",
        "q_tws_stream_over" -> "q_stream_over")) {
      val a = SparkEntry.queries(tws)(spark, sfDir).collect().map(_.toSeq).toSeq
      val b = SparkEntry.queries(fm)(spark, sfDir).collect().map(_.toSeq).toSeq
      assert(a.nonEmpty && a == b, s"$tws diverges from $fm")
    }
  }

  test("q_queryable_state_tws state read-back matches the batch aggregate") {
    val got = SparkEntry.queries("q_queryable_state_tws")(spark, sfDir)
      .orderBy("event_type").collect().map(_.toSeq).toSeq
    val want = {
      Tables.registerAll(spark, sfDir)
      spark.sql(
        """SELECT event_type, count(*) AS cnt, max(value) AS vmax
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
        .collect().map(_.toSeq).toSeq
    }
    assert(got.nonEmpty && got == want)
  }
}
