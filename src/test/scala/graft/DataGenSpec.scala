package graft

import graft.operators.GraftSql
import graft.sources.DataGen
import org.apache.spark.sql.types._

/** Utility connectors (reference DataGenTableSourceFactory.java:62,
  * PrintTableSinkFactory, BlackHoleTableSinkFactory): datagen sequences /
  * random bounds / boundedness, and the pathless print/blackhole INSERT
  * targets, batch and streaming. */
class DataGenSpec extends GraftSpec {

  private val seqOpts = Map(
    "fields.id.kind" -> "sequence", "fields.id.start" -> "5",
    "fields.id.end" -> "14")

  test("sequence fields bound the relation; values run start..end inclusive") {
    import spark.implicits._
    val df = DataGen.relation(spark,
      StructType(Seq(StructField("id", LongType))), seqOpts)
    assert(!df.isStreaming)
    assert(df.as[Long].collect().sorted.toSeq == (5L to 14L))
  }

  test("row count is the SHORTEST sequence; random fields honor min/max and length") {
    import spark.implicits._
    val df = DataGen.relation(spark, StructType(Seq(
      StructField("a", LongType), StructField("b", IntegerType),
      StructField("n", IntegerType), StructField("s", StringType))),
      Map("fields.a.kind" -> "sequence", "fields.a.start" -> "0",
        "fields.a.end" -> "99",
        "fields.b.kind" -> "sequence", "fields.b.start" -> "1",
        "fields.b.end" -> "50",
        "fields.n.min" -> "10", "fields.n.max" -> "20",
        "fields.s.length" -> "7"))
    val rows = df.collect()
    assert(rows.length == 50) // shortest sequence (b) exhausts first
    assert(rows.forall { r =>
      val n = r.getInt(2); n >= 10 && n <= 20 && r.getString(3).length == 7
    })
  }

  test("an all-random datagen is an unbounded rate-source stream") {
    val df = DataGen.relation(spark,
      StructType(Seq(StructField("v", DoubleType))),
      Map("rows-per-second" -> "100"))
    assert(df.isStreaming)
  }

  test("a sequence field without start/end is the reference's clear error") {
    val e = intercept[IllegalArgumentException] {
      DataGen.relation(spark, StructType(Seq(StructField("id", LongType))),
        Map("fields.id.kind" -> "sequence"))
    }
    assert(e.getMessage.contains("fields.id.start"))
  }

  test("print sink: batch INSERT returns the written rows; executor-side print") {
    GraftSql.run(spark,
      "CREATE TABLE print_t (x BIGINT) WITH ('connector' = 'print')")
    val out = GraftSql.run(spark,
      "INSERT INTO print_t SELECT id AS x FROM range(3)")
    assert(out.count() == 3)
  }

  test("blackhole sink: batch and streaming INSERT both drain and count") {
    GraftSql.run(spark,
      "CREATE TABLE hole_t (x BIGINT) WITH ('connector' = 'blackhole')")
    val out = GraftSql.run(spark,
      "INSERT INTO hole_t SELECT id AS x FROM range(7)")
    assert(out.count() == 7)
    // streaming: a bounded file stream drained into the blackhole
    GraftSql.sql(spark, sfDir,
      s"""CREATE TABLE hole_stream_src (
         |  event_id BIGINT, ts TIMESTAMP,
         |  WATERMARK FOR ts AS ts - INTERVAL '1' SECONDS
         |) WITH ('path' = '$sfDir', 'table' = 'events')""".stripMargin)
    val res = GraftSql.run(spark,
      "INSERT INTO hole_t SELECT event_id AS x FROM hole_stream_src")
    val n = res.select("rows").head.getLong(0)
    assert(n == Tables.t(spark, sfDir, "events").count())
  }

  test("q_datagen through the door matches its oracle shape") {
    val rows = DataGen.qDataGen.run(spark, sfDir).collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getLong(1) == 1L)) // every random v inside [2,3)
  }
}
