package graft

import graft.streaming.{GraftCatalog, GraftDdl}

/** Persistent catalog: DDL registered through GraftCatalog survives the
  * session (reference HiveCatalog durability vs GenericInMemoryCatalog —
  * Catalog.java contract) and replays into a fresh one. `spark.newSession()`
  * shares the SparkContext but has its OWN temp-view catalog, so a table
  * visible there proves re-registration, not leakage. */
class GraftCatalogSpec extends GraftSpec {

  test("DDL persists: a new session sees nothing until restore replays it") {
    val catDir = Tables.scratch("catalog/spec1")
    val name = GraftCatalog.executeDdl(spark, catDir,
      s"""CREATE TABLE cat_events (
         |  event_id BIGINT,
         |  ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('connector' = 'filesystem', 'path' = '$sfDir', 'table' = 'events')""".stripMargin)
    assert(name == "cat_events")
    assert(spark.table("cat_events").isStreaming)

    val s2 = spark.newSession()
    assert(!s2.catalog.tableExists("cat_events")) // fresh temp-view catalog

    val restored = GraftCatalog.restore(s2, catDir)
    assert(restored == Seq("cat_events"))
    assert(s2.table("cat_events").isStreaming)
    assert(s2.table("cat_events").queryExecution.analyzed.toString
      .contains("EventTimeWatermark"))
  }

  test("last definition wins; drop removes the stored DDL") {
    val catDir = Tables.scratch("catalog/spec2")
    GraftCatalog.executeDdl(spark, catDir,
      s"""CREATE TABLE cat_v (event_id BIGINT, ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '5' SECOND
         |) WITH ('path' = '$sfDir', 'table' = 'events')""".stripMargin)
    // redefine with a different delay — the stored text must be the new one
    GraftCatalog.executeDdl(spark, catDir,
      s"""CREATE TABLE cat_v (event_id BIGINT, ts TIMESTAMP(3),
         |  WATERMARK FOR ts AS ts - INTERVAL '30' SECOND
         |) WITH ('path' = '$sfDir', 'table' = 'events')""".stripMargin)
    val s2 = spark.newSession()
    GraftCatalog.restore(s2, catDir)
    assert(s2.table("cat_v").queryExecution.analyzed.toString.contains("30 seconds"))
    assert(GraftCatalog.drop(catDir, "cat_v"))
    assert(GraftCatalog.restore(spark.newSession(), catDir).isEmpty)
  }

  test("unparseable DDL is rejected and never persisted") {
    val catDir = Tables.scratch("catalog/spec3")
    intercept[IllegalArgumentException] {
      GraftCatalog.executeDdl(spark, catDir, "CREATE TABLE broken")
    }
    assert(GraftCatalog.restore(spark.newSession(), catDir).isEmpty)
  }

  test("sink DDL round-trips through the catalog too") {
    val catDir = Tables.scratch("catalog/spec4")
    val sinkPath = Tables.scratch("catalog/spec4-sink")
    GraftCatalog.executeDdl(spark, catDir,
      s"CREATE TABLE cat_sink (n BIGINT) WITH ('path' = '$sinkPath')")
    GraftCatalog.restore(spark.newSession(), catDir)
    assert(GraftDdl.sink("cat_sink").exists(_.path == sinkPath))
  }
}
