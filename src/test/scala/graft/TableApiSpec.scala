package graft

import org.apache.spark.sql.functions._
import dsl.{GraftTable, Over, Session, Slide, Tumble}

/** Semantics of the fluent Table API facade ([[dsl.GraftTable]]) — the
  * contracts that differ between lookalike methods (reference Table.java):
  * union dedups while unionAll keeps, minus vs minusAll multiplicity,
  * outer lateral keeps empty fan-outs, offset/fetch compose, the window
  * builders produce the right bucket, Over lowers to a native WindowSpec. */
class TableApiSpec extends GraftSpec {

  private def t(rows: Seq[(Long, String)]): GraftTable = {
    import spark.implicits._
    GraftTable(rows.toDF("k", "v"))
  }

  test("union dedups (reference SQL UNION semantics); unionAll keeps duplicates") {
    val a = t(Seq((1L, "x"), (2L, "y")))
    val b = t(Seq((2L, "y"), (3L, "z")))
    assert(a.union(b).df.count() == 3)
    assert(a.unionAll(b).df.count() == 4)
  }

  test("minus removes all occurrences; minusAll subtracts multiplicity") {
    val a = t(Seq((1L, "x"), (1L, "x"), (2L, "y")))
    val b = t(Seq((1L, "x")))
    assert(a.minus(b).df.collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(a.minusAll(b).df.filter(col("k") === 1L).count() == 1)
  }

  test("leftOuterJoinLateral with an outer generator keeps empty fan-outs") {
    import spark.implicits._
    val docs = GraftTable(Seq((1L, "a b"), (2L, "")).toDF("id", "txt"))
    val strict = docs.joinLateral(
      explode(split(col("txt"), " ")).as("w")).df
        .filter(length(col("w")) > 0)
    val outer = docs.leftOuterJoinLateral(
      explode_outer(nullif(split(col("txt"), " "), array(lit("")))).as("w")).df
    assert(strict.filter(col("id") === 2L).count() == 0)
    assert(outer.filter(col("id") === 2L).count() == 1) // row survives with NULL word
  }

  test("offset + fetch page through an ordered table") {
    val a = t(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    val page = a.orderBy(col("k")).offset(1).fetch(2).df.collect().map(_.getLong(0))
    assert(page.toSeq == Seq(2L, 3L))
  }

  test("addOrReplaceColumns replaces in place; addColumns refuses nothing and appends") {
    val a = t(Seq((1L, "x")))
    val replaced = a.addOrReplaceColumns("v" -> lit("z")).df
    assert(replaced.columns.toSeq == Seq("k", "v"))
    assert(replaced.head.getString(1) == "z")
    val appended = a.addColumns(lit(7).as("n")).df
    assert(appended.columns.toSeq == Seq("k", "v", "n"))
  }

  test("window builders bucket correctly: Tumble/Slide/Session chains parse and lower") {
    import spark.implicits._
    val ev = Seq(
      ("2024-01-01 00:01:00", 1.0), ("2024-01-01 00:06:00", 2.0),
      ("2024-01-01 00:30:00", 4.0))
      .toDF("ts_s", "x").select(to_timestamp(col("ts_s")).as("ts"), col("x"))
    val tumbled = GraftTable(ev)
      .window(Tumble over "5 minutes" on "ts" as "w")
      .groupBy("w").select(sum(col("x")).as("sx"))
      .df.select(col("w.start"), col("sx")).collect()
    assert(tumbled.length == 3, tumbled.mkString(","))
    val slid = GraftTable(ev)
      .window(Slide over "10 minutes" every "5 minutes" on "ts" as "w")
      .groupBy("w").select(count(lit(1)).as("c")).df.count()
    assert(slid > 3) // every row lands in two hop windows
    val sessions = GraftTable(ev)
      .window(Session withGap "10 minutes" on "ts" as "w")
      .groupBy("w").select(sum(col("x")).as("sx"))
      .df.select(col("sx")).collect().map(_.getDouble(0)).sorted.toSeq
    assert(sessions == Seq(3.0, 4.0), sessions) // first two merge, third separate
  }

  test("windowed groupBy demands the window alias among the keys") {
    import spark.implicits._
    val ev = Seq(("2024-01-01 00:01:00", 1.0)).toDF("ts_s", "x")
      .select(to_timestamp(col("ts_s")).as("ts"), col("x"))
    val e = intercept[IllegalArgumentException] {
      GraftTable(ev).window(Tumble over "5 minutes" on "ts" as "w").groupBy("x")
    }
    assert(e.getMessage.contains("window alias"), e.getMessage)
  }

  test("Over builder is a native WindowSpec usable with agg.over") {
    val a = t(Seq((1L, "g"), (2L, "g"), (5L, "h")))
    val r = a.select(col("k"), col("v"),
      sum(col("k")).over(Over.partitionBy(col("v")).orderBy(col("k"))).as("running"))
      .df.orderBy("k").collect().map(_.getLong(2))
    assert(r.toSeq == Seq(1L, 3L, 5L))
  }

  test("GraftTableEnv: listings see registry sinks and named catalogs; bridges round-trip") {
    import dsl.GraftTableEnv
    val env = GraftTableEnv(spark, sfDir)
    // a door-registered sink appears in listTables (the reference's
    // catalog-manager view), and a named catalog in listCatalogs
    val sink = java.nio.file.Files.createTempDirectory("graft-env-sink").toString
    env.executeSql(s"CREATE TABLE env_spec_sink (k BIGINT) WITH ('path' = '$sink')")
    assert(env.listTables().contains("env_spec_sink"), env.listTables())
    env.executeSql("CREATE CATALOG env_spec_cat WITH ('type'='generic_in_memory')")
    assert(env.listCatalogs().contains("env_spec_cat"))
    env.executeSql("DROP CATALOG env_spec_cat")
    env.executeSql("DROP TABLE env_spec_sink")
    assert(env.listDatabases().contains("default_database"))
    assert(env.listFunctions().nonEmpty)
    // Table ⇄ DataStream bridges
    import spark.implicits._
    val t = env.fromValues(Seq((1L, "a"), (2L, "b")))
    val doubled = env.fromDataStream(
      env.toDataStream[(Long, String)](t.as("k", "v")).map(p => (p._1 * 2, p._2)).ds)
    assert(doubled.df.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 4L))
    // sqlQuery goes through the DOOR: Flink idiom text works
    val n = env.sqlQuery(
      "SELECT count(*) AS n FROM events GROUP BY TUMBLE(ts, INTERVAL '1' DAY)")
      .df.count()
    assert(n > 0)
  }

  test("Table.executeInsert deploys into a registered sink and returns its contents") {
    import dsl.GraftTableEnv
    val env = GraftTableEnv(spark, sfDir)
    val sink = java.nio.file.Files.createTempDirectory("graft-env-ins").toString
    env.executeSql(s"CREATE TABLE env_ins_sink (t STRING, n BIGINT) WITH ('path' = '$sink')")
    val out = env.sqlQuery(
      "SELECT event_type AS t, count(*) AS n FROM events GROUP BY event_type")
      .executeInsert("env_ins_sink")
    assert(out.df.count() == 5) // one row per event type in the fixture
    assert(spark.read.parquet(sink).count() == 5)
    env.executeSql("DROP TABLE env_ins_sink")
  }

  test("TableResult: eager statements carry result kind, schema, collect iterator and print") {
    import dsl.GraftTableEnv
    val env = GraftTableEnv(spark, sfDir)
    val res = env.executeSql("SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority")
    assert(res.isDone && !res.hasJobClient) // DQL executes eagerly, no job client
    assert(res.getResultKind == "SUCCESS_WITH_CONTENT")
    assert(res.getTableSchema.fieldNames.toSeq == Seq("o_orderpriority", "n"))
    val rows = res.collect().toSeq
    assert(rows.size == 5 && rows.map(_.getLong(1)).sum > 0, rows)
    res.print() // must not throw
    res.stop()  // no-op on a completed result
    assert(res.await(1000), "await(timeout) is true once done")
  }

  test("TableResult: INSERT is a submitted job — jobClient present, await drains, collect reads the sink") {
    import dsl.GraftTableEnv
    val env = GraftTableEnv(spark, sfDir)
    val sink = java.nio.file.Files.createTempDirectory("graft-tr-ins").toString
    env.executeSql(s"CREATE TABLE tr_ins_sink (t STRING, n BIGINT) WITH ('path' = '$sink')")
    val ins = env.executeSql(
      // leading comment header: classification must skip comments and
      // whitespace, not trim alone — a comment-prefixed INSERT that ran
      // eagerly would silently drop the submitted-job contract
      "-- nightly load\n/* owner: etl */ INSERT INTO tr_ins_sink " +
        "SELECT event_type AS t, count(*) AS n FROM events GROUP BY event_type")
    assert(ins.hasJobClient, "INSERT must carry job semantics")
    ins.await()
    assert(ins.isDone)
    assert(ins.collect().size == 5) // read-back through the result iterator
    assert(spark.read.parquet(sink).count() == 5)
    env.executeSql("DROP TABLE tr_ins_sink")
  }

  test("connect() descriptors: a rowtime schema registers a WATERMARKED streaming source view") {
    import dsl.{FileSystem, GraftTableEnv, Parquet, Rowtime, Schema}
    val env = GraftTableEnv(spark, sfDir)
    env.connect(FileSystem().path(sfDir).table("events"))
      .withFormat(Parquet())
      .withSchema(Schema()
        .field("event_id", "BIGINT").field("ts", "TIMESTAMP")
        .rowtime(Rowtime().timestampsFromField("ts").watermarksPeriodicBounded(5000)))
      .createTemporaryTable("desc_events_src")
    val v = spark.table("desc_events_src")
    assert(v.isStreaming, "rowtime descriptor must register a streaming view")
    assert(v.columns.contains("ts"))
    spark.catalog.dropTempView("desc_events_src")
  }

  test("connect() descriptors: missing schema or sub-second watermark bound are rejected") {
    import dsl.{FileSystem, GraftTableEnv, Parquet, Rowtime, Schema}
    val env = GraftTableEnv(spark, sfDir)
    intercept[IllegalArgumentException] {
      env.connect(FileSystem().path("/tmp/x")).withFormat(Parquet())
        .createTemporaryTable("desc_bad1")
    }
    intercept[IllegalArgumentException] {
      env.connect(FileSystem().path(sfDir).table("events"))
        .withFormat(Parquet())
        .withSchema(Schema().field("ts", "TIMESTAMP")
          .rowtime(Rowtime().timestampsFromField("ts").watermarksPeriodicBounded(500)))
        .createTemporaryTable("desc_bad2")
    }
  }

  test("set-op multiset laws hold on random inputs (reference Table.java semantics)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val smallList = Gen.listOfN(12, Gen.choose(0L, 4L))
    val p = Prop.forAll(smallList, smallList) { (as, bs) =>
      val a = GraftTable(as.toDF("k"))
      val b = GraftTable(bs.toDF("k"))
      val unionAllN = a.unionAll(b).df.count()
      val unionN = a.union(b).df.count()
      val minusSet = a.minus(b).df.collect().map(_.getLong(0)).toSet
      val minusAllN = a.minusAll(b).df.count()
      val countA = as.groupBy(identity).view.mapValues(_.size).toMap
      val countB = bs.groupBy(identity).view.mapValues(_.size).toMap
      unionAllN == as.size + bs.size &&
        unionN == (as.toSet ++ bs.toSet).size &&
        minusSet == (as.toSet -- bs.toSet) &&
        minusAllN == countA.map { case (k, n) =>
          math.max(0, n - countB.getOrElse(k, 0)) }.sum
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("createTemporalTableFunction through the facade registers for the correlate") {
    import spark.implicits._
    val hist = Seq((1L, 10L, "v1"), (1L, 20L, "v2")).toDF("pk", "t", "payload")
    GraftTable(hist).createTemporalTableFunction("facade_rates", "t", "pk")
    val probe = Seq((1L, 15L)).toDF("k", "pts")
    val out = operators.TemporalFunction.joinLateral(probe, "facade_rates", "pts", "k")
      .select("r_payload").head.getString(0)
    assert(out == "v1")
  }
}
