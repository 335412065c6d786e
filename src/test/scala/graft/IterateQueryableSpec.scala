package graft

import org.apache.spark.sql.functions._

/** Streaming iterate (feedback edge) + queryable state — the two reference
  * surfaces previously declared out of scope (DataStream.java:520 iterate,
  * KeyedStream.java:934 queryable state), now implemented as a file-backed
  * feedback loop and a statestore-source read respectively. */
class IterateQueryableSpec extends GraftSpec {

  test("streaming iterate: rows loop through the feedback edge until released") {
    import spark.implicits._
    val seed = Seq((1L, 1L), (2L, 7L), (3L, 40L)).toDF("id", "n")
      .withColumn("iters", lit(0))
    val body = (df: org.apache.spark.sql.DataFrame) =>
      df.select(
        col("id"),
        when(col("n") > 1, floor(col("n") / 2).cast("long")).otherwise(col("n")).as("n"),
        when(col("n") > 1, col("iters") + 1).otherwise(col("iters")).as("iters"))
    val out = streaming.IterateStream
      .iterate(spark, seed, body, col("n") > 1, "spec")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    // 1 exits untouched; 7→3→1 is 2 rounds; 40→20→10→5→2→1 is 5 rounds —
    // 5 rounds means the feedback edge carried the row across 5 micro-batches
    assert(out == Map(1L -> ((1L, 0)), 2L -> ((1L, 2)), 3L -> ((1L, 5))))
  }

  test("streaming iterate: non-draining feedback edge fails loudly at maxRounds") {
    import spark.implicits._
    val seed = Seq((1L, 8L)).toDF("id", "n").withColumn("iters", lit(0))
    val body = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("id"), col("n"), (col("iters") + 1).as("iters")) // n never shrinks
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      streaming.IterateStream
        .iterate(spark, seed, body, col("n") > 1, "nodrain", maxRounds = 3)
        .count()
    }
    assert(ex.getMessage.contains("did not drain")
      || Option(ex.getCause).exists(_.getMessage.contains("did not drain")))
  }

  test("DSL iterate: typed feedback loop via GraftStream") {
    import spark.implicits._
    val out = dsl.GraftStream(Seq((1L, 9L, 0)).toDS())
      .iterate(ds => ds.map { case (id, n, it) =>
        if (n > 1) (id, n / 2, it + 1) else (id, n, it)
      }, col("_2") > 1, "dslspec")
      .ds.collect()
    assert(out.toSeq == Seq((1L, 1L, 3))) // 9→4→2→1
  }

  test("queryable state: snapshot equals the batch aggregate, point query prunes") {
    import spark.implicits._
    val df = SparkEntry.queries("q_queryable_state")(spark, sfDir)
    val got = df.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val exp = Tables.t(spark, sfDir, "events")
      .groupBy($"event_type").agg(count(lit(1)), max($"value"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == exp)
  }

  test("queryable state: metadata lists the stateful operator, get() point-reads one key") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
    val base = Tables.scratch(s"qstate-spec/${java.util.UUID.randomUUID()}")
    val src = s"$base/src"
    val ckpt = s"$base/ckpt"
    Seq(("a", 1L), ("b", 2L), ("a", 3L)).toDF("k", "v").write.parquet(src)
    val q = spark.readStream.schema("k string, v long").parquet(src)
      .as[(String, Long)].groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (key: String, it: Iterator[(String, Long)], st: GroupState[Long]) =>
          val s2 = st.getOption.getOrElse(0L) + it.map(_._2).sum
          st.update(s2); key
      }
      .writeStream.format("memory").queryName("qstate_spec_sink")
      .outputMode("update").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val meta = streaming.QueryableState.metadata(spark, ckpt)
    // mapGroupsWithState lowers to the flatMap operator in the plan
    assert(meta.select("operatorName").as[String].collect()
      .contains("flatMapGroupsWithState"))
    val a = streaming.QueryableState.get(spark, ckpt, "value", "a")
    assert(a.select(col("value.groupState.value")).as[Long].collect().toSeq == Seq(4L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
