package graft

import org.apache.spark.sql.functions._

/** Savepoint export + restore (reference checkpoint/savepoint/): state of a
  * finished query is exported through the statestore source and seeds a NEW
  * query via StatefulProcessorWithInitialState — counts continue exactly
  * where the first job stopped. */
class SavepointSpec extends GraftSpec {

  test("savepoint: export state, seed a new query, totals continue seamlessly") {
    import spark.implicits._
    val base = Tables.scratch(s"savepoint-spec/${java.util.UUID.randomUUID()}")
    Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
      .write.parquet(s"$base/in1")
    Seq(("a", 10L), ("c", 7L)).toDF("k", "v")
      .write.parquet(s"$base/in2")
    def src(d: String) = spark.readStream.schema("k string, v long").parquet(d)

    // job 1: fresh state
    val empty = spark.emptyDataset[(String, Long)]
    streaming.Savepoint.runCounts(spark, src(s"$base/in1"), empty,
      s"$base/ckpt1", "sp_phase1")

    // export the savepoint
    streaming.Savepoint.`export`(spark, s"$base/ckpt1",
      s"$base/savepoint", Some("total"))(
      _.select(col("key.value").as("k"), col("value.value").as("total")))

    // job 2: NEW checkpoint, state seeded from the savepoint file
    val initial = spark.read.parquet(s"$base/savepoint").as[(String, Long)]
    streaming.Savepoint.runCounts(spark, src(s"$base/in2"), initial,
      s"$base/ckpt2", "sp_phase2")
    val finalState = streaming.QueryableState
      .stateOf(spark, s"$base/ckpt2", stateVar = Some("total"))
      .select(col("key.value"), col("value.value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // a: 1+2 then +10 = 13; b: 5 untouched in job 2; c: fresh 7
    assert(finalState == Map("a" -> 13L, "b" -> 5L, "c" -> 7L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("savepoint restore re-shards to a different parallelism (rescale)") {
    import spark.implicits._
    val base = Tables.scratch(s"savepoint-rescale/${java.util.UUID.randomUUID()}")
    Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/in1")
    Seq(("a", 10L), ("d", 40L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$base/in2")
    def src(d: String) = spark.readStream.schema("k string, v long").parquet(d)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      // job 1 at parallelism 2
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      streaming.Savepoint.runCounts(spark, src(s"$base/in1"),
        spark.emptyDataset[(String, Long)], s"$base/ckpt1", "sp_rescale1")
      streaming.Savepoint.`export`(spark, s"$base/ckpt1",
        s"$base/savepoint", Some("total"))(
        _.select(col("key.value").as("k"), col("value.value").as("total")))
      // job 2 restores the same state at parallelism 8 — the initial-state
      // shuffle re-shards it, the reference's operator-rescale reassignment
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      val initial = spark.read.parquet(s"$base/savepoint").as[(String, Long)]
      streaming.Savepoint.runCounts(spark, src(s"$base/in2"), initial,
        s"$base/ckpt2", "sp_rescale2")
      val fin = streaming.QueryableState
        .stateOf(spark, s"$base/ckpt2", stateVar = Some("total"))
      assert(fin.select("partition_id").distinct().count() > 2)
      val state = fin.select(col("key.value"), col("value.value"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(state == Map("a" -> 11L, "b" -> 2L, "c" -> 3L, "d" -> 44L))
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("state schema evolution: v1 savepoint restores into v2 with an added field") {
    import spark.implicits._
    val base = Tables.scratch(s"savepoint-evolve/${java.util.UUID.randomUUID()}")
    Seq(("a", 1L), ("a", 2L), ("b", 5L)).toDF("k", "v")
      .write.parquet(s"$base/in1")
    Seq(("a", 10L), ("c", 7L)).toDF("k", "v")
      .write.parquet(s"$base/in2")
    def src(d: String) = spark.readStream.schema("k string, v long").parquet(d)

    // operator v1 runs and is savepointed (bare-Long state)
    streaming.Savepoint.runCounts(spark, src(s"$base/in1"),
      spark.emptyDataset[(String, Long)], s"$base/ckpt1", "sp_ev1")
    streaming.Savepoint.`export`(spark, s"$base/ckpt1",
      s"$base/savepoint", Some("total"))(
      _.select(col("key.value").as("k"), col("value.value").as("total")))

    // operator v2 (state struct gained `cnt`) restores the v1 savepoint
    val initial = spark.read.parquet(s"$base/savepoint").as[(String, Long)]
    streaming.Savepoint.runCountsV2(spark, src(s"$base/in2"), initial,
      s"$base/ckpt2", "sp_ev2")
    val fin = streaming.QueryableState
      .stateOf(spark, s"$base/ckpt2", stateVar = Some("totalv2"))
      .select(col("key.value"), col("value.total"), col("value.cnt"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // totals continue across the version change; the ADDED field counts
    // only v2-era rows — restored-but-untouched keys keep its default
    assert(fin == Map(
      "a" -> ((13L, 1L)),  // 1+2 savepointed, +10 in v2, 1 row seen by v2
      "b" -> ((5L, 0L)),   // restored, no v2 input: new field at default
      "c" -> ((7L, 1L))))  // born in v2
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("checkpoint time travel: state readable at an older committed batch") {
    import spark.implicits._
    val base = Tables.scratch(s"timetravel-spec/${java.util.UUID.randomUUID()}")
    // coalesce(1): one file per fixture so maxFilesPerTrigger=1 maps each
    // fixture to exactly one committed batch
    Seq(("a", 1L), ("b", 2L)).toDF("k", "v").coalesce(1)
      .write.parquet(s"$base/in/f0")
    Seq(("a", 10L)).toDF("k", "v").coalesce(1).write.parquet(s"$base/in/f1")
    // maxFilesPerTrigger=1 => two committed batches with different state
    val in = spark.readStream.schema("k string, v long")
      .option("maxFilesPerTrigger", "1").parquet(s"$base/in/*")
    streaming.Savepoint.runCounts(spark, in,
      spark.emptyDataset[(String, Long)], s"$base/ckpt", "tt_sink")
    def at(batch: Int) = spark.read.format("statestore")
      .option("stateVarName", "total").option("batchId", batch.toString)
      .load(s"$base/ckpt")
      .select(col("key.value"), col("value.value"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the per-batch file order under a glob is lexicographic (f0 then f1)
    assert(at(0) == Map("a" -> 1L, "b" -> 2L))
    assert(at(1) == Map("a" -> 11L, "b" -> 2L))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
