package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermark multiplexing across sources (reference
  * WatermarkOutputMultiplexer.java + WatermarksWithIdleness.java — an idle
  * source must not stall the combined watermark forever): Spark's analogue
  * is `spark.sql.streaming.multipleWatermarkPolicy`. Default `min` is the
  * reference's default combine (safe, idle/lagging input holds the
  * watermark back); `max` is the idleness escape hatch (the advanced input
  * drives event time, late rows of the lagging input may drop). This spec
  * pins the mapping with a two-source union where the policies provably
  * diverge. */
class WatermarkPolicySpec extends GraftSpec {

  private def run(policy: String, name: String): Set[Long] = {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
    try {
      val base = Tables.scratch(s"wm-policy/$name-${java.util.UUID.randomUUID()}")
      // fast source: watermark reaches 10:00; slow source: stuck at 00:10
      Seq(36000L).toDF("ts_s").coalesce(1).write.parquet(s"$base/fast")
      Seq(10L, 20L).toDF("ts_s").coalesce(1).write.parquet(s"$base/slow")
      def src(d: String) = spark.readStream.schema("ts_s long").parquet(d)
        .withColumn("ts", timestamp_seconds($"ts_s"))
        .withWatermark("ts", "0 seconds")
      val unioned = src(s"$base/fast").union(src(s"$base/slow"))
        .groupBy(window($"ts", "60 seconds")).agg(count(lit(1)).as("cnt"))
      // APPEND mode only emits windows the COMBINED watermark has closed —
      // the emitted set is therefore a direct readout of the combine policy
      val q = unioned.select(unix_timestamp($"window.start").as("ws"), $"cnt")
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table(name).collect().map(_.getLong(0)).toSet
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
      out
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
      case None => spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
    }
  }

  test("min policy (default): the lagging source holds the union watermark") {
    assert(run("min", "wm_min") == Set.empty[Long])
  }

  test("max policy (idleness escape): the advanced source drives the watermark") {
    // watermark = 10:00 closes both the 00:00 window (slow rows) and every
    // window before it; the fast row's own 10:00 window stays open
    assert(run("max", "wm_max") == Set(0L))
  }

  /** Mid-stream idleness (reference WatermarksWithIdleness.java:45): the
    * idle partner produces in phase 1 only; the active partner keeps
    * producing across LATER micro-batches. Under `max` the combined
    * watermark keeps advancing on the active source alone and windows keep
    * closing — the reference's idle-marking outcome. Divergence (stated):
    * the reference de-weights a source only after its idle TIMEOUT and
    * re-weights it on revival, while Spark's `max` policy applies always —
    * so a revived source's rows older than the advanced watermark are late
    * under Spark even within what would have been the reference's timeout
    * window. Same steady-state emission, different revival grace. */
  test("mid-stream idle source under max: later batches keep closing windows") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
    try {
      val base = Tables.scratch(s"wm-policy/idle-${java.util.UUID.randomUUID()}")
      // idle partner: ONE early file, then silence
      Seq(30L).toDF("ts_s").coalesce(1).write.parquet(s"$base/idle")
      // active partner: three files == three micro-batches (file order by
      // path is deterministic with one file per prefix)
      Seq(100L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p1")
      Seq(200L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p2")
      Seq(330L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p3")
      def src(d: String, one: Boolean) = {
        val r = spark.readStream.schema("ts_s long")
        (if (one) r.option("maxFilesPerTrigger", 1) else r)
          .parquet(d)
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds($"ts_s"))
          .withWatermark("ts", "0 seconds")
      }
      val unioned = src(s"$base/active/*", one = true)
        .union(src(s"$base/idle", one = false))
        .groupBy(org.apache.spark.sql.functions.window($"ts", "60 seconds"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      val q = unioned
        .select(org.apache.spark.sql.functions.unix_timestamp($"window.start")
          .as("ws"), $"cnt")
        .writeStream.format("memory").queryName("wm_idle_mid")
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // active reached 330 -> watermark 330 closes [0,60) {30}, [60,120)
      // {100}, [180,240) {200}; [300,360) {330} stays open. The idle
      // source's 30 held NOTHING back, and the windows closed across
      // multiple batches, not one final flush
      val out = spark.table("wm_idle_mid").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out == Map(0L -> 1L, 60L -> 1L, 180L -> 1L),
        s"expected the idle-tolerant emission set, got $out")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"the phased feed must span multiple micro-batches (got $dataBatches)")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
      case None => spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
    }
  }

  /** The revival hazard, pinned: under `max` a source that revives with
    * rows OLDER than the watermark the active source advanced sees them
    * dropped as late — the trade-off WatermarksWithIdleness's own javadoc
    * states for marking a source idle (its records may then be considered
    * late on revival). Grace comparison, measured while building this
    * test: the reference gives a revived source its idle TIMEOUT before
    * de-weighting again; Spark gives exactly ONE micro-batch — stateful
    * operators filter late records with the PREVIOUS batch's watermark
    * while evicting with the current one (the two-watermark design that
    * enables chained stateful operators), so a row arriving in the same
    * batch cycle as the advance still lands, and one batch later it
    * drops. This test pins the drop one batch past the advance. */
  test("revival under max: rows older than the advanced watermark drop as late") {
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.multipleWatermarkPolicy")
    spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", "max")
    try {
      val base = Tables.scratch(s"wm-policy/revive-${java.util.UUID.randomUUID()}")
      // BOTH sources capped at one file per trigger so the batch alignment
      // is deterministic: batch 0 = reviver {30} + active {400,450} (the
      // watermark jumps to 450 after it), batch 1 = on-time {455} + {460}
      // (the late-events watermark is now 450), batch 2 = the revived {90}
      // (late by BOTH watermarks -> dropped) + active {470}
      Seq(30L).toDF("ts_s").coalesce(1).write.parquet(s"$base/revive/p1")
      Seq(455L).toDF("ts_s").coalesce(1).write.parquet(s"$base/revive/p2")
      Seq(90L).toDF("ts_s").coalesce(1).write.parquet(s"$base/revive/p3")
      Seq(400L, 450L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p1")
      Seq(460L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p2")
      Seq(470L).toDF("ts_s").coalesce(1).write.parquet(s"$base/active/p3")
      // the file source orders files by MODIFICATION time (ties broke this
      // test's phasing once): pin a strictly increasing mtime per phase
      for ((d, i) <- Seq("revive/p1", "active/p1", "revive/p2", "active/p2",
          "revive/p3", "active/p3").zipWithIndex;
          f <- new java.io.File(s"$base/$d").listFiles()
          if f.getName.endsWith(".parquet"))
        f.setLastModified(1700000000000L + i * 60000L)
      def src(d: String, one: Boolean) = {
        val r = spark.readStream.schema("ts_s long")
        (if (one) r.option("maxFilesPerTrigger", 1) else r)
          .parquet(d)
          .withColumn("ts", org.apache.spark.sql.functions.timestamp_seconds($"ts_s"))
          .withWatermark("ts", "0 seconds")
      }
      val unioned = src(s"$base/revive/*", one = true)
        .union(src(s"$base/active/*", one = true))
        .groupBy(org.apache.spark.sql.functions.window($"ts", "60 seconds"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("cnt"))
      val q = unioned
        .select(org.apache.spark.sql.functions.unix_timestamp($"window.start")
          .as("ws"), $"cnt")
        .writeStream.format("memory").queryName("wm_revive")
        .outputMode("append")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val out = spark.table("wm_revive").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the late-events watermark is 460 when the revived ts=90 arrives ->
      // dropped, so the [60,120) window never appears; emitted = [0,60)
      // {30} and [360,420) {400} ([420,480) {450,455,460,470} stays open
      // at the final watermark 470). Under the reference's idleness
      // contract the revived source would get its idle timeout of grace;
      // Spark's grace is the one-batch watermark lag pinned above.
      assert(out == Map(0L -> 1L, 360L -> 1L),
        s"expected the late-drop emission set, got $out")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", v)
      case None => spark.conf.unset("spark.sql.streaming.multipleWatermarkPolicy")
    }
  }
}
