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
}
