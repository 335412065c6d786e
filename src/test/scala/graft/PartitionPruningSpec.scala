package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Partition layout + pruning — at 100 TB the dominant scan optimization
  * (reference PushPartitionIntoLegacyTableSourceScanRule.scala; Spark static
  * + dynamic partition pruning). */
class PartitionPruningSpec extends GraftSpec {

  test("date-partitioned write is pruned by a partition predicate") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.t(spark, sfDir, "events")
      .withColumn("day", to_date($"ts"))
      .write.mode("overwrite").partitionBy("day").parquet(s"$dir/events_p")

    val df = spark.read.parquet(s"$dir/events_p")
      .filter($"day" === "2024-01-03")
      .agg(count(lit(1)).as("cnt"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(day"), p)
    // only one partition directory is read
    val scanned = "PartitionFilters: \\[.*?\\]".r.findFirstIn(p).get
    assert(scanned.contains("= 19725") || scanned.contains("2024-01-03"), scanned)
    // correctness: equals the unpartitioned filter
    val expected = Tables.t(spark, sfDir, "events")
      .filter(to_date($"ts") === "2024-01-03").count()
    assert(df.collect().head.getLong(0) == expected)
  }

  test("approximate aggregates stay within tolerance of exact (scale path)") {
    import spark.implicits._
    val e = Tables.t(spark, sfDir, "events")
    val exact = e.select(countDistinct($"user_id")).collect().head.getLong(0)
    val approx = e.select(approx_count_distinct($"user_id", 0.02)).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1,
      s"approx $approx vs exact $exact")
    val p50exact = e.select(expr("percentile(value, 0.5)")).collect().head.getDouble(0)
    val p50approx = e.select(expr("approx_percentile(value, 0.5, 1000)")).collect().head.getDouble(0)
    assert(math.abs(p50approx - p50exact) / math.max(p50exact, 1e-9) < 0.1)
  }
}
