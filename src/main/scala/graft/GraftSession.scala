package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point — a SparkSession wired with graft's
  * extensions (reference analogue: TableEnvironment.create wiring the planner,
  * catalogs and function catalog in one call).
  *
  * What it installs:
  *  - SQL functions hash_code / dot_product / cosine_similarity
  *  - the SplitDistinctAggRule optimizer rule (off until
  *    spark.graft.splitDistinctAgg.enabled=true)
  *  - engine defaults: UTC session time zone, AQE on (Spark 4 default kept
  *    explicit), shuffle partitions sized to the given parallelism
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    install(spark)
    spark
  }

  /** Install graft's extensions on an existing session (driver-provided
    * sessions included). Idempotent. */
  def install(spark: SparkSession): SparkSession = {
    org.apache.spark.sql.graft.GraftSqlFunctions.register(spark)
    plans.SplitDistinctAggRule.install(spark)
    spark
  }
}
