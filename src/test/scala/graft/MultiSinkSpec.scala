package graft

import graft.streaming.MultiSink
import java.nio.file.Files

/** StatementSet-analogue multi-sink execution: N destinations, shared
  * prefix computed once. */
class MultiSinkSpec extends GraftSpec {

  test("batch fanOut writes all sinks and reuses the shared scan") {
    val sparkS = spark
    import sparkS.implicits._
    val out1 = Files.createTempDirectory("graft_ms1").toString
    val out2 = Files.createTempDirectory("graft_ms2").toString
    val src = Tables.t(spark, sfDir, "nation")

    var secondPlan: String = null
    MultiSink.fanOut(src, Seq(
      df => df.write.mode("overwrite").parquet(out1),
      df => {
        val proj = df.select($"n_nationkey")
        proj.write.mode("overwrite").parquet(out2)
        secondPlan = proj.queryExecution.executedPlan.toString
      }))

    assert(spark.read.parquet(out1).count() == src.count())
    assert(spark.read.parquet(out2).count() == src.count())
    // the later sink reads the persisted prefix, not the parquet source
    assert(secondPlan.contains("InMemoryTableScan"), secondPlan)
  }

  test("streaming fanOut delivers each batch to every sink") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val counts = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val q = MultiSink.streamFanOut(mem.toDF(),
      Seq(
        (b, _) => counts.synchronized { counts += (("a", b.count())) },
        (b, _) => counts.synchronized { counts += (("b", b.count())) }))
      .start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      assert(counts.toSet == Set(("a", 3L), ("b", 3L)))
    } finally q.stop()
  }
}

/** PROCTIME() expression semantics. */
class ProcTimeSpec extends GraftSpec {
  test("proctime is per-record wall clock, never constant-folded") {
    val sparkS = spark
    import sparkS.implicits._
    val before = System.currentTimeMillis()
    val df = spark.range(1000).toDF("i")
      .withColumn("pt", org.apache.spark.sql.graft.ProcTime.proctime())
    val vals = df.select(org.apache.spark.sql.functions.unix_millis($"pt"))
      .as[Long].collect()
    val after = System.currentTimeMillis()
    assert(vals.forall(v => v >= before && v <= after), (vals.min, before, after))
    // nondeterministic: survives in the optimized plan (not folded to literal)
    assert(df.queryExecution.optimizedPlan.toString.toLowerCase.contains("proctime"))
    // SQL surface
    org.apache.spark.sql.graft.GraftSqlFunctions.register(spark)
    assert(spark.sql("SELECT proctime() AS pt").collect().length == 1)
  }
}
