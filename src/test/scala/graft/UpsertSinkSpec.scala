package graft

import graft.streaming.UpsertSink
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Changelog-sink semantics: update-mode agg + keyed upsert reconstructs the
  * batch-equivalent table (reference retraction-stream + upsert sink). */
class UpsertSinkSpec extends GraftSpec {

  test("update-mode agg upserted by key equals the batch aggregate") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val agg = mem.toDF().toDF("k", "v")
      .groupBy($"k").agg(round(sum($"v"), 2).as("total"), count(lit(1)).as("cnt"))
    val store = new UpsertSink.InMemoryStore
    val q = UpsertSink.foreachBatchUpsert(agg, Seq("k"), store).start()

    mem.addData(("a", 1.0), ("b", 2.0))
    q.processAllAvailable()
    mem.addData(("a", 10.0), ("c", 5.0)) // a updated (+U), c inserted (+I)
    q.processAllAvailable()
    q.stop()

    val got = store.snapshot().map { case (k, row) => k.head -> (row(1), row(2)) }
    assert(got == Map(
      "a" -> (11.0, 2L), "b" -> (2.0, 1L), "c" -> (5.0, 1L)))
  }
}
