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

  test("a mistyped key or kind column fails at construction, naming the column") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, String, Double)]
    val df = mem.toDF().toDF("kind", "k", "v")
    val store = new UpsertSink.InMemoryStore
    val e1 = intercept[IllegalArgumentException] {
      UpsertSink.foreachBatchChangelog(df, "kynd", Seq("k"), store)
    }
    assert(e1.getMessage.contains("kynd"))
    val e2 = intercept[IllegalArgumentException] {
      UpsertSink.foreachBatchChangelog(df, "kind", Seq("key_oops"), store)
    }
    assert(e2.getMessage.contains("key_oops"))
    val e3 = intercept[IllegalArgumentException] {
      UpsertSink.foreachBatchUpsert(df, Seq("nope"), store)
    }
    assert(e3.getMessage.contains("nope"))
    store.close()
  }
}
