package graft

import graft.streaming.{SessionTws, TwsOps}
import graft.streaming.SessionTws.{SessEvW, SessWin}
import graft.operators.TriggerWindows.SessOut
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Merging session windows on transformWithState — the MergingWindowSet
  * cases the oracle fixture's happy path cannot isolate: a bridge event
  * fusing two open sessions, merges across micro-batch boundaries, and
  * watermark-driven close finality. */
class SessionTwsSpec extends GraftSpec {

  private val baseUs = 3600L * 1000000 // keep event time above watermark 0

  test("merge(): bridging interval fuses disjoint sessions; touching intervals stay separate") {
    val a = SessWin(0, 30, 1, 1.0)
    val b = SessWin(100, 130, 2, 2.0)
    // end-exclusive: [30, 60) touching [0, 30) does NOT merge
    assert(SessionTws.merge(Seq(a, SessWin(30, 60, 1, 5.0))).size == 2)
    // a bridge overlapping both fuses all three into one
    val fused = SessionTws.merge(Seq(a, b, SessWin(25, 105, 1, 4.0)))
    assert(fused == Vector(SessWin(0, 130, 4, 7.0)), fused)
    // order-independence: protos arrive unsorted
    assert(SessionTws.merge(Seq(b, SessWin(25, 105, 1, 4.0), a)) == fused)
  }

  private def ev(tsUs: Long, gapUs: Long, v: Double, uid: Long = 1L): SessEvW =
    SessEvW(uid, baseUs + tsUs, v, gapUs,
      new Timestamp((baseUs + tsUs) / 1000))

  test("a bridge event arriving in a LATER batch fuses two open sessions into one emission") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[SessEvW]
      // 200 s watermark DELAY keeps both sessions open across the first
      // two batches (delay 0 would close [0, 30s) the moment the 100 s
      // event advanced the watermark — correct finality, wrong scenario)
      val out = SessionTws.sessionTws(
        mem.toDS().withWatermark("ts", "200 seconds"))
      val emitted = scala.collection.mutable.ArrayBuffer[SessOut]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SessOut], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        val M = 1000000L
        // batch 1: two open sessions [0, 30s) and [100s, 130s)
        mem.addData(ev(0, 30 * M, 1.0), ev(100 * M, 30 * M, 2.0))
        q.processAllAvailable()
        // batch 2: bridge [25s, 105s) overlaps BOTH -> one fused session
        mem.addData(ev(25 * M, 80 * M, 4.0))
        q.processAllAvailable()
        assert(emitted.isEmpty, s"nothing closed yet, got $emitted")
        // batch 3: far-future other-key event closes the fused session
        mem.addData(ev(1000 * M, 1 * M, 0.0, uid = 2L))
        q.processAllAvailable()
        val key1 = emitted.filter(_.user_id == 1L).toSeq
        assert(key1 == Seq(SessOut(baseUs / 1000000, 1L, 3, 7.0)),
          s"expected ONE fused session of 3 events, got $key1")
      } finally q.stop()
    }
  }

  test("a session closed by the watermark is FINAL: a later event starts a new session") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[SessEvW]
      val out = SessionTws.sessionTws(
        mem.toDS().withWatermark("ts", "0 seconds"))
      val emitted = scala.collection.mutable.ArrayBuffer[SessOut]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[SessOut], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        val M = 1000000L
        mem.addData(ev(0, 10 * M, 1.0))
        q.processAllAvailable()
        // watermark passes the session end (10 s) -> closes with cnt 1
        mem.addData(ev(500 * M, 10 * M, 2.0, uid = 2L))
        q.processAllAvailable()
        assert(emitted.toSeq == Seq(SessOut(baseUs / 1000000, 1L, 1, 1.0)),
          s"got $emitted")
        // same key again well past the old session: NEW session, not a merge
        mem.addData(ev(600 * M, 10 * M, 3.0))
        q.processAllAvailable()
        mem.addData(ev(2000 * M, 1 * M, 0.0, uid = 2L))
        q.processAllAvailable()
        val key1 = emitted.filter(_.user_id == 1L).toSeq
        assert(key1 == Seq(
          SessOut(baseUs / 1000000, 1L, 1, 1.0),
          SessOut(baseUs / 1000000 + 600, 1L, 1, 3.0)), s"got $key1")
      } finally q.stop()
    }
  }
}
