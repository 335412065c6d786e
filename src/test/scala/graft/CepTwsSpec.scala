package graft

import graft.cep.{AfterMatch, CepTws, Pattern}
import graft.streaming.StatefulOps.Ev
import graft.streaming.TwsOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The transformWithState CEP runtime (r10 verdict's ordered migration of
  * the NFA's in-flight-runs state off flatMapGroupsWithState). Pins:
  * partial matches carry across micro-batches in ListState, the element
  * buffer consumes in event-time order, and — the capability the fMGWS
  * path lacked — `within` windows expire on WATERMARK passage through a
  * native timer, without another event on the key. */
class CepTwsSpec extends GraftSpec {

  private def ev(id: Long, tpe: String, key: Long = 1L): Ev =
    Ev(id, key, tpe, 0.0, id * 1000000)
  // all timestamps ride 1 h above epoch: Spark's event-time mode drops
  // rows at-or-below the current watermark, and the watermark initializes
  // to 0 — an epoch-0 event would be filtered before the processor
  private val B = 3600000000L
  private def at(id: Long, tpe: String, tsUs: Long, key: Long = 1L): Ev =
    Ev(id, key, tpe, 0.0, B + tsUs)

  test("tws CEP carries quantified partial runs across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[Ev]
      val pat = Pattern.begin[Ev]("a")(_.event_type == "A").times(2).consecutive
        .next("b")(_.event_type == "B")
      val q = CepTws.streamingMatchesTws(mem.toDS(), pat)
        .writeStream.format("memory").queryName("cep_tws_quant")
        .outputMode("append").start()
      try {
        mem.addData(ev(1, "A"))  // batch 1: partial run (1 of 2 As)
        q.processAllAvailable()
        mem.addData(ev(2, "A"))  // batch 2: run advances to 2 As in ListState
        q.processAllAvailable()
        mem.addData(ev(3, "B"))  // batch 3: completes across three batches
        q.processAllAvailable()
        // watermark trails the max event, so the B row needs a successor
        // before its own release timer is due
        mem.addData(ev(9, "X"))
        q.processAllAvailable()
        val rows = spark.table("cep_tws_quant").collect().map(_.toSeq).toList
        assert(rows == List(Seq(1L, 1L, 3L)), rows)
      } finally q.stop()
    }
  }

  test("tws CEP emits timeouts for runs whose window expires mid-stream (parity with the fMGWS path)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[Ev]
      val pat = Pattern.begin[Ev]("a")(_.event_type == "S")
        .followedBy("b")(_.event_type == "P")
        .within(2000000)
        .afterMatchSkip(AfterMatch.NoSkip)
      val q = CepTws.streamingMatchesWithTimeoutsTws(mem.toDS(), pat)
        .writeStream.format("memory").queryName("cep_tws_to")
        .outputMode("append").start()
      try {
        mem.addData(at(1, "S", 0))        // batch 1: in-flight run
        q.processAllAvailable()
        mem.addData(at(2, "P", 1000000))  // batch 2: completes (1,2)
        q.processAllAvailable()
        mem.addData(at(3, "S", 1500000))  // batch 3: new in-flight run
        q.processAllAvailable()
        mem.addData(at(4, "X", 4000000))  // batch 4: wm 4s expires run 3
        q.processAllAvailable()
        val rows = spark.table("cep_tws_to").collect()
          .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
        assert(rows == Set((1L, 2L, false), (3L, 3L, true)), rows)
      } finally q.stop()
    }
  }

  test("tws CEP: the watermark alone expires a window — no further event on the key (native timer)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[Ev]
      val pat = Pattern.begin[Ev]("a")(_.event_type == "S")
        .followedBy("b")(_.event_type == "P")
        .within(2000000)
        .afterMatchSkip(AfterMatch.NoSkip)
      val q = CepTws.streamingMatchesWithTimeoutsTws(mem.toDS(), pat)
        .writeStream.format("memory").queryName("cep_tws_wm")
        .outputMode("append").start()
      try {
        mem.addData(at(1, "S", 0, key = 1L))   // key 1: in-flight, deadline 2s
        q.processAllAvailable()
        assert(spark.table("cep_tws_wm").isEmpty)
        // a DIFFERENT key's event advances the watermark past key 1's
        // deadline; the fMGWS runtime would sit on this run forever
        mem.addData(at(2, "X", 10000000, key = 2L))
        q.processAllAvailable()
        val rows = spark.table("cep_tws_wm").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toList
        assert(rows == List((1L, 1L, true)), rows)
      } finally q.stop()
    }
  }
}
