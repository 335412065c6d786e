package graft

import graft.streaming.{ChangelogAgg, ChangelogJoin}
import graft.streaming.ChangelogAgg.{AggChange, AggOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Retractable aggregates over a changelog input (reference
  * MaxWithRetractAggFunction.java et al.): retracting the current max must
  * fall back to the next live value, and the emitted output must itself be
  * a well-formed changelog that downstream changelog operators can consume. */
class ChangelogAggSpec extends GraftSpec {

  test("pure core: retracting the max falls back to the next-largest value") {
    import ChangelogAgg.{applyChange, result, empty}
    var st = empty
    st = applyChange(st, "+I", 5.0)
    st = applyChange(st, "+I", 3.0)
    assert(result(st).contains((2L, 8.0, 3.0, 5.0)))
    st = applyChange(st, "-U", 5.0) // retract the max
    assert(result(st).contains((1L, 3.0, 3.0, 3.0))) // max fell back to 3
    st = applyChange(st, "+U", 4.0)
    assert(result(st).contains((2L, 7.0, 3.0, 4.0)))
    st = applyChange(st, "-D", 3.0)
    st = applyChange(st, "-D", 4.0)
    assert(result(st).isEmpty) // all rows deleted
  }

  test("duplicate values: one retraction removes ONE instance, not all") {
    import ChangelogAgg.{applyChange, result, empty}
    var st = empty
    st = applyChange(st, "+I", 7.0)
    st = applyChange(st, "+I", 7.0)
    st = applyChange(st, "-U", 7.0)
    assert(result(st).contains((1L, 7.0, 7.0, 7.0))) // one 7 still live
  }

  test("multi-batch: output is a changelog with -U/+U pairs; max DECREASES on retract") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[AggChange[Long]]
    val out = ChangelogAgg.agg(mem.toDS())
    val emitted = scala.collection.mutable.ArrayBuffer[AggOut[Long]]()
    val q = out.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[AggOut[Long]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()
    try {
      // batch 1: two inserts → one +I with max 9
      mem.addData(AggChange(1L, 1, "+I", 9.0), AggChange(1L, 2, "+I", 4.0))
      q.processAllAvailable()
      assert(emitted.toSeq == Seq(AggOut(1L, "+I", 2, 13.0, 4.0, 9.0)))
      // batch 2: upsert 9 → 5 (the max is RETRACTED across batches)
      mem.addData(AggChange(1L, 3, "-U", 9.0), AggChange(1L, 4, "+U", 5.0))
      q.processAllAvailable()
      assert(emitted.toSeq.drop(1) == Seq(
        AggOut(1L, "-U", 2, 13.0, 4.0, 9.0),
        AggOut(1L, "+U", 2, 9.0, 4.0, 5.0))) // max fell 9 → 5
      // batch 3: delete both → -D and state removed
      mem.addData(AggChange(1L, 5, "-D", 4.0), AggChange(1L, 6, "-D", 5.0))
      q.processAllAvailable()
      assert(emitted.toSeq.drop(3) == Seq(AggOut(1L, "-D", 2, 9.0, 4.0, 5.0)))
      // batch 4: the key starts fresh after full deletion
      mem.addData(AggChange(1L, 7, "+I", 2.0))
      q.processAllAvailable()
      assert(emitted.toSeq.drop(4) == Seq(AggOut(1L, "+I", 1, 2.0, 2.0, 2.0)))
    } finally q.stop()
  }

  test("ordered core: first/last/listagg track arrival order under retraction") {
    import ChangelogAgg.{applyOrd, ordResult, emptyOrd}
    var st = emptyOrd
    st = applyOrd(st, "+I", 5.0, 1)
    st = applyOrd(st, "+I", 3.0, 2)
    st = applyOrd(st, "+I", 8.0, 3)
    assert(ordResult(st).contains((5.0, 8.0, Seq(5.0, 3.0, 8.0))))
    st = applyOrd(st, "-U", 5.0, 4) // retract the FIRST value
    assert(ordResult(st).contains((3.0, 8.0, Seq(3.0, 8.0)))) // first falls forward
    st = applyOrd(st, "-U", 8.0, 5) // retract the LAST value
    assert(ordResult(st).contains((3.0, 3.0, Seq(3.0))))
    st = applyOrd(st, "-D", 3.0, 6)
    assert(ordResult(st).isEmpty)
  }

  test("ordered core: duplicate values retract the OLDEST instance") {
    import ChangelogAgg.{applyOrd, ordResult, emptyOrd}
    var st = emptyOrd
    st = applyOrd(st, "+I", 7.0, 1)
    st = applyOrd(st, "+I", 2.0, 2)
    st = applyOrd(st, "+I", 7.0, 3)
    st = applyOrd(st, "-U", 7.0, 4) // removes the seq-1 instance
    assert(ordResult(st).contains((2.0, 7.0, Seq(2.0, 7.0))))
  }

  test("idle-state TTL: an expired key's accumulator is dropped; later changes start fresh") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[AggChange[Long]]
    val base = 1000000000L // keep event time above the initial watermark 0
    val withWm = mem.toDS()
      .withColumn("__ts", timestamp_millis($"seq"))
      .withWatermark("__ts", "0 seconds")
      .as[AggChange[Long]]
    val out = ChangelogAgg.agg(withWm, idleTtlMs = Some(1000L))
    val emitted = scala.collection.mutable.ArrayBuffer[AggOut[Long]]()
    val q = out.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[AggOut[Long]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()
    try {
      mem.addData(AggChange(1L, base, "+I", 9.0))
      q.processAllAvailable()
      // other-key traffic drives the watermark past base + 1000
      mem.addData(AggChange(2L, base + 5000, "+I", 1.0))
      q.processAllAvailable()
      mem.addData(AggChange(2L, base + 6000, "+I", 1.0))
      q.processAllAvailable()
      // key 1's accumulator expired: this +I starts a FRESH aggregate
      mem.addData(AggChange(1L, base + 7000, "+I", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    val key1 = emitted.filter(_.key == 1L).toSeq
    assert(key1.head == AggOut(1L, "+I", 1, 9.0, 9.0, 9.0))
    // fresh +I (not a -U/+U pair) proves the old state was gone
    assert(key1.last == AggOut(1L, "+I", 1, 4.0, 4.0, 4.0), s"got $key1")
  }

  test("TwS runtime: retractions across micro-batches (MapState multiset carries; max falls back)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[AggChange[Long]]
      val out = ChangelogAgg.aggTws(mem.toDS())
      val emitted = scala.collection.mutable.ArrayBuffer[AggOut[Long]]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[AggOut[Long]], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        // the same four-batch script as the fMGWS test above — the multiset
        // now lives as MapState rows and must survive batch boundaries with
        // only the touched values rewritten
        mem.addData(AggChange(1L, 1, "+I", 9.0), AggChange(1L, 2, "+I", 4.0))
        q.processAllAvailable()
        assert(emitted.toSeq == Seq(AggOut(1L, "+I", 2, 13.0, 4.0, 9.0)))
        mem.addData(AggChange(1L, 3, "-U", 9.0), AggChange(1L, 4, "+U", 5.0))
        q.processAllAvailable()
        assert(emitted.toSeq.drop(1) == Seq(
          AggOut(1L, "-U", 2, 13.0, 4.0, 9.0),
          AggOut(1L, "+U", 2, 9.0, 4.0, 5.0))) // max fell 9 → 5 across batches
        mem.addData(AggChange(1L, 5, "-D", 4.0), AggChange(1L, 6, "-D", 5.0))
        q.processAllAvailable()
        assert(emitted.toSeq.drop(3) == Seq(AggOut(1L, "-D", 2, 9.0, 4.0, 5.0)))
        mem.addData(AggChange(1L, 7, "+I", 2.0))
        q.processAllAvailable()
        assert(emitted.toSeq.drop(4) == Seq(AggOut(1L, "+I", 1, 2.0, 2.0, 2.0)))
      } finally q.stop()
    }
  }

  test("TwS runtime: idle TTL drops the accumulator via a native event-time timer") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[AggChange[Long]]
      val base = 1000000000L
      val withWm = mem.toDS()
        .withColumn("__ts", timestamp_millis($"seq"))
        .withWatermark("__ts", "0 seconds")
        .as[AggChange[Long]]
      val out = ChangelogAgg.aggTws(withWm, idleTtlMs = Some(1000L))
      val emitted = scala.collection.mutable.ArrayBuffer[AggOut[Long]]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[AggOut[Long]], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        mem.addData(AggChange(1L, base, "+I", 9.0))
        q.processAllAvailable()
        mem.addData(AggChange(2L, base + 5000, "+I", 1.0))
        q.processAllAvailable()
        mem.addData(AggChange(2L, base + 6000, "+I", 1.0))
        q.processAllAvailable()
        // key 1's accumulator expired: this +I starts a FRESH aggregate
        mem.addData(AggChange(1L, base + 7000, "+I", 4.0))
        q.processAllAvailable()
      } finally q.stop()
      val key1 = emitted.filter(_.key == 1L).toSeq
      assert(key1.head == AggOut(1L, "+I", 1, 9.0, 9.0, 9.0))
      assert(key1.last == AggOut(1L, "+I", 1, 4.0, 4.0, 4.0), s"got $key1")
    }
  }

  test("TwS runtime: keeping activity drives the TTL timer LATER, not a fresh restart") {
    // a key that keeps receiving changes within the TTL must retain its
    // accumulator (-U/+U continuation, never a fresh +I) — discriminates a
    // timer that fires at the ORIGINAL deadline despite new activity
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[AggChange[Long]]
      val base = 1000000000L
      val withWm = mem.toDS()
        .withColumn("__ts", timestamp_millis($"seq"))
        .withWatermark("__ts", "0 seconds")
        .as[AggChange[Long]]
      val out = ChangelogAgg.aggTws(withWm, idleTtlMs = Some(5000L))
      val emitted = scala.collection.mutable.ArrayBuffer[AggOut[Long]]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[AggOut[Long]], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        mem.addData(AggChange(1L, base, "+I", 9.0))
        q.processAllAvailable()
        // fresh activity at base+4000 re-arms the deadline to base+9000;
        // watermark then passes the ORIGINAL base+5000 deadline
        mem.addData(AggChange(1L, base + 4000, "+I", 1.0))
        q.processAllAvailable()
        mem.addData(AggChange(2L, base + 7000, "+I", 1.0))
        q.processAllAvailable()
        // still within the re-armed TTL: must CONTINUE (-U/+U), not restart
        mem.addData(AggChange(1L, base + 8000, "+I", 2.0))
        q.processAllAvailable()
      } finally q.stop()
      val key1 = emitted.filter(_.key == 1L).toSeq
      assert(key1.takeRight(2).map(_.kind) == Seq("-U", "+U"), s"got $key1")
      assert(key1.last == AggOut(1L, "+U", 3, 12.0, 1.0, 9.0), s"got $key1")
    }
  }

  test("TwS ordered runtime: first/last retraction across micro-batches") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[AggChange[Long]]
      val out = ChangelogAgg.aggOrderedTws(mem.toDS())
      val emitted = scala.collection.mutable.ArrayBuffer[ChangelogAgg.OrdOut[Long]]()
      val q = out.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[ChangelogAgg.OrdOut[Long]], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      try {
        mem.addData(AggChange(1L, 1, "+I", 5.0), AggChange(1L, 2, "+I", 7.0))
        q.processAllAvailable()
        assert(emitted.toSeq ==
          Seq(ChangelogAgg.OrdOut(1L, "+I", 5.0, 7.0, Seq(5.0, 7.0))))
        // retract the FIRST value in a later batch: first_v must advance to 7
        mem.addData(AggChange(1L, 3, "-U", 5.0))
        q.processAllAvailable()
        assert(emitted.toSeq.drop(1) == Seq(
          ChangelogAgg.OrdOut(1L, "-U", 5.0, 7.0, Seq(5.0, 7.0)),
          ChangelogAgg.OrdOut(1L, "+U", 7.0, 7.0, Seq(7.0))))
        // duplicate value: retraction removes the OLDEST instance (seq 2)
        mem.addData(AggChange(1L, 4, "+I", 7.0), AggChange(1L, 5, "+I", 3.0))
        q.processAllAvailable()
        mem.addData(AggChange(1L, 6, "-U", 7.0))
        q.processAllAvailable()
        assert(emitted.last ==
          ChangelogAgg.OrdOut(1L, "+U", 7.0, 3.0, Seq(7.0, 3.0)), s"got $emitted")
      } finally q.stop()
    }
  }

  test("agg→join→agg chain: aggregate output changelog feeds ChangelogJoin") {
    val sparkS = spark
    import sparkS.implicits._

    // left changelog: per-user latest value (upserts); aggregate it per
    // bucket, then JOIN the aggregate's changelog against a static-ish right
    // changelog, then aggregate the join output — all through the real ops.
    val changes = Seq(
      AggChange(0L, 1, "+I", 10.0),
      AggChange(0L, 2, "-U", 10.0), AggChange(0L, 3, "+U", 6.0),
      AggChange(1L, 4, "+I", 2.0)).toDS()
    val aggOut = ChangelogAgg.agg(changes) // changelog: bucket → (cnt,total,min,max)

    // adapt the agg changelog into ChangelogJoin's left side; right side
    // carries a label per bucket
    val left = aggOut.map(a => ChangelogJoin.Change[Long, Double, String](
      a.key, 0L, 0, a.kind, Some(a.total), None))
    val right = Seq(
      ChangelogJoin.Change[Long, Double, String](0L, -1L, 1, "+I", None, Some("b0")),
      ChangelogJoin.Change[Long, Double, String](1L, -1L, 1, "+I", None, Some("b1")))
      .toDS()
    // seq -1 puts the right rows first so every agg change joins against them
    val joined = ChangelogJoin.join(left.union(right))

    // final aggregate over the JOIN's changelog: net total per label
    val net = joined.map(j => AggChange[String](j.right, 0L, j.kind, j.left))
    val fin = ChangelogAgg.agg(net).collect().toSeq
    // bucket 0 net: +I 10, -U 10, +U 6 → total 6; bucket 1: 2
    val byKey = fin.groupBy(_.key)
    val b0 = byKey("b0").last
    val b1 = byKey("b1").last
    assert(b0.total == 6.0 && b0.cnt == 1L, s"b0: $fin")
    assert(b1.total == 2.0 && b1.cnt == 1L, s"b1: $fin")
  }
}
