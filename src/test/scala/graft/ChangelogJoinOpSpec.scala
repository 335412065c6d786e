package graft

import graft.streaming.ChangelogJoin
import graft.streaming.ChangelogJoin.{Change, JoinedChange}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** The first-class updating-input stream-stream join (reference
  * StreamingJoinOperator.java): retractions arriving across micro-batches
  * must keep the materialized join output equal to the join of the
  * materialized inputs. */
class ChangelogJoinOpSpec extends GraftSpec {

  private def materialize(rows: Seq[JoinedChange[Long, String, String]])
      : Map[(Long, String, String), Long] =
    rows.foldLeft(Map.empty[(Long, String, String), Long]) { (m, jc) =>
      val k = (jc.key, jc.left, jc.right)
      val d = if (jc.kind == "+I" || jc.kind == "+U") 1L else -1L
      val n = m.getOrElse(k, 0L) + d
      if (n == 0) m - k else m.updated(k, n)
    }

  test("pure core: emissions mirror the other side's live rows") {
    import ChangelogJoin.{applyChange, JoinState}
    val st0 = JoinState[String, String](Map.empty, Map.empty)
    val (e1, st1) = applyChange(st0, 0, "+I", Some("l1"), None)
    assert(e1.isEmpty) // right side empty: nothing to join yet
    val (e2, st2) = applyChange(st1, 1, "+I", None, Some("r1"))
    assert(e2.toSeq == Seq(("+I", "l1", "r1")))
    val (e3, st3) = applyChange(st2, 0, "-U", Some("l1"), None)
    assert(e3.toSeq == Seq(("-U", "l1", "r1"))) // retraction joins against r1
    val (e4, st4) = applyChange(st3, 0, "+U", Some("l2"), None)
    assert(e4.toSeq == Seq(("+U", "l2", "r1")))
    val (e5, _) = applyChange(st4, 1, "-D", None, Some("r1"))
    assert(e5.toSeq == Seq(("-D", "l2", "r1")))
  }

  test("emission iterators are snapshots: consuming after later changes is safe") {
    import ChangelogJoin.{applyChange, JoinState}
    val st0 = JoinState[String, String](Map.empty, Map("r1" -> 1L))
    // emit lazily against r1, then delete r1 BEFORE consuming the iterator
    val (lazyOut, st1) = applyChange(st0, 0, "+I", Some("l1"), None)
    val (_, st2) = applyChange(st1, 1, "-D", None, Some("r1"))
    assert(st2.right.isEmpty)
    assert(lazyOut.toSeq == Seq(("+I", "l1", "r1"))) // snapshot, not live view
  }

  test("retractions across three micro-batches keep the join consistent") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[Change[Long, String, String]]
    val joined = ChangelogJoin.join(mem.toDS())
    val emitted = scala.collection.mutable.ArrayBuffer[JoinedChange[Long, String, String]]()
    val q = joined.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[JoinedChange[Long, String, String]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()

    // batch 1: left v1 arrives, then right r1 → one +I pair
    mem.addData(
      Change(7L, 1, 0, "+I", Some("v1"), None),
      Change(7L, 2, 1, "+I", None, Some("r1")))
    q.processAllAvailable()
    // batch 2: left upserts v1 → v2 (retraction consumed against state
    // built in batch 1)
    mem.addData(
      Change(7L, 3, 0, "-U", Some("v1"), None),
      Change(7L, 4, 0, "+U", Some("v2"), None))
    q.processAllAvailable()
    // batch 3: right deletes r1, then inserts r2 → final pair (v2, r2)
    mem.addData(
      Change(7L, 5, 1, "-D", None, Some("r1")),
      Change(7L, 6, 1, "+I", None, Some("r2")))
    q.processAllAvailable()
    q.stop()

    val fin = materialize(emitted.toSeq)
    assert(fin == Map((7L, "v2", "r2") -> 1L))
    // and the intermediate history was a real changelog: v1 was retracted
    assert(emitted.exists(j => j.kind == "-U" && j.left == "v1"))
    assert(emitted.exists(j => j.kind == "-D" && j.right == "r1"))
  }

  test("transformWithState build: retractions across micro-batches keep the join consistent (MapState retract views)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    graft.streaming.TwsOps.withRocksDb(spark) {
      val mem = MemoryStream[Change[Long, String, String]]
      val joined = ChangelogJoin.joinTws(mem.toDS())
      val emitted = scala.collection.mutable.ArrayBuffer[JoinedChange[Long, String, String]]()
      val q = joined.writeStream.outputMode("append").foreachBatch {
        (batch: org.apache.spark.sql.Dataset[JoinedChange[Long, String, String]], _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }
          ()
      }.start()
      // the same three-batch retraction script as the fMGWS test above —
      // the multisets now live in named MapStates and must carry across
      // batch boundaries identically
      mem.addData(
        Change(7L, 1, 0, "+I", Some("v1"), None),
        Change(7L, 2, 1, "+I", None, Some("r1")))
      q.processAllAvailable()
      mem.addData(
        Change(7L, 3, 0, "-U", Some("v1"), None),
        Change(7L, 4, 0, "+U", Some("v2"), None))
      q.processAllAvailable()
      mem.addData(
        Change(7L, 5, 1, "-D", None, Some("r1")),
        Change(7L, 6, 1, "+I", None, Some("r2")))
      q.processAllAvailable()
      q.stop()
      val fin = materialize(emitted.toSeq)
      assert(fin == Map((7L, "v2", "r2") -> 1L), fin)
      assert(emitted.exists(j => j.kind == "-U" && j.left == "v1"), emitted)
      assert(emitted.exists(j => j.kind == "-D" && j.right == "r1"), emitted)
    }
  }

  test("multiset semantics: duplicate rows join with multiplicity") {
    import ChangelogJoin.{applyChange, JoinState}
    val st0 = JoinState[String, String](Map.empty, Map.empty)
    val (_, st1) = applyChange(st0, 0, "+I", Some("l"), None)
    val (_, st2) = applyChange(st1, 0, "+I", Some("l"), None) // count 2
    val (e, _) = applyChange(st2, 1, "+I", None, Some("r"))
    assert(e.toSeq == Seq(("+I", "l", "r"), ("+I", "l", "r")))
  }

  test("hot key: many distinct live rows stay O(1) per change (hash multiset)") {
    import ChangelogJoin.{applyChange, JoinState}
    // 10k distinct left rows under ONE key — the association-list state this
    // replaced was O(n) per change (O(n²) per batch); the Map multiset makes
    // this loop linear. The timed bound is generous but fails loudly if the
    // state ever regresses to a linear-scan structure.
    val t0 = System.nanoTime()
    var st = JoinState[String, String](Map.empty, Map.empty)
    (1 to 10000).foreach { i =>
      val (_, st1) = applyChange(st, 0, "+I", Some(s"l$i"), None)
      st = st1
    }
    assert(st.left.size == 10000)
    assert((System.nanoTime() - t0) < 5e9, "10k inserts under one key took >5s")
  }

  test("outer core: pads emit, retract on first match, restore on last unmatch") {
    import ChangelogJoin.{applyChangeOuter, JoinState}
    val st0 = JoinState[String, String](Map.empty, Map.empty)
    val (e1, st1) = applyChangeOuter(st0, 0, "+I", Some("l1"), None)
    assert(e1.toSeq == Seq(("+I", "l1", None))) // no match yet: null pad
    val (e2, st2) = applyChangeOuter(st1, 1, "+I", None, Some("r1"))
    // first match: the pad is RETRACTED before the pair lands
    assert(e2.toSeq == Seq(("-U", "l1", None), ("+I", "l1", Some("r1"))))
    val (e3, st3) = applyChangeOuter(st2, 1, "-D", None, Some("r1"))
    // last match gone: pair retracted, pad restored
    assert(e3.toSeq == Seq(("-D", "l1", Some("r1")), ("+U", "l1", None)))
    val (e4, _) = applyChangeOuter(st3, 0, "-D", Some("l1"), None)
    assert(e4.toSeq == Seq(("-D", "l1", None))) // left leaves while unmatched
  }

  test("outer multi-batch: materialized output equals left-outer of inputs") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Change[Long, String, String]]
    val joined = ChangelogJoin.joinOuter(mem.toDS())
    val emitted = scala.collection.mutable.ArrayBuffer[ChangelogJoin.OuterChange[Long, String, String]]()
    val q = joined.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[ChangelogJoin.OuterChange[Long, String, String]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()
    def net(): Map[(Long, String, Option[String]), Long] =
      emitted.foldLeft(Map.empty[(Long, String, Option[String]), Long]) { (m, jc) =>
        val k = (jc.key, jc.left, jc.right)
        val d = if (jc.kind == "+I" || jc.kind == "+U") 1L else -1L
        val n = m.getOrElse(k, 0L) + d
        if (n == 0) m - k else m.updated(k, n)
      }
    try {
      mem.addData(Change[Long, String, String](1L, 1, 0, "+I", Some("v1"), None))
      q.processAllAvailable()
      assert(net() == Map((1L, "v1", None) -> 1L)) // padded
      mem.addData(Change[Long, String, String](1L, 2, 1, "+I", None, Some("r1")))
      q.processAllAvailable()
      assert(net() == Map((1L, "v1", Some("r1")) -> 1L)) // pad swapped for pair
      mem.addData(Change[Long, String, String](1L, 3, 1, "-D", None, Some("r1")))
      q.processAllAvailable()
      assert(net() == Map((1L, "v1", None) -> 1L)) // pad restored
    } finally q.stop()
  }

  test("full-outer core: a change on one side retracts/restores the OTHER side's pads") {
    import ChangelogJoin.{applyChangeFull, JoinState}
    val st0 = JoinState[String, String](Map.empty, Map.empty)
    val (e1, st1) = applyChangeFull(st0, 1, "+I", None, Some("r1"))
    assert(e1.toSeq == Seq(("+I", None, Some("r1")))) // right-side pad
    val (e2, st2) = applyChangeFull(st1, 0, "+I", Some("l1"), None)
    // first left row: r1's pad retracts, the pair lands
    assert(e2.toSeq == Seq(("-U", None, Some("r1")), ("+I", Some("l1"), Some("r1"))))
    val (e3, _) = applyChangeFull(st2, 0, "-D", Some("l1"), None)
    // last left row gone: pair retracted, r1 padded again
    assert(e3.toSeq == Seq(("-D", Some("l1"), Some("r1")), ("+U", None, Some("r1"))))
  }

  test("right-outer by symmetry: unmatched RIGHT rows pad") {
    val sparkS = spark
    import sparkS.implicits._
    val changes = Seq(
      Change[Long, String, String](1L, 1, 1, "+I", None, Some("r1")), // right first
      Change[Long, String, String](1L, 2, 0, "+I", Some("l1"), None))
      .toDS()
    val out = ChangelogJoin.joinRightOuter(changes).collect().toSeq
    // right row pads while unmatched, then the pad retracts and the pair lands
    assert(out.map(o => (o.kind, o.left, o.right)) == Seq(
      ("+I", "r1", None),
      ("-U", "r1", None),
      ("+I", "r1", Some("l1"))))
  }

  test("idle-state TTL: expired keys forget their state (event-time timeout)") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val mem = MemoryStream[Change[Long, String, String]]
    // seq doubles as event-time millis under the TTL contract; watermark
    // rides a derived timestamp column (delay 0 → wm = max seen seq)
    val withWm = mem.toDS()
      .withColumn("__ts", timestamp_millis($"seq"))
      .withWatermark("__ts", "0 seconds")
      .as[Change[Long, String, String]]
    val joined = ChangelogJoin.join(withWm, idleTtlMs = Some(1000L))
    val emitted = scala.collection.mutable.ArrayBuffer[JoinedChange[Long, String, String]]()
    val q = joined.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[JoinedChange[Long, String, String]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()
    try {
      // left l1 arrives on key 1 (base offset keeps event time above the
      // initial watermark 0 — a row at wm would be dropped as late data)
      val base = 1000000000L
      mem.addData(Change[Long, String, String](1L, base, 0, "+I", Some("l1"), None))
      q.processAllAvailable()
      // traffic on ANOTHER key advances the watermark far past key 1's TTL
      // (base + 1000); the no-data timeout fires for key 1 and drops its state
      mem.addData(Change[Long, String, String](2L, base + 5000L, 0, "+I", Some("x"), None))
      q.processAllAvailable()
      mem.addData(Change[Long, String, String](2L, base + 6000L, 0, "+I", Some("y"), None)) // wm → base+5000
      q.processAllAvailable()
      // right r1 arrives on key 1 — the pre-TTL l1 must be GONE
      mem.addData(Change[Long, String, String](1L, base + 7000L, 1, "+I", None, Some("r1")))
      q.processAllAvailable()
    } finally q.stop()
    assert(!emitted.exists(j => j.key == 1L && j.left == "l1"),
      s"expired l1 still joined: $emitted")
  }

  test("idle TTL arms from the key's LAST activity: a late smaller-seq change cannot shorten it") {
    val sparkS = spark
    import sparkS.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Change[Long, String, String]]
    val withWm = mem.toDS()
      .withColumn("__ts", timestamp_millis($"seq"))
      .withWatermark("__ts", "0 seconds")
      .as[Change[Long, String, String]]
    val joined = ChangelogJoin.join(withWm, idleTtlMs = Some(5000L))
    val emitted = scala.collection.mutable.ArrayBuffer[JoinedChange[Long, String, String]]()
    val q = joined.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.Dataset[JoinedChange[Long, String, String]], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
    }.start()
    try {
      val base = 1000000000L
      // key 1's true last activity: seq base+10000 → expiry base+15000
      mem.addData(Change[Long, String, String](1L, base + 10000L, 0, "+I", Some("l1"), None))
      q.processAllAvailable()
      mem.addData(Change[Long, String, String](2L, base + 13000L, 0, "+I", Some("x"), None))
      q.processAllAvailable()
      // a LATE change for key 1 (seq below the key's last activity): the
      // old per-batch re-arm would move the expiry to base+14000 (or the
      // watermark) and drop the state before base+15000
      mem.addData(Change[Long, String, String](1L, base + 9000L, 0, "+I", Some("late"), None))
      q.processAllAvailable()
      mem.addData(Change[Long, String, String](2L, base + 14500L, 0, "+I", Some("y"), None))
      q.processAllAvailable()
      mem.addData(Change[Long, String, String](2L, base + 14600L, 0, "+I", Some("z"), None))
      q.processAllAvailable()
      // still before base+15000: the join state must be alive
      mem.addData(Change[Long, String, String](1L, base + 14800L, 1, "+I", None, Some("r1")))
      q.processAllAvailable()
    } finally q.stop()
    assert(emitted.exists(j => j.key == 1L && j.left == "l1" && j.right == "r1"),
      s"state expired early — l1×r1 missing from: $emitted")
  }
}
