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
    val st0 = JoinState[String, String](Nil, Nil)
    val (e1, st1) = applyChange(st0, 0, "+I", Some("l1"), None)
    assert(e1.isEmpty) // right side empty: nothing to join yet
    val (e2, st2) = applyChange(st1, 1, "+I", None, Some("r1"))
    assert(e2 == Seq(("+I", "l1", "r1")))
    val (e3, st3) = applyChange(st2, 0, "-U", Some("l1"), None)
    assert(e3 == Seq(("-U", "l1", "r1"))) // retraction joins against r1
    val (e4, st4) = applyChange(st3, 0, "+U", Some("l2"), None)
    assert(e4 == Seq(("+U", "l2", "r1")))
    val (e5, _) = applyChange(st4, 1, "-D", None, Some("r1"))
    assert(e5 == Seq(("-D", "l2", "r1")))
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

  test("multiset semantics: duplicate rows join with multiplicity") {
    import ChangelogJoin.{applyChange, JoinState}
    val st0 = JoinState[String, String](Nil, Nil)
    val (_, st1) = applyChange(st0, 0, "+I", Some("l"), None)
    val (_, st2) = applyChange(st1, 0, "+I", Some("l"), None) // count 2
    val (e, _) = applyChange(st2, 1, "+I", None, Some("r"))
    assert(e == Seq(("+I", "l", "r"), ("+I", "l", "r")))
  }
}
