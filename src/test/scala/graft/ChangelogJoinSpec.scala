package graft

import graft.streaming.{StatefulOps, UpsertSink}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Changelog consumption — the "aggregate feeding a join" case SURVEY §1.2
  * flags: Spark's planner rejects a stateful agg feeding a stream-stream
  * join, and the reference handles it with retraction streams. Our mapping:
  * materialize the changelog (explicit row_kind), enrich each micro-batch
  * against the dim with a plain batch join inside foreachBatch, and maintain
  * the result table with keyed upserts/deletes — the retract-join recipe. */
class ChangelogJoinSpec extends GraftSpec {

  test("changelog topN joined to a dim stays consistent under retractions") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StatefulOps.Ev

    val dim = Map("t" -> "TYPE-T")
    val mem = MemoryStream[Ev]
    val changelog = StatefulOps.topNChangelog(mem.toDS()).toDF()

    // result table keyed by (event_type, rn); +I/+U upsert, -D delete,
    // -U ignored (always followed by a +U or -D for that rank)
    val state = new java.util.concurrent.ConcurrentHashMap[(String, Int), (Long, Double, String)]()
    val q = changelog.writeStream.outputMode("append").foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-batch enrichment join against the dim (batch join — legal)
        val enriched = batch.collect().map { r =>
          (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getDouble(4),
            dim.getOrElse(r.getString(0), "?"))
        }
        enriched.foreach { case (k, kind, rn, id, v, label) =>
          kind match {
            case "+I" | "+U" => state.put((k, rn), (id, v, label))
            case "-D" => state.remove((k, rn))
            case "-U" => // superseded within the same batch
          }
        }
    }.start()

    mem.addData(Ev(1, 1L, "t", 10.0, 1), Ev(2, 1L, "t", 20.0, 2))
    q.processAllAvailable()
    mem.addData(Ev(3, 1L, "t", 30.0, 3), Ev(4, 1L, "t", 5.0, 4))
    q.processAllAvailable()
    q.stop()

    import scala.jdk.CollectionConverters._
    val res = state.asScala.toMap
    // final top-3: 30 (id 3), 20 (id 2), 10 (id 1); id 4 never ranks
    assert(res == Map(
      ("t", 1) -> ((3L, 30.0, "TYPE-T")),
      ("t", 2) -> ((2L, 20.0, "TYPE-T")),
      ("t", 3) -> ((1L, 10.0, "TYPE-T"))))
  }
}
