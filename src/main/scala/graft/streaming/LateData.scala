package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.StatefulOps.EvT

/** Late-data side output — reference WindowedStream#sideOutputLateData:186 +
  * WindowOperator's late-element path (WindowOperator.java, isElementLate):
  * elements whose timestamp is behind the operator's current watermark are
  * not silently dropped but routed to a tagged side output for auditing /
  * reprocessing.
  *
  * Spark's built-in windowed aggregation DROPS watermark-late rows with no
  * observable side channel. This operator recovers the reference semantics:
  * a single keyed pass tags every element on-time/late against the
  * per-batch watermark (`GroupState.getCurrentWatermarkMs` — exactly the
  * operator-local watermark the reference consults), so the stream splits
  * into `filter(!is_late)` → windowed agg and `filter(is_late)` → late sink
  * without a second source scan.
  *
  * Scale: stateless per element (no stored state — the watermark is ambient
  * per batch), so the only cost is the keyed exchange the downstream
  * windowed aggregate needs anyway.
  */
object LateData {

  case class TaggedEv(event_id: Long, user_id: Long, value: Double,
      ts: java.sql.Timestamp, is_late: Boolean)

  /** Input must carry a watermark on `ts` (withWatermark upstream). */
  def tagLate(ds: Dataset[EvT]): Dataset[TaggedEv] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EvT],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          val wm = state.getCurrentWatermarkMs()
          it.map(e => TaggedEv(e.event_id, e.user_id, e.value, e.ts,
            is_late = e.ts.getTime < wm))
      }
  }
}
