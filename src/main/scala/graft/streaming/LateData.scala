package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import graft.streaming.StatefulOps.EvT

/** Late-data side output — reference WindowedStream#sideOutputLateData:186 +
  * WindowOperator's late-element path (WindowOperator.java, isElementLate /
  * isWindowLate): an element goes to the side output only when EVERY window
  * it is assigned to is already closed (window end + allowedLateness behind
  * the operator's current watermark) — NOT merely when its own timestamp is
  * behind the watermark. The distinction matters: an element whose ts is
  * behind the watermark but whose window is still open is accepted by the
  * reference's window operator, so tagging it late and filtering it out
  * would UNDERCOUNT still-open windows (the r12 review's finding 3).
  *
  * Spark's built-in windowed aggregation DROPS watermark-late rows with no
  * observable side channel. This operator recovers the reference semantics:
  * a single keyed pass tags every element against the per-batch watermark
  * (`GroupState.getCurrentWatermarkMs` — exactly the operator-local
  * watermark the reference consults), so the stream splits into
  * `filter(!is_late)` → windowed agg and `filter(is_late)` → late sink
  * without a second source scan, and the on-time half feeds Spark's
  * windowed aggregate with EXACTLY the rows that aggregate would keep.
  *
  * Lateness convention: a window [start, end) is late when
  * `end + allowedLateness <= watermark` — Spark's own eviction boundary
  * for streaming window state. The reference tests
  * `window.maxTimestamp() + lateness <= wm` with maxTimestamp = end − 1 ms;
  * the 1 ms skew is Spark's half-open-window convention and is what keeps
  * the `filter(!is_late)` half exactly congruent with the downstream Spark
  * aggregate.
  *
  * Scale: stateless per element (no stored state — the watermark is ambient
  * per batch), so the only cost is the keyed exchange the downstream
  * windowed aggregate needs anyway.
  */
object LateData {

  case class TaggedEv(event_id: Long, user_id: Long, value: Double,
      ts: java.sql.Timestamp, is_late: Boolean)

  /** Tag each element against the windows it feeds. Input must carry a
    * watermark on `ts` (withWatermark upstream). `windowSec` is the
    * downstream window size; `slideSec` its slide (defaults to tumbling);
    * `allowedLatenessSec` the reference's allowedLateness. An element is
    * late iff its LAST containing window — the one ending latest — is
    * closed: `lastWindowEnd + allowedLateness <= watermark` (every other
    * window it belongs to ends earlier still). */
  def tagLate(ds: Dataset[EvT], windowSec: Long, slideSec: Long = 0L,
      allowedLatenessSec: Long = 0L): Dataset[TaggedEv] = {
    require(windowSec > 0, s"windowSec must be positive, got $windowSec")
    val sizeMs = windowSec * 1000L
    val slideMs = (if (slideSec > 0) slideSec else windowSec) * 1000L
    val latenessMs = allowedLatenessSec * 1000L
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EvT],
         state: org.apache.spark.sql.streaming.GroupState[Boolean]) =>
          val wm = state.getCurrentWatermarkMs()
          it.map { e =>
            // last window containing ts starts at floor(ts/slide)*slide
            // (window starts are the slide grid); it ends sizeMs later
            val t = e.ts.getTime
            val lastEnd = Math.floorDiv(t, slideMs) * slideMs + sizeMs
            TaggedEv(e.event_id, e.user_id, e.value, e.ts,
              is_late = lastEnd + latenessMs <= wm)
          }
      }
  }
}
