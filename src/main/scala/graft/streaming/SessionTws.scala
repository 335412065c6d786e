package graft.streaming

import graft.Q
import graft.operators.TriggerWindows.SessOut
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.{col, unix_micros, when}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Merging session windows on transformWithState — the reference's
  * merge-on-arrival session machinery (flink-streaming-java/.../windowing/
  * assigners/DynamicEventTimeSessionWindows.java:43 assigns each element
  * its own [ts, ts+gap) proto-window; flink-runtime window operator's
  * MergingWindowSet folds overlapping windows on arrival;
  * EventTimeTrigger fires a window when the WATERMARK passes its end).
  *
  * Spark's native `session_window` already serves the oracle queries
  * (q_stream_session / q_session_dynamic_stream); this operator re-expresses
  * the MERGE + TRIGGER protocol on the current arbitrary-state API so the
  * engine carries the reference's window-internals shape too — and, unlike
  * the hand-rolled fMGWS folds, it emits CLOSED sessions in append mode
  * driven by native event-time timers:
  *  - per key, open sessions live in ListState as disjoint [start, end)
  *    intervals carrying (cnt, total) partial aggregates — state is
  *    O(open sessions), never O(events);
  *  - an arrival merges interval-style: one bridging event can fuse TWO
  *    previously separate open sessions (the MergingWindowSet case the
  *    per-element fold cannot express);
  *  - ONE armed event-time timer per key at the earliest open end (the
  *    [[TwsOps]] min-timer protocol). A merge can only move ends LATER;
  *    the early timer then emits nothing and re-arms at the next real
  *    minimum — fire-and-re-arm instead of timer deletion per merge
  *    (the reference deletes the merged window's trigger; both protocols
  *    fire O(1) timers per close);
  *  - a firing closes every session whose end <= watermark — final by the
  *    watermark contract, since an extension would need an event with
  *    ts < end <= wm.
  */
object SessionTws {

  /** One open session: end-exclusive interval + running aggregate. */
  case class SessWin(startUs: Long, endUs: Long, cnt: Long, total: Double)

  /** Input row: dynamic per-element gap + the watermark column. */
  case class SessEvW(user_id: Long, ts_us: Long, value: Double, gap_us: Long,
      ts: java.sql.Timestamp)

  /** Interval-merge `wins` (any order) into disjoint sessions: sort by
    * start, fold; end-exclusive, so touching intervals (a.end == b.start)
    * do NOT merge — the "ts >= curEnd starts a new session" rule of the
    * batch fold and the gaps-and-islands oracle. */
  private[graft] def merge(wins: Seq[SessWin]): Vector[SessWin] = {
    val sorted = wins.sortBy(w => (w.startUs, w.endUs))
    val out = Vector.newBuilder[SessWin]
    var cur: SessWin = null
    sorted.foreach { w =>
      if (cur == null) cur = w
      else if (w.startUs < cur.endUs)
        cur = SessWin(cur.startUs, math.max(cur.endUs, w.endUs),
          cur.cnt + w.cnt, cur.total + w.total)
      else { out += cur; cur = w }
    }
    if (cur != null) out += cur
    out.result()
  }

  class SessionProcessor
      extends StatefulProcessor[Long, SessEvW, SessOut] {
    @transient private var sessions: ListState[SessWin] = _
    @transient private var armed: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sessions = getHandle.getListState[SessWin]("sessions",
        Encoders.product[SessWin], TTLConfig.NONE)
      armed = getHandle.getValueState[Long]("armed", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** ms timer tick that guarantees wmUs >= endUs when it fires. */
    private def endMs(endUs: Long): Long = math.ceil(endUs / 1000.0).toLong

    override def handleInputRows(key: Long, rows: Iterator[SessEvW],
        timerValues: TimerValues): Iterator[SessOut] = {
      val protos = rows.map(e =>
        SessWin(e.ts_us, e.ts_us + e.gap_us, 1L, e.value)).toVector
      if (protos.isEmpty) return Iterator.empty
      val existing = sessions.get().toVector
      // at least one proto joined, so the merged set always differs from
      // the stored one — write unconditionally (no diff to exploit here)
      val merged = merge(existing ++ protos)
      sessions.put(merged.toArray)
      val minEndMs = merged.iterator.map(w => endMs(w.endUs)).min
      if (TwsOps.dueOnArrival(getHandle, armed, minEndMs,
          timerValues.getCurrentWatermarkInMs()))
        // a fully-late event can open a session already behind the
        // watermark; a wm+1 timer would never fire on a stalled watermark
        // (r12 review) — close it inline
        drain(key, timerValues)
      else {
        // merges only move ends LATER; an early firing is a harmless no-op
        // that re-arms at the true minimum (see class doc)
        TwsOps.armEarlier(getHandle, armed, minEndMs,
          timerValues.getCurrentWatermarkInMs() + 1)
        Iterator.empty
      }
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessOut] =
      drain(key, timerValues)

    /** Close every session the watermark has passed; re-arm at the next
      * open end. Called from timer firings AND due-on-arrival. */
    private def drain(key: Long, timerValues: TimerValues): Iterator[SessOut] = {
      val wmUs = timerValues.getCurrentWatermarkInMs() * 1000
      val all = sessions.get().toVector
      val (closed, open) = all.partition(_.endUs <= wmUs)
      if (closed.nonEmpty) {
        if (open.isEmpty) sessions.clear() else sessions.put(open.toArray)
      }
      TwsOps.rearmAt(getHandle, armed,
        open.iterator.map(w => endMs(w.endUs)).minOption,
        timerValues.getCurrentWatermarkInMs() + 1)
      // raw totals: presentation rounding is the QUERY's business (the
      // sibling TwS operators emit raw aggregates too — r12 review)
      closed.sortBy(_.startUs).iterator.map(w =>
        SessOut(w.startUs / 1000000, key, w.cnt, w.total))
    }
  }

  /** The operator: keyed dynamic-gap events in → closed sessions out
    * (append mode, watermark-triggered). */
  def sessionTws(ds: org.apache.spark.sql.Dataset[SessEvW])
      : org.apache.spark.sql.Dataset[SessOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    implicit val enc: Encoder[SessOut] = Encoders.product[SessOut]
    TwsOps.ensureStateCoordinator(spark)
    if (ds.isStreaming) TwsOps.requireRocksDb(spark, "sessionTws")
    ds.groupByKey(_.user_id)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** q_tws_session: dynamic-gap sessions (purchases hold 30 min, others
    * 10 min — q_session_dynamic's gap extractor) on the merging TwS
    * runtime, append mode. Oracle = the same gaps-and-islands fold
    * RESTRICTED to sessions the final watermark closed (floor-ms watermark,
    * exactly the streaming emission rule): an island still open at the last
    * watermark is in-flight state, not output — the reference
    * EventTimeTrigger's own unbounded-stream behavior. */
  val qTwsSession: Q = Q(
    "q_tws_session",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      TwsOps.withRocksDb(s) {
        val in = StreamingOps.streamTable(s, dir, "events")
          .withWatermark("ts", "0 seconds")
          .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"),
            when(col("event_type") === "purchase", 30L * 60 * 1000000)
              .otherwise(10L * 60 * 1000000).as("gap_us"),
            col("ts"))
          .as[SessEvW]
        import org.apache.spark.sql.functions.round
        val out = sessionTws(in).toDF()
          .withColumn("total", round($"total", 2))
        StreamingOps.runToMemory(s, out, "append", "graft_tws_session")
          .orderBy($"user_id", $"sess_start")
      }
    },
    Some("""WITH e AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN event_type = 'purchase' THEN 30 * 60 * 1000000
           |              ELSE 10 * 60 * 1000000 END AS gap_us
           |  FROM events),
           |wm AS (SELECT (max(epoch_us(ts)) // 1000) * 1000 AS wm_us FROM events),
           |b AS (
           |  SELECT user_id, ts, value, gap_us,
           |         CASE WHEN max(epoch_us(ts) + gap_us) OVER w IS NULL
           |              OR max(epoch_us(ts) + gap_us) OVER w <= epoch_us(ts)
           |              THEN 1 ELSE 0 END AS brk
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts
           |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |s AS (
           |  SELECT user_id, ts, value, gap_us,
           |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                        ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM b)
           |SELECT CAST(min(epoch_us(ts)) // 1000000 AS BIGINT) AS sess_start, user_id,
           |       count(*) AS cnt, round(sum(value), 2) AS total
           |FROM s, wm
           |GROUP BY user_id, sid, wm_us
           |HAVING max(epoch_us(ts) + gap_us) <= wm_us
           |ORDER BY user_id, sess_start""".stripMargin))

  val all: Seq[Q] = Seq(qTwsSession)
}
