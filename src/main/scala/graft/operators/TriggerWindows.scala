package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Custom window triggers + evictors — reference flink-streaming-java/.../api/
  * windowing/triggers/ (CountTrigger.java, DeltaTrigger.java,
  * PurgingTrigger.java) and evictors/ (CountEvictor.java, DeltaEvictor.java,
  * TimeEvictor.java), driving a GlobalWindows-style keyed buffer exactly like
  * the reference's WindowOperator with a custom trigger.
  *
  * The op is one flatMapGroupsWithState (works identically in batch and
  * micro-batch streaming): per key it buffers elements, consults the trigger
  * on each element, applies the evictor at fire time, and emits one row per
  * firing. Flink's sliding count window IS this composition —
  * `countWindow(size, slide)` = GlobalWindows + CountTrigger(slide) +
  * CountEvictor(size) (flink-streaming-java KeyedStream.countWindow) — so
  * [[countWindow]] below is the verbatim mapping.
  *
  * Scale: per-key state is the element buffer, bounded by
  * (evictor size + trigger period) after each fire — the same bound the
  * reference's evicting window state has. Keys shuffle once; no other
  * exchange.
  */
object TriggerWindows {

  sealed trait TriggerResult
  object TriggerResult {
    case object Continue extends TriggerResult
    case object Fire extends TriggerResult
    case object FireAndPurge extends TriggerResult
    case object Purge extends TriggerResult
  }

  /** Decides, per element, whether the window fires. `sinceFire` counts
    * elements since the last firing; `lastFired` is the element that caused
    * it (the DeltaTrigger datum). */
  trait Trigger[E] extends Serializable {
    def onElement(e: E, sinceFire: Long, lastFired: Option[E]): TriggerResult
  }

  /** Fire every `n` elements (reference CountTrigger.java:36). */
  final case class CountTrigger[E](n: Long) extends Trigger[E] {
    override def onElement(e: E, sinceFire: Long, lastFired: Option[E]): TriggerResult =
      if (sinceFire >= n) TriggerResult.Fire else TriggerResult.Continue
  }

  /** Fire when `delta(lastFired, current) > threshold` (reference
    * DeltaTrigger.java:40); the first element always fires to seed the
    * datum, matching the reference's null-state behavior. */
  final case class DeltaTrigger[E](threshold: Double, delta: (E, E) => Double)
      extends Trigger[E] {
    override def onElement(e: E, sinceFire: Long, lastFired: Option[E]): TriggerResult =
      lastFired match {
        case Some(lf) =>
          if (delta(lf, e) > threshold) TriggerResult.Fire else TriggerResult.Continue
        case None => TriggerResult.Fire
      }
  }

  /** Wrap a trigger so every FIRE purges the window (reference
    * PurgingTrigger.java:33). */
  final case class PurgingTrigger[E](inner: Trigger[E]) extends Trigger[E] {
    override def onElement(e: E, sinceFire: Long, lastFired: Option[E]): TriggerResult =
      inner.onElement(e, sinceFire, lastFired) match {
        case TriggerResult.Fire => TriggerResult.FireAndPurge
        case r => r
      }
  }

  /** Trims the buffer before emission (reference Evictor.java evictBefore). */
  trait Evictor[E] extends Serializable {
    def evict(buffer: Seq[E]): Seq[E]
  }

  /** Keep the newest `keep` elements (reference CountEvictor.java:48). */
  final case class CountEvictor[E](keep: Int) extends Evictor[E] {
    override def evict(buffer: Seq[E]): Seq[E] = buffer.takeRight(keep)
  }

  /** Keep elements within `spanMs` of the newest (reference
    * TimeEvictor.java:51). */
  final case class TimeEvictor[E](spanMs: Long, tsOf: E => Long) extends Evictor[E] {
    override def evict(buffer: Seq[E]): Seq[E] = {
      if (buffer.isEmpty) buffer
      else {
        val maxTs = buffer.map(tsOf).max
        buffer.filter(e => tsOf(e) >= maxTs - spanMs)
      }
    }
  }

  /** Drop elements whose delta to the newest exceeds `threshold` (reference
    * DeltaEvictor.java:47). */
  final case class DeltaEvictor[E](threshold: Double, delta: (E, E) => Double)
      extends Evictor[E] {
    override def evict(buffer: Seq[E]): Seq[E] =
      buffer.lastOption.fold(buffer)(newest =>
        buffer.filter(e => delta(e, newest) < threshold))
  }

  final case class WinState[E](buf: List[E], sinceFire: Long, total: Long,
      lastFired: Option[E])

  /** The windowing operator: keyed global window + trigger (+ evictor).
    * `emit(key, windowElements, totalSeen)` builds one output row per fire.
    * Elements are processed in `orderOf` order within each invocation. */
  def triggeredWindow[K, E, O](ds: Dataset[E])(keyOf: E => K, orderOf: E => Long)(
      trigger: Trigger[E], evictor: Option[Evictor[E]])(
      emit: (K, Seq[E], Long) => O)(
      implicit ek: Encoder[K], es: Encoder[WinState[E]], eo: Encoder[O]): Dataset[O] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[E],
         state: org.apache.spark.sql.streaming.GroupState[WinState[E]]) =>
          var st = state.getOption.getOrElse(WinState[E](Nil, 0L, 0L, None))
          val out = Seq.newBuilder[O]
          it.toSeq.sortBy(orderOf).foreach { e =>
            // buffer is kept reversed (prepend); restored to arrival order
            // at fire time
            var buf = e :: st.buf
            var since = st.sinceFire + 1
            val total = st.total + 1
            var lastFired = st.lastFired
            trigger.onElement(e, since, lastFired) match {
              case TriggerResult.Continue => ()
              case fire @ (TriggerResult.Fire | TriggerResult.FireAndPurge) =>
                val arrival = buf.reverse
                val window = evictor.fold(arrival: Seq[E])(_.evict(arrival))
                out += emit(key, window, total)
                // Fire keeps only the evicted window — the bounded-buffer
                // invariant that makes count-sliding windows O(size) state;
                // FireAndPurge drops it all
                buf = if (fire == TriggerResult.Fire) window.reverse.toList else Nil
                since = 0L
                lastFired = Some(e)
              case TriggerResult.Purge =>
                buf = Nil
                since = 0L
            }
            st = WinState(buf, since, total, lastFired)
          }
          state.update(st)
          out.result().iterator
      }

  /** Flink's `countWindow(size, slide)` — sliding count window (reference
    * KeyedStream.java countWindow → GlobalWindows + CountTrigger(slide) +
    * CountEvictor(size), also CountSlidingWindowAssigner in the blink
    * runtime). */
  def countWindow[K, E, O](ds: Dataset[E])(keyOf: E => K, orderOf: E => Long)(
      size: Int, slide: Int)(emit: (K, Seq[E], Long) => O)(
      implicit ek: Encoder[K], es: Encoder[WinState[E]], eo: Encoder[O]): Dataset[O] =
    triggeredWindow(ds)(keyOf, orderOf)(
      CountTrigger[E](slide), Some(CountEvictor[E](size)))(emit)

  // ---- transformWithState runtime (r12 migration) ----

  /** [[triggeredWindow]]'s exact fold on the transformWithState runtime.
    * The element buffer is native ListState: a no-fire batch APPENDS its
    * rows (one `appendList`) where fMGWS re-serialized the whole
    * WinState blob per touched batch, and a purge writes the (evictor-
    * bounded) survivor window only. Scalars (sinceFire, totalSeen) and
    * the DeltaTrigger datum live in their own ValueStates. Same bounded-
    * buffer invariant: Fire keeps only the evicted window, FireAndPurge
    * and Purge drop it all. */
  private[graft] class TriggeredWindowProcessor[K, E, O](
      trigger: Trigger[E], evictor: Option[Evictor[E]],
      orderOf: E => Long, emit: (K, Seq[E], Long) => O, ee: Encoder[E])(
      implicit ct: scala.reflect.ClassTag[E])
      extends org.apache.spark.sql.streaming.StatefulProcessor[K, E, O] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var buf: streaming.ListState[E] = _
    @transient private var meta: streaming.ValueState[(Long, Long)] = _
    @transient private var fired: streaming.ValueState[E] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      buf = getHandle.getListState[E]("buf", ee, streaming.TTLConfig.NONE)
      meta = getHandle.getValueState[(Long, Long)]("meta",
        Encoders.product[(Long, Long)], streaming.TTLConfig.NONE)
      fired = getHandle.getValueState[E]("fired", ee, streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[E],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[O] = {
      val batch = rows.toArray.sortBy(orderOf)
      if (batch.isEmpty) return Iterator.empty
      val existing = buf.get().toVector // ListState preserves arrival order
      var vbuf = existing
      var (since, total) = if (meta.exists()) meta.get() else (0L, 0L)
      var lastFired = if (fired.exists()) Some(fired.get()) else None
      var rewrote = false // a fire/purge truncated the buffer mid-batch
      val out = Seq.newBuilder[O]
      batch.foreach { e =>
        vbuf = vbuf :+ e
        since += 1; total += 1
        trigger.onElement(e, since, lastFired) match {
          case TriggerResult.Continue => ()
          case fire @ (TriggerResult.Fire | TriggerResult.FireAndPurge) =>
            val window = evictor.fold(vbuf: Seq[E])(_.evict(vbuf))
            out += emit(key, window, total)
            vbuf = if (fire == TriggerResult.Fire) window.toVector else Vector.empty
            since = 0L
            lastFired = Some(e)
            rewrote = true
          case TriggerResult.Purge =>
            vbuf = Vector.empty
            since = 0L
            rewrote = true
        }
      }
      // write-back: appends-only batches cost one appendList; a truncated
      // buffer writes its (evictor-bounded) survivors once
      if (!rewrote) buf.appendList(batch)
      else if (vbuf.isEmpty) buf.clear()
      else { buf.clear(); buf.appendList(vbuf.toArray) }
      meta.update((since, total))
      lastFired.foreach(fired.update)
      out.result().iterator
    }
  }

  /** [[triggeredWindow]]'s API shape on the transformWithState runtime;
    * works in batch too (RocksDB hardwired there), streaming callers get
    * the provider discipline. */
  def triggeredWindowTws[K, E, O](ds: Dataset[E])(keyOf: E => K, orderOf: E => Long)(
      trigger: Trigger[E], evictor: Option[Evictor[E]])(
      emit: (K, Seq[E], Long) => O)(
      implicit ek: Encoder[K], ee: Encoder[E], eo: Encoder[O],
      ct: scala.reflect.ClassTag[E]): Dataset[O] = {
    graft.streaming.TwsOps.ensureStateCoordinator(ds.sparkSession)
    if (ds.isStreaming)
      graft.streaming.TwsOps.requireRocksDb(ds.sparkSession, "triggeredWindowTws")
    ds.groupByKey(keyOf)
      .transformWithState(
        new TriggeredWindowProcessor[K, E, O](trigger, evictor, orderOf, emit, ee),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** [[countWindow]] on the transformWithState runtime. */
  def countWindowTws[K, E, O](ds: Dataset[E])(keyOf: E => K, orderOf: E => Long)(
      size: Int, slide: Int)(emit: (K, Seq[E], Long) => O)(
      implicit ek: Encoder[K], ee: Encoder[E], eo: Encoder[O],
      ct: scala.reflect.ClassTag[E]): Dataset[O] =
    triggeredWindowTws(ds)(keyOf, orderOf)(
      CountTrigger[E](slide), Some(CountEvictor[E](size)))(emit)

  // ---- oracle query

  case class EvRow(event_id: Long, user_id: Long, value: Double)
  case class CountWinOut(user_id: Long, fire_at: Long, avg10: Double)

  /** Sliding count window per user: every 5th event, average of the last 10
    * — CountTrigger(5) + CountEvictor(10). The oracle is the ROWS-frame
    * window average sampled at every 5th row. */
  val qCountTriggerWindow: Q = Q(
    "q_count_trigger_window",
    (s, dir) => graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      // r12: the TwS runtime — per-element E rows in ListState need no
      // generic WinState encoder at all (the fMGWS path used kryo to dodge
      // a ~5 s TypeTag derivation for the nested state blob)
      val ev = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id", $"value").as[EvRow]
      countWindowTws[Long, EvRow, CountWinOut](ev)(_.user_id, _.event_id)(10, 5) {
        (uid, window, total) =>
          val avg = window.map(_.value).sum / window.size
          CountWinOut(uid, total,
            BigDecimal(avg).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF().orderBy($"user_id", $"fire_at")
    },
    Some("""SELECT user_id, rn AS fire_at,
           |       round(avg(value) OVER (PARTITION BY user_id ORDER BY rn
           |         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 6) AS avg10
           |FROM (SELECT user_id, value,
           |        row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           |      FROM events)
           |QUALIFY rn % 5 = 0
           |ORDER BY user_id, fire_at""".stripMargin))

  // ---- continuous event-time trigger (early fire)

  case class CetWin(start: Long, cnt: Long, total: Double)
  case class CetState(wins: List[CetWin])
  case class CetOut(key: Long, window_start: Long, cnt: Long, total: Double,
      is_final: Boolean)

  /** ContinuousEventTimeTrigger (reference ContinuousEventTimeTrigger.java:
    * 39): an accumulating tumbling event-time window that ALSO fires every
    * `intervalMs` of event time as the watermark advances — partial results
    * before the window's final fire (the early-fire half of the reference's
    * early/late firing support, SURVEY §2.1). Built on the multi-timer
    * service: every window registers its end timer; interval boundaries
    * re-register themselves while any window is live. Emits
    * (key, window_start, agg, is_final); the window's state is purged on
    * its final fire. */
  def continuousEventTimeWindow(
      ds: Dataset[graft.streaming.StatefulOps.EvT],
      windowMs: Long, intervalMs: Long): Dataset[CetOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    graft.streaming.TimerOps.processWithTimers[Long,
        graft.streaming.StatefulOps.EvT, CetState, CetOut](ds)(
      _.user_id, _.event_id)(
      onElement = (_, e, st, ctx) => {
        val ts = e.ts.getTime
        val ws = ts - java.lang.Math.floorMod(ts, windowMs)
        // lateness guard (reference: allowed lateness 0 — the trigger drops
        // elements of already-finalized windows): without it a late row
        // would RE-CREATE a purged window and duplicate its final fire
        if (ws + windowMs <= ctx.watermarkMs) (st, Nil)
        else {
          val wins = st.map(_.wins).getOrElse(Nil)
          val cur = wins.find(_.start == ws).getOrElse(CetWin(ws, 0L, 0.0))
          val upd = CetWin(ws, cur.cnt + 1, cur.total + e.value)
          ctx.registerTimer(ws + windowMs) // final fire
          val nextBoundary = ts - java.lang.Math.floorMod(ts, intervalMs) + intervalMs
          if (nextBoundary < ws + windowMs) ctx.registerTimer(nextBoundary)
          (Some(CetState(upd :: wins.filterNot(_.start == ws))), Nil)
        }
      },
      onTimer = (k, t, st, ctx) => {
        val wins = st.map(_.wins).getOrElse(Nil)
        val (closed, live) = wins.partition(w => w.start + windowMs <= t)
        val finals = closed.sortBy(_.start)
          .map(w => CetOut(k, w.start / 1000, w.cnt, w.total, is_final = true))
        val partials = live.filter(_.start <= t).sortBy(_.start)
          .map(w => CetOut(k, w.start / 1000, w.cnt, w.total, is_final = false))
        // chain the NEXT early-fire boundary ALIGNED to the interval grid:
        // re-arming blindly from a window-END timer would drift the chain
        // off-grid whenever windowMs is not a multiple of intervalMs
        if (live.nonEmpty)
          ctx.registerTimer(t - java.lang.Math.floorMod(t, intervalMs) + intervalMs)
        (if (live.isEmpty) None else Some(CetState(live)), finals ++ partials)
      })
  }

  // ---- dynamic-gap session windows

  case class SessEv(user_id: Long, ts_us: Long, value: Double, gap_us: Long)
  case class SessOut(sess_start: Long, user_id: Long, cnt: Long, total: Double)

  /** Dynamic-gap session windows — reference
    * DynamicEventTimeSessionWindows.java:43 (per-element
    * SessionWindowTimeGapExtractor): each element extends its session by its
    * OWN gap (here: purchases keep sessions alive 30 min, everything else
    * 10 min). A new session starts when an element's ts reaches the running
    * max session end. Oracle: cumulative-max gaps-and-islands. */
  val qSessionDynamic: Q = Q(
    "q_session_dynamic",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("ts_us"), $"value",
          when($"event_type" === "purchase", 30L * 60 * 1000000)
            .otherwise(10L * 60 * 1000000).as("gap_us"))
        .as[SessEv]
      ev.groupByKey(_.user_id)
        // secondary sort in the shuffle: the gap fold is sequential, so the
        // group iterator streams through without materializing
        .flatMapSortedGroups($"ts_us") { (uid: Long, sorted: Iterator[SessEv]) =>
          val out = Seq.newBuilder[SessOut]
          var curEnd = Long.MinValue
          var start = 0L; var cnt = 0L; var total = 0.0
          def close(): Unit = if (cnt > 0) {
            out += SessOut(start / 1000000, uid, cnt,
              BigDecimal(total).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble)
          }
          sorted.foreach { e =>
            if (e.ts_us >= curEnd) { // window end is exclusive
              close()
              start = e.ts_us; cnt = 0L; total = 0.0
              curEnd = Long.MinValue
            }
            cnt += 1
            total += e.value
            curEnd = math.max(curEnd, e.ts_us + e.gap_us)
          }
          close()
          out.result().iterator
        }
        .toDF().orderBy($"user_id", $"sess_start")
    },
    Some("""WITH e AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
           |              ELSE INTERVAL 10 MINUTE END AS gap
           |  FROM events),
           |b AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN max(ts + gap) OVER w IS NULL
           |              OR max(ts + gap) OVER w <= ts THEN 1 ELSE 0 END AS brk
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts
           |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |s AS (
           |  SELECT user_id, ts, value,
           |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                        ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM b)
           |SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start, user_id,
           |       count(*) AS cnt, round(sum(value), 2) AS total
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, sess_start""".stripMargin))

  /** Dynamic-gap sessions on a STREAM via Spark's native session_window
    * with a per-row gap expression — the same semantics as the hand-rolled
    * fold above, checked against the same gaps-and-islands oracle, so the
    * two implementations cross-validate each other. */
  val qSessionDynamicStream: Q = Q(
    "q_session_dynamic_stream",
    (s, dir) => graft.streaming.StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      val gap = when(col("event_type") === "purchase", "30 minutes")
        .otherwise("10 minutes")
      val agg = graft.streaming.StreamingOps.streamTable(s, dir, "events")
        .groupBy(session_window($"ts", gap), $"user_id")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .select(unix_timestamp($"session_window.start").as("sess_start"),
          $"user_id", $"cnt", $"total")
      graft.streaming.StreamingOps
        .runToMemory(s, agg, "complete", "graft_session_dynamic_stream")
        .orderBy($"user_id", $"sess_start")
    },
    Some("""WITH e AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN event_type = 'purchase' THEN INTERVAL 30 MINUTE
           |              ELSE INTERVAL 10 MINUTE END AS gap
           |  FROM events),
           |b AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN max(ts + gap) OVER w IS NULL
           |              OR max(ts + gap) OVER w <= ts THEN 1 ELSE 0 END AS brk
           |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts
           |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
           |s AS (
           |  SELECT user_id, ts, value,
           |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                        ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM b)
           |SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start, user_id,
           |       count(*) AS cnt, round(sum(value), 2) AS total
           |FROM s GROUP BY user_id, sid
           |ORDER BY user_id, sess_start""".stripMargin))

  val all: Seq[Q] = Seq(qCountTriggerWindow, qSessionDynamic, qSessionDynamicStream)
}
