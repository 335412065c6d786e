package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Multi-timer keyed process function — the reference's KeyedProcessFunction
  * with N event-time timers per key (flink-streaming-java/.../functions/
  * KeyedProcessFunction.java + runtime InternalTimerServiceImpl.java, which
  * keeps a per-key timer heap and fires timers in timestamp order as the
  * watermark advances).
  *
  * Spark's GroupState exposes exactly ONE timeout per key
  * (setTimeoutTimestamp). This op recovers the full timer service by keeping
  * a sorted timer list alongside the user state and pointing the single
  * Spark timeout at the EARLIEST pending timer, so the group is woken even
  * when no data arrives for its key. Per invocation, in watermark order:
  *
  *   1. fire every timer ≤ watermark (due since the previous batch),
  *   2. process this batch's elements (which may register/delete timers),
  *   3. fire timers the elements registered that are already due.
  *
  * Callbacks are pure: (key, input, state, ctx) → (newState, emitted).
  * When both user state and timers are gone the group's state is removed.
  *
  * Scale: state per key = user state + pending-timer list; the timer list is
  * bounded by what the callback registers (the ops below keep ≤ 1 timer per
  * buffered row). Firing is O(due timers) per batch — identical asymptotics
  * to the reference's timer heap.
  */
object TimerOps {

  final case class TimerState[S](user: Option[S], timers: List[Long])

  trait TimerCtx {
    def registerTimer(tsMs: Long): Unit
    def deleteTimer(tsMs: Long): Unit
    def watermarkMs: Long
  }

  def processWithTimers[K, I, S, O](ds: Dataset[I])(
      keyOf: I => K, orderOf: I => Long)(
      onElement: (K, I, Option[S], TimerCtx) => (Option[S], Seq[O]),
      onTimer: (K, Long, Option[S], TimerCtx) => (Option[S], Seq[O]))(
      implicit ek: Encoder[K], es: Encoder[TimerState[S]], eo: Encoder[O])
      : Dataset[O] =
    processWithTimersBy[K, I, S, O, Long](ds)(keyOf, orderOf)(onElement, onTimer)

  /** [[processWithTimers]] with a COMPOSITE within-batch ordering key —
    * for operators whose per-batch processing order needs tie-breaks beyond
    * a single Long (e.g. (ts, side, id)), matching the reference's
    * deterministic ordered firing at equal timestamps. */
  def processWithTimersBy[K, I, S, O, B: Ordering](ds: Dataset[I])(
      keyOf: I => K, orderOf: I => B)(
      onElement: (K, I, Option[S], TimerCtx) => (Option[S], Seq[O]),
      onTimer: (K, Long, Option[S], TimerCtx) => (Option[S], Seq[O]))(
      implicit ek: Encoder[K], es: Encoder[TimerState[S]], eo: Encoder[O])
      : Dataset[O] =
    ds.groupByKey(keyOf)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, it: Iterator[I],
         state: org.apache.spark.sql.streaming.GroupState[TimerState[S]]) =>
          val st0 = state.getOption.getOrElse(TimerState[S](None, Nil))
          var user = st0.user
          val timers = scala.collection.mutable.SortedSet[Long](st0.timers: _*)
          val out = Seq.newBuilder[O]
          val wm = state.getCurrentWatermarkMs()
          val ctx = new TimerCtx {
            override def registerTimer(tsMs: Long): Unit = timers += tsMs
            override def deleteTimer(tsMs: Long): Unit = timers -= tsMs
            override def watermarkMs: Long = wm
          }
          def drainDue(): Unit =
            while (timers.nonEmpty && timers.head <= wm) {
              val t = timers.head
              timers -= t
              val (u2, o) = onTimer(key, t, user, ctx)
              user = u2
              out ++= o
            }
          drainDue() // timers due since the last batch fire BEFORE new data
          if (!state.hasTimedOut)
            it.toSeq.sortBy(orderOf).foreach { i =>
              val (u2, o) = onElement(key, i, user, ctx)
              user = u2
              out ++= o
            }
          drainDue() // elements may have registered already-due timers
          if (user.isEmpty && timers.isEmpty) state.remove()
          else {
            state.update(TimerState(user, timers.toList))
            // wake this key when its earliest timer comes due, with or
            // without data (all remaining timers are > wm after drainDue)
            timers.headOption.foreach(state.setTimeoutTimestamp)
          }
          out.result().iterator
      }
}
