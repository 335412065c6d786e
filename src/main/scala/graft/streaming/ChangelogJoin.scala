package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** First-class updating-input (retraction-consuming) stream-stream join —
  * the reference's StreamingJoinOperator (flink-table/flink-table-runtime-
  * blink/.../operators/join/stream/StreamingJoinOperator.java:1) with
  * retract-mode state views (state/JoinRecordStateViews.java).
  *
  * Spark's built-in stream-stream join only accepts append-only inputs; an
  * update-mode aggregate feeding a join is rejected by the planner (SURVEY
  * §1.2). This operator closes that gap: both inputs are CHANGELOGS (rows
  * tagged +I/+U/-U/-D), unioned into one keyed stream and processed by a
  * single `flatMapGroupsWithState` that keeps BOTH sides' current rows in
  * per-key state as count-multisets. Each incoming change emits joined rows
  * against the other side's current state, tagged with the input's row kind —
  * so the output is itself a changelog that keyed-upsert sinks ([[UpsertSink]])
  * or a downstream [[ChangelogJoin]] / [[ChangelogAgg]] can consume.
  *
  * Incremental-join correctness: processing changes sequentially per key,
  * emitting δL ⋈ R_current and L_current ⋈ δR, telescopes to
  * Δ(L ⋈ R) — the materialized output always equals the join of the
  * materialized inputs (the batch oracle for q_changelog_join).
  *
  * Scale: state per key = live DISTINCT rows on each side held as
  * `Map[row, count]` (hash multiset — O(1) per change, where an association
  * list would degrade to O(distinct rows) on hot keys); counts are Long end
  * to end (no int truncation) and joined rows are emitted through a lazy
  * iterator over immutable-map snapshots, never materialized as a batch-wide
  * buffer. The union shuffles once on the join key. Unbounded key spaces can
  * opt into event-time idle-state TTL (`idleTtlMs`) — the reference's
  * IdleStateRetentionTime (flink-table-runtime-blink/.../join/stream/state/
  * JoinRecordStateViews.java + StateTtlConfig.java:51).
  */
object ChangelogJoin {

  /** One change record entering the join. `seq` orders changes within a key
    * (event-time order — ties across sides must be broken by the caller);
    * `side`: 0 = left, 1 = right; `kind` ∈ +I/+U/-U/-D. Exactly one of
    * `left`/`right` is set, matching `side`. When `idleTtlMs` is used, `seq`
    * doubles as the event-time clock in epoch millis. */
  final case class Change[K, L, R](key: K, seq: Long, side: Int, kind: String,
      left: Option[L], right: Option[R])

  /** One joined output change: the input row kind propagated to the pair. */
  final case class JoinedChange[K, L, R](key: K, kind: String, left: L, right: R)

  /** Count-multisets of both sides' live rows (retract state view). */
  final case class JoinState[L, R](left: Map[L, Long], right: Map[R, Long],
      lastActivityMs: Long = Long.MinValue)

  private def isAccumulate(kind: String): Boolean = kind == "+I" || kind == "+U"

  private def bump[T](rows: Map[T, Long], row: T, delta: Long): Map[T, Long] = {
    val next = rows.getOrElse(row, 0L) + delta
    if (next <= 0L) rows - row else rows.updated(row, next)
  }

  /** Lazily repeat `a` exactly `n` times (n may exceed Int.MaxValue). */
  private def repeat[A](n: Long, a: A): Iterator[A] = new Iterator[A] {
    private var i = 0L
    override def hasNext: Boolean = i < n
    override def next(): A = { i += 1; a }
  }

  /** Pure core: apply one change, returning (emitted pairs, new state). The
    * emission iterator is lazy over the other side's immutable-map snapshot —
    * safe to consume after further state updates. */
  def applyChange[L, R](st: JoinState[L, R], side: Int, kind: String,
      l: Option[L], r: Option[R]): (Iterator[(String, L, R)], JoinState[L, R]) = {
    val delta = if (isAccumulate(kind)) 1L else -1L
    if (side == 0) {
      val lv = l.get
      val snapshot = st.right
      val out = snapshot.iterator.flatMap { case (rv, cnt) =>
        repeat(cnt, (kind, lv, rv))
      }
      (out, st.copy(left = bump(st.left, lv, delta)))
    } else {
      val rv = r.get
      val snapshot = st.left
      val out = snapshot.iterator.flatMap { case (lv, cnt) =>
        repeat(cnt, (kind, lv, rv))
      }
      (out, st.copy(right = bump(st.right, rv, delta)))
    }
  }

  /** The operator: a unioned two-sided changelog → joined output changelog.
    * Works identically under streaming (state persists across micro-batches)
    * and batch execution (one pass).
    *
    * @param idleTtlMs optional idle-state retention: a key whose last change
    *   is older than this (event time, `seq` read as epoch millis, driven by
    *   the caller-attached watermark) has its state dropped — late changes
    *   after expiry see an empty join state, exactly the reference's
    *   IdleStateRetentionTime contract. Streaming-only (batch runs one pass
    *   and needs no retention); requires a watermark on the input.
    */
  def join[K, L, R](changes: Dataset[Change[K, L, R]],
      idleTtlMs: Option[Long] = None)(
      implicit ek: Encoder[K],
      es: Encoder[JoinState[L, R]],
      eo: Encoder[JoinedChange[K, L, R]]): Dataset[JoinedChange[K, L, R]] = {
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: K, it: Iterator[Change[K, L, R]],
         state: org.apache.spark.sql.streaming.GroupState[JoinState[L, R]]) =>
          if (state.hasTimedOut) {
            // idle past the TTL: drop both multisets (reference
            // OnReadAndWrite TTL cleanup on the join state views)
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              JoinState[L, R](Map.empty[L, Long], Map.empty[R, Long]))
            // Per-change lazy emissions are collected as iterators (O(changes)
            // driver-side bookkeeping, not O(output rows)); the output rows
            // themselves stream out of the final concatenated iterator.
            val emissions = Vector.newBuilder[Iterator[(String, L, R)]]
            var lastSeq = Long.MinValue
            it.toSeq.sortBy(_.seq).foreach { c =>
              val (emitted, st1) = applyChange(st, c.side, c.kind, c.left, c.right)
              st = st1
              emissions += emitted
              if (c.seq > lastSeq) lastSeq = c.seq
            }
            // last activity = max over the key's WHOLE history, carried in
            // state: arming from only this batch's max seq would let a
            // late (below-high-watermark) change move the expiry EARLIER
            // than the key's true last change and drop join state
            // prematurely
            val activity = math.max(st.lastActivityMs, lastSeq)
            state.update(st.copy(lastActivityMs = activity))
            idleTtlMs.foreach { ttl =>
              // seq is the event-time clock in ms under the TTL contract;
              // the timeout must sit strictly past the current watermark
              val wm = state.getCurrentWatermarkMs()
              state.setTimeoutTimestamp(math.max(wm + 1, activity + ttl))
            }
            emissions.result().iterator.flatten
              .map { case (k, lv, rv) => JoinedChange(key, k, lv, rv) }
          }
      }
  }

  // ---- LEFT OUTER mode (reference StreamingJoinOperator outer path:
  // OuterJoinRecordStateViews — null padding with RETRACTION when the first
  // match appears, re-padding when the last match disappears) ----

  /** One outer-joined output change: `right = None` is the null padding. */
  final case class OuterChange[K, L, R](key: K, kind: String, left: L, right: Option[R])

  /** Pure core, left-outer: like [[applyChange]] plus pad algebra — a left
    * row with no right matches joins `(l, null)`; the FIRST right arrival
    * retracts every live pad (-U) before emitting the pairs; the LAST right
    * departure retracts the pairs and restores the pads (+U). The
    * materialized output therefore always equals the left-outer join of the
    * materialized inputs. */
  def applyChangeOuter[L, R](st: JoinState[L, R], side: Int, kind: String,
      l: Option[L], r: Option[R])
      : (Iterator[(String, L, Option[R])], JoinState[L, R]) = {
    val delta = if (isAccumulate(kind)) 1L else -1L
    if (side == 0) {
      val lv = l.get
      val snapshot = st.right
      val out: Iterator[(String, L, Option[R])] =
        if (snapshot.isEmpty) Iterator.single((kind, lv, None))
        else snapshot.iterator.flatMap { case (rv, cnt) =>
          repeat(cnt, (kind, lv, Some(rv)))
        }
      (out, st.copy(left = bump(st.left, lv, delta)))
    } else {
      val rv = r.get
      val leftSnap = st.left
      val wasEmpty = st.right.isEmpty
      val newRight = bump(st.right, rv, delta)
      val out: Iterator[(String, L, Option[R])] =
        if (isAccumulate(kind) && wasEmpty)
          // first match: unpad every live left row, then pair it
          leftSnap.iterator.flatMap { case (lv, c) =>
            repeat(c, ("-U", lv, Option.empty[R])) ++ repeat(c, (kind, lv, Some(rv)))
          }
        else if (!isAccumulate(kind) && newRight.isEmpty)
          // last match gone: retract the pairs, restore the pads
          leftSnap.iterator.flatMap { case (lv, c) =>
            repeat(c, (kind, lv, Some(rv))) ++ repeat(c, ("+U", lv, Option.empty[R]))
          }
        else
          leftSnap.iterator.flatMap { case (lv, c) => repeat(c, (kind, lv, Some(rv))) }
      (out, st.copy(right = newRight))
    }
  }

  /** The LEFT OUTER operator: unioned two-sided changelog → outer-joined
    * output changelog with retractable null padding. */
  def joinOuter[K, L, R](changes: Dataset[Change[K, L, R]])(
      implicit ek: Encoder[K],
      es: Encoder[JoinState[L, R]],
      eo: Encoder[OuterChange[K, L, R]]): Dataset[OuterChange[K, L, R]] =
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Change[K, L, R]],
         state: org.apache.spark.sql.streaming.GroupState[JoinState[L, R]]) =>
          var st = state.getOption.getOrElse(
            JoinState[L, R](Map.empty[L, Long], Map.empty[R, Long]))
          val emissions = Vector.newBuilder[Iterator[(String, L, Option[R])]]
          it.toSeq.sortBy(_.seq).foreach { c =>
            val (emitted, st1) = applyChangeOuter(st, c.side, c.kind, c.left, c.right)
            st = st1
            emissions += emitted
          }
          state.update(st)
          emissions.result().iterator.flatten
            .map { case (k, lv, rv) => OuterChange(key, k, lv, rv) }
      }

  /** RIGHT OUTER by symmetry: swap the sides into [[joinOuter]] — the
    * output's `left` is the RIGHT input's row type, padded when unmatched. */
  def joinRightOuter[K, L, R](changes: Dataset[Change[K, L, R]])(
      implicit ek: Encoder[K],
      ec: Encoder[Change[K, R, L]],
      es: Encoder[JoinState[R, L]],
      eo: Encoder[OuterChange[K, R, L]]): Dataset[OuterChange[K, R, L]] =
    joinOuter(changes.map(c =>
      Change[K, R, L](c.key, c.seq, 1 - c.side, c.kind, c.right, c.left)))

  /** One FULL-outer output change: either side None = that side's padding. */
  final case class FullChange[K, L, R](key: K, kind: String,
      left: Option[L], right: Option[R])

  /** Pure core, FULL outer: pads on BOTH sides — a change on one side may
    * retract/restore the OTHER side's pads (first-left-arrival unpads every
    * right row, last-left-departure re-pads them; symmetric). */
  def applyChangeFull[L, R](st: JoinState[L, R], side: Int, kind: String,
      l: Option[L], r: Option[R])
      : (Iterator[(String, Option[L], Option[R])], JoinState[L, R]) = {
    val acc = isAccumulate(kind)
    val delta = if (acc) 1L else -1L
    if (side == 0) {
      val lv = l.get
      val wasEmpty = st.left.isEmpty
      val newLeft = bump(st.left, lv, delta)
      val rightSnap = st.right
      val out: Iterator[(String, Option[L], Option[R])] =
        if (rightSnap.isEmpty) Iterator.single((kind, Some(lv), Option.empty[R]))
        else {
          val pairs = rightSnap.iterator.flatMap { case (rv, c) =>
            repeat(c, (kind, Some(lv), Some(rv)))
          }
          if (acc && wasEmpty)
            // first left row: the right side stops being unmatched
            rightSnap.iterator.flatMap { case (rv, c) =>
              repeat(c, ("-U", Option.empty[L], Some(rv)))
            } ++ pairs
          else if (!acc && newLeft.isEmpty)
            // last left row gone: the right side is unmatched again
            pairs ++ rightSnap.iterator.flatMap { case (rv, c) =>
              repeat(c, ("+U", Option.empty[L], Some(rv)))
            }
          else pairs
        }
      (out, st.copy(left = newLeft))
    } else {
      val rv = r.get
      val wasEmpty = st.right.isEmpty
      val newRight = bump(st.right, rv, delta)
      val leftSnap = st.left
      val out: Iterator[(String, Option[L], Option[R])] =
        if (leftSnap.isEmpty) Iterator.single((kind, Option.empty[L], Some(rv)))
        else {
          val pairs = leftSnap.iterator.flatMap { case (lv, c) =>
            repeat(c, (kind, Some(lv), Some(rv)))
          }
          if (acc && wasEmpty)
            leftSnap.iterator.flatMap { case (lv, c) =>
              repeat(c, ("-U", Some(lv), Option.empty[R]))
            } ++ pairs
          else if (!acc && newRight.isEmpty)
            pairs ++ leftSnap.iterator.flatMap { case (lv, c) =>
              repeat(c, ("+U", Some(lv), Option.empty[R]))
            }
          else pairs
        }
      (out, st.copy(right = newRight))
    }
  }

  /** The FULL OUTER operator. */
  def joinFullOuter[K, L, R](changes: Dataset[Change[K, L, R]])(
      implicit ek: Encoder[K],
      es: Encoder[JoinState[L, R]],
      eo: Encoder[FullChange[K, L, R]]): Dataset[FullChange[K, L, R]] =
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Change[K, L, R]],
         state: org.apache.spark.sql.streaming.GroupState[JoinState[L, R]]) =>
          var st = state.getOption.getOrElse(
            JoinState[L, R](Map.empty[L, Long], Map.empty[R, Long]))
          val emissions = Vector.newBuilder[Iterator[(String, Option[L], Option[R])]]
          it.toSeq.sortBy(_.seq).foreach { c =>
            val (emitted, st1) = applyChangeFull(st, c.side, c.kind, c.left, c.right)
            st = st1
            emissions += emitted
          }
          state.update(st)
          emissions.result().iterator.flatten
            .map { case (k, lv, rv) => FullChange(key, k, lv, rv) }
      }

  // ---- transformWithState build of the same operator (r10: the SECOND
  // fMGWS hot-path migration, after the temporal sort) ----

  /** The inner changelog join as a StatefulProcessor: both sides' live-row
    * multisets are NATIVE MapStates, so a change batch writes only the
    * entries it touched — the fMGWS build re-serializes the whole
    * JoinState value on every batch that touches the key (the per-key
    * rewrite bound COVERAGE §2.7 documents). The per-batch slice still
    * loads into immutable maps first, for exactly the snapshot semantics
    * [[applyChange]] encodes (emitting δL ⋈ R-as-of-the-change while later
    * changes in the same batch mutate the multiset); the write-back is the
    * DIFF against that load. */
  class ChangelogJoinProcessor[K, L, R](el: Encoder[L], er: Encoder[R])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        K, Change[K, L, R], JoinedChange[K, L, R]] {
    import org.apache.spark.sql.streaming.{ListState => _, _}
    @transient private var leftRows: MapState[L, Long] = _
    @transient private var rightRows: MapState[R, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      leftRows = getHandle.getMapState[L, Long]("left", el,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
      rightRows = getHandle.getMapState[R, Long]("right", er,
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[Change[K, L, R]],
        timerValues: TimerValues): Iterator[JoinedChange[K, L, R]] = {
      val lm0 = leftRows.iterator().map { case (k, v) => k -> v }.toMap
      val rm0 = rightRows.iterator().map { case (k, v) => k -> v }.toMap
      var st = JoinState[L, R](lm0, rm0)
      val emissions = Vector.newBuilder[Iterator[(String, L, R)]]
      rows.toSeq.sortBy(_.seq).foreach { c =>
        val (emitted, st1) = applyChange(st, c.side, c.kind, c.left, c.right)
        st = st1
        emissions += emitted
      }
      (lm0.keySet ++ st.left.keySet).foreach { k =>
        (lm0.get(k), st.left.get(k)) match {
          case (a, b) if a == b => ()
          case (_, Some(v)) => leftRows.updateValue(k, v)
          case (_, None) => leftRows.removeKey(k)
        }
      }
      (rm0.keySet ++ st.right.keySet).foreach { k =>
        (rm0.get(k), st.right.get(k)) match {
          case (a, b) if a == b => ()
          case (_, Some(v)) => rightRows.updateValue(k, v)
          case (_, None) => rightRows.removeKey(k)
        }
      }
      emissions.result().iterator.flatten
        .map { case (kk, lv, rv) => JoinedChange(key, kk, lv, rv) }
    }
  }

  /** [[join]]'s exact API shape on the transformWithState runtime. Works in
    * batch too (TwS batch execution hardwires a RocksDB store;
    * [[TwsOps.ensureStateCoordinator]] registers the driver endpoint it
    * needs). A STREAMING caller needs the RocksDB state-store provider
    * (transformWithState requires it); if the session's EFFECTIVE provider
    * is the registered HDFS-backed DEFAULT it is swapped to RocksDB here
    * (getOption cannot detect "unconfigured" — it returns that default —
    * and transformWithState cannot run on it at all); an EXPLICIT custom
    * non-RocksDB provider fails fast instead of being silently replaced
    * session-wide; a RocksDB-derived custom provider is kept. */
  def joinTws[K, L, R](changes: Dataset[Change[K, L, R]])(
      implicit ek: Encoder[K], el: Encoder[L], er: Encoder[R],
      eo: Encoder[JoinedChange[K, L, R]]): Dataset[JoinedChange[K, L, R]] = {
    TwsOps.ensureStateCoordinator(changes.sparkSession)
    if (changes.isStreaming) TwsOps.requireRocksDb(changes.sparkSession, "joinTws")
    changes.groupByKey(_.key)
      .transformWithState(new ChangelogJoinProcessor[K, L, R](el, er),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
  }

  // ---- shared builders for the three changelog-join oracle queries ----

  private def eventTuples(s: org.apache.spark.sql.SparkSession, dir: String)
      : Dataset[(Long, Long, String, Double)] = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .as[(Long, Long, String, Double)]
  }

  /** Upsert changelog of the keyed LATEST-VALUE stream (side 0): +I on the
    * key's first event, -U(previous)/+U(new) on each later one. seq =
    * event_id*4 + phase keeps retract-before-accumulate order and breaks
    * ties across sides deterministically. */
  private def latestValueChanges(ev: Dataset[(Long, Long, String, Double)],
      keep: ((Long, Long, String, Double)) => Boolean)
      : Dataset[Change[Long, Double, Long]] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.filter(keep).groupByKey(_._2).flatMapGroups {
      (uid: Long, it: Iterator[(Long, Long, String, Double)]) =>
        // toVector, NOT toSeq: Iterator.toSeq gives a List, and the
        // retract-previous lookup `sorted(i - 1)` on a linked list is O(i)
        // — O(n^2) per group. Invisible on uniform keys (~67 events/user);
        // the r19 zipf rung's hot user (625k events) turned it into a
        // single-core multi-hour straggler (2e11 list steps). Same class
        // as ChangelogAgg's oracle generator — both fixed together.
        val sorted = it.toVector.sortBy(_._1)
        sorted.zipWithIndex.flatMap { case ((eid, _, _, v), i) =>
          if (i == 0) Seq(Change[Long, Double, Long](uid, eid * 4 + 1, 0, "+I", Some(v), None))
          else Seq(
            Change[Long, Double, Long](uid, eid * 4, 0, "-U", Some(sorted(i - 1)._4), None),
            Change[Long, Double, Long](uid, eid * 4 + 1, 0, "+U", Some(v), None))
        }.iterator
    }
  }

  /** Upsert changelog of the keyed RUNNING purchase COUNT (side 1). */
  private def purchaseCountChanges(ev: Dataset[(Long, Long, String, Double)])
      : Dataset[Change[Long, Double, Long]] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.filter(_._3 == "purchase").groupByKey(_._2).flatMapGroups {
      (uid: Long, it: Iterator[(Long, Long, String, Double)]) =>
        val sorted = it.toSeq.sortBy(_._1)
        sorted.zipWithIndex.flatMap { case ((eid, _, _, _), i) =>
          if (i == 0) Seq(Change[Long, Double, Long](uid, eid * 4 + 3, 1, "+I", None, Some(1L)))
          else Seq(
            Change[Long, Double, Long](uid, eid * 4 + 2, 1, "-U", None, Some(i.toLong)),
            Change[Long, Double, Long](uid, eid * 4 + 3, 1, "+U", None, Some(i + 1L)))
        }.iterator
    }
  }

  /** Materialize a joined changelog to its surviving (key, pair) rows:
    * count-sum per pair is order-independent, positives survive. */
  private def survivingPairs[C, P](joined: Dataset[C])(
      keyOf: C => Long, kindOf: C => String, pairOf: C => P)(
      implicit e: Encoder[(Long, P)]): Dataset[(Long, P)] =
    joined.groupByKey(keyOf)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroups { (uid: Long, it: Iterator[C]) =>
        val counts = scala.collection.mutable.Map[P, Long]()
        it.foreach { jc =>
          val d = if (isAccumulate(kindOf(jc))) 1L else -1L
          val p = pairOf(jc)
          counts(p) = counts.getOrElse(p, 0L) + d
        }
        counts.collect { case (p, c) if c > 0 => (uid, p) }.iterator
      }

  /** q_changelog_full_outer_join: FULL OUTER over updating inputs — left =
    * latest SIGNUP value per user (only users who signed up), right =
    * purchase-count changelog (only users who purchased); users on one side
    * only surface as pads. Oracle = FULL JOIN of the two final tables. */
  val qChangelogFullOuterJoin: Q = Q(
    "q_changelog_full_outer_join",
    (s, dir) => {
      import s.implicits._
      val ev = eventTuples(s, dir)
      val joined = joinFullOuter(
        latestValueChanges(ev, _._3 == "signup").union(purchaseCountChanges(ev)))
      survivingPairs(joined)(_.key, _.kind, jc => (jc.left, jc.right))
        .map { case (u, (lv, rv)) => (u, lv, rv) }
        .toDF("user_id", "last_signup_value", "n_purchases")
        .orderBy("user_id")
    },
    Some("""SELECT COALESCE(l.user_id, r.user_id) AS user_id,
           |       l.last_signup_value, r.n_purchases
           |FROM (SELECT user_id, arg_max(value, event_id) AS last_signup_value
           |      FROM events WHERE event_type = 'signup' GROUP BY user_id) l
           |FULL JOIN (SELECT user_id, count(*) AS n_purchases
           |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) r
           |  ON l.user_id = r.user_id
           |ORDER BY user_id""".stripMargin))

  /** q_changelog_outer_join: the outer twin of q_changelog_join — every
    * user appears (the pad carries users with no purchases), and users
    * WITH purchases must have had their pads retracted when the first
    * purchase-count row arrived. Oracle = LEFT JOIN of the two final
    * tables. */
  val qChangelogOuterJoin: Q = Q(
    "q_changelog_outer_join",
    (s, dir) => {
      import s.implicits._
      val ev = eventTuples(s, dir)
      val joined = joinOuter(
        latestValueChanges(ev, _ => true).union(purchaseCountChanges(ev)))
      survivingPairs(joined)(_.key, _.kind, jc => (jc.left, jc.right))
        .map { case (u, (lv, rv)) => (u, lv, rv) }
        .toDF("user_id", "last_value", "n_purchases")
        .orderBy("user_id")
    },
    Some("""SELECT l.user_id, l.last_value, r.n_purchases
           |FROM (SELECT user_id, arg_max(value, event_id) AS last_value
           |      FROM events GROUP BY user_id) l
           |LEFT JOIN (SELECT user_id, count(*) AS n_purchases
           |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) r
           |  ON l.user_id = r.user_id
           |ORDER BY l.user_id""".stripMargin))

  /** Oracle query: two updating inputs derived from `events` —
    * left = running "latest value per user" upsert changelog (+I then
    * -U/+U pairs), right = running purchase-count changelog — joined by the
    * operator, output changelog materialized per key. The net result must
    * equal the plain batch join of the two final tables, which is the DuckDB
    * oracle. Runs the REAL operator (flatMapGroupsWithState) in batch mode. */
  val qChangelogJoin: Q = Q(
    "q_changelog_join",
    (s, dir) => {
      import s.implicits._
      val ev = eventTuples(s, dir)
      val joined = join(
        latestValueChanges(ev, _ => true).union(purchaseCountChanges(ev)))
      survivingPairs(joined)(_.key, _.kind, jc => (jc.left, jc.right))
        .map { case (u, (lv, rv)) => (u, lv, rv) }
        .toDF("user_id", "last_value", "n_purchases")
        .orderBy("user_id")
    },
    Some("""SELECT l.user_id, l.last_value, r.n_purchases
           |FROM (SELECT user_id, arg_max(value, event_id) AS last_value
           |      FROM events GROUP BY user_id) l
           |JOIN (SELECT user_id, count(*) AS n_purchases
           |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) r
           |  ON l.user_id = r.user_id
           |ORDER BY l.user_id""".stripMargin))

  /** The q_tws_changelog_join input changelog, exposed for the recovery
    * soak ([[graft.SoakRecovery]]): the latest-value changelog over ALL
    * events (side 0) unioned with the purchase-count changelog (side 1) —
    * exactly what the oracle query feeds [[joinTws]]. */
  def soakChangelog(s: org.apache.spark.sql.SparkSession, dir: String)
      : Dataset[Change[Long, Double, Long]] = {
    val ev = eventTuples(s, dir)
    latestValueChanges(ev, _ => true).union(purchaseCountChanges(ev))
  }

  /** q_tws_changelog_join: the q_changelog_join oracle on the migrated
    * operator — same changelogs, same telescoping contract, MapState-backed
    * retract state views instead of one fMGWS blob. */
  val qTwsChangelogJoin: Q = Q(
    "q_tws_changelog_join",
    (s, dir) => {
      import s.implicits._
      val ev = eventTuples(s, dir)
      val joined = joinTws(
        latestValueChanges(ev, _ => true).union(purchaseCountChanges(ev)))
      survivingPairs(joined)(_.key, _.kind, jc => (jc.left, jc.right))
        .map { case (u, (lv, rv)) => (u, lv, rv) }
        .toDF("user_id", "last_value", "n_purchases")
        .orderBy("user_id")
    },
    qChangelogJoin.oracle)

  val all: Seq[Q] = Seq(qChangelogJoin, qChangelogOuterJoin,
    qChangelogFullOuterJoin, qTwsChangelogJoin)
}
