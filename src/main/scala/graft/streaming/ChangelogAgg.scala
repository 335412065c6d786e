package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Retractable aggregate functions over a CHANGELOG input — the reference's
  * WithRetract aggregate family (flink-table-planner-blink/.../functions/
  * aggfunctions/MaxWithRetractAggFunction.java, MinWithRetractAggFunction
  * .java, SumWithRetractAggFunction.java, CountAggFunction.java) inside a
  * retraction-consuming GroupAggregate (flink-table-runtime-blink/.../
  * operators/aggregate/GroupAggFunction.java:1).
  *
  * Spark's built-in streaming aggregate only consumes append-only input, so
  * an aggregate OVER a retraction stream — the agg→join→agg chain the
  * reference plans routinely — had no operator: [[ChangelogJoin]] produces
  * changelogs and [[UpsertSink]] consumes them, but nothing aggregated one.
  * This operator closes that: input rows are tagged +I/+U/-U/-D; per key the
  * state carries (count, sum, value-multiset), where the multiset is what
  * makes MAX/MIN retractable — retracting the current max must FALL BACK to
  * the next-largest live value, which sum/count-style accumulators cannot do
  * (the reference keeps exactly this multiset in MapState for
  * MaxWithRetract). The output is itself a changelog: per key and batch,
  * +I on first result, -U(old)/+U(new) when the aggregate changed, -D when
  * the last live row was deleted — so it composes with [[ChangelogJoin]]
  * and a further ChangelogAgg downstream.
  *
  * Scale: state per key = O(distinct live values); each change is O(1)
  * (hash-multiset bump), and min/max recompute on emission is an
  * O(distinct) scan per key per BATCH — the same worst-case bound as the
  * reference's lazy re-scan when the retained max is retracted
  * (MaxWithRetractAggFunction#retract). Emission folds each micro-batch's
  * changes per key into ONE -U/+U pair (the reference's MiniBatch
  * GroupAggFunction bundle behavior), so output volume is bounded by keys
  * per batch, not changes.
  */
object ChangelogAgg {

  /** One change entering the aggregate: `kind` ∈ +I/+U/-U/-D; `seq` orders
    * changes within a key. */
  final case class AggChange[K](key: K, seq: Long, kind: String, value: Double)

  /** One output change of the aggregate's own changelog. */
  final case class AggOut[K](key: K, kind: String, cnt: Long, total: Double,
      vmin: Double, vmax: Double)

  /** Retractable accumulator: running count/sum + live-value multiset. */
  final case class AggState(cnt: Long, total: Double, values: Map[Double, Long],
      lastActivityMs: Long = Long.MinValue)

  val empty: AggState = AggState(0L, 0.0, Map.empty)

  private def isAccumulate(kind: String): Boolean = kind == "+I" || kind == "+U"

  /** A TRANSIENT negative count is kept (not floored away): within a batch
    * the fold visits changes in ITERATOR order, not seq order, so a
    * retraction can precede its accumulate — flooring at zero there loses
    * the cancellation and corrupts the multiset. Keeping the -1 makes the
    * fold fully COMMUTATIVE (cnt/total are sums; per-value counts are
    * sums), which is what lets [[agg]] stream each group's iterator
    * instead of materializing and sorting it — the r17 100x rung caught
    * `it.toSeq.sortBy` OOMing on an 8M-change group (q_cdc_ingest at the
    * 100x feed). For a well-formed per-key-causal changelog every value
    * nets >= 0 by batch end; zeros still drop so state stays
    * O(distinct live). */
  private def bump(rows: Map[Double, Long], v: Double, delta: Long): Map[Double, Long] = {
    val next = rows.getOrElse(v, 0L) + delta
    if (next == 0L) rows - v else rows.updated(v, next)
  }

  /** Pure core: fold one change into the accumulator. Commutative — see
    * [[bump]]. */
  def applyChange(st: AggState, kind: String, v: Double): AggState = {
    val d = if (isAccumulate(kind)) 1L else -1L
    AggState(st.cnt + d, st.total + d * v, bump(st.values, v, d), st.lastActivityMs)
  }

  /** The aggregate's current result; None when no live rows. min/max scan
    * only POSITIVE-count entries (a transient negative is not a live row).
    *
    * `total` is RECOMPUTED here as Σ v·n over the multiset in sorted-value
    * order, not read from the running accumulator: the fold is commutative
    * but FP addition is not ASSOCIATIVE, so the running sum can differ in
    * the last ulp across iterator orders — and shuffle iterator order is
    * not guaranteed stable across runs/retries. The soak gate compares a
    * clean run against a kill-restart run bit-exactly (xxhash64 over the
    * emitted changelog), so emission must be a pure function of state
    * CONTENT. Sorted Σ v·n is deterministic for identical state and costs
    * the same O(distinct) bound as the min/max scan (ADVICE r17). */
  def result(st: AggState): Option[(Long, Double, Double, Double)] =
    resultOfMultiset(st.cnt, st.values)

  private[graft] def resultOfMultiset(cnt: Long,
      values: scala.collection.Map[Double, Long])
      : Option[(Long, Double, Double, Double)] = {
    if (cnt <= 0L) return None
    var total = 0.0
    var mn = Double.NaN
    var mx = Double.NaN
    values.toArray.sortBy(_._1).foreach { case (v, n) =>
      total += v * n
      if (n > 0L) {
        if (mn.isNaN || v < mn) mn = v
        if (mx.isNaN || v > mx) mx = v
      }
    }
    if (mn.isNaN) None else Some((cnt, total, mn, mx))
  }

  /** The operator: keyed changelog in → aggregate changelog out. Works
    * identically under streaming (state across micro-batches) and batch.
    *
    * @param idleTtlMs optional idle-state retention (reference
    *   IdleStateRetentionTime / StateTtlConfig.java:51): a key idle past
    *   this (event time, `seq` read as epoch millis, watermark-driven) has
    *   its accumulator dropped; a later change starts the aggregate fresh.
    *   Streaming-only; requires a watermark on the input. */
  def agg[K](changes: Dataset[AggChange[K]],
      idleTtlMs: Option[Long] = None)(
      implicit ek: Encoder[K], es: Encoder[AggState],
      eo: Encoder[AggOut[K]]): Dataset[AggOut[K]] = {
    val timeoutConf =
      if (idleTtlMs.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (key: K, it: Iterator[AggChange[K]],
         state: org.apache.spark.sql.streaming.GroupState[AggState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st0 = state.getOption.getOrElse(empty)
            val before = result(st0)
            var st = st0
            var lastSeq = Long.MinValue
            // STREAM the group — never it.toSeq.sortBy: materializing a
            // group is O(changes-per-key) heap, and at a CDC feed's scale
            // a single hot key's batch is millions of changes (the r17
            // 100x rung OOMed here). The fold is commutative (see bump),
            // so iterator order is as good as seq order.
            it.foreach { c =>
              st = applyChange(st, c.kind, c.value)
              if (c.seq > lastSeq) lastSeq = c.seq
            }
            val after = result(st)
            if (after.isEmpty) state.remove()
            else {
              // last activity = max over the key's WHOLE history (carried
              // in state): re-arming from only this batch's max seq would
              // let a late smaller-seq change move the expiry earlier and
              // drop the accumulator prematurely (same contract as
              // ChangelogJoin's idle TTL)
              val activity = math.max(st.lastActivityMs, lastSeq)
              state.update(st.copy(lastActivityMs = activity))
              idleTtlMs.foreach { ttl =>
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(math.max(wm + 1, activity + ttl))
              }
            }
            emitChanges(key, before, after)
          }
      }
  }

  // ---- transformWithState runtime (r12 migration) ----

  /** Scalar half of the TwS accumulator; the multiset half lives in
    * MapState so it never re-serializes whole. No running `total`: emission
    * recomputes it from the multiset ([[resultOfMultiset]]), and a running
    * FP sum folded in shuffle-iterator order would make the CHECKPOINTED
    * state differ in the last ulp between a clean run and a kill-restart
    * run — dead weight today, a latent flake for any future state-level
    * checksum compare (ADVICE r18). State is now itself a pure function of
    * the multiset.
    *
    * STATE-SCHEMA BREAK (r19, ADVICE r19): dropping `total` changed the
    * transformWithState value-state encoding, so a checkpoint written by
    * pre-r19 code does not restore under this class. Safe today because
    * every soak/recovery path regenerates its checkpoint within one code
    * version; a future CROSS-version kill-restart soak must treat a decode
    * failure here as this documented break, not an engine bug. If state
    * evolution across code versions becomes a requirement, version the
    * state name ("scalars" -> "scalars_v2") instead of the encoding. */
  final case class AggScalars(cnt: Long, lastActivityMs: Long)

  /** [[agg]]'s exact semantics on the transformWithState runtime — the
    * widest-traffic fMGWS migration (reference
    * operators/aggregate/GroupAggFunction.java:43 keeps exactly this
    * accumulator-in-keyed-state shape; MaxWithRetractAggFunction keeps its
    * fallback multiset in MapState like this). What the migration buys:
    * the live-value multiset is native MapState with DIFF write-back — a
    * batch touching a key rewrites only the values whose live count
    * changed, where fMGWS re-serializes the entire accumulator blob per
    * touched batch (the §2.7 rewrite bound); the idle-TTL timer is a
    * native event-time timer carrying the whole-history activity max (a
    * late batch's smaller seq must never move expiry earlier) and the
    * registration-below-watermark clamp. */
  private[graft] class AggTwsProcessor[K](idleTtlMs: Option[Long])
      extends org.apache.spark.sql.streaming.StatefulProcessor[K, AggChange[K], AggOut[K]] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var scalars: streaming.ValueState[AggScalars] = _
    @transient private var values: streaming.MapState[Double, Long] = _
    @transient private var armed: streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      scalars = getHandle.getValueState[AggScalars]("scalars",
        Encoders.product[AggScalars], streaming.TTLConfig.NONE)
      values = getHandle.getMapState[Double, Long]("values",
        Encoders.scalaDouble, Encoders.scalaLong, streaming.TTLConfig.NONE)
      if (idleTtlMs.isDefined)
        armed = getHandle.getValueState[Long]("armed",
          Encoders.scalaLong, streaming.TTLConfig.NONE)
    }

    override def handleInputRows(key: K, rows: Iterator[AggChange[K]],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[AggOut[K]] = {
      if (!rows.hasNext) return Iterator.empty
      // ONE MapState scan loads the live multiset (min/max need it all
      // anyway — the same O(distinct)-per-touched-batch bound as the
      // reference's lazy re-scan); deltas fold in memory. The batch is
      // STREAMED, never toArray.sortBy'd — the fold is commutative
      // (transient negative counts kept, see bump), and a CDC hot key's
      // batch is millions of changes (the r17 100x OOM finding).
      val live = scala.collection.mutable.Map.empty[Double, Long]
      values.iterator().foreach { case (v, n) => live.put(v, n) }
      val live0 = live.toMap
      val sc0 = if (scalars.exists()) scalars.get()
                else AggScalars(0L, Long.MinValue)
      val before = resultOfMultiset(sc0.cnt, live)
      var cnt = sc0.cnt; var lastSeq = Long.MinValue
      rows.foreach { c =>
        val d = if (isAccumulate(c.kind)) 1L else -1L
        cnt += d
        val n = live.getOrElse(c.value, 0L) + d
        if (n == 0L) live.remove(c.value) else live.put(c.value, n)
        if (c.seq > lastSeq) lastSeq = c.seq
      }
      val after = resultOfMultiset(cnt, live)
      if (after.isEmpty) {
        scalars.clear(); values.clear()
        if (armed != null && armed.exists()) {
          getHandle.deleteTimer(armed.get()); armed.clear()
        }
      } else {
        val activity = math.max(sc0.lastActivityMs, lastSeq)
        scalars.update(AggScalars(cnt, activity))
        // diff write-back: only values whose live count CHANGED touch RocksDB
        (live0.keySet ++ live.keySet).foreach { v =>
          (live0.get(v), live.get(v)) match {
            case (a, b) if a == b => ()
            case (_, Some(n)) => values.updateValue(v, n)
            case (_, None) => values.removeKey(v)
          }
        }
        idleTtlMs.foreach { ttl =>
          val t = math.max(timerValues.getCurrentWatermarkInMs() + 1, activity + ttl)
          if (!armed.exists()) { getHandle.registerTimer(t); armed.update(t) }
          else if (armed.get() != t) {
            getHandle.deleteTimer(armed.get())
            getHandle.registerTimer(t); armed.update(t)
          }
        }
      }
      emitChanges(key, before, after)
    }

    override def handleExpiredTimer(key: K,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[AggOut[K]] = {
      // idle-TTL eviction drops the accumulator silently (state eviction,
      // not a -D retraction) — same contract as the fMGWS hasTimedOut arm
      scalars.clear(); values.clear(); armed.clear()
      Iterator.empty
    }

  }

  /** Fold the batch's net effect into the aggregate's own changelog
    * emission — +I / -U,+U / -D / nothing — shared by both runtimes. */
  private def emitChanges[K](key: K,
      before: Option[(Long, Double, Double, Double)],
      after: Option[(Long, Double, Double, Double)]): Iterator[AggOut[K]] =
    ((before, after) match {
      case (None, None) => Nil
      case (None, Some((c, t, mn, mx))) => Seq(AggOut(key, "+I", c, t, mn, mx))
      case (Some((c, t, mn, mx)), None) => Seq(AggOut(key, "-D", c, t, mn, mx))
      case (Some(b), Some(a)) if b == a => Nil
      case (Some((bc, bt, bmn, bmx)), Some((ac, at, amn, amx))) =>
        Seq(AggOut(key, "-U", bc, bt, bmn, bmx), AggOut(key, "+U", ac, at, amn, amx))
    }).iterator

  /** The operator on the transformWithState runtime — [[agg]]'s API shape
    * and emission contract, MapState-backed multiset, native TTL timer.
    * Works in batch too (TwS batch execution hardwires a RocksDB store);
    * a streaming caller gets [[TwsOps.requireRocksDb]]'s provider
    * discipline. TTL requires a watermark on the input (event-time). */
  def aggTws[K](changes: Dataset[AggChange[K]],
      idleTtlMs: Option[Long] = None)(
      implicit ek: Encoder[K], eo: Encoder[AggOut[K]]): Dataset[AggOut[K]] = {
    TwsOps.ensureStateCoordinator(changes.sparkSession)
    if (changes.isStreaming) TwsOps.requireRocksDb(changes.sparkSession, "aggTws")
    val timeMode =
      if (idleTtlMs.isDefined) org.apache.spark.sql.streaming.TimeMode.EventTime()
      else org.apache.spark.sql.streaming.TimeMode.None()
    changes.groupByKey(_.key)
      .transformWithState(new AggTwsProcessor[K](idleTtlMs), timeMode, OutputMode.Append())
  }

  // ---- order-sensitive retractable aggregates (reference
  // FirstValueWithRetractAggFunction.java / LastValueWithRetractAggFunction
  // .java / ListAggWithRetractAggFunction.java) ----

  /** Arrival-ordered multiset: value → seqs of its LIVE instances in
    * arrival order. Retraction removes the oldest instance of the value —
    * exactly the reference's MapState<value, List<order>> bookkeeping. */
  final case class OrdState(occ: Map[Double, Vector[Long]])

  /** Output change of the order-sensitive aggregate: first/last live value
    * by arrival order + the live values as an arrival-ordered list. */
  final case class OrdOut[K](key: K, kind: String, first_v: Double,
      last_v: Double, vals: Seq[Double])

  val emptyOrd: OrdState = OrdState(Map.empty)

  /** Fold one change into the arrival-ordered multiset. */
  def applyOrd(st: OrdState, kind: String, v: Double, seq: Long): OrdState =
    if (isAccumulate(kind))
      OrdState(st.occ.updated(v, st.occ.getOrElse(v, Vector.empty) :+ seq))
    else st.occ.get(v) match {
      case None => st
      case Some(seqs) =>
        val rest = seqs.drop(1) // retract the OLDEST instance (reference order)
        OrdState(if (rest.isEmpty) st.occ - v else st.occ.updated(v, rest))
    }

  /** (first_value, last_value, arrival-ordered live values); None if empty. */
  def ordResult(st: OrdState): Option[(Double, Double, Seq[Double])] =
    if (st.occ.isEmpty) None
    else {
      val flat = st.occ.toSeq.flatMap { case (v, seqs) => seqs.map(s => (s, v)) }
        .sortBy(_._1)
      Some((flat.head._2, flat.last._2, flat.map(_._2)))
    }

  /** The operator: keyed changelog in → first/last/listagg changelog out.
    * Same batch-fold emission discipline as [[agg]]. */
  def aggOrdered[K](changes: Dataset[AggChange[K]])(
      implicit ek: Encoder[K], es: Encoder[OrdState],
      eo: Encoder[OrdOut[K]]): Dataset[OrdOut[K]] =
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[AggChange[K]],
         state: org.apache.spark.sql.streaming.GroupState[OrdState]) =>
          val st0 = state.getOption.getOrElse(emptyOrd)
          val before = ordResult(st0)
          var st = st0
          it.toSeq.sortBy(_.seq).foreach(c => st = applyOrd(st, c.kind, c.value, c.seq))
          val after = ordResult(st)
          if (after.isEmpty) state.remove() else state.update(st)
          emitOrdChanges(key, before, after)
      }

  /** [[emitChanges]]'s twin for the ordered aggregate — the OrdOut
    * changelog fold, shared by both runtimes. */
  private def emitOrdChanges[K](key: K,
      before: Option[(Double, Double, Seq[Double])],
      after: Option[(Double, Double, Seq[Double])]): Iterator[OrdOut[K]] =
    ((before, after) match {
      case (None, None) => Nil
      case (None, Some((f, l, vs))) => Seq(OrdOut(key, "+I", f, l, vs))
      case (Some((f, l, vs)), None) => Seq(OrdOut(key, "-D", f, l, vs))
      case (Some(b), Some(a)) if b == a => Nil
      case (Some((bf, bl, bvs)), Some((af, al, avs))) =>
        Seq(OrdOut(key, "-U", bf, bl, bvs), OrdOut(key, "+U", af, al, avs))
    }).iterator

  /** [[aggOrdered]] on the transformWithState runtime: the arrival-ordered
    * multiset lives as MapState keyed by (value, seq) instance — exactly
    * the reference's MapState<value, List<order>> bookkeeping
    * (FirstValueWithRetractAggFunction.java), flattened to one state row
    * per LIVE instance so arrivals and retractions touch single rows
    * (diff write-back; fMGWS re-serializes the whole OrdState blob).
    * Retraction removes the value's instance with the SMALLEST seq —
    * identical to [[applyOrd]]'s drop-oldest whenever seqs arrive in
    * order, and well-defined (min-seq) under late data where
    * append-order "oldest" is not. One divergence: a DUPLICATE
    * (value, seq) accumulate folds into one instance here (the state key
    * cannot carry multiplicity) where the fMGWS vector kept both; `seq`
    * is a changelog position, so producers emitting duplicate positions
    * are malformed inputs on either runtime. */
  private[graft] class OrdTwsProcessor[K]
      extends org.apache.spark.sql.streaming.StatefulProcessor[K, AggChange[K], OrdOut[K]] {
    import org.apache.spark.sql.{Encoders, streaming}
    @transient private var occ: streaming.MapState[(Double, Long), Boolean] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      occ = getHandle.getMapState[(Double, Long), Boolean]("occ",
        Encoders.product[(Double, Long)], Encoders.scalaBoolean,
        streaming.TTLConfig.NONE)

    override def handleInputRows(key: K, rows: Iterator[AggChange[K]],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[OrdOut[K]] = {
      val batch = rows.toArray.sortBy(_.seq)
      if (batch.isEmpty) return Iterator.empty
      // one scan loads the live instances (ordResult needs the full
      // arrival order anyway); fold in memory, write back the diff. A
      // per-value seq index keeps each retraction O(log live) — a find()
      // scan here made a churn batch O(batch x live) (r12 review)
      val live = scala.collection.mutable.TreeSet.empty[(Long, Double)] // (seq, value)
      val byVal = scala.collection.mutable.Map.empty[Double, scala.collection.mutable.TreeSet[Long]]
      def index(v: Double) = byVal.getOrElseUpdate(v, scala.collection.mutable.TreeSet.empty[Long])
      occ.keys().foreach { case (v, seq) => live.add((seq, v)); index(v).add(seq) }
      val live0 = live.toSet
      val before = ordResultOf(live)
      batch.foreach { c =>
        if (isAccumulate(c.kind)) { live.add((c.seq, c.value)); index(c.value).add(c.seq) }
        else byVal.get(c.value).filter(_.nonEmpty).foreach { seqs =>
          val oldest = seqs.head // smallest seq = oldest live instance
          seqs.remove(oldest); live.remove((oldest, c.value))
        }
      }
      val after = ordResultOf(live)
      (live0 diff live).foreach { case (seq, v) => occ.removeKey((v, seq)) }
      (live diff live0).foreach { case (seq, v) => occ.updateValue((v, seq), true) }
      emitOrdChanges(key, before, after)
    }

    private def ordResultOf(live: scala.collection.SortedSet[(Long, Double)])
        : Option[(Double, Double, Seq[Double])] =
      if (live.isEmpty) None
      else Some((live.head._2, live.last._2, live.iterator.map(_._2).toSeq))
  }

  /** The ordered operator on the transformWithState runtime — same API and
    * emission contract as [[aggOrdered]]. */
  def aggOrderedTws[K](changes: Dataset[AggChange[K]])(
      implicit ek: Encoder[K], eo: Encoder[OrdOut[K]]): Dataset[OrdOut[K]] = {
    TwsOps.ensureStateCoordinator(changes.sparkSession)
    if (changes.isStreaming)
      TwsOps.requireRocksDb(changes.sparkSession, "aggOrderedTws")
    changes.groupByKey(_.key)
      .transformWithState(new OrdTwsProcessor[K],
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Append())
  }

  /** q_changelog_firstlast: FIRST_VALUE/LAST_VALUE with retraction over the
    * per-user latest-value upsert changelog, keyed by user-bucket. A user's
    * re-signup RETRACTS their old value (removing it from arrival order) and
    * appends the new one — so the bucket's first/last live values track the
    * users with the oldest/newest last-update, which is what the oracle
    * computes from the final table.
    *
    * Values are user-qualified (uid*100000 + value) BY CONSTRUCTION: like
    * the reference's FirstValueWithRetract, retraction is BY VALUE (one
    * instance of the multiset), so cross-user duplicate values would make
    * arrival attribution ambiguous — the reference leaves that case
    * undefined too, and the fixture has 2k+ cross-user duplicates. */
  /** Shared oracle-query generator: each user's latest-value upsert
    * changelog keyed by user-bucket, values qualified by `tv(uid, v)` —
    * the ONE copy of the seq encoding (eid*2 + phase) and the
    * retract-previous logic both changelog-agg queries rely on. */
  private def latestValueChanges(
      ev: org.apache.spark.sql.Dataset[(Long, Long, Double)])(
      tv: (Long, Double) => Double)
      : org.apache.spark.sql.Dataset[AggChange[Long]] = {
    val spark = ev.sparkSession
    import spark.implicits._
    ev.groupByKey(_._2).flatMapGroups {
      (uid: Long, it: Iterator[(Long, Long, Double)]) =>
        // toVector: `sorted(i - 1)` below must be O(1) — on the List that
        // Iterator.toSeq returns it is O(i), i.e. O(n^2) per group, which
        // the r19 zipf rung caught as a multi-hour hot-user straggler in
        // ChangelogJoin's twin of this generator
        val sorted = it.toVector.sortBy(_._1)
        val bucket = uid % 10
        sorted.zipWithIndex.flatMap { case ((eid, _, v), i) =>
          if (i == 0) Seq(AggChange[Long](bucket, eid * 2 + 1, "+I", tv(uid, v)))
          else Seq(
            AggChange[Long](bucket, eid * 2, "-U", tv(uid, sorted(i - 1)._3)),
            AggChange[Long](bucket, eid * 2 + 1, "+U", tv(uid, v)))
        }.iterator
    }
  }

  /** The q_changelog_agg input changelog, exposed for the recovery soak
    * ([[graft.SoakRecovery]] phase C): per-user latest-value upserts keyed
    * by user-bucket — ten hot keys, each holding a multiset of every live
    * user value, the worst case for the retract bound. */
  def soakAggChanges(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[AggChange[Long]] = {
    import s.implicits._
    val ev = Tables.t(s, dir, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("value"))
      .as[(Long, Long, Double)]
    latestValueChanges(ev)((_, v) => v)
  }

  val qChangelogFirstLast: Q = Q(
    "q_changelog_firstlast",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val ev = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id", $"value")
        .as[(Long, Long, Double)]
      // value qualified by uid so first/last attribution is checkable
      val changes = latestValueChanges(ev)((uid, v) => uid * 100000.0 + v)
      aggOrderedTws(changes).filter(_.kind == "+I").toDF()
        .select($"key".as("bucket"),
          round($"first_v", 2).as("first_v"), round($"last_v", 2).as("last_v"))
        .orderBy("bucket")
    },
    Some("""WITH fin AS (
           |  SELECT user_id, user_id % 10 AS bucket,
           |         user_id * 100000.0 + arg_max(value, event_id) AS last_value,
           |         max(event_id) AS last_eid
           |  FROM events GROUP BY user_id)
           |SELECT bucket,
           |       round(arg_min(last_value, last_eid), 2) AS first_v,
           |       round(arg_max(last_value, last_eid), 2) AS last_v
           |FROM fin GROUP BY bucket ORDER BY bucket""".stripMargin))

  /** q_changelog_agg: an agg→agg chain over a real retraction stream. The
    * per-user "latest value" upsert changelog (same generator as
    * q_changelog_join's left side — each user's value is REPLACED as later
    * events arrive, so -U retractions genuinely lower bucket maxima) is
    * aggregated per user-bucket by the retractable accumulators. The oracle
    * aggregates the FINAL materialized table — equality certifies that the
    * retraction arithmetic telescoped correctly. Runs the REAL operator
    * on the transformWithState runtime (r12 migration) in batch mode. */
  val qChangelogAgg: Q = Q(
    "q_changelog_agg",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.functions._
      val ev = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id", $"value")
        .as[(Long, Long, Double)]
      // upsert changelog of each user's LATEST value, keyed by user-bucket
      val changes = latestValueChanges(ev)((_, v) => v)
      // one data batch → the net output per bucket is its single +I row
      aggTws(changes).filter(_.kind == "+I").toDF()
        .select($"key".as("bucket"), $"cnt",
          round($"total", 2).as("total"),
          round($"vmin", 2).as("vmin"), round($"vmax", 2).as("vmax"))
        .orderBy("bucket")
    },
    Some("""SELECT user_id % 10 AS bucket, count(*) AS cnt,
           |       round(sum(last_value), 2) AS total,
           |       round(min(last_value), 2) AS vmin,
           |       round(max(last_value), 2) AS vmax
           |FROM (SELECT user_id, arg_max(value, event_id) AS last_value
           |      FROM events GROUP BY user_id)
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(qChangelogAgg, qChangelogFirstLast)
}
