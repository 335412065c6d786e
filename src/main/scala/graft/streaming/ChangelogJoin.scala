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
  * or a downstream [[ChangelogJoin]] can consume.
  *
  * Incremental-join correctness: processing changes sequentially per key,
  * emitting δL ⋈ R_current and L_current ⋈ δR, telescopes to
  * Δ(L ⋈ R) — the materialized output always equals the join of the
  * materialized inputs (the batch oracle for q_changelog_join).
  *
  * Scale: state per key = live rows on each side (exactly the reference's
  * bound); the union shuffles once on the join key, and each change does
  * O(|other side|) work. Unbounded key spaces should add event-time TTL via
  * the timeout machinery in [[StatefulOps]]; like the reference, state
  * retention is the deployment's knob, not the operator's.
  */
object ChangelogJoin {

  /** One change record entering the join. `seq` orders changes within a key
    * (event-time order — ties across sides must be broken by the caller);
    * `side`: 0 = left, 1 = right; `kind` ∈ +I/+U/-U/-D. Exactly one of
    * `left`/`right` is set, matching `side`. */
  final case class Change[K, L, R](key: K, seq: Long, side: Int, kind: String,
      left: Option[L], right: Option[R])

  /** One joined output change: the input row kind propagated to the pair. */
  final case class JoinedChange[K, L, R](key: K, kind: String, left: L, right: R)

  /** Count-multisets of both sides' live rows (retract state view). */
  final case class JoinState[L, R](left: List[(L, Long)], right: List[(R, Long)])

  private def isAccumulate(kind: String): Boolean = kind == "+I" || kind == "+U"

  private def bump[T](rows: List[(T, Long)], row: T, delta: Long): List[(T, Long)] = {
    val cur = rows.find(_._1 == row).map(_._2).getOrElse(0L)
    val next = cur + delta
    val rest = rows.filterNot(_._1 == row)
    if (next <= 0L) rest else (row, next) :: rest
  }

  /** Pure core: apply one change, returning (emitted pairs, new state). */
  def applyChange[L, R](st: JoinState[L, R], side: Int, kind: String,
      l: Option[L], r: Option[R]): (Seq[(String, L, R)], JoinState[L, R]) = {
    val delta = if (isAccumulate(kind)) 1L else -1L
    if (side == 0) {
      val lv = l.get
      val out = st.right.flatMap { case (rv, cnt) =>
        Seq.fill(cnt.toInt)((kind, lv, rv))
      }
      (out, st.copy(left = bump(st.left, lv, delta)))
    } else {
      val rv = r.get
      val out = st.left.flatMap { case (lv, cnt) =>
        Seq.fill(cnt.toInt)((kind, lv, rv))
      }
      (out, st.copy(right = bump(st.right, rv, delta)))
    }
  }

  /** The operator: a unioned two-sided changelog → joined output changelog.
    * Works identically under streaming (state persists across micro-batches)
    * and batch execution (one pass). */
  def join[K, L, R](changes: Dataset[Change[K, L, R]])(
      implicit ek: Encoder[K],
      es: Encoder[JoinState[L, R]],
      eo: Encoder[JoinedChange[K, L, R]]): Dataset[JoinedChange[K, L, R]] =
    changes.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: K, it: Iterator[Change[K, L, R]],
         state: org.apache.spark.sql.streaming.GroupState[JoinState[L, R]]) =>
          var st = state.getOption.getOrElse(JoinState[L, R](Nil, Nil))
          val out = Seq.newBuilder[JoinedChange[K, L, R]]
          it.toSeq.sortBy(_.seq).foreach { c =>
            val (emitted, st1) = applyChange(st, c.side, c.kind, c.left, c.right)
            st = st1
            emitted.foreach { case (k, lv, rv) => out += JoinedChange(key, k, lv, rv) }
          }
          state.update(st)
          out.result().iterator
      }

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
      val ev = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value")
        .as[(Long, Long, String, Double)]

      // seq = event_id*4 + phase keeps retract-before-accumulate order and
      // breaks ties across sides deterministically
      val leftChanges = ev.groupByKey(_._2).flatMapGroups {
        (uid: Long, it: Iterator[(Long, Long, String, Double)]) =>
          val sorted = it.toSeq.sortBy(_._1)
          sorted.zipWithIndex.flatMap { case ((eid, _, _, v), i) =>
            if (i == 0) Seq(Change[Long, Double, Long](uid, eid * 4 + 1, 0, "+I", Some(v), None))
            else Seq(
              Change[Long, Double, Long](uid, eid * 4, 0, "-U", Some(sorted(i - 1)._4), None),
              Change[Long, Double, Long](uid, eid * 4 + 1, 0, "+U", Some(v), None))
          }.iterator
      }
      val rightChanges = ev.filter(_._3 == "purchase").groupByKey(_._2).flatMapGroups {
        (uid: Long, it: Iterator[(Long, Long, String, Double)]) =>
          val sorted = it.toSeq.sortBy(_._1)
          sorted.zipWithIndex.flatMap { case ((eid, _, _, _), i) =>
            if (i == 0) Seq(Change[Long, Double, Long](uid, eid * 4 + 3, 1, "+I", None, Some(1L)))
            else Seq(
              Change[Long, Double, Long](uid, eid * 4 + 2, 1, "-U", None, Some(i.toLong)),
              Change[Long, Double, Long](uid, eid * 4 + 3, 1, "+U", None, Some(i + 1L)))
          }.iterator
      }

      val joined = join(leftChanges.union(rightChanges))

      // materialize: count-sum per (left,right) pair is order-independent;
      // the surviving pair per user is (latest value, total purchases)
      joined.groupByKey(_.key).flatMapGroups {
        (uid: Long, it: Iterator[JoinedChange[Long, Double, Long]]) =>
          val counts = scala.collection.mutable.Map[(Double, Long), Long]()
          it.foreach { jc =>
            val d = if (isAccumulate(jc.kind)) 1L else -1L
            counts((jc.left, jc.right)) = counts.getOrElse((jc.left, jc.right), 0L) + d
          }
          counts.collect { case ((lv, rv), c) if c > 0 => (uid, lv, rv) }.iterator
      }.toDF("user_id", "last_value", "n_purchases")
        .orderBy("user_id")
    },
    Some("""SELECT l.user_id, l.last_value, r.n_purchases
           |FROM (SELECT user_id, arg_max(value, event_id) AS last_value
           |      FROM events GROUP BY user_id) l
           |JOIN (SELECT user_id, count(*) AS n_purchases
           |      FROM events WHERE event_type = 'purchase' GROUP BY user_id) r
           |  ON l.user_id = r.user_id
           |ORDER BY l.user_id""".stripMargin))

  val all: Seq[Q] = Seq(qChangelogJoin)
}
