package graft.cep

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** CEP / MATCH_RECOGNIZE core (reference: flink-libraries/flink-cep/src/main/
  * java/org/apache/flink/cep/pattern/Pattern.java — begin:129, where:156,
  * next:262, followedBy:291, within:245 — and the NFA in flink-cep/.../nfa/;
  * SQL surface StreamExecMatch.scala:68).
  *
  * A deliberately small, Spark-first NFA: patterns are sequences of named,
  * predicated steps with strict (`next`) or relaxed (`followedBy`) contiguity
  * and an optional `within` time bound. Execution is per-key over
  * event-ordered input — `mapGroups`-style in batch, `flatMapGroupsWithState`
  * in streaming (partial-run state carries across micro-batches). After-match
  * strategy is SKIP_PAST_LAST_EVENT (the reference default for streams).
  *
  * Scale: state per key is the set of in-flight partial runs, bounded by
  * pattern length × (within-window event count); `within` prunes runs so
  * state cannot grow unboundedly on hot keys.
  */
final case class Step[E](name: String, pred: E => Boolean, strict: Boolean)

final case class Pattern[E](steps: Vector[Step[E]], withinUs: Option[Long] = None) {
  def next(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = true))
  def followedBy(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = false))
  def within(us: Long): Pattern[E] = copy(withinUs = Some(us))
}

object Pattern {
  def begin[E](name: String)(pred: E => Boolean): Pattern[E] =
    Pattern(Vector(Step(name, pred, strict = true)))

  /** One NFA transition over a batch of events, starting from carried-over
    * in-flight runs — the streaming building block (runs persist in
    * GroupState across micro-batches). Returns (matches, surviving runs). */
  def advance[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long,
      initial: Vector[(Int, Long, Vector[E])])
      : (Vector[Vector[E]], Vector[(Int, Long, Vector[E])]) = {
    val out = Vector.newBuilder[Vector[E]]
    var runs = initial
    events.foreach { e =>
      val t = tsOf(e)
      // prune expired runs
      runs = runs.filter { case (_, t0, _) =>
        p.withinUs.forall(w => t - t0 <= w)
      }
      var completed: Option[Vector[E]] = None
      val advanced = Vector.newBuilder[(Int, Long, Vector[E])]
      runs.foreach { case (i, t0, acc) =>
        val step = p.steps(i)
        if (step.pred(e)) {
          if (i + 1 == p.steps.length) {
            if (completed.isEmpty) completed = Some(acc :+ e)
          } else advanced += ((i + 1, t0, acc :+ e))
        } else if (!step.strict) advanced += ((i, t0, acc)) // relaxed: skip event
        // strict miss: run dies
      }
      runs = advanced.result()
      // a new run may begin at every event
      if (p.steps.head.pred(e)) {
        if (p.steps.length == 1) { if (completed.isEmpty) completed = Some(Vector(e)) }
        else runs = runs :+ ((1, t, Vector(e)))
      }
      completed.foreach { m =>
        out += m
        runs = Vector.empty // SKIP_PAST_LAST_EVENT
      }
    }
    (out.result(), runs)
  }

  /** Run the NFA over one key's events (must be pre-sorted by event time /
    * order key). Returns completed matches as lists of matched events.
    * SKIP_PAST_LAST_EVENT: after a match completes, in-flight runs are
    * discarded and matching restarts after the closing event. */
  def run[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long): Iterator[Vector[E]] =
    advance(p, events, tsOf, Vector.empty)._1.iterator
}

/** CEP queries over the events fixture. */
object CepOps {
  import graft.streaming.StatefulOps.Ev

  case class CepMatch(user_id: Long, a_id: Long, b_id: Long)
  case class RunsState(runs: List[(Int, Long, List[Long])]) // for streaming carry-over

  private def evSorted(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[Ev]
  }

  /** Strict-contiguity two-step pattern, batch: a `view` immediately followed
    * (in the user's event sequence) by a `purchase`. Oracle: lead() window —
    * exactly the rewrite the reference's MATCH_RECOGNIZE planner would emit
    * for `PATTERN (A B)`. */
  val qCepNext: Q = Q(
    "q_cep_next",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "view")
        .next("b")(_.event_type == "purchase")
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
          Pattern.run(pat, it.toSeq.sortBy(_.event_id).iterator, (_: Ev).ts_us)
            .map(m => CepMatch(uid, m(0).event_id, m(1).event_id))
        }
        .toDF()
        .orderBy($"user_id", $"a_id")
    },
    Some("""SELECT user_id, a_id, b_id FROM (
           |  SELECT user_id, event_id AS a_id, event_type,
           |         lead(event_id) OVER w AS b_id,
           |         lead(event_type) OVER w AS b_type
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE event_type = 'view' AND b_type = 'purchase'
           |ORDER BY user_id, a_id""".stripMargin))

  /** Relaxed-contiguity (followedBy) + within: signup followed by a purchase
    * within 2 hours, skipping unrelated events in between; after-match skips
    * past the purchase. No simple SQL rewrite exists (overlap suppression is
    * inherently stateful) — covered by unit tests instead of an oracle. */
  val qCepFollowedBy: Q = Q(
    "q_cep_followed_by",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .followedBy("b")(_.event_type == "purchase")
        .within(2L * 3600 * 1000000)
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapGroups { (uid: Long, it: Iterator[Ev]) =>
          Pattern.run(pat, it.toSeq.sortBy(_.event_id).iterator, (_: Ev).ts_us)
            .map(m => CepMatch(uid, m(0).event_id, m(1).event_id))
        }
        .toDF()
        .orderBy($"user_id", $"a_id")
    },
    None)

  /** Streaming CEP: the same NFA with in-flight runs carried across
    * micro-batches in GroupState (reference: the CEP NFA's SharedBuffer
    * state, flink-cep/.../nfa/sharedbuffer/). Events inside a batch are
    * processed in (ts, event_id) order; a partial match started in batch N
    * completes in batch N+k. */
  def streamingMatches[S](
      ds: org.apache.spark.sql.Dataset[Ev],
      pat: Pattern[Ev]): org.apache.spark.sql.Dataset[CepMatch] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[CepRuns]) =>
          val carried = state.getOption.map(_.runs.map {
            case (i, t0, evs) => (i, t0, evs.toVector)
          }.toVector).getOrElse(Vector.empty)
          val (matches, runs) = Pattern.advance(
            pat, it.toSeq.sortBy(e => (e.ts_us, e.event_id)).iterator,
            (_: Ev).ts_us, carried)
          state.update(CepRuns(runs.map { case (i, t0, evs) => (i, t0, evs.toList) }.toList))
          matches.map(m => CepMatch(uid, m.head.event_id, m.last.event_id)).iterator
      }
  }
  case class CepRuns(runs: List[(Int, Long, List[Ev])])

  val all: Seq[Q] = Seq(qCepNext, qCepFollowedBy)
}
