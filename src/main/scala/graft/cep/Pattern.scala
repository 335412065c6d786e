package graft.cep

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** CEP / MATCH_RECOGNIZE core (reference: flink-libraries/flink-cep/src/main/
  * java/org/apache/flink/cep/pattern/Pattern.java — begin:129, where:156,
  * next:262, followedBy:291, within:245, times:129, oneOrMore:186,
  * optional:161, notNext:278, notFollowedBy:305, until:221, greedy:173;
  * quantifiers Quantifier.java; skip strategies nfa/aftermatch/
  * AfterMatchSkipStrategy.java; SQL surface StreamExecMatch.scala:68).
  *
  * A Spark-first NFA: patterns are sequences of named steps, each carrying a
  * predicate, a contiguity mode (strict `next` / relaxed `followedBy`), a
  * quantifier (`times`/`oneOrMore`/`timesOrMore`/`optional`), an optional
  * `until` stop condition, and negative variants (`notNext`/`notFollowedBy`).
  * Execution is per-key over event-ordered input — `flatMapGroups` in batch,
  * `flatMapGroupsWithState` in streaming (in-flight runs carry across
  * micro-batches). After-match strategies: NO_SKIP, SKIP_TO_NEXT,
  * SKIP_PAST_LAST_EVENT (default), SKIP_TO_FIRST/LAST(name).
  *
  * Scale: state per key is the set of in-flight partial runs, deduplicated
  * structurally and bounded by pattern length × (within-window event count);
  * `within` prunes runs so state cannot grow unboundedly on hot keys.
  *
  * Contiguity modes: strict (`next`), relaxed (`followedBy` — skips only
  * events the active step cannot consume), and non-deterministic
  * (`followedByAny` / `allowCombinations` — matchable events may also be
  * skipped, yielding every combination).
  *
  * Documented simplifications vs the reference NFA:
  *  - `greedy` keeps, per start event, only the longest match completing on a
  *    given event (Flink restricts greedy similarly and also rejects it on
  *    the final pattern element — so do we);
  *  - a negative step must be followed by a positive, non-optional step.
  */
final case class Step[E](
    name: String,
    pred: E => Boolean,
    strict: Boolean,
    minTimes: Int = 1,
    maxTimes: Int = 1,
    innerStrict: Boolean = false,
    greedy: Boolean = false,
    until: Option[E => Boolean] = None,
    negative: Boolean = false,
    anyMatch: Boolean = false,      // followedByAny: skip even matchable events
    combinations: Boolean = false,  // allowCombinations: ditto inside the loop
    iterPred: Option[(E, MatchCtx[E]) => Boolean] = None) // iterative condition

/** Read view of a run's consumed-so-far events, passed to iterative
  * conditions (reference IterativeCondition.Context#getEventsForPattern,
  * flink-cep/.../pattern/conditions/IterativeCondition.java:75). */
trait MatchCtx[E] {
  def eventsFor(name: String): Vector[E]
}

sealed trait AfterMatch extends Serializable
object AfterMatch {
  case object NoSkip extends AfterMatch
  case object SkipToNext extends AfterMatch
  case object SkipPastLastEvent extends AfterMatch
  final case class SkipToFirst(name: String) extends AfterMatch
  final case class SkipToLast(name: String) extends AfterMatch
}

/** A completed match: events in consumption order, labeled with their step. */
final case class PMatch[E](labeled: Vector[(String, E)], startOrd: Long) {
  def events: Vector[E] = labeled.map(_._2)
  def apply(i: Int): E = labeled(i)._2
  def head: E = labeled.head._2
  def last: E = labeled.last._2
  def size: Int = labeled.size
  def map[B](f: E => B): Vector[B] = events.map(f)
  def eventsFor(name: String): Vector[E] =
    labeled.collect { case (n, e) if n == name => e }
}

final case class Pattern[E](
    steps: Vector[Step[E]],
    withinUs: Option[Long] = None,
    afterMatch: AfterMatch = AfterMatch.SkipPastLastEvent) {

  private def mod(f: Step[E] => Step[E]): Pattern[E] =
    copy(steps = steps.init :+ f(steps.last))

  def next(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = true))
  def followedBy(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = false))
  /** Relaxed NON-DETERMINISTIC contiguity (reference Pattern#followedByAny:
    * 318): matchable events may also be skipped, yielding every combination
    * — "A followedByAny B" on A B1 B2 matches (A,B1) AND (A,B2). */
  def followedByAny(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = false, anyMatch = true))
  /** The event immediately after the previous step must NOT match `pred`. */
  def notNext(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = true, negative = true))
  /** No event between the previous step and the next accepted step may
    * match `pred` (the run dies if one does). */
  def notFollowedBy(name: String)(pred: E => Boolean): Pattern[E] =
    copy(steps = steps :+ Step(name, pred, strict = false, negative = true))

  def times(n: Int): Pattern[E] = mod(_.copy(minTimes = n, maxTimes = n))
  def times(min: Int, max: Int): Pattern[E] =
    mod(_.copy(minTimes = min, maxTimes = max))
  def oneOrMore: Pattern[E] = mod(_.copy(minTimes = 1, maxTimes = Int.MaxValue))
  def timesOrMore(n: Int): Pattern[E] =
    mod(_.copy(minTimes = n, maxTimes = Int.MaxValue))
  def optional: Pattern[E] = mod(_.copy(minTimes = 0))
  def greedy: Pattern[E] = mod(_.copy(greedy = true))
  /** Loop iterations must be adjacent (Flink `consecutive()`); default is
    * relaxed internal contiguity. */
  def consecutive: Pattern[E] = mod(_.copy(innerStrict = true))
  /** Non-deterministic internal contiguity for the looping step (reference
    * Quantifier#allowCombinations / Pattern#allowCombinations:254): loop
    * iterations may also skip matchable events, yielding all combinations. */
  def allowCombinations: Pattern[E] = mod(_.copy(combinations = true))
  /** OR-extend the last step's predicate (Flink `Pattern#or`). */
  def or(pred2: E => Boolean): Pattern[E] =
    mod(s => { val p0 = s.pred; s.copy(pred = e => p0(e) || pred2(e)) })
  /** AND-extend the last step's predicate (Flink `Pattern#where` chaining). */
  def where(pred2: E => Boolean): Pattern[E] =
    mod(s => { val p0 = s.pred; s.copy(pred = e => p0(e) && pred2(e)) })
  /** AND-extend the last step with an ITERATIVE condition — the predicate
    * sees the run's previously-consumed events by step name (reference
    * IterativeCondition, e.g. "take this B only if its value exceeds the
    * first A's"). Chained calls AND together. */
  def whereWith(pred2: (E, MatchCtx[E]) => Boolean): Pattern[E] =
    mod { s =>
      val p0 = s.iterPred
      s.copy(iterPred = Some((e, ctx) =>
        p0.forall(f => f(e, ctx)) && pred2(e, ctx)))
    }
  /** Stop accepting loop iterations once `pred` matches (Flink `until`). */
  def until(pred: E => Boolean): Pattern[E] = mod(_.copy(until = Some(pred)))
  def within(us: Long): Pattern[E] = copy(withinUs = Some(us))
  def afterMatchSkip(s: AfterMatch): Pattern[E] = copy(afterMatch = s)

  /** Append a GROUP sequence repeated `n` times (reference GroupPattern.java
    * — `followedBy(Pattern).times(n)`): bounded repetition by NFA expansion,
    * inlining the group's steps n times. Step names are kept verbatim, so
    * `eventsFor(name)` accumulates across repetitions exactly like the
    * reference's getEventsForPattern on a quantified group. Repetition
    * boundaries (and the joint to the preceding step) use relaxed
    * contiguity unless `consecutive` (Flink's `consecutive()` on the
    * group). Unbounded group quantifiers (`oneOrMore` on a group) are not
    * supported — expansion is bounded by construction; use `times`. */
  def followedByGroup(group: Pattern[E], n: Int,
      consecutive: Boolean = false): Pattern[E] = {
    require(n >= 1, "group repetition must be >= 1")
    require(group.withinUs.isEmpty && group.steps.nonEmpty,
      "group must be a plain step sequence (apply within/afterMatch on the outer pattern)")
    val copies = Vector.tabulate(n) { k =>
      group.steps.zipWithIndex.map { case (s, j) =>
        // joint INTO the group (copy 0): relaxed — that's the followedBy
        // combinator's strategy; boundaries BETWEEN repetitions (copy k>0):
        // strict only under `consecutive`, matching Flink's consecutive()
        // on a quantified group. Interior steps keep their own contiguity.
        if (j == 0) s.copy(strict = k > 0 && consecutive) else s
      }
    }.flatten
    copy(steps = steps ++ copies)
  }
}

object Pattern {
  def begin[E](name: String)(pred: E => Boolean): Pattern[E] =
    Pattern(Vector(Step(name, pred, strict = true)))

  /** Start a pattern with a quantified GROUP (reference
    * `Pattern.begin(Pattern)` → GroupPattern.java): the group sequence
    * repeated `n` times via bounded expansion; see
    * [[Pattern.followedByGroup]] for the contiguity/labeling contract. */
  def beginGroup[E](group: Pattern[E], n: Int,
      consecutive: Boolean = false): Pattern[E] = {
    val expanded = Pattern(Vector.empty[Step[E]])
      .followedByGroup(group, n, consecutive)
    // the very first step anchors the run; contiguity before it is moot
    expanded.copy(steps = expanded.steps.head.copy(strict = true) +: expanded.steps.tail)
  }

  /** An in-flight partial run. `step`/`cnt` = current NFA state (cnt events
    * consumed by the current step); `gap` = at least one event has passed
    * un-consumed since the last consume (blocks strict-contiguity takes);
    * `acc` = consumed events labeled by step index. */
  final case class Run[E](step: Int, cnt: Int, startOrd: Long, startTs: Long,
      gap: Boolean, acc: Vector[(Int, E)])

  private def validate[E](p: Pattern[E]): Unit = {
    require(p.steps.nonEmpty, "empty pattern")
    require(!p.steps.head.negative, "pattern cannot begin with a negative step")
    require(!p.steps.last.negative, "pattern cannot end with a negative step")
    require(!p.steps.last.greedy,
      "greedy is not applicable to the last element of a pattern")
    p.steps.zipWithIndex.foreach { case (s, i) =>
      if (s.negative) {
        require(s.minTimes == 1 && s.maxTimes == 1,
          "negative steps cannot be quantified")
        val n = p.steps(i + 1)
        require(!n.negative && n.minTimes >= 1,
          "a negative step must be followed by a positive non-optional step")
      }
      require(s.minTimes <= s.maxTimes && s.maxTimes >= 1, s"bad quantifier on ${s.name}")
    }
  }

  /** Epsilon closure: states reachable without consuming — advance past steps
    * whose min count is satisfied. Negative steps block the chain (they are
    * resolved by events); the terminal state is index == steps.length. */
  private def closure[E](p: Pattern[E], step: Int, cnt: Int): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var i = step; var c = cnt
    out += ((i, c))
    while (i < p.steps.length && !p.steps(i).negative && c >= p.steps(i).minTimes) {
      i += 1; c = 0
      out += ((i, c))
    }
    out.result()
  }

  private def reachesEnd[E](p: Pattern[E], step: Int, cnt: Int): Boolean =
    closure(p, step, cnt).last._1 == p.steps.length

  /** Offer event `e` to run `r`: returns (newRun, consumedThisEvent) pairs
    * for every nondeterministic branch that stays alive. */
  private def offer[E](p: Pattern[E], r: Run[E], e: E): Vector[(Run[E], Boolean)] = {
    val len = p.steps.length
    val out = Vector.newBuilder[(Run[E], Boolean)]

    // consume/survive decision at one positive state
    def positive(i: Int, c: Int, gap: Boolean, acc: Vector[(Int, E)]): Unit = {
      val st = p.steps(i)
      val contiguous = if (c == 0) st.strict else st.innerStrict
      val nondet = if (c == 0) st.anyMatch else st.combinations
      lazy val ctx: MatchCtx[E] = new MatchCtx[E] {
        override def eventsFor(name: String): Vector[E] =
          acc.collect { case (si, ev) if p.steps(si).name == name => ev }
      }
      // until is PERMANENT (Flink's stop condition, Pattern.java until): once
      // it matches, the loop state stops accepting iterations for good — the
      // branch must not survive AT the loop to take later events; branches
      // already advanced past the loop by the epsilon closure carry on
      val untilFired = st.until.exists(u => u(e))
      val takeOk = c < st.maxTimes && (!contiguous || !gap) &&
        !untilFired && st.pred(e) &&
        st.iterPred.forall(f => f(e, ctx))
      if (takeOk)
        out += ((Run(i, c + 1, r.startOrd, r.startTs, gap = false, acc :+ ((i, e))), true))
      // survive without consuming: always possible on a relaxed non-match;
      // under non-deterministic contiguity also BESIDE a successful take
      if (c < st.maxTimes && !contiguous && !untilFired && (!takeOk || nondet))
        out += ((Run(i, c, r.startOrd, r.startTs, gap = true, acc), false))
      // strict miss, count exhausted, or until fired: this branch dies
    }

    closure(p, r.step, r.cnt).foreach { case (i, c) =>
      if (i < len) {
        val st = p.steps(i)
        if (!st.negative) positive(i, c, r.gap, r.acc)
        else if (!st.pred(e)) {
          if (st.strict) {
            // notNext: only meaningful on the event directly after the
            // previous consume; once resolved, `e` is offered to the next
            // step under that step's own contiguity
            if (!r.gap) positive(i + 1, 0, gap = false, r.acc)
          } else {
            // notFollowedBy: keep watching, and `e` may start the next step
            val nst = p.steps(i + 1)
            lazy val nctx: MatchCtx[E] = new MatchCtx[E] {
              override def eventsFor(name: String): Vector[E] =
                r.acc.collect { case (si, ev) if p.steps(si).name == name => ev }
            }
            if (nst.until.forall(u => !u(e)) && nst.pred(e) &&
                nst.iterPred.forall(f => f(e, nctx)))
              out += ((Run(i + 1, 1, r.startOrd, r.startTs, gap = false,
                r.acc :+ ((i + 1, e))), true))
            else
              out += ((Run(i, 0, r.startOrd, r.startTs, gap = true, r.acc), false))
          }
        }
        // negative predicate matched: branch dies
      }
    }
    out.result()
  }

  /** One NFA pass over a batch of events, starting from carried-over
    * in-flight runs — the streaming building block (runs persist in
    * GroupState across micro-batches). Returns (matches, surviving runs). */
  def advance[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long,
      ordOf: E => Long, initial: Vector[Run[E]])
      : (Vector[PMatch[E]], Vector[Run[E]]) = {
    val (m, r, _) = advanceFull(p, events, tsOf, ordOf, initial, endOfInput = false)
    (m, r)
  }

  /** [[advance]] plus the TIMEOUT SIDE: partial runs pruned because their
    * `within` window expired are returned as partial matches (reference
    * PatternStream.select with a PatternTimeoutFunction + timeout OutputTag,
    * flink-cep/.../PatternTimeoutFunction.java). With `endOfInput` the
    * bounded-input watermark is +∞, so every surviving partial run of a
    * `within` pattern times out too (a streaming caller passes false and
    * carries survivors to the next batch). */
  def advanceFull[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long,
      ordOf: E => Long, initial: Vector[Run[E]], endOfInput: Boolean)
      : (Vector[PMatch[E]], Vector[Run[E]], Vector[PMatch[E]]) = {
    validate(p)
    val matches = Vector.newBuilder[PMatch[E]]
    val timeouts = Vector.newBuilder[PMatch[E]]
    def timeOut(rs: Iterable[Run[E]]): Unit =
      rs.foreach { r =>
        // only PARTIAL runs time out: a run whose state epsilon-reaches the
        // terminal state already emitted its match (it may linger one event
        // as a spent NoSkip branch — that is not a timeout)
        if (r.acc.nonEmpty && !reachesEnd(p, r.step, r.cnt))
          timeouts += PMatch(r.acc.map { case (i, ev) => (p.steps(i).name, ev) },
            r.startOrd)
      }
    var runs = initial
    val anyGreedy = p.steps.exists(_.greedy)

    events.foreach { e =>
      val t = tsOf(e); val o = ordOf(e)
      // prune expired runs before processing; the pruned partials ARE the
      // pattern's timeout side. The boundary is EXCLUSIVE of the window
      // length (reference NFA.java:277 prunes at timestamp - start >=
      // windowTime): a match spanning exactly `within` is rejected.
      p.withinUs.foreach { w =>
        val (expired, alive) = runs.partition(r => t - r.startTs >= w)
        timeOut(expired)
        runs = alive
      }

      val produced = Vector.newBuilder[(Run[E], Boolean)]
      runs.foreach(r => produced ++= offer(p, r, e))
      // a new run may begin at every event; keep it only if it consumed
      produced ++= offer(p, Run(0, 0, o, t, gap = false, Vector.empty), e)
        .filter(_._2)

      val producedV = produced.result()
      var next = producedV.map(_._1).distinct
      var completed = producedV.collect {
        case (r, true) if reachesEnd(p, r.step, r.cnt) =>
          (r, PMatch(r.acc.map { case (i, ev) => (p.steps(i).name, ev) }, r.startOrd))
      }.distinctBy(_._2.labeled)

      // greedy: per start event keep only the longest match closing here
      if (anyGreedy && completed.nonEmpty)
        completed = completed.groupBy(_._2.startOrd).values
          .map(_.maxBy(_._2.size)).toVector

      // after-match skip: process completions earliest-start (longest) first
      val ordered = completed.sortBy { case (_, m) => (m.startOrd, -m.size) }
      p.afterMatch match {
        case AfterMatch.NoSkip =>
          ordered.foreach { case (_, m) => matches += m }
        case AfterMatch.SkipToNext =>
          var emittedStarts = Set.empty[Long]
          ordered.foreach { case (_, m) =>
            if (!emittedStarts.contains(m.startOrd)) {
              emittedStarts += m.startOrd
              matches += m
            }
          }
          next = next.filterNot(r => emittedStarts.contains(r.startOrd))
        case AfterMatch.SkipPastLastEvent =>
          ordered.headOption.foreach { case (_, m) =>
            matches += m
            next = Vector.empty // all in-flight runs started at or before `e`
          }
        case AfterMatch.SkipToFirst(name) =>
          var bound = Long.MinValue
          ordered.foreach { case (_, m) =>
            if (m.startOrd >= bound) {
              matches += m
              val named = m.eventsFor(name)
              if (named.nonEmpty) bound = bound.max(ordOf(named.head))
            }
          }
          if (bound > Long.MinValue) next = next.filter(_.startOrd >= bound)
        case AfterMatch.SkipToLast(name) =>
          var bound = Long.MinValue
          ordered.foreach { case (_, m) =>
            if (m.startOrd >= bound) {
              matches += m
              val named = m.eventsFor(name)
              if (named.nonEmpty) bound = bound.max(ordOf(named.last))
            }
          }
          if (bound > Long.MinValue) next = next.filter(_.startOrd >= bound)
      }
      runs = next
    }
    if (endOfInput && p.withinUs.isDefined) {
      // bounded input: final watermark = +∞, all surviving partials expire
      timeOut(runs)
      runs = Vector.empty
    }
    (matches.result(), runs, timeouts.result().distinctBy(_.labeled))
  }

  /** Watermark-driven pruning (reference flink-cep/.../nfa/NFA.java
    * advanceTime: on a watermark, expire computation states whose `within`
    * window has passed even if no further event arrives for the key).
    * Expired PARTIAL runs are returned as timeout matches — same rule as
    * the per-event prune in [[advanceFull]]; expired spent branches are
    * dropped silently. */
  def advanceTime[E](p: Pattern[E], runs: Vector[Run[E]], nowUs: Long)
      : (Vector[Run[E]], Vector[PMatch[E]]) =
    p.withinUs match {
      case None => (runs, Vector.empty)
      case Some(w) =>
        val (expired, alive) = runs.partition(r => nowUs - r.startTs >= w)
        val tos = expired.collect {
          case r if r.acc.nonEmpty && !reachesEnd(p, r.step, r.cnt) =>
            PMatch(r.acc.map { case (i, ev) => (p.steps(i).name, ev) }, r.startOrd)
        }
        (alive, tos.distinctBy(_.labeled))
    }

  /** Run the NFA over one key's events (must be pre-sorted by event time /
    * order key). Returns completed matches. */
  def run[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long,
      ordOf: E => Long): Iterator[PMatch[E]] =
    advance(p, events, tsOf, ordOf, Vector.empty)._1.iterator

  /** Convenience overload: the timestamp doubles as the order key (fine when
    * timestamps are unique per key, as in the specs/fixtures). */
  def run[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long): Iterator[PMatch[E]] =
    run(p, events, tsOf, tsOf)

  /** Bounded run returning (completed matches, timed-out partial matches). */
  def runWithTimeouts[E](p: Pattern[E], events: Iterator[E], tsOf: E => Long,
      ordOf: E => Long): (Vector[PMatch[E]], Vector[PMatch[E]]) = {
    val (m, _, to) = advanceFull(p, events, tsOf, ordOf, Vector.empty,
      endOfInput = true)
    (m, to)
  }
}

/** CEP queries over the events fixture. */
object CepOps {
  import graft.streaming.StatefulOps.Ev

  case class CepMatch(user_id: Long, a_id: Long, b_id: Long)
  case class CepMatch3(user_id: Long, a1_id: Long, a2_id: Long, b_id: Long)
  case class CepMatchOpt(user_id: Long, a_id: Long, b_id: Option[Long], c_id: Long)
  case class CepLoopMatch(user_id: Long, a_first: Long, a_last: Long,
      b_id: Long, n_views: Long)

  private def evSorted(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_micros($"ts").as("ts_us"))
      .as[Ev]
  }

  private def runPat[M <: Product : org.apache.spark.sql.Encoder](
      s: org.apache.spark.sql.SparkSession, dir: String, pat: Pattern[Ev])(
      mk: (Long, PMatch[Ev]) => Iterator[M]) = {
    import s.implicits._
    // flatMapSortedGroups = secondary sort: event order rides the shuffle's
    // in-partition sort, so the NFA consumes each key's rows as a lazy
    // iterator — no per-key materialization, memory bounded by live runs
    // (the `within` horizon), not by key fanout.
    evSorted(s, dir)
      .groupByKey(_.user_id)
      .flatMapSortedGroups($"event_id") { (uid: Long, it: Iterator[Ev]) =>
        Pattern.run(pat, it, (_: Ev).ts_us, (_: Ev).event_id)
          .flatMap(m => mk(uid, m))
      }
      .toDF()
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
      runPat[CepMatch](s, dir, pat)((uid, m) =>
        Iterator.single(CepMatch(uid, m(0).event_id, m(1).event_id)))
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
    * past the purchase. No single-pass SQL rewrite exists (overlap
    * suppression is inherently stateful), but SKIP_PAST_LAST_EVENT *is*
    * expressible as a per-user recursive chain: each match = the first
    * purchase after the previous match's end that still has a live (≤ 2 h
    * old, unconsumed) signup before it, paired with the EARLIEST such signup
    * — exactly the NFA's earliest-start-first emission + clear-all-runs.
    * The DuckDB oracle replays that chain with a recursive CTE. */
  val qCepFollowedBy: Q = Q(
    "q_cep_followed_by",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .followedBy("b")(_.event_type == "purchase")
        .within(2L * 3600 * 1000000)
      runPat[CepMatch](s, dir, pat)((uid, m) =>
        Iterator.single(CepMatch(uid, m(0).event_id, m(1).event_id)))
        .orderBy($"user_id", $"a_id")
    },
    Some("""WITH RECURSIVE m AS (
           |  SELECT user_id, CAST(-1 AS BIGINT) AS a_id, CAST(-1 AS BIGINT) AS b_id
           |  FROM (SELECT DISTINCT user_id FROM events)
           |  UNION ALL
           |  SELECT m.user_id, nxt.a_id, nxt.b_id
           |  FROM m, LATERAL (
           |    SELECT p.event_id AS b_id,
           |           (SELECT min(s.event_id) FROM events s
           |            WHERE s.user_id = m.user_id AND s.event_type = 'signup'
           |              AND s.event_id > m.b_id AND s.event_id < p.event_id
           |              AND epoch_us(p.ts) - epoch_us(s.ts) < 7200000000) AS a_id
           |    FROM events p
           |    WHERE p.user_id = m.user_id AND p.event_type = 'purchase'
           |      AND p.event_id > m.b_id
           |      AND EXISTS (SELECT 1 FROM events s
           |                  WHERE s.user_id = m.user_id AND s.event_type = 'signup'
           |                    AND s.event_id > m.b_id AND s.event_id < p.event_id
           |                    AND epoch_us(p.ts) - epoch_us(s.ts) < 7200000000)
           |    ORDER BY p.event_id LIMIT 1) nxt
           |)
           |SELECT user_id, a_id, b_id FROM m WHERE a_id >= 0
           |ORDER BY user_id, a_id""".stripMargin))

  /** `times(2).consecutive` + strict close: exactly two adjacent views then
    * an immediate purchase — reference Pattern.times (Pattern.java:129) with
    * strict internal contiguity (consecutive, Pattern.java:203). Overlapping
    * candidates are impossible for this shape, so the lead()-chain rewrite is
    * an exact oracle. */
  val qCepTimes: Q = Q(
    "q_cep_times",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "view")
        .times(2).consecutive
        .next("b")(_.event_type == "purchase")
      runPat[CepMatch3](s, dir, pat) { (uid, m) =>
        val as = m.eventsFor("a")
        Iterator.single(CepMatch3(uid, as(0).event_id, as(1).event_id,
          m.eventsFor("b").head.event_id))
      }.orderBy($"user_id", $"a1_id")
    },
    Some("""SELECT user_id, a1_id, a2_id, b_id FROM (
           |  SELECT user_id, event_id AS a1_id, event_type AS t0,
           |         lead(event_id) OVER w AS a2_id, lead(event_type) OVER w AS t1,
           |         lead(event_id, 2) OVER w AS b_id, lead(event_type, 2) OVER w AS t2
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE t0 = 'view' AND t1 = 'view' AND t2 = 'purchase'
           |ORDER BY user_id, a1_id""".stripMargin))

  /** `oneOrMore.consecutive.greedy`: a maximal run of adjacent views closed
    * by an immediate purchase (reference Pattern.oneOrMore:186 + greedy:173).
    * Oracle: gaps-and-islands — consecutive view runs whose next row is a
    * purchase. */
  val qCepOneOrMore: Q = Q(
    "q_cep_oneormore",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "view")
        .oneOrMore.consecutive.greedy
        .next("b")(_.event_type == "purchase")
      runPat[CepLoopMatch](s, dir, pat) { (uid, m) =>
        val as = m.eventsFor("a")
        Iterator.single(CepLoopMatch(uid, as.head.event_id, as.last.event_id,
          m.eventsFor("b").head.event_id, as.size.toLong))
      }.orderBy($"user_id", $"b_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           |  FROM events),
           |v AS (
           |  SELECT user_id, event_id, rn,
           |         rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
           |  FROM e WHERE event_type = 'view'),
           |g AS (
           |  SELECT user_id, grp, min(event_id) AS a_first, max(event_id) AS a_last,
           |         max(rn) AS max_rn, count(*) AS n_views
           |  FROM v GROUP BY user_id, grp)
           |SELECT p.user_id, g.a_first, g.a_last, p.event_id AS b_id, g.n_views
           |FROM e p JOIN g ON g.user_id = p.user_id AND g.max_rn = p.rn - 1
           |WHERE p.event_type = 'purchase'
           |ORDER BY p.user_id, b_id""".stripMargin))

  /** `optional` quantifier: signup, optionally one view, then an immediate
    * purchase (A B? C, all strict). */
  val qCepOptional: Q = Q(
    "q_cep_optional",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .next("b")(_.event_type == "view").optional
        .next("c")(_.event_type == "purchase")
      runPat[CepMatchOpt](s, dir, pat) { (uid, m) =>
        Iterator.single(CepMatchOpt(uid, m.eventsFor("a").head.event_id,
          m.eventsFor("b").headOption.map(_.event_id),
          m.eventsFor("c").head.event_id))
      }.orderBy($"user_id", $"a_id")
    },
    Some("""SELECT user_id, a_id,
           |       CASE WHEN t1 = 'purchase' THEN NULL ELSE n1 END AS b_id,
           |       CASE WHEN t1 = 'purchase' THEN n1 ELSE n2 END AS c_id
           |FROM (
           |  SELECT user_id, event_id AS a_id, event_type AS t0,
           |         lead(event_id) OVER w AS n1, lead(event_type) OVER w AS t1,
           |         lead(event_id, 2) OVER w AS n2, lead(event_type, 2) OVER w AS t2
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE t0 = 'signup'
           |  AND (t1 = 'purchase' OR (t1 = 'view' AND t2 = 'purchase'))
           |ORDER BY user_id, a_id""".stripMargin))

  /** `notNext`: signup whose immediately-following event is NOT a view, then
    * the first later purchase (reference Pattern.notNext:278). NO_SKIP so
    * every signup is judged independently — which is exactly what the SQL
    * rewrite computes. */
  val qCepNotNext: Q = Q(
    "q_cep_not_next",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .notNext("x")(_.event_type == "view")
        .followedBy("b")(_.event_type == "purchase")
        .afterMatchSkip(AfterMatch.NoSkip)
      runPat[CepMatch](s, dir, pat)((uid, m) =>
        Iterator.single(CepMatch(uid, m.eventsFor("a").head.event_id,
          m.eventsFor("b").head.event_id)))
        .orderBy($"user_id", $"a_id")
    },
    Some("""SELECT user_id, a_id, b_id FROM (
           |  SELECT s.user_id, s.a_id,
           |         (SELECT min(p.event_id) FROM events p
           |          WHERE p.user_id = s.user_id AND p.event_id > s.a_id
           |            AND p.event_type = 'purchase') AS b_id
           |  FROM (
           |    SELECT user_id, event_id AS a_id, event_type AS t0,
           |           lead(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS t1
           |    FROM events) s
           |  WHERE s.t0 = 'signup' AND s.t1 IS NOT NULL AND s.t1 <> 'view')
           |WHERE b_id IS NOT NULL
           |ORDER BY user_id, a_id""".stripMargin))

  /** `notFollowedBy`: signup then a purchase with NO view in between — the
    * run dies the moment a view arrives (reference Pattern.notFollowedBy:305).
    * NO_SKIP: each signup judged independently, matching the SQL rewrite
    * ("first view-or-purchase after the signup is a purchase"). */
  val qCepNotFollowed: Q = Q(
    "q_cep_not_followed",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .notFollowedBy("x")(_.event_type == "view")
        .followedBy("b")(_.event_type == "purchase")
        .afterMatchSkip(AfterMatch.NoSkip)
      runPat[CepMatch](s, dir, pat)((uid, m) =>
        Iterator.single(CepMatch(uid, m.eventsFor("a").head.event_id,
          m.eventsFor("b").head.event_id)))
        .orderBy($"user_id", $"a_id")
    },
    Some("""SELECT n.user_id, n.a_id, n.nxt AS b_id
           |FROM (
           |  SELECT s.user_id, s.event_id AS a_id,
           |         (SELECT min(e.event_id) FROM events e
           |          WHERE e.user_id = s.user_id AND e.event_id > s.event_id
           |            AND e.event_type IN ('view', 'purchase')) AS nxt
           |  FROM events s WHERE s.event_type = 'signup') n
           |JOIN events x ON x.user_id = n.user_id AND x.event_id = n.nxt
           |WHERE x.event_type = 'purchase'
           |ORDER BY n.user_id, n.a_id""".stripMargin))

  case class CepIterRow(user_id: Long, a_id: Long, b_id: Long)

  /** Iterative condition (reference IterativeCondition.java:75): the first
    * later purchase whose value EXCEEDS the matched signup's value — the
    * B-step predicate reads the run's consumed A event via the match
    * context. NO_SKIP judges every signup independently, which is exactly
    * the correlated-subquery rewrite. */
  val qCepIterative: Q = Q(
    "q_cep_iterative",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .followedBy("b")(_.event_type == "purchase")
        .whereWith((e, ctx) => e.value > ctx.eventsFor("a").head.value)
        .afterMatchSkip(AfterMatch.NoSkip)
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapSortedGroups($"event_id") { (uid: Long, it: Iterator[Ev]) =>
          Pattern.run(pat, it, (_: Ev).ts_us, (_: Ev).event_id)
            .map(m => CepIterRow(uid, m.eventsFor("a").head.event_id,
              m.eventsFor("b").head.event_id))
        }
        .toDF().orderBy($"user_id", $"a_id")
    },
    Some("""SELECT user_id, a_id, b_id FROM (
           |  SELECT s.user_id, s.event_id AS a_id,
           |         (SELECT min(p.event_id) FROM events p
           |          WHERE p.user_id = s.user_id AND p.event_id > s.event_id
           |            AND p.event_type = 'purchase' AND p.value > s.value) AS b_id
           |  FROM events s WHERE s.event_type = 'signup')
           |WHERE b_id IS NOT NULL
           |ORDER BY user_id, a_id""".stripMargin))

  case class CepTimeoutRow(user_id: Long, a_id: Long)

  /** Timeout side output (reference PatternTimeoutFunction + OutputTag):
    * signups with NO purchase within 2 hours — the pattern's completed side
    * is q_cep_followed_by; this query emits the runs that EXPIRED instead.
    * NO_SKIP so each signup is judged independently; event time is monotone
    * per user in event_id order (fixture property), so the SQL rewrite
    * ("no purchase within the window after the signup") is exact. */
  val qCepTimeout: Q = Q(
    "q_cep_timeout",
    (s, dir) => {
      import s.implicits._
      val pat = Pattern.begin[Ev]("a")(_.event_type == "signup")
        .followedBy("b")(_.event_type == "purchase")
        .within(2L * 3600 * 1000000)
        .afterMatchSkip(AfterMatch.NoSkip)
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapSortedGroups($"event_id") { (uid: Long, it: Iterator[Ev]) =>
          val (_, tos) = Pattern.runWithTimeouts(pat,
            it, (_: Ev).ts_us, (_: Ev).event_id)
          tos.iterator.map(m => CepTimeoutRow(uid, m.head.event_id))
        }
        .toDF().orderBy($"user_id", $"a_id")
    },
    Some("""SELECT s.user_id, s.event_id AS a_id
           |FROM events s
           |WHERE s.event_type = 'signup' AND NOT EXISTS (
           |  SELECT 1 FROM events p
           |  WHERE p.user_id = s.user_id AND p.event_type = 'purchase'
           |    AND p.event_id > s.event_id
           |    AND epoch_us(p.ts) - epoch_us(s.ts) < 7200000000)
           |ORDER BY s.user_id, a_id""".stripMargin))

  /** Streaming CEP: the same NFA with in-flight runs carried across
    * micro-batches in GroupState (reference: the CEP NFA's SharedBuffer
    * state, flink-cep/.../nfa/sharedbuffer/). Events inside a batch are
    * processed in (ts, event_id) order; a partial match started in batch N
    * completes in batch N+k. */
  def streamingMatches(
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
            case (i, c, so, t0, g, evs) => Pattern.Run(i, c, so, t0, g, evs.toVector)
          }.toVector).getOrElse(Vector.empty)
          val (matches, runs) = Pattern.advance(
            pat, it.toSeq.sortBy(e => (e.ts_us, e.event_id)).iterator,
            (_: Ev).ts_us, (_: Ev).event_id, carried)
          state.update(CepRuns(runs.map(r =>
            (r.step, r.cnt, r.startOrd, r.startTs, r.gap, r.acc.toList)).toList))
          matches.map(m => CepMatch(uid, m.head.event_id, m.last.event_id)).iterator
      }
  }
  case class CepRuns(runs: List[(Int, Int, Long, Long, Boolean, List[(Int, Ev)])])

  case class CepStreamOut(user_id: Long, a_id: Long, b_id: Long,
      is_timeout: Boolean)

  /** Streaming CEP with the TIMEOUT SIDE interleaved (reference
    * PatternStream.select(timeoutTag, PatternTimeoutFunction, ...)): matched
    * runs emit (a, b, is_timeout=false); partial runs whose `within` window
    * expires mid-stream emit (a, a, is_timeout=true). In-flight runs still
    * carry across micro-batches; expiry is driven by later events arriving
    * for the key, exactly like the batch NFA's prune. */
  def streamingMatchesWithTimeouts(
      ds: org.apache.spark.sql.Dataset[Ev],
      pat: Pattern[Ev]): org.apache.spark.sql.Dataset[CepStreamOut] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev],
         state: org.apache.spark.sql.streaming.GroupState[CepRuns]) =>
          val carried = state.getOption.map(_.runs.map {
            case (i, c, so, t0, g, evs) => Pattern.Run(i, c, so, t0, g, evs.toVector)
          }.toVector).getOrElse(Vector.empty)
          val (matches, runs, timeouts) = Pattern.advanceFull(
            pat, it.toSeq.sortBy(e => (e.ts_us, e.event_id)).iterator,
            (_: Ev).ts_us, (_: Ev).event_id, carried, endOfInput = false)
          state.update(CepRuns(runs.map(r =>
            (r.step, r.cnt, r.startOrd, r.startTs, r.gap, r.acc.toList)).toList))
          (matches.map(m =>
             CepStreamOut(uid, m.head.event_id, m.last.event_id, is_timeout = false)) ++
           timeouts.map(t =>
             CepStreamOut(uid, t.head.event_id, t.head.event_id, is_timeout = true))
          ).iterator
      }
  }

  case class CepGroupRow(user_id: Long, v1_id: Long, c1_id: Long,
      v2_id: Long, c2_id: Long)

  /** Quantified GROUP pattern (reference GroupPattern.java —
    * `Pattern.begin(view next click).times(2).consecutive()`): the sequence
    * (view, click) repeated twice with strict contiguity throughout, via
    * bounded NFA expansion. SkipPastLastEvent makes matches non-overlapping
    * earliest-first; the oracle finds all strict 4-chains with lead() and
    * replays the greedy non-overlap selection with a recursive CTE. */
  val qCepGroup: Q = Q(
    "q_cep_group",
    (s, dir) => {
      import s.implicits._
      val grp = Pattern.begin[Ev]("v")(_.event_type == "view")
        .next("c")(_.event_type == "click")
      val pat = Pattern.beginGroup(grp, 2, consecutive = true)
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapSortedGroups($"event_id") { (uid: Long, it: Iterator[Ev]) =>
          Pattern.run(pat, it, (_: Ev).ts_us, (_: Ev).event_id).map { m =>
            val vs = m.eventsFor("v"); val cs = m.eventsFor("c")
            CepGroupRow(uid, vs(0).event_id, cs(0).event_id,
              vs(1).event_id, cs(1).event_id)
          }
        }
        .toDF().orderBy($"user_id", $"v1_id")
    },
    Some("""WITH RECURSIVE cand AS (
           |  SELECT user_id, event_id AS v1_id, c1_id, v2_id, c2_id
           |  FROM (SELECT user_id, event_id, event_type,
           |               lead(event_type, 1) OVER w AS ty1,
           |               lead(event_id, 1) OVER w AS c1_id,
           |               lead(event_type, 2) OVER w AS ty2,
           |               lead(event_id, 2) OVER w AS v2_id,
           |               lead(event_type, 3) OVER w AS ty3,
           |               lead(event_id, 3) OVER w AS c2_id
           |        FROM events
           |        WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |  WHERE event_type = 'view' AND ty1 = 'click'
           |    AND ty2 = 'view' AND ty3 = 'click'),
           |m AS (
           |  SELECT user_id, CAST(-1 AS BIGINT) AS v1_id,
           |         CAST(-1 AS BIGINT) AS c1_id, CAST(-1 AS BIGINT) AS v2_id,
           |         CAST(-1 AS BIGINT) AS c2_id
           |  FROM (SELECT DISTINCT user_id FROM events)
           |  UNION ALL
           |  SELECT m.user_id, nxt.v1_id, nxt.c1_id, nxt.v2_id, nxt.c2_id
           |  FROM m, LATERAL (
           |    SELECT c.v1_id, c.c1_id, c.v2_id, c.c2_id
           |    FROM cand c
           |    WHERE c.user_id = m.user_id AND c.v1_id > m.c2_id
           |    ORDER BY c.v1_id LIMIT 1) nxt)
           |SELECT user_id, v1_id, c1_id, v2_id, c2_id FROM m
           |WHERE v1_id >= 0 ORDER BY user_id, v1_id""".stripMargin))

  /** Group repetition with RELAXED boundaries (the default — Flink's group
    * without consecutive()): (view next click) twice, skipping freely
    * between the copies. The NFA replay is deterministic: within a copy the
    * strict step kills non-adjacent runs; at the boundary the relaxed view
    * step consumes the FIRST view (matchable events must be consumed under
    * followedBy), and first-v-after is monotone in the start position, so
    * the earliest start always completes first — the oracle recursion picks
    * min start past the previous match's end. */
  val qCepGroupRelaxed: Q = Q(
    "q_cep_group_relaxed",
    (s, dir) => {
      import s.implicits._
      val grp = Pattern.begin[Ev]("v")(_.event_type == "view")
        .next("c")(_.event_type == "click")
      val pat = Pattern.beginGroup(grp, 2) // relaxed repetition boundary
      evSorted(s, dir)
        .groupByKey(_.user_id)
        .flatMapSortedGroups($"event_id") { (uid: Long, it: Iterator[Ev]) =>
          Pattern.run(pat, it, (_: Ev).ts_us, (_: Ev).event_id).map { m =>
            val vs = m.eventsFor("v"); val cs = m.eventsFor("c")
            CepGroupRow(uid, vs(0).event_id, cs(0).event_id,
              vs(1).event_id, cs(1).event_id)
          }
        }
        .toDF().orderBy($"user_id", $"v1_id")
    },
    Some("""WITH RECURSIVE e AS (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           |  FROM events),
           |cand AS (
           |  SELECT a.user_id, a.rn AS v1_rn, a.event_id AS v1_id,
           |         b.event_id AS c1_id, j.rn AS v2_rn, j.event_id AS v2_id,
           |         k.rn AS c2_rn, k.event_id AS c2_id
           |  FROM e a
           |  JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
           |  JOIN LATERAL (
           |    SELECT rn, event_id FROM e v
           |    WHERE v.user_id = a.user_id AND v.rn > a.rn + 1
           |      AND v.event_type = 'view'
           |    ORDER BY v.rn LIMIT 1) j ON TRUE
           |  JOIN e k ON k.user_id = a.user_id AND k.rn = j.rn + 1
           |  WHERE a.event_type = 'view' AND b.event_type = 'click'
           |    AND k.event_type = 'click'),
           |m AS (
           |  SELECT user_id, CAST(-1 AS BIGINT) AS v1_id, CAST(-1 AS BIGINT) AS c1_id,
           |         CAST(-1 AS BIGINT) AS v2_id, CAST(-1 AS BIGINT) AS c2_id,
           |         CAST(0 AS BIGINT) AS end_rn
           |  FROM (SELECT DISTINCT user_id FROM events)
           |  UNION ALL
           |  SELECT m.user_id, nxt.v1_id, nxt.c1_id, nxt.v2_id, nxt.c2_id, nxt.c2_rn
           |  FROM m, LATERAL (
           |    SELECT c.v1_id, c.c1_id, c.v2_id, c.c2_id, c.c2_rn
           |    FROM cand c
           |    WHERE c.user_id = m.user_id AND c.v1_rn > m.end_rn
           |    ORDER BY c.v1_rn LIMIT 1) nxt)
           |SELECT user_id, v1_id, c1_id, v2_id, c2_id FROM m
           |WHERE v1_id >= 0 ORDER BY user_id, v1_id""".stripMargin))

  val all: Seq[Q] = Seq(qCepNext, qCepFollowedBy, qCepTimes, qCepOneOrMore,
    qCepOptional, qCepNotNext, qCepNotFollowed, qCepTimeout, qCepIterative,
    qCepGroup, qCepGroupRelaxed)
}
