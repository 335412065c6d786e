package graft

import graft.cep.Pattern
import graft.streaming.StatefulOps.Ev

class CepSpec extends GraftSpec {

  private def ev(id: Long, tpe: String, tsUs: Long = 0): Ev =
    Ev(id, 1L, tpe, 0.0, if (tsUs == 0) id * 1000000 else tsUs)

  private val strict = Pattern.begin[Ev]("a")(_.event_type == "A")
    .next("b")(_.event_type == "B")

  test("strict contiguity matches only adjacent events") {
    val events = Seq(ev(1, "A"), ev(2, "X"), ev(3, "B"), ev(4, "A"), ev(5, "B"))
    val m = Pattern.run(strict, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(4L, 5L)))
  }

  test("relaxed contiguity skips intervening events") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
    val events = Seq(ev(1, "A"), ev(2, "X"), ev(3, "B"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 3L)))
  }

  test("within prunes runs whose window expired") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
      .within(1500000) // 1.5s in µs; events are 1s apart
    val events = Seq(ev(1, "A"), ev(2, "X"), ev(3, "B")) // A->B gap 2s: expired
    assert(Pattern.run(p, events.iterator, (_: Ev).ts_us).isEmpty)
    val events2 = Seq(ev(1, "A"), ev(2, "B")) // 1s gap: ok
    assert(Pattern.run(p, events2.iterator, (_: Ev).ts_us).size == 1)
  }

  test("after-match skip-past-last suppresses overlapping matches") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
    // A1 A2 B: only one match (A1,B) — A2's run dies when the match closes
    val events = Seq(ev(1, "A"), ev(2, "A"), ev(3, "B"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 3L)))
  }

  test("three-step pattern") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
      .followedBy("c")(_.event_type == "C")
    val events = Seq(ev(1, "A"), ev(2, "B"), ev(3, "X"), ev(4, "C"), ev(5, "A"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 2L, 4L)))
  }

  test("q_cep_next equals the lead()-window rewrite on real data") {
    Tables.registerAll(spark, sfDir)
    val nfa = cep.CepOps.qCepNext.run(spark, sfDir).collect().map(_.toSeq).toSet
    val sql = spark.sql(
      """SELECT user_id, a_id, b_id FROM (
        |  SELECT user_id, event_id AS a_id, event_type,
        |         lead(event_id) OVER w AS b_id, lead(event_type) OVER w AS b_type
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |WHERE event_type = 'view' AND b_type = 'purchase'""".stripMargin)
      .collect().map(_.toSeq).toSet
    assert(nfa == sql)
  }
}

/** Quantifier / negative-pattern / skip-strategy coverage for the extended
  * NFA (reference flink-cep Pattern.java:129-305, Quantifier.java,
  * aftermatch/AfterMatchSkipStrategy.java). */
class CepQuantifierSpec extends GraftSpec {
  import graft.cep.{AfterMatch, Pattern}
  import graft.streaming.StatefulOps.Ev

  private def ev(id: Long, tpe: String): Ev = Ev(id, 1L, tpe, 0.0, id * 1000000)
  private def ids(m: graft.cep.PMatch[Ev]): Vector[Long] = m.map(_.event_id)

  test("times(n) requires exactly n loop iterations") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").times(2).consecutive
      .next("b")(_.event_type == "B")
    val m = Pattern.run(p, Seq(ev(1, "A"), ev(2, "A"), ev(3, "B")).iterator,
      (_: Ev).ts_us).toList
    assert(m.map(ids) == List(Vector(1L, 2L, 3L)))
    // only one A: no match
    assert(Pattern.run(p, Seq(ev(1, "A"), ev(2, "B")).iterator, (_: Ev).ts_us).isEmpty)
  }

  test("times(min,max) matches any count in range") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").times(1, 2).consecutive
      .next("b")(_.event_type == "B")
    val m2 = Pattern.run(p, Seq(ev(1, "A"), ev(2, "A"), ev(3, "B")).iterator,
      (_: Ev).ts_us).toList
    // longest-start-first under SKIP_PAST_LAST: both As consumed
    assert(m2.map(ids) == List(Vector(1L, 2L, 3L)))
    val m1 = Pattern.run(p, Seq(ev(1, "A"), ev(2, "B")).iterator, (_: Ev).ts_us).toList
    assert(m1.map(ids) == List(Vector(1L, 2L)))
    // three As: only the last two fit max=2 for the earliest surviving run
    val m3 = Pattern.run(p, Seq(ev(1, "A"), ev(2, "A"), ev(3, "A"), ev(4, "B")).iterator,
      (_: Ev).ts_us).toList
    assert(m3.map(ids) == List(Vector(2L, 3L, 4L)))
  }

  test("oneOrMore greedy takes the maximal consecutive run") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore.consecutive.greedy
      .next("b")(_.event_type == "B")
    val m = Pattern.run(p,
      Seq(ev(1, "A"), ev(2, "A"), ev(3, "A"), ev(4, "B")).iterator, (_: Ev).ts_us).toList
    assert(m.map(ids) == List(Vector(1L, 2L, 3L, 4L)))
  }

  test("timesOrMore enforces the minimum") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").timesOrMore(3).consecutive
      .next("b")(_.event_type == "B")
    assert(Pattern.run(p, Seq(ev(1, "A"), ev(2, "A"), ev(3, "B")).iterator,
      (_: Ev).ts_us).isEmpty)
    val m = Pattern.run(p,
      Seq(ev(1, "A"), ev(2, "A"), ev(3, "A"), ev(4, "B")).iterator, (_: Ev).ts_us).toList
    assert(m.map(ids) == List(Vector(1L, 2L, 3L, 4L)))
  }

  test("optional step may be absent or present") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .next("b")(_.event_type == "B").optional
      .next("c")(_.event_type == "C")
    val withB = Pattern.run(p, Seq(ev(1, "A"), ev(2, "B"), ev(3, "C")).iterator,
      (_: Ev).ts_us).toList
    assert(withB.map(ids) == List(Vector(1L, 2L, 3L)))
    val withoutB = Pattern.run(p, Seq(ev(1, "A"), ev(2, "C")).iterator,
      (_: Ev).ts_us).toList
    assert(withoutB.map(ids) == List(Vector(1L, 2L)))
    // an intervening non-B non-C kills the strict chain
    assert(Pattern.run(p, Seq(ev(1, "A"), ev(2, "X"), ev(3, "C")).iterator,
      (_: Ev).ts_us).isEmpty)
  }

  test("or() extends the step predicate") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").or(_.event_type == "A2")
      .next("b")(_.event_type == "B")
    val m = Pattern.run(p, Seq(ev(1, "A2"), ev(2, "B")).iterator, (_: Ev).ts_us).toList
    assert(m.map(ids) == List(Vector(1L, 2L)))
  }

  test("until() stops the loop accepting further events") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore.consecutive
      .until(_.value > 100)
      .next("b")(_.event_type == "B")
    val events = Seq(ev(1, "A"), Ev(2, 1L, "A", 200.0, 2000000), ev(3, "B"))
    // second A hits until → loop closes at one event; strict next B fails on
    // the A at t=2 → no match survives
    assert(Pattern.run(p, events.iterator, (_: Ev).ts_us).isEmpty)
  }

  test("until() is PERMANENT on a relaxed loop: no iterations accepted after the stop event") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore
      .until(_.value > 100)
      .followedBy("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip) // see every match: the default
                                         // skip would suppress the overlap
    val events = Seq(ev(1, "A"), Ev(2, 1L, "A", 200.0, 2000000), ev(3, "A"), ev(4, "B"))
    // the stop event at t=2 closes every live loop for good: the A at t=3
    // must NOT extend the run started at t=1 (Flink's stop condition), and
    // no run may START on the stop event itself — matches are (1,4) from
    // the pre-stop loop and (3,4) from a fresh post-stop run
    val ms = Pattern.run(p, events.iterator, (_: Ev).ts_us).map(ids).toSet
    assert(ms == Set(Vector(1L, 4L), Vector(3L, 4L)), ms)
  }

  test("notNext rejects when the immediate successor matches") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .notNext("x")(_.event_type == "X")
      .followedBy("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    assert(Pattern.run(p, Seq(ev(1, "A"), ev(2, "X"), ev(3, "B")).iterator,
      (_: Ev).ts_us).isEmpty)
    val ok = Pattern.run(p, Seq(ev(1, "A"), ev(2, "Y"), ev(3, "B")).iterator,
      (_: Ev).ts_us).toList
    assert(ok.map(ids) == List(Vector(1L, 3L)))
    // the non-X successor may itself be B
    val direct = Pattern.run(p, Seq(ev(1, "A"), ev(2, "B")).iterator, (_: Ev).ts_us).toList
    assert(direct.map(ids) == List(Vector(1L, 2L)))
  }

  test("notFollowedBy kills the run on any intervening match") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .notFollowedBy("x")(_.event_type == "X")
      .followedBy("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    assert(Pattern.run(p, Seq(ev(1, "A"), ev(2, "Y"), ev(3, "X"), ev(4, "B")).iterator,
      (_: Ev).ts_us).isEmpty)
    val ok = Pattern.run(p, Seq(ev(1, "A"), ev(2, "Y"), ev(3, "B")).iterator,
      (_: Ev).ts_us).toList
    assert(ok.map(ids) == List(Vector(1L, 3L)))
  }

  test("NO_SKIP emits overlapping matches; SKIP_TO_NEXT dedupes per start") {
    val base = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
    // A1 A2 B: NoSkip → (A1,B) and (A2,B); SkipToNext → both too (distinct
    // starts); SkipPastLast → only (A1,B)
    val events = Seq(ev(1, "A"), ev(2, "A"), ev(3, "B"))
    val noSkip = Pattern.run(base.afterMatchSkip(AfterMatch.NoSkip),
      events.iterator, (_: Ev).ts_us).toList
    assert(noSkip.map(ids).toSet == Set(Vector(1L, 3L), Vector(2L, 3L)))
    val toNext = Pattern.run(base.afterMatchSkip(AfterMatch.SkipToNext),
      events.iterator, (_: Ev).ts_us).toList
    assert(toNext.map(ids).toSet == Set(Vector(1L, 3L), Vector(2L, 3L)))
    val pastLast = Pattern.run(base, events.iterator, (_: Ev).ts_us).toList
    assert(pastLast.map(ids) == List(Vector(1L, 3L)))
  }

  test("SKIP_TO_FIRST resumes at the first event of the named step") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore.consecutive
      .next("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.SkipToFirst("b"))
    // A A B: emit the (A,A,B) match; runs started before B are pruned
    val m = Pattern.run(p, Seq(ev(1, "A"), ev(2, "A"), ev(3, "B")).iterator,
      (_: Ev).ts_us).toList
    assert(m.nonEmpty && m.head.eventsFor("b").map(_.event_id) == Vector(3L))
  }

  test("greedy on the last pattern element is rejected") {
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore.greedy
    intercept[IllegalArgumentException] {
      Pattern.run(p, Seq(ev(1, "A")).iterator, (_: Ev).ts_us).toList
    }
  }

  test("streaming carry-over preserves quantified runs across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Ev]
    val pat = Pattern.begin[Ev]("a")(_.event_type == "A").times(2).consecutive
      .next("b")(_.event_type == "B")
    val q = graft.cep.CepOps.streamingMatches(mem.toDS(), pat)
      .writeStream.format("memory").queryName("cep_quant_stream")
      .outputMode("append").start()
    try {
      mem.addData(ev(1, "A"))           // batch 1: partial run (1 of 2 As)
      q.processAllAvailable()
      mem.addData(ev(2, "A"))           // batch 2: run advances to 2 As
      q.processAllAvailable()
      mem.addData(ev(3, "B"))           // batch 3: completes
      q.processAllAvailable()
      val rows = spark.table("cep_quant_stream").collect().map(_.toSeq).toList
      assert(rows == List(Seq(1L, 1L, 3L)))
    } finally q.stop()
  }
}

/** Non-deterministic contiguity (followedByAny / allowCombinations) and
  * MATCH_RECOGNIZE aggregate measures. */
class CepNondetSpec extends GraftSpec {
  import graft.cep.{AfterMatch, Pattern}
  import graft.streaming.StatefulOps.Ev

  private def ev(id: Long, tpe: String, v: Double = 0.0): Ev =
    Ev(id, 1L, tpe, v, id * 1000000)
  private def ids(m: graft.cep.PMatch[Ev]): Vector[Long] = m.map(_.event_id)

  test("followedByAny matches every later candidate, followedBy only the first") {
    val any = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedByAny("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    val events = Seq(ev(1, "A"), ev(2, "B"), ev(3, "B"))
    val m = Pattern.run(any, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(ids).toSet == Set(Vector(1L, 2L), Vector(1L, 3L)))
    val one = Pattern.begin[Ev]("a")(_.event_type == "A")
      .followedBy("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    assert(Pattern.run(one, events.iterator, (_: Ev).ts_us).toList.map(ids)
      == List(Vector(1L, 2L)))
  }

  test("allowCombinations yields all loop subsets ending at the close") {
    // close with followedBy: a branch that skipped A2 has last-consumed A1,
    // so a strict next("b") could never take B3 (same semantics as Flink)
    val p = Pattern.begin[Ev]("a")(_.event_type == "A").oneOrMore.allowCombinations
      .followedBy("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    val events = Seq(ev(1, "A"), ev(2, "A"), ev(3, "B"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    // combinations: {1,2}, {1}, {2} all close at B
    assert(m.map(ids).toSet ==
      Set(Vector(1L, 2L, 3L), Vector(1L, 3L), Vector(2L, 3L)))
  }

  test("runWithTimeouts: expired partials emitted, completed runs are not") {
    val pat = Pattern.begin[Ev]("a")(_.event_type == "S")
      .followedBy("b")(_.event_type == "P")
      .within(2000000) // 2 s in µs
      .afterMatchSkip(AfterMatch.NoSkip)
    def at(id: Long, tpe: String, tsUs: Long): Ev = Ev(id, 1L, tpe, 0.0, tsUs)
    val events = Seq(
      at(1, "S", 0),        // completes via P@1.5s
      at(2, "P", 1500000),
      at(3, "S", 2000000),  // times out: no P within 2s (pruned by X@4.5s)
      at(4, "X", 4500000),
      at(5, "S", 5000000))  // times out at end of input
    val (matches, timeouts) = Pattern.runWithTimeouts(
      pat, events.iterator, (_: Ev).ts_us, (_: Ev).event_id)
    assert(matches.map(m => (m.head.event_id, m.last.event_id)) == Vector((1L, 2L)))
    assert(timeouts.map(_.head.event_id).sorted == Vector(3L, 5L))
  }

  test("streaming CEP emits timeouts for runs whose window expires mid-stream") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Ev]
    def at(id: Long, tpe: String, tsUs: Long): Ev = Ev(id, 1L, tpe, 0.0, tsUs)
    val pat = Pattern.begin[Ev]("a")(_.event_type == "S")
      .followedBy("b")(_.event_type == "P")
      .within(2000000)
      .afterMatchSkip(AfterMatch.NoSkip)
    val q = graft.cep.CepOps.streamingMatchesWithTimeouts(mem.toDS(), pat)
      .writeStream.format("memory").queryName("cep_to_stream")
      .outputMode("append").start()
    try {
      mem.addData(at(1, "S", 0))            // batch 1: in-flight run
      q.processAllAvailable()
      mem.addData(at(2, "P", 1000000))      // batch 2: completes (1,2)
      q.processAllAvailable()
      mem.addData(at(3, "S", 1500000))      // batch 3: new in-flight run
      q.processAllAvailable()
      mem.addData(at(4, "X", 4000000))      // batch 4: expires run 3 -> timeout
      q.processAllAvailable()
      val rows = spark.table("cep_to_stream").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      assert(rows == Set((1L, 2L, false), (3L, 3L, true)))
    } finally q.stop()
  }

  test("whereWith iterative condition sees the run's consumed events") {
    // rising loop: each additional A must exceed the PREVIOUS A's value
    val p = Pattern.begin[Ev]("a")(_.event_type == "A")
      .oneOrMore.consecutive.greedy
      .whereWith((e, ctx) =>
        ctx.eventsFor("a").lastOption.forall(_.value < e.value))
      .next("b")(_.event_type == "B")
      .afterMatchSkip(AfterMatch.NoSkip)
    def at(id: Long, tpe: String, v: Double): Ev = Ev(id, 1L, tpe, v, id * 1000)
    // values 1,3,2: the run 1<3 breaks at 2; run [2] then closes at B
    val events = Seq(at(1, "A", 1), at(2, "A", 3), at(3, "A", 2), at(4, "B", 0))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(x => ids(x)).toSet == Set(Vector(3L, 4L)))
  }

  test("MATCH_RECOGNIZE aggregate measures SUM/AVG/MIN/MAX") {
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq(
      (1L, 1L, "view", 10.0), (1L, 2L, "view", 30.0), (1L, 3L, "purchase", 5.0))
      .toDF("user_id", "event_id", "event_type", "value")
    val out = graft.cep.MatchRecognize.matchRecognize(df,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES SUM(A.value) AS sum_v, AVG(A.value) AS avg_v,
        |         MIN(A.event_id) AS min_id, MAX(A.event_id) AS max_id
        |PATTERN (A+ B)
        |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getDouble(1) == 40.0 && r.getDouble(2) == 20.0)
    assert(r.getLong(3) == 1L && r.getLong(4) == 2L)
  }
}

/** Quantified group patterns (reference GroupPattern.java) via bounded
  * expansion. */
class CepGroupSpec extends GraftSpec {
  import graft.cep.Pattern
  import graft.streaming.StatefulOps.Ev

  private def ev(id: Long, tpe: String): Ev = Ev(id, 1L, tpe, 0.0, id * 1000000)
  private val grp = Pattern.begin[Ev]("a")(_.event_type == "A")
    .next("b")(_.event_type == "B")

  test("consecutive group x2 matches only the full adjacent chain") {
    val p = Pattern.beginGroup(grp, 2, consecutive = true)
    val events = Seq(ev(1, "A"), ev(2, "B"), ev(3, "A"), ev(4, "B"), ev(5, "A"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 2L, 3L, 4L)))
    // eventsFor accumulates across repetitions, like getEventsForPattern
    assert(m.head.eventsFor("a").map(_.event_id) == Vector(1L, 3L))
    assert(m.head.eventsFor("b").map(_.event_id) == Vector(2L, 4L))
  }

  test("relaxed repetition boundary skips events between group copies") {
    val p = Pattern.beginGroup(grp, 2) // boundaries relaxed by default
    val events = Seq(ev(1, "A"), ev(2, "B"), ev(3, "X"), ev(4, "A"), ev(5, "B"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 2L, 4L, 5L)))
  }

  test("followedByGroup appends a quantified group after a step") {
    val p = Pattern.begin[Ev]("s")(_.event_type == "S")
      .followedByGroup(grp, 2, consecutive = true)
    val events = Seq(ev(1, "S"), ev(2, "X"), ev(3, "A"), ev(4, "B"),
      ev(5, "A"), ev(6, "B"))
    val m = Pattern.run(p, events.iterator, (_: Ev).ts_us).toList
    assert(m.map(_.map(_.event_id)) == List(Vector(1L, 3L, 4L, 5L, 6L)))
  }
}
