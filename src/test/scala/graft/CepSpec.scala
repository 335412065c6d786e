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
