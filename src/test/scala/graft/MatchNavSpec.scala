package graft

import graft.cep.MatchRecognize.matchRecognize

/** DEFINE navigation semantics (SQL:2016 R020; reference
  * MatchCodeGenerator.scala): PREV is a PHYSICAL partition offset (null
  * before the partition start), FIRST/LAST navigate the match-so-far rows
  * of a symbol with running semantics, and SUBSET unions labels. */
class MatchNavSpec extends GraftSpec {

  private def mk(rows: (Long, Long, String, Double)*) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toSeq.toDF("user_id", "event_id", "event_type", "value")
  }

  private val header =
    """PARTITION BY user_id ORDER BY event_id
      |MEASURES A.event_id AS a_id, B.event_id AS b_id
      |ONE ROW PER MATCH
      |AFTER MATCH SKIP PAST LAST ROW
      |""".stripMargin

  test("PREV before the partition start is null → condition not satisfied") {
    val d = mk((1, 1, "x", 5.0), (1, 2, "x", 7.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES B.event_id AS b_id
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (B)
        |DEFINE B AS B.value > PREV(B.value)""".stripMargin).collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L)) // row 1 has no PREV
  }

  test("PREV with explicit offset 2 reaches two rows back") {
    val d = mk((1, 1, "x", 1.0), (1, 2, "a", 9.0), (1, 3, "x", 5.0))
    val out = matchRecognize(d, header +
      """PATTERN (A B)
        |DEFINE A AS event_type = 'a', B AS B.value > PREV(B.value, 2)""".stripMargin)
      .collect()
    // B at position 2: PREV(…,2) = 1.0 → 5 > 1 matches (offset 1 would be
    // 5 > 9, false)
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((2L, 3L)))
  }

  test("LAST(A.value) in DEFINE sees the latest matched A (running)") {
    val dNo = mk((1, 1, "a", 3.0), (1, 2, "a", 7.0), (1, 3, "b", 5.0))
    val no = matchRecognize(dNo, header +
      """PATTERN (A+ B)
        |DEFINE A AS event_type = 'a',
        |       B AS event_type = 'b' AND B.value > LAST(A.value)""".stripMargin)
      .collect()
    assert(no.isEmpty) // 5 > LAST(A)=7 fails on every branch (A+ any split)
    val dYes = mk((1, 1, "a", 3.0), (1, 2, "b", 5.0))
    val yes = matchRecognize(dYes, header +
      """PATTERN (A+ B)
        |DEFINE A AS event_type = 'a',
        |       B AS event_type = 'b' AND B.value > LAST(A.value)""".stripMargin)
      .collect()
    assert(yes.length == 1)
  }

  test("FIRST(A.value) in DEFINE sees the earliest matched A") {
    val d = mk((1, 1, "a", 3.0), (1, 2, "a", 7.0), (1, 3, "b", 5.0))
    val out = matchRecognize(d, header +
      """PATTERN (A+ B)
        |DEFINE A AS event_type = 'a',
        |       B AS event_type = 'b' AND B.value > FIRST(A.value)""".stripMargin)
      .collect()
    assert(out.length == 1) // 5 > FIRST(A)=3 holds even though LAST(A)=7 > 5
    assert(out.head.getLong(2) == 3L) // B is the b-row, not the second a-row
  }

  test("another symbol's bare T.col in DEFINE means LAST(T.col)") {
    val d = mk((1, 1, "a", 3.0), (1, 2, "a", 7.0), (1, 3, "b", 5.0))
    val out = matchRecognize(d, header +
      """PATTERN (A+ B)
        |DEFINE A AS event_type = 'a',
        |       B AS event_type = 'b' AND B.value > A.value""".stripMargin)
      .collect()
    assert(out.isEmpty) // A.value ≡ LAST(A.value) = 7; 5 > 7 fails
  }

  test("AFTER MATCH SKIP TO LAST <sym> prunes runs before the last named event") {
    val d = mk((1, 1, "v", 0.0), (1, 2, "v", 0.0), (1, 3, "v", 0.0), (1, 4, "p", 0.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES FIRST(V.event_id) AS v1, COUNT(V.*) AS nv, P.event_id AS p_id
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP TO LAST V
        |PATTERN (V+ P)
        |DEFINE V AS event_type = 'v', P AS event_type = 'p'""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // greedy full match [v1 v2 v3 p] emits, then only the run starting at the
    // LAST V (v3) survives — the middle start v2 is skipped
    assert(out == Set((1L, 3L, 4L), (3L, 1L, 4L)))
  }

  test("AFTER MATCH SKIP TO FIRST <sym> keeps every run from the first named event") {
    val d = mk((1, 1, "v", 0.0), (1, 2, "v", 0.0), (1, 3, "v", 0.0), (1, 4, "p", 0.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES FIRST(V.event_id) AS v1, COUNT(V.*) AS nv, P.event_id AS p_id
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP TO FIRST V
        |PATTERN (V+ P)
        |DEFINE V AS event_type = 'v', P AS event_type = 'p'""".stripMargin)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // the bound lands at the first V of the first match (v1), so ALL starts
    // remain legal — every suffix match emits
    assert(out == Set((1L, 3L, 4L), (2L, 2L, 4L), (3L, 1L, 4L)))
  }

  test("RUNNING vs FINAL: ALL ROWS measures diverge on non-final rows") {
    val d = mk((1, 1, "a", 0.0), (1, 2, "b", 0.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES RUNNING LAST(B.event_id) AS run_b, FINAL LAST(B.event_id) AS fin_b
        |ALL ROWS PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A B)
        |DEFINE A AS event_type = 'a', B AS event_type = 'b'""".stripMargin)
      .select("event_id", "run_b", "fin_b")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(out.toSet == Set(
      (1L, None, Some(2L)),        // A-row: RUNNING sees no B yet, FINAL does
      (2L, Some(2L), Some(2L))))
  }

  test("SUBSET spans a quantified symbol in COUNT") {
    val d = mk((1, 1, "a", 1.0), (1, 2, "a", 2.0), (1, 3, "b", 3.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES COUNT(U.*) AS n, FIRST(U.value) AS v1, LAST(U.value) AS v2
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (A+ B)
        |SUBSET U = (A, B)
        |DEFINE A AS event_type = 'a', B AS event_type = 'b'""".stripMargin)
      .collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L) // both A rows + the B row
    assert(out.head.getDouble(2) == 1.0 && out.head.getDouble(3) == 3.0)
  }

  test("own-symbol LAST in DEFINE includes the row under test (SQL:2016 running semantics)") {
    val d = mk((1, 1, "x", 10.0), (1, 2, "x", 3.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES B.event_id AS b_id
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (B)
        |DEFINE B AS LAST(B.value) > 5""".stripMargin).collect()
    // the candidate row IS the last B while it is being tested: row 1
    // (value 10) matches, row 2 (value 3) does not
    assert(out.map(_.getLong(1)).toSeq == Seq(1L), out.mkString(","))
  }

  test("integral DEFINE comparisons are exact beyond 2^53") {
    val big = 9007199254740993L // 2^53 + 1 — collapses to 2^53 as a Double
    val d = mk((1, big, "x", 1.0), (1, big + 10, "x", 1.0))
    val out = matchRecognize(d,
      s"""PARTITION BY user_id ORDER BY event_id
        |MEASURES B.event_id AS b_id
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (B)
        |DEFINE B AS B.event_id = $big""".stripMargin).collect()
    // double-routed comparison would also match big+10's neighbors or
    // mis-evaluate; exact long compare matches exactly one row
    assert(out.map(_.getLong(1)).toSeq == Seq(big), out.mkString(","))
  }

  test("MIN/MAX measures work on strings; SUM on a string column is rejected at parse") {
    val d = mk((1, 1, "b", 1.0), (1, 2, "a", 2.0))
    val out = matchRecognize(d,
      """PARTITION BY user_id ORDER BY event_id
        |MEASURES MIN(U.event_type) AS lo, MAX(U.event_type) AS hi
        |ONE ROW PER MATCH
        |AFTER MATCH SKIP PAST LAST ROW
        |PATTERN (B C)
        |SUBSET U = (B, C)
        |DEFINE B AS B.value > 0, C AS C.value > 0""".stripMargin).collect()
    assert(out.head.getString(1) == "a" && out.head.getString(2) == "b")
    val e = intercept[IllegalArgumentException] {
      matchRecognize(d,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES SUM(B.event_type) AS s
          |ONE ROW PER MATCH
          |PATTERN (B)
          |DEFINE B AS B.value > 0""".stripMargin)
    }
    assert(e.getMessage.contains("numeric"), e.getMessage)
  }
}
