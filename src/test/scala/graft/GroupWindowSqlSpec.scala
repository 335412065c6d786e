package graft

import graft.operators.GroupWindowSql.rewrite

/** Group-window SQL lowering (reference FlinkSqlOperatorTable TUMBLE/HOP/
  * SESSION + auxiliaries) — rewrite-level checks; end-to-end answers are
  * oracle-gated (q_group_window_sql*). */
class GroupWindowSqlSpec extends GraftSpec {

  test("TUMBLE lowers to window(), auxiliaries to window.start/end") {
    val out = rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE), TUMBLE_END(ts, INTERVAL '5' MINUTE) " +
        "FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
    assert(out ==
      "SELECT window.start, window.end FROM e GROUP BY window(ts, '5 minutes')")
  }

  test("HOP swaps Flink slide-size order into Spark size-slide") {
    val out = rewrite("GROUP BY HOP(ts, INTERVAL '1' MINUTE, INTERVAL '10' MINUTE)")
    assert(out == "GROUP BY window(ts, '10 minutes', '1 minutes')")
  }

  test("SESSION lowers to session_window; unrecognized spec passes through") {
    assert(rewrite("GROUP BY SESSION(ts, INTERVAL '30' MINUTE)") ==
      "GROUP BY session_window(ts, '30 minutes')")
    // an unsupported unit is left for spark.sql to reject (unknown TUMBLE
    // function) rather than silently partially rewritten
    val untouched = "GROUP BY TUMBLE(ts, INTERVAL '1' YEAR)"
    assert(rewrite(untouched) == untouched)
  }

  test("mismatched window auxiliaries are rejected like the reference's validator") {
    val e = intercept[IllegalArgumentException] {
      rewrite("SELECT TUMBLE_START(ts, INTERVAL '1' HOUR) " +
        "FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      rewrite("SELECT TUMBLE_START(other_ts, INTERVAL '5' MINUTE) " +
        "FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
    }
    assert(e2.getMessage.contains("does not match"), e2.getMessage)
  }

  test("a statement with TWO different grouped windows accepts each window's own auxiliaries") {
    // UNION ALL of two differently-windowed subqueries: each TUMBLE_START
    // matches SOME grouped window in the statement — first-window-only
    // validation spuriously rejected the second subquery's auxiliaries
    val out = rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE) " +
        "UNION ALL " +
        "SELECT TUMBLE_START(ts, INTERVAL '10' MINUTE) FROM e GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)")
    assert(out ==
      "SELECT window.start FROM e GROUP BY window(ts, '5 minutes') " +
        "UNION ALL " +
        "SELECT window.start FROM e GROUP BY window(ts, '10 minutes')")
    // an auxiliary matching NO grouped window still rejects
    intercept[IllegalArgumentException] {
      rewrite("SELECT TUMBLE_START(ts, INTERVAL '7' MINUTE) FROM e " +
        "GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
    }
  }

  test("auxiliary validation scopes per top-level UNION branch") {
    // the aux in branch 2 matches only branch 1's window — any-window
    // matching across the whole statement would accept this; per-scope
    // validation (the reference's) rejects it
    val e = intercept[IllegalArgumentException] {
      rewrite(
        "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM e GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE) " +
          "UNION ALL " +
          "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM e GROUP BY TUMBLE(ts, INTERVAL '10' MINUTE)")
    }
    assert(e.getMessage.contains("does not match"), e.getMessage)
    // a UNION inside parentheses (subquery) is NOT a scope boundary: the
    // outer aux still sees the statement's window
    rewrite(
      "SELECT TUMBLE_START(ts, INTERVAL '5' MINUTE) FROM " +
        "(SELECT ts FROM a UNION ALL SELECT ts FROM b) " +
        "GROUP BY TUMBLE(ts, INTERVAL '5' MINUTE)")
  }

}

/** LATERAL TABLE lowering (reference Correlate SQL surface). */
class LateralSqlSpec extends GraftSpec {
  import graft.operators.LateralSql.rewrite

  test("comma-join correlate lowers to LATERAL VIEW") {
    val out = rewrite("SELECT a, w FROM t, LATERAL TABLE(split_rows(a, ',')) AS T(w)")
    assert(out == "SELECT a, w FROM t LATERAL VIEW explode(split(a, ',')) T AS w")
  }

  test("LEFT JOIN ... ON TRUE lowers to LATERAL VIEW OUTER, unknown UDTF fails loudly") {
    val out = rewrite(
      "SELECT a, w FROM t LEFT JOIN LATERAL TABLE(split_rows(a, ',')) AS T(w) ON TRUE")
    assert(out == "SELECT a, w FROM t LATERAL VIEW OUTER explode(split(a, ',')) T AS w")
    intercept[IllegalArgumentException] {
      rewrite("SELECT * FROM t, LATERAL TABLE(nope(a)) AS T(w)")
    }
  }

  test("regex-metachar delimiters split LITERALLY (Spark split takes a regex)") {
    val out = rewrite("SELECT w FROM t, LATERAL TABLE(split_rows(a, '.')) AS T(w)")
    assert(out.contains("split(a, '\\\\.')"), out)
    // end-to-end: '.' must not split every character
    val sparkS = spark
    import sparkS.implicits._
    Seq("x.y", "plain").toDF("a").createOrReplaceTempView("lat_dot")
    val rows = spark.sql(
      graft.operators.LateralSql.rewrite(
        "SELECT a, w FROM lat_dot, LATERAL TABLE(split_rows(a, '.')) AS T(w)"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSet == Set(("x.y", "x"), ("x.y", "y"), ("plain", "plain")), rows.toSeq)
  }
}
