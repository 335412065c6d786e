package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group-window aggregates and time-bounded joins (reference §2.1:
  * StreamExecGroupWindowAggregate.scala, window assigners in
  * flink-table-runtime-blink/.../operators/window/assigners/ — Tumbling,
  * Sliding, Session — and interval joins in operators/join/interval/
  * TimeIntervalJoin.java; temporal/as-of join in operators/join/temporal/
  * TemporalRowTimeJoinOperator.java).
  *
  * These are the BATCH forms (same window semantics on bounded input);
  * streaming twins live in graft.streaming.StreamingOps. Window starts are
  * emitted as epoch seconds (bigint) so the DuckDB oracle can reproduce
  * bucketing without timestamp-precision hazards (events.ts is ns-precision;
  * Spark truncates to µs — flooring to seconds is truncation-stable).
  */
object TimeWindows {

  /** TUMBLE window — reference TumblingEventTimeWindows assigner. */
  val qWindowTumble: Q = Q(
    "q_window_tumble",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(window($"ts", "5 minutes"), $"event_type")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .select(
          unix_timestamp($"window.start").as("wstart"),
          $"event_type", $"cnt", $"total")
        .orderBy($"wstart", $"event_type")
    },
    Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS wstart,
           |       event_type, count(*) AS cnt, round(sum(value), 2) AS total
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** HOP (sliding) window, 10 min size / 5 min slide — reference
    * SlidingEventTimeWindows assigner: every event lands in exactly two
    * windows; the oracle materializes both starts per row. */
  val qWindowHop: Q = Q(
    "q_window_hop",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(window($"ts", "600 seconds", "300 seconds"), $"event_type")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .select(
          unix_timestamp($"window.start").as("wstart"),
          $"event_type", $"cnt", $"total")
        .orderBy($"wstart", $"event_type")
    },
    Some("""SELECT wstart, event_type, count(*) AS cnt, round(sum(value), 2) AS total
           |FROM (
           |  SELECT unnest([CAST(floor(epoch(ts) / 300) * 300 AS BIGINT),
           |                 CAST(floor(epoch(ts) / 300) * 300 - 300 AS BIGINT)]) AS wstart,
           |         event_type, value
           |  FROM events)
           |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** SESSION window, 30 min gap — reference EventTimeSessionWindows assigner +
    * session merging in WindowOperator.java; Spark session_window (≥3.2).
    * Oracle reproduces merge semantics with gaps-and-islands (a new session
    * starts when the gap to the previous event is >= the session gap, since
    * Spark sessions are [start, last+gap) end-exclusive). */
  val qWindowSession: Q = Q(
    "q_window_session",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .select(
          unix_timestamp($"session_window.start").as("sess_start"),
          $"user_id", $"cnt", $"total")
        .orderBy($"user_id", $"sess_start")
    },
    Some("""WITH g AS (
           |  SELECT user_id, ts, value,
           |         CASE WHEN lag(ts) OVER w IS NULL
           |              OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
           |              THEN 1 ELSE 0 END AS brk
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
           |sess AS (
           |  SELECT user_id, ts, value,
           |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
           |                        ROWS UNBOUNDED PRECEDING) AS sid
           |  FROM g)
           |SELECT CAST(floor(epoch(min(ts))) AS BIGINT) AS sess_start, user_id,
           |       count(*) AS cnt, round(sum(value), 2) AS total
           |FROM sess GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin))

  /** Interval (time-bounded) join — reference TimeIntervalJoin.java /
    * StreamExecIntervalJoin.scala: for each purchase, count same-user clicks
    * in the preceding 10 minutes. Equi-key on user_id keeps this a hash join
    * with a range residual — the scalable shape (state pruned by time in the
    * streaming twin). */
  val qIntervalJoin: Q = Q(
    "q_interval_join",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      val purchases = e.filter($"event_type" === "purchase")
        .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
      val clicks = e.filter($"event_type" === "click")
        .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      purchases.join(
          clicks,
          $"p_user" === $"c_user" &&
            $"c_ts" >= $"p_ts" - expr("INTERVAL 10 MINUTES") &&
            $"c_ts" < $"p_ts",
          "left")
        .groupBy($"p_id")
        .agg(count($"c_id").as("n_clicks"))
        .select($"p_id".as("event_id"), $"n_clicks")
        .orderBy($"event_id")
    },
    Some("""SELECT a.event_id, count(b.event_id) AS n_clicks
           |FROM events a LEFT JOIN events b
           |  ON a.user_id = b.user_id AND b.event_type = 'click'
           | AND b.ts >= a.ts - INTERVAL 10 MINUTE AND b.ts < a.ts
           |WHERE a.event_type = 'purchase'
           |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin))

  /** Temporal / as-of join — reference TemporalRowTimeJoinOperator.java
    * (FOR SYSTEM_TIME AS OF): for each purchase, the value of the same user's
    * latest signup at-or-before the purchase time.
    *
    * Implemented the scale-correct way: union both sides tagged, one
    * partitioned window pass carrying the last signup value forward — a single
    * shuffle by user_id, no range-join blowup, no per-row probes. This is the
    * exact batch analogue of the reference's keyed-state version lookup.
    */
  val qAsOfJoin: Q = Q(
    "q_asof_join",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      val signups = e.filter($"event_type" === "signup")
        .select($"user_id", $"ts", $"event_id", $"value".as("sig_value"), lit(1).as("is_sig"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", $"event_id", lit(null).cast("double").as("sig_value"), lit(0).as("is_sig"))
      // At equal ts the signup sorts first (is_sig desc) so the purchase sees it (<= semantics).
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"is_sig".desc, $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      signups.union(purchases)
        .withColumn("last_signup_value", last($"sig_value", ignoreNulls = true).over(w))
        .filter($"is_sig" === 0)
        .select($"event_id", $"last_signup_value")
        .orderBy($"event_id")
    },
    Some("""SELECT a.event_id,
           |  (SELECT arg_max(b.value, printf('%020d-%012d', epoch_us(b.ts), b.event_id))
           |   FROM events b
           |   WHERE b.user_id = a.user_id AND b.event_type = 'signup'
           |     AND b.ts <= a.ts) AS last_signup_value
           |FROM events a WHERE a.event_type = 'purchase'
           |ORDER BY a.event_id""".stripMargin))

  /** Window join — reference JoinedStreams (`join(...).where(...).window(...)`,
    * flink-streaming-java/.../datastream/JoinedStreams.java): pairs of events
    * from two streams landing in the same tumbling window with equal keys.
    * Expressed as an equi-join on (window bucket, key) — co-partitioned, no
    * range condition needed. */
  val qWindowJoin: Q = Q(
    "q_window_join",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "events")
        .withColumn("wstart", unix_timestamp(window($"ts", "15 minutes").getField("start")))
      val views = e.filter($"event_type" === "view")
        .select($"wstart", $"user_id", $"event_id".as("v_id"))
      val purchases = e.filter($"event_type" === "purchase")
        .select($"wstart".as("p_wstart"), $"user_id".as("p_user"), $"event_id".as("p_id"))
      views.join(purchases,
          $"wstart" === $"p_wstart" && $"user_id" === $"p_user")
        .select($"wstart", $"user_id", $"v_id", $"p_id")
        .orderBy($"wstart", $"user_id", $"v_id", $"p_id")
    },
    Some("""SELECT a.wstart AS wstart, a.user_id AS user_id,
           |       a.event_id AS v_id, b.event_id AS p_id
           |FROM (SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS wstart,
           |             user_id, event_id FROM events WHERE event_type = 'view') a
           |JOIN (SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) AS wstart,
           |             user_id, event_id FROM events WHERE event_type = 'purchase') b
           |  ON a.wstart = b.wstart AND a.user_id = b.user_id
           |ORDER BY a.wstart, a.user_id, v_id, p_id""".stripMargin))

  /** Table aggregate (UDTAF) — reference GroupTableAggFunction.java /
    * TableAggregateFunction.java:115: an aggregate emitting MULTIPLE rows per
    * group (top-2 leaderboard), via flatMapGroups. */
  val qTableAgg: Q = Q(
    "q_table_agg",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select($"event_type", $"event_id", $"value")
        .as[(String, Long, Double)]
        .groupByKey(_._1)
        // secondary sort in the shuffle + bounded take: the UDTAF emits its
        // top-2 from a lazy sorted iterator, never holding the group
        .flatMapSortedGroups($"value".desc, $"event_id") {
          (key: String, it: Iterator[(String, Long, Double)]) =>
            it.take(2).zipWithIndex.map {
              case ((_, id, v), i) => (key, i + 1, id, v)
            }
        }
        .toDF("event_type", "rn", "event_id", "value")
        .orderBy($"event_type", $"rn")
    },
    Some("""SELECT event_type, rn, event_id, value FROM (
           |  SELECT event_type, CAST(row_number() OVER (PARTITION BY event_type
           |           ORDER BY value DESC, event_id) AS INTEGER) AS rn,
           |         event_id, value
           |  FROM events) WHERE rn <= 2
           |ORDER BY event_type, rn""".stripMargin))

  /** TUMBLE with a window OFFSET — reference TumblingEventTimeWindows
    * .of(size, offset) (assigners/TumblingEventTimeWindows.java:116): window
    * boundaries shifted by 90 s, e.g. [1:30, 6:30) instead of [0:00, 5:00).
    * Spark's `window()` fourth argument (startTime) is the same knob. */
  val qWindowOffset: Q = Q(
    "q_window_offset",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy(window($"ts", "5 minutes", "5 minutes", "90 seconds"), $"event_type")
        .agg(count(lit(1)).as("cnt"))
        .select(
          unix_timestamp($"window.start").as("wstart"),
          $"event_type", $"cnt")
        .orderBy($"wstart", $"event_type")
    },
    Some("""SELECT CAST(floor((epoch(ts) - 90) / 300) * 300 + 90 AS BIGINT) AS wstart,
           |       event_type, count(*) AS cnt
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  val all: Seq[Q] = Seq(
    qWindowTumble, qWindowHop, qWindowSession, qIntervalJoin, qAsOfJoin,
    qWindowJoin, qTableAgg, qWindowOffset)
}
