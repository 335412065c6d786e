package graft.streaming

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's streaming-dedup SQL idiom (StreamExecDeduplicateRule:
  * flink-table-planner-blink/.../stream/StreamExecDeduplicate.scala — the
  * planner RECOGNIZES `ROW_NUMBER() OVER (PARTITION BY k ORDER BY t [DESC])
  * … WHERE rn = 1` and swaps the O(n log n) rank for O(1)-per-key
  * Deduplicate state): the same recognition here, lowered onto a min_by /
  * max_by keyed aggregate — Spark's deterministic expression of
  * keep-first / keep-last whose update-mode changelog is exactly the
  * reference operator's retraction stream. Plain `row_number` SQL cannot
  * run on a stream in either engine; the rewrite is what makes the idiom
  * executable, which is the entire point of the reference rule.
  *
  * Scale posture: state per key is ONE row (the current winner) carried by
  * the aggregation buffer — map-side partial min_by/max_by combine before
  * the shuffle, identical to the reference's pre-aggregated deduplicate.
  */
object DedupSql {

  // Tolerated text variants (the reference rule matches the logical PLAN,
  // so surface spelling must not matter): an alias on the derived table
  // (`) AS t`), a qualified rank filter (`t.rn = 1`), and a trailing
  // ORDER BY on the outer query.
  private val RnR =
    ("(?is)SELECT \\* FROM \\(\\s*SELECT \\*, ROW_NUMBER\\(\\) OVER \\(\\s*" +
      "PARTITION BY ([\\w, ]+?) ORDER BY (\\w+)( DESC)?\\s*\\) AS rn FROM (\\w+)\\s*\\)" +
      "(?: (?:AS )?(\\w+))? " +
      "WHERE (?:\\w+\\.)?rn = 1(?: ORDER BY ([\\w, ]+?))?").r

  /** Recognize the rn=1 idiom over `df` (registered under the FROM name) and
    * return the lowered keep-first/keep-last aggregate. */
  def dedup(df: DataFrame, sql: String): DataFrame = {
    val norm = sql.replaceAll("\\s+", " ").trim
    norm match {
      case RnR(partTxt, orderCol0, desc, _, _, orderTail) =>
        // the idiom matches case-insensitively, so resolve the captured
        // names to the relation's OWN spelling before set arithmetic — a
        // `PARTITION BY USER_ID` over a user_id column must not leave the
        // partition column inside `rest` (duplicated output column, polluted
        // tie-break)
        def resolve(n: String): String =
          df.columns.find(_.equalsIgnoreCase(n)).getOrElse(n)
        val partCols = partTxt.split(",").map(_.trim).toSeq.map(resolve)
        val orderCol = resolve(orderCol0)
        val rest = df.columns.filterNot(partCols.contains).toSeq
        // Tie-break DETERMINISTICALLY: min_by/max_by over the bare order
        // column picks an arbitrary winner when two rows per key share the
        // same order value (and would diverge run-to-run and from the
        // reference's arrival-order DeduplicateKeepFirstRowFunction). The
        // struct comparator totally orders candidates — order column first,
        // then the remaining columns as a stable lexicographic tie-break.
        val orderKey = struct(col(orderCol) +: rest.filterNot(_ == orderCol).map(col): _*)
        val winner =
          if (desc == null) min_by(struct(rest.map(col): _*), orderKey)
          else max_by(struct(rest.map(col): _*), orderKey)
        // the intercepted text's outer `SELECT *` projects the rank column
        // (constant 1 on every surviving row) — emit it too, or the lowered
        // schema diverges from what the same SQL returns un-intercepted
        val lowered = df.groupBy(partCols.map(col): _*)
          .agg(winner.as("__r"))
          .select(partCols.map(col) ++ rest.map(c => col(s"__r.$c")) :+
            lit(1).as("rn"): _*)
        Option(orderTail).map(_.trim).filter(_.nonEmpty) match {
          case Some(o) => lowered.orderBy(o.split(",").map(_.trim).map(col).toSeq: _*)
          case None    => lowered
        }
      case _ => throw new IllegalArgumentException(
        s"not the deduplicate idiom (ROW_NUMBER … WHERE rn = 1): $norm")
    }
  }

  /** Non-throwing recognizer for the unified SQL entry point
    * ([[graft.operators.GraftSql]]): when the text IS the idiom, resolve the
    * FROM name through the session catalog and lower; None otherwise (the
    * caller falls through to plain `spark.sql`, which handles ordinary
    * ROW_NUMBER queries — only the rn=1 dedup shape is intercepted, exactly
    * the reference rule's matching condition). */
  def tryDedup(spark: SparkSession, sql: String): Option[DataFrame] = {
    val norm = sql.replaceAll("\\s+", " ").trim
    norm match {
      case RnR(_, _, _, from, _, _) => Some(dedup(spark.table(from), sql))
      case _ => None
    }
  }

  /** q_dedup_sql_first: first event per user by event time, written as the
    * reference's SQL idiom against a STREAMING view and executed by the
    * lowered keyed aggregate (complete mode — the upsert view of the
    * changelog). */
  val qDedupSqlFirst: Q = Q(
    "q_dedup_sql_first",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      val in = StreamingOps.streamTable(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
      val out = dedup(in,
        """SELECT * FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us) AS rn
          |  FROM events_stream) WHERE rn = 1""".stripMargin)
      StreamingOps.runToMemory(s, out, "complete", "graft_dedup_sql_first")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, arg_min(event_id, epoch_us(ts)) AS event_id,
           |       arg_min(event_type, epoch_us(ts)) AS event_type,
           |       arg_min(epoch_us(ts), epoch_us(ts)) AS ts_us,
           |       CAST(1 AS INTEGER) AS rn
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** q_dedup_sql_last: the DESC variant — keep-last per key. */
  val qDedupSqlLast: Q = Q(
    "q_dedup_sql_last",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      val in = StreamingOps.streamTable(s, dir, "events")
        .select($"user_id", $"event_id", $"event_type", unix_micros($"ts").as("ts_us"))
      val out = dedup(in,
        """SELECT * FROM (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us DESC) AS rn
          |  FROM events_stream) WHERE rn = 1""".stripMargin)
      StreamingOps.runToMemory(s, out, "complete", "graft_dedup_sql_last")
        .orderBy($"user_id")
    },
    Some("""SELECT user_id, arg_max(event_id, epoch_us(ts)) AS event_id,
           |       arg_max(event_type, epoch_us(ts)) AS event_type,
           |       arg_max(epoch_us(ts), epoch_us(ts)) AS ts_us,
           |       CAST(1 AS INTEGER) AS rn
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))

  /** Stream-stream LEFT OUTER interval join (reference StreamingJoinOperator
    * outer paths — null-padding rows emit only when the watermark proves no
    * match can still arrive): purchases left-joined to same-user clicks in
    * the following 10 minutes. The oracle replays the exact emission rule:
    * all matched pairs, plus unmatched purchases whose join window closed
    * under the final combined watermark (min of the two sides' max event
    * times — the default multipleWatermarkPolicy); tail rows still open in
    * state are correctly absent from BOTH engines. */
  val qStreamOuterJoin: Q = Q(
    "q_stream_outer_join",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      def side(t: String, a: String) = StreamingOps.streamTable(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
          col("ts").as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "0 seconds")
      val joined = side("purchase", "p").join(side("click", "c"),
        expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
        "leftOuter")
      StreamingOps.runToMemory(s, joined.select($"p_id", $"c_id"),
        "append", "graft_stream_outer_join")
        .orderBy($"p_id", $"c_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |wm AS (SELECT least((SELECT max(epoch_ms(ts)) FROM p),
           |                    (SELECT max(epoch_ms(ts)) FROM c)) AS w)
           |SELECT p_id, c_id FROM (
           |  SELECT p.event_id AS p_id, c.event_id AS c_id
           |  FROM p JOIN c ON p.user_id = c.user_id
           |   AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
           |  UNION ALL
           |  SELECT p.event_id, CAST(NULL AS BIGINT)
           |  FROM p, wm
           |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
           |          AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |    AND epoch_ms(p.ts) + 600000 <= wm.w)
           |ORDER BY p_id, c_id""".stripMargin))

  /** Stream-stream FULL OUTER interval join: both sides null-pad once the
    * combined watermark proves no match can arrive — and the two bounds are
    * ASYMMETRIC, because the condition `p_ts <= c_ts <= p_ts + 10min` binds
    * the sides differently: a purchase can still match clicks up to
    * p_ts + 10min (evictable at p_ts + 10min ≤ wm), but a click only
    * matches purchases AT OR BEFORE it (evictable as soon as c_ts ≤ wm —
    * Spark's state-value watermark solves each side's inequalities exactly
    * this way, surfaced by the sf0.1 scale sweep where 2 unmatched clicks
    * fell in the 10-minute twilight zone the old symmetric bound missed). */
  val qStreamFullOuterJoin: Q = Q(
    "q_stream_full_outer_join",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      def side(t: String, a: String) = StreamingOps.streamTable(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
          col("ts").as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "0 seconds")
      val joined = side("purchase", "p").join(side("click", "c"),
        expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
        "fullOuter")
      StreamingOps.runToMemory(s, joined.select($"p_id", $"c_id"),
        "append", "graft_stream_full_outer")
        .orderBy($"p_id", $"c_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |wm AS (SELECT least((SELECT max(epoch_ms(ts)) FROM p),
           |                    (SELECT max(epoch_ms(ts)) FROM c)) AS w)
           |SELECT p_id, c_id FROM (
           |  SELECT p.event_id AS p_id, c.event_id AS c_id
           |  FROM p JOIN c ON p.user_id = c.user_id
           |   AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
           |  UNION ALL
           |  SELECT p.event_id, CAST(NULL AS BIGINT)
           |  FROM p, wm
           |  WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
           |          AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |    AND epoch_ms(p.ts) + 600000 <= wm.w
           |  UNION ALL
           |  SELECT CAST(NULL AS BIGINT), c.event_id
           |  FROM c, wm
           |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
           |          AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |    AND epoch_us(c.ts) <= wm.w * 1000)
           |ORDER BY p_id, c_id""".stripMargin))

  /** Stream-stream RIGHT OUTER: clicks null-pad once the watermark passes
    * the click itself (NOT click + window — a matching purchase must lie at
    * or before the click, so wm ≥ c_ts already proves no future match; see
    * the full-outer scaladoc for the asymmetry). */
  val qStreamRightOuterJoin: Q = Q(
    "q_stream_right_outer_join",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      def side(t: String, a: String) = StreamingOps.streamTable(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
          col("ts").as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "0 seconds")
      val joined = side("purchase", "p").join(side("click", "c"),
        expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
        "rightOuter")
      StreamingOps.runToMemory(s, joined.select($"p_id", $"c_id"),
        "append", "graft_stream_right_outer")
        .orderBy($"p_id", $"c_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |wm AS (SELECT least((SELECT max(epoch_ms(ts)) FROM p),
           |                    (SELECT max(epoch_ms(ts)) FROM c)) AS w)
           |SELECT p_id, c_id FROM (
           |  SELECT p.event_id AS p_id, c.event_id AS c_id
           |  FROM p JOIN c ON p.user_id = c.user_id
           |   AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE
           |  UNION ALL
           |  SELECT CAST(NULL AS BIGINT), c.event_id
           |  FROM c, wm
           |  WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.user_id = c.user_id
           |          AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |    AND epoch_us(c.ts) <= wm.w * 1000)
           |ORDER BY p_id, c_id""".stripMargin))

  /** Stream-stream LEFT SEMI join (reference StreamingSemiAntiJoinOperator
    * .java — semi path): purchases WITH a same-user click in the following
    * 10 minutes, emitted once on first match (the operator holds the left
    * row in state until the watermark to dedup further matches). Bounded
    * replay emits exactly the EXISTS set. */
  val qStreamSemiJoin: Q = Q(
    "q_stream_semi_join",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      def side(t: String, a: String) = StreamingOps.streamTable(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
          col("ts").as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "0 seconds")
      val joined = side("purchase", "p").join(side("click", "c"),
        expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
        "left_semi")
      StreamingOps.runToMemory(s, joined.select($"p_id"),
        "append", "graft_stream_semi_join")
        .orderBy($"p_id")
    },
    Some("""SELECT p.event_id AS p_id
           |FROM events p
           |WHERE p.event_type = 'purchase' AND EXISTS (
           |  SELECT 1 FROM events c
           |  WHERE c.event_type = 'click' AND c.user_id = p.user_id
           |    AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |ORDER BY p_id""".stripMargin))

  /** Stream-stream LEFT ANTI join (reference StreamingSemiAntiJoinOperator
    * .java — anti path): purchases with NO same-user click in the window,
    * emitted only once the combined watermark proves no match can still
    * arrive. Spark has no native stream-stream anti join, so it is LOWERED
    * onto the watermark-gated LEFT OUTER join + null filter — the outer
    * join's null-padded row IS the anti emission (same state, same
    * eviction), which is how the reference's anti path behaves; the oracle
    * filters on the final combined watermark accordingly. */
  val qStreamAntiJoin: Q = Q(
    "q_stream_anti_join",
    (s, dir) => StreamingOps.withStatePartitions(s, 8) {
      import s.implicits._
      def side(t: String, a: String) = StreamingOps.streamTable(s, dir, "events")
        .filter(col("event_type") === t)
        .select(col("event_id").as(s"${a}_id"), col("user_id").as(s"${a}_uid"),
          col("ts").as(s"${a}_ts"))
        .withWatermark(s"${a}_ts", "0 seconds")
      val joined = side("purchase", "p").join(side("click", "c"),
        expr("p_uid = c_uid AND c_ts >= p_ts AND c_ts <= p_ts + INTERVAL 10 MINUTES"),
        "leftOuter")
        .where(col("c_id").isNull)
      StreamingOps.runToMemory(s, joined.select($"p_id"),
        "append", "graft_stream_anti_join")
        .orderBy($"p_id")
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
           |wm AS (SELECT least((SELECT max(epoch_ms(ts)) FROM p),
           |                    (SELECT max(epoch_ms(ts)) FROM c)) AS w)
           |SELECT p.event_id AS p_id
           |FROM p, wm
           |WHERE NOT EXISTS (SELECT 1 FROM c WHERE c.user_id = p.user_id
           |        AND c.ts >= p.ts AND c.ts <= p.ts + INTERVAL 10 MINUTE)
           |  AND epoch_ms(p.ts) + 600000 <= wm.w
           |ORDER BY p_id""".stripMargin))

  val all: Seq[Q] = Seq(qDedupSqlFirst, qDedupSqlLast, qStreamOuterJoin,
    qStreamFullOuterJoin, qStreamRightOuterJoin, qStreamSemiJoin, qStreamAntiJoin)
}
