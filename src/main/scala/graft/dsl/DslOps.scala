package graft.dsl

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Queries exercising the DataStream-style DSL end-to-end. */
object DslOps {

  /** Classic keyed wordcount through the fluent surface:
    * map -> keyBy -> mapGroups (reference DataStream.map/keyBy/reduce). */
  val qDslWordcount: Q = Q(
    "q_dsl_wordcount",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"event_type").as[String]
      GraftStream(ev)
        .map(t => (t, 1L))
        .keyBy(_._1)
        .mapGroups((k, it) => (k, it.map(_._2).sum))
        .toDF("event_type", "cnt")
        .orderBy($"event_type")
    },
    Some("""SELECT event_type, count(*) AS cnt FROM events
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** split (side outputs) + union roundtrip: big/small value streams
    * re-unioned and aggregated per user. */
  val qDslSplitUnion: Q = Q(
    "q_dsl_split_union",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"user_id", $"value").as[(Long, Double)]
      val (big, small) = GraftStream(ev).split(_._2 >= 100.0)
      val tagged = big.map { case (u, v) => (u, v, "big") }
        .union(small.map { case (u, v) => (u, v, "small") })
      tagged.ds.toDF("user_id", "value", "tag")
        .groupBy($"user_id", $"tag")
        .agg(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .orderBy($"user_id", $"tag")
    },
    Some("""SELECT user_id, CASE WHEN value >= 100.0 THEN 'big' ELSE 'small' END AS tag,
           |       count(*) AS cnt, round(sum(value), 2) AS total
           |FROM events GROUP BY 1, 2 ORDER BY user_id, tag""".stripMargin))

  /** connect + keyed CoProcessFunction (reference DataStream#connect:236,
    * CoProcessFunction.java): signups and purchases as two typed inputs
    * sharing per-user state (last signup value); purchases emit enriched.
    * Same semantics as the as-of join — which is the SQL oracle. */
  val qCoprocessEnrich: Q = Q(
    "q_coprocess_enrich",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id", $"event_type", $"value",
          unix_micros($"ts").as("ts_us"))
        .as[(Long, Long, String, Double, Long)]
      val signups = GraftStream(ev.filter(_._3 == "signup"))
      val purchases = GraftStream(ev.filter(_._3 == "purchase"))
      // signup-before-purchase on ties: order key doubles ts and uses the
      // low bit for input side, mirroring the as-of (<=) tie-break
      signups.connect(purchases)
        .keyedCoProcess[Long, Double, (Long, Option[Double])](
          _._2, _._2, a => a._5 * 2, b => b._5 * 2 + 1)(
          onLeft = (_, a, _) => (Some(a._4), Nil),
          onRight = (_, b, st) => (st, Seq((b._1, st))))
        .toDF("event_id", "last_signup_value")
        .orderBy($"event_id")
    },
    Some("""SELECT a.event_id,
           |  (SELECT arg_max(b.value, printf('%020d-%012d', epoch_us(b.ts), b.event_id))
           |   FROM events b
           |   WHERE b.user_id = a.user_id AND b.event_type = 'signup'
           |     AND b.ts <= a.ts) AS last_signup_value
           |FROM events a WHERE a.event_type = 'purchase'
           |ORDER BY a.event_id""".stripMargin))

  /** partitionCustom (reference DataStream#partitionCustom:412): rows are
    * physically placed on the partition the user function names; the oracle
    * checks the observed per-partition counts equal the function's own
    * distribution — proof the placement was honored. */
  val qPartitionCustom: Q = Q(
    "q_partition_custom",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.t(s, dir, "events")
        .select($"user_id").as[Long]
      GraftStream(ev)
        .partitionCustom(8, u => (u % 8).toInt)
        .ds.mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          it.map(_ => pid)
        }
        .toDF("pid")
        .groupBy($"pid").agg(count(lit(1)).as("cnt"))
        .select($"pid".cast("int").as("pid"), $"cnt")
        .orderBy($"pid")
    },
    Some("""SELECT CAST(user_id % 8 AS INTEGER) AS pid, count(*) AS cnt
           |FROM events GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[Q] = Seq(qDslWordcount, qDslSplitUnion, qCoprocessEnrich,
    qPartitionCustom)
}
