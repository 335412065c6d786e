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

  val all: Seq[Q] = Seq(qDslWordcount, qDslSplitUnion)
}
