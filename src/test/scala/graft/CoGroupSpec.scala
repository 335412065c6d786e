package graft

import org.apache.spark.sql.functions._

/** coGroup + sort-merge-join coverage (reference DataStream.coGroup:746;
  * BatchExecSortMergeJoin / SortMergeJoinOperator.java). */
class CoGroupSpec extends GraftSpec {

  test("cogroup: purchases vs clicks per user (reference coGroup)") {
    import spark.implicits._
    val e = Tables.t(spark, sfDir, "events")
      .select($"user_id", $"event_type", $"value").as[(Long, String, Double)]
    val purchases = e.filter(_._2 == "purchase").groupByKey(_._1)
    val clicks = e.filter(_._2 == "click").groupByKey(_._1)
    val out = purchases.cogroup(clicks) { (uid, ps, cs) =>
      val pv = ps.map(_._3).sum
      val cn = cs.size
      Iterator.single((uid, pv, cn))
    }.collect().map { case (u, pv, cn) => u -> (math.round(pv * 100) / 100.0, cn) }.toMap
    // matches independent aggregations
    val expP = Tables.t(spark, sfDir, "events").filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(round(sum($"value"), 2).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expC = Tables.t(spark, sfDir, "events").filter($"event_type" === "click")
      .groupBy($"user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (u, (pv, cn)) =>
      assert(math.abs(expP.getOrElse(u, 0.0) - pv) < 1e-6)
      assert(expC.getOrElse(u, 0L) == cn.toLong)
    }
    assert(out.keySet == (expP.keySet ++ expC.keySet))
  }

  test("sort-merge join path: correct without broadcast") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    try {
      val df = Tables.t(spark, sfDir, "orders")
        .join(Tables.t(spark, sfDir, "customer"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("cnt"))
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      val expected = Tables.t(spark, sfDir, "orders")
        .join(broadcast(Tables.t(spark, sfDir, "customer")), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
