package graft

import graft.plans.{SplitDistinctAgg, SplitDistinctAggRule}
import org.apache.spark.sql.functions._

/** Golden-plan tests for custom optimizer rules — the analogue of the
  * reference's plan-XML tests (flink-table-planner-blink test resources,
  * plan/stream/sql RankTest.xml and friends). */
class PlanRuleSpec extends GraftSpec {

  private def withRule[T](f: => T): T = {
    SplitDistinctAggRule.install(spark)
    spark.conf.set(SplitDistinctAgg.EnabledKey, "true")
    try f finally spark.conf.set(SplitDistinctAgg.EnabledKey, "false")
  }

  test("SplitDistinctAggRule rewrites single count-distinct into two levels") {
    import spark.implicits._
    withRule {
      val df = Tables.t(spark, sfDir, "orders")
        .groupBy($"o_orderstatus")
        .agg(countDistinct($"o_custkey").as("n_cust"))
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bucket") || plan.contains("pmod"), s"no bucket:\n$plan")
      val nAggs = "(?m)Aggregate \\[".r.findAllIn(plan).length
      assert(nAggs >= 2, s"expected 2-level aggregate:\n$plan")
    }
  }

  test("rule preserves count-distinct results exactly (incl. mixed aggs)") {
    import spark.implicits._
    val base = Tables.t(spark, sfDir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_cust"),
        count(lit(1)).as("cnt"),
        round(sum($"o_totalprice"), 2).as("total"),
        max($"o_orderkey").as("mx"))
    val expected = base.collect().map(_.toSeq).toSet
    val got = withRule {
      Tables.t(spark, sfDir, "orders")
        .groupBy($"o_orderstatus")
        .agg(countDistinct($"o_custkey").as("n_cust"),
          count(lit(1)).as("cnt"),
          round(sum($"o_totalprice"), 2).as("total"),
          max($"o_orderkey").as("mx"))
        .collect().map(_.toSeq).toSet
    }
    assert(got == expected)
  }

  test("rewritten aggregate keeps resolving under parent operators") {
    import spark.implicits._
    withRule {
      // Sort + Project + Filter above the aggregate — each references the
      // original grouping/aggregate attributes, so the rewrite must keep
      // their names and exprIds stable
      val got = Tables.t(spark, sfDir, "orders")
        .groupBy($"o_orderstatus")
        .agg(countDistinct($"o_custkey").as("n_cust"),
          round(sum($"o_totalprice"), 2).as("total"))
        .filter($"n_cust" > 0)
        .select($"o_orderstatus", $"n_cust", $"total")
        .orderBy($"o_orderstatus")
        .collect().map(_.toSeq).toSeq
      assert(got.nonEmpty)
      val statuses = got.map(_.head.asInstanceOf[String])
      assert(statuses == statuses.sorted)
    }
  }

  test("rewrite is type-transparent (schema matches unrewritten plan)") {
    import spark.implicits._
    def q = Tables.t(spark, sfDir, "orders")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_cust"),
        count(lit(1)).as("cnt"),
        sum($"o_totalprice").as("total"))
    val plainSchema = q.schema
    val splitSchema = withRule(q.schema)
    assert(splitSchema.map(f => (f.name, f.dataType)) ==
      plainSchema.map(f => (f.name, f.dataType)),
      s"type drift:\n$splitSchema\nvs\n$plainSchema")
  }

  test("rule stays off by default and for unsupported shapes") {
    import spark.implicits._
    SplitDistinctAggRule.install(spark)
    // disabled -> untouched
    val off = Tables.t(spark, sfDir, "orders")
      .groupBy($"o_orderstatus").agg(countDistinct($"o_custkey"))
      .queryExecution.optimizedPlan.toString
    assert(!off.contains("__graft_bucket"))
    // two distincts -> not splittable even when enabled
    withRule {
      val two = Tables.t(spark, sfDir, "orders")
        .groupBy($"o_orderstatus")
        .agg(countDistinct($"o_custkey"), countDistinct($"o_orderpriority"))
        .queryExecution.optimizedPlan.toString
      assert(!two.contains("__graft_bucket"))
    }
  }

  test("explicit splitCountDistinct operator matches plain countDistinct") {
    import spark.implicits._
    val orders = Tables.t(spark, sfDir, "orders")
    val split = SplitDistinctAgg.splitCountDistinct(
        orders, Seq("o_orderstatus"), "o_custkey", 16, "n_cust")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = orders.groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_cust"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split == plain)
  }
}
