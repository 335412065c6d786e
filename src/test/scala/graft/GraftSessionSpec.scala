package graft

class GraftSessionSpec extends GraftSpec {

  test("install wires SQL functions and the optimizer rule onto any session") {
    GraftSession.install(spark)
    // SQL functions live
    val hc = spark.sql("SELECT hash_code('abc') AS h").collect().head.getInt(0)
    assert(hc == "abc".hashCode)
    // rule present (off by default)
    assert(spark.experimental.extraOptimizations.contains(plans.SplitDistinctAggRule))
    assert(spark.conf.getOption(plans.SplitDistinctAgg.EnabledKey).forall(_ == "false"))
    // idempotent
    GraftSession.install(spark)
    assert(spark.experimental.extraOptimizations.count(_ == plans.SplitDistinctAggRule) == 1)
  }
}
