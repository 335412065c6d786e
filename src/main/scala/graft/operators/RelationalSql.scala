package graft.operators

import graft.{Q, Tables}

/** SQL-entry-path relational coverage (reference lifecycle §3.1: parse →
  * validate → optimize; subquery handling per FlinkSubQueryRemoveRule /
  * decorrelation phase). Each query runs through spark.sql on registered
  * views — the same string works verbatim as its own DuckDB oracle, so
  * coverage here is parser+rewriter parity, not just DataFrame parity.
  */
object RelationalSql {

  private def sqlQ(name: String, sql: String): Q = Q(
    name,
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
    Some(sql))

  /** GROUP BY + HAVING. */
  val qHaving: Q = sqlQ(
    "q_having",
    """SELECT o_custkey, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey HAVING count(*) >= 12
      |ORDER BY o_custkey""".stripMargin)

  /** IN-subquery → semi join (ConvertToNotInOrInRule analogue is built-in). */
  val qInSubquery: Q = sqlQ(
    "q_in_subquery",
    """SELECT o_orderkey, o_totalprice FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin)

  /** NOT IN subquery on non-nullable keys → anti join. */
  val qNotInSubquery: Q = sqlQ(
    "q_not_in_subquery",
    """SELECT c_custkey, c_name FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin)

  /** IN over an agg-HAVING subquery (TPC-H Q18 shape). */
  val qAggHavingSubquery: Q = sqlQ(
    "q_agg_having_subquery",
    """SELECT o_orderkey, o_orderstatus FROM orders
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING sum(l_quantity) > 150)
      |ORDER BY o_orderkey""".stripMargin)

  /** UNION with distinct semantics (q_union_all covers ALL). */
  val qUnionDistinct: Q = sqlQ(
    "q_union_distinct",
    """SELECT c_nationkey AS nationkey FROM customer
      |UNION SELECT s_nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin)

  /** OVER with numeric RANGE frame: trailing-7-day revenue per customer
    * (reference BatchExecOverAggregate RANGE frames). Spark and DuckDB spell
    * epoch-seconds differently, hence two texts. */
  val qOverRangeFrame: Q = Q(
    "q_over_range_frame",
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_custkey, o_orderkey,
              |       round(sum(o_totalprice) OVER (
              |         PARTITION BY o_custkey
              |         ORDER BY unix_timestamp(o_orderdate)
              |         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS wk_total
              |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
    },
    Some("""SELECT o_custkey, o_orderkey,
           |       round(sum(o_totalprice) OVER (
           |         PARTITION BY o_custkey
           |         ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
           |         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2) AS wk_total
           |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(
    qHaving, qInSubquery, qNotInSubquery, qAggHavingSubquery, qUnionDistinct,
    qOverRangeFrame)
}
