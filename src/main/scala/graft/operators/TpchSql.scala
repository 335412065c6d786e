package graft.operators

import graft.{Q, Tables}

/** TPC-H sweep, part 2 (reference e2e bar: flink-end-to-end-tests/
  * test-scripts/test_tpch.sh runs all 22 queries and compares answers via
  * TpchResultComparator.java). RelationalSql covers Q1/Q3/Q5/Q7/Q8/Q10 and
  * the Q12/Q14/Q22 shapes; this module adds the remaining queries expressible
  * on the synthetic fixtures: Q4, Q6, Q13, Q15, Q17, Q18, Q19, Q21.
  *
  * The synthetic schema drops some TPC-H columns (no l_commitdate /
  * l_receiptdate / o_comment / p_container / l_shipmode), so predicates are
  * adapted to existing columns while each query's SHAPE — the part the
  * planner must decorrelate/optimize — is preserved exactly:
  *   Q4  = correlated EXISTS under a grouped count ("late" = shipped > 30
  *         days after order date instead of receipt > commit),
  *   Q13 = outer-join-with-filtered-build distribution-of-counts,
  *   Q17 = correlated scalar-avg subquery threshold (brand+type instead of
  *         brand+container),
  *   Q19 = disjunctive multi-bracket join predicate (brand+size+quantity
  *         brackets instead of brand+container+shipmode),
  *   Q21 = EXISTS + NOT EXISTS double self-correlation ("problem line" =
  *         l_returnflag = 'R' instead of receipt > commit).
  * Q2/Q9/Q11/Q16/Q20 reference the partsupp table, which the read-only
  * testdata does not ship; their SHAPES — the decorrelations and plan forms
  * those five exist to exercise — are expressed with lineitem standing in as
  * the part-supplier relation (it carries exactly partsupp's
  * (partkey, suppkey, cost) association):
  *   Q2  = correlated scalar-MIN subquery selecting the cheapest supplier
  *         per part (min l_extendedprice instead of min ps_supplycost),
  *   Q9  = profit amount-expression over a 5-way join grouped by
  *         nation × year (0.5·l_quantity as the cost term),
  *   Q11 = grouped value with HAVING against a SCALAR-subquery fraction of
  *         the global total (the "important stock" threshold),
  *   Q16 = count-distinct suppliers per part attribute with a NOT IN
  *         exclusion subquery,
  *   Q20 = IN over a grouped-HAVING subquery ("shipped in volume") joined
  *         back to supplier × nation.
  *
  * Every SQL text is engine-portable: the identical string is the DuckDB
  * oracle, so these check parser + decorrelator + optimizer parity.
  */
object TpchSql {

  private def sqlQ(name: String, sql: String): Q = Q(
    name,
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
    Some(sql))

  /** Q4 (order priority checking): grouped count over a correlated EXISTS —
    * the decorrelator must turn the EXISTS into a semi join on o_orderkey
    * before aggregation. */
  val qTpchQ4: Q = sqlQ(
    "q_tpch_q4",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)

  /** Q6 (forecasting revenue change): single-table scan-heavy aggregate —
    * the filters must reach the parquet scan (PushedFilters). */
  val qTpchQ6: Q = sqlQ(
    "q_tpch_q6",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)

  /** Q13 (customer distribution): left outer join with a filter on the
    * RIGHT side inside the ON clause (not a WHERE — nulls must survive),
    * then a distribution-of-counts re-aggregation. */
  val qTpchQ13: Q = sqlQ(
    "q_tpch_q13",
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)

  /** Q15 (top supplier): the revenue CTE is consumed twice — as the join
    * input and under a scalar max. Spark INLINES the CTE into both
    * consumers and neither ReuseExchange nor ReuseSubquery fires across the
    * main-plan/scalar-subquery boundary (measured: lineitem scanned twice),
    * so the Spark side materializes the per-supplier aggregate once
    * (localCheckpoint — at 100 TB: one pass over the fact table, then two
    * reads of a #suppliers-row result) and expresses the scalar max as a
    * broadcast equi-join instead of a subquery. PlanAuditSpec asserts the
    * single fact scan. The oracle keeps the literal CTE SQL. */
  val qTpchQ15: Q = Q(
    "q_tpch_q15",
    (s, dir) => {
      import org.apache.spark.sql.functions._
      import s.implicits._
      val revenue = graft.Tables.t(s, dir, "lineitem")
        .filter($"l_shipdate" >= expr("TIMESTAMP '1997-01-01 00:00:00'") &&
          $"l_shipdate" < expr("TIMESTAMP '1997-04-01 00:00:00'"))
        .groupBy($"l_suppkey".as("supplier_no"))
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
          .as("total_revenue"))
        .localCheckpoint(true)
      val mx = revenue.agg(max($"total_revenue").as("mx"))
      revenue
        .join(broadcast(mx), $"total_revenue" === $"mx")
        .join(graft.Tables.t(s, dir, "supplier").select($"s_suppkey", $"s_name"),
          $"s_suppkey" === $"supplier_no")
        .select($"s_suppkey", $"s_name", $"total_revenue")
        .orderBy($"s_suppkey")
    },
    Some("""WITH revenue AS (
           |  SELECT l_suppkey AS supplier_no,
           |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
           |  FROM lineitem
           |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
           |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
           |  GROUP BY l_suppkey)
           |SELECT s_suppkey, s_name, total_revenue
           |FROM supplier JOIN revenue ON s_suppkey = supplier_no
           |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
           |ORDER BY s_suppkey""".stripMargin))

  /** Q17 (small-quantity-order revenue): correlated scalar AVG subquery —
    * decorrelates to an aggregate joined back on l_partkey. The threshold is
    * exact cross-engine: l_quantity is integer-valued, so sum/count (and
    * hence avg) are exact in double regardless of accumulation order. */
  val qTpchQ17: Q = sqlQ(
    "q_tpch_q17",
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      |  AND l_quantity < 0.2 * (SELECT avg(l2.l_quantity) FROM lineitem l2
      |                          WHERE l2.l_partkey = p_partkey)""".stripMargin)

  /** Q18 (large-volume customer): IN over a grouped-HAVING subquery feeding
    * a 3-way join + re-aggregation, top-100 by price. */
  val qTpchQ18: Q = sqlQ(
    "q_tpch_q18",
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(o_orderdate AS DATE) AS odate, round(o_totalprice, 2) AS totalprice,
      |       round(sum(l_quantity), 2) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |              JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 200)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY totalprice DESC, o_orderkey LIMIT 100""".stripMargin)

  /** Q19 (discounted revenue): one equi-join with a disjunction of
    * per-bracket residual predicates — the join key must still be extracted
    * from under the OR (no nested-loop fallback; asserted in PlanAuditSpec's
    * no-cartesian sweep). */
  val qTpchQ19: Q = sqlQ(
    "q_tpch_q19",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 21)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
      |       AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |       AND l_quantity >= 20 AND l_quantity <= 40)""".stripMargin)

  /** Q21 (suppliers who kept orders waiting): the hardest decorrelation in
    * the suite — an EXISTS and a NOT EXISTS both correlated to the same
    * outer lineitem row (semi + anti join against two filtered self-copies
    * of lineitem). */
  val qTpchQ21: Q = sqlQ(
    "q_tpch_q21",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |              JOIN orders ON o_orderkey = l1.l_orderkey
      |              JOIN nation ON s_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      |  AND n_name = 'NATION_3'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_returnflag = 'R')
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)

  /** Q2 shape (minimum-cost supplier): correlated scalar-MIN subquery — the
    * decorrelator must rewrite it into an aggregate + self-join on the
    * correlation key (partkey), the exact plan TPC-H Q2 exists to test;
    * lineitem plays partsupp, l_extendedprice plays ps_supplycost. */
  val qTpchQ2Shape: Q = sqlQ(
    "q_tpch_q2_shape",
    """SELECT s.s_name, s.s_acctbal, n.n_name AS nation,
      |       l.l_partkey AS p_key, l.l_extendedprice AS price
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE l.l_partkey < 100
      |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
      |                           FROM lineitem l2
      |                           WHERE l2.l_partkey = l.l_partkey)
      |ORDER BY s.s_acctbal DESC, nation, s.s_name, p_key, price""".stripMargin)

  /** Q9 shape (product-type profit): amount expression with a cost term over
    * a 5-way join, grouped by nation × order year (0.5·l_quantity stands in
    * for ps_supplycost·l_quantity). The profit is summed in integer CENTS —
    * each addend rounded to an integral double, so the aggregate is exact
    * and ORDER-INDEPENDENT (a float sum over ~150 groups hit 2-dec rounding
    * boundaries run-to-run; engines must agree on every group regardless of
    * partitioning). */
  val qTpchQ9Shape: Q = sqlQ(
    "q_tpch_q9_shape",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |       round(sum(round(100 * (l.l_extendedprice * (1 - l.l_discount)
      |                              - 0.5 * l.l_quantity))) / 100.0, 2) AS sum_profit
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_name LIKE '%a%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)

  /** Q11 shape (important stock): grouped value filtered by a HAVING whose
    * right side is a SCALAR subquery over the same relation — the
    * fraction-of-global-total threshold Q11's planner test is about. */
  val qTpchQ11Shape: Q = sqlQ(
    "q_tpch_q11_shape",
    """SELECT l_suppkey,
      |       round(sum(round(100 * l_extendedprice * (1 - l_discount))) / 100.0, 2)
      |         AS value
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING sum(round(100 * l_extendedprice * (1 - l_discount))) >
      |       (SELECT sum(round(100 * l_extendedprice * (1 - l_discount))) * 0.01
      |        FROM lineitem)
      |ORDER BY value DESC, l_suppkey""".stripMargin)

  /** Q16 shape (supplier relationship count): count-DISTINCT suppliers per
    * part attribute with a NOT IN anti-join exclusion — the
    * distinct-agg-over-anti-join plan form. */
  val qTpchQ16Shape: Q = sqlQ(
    "q_tpch_q16_shape",
    """SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |WHERE p.p_type <> 'SMALL'
      |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p.p_brand, p.p_size
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_size""".stripMargin)

  /** Q20 shape (volume shippers): IN over a grouped-HAVING subquery (semi
    * join against an aggregate), joined back to supplier × nation — Q20's
    * nested-aggregate decorrelation with the availability predicate mapped
    * to shipped volume. */
  val qTpchQ20Shape: Q = sqlQ(
    "q_tpch_q20_shape",
    """SELECT s.s_suppkey, s.s_name, n.n_name AS nation
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (SELECT l_suppkey FROM lineitem
      |                      GROUP BY l_suppkey, l_partkey
      |                      HAVING sum(l_quantity) > 130)
      |ORDER BY s.s_suppkey""".stripMargin)

  val all: Seq[Q] = Seq(
    qTpchQ4, qTpchQ6, qTpchQ13, qTpchQ15, qTpchQ17, qTpchQ18, qTpchQ19, qTpchQ21,
    qTpchQ2Shape, qTpchQ9Shape, qTpchQ11Shape, qTpchQ16Shape, qTpchQ20Shape)
}
