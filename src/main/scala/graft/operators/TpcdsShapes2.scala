package graft.operators

import graft.{Q, Tables}

/** TPC-DS plan-shape sweep, part 2 — the remaining 35 queries of the
  * reference's 103-query bar (flink-end-to-end-tests/flink-tpcds-test/
  * src/main/java/org/apache/flink/table/tpcds/TpcdsTestProgram.java:58-87;
  * the suite runs 99 numbered queries of which q14/q23/q24/q39 each ship
  * two variants = 103 answer files, test-scripts/test_tpcds.sh:84-90).
  * [[TpcdsShapes]] carries 68; this module completes the set: q7 q12 q15
  * q19 q20 q24(a+b) q26 q27 q29 q42 q43 q50 q52 q53 q55 q56 q57 q60 q63
  * q68 q69 q74 q79 q80 q81 q82 q86 q91 q92 q94 q99 and the b-variants of
  * q14/q23/q39.
  *
  * Same charter as part 1: the TPC-DS source tables don't ship in the
  * read-only fixture, so each query re-expresses ITS query's
  * optimizer/executor challenge on the fixture schema, the SQL text is
  * engine-portable and doubles as the DuckDB oracle, and several entries
  * are deliberate template-twins of a part-1 shape because the TPC-DS
  * queries themselves are template twins (q42/q52/q55 of q3, q26 of q7,
  * q57 of q47, q60/q56 of q33, q63 of q53, q82 of q37, q99 of q62,
  * q24b/q39b differ from their a-forms only in a literal or one extra
  * bound) — carrying them separately pins that the SAME plan survives a
  * different constant, grain, or sort, which is exactly what the
  * reference's answer-file bar checks.
  *
  * Parity rules (from part 1, kept throughout): boundary-sensitive
  * comparisons/sorts ride integral `l_quantity` sums or exact-cent
  * `CAST(round(x*100) AS BIGINT)` sums (never raw double sums — summation
  * order flips half-cent roundings cross-engine); year/month/quarter/rank
  * outputs carry explicit casts (INT vs BIGINT differ between engines);
  * nullable ORDER BY columns pin NULLS FIRST; day-lag arithmetic uses
  * intervals (datediff's signature differs between engines); LIMIT always
  * rides a fully deterministic ORDER BY.
  */
object TpcdsShapes2 {

  private def sqlQ(name: String, sql: String): Q = Q(
    name,
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
    Some(sql))

  /** q7: FOUR averages in one aggregate pass over a demographics-style
    * star — each avg needs its own sum+count pair map-side, and the
    * promotion filter is an OR over a second dimension's attributes that
    * stays a residual on that dimension's scan. */
  val q7: Q = sqlQ(
    "q_tpcds_q7_shape",
    """SELECT p_brand,
      |       round(avg(l_quantity), 6) AS agg1,
      |       round(avg(l_extendedprice), 6) AS agg2,
      |       round(avg(l_discount), 6) AS agg3,
      |       round(avg(l_tax), 6) AS agg4
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE c_mktsegment = 'HOUSEHOLD'
      |  AND (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
      |GROUP BY p_brand
      |ORDER BY p_brand
      |LIMIT 100""".stripMargin)

  /** q12 (q98's date-banded twin): per-item revenue share of its class
    * where the 30-day band is interval arithmetic off an anchor date —
    * the band must push to the fact scan BELOW the window. */
  val q12: Q = sqlQ(
    "q_tpcds_q12_shape",
    """SELECT p_type, p_brand, round(itemrevenue, 2) AS itemrevenue,
      |       round(itemrevenue * 100 / sum(itemrevenue) OVER (PARTITION BY p_type), 4) AS revenueratio
      |FROM (SELECT p_type, p_brand, sum(l_extendedprice * (1 - l_discount)) AS itemrevenue
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= DATE '1997-03-01'
      |        AND l_shipdate < DATE '1997-03-01' + INTERVAL '30' DAY
      |      GROUP BY p_type, p_brand) r
      |ORDER BY p_type, p_brand""".stripMargin)

  /** q15: the three-way DISJUNCTION spanning two dimensions AND the fact
    * measure (zip-list OR state-list OR amount>500 in the reference) —
    * no arm can push anywhere, the whole OR evaluates as one residual
    * above a two-dimension join. */
  val q15: Q = sqlQ(
    "q_tpcds_q15_shape",
    """SELECT c_name, round(sum(o_totalprice), 2) AS catsales
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE n_name IN ('FRANCE', 'GERMANY', 'EGYPT')
      |   OR c_mktsegment IN ('AUTOMOBILE', 'MACHINERY')
      |   OR o_totalprice > 400000
      |GROUP BY c_name
      |ORDER BY c_name
      |LIMIT 100""".stripMargin)

  /** q19: the CROSS-DIMENSION INEQUALITY residual — buyer nation <>
    * supplier nation (the reference's customer-zip <> store-zip) can key
    * no join; it evaluates above the join of two independent dimension
    * legs while the year filter still prunes the fact side. */
  val q19: Q = sqlQ(
    "q_tpcds_q19_shape",
    """SELECT p_brand, round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE c_nationkey <> s_nationkey
      |  AND year(o_orderdate) = 1997
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin)

  /** q20 (the q12/q98 family's third template): revenue share against the
    * GLOBAL window total — an empty-PARTITION window over the aggregate
    * output (legal because the aggregate rows, not the fact rows, flow
    * into the single window partition). */
  val q20: Q = sqlQ(
    "q_tpcds_q20_shape",
    """SELECT p_type, round(rev, 2) AS rev,
      |       round(rev * 100 / sum(rev) OVER (), 4) AS share
      |FROM (SELECT p_type, sum(l_extendedprice * (1 - l_discount)) AS rev
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= DATE '1998-02-01'
      |        AND l_shipdate < DATE '1998-02-01' + INTERVAL '30' DAY
      |      GROUP BY p_type) r
      |ORDER BY p_type""".stripMargin)

  /** q24: big spenders via HAVING against a scalar aggregate OF THE
    * QUERY'S OWN CTE (netpaid > 0.05 * avg(netpaid) over all groups), with
    * the same-market equi restriction (c_nation = s_nation) riding the
    * join. Integral quantity keeps the 5% boundary exact. */
  val q24: Q = sqlQ(
    "q_tpcds_q24_shape",
    """WITH spend AS (
      |  SELECT c_name AS cname, s_name AS sname, sum(l_quantity) AS netpaid
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey = s_nationkey AND l_returnflag = 'N'
      |  GROUP BY c_name, s_name)
      |SELECT cname, sname, round(netpaid, 2) AS paid
      |FROM spend
      |WHERE netpaid > (SELECT 0.05 * avg(netpaid) FROM spend)
      |ORDER BY cname, sname""".stripMargin)

  /** q24b: the reference pair differs ONLY in the color literal — carried
    * as the same shape under a different channel constant, pinning that
    * the CTE-dedup + scalar-threshold plan survives a constant swap. */
  val q24b: Q = sqlQ(
    "q_tpcds_q24b_shape",
    """WITH spend AS (
      |  SELECT c_name AS cname, s_name AS sname, sum(l_quantity) AS netpaid
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON o_custkey = c_custkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE c_nationkey = s_nationkey AND l_returnflag = 'A'
      |  GROUP BY c_name, s_name)
      |SELECT cname, sname, round(netpaid, 2) AS paid
      |FROM spend
      |WHERE netpaid > (SELECT 0.05 * avg(netpaid) FROM spend)
      |ORDER BY cname, sname""".stripMargin)

  /** q26 (q7's catalog template-twin): the same four-average pass under a
    * different dimension stack and grain — order status replaces the
    * promotion OR, the group key moves from brand to type. */
  val q26: Q = sqlQ(
    "q_tpcds_q26_shape",
    """SELECT p_type,
      |       round(avg(l_quantity), 6) AS agg1,
      |       round(avg(l_extendedprice), 6) AS agg2,
      |       round(avg(l_discount), 6) AS agg3,
      |       round(avg(l_tax), 6) AS agg4
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE c_mktsegment = 'MACHINERY' AND o_orderstatus = 'F'
      |GROUP BY p_type
      |ORDER BY p_type
      |LIMIT 100""".stripMargin)

  /** q27: the four-average pass OVER A ROLLUP — every avg must keep its
    * sum+count pair per grouping set through the Expand, and the
    * grouping-level arithmetic is an output column. */
  val q27: Q = sqlQ(
    "q_tpcds_q27_shape",
    """SELECT n_name, p_brand,
      |       CAST(grouping(n_name) + grouping(p_brand) AS INTEGER) AS g_level,
      |       round(avg(l_quantity), 6) AS agg1,
      |       round(avg(l_extendedprice), 6) AS agg2,
      |       round(avg(l_discount), 6) AS agg3,
      |       round(avg(l_tax), 6) AS agg4
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE l_returnflag = 'A'
      |GROUP BY ROLLUP (n_name, p_brand)
      |ORDER BY n_name NULLS FIRST, p_brand NULLS FIRST""".stripMargin)

  /** q29 (q25's epoch-pinned sibling): the sold → returned → re-sold
    * three-way fact chain where each leg carries its OWN time band
    * (sold in 1996, returned within two years, re-sold from the
    * following year on) — three differently-pruned scans of one fact. */
  val q29: Q = sqlQ(
    "q_tpcds_q29_shape",
    """WITH sold AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'N'
      |                AND year(l_shipdate) = 1996),
      |     ret  AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'R'
      |                AND year(l_shipdate) IN (1996, 1997)),
      |     res  AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'A'
      |                AND year(l_shipdate) >= 1997)
      |SELECT p_brand,
      |       round(sum(sold.q), 2) AS sold_qty,
      |       round(sum(ret.q), 2) AS ret_qty,
      |       round(sum(res.q), 2) AS resold_qty
      |FROM sold
      |JOIN ret ON sold.ok = ret.ok AND sold.pk = ret.pk
      |JOIN res ON ret.pk = res.pk AND res.ok > ret.ok
      |JOIN part ON sold.pk = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin)

  /** q42 (q3's category template-twin): the date-dim star re-sorted as a
    * DESCENDING-MEASURE TOP-10 report — TakeOrderedAndProject above the
    * aggregate with the measure leading the sort. The sort measure is an
    * exact integral quantity sum so the top-10 cut cannot flip. */
  val q42: Q = sqlQ(
    "q_tpcds_q42_shape",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, p_type,
      |       round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 15
      |GROUP BY year(o_orderdate), p_type
      |ORDER BY qty DESC, yr, p_type
      |LIMIT 10""".stripMargin)

  /** q43: the SEVEN-WAY weekday pivot in one pass — one conditional sum
    * per day-slot per supplier (the reference's sun_sales..sat_sales).
    * day(ts)%7 stands in for the weekday (dayofweek's origin differs
    * between engines: Spark 1=Sunday, DuckDB 0=Sunday — day-of-month mod 7
    * keeps ONE text exact in both). */
  val q43: Q = sqlQ(
    "q_tpcds_q43_shape",
    """SELECT s_name,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 0 THEN l_quantity ELSE 0 END), 2) AS d0_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 1 THEN l_quantity ELSE 0 END), 2) AS d1_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 2 THEN l_quantity ELSE 0 END), 2) AS d2_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 3 THEN l_quantity ELSE 0 END), 2) AS d3_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 4 THEN l_quantity ELSE 0 END), 2) AS d4_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 5 THEN l_quantity ELSE 0 END), 2) AS d5_qty,
      |       round(sum(CASE WHEN day(l_shipdate) % 7 = 6 THEN l_quantity ELSE 0 END), 2) AS d6_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name
      |ORDER BY s_name
      |LIMIT 50""".stripMargin)

  /** q50 (q62's returned-leg sibling): ship-latency buckets keyed by a
    * JOINED dimension and restricted to the returned channel — five bands
    * including the open tail, interval arithmetic throughout. */
  val q50: Q = sqlQ(
    "q_tpcds_q50_shape",
    """SELECT s_name,
      |       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '30' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '90' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d120,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '120' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d120plus
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |WHERE l_returnflag = 'R'
      |GROUP BY s_name
      |ORDER BY s_name""".stripMargin)

  /** q52 (q3/q42's brand template-twin): single-year brand report sorted
    * measure-first — same star, third grain/sort combination. */
  val q52: Q = sqlQ(
    "q_tpcds_q52_shape",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, p_brand,
      |       round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE year(o_orderdate) = 1996 AND p_size = 25
      |GROUP BY year(o_orderdate), p_brand
      |ORDER BY qty DESC, p_brand
      |LIMIT 10""".stripMargin)

  /** q53 (q89's quarterly sibling): QUARTERLY brand sums vs the brand's
    * all-quarter mean, deviation filter >10%. Integral quantity keeps the
    * boundary exact (the q89 lesson). */
  val q53: Q = sqlQ(
    "q_tpcds_q53_shape",
    """SELECT * FROM (
      |  SELECT p_brand, CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      |         round(sum(l_quantity), 2) AS qsum,
      |         round(avg(sum(l_quantity)) OVER (PARTITION BY p_brand), 2) AS avg_quarterly
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    JOIN part ON l_partkey = p_partkey
      |  WHERE p_type = 'ECONOMY' AND year(o_orderdate) = 1997
      |  GROUP BY p_brand, quarter(o_orderdate)
      |) v
      |WHERE avg_quarterly > 0 AND abs(qsum - avg_quarterly) / avg_quarterly > 0.1
      |ORDER BY p_brand, qtr""".stripMargin)

  /** q55 (the q3 family's month-pinned fourth template): one month, brand
    * grain, measure-first sort — the narrowest date-dim star. */
  val q55: Q = sqlQ(
    "q_tpcds_q55_shape",
    """SELECT p_brand, round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 3
      |GROUP BY p_brand
      |ORDER BY qty DESC, p_brand
      |LIMIT 20""".stripMargin)

  /** q56 (q33's list-filtered template-twin): the three-channel UNION ALL
    * re-aggregation where each branch ALSO filters the item dimension by
    * a lowercased name list, and the report sorts by the re-aggregated
    * TOTAL (measure-first over a union re-agg). */
  val q56: Q = sqlQ(
    "q_tpcds_q56_shape",
    """WITH chan1 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'A' AND lower(p_type) IN ('economy', 'standard') GROUP BY p_brand),
      |chan2 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'N' AND lower(p_type) IN ('economy', 'standard') GROUP BY p_brand),
      |chan3 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'R' AND lower(p_type) IN ('economy', 'standard') GROUP BY p_brand)
      |SELECT p_brand, round(sum(qty), 2) AS total_qty
      |FROM (SELECT * FROM chan1 UNION ALL SELECT * FROM chan2 UNION ALL SELECT * FROM chan3) u
      |GROUP BY p_brand
      |ORDER BY total_qty, p_brand
      |LIMIT 100""".stripMargin)

  /** q57 (q47's supplier-dimension template-twin): the lag/lead neighbor
    * window re-grained to the (nation, supplier) hierarchy with the
    * deviation filter expressed as a RATIO band rather than abs() —
    * the same three-window stack under a different residual. */
  val q57: Q = sqlQ(
    "q_tpcds_q57_shape",
    """SELECT * FROM (
      |  SELECT n_name, l_suppkey, CAST(month(l_shipdate) AS INTEGER) AS mon,
      |         round(sum(l_quantity), 2) AS msum,
      |         round(avg(sum(l_quantity)) OVER (
      |           PARTITION BY n_name, l_suppkey), 2) AS avg_all,
      |         round(lag(sum(l_quantity)) OVER (
      |           PARTITION BY n_name, l_suppkey ORDER BY month(l_shipdate)), 2) AS prev_sum,
      |         round(lead(sum(l_quantity)) OVER (
      |           PARTITION BY n_name, l_suppkey ORDER BY month(l_shipdate)), 2) AS next_sum
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |  WHERE year(l_shipdate) = 1997
      |  GROUP BY n_name, l_suppkey, month(l_shipdate)) v
      |WHERE avg_all > 0 AND msum / avg_all NOT BETWEEN 0.8 AND 1.2
      |  AND prev_sum IS NOT NULL AND next_sum IS NOT NULL
      |ORDER BY n_name, l_suppkey, mon""".stripMargin)

  /** q60 (the q33 family's third template): brand-grain three-channel
    * union re-agg under a LIKE-prefix item filter, report sorted by the
    * total then the brand — pins the union-re-agg plan under a third
    * filter/sort combination. */
  val q60: Q = sqlQ(
    "q_tpcds_q60_shape",
    """WITH chan1 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'A' AND p_type LIKE 'PROMO%' GROUP BY p_brand),
      |chan2 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'N' AND p_type LIKE 'PROMO%' GROUP BY p_brand),
      |chan3 AS (
      |  SELECT p_brand, sum(l_quantity) AS qty FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'R' AND p_type LIKE 'PROMO%' GROUP BY p_brand)
      |SELECT p_brand, round(sum(qty), 2) AS total_qty
      |FROM (SELECT * FROM chan1 UNION ALL SELECT * FROM chan2 UNION ALL SELECT * FROM chan3) u
      |GROUP BY p_brand
      |ORDER BY total_qty DESC, p_brand
      |LIMIT 100""".stripMargin)

  /** q63 (q53's manager-grain template-twin): MONTHLY supplier sums vs
    * the supplier's yearly mean — same deviation shape, month grain,
    * supplier dimension. */
  val q63: Q = sqlQ(
    "q_tpcds_q63_shape",
    """SELECT * FROM (
      |  SELECT s_name, CAST(month(l_shipdate) AS INTEGER) AS mon,
      |         round(sum(l_quantity), 2) AS msum,
      |         round(avg(sum(l_quantity)) OVER (PARTITION BY s_name), 2) AS avg_monthly
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |  WHERE year(l_shipdate) = 1996
      |  GROUP BY s_name, month(l_shipdate)
      |) v
      |WHERE avg_monthly > 0 AND abs(msum - avg_monthly) / avg_monthly > 0.1
      |ORDER BY s_name, mon""".stripMargin)

  /** q68 (q46's two-measure sibling): the per-trip aggregate carries TWO
    * measures, and the post-join filter is a BAND on one aggregated
    * measure — the planner must keep the band above the aggregate it
    * references (it constrains sum(ext), not any base column). */
  val q68: Q = sqlQ(
    "q_tpcds_q68_shape",
    """WITH trips AS (
      |  SELECT l_orderkey AS okey, o_custkey AS cust,
      |         sum(l_extendedprice) AS ext_total,
      |         sum(l_extendedprice * l_tax) AS tax_total
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY l_orderkey, o_custkey)
      |SELECT c_name, okey, round(ext_total, 2) AS extended, round(tax_total, 2) AS tax_amt
      |FROM trips JOIN customer ON cust = c_custkey
      |WHERE ext_total BETWEEN 100000 AND 200000
      |ORDER BY c_name, okey
      |LIMIT 100""".stripMargin)

  /** q69 (q10's conjunctive-anti sibling): one REQUIRED EXISTS plus TWO
    * conjunctive NOT EXISTS on the same correlation key — a semi join
    * feeding two stacked anti joins (q10 carried the disjunctive pair;
    * the conjunctive stack plans differently: no ExistenceJoin needed). */
  val q69: Q = sqlQ(
    "q_tpcds_q69_shape",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderpriority = '1-URGENT')
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderpriority = '5-LOW')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin)

  /** q74 (q11/q4's guarded-ratio sibling): the year-over-year two-channel
    * compare where each ratio is wrapped in a divide-guard CASE (the
    * reference's q74 formulation) rather than a positivity conjunct —
    * NULL ratios must fall out of the > comparison identically in both
    * engines. Integral quantity totals keep the ratios IEEE-exact. */
  val q74: Q = sqlQ(
    "q_tpcds_q74_shape",
    """WITH yt AS (
      |  SELECT o_custkey AS cust, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |         sum(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0 END) AS kept,
      |         sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS returned
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE year(o_orderdate) IN (1997, 1998)
      |  GROUP BY o_custkey, year(o_orderdate))
      |SELECT c_custkey, c_name
      |FROM yt cur JOIN yt prv ON cur.cust = prv.cust AND cur.yr = 1998 AND prv.yr = 1997
      |JOIN customer ON c_custkey = cur.cust
      |WHERE CASE WHEN prv.kept > 0 THEN cur.kept / prv.kept END
      |    > CASE WHEN prv.returned > 0 THEN cur.returned / prv.returned END
      |ORDER BY c_custkey""".stripMargin)

  /** q79: the per-(trip, supplier) COMPOSITE-grain rollup dimension-joined
    * on BOTH components and top-listed globally by the trip amount — the
    * aggregate's group key spans the fact's two foreign keys, so the
    * dimension joins land ABOVE the aggregate on different key columns.
    * The sort measure is an exact quantity sum; name/key tie-breaks make
    * the LIMIT deterministic. */
  val q79: Q = sqlQ(
    "q_tpcds_q79_shape",
    """WITH trips AS (
      |  SELECT l_orderkey AS okey, l_suppkey AS skey, sum(l_quantity) AS qty
      |  FROM lineitem
      |  WHERE l_linenumber <= 4
      |  GROUP BY l_orderkey, l_suppkey)
      |SELECT c_name, substring(s_name, 1, 12) AS s_short, okey, round(qty, 2) AS qty
      |FROM trips JOIN orders ON okey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON skey = s_suppkey
      |ORDER BY qty DESC, c_name, s_short, okey
      |LIMIT 100""".stripMargin)

  /** q80 (q77 + ROLLUP): per-channel gross/returns/net with ROLLUP adding
    * the channel and grand totals. The reference UNION ALLs three channel
    * branches (q5 carries that exact union-rollup form); here the channels
    * are synthesized from one fact column, so the query FUSES the branches
    * into a single-scan conditional pivot under the Expand — the q88-style
    * one-pass formulation a 100 TB deployment wants. Exact-cent integer
    * sums keep every rollup level bit-identical cross-engine. */
  val q80: Q = sqlQ(
    "q_tpcds_q80_shape",
    """WITH ch AS (
      |  SELECT CASE WHEN l_linenumber % 3 = 0 THEN 'store'
      |              WHEN l_linenumber % 3 = 1 THEN 'catalog' ELSE 'web' END AS channel,
      |         CASE WHEN l_returnflag <> 'R'
      |              THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END AS sales_c,
      |         CASE WHEN l_returnflag = 'R'
      |              THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END AS ret_c
      |  FROM lineitem)
      |SELECT channel, CAST(grouping(channel) AS INTEGER) AS g_level,
      |       round(CAST(sum(sales_c) AS DOUBLE) / 100.0, 2) AS sales,
      |       round(CAST(sum(ret_c) AS DOUBLE) / 100.0, 2) AS returns_amt,
      |       round(CAST(sum(sales_c) - sum(ret_c) AS DOUBLE) / 100.0, 2) AS profit
      |FROM ch
      |GROUP BY ROLLUP (channel)
      |ORDER BY channel NULLS FIRST""".stripMargin)

  /** q81 (q30's detail-output sibling): the correlated per-nation 1.2x
    * threshold on RETURN AMOUNTS with the qualifying customers joined
    * back to the dimension for detail output. Exact-cent integer sums
    * keep the 1.2x boundary order-independent (the avg of exact integers
    * divides identically in both engines). */
  val q81: Q = sqlQ(
    "q_tpcds_q81_shape",
    """WITH ret AS (
      |  SELECT o_custkey AS ck, c_nationkey AS nk,
      |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS amt_c
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    JOIN customer ON c_custkey = o_custkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY o_custkey, c_nationkey)
      |SELECT c_name, round(CAST(r1.amt_c AS DOUBLE) / 100.0, 2) AS ret_amt
      |FROM ret r1 JOIN customer ON r1.ck = c_custkey
      |WHERE r1.amt_c > (SELECT avg(r2.amt_c) * 1.2 FROM ret r2 WHERE r2.nk = r1.nk)
      |ORDER BY c_name
      |LIMIT 100""".stripMargin)

  /** q82 (q37's template-twin): the attribute-band dimension semi-joined
    * against a channel-restricted fact window, with an IN-LIST size
    * predicate (vs q37's contiguous band) and a name-first sort. */
  val q82: Q = sqlQ(
    "q_tpcds_q82_shape",
    """SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
      |FROM part
      |WHERE p_retailprice BETWEEN 940 AND 980
      |  AND p_size IN (10, 20, 30, 40)
      |  AND p_partkey IN (SELECT l_partkey FROM lineitem
      |                    WHERE l_returnflag = 'A'
      |                      AND l_shipdate >= DATE '1996-01-01'
      |                      AND l_shipdate < DATE '1996-07-01')
      |ORDER BY p_name, p_partkey
      |LIMIT 50""".stripMargin)

  /** q86 (q36 minus the dimension join): the PURE-ROLLUP hierarchy rank —
    * grouping-level arithmetic partitioning a rank over the rollup's own
    * output, no join below the Expand. The rank orders by the rounded
    * exact-cent sum (the q67 convention) with a tie-break. */
  val q86: Q = sqlQ(
    "q_tpcds_q86_shape",
    """SELECT * FROM (
      |  SELECT round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total,
      |         o_orderstatus, o_orderpriority,
      |         CAST(grouping(o_orderstatus) + grouping(o_orderpriority) AS INTEGER) AS lochierarchy,
      |         CAST(rank() OVER (
      |           PARTITION BY grouping(o_orderstatus) + grouping(o_orderpriority),
      |                        CASE WHEN grouping(o_orderpriority) = 0 THEN o_orderstatus END
      |           ORDER BY round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) DESC,
      |                    o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST) AS INTEGER) AS rk
      |  FROM orders
      |  GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |) h
      |ORDER BY lochierarchy DESC,
      |         CASE WHEN lochierarchy = 0 THEN o_orderstatus END NULLS FIRST, rk""".stripMargin)

  /** q91: the returns-loss report over the DEEPEST dimension chain in the
    * sweep — fact → orders → customer → nation → region, measure-first
    * sort. The loss is an exact-cent integer sum so the DESC sort is
    * stable cross-engine; n_name breaks ties. */
  val q91: Q = sqlQ(
    "q_tpcds_q91_shape",
    """SELECT n_name, r_name, round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS loss
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE l_returnflag = 'R' AND o_orderstatus = 'F'
      |GROUP BY n_name, r_name
      |ORDER BY loss DESC, n_name""".stripMargin)

  /** q92 (q32's date-banded twin): the correlated 1.3x excess threshold
    * where the CORRELATED SUBQUERY carries its own date band — the
    * decorrelated aggregate must inherit the band, and everything
    * collapses to one labeled scalar. Integral quantity, exact boundary. */
  val q92: Q = sqlQ(
    "q_tpcds_q92_shape",
    """SELECT round(sum(l1.l_quantity), 2) AS excess_qty
      |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      |WHERE p_size > 40
      |  AND l1.l_shipdate >= DATE '1997-01-01' AND l1.l_shipdate < DATE '1997-04-01'
      |  AND l1.l_quantity > (SELECT 1.3 * avg(l2.l_quantity) FROM lineitem l2
      |                       WHERE l2.l_partkey = l1.l_partkey
      |                         AND l2.l_shipdate >= DATE '1997-01-01'
      |                         AND l2.l_shipdate < DATE '1997-04-01')
      |ORDER BY excess_qty""".stripMargin)

  /** q94 (q16's two-measure twin): the mixed semi/anti correlation
    * (another line from a DIFFERENT supplier exists, no returned line
    * exists) feeding a distinct count plus TWO sums — the aggregate above
    * the semi/anti stack widens without re-planning the joins. */
  val q94: Q = sqlQ(
    "q_tpcds_q94_shape",
    """SELECT CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
      |       round(sum(l1.l_quantity), 2) AS total_qty,
      |       round(CAST(sum(CAST(round(l1.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS total_price
      |FROM orders o JOIN lineitem l1 ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderstatus = 'O'
      |  AND o.o_orderdate >= DATE '1997-01-01' AND o.o_orderdate < DATE '1997-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = o.o_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = o.o_orderkey
      |                    AND l3.l_returnflag = 'R')
      |ORDER BY order_count""".stripMargin)

  /** q99 (q62's month-grained template-twin): the ship-latency band matrix
    * re-grained to (month, priority) — the band columns must recompute
    * under the two-key grouping without widening the scan. */
  val q99: Q = sqlQ(
    "q_tpcds_q99_shape",
    """SELECT CAST(month(o_orderdate) AS INTEGER) AS mo, o_orderpriority,
      |       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '30' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY month(o_orderdate), o_orderpriority
      |ORDER BY mo, o_orderpriority""".stripMargin)

  /** q14b: the cross-channel INTERSECT item set (q14a's CTE) consumed by
    * TWO period legs — this-year vs last-year per-item aggregates, both
    * gated by ONE scalar average CTE, equi-joined for the final compare.
    * The optimizer should build cross_items and the scalar avg ONCE each.
    * Integral quantities keep the scalar gate exact. */
  val q14b: Q = sqlQ(
    "q_tpcds_q14b_shape",
    """WITH cross_items AS (
      |  SELECT l_partkey AS pk FROM lineitem WHERE l_returnflag = 'A'
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
      |avg_sales AS (
      |  SELECT avg(l_quantity) AS a FROM lineitem
      |  WHERE year(l_shipdate) IN (1996, 1997)),
      |this_year AS (
      |  SELECT l_partkey AS pk, sum(l_quantity) AS qty, count(*) AS c
      |  FROM lineitem
      |  WHERE year(l_shipdate) = 1997 AND l_partkey IN (SELECT pk FROM cross_items)
      |  GROUP BY l_partkey),
      |last_year AS (
      |  SELECT l_partkey AS pk, sum(l_quantity) AS qty, count(*) AS c
      |  FROM lineitem
      |  WHERE year(l_shipdate) = 1996 AND l_partkey IN (SELECT pk FROM cross_items)
      |  GROUP BY l_partkey)
      |SELECT t.pk, round(t.qty, 2) AS ty_qty, CAST(t.c AS BIGINT) AS ty_cnt,
      |       round(l.qty, 2) AS ly_qty, CAST(l.c AS BIGINT) AS ly_cnt
      |FROM this_year t JOIN last_year l ON t.pk = l.pk
      |WHERE t.qty > (SELECT a FROM avg_sales)
      |  AND l.qty > (SELECT a FROM avg_sales)
      |ORDER BY t.pk
      |LIMIT 100""".stripMargin)

  /** q23b: q23a's frequent-items x best-customers CTEs consumed as a
    * JOIN (not a semi) — the b-variant emits per-customer detail, so the
    * best-customer set joins back to the dimension for names and the
    * spend re-aggregates per customer. */
  val q23b: Q = sqlQ(
    "q_tpcds_q23b_shape",
    """WITH frequent_parts AS (
      |  SELECT DISTINCT l_partkey FROM (
      |    SELECT l_partkey, year(l_shipdate) AS yr, count(*) AS c
      |    FROM lineitem GROUP BY l_partkey, year(l_shipdate) HAVING count(*) > 6) f),
      |customer_spend AS (
      |  SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey),
      |best_customers AS (
      |  SELECT o_custkey AS bck FROM customer_spend
      |  WHERE spend > (SELECT 0.5 * max(spend) FROM customer_spend))
      |SELECT c_name, round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN best_customers b ON o_custkey = b.bck
      |  JOIN customer ON c_custkey = o_custkey
      |WHERE year(o_orderdate) = 1998
      |  AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
      |GROUP BY c_name
      |ORDER BY qty DESC, c_name
      |LIMIT 100""".stripMargin)

  /** q39b: q39a under the STRICTER bound — the reference pair differs
    * only in the first month's cov threshold (1.5 vs 1.0 on the same
    * template); carried with the tightened leg-1 bound to pin the
    * self-join plan under an asymmetric filter. */
  val q39b: Q = sqlQ(
    "q_tpcds_q39b_shape",
    """WITH inv AS (
      |  SELECT l_suppkey, CAST(month(l_shipdate) AS INTEGER) AS mth,
      |         avg(l_quantity) AS mean, stddev_samp(l_quantity) AS sdev
      |  FROM lineitem WHERE year(l_shipdate) = 1997
      |  GROUP BY l_suppkey, month(l_shipdate))
      |SELECT i1.l_suppkey, i1.mth AS mth1, round(i1.sdev / i1.mean, 6) AS cov1,
      |       i2.mth AS mth2, round(i2.sdev / i2.mean, 6) AS cov2
      |FROM inv i1 JOIN inv i2 ON i1.l_suppkey = i2.l_suppkey AND i2.mth = i1.mth + 1
      |WHERE i1.sdev / i1.mean > 0.6 AND i2.sdev / i2.mean > 0.5
      |ORDER BY i1.l_suppkey, mth1""".stripMargin)

  val all: Seq[Q] = Seq(
    q7, q12, q15, q19, q20, q24, q24b, q26, q27, q29,
    q42, q43, q50, q52, q53, q55, q56, q57, q60, q63,
    q68, q69, q74, q79, q80, q81, q82, q86, q91, q92,
    q94, q99, q14b, q23b, q39b)
}
