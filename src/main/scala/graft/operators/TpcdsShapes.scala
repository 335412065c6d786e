package graft.operators

import graft.{Q, Tables}

/** TPC-DS plan-shape sweep.
  *
  * The reference's SECOND benchmark bar (BASELINE.md) is the full 103-query
  * TPC-DS suite at sf1: flink-end-to-end-tests/flink-tpcds-test/src/main/
  * java/org/apache/flink/table/tpcds/TpcdsTestProgram.java:58-87 runs every
  * query on the Blink batch planner and exact-compares answers
  * (test-scripts/test_tpcds.sh:84-90). The 24 TPC-DS source tables don't
  * ship in the read-only fixture, so — exactly like the partsupp-less TPC-H
  * queries in [[TpchSql]] — this module expresses the DISTINCTIVE TPC-DS
  * plan shapes that TPC-H does not exercise, on the fixture schema. Each
  * query names the TPC-DS query whose optimizer/executor challenge it
  * carries; the SQL text is engine-portable and doubles as the DuckDB
  * oracle, so these check parser + optimizer + execution parity on:
  *
  *  - ROLLUP feeding a window RANK partitioned by the rollup's own
  *    grouping level (q36's lochierarchy arithmetic, q67's category rank),
  *  - cumulative ROWS-UNBOUNDED windows from two channels FULL-OUTER
  *    merged then window-maxed over the coalesced keys (q51),
  *  - period-over-period self-join of a pivoted aggregate CTE (q59),
  *  - single-pass multi-band conditional counts (q88 — the reference's 8
  *    cross-joined scalar subqueries fused into one scan: the formulation
  *    a 100 TB deployment wants, one pass instead of eight),
  *  - HAVING-band aggregate joined back to its dimensions (q73),
  *  - multi-CTE semi-join pipeline with a scalar-subquery threshold over a
  *    reused CTE (q23's frequent-items x best-customers),
  *  - deviation-from-window-average filters (q89),
  *  - two-channel year-over-year ratio comparison via double self-join of
  *    one CTE (q11/q4 family),
  *  - histogram re-aggregation of an aggregate (q54's revenue bands),
  *  - fact-to-fact self-join with second-moment aggregates (q17's
  *    avg/stddev/coefficient-of-variation over kept vs returned),
  *  - revenue share against a window total (q98),
  *  - chained INTERSECT feeding a semi join (q14's cross-channel parts),
  *  - per-channel aggregates UNION ALL'd and re-aggregated (q33/q56),
  *  - dual-measure top-N lists UNIONed with basis tags (q49),
  *  - growth-chain of self-joins of one quarterly CTE (q31),
  *  - the wide conditional CASE pivot in one pass (q66),
  *  - net-of-returns conditional aggregation with a HAVING comparison of
  *    two conditional sums (q93).
  *
  * Type pins: the driver's hash compare is type-sensitive, and
  * year/month/weekofyear/rank/grouping return INT in Spark but BIGINT in
  * DuckDB — every such output column carries an explicit CAST so one text
  * yields one schema in both engines. Nullable ORDER BY columns pin NULLS
  * FIRST because the engines' defaults differ.
  */
object TpcdsShapes {

  private def sqlQ(name: String, sql: String): Q = Q(
    name,
    (s, dir) => { Tables.registerAll(s, dir); s.sql(sql) },
    Some(sql))

  /** q67: aggregate over ROLLUP, then rank within the top-level rollup
    * column — the planner must keep ONE Expand + one window, not re-plan
    * per grouping set. */
  val q67: Q = sqlQ(
    "q_tpcds_q67_shape",
    """SELECT * FROM (
      |  SELECT l_returnflag, l_linestatus, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS sumsales,
      |         CAST(rank() OVER (PARTITION BY l_returnflag
      |                    ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
      |                             l_linestatus NULLS FIRST, year(l_shipdate) NULLS FIRST)
      |              AS INTEGER) AS rk
      |  FROM lineitem
      |  GROUP BY ROLLUP (l_returnflag, l_linestatus, year(l_shipdate))
      |) ranked
      |WHERE rk <= 5
      |ORDER BY l_returnflag NULLS FIRST, rk""".stripMargin)

  /** q36: gross-margin rollup with lochierarchy = grouping()+grouping()
    * appearing in BOTH the output and the window PARTITION BY — the
    * grouping-id must be available to the window operator above the
    * Expand. */
  val q36: Q = sqlQ(
    "q_tpcds_q36_shape",
    """SELECT * FROM (
      |  SELECT round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6) AS margin,
      |         l_returnflag, l_linestatus,
      |         CAST(grouping(l_returnflag) + grouping(l_linestatus) AS INTEGER) AS lochierarchy,
      |         CAST(rank() OVER (PARTITION BY grouping(l_returnflag) + grouping(l_linestatus),
      |                                 CASE WHEN grouping(l_linestatus) = 0 THEN l_returnflag END
      |                    ORDER BY round(sum(l_extendedprice * l_discount) / sum(l_extendedprice), 6) ASC,
      |                             l_returnflag NULLS FIRST, l_linestatus NULLS FIRST)
      |              AS INTEGER) AS rk
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_size < 30
      |  GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |) h
      |ORDER BY lochierarchy DESC, CASE WHEN lochierarchy = 0 THEN l_returnflag END NULLS FIRST, rk""".stripMargin)

  /** q51: per-channel cumulative sums (window over an aggregate —
    * sum(sum(x)) OVER), FULL OUTER merged on (key, day), running max over
    * the coalesced spine, keep days where one channel's cumulative leads. */
  val q51: Q = sqlQ(
    "q_tpcds_q51_shape",
    """WITH clicks AS (
      |  SELECT user_id, cast(ts AS date) AS d,
      |         sum(sum(value)) OVER (PARTITION BY user_id ORDER BY cast(ts AS date)
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, cast(ts AS date)),
      |views AS (
      |  SELECT user_id, cast(ts AS date) AS d,
      |         sum(sum(value)) OVER (PARTITION BY user_id ORDER BY cast(ts AS date)
      |                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cume
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, cast(ts AS date))
      |SELECT user_id, d, round(click_cume, 2) AS click_cume, round(view_cume, 2) AS view_cume
      |FROM (
      |  SELECT coalesce(c.user_id, v.user_id) AS user_id, coalesce(c.d, v.d) AS d,
      |         max(c.cume) OVER (PARTITION BY coalesce(c.user_id, v.user_id)
      |                           ORDER BY coalesce(c.d, v.d)
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_cume,
      |         max(v.cume) OVER (PARTITION BY coalesce(c.user_id, v.user_id)
      |                           ORDER BY coalesce(c.d, v.d)
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS view_cume
      |  FROM clicks c FULL OUTER JOIN views v ON c.user_id = v.user_id AND c.d = v.d
      |) x
      |WHERE round(click_cume, 2) > round(view_cume, 2)
      |ORDER BY user_id, d""".stripMargin)

  /** q59: week-over-week — one pivoted weekly-sales CTE self-joined a year
    * apart on (supplier, week); the optimizer should build the CTE once. */
  val q59: Q = sqlQ(
    "q_tpcds_q59_shape",
    """WITH wsales AS (
      |  SELECT l_suppkey AS suppkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |         CAST(weekofyear(l_shipdate) AS INTEGER) AS wk,
      |         sum(CASE WHEN l_returnflag = 'A' THEN l_extendedprice ELSE 0 END) AS a_sales,
      |         sum(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END) AS n_sales,
      |         sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) AS r_sales
      |  FROM lineitem GROUP BY l_suppkey, year(l_shipdate), weekofyear(l_shipdate))
      |SELECT y.suppkey, y.wk,
      |       round(y.a_sales / nullif(x.a_sales, 0), 4) AS a_ratio,
      |       round(y.n_sales / nullif(x.n_sales, 0), 4) AS n_ratio,
      |       round(y.r_sales / nullif(x.r_sales, 0), 4) AS r_ratio
      |FROM wsales y JOIN wsales x
      |  ON y.suppkey = x.suppkey AND y.wk = x.wk AND y.yr = 1998 AND x.yr = 1997
      |ORDER BY y.suppkey, y.wk""".stripMargin)

  /** q88: the reference cross-joins 8 single-row time-band counts; fused
    * here into ONE scan of conditional counts — the same answer in one
    * pass instead of eight, which is the shape that survives 100 TB. */
  val q88: Q = sqlQ(
    "q_tpcds_q88_shape",
    """SELECT count(*) FILTER (WHERE hour(ts) < 4)               AS h0_3,
      |       count(*) FILTER (WHERE hour(ts) BETWEEN 4 AND 7)   AS h4_7,
      |       count(*) FILTER (WHERE hour(ts) BETWEEN 8 AND 11)  AS h8_11,
      |       count(*) FILTER (WHERE hour(ts) BETWEEN 12 AND 15) AS h12_15,
      |       count(*) FILTER (WHERE hour(ts) BETWEEN 16 AND 19) AS h16_19,
      |       count(*) FILTER (WHERE hour(ts) >= 20)             AS h20_23
      |FROM events WHERE event_type IN ('click', 'view')""".stripMargin)

  /** q73: orders whose line count falls in a band (HAVING BETWEEN on a
    * grouped count), joined back out to their customers. */
  val q73: Q = sqlQ(
    "q_tpcds_q73_shape",
    """SELECT c_name, c_custkey, o_orderkey, cnt
      |FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem
      |      GROUP BY l_orderkey HAVING count(*) BETWEEN 6 AND 7) t
      |JOIN orders ON t.l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY cnt DESC, c_custkey, o_orderkey""".stripMargin)

  /** q23: frequent parts (per-year count threshold) x best customers
    * (scalar-subquery fraction of the max spend over a REUSED CTE), both
    * applied as semi joins to the fact scan. */
  val q23: Q = sqlQ(
    "q_tpcds_q23_shape",
    """WITH frequent_parts AS (
      |  SELECT DISTINCT l_partkey FROM (
      |    SELECT l_partkey, year(l_shipdate) AS yr, count(*) AS c
      |    FROM lineitem GROUP BY l_partkey, year(l_shipdate) HAVING count(*) > 6) f),
      |customer_spend AS (
      |  SELECT o_custkey, sum(o_totalprice) AS spend FROM orders GROUP BY o_custkey)
      |SELECT round(sum(l_extendedprice), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE year(o_orderdate) = 1998
      |  AND l_partkey IN (SELECT l_partkey FROM frequent_parts)
      |  AND o_custkey IN (SELECT o_custkey FROM customer_spend
      |                    WHERE spend > (SELECT 0.5 * max(spend) FROM customer_spend))""".stripMargin)

  /** q89: monthly sums vs the window average of the same partition's
    * months; keep months deviating >30% from their year's mean. The
    * measure is l_quantity (integral values): its sums are
    * order-independent-exact in doubles, so the boundary-sensitive
    * deviation filter and round() agree bit-for-bit across engines —
    * sum(l_extendedprice) here flipped a cent at a rounding boundary
    * under DuckDB-vs-Spark summation order. */
  val q89: Q = sqlQ(
    "q_tpcds_q89_shape",
    """SELECT * FROM (
      |  SELECT l_returnflag, l_suppkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |         CAST(month(l_shipdate) AS INTEGER) AS mon,
      |         round(sum(l_quantity), 2) AS msum,
      |         round(avg(sum(l_quantity)) OVER (
      |           PARTITION BY l_returnflag, l_suppkey, year(l_shipdate)), 2) AS avg_monthly
      |  FROM lineitem WHERE year(l_shipdate) IN (1997, 1998)
      |  GROUP BY l_returnflag, l_suppkey, year(l_shipdate), month(l_shipdate)
      |) m
      |WHERE avg_monthly > 0 AND abs(msum - avg_monthly) / avg_monthly > 0.3
      |ORDER BY l_returnflag, l_suppkey, yr, mon""".stripMargin)

  /** q11/q4 family: one per-customer-per-year two-channel CTE self-joined
    * across consecutive years; keep customers whose first-channel growth
    * ratio beats their second-channel growth ratio. */
  val q11: Q = sqlQ(
    "q_tpcds_q11_shape",
    """WITH yearly AS (
      |  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |         sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END) AS urgent,
      |         sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice ELSE 0 END) AS low
      |  FROM orders GROUP BY o_custkey, year(o_orderdate))
      |SELECT c_custkey, c_name
      |FROM yearly y97 JOIN yearly y98 ON y97.o_custkey = y98.o_custkey AND y97.yr = 1997 AND y98.yr = 1998
      |JOIN customer ON c_custkey = y97.o_custkey
      |WHERE y97.urgent > 0 AND y97.low > 0
      |  AND y98.urgent / y97.urgent > y98.low / y97.low
      |ORDER BY c_custkey""".stripMargin)

  /** q54: histogram of an aggregate — per-customer yearly revenue bucketed
    * into fixed-width bands, then the band populations. */
  val q54: Q = sqlQ(
    "q_tpcds_q54_shape",
    """SELECT segment, count(*) AS num_customers, segment * 5000 AS segment_base
      |FROM (SELECT o_custkey, cast(floor(sum(o_totalprice) / 5000) AS int) AS segment
      |      FROM orders WHERE year(o_orderdate) = 1998 GROUP BY o_custkey) s
      |GROUP BY segment ORDER BY segment""".stripMargin)

  /** q17: fact-to-fact self-join (kept vs returned legs of the same
    * part+supplier), second-moment aggregates incl. the coefficient of
    * variation that q17 exists to compute. */
  val q17: Q = sqlQ(
    "q_tpcds_q17_shape",
    """SELECT p_brand, count(*) AS cnt,
      |       round(avg(k.l_quantity), 4) AS kept_avg,
      |       round(stddev_samp(k.l_quantity), 4) AS kept_std,
      |       round(avg(r.l_quantity), 4) AS ret_avg,
      |       round(stddev_samp(r.l_quantity), 4) AS ret_std,
      |       round(stddev_samp(k.l_quantity) / avg(k.l_quantity), 4) AS kept_cov
      |FROM lineitem k JOIN lineitem r
      |  ON k.l_partkey = r.l_partkey AND k.l_suppkey = r.l_suppkey
      | AND k.l_orderkey <> r.l_orderkey
      |JOIN part ON k.l_partkey = p_partkey
      |WHERE k.l_returnflag = 'N' AND r.l_returnflag = 'R'
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  /** q98: per-item revenue share of its class — a window total in the
    * denominator of each row's ratio. */
  val q98: Q = sqlQ(
    "q_tpcds_q98_shape",
    """SELECT p_type, p_brand, round(itemrevenue, 2) AS itemrevenue,
      |       round(itemrevenue * 100 / sum(itemrevenue) OVER (PARTITION BY p_type), 4) AS revenueratio
      |FROM (SELECT p_type, p_brand, sum(l_extendedprice * (1 - l_discount)) AS itemrevenue
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1998-03-01 00:00:00'
      |      GROUP BY p_type, p_brand) r
      |ORDER BY p_type, p_brand""".stripMargin)

  /** q14: parts present in ALL THREE channels — chained INTERSECT
    * (distinct set semantics) feeding a semi join on the fact scan. */
  val q14: Q = sqlQ(
    "q_tpcds_q14_shape",
    """WITH cross_parts AS (
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      |  INTERSECT
      |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R')
      |SELECT l_returnflag, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sales,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_partkey IN (SELECT l_partkey FROM cross_parts)
      |  AND year(l_shipdate) = 1998
      |GROUP BY l_returnflag, year(l_shipdate)
      |ORDER BY l_returnflag, yr""".stripMargin)

  /** q33 (the q56/q60 family's template, twins in [[TpcdsShapes2]]):
    * three per-channel aggregates UNION ALL'd, then
    * re-aggregated to the cross-channel total. */
  val q33: Q = sqlQ(
    "q_tpcds_q33_shape",
    """WITH chan1 AS (
      |  SELECT p_brand, sum(l_extendedprice) AS rev FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'A' AND year(l_shipdate) = 1998 GROUP BY p_brand),
      |chan2 AS (
      |  SELECT p_brand, sum(l_extendedprice) AS rev FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'N' AND year(l_shipdate) = 1998 GROUP BY p_brand),
      |chan3 AS (
      |  SELECT p_brand, sum(l_extendedprice) AS rev FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_returnflag = 'R' AND year(l_shipdate) = 1998 GROUP BY p_brand)
      |SELECT p_brand, round(sum(rev), 2) AS total_rev
      |FROM (SELECT * FROM chan1 UNION ALL SELECT * FROM chan2 UNION ALL SELECT * FROM chan3) u
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin)

  /** q49: worst-return parts ranked by TWO different measures, the two
    * top-10 lists UNIONed (distinct) with their basis tags. Rank order
    * keys use the ROUNDED ratios so ulp-level summation differences
    * cannot reorder the cutoff across engines (quantity ratios are
    * integral-exact already). */
  val q49: Q = sqlQ(
    "q_tpcds_q49_shape",
    """WITH ratios AS (
      |  SELECT l_partkey,
      |         cast(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS double)
      |           / nullif(sum(l_quantity), 0) AS ret_ratio,
      |         sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END)
      |           / nullif(sum(l_extendedprice), 0) AS amt_ratio
      |  FROM lineitem WHERE year(l_shipdate) = 1998
      |  GROUP BY l_partkey HAVING sum(l_quantity) > 0),
      |ranked AS (
      |  SELECT l_partkey, round(ret_ratio, 6) AS ret_ratio, round(amt_ratio, 6) AS amt_ratio,
      |         CAST(rank() OVER (ORDER BY round(ret_ratio, 6) DESC, l_partkey) AS INTEGER) AS qty_rank,
      |         CAST(rank() OVER (ORDER BY round(amt_ratio, 6) DESC, l_partkey) AS INTEGER) AS amt_rank
      |  FROM ratios)
      |SELECT * FROM (
      |  SELECT l_partkey, ret_ratio, amt_ratio, qty_rank AS rk, 'qty' AS basis FROM ranked WHERE qty_rank <= 10
      |  UNION
      |  SELECT l_partkey, ret_ratio, amt_ratio, amt_rank AS rk, 'amt' AS basis FROM ranked WHERE amt_rank <= 10) u
      |ORDER BY basis, rk, l_partkey""".stripMargin)

  /** q31: quarter-over-quarter growth comparison via a CHAIN of self-joins
    * of one quarterly CTE (the reference's county/web-vs-store growth
    * chain). */
  val q31: Q = sqlQ(
    "q_tpcds_q31_shape",
    """WITH qsales AS (
      |  SELECT n_name, CAST(quarter(o_orderdate) AS INTEGER) AS qtr, sum(o_totalprice) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
      |  WHERE year(o_orderdate) = 1998 GROUP BY n_name, quarter(o_orderdate))
      |SELECT q1.n_name,
      |       round(q2.rev / q1.rev, 6) AS g12,
      |       round(q3.rev / q2.rev, 6) AS g23
      |FROM qsales q1 JOIN qsales q2 ON q1.n_name = q2.n_name AND q1.qtr = 1 AND q2.qtr = 2
      |     JOIN qsales q3 ON q1.n_name = q3.n_name AND q3.qtr = 3
      |WHERE q1.rev > 0 AND q2.rev > 0 AND q2.rev / q1.rev > q3.rev / q2.rev
      |ORDER BY q1.n_name""".stripMargin)

  /** q66: the wide CASE pivot — per-supplier month columns over two
    * measure families in one aggregate pass (12-way conditional
    * projection, single shuffle). */
  val q66: Q = sqlQ(
    "q_tpcds_q66_shape",
    """SELECT l_suppkey,
      |       round(sum(CASE WHEN month(l_shipdate) = 1 THEN l_quantity ELSE 0 END), 2) AS jan_qty,
      |       round(sum(CASE WHEN month(l_shipdate) = 2 THEN l_quantity ELSE 0 END), 2) AS feb_qty,
      |       round(sum(CASE WHEN month(l_shipdate) = 3 THEN l_quantity ELSE 0 END), 2) AS mar_qty,
      |       round(sum(CASE WHEN month(l_shipdate) = 4 THEN l_quantity ELSE 0 END), 2) AS apr_qty,
      |       round(sum(CASE WHEN month(l_shipdate) = 5 THEN l_quantity ELSE 0 END), 2) AS may_qty,
      |       round(sum(CASE WHEN month(l_shipdate) = 6 THEN l_quantity ELSE 0 END), 2) AS jun_qty,
      |       round(sum(CASE WHEN month(l_shipdate) <= 6 THEN l_extendedprice ELSE 0 END), 2) AS h1_rev,
      |       round(sum(CASE WHEN month(l_shipdate) > 6 THEN l_extendedprice ELSE 0 END), 2) AS h2_rev
      |FROM lineitem WHERE year(l_shipdate) = 1998
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)

  /** q93: net-of-returns per customer — the returned leg subtracted via
    * conditional aggregation, keeping customers who returned more than
    * they kept. */
  val q93: Q = sqlQ(
    "q_tpcds_q93_shape",
    """SELECT c_custkey,
      |       round(sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END), 2) AS net_rev,
      |       round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS returned_rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON o_custkey = c_custkey
      |WHERE year(o_orderdate) = 1998
      |GROUP BY c_custkey
      |HAVING sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END) >
      |       sum(CASE WHEN l_returnflag = 'R' THEN 0 ELSE l_extendedprice END)
      |ORDER BY c_custkey""".stripMargin)

  /** q72: the many-dimension star with DATE LOGIC in the join — seven
    * relations and an inter-table date-offset predicate (q72's
    * d1.d_date + 5 days < d2.d_date between promotion/ship/inventory
    * dates). The planner must order the star joins and keep the date
    * arithmetic a post-join filter, not a join-breaking expression. */
  val q72: Q = sqlQ(
    "q_tpcds_q72_shape",
    """SELECT p_brand, n_name, CAST(year(o_orderdate) AS INTEGER) AS yr,
      |       count(*) AS n_late, round(sum(l_quantity), 2) AS late_qty
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |JOIN part     ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r_name IN ('EUROPE', 'ASIA') AND p_size < 25
      |  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      |GROUP BY p_brand, n_name, year(o_orderdate)
      |HAVING count(*) >= 2
      |ORDER BY n_late DESC, p_brand, n_name, yr
      |LIMIT 100""".stripMargin)

  /** q64: the twice-sold chain — ONE per-(customer, part, year) sales CTE
    * instantiated twice and chained on the same (customer, part) across
    * consecutive years with a cross-instance measure comparison, then the
    * surviving pairs joined back out to both dimensions (q64's
    * cross_sales cs1/cs2 self-join on item with cnt <= cnt). Quantities
    * are integral, so the s2 >= s1 cutoff is exact in both engines. */
  val q64: Q = sqlQ(
    "q_tpcds_q64_shape",
    """WITH sales AS (
      |  SELECT o_custkey AS cust, l_partkey AS part,
      |         CAST(year(o_orderdate) AS INTEGER) AS yr,
      |         count(*) AS cnt, sum(l_quantity) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey, l_partkey, year(o_orderdate))
      |SELECT c_name, p_name, s1.cnt AS cnt97, s2.cnt AS cnt98,
      |       round(s1.qty, 2) AS qty97, round(s2.qty, 2) AS qty98
      |FROM sales s1
      |JOIN sales s2 ON s1.cust = s2.cust AND s1.part = s2.part
      |JOIN customer ON s1.cust = c_custkey
      |JOIN part ON s1.part = p_partkey
      |WHERE s1.yr = 1997 AND s2.yr = 1998 AND s2.qty >= s1.qty
      |ORDER BY c_name, p_name""".stripMargin)

  /** q78: the channel comparison NET OF RETURNS — each channel's leg
    * ANTI-joins the returned (order, part) pairs (q78's
    * ws_ret.wr_order_number IS NULL outer-join-filter shape, expressed as
    * NOT EXISTS), the two channels FULL-OUTER merge on (supplier, year),
    * and the share ratio compares them. Integral quantities keep the
    * ratio bit-identical across engines. */
  val q78: Q = sqlQ(
    "q_tpcds_q78_shape",
    """WITH ret AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      |             WHERE l_returnflag = 'R'),
      |chan_n AS (
      |  SELECT l_suppkey AS suppkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |         sum(l_quantity) AS qty
      |  FROM lineitem l
      |  WHERE l_returnflag = 'N'
      |    AND NOT EXISTS (SELECT 1 FROM ret r
      |                    WHERE r.l_orderkey = l.l_orderkey
      |                      AND r.l_partkey = l.l_partkey)
      |  GROUP BY l_suppkey, year(l_shipdate)),
      |chan_a AS (
      |  SELECT l_suppkey AS suppkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
      |         sum(l_quantity) AS qty
      |  FROM lineitem l
      |  WHERE l_returnflag = 'A'
      |    AND NOT EXISTS (SELECT 1 FROM ret r
      |                    WHERE r.l_orderkey = l.l_orderkey
      |                      AND r.l_partkey = l.l_partkey)
      |  GROUP BY l_suppkey, year(l_shipdate))
      |SELECT coalesce(n.suppkey, a.suppkey) AS suppkey,
      |       coalesce(n.yr, a.yr) AS yr,
      |       round(coalesce(n.qty, 0), 2) AS n_qty,
      |       round(coalesce(a.qty, 0), 2) AS a_qty,
      |       round(coalesce(n.qty, 0)
      |             / nullif(coalesce(n.qty, 0) + coalesce(a.qty, 0), 0), 6) AS n_share
      |FROM chan_n n FULL OUTER JOIN chan_a a
      |  ON n.suppkey = a.suppkey AND n.yr = a.yr
      |ORDER BY suppkey, yr""".stripMargin)

  /** q35/q10: the EXISTS-AND-(EXISTS-OR-EXISTS) correlation — a customer
    * qualifies by presence in one channel AND presence in at least one of
    * two others. The planner must decorrelate a DISJUNCTION of correlated
    * EXISTS (q10/q35's exists(ss) and (exists(ws) or exists(cs))) — the
    * decorrelation TPC-H never asks for. Balance sums are 2-dec inputs:
    * their sums round exactly. */
  val q35: Q = sqlQ(
    "q_tpcds_q35_shape",
    """SELECT n_name, c_mktsegment, count(*) AS cnt,
      |       round(sum(c_acctbal), 2) AS bal_sum,
      |       round(max(c_acctbal), 2) AS bal_max
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
      |              AND year(o.o_orderdate) = 1998)
      |  AND (EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
      |               AND o.o_orderpriority = '1-URGENT')
      |       OR EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c_custkey
      |                  AND o.o_orderstatus = 'F'))
      |GROUP BY n_name, c_mktsegment
      |ORDER BY n_name, c_mktsegment""".stripMargin)

  /** q47 (q57's template in [[TpcdsShapes2]]): the lag/lead NEIGHBOR
    * window over an aggregate — each
    * month's sum beside its partition's mean AND its previous/next
    * month's sums, three window functions over one grouped relation; keep
    * months deviating >20% from the mean with both neighbors present.
    * Integral quantity sums make the deviation cutoff exact. */
  val q47: Q = sqlQ(
    "q_tpcds_q47_shape",
    """SELECT * FROM (
      |  SELECT l_returnflag, l_suppkey, CAST(month(l_shipdate) AS INTEGER) AS mon,
      |         round(sum(l_quantity), 2) AS msum,
      |         round(avg(sum(l_quantity)) OVER (
      |           PARTITION BY l_returnflag, l_suppkey), 2) AS avg_all,
      |         round(lag(sum(l_quantity)) OVER (
      |           PARTITION BY l_returnflag, l_suppkey
      |           ORDER BY month(l_shipdate)), 2) AS prev_sum,
      |         round(lead(sum(l_quantity)) OVER (
      |           PARTITION BY l_returnflag, l_suppkey
      |           ORDER BY month(l_shipdate)), 2) AS next_sum
      |  FROM lineitem WHERE year(l_shipdate) = 1998
      |  GROUP BY l_returnflag, l_suppkey, month(l_shipdate)) v
      |WHERE avg_all > 0 AND abs(msum - avg_all) / avg_all > 0.2
      |  AND prev_sum IS NOT NULL AND next_sum IS NOT NULL
      |ORDER BY l_returnflag, l_suppkey, mon""".stripMargin)

  /** q1: the correlated scalar aggregate OVER THE QUERY'S OWN CTE — each
    * row of `ctr` compares against a scaled average of the SAME CTE
    * restricted to its correlation group (q1's
    * ctr_total_return > 1.2 * avg(...) where same store). The optimizer
    * must decorrelate the per-row subquery into a grouped aggregate of
    * the CTE joined back, never a per-row nested loop (Spark inlines the
    * CTE into the scalar subquery rather than reusing one build — the
    * audit pins the decorrelation, not CTE reuse). Integral
    * quantity sums keep the 1.2× threshold exact in both engines. */
  val q1: Q = sqlQ(
    "q_tpcds_q1_shape",
    """WITH ctr AS (
      |  SELECT o_custkey AS cust, c_nationkey AS nat, sum(l_quantity) AS ret
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  WHERE l_returnflag = 'R' GROUP BY o_custkey, c_nationkey)
      |SELECT c_name, round(ctr1.ret, 2) AS ret
      |FROM ctr ctr1 JOIN customer ON ctr1.cust = c_custkey
      |WHERE ctr1.ret > (SELECT 1.2 * avg(ctr2.ret) FROM ctr ctr2
      |                  WHERE ctr2.nat = ctr1.nat)
      |ORDER BY c_name, ret""".stripMargin)

  /** q2: week-over-year comparison — a pivoted weekly aggregate CTE
    * self-joined on week number across consecutive years, per-column
    * ratios (the reference's wswscs CTE joined y to y+1). ONE aggregate
    * feeds both join sides; the planner should reuse the CTE scan. */
  val q2: Q = sqlQ(
    "q_tpcds_q2_shape",
    """WITH wkly AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      |         CAST(weekofyear(o_orderdate) AS INTEGER) AS wk,
      |         round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 2) AS urgent_sales,
      |         round(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN o_totalprice END), 2) AS high_sales,
      |         round(sum(CASE WHEN o_orderpriority = '5-LOW' THEN o_totalprice END), 2) AS low_sales
      |  FROM orders GROUP BY year(o_orderdate), weekofyear(o_orderdate))
      |SELECT y1.wk AS wk,
      |       round(y1.urgent_sales / y2.urgent_sales, 6) AS urgent_ratio,
      |       round(y1.high_sales / y2.high_sales, 6) AS high_ratio,
      |       round(y1.low_sales / y2.low_sales, 6) AS low_ratio
      |FROM wkly y1 JOIN wkly y2 ON y1.wk = y2.wk AND y2.yr = y1.yr + 1
      |WHERE y1.yr = 1997
      |ORDER BY wk""".stripMargin)

  /** q34 (q73's sibling): the count-band aggregate (15–20 orders per
    * customer — the "household buying in bulk" band) joined back to the
    * dimension for detail output; the band must evaluate in the aggregate
    * HAVING before the join. */
  val q34: Q = sqlQ(
    "q_tpcds_q34_shape",
    """SELECT c_name, c_mktsegment, cnt
      |FROM (SELECT o_custkey, count(*) AS cnt
      |      FROM orders GROUP BY o_custkey
      |      HAVING count(*) BETWEEN 15 AND 20) dn
      |JOIN customer ON c_custkey = o_custkey
      |ORDER BY c_name NULLS FIRST, cnt""".stripMargin)

  /** q85: disjunctive BAND predicates spanning columns of DIFFERENT join
    * sides (segment × price bands, region × quantity bands) — the OR
    * blocks single-column pushdown, so the optimizer must place the
    * residual filter above the right join. Grouped averages per nation
    * (the reference's per-reason averages). */
  val q85: Q = sqlQ(
    "q_tpcds_q85_shape",
    """SELECT n_name, round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(l_extendedprice), 6) AS avg_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE ((c_mktsegment = 'BUILDING' AND l_extendedprice BETWEEN 1000 AND 20000)
      |    OR (c_mktsegment = 'MACHINERY' AND l_extendedprice BETWEEN 20000 AND 40000)
      |    OR (c_mktsegment = 'AUTOMOBILE' AND l_extendedprice BETWEEN 40000 AND 60000))
      |  AND ((n_regionkey IN (0, 1) AND l_quantity BETWEEN 1 AND 25)
      |    OR (n_regionkey IN (2, 3) AND l_quantity BETWEEN 26 AND 50))
      |GROUP BY n_name ORDER BY n_name""".stripMargin)

  /** q95: the double-EXISTS supply chain — an EXISTS self-join on the same
    * fact table (another line of the order from a DIFFERENT supplier) AND
    * a NOT EXISTS anti on it (no returned line), then order-level distinct
    * count. Both subqueries decorrelate into semi/anti joins over one
    * scan family. */
  val q95: Q = sqlQ(
    "q_tpcds_q95_shape",
    """SELECT CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS n_orders,
      |       round(sum(l1.l_extendedprice), 2) AS total_price
      |FROM lineitem l1 JOIN orders ON l1.l_orderkey = o_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_returnflag = 'R')""".stripMargin)

  /** q39: the mean/stdev coefficient-of-variation pair — per-group second
    * moments in a CTE, self-joined on CONSECUTIVE months, cov filter on
    * both sides (the reference's inv CTE joined mth to mth+1). Groups with
    * one row yield NULL stddev_samp, so the division filter drops them in
    * both engines identically. */
  val q39: Q = sqlQ(
    "q_tpcds_q39_shape",
    """WITH inv AS (
      |  SELECT l_suppkey, CAST(month(l_shipdate) AS INTEGER) AS mth,
      |         avg(l_quantity) AS mean, stddev_samp(l_quantity) AS sdev
      |  FROM lineitem WHERE year(l_shipdate) = 1997
      |  GROUP BY l_suppkey, month(l_shipdate))
      |SELECT i1.l_suppkey, i1.mth AS mth1, round(i1.sdev / i1.mean, 6) AS cov1,
      |       i2.mth AS mth2, round(i2.sdev / i2.mean, 6) AS cov2
      |FROM inv i1 JOIN inv i2 ON i1.l_suppkey = i2.l_suppkey AND i2.mth = i1.mth + 1
      |WHERE i1.sdev / i1.mean > 0.5 AND i2.sdev / i2.mean > 0.5
      |ORDER BY i1.l_suppkey, mth1""".stripMargin)

  /** q28: the six scalar-subquery band statistics FUSED into one aggregate
    * pass — q88's fusion, extended with a count(DISTINCT …) per band
    * (conditional distinct keys), which forces the planner's multi-distinct
    * Expand while keeping ONE scan. */
  val q28: Q = sqlQ(
    "q_tpcds_q28_shape",
    """SELECT round(avg(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_extendedprice END), 6) AS b1_avg,
      |       CAST(count(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_partkey END) AS BIGINT) AS b1_parts,
      |       round(avg(CASE WHEN l_quantity BETWEEN 11 AND 25 THEN l_extendedprice END), 6) AS b2_avg,
      |       CAST(count(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 25 THEN l_partkey END) AS BIGINT) AS b2_parts,
      |       round(avg(CASE WHEN l_quantity BETWEEN 26 AND 40 THEN l_extendedprice END), 6) AS b3_avg,
      |       CAST(count(DISTINCT CASE WHEN l_quantity BETWEEN 26 AND 40 THEN l_partkey END) AS BIGINT) AS b3_parts,
      |       round(avg(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN l_extendedprice END), 6) AS b4_avg,
      |       CAST(count(DISTINCT CASE WHEN l_quantity BETWEEN 41 AND 50 THEN l_partkey END) AS BIGINT) AS b4_parts
      |FROM lineitem""".stripMargin)

  /** q44: best/worst performers paired by RANK POSITION — two opposite-order
    * rank views of ONE aggregate equi-joined on rank (ascending rank k meets
    * descending rank k), the reference's asceding/descending subquery pair. */
  val q44: Q = sqlQ(
    "q_tpcds_q44_shape",
    """WITH perf AS (
      |  SELECT l_suppkey, round(avg(l_extendedprice * (1 - l_discount)), 6) AS rev
      |  FROM lineitem GROUP BY l_suppkey),
      |asc_r AS (SELECT l_suppkey, CAST(rank() OVER (ORDER BY rev ASC, l_suppkey) AS INTEGER) AS rk FROM perf),
      |desc_r AS (SELECT l_suppkey, CAST(rank() OVER (ORDER BY rev DESC, l_suppkey) AS INTEGER) AS rk FROM perf)
      |SELECT a.rk AS position, a.l_suppkey AS worst_supp, d.l_suppkey AS best_supp
      |FROM asc_r a JOIN desc_r d ON a.rk = d.rk
      |WHERE a.rk <= 10 ORDER BY position""".stripMargin)

  /** q87 (q38's sibling): the EXCEPT chain — set difference of three
    * channel projections (q14 covers the INTERSECT chain; EXCEPT plans the
    * anti side of the same left-semi family). */
  val q87: Q = sqlQ(
    "q_tpcds_q87_shape",
    """SELECT CAST(count(*) AS BIGINT) AS n FROM (
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
      |  EXCEPT
      |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P') only_open""".stripMargin)

  /** q61 (and q90's am/pm ratio): the RATIO OF TWO SINGLE-ROW AGGREGATES —
    * a cross join of two scalar aggregate subqueries, one filtered through
    * a dimension; the planner must see two one-row sides (broadcast NL is
    * correct HERE, the one shape where it is). */
  val q61: Q = sqlQ(
    "q_tpcds_q61_shape",
    """SELECT round(promo.rev * 100.0 / total.rev, 6) AS promo_pct
      |FROM (SELECT round(sum(l_extendedprice), 2) AS rev
      |      FROM lineitem JOIN part ON l_partkey = p_partkey
      |      WHERE p_type LIKE 'PROMO%') promo,
      |     (SELECT round(sum(l_extendedprice), 2) AS rev FROM lineitem) total""".stripMargin)

  /** q97: the channel-overlap matrix — two grouped DISTINCT projections
    * FULL OUTER merged, then both/left-only/right-only counted from the
    * null pattern in one aggregate. */
  val q97: Q = sqlQ(
    "q_tpcds_q97_shape",
    """WITH o1 AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'),
      |     o2 AS (SELECT DISTINCT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F')
      |SELECT CAST(sum(CASE WHEN o1.ck IS NOT NULL AND o2.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS both_ct,
      |       CAST(sum(CASE WHEN o1.ck IS NOT NULL AND o2.ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS open_only,
      |       CAST(sum(CASE WHEN o1.ck IS NULL AND o2.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS done_only
      |FROM o1 FULL OUTER JOIN o2 ON o1.ck = o2.ck""".stripMargin)

  /** q21 (q40's sibling): the BEFORE/AFTER date pivot — conditional sums
    * around a boundary date with a ratio band in HAVING referencing both
    * conditional aggregates. */
  val q21: Q = sqlQ(
    "q_tpcds_q21_shape",
    """SELECT l_suppkey,
      |       round(sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00' THEN l_quantity ELSE 0 END), 2) AS qty_before,
      |       round(sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' THEN l_quantity ELSE 0 END), 2) AS qty_after
      |FROM lineitem
      |GROUP BY l_suppkey
      |HAVING sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00' THEN l_quantity ELSE 0 END) > 0
      |   AND sum(CASE WHEN l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' THEN l_quantity ELSE 0 END)
      |       / sum(CASE WHEN l_shipdate < TIMESTAMP '1998-01-01 00:00:00' THEN l_quantity ELSE 0 END)
      |       BETWEEN 1.2 AND 1.4
      |ORDER BY l_suppkey""".stripMargin)

  /** q65: the aggregate-of-an-aggregate join — per-(supplier, part) revenue
    * joined back to the per-supplier MAX of those revenues, keeping the
    * long-tail parts under a share threshold. */
  val q65: Q = sqlQ(
    "q_tpcds_q65_shape",
    """WITH sp AS (
      |  SELECT l_suppkey, l_partkey, round(sum(l_extendedprice), 2) AS rev
      |  FROM lineitem GROUP BY l_suppkey, l_partkey),
      |sa AS (SELECT l_suppkey, max(rev) AS max_rev FROM sp GROUP BY l_suppkey)
      |SELECT sp.l_suppkey, sp.l_partkey, sp.rev
      |FROM sp JOIN sa ON sp.l_suppkey = sa.l_suppkey
      |WHERE sp.rev <= 0.05 * sa.max_rev
      |ORDER BY sp.l_suppkey, sp.l_partkey""".stripMargin)

  // ---- r12 tranche: six more distinctive shapes toward the 103 bar ----

  /** q38: the cross-channel INTERSECT customer set — customers present in
    * ALL THREE channels (returnflag classes standing in for
    * store/catalog/web), counted. The planner challenge is the INTERSECT
    * chain lowering to stacked left-semi joins over DISTINCT keys, never a
    * pairwise materialize. */
  val q38: Q = sqlQ(
    "q_tpcds_q38_shape",
    """SELECT CAST(count(*) AS BIGINT) AS n_all_channel FROM (
      |  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'A'
      |  INTERSECT
      |  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'N'
      |  INTERSECT
      |  SELECT o_custkey FROM orders JOIN lineitem ON l_orderkey = o_orderkey WHERE l_returnflag = 'R') t
      |ORDER BY n_all_channel""".stripMargin)

  /** q70: the hierarchy rollup whose MEMBERS are chosen by a windowed rank
    * in an IN-subquery — rank() inside the semi-join's subquery picks the
    * top-3 nations per region, THEN the rollup + per-level
    * rank_within_parent runs over only those (q36 covers the rollup+rank;
    * the distinctive piece here is the window-driven semi join feeding
    * it). */
  val q70: Q = sqlQ(
    "q_tpcds_q70_shape",
    """WITH sales AS (
      |  SELECT r_name, n_name, l_extendedprice * (1 - l_discount) AS rev
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON c_custkey = o_custkey
      |  JOIN nation ON n_nationkey = c_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE n_name IN (
      |    SELECT n_name FROM (
      |      SELECT n_name,
      |             CAST(rank() OVER (PARTITION BY r_name
      |               ORDER BY round(sum(l_extendedprice * (1 - l_discount)), 2) DESC,
      |                        n_name) AS INTEGER) AS rk
      |      FROM lineitem
      |      JOIN orders ON l_orderkey = o_orderkey
      |      JOIN customer ON c_custkey = o_custkey
      |      JOIN nation ON n_nationkey = c_nationkey
      |      JOIN region ON r_regionkey = n_regionkey
      |      GROUP BY r_name, n_name) ranked
      |    WHERE rk <= 3))
      |SELECT round(sum(rev), 2) AS total_rev,
      |       CAST(grouping(r_name) + grouping(n_name) AS INTEGER) AS lochierarchy,
      |       r_name, n_name,
      |       CAST(rank() OVER (
      |         PARTITION BY grouping(r_name) + grouping(n_name),
      |                      CASE WHEN grouping(n_name) = 0 THEN r_name END
      |         ORDER BY round(sum(rev), 2) DESC, n_name NULLS FIRST) AS INTEGER) AS rank_within_parent
      |FROM sales
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY lochierarchy DESC, r_name NULLS FIRST, n_name NULLS FIRST, rank_within_parent""".stripMargin)

  /** q83: the store/catalog/web return-ratio triple — one returns CTE per
    * channel keyed by item, three-way equi-joined, each channel's share of
    * the item's cross-channel average. Three narrow aggregates + two hash
    * joins; no channel may leak into another's aggregate. */
  val q83: Q = sqlQ(
    "q_tpcds_q83_shape",
    """WITH a_ret AS (SELECT l_partkey AS item, sum(l_quantity) AS qty
      |               FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey),
      |     n_ret AS (SELECT l_partkey AS item, sum(l_quantity) AS qty
      |               FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
      |     r_ret AS (SELECT l_partkey AS item, sum(l_quantity) AS qty
      |               FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
      |SELECT a.item,
      |       round(a.qty, 2) AS a_qty, round(a.qty / (a.qty + n.qty + r.qty) / 3 * 100, 6) AS a_dev,
      |       round(n.qty, 2) AS n_qty, round(n.qty / (a.qty + n.qty + r.qty) / 3 * 100, 6) AS n_dev,
      |       round(r.qty, 2) AS r_qty, round(r.qty / (a.qty + n.qty + r.qty) / 3 * 100, 6) AS r_dev,
      |       round((a.qty + n.qty + r.qty) / 3.0, 6) AS avg_qty
      |FROM a_ret a JOIN n_ret n ON a.item = n.item JOIN r_ret r ON a.item = r.item
      |ORDER BY a.item
      |LIMIT 40""".stripMargin)

  /** q62: shipping-lag band counts — days between order and ship bucketed
    * into one-pass conditional sums per priority (the reference's
    * web_sales x warehouse x ship_mode lag matrix). Interval arithmetic
    * (not datediff) keeps ONE text valid in both engines. */
  val q62: Q = sqlQ(
    "q_tpcds_q62_shape",
    """SELECT o_orderpriority,
      |       CAST(sum(CASE WHEN l_shipdate <= o_orderdate + INTERVAL '30' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d30,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '30' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '60' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d60,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '60' DAY
      |                      AND l_shipdate <= o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90,
      |       CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL '90' DAY THEN 1 ELSE 0 END) AS BIGINT) AS d90plus
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin)

  /** q30: the correlated per-group-average threshold — customers whose
    * return quantity exceeds 1.2x their NATION's average, the correlated
    * scalar subquery over a twice-referenced CTE that the optimizer must
    * decorrelate into an aggregate + equi join (never a per-row re-scan).
    * Integral measure (quantity) per the oracle parity rules: the 1.2x
    * boundary must not hinge on float summation order. */
  val q30: Q = sqlQ(
    "q_tpcds_q30_shape",
    """WITH ret_by_cust AS (
      |  SELECT o_custkey AS custkey, c_nationkey AS nationkey, sum(l_quantity) AS ret_qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey JOIN customer ON c_custkey = o_custkey
      |  WHERE l_returnflag = 'R'
      |  GROUP BY o_custkey, c_nationkey)
      |SELECT r1.custkey, round(r1.ret_qty, 2) AS ret_qty
      |FROM ret_by_cust r1
      |WHERE r1.ret_qty > (SELECT avg(r2.ret_qty) * 1.2 FROM ret_by_cust r2
      |                    WHERE r2.nationkey = r1.nationkey)
      |ORDER BY r1.custkey
      |LIMIT 100""".stripMargin)

  /** q45: the disjunctive semi join — an IN-list OR an IN-subquery, which
    * cannot lower to a plain LeftSemi (rows failing the subquery may still
    * pass the list): Spark plans an ExistenceJoin feeding the filter, the
    * reference keeps the OR in a post-join Calc. */
  val q45: Q = sqlQ(
    "q_tpcds_q45_shape",
    """SELECT n_name, round(sum(o_totalprice), 2) AS rev
      |FROM orders JOIN customer ON c_custkey = o_custkey JOIN nation ON n_nationkey = c_nationkey
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
      |   OR o_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |                    GROUP BY o_custkey HAVING count(*) >= 2)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin)

  /** q9: the CASE-of-scalar-subqueries probe — five quantity bands, each
    * choosing between two single-row aggregates on a count threshold (the
    * original's 15 scalar subqueries over one fact). The optimizer runs
    * the subqueries once each (subquery reuse), the main query is one
    * probe row — no join at all. Integral measures (quantity, linenumber)
    * keep every avg deterministic across engines. */
  val q9: Q = sqlQ(
    "q_tpcds_q9_shape",
    (1 to 5).map { b =>
      val lo = (b - 1) * 10 + 1; val hi = b * 10
      s"""  CASE WHEN (SELECT count(*) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi) > 12000
         |       THEN (SELECT round(avg(l_quantity), 6) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi)
         |       ELSE (SELECT round(avg(CAST(l_linenumber AS DOUBLE)), 6) FROM lineitem WHERE l_quantity BETWEEN $lo AND $hi) END AS band$b""".stripMargin
    }.mkString("SELECT\n", ",\n", "\nFROM (SELECT 1 AS one) probe\nORDER BY band1"))

  /** q58: the three-channel mutual-proximity band — each channel's item
    * quantity must lie within ±10% of the three-channel average, a
    * triple-BETWEEN residual referencing ALL sides of the three-way join
    * (q83 joins the same triple but outputs ratios; here the band is the
    * filter and must stay a residual above the joins). Integral measures
    * keep the ±10% boundaries exact. */
  val q58: Q = sqlQ(
    "q_tpcds_q58_shape",
    """WITH a_s AS (SELECT l_partkey AS item, sum(l_quantity) AS qty FROM lineitem WHERE l_returnflag = 'A' GROUP BY l_partkey),
      |     n_s AS (SELECT l_partkey AS item, sum(l_quantity) AS qty FROM lineitem WHERE l_returnflag = 'N' GROUP BY l_partkey),
      |     r_s AS (SELECT l_partkey AS item, sum(l_quantity) AS qty FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_partkey)
      |SELECT a.item, round(a.qty, 2) AS a_qty, round(n.qty, 2) AS n_qty, round(r.qty, 2) AS r_qty
      |FROM a_s a JOIN n_s n ON a.item = n.item JOIN r_s r ON a.item = r.item
      |WHERE a.qty BETWEEN 0.9 * (a.qty + n.qty + r.qty) / 3 AND 1.1 * (a.qty + n.qty + r.qty) / 3
      |  AND n.qty BETWEEN 0.9 * (a.qty + n.qty + r.qty) / 3 AND 1.1 * (a.qty + n.qty + r.qty) / 3
      |  AND r.qty BETWEEN 0.9 * (a.qty + n.qty + r.qty) / 3 AND 1.1 * (a.qty + n.qty + r.qty) / 3
      |ORDER BY a.item""".stripMargin)

  /** q75: year-over-year decline net of channels — per-channel yearly
    * aggregates UNION ALL'd, RE-aggregated to the (year, item) grain, then
    * self-joined prior-vs-current year keeping declining items. The
    * planner must aggregate each channel branch BEFORE the union (partial
    * aggregation under a union re-agg) and keep the YoY self-join an
    * equi-join on (item, year±1). */
  val q75: Q = sqlQ(
    "q_tpcds_q75_shape",
    """WITH chan AS (
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey AS item, sum(l_quantity) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'A'
      |  GROUP BY year(o_orderdate), l_partkey
      |  UNION ALL
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey AS item, sum(l_quantity) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'N'
      |  GROUP BY year(o_orderdate), l_partkey
      |  UNION ALL
      |  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, l_partkey AS item, sum(l_quantity) AS qty
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey WHERE l_returnflag = 'R'
      |  GROUP BY year(o_orderdate), l_partkey),
      |sales AS (SELECT yr, item, sum(qty) AS qty FROM chan GROUP BY yr, item)
      |SELECT c.yr, c.item, round(p.qty, 2) AS prev_qty, round(c.qty, 2) AS curr_qty,
      |       round(c.qty - p.qty, 2) AS qty_diff
      |FROM sales c JOIN sales p ON c.item = p.item AND c.yr = p.yr + 1
      |WHERE c.qty < p.qty
      |ORDER BY qty_diff, c.yr, c.item
      |LIMIT 60""".stripMargin)

  /** q77: per-channel sales-vs-returns FULL OUTER merge, channels UNION
    * ALL'd, ROLLUP over (channel, group) — the coalesced-key outer join
    * under a union under a rollup, with per-level totals. */
  val q77: Q = sqlQ(
    "q_tpcds_q77_shape",
    Seq("A", "N", "R").map { f =>
      s"""  SELECT '$f' AS channel, COALESCE(s.grp, r.grp) AS grp,
         |         COALESCE(s.qty, 0) AS sales_qty, COALESCE(r.qty, 0) AS ret_qty
         |  FROM (SELECT l_suppkey % 10 AS grp, sum(l_quantity) AS qty FROM lineitem
         |        WHERE l_returnflag = '$f' AND l_linestatus = 'O' GROUP BY l_suppkey % 10) s
         |  FULL OUTER JOIN
         |       (SELECT l_suppkey % 10 AS grp, sum(l_quantity) AS qty FROM lineitem
         |        WHERE l_returnflag = '$f' AND l_linestatus = 'F' GROUP BY l_suppkey % 10) r
         |  ON s.grp = r.grp""".stripMargin
    }.mkString("WITH ch AS (\n", "\n  UNION ALL\n", """)
      |SELECT channel, grp, round(sum(sales_qty), 2) AS sales_qty, round(sum(ret_qty), 2) AS ret_qty,
      |       round(sum(sales_qty - ret_qty), 2) AS net_qty
      |FROM ch GROUP BY ROLLUP(channel, grp)
      |ORDER BY channel NULLS FIRST, grp NULLS FIRST""".stripMargin))

  /** q41: the dimension-only correlated EXISTS with disjunctive attribute
    * bands — a self semi-join of the part dim where the subquery's OR of
    * (type, size-band) conjunctions must stay a residual inside the semi
    * join's build (no per-row re-scan of the dim). */
  val q41: Q = sqlQ(
    "q_tpcds_q41_shape",
    """SELECT DISTINCT p_brand FROM part p1
      |WHERE p_size BETWEEN 1 AND 20
      |  AND EXISTS (SELECT 1 FROM part p2 WHERE p2.p_brand = p1.p_brand
      |              AND ((p2.p_type = 'MEDIUM' AND p2.p_size BETWEEN 1 AND 2)
      |                OR (p2.p_type = 'PROMO' AND p2.p_size BETWEEN 49 AND 50)))
      |ORDER BY p_brand""".stripMargin)

  /** q48: the OR-of-band-conjunctions spanning BOTH join sides — each arm
    * pairs an orders attribute with lineitem ranges, so no arm can push
    * below the join; the disjunction stays one residual filter over one
    * equi join feeding a single ungrouped aggregate. */
  val q48: Q = sqlQ(
    "q_tpcds_q48_shape",
    """SELECT round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE (o_orderpriority = '1-URGENT' AND l_extendedprice BETWEEN 500 AND 20000 AND l_discount BETWEEN 0.00 AND 0.05)
      |   OR (o_orderpriority = '3-MEDIUM' AND l_extendedprice BETWEEN 10000 AND 40000 AND l_discount BETWEEN 0.03 AND 0.08)
      |   OR (o_orderpriority = '5-LOW' AND l_extendedprice BETWEEN 20000 AND 60000 AND l_discount BETWEEN 0.05 AND 0.10)
      |ORDER BY qty""".stripMargin)

  /** q90: the am/pm ratio of two single-row counts — a SECOND instance of
    * the ratio-of-ungrouped-aggregates shape (q61), deliberately kept so
    * the plan audit's SEMANTIC BroadcastNestedLoopJoin exemption (both
    * inputs provably single-row) is exercised beyond the one query it was
    * written for. */
  val q90: Q = sqlQ(
    "q_tpcds_q90_shape",
    """SELECT round(CAST(am.cnt AS DOUBLE) / pm.cnt, 6) AS am_pm_ratio
      |FROM (SELECT count(*) AS cnt FROM events WHERE CAST(hour(ts) AS INTEGER) BETWEEN 6 AND 11) am,
      |     (SELECT count(*) AS cnt FROM events WHERE CAST(hour(ts) AS INTEGER) BETWEEN 18 AND 23) pm
      |ORDER BY am_pm_ratio""".stripMargin)

  /** q32: the correlated excess threshold feeding a GRAND TOTAL — rows
    * beating 1.3x their part's average, summed to one row (q30 pins the
    * same decorrelation at the nation grain with per-customer output; here
    * the correlation is per part and everything collapses to a scalar).
    * Integral quantity keeps the 1.3x boundary exact in both engines. */
  val q32: Q = sqlQ(
    "q_tpcds_q32_shape",
    """SELECT round(sum(l1.l_quantity), 2) AS excess_qty
      |FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
      |WHERE p_size <= 25
      |  AND l1.l_quantity > (SELECT 1.3 * avg(l2.l_quantity) FROM lineitem l2
      |                       WHERE l2.l_partkey = l1.l_partkey)
      |ORDER BY excess_qty""".stripMargin)

  /** q4: the THREE-channel year-over-year growth comparison — q11's
    * two-channel form widened to the full q4 shape: one per-(customer,
    * channel, year) CTE self-joined SIX ways, keeping customers whose
    * second-channel growth beats BOTH other channels' growth. Channels are
    * the three return-flag classes; integral quantity totals make every
    * ratio an IEEE-exact division of exact integers, so the growth
    * comparisons cannot flip cross-engine. */
  val q4: Q = sqlQ(
    "q_tpcds_q4_shape",
    """WITH yt AS (
      |  SELECT o_custkey AS cust, l_returnflag AS chan,
      |         year(o_orderdate) AS yr, sum(l_quantity) AS total
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE year(o_orderdate) IN (1996, 1997)
      |  GROUP BY o_custkey, l_returnflag, year(o_orderdate))
      |SELECT a2.cust
      |FROM yt a1 JOIN yt a2 ON a1.cust = a2.cust
      |JOIN yt n1 ON n1.cust = a1.cust
      |JOIN yt n2 ON n2.cust = a1.cust
      |JOIN yt r1 ON r1.cust = a1.cust
      |JOIN yt r2 ON r2.cust = a1.cust
      |WHERE a1.chan = 'A' AND a1.yr = 1996 AND a2.chan = 'A' AND a2.yr = 1997
      |  AND n1.chan = 'N' AND n1.yr = 1996 AND n2.chan = 'N' AND n2.yr = 1997
      |  AND r1.chan = 'R' AND r1.yr = 1996 AND r2.chan = 'R' AND r2.yr = 1997
      |  AND a1.total > 0 AND n1.total > 0 AND r1.total > 0
      |  AND n2.total / n1.total > a2.total / a1.total
      |  AND n2.total / n1.total > r2.total / r1.total
      |ORDER BY a2.cust""".stripMargin)

  /** q5: per-channel sales AND returns via a signed-measure UNION ALL
    * rolled up — each branch null-fills the other's measure, the re-agg
    * runs once over the union, and ROLLUP adds the per-channel and grand
    * totals (the reference's store/catalog/web profit report). */
  val q5: Q = sqlQ(
    "q_tpcds_q5_shape",
    """WITH sr AS (
      |  SELECT n_name AS loc, 'store' AS chan,
      |         l_extendedprice AS sales, 0.0 AS ret
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |  WHERE l_returnflag <> 'R'
      |  UNION ALL
      |  SELECT n_name, 'store', 0.0, l_extendedprice
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |    JOIN nation ON s_nationkey = n_nationkey
      |  WHERE l_returnflag = 'R'
      |  UNION ALL
      |  SELECT n_name, 'web', o_totalprice, 0.0
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |    JOIN nation ON c_nationkey = n_nationkey)
      |SELECT chan, loc, round(sum(sales), 2) AS sales,
      |       round(sum(ret), 2) AS ret_amt,
      |       round(sum(sales) - sum(ret), 2) AS profit
      |FROM sr
      |GROUP BY ROLLUP (chan, loc)
      |ORDER BY chan NULLS FIRST, loc NULLS FIRST""".stripMargin)

  /** q6: the correlated DIMENSION-average threshold — items priced at
    * least 1.2x their own type's average, counted per customer nation
    * with a HAVING floor. Unlike q32/q30 (fact-side correlation) the
    * subquery correlates on the dimension attribute, so decorrelation
    * aggregates PART per type and joins it back above the star. Integral
    * p_size keeps the 1.2x boundary exact in both engines. */
  val q6: Q = sqlQ(
    "q_tpcds_q6_shape",
    """SELECT n_name, CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN part p ON l_partkey = p_partkey
      |WHERE p.p_size >= 1.2 * (SELECT avg(p2.p_size) FROM part p2
      |                         WHERE p2.p_type = p.p_type)
      |GROUP BY n_name
      |HAVING count(*) >= 10
      |ORDER BY cnt, n_name""".stripMargin)

  /** q8: a substring-derived bucket filtered through an INTERSECT of two
    * customer populations — the fixed-list half replaced by the
    * high-balance population, the other half a GROUP BY ... HAVING count
    * population (the reference's preferred-customer zip intersect). The
    * IN-subquery over the INTERSECT must plan as a semi join over the
    * set-op, never a per-row re-evaluation. */
  val q8: Q = sqlQ(
    "q_tpcds_q8_shape",
    """SELECT n_name, round(sum(o_totalprice), 2) AS net
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |WHERE substring(c_name, 17, 2) IN (
      |  SELECT sub FROM (
      |    SELECT substring(c_name, 17, 2) AS sub FROM customer
      |    WHERE c_acctbal > 5000
      |    INTERSECT
      |    SELECT substring(c_name, 17, 2) AS sub
      |    FROM customer JOIN orders ON c_custkey = o_custkey
      |    GROUP BY substring(c_name, 17, 2)
      |    HAVING count(*) > 10) pops)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin)

  /** q16: EXISTS + NOT EXISTS together over one fact — orders shipped by
    * MORE THAN ONE supplier (correlated inequality EXISTS → semi join)
    * with NO returned line (NOT EXISTS → anti join), feeding a
    * count(DISTINCT) + sum aggregate. q95 carried the double-EXISTS form;
    * this is the mixed semi/anti form with a distinct aggregate above it
    * (the reference's shipped-from-multiple-warehouses count). */
  val q16: Q = sqlQ(
    "q_tpcds_q16_shape",
    """SELECT CAST(count(DISTINCT o.o_orderkey) AS BIGINT) AS order_count,
      |       round(sum(l1.l_extendedprice), 2) AS total_price
      |FROM orders o JOIN lineitem l1 ON o.o_orderkey = l1.l_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = o.o_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = o.o_orderkey
      |                    AND l3.l_returnflag = 'R')
      |ORDER BY order_count""".stripMargin)

  /** q22: the four-level hierarchy ROLLUP with an average measure — one
    * Expand over (brand, type, size, linestatus) producing all five
    * grouping depths in a single pass (the reference's inventory
    * quantity-on-hand rollup). Integral quantity keeps avg exact before
    * the 6-decimal parity rounding. */
  val q22: Q = sqlQ(
    "q_tpcds_q22_shape",
    """SELECT round(avg(l_quantity), 6) AS qoh,
      |       p_brand, p_type, p_size, l_linestatus
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP (p_brand, p_type, p_size, l_linestatus)
      |ORDER BY qoh, p_brand NULLS FIRST, p_type NULLS FIRST,
      |         p_size NULLS FIRST, l_linestatus NULLS FIRST
      |LIMIT 100""".stripMargin)

  /** q40: the before/after date pivot NET OF RETURNS — kept lines LEFT
    * JOIN an aggregated returns view on the (order, part) pair, the
    * coalesce-subtracted quantity splits into conditional sums around an
    * anchor date (the reference's warehouse before/after-event compare).
    * Integral quantities keep both pivots exact. */
  val q40: Q = sqlQ(
    "q_tpcds_q40_shape",
    """WITH ret AS (
      |  SELECT l_orderkey AS rk_o, l_partkey AS rk_p,
      |         sum(l_quantity) AS ret_qty
      |  FROM lineitem WHERE l_returnflag = 'R'
      |  GROUP BY l_orderkey, l_partkey)
      |SELECT n_name, p_brand,
      |       round(sum(CASE WHEN l_shipdate < DATE '1998-01-01'
      |                      THEN l_quantity - coalesce(ret_qty, 0)
      |                      ELSE 0 END), 2) AS qty_before,
      |       round(sum(CASE WHEN l_shipdate >= DATE '1998-01-01'
      |                      THEN l_quantity - coalesce(ret_qty, 0)
      |                      ELSE 0 END), 2) AS qty_after
      |FROM lineitem
      |  LEFT JOIN ret ON l_orderkey = rk_o AND l_partkey = rk_p
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE l_returnflag <> 'R' AND p_size < 15
      |GROUP BY n_name, p_brand
      |ORDER BY n_name, p_brand""".stripMargin)

  /** q46: aggregate-the-trip THEN join-and-mismatch — per-order amounts
    * (with the supplier nation captured inside the aggregate) joined to
    * the customer dimension and filtered on a dimension INEQUALITY
    * (customer's nation <> the trip's supplier nation): the
    * agg-below-join order is the shape, the planner must not push the
    * mismatch filter below the aggregate it references. */
  val q46: Q = sqlQ(
    "q_tpcds_q46_shape",
    """WITH trips AS (
      |  SELECT l_orderkey AS okey, o_custkey AS cust,
      |         min(s_nationkey) AS trip_nation,
      |         sum(l_extendedprice * (1 - l_discount)) AS amt
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |    JOIN supplier ON l_suppkey = s_suppkey
      |  GROUP BY l_orderkey, o_custkey)
      |SELECT c_name, okey, round(amt, 2) AS amt
      |FROM trips JOIN customer ON cust = c_custkey
      |WHERE c_nationkey <> trip_nation
      |ORDER BY c_name, okey
      |LIMIT 100""".stripMargin)

  /** q71: the time-dimension breakdown of a three-branch channel union —
    * each branch scans the same fact with a different channel filter, the
    * union re-aggregates per (hour, channel): the reference's
    * hour-of-day × manager breakdown across web/catalog/store. */
  val q71: Q = sqlQ(
    "q_tpcds_q71_shape",
    """SELECT CAST(hour(ts) AS INTEGER) AS hr, event_type,
      |       round(sum(value), 2) AS amt
      |FROM (SELECT ts, event_type, value FROM events WHERE event_type = 'click'
      |      UNION ALL
      |      SELECT ts, event_type, value FROM events WHERE event_type = 'view'
      |      UNION ALL
      |      SELECT ts, event_type, value FROM events WHERE event_type = 'purchase') u
      |GROUP BY hour(ts), event_type
      |ORDER BY hr, event_type""".stripMargin)

  /** q76: the heterogeneous-channel UNION with aligned NULL-cast columns —
    * each branch carries its own measure and null-fills the others', and
    * the re-aggregate coalesces across them (the reference's
    * null-foreign-key channel census; the planner challenge is the wide
    * union of mismatched projections, not the nulls' provenance). */
  val q76: Q = sqlQ(
    "q_tpcds_q76_shape",
    """SELECT chan, CAST(yr AS INTEGER) AS yr, CAST(count(*) AS BIGINT) AS cnt,
      |       round(sum(coalesce(s_price, 0) + coalesce(w_price, 0)
      |                 + coalesce(r_qty, 0)), 2) AS amt
      |FROM (
      |  SELECT 'store' AS chan, year(o_orderdate) AS yr,
      |         o_totalprice AS s_price, CAST(NULL AS DOUBLE) AS w_price,
      |         CAST(NULL AS DOUBLE) AS r_qty
      |  FROM orders
      |  UNION ALL
      |  SELECT 'web', year(l_shipdate), CAST(NULL AS DOUBLE),
      |         l_extendedprice, CAST(NULL AS DOUBLE)
      |  FROM lineitem WHERE l_returnflag = 'N'
      |  UNION ALL
      |  SELECT 'returns', year(l_shipdate), CAST(NULL AS DOUBLE),
      |         CAST(NULL AS DOUBLE), l_quantity
      |  FROM lineitem WHERE l_returnflag = 'R') u
      |GROUP BY chan, yr
      |ORDER BY chan, yr""".stripMargin)

  /** q84: the INCOME-BAND range join — a fact attribute lands in its band
    * via `val >= lo AND val < hi` against a literal band dimension (the
    * reference's household_demographics × income_band chain). The correct
    * plan is a BroadcastNestedLoopJoin whose build side is the LITERAL
    * band table (5 rows, compile-time constant) — the one other place
    * besides the 1×1 scalar ratio where a BNLJ is scale-safe; the plan
    * audit exempts it semantically (literal build side), not by name. */
  val q84: Q = sqlQ(
    "q_tpcds_q84_shape",
    """SELECT ib_id, CAST(count(*) AS BIGINT) AS cnt,
      |       round(sum(c_acctbal), 2) AS bal
      |FROM customer
      |JOIN (VALUES (0, -1000.0, 1000.0), (1, 1000.0, 3000.0),
      |             (2, 3000.0, 5000.0), (3, 5000.0, 7000.0),
      |             (4, 7000.0, 10000.0)) AS ib(ib_id, lo, hi)
      |  ON c_acctbal >= lo AND c_acctbal < hi
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY ib_id
      |ORDER BY ib_id""".stripMargin)

  /** q25: the sold → returned → re-sold THREE-WAY fact chain — the same
    * fact self-joined twice, first on the (order, part) pair, then on the
    * part with a later-order inequality (the reference's
    * store_sales × store_returns × catalog_sales chain on (customer,
    * item)). Integral quantities keep the three sums exact. */
  val q25: Q = sqlQ(
    "q_tpcds_q25_shape",
    """WITH sold AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'N'),
      |     ret  AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'R'),
      |     res  AS (SELECT l_orderkey AS ok, l_partkey AS pk, l_quantity AS q
      |              FROM lineitem WHERE l_returnflag = 'A')
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

  /** q10: the customer PROFILE filter stack — a required EXISTS, an
    * OR of two channel EXISTS (ExistenceJoin), and a NOT EXISTS (anti)
    * all over the same dimension scan: q35 carried the OR-of-EXISTS
    * decorrelation, this adds the anti join on top (the reference's
    * active-in-some-channel, never-inactive census). */
  val q10: Q = sqlQ(
    "q_tpcds_q10_shape",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS cnt
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderpriority = '1-URGENT')
      |  AND (EXISTS (SELECT 1 FROM orders o2
      |               WHERE o2.o_custkey = c.c_custkey
      |                 AND o2.o_orderstatus = 'F')
      |       OR EXISTS (SELECT 1 FROM orders o3
      |                  WHERE o3.o_custkey = c.c_custkey
      |                    AND o3.o_orderstatus = 'O'))
      |  AND NOT EXISTS (SELECT 1 FROM orders o4
      |                  WHERE o4.o_custkey = c.c_custkey
      |                    AND o4.o_orderstatus = 'P')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin)

  /** q18: the MULTI-AVERAGE rollup — several avg() measures computed
    * together under one ROLLUP Expand (the reference's catalog-sales
    * demographic averages). Integral quantity and size keep each average
    * an exact rational before the 6-decimal parity rounding. */
  val q18: Q = sqlQ(
    "q_tpcds_q18_shape",
    """SELECT n_name, o_orderpriority,
      |       round(avg(l_quantity), 6) AS avg_qty,
      |       round(avg(p_size), 6) AS avg_size,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN part ON l_partkey = p_partkey
      |GROUP BY ROLLUP (n_name, o_orderpriority)
      |ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin)

  /** q13: OR-of-band-conjunctions SPANNING a join — each disjunct
    * constrains BOTH the customer dimension (segment + balance band) and
    * the fact (quantity band), so the predicate can fully push to neither
    * side and must evaluate as one residual above the join (q48's
    * single-table form, widened across the join the reference's
    * store_sales × customer_demographics version has). */
  val q13: Q = sqlQ(
    "q_tpcds_q13_shape",
    """SELECT round(avg(l_quantity), 6) AS avg_qty,
      |       round(sum(l_extendedprice), 2) AS sum_price,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |WHERE (c_mktsegment = 'BUILDING'
      |       AND c_acctbal BETWEEN 1000 AND 5000
      |       AND l_quantity BETWEEN 10 AND 30)
      |   OR (c_mktsegment = 'MACHINERY'
      |       AND c_acctbal BETWEEN 3000 AND 8000
      |       AND l_quantity BETWEEN 20 AND 40)
      |   OR (c_mktsegment = 'AUTOMOBILE'
      |       AND c_acctbal BETWEEN 0 AND 3000
      |       AND l_quantity BETWEEN 1 AND 15)
      |ORDER BY cnt""".stripMargin)

  /** q3: the canonical DATE-DIM star aggregate, with the dimension filter
    * asserted PUSHED to the part scan and the dims broadcast (the
    * q42/q52/q55 template twins carry their own grain/sort variants in
    * [[TpcdsShapes2]]). The rounded measure sorts identically in both
    * engines; ties break on the brand. */
  val q3: Q = sqlQ(
    "q_tpcds_q3_shape",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr, p_brand,
      |       round(sum(l_extendedprice), 2) AS rev
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |WHERE p_type = 'ECONOMY'
      |GROUP BY year(o_orderdate), p_brand
      |ORDER BY yr, rev DESC, p_brand""".stripMargin)

  /** q96: the narrow count-only star probe (also q96's half-open time
    * band form): every predicate must reach the scans, the count
    * collapses to one row. */
  val q96: Q = sqlQ(
    "q_tpcds_q96_shape",
    """SELECT CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority = '2-HIGH'
      |  AND l_quantity BETWEEN 20 AND 30
      |ORDER BY cnt""".stripMargin)

  /** q37 (q82's template in [[TpcdsShapes2]]): the attribute-band
    * dimension SEMI-JOINED against a
    * time-banded fact — part rows in a price×size band that actually
    * moved in a window; the IN must plan a semi join with both bands
    * pushed down. */
  val q37: Q = sqlQ(
    "q_tpcds_q37_shape",
    """SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
      |FROM part
      |WHERE p_retailprice BETWEEN 920 AND 960
      |  AND p_size BETWEEN 5 AND 15
      |  AND p_partkey IN (SELECT l_partkey FROM lineitem
      |                    WHERE l_shipdate >= DATE '1997-01-01'
      |                      AND l_shipdate < DATE '1997-07-01')
      |ORDER BY p_partkey
      |LIMIT 50""".stripMargin)

  val all: Seq[Q] = Seq(q67, q36, q51, q59, q88, q73, q23, q89, q11, q54, q17, q98,
    q14, q33, q49, q31, q66, q93, q72, q64, q78, q35, q47, q1,
    q2, q34, q85, q95, q39,
    q28, q44, q87, q61, q97, q21, q65,
    q38, q70, q83, q62, q30, q45,
    q9, q58, q75, q77,
    q41, q48, q90, q32,
    q4, q5, q6, q8, q16, q22, q40, q46, q71, q76,
    q84, q25, q10, q18, q13,
    q3, q96, q37)
}
