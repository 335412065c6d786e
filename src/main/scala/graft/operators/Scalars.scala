package graft.operators

import graft.{Q, Tables}
import graft.functions.FlinkFunctions._
import org.apache.spark.sql.functions._

/** Scalar-function surface (reference §2.4: FlinkSqlOperatorTable.java /
  * SqlFunctionUtils.java / SqlDateTimeUtils.java) exercised through wide
  * projections — everything stays inside whole-stage codegen (no UDFs).
  */
object Scalars {

  /** String functions. */
  val qScalarStr: Q = Q(
    "q_scalar_str",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select(
          $"p_partkey",
          lower($"p_name").as("lo"),
          upper($"p_brand").as("up"),
          substring($"p_name", 1, 8).as("sub"),
          concat_ws("|", $"p_brand", $"p_type").as("cat"),
          length($"p_name").as("len"),
          regexp_replace($"p_type", "M", "_").as("rep"),
          lpad($"p_brand", 12, "*").as("lp"),
          rpad($"p_brand", 12, "#").as("rp"),
          reverse($"p_name").as("rev"),
          expr("left(p_name, 3)").as("lft"),
          expr("right(p_name, 3)").as("rgt"),
          trim(concat(lit("  "), $"p_name", lit("  "))).as("trm"),
          ascii(substring($"p_brand", 1, 1)).as("asc_c"),
          expr("chr(65 + p_size % 26)").as("chr_c"),
          expr("repeat('ab', p_size % 3)").as("rpt"),
          instr($"p_name", "a").as("pos_a"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, lower(p_name) AS lo, upper(p_brand) AS up,
           |  substring(p_name, 1, 8) AS sub, concat_ws('|', p_brand, p_type) AS cat,
           |  CAST(length(p_name) AS INTEGER) AS len,
           |  regexp_replace(p_type, 'M', '_', 'g') AS rep,
           |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '#') AS rp,
           |  reverse(p_name) AS rev, left(p_name, 3) AS lft, right(p_name, 3) AS rgt,
           |  trim('  ' || p_name || '  ') AS trm,
           |  CAST(ascii(substring(p_brand, 1, 1)) AS INTEGER) AS asc_c,
           |  chr(65 + p_size % 26) AS chr_c, repeat('ab', p_size % 3) AS rpt,
           |  CAST(strpos(p_name, 'a') AS INTEGER) AS pos_a
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Math functions. sqrt is IEEE-exact; transcendentals rounded to 4–6. */
  val qScalarMath: Q = Q(
    "q_scalar_math",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "customer")
        .select(
          $"c_custkey",
          round(abs($"c_acctbal"), 2).as("ab"),
          round(sqrt(abs($"c_acctbal")), 6).as("sq"),
          floor($"c_acctbal").as("fl"),
          ceil($"c_acctbal").as("ce"),
          round(exp($"c_acctbal" / 10000.0), 6).as("ex"),
          round(log(abs($"c_acctbal") + 1.0), 6).as("ln_v"),
          round(pow($"c_acctbal", 2), 4).as("pw"),
          ($"c_custkey" % 7).as("md"),
          signum($"c_acctbal").as("sg"),
          greatest($"c_acctbal", lit(0.0)).as("gr"),
          least($"c_acctbal", lit(0.0)).as("ls"),
          round(sin($"c_acctbal"), 4).as("sn"),
          round(atan2($"c_acctbal", lit(100.0)), 6).as("att"),
          round(degrees(atan($"c_acctbal" / 1000.0)), 6).as("dg"))
        .orderBy($"c_custkey")
    },
    Some("""SELECT c_custkey, round(abs(c_acctbal), 2) AS ab,
           |  round(sqrt(abs(c_acctbal)), 6) AS sq,
           |  CAST(floor(c_acctbal) AS BIGINT) AS fl,
           |  CAST(ceil(c_acctbal) AS BIGINT) AS ce,
           |  round(exp(c_acctbal / 10000.0), 6) AS ex,
           |  round(ln(abs(c_acctbal) + 1.0), 6) AS ln_v,
           |  round(pow(c_acctbal, 2), 4) AS pw,
           |  c_custkey % 7 AS md,
           |  CAST(sign(c_acctbal) AS DOUBLE) AS sg,
           |  greatest(c_acctbal, 0.0) AS gr, least(c_acctbal, 0.0) AS ls,
           |  round(sin(c_acctbal), 4) AS sn,
           |  round(atan2(c_acctbal, 100.0), 6) AS att,
           |  round(degrees(atan(c_acctbal / 1000.0)), 6) AS dg
           |FROM customer ORDER BY c_custkey""".stripMargin))

  /** Temporal functions (reference SqlDateTimeUtils.java). DuckDB dayofweek
    * is 0-based Sunday, Spark 1-based — oracle shifts. */
  val qScalarTemporal: Q = Q(
    "q_scalar_temporal",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select(
          $"o_orderkey",
          year($"o_orderdate").as("yr"),
          month($"o_orderdate").as("mo"),
          dayofmonth($"o_orderdate").as("dy"),
          quarter($"o_orderdate").as("qt"),
          to_date(date_trunc("month", $"o_orderdate")).as("mon_start"),
          datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
          date_add(to_date($"o_orderdate"), 7).as("plus7"),
          dayofweek($"o_orderdate").as("dow"),
          date_format($"o_orderdate", "yyyy-MM").as("ym"),
          unix_timestamp($"o_orderdate").as("ep"),
          last_day(to_date($"o_orderdate")).as("eom"),
          add_months(to_date($"o_orderdate"), 2).as("plus2m"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(year(o_orderdate) AS INTEGER) AS yr,
           |  CAST(month(o_orderdate) AS INTEGER) AS mo,
           |  CAST(day(o_orderdate) AS INTEGER) AS dy,
           |  CAST(quarter(o_orderdate) AS INTEGER) AS qt,
           |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
           |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since,
           |  CAST(o_orderdate AS DATE) + 7 AS plus7,
           |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow,
           |  strftime(o_orderdate, '%Y-%m') AS ym,
           |  CAST(epoch(o_orderdate) AS BIGINT) AS ep,
           |  last_day(CAST(o_orderdate AS DATE)) AS eom,
           |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** CASE / IF / COALESCE / NULLIF (reference BuiltInFunctionDefinitions). */
  val qCaseExpr: Q = Q(
    "q_case_expr",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select(
          when($"o_orderstatus" === "F", "done")
            .when($"o_orderstatus" === "P", "partial")
            .otherwise("open").as("status_label"),
          when($"o_totalprice" > 200000.0, "big").otherwise("small").as("size_label"),
          coalesce(nullif($"o_orderpriority", lit("1-URGENT")), lit("hidden")).as("prio"))
        .groupBy($"status_label", $"size_label", $"prio")
        .agg(count(lit(1)).as("cnt"))
        .orderBy($"status_label", $"size_label", $"prio")
    },
    Some("""SELECT CASE WHEN o_orderstatus = 'F' THEN 'done'
           |            WHEN o_orderstatus = 'P' THEN 'partial'
           |            ELSE 'open' END AS status_label,
           |       CASE WHEN o_totalprice > 200000.0 THEN 'big' ELSE 'small' END AS size_label,
           |       coalesce(nullif(o_orderpriority, '1-URGENT'), 'hidden') AS prio,
           |       count(*) AS cnt
           |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))

  /** Flink-specific function aliases (SPLIT_INDEX / IS_DIGIT / IS_ALPHA /
    * IS_DECIMAL / IFNULL) — graft.functions.FlinkFunctions. */
  val qFlinkFns: Q = Q(
    "q_flink_fns",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .select(
          $"doc_id",
          splitIndex($"text", " ", 0).as("first_tok"),
          splitIndex($"text", " ", 2).as("third_tok"),
          isDigit(col("n_chars").cast("string")).as("d1"),
          isDigit(splitIndex($"text", " ", 0)).as("d2"),
          isAlpha(splitIndex($"text", " ", 0)).as("al"),
          isDecimal(concat(col("n_chars").cast("string"), lit(".5"))).as("dec1"),
          ifNull(nullif($"lang", lit("en")), lit("EN_DEFAULT")).as("lang2"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  split_part(text, ' ', 1) AS first_tok,
           |  split_part(text, ' ', 3) AS third_tok,
           |  regexp_matches(CAST(n_chars AS VARCHAR), '^[0-9]+$') AS d1,
           |  regexp_matches(split_part(text, ' ', 1), '^[0-9]+$') AS d2,
           |  regexp_matches(split_part(text, ' ', 1), '^[A-Za-z]+$') AS al,
           |  regexp_matches(CAST(n_chars AS VARCHAR) || '.5',
           |                 '^[-+]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS dec1,
           |  coalesce(nullif(lang, 'en'), 'EN_DEFAULT') AS lang2
           |FROM documents ORDER BY doc_id""".stripMargin))

  /** HASH_CODE via the native codegen expression. The oracle reconstructs
    * JVM String.hashCode (h = h*31 + c with int32 wraparound) with a
    * list_reduce fold — valid because p_name is ASCII (code point == UTF-16
    * unit). */
  val qHashCode: Q = Q(
    "q_hash_code",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select($"p_partkey", graft.functions.FlinkFunctions.hashCode($"p_name").as("hc"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  CAST(CASE WHEN h >= 2147483648 THEN h - 4294967296 ELSE h END AS INTEGER) AS hc
           |FROM (
           |  SELECT p_partkey, list_reduce(
           |    list_prepend(0::BIGINT,
           |      list_transform(range(1, length(p_name) + 1),
           |        i -> CAST(ascii(substr(p_name, CAST(i AS INTEGER), 1)) AS BIGINT))),
           |    (acc, c) -> ((acc * 31 + c) % 4294967296 + 4294967296) % 4294967296) AS h
           |  FROM part)
           |ORDER BY p_partkey""".stripMargin))

  val all: Seq[Q] = Seq(
    qScalarStr, qScalarMath, qScalarTemporal, qCaseExpr, qFlinkFns, qHashCode)
}
