package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Type-system parity sweep — SURVEY §1.3's LogicalType mapping table
  * (reference flink-table-common .../types/logical/LogicalTypeRoot.java:52,
  * one class per type in the same package), exercised row by row with a
  * DuckDB-co-executable oracle each. The rows already covered elsewhere
  * (ARRAY/MAP/ROW → q_collections, TIMESTAMP/LTZ → q_convert_tz +
  * q_scalar_temporal*, ROWTIME/PROCTIME → the watermark family and the
  * native proctime expression, RAW → the multimodal binary columns) are
  * not duplicated; this module pins the rest: CHAR/VARCHAR length
  * semantics, DECIMAL(p,s) arithmetic, the TINYINT..BIGINT width family,
  * BINARY/VARBINARY, TIME-as-millis round-trip, YEAR-MONTH and DAY-TIME
  * interval arithmetic, and MULTISET-as-counts.
  *
  * Engine-divergent behaviors (decimal/int overflow, where Flink throws,
  * DuckDB errors, and non-ANSI Spark yields NULL or wraps) cannot
  * co-execute and are pinned as divergence specs in TypeParitySpec —
  * the WatermarkPolicySpec pattern.
  */
object TypeParity {

  /** CHAR(n) / VARCHAR(n): the reference enforces declared lengths at the
    * boundary (CharType/VarCharType); Spark maps both to StringType, so the
    * semantics are expressed explicitly — CHAR(n) = truncate-then-pad,
    * VARCHAR(n) = truncate — which is also exactly what a 100 TB pipeline
    * wants (a codegen'd projection, no per-row validation branch). */
  val qTypeCharVarchar: Q = Q(
    "q_type_char_varchar",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select(
          $"p_partkey",
          rpad(substring($"p_brand", 1, 10), 10, " ").as("ch10"),
          length(rpad(substring($"p_brand", 1, 10), 10, " ")).as("ch10_len"),
          substring($"p_name", 1, 12).as("vc12"),
          length(substring($"p_name", 1, 12)).as("vc12_len"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  rpad(substring(p_brand, 1, 10), 10, ' ') AS ch10,
           |  CAST(length(rpad(substring(p_brand, 1, 10), 10, ' ')) AS INTEGER) AS ch10_len,
           |  substring(p_name, 1, 12) AS vc12,
           |  CAST(length(substring(p_name, 1, 12)) AS INTEGER) AS vc12_len
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** DECIMAL(p,s): cast from the double fixture columns, then exact decimal
    * add/subtract/multiply and aggregation — decimal arithmetic is exact in
    * both engines (the one rounding step, the double->decimal cast, is
    * deterministic on 2-dec inputs). Division is deliberately absent: its
    * result scale AND the rounding of a re-rounded double are
    * engine-specific (observed: Spark HALF_UP vs DuckDB's round differing
    * at 1e-6 boundaries on 35/15000 rows) — division semantics are pinned
    * as a divergence spec in TypeParitySpec, the WatermarkPolicySpec
    * pattern.
    *
    * Driver-hash sensitivity (round-15 finding): the correctness driver
    * hashes column VALUES after a DuckDB round-trip, and DECIMAL outputs
    * are the one class whose serialized representation differs across
    * engines (trailing-zero rendering, DuckDB HUGEINT-backed DECIMAL(38,_)
    * repr) — this was the suite's only DECIMAL-output query and the only
    * hash_match failure at r15 while the exact value compare passed. So
    * the decimal arithmetic stays internal (the thing under test: exact
    * per-row DECIMAL(18,4) multiply/add and the cross-engine agreement of
    * every intermediate) and the OUTPUT is quantized to exact integral
    * units as BIGINT — 1e-4 units for the scale-4 sums, 1e-2 units for the
    * scale-2 columns (the proven q_cdc_ingest pattern). The quantization
    * is lossless: each operand's fractional part is exactly representable
    * at its declared scale, so value * 10^s is integral by construction. */
  val qTypeDecimal: Q = Q(
    "q_type_decimal",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_extendedprice".cast("decimal(12,2)").as("ep"),
          $"l_discount".cast("decimal(4,2)").as("disc"),
          $"l_tax".cast("decimal(4,2)").as("tax"))
        .select($"l_orderkey",
          (($"ep" * (lit(1).cast("decimal(3,2)") - $"disc"))
            .cast("decimal(18,4)") * lit(10000).cast("decimal(5,0)"))
            .cast("bigint").as("rev_u4"),
          (($"ep" + $"ep" * $"tax").cast("decimal(18,4)")
            * lit(10000).cast("decimal(5,0)")).cast("bigint").as("taxed_u4"),
          ($"ep" * lit(100).cast("decimal(3,0)")).cast("bigint").as("ep_u2"),
          ($"disc" * lit(100).cast("decimal(3,0)")).cast("bigint").as("disc_u2"))
        .groupBy($"l_orderkey")
        .agg(
          sum($"rev_u4").as("sum_rev_u4"),
          sum($"taxed_u4").as("sum_taxed_u4"),
          max($"ep_u2").as("max_ep_u2"),
          min($"ep_u2").as("min_ep_u2"),
          sum($"disc_u2").as("sum_disc_u2"),
          count(lit(1)).as("n"))
        .orderBy($"l_orderkey")
    },
    Some("""SELECT l_orderkey,
           |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           |        * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
           |        AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT))
           |    AS BIGINT) AS sum_rev_u4,
           |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           |        + CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2))
           |        AS DECIMAL(18,4)) * CAST(10000 AS DECIMAL(5,0)) AS BIGINT))
           |    AS BIGINT) AS sum_taxed_u4,
           |  CAST(max(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           |        * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS max_ep_u2,
           |  CAST(min(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
           |        * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS min_ep_u2,
           |  CAST(sum(CAST(CAST(l_discount AS DECIMAL(4,2))
           |        * CAST(100 AS DECIMAL(3,0)) AS BIGINT)) AS BIGINT) AS sum_disc_u2,
           |  count(*) AS n
           |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin))

  /** TINYINT/SMALLINT/INT/BIGINT width family + FLOAT/BOOLEAN: in-range
    * down-casts (the modulo keeps every value in range — out-of-range casts
    * DIVERGE between engines and are pinned in TypeParitySpec instead), and
    * the float32 round-trip (double -> REAL -> double is IEEE-deterministic
    * in both engines). The INT row takes the same modulo discipline as
    * TINYINT/SMALLINT: a bare `cast(event_id as int)` holds at every
    * fixture SF but overflows on snowflake-scale ids — the growth gate's
    * checksum materializer caught exactly that on the 100x tree's shifted
    * ids (2.2e9 > Int.MaxValue, ANSI CAST_OVERFLOW; invisible under
    * count() because the cast was pruned). 1999999973 is prime and
    * < 2^31, so the residue always fits INT. */
  val qTypeIntWidths: Q = Q(
    "q_type_int_widths",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select(
          $"event_id",
          ($"event_id" % 127).cast("tinyint").as("ti"),
          ($"event_id" % 32003).cast("smallint").as("si"),
          ($"event_id" % 1999999973L).cast("int").as("ii"),
          $"event_id".cast("bigint").as("bi"),
          $"value".cast("float").cast("double").as("f32rt"),
          ($"event_id" % 2 === 0).as("even"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |  CAST(event_id % 127 AS TINYINT) AS ti,
           |  CAST(event_id % 32003 AS SMALLINT) AS si,
           |  CAST(event_id % 1999999973 AS INTEGER) AS ii,
           |  CAST(event_id AS BIGINT) AS bi,
           |  CAST(CAST(value AS REAL) AS DOUBLE) AS f32rt,
           |  (event_id % 2 = 0) AS even
           |FROM events ORDER BY event_id""".stripMargin))

  /** BINARY/VARBINARY: string->bytes, hex/base64/length over the bytes —
    * the byte-level surface the reference's BINARY type carries (Spark maps
    * both to BinaryType, lengths unchecked like CHAR/VARCHAR). */
  val qTypeBinary: Q = Q(
    "q_type_binary",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select(
          $"event_id",
          hex($"event_type".cast("binary")).as("hx"),
          expr("octet_length(cast(event_type as binary))").as("blen"),
          md5($"event_type".cast("binary")).as("m5"),
          base64($"event_type".cast("binary")).as("b64"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |  hex(encode(event_type)) AS hx,
           |  CAST(octet_length(encode(event_type)) AS INTEGER) AS blen,
           |  md5(event_type) AS m5,
           |  to_base64(encode(event_type)) AS b64
           |FROM events ORDER BY event_id""".stripMargin))

  /** TIME: the SURVEY mapping stores TIME as int millis-of-day. Extract it
    * from the event timestamp, rebuild HH:mm:ss from the integer with pure
    * arithmetic, and emit the engine's own formatter output alongside — the
    * two string columns agreeing row-by-row IS the round-trip proof, and
    * both are independently oracle-checked. */
  val qTypeTimeMillis: Q = Q(
    "q_type_time_millis",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .withColumn("t_ms", expr("(unix_micros(ts) % 86400000000) div 1000"))
        .select(
          $"event_id", $"t_ms",
          concat(
            lpad(expr("cast(t_ms div 3600000 as string)"), 2, "0"), lit(":"),
            lpad(expr("cast((t_ms div 60000) % 60 as string)"), 2, "0"), lit(":"),
            lpad(expr("cast((t_ms div 1000) % 60 as string)"), 2, "0")).as("t_rebuilt"),
          date_format($"ts", "HH:mm:ss").as("t_fmt"),
          expr("cast(t_ms div 3600000 as int)").as("hh"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |  (epoch_us(ts) % 86400000000) // 1000 AS t_ms,
           |  lpad(CAST(((epoch_us(ts) % 86400000000) // 1000) // 3600000 AS VARCHAR), 2, '0')
           |    || ':' ||
           |  lpad(CAST((((epoch_us(ts) % 86400000000) // 1000) // 60000) % 60 AS VARCHAR), 2, '0')
           |    || ':' ||
           |  lpad(CAST((((epoch_us(ts) % 86400000000) // 1000) // 1000) % 60 AS VARCHAR), 2, '0')
           |    AS t_rebuilt,
           |  strftime(ts, '%H:%M:%S') AS t_fmt,
           |  CAST(((epoch_us(ts) % 86400000000) // 1000) // 3600000 AS INTEGER) AS hh
           |FROM events ORDER BY event_id""".stripMargin))

  /** YEAR-MONTH and DAY-TIME interval arithmetic on timestamps and dates —
    * the reference's IntervalYearMonth/IntervalDayTime types applied where
    * they matter (temporal displacement). Month arithmetic clamps to
    * month-end identically in both engines; day-time arithmetic is exact
    * microsecond displacement. Oracle caveat: DuckDB compares intervals
    * with 1 month = 30 days, so its CSE folds `- INTERVAL 3 MONTH` and
    * `- INTERVAL 90 DAY` into ONE expression (observed on v1.0.0: the
    * 90-day result silently became the 3-month result) — the displacements
    * here are chosen so no two literals are 30-day-equal. */
  val qTypeInterval: Q = Q(
    "q_type_interval",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select(
          $"o_orderkey",
          expr("o_orderdate + INTERVAL '1-2' YEAR TO MONTH").as("plus_ym"),
          expr("o_orderdate - INTERVAL '0-4' YEAR TO MONTH").as("minus_ym"),
          expr("o_orderdate + INTERVAL '2 03:04:05' DAY TO SECOND").as("plus_dt"),
          expr("o_orderdate - INTERVAL '90' DAY").as("minus_d"),
          expr("cast(o_orderdate as date)").as("od"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  o_orderdate + INTERVAL 14 MONTH AS plus_ym,
           |  o_orderdate - INTERVAL 4 MONTH AS minus_ym,
           |  o_orderdate + INTERVAL '2 days 3 hours 4 minutes 5 seconds' AS plus_dt,
           |  o_orderdate - INTERVAL 90 DAY AS minus_d,
           |  CAST(o_orderdate AS DATE) AS od
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** MULTISET: the SURVEY mapping is element->count (Flink's MULTISET is
    * physically a MAP<T, INT>). COLLECT-per-key aggregation rendered as the
    * canonical sorted "elem:count" form both engines can produce — the
    * map-typed Spark original (map_from_entries) is equivalent but DuckDB
    * cannot hash-compare map columns portably. */
  val qTypeMultiset: Q = Q(
    "q_type_multiset",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("cnt"))
        .groupBy($"user_id")
        .agg(
          concat_ws(",", array_sort(collect_list(
            concat($"event_type", lit(":"), $"cnt")))).as("mset"),
          sum($"cnt").as("card"))
        .orderBy($"user_id")
    },
    Some("""SELECT user_id,
           |  string_agg(event_type || ':' || cnt, ',' ORDER BY event_type || ':' || cnt) AS mset,
           |  CAST(sum(cnt) AS BIGINT) AS card
           |FROM (SELECT user_id, event_type, count(*) AS cnt
           |      FROM events GROUP BY user_id, event_type)
           |GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[Q] = Seq(qTypeCharVarchar, qTypeDecimal, qTypeIntWidths,
    qTypeBinary, qTypeTimeMillis, qTypeInterval, qTypeMultiset)
}
