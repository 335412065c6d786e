package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Encoder, Encoders}

/** Second scalar/collection batch (reference §2.4–2.5): hashes, base64,
  * radix conversion, regexp extraction, array/map constructors and
  * higher-order functions, plus the UDF surface — a custom `Aggregator`
  * (reference AggregateFunction.java:117) and a typed flatMap UDTF
  * (reference TableFunction.java).
  */
object Scalars2 {

  /** Hashes / encodings / conversions. Spark hex is uppercase, DuckDB lower
    * — normalized with lower(); sha2-256 is lowercase hex on both. */
  val qScalarHash: Q = Q(
    "q_scalar_hash",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select(
          $"p_partkey",
          md5($"p_name").as("h_md5"),
          sha2($"p_name", 256).as("h_sha256"),
          lower(hex($"p_brand")).as("h_hex"),
          base64($"p_name".cast("binary")).as("h_b64"),
          translate($"p_name", "aeiou", "AEIOU").as("tr"),
          regexp_extract($"p_name", "([a-z]+)", 1).as("first_word"),
          conv($"p_size".cast("string"), 10, 2).as("bin_size"),
          conv($"p_size".cast("string"), 10, 16).as("hex_size"),
          levenshtein($"p_name", $"p_brand").as("lev"),
          substring_index($"p_name", " ", 1).as("head_tok"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey, md5(p_name) AS h_md5, sha256(p_name) AS h_sha256,
           |  lower(hex(p_brand)) AS h_hex, to_base64(p_name::BLOB) AS h_b64,
           |  translate(p_name, 'aeiou', 'AEIOU') AS tr,
           |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
           |  to_base(p_size, 2) AS bin_size, to_base(p_size, 16) AS hex_size,
           |  CAST(levenshtein(p_name, p_brand) AS INTEGER) AS lev,
           |  split_part(p_name, ' ', 1) AS head_tok
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Array/map constructors + higher-order functions (reference §2.4
    * collections: CARDINALITY, ARRAY, MAP, ELEMENT/AT; Spark HOFs replace the
    * reference's codegen'd array operators). */
  val qCollections: Q = Q(
    "q_collections",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("toks", split($"text", " "))
        .select(
          $"doc_id",
          size($"toks").as("n"),
          array_contains($"toks", "the").as("has_the"),
          // list-typed columns are joined to strings so the driver's hash
          // compare operates on scalars only (pandas can't lexsort lists)
          array_join(sort_array(slice($"toks", 1, 3)), "_").as("sorted3"),
          array_join(slice($"toks", 1, 3), "_").as("joined3"),
          expr("aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x)").as("tot_len"),
          element_at(map_from_arrays(array(lit("a"), lit("b")),
            array($"n_chars", $"n_chars" * 2)), "b").as("m_b"),
          expr("try_element_at(filter(toks, x -> length(x) > 4), 1)").as("first_long"),
          expr("exists(toks, x -> x = 'data')").as("has_data"))
        .orderBy($"doc_id")
    },
    Some("""SELECT doc_id,
           |  CAST(len(t) AS INTEGER) AS n,
           |  list_contains(t, 'the') AS has_the,
           |  array_to_string(list_sort(t[1:3]), '_') AS sorted3,
           |  array_to_string(t[1:3], '_') AS joined3,
           |  CAST(list_sum(list_transform(t, x -> length(x))) AS INTEGER) AS tot_len,
           |  map(['a','b'], [n_chars, n_chars*2])['b'][1] AS m_b,
           |  list_filter(t, x -> length(x) > 4)[1] AS first_long,
           |  len(list_filter(t, x -> x = 'data')) > 0 AS has_data
           |FROM (SELECT doc_id, n_chars, string_split(text, ' ') AS t FROM documents)
           |ORDER BY doc_id""".stripMargin))

  /** Custom typed UDAF — reference AggregateFunction<T,ACC> (UDF surface
    * §2.5): geometric mean via log-sum accumulator, merge-safe (works under
    * partial aggregation across partitions). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), a: Double): (Double, Long) =
      (b._1 + math.log(a), b._2 + 1)
    override def merge(b1: (Double, Long), b2: (Double, Long)): (Double, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Double, Long)): Double =
      if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val qUdafGeomean: Q = Q(
    "q_udaf_geomean",
    (s, dir) => {
      import s.implicits._
      val gm = udaf(GeoMean)
      Tables.t(s, dir, "customer")
        .groupBy($"c_nationkey")
        .agg(round(gm(abs($"c_acctbal") + 1.0), 4).as("geo_bal"))
        .orderBy($"c_nationkey")
    },
    Some("""SELECT c_nationkey, round(exp(avg(ln(abs(c_acctbal) + 1.0))), 4) AS geo_bal
           |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  /** UDTF equivalent — reference TableFunction<T>: a typed flatMap emitting
    * (doc_id, pos, token) per input row; the DataStream-side analogue of
    * Correlate. */
  val qUdtfFlatmap: Q = Q(
    "q_udtf_flatmap",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .select($"doc_id", $"text").as[(Long, String)]
        .flatMap { case (id, text) =>
          text.split(" ").iterator.zipWithIndex.map { case (tok, i) => (id, i, tok) }
        }
        .toDF("doc_id", "pos", "token")
        .filter($"pos" < 10)
        .orderBy($"doc_id", $"pos")
    },
    Some("""SELECT doc_id, CAST(s['p'] AS INTEGER) AS pos, s['tok'] AS token FROM (
           |  SELECT doc_id,
           |         unnest(list_transform(range(1, least(len(t), 10) + 1),
           |                i -> {'p': i - 1, 'tok': t[i]})) AS s
           |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))
           |ORDER BY doc_id, pos""".stripMargin))

  /** JSON access (reference §2.4 / events.props fixture is a JSON string). */
  val qJsonExtract: Q = Q(
    "q_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("int").as("k_val"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
           |FROM events ORDER BY event_id""".stripMargin))

  /** INITCAP / OVERLAY / STR_TO_MAP (reference SqlFunctionUtils) — DuckDB
    * lacks all three, so the oracle reconstructs each from primitives. */
  val qScalarStr3: Q = Q(
    "q_scalar_str3",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .withColumn("kv", concat(lit("brand:"), $"p_brand", lit(",size:"), $"p_size".cast("string")))
        .select(
          $"p_partkey",
          initcap($"p_name").as("ini"),
          overlay($"p_name", lit("XX"), lit(2), lit(2)).as("ovl"),
          element_at(expr("str_to_map(kv, ',', ':')"), "size").as("s2m"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  array_to_string(list_transform(string_split(lower(p_name), ' '),
           |    x -> upper(substr(x, 1, 1)) || substr(x, 2)), ' ') AS ini,
           |  substr(p_name, 1, 1) || 'XX' || substr(p_name, 4) AS ovl,
           |  map_from_entries(list_transform(
           |    string_split('brand:' || p_brand || ',size:' || CAST(p_size AS VARCHAR), ','),
           |    x -> {'k': split_part(x, ':', 1), 'v': split_part(x, ':', 2)}))['size'][1] AS s2m
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** PARSE_URL (reference SqlFunctionUtils.parseUrl) over well-formed URLs
    * constructed from columns; DuckDB mirrors with regexp extraction. */
  val qParseUrl: Q = Q(
    "q_parse_url",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "documents")
        .withColumn("url",
          concat(lit("https://"), $"source", lit(".example.com/docs/"),
            $"doc_id".cast("string"), lit("?lang="), $"lang"))
        .select(
          $"doc_id",
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY')").as("query"),
          expr("parse_url(url, 'PROTOCOL')").as("proto"))
        .orderBy($"doc_id")
    },
    Some("""WITH u AS (
           |  SELECT doc_id,
           |         'https://' || source || '.example.com/docs/' ||
           |         CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
           |  FROM documents)
           |SELECT doc_id,
           |  regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           |  regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           |  regexp_extract(url, '\?([^#]*)', 1) AS query,
           |  regexp_extract(url, '^([a-z]+)://', 1) AS proto
           |FROM u ORDER BY doc_id""".stripMargin))

  /** String batch 4 (reference FlinkSqlOperatorTable LOCATE/POSITION/
    * ENCODE/DECODE/FROM_BASE64/NULLIF + ROW constructor with DOT access):
    * the encode→base64→decode roundtrip exercises both codecs; the struct
    * column is built then field-accessed, mirroring ROW(...).field. */
  val qScalarStr4: Q = Q(
    "q_scalar_str4",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select(
          $"p_partkey",
          locate("a", $"p_name").as("loc_a"),
          locate("PROMO", $"p_type").as("pos_promo"),
          decode(unbase64(base64(encode($"p_name", "UTF-8"))), "UTF-8").as("rt"),
          expr("nullif(p_size, 5)").as("nz_size"),
          struct($"p_partkey".as("k"), $"p_brand".as("b")).getField("b").as("row_b"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  CAST(strpos(p_name, 'a') AS INTEGER) AS loc_a,
           |  CAST(position('PROMO' IN p_type) AS INTEGER) AS pos_promo,
           |  CAST(from_base64(to_base64(encode(p_name))) AS VARCHAR) AS rt,
           |  nullif(p_size, 5) AS nz_size,
           |  struct_pack(k := p_partkey, b := p_brand).b AS row_b
           |FROM part ORDER BY p_partkey""".stripMargin))

  /** Math batch 2 (reference FlinkSqlOperatorTable BIN/PI/RADIANS/COT/
    * LOG2/CBRT/TRUNCATE family): radix/trig/root scalars with exact DuckDB
    * twins. factorial is exact on both sides for 0..20 (long range). */
  val qScalarMath2: Q = Q(
    "q_scalar_math2",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .filter($"l_linenumber" <= 4)
        .select(
          $"l_orderkey", $"l_linenumber",
          bin($"l_orderkey").as("okey_bin"),
          round(lit(Math.PI) * $"l_discount", 6).as("pi_disc"),
          round(radians($"l_quantity"), 6).as("qty_rad"),
          round(lit(1.0) / tan($"l_tax" + 1.0), 6).as("cot_tax"),
          round(log2($"l_quantity"), 6).as("qty_log2"),
          round(cbrt($"l_extendedprice"), 6).as("price_cbrt"),
          factorial($"l_linenumber").as("ln_fact"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber, bin(l_orderkey) AS okey_bin,
           |  round(pi() * l_discount, 6) AS pi_disc,
           |  round(radians(l_quantity), 6) AS qty_rad,
           |  round(cot(l_tax + 1.0), 6) AS cot_tax,
           |  round(log2(l_quantity), 6) AS qty_log2,
           |  round(cbrt(l_extendedprice), 6) AS price_cbrt,
           |  CAST(factorial(CAST(l_linenumber AS INTEGER)) AS BIGINT) AS ln_fact
           |FROM lineitem WHERE l_linenumber <= 4
           |ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Temporal batch 2 (reference TIMESTAMPADD/TIMESTAMPDIFF/QUARTER/
    * WEEK/DAYOFYEAR): boundary-aligned midnight timestamps make Spark's
    * interval semantics and DuckDB's boundary-count date_diff agree. */
  val qScalarTemporal2: Q = Q(
    "q_scalar_temporal2",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "orders")
        .select(
          $"o_orderkey",
          quarter($"o_orderdate").as("q"),
          weekofyear($"o_orderdate").as("woy"),
          dayofyear($"o_orderdate").as("doy"),
          // o_orderdate reads as TIMESTAMP_NTZ; the session runs UTC, so the
          // cast to instant-typed TIMESTAMP is the identity mapping
          unix_micros(expr("timestampadd(HOUR, 3, o_orderdate)").cast("timestamp"))
            .as("plus3h_us"),
          expr("timestampdiff(MINUTE, timestamp'1995-01-01 00:00:00', o_orderdate)")
            .as("min_since_95"),
          make_date(year($"o_orderdate"), month($"o_orderdate"),
            dayofmonth($"o_orderdate")).as("md"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
           |  CAST(weekofyear(o_orderdate) AS INTEGER) AS woy,
           |  CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           |  CAST(epoch_us(o_orderdate + INTERVAL 3 HOUR) AS BIGINT) AS plus3h_us,
           |  date_diff('minute', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS min_since_95,
           |  make_date(CAST(year(o_orderdate) AS BIGINT),
           |            CAST(month(o_orderdate) AS BIGINT),
           |            CAST(day(o_orderdate) AS BIGINT)) AS md
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** CONVERT_TZ + TEMPORAL_OVERLAPS (reference FlinkSqlOperatorTable
    * CONVERT_TZ / TEMPORAL_OVERLAPS): instant → America/New_York wall time
    * (DST-correct on both engines via IANA tzdata), and the interval-overlap
    * predicate against a fixed range. */
  val qConvertTz: Q = Q(
    "q_convert_tz",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "events")
        .select(
          $"event_id",
          date_format(from_utc_timestamp($"ts", "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("ny_wall"),
          // TEMPORAL_OVERLAPS((ts, ts+1h), (fixed, fixed+1h))
          ($"ts" < to_timestamp(lit("2024-01-01 13:00:00")) &&
            to_timestamp(lit("2024-01-01 12:00:00")) <
              ($"ts" + expr("INTERVAL 1 HOUR"))).as("overlaps_noon"))
        .orderBy($"event_id")
    },
    Some("""SELECT event_id,
           |  strftime(timezone('America/New_York',
           |           timezone('UTC', CAST(ts AS TIMESTAMP))),
           |           '%Y-%m-%d %H:%M:%S') AS ny_wall,
           |  (CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-01 13:00:00'
           |   AND TIMESTAMP '2024-01-01 12:00:00'
           |       < CAST(ts AS TIMESTAMP) + INTERVAL 1 HOUR) AS overlaps_noon
           |FROM events ORDER BY event_id""".stripMargin))

  /** Hyperbolics (reference FlinkSqlOperatorTable SINH/COSH/TANH): DuckDB
    * has no hyperbolic functions, so the oracle computes them from exp()
    * — identities exact to well under the rounded 6 decimals. */
  val qScalarMath3: Q = Q(
    "q_scalar_math3",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "lineitem")
        .select(
          $"l_orderkey", $"l_linenumber",
          round(sinh($"l_discount"), 6).as("sh"),
          round(cosh($"l_discount"), 6).as("ch"),
          round(tanh($"l_discount"), 6).as("th"),
          round(sinh($"l_tax") + cosh($"l_tax"), 6).as("exp_tax"))
        .orderBy($"l_orderkey", $"l_linenumber")
    },
    Some("""SELECT l_orderkey, l_linenumber,
           |  round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sh,
           |  round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS ch,
           |  round((exp(l_discount) - exp(-l_discount))
           |        / (exp(l_discount) + exp(-l_discount)), 6) AS th,
           |  round(exp(l_tax), 6) AS exp_tax
           |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin))

  /** Char-set trims + FROM_UNIXTIME (reference LTRIM/RTRIM two-arg forms and
    * FROM_UNIXTIME; Spark session tz is UTC in the gate, matched by
    * formatting DuckDB's naive epoch timestamp). */
  val qScalarStr5: Q = Q(
    "q_scalar_str5",
    (s, dir) => {
      import s.implicits._
      Tables.t(s, dir, "part")
        .select(
          $"p_partkey",
          expr("ltrim('PB', p_brand)").as("brand_ltrim"),
          expr("rtrim('0123456789', p_brand)").as("brand_rtrim"),
          from_unixtime($"p_partkey" + 1700000000L).as("fake_ts"))
        .orderBy($"p_partkey")
    },
    Some("""SELECT p_partkey,
           |  ltrim(p_brand, 'PB') AS brand_ltrim,
           |  rtrim(p_brand, '0123456789') AS brand_rtrim,
           |  strftime(make_timestamp((p_partkey + 1700000000) * 1000000),
           |           '%Y-%m-%d %H:%M:%S') AS fake_ts
           |FROM part ORDER BY p_partkey""".stripMargin))

  val all: Seq[Q] = Seq(qScalarHash, qCollections, qUdafGeomean, qUdtfFlatmap,
    qJsonExtract, qScalarStr3, qParseUrl, qScalarMath2, qScalarTemporal2,
    qScalarStr4, qConvertTz, qScalarMath3, qScalarStr5)
}
