package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Engine-divergent type behaviors that cannot co-execute against the
  * DuckDB oracle (it errors where non-ANSI Spark yields NULL or wraps) —
  * pinned as specs, the WatermarkPolicySpec pattern, complementing the
  * oracle-green q_type_* family in [[operators.TypeParity]].
  *
  * Reference stance: Flink's DECIMAL overflow on cast throws
  * (DecimalData/DecimalUtils), its narrow integer casts wrap (Java
  * semantics), and its decimal division derives scale via Calcite's
  * type-inference. Spark non-ANSI: cast overflow to decimal -> NULL,
  * narrow int casts wrap, division scale = max(6, s1 + p2 + 1) with
  * HALF_UP at the result scale. ANSI mode moves Spark to the
  * throw-on-overflow side of every divergence below.
  */
class TypeParitySpec extends GraftSpec {

  test("decimal overflow: ANSI (Spark 4 default) throws like Flink/DuckDB; non-ANSI yields NULL") {
    // Spark 4 ships ANSI on — the same side of the divergence as the
    // reference's DecimalData overflow throw and DuckDB's cast error
    intercept[Exception](
      spark.sql("SELECT CAST(123456.78 AS DECIMAL(5,2))").collect())
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val row = spark.sql(
        "SELECT CAST(123456.78 AS DECIMAL(5,2)) AS ov, " +
          "CAST(999.99 AS DECIMAL(5,2)) AS fits").collect().head
      assert(row.isNullAt(0), "overflowing cast must yield NULL in non-ANSI mode")
      assert(row.getDecimal(1).toPlainString == "999.99")
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("narrow integer casts: ANSI (default) throws; non-ANSI wraps like the reference's Java casts") {
    intercept[Exception](spark.sql("SELECT CAST(200 AS TINYINT)").collect())
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val row = spark.sql(
        "SELECT CAST(200 AS TINYINT) AS t, CAST(40000 AS SMALLINT) AS s").collect().head
      assert(row.getByte(0) == -56, "200 wraps to -56 as a signed byte")
      assert(row.getShort(1) == (40000 - 65536).toShort)
    } finally spark.conf.unset("spark.sql.ansi.enabled")
  }

  test("decimal division: result scale = max(6, s1+p2+1), HALF_UP at that scale") {
    val df = spark.sql(
      "SELECT CAST(10.00 AS DECIMAL(12,2)) / CAST(3.00 AS DECIMAL(3,2)) AS d")
    val dt = df.schema("d").dataType.asInstanceOf[DecimalType]
    assert(dt.scale == math.max(6, 2 + 3 + 1), s"got $dt")
    assert(df.collect().head.getDecimal(0).toPlainString == "3.333333")
    // HALF_UP at the result scale: 10 / 6.00 has scale-6 digit 6 (1.6666667)
    val hu = spark.sql(
      "SELECT CAST(10.00 AS DECIMAL(12,2)) / CAST(6.00 AS DECIMAL(3,2)) AS d")
      .collect().head.getDecimal(0)
    assert(hu.toPlainString == "1.666667")
  }

  test("MULTISET maps to MapType(elem, count) — the native form behind q_type_multiset") {
    import spark.implicits._
    val ms = Tables.t(spark, sfDir, "events")
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).cast("int").as("cnt"))
      .groupBy($"user_id")
      .agg(map_from_entries(array_sort(
        collect_list(struct($"event_type", $"cnt")))).as("mset"))
    assert(ms.schema("mset").dataType ==
      MapType(StringType, IntegerType, valueContainsNull = false))
    val one = ms.orderBy($"user_id").limit(1).collect().head
      .getMap[String, Int](1)
    assert(one.values.sum > 0, "multiset cardinalities must be positive counts")
  }

  test("TIMESTAMP vs TIMESTAMP_LTZ: the UTC-session precondition makes the mapping exact") {
    // Flink's TIMESTAMP(p) is wall-clock (no zone) — Spark's literal
    // equivalent is TIMESTAMP_NTZ; the engine maps fixture timestamps to
    // TimestampType (LTZ) under a PINNED UTC session tz, where the two
    // coincide instant-for-instant. Under a DST-observing session tz they
    // do NOT (the analyzer coerces NTZ through the session zone) — which is
    // exactly why Tables.normalize requires a fixed-offset tz.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utc = spark.sql(
        "SELECT unix_micros(CAST(TIMESTAMP_NTZ '2021-07-01 12:00:00' AS TIMESTAMP)) AS us")
        .collect().head.getLong(0)
      assert(utc == spark.sql(
        "SELECT unix_micros(TIMESTAMP '2021-07-01 12:00:00Z')").collect().head.getLong(0),
        "under UTC the NTZ wall-clock IS the instant")
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = spark.sql(
        "SELECT unix_micros(CAST(TIMESTAMP_NTZ '2021-07-01 12:00:00' AS TIMESTAMP)) AS us")
        .collect().head.getLong(0)
      assert(ny == utc + 4L * 3600 * 1000000,
        "under a DST zone the same wall-clock maps to a different instant (EDT = UTC-4)")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("TIME-as-millis bounds: the int millis-of-day mapping covers the full day") {
    import spark.implicits._
    val r = Tables.t(spark, sfDir, "events")
      .select(expr("(unix_micros(ts) % 86400000000) div 1000").as("t_ms"))
      .agg(min($"t_ms"), max($"t_ms")).collect().head
    assert(r.getLong(0) >= 0L && r.getLong(1) < 86400000L)
  }
}
