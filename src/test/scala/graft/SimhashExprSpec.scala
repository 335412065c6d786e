package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SimhashFunctions

/** r20 optimization: the native [[org.apache.spark.sql.graft.SimhashFromTokens]]
  * expression replaces (a) the batch explode → md5Hash* → typed-aggregator
  * plan and (b) the streaming per-token zip_with/aggregate higher-order fold.
  * Both replacements must be BIT-EXACT — this spec pins the expression
  * against the legacy higher-order formulation (kept here verbatim as the
  * independent reference implementation) at both producer widths, over the
  * real fixture text.
  */
class SimhashExprSpec extends GraftSpec {

  /** The pre-r20 higher-order fold from NearDupStream.withSimhash,
    * reproduced verbatim as the reference. */
  private def legacySimhash(w: Int): org.apache.spark.sql.Column = {
    val tokHash =
      if (w == 56) "CAST(conv(substr(md5(t), 1, 14), 16, 10) AS BIGINT)"
      else "(shiftleft(CAST(conv(substr(md5(t), 1, 8), 16, 10) AS BIGINT), 32) | " +
        "CAST(conv(substr(md5(t), 9, 8), 16, 10) AS BIGINT))"
    expr(
      s"""aggregate(zip_with(
         |    aggregate(transform(toks, t -> $tokHash), array_repeat(0, $w),
         |      (acc, h) -> zip_with(acc, sequence(0, ${w - 1}),
         |        (a, j) -> a + IF(((h >> j) & 1) = 1, 1, -1))),
         |    sequence(0, ${w - 1}),
         |    (b, j) -> IF(b > 0, shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin)
  }

  private def tokenized = Tables.t(spark, sfDir, "documents")
    .withColumn("toks",
      split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " "))

  for (w <- Seq(56, 64)) {
    test(s"simhash$w expression matches the legacy higher-order fold on fixture text") {
      val both = tokenized.select(
        col("doc_id"),
        SimhashFunctions.simhashOfTokens(col("toks"), w).as("fast"),
        legacySimhash(w).as("legacy"))
      val mismatches = both.filter(col("fast") =!= col("legacy") ||
        col("fast").isNull =!= col("legacy").isNull)
      assert(mismatches.count() == 0,
        mismatches.limit(5).collect().mkString("\n"))
      assert(both.count() > 0)
    }
  }

  test("null contract: null array and null element both yield null") {
    val df = spark.sql(
      "SELECT * FROM VALUES (CAST(NULL AS ARRAY<STRING>)), (array('a', CAST(NULL AS STRING))) t(toks)")
    val out = df.select(SimhashFunctions.simhashOfTokens(col("toks"), 56).as("sh"))
      .collect()
    assert(out.forall(_.isNullAt(0)), out.mkString(","))
  }

  test("empty token array folds to the zero signature like the legacy path") {
    val df = spark.sql("SELECT array() AS toks")
      .select(col("toks").cast("array<string>").as("toks"))
    val r = df.select(
      SimhashFunctions.simhashOfTokens(col("toks"), 64).as("fast"),
      legacySimhash(64).as("legacy")).head()
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L)
  }
}
