package graft

import org.apache.spark.sql.types.TimestampType

/** Guard against driver-side fixture regeneration drift.
  *
  * Round 7 shipped 31 broken queries because the regenerated testdata changed
  * `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=
  * false) — which Spark 4 infers as TIMESTAMP_NTZ — and every operator spec
  * runs on its own constructed fixtures, so `sbt test` stayed green while
  * every `unix_micros($"ts")` call site failed analysis against the REAL
  * parquet. This suite is the missing coupling: it reads the driver's actual
  * fixtures through [[Tables]] and runs one representative registered query
  * per family that depends on the events timestamp encoding.
  */
class FixtureDriftSpec extends GraftSpec {

  test("events.ts normalizes to TimestampType under every parquet encoding") {
    val ts = Tables.t(spark, sfDir, "events").schema("ts")
    assert(ts.dataType == TimestampType,
      s"events.ts resolved as ${ts.dataType}; Tables.normalize must fold new " +
        "parquet timestamp encodings to µs TimestampType")
  }

  test("streaming read of events normalizes identically to the batch read") {
    val st = streaming.StreamingOps.streamTable(spark, sfDir, "events")
    assert(st.schema("ts").dataType == TimestampType)
  }

  // One registered query per family that round 7 shipped broken: CEP,
  // MATCH_RECOGNIZE WITHIN, stream OVER, stream join, keep-last dedup,
  // dynamic-gap session, changelog TopN, connected co-process. Each runs on
  // the real sf0.001 parquet exactly as Verify/Bench will run it.
  private val probes = Seq(
    "q_cep_next", "q_match_recognize_within", "q_stream_over",
    "q_stream_outer_join", "q_dedup_sql_last", "q_session_dynamic",
    "q_changelog_topn", "q_coprocess_enrich")

  for (name <- probes)
    test(s"$name runs against the real fixture") {
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows on sf0.001")
    }
}
