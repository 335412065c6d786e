package graft

import graft.operators.TemporalSql
import java.sql.Timestamp

/** FOR SYSTEM_TIME AS OF SQL surface (reference SqlSnapshot +
  * TemporalRowTimeJoinOperator semantics). */
class TemporalSqlSpec extends GraftSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def setup(): Unit = {
    val sparkS = spark
    import sparkS.implicits._
    Seq((1L, 10L, ts("2024-01-01 00:10:00")), // user 10: after both versions
      (2L, 10L, ts("2024-01-01 00:00:30")),   // between v1 and v2
      (3L, 20L, ts("2024-01-01 00:05:00")))   // user 20 has no version
      .toDF("id", "uid", "ts").createOrReplaceTempView("probes")
    Seq((10L, ts("2024-01-01 00:00:00"), 1.0), // v1
      (10L, ts("2024-01-01 00:01:00"), 2.0))   // v2
      .toDF("uid", "ts", "rate").createOrReplaceTempView("versions")
  }

  test("inner temporal join picks the latest version at-or-before and drops unversioned") {
    setup()
    val got = TemporalSql.sql(spark,
      """SELECT p.id AS id, b.rate AS rate
        |FROM probes AS p
        |JOIN versions FOR SYSTEM_TIME AS OF p.ts AS b
        |ON p.uid = b.uid
        |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // id 1 sees v2 (latest <= 00:10), id 2 sees v1 (v2 is later), id 3 dropped
    assert(got == Seq((1L, 2.0), (2L, 1.0)))
  }

  test("left temporal join keeps unversioned probes with nulls") {
    setup()
    val got = TemporalSql.sql(spark,
      """SELECT p.id AS id, b.rate AS rate
        |FROM probes AS p
        |LEFT JOIN versions FOR SYSTEM_TIME AS OF p.ts AS b
        |ON p.uid = b.uid
        |ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(got == Seq((1L, Some(2.0)), (2L, Some(1.0)), (3L, None)))
  }

  test("malformed shapes are rejected, not silently misread") {
    setup()
    intercept[IllegalArgumentException] {
      TemporalSql.sql(spark, "SELECT * FROM probes JOIN versions ON 1=1")
    }
    intercept[IllegalArgumentException] { // OF must reference the probe alias
      TemporalSql.sql(spark,
        """SELECT p.id FROM probes AS p
          |JOIN versions FOR SYSTEM_TIME AS OF b.ts AS b
          |ON p.uid = b.uid""".stripMargin)
    }
  }
}
