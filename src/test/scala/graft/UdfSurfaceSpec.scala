package graft

import org.apache.spark.sql.functions._

class UdfSurfaceSpec extends GraftSpec {

  test("GeoMean aggregator: exact on a known group, merge-safe across partitions") {
    import spark.implicits._
    val gm = udaf(operators.Scalars2.GeoMean)
    val df = Seq(2.0, 8.0, 4.0).toDF("x").repartition(3)
    val r = df.agg(gm($"x")).collect().head.getDouble(0)
    assert(math.abs(r - 4.0) < 1e-12) // (2*8*4)^(1/3) = 4
  }

  test("stateful streaming topn keeps exactly top-3 with stable ranks") {
    val rows = streaming.StatefulOps.qStreamTopN.run(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.values.foreach { rs =>
      assert(rs.length <= 3)
      val vals = rs.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(vals.sliding(2).forall { case Seq(a, b) => a >= b; case _ => true })
    }
  }

  test("streaming dedup-last picks the max event_id per key") {
    val rows = streaming.StatefulOps.qStreamDedupLast.run(spark, sfDir).collect()
    val batch = operators.Relational.qDedupFirst.run(spark, sfDir).collect()
    // same key set as keep-first, different representatives
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet ==
      batch.map(r => (r.getLong(0), r.getString(1))).toSet)
  }

  test("streaming as-of join: purchases before any signup have null value") {
    val rows = streaming.StatefulOps.qStreamAsof.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // spot-check against batch as-of
    val batch = operators.TimeWindows.qAsOfJoin.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    rows.foreach { r =>
      val got = if (r.isNullAt(1)) None else Some(r.getDouble(1))
      assert(batch(r.getLong(0)) == got)
    }
  }
}
