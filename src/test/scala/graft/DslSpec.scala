package graft

import graft.dsl.GraftStream
import org.apache.spark.sql.streaming.OutputMode

class DslSpec extends GraftSpec {

  test("map/filter/keyBy/reduce pipeline") {
    import spark.implicits._
    val ds = Seq(("a", 1), ("b", 2), ("a", 3), ("b", 4)).toDS()
    val out = GraftStream(ds)
      .filter(_._2 > 1)
      .keyBy(_._1)
      .reduce((x, y) => (x._1, x._2 + y._2))
      .collect().map { case (k, (_, v)) => k -> v }.toMap
    assert(out == Map("a" -> 3, "b" -> 6))
  }

  test("split partitions and union restores") {
    import spark.implicits._
    val ds = Seq(1, 2, 3, 4, 5).toDS()
    val (even, odd) = GraftStream(ds).split(_ % 2 == 0)
    assert(even.ds.collect().toSet == Set(2, 4))
    assert(odd.union(even).ds.collect().toSet == Set(1, 2, 3, 4, 5))
  }

  test("keyed process with state works on a stream (KeyedProcessFunction shape)") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Int)]
    val counted = GraftStream(mem.toDS())
      .keyBy(_._1)
      .process[Long, (String, Long)](OutputMode.Update) { (k, it, state) =>
        val n = state.getOption.getOrElse(0L) + it.size
        state.update(n)
        Iterator.single((k, n))
      }
    val q = counted.toDF("k", "n").writeStream.format("memory")
      .queryName("dsl_process").outputMode("update").start()
    mem.addData(("a", 1), ("a", 2), ("b", 1))
    q.processAllAvailable()
    mem.addData(("a", 5))
    q.processAllAvailable()
    val rows = spark.table("dsl_process").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // batch 1: a->2, b->1; batch 2: a->3 (state carried)
    assert(rows.toSet == Set(("a", 2L), ("b", 1L), ("a", 3L)))
    q.stop()
  }
}
