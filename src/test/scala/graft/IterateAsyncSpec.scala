package graft

import graft.operators.{AsyncOps, IterateOps}
import org.apache.spark.sql.functions._
import scala.concurrent.duration._
import scala.concurrent.{ExecutionContext, Future}

class IterateAsyncSpec extends GraftSpec {

  test("iterate: transitive closure converges (DataSet.iterate analogue)") {
    import spark.implicits._
    // chain 0->1->2->3->4: min-label propagation converges to all-0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val labels0 = spark.range(5).toDF("node").withColumn("label", $"node")
    val result = IterateOps.iterate(labels0, maxIter = 10, checkpointEvery = 2)(
      step = { labels =>
        val viaEdge = edges.join(labels.withColumnRenamed("node", "src2"),
            $"src" === $"src2")
          .select($"dst".as("node"), $"label")
        labels.select($"node", $"label").union(viaEdge)
          .groupBy($"node").agg(min($"label").as("label"))
      })
    val got = result.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("asyncMapPartitions: ordered emission with bounded concurrency") {
    import spark.implicits._
    val ds = spark.range(100).as[Long].repartition(4)
    val out = AsyncOps.asyncMapPartitions(ds, capacity = 8, timeout = 30.seconds) {
      (n, ec) => Future { Thread.sleep(1); n * 2 }(ec)
    }
    assert(out.collect().sorted.toSeq == (0L until 100L).map(_ * 2))
  }
}
