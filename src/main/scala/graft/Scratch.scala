package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling harness (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.t(spark, sfDir, "documents").count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s  rows=$n")
    }
    args.headOption.getOrElse("simhash") match {
      case "simhash" =>
        time("q_simhash")(SparkEntry.queries("q_simhash")(spark, sfDir).count())
        time("q_simhash_pairs")(SparkEntry.queries("q_simhash_pairs")(spark, sfDir).count())
        time("q_simhash_banded")(SparkEntry.queries("q_simhash_banded")(spark, sfDir).count())
        time("q_simhash_banded#2")(SparkEntry.queries("q_simhash_banded")(spark, sfDir).count())
      case "stages" =>
        import org.apache.spark.sql.functions._
        val docs = Tables.t(spark, sfDir, "documents")
        time("tokens+md5")(docs.select(col("doc_id"),
          explode(split(trim(regexp_replace(lower(col("text")), "\\s+", " ")), " ")).as("tok"))
          .select(graft.functions.FlinkFunctions.md5Hash31(col("tok")).as("h")).count())
        time("simhash raw #1")(operators.DedupOps.simhash(docs).count())
        time("simhash raw #2")(operators.DedupOps.simhash(docs).count())
      case "streamprof" =>
        import org.apache.spark.sql.functions._
        val t0 = System.nanoTime()
        val agg = streaming.StreamingOps.streamTable(spark, sfDir, "events")
          .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        val q = agg.writeStream.format("memory").queryName("sprof")
          .outputMode("complete")
          .option("checkpointLocation", s"/dev/shm/graft-ckpt/sprof-${System.nanoTime()}")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
        println(f"[scratch] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
        q.recentProgress.foreach { p =>
          println(s"[scratch] batch ${p.batchId} rows=${p.numInputRows} " +
            s"durations=${p.durationMs}")
        }
      case "stream" =>
        def trio(tag: String): Unit = {
          time(s"q_stream_tumble$tag")(SparkEntry.queries("q_stream_tumble")(spark, sfDir).count())
          time(s"q_stream_topn$tag")(SparkEntry.queries("q_stream_topn")(spark, sfDir).count())
          time(s"q_stream_session$tag")(SparkEntry.queries("q_stream_session")(spark, sfDir).count())
        }
        trio("#1")
        trio("#2")
      case "clusters" =>
        time("q_minhash_lsh")(SparkEntry.queries("q_minhash_lsh")(spark, sfDir).count())
        time("q_dedup_clusters")(SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count())
        time("q_dedup_clusters#2")(SparkEntry.queries("q_dedup_clusters")(spark, sfDir).count())
    }
    spark.stop()
  }
}
