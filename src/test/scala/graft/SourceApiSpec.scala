package graft

import graft.sources.SourceApi

/** FLIP-27 Source API mapping: driver-side enumeration, executor-side
  * per-split reads, incremental re-enumeration against a checkpoint. */
class SourceApiSpec extends GraftSpec {

  private def write(dir: String, name: String, lines: String*): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  test("bounded read unions every split; hidden files are not splits") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Tables.scratch(s"srcapi/${java.util.UUID.randomUUID()}")
    write(dir, "a.txt", "1", "2")
    write(dir, "b.txt", "3")
    write(dir, "_SUCCESS", "ignored")
    write(dir, ".hidden", "ignored")
    val out = SourceApi.boundedRead(spark, new SourceApi.TextDirSource(dir))
      .collect().sorted.toSeq
    assert(out == Seq("1", "2", "3"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("incremental rounds read only newly discovered splits") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Tables.scratch(s"srcapi-inc/${java.util.UUID.randomUUID()}")
    write(dir, "a.txt", "1")
    val (r1, ck1) = SourceApi.incrementalRead(
      spark, new SourceApi.TextDirSource(dir), Set.empty)
    assert(r1.collect().toSeq == Seq("1") && ck1.size == 1)
    // a new split appears between rounds — only it is read next
    write(dir, "b.txt", "2")
    val (r2, ck2) = SourceApi.incrementalRead(
      spark, new SourceApi.TextDirSource(dir), ck1)
    assert(r2.collect().toSeq == Seq("2") && ck2.size == 2)
    // nothing new: the round is empty, checkpoint unchanged
    val (r3, ck3) = SourceApi.incrementalRead(
      spark, new SourceApi.TextDirSource(dir), ck2)
    assert(r3.isEmpty && ck3 == ck2)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("splits read in parallel tasks (parallelism = split count)") {
    val sparkS = spark
    import sparkS.implicits._
    val dir = Tables.scratch(s"srcapi-par/${java.util.UUID.randomUUID()}")
    (0 until 6).foreach(i => write(dir, s"f$i.txt", i.toString))
    val ds = SourceApi.boundedRead(spark, new SourceApi.TextDirSource(dir))
    assert(ds.rdd.getNumPartitions == 6)
    assert(ds.collect().map(_.toInt).sorted.toSeq == (0 until 6))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
