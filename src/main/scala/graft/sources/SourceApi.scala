package graft.sources

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import scala.reflect.ClassTag

/** FLIP-27 unified Source API — NEW IN the reference's 1.11 release
  * (FLINK-10740; flink-core `api/connector/source/Source.java`,
  * `SplitEnumerator.java`, `SourceReader.java`): split discovery on a
  * coordinator, per-split reading on the workers, ONE interface for
  * bounded and continuous execution.
  *
  * Spark mapping:
  *  - the [[SplitEnumerator]] runs on the DRIVER — exactly where the
  *    reference runs it (the SourceCoordinator lives on the JobManager);
  *    its output is split METADATA, bounded by split count, never rows;
  *  - splits parallelize across tasks and [[SourceReader.read]] runs
  *    inside `mapPartitions` on the executors (the RDD escape hatch is
  *    justified here: per-split imperative IO is the one genuinely
  *    non-declarative stage — everything downstream is a Dataset again);
  *  - bounded mode = one enumeration; incremental mode = re-enumeration
  *    against checkpointed split ids (the reference enumerator's
  *    discover-new-splits loop, its state checkpointed by the
  *    coordinator) — each round reads ONLY newly discovered splits.
  *
  * For most formats a production deployment should prefer Spark's DSv2
  * sources (pushdown, vectorization); this SPI is the migration surface
  * for custom reference connectors built on the 1.11 Source API.
  */
object SourceApi {

  trait SourceSplit extends Serializable { def splitId: String }

  trait SplitEnumerator[S <: SourceSplit] {
    /** Splits not yet in `checkpointed` (empty set = full enumeration). */
    def discoverSplits(checkpointed: Set[String]): Seq[S]
  }

  trait SourceReader[S <: SourceSplit, T] extends Serializable {
    def read(split: S): Iterator[T]
  }

  trait Source[S <: SourceSplit, T] extends Serializable {
    def createEnumerator(): SplitEnumerator[S]
    def createReader(): SourceReader[S, T]
  }

  /** Bounded read: enumerate once, read every split in parallel. */
  def boundedRead[S <: SourceSplit : ClassTag, T: Encoder : ClassTag](
      spark: SparkSession, source: Source[S, T],
      parallelism: Int = 0): Dataset[T] = {
    val splits = source.createEnumerator().discoverSplits(Set.empty)
    incremental(spark, source, splits, parallelism)
  }

  /** One incremental round: read splits NOT in `checkpointed`, return the
    * data plus the advanced checkpoint. Drive in a loop for continuous
    * ingestion (each round is a micro-batch; the caller persists the split
    * ids the way a streaming checkpoint persists enumerator state). */
  def incrementalRead[S <: SourceSplit : ClassTag, T: Encoder : ClassTag](
      spark: SparkSession, source: Source[S, T], checkpointed: Set[String],
      parallelism: Int = 0): (Dataset[T], Set[String]) = {
    val fresh = source.createEnumerator().discoverSplits(checkpointed)
    // materialize BEFORE returning the advanced checkpoint: the returned
    // Dataset is otherwise lazy, and persisting the checkpoint ahead of a
    // failed read would silently skip those splits on the next round
    // (at-most-once). localCheckpoint pins the rows the moment the caller
    // holds the new split set — FLIP-27's enumerator state commits WITH
    // read progress, not ahead of it.
    val data = incremental(spark, source, fresh, parallelism)
      .localCheckpoint(true)
    (data, checkpointed ++ fresh.map(_.splitId))
  }

  private def incremental[S <: SourceSplit : ClassTag, T: Encoder : ClassTag](
      spark: SparkSession, source: Source[S, T], splits: Seq[S],
      parallelism: Int): Dataset[T] = {
    if (splits.isEmpty) return spark.emptyDataset[T]
    val par = if (parallelism > 0) parallelism else splits.size
    val reader = source.createReader()
    spark.createDataset(
      spark.sparkContext.parallelize(splits, par)
        .mapPartitions(_.flatMap(reader.read)))
  }

  /** Concrete source: a directory of text files, one split per file —
    * the shape of the reference's own FLIP-27 FileSource
    * (flink-connector-files `FileSource.java`, PendingSplitsCheckpoint
    * tracking processed paths). Reading is pure JVM IO on the executor. */
  final case class FileSplit(path: String) extends SourceSplit {
    override def splitId: String = path
  }
  final class TextDirSource(dir: String) extends Source[FileSplit, String] {
    override def createEnumerator(): SplitEnumerator[FileSplit] =
      new SplitEnumerator[FileSplit] {
        override def discoverSplits(checkpointed: Set[String]): Seq[FileSplit] = {
          val ls = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
          try {
            import scala.jdk.CollectionConverters._
            ls.iterator().asScala
              .filter(java.nio.file.Files.isRegularFile(_)) // a stray
              // subdirectory is not a split; readAllLines on it would
              // fail the executor task
              .map(_.toString)
              .filter(p => !checkpointed.contains(p))
              .filter { p =>
                val n = p.substring(p.lastIndexOf('/') + 1)
                !n.startsWith("_") && !n.startsWith(".")
              }.toSeq.sorted.map(FileSplit)
          } finally ls.close()
        }
      }
    override def createReader(): SourceReader[FileSplit, String] =
      new SourceReader[FileSplit, String] {
        override def read(split: FileSplit): Iterator[String] = {
          import scala.jdk.CollectionConverters._
          // materialized per split: split files are bounded by the
          // writer's rotation policy, and the stream must close here
          val lines = java.nio.file.Files.readAllLines(
            java.nio.file.Paths.get(split.path))
          lines.iterator().asScala
        }
      }
  }

  /** q_source_api: the FLIP-27 path end-to-end — events staged as a text
    * directory (Spark-written, never collected), enumerated into one split
    * per file on the driver, read back via per-split executor IO, parsed,
    * and verified against the relational oracle. */
  val qSourceApi: Q = Q(
    "q_source_api",
    (s, dir) => {
      import s.implicits._
      // per-invocation stage: a deterministic path would let a concurrent
      // session's overwrite delete files between THIS run's driver-side
      // enumeration and its executor reads
      val stage = Tables.scratch(
        s"source-api/graft_src-${java.util.UUID.randomUUID()}")
      Tables.t(s, dir, "events")
        .select(concat_ws(",", $"event_id", $"user_id").as("value"))
        .coalesce(4).write.mode("overwrite").text(stage)
      boundedRead(s, new TextDirSource(stage))
        .map { line =>
          val Array(e, u) = line.split(",", 2)
          (e.toLong, u.toLong)
        }
        .toDF("event_id", "user_id")
        .orderBy("event_id")
    },
    Some("SELECT event_id, user_id FROM events ORDER BY event_id"))

  val all: Seq[Q] = Seq(qSourceApi)
}
