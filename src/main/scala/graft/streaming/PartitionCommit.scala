package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming filesystem sink with PARTITION COMMIT — the OTHER headline
  * Flink 1.11 feature next to CDC (FLINK-14254/FLIP-115: the filesystem
  * connector's streaming sink, reference flink-table/flink-table-runtime-
  * blink/.../filesystem/stream/StreamingFileCommitter.java +
  * PartitionCommitPolicy.java): a streaming INSERT keeps APPENDING files
  * into time-partition directories, and a partition becomes VISIBLE to
  * downstream batch readers only when the job's watermark passes the
  * partition's end (plus `sink.partition-commit.delay`) and the commit
  * policy runs — `success-file` drops an `_SUCCESS` marker into the
  * partition directory, the Hive-ecosystem handshake.
  *
  * Spark mapping: the per-batch write is an ordinary dynamic
  * `partitionBy()` parquet write (executor-parallel, the same rolling-file
  * behavior the reference's StreamingFileWriter gives); the COMMITTER is
  * driver-side foreachBatch bookkeeping — exactly where the reference runs
  * it (StreamingFileCommitter is a single-parallelism operator on the
  * JobManager side of the topology). The watermark is tracked as
  * max-event-time-so-far minus the declared out-of-orderness bound, the
  * same value the reference's sink receives from upstream.
  *
  * EXACTLY-ONCE under foreachBatch replay (the reference's
  * StreamingFileSink gets this from the two-phase pending→committed file
  * lifecycle, Buckets.java): foreachBatch alone is at-least-once — a crash
  * between a blind `mode(append)` write and the checkpoint commit would
  * replay the batch and duplicate its rows. This sink therefore runs a
  * write-ahead protocol per micro-batch:
  *   1. stage the batch under `.staging/<batchId>` with mode(overwrite) —
  *      a replayed attempt REPLACES any partial earlier stage;
  *   2. move the staged files into their final partition directories under
  *      batch-unique names (`b<batchId>-…`), first deleting any files with
  *      that prefix left by a crashed earlier attempt of the same batch;
  *   3. record the batch in `_graft_commits/<batchId>` (atomic
  *      write-then-rename), carrying the committer watermark.
  * A replay of a batch whose commit record exists is skipped outright; a
  * replay that crashed anywhere before step 3 redoes steps 1-2
  * idempotently. On restart the committer watermark is restored from the
  * commit records, so commit progress never regresses.
  *
  * All filesystem access goes through the Hadoop FileSystem API resolved
  * from the sink URI — the sink works against any Hadoop-reachable store
  * (HDFS, s3a, local), not just the local filesystem.
  *
  * Scale posture: data motion is one repartition-by-partition shuffle
  * feeding the partitionBy write (file count = partition count, not
  * tasks x partitions); the batch is persisted once and reused for the
  * count, the staged write and the max-ts aggregate (one evaluation of the
  * upstream plan, not three); committer work per batch is metadata-sized —
  * a staged-directory listing plus one rename per staged file and a
  * partition-directory listing, bounded by partition/file count, never by
  * rows — the identical bound the reference's committer has.
  */
object PartitionCommit {

  private val StagingDir = ".staging"
  private val CommitsDir = "_graft_commits"

  /** Session-conf key the recovery soak sets to a batch id: that batch
    * crashes after file promotion, before its commit record (the protocol's
    * hardest replay window). Unset in production; never set by queries. */
  val CrashBeforeRecordKey = "spark.graft.soak.crashBeforeRecord"

  /** Reference option keys (FileSystemOptions.java), same spellings. */
  final case class Options(trigger: String, delaySec: Long, policy: String)
  def options(opts: Map[String, String]): Options = Options(
    trigger = opts.getOrElse("sink.partition-commit.trigger", "partition-time"),
    delaySec = opts.get("sink.partition-commit.delay")
      .map(graft.operators.LookupJoin.parseDuration(_) / 1000L).getOrElse(0L),
    policy = opts.getOrElse("sink.partition-commit.policy.kind", "success-file"))

  /** The streaming write plus live committer counters. `rowsWritten` is the
    * number of rows this ATTACHED query has durably committed (replayed
    * already-committed batches don't recount) — the delta a caller reports
    * for one drain, where a cumulative read-back count would double-count
    * prior drains into the same sink. */
  final class Attached(val writer: org.apache.spark.sql.streaming.DataStreamWriter[Row],
      counter: java.util.concurrent.atomic.AtomicLong) {
    def rowsWritten: Long = counter.get()
  }

  /** Attach the partitioned streaming write + committer to `df`.
    *
    * `partCol` must be a BIGINT epoch-second partition START (e.g.
    * `floor(unix_seconds(ts)/3600)*3600`) — the default partition-time
    * extractor's output; `partDurSec` its width. `tsCol` is the event-time
    * column the watermark tracks; `boundSec` the out-of-orderness bound.
    * A partition `p` commits when `p + partDurSec + delaySec <= watermark`.
    */
  def foreachBatchPartitioned(df: DataFrame, path: String, partCol: String,
      partDurSec: Long, tsCol: String, boundSec: Long = 0L, delaySec: Long = 0L,
      commitTag: String = "")
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    attach(df, path, partCol, partDurSec, tsCol, boundSec, delaySec,
      commitTag).writer

  /** As [[foreachBatchPartitioned]], returning the committer counters too.
    *
    * `commitTag` namespaces the commit records and file names: batch ids
    * are per-CHECKPOINT, so two queries with different checkpoints writing
    * the same sink path would otherwise collide on "batch 0" — the second
    * would wrongly skip its batch as already committed and `promote` would
    * delete the first's files as crashed leftovers. Callers pass a value
    * stable across restarts of the SAME checkpoint (e.g. a hash of the
    * checkpoint location) and distinct between checkpoints. */
  def attach(df: DataFrame, path: String, partCol: String,
      partDurSec: Long, tsCol: String, boundSec: Long = 0L, delaySec: Long = 0L,
      commitTag: String = ""): Attached = {
    require(df.columns.contains(partCol), s"partition column '$partCol' missing")
    require(df.columns.contains(tsCol), s"event-time column '$tsCol' missing")
    val tag = if (commitTag.isEmpty) "" else s"$commitTag-"
    // driver-side committer state, like the reference's single-parallelism
    // StreamingFileCommitter operator: survives across micro-batches for
    // the lifetime of the query; restored from the commit records on the
    // first batch after a restart
    var watermark = Long.MinValue
    var restored = false
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val writer = df.writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
      val root = new HPath(path)
      val fs = root.getFileSystem(
        batch.sparkSession.sparkContext.hadoopConfiguration)
      if (!restored) {
        watermark = math.max(watermark, restoredWatermark(fs, root))
        restored = true
      }
      val record = new HPath(new HPath(root, CommitsDir), s"$tag$batchId")
      if (!fs.exists(record)) { // else: replay of a committed batch — skip
        val staged = batch.persist()
        try {
          val n = staged.count()
          if (n > 0L) {
            val staging = new HPath(new HPath(root, StagingDir), s"$tag$batchId")
            // repartition BY the partition column before the dynamic write:
            // without it every task writes a file into every partition dir
            // (tasks × partitions files — measured 23k tiny files and a 26 s
            // write for 720 hour-partitions at sf0.1); with it, file count =
            // partition count. The standard dynamic-partition-insert pattern
            // and the only shape that survives a 100 TB sink (the
            // reference's writer keys its rolling files per partition the
            // same way).
            staged.repartition(col(partCol))
              .write.mode("overwrite").partitionBy(partCol)
              .parquet(staging.toString)
            promote(fs, root, staging, partCol, s"${tag}b$batchId-")
            fs.delete(staging, true)
            val mx = staged.agg(max(unix_seconds(col(tsCol)))).head()
            if (!mx.isNullAt(0))
              watermark = math.max(watermark, mx.getLong(0) - boundSec)
          }
          // fault-injection hook for the recovery soak (SoakRecovery): die
          // in the exactly-once danger window — files already PROMOTED into
          // final partition dirs, commit record NOT yet written. The replay
          // must redo steps 1-2 idempotently (delete this batch's b<id>-
          // files, re-stage, re-promote) and count the rows exactly once.
          if (batch.sparkSession.conf.get(CrashBeforeRecordKey, "")
              == batchId.toString)
            throw new RuntimeException(
              s"graft-soak: injected crash before commit record of batch $batchId")
          writeRecord(fs, record, watermark)
          // count only after the commit record is durable: a batch retried
          // after a crash before the record re-runs this body and must not
          // double-count its rows
          rows.addAndGet(n)
        } finally staged.unpersist()
      }
      commitReady(fs, root, partCol, partDurSec, delaySec, watermark)
    }
    new Attached(writer, rows)
  }

  /** Step 2 of the protocol: move every staged partition's data files into
    * the final partition directory under a batch-unique name. The
    * `b<batchId>-` prefix makes a crashed earlier attempt's leftovers
    * identifiable — they are deleted before the move, so a replay lands
    * exactly one copy of the batch no matter where the previous attempt
    * died. Renames are per-file metadata ops (no data copy on HDFS-like
    * stores). */
  private def promote(fs: FileSystem, root: HPath, staging: HPath,
      partCol: String, prefix: String): Unit = {
    for (pdir <- fs.listStatus(staging)
         if pdir.isDirectory && pdir.getPath.getName.startsWith(s"$partCol=")) {
      val dest = new HPath(root, pdir.getPath.getName)
      fs.mkdirs(dest)
      fs.listStatus(dest).iterator
        .filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, false))
      for (f <- fs.listStatus(pdir.getPath)
           if f.isFile && !f.getPath.getName.startsWith(".")
             && !f.getPath.getName.startsWith("_"))
        fs.rename(f.getPath, new HPath(dest, prefix + f.getPath.getName))
    }
  }

  /** Step 3: record the committed batch atomically (write a temp file, then
    * rename — rename is atomic on Hadoop filesystems, so a reader never
    * sees a half-written record). The record body carries the committer
    * watermark AFTER the batch, which `restoredWatermark` replays on
    * restart. */
  private def writeRecord(fs: FileSystem, record: HPath, watermark: Long): Unit = {
    val tmp = new HPath(record.getParent, s".tmp-${record.getName}")
    val out = fs.create(tmp, true)
    try out.write(watermark.toString.getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, record)) fs.delete(tmp, false)
  }

  /** Max watermark across the commit records — the committer state a
    * restarted query resumes from. A record that fails to parse is ignored
    * (its batch's data is durable; only its watermark contribution is lost,
    * which can only DELAY a commit, never duplicate or lose rows). */
  private def restoredWatermark(fs: FileSystem, root: HPath): Long = {
    val dir = new HPath(root, CommitsDir)
    if (!fs.exists(dir)) return Long.MinValue
    fs.listStatus(dir).iterator.filter(_.isFile)
      .filterNot(_.getPath.getName.startsWith("."))
      .map { st =>
        val in = fs.open(st.getPath)
        val body = try {
          val buf = new Array[Byte](32)
          val n = in.read(buf)
          if (n <= 0) "" else new String(buf, 0, n, "UTF-8")
        } finally in.close()
        body.trim.toLongOption.getOrElse(Long.MinValue)
      }.foldLeft(Long.MinValue)(math.max)
  }

  /** Run the success-file policy over every ready, not-yet-committed
    * partition. Idempotent — a partition that already carries `_SUCCESS`
    * is skipped, so replayed batches re-run it harmlessly (the reference's
    * policies are required to be idempotent for exactly this reason). */
  private def commitReady(fs: FileSystem, root: HPath, partCol: String,
      partDurSec: Long, delaySec: Long, watermark: Long): Unit = {
    if (!fs.exists(root)) return
    for (p <- fs.listStatus(root)
         if p.isDirectory && p.getPath.getName.startsWith(s"$partCol=")) {
      // a null partition value writes `=__HIVE_DEFAULT_PARTITION__`;
      // partition-TIME commit has no watermark instant for it, so it
      // stays uncommitted (never crashes the committer) — the
      // reference's partition-time trigger likewise only commits
      // partitions whose name extracts a valid time
      p.getPath.getName.substring(partCol.length + 1).toLongOption.foreach {
        start =>
          val marker = new HPath(p.getPath, "_SUCCESS")
          if (start + partDurSec + delaySec <= watermark && !fs.exists(marker))
            fs.create(marker, false).close()
      }
    }
  }

  /** Read back ONLY the committed partitions — what a downstream Hive/batch
    * consumer honoring `_SUCCESS` sees. The listing is partition-count
    * bounded; the read recovers `partCol` from the directory names and
    * returns it as BIGINT (the declared partition type — directory-name
    * inference would otherwise surface an INT for small epoch values and
    * force every caller to cast). */
  def readCommitted(spark: SparkSession, path: String, partCol: String): DataFrame = {
    val root = new HPath(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed =
      if (!fs.exists(root)) Seq.empty[String]
      else fs.listStatus(root).iterator
        .filter(p => p.isDirectory && p.getPath.getName.startsWith(s"$partCol=") &&
          fs.exists(new HPath(p.getPath, "_SUCCESS")))
        .map(_.getPath.toString).toSeq
    if (committed.isEmpty)
      throw new IllegalStateException(s"no committed partitions under $path")
    spark.read.option("basePath", path).parquet(committed: _*)
      .withColumn(partCol, col(partCol).cast("long"))
  }

  /** q_stream_file_sink: the 1.11 streaming filesystem sink END-TO-END —
    * events stream into day partitions, the committer drops `_SUCCESS`
    * into every partition the final watermark passed, and the result is
    * read back THROUGH the committed-partitions-only reader (the
    * Hive-consumer view). The partition holding the maximum timestamp is
    * still open (its end exceeds the watermark) and must be absent — the
    * oracle replays exactly that visibility rule. */
  val qStreamFileSink: graft.Q = graft.Q(
    "q_stream_file_sink",
    (s, dir) => {
      import s.implicits._
      val path = graft.Tables.scratch(
        s"file-sink/graft_fs-${java.util.UUID.randomUUID()}")
      // day partitions: the typical filesystem-sink granularity (720
      // hour-partitions at sf0.1 would mean 720 dirs for 100k rows — a
      // partition-sizing mistake at any scale)
      val src = StreamingOps.streamTable(s, dir, "events")
        .select($"event_id", $"value", $"ts")
        .withColumn("dy", (floor(unix_seconds($"ts") / 86400) * 86400).cast("long"))
      val ckpt = StreamingOps.freshCheckpoint("file-sink")
      val q = foreachBatchPartitioned(src, path, "dy", 86400L, "ts",
          commitTag = Integer.toHexString(ckpt.hashCode))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      readCommitted(s, path, "dy")
        .select($"event_id", $"value", $"dy")
        .orderBy("event_id")
    },
    Some("""WITH w AS (SELECT max(epoch(ts)) AS wm FROM events)
           |SELECT event_id, value,
           |       CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) AS dy
           |FROM events, w
           |WHERE floor(epoch(ts) / 86400) * 86400 + 86400 <= wm
           |ORDER BY event_id""".stripMargin))

  val all: Seq[graft.Q] = Seq(qStreamFileSink)
}
