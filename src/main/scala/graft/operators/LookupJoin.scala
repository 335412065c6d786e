package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Lookup join — per-record point lookup into an external table (reference
  * StreamExecLookupJoin.scala, runtime operators/join/lookup/
  * LookupJoinRunner.java / AsyncLookupJoinRunner.java).
  *
  * Two shapes, chosen by what the dimension side supports:
  *
  *  - Snapshot available (the common case): a plain `broadcast()` left join.
  *    Catalyst fuses it into the probe side's scan stage — no shuffle, no
  *    driver materialization (the broadcast is built executor-side from the
  *    dim scan). This is `q_lookup_join`.
  *
  *  - Point reads only (KV store / JDBC / HTTP backends that cannot hand
  *    over a snapshot): [[lookupJoinPointReads]] — mapPartitions with one
  *    connection per partition and a bounded LRU cache, so connection count
  *    = #partitions and memory is capped regardless of dim cardinality.
  *    Nothing is ever collected to the driver.
  */
object LookupJoin {

  /** Point-read backend SPI — a real deployment implements `get` against
    * its KV/JDBC/HTTP client; opened once per partition. */
  trait LookupBackend extends Serializable {
    def get(key: Long): Option[String]
    def close(): Unit = ()
  }

  /** Bounded LRU over a point-read backend (access-ordered LinkedHashMap). */
  final class CachedBackend(underlying: LookupBackend, capacity: Int) {
    var hits = 0L
    var misses = 0L
    private val cache =
      new java.util.LinkedHashMap[Long, Option[String]](capacity, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Long, Option[String]]): Boolean =
          size() > capacity
      }
    def get(key: Long): Option[String] = {
      val cached = cache.get(key)
      if (cached != null) { hits += 1; cached }
      else {
        misses += 1
        val v = underlying.get(key)
        cache.put(key, v)
        v
      }
    }
  }

  /** Lookup join against a point-read-only backend: one connection + one
    * bounded LRU per partition. `backendFactory` runs on the executor (it
    * must construct the client there — never capture driver-side data). */
  def lookupJoinPointReads(
      probe: Dataset[(Long, Long)],
      backendFactory: () => LookupBackend,
      cacheCapacity: Int = 10000): Dataset[(Long, Option[String])] = {
    val spark = probe.sparkSession
    import spark.implicits._
    probe.mapPartitions { it =>
      val conn = backendFactory()          // opened once per partition
      // close exactly once at task completion — covers early exit (limit/
      // take), task failure, and non-idempotent backend close
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; conn.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val cached = new CachedBackend(conn, cacheCapacity)
      it.map { case (eid, key) => (eid, cached.get(key)) }
    }
  }

  /** Async lookup cache with the reference JDBC connector's semantics
    * (`lookup.cache.max-rows` + `lookup.cache.ttl`,
    * JdbcRowDataLookupFunction.java: a Guava cache in front of the point
    * reads): bounded LRU, per-entry TTL, and FUTURE memoization — an
    * in-flight request for a key is shared by every concurrent probe of
    * that key, so backend reads == cache misses exactly (no thundering
    * herd). `clock` is injectable so TTL expiry is testable without
    * sleeping. Thread-safe: submission happens under the cache lock while
    * the fetch itself runs on the ExecutionContext. */
  final class AsyncTtlCache(capacity: Int, ttlMillis: Long,
      clock: () => Long = () => System.nanoTime() / 1000000L) {
    var hits = 0L
    var misses = 0L
    private val cache = new java.util.LinkedHashMap[
        Long, (scala.concurrent.Future[Option[String]], Long)](
        math.max(capacity, 16), 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[
          Long, (scala.concurrent.Future[Option[String]], Long)]): Boolean =
        size() > capacity
    }
    def getOrSubmit(key: Long)(fetch: => scala.concurrent.Future[Option[String]])
        : scala.concurrent.Future[Option[String]] = synchronized {
      val now = clock()
      val cached = cache.get(key)
      if (cached != null && now - cached._2 < ttlMillis) { hits += 1; cached._1 }
      else {
        misses += 1
        val fut = fetch
        if (capacity > 0) {
          cache.put(key, (fut, now))
          // a FAILED load must not be memoized for the TTL (the reference's
          // Guava cache discards failed loads): evict so the next probe
          // refetches from the (possibly recovered) backend
          fut.failed.foreach { _ =>
            AsyncTtlCache.this.synchronized {
              val cur = cache.get(key)
              if (cur != null && (cur._1 eq fut)) cache.remove(key)
            }
          }(scala.concurrent.ExecutionContext.global)
        }
        fut
      }
    }
  }

  /** Parsed `lookup.*` WITH options, reference keys and defaults
    * (JdbcLookupOptions: max-rows -1 = no cache → here a large default,
    * ttl 10 min, async capacity 8). */
  final case class LookupOptions(maxRows: Int, ttlMillis: Long, asyncCapacity: Int)
  def lookupOptions(opts: Map[String, String]): LookupOptions = LookupOptions(
    // the reference's documented cache-disabled value is -1; a negative
    // capacity would make the LRU evict EVERY entry (including in-flight
    // futures — duplicate backend reads) and crashes LinkedHashMap as an
    // initial capacity, so normalize nonpositive to 0 = bypass
    maxRows = opts.get("lookup.cache.max-rows").map(_.trim.toInt)
      .map(n => math.max(n, 0)).getOrElse(10000),
    ttlMillis = opts.get("lookup.cache.ttl").map(parseDuration).getOrElse(600000L),
    asyncCapacity = opts.get("lookup.async.capacity").map(_.trim.toInt).getOrElse(8))

  /** `"10 s"` / `"500ms"` / `"1 min"` / `"2 h"` → millis (the reference's
    * Duration-typed options accept the same unit spellings). A bare number
    * is millis. */
  private[graft] def parseDuration(s: String): Long = {
    val m = "(?i)^\\s*(\\d+)\\s*(ms|s|sec|seconds?|min|minutes?|h|hours?|d|days?)?\\s*$"
      .r.findFirstMatchIn(s).getOrElse(
        throw new IllegalArgumentException(s"unparseable duration: '$s'"))
    val n = m.group(1).toLong
    Option(m.group(2)).map(_.toLowerCase) match {
      case None | Some("ms") => n
      case Some(u) if u.startsWith("s") => n * 1000L
      case Some(u) if u.startsWith("min") => n * 60000L
      case Some(u) if u.startsWith("h") => n * 3600000L
      case Some(u) if u.startsWith("d") => n * 86400000L
      case Some(u) => throw new IllegalArgumentException(s"unknown unit '$u'")
    }
  }

  /** ASYNC lookup join with a TTL'd LRU cache — the reference's
    * AsyncLookupJoinRunner + JDBC lookup cache composed: per partition, one
    * backend connection, one [[AsyncTtlCache]], and a bounded sliding
    * window of in-flight futures emitted in input order
    * ([[AsyncOps.asyncMapPartitionsWithSetup]], ORDERED mode). Cache hits
    * and in-flight duplicates never touch the backend. Options come from
    * the dim table's WITH() clause via [[lookupOptions]]. */
  def lookupJoinAsyncCached(
      probe: Dataset[(Long, Long)],
      backendFactory: () => LookupBackend,
      opts: LookupOptions,
      // 3 min like the reference's table.exec.async-lookup.timeout default
      // (ExecutionConfigOptions.java) — the r18 1000x rung caught a 30 s
      // default expiring under a cold backend's first-load latency
      timeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration(3, "min")): Dataset[(Long, Option[String])] = {
    val spark = probe.sparkSession
    import spark.implicits._
    AsyncOps.asyncMapPartitionsWithSetup(probe, opts.asyncCapacity, timeout)(() => {
      val conn = backendFactory()
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; conn.close() }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      (conn, new AsyncTtlCache(opts.maxRows, opts.ttlMillis))
    }) { case ((eid, key), (conn, cache), ec) =>
      cache.getOrSubmit(key)(scala.concurrent.Future(conn.get(key))(ec))
        .map(v => (eid, v))(ec)
    }
  }

  /** JDBC-connector-shaped point-read backend over a local key,value CSV —
    * the zero-egress stand-in for the reference's JDBC lookup source
    * (flink-connectors/flink-connector-jdbc/.../JdbcRowDataLookupFunction
    * .java: open a connection per task, point-SELECT per key, LRU cache).
    * `open` loads the file executor-side (the embedded-table case); a real
    * JDBC backend implements the same two methods with a Connection +
    * PreparedStatement and changes nothing else in [[lookupJoinPointReads]]. */
  object CsvFileBackend {
    // ONE dim load per JVM per file, shared by every task/partition — the
    // r18 1000x rung caught the per-instance lazy load building a separate
    // 15M-entry map in EVERY concurrent partition (16 x ~1.5 GB: the heap
    // cost of the embedded stand-in inverting the real connector's cost
    // model, where the data stays DB-side and tasks share a pool). A real
    // JDBC backend shares its connection pool exactly like this shares the
    // table. computeIfAbsent also collapses the 256 concurrent first-loads
    // into one read with everyone else blocking on it (no re-entrancy here,
    // unlike Materialized's derived-entry case).
    private val tables =
      new java.util.concurrent.ConcurrentHashMap[String, Map[Long, String]]()
    private[graft] def load(path: String): Map[Long, String] = {
      // Evict entries whose file is gone BEFORE loading: every invocation of
      // q_lookup_async_cache overwrites the dim dir with a fresh part-file
      // UUID, so keying by absolute path alone accretes one full dim copy
      // per invocation (~1.5 GB each at the 1000x rung) with the dead paths
      // pinned forever — the r18 heap fix re-introduced serially (ADVICE
      // r18). mode("overwrite") deletes the old part file, so file-exists is
      // exactly the liveness test; a real JDBC pool evicts closed
      // connections the same way.
      tables.keys().asIterator().forEachRemaining { p =>
        if (p != path && !new java.io.File(p).exists()) tables.remove(p)
      }
      tables.computeIfAbsent(path, p => {
        val src = scala.io.Source.fromFile(p)
        try src.getLines().map { line =>
          // a NULL dim value writes as a bare key (concat_ws skips nulls) —
          // treat the missing field as empty instead of a MatchError
          line.split(",", 2) match {
            case Array(k, v) => k.trim.toLong -> v
            case Array(k) => k.trim.toLong -> ""
          }
        }.toMap
        finally src.close()
      })
    }
  }

  final class CsvFileBackend(path: String) extends LookupBackend {
    @transient private lazy val table: Map[Long, String] = CsvFileBackend.load(path)
    @volatile var closed = false
    override def get(key: Long): Option[String] = table.get(key)
    override def close(): Unit = closed = true
  }

  /** Snapshot lookup join: the dim is joined via broadcast — built
    * executor-side, never materialized on the driver. */
  val qLookupJoin: Q = Q(
    "q_lookup_join",
    (s, dir) => {
      import s.implicits._
      val dim = Tables.t(s, dir, "customer").select($"c_custkey", $"c_name")
      Tables.t(s, dir, "events")
        .select($"event_id", $"user_id")
        .join(broadcast(dim), $"user_id" === $"c_custkey", "left")
        .select($"event_id", $"c_name")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, c_name
           |FROM events LEFT JOIN customer ON user_id = c_custkey
           |ORDER BY event_id""".stripMargin))

  /** q_lookup_async_cache: the reference's ASYNC lookup join with the JDBC
    * connector's cache options, END-TO-END — the dim is DECLARED through
    * the door with `'connector'='jdbc'` + `lookup.cache.max-rows` /
    * `lookup.cache.ttl` / `lookup.async.capacity` WITH options
    * (JdbcDynamicTableFactory's option set), the runtime reads those
    * options back off the declared table, and every probe row resolves via
    * the per-partition async TTL'd cache over point reads. The dim file is
    * written by Spark (never collected to the driver); the backend loads
    * it executor-side, standing in for a JDBC point-SELECT. */
  val qLookupAsyncCache: Q = Q(
    "q_lookup_async_cache",
    (s, dir) => {
      import s.implicits._
      val dimDir = Tables.scratch("jdbc-dim")
      Tables.t(s, dir, "customer")
        .select(concat_ws(",", $"c_custkey", $"c_name").as("value"))
        .coalesce(1).write.mode("overwrite").text(dimDir)
      val csvFile = new java.io.File(dimDir).listFiles()
        .filter(_.getName.startsWith("part-")).head.getAbsolutePath
      graft.operators.GraftSql.run(s,
        s"""CREATE TABLE graft_jdbc_dim (c_custkey BIGINT, c_name STRING)
           |WITH ('connector' = 'jdbc', 'url' = 'jdbc:graft:file://$csvFile',
           |      'lookup.cache.max-rows' = '500',
           |      'lookup.cache.ttl' = '10 min',
           |      'lookup.async.capacity' = '8')""".stripMargin)
      val opts = lookupOptions(
        graft.streaming.GraftDdl.tableOptions("graft_jdbc_dim").get)
      val probe = Tables.t(s, dir, "events")
        .select($"event_id", $"user_id").as[(Long, Long)]
      lookupJoinAsyncCached(probe, () => new CsvFileBackend(csvFile), opts)
        .toDF("event_id", "c_name")
        .orderBy($"event_id")
    },
    qLookupJoin.oracle) // same join semantics, async-cached execution path

  val all: Seq[Q] = Seq(qLookupJoin, qLookupAsyncCache)
}
