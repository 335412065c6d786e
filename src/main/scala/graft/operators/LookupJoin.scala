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

  /** JDBC-connector-shaped point-read backend over a local key,value CSV —
    * the zero-egress stand-in for the reference's JDBC lookup source
    * (flink-connectors/flink-connector-jdbc/.../JdbcRowDataLookupFunction
    * .java: open a connection per task, point-SELECT per key, LRU cache).
    * `open` loads the file executor-side (the embedded-table case); a real
    * JDBC backend implements the same two methods with a Connection +
    * PreparedStatement and changes nothing else in [[lookupJoinPointReads]]. */
  final class CsvFileBackend(path: String) extends LookupBackend {
    @transient private lazy val table: Map[Long, String] = {
      val src = scala.io.Source.fromFile(path)
      try src.getLines().map { line =>
        val Array(k, v) = line.split(",", 2)
        k.trim.toLong -> v
      }.toMap
      finally src.close()
    }
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

  val all: Seq[Q] = Seq(qLookupJoin)
}
