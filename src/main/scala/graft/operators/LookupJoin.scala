package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Lookup join — per-record point lookup into an external table (reference
  * StreamExecLookupJoin.scala, runtime operators/join/lookup/
  * LookupJoinRunner.java / AsyncLookupJoinRunner.java).
  *
  * Pattern: mapPartitions with one "connection" opened per partition and
  * per-partition caching — the shape a JDBC/HTTP/KV lookup needs at scale
  * (amortized connection cost, bounded concurrent connections = #partitions).
  * Here the external system is stubbed by a broadcast snapshot of the dim
  * table; a real deployment swaps `LookupConnection` for a client without
  * touching the operator plumbing. When the dim table is small and local,
  * prefer a plain broadcast join (Spark fuses it into the scan stage) — this
  * operator exists for dims that only offer point reads.
  */
object LookupJoin {

  /** Stub connection: point-lookup API over a snapshot. */
  final class LookupConnection(snapshot: Map[Long, String]) {
    var lookups = 0L
    def get(key: Long): Option[String] = { lookups += 1; snapshot.get(key) }
    def close(): Unit = ()
  }

  val qLookupJoin: Q = Q(
    "q_lookup_join",
    (s, dir) => {
      import s.implicits._
      val dim = Tables.t(s, dir, "customer")
        .select($"c_custkey", $"c_name").as[(Long, String)]
        .collect().toMap
      val dimBc = s.sparkContext.broadcast(dim)
      Tables.t(s, dir, "events")
        .select($"event_id", $"user_id").as[(Long, Long)]
        .mapPartitions { it =>
          val conn = new LookupConnection(dimBc.value) // opened once per partition
          it.map { case (eid, uid) => (eid, conn.get(uid).orNull) }
        }
        .toDF("event_id", "c_name")
        .orderBy($"event_id")
    },
    Some("""SELECT event_id, c_name
           |FROM events LEFT JOIN customer ON user_id = c_custkey
           |ORDER BY event_id""".stripMargin))

  val all: Seq[Q] = Seq(qLookupJoin)
}
