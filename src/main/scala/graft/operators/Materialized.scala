package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped materialized intermediates (the signature/feature store).
  *
  * The dedup/similarity family shares expensive derived tables — SimHash
  * signatures, MinHash band keys — that several queries consume. A 100 TB
  * deployment materializes these once (a signature table written by one job,
  * joined by every downstream dedup/cluster/search job) instead of
  * re-hashing the corpus per query; this helper is the single-session
  * analogue: first consumer computes and persists (memory, disk spill),
  * later consumers reuse the same persisted plan.
  *
  * Keyed by (session UUID, logical name) so a fresh session (tests, new
  * driver run) never sees another session's plans; entries owned by stopped
  * sessions are dropped on the next call.
  */
object Materialized {

  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (SparkSession, DataFrame)]()

  private def sessionId(spark: SparkSession): String =
    spark.sparkContext.applicationId + "/" + System.identityHashCode(spark)

  def of(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    // evict plans owned by stopped sessions: their cached blocks died with
    // the context, keeping the refs would only leak plans
    cache.values.removeIf(_._1.sparkContext.isStopped)
    cache.computeIfAbsent((sessionId(spark), key),
      _ => (spark, build.persist(StorageLevel.MEMORY_AND_DISK)))._2
  }

  /** Drop one session's entries (test isolation). */
  def clear(spark: SparkSession): Unit =
    cache.keySet.removeIf { case (sid, _) => sid == sessionId(spark) }
}
