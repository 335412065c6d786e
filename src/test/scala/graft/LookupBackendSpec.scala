package graft

import graft.operators.LookupJoin
import java.nio.file.Files

/** Point-read lookup join against a JDBC-shaped backend: per-partition
  * connection, bounded LRU, missing keys as None. */
class LookupBackendSpec extends GraftSpec {

  test("lookupJoinPointReads resolves keys through a file-backed backend") {
    val sparkS = spark
    import sparkS.implicits._
    val f = Files.createTempFile("dim", ".csv")
    Files.writeString(f, "1,one\n2,two\n3,three\n")
    val path = f.toString
    val probe = spark.createDataset(Seq((100L, 1L), (101L, 2L), (102L, 9L), (103L, 1L)))
    val out = LookupJoin.lookupJoinPointReads(
      probe, () => new LookupJoin.CsvFileBackend(path), cacheCapacity = 2)
      .collect().toMap
    assert(out == Map(100L -> Some("one"), 101L -> Some("two"),
      102L -> None, 103L -> Some("one")))
  }

  test("LRU cache bounds lookups and repeats hit the cache") {
    val backend = new LookupJoin.LookupBackend {
      var calls = 0
      override def get(key: Long): Option[String] = { calls += 1; Some(s"v$key") }
    }
    val cached = new LookupJoin.CachedBackend(backend, capacity = 2)
    cached.get(1); cached.get(1); cached.get(2); cached.get(2)
    assert(backend.calls == 2 && cached.hits == 2)
    cached.get(3) // evicts key 1 (capacity 2, access-ordered)
    cached.get(1)
    assert(backend.calls == 4) // 1 was re-fetched after eviction
  }

  test("AsyncTtlCache: hits don't re-read; TTL expiry does; in-flight shared") {
    import scala.concurrent.Future
    var now = 0L
    val cache = new LookupJoin.AsyncTtlCache(capacity = 10, ttlMillis = 1000L,
      clock = () => now)
    var reads = 0
    def fetch(k: Long) = { reads += 1; Future.successful(Some(s"v$k")) }
    cache.getOrSubmit(1L)(fetch(1L)); cache.getOrSubmit(1L)(fetch(1L))
    assert(reads == 1 && cache.hits == 1 && cache.misses == 1)
    // a pending (never-completed) future is still shared — no herd
    val pending = scala.concurrent.Promise[Option[String]]()
    cache.getOrSubmit(2L)({ reads += 1; pending.future })
    cache.getOrSubmit(2L)({ reads += 1; pending.future })
    assert(reads == 2)
    // TTL expiry forces a re-read
    now = 1500L
    cache.getOrSubmit(1L)(fetch(1L))
    assert(reads == 3 && cache.misses == 3)
  }

  test("AsyncTtlCache: a FAILED load is not memoized; max-rows<=0 bypasses the cache") {
    import scala.concurrent.{Future, Promise}
    var now = 0L
    val cache = new LookupJoin.AsyncTtlCache(capacity = 10, ttlMillis = 60000L,
      clock = () => now)
    var reads = 0
    val failing = Promise[Option[String]]()
    cache.getOrSubmit(9L)({ reads += 1; failing.future })
    failing.failure(new RuntimeException("blip"))
    Thread.sleep(100) // let the eviction callback run
    cache.getOrSubmit(9L)({ reads += 1; Future.successful(Some("ok")) })
    assert(reads == 2, s"failed load stayed memoized: reads=$reads")
    // the reference's -1 = cache disabled normalizes to bypass, not to a
    // negative LRU capacity that would evict in-flight futures
    assert(LookupJoin.lookupOptions(
      Map("lookup.cache.max-rows" -> "-1")).maxRows == 0)
    val off = new LookupJoin.AsyncTtlCache(capacity = 0, ttlMillis = 60000L,
      clock = () => now)
    off.getOrSubmit(1L)(Future.successful(Some("a")))
    off.getOrSubmit(1L)(Future.successful(Some("a")))
    assert(off.misses == 2) // nothing cached — every probe reads
  }

  test("CsvFileBackend tolerates a bare-key line (NULL dim value)") {
    val f = java.nio.file.Files.createTempFile("graft-csv", ".csv")
    java.nio.file.Files.writeString(f, "1,alpha\n2\n3,gamma\n")
    val b = new LookupJoin.CsvFileBackend(f.toString)
    assert(b.get(1L).contains("alpha"))
    assert(b.get(2L).contains("")) // null value survives as empty, no crash
    assert(b.get(3L).contains("gamma"))
  }

  test("lookup.* WITH options parse with reference keys and unit spellings") {
    val o = LookupJoin.lookupOptions(Map(
      "lookup.cache.max-rows" -> "500",
      "lookup.cache.ttl" -> "10 min",
      "lookup.async.capacity" -> "4"))
    assert(o == LookupJoin.LookupOptions(500, 600000L, 4))
    assert(LookupJoin.lookupOptions(Map.empty) ==
      LookupJoin.LookupOptions(10000, 600000L, 8))
    assert(LookupJoin.parseDuration("500ms") == 500L)
    assert(LookupJoin.parseDuration("10 s") == 10000L)
    assert(LookupJoin.parseDuration("2 hours") == 7200000L)
    assert(LookupJoin.parseDuration("250") == 250L)
    intercept[IllegalArgumentException](LookupJoin.parseDuration("soon"))
  }

  test("lookupJoinAsyncCached: cached keys never re-read the backend") {
    val sparkS = spark
    import sparkS.implicits._
    val f = Files.createTempFile("dim-async", ".csv")
    Files.writeString(f, "1,one\n2,two\n")
    val path = f.toString
    LookupBackendSpec.reads.set(0)
    // single partition: the per-partition cache sees all 6 probes
    val probe = spark.createDataset(
      Seq((100L, 1L), (101L, 2L), (102L, 1L), (103L, 9L), (104L, 2L), (105L, 9L)))
      .coalesce(1)
    val out = LookupJoin.lookupJoinAsyncCached(
      probe, () => LookupBackendSpec.countingBackend(path),
      LookupJoin.LookupOptions(maxRows = 100, ttlMillis = 60000L, asyncCapacity = 4))
      .collect().sortBy(_._1)
    assert(out.toSeq == Seq(100L -> Some("one"), 101L -> Some("two"),
      102L -> Some("one"), 103L -> None, 104L -> Some("two"), 105L -> None))
    // 3 distinct keys probed 6 times: exactly 3 backend reads
    assert(LookupBackendSpec.reads.get() == 3)
  }
}

object LookupBackendSpec {
  /** JVM-static read counter: visible across local-mode executor threads. */
  val reads = new java.util.concurrent.atomic.AtomicInteger(0)
  def countingBackend(path: String): LookupJoin.LookupBackend =
    new LookupJoin.LookupBackend {
      private val under = new LookupJoin.CsvFileBackend(path)
      override def get(key: Long): Option[String] = {
        reads.incrementAndGet(); under.get(key)
      }
    }
}
