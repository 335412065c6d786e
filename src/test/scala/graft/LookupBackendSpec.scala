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
}
