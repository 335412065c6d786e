package graft.streaming

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** PERSISTENT catalog for the DDL surface — the durability property of the
  * reference's catalog interface (flink-table/flink-table-common/src/main/
  * java/org/apache/flink/table/catalog/Catalog.java; HiveCatalog persists
  * table metadata across sessions, GenericInMemoryCatalog does not): table
  * definitions registered through this object survive the session and are
  * replayed into any later one.
  *
  * Design: the catalog stores the DDL TEXT, not a materialized schema — one
  * `<name>.ddl` file per object under `catalogDir`, last definition wins
  * (CREATE OR REPLACE semantics, like the reference's
  * `Catalog.createTable(..., ignoreIfExists)` overwrite path). `restore`
  * replays every stored DDL through [[GraftDdl.executeDdl]], re-registering
  * watermarked streaming sources and INSERT sinks in the target session.
  * Text-replay is the honest in-container analogue of a metastore: the
  * parquet fixtures are schema-authoritative (schema-on-read, documented in
  * GraftDdl), so the DDL text IS the complete metadata.
  *
  * Writes are atomic (temp file + ATOMIC_MOVE with copy fallback) so a
  * concurrent reader never sees a torn definition — the same durability
  * discipline as [[IterateStream.moveParts]].
  */
object GraftCatalog {

  private def fileFor(catalogDir: String, name: String): Path =
    Paths.get(catalogDir, s"${name.toLowerCase}.ddl")

  /** Execute `ddl` in `spark` AND durably record it under `catalogDir`.
    * Returns the registered object name. */
  def executeDdl(spark: SparkSession, catalogDir: String, ddl: String): String = {
    val name = GraftDdl.executeDdl(spark, ddl) // validate + register first;
                                               // an unparseable DDL is never persisted
    Files.createDirectories(Paths.get(catalogDir))
    val target = fileFor(catalogDir, name)
    val tmp = Files.createTempFile(Paths.get(catalogDir), s".$name", ".tmp")
    Files.writeString(tmp, ddl)
    try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch {
      case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING)
    }
    name
  }

  /** Replay every stored DDL into `spark` (alphabetical order — definitions
    * are independent: sources bind fixtures, sinks bind paths). Returns the
    * restored object names. A directory that does not exist restores
    * nothing — a fresh deployment, not an error. */
  def restore(spark: SparkSession, catalogDir: String): Seq[String] = {
    val dir = Paths.get(catalogDir)
    if (!Files.isDirectory(dir)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val ls = Files.list(dir)
    val files =
      try ls.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".ddl")).toSeq
      finally ls.close()
    files.sortBy(_.getFileName.toString).map { f =>
      GraftDdl.executeDdl(spark, Files.readString(f))
    }
  }

  /** Remove an object's stored definition (the reference's
    * `Catalog.dropTable`). True iff something was dropped. Session temp
    * views are untouched — like the reference, dropping from the catalog
    * does not kill queries already planned against the table. */
  def drop(catalogDir: String, name: String): Boolean =
    Files.deleteIfExists(fileFor(catalogDir, name))
}
