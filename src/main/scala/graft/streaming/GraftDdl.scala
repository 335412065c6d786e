package graft.streaming

import org.apache.spark.sql.SparkSession

/** WATERMARK-DDL surface (reference: `CREATE TABLE ... WATERMARK FOR col AS
  * expr`, flink-sql-parser SqlCreateTable.java:56). Spark SQL has no
  * watermark clause, so the DDL maps to: register the streaming source as a
  * temp view with `withWatermark` already applied — downstream `spark.sql`
  * text then queries it exactly like the reference queries a watermarked
  * table.
  */
object GraftDdl {

  /** CREATE [STREAMING] VIEW name AS SELECT * FROM parquet-fixture with
    * WATERMARK FOR tsCol AS tsCol - delay. */
  def createStreamView(spark: SparkSession, dir: String, table: String,
      viewName: String, tsCol: String, delay: String): Unit = {
    StreamingOps.streamTable(spark, dir, table)
      .withWatermark(tsCol, delay)
      .createOrReplaceTempView(viewName)
  }

  private val DdlR =
    ("(?is)CREATE TABLE (\\w+)\\s*\\((?:.*?,)?\\s*WATERMARK FOR (\\w+) AS " +
     "\\2 - INTERVAL '(\\d+)' (SECOND|MINUTE|HOUR|DAY)S?\\s*\\)\\s*" +
     "WITH \\((.*)\\)\\s*;?\\s*").r
  private val OptR = "'([^']+)'\\s*=\\s*'([^']*)'".r

  /** The reference's DDL text surface (flink-sql-parser SqlCreateTable.java:
    * 56): parse `CREATE TABLE name (…, WATERMARK FOR ts AS ts - INTERVAL 'n'
    * UNIT) WITH ('path' = dir, 'table' = fixture)` and register `name` as a
    * watermarked streaming temp view queryable via `spark.sql`. Column
    * definitions before the WATERMARK clause are accepted and ignored — the
    * parquet fixture's schema is authoritative (schema-on-read; the
    * reference validates declared columns against the connector instead).
    * Returns the registered view name. */
  def executeDdl(spark: SparkSession, ddl: String): String = ddl.trim match {
    case DdlR(name, tsCol, n, unit, optsTxt) =>
      val opts = OptR.findAllMatchIn(optsTxt)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      val dir = opts.getOrElse("path",
        throw new IllegalArgumentException("WITH option 'path' is required"))
      val table = opts.getOrElse("table", name)
      createStreamView(spark, dir, table, name, tsCol,
        s"$n ${unit.toLowerCase}s")
      name
    case SinkR(name, cols, optsTxt) if !cols.toUpperCase.contains("WATERMARK") =>
      val opts = OptR.findAllMatchIn(optsTxt)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      val path = opts.getOrElse("path",
        throw new IllegalArgumentException("WITH option 'path' is required"))
      sinks(name.toLowerCase) = SinkDef(path, opts.getOrElse("format", "parquet"))
      name
    case other => throw new IllegalArgumentException(
      s"unparseable DDL (expected CREATE TABLE … WATERMARK FOR … WITH (…)): $other")
  }

  // ---- sink tables (reference: CREATE TABLE without a watermark backed by
  // a writable connector; the INSERT INTO target of SqlToOperationConverter)

  /** A registered sink: where INSERT INTO writes. Column declarations are
    * schema-on-write (the SELECT's schema is authoritative), matching the
    * source-side schema-on-read stance documented above. */
  final case class SinkDef(path: String, format: String)

  // cols may contain parens (DECIMAL(10,2)) — greedy match backtracks to
  // the ')' before WITH
  private val SinkR =
    "(?is)CREATE TABLE (\\w+)\\s*\\((.*)\\)\\s*WITH \\((.*)\\)\\s*;?\\s*".r

  private val sinks = scala.collection.concurrent.TrieMap[String, SinkDef]()

  /** Look up a sink registered by a CREATE TABLE … WITH (…) DDL. */
  def sink(name: String): Option[SinkDef] = sinks.get(name.toLowerCase)

  /** Unregister a sink — the DROP TABLE half of the DDL lifecycle (reference
    * DropTableOperation, SqlCommandParser.java:113). True iff it existed. */
  def dropSink(name: String): Boolean = sinks.remove(name.toLowerCase).isDefined

  /** `ALTER TABLE name SET ('k'='v', …)` on a registered sink (reference
    * SqlAlterTableProperties — 1.11's table-options alter): merge the given
    * options into the SinkDef. True iff the sink existed. */
  def alterSink(name: String, optsTxt: String): Boolean =
    sinks.get(name.toLowerCase) match {
      case Some(sd) =>
        val opts = OptR.findAllMatchIn(optsTxt)
          .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
        sinks(name.toLowerCase) = SinkDef(
          opts.getOrElse("path", sd.path), opts.getOrElse("format", sd.format))
        true
      case None => false
    }

  /** Names of every registered sink; SHOW TABLES merges these with the Spark
    * catalog's views (the reference lists sources and sinks alike — both are
    * catalog tables there). */
  def sinkNames: Seq[String] = sinks.keys.toSeq
}
