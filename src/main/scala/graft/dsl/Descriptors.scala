package graft.dsl

/** The descriptor / `connect()` API — 1.11's programmatic THIRD way to
  * register tables, alongside DDL text and `from()` (reference
  * flink-table/flink-table-api-java/src/main/java/org/apache/flink/table/
  * descriptors/ConnectTableDescriptor.java + FileSystem.java, Csv.java,
  * Json.java, Schema.java, Rowtime.java; entry
  * TableEnvironment.connect():  deprecated in 1.11 but present and widely
  * used).
  *
  * Spark-first lowering: the builders collect exactly the options the
  * equivalent DDL would carry, and `createTemporaryTable` SYNTHESIZES the
  * `CREATE TABLE … WITH (…)` text, routed through the unified SQL door —
  * the same single registration path DDL and the Table API use (watermarked
  * sources become streaming views, plain tables become registered sinks,
  * and a current persistent catalog records the definition). No second
  * execution path exists, mirroring the reference where descriptors
  * resolve to the same CatalogTable the DDL produces. */

/** Connector half of the chain (reference ConnectorDescriptor.java). */
sealed trait ConnectorDescriptor { def options: Map[String, String] }

/** `new FileSystem().path(…)` (reference descriptors/FileSystem.java).
  * For a watermarked SOURCE the path is the fixture directory and `table`
  * names the parquet stem (the engine's schema-on-read posture); for a
  * sink the path is the write target. */
final case class FileSystem(
    pathOpt: Option[String] = None,
    tableOpt: Option[String] = None) extends ConnectorDescriptor {
  def path(v: String): FileSystem = copy(pathOpt = Some(v))
  /** Engine extension: name the source table under `path` (parquet stem). */
  def table(v: String): FileSystem = copy(tableOpt = Some(v))
  def options: Map[String, String] =
    pathOpt.map("path" -> _).toMap ++ tableOpt.map("table" -> _)
}

/** `new Kafka().topic(…)` (reference descriptors/Kafka.java — the
  * connect() form of the Kafka connector). The file-log base dir stands in
  * for `property("bootstrap.servers", …)` in the zero-egress environment
  * (sources/KafkaLog documents the contract); `startFromEarliest()` is the
  * one startup mode a bounded log replay honors; `streamingScan()` (engine
  * extension) tails new segments instead of a bounded read. */
final case class Kafka(
    topicOpt: Option[String] = None,
    logDirOpt: Option[String] = None,
    streaming: Boolean = false) extends ConnectorDescriptor {
  def topic(t: String): Kafka = copy(topicOpt = Some(t))
  def logDir(d: String): Kafka = copy(logDirOpt = Some(d))
  def startFromEarliest(): Kafka = this
  def streamingScan(): Kafka = copy(streaming = true)
  def options: Map[String, String] =
    Map("connector" -> "kafka") ++ topicOpt.map("topic" -> _) ++
      logDirOpt.map("path" -> _) ++
      (if (streaming) Map("scan.mode" -> "streaming") else Map.empty)
}

/** Format half (reference FormatDescriptor.java). */
sealed trait FormatDescriptor { def options: Map[String, String] }

/** reference descriptors/Csv.java — the 1.11 RFC-compliant CSV format. */
final case class Csv(delimOpt: Option[String] = None) extends FormatDescriptor {
  def fieldDelimiter(d: String): Csv = copy(delimOpt = Some(d))
  def options: Map[String, String] =
    Map("format" -> "csv") ++ delimOpt.map("csv.field-delimiter" -> _)
}

/** reference descriptors/Json.java. */
final case class Json() extends FormatDescriptor {
  def options: Map[String, String] = Map("format" -> "json")
}

/** The engine's native columnar batch format (the reference's filesystem
  * connector pairs with its own format set; parquet is this engine's). */
final case class Parquet() extends FormatDescriptor {
  def options: Map[String, String] = Map("format" -> "parquet")
}

/** reference descriptors/Rowtime.java — event-time attribute + watermark
  * strategy for a schema field. */
final case class Rowtime(
    fieldOpt: Option[String] = None,
    boundedMsOpt: Option[Long] = None) {
  def timestampsFromField(f: String): Rowtime = copy(fieldOpt = Some(f))
  def watermarksPeriodicBounded(delayMs: Long): Rowtime =
    copy(boundedMsOpt = Some(delayMs))
}

/** reference descriptors/Schema.java — declared fields plus an optional
  * rowtime attribute. Fields use Spark DDL type names (INT, STRING,
  * TIMESTAMP, …) — the engine's schema language, as the reference's used
  * TypeInformation/DataTypes. */
final case class Schema(
    fields: Vector[(String, String)] = Vector.empty,
    rowtimeOpt: Option[Rowtime] = None) {
  def field(name: String, ddlType: String): Schema =
    copy(fields = fields :+ (name -> ddlType))
  def rowtime(rt: Rowtime): Schema = copy(rowtimeOpt = Some(rt))
}

/** The builder state `connect()` returns (reference
  * ConnectTableDescriptor.java: withFormat → withSchema →
  * createTemporaryTable). */
final case class ConnectTableDescriptor(
    env: GraftTableEnv,
    connector: ConnectorDescriptor,
    format: Option[FormatDescriptor] = None,
    schema: Option[Schema] = None) {

  def withFormat(f: FormatDescriptor): ConnectTableDescriptor =
    copy(format = Some(f))
  def withSchema(s: Schema): ConnectTableDescriptor = copy(schema = Some(s))
  /** 1.11's update-mode markers are accepted for API parity; the engine's
    * door derives the mode from the registered object itself (a
    * watermarked source streams, a sink appends/overwrites per statement) —
    * the same place the reference's planner decides it. */
  def inAppendMode(): ConnectTableDescriptor = this

  /** Synthesize the CREATE TABLE text and register through the door
    * (reference ConnectTableDescriptor.createTemporaryTable → catalog
    * registration of the resolved CatalogTable). */
  def createTemporaryTable(name: String): Unit = {
    require(name.matches("\\w+"),
      s"createTemporaryTable: '$name' is not a valid table identifier")
    val sch = schema.getOrElse(throw new IllegalArgumentException(
      s"connect(...).createTemporaryTable($name): withSchema(...) is required"))
    require(sch.fields.nonEmpty,
      s"createTemporaryTable($name): the schema declares no fields")
    val wmClause = sch.rowtimeOpt.map { rt =>
      val f = rt.fieldOpt.getOrElse(throw new IllegalArgumentException(
        "Rowtime needs timestampsFromField(...)"))
      require(sch.fields.exists(_._1.equalsIgnoreCase(f)),
        s"Rowtime.timestampsFromField($f): no such field in the schema " +
          s"(declared: ${sch.fields.map(_._1).mkString(", ")})")
      val delayMs = rt.boundedMsOpt.getOrElse(0L)
      require(delayMs % 1000 == 0,
        s"watermarksPeriodicBounded($delayMs): sub-second bounds are not " +
          "expressible in the engine's INTERVAL 'n' SECOND watermark DDL")
      s", WATERMARK FOR $f AS $f - INTERVAL '${delayMs / 1000}' SECOND"
    }.getOrElse("")
    val cols = sch.fields.map { case (n, t) => s"$n $t" }.mkString(", ")
    val opts = connector.options ++ format.map(_.options).getOrElse(Map.empty)
    require(opts.contains("path"),
      s"createTemporaryTable($name): the connector declares no path")
    // the engine's option grammar ('k' = 'v', parsed without ''-escapes)
    // cannot carry embedded single quotes — reject them HERE with the
    // descriptor named, instead of synthesizing DDL that misparses
    opts.foreach { case (k, v) =>
      require(!v.contains("'"),
        s"createTemporaryTable($name): option '$k' value contains a single " +
          s"quote, which the WITH-options grammar cannot carry: $v")
    }
    val optsSql = opts.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
    env.executeSql(s"CREATE TABLE $name ($cols$wmClause) WITH ($optsSql)")
    ()
  }
}
