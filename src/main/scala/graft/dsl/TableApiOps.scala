package graft.dsl

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Oracle-checked queries driven ENTIRELY through the fluent Table API
  * facade ([[GraftTable]]) — each is the facade twin of a reference
  * Table-API program (Table.java), lowering to the same Catalyst plans the
  * equivalent SQL produces. */
object TableApiOps {

  /** filter → groupBy → select(aggs) → orderBy → fetch (Table.java
    * select/filter/groupBy/orderBy/fetch; the reference's canonical
    * fluent pipeline shape). */
  val qPipeline: Q = Q(
    "q_table_api_pipeline",
    (s, dir) => {
      import s.implicits._
      GraftTable(Tables.t(s, dir, "lineitem"))
        .filter($"l_quantity" > 10)
        .groupBy($"l_returnflag", $"l_linestatus")
        .select(round(sum($"l_extendedprice"), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"revenue".desc, $"l_returnflag", $"l_linestatus")
        .fetch(3)
        .df
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
           |FROM lineitem WHERE l_quantity > 10
           |GROUP BY l_returnflag, l_linestatus
           |ORDER BY revenue DESC, l_returnflag, l_linestatus LIMIT 3""".stripMargin))

  /** window(Tumble over … on … as "w").groupBy("w", …).select(aggs) —
    * GroupWindowedTable (Table.java:1034 + Tumble.java builder chain). */
  val qWindow: Q = Q(
    "q_table_api_window",
    (s, dir) => {
      import s.implicits._
      GraftTable(Tables.t(s, dir, "events"))
        .window(Tumble over "5 minutes" on "ts" as "w")
        .groupBy("w", "event_type")
        .select(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("total"))
        .select(unix_timestamp($"w.start").as("wstart"),
          $"event_type", $"cnt", $"total")
        .orderBy($"wstart", $"event_type")
        .df
    },
    Some("""SELECT CAST(floor(epoch(ts) / 300) * 300 AS BIGINT) AS wstart,
           |       event_type, count(*) AS cnt, round(sum(value), 2) AS total
           |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** minus / intersect / union — the reference's distinct-set semantics
    * (union DEDUPS; Table.java:830/899/865): parts returned-but-never-kept
    * unioned with parts kept-but-never-returned. */
  val qSetOps: Q = Q(
    "q_table_api_setops",
    (s, dir) => {
      import s.implicits._
      def chan(flag: String) = GraftTable(
        Tables.t(s, dir, "lineitem")
          .filter($"l_returnflag" === flag && $"l_quantity" >= 48)
          .select($"l_partkey"))
      chan("R").minus(chan("N"))
        .union(chan("N").minus(chan("R")))
        .orderBy($"l_partkey")
        .df
    },
    Some("""SELECT l_partkey FROM (
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 48
           |  EXCEPT
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N' AND l_quantity >= 48
           |) UNION
           |SELECT l_partkey FROM (
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N' AND l_quantity >= 48
           |  EXCEPT
           |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R' AND l_quantity >= 48
           |) ORDER BY l_partkey""".stripMargin))

  /** joinLateral(explode(…)) + addColumns + renameColumns + dropColumns —
    * the correlate plus schema-manipulation family (Table.java:619/1117/
    * 1207/1241). */
  val qLateral: Q = Q(
    "q_table_api_lateral",
    (s, dir) => {
      import s.implicits._
      GraftTable(Tables.t(s, dir, "documents"))
        .filter($"doc_id" < 20)
        .joinLateral(explode(split($"text", " ")).as("word"))
        .addColumns(length($"word").as("wlen"))
        .groupBy($"doc_id")
        .select(count(lit(1)).as("n_words"), sum($"wlen").as("n_chars"))
        .renameColumns("n_chars" -> "word_chars")
        .dropColumns("n_words")
        .orderBy($"doc_id")
        .df
    },
    Some("""SELECT doc_id, CAST(sum(length(word)) AS BIGINT) AS word_chars FROM (
           |  SELECT doc_id, unnest(string_split(text, ' ')) AS word
           |  FROM documents WHERE doc_id < 20)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** The TableEnvironment round trip (TableEnvironment.java:917/904 +
    * Table.executeInsert:1441): executeSql DDL registers a sink, sqlQuery
    * builds the aggregate, executeInsert deploys it — the reference's
    * canonical three-call program, oracle-reconstructed relationally. */
  val qEnv: Q = Q(
    "q_table_env_e2e",
    (s, dir) => {
      val env = GraftTableEnv(s, dir)
      val sink = graft.Tables.scratch(
        s"table-env-sink/graft_env-${java.util.UUID.randomUUID()}")
      env.executeSql(
        s"""CREATE TABLE graft_env_sink (o_orderpriority STRING, n BIGINT)
           |WITH ('path' = '$sink', 'format' = 'parquet')""".stripMargin)
      env.sqlQuery(
        "SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority")
        .executeInsert("graft_env_sink")
        .df.orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n FROM orders
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** The descriptor chain end-to-end (TableEnvironment.connect() +
    * ConnectTableDescriptor.createTemporaryTable — 1.11's programmatic
    * third registration path): a sink declared via FileSystem()/Parquet()/
    * Schema() builders, deployed into with INSERT, read back. The builders
    * synthesize the CREATE TABLE text and route through the door, so the
    * registration is byte-identical to the DDL path's. */
  val qConnect: Q = Q(
    "q_connect_descriptor",
    (s, dir) => {
      val env = GraftTableEnv(s, dir)
      val sink = graft.Tables.scratch(
        s"connect-desc-sink/graft_desc-${java.util.UUID.randomUUID()}")
      env.connect(FileSystem().path(sink))
        .withFormat(Parquet())
        .withSchema(Schema()
          .field("l_returnflag", "STRING")
          .field("sum_qty", "DOUBLE"))
        .inAppendMode()
        .createTemporaryTable("graft_desc_sink")
      env.executeSql(
        """INSERT INTO graft_desc_sink
          |SELECT l_returnflag, sum(l_quantity) AS sum_qty
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
        .await().df.orderBy("l_returnflag")
    },
    Some("""SELECT l_returnflag, sum(l_quantity) AS sum_qty
           |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** A deployment driven entirely through [[GraftTableResult]] (reference
    * TableResult.java, 1.11's headline API change): DDL acknowledged, the
    * INSERT submitted with job semantics and awaited, and the final answer
    * materialized through the `collect()` row iterator — every step goes
    * through the result object, none through a bare DataFrame. */
  val qTableResult: Q = Q(
    "q_table_result",
    (s, dir) => {
      import s.implicits._
      val env = GraftTableEnv(s, dir)
      val sink = graft.Tables.scratch(
        s"table-result-sink/graft_tr-${java.util.UUID.randomUUID()}")
      val ddl = env.executeSql(
        s"""CREATE TABLE graft_tr_sink (event_type STRING, n BIGINT)
           |WITH ('path' = '$sink', 'format' = 'parquet')""".stripMargin)
      require(ddl.isDone && !ddl.hasJobClient, "DDL executes eagerly")
      val ins = env.executeSql(
        """INSERT INTO graft_tr_sink
          |SELECT event_type, count(*) AS n FROM events GROUP BY event_type""".stripMargin)
      require(ins.hasJobClient, "INSERT is a submitted job")
      ins.await()
      val rows = ins.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      rows.toDF("event_type", "n").orderBy("event_type")
    },
    Some("""SELECT event_type, count(*) AS n FROM events
           |GROUP BY event_type ORDER BY event_type""".stripMargin))

  /** The Kafka dynamic table from the DESCRIPTOR chain (reference
    * descriptors/Kafka.java + KafkaDynamicTableFactory): a topic of
    * JSON-valued records on the file-log broker, registered via
    * connect(Kafka()).withFormat(Json()).withSchema(...), decoded into the
    * declared payload columns and aggregated. The oracle recomputes from
    * `orders` — the JSON value round-trip must be loss-free. */
  val qKafkaTableSource: Q = Q(
    "q_kafka_table_source",
    (s, dir) => {
      import s.implicits._
      // dataset- and fixture-stamped log dir: a committed segment is never
      // rewritten, so the path identity must track the fixture's
      // (KafkaLog.stagedLogDir — the r7 drift-class insurance)
      val logDir = graft.sources.KafkaLog.stagedLogDir("kafka_tbl", dir, "orders")
      val records = graft.Tables.t(s, dir, "orders")
        .select($"o_orderkey".cast("string").as("key"),
          to_json(struct($"o_orderkey", $"o_orderpriority", $"o_totalprice"))
            .as("value"))
      graft.sources.KafkaLog.writeBatch(records, logDir, "orders_json",
        numPartitions = 4, batchId = 0L)
      val env = GraftTableEnv(s, dir)
      env.connect(Kafka().topic("orders_json").logDir(logDir).startFromEarliest())
        .withFormat(Json())
        .withSchema(Schema()
          .field("o_orderkey", "BIGINT")
          .field("o_orderpriority", "STRING")
          .field("o_totalprice", "DOUBLE"))
        .createTemporaryTable("graft_kafka_orders")
      s.table("graft_kafka_orders")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("total"))
        .orderBy("o_orderpriority")
    },
    Some("""SELECT o_orderpriority, count(*) AS n,
           |       round(sum(o_totalprice), 2) AS total
           |FROM orders GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  val all: Seq[Q] =
    Seq(qPipeline, qWindow, qSetOps, qLateral, qEnv, qConnect, qTableResult,
      qKafkaTableSource)
}
