package graft

import graft.client.SqlClient
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets

/** Scripted sessions through the SQL client REPL (reference CliClient):
  * prompt loop, multi-line statement termination at `;`, result table
  * printing, SET/RESET session state, per-statement error recovery, and
  * QUIT/EOF exit. */
class SqlClientSpec extends GraftSpec {

  private def session(script: String): String = {
    val in = new ByteArrayInputStream(script.getBytes(StandardCharsets.UTF_8))
    val bout = new ByteArrayOutputStream()
    val out = new PrintStream(bout, true, "UTF-8")
    SqlClient.runSession(spark, sfDir, in, out)
    bout.toString("UTF-8")
  }

  test("a scripted session: query prints a result table, QUIT exits") {
    val out = session(
      "SELECT r_name FROM region ORDER BY r_name;\nQUIT;\n")
    assert(out.contains("Graft SQL>"), out)
    assert(out.contains("r_name"), out)
    assert(out.contains("AFRICA") && out.contains("MIDDLE EAST"), out)
    assert(out.contains("[INFO] Exiting Graft SQL client."), out)
  }

  test("multi-line statements accumulate until the terminating semicolon") {
    val out = session(
      "SELECT count(*) AS n\nFROM nation\nWHERE n_regionkey = 0;\nQUIT;\n")
    // two continuation prompts (lines 2 and 3 of the statement)
    assert("         > ".r.findAllIn(out).length == 2, out)
    assert(out.contains("n"), out)
  }

  test("SET records session state, SET; lists it, RESET unsets — through the door") {
    val out = session(
      "SET 'graft.client.test' = 'on';\nSET;\nRESET 'graft.client.test';\nQUIT;\n")
    assert(out.contains("graft.client.test"), out)
    assert(out.contains("on"), out)
    assert(out.contains("<unset>"), out)
    assert(spark.conf.getOption("graft.client.test").isEmpty)
  }

  test("an error prints and the session continues to the next statement") {
    val out = session(
      "SELECT FROM nowhere_at_all;\nSELECT 1 AS alive;\nQUIT;\n")
    assert(out.contains("[ERROR]"), out)
    assert(out.contains("alive"), out)
    assert(out.indexOf("[ERROR]") < out.indexOf("alive"), out)
  }

  test("HELP prints commands; EOF without QUIT still exits cleanly") {
    val out = session("HELP;\n")
    assert(out.contains("Available commands"), out)
    assert(out.contains("[INFO] Exiting Graft SQL client."), out)
  }

  test("a semicolon inside a string literal does not terminate the statement") {
    val out = session(
      "SELECT 'a;b' AS s;\nQUIT;\n")
    assert(out.contains("a;b"), out)
    assert(!out.contains("[ERROR]"), out)
  }

  test("the Hive dialect composes with the REPL: SET, Hive DDL+DML, read-back, restore") {
    // the reference SQL client's dialect flow (FLIP-123): the SET command
    // flips the parser for subsequent statements of the SAME session
    val path = Tables.scratch(s"hive-repl/${java.util.UUID.randomUUID()}")
    val out = session(
      s"""SET table.sql-dialect = hive;
         |CREATE EXTERNAL TABLE graft_repl_hive (event_id BIGINT, value DOUBLE)
         |PARTITIONED BY (etype STRING)
         |STORED AS PARQUET
         |LOCATION '$path';
         |INSERT OVERWRITE TABLE graft_repl_hive PARTITION (etype = 'click')
         |SELECT event_id, value FROM events WHERE event_type = 'click';
         |SET table.sql-dialect = default;
         |SELECT count(*) AS n FROM parquet.`$path`;
         |QUIT;
         |""".stripMargin)
    assert(!out.contains("[ERROR]"), out)
    assert(out.contains("table.sql-dialect"), out)
    // the final count table printed a positive single-integer row
    assert("(?m)^\\|[1-9]\\d*\\s*\\|$".r.findFirstIn(out).isDefined, out)
    assert(!operators.HiveDialect.isHive(spark),
      "the session script must have restored the default dialect")
  }
}
