package graft.client

import graft.dsl.GraftTableEnv
import java.io.{BufferedReader, InputStream, InputStreamReader, PrintStream}
import org.apache.spark.sql.SparkSession

/** Minimal interactive SQL client — the reference's terminal front-end
  * (flink-table/flink-sql-client/src/main/java/org/apache/flink/table/
  * client/SqlClient.java:62 bootstraps an executor + CLI;
  * cli/CliClient.java owns the prompt loop, statement termination at `;`,
  * result table rendering, and QUIT/HELP). Everything executes through
  * [[GraftTableEnv.executeSql]] — the same unified door every other entry
  * uses, so the client adds NO second execution path (multi-line
  * statements, SET/RESET session state, EXPLAIN, SHOW, DDL, INSERT with
  * job semantics, and the Flink SQL idioms all behave exactly as in
  * scripts).
  *
  * Differences from the reference, by design:
  *  - results render through TableResult.print() (first 100 rows), not an
  *    interactive pager;
  *  - an INSERT prints the submission notice and then AWAITS the job, so
  *    a scripted `INSERT; SELECT read-back;` session is deterministic
  *    (the reference returns to the prompt while the job runs).
  */
object SqlClient {

  private val Banner =
    """Welcome to the Graft SQL client.
      |Enter statements terminated by ';'. Commands: HELP; QUIT;""".stripMargin

  private val HelpText =
    """Available commands:
      |  HELP;                       print this help
      |  QUIT; / EXIT;               leave the client
      |  SET 'key' = 'value';        set a session property (SET; lists all)
      |  RESET 'key';                unset a session property
      |  any SQL statement;          DDL, DML, queries, SHOW/DESCRIBE/EXPLAIN""".stripMargin

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try runSession(spark, dir, System.in, System.out)
    finally spark.stop()
  }

  /** Split accumulated input into (complete statements, incomplete
    * remainder) — the door's shared lexer (semicolons inside strings AND
    * comments are not terminators), keeping the trailing un-terminated
    * text for the continuation prompt. */
  private[client] def completeStatements(text: String): (Vector[String], String) =
    graft.operators.GraftSql.splitWithRemainder(text)

  /** The CLI loop, parameterized on streams so a spec can drive a scripted
    * session (reference CliClient#open). EOF ends the session like QUIT. */
  def runSession(spark: SparkSession, dir: String,
      in: InputStream, out: PrintStream): Unit = {
    val env = GraftTableEnv(spark, dir)
    val reader = new BufferedReader(new InputStreamReader(in))
    out.println(Banner)
    var buf = ""
    var quit = false
    while (!quit) {
      out.print(if (buf.isEmpty) "Graft SQL> " else "         > ")
      out.flush()
      val line = reader.readLine()
      if (line == null) quit = true
      else {
        buf = if (buf.isEmpty) line else buf + "\n" + line
        val (stmts, rest) = completeStatements(buf)
        buf = rest
        stmts.foreach { st => if (!quit) quit = !execute(env, st, out) }
      }
    }
    out.println("[INFO] Exiting Graft SQL client.")
  }

  /** Execute one statement; returns false when the session should end.
    * Errors print and the loop continues — a typo must not kill the
    * session (CliClient catches per-statement). */
  private def execute(env: GraftTableEnv, stmt: String, out: PrintStream): Boolean =
    stmt.trim.toUpperCase(java.util.Locale.ROOT) match {
      case "QUIT" | "EXIT" => false
      case "HELP" => out.println(HelpText); true
      case _ =>
        try {
          val res = env.executeSql(stmt)
          if (res.hasJobClient) {
            out.println("[INFO] Submitting SQL update statement to the cluster...")
            res.await()
            ()
          }
          if (res.getResultKind == "SUCCESS_WITH_CONTENT")
            Console.withOut(out)(res.print())
          else out.println("[INFO] Execute statement succeed.")
        } catch {
          // NonFatal: an OutOfMemoryError must kill the process, not print
          // an [ERROR] line and keep prompting on a corrupt session
          case scala.util.control.NonFatal(e) =>
            val msg = Option(e.getMessage).getOrElse(e.toString)
            out.println(s"[ERROR] ${msg.linesIterator.take(4).mkString(" | ")}")
        }
        true
    }
}
