package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Console sink + socket source (reference §2.2 sinks row: print sink =
  * PrintSinkFunction, socket source = SocketTextStreamFunction). Both are
  * exercisable without egress: console writes to stdout, the socket source
  * reads from a loopback listener inside the test JVM. */
class ConsoleSocketSpec extends GraftSpec {

  test("console sink (print) runs a micro-batch without error") {
    val sparkS = spark
    import sparkS.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("id", "word")
      .writeStream.format("console").outputMode("append")
      .option("numRows", 5).start()
    mem.addData((1L, "a"), (2L, "b"))
    q.processAllAvailable()
    assert(q.lastProgress != null && q.lastProgress.numInputRows == 2)
    q.stop()
  }

  test("socket source streams lines from a loopback listener") {
    import java.net.ServerSocket
    import java.nio.charset.StandardCharsets
    val server = new ServerSocket(0) // loopback, ephemeral port
    val payload = Seq("alpha", "beta", "gamma")
    val writer = new Thread(() => {
      val sock = server.accept()
      val out = sock.getOutputStream
      payload.foreach(l => out.write((l + "\n").getBytes(StandardCharsets.UTF_8)))
      out.flush()
      // keep the connection open until the query is done reading
      Thread.sleep(5000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()
    val df = spark.readStream.format("socket")
      .option("host", "127.0.0.1").option("port", server.getLocalPort)
      .load()
    val q = df.writeStream.format("memory").queryName("sock_lines")
      .outputMode("append").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("sock_lines").count() < 3 &&
             System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      val got = spark.table("sock_lines").collect().map(_.getString(0)).toSet
      assert(got == payload.toSet, s"got $got")
    } finally {
      q.stop()
      server.close()
    }
  }
}
