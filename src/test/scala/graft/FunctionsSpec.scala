package graft

import graft.functions.FlinkFunctions._
import org.apache.spark.sql.functions._

class FunctionsSpec extends GraftSpec {

  test("splitIndex is 0-based and null out of range") {
    import spark.implicits._
    val df = Seq("a,b,c").toDF("s")
    val r = df.select(
      splitIndex($"s", ",", 0), splitIndex($"s", ",", 2), splitIndex($"s", ",", 9)
    ).collect().head
    assert(r.getString(0) == "a" && r.getString(1) == "c" && r.isNullAt(2))
  }

  test("isDigit / isAlpha / isDecimal classify correctly") {
    import spark.implicits._
    val df = Seq(("123", "abc", "-3.5"), ("12a", "ab1", "3.5.5")).toDF("d", "a", "x")
    val rows = df.select(isDigit($"d"), isAlpha($"a"), isDecimal($"x")).collect()
    assert(rows(0).getBoolean(0) && rows(0).getBoolean(1) && rows(0).getBoolean(2))
    assert(!rows(1).getBoolean(0) && !rows(1).getBoolean(1) && !rows(1).getBoolean(2))
  }

  test("hash_code native expression matches JVM String.hashCode") {
    import spark.implicits._
    val samples = Seq("", "a", "hello world", "graft-Engine_42", "ünïcödé")
    val rows = samples.toDF("s")
      .select(graft.functions.FlinkFunctions.hashCode($"s")).collect()
    rows.zip(samples).foreach { case (r, s) =>
      assert(r.getInt(0) == s.hashCode, s"mismatch for '$s'")
    }
  }

  test("hash_code survives whole-stage codegen over a real table") {
    import spark.implicits._
    val df = Tables.t(spark, sfDir, "part")
      .select($"p_name", graft.functions.FlinkFunctions.hashCode($"p_name").as("hc"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getInt(1) == r.getString(0).hashCode))
    // "*(n)" prefix marks a whole-stage-codegen stage containing our expression
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"))
  }

  test("native DotProduct matches the HOF formulation bit-for-bit") {
    import org.apache.spark.sql.graft.VectorFunctions.dotProduct
    import spark.implicits._
    val e = Tables.t(spark, sfDir, "embeddings").limit(50)
      .select($"vec_id", $"embedding")
    val both = e.as("a").crossJoin(e.as("b"))
      .select(
        dotProduct(col("a.embedding"), col("b.embedding")).as("native"),
        expr("""aggregate(
                 zip_with(transform(a.embedding, x -> cast(x as double)),
                          transform(b.embedding, x -> cast(x as double)),
                          (x, y) -> x * y),
                 0d, (acc, x) -> acc + x)""").as("hof"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.length == 2500)
  }

  test("DotProduct null-safety and codegen") {
    import org.apache.spark.sql.graft.VectorFunctions.dotProduct
    import spark.implicits._
    val df = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (None, Some(Array(1.0f)))).toDF("a", "b")
    val rows = df.select(dotProduct($"a", $"b")).collect()
    assert(rows(0).getDouble(0) == 11.0)
    assert(rows(1).isNullAt(0))
  }

  test("native expressions callable from SQL after registration") {
    org.apache.spark.sql.graft.GraftSqlFunctions.register(spark)
    val r = spark.sql(
      """SELECT hash_code('hello world') AS hc,
        |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |       round(cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)), 6) AS cs
        |""".stripMargin).collect().head
    assert(r.getInt(0) == "hello world".hashCode)
    assert(r.getDouble(1) == 11.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("md5Hash31 is stable and within [0, 2^31)") {
    import spark.implicits._
    val r = Seq("hello").toDF("s").select(md5Hash31($"s")).collect().head.getLong(0)
    // first 8 hex of md5("hello") = 5d41402a -> 1564557354 % 2147483647
    assert(r == 1564557354L % 2147483647L)
  }

  test("md5Hash56 is stable, non-negative, and 56 bits wide") {
    import spark.implicits._
    import graft.functions.FlinkFunctions.md5Hash56
    val r = Seq("hello").toDF("s").select(md5Hash56($"s")).collect().head.getLong(0)
    // first 14 hex of md5("hello") = 5d41402abc4b2a
    assert(r == 0x5d41402abc4b2aL)
    val many = Seq.tabulate(64)(i => s"tok$i").toDF("s")
      .select(md5Hash56($"s").as("h"))
      .agg(org.apache.spark.sql.functions.min($"h"),
        org.apache.spark.sql.functions.max($"h")).collect().head
    assert(many.getLong(0) >= 0L && many.getLong(1) < (1L << 56))
  }

  test("sha family matches published known-answer vectors") {
    // reference FlinkSqlOperatorTable SHA1/SHA224/SHA384/SHA512 — DuckDB
    // ships only sha256, so these widths are checked against the NIST
    // known-answer vectors for "abc" instead of an oracle query
    import spark.implicits._
    import org.apache.spark.sql.functions.{sha1, sha2}
    val r = Seq("abc").toDF("s")
      .select(sha1($"s"), sha2($"s", 224), sha2($"s", 384), sha2($"s", 512))
      .collect().head
    assert(r.getString(0) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(1) == "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getString(2) ==
      "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed" +
      "8086072ba1e7cc2358baeca134c825a7")
    assert(r.getString(3) ==
      "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
      "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
  }
}
