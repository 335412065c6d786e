package graft.sources

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's UTILITY connectors (1.11 in-tree factories):
  *
  *  - `datagen` source — DataGenTableSourceFactory.java:62 (option keys
  *    `rows-per-second`, `fields.<name>.kind` = random (default) |
  *    sequence, `start`/`end` for sequences, `min`/`max`/`length` for
  *    random);
  *  - `print` sink — PrintTableSinkFactory.java (per-row print on the
  *    TASK side, not the driver);
  *  - `blackhole` sink — BlackHoleTableSinkFactory.java (discard).
  *
  * Spark-first mapping: a bounded datagen (any sequence field — the
  * reference's sequence generators exhaust and end the source) is
  * `spark.range` with generator expressions, fully codegen'd and
  * partitioned like any relation; an unbounded all-random datagen is the
  * `rate` streaming source at `rows-per-second` with the same generator
  * expressions over the tick counter. `print` writes with executor-side
  * println via foreachPartition (the reference prints to taskmanager
  * stdout, NOT the client); `blackhole` is Spark's `noop` write format.
  */
object DataGen {

  private def opt(opts: Map[String, String], field: String, key: String): Option[String] =
    opts.get(s"fields.$field.$key")

  /** Generator expression for one declared field over a long row-index
    * column `n` (sequence position / rate tick). Semantics and defaults
    * follow DataGenTableSourceFactory.createDataGenerator. */
  private def gen(f: StructField, opts: Map[String, String], n: Column): Column = {
    def num(key: String, dflt: Double): Double =
      opt(opts, f.name, key).map(_.toDouble).getOrElse(dflt)
    opt(opts, f.name, "kind").getOrElse("random") match {
      case "sequence" =>
        val start = opt(opts, f.name, "start").getOrElse(throw new IllegalArgumentException(
          s"Could not find required property 'fields.${f.name}.start' for sequence generator."))
        (lit(start.toLong) + n).cast(f.dataType)
      case "random" => f.dataType match {
        case BooleanType => rand() < 0.5
        case StringType | _: VarcharType | _: CharType =>
          val len = num("length", 100).toInt
          // random alphanumerics from repeated uuids, cut to length
          substring(regexp_replace(
            concat_ws("", (0 until (len / 32 + 1)).map(_ => expr("uuid()")): _*),
            "-", ""), 1, len)
        case ByteType => (lit(num("min", Byte.MinValue)) +
          rand() * (num("max", Byte.MaxValue) - num("min", Byte.MinValue))).cast(ByteType)
        case ShortType => (lit(num("min", Short.MinValue)) +
          rand() * (num("max", Short.MaxValue) - num("min", Short.MinValue))).cast(ShortType)
        case IntegerType => (lit(num("min", Int.MinValue)) +
          rand() * (num("max", Int.MaxValue).toDouble - num("min", Int.MinValue))).cast(IntegerType)
        case LongType => (lit(num("min", Long.MinValue)) +
          rand() * (num("max", Long.MaxValue).toDouble - num("min", Long.MinValue))).cast(LongType)
        case FloatType => (lit(num("min", java.lang.Float.MIN_VALUE)) +
          rand() * (num("max", Float.MaxValue) - num("min", java.lang.Float.MIN_VALUE))).cast(FloatType)
        // reference default = [Double.MIN_VALUE, Double.MAX_VALUE]
        // (DataGenTableSourceFactory.java:160 — Java MIN_VALUE is the
        // smallest POSITIVE double, a documented reference quirk that keeps
        // defaults consistent with the FLOAT case above)
        case DoubleType => lit(num("min", java.lang.Double.MIN_VALUE)) +
          rand() * (num("max", Double.MaxValue) - num("min", java.lang.Double.MIN_VALUE))
        case TimestampType => current_timestamp() // reference: now-based
        case other => throw new IllegalArgumentException(
          s"datagen: unsupported random type ${other.simpleString} for field ${f.name}")
      }
      case other => throw new IllegalArgumentException(
        s"Unsupported generator type: $other")
    }
  }

  /** Build the datagen relation for a declared schema. Bounded (batch
    * `spark.range`) iff any field is a sequence — row count is the
    * SHORTEST sequence length, matching the reference source ending when
    * a sequence generator exhausts; otherwise an unbounded rate-source
    * stream at `rows-per-second` (default 10000, the reference default). */
  def relation(spark: SparkSession, schema: StructType,
      opts: Map[String, String]): DataFrame = {
    val seqLens = schema.fields.flatMap { f =>
      if (opt(opts, f.name, "kind").contains("sequence")) {
        val start = opt(opts, f.name, "start").getOrElse(throw new IllegalArgumentException(
          s"Could not find required property 'fields.${f.name}.start' for sequence generator."))
        val end = opt(opts, f.name, "end").getOrElse(throw new IllegalArgumentException(
          s"Could not find required property 'fields.${f.name}.end' for sequence generator."))
        Some(end.toLong - start.toLong + 1)
      } else None
    }
    val base =
      if (seqLens.nonEmpty) spark.range(seqLens.min).toDF("__n")
      else {
        val rps = opts.getOrElse("rows-per-second", "10000")
        spark.readStream.format("rate").option("rowsPerSecond", rps).load()
          .select(col("value").as("__n"))
      }
    base.select(schema.fields.toSeq.map(f => gen(f, opts, col("__n")).as(f.name)): _*)
  }

  /** q_datagen: a bounded sequence+random datagen through the SQL door —
    * the deterministic (sequence) column is oracle-compared; the random
    * column is certified by its [min,max) contract (a count, so the
    * oracle can state it relationally). */
  val qDataGen: Q = Q(
    "q_datagen",
    (s, dir) => {
      import graft.operators.GraftSql
      GraftSql.run(s,
        """CREATE TABLE graft_gen (
          |  id BIGINT, v DOUBLE
          |) WITH ('connector' = 'datagen',
          |        'fields.id.kind' = 'sequence',
          |        'fields.id.start' = '1', 'fields.id.end' = '500',
          |        'fields.v.min' = '2', 'fields.v.max' = '3')""".stripMargin)
      GraftSql.run(s,
        """SELECT id, CAST(SUM(CASE WHEN v >= 2 AND v < 3 THEN 1 ELSE 0 END) AS BIGINT)
          |         AS in_range
          |FROM graft_gen GROUP BY id ORDER BY id""".stripMargin)
    },
    Some("""SELECT range AS id, CAST(1 AS BIGINT) AS in_range
           |FROM range(1, 501) ORDER BY id""".stripMargin))

  val all: Seq[Q] = Seq(qDataGen)
}
