package graft

import graft.operators.HiveDialect
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the Hive-dialect translator — randomized CREATE
  * TABLE statements assembled from the grammar's optional clauses must
  * translate into the engine form losslessly: every column (including the
  * appended partition columns) survives, the WITH options parse back to
  * exactly the expected map, and the output is a fixpoint (a second
  * translate returns it unchanged — the door re-enters recursively). */
class HiveDialectPropSpec extends GraftSpec {

  private def holds(p: Prop, n: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(r.passed, r.status.toString)
  }

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val colType: Gen[String] = Gen.oneOf(
    "INT", "BIGINT", "STRING", "DOUBLE", "DECIMAL(10,2)",
    "MAP<STRING,INT>", "ARRAY<DOUBLE>")

  private val colDef: Gen[String] =
    for (n <- ident; t <- colType) yield s"$n $t"

  private val fmt: Gen[String] = Gen.oneOf("PARQUET", "ORC", "TEXTFILE")

  private case class HiveCreate(name: String, cols: List[String],
      parts: List[String], external: Boolean, fmt: Option[String],
      loc: Option[String], props: List[(String, String)]) {
    def sql: String = {
      val sb = new StringBuilder("CREATE ")
      if (external) sb ++= "EXTERNAL "
      sb ++= s"TABLE $name (${cols.mkString(", ")})"
      if (parts.nonEmpty) sb ++= s" PARTITIONED BY (${parts.mkString(", ")})"
      fmt.foreach(f => sb ++= s" STORED AS $f")
      loc.foreach(l => sb ++= s" LOCATION '$l'")
      if (props.nonEmpty)
        sb ++= s" TBLPROPERTIES (${props.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")})"
      sb.toString
    }
  }

  private val hiveCreate: Gen[HiveCreate] = for {
    name <- ident
    cols <- Gen.nonEmptyListOf(colDef).map(_.distinctBy(_.split(" ")(0)))
    parts <- Gen.listOf(colDef).map(_.distinctBy(_.split(" ")(0)).take(2))
    external <- Gen.oneOf(true, false)
    f <- Gen.option(fmt)
    loc <- Gen.option(ident.map(d => s"/tmp/prop/$d"))
    props <- Gen.listOf(for (k <- ident; v <- ident) yield (k.toLowerCase, v))
      .map(_.distinctBy(_._1).take(3))
  } yield HiveCreate(name, cols, parts, external, f, loc,
    // the translator reserves these option keys for the clause lowerings
    props.filterNot(p => Set("path", "format", "comment").contains(p._1)))

  private def wh(n: String) = s"/wh/$n"

  test("CREATE translation is lossless and a fixpoint") {
    holds(Prop.forAll(hiveCreate) { hc =>
      val out = HiveDialect.translate(hc.sql, wh)
      val expectedFormat = hc.fmt match {
        case Some("PARQUET") => "parquet"
        case Some("ORC") => "orc"
        case _ => "csv"
      }
      val opts = graft.streaming.GraftDdl.parseOpts(
        out.substring(out.indexOf("WITH (") + 6).stripSuffix(")"))
      val colsOk = (hc.cols ++ hc.parts).forall(out.contains)
      val partNamesOk = hc.parts.isEmpty ||
        out.contains(s"PARTITIONED BY (${hc.parts.map(_.split(" ")(0)).mkString(", ")})")
      val optsOk =
        opts.get("format").contains(expectedFormat) &&
          opts.get("path").contains(hc.loc.getOrElse(wh(hc.name))) &&
          (opts.get("hive.is-external").contains("true") == hc.external) &&
          hc.props.forall { case (k, v) => opts.get(k).contains(v) }
      val fixpoint = HiveDialect.translate(out, wh) == out
      colsOk && partNamesOk && optsOk && fixpoint
    })
  }

  test("INSERT TABLE-keyword strip touches only the statement head") {
    val select: Gen[String] = for {
      t <- ident
      w <- Gen.option(ident)
    } yield s"SELECT * FROM $t" + w.map(c => s" WHERE $c > 0").getOrElse("")
    holds(Prop.forAll(ident, Gen.oneOf("INTO", "OVERWRITE"), select) { (t, mode, sel) =>
      val out = HiveDialect.translate(s"INSERT $mode TABLE $t $sel", wh)
      out == s"INSERT $mode $t $sel" &&
        HiveDialect.translate(out, wh) == out
    })
  }
}
