package graft

import graft.sources.CdcFormats
import org.scalacheck.Gen
import org.apache.spark.sql.types._

/** Property test: the debezium/canal decoders invert a serialized change
  * stream — for ANY random sequence of typed changes, envelope-serializing
  * with to_json and decoding yields exactly the reference's kind sequence
  * and row images (nulls, negatives, empty strings, unicode included). */
class CdcPropSpec extends GraftSpec {

  private val payload = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType)))

  // a row image; name may be null/empty/unicode, price negative or zero —
  // doubles kept to values whose JSON round-trip is exact
  private case class Img(id: Long, name: Option[String], price: Double)
  private val img: Gen[Img] = for {
    id <- Gen.chooseNum(-5L, 1000L)
    name <- Gen.option(Gen.oneOf("", "a b", "späté", "x'y\"z", "plain"))
    price <- Gen.chooseNum(-4000, 4000).map(_ / 8.0) // exact in binary
  } yield Img(id, name, price)

  private sealed trait Chg
  private case class Ins(a: Img) extends Chg
  private case class Upd(b: Img, a: Img) extends Chg
  private case class Del(b: Img) extends Chg
  private val chg: Gen[Chg] = Gen.frequency(
    3 -> img.map(Ins(_)),
    2 -> (for { b <- img; a <- img } yield Upd(b, a)),
    1 -> img.map(Del(_)))

  private def jsonImg(i: Img): String = {
    val n = i.name.map(s => "\"" + s.replace("\\", "\\\\")
      .replace("\"", "\\\"") + "\"").getOrElse("null")
    s"""{"id":${i.id},"name":$n,"price":${i.price}}"""
  }

  private def expected(c: Chg): Seq[(String, Img)] = c match {
    case Ins(a) => Seq("+I" -> a)
    case Upd(b, a) => Seq("-U" -> b, "+U" -> a)
    case Del(b) => Seq("-D" -> b)
  }

  test("debezium decode inverts serialization for random change streams") {
    val sparkS = spark
    import sparkS.implicits._
    val changes = Gen.listOfN(120, chg).sample.get
    val lines = changes.map {
      case Ins(a) => s"""{"before":null,"after":${jsonImg(a)},"op":"c"}"""
      case Upd(b, a) => s"""{"before":${jsonImg(b)},"after":${jsonImg(a)},"op":"u"}"""
      case Del(b) => s"""{"before":${jsonImg(b)},"after":null,"op":"d"}"""
    }
    val out = CdcFormats.debezium(lines.toDF("value"), payload).collect()
      .map(r => (r.getString(0),
        Img(r.getLong(1), Option(r.getString(2)), r.getDouble(3))))
    assert(out.toSeq == changes.flatMap(expected))
  }

  test("canal decode inverts serialization for random change streams") {
    val sparkS = spark
    import sparkS.implicits._
    val changes = Gen.listOfN(80, chg).sample.get
    val lines = changes.map {
      case Ins(a) =>
        s"""{"data":[${jsonImg(a)}],"old":null,"type":"INSERT"}"""
      case Upd(b, a) =>
        // full old image (partial-old merge is covered in CdcFormatsSpec)
        s"""{"data":[${jsonImg(a)}],"old":[${jsonImg(b)}],"type":"UPDATE"}"""
      case Del(b) =>
        s"""{"data":[${jsonImg(b)}],"old":null,"type":"DELETE"}"""
    }
    val out = CdcFormats.canal(lines.toDF("value"), payload).collect()
      .map(r => (r.getString(0),
        Img(r.getLong(1), Option(r.getString(2)), r.getDouble(3))))
    // canal UPDATE merges null old fields from the NEW row: a null name in
    // the before image decodes as the after image's name
    val expect = changes.flatMap {
      case Upd(b, a) if b.name.isEmpty =>
        Seq("-U" -> b.copy(name = a.name), "+U" -> a)
      case c => expected(c)
    }
    assert(out.toSeq == expect)
  }
}
