package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Fluent Table API facade — the reference's OTHER user surface besides SQL
  * text and the DataStream DSL (flink-table-api-java/.../Table.java; SURVEY
  * §3.2). Spark `Column`s stand in for the reference's `Expression` DSL
  * (its `$("a")` ≡ `col("a")`), and every method lowers to the DataFrame
  * call whose Catalyst plan the equivalent SQL would produce — the facade
  * adds NO execution machinery, exactly like the reference's Table API,
  * which is a thin builder over the same planner as its SQL.
  *
  * Method ↔ reference mapping (Table.java line numbers):
  * select:128, as:186, filter:248, where:286, groupBy:324, distinct:337,
  * join:356/400, leftOuterJoin:464, rightOuterJoin:510, fullOuterJoin:556,
  * joinLateral:619, leftOuterJoinLateral:747, minus:830, minusAll:849,
  * union:865 (distinct semantics!), unionAll:881, intersect:899,
  * intersectAll:917, orderBy:955, offset:976, fetch:997,
  * window(GroupWindow):1034 (Tumble.java/Slide.java/Session.java builders),
  * window(OverWindow):1072 (Over.java — exposed as Spark's native
  * WindowSpec via [[Over]]), addColumns:1117, addOrReplaceColumns:1163,
  * renameColumns:1207, dropColumns:1241, map:1282, flatMap:1323,
  * createTemporalTableFunction:151 (delegates to
  * [[graft.operators.TemporalFunction]]). `aggregate:1369` is `groupBy(…)
  * .select(aggs…)`; `flatAggregate:1413` (UDTAF) is the
  * flatMapSortedGroups operator behind `q_table_agg` — typed, so it lives
  * on the Dataset DSL, not this untyped facade.
  *
  * Deliberate deviations, documented: `GraftGroupedTable.select` always
  * emits the grouping keys before the aggregates (the reference makes you
  * list them; auto-including them loses nothing and keeps the call
  * variadic-safe), and `renameColumns`/`addOrReplaceColumns` take
  * `(from -> to)` / `(name, expr)` pairs because Spark 4's Column no
  * longer exposes alias introspection.
  */
final case class GraftTable(df: DataFrame) {
  def select(fields: Column*): GraftTable = GraftTable(df.select(fields: _*))
  def as(fields: String*): GraftTable = GraftTable(df.toDF(fields: _*))
  def filter(predicate: Column): GraftTable = GraftTable(df.filter(predicate))
  def where(predicate: Column): GraftTable = filter(predicate)
  def distinct(): GraftTable = GraftTable(df.distinct())

  def groupBy(fields: Column*): GraftGroupedTable = GraftGroupedTable(df, fields)

  /** Predicate-less join = cross (the reference requires a subsequent
    * `.where` on streams for exactly this reason). */
  def join(right: GraftTable): GraftTable = GraftTable(df.crossJoin(right.df))
  def join(right: GraftTable, predicate: Column): GraftTable =
    GraftTable(df.join(right.df, predicate, "inner"))
  def leftOuterJoin(right: GraftTable, predicate: Column): GraftTable =
    GraftTable(df.join(right.df, predicate, "left"))
  def rightOuterJoin(right: GraftTable, predicate: Column): GraftTable =
    GraftTable(df.join(right.df, predicate, "right"))
  def fullOuterJoin(right: GraftTable, predicate: Column): GraftTable =
    GraftTable(df.join(right.df, predicate, "full"))

  /** Correlate with a table-function call — pass the GENERATOR column
    * (`explode(...)`, `posexplode(...)`, `json_tuple(...)`) aliased to the
    * output field(s); every input row fans out to its generated rows. */
  def joinLateral(tableFunctionCall: Column): GraftTable =
    GraftTable(df.select(col("*"), tableFunctionCall))
  /** Outer correlate — pass the `_outer` generator variant
    * (`explode_outer`, …) so empty fan-outs keep the row with NULLs,
    * matching the reference's leftOuterJoinLateral contract. */
  def leftOuterJoinLateral(tableFunctionCall: Column): GraftTable =
    GraftTable(df.select(col("*"), tableFunctionCall))

  def minus(right: GraftTable): GraftTable = GraftTable(df.except(right.df))
  def minusAll(right: GraftTable): GraftTable = GraftTable(df.exceptAll(right.df))
  /** Reference `union` = SQL UNION (dedups); `unionAll` keeps duplicates. */
  def union(right: GraftTable): GraftTable = GraftTable(df.union(right.df).distinct())
  def unionAll(right: GraftTable): GraftTable = GraftTable(df.union(right.df))
  def intersect(right: GraftTable): GraftTable = GraftTable(df.intersect(right.df))
  def intersectAll(right: GraftTable): GraftTable = GraftTable(df.intersectAll(right.df))

  def orderBy(fields: Column*): GraftTable = GraftTable(df.orderBy(fields: _*))
  def offset(n: Int): GraftTable = GraftTable(df.offset(n))
  def fetch(n: Int): GraftTable = GraftTable(df.limit(n))

  def addColumns(fields: Column*): GraftTable =
    GraftTable(df.select(col("*") +: fields: _*))
  def addOrReplaceColumns(fields: (String, Column)*): GraftTable =
    GraftTable(fields.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) })
  def renameColumns(renames: (String, String)*): GraftTable =
    GraftTable(renames.foldLeft(df) { case (d, (from, to)) => d.withColumnRenamed(from, to) })
  def dropColumns(fields: String*): GraftTable = GraftTable(df.drop(fields: _*))

  /** Row-based map (FLIP-29): a full-row projection. */
  def map(fields: Column*): GraftTable = GraftTable(df.select(fields: _*))
  /** Row-based flatMap: keep ONLY the generator's output. */
  def flatMap(tableFunctionCall: Column): GraftTable =
    GraftTable(df.select(tableFunctionCall))

  /** Group-window entry: `window(Tumble over "1 hour" on "ts" as "w")
    * .groupBy("w", keys...).select(aggs...)`. */
  def window(w: GroupWindow): GraftWindowedTable = GraftWindowedTable(df, w)

  /** Register this table as a temporal table function (reference
    * Table.createTemporalTableFunction:151) usable from the SQL door's
    * `LATERAL TABLE (name(o.ts))` and the Table-API correlate. */
  def createTemporalTableFunction(name: String, timeAttribute: String,
      primaryKey: String): Unit =
    graft.operators.TemporalFunction
      .createTemporalTableFunction(name, df, timeAttribute, primaryKey)

  /** Write this table into a REGISTERED sink (reference
    * Table.executeInsert:1441/insertInto:1015 — FLIP-84's deployment call):
    * routes through the door's INSERT machinery, so PK-upsert sinks,
    * partition-commit sinks and utility connectors all behave exactly as
    * the SQL statement would. Returns a [[GraftTableResult]] — in 1.11
    * executeInsert is a SUBMITTED job with a JobClient (TableResult.java),
    * so the deployment runs async; `await()`/`.df` join it. The staging
    * view is dropped inside the submitted body, after the door has read
    * it. */
  def executeInsert(tablePath: String, overwrite: Boolean = false): GraftTableResult = {
    val spark = df.sparkSession
    val tmp = s"graft_tbl_ins_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(tmp)
    GraftTableResult.submit(spark) {
      try graft.operators.GraftSql.run(spark,
        s"INSERT ${if (overwrite) "OVERWRITE" else "INTO"} $tablePath SELECT * FROM $tmp")
      finally spark.catalog.dropTempView(tmp)
    }
  }
  def insertInto(tablePath: String): GraftTableResult = executeInsert(tablePath)
}

/** Result of [[GraftTable.groupBy]]; `select`/`aggregate` emit the keys
  * followed by the aggregate expressions (reference GroupedTable). */
final case class GraftGroupedTable(df: DataFrame, keys: Seq[Column]) {
  def select(aggs: Column*): GraftTable =
    GraftTable(df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*))
  def aggregate(aggs: Column*): GraftTable = select(aggs: _*)
}

/** Group-window descriptors (reference Tumble.java:43 `Tumble.over(size)
  * .on(time).as(alias)`, Slide.java:51 `.over(size).every(slide)`,
  * Session.java:47 `.withGap(gap)`); sizes are Spark interval strings. */
sealed trait GroupWindow {
  def timeField: String
  def alias: String
  private[dsl] def toWindowColumn: Column
}
final case class TumbleWindow(size: String, timeField: String, alias: String)
    extends GroupWindow {
  private[dsl] def toWindowColumn: Column = window(col(timeField), size).as(alias)
}
final case class SlideWindow(size: String, slide: String, timeField: String,
    alias: String) extends GroupWindow {
  private[dsl] def toWindowColumn: Column = window(col(timeField), size, slide).as(alias)
}
final case class SessionWindow(gap: String, timeField: String, alias: String)
    extends GroupWindow {
  private[dsl] def toWindowColumn: Column = session_window(col(timeField), gap).as(alias)
}

object Tumble {
  final case class WithSize(size: String) {
    def on(timeField: String): WithSizeOnTime = WithSizeOnTime(size, timeField)
  }
  final case class WithSizeOnTime(size: String, timeField: String) {
    def as(alias: String): TumbleWindow = TumbleWindow(size, timeField, alias)
  }
  def over(size: String): WithSize = WithSize(size)
}

object Slide {
  final case class WithSize(size: String) {
    def every(slide: String): WithSizeAndSlide = WithSizeAndSlide(size, slide)
  }
  final case class WithSizeAndSlide(size: String, slide: String) {
    def on(timeField: String): WithSizeAndSlideOnTime =
      WithSizeAndSlideOnTime(size, slide, timeField)
  }
  final case class WithSizeAndSlideOnTime(size: String, slide: String, timeField: String) {
    def as(alias: String): SlideWindow = SlideWindow(size, slide, timeField, alias)
  }
  def over(size: String): WithSize = WithSize(size)
}

object Session {
  final case class WithGap(gap: String) {
    def on(timeField: String): WithGapOnTime = WithGapOnTime(gap, timeField)
  }
  final case class WithGapOnTime(gap: String, timeField: String) {
    def as(alias: String): SessionWindow = SessionWindow(gap, timeField, alias)
  }
  def withGap(gap: String): WithGap = WithGap(gap)
}

/** Result of [[GraftTable.window]]: groupBy names the window alias among
  * the keys (reference GroupWindowedTable.groupBy) and the window struct's
  * bounds come back as `<alias>.start` / `<alias>.end`. */
final case class GraftWindowedTable(df: DataFrame, w: GroupWindow) {
  def groupBy(fields: String*): GraftGroupedTable = {
    require(fields.contains(w.alias),
      s"groupBy on a windowed table must include the window alias '${w.alias}'")
    val keys = fields.map(f => if (f == w.alias) w.toWindowColumn else col(f))
    GraftGroupedTable(df, keys)
  }
}

/** Over-window builder (reference Over.java:48) — lowers to Spark's native
  * WindowSpec, which IS the reference's OverWindowedTable: apply it with
  * `agg.over(spec)`. */
object Over {
  def partitionBy(cols: Column*): WindowSpec = Window.partitionBy(cols: _*)
  def orderBy(cols: Column*): WindowSpec = Window.orderBy(cols: _*)
}
