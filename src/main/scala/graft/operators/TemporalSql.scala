package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `FOR SYSTEM_TIME AS OF` SQL surface — the reference's temporal-join
  * syntax (flink-sql-parser SqlSnapshot.java; planner
  * LogicalCorrelateToJoinFromTemporalTableRule.scala; runtime
  * TemporalRowTimeJoinOperator.java:72). Spark SQL has no temporal-join
  * clause, so — like `cep.MatchRecognize` for MATCH_RECOGNIZE and
  * `streaming.GraftDdl` for WATERMARK DDL — the SQL text surface is
  * recognized here and lowered onto the engine's scale-correct as-of
  * operator.
  *
  * Recognized shape (the reference's documented event-time temporal join):
  * {{{
  * SELECT p.colA [AS a], b.colB [AS c], ...
  * FROM <probeView> [AS] p
  * [LEFT] JOIN <buildView> FOR SYSTEM_TIME AS OF p.<tsCol> [AS] b
  * ON p.<key> = b.<key>
  * [ORDER BY <outCol> [DESC], ...]
  * }}}
  *
  * Lowering = the single-shuffle union+window pass (same plan as
  * `q_asof_join`, the batch analogue of the reference's keyed version
  * state): both sides tagged and unioned, one window partitioned by key
  * ordered by (ts, build-first) carries the latest build row forward —
  * no range-join blowup, no per-row probes. INNER drops probe rows with
  * no version at-or-before their time; LEFT keeps them with nulls.
  * Versions sharing an identical (key, ts) are tie-broken arbitrarily —
  * the reference leaves equal version times undefined too.
  */
object TemporalSql {

  /** As-of join as a DataFrame op: for each probe row, the latest build row
    * (by buildTs) with buildTs <= probeTs and equal key. Build columns come
    * back prefixed `__b_`. */
  def temporalJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, probeTs: String, buildTs: String,
      leftJoin: Boolean): DataFrame = {
    val bVals = build.columns.filterNot(_ == buildKey).toSeq
    val bStruct = struct(bVals.map(build(_)): _*)
    // a NULL build key can never satisfy the equi-predicate (SQL: NULL = x
    // is never true) — without this filter the window's null partition
    // would hand null-key probes a null-key version
    val bSide = build.where(build(buildKey).isNotNull)
      .select(build(buildKey).as("__k"), build(buildTs).as("__t"),
      lit(0).as("__tag"), bStruct.as("__b"),
      lit(null).cast(probe.schema).as("__p"))
    val pSide = probe.select(probe(probeKey).as("__k"), probe(probeTs).as("__t"),
      lit(1).as("__tag"), lit(null).cast(bSide.schema("__b").dataType).as("__b"),
      struct(probe.columns.toSeq.map(probe(_)): _*).as("__p"))
    // build sorts before probe at equal ts -> "<=" version visibility;
    // the __b struct content as the final key makes equal-(key, ts)
    // version picks DETERMINISTIC (max by content) instead of
    // shuffle-order-dependent — the reference leaves equal version times
    // undefined, but a flaky pick would make oracle queries flaky too
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"), col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = bSide.unionByName(pSide)
      .withColumn("__asof", last(col("__b"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val kept = if (leftJoin) carried else carried.where(col("__asof").isNotNull)
    val pCols = probe.columns.toSeq.map(c => col("__p").getField(c).as(c))
    val bCols = bVals.map(c => col("__asof").getField(c).as(s"__b_$c"))
    kept.select(pCols ++ bCols: _*)
  }

  private val JoinR =
    ("(?is)\\s*SELECT\\s+(.*?)\\s+FROM\\s+(\\w+)\\s+(?:AS\\s+)?(\\w+)\\s+" +
      "(LEFT\\s+)?JOIN\\s+(\\w+)\\s+FOR\\s+SYSTEM_TIME\\s+AS\\s+OF\\s+" +
      "(\\w+)\\.(\\w+)\\s+(?:AS\\s+)?(\\w+)\\s+" +
      "ON\\s+(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)\\s*" +
      "(?:ORDER\\s+BY\\s+(.+?))?\\s*;?\\s*").r
  private val ItemR = "(?i)\\s*(\\w+)\\.(\\w+)(?:\\s+AS\\s+(\\w+))?\\s*".r

  /** Parse + execute a FOR SYSTEM_TIME AS OF query against registered temp
    * views. Throws IllegalArgumentException on an unrecognized shape. */
  def sql(spark: SparkSession, text: String): DataFrame = text match {
    case JoinR(items, probeV, pAlias, left, buildV, ofAlias, tsCol, bAlias,
        onA1, onC1, onA2, onC2, orderTxt) =>
      require(ofAlias.equalsIgnoreCase(pAlias),
        s"FOR SYSTEM_TIME AS OF must reference the probe alias $pAlias, got $ofAlias")
      val (pKey, bKey) =
        if (onA1.equalsIgnoreCase(pAlias) && onA2.equalsIgnoreCase(bAlias)) (onC1, onC2)
        else if (onA1.equalsIgnoreCase(bAlias) && onA2.equalsIgnoreCase(pAlias)) (onC2, onC1)
        else throw new IllegalArgumentException(
          s"ON must equate $pAlias.<k> with $bAlias.<k>")
      val probe = spark.table(probeV)
      val build = spark.table(buildV)
      val buildTs = tsCol // version time = same-named time attribute on the build side
      val joined = temporalJoin(probe, build, pKey, bKey, tsCol, buildTs,
        leftJoin = left != null)
      val outCols: Seq[Column] = items.split(",").toSeq.map {
        case ItemR(a, c, as) =>
          val base =
            if (a.equalsIgnoreCase(pAlias)) col(c)
            // b.<joinkey> equals p.<joinkey> by the join predicate; the
            // struct deliberately omits the build key, so serve the probe's
            else if (a.equalsIgnoreCase(bAlias) && c.equalsIgnoreCase(bKey))
              col(pKey)
            else if (a.equalsIgnoreCase(bAlias)) col(s"__b_$c")
            else throw new IllegalArgumentException(s"unknown alias $a")
          base.as(if (as != null) as else c)
        case other => throw new IllegalArgumentException(
          s"unsupported select item (expected alias.col [AS name]): $other")
      }
      val selected = joined.select(outCols: _*)
      Option(orderTxt).map(_.trim).filter(_.nonEmpty) match {
        case Some(o) =>
          val keys = o.split(",").toSeq.map(_.trim).map { k =>
            if (k.toLowerCase.endsWith(" desc")) col(k.dropRight(5).trim).desc
            else col(k.stripSuffix(" asc").stripSuffix(" ASC").trim)
          }
          selected.orderBy(keys: _*)
        case None => selected
      }
    case other => throw new IllegalArgumentException(
      s"unrecognized temporal-join SQL (expected ... JOIN t FOR SYSTEM_TIME AS OF p.ts ...): $other")
  }

  /** The reference's canonical temporal-join example through the SQL text
    * surface: each purchase enriched with the user's latest signup value
    * at-or-before the purchase time. Same single-shuffle plan — and the
    * same oracle — as q_asof_join, but entered via FOR SYSTEM_TIME AS OF. */
  val qTemporalJoinSql: Q = Q(
    "q_temporal_join_sql",
    (s, dir) => {
      import s.implicits._
      val e = Tables.t(s, dir, "events")
      e.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
        .createOrReplaceTempView("graft_tj_purchases")
      e.filter($"event_type" === "signup")
        .select($"user_id", $"ts", $"value")
        .createOrReplaceTempView("graft_tj_signups")
      sql(s,
        """SELECT p.event_id AS event_id, b.value AS last_signup_value
          |FROM graft_tj_purchases AS p
          |LEFT JOIN graft_tj_signups FOR SYSTEM_TIME AS OF p.ts AS b
          |ON p.user_id = b.user_id
          |ORDER BY event_id""".stripMargin)
    },
    Some("""SELECT a.event_id,
           |  (SELECT arg_max(b.value, printf('%020d-%012d', epoch_us(b.ts), b.event_id))
           |   FROM events b
           |   WHERE b.user_id = a.user_id AND b.event_type = 'signup'
           |     AND b.ts <= a.ts) AS last_signup_value
           |FROM events a WHERE a.event_type = 'purchase'
           |ORDER BY a.event_id""".stripMargin))

  val all: Seq[Q] = Seq(qTemporalJoinSql)
}
