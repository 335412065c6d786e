package graft.cep

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** MATCH_RECOGNIZE SQL-text surface compiled onto the [[Pattern]] NFA
  * (reference: flink-table/flink-table-planner-blink/.../physical/stream/
  * StreamExecMatch.scala:68, which compiles Calcite's MATCH_RECOGNIZE rel
  * into the CEP NFA; SQL parser surface flink-sql-parser).
  *
  * Supported grammar (standard SQL:2016 row pattern recognition subset):
  * {{{
  *   PARTITION BY <col> ORDER BY <col>
  *   MEASURES <m> AS <alias> [, ...]        -- m: S.col | FIRST(S.col)
  *                                          --    | LAST(S.col) | COUNT(S.*)
  *   [ONE ROW PER MATCH]
  *   [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW]
  *   PATTERN ( S [+|*|?|{n}|{n,m}] ... )    -- quantifier not on last symbol
  *   DEFINE S AS <col> <op> <lit> [AND ...] [, ...]
  * }}}
  *
  * Semantics follow the SQL standard: rows are consumed contiguously (strict
  * contiguity everywhere, including inside quantified symbols), quantifiers
  * are greedy, undefined symbols match any row, bare `S.col` in MEASURES uses
  * final-LAST navigation, output is ONE ROW PER MATCH. A quantifier on the
  * final symbol is rejected (maximal-munch at partition end would need an
  * end-of-input flush the streaming NFA deliberately does not do).
  *
  * Scale: partitions are processed independently after a single hash shuffle
  * on the partition key; per-partition work is linear in rows × in-flight
  * runs, same bound as the Pattern NFA.
  */
object MatchRecognize {

  /** `isFinal`: SQL:2016 RUNNING vs FINAL semantics — only observable under
    * ALL ROWS PER MATCH, where RUNNING (the default) evaluates against the
    * match's rows up to the current one and FINAL against the complete
    * match; ONE ROW PER MATCH is always FINAL. */
  private final case class Measure(alias: String, dt: DataType, isFinal: Boolean,
      eval: (PMatch[(Long, Row)], Long) => Any)

  private val SpecR =
    ("(?i)PARTITION BY (\\w+) ORDER BY (\\w+) MEASURES (.+?) " +
     "(?:(ONE ROW|ALL ROWS) PER MATCH )?" +
     "(?:AFTER MATCH (SKIP PAST LAST ROW|SKIP TO NEXT ROW|SKIP TO (?:FIRST|LAST) \\w+) )?" +
     "PATTERN \\( *(.+?) *\\) " +
     "(?:WITHIN INTERVAL '(\\d+)' (SECOND|MINUTE|HOUR|DAY) )?" +
     "(?:SUBSET (.+?) )?" +
     "DEFINE (.+)").r
  private val MeasureR =
    ("(?i)(?:(RUNNING|FINAL) )?(?:(FIRST|LAST|SUM|AVG|MIN|MAX)\\((\\w+)\\.(\\w+)\\)" +
     "|COUNT\\((\\w+)\\.\\*\\)|(MATCH_NUMBER|CLASSIFIER)\\(\\)" +
     "|(\\w+)\\.(\\w+)) AS (\\w+)").r
  private val SymR = "(\\w+)(\\+|\\*|\\?|\\{(\\d+)(?:,(\\d+))?\\})?".r
  private val TermR = "(.+?) *(=|<>|!=|<=|>=|<|>) *(.+)".r
  private val SubsetItemR = "(\\w+)\\s*=\\s*\\(\\s*([\\w, ]+?)\\s*\\)".r

  // ---- DEFINE operand grammar (SQL:2016 R020 navigation; reference
  // MatchCodeGenerator.scala compiles the same PREV/FIRST/LAST calls) ----
  private type Ev = (Long, Row)
  /** Contextual condition: (current event, match-so-far ctx, partition rows
    * consumed so far) — the buffer gives PREV its physical-offset lookback. */
  private type CtxCond = (Ev, MatchCtx[Ev], scala.collection.IndexedSeq[Row]) => Boolean

  private sealed trait Operand extends Serializable
  private final case class OLit(v: Any) extends Operand
  private final case class OCol(idx: Int) extends Operand // current row's col
  private final case class OPrev(idx: Int, n: Int) extends Operand
  private final case class ONav(first: Boolean, sym: String, idx: Int,
      self: Boolean = false) extends Operand

  private val PrevR = "(?i)PREV\\(\\s*(\\w+)\\.(\\w+)\\s*(?:,\\s*(\\d+)\\s*)?\\)".r
  private val NavR = "(?i)(FIRST|LAST)\\(\\s*(\\w+)\\.(\\w+)\\s*\\)".r
  private val SymColR = "(\\w+)\\.(\\w+)".r
  private val BareColR = "(\\w+)".r

  /** Parse one DEFINE operand in the context of symbol `curSym`:
    * `S.col` where S is the symbol being defined = the current row;
    * another symbol's `T.col` = LAST(T.col) so far (running semantics);
    * `PREV(S.col, n)` = the row n positions earlier in the PARTITION
    * (physical offset, null before the partition start — SQL:2016). */
  private def parseOperand(txt: String, schema: StructType, curSym: String): Operand =
    txt.trim match {
      case PrevR(_, col, n) =>
        OPrev(schema.fieldIndex(col), if (n == null) 1 else n.toInt)
      case NavR(fn, sym, col) =>
        // SQL:2016 RUNNING semantics: navigating the symbol BEING DEFINED
        // includes the row under test in its own mapping (LAST(B.x) inside
        // DEFINE B is the current row) — the Pattern ctx holds only rows
        // accepted BEFORE this one, so self-navigation appends it
        ONav(fn.equalsIgnoreCase("FIRST"), sym.toUpperCase,
          schema.fieldIndex(col), self = sym.equalsIgnoreCase(curSym))
      case SymColR(sym, col) =>
        if (sym.equalsIgnoreCase(curSym)) OCol(schema.fieldIndex(col))
        else ONav(first = false, sym.toUpperCase, schema.fieldIndex(col))
      case lit if lit.startsWith("'") =>
        OLit(lit.stripPrefix("'").stripSuffix("'"))
      case BareColR(c) if schema.fieldNames.contains(c) => OCol(schema.fieldIndex(c))
      case num =>
        // integral literals stay Long (a Double would corrupt ids > 2^53)
        try OLit(java.lang.Long.valueOf(num.toLong))
        catch { case _: NumberFormatException =>
          try OLit(num.toDouble)
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(s"unparseable DEFINE operand: $txt") } }
    }

  private def opFn(op: String): Int => Boolean = op match {
    case "="          => _ == 0
    case "<>" | "!=" => _ != 0
    case "<"          => _ < 0
    case "<="         => _ <= 0
    case ">"          => _ > 0
    case ">="         => _ >= 0
  }

  private def cell(r: Row, i: Int): Any = if (r.isNullAt(i)) null else r.get(i)

  private def evalOperand(o: Operand, e: Ev, ctx: MatchCtx[Ev],
      buf: scala.collection.IndexedSeq[Row]): Any = o match {
    case OLit(v)  => v
    case OCol(i)  => cell(e._2, i)
    case OPrev(i, n) =>
      val idx = e._1 - n
      if (idx < 0) null else cell(buf(idx.toInt), i)
    case ONav(first, sym, i, self) =>
      val evs0 = ctx.eventsFor(sym)
      val evs = if (self) evs0 :+ e else evs0
      if (evs.isEmpty) null
      else cell((if (first) evs.head else evs.last)._2, i)
  }

  /** SQL comparison with null propagation (null operand → not satisfied). */
  private def compare(a: Any, b: Any, op: String): Boolean =
    if (a == null || b == null) false
    else (a, b) match {
      case (x: Number, y: Number) =>
        def integral(n: Number): Boolean = n.isInstanceOf[java.lang.Long] ||
          n.isInstanceOf[java.lang.Integer] || n.isInstanceOf[java.lang.Short] ||
          n.isInstanceOf[java.lang.Byte]
        // integral pairs compare exactly — routing longs through Double
        // collapses ids beyond 2^53
        if (integral(x) && integral(y))
          opFn(op)(java.lang.Long.compare(x.longValue(), y.longValue()))
        else opFn(op)(java.lang.Double.compare(x.doubleValue(), y.doubleValue()))
      case _ => opFn(op)(a.toString.compareTo(b.toString))
    }

  private def isSimple(o: Operand): Boolean = o match {
    case OLit(_) | OCol(_) => true
    case _ => false
  }

  /** Compile one DEFINE condition into (plain row predicate, contextual
    * predicate): terms needing only the current row go to the fast path;
    * navigation terms (PREV/FIRST/LAST/other-symbol) become an iterative
    * condition evaluated against the run's accumulated events + the
    * partition buffer. */
  private def compileCond(cond: String, schema: StructType, curSym: String)
      : (Row => Boolean, Option[CtxCond]) = {
    val terms = cond.split("(?i) AND ").map(_.trim).map {
      case TermR(lhs, op, rhs) =>
        (parseOperand(lhs, schema, curSym), op, parseOperand(rhs, schema, curSym))
      case other => throw new IllegalArgumentException(s"unparseable DEFINE term: $other")
    }
    val (simple, ctxual) = terms.partition { case (l, _, r) => isSimple(l) && isSimple(r) }
    val rowPred: Row => Boolean =
      if (simple.isEmpty) (_: Row) => true
      else { r =>
        val e: Ev = (0L, r)
        simple.forall { case (l, op, rt) =>
          compare(evalOperand(l, e, null, null), evalOperand(rt, e, null, null), op) }
      }
    val ctxPred: Option[CtxCond] =
      if (ctxual.isEmpty) None
      else Some((e, ctx, buf) => ctxual.forall { case (l, op, rt) =>
        compare(evalOperand(l, e, ctx, buf), evalOperand(rt, e, ctx, buf), op) })
    (rowPred, ctxPred)
  }

  private def sortKey(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case t: java.sql.Timestamp => t.getTime.toDouble
    case d: java.sql.Date => d.getTime.toDouble
    case other => throw new IllegalArgumentException(
      s"ORDER BY column must be numeric or temporal, got: ${other.getClass}")
  }

  /** Split on top-level commas only (commas inside parens — PREV(x, 2),
    * SUBSET lists — don't separate items). */
  private def splitTop(s: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val lastPart = cur.result().trim
    if (lastPart.nonEmpty) out += lastPart
    out.result()
  }

  def matchRecognize(df: DataFrame, spec: String): DataFrame = {
    val schema = df.schema
    val norm = spec.replaceAll("\\s+", " ").trim
    val (pCol, oCol, measuresTxt, rowsMode, skipTxt, patTxt, withinTxt, subsetTxt, defineTxt) =
      norm match {
        case SpecR(p, o, m, rm, sk, pt, wn, wu, sub, d) =>
          (p, o, m, Option(rm), Option(sk), pt,
            Option(wn).map(n => (n.toLong, wu.toUpperCase)), Option(sub), d)
        case _ => throw new IllegalArgumentException(s"unparseable MATCH_RECOGNIZE spec: $norm")
      }
    val allRows = rowsMode.exists(_.equalsIgnoreCase("ALL ROWS"))
    val pIdx = schema.fieldIndex(pCol)
    val oIdx = schema.fieldIndex(oCol)

    // SUBSET S = (A, B): union labels (SQL:2016 R010; reference
    // MatchCodeGenerator's PATTERN_VARIABLE union handling) — usable in
    // MEASURES navigation/aggregates; events keep match order.
    val subsets: Map[String, Set[String]] =
      subsetTxt.map(splitTop(_).map {
        case SubsetItemR(name, members) =>
          name.toUpperCase -> members.split(",").map(_.trim.toUpperCase).toSet
        case other => throw new IllegalArgumentException(s"unparseable SUBSET item: $other")
      }.toMap).getOrElse(Map.empty)

    val defines: Map[String, (Row => Boolean, Option[CtxCond])] =
      splitTop(defineTxt).map { d =>
        val Array(sym, cond) = d.split("(?i) AS ", 2)
        val s = sym.trim.toUpperCase
        s -> compileCond(cond, schema, s)
      }.toMap

    // Group quantifiers `(A B){n}` (SQL:2016 R010 grouped pattern; reference
    // GroupPattern.java): MATCH_RECOGNIZE rows are strictly contiguous, so
    // bounded repetition is exactly textual expansion before tokenizing —
    // symbol names stay verbatim and measures/COUNT accumulate across
    // repetitions, like the Pattern-API beginGroup expansion.
    val GroupR = """\(\s*([A-Za-z_][A-Za-z_0-9 ]*?)\s*\)\s*\{(\d+)\}""".r
    val patExpanded = GroupR.replaceAllIn(patTxt, m =>
      Seq.fill(m.group(2).toInt)(m.group(1).trim).mkString(" "))
    // all-strict steps (SQL rows are contiguous); quantifiers greedy per SQL
    val symbols = patExpanded.split(" ").filter(_.nonEmpty)
    val steps: Vector[Step[(Long, Row)]] = symbols.toVector.zipWithIndex.map {
      case (SymR(sym, quant, qn, qm), i) =>
        val isLast = i == symbols.length - 1
        if (quant != null && isLast) throw new IllegalArgumentException(
          s"quantifier on the final pattern symbol ($sym$quant) is not supported")
        val pred0 = defines.get(sym.toUpperCase).map(_._1).getOrElse((_: Row) => true)
        val pred: ((Long, Row)) => Boolean = e => pred0(e._2)
        val (min, max) = quant match {
          case null => (1, 1)
          case "+"  => (1, Int.MaxValue)
          case "*"  => (0, Int.MaxValue)
          case "?"  => (0, 1)
          case _    =>
            val lo = qn.toInt
            (lo, if (qm != null) qm.toInt else lo)
        }
        Step[(Long, Row)](sym.toUpperCase, pred, strict = true,
          minTimes = min, maxTimes = max, innerStrict = true,
          greedy = quant != null)
      case (other, _) => throw new IllegalArgumentException(s"bad pattern symbol: $other")
    }
    val afterMatch = skipTxt.map(_.toUpperCase) match {
      case Some("SKIP TO NEXT ROW") => AfterMatch.SkipToNext
      case Some(sk) if sk.startsWith("SKIP TO FIRST ") =>
        AfterMatch.SkipToFirst(sk.stripPrefix("SKIP TO FIRST ").trim)
      case Some(sk) if sk.startsWith("SKIP TO LAST ") =>
        AfterMatch.SkipToLast(sk.stripPrefix("SKIP TO LAST ").trim)
      case _                        => AfterMatch.SkipPastLastEvent
    }
    // WITHIN (Flink MATCH_RECOGNIZE time constraint): bound in the ORDER BY
    // column's sortKey units. Requires a temporal ORDER BY (as in the
    // reference, where WITHIN needs a rowtime order) — sortKey yields ms.
    val withinSort: Option[Long] = withinTxt.map { case (n, unit) =>
      require(schema(oCol).dataType == org.apache.spark.sql.types.TimestampType,
        s"WITHIN requires a temporal ORDER BY column, got ${schema(oCol).dataType}")
      val ms = unit match {
        case "SECOND" => 1000L
        case "MINUTE" => 60000L
        case "HOUR" => 3600000L
        case "DAY" => 86400000L
      }
      n * ms
    }
    val pattern = Pattern(steps, withinSort, afterMatch)
    // navigation conditions attach per partition (they close over the
    // partition's row buffer for PREV's physical-offset lookback)
    val navConds: Map[String, CtxCond] =
      defines.collect { case (sym, (_, Some(f))) => sym -> f }

    // subset-aware event lookup for MEASURES
    def evsFor(m: PMatch[(Long, Row)], sym: String): Vector[(Long, Row)] =
      subsets.get(sym) match {
        case Some(members) =>
          m.labeled.collect { case (n, e) if members.contains(n) => e }
        case None => m.eventsFor(sym)
      }

    val measures: Vector[Measure] = splitTop(measuresTxt).map(_.trim).map {
      case MeasureR(mode, nav, s1, c1, cntSym, fn0, s2, c2, alias) =>
        val isFinal = mode != null && mode.equalsIgnoreCase("FINAL")
        if (cntSym != null)
          Measure(alias, LongType, isFinal,
            (m, _) => evsFor(m, cntSym.toUpperCase).size.toLong)
        else if (fn0 != null && fn0.equalsIgnoreCase("MATCH_NUMBER"))
          // sequential match ordinal within the partition (SQL:2016 R020)
          Measure(alias, LongType, isFinal, (_, n) => n)
        else if (fn0 != null && fn0.equalsIgnoreCase("CLASSIFIER"))
          // ONE ROW PER MATCH: the label of the match's final row
          Measure(alias, StringType, isFinal, (m, _) => m.labeled.last._1)
        else {
          val (sym, col) = if (nav != null) (s1, c1) else (s2, c2)
          val idx = schema.fieldIndex(col)
          val fn = if (nav == null) "LAST" else nav.toUpperCase
          if ((fn == "SUM" || fn == "AVG") &&
              !schema(idx).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
            throw new IllegalArgumentException(
              s"$fn($col) requires a numeric column, got ${schema(idx).dataType.simpleString}")
          def num(r: Row): Double = r.get(idx).asInstanceOf[Number].doubleValue()
          // SQL MIN/MAX are defined on any comparable type (strings,
          // timestamps), and aggregates skip NULLs
          val ord: Ordering[Any] = new Ordering[Any] {
            def compare(a: Any, b: Any): Int = (a, b) match {
              case (x: Number, y: Number) =>
                java.lang.Double.compare(x.doubleValue(), y.doubleValue())
              case (x: Comparable[_], y) =>
                x.asInstanceOf[Comparable[Any]].compareTo(y)
              case _ => a.toString.compareTo(b.toString)
            }
          }
          val dt = fn match {
            case "SUM" | "AVG" => DoubleType
            case _ => schema(idx).dataType
          }
          Measure(alias, dt, isFinal, (m, _) => {
            val evs0 = evsFor(m, sym.toUpperCase)
            val evs =
              if (fn == "FIRST" || fn == "LAST") evs0
              else evs0.filterNot(_._2.isNullAt(idx)) // aggregates skip NULLs
            if (evs.isEmpty) null
            else fn match {
              case "FIRST" => evs.head._2.get(idx)
              case "LAST"  => evs.last._2.get(idx) // bare S.col = final LAST
              case "SUM"   => evs.map(e => num(e._2)).sum
              case "AVG"   => evs.map(e => num(e._2)).sum / evs.size
              case "MIN"   => evs.map(_._2.get(idx)).min(ord)
              case "MAX"   => evs.map(_._2.get(idx)).max(ord)
            }
          })
        }
      case other => throw new IllegalArgumentException(s"unparseable measure: $other")
    }.toVector

    // ONE ROW PER MATCH: partition key + FINAL measures, one row per match.
    // ALL ROWS PER MATCH (SQL:2016): every matched input row is emitted with
    // RUNNING measure semantics — measures see the match's rows up to and
    // including the current one, so CLASSIFIER() is the row's own symbol and
    // aggregates/navigation are running values.
    val outSchema =
      if (allRows)
        StructType(schema.fields.toSeq ++
          measures.map(m => StructField(m.alias, m.dt, nullable = true)))
      else
        StructType(
          StructField(pCol, schema(pIdx).dataType) +:
            measures.map(m => StructField(m.alias, m.dt, nullable = true)))

    val spark = df.sparkSession
    import spark.implicits._
    df.groupByKey { r =>
      r.get(pIdx) match {
        // Array[Byte].toString is identity-based — equal binary keys would
        // land in different groups; encode by content
        case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
        case v => String.valueOf(v)
      }
    }
      // secondary sort: row order rides the shuffle; the NFA consumes each
      // partition's rows as a lazy iterator (no per-key materialization)
      .flatMapSortedGroups(org.apache.spark.sql.functions.col(oCol)) {
        (_: String, it0: Iterator[Row]) =>
        val it = it0.buffered
        val partVal = it.head.get(pIdx)
        // PREV lookback buffer: rows append as the NFA pulls them, so by the
        // time a predicate runs on ord i, every row < i is addressable. Only
        // populated when DEFINE actually navigates — otherwise the iterator
        // stays fully lazy (no per-key materialization).
        val buf = new scala.collection.mutable.ArrayBuffer[Row]()
        val indexed =
          if (navConds.isEmpty) it.zipWithIndex.map { case (r, i) => (i.toLong, r) }
          else it.zipWithIndex.map { case (r, i) => buf += r; (i.toLong, r) }
        val pat =
          if (navConds.isEmpty) pattern
          else pattern.copy(steps = pattern.steps.map { st =>
            navConds.get(st.name).fold(st)(f =>
              st.copy(iterPred = Some((e: (Long, Row), c: MatchCtx[(Long, Row)]) =>
                f(e, c, buf))))
          })
        val ord: ((Long, Row)) => Long = _._1
        // WITHIN measures real time on the ORDER BY column; match positions
        // (ord) stay the contiguity/order key
        val tsOf: ((Long, Row)) => Long =
          if (withinSort.isDefined) t => sortKey(t._2.get(oIdx)).toLong else ord
        Pattern.run[(Long, Row)](pat, indexed, tsOf, ord)
          .zipWithIndex
          .flatMap { case (m, i) =>
            val mn = i + 1L
            if (allRows)
              m.labeled.indices.iterator.map { k =>
                val prefix = PMatch(m.labeled.take(k + 1), m.startOrd)
                Row.fromSeq(m.labeled(k)._2._2.toSeq ++
                  measures.map(ms => ms.eval(if (ms.isFinal) m else prefix, mn)))
              }
            else
              Iterator.single(Row.fromSeq(partVal +: measures.map(_.eval(m, mn))))
          }
      }(Encoders.row(outSchema))
      .toDF()
  }

  /** PATTERN (A B C): three contiguous rows with distinct DEFINE predicates —
    * the canonical MATCH_RECOGNIZE smoke query. Overlapping candidates are
    * type-impossible, so the lead()-chain rewrite is an exact oracle. */
  val qMatchRecognizeSeq: Q = Q(
    "q_match_recognize_seq",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES A.event_id AS a_id, B.event_id AS b_id, C.event_id AS c_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B C)
          |DEFINE A AS event_type = 'signup', B AS event_type = 'view',
          |       C AS event_type = 'purchase'""".stripMargin)
        .orderBy("user_id", "a_id")
    },
    Some("""SELECT user_id, a_id, b_id, c_id FROM (
           |  SELECT user_id, event_id AS a_id, event_type AS t0,
           |         lead(event_id) OVER w AS b_id, lead(event_type) OVER w AS t1,
           |         lead(event_id, 2) OVER w AS c_id, lead(event_type, 2) OVER w AS t2
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE t0 = 'signup' AND t1 = 'view' AND t2 = 'purchase'
           |ORDER BY user_id, a_id""".stripMargin))

  /** PATTERN (A+ B): greedy quantifier + FIRST/LAST/COUNT navigation in
    * MEASURES. Same islands oracle as q_cep_oneormore. */
  val qMatchRecognizePlus: Q = Q(
    "q_match_recognize_plus",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES FIRST(A.event_id) AS a_first, LAST(A.event_id) AS a_last,
          |         COUNT(A.*) AS n_views, B.event_id AS b_id
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A+ B)
          |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
        .orderBy("user_id", "b_id")
    },
    Some("""WITH e AS (
           |  SELECT user_id, event_id, event_type,
           |         row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
           |  FROM events),
           |v AS (
           |  SELECT user_id, event_id, rn,
           |         rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
           |  FROM e WHERE event_type = 'view'),
           |g AS (
           |  SELECT user_id, grp, min(event_id) AS a_first, max(event_id) AS a_last,
           |         max(rn) AS max_rn, count(*) AS n_views
           |  FROM v GROUP BY user_id, grp)
           |SELECT p.user_id, g.a_first, g.a_last, g.n_views, p.event_id AS b_id
           |FROM e p JOIN g ON g.user_id = p.user_id AND g.max_rn = p.rn - 1
           |WHERE p.event_type = 'purchase'
           |ORDER BY p.user_id, b_id""".stripMargin))

  /** MATCH_NUMBER() + CLASSIFIER() measures (SQL:2016 R020/R030): the match
    * ordinal within its partition and the final row's symbol. PATTERN (A B)
    * strict adjacent pairs cannot overlap, so the lead() rewrite with a
    * row_number() over the matched pairs is an exact oracle. */
  val qMatchRecognizeMeasures: Q = Q(
    "q_match_recognize_measures",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls,
          |         A.event_id AS a_id, B.event_id AS b_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B)
          |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
        .orderBy("user_id", "a_id")
    },
    Some("""SELECT user_id,
           |       row_number() OVER (PARTITION BY user_id ORDER BY a_id) AS mn,
           |       'B' AS cls, a_id, b_id
           |FROM (
           |  SELECT user_id, event_id AS a_id, event_type,
           |         lead(event_id) OVER w AS b_id,
           |         lead(event_type) OVER w AS b_type
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE event_type = 'view' AND b_type = 'purchase'
           |ORDER BY user_id, a_id""".stripMargin))

  /** ALL ROWS PER MATCH (SQL:2016 R010): both rows of each (view, purchase)
    * pair are emitted, CLASSIFIER() labels each row with its own symbol and
    * SUM runs — the oracle reconstructs the expansion as a UNION ALL of the
    * A-rows and B-rows of the matched pairs. */
  val qMatchRecognizeAllRows: Q = Q(
    "q_match_recognize_all_rows",
    (s, dir) => {
      val df = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "event_type", "value")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls,
          |         SUM(A.value) AS run_a_sum
          |ALL ROWS PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B)
          |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
        .selectExpr("user_id", "event_id", "mn", "cls", "round(run_a_sum, 2) AS run_a_sum")
        .orderBy("user_id", "event_id")
    },
    Some("""WITH pairs AS (
           |  SELECT user_id, a_id, b_id, a_value,
           |         row_number() OVER (PARTITION BY user_id ORDER BY a_id) AS mn
           |  FROM (
           |    SELECT user_id, event_id AS a_id, value AS a_value, event_type,
           |           lead(event_id) OVER w AS b_id,
           |           lead(event_type) OVER w AS b_type
           |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |  WHERE event_type = 'view' AND b_type = 'purchase')
           |SELECT user_id, a_id AS event_id, mn, 'A' AS cls,
           |       round(a_value, 2) AS run_a_sum FROM pairs
           |UNION ALL
           |SELECT user_id, b_id AS event_id, mn, 'B' AS cls,
           |       round(a_value, 2) AS run_a_sum FROM pairs
           |ORDER BY user_id, event_id""".stripMargin))

  /** PATTERN ((V C){2}): grouped pattern quantifier — the SQL-text twin of
    * q_cep_group (same strict 4-chain, same greedy non-overlap, same 12-row
    * answer at sf0.01), with FIRST/LAST navigating the accumulated group
    * labels. */
  val qMatchRecognizeGroup: Q = Q(
    "q_match_recognize_group",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES FIRST(V.event_id) AS v1_id, FIRST(C.event_id) AS c1_id,
          |         LAST(V.event_id) AS v2_id, LAST(C.event_id) AS c2_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN ((V C){2})
          |DEFINE V AS event_type = 'view', C AS event_type = 'click'""".stripMargin)
        .orderBy("user_id", "v1_id")
    },
    Some("""WITH RECURSIVE cand AS (
           |  SELECT user_id, event_id AS v1_id, c1_id, v2_id, c2_id
           |  FROM (SELECT user_id, event_id, event_type,
           |               lead(event_type, 1) OVER w AS ty1,
           |               lead(event_id, 1) OVER w AS c1_id,
           |               lead(event_type, 2) OVER w AS ty2,
           |               lead(event_id, 2) OVER w AS v2_id,
           |               lead(event_type, 3) OVER w AS ty3,
           |               lead(event_id, 3) OVER w AS c2_id
           |        FROM events
           |        WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |  WHERE event_type = 'view' AND ty1 = 'click'
           |    AND ty2 = 'view' AND ty3 = 'click'),
           |m AS (
           |  SELECT user_id, CAST(-1 AS BIGINT) AS v1_id,
           |         CAST(-1 AS BIGINT) AS c1_id, CAST(-1 AS BIGINT) AS v2_id,
           |         CAST(-1 AS BIGINT) AS c2_id
           |  FROM (SELECT DISTINCT user_id FROM events)
           |  UNION ALL
           |  SELECT m.user_id, nxt.v1_id, nxt.c1_id, nxt.v2_id, nxt.c2_id
           |  FROM m, LATERAL (
           |    SELECT c.v1_id, c.c1_id, c.v2_id, c.c2_id
           |    FROM cand c
           |    WHERE c.user_id = m.user_id AND c.v1_id > m.c2_id
           |    ORDER BY c.v1_id LIMIT 1) nxt)
           |SELECT user_id, v1_id, c1_id, v2_id, c2_id FROM m
           |WHERE v1_id >= 0 ORDER BY user_id, v1_id""".stripMargin))

  /** PATTERN (A B) WITHIN INTERVAL '30' MINUTE — the reference's
    * MATCH_RECOGNIZE time constraint: a match must complete within the
    * interval measured on the (temporal) ORDER BY column. Adjacent distinct
    * types make overlap impossible, so the lead()-chain + time-delta filter
    * is an exact oracle. */
  val qMatchRecognizeWithin: Q = Q(
    "q_match_recognize_within",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type", "ts")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY ts
          |MEASURES A.event_id AS a_id, B.event_id AS b_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B) WITHIN INTERVAL '30' MINUTE
          |DEFINE A AS event_type = 'signup', B AS event_type = 'purchase'""".stripMargin)
        .orderBy("user_id", "a_id")
    },
    Some("""SELECT user_id, a_id, b_id FROM (
           |  SELECT user_id, event_id AS a_id, event_type AS ty0, ts AS t0,
           |         lead(event_id) OVER w AS b_id,
           |         lead(event_type) OVER w AS ty1,
           |         lead(ts) OVER w AS t1
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts))
           |WHERE ty0 = 'signup' AND ty1 = 'purchase'
           |  AND epoch(t1) - epoch(t0) < 1800
           |ORDER BY user_id, a_id""".stripMargin))

  /** AFTER MATCH SKIP TO NEXT ROW: matches may OVERLAP — (V V) over a run
    * of k consecutive views yields k−1 matches, where SKIP PAST LAST ROW
    * would yield ⌊k/2⌋. The oracle is the full candidate set (every adjacent
    * view pair), which only this skip strategy emits. */
  val qMatchRecognizeSkipNext: Q = Q(
    "q_match_recognize_skip_next",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES FIRST(V.event_id) AS v1_id, LAST(V.event_id) AS v2_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP TO NEXT ROW
          |PATTERN (V V)
          |DEFINE V AS event_type = 'view'""".stripMargin)
        .orderBy("user_id", "v1_id")
    },
    Some("""SELECT user_id, v1_id, v2_id FROM (
           |  SELECT user_id, event_id AS v1_id, event_type AS ty0,
           |         lead(event_id) OVER w AS v2_id, lead(event_type) OVER w AS ty1
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE ty0 = 'view' AND ty1 = 'view'
           |ORDER BY user_id, v1_id""".stripMargin))

  /** DEFINE navigation (SQL:2016 R020; reference MatchCodeGenerator.scala —
    * PREV compiles to a physical-offset row lookup): B matches only when its
    * value EXCEEDS the previous partition row's value. SKIP TO NEXT ROW makes
    * every adjacent candidate pair a match, so the lag() rewrite is exact. */
  val qMatchRecognizePrev: Q = Q(
    "q_match_recognize_prev",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type", "value")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES A.event_id AS a_id, B.event_id AS b_id
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP TO NEXT ROW
          |PATTERN (A B)
          |DEFINE A AS event_type = 'view', B AS B.value > PREV(B.value)""".stripMargin)
        .orderBy("user_id", "a_id")
    },
    Some("""SELECT user_id, a_id, b_id FROM (
           |  SELECT user_id, event_id AS a_id, event_type AS ty0, value AS v0,
           |         lead(event_id) OVER w AS b_id, lead(value) OVER w AS v1
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE ty0 = 'view' AND v1 > v0
           |ORDER BY user_id, a_id""".stripMargin))

  /** SUBSET union labels (SQL:2016 R010): U = (A, B) navigated in MEASURES —
    * FIRST(U.x) is the A row, LAST(U.x) the B row, COUNT(U.*) spans both.
    * Strict adjacent distinct-type pairs cannot overlap → lead() oracle. */
  val qMatchRecognizeSubset: Q = Q(
    "q_match_recognize_subset",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES FIRST(U.event_id) AS u_first, LAST(U.event_id) AS u_last,
          |         COUNT(U.*) AS n_rows
          |ONE ROW PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B)
          |SUBSET U = (A, B)
          |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
        .orderBy("user_id", "u_first")
    },
    Some("""SELECT user_id, a_id AS u_first, b_id AS u_last, CAST(2 AS BIGINT) AS n_rows
           |FROM (
           |  SELECT user_id, event_id AS a_id, event_type,
           |         lead(event_id) OVER w AS b_id, lead(event_type) OVER w AS b_type
           |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |WHERE event_type = 'view' AND b_type = 'purchase'
           |ORDER BY user_id, u_first""".stripMargin))

  /** RUNNING vs FINAL measure semantics under ALL ROWS PER MATCH (SQL:2016
    * R030; reference MatchCodeGenerator's FINAL/RUNNING rewriting): on the
    * A-row of each (A B) match, RUNNING LAST(B.x) is null (no B yet) while
    * FINAL LAST(B.x) already sees the match's B-row. */
  val qMatchRecognizeFinal: Q = Q(
    "q_match_recognize_final",
    (s, dir) => {
      val df = Tables.t(s, dir, "events").select("user_id", "event_id", "event_type")
      matchRecognize(df,
        """PARTITION BY user_id ORDER BY event_id
          |MEASURES RUNNING LAST(B.event_id) AS run_b, FINAL LAST(B.event_id) AS fin_b
          |ALL ROWS PER MATCH
          |AFTER MATCH SKIP PAST LAST ROW
          |PATTERN (A B)
          |DEFINE A AS event_type = 'view', B AS event_type = 'purchase'""".stripMargin)
        .select("user_id", "event_id", "run_b", "fin_b")
        .orderBy("user_id", "event_id")
    },
    Some("""WITH pairs AS (
           |  SELECT user_id, a_id, b_id FROM (
           |    SELECT user_id, event_id AS a_id, event_type,
           |           lead(event_id) OVER w AS b_id, lead(event_type) OVER w AS b_type
           |    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
           |  WHERE event_type = 'view' AND b_type = 'purchase')
           |SELECT user_id, a_id AS event_id, CAST(NULL AS BIGINT) AS run_b,
           |       b_id AS fin_b FROM pairs
           |UNION ALL
           |SELECT user_id, b_id AS event_id, b_id AS run_b, b_id AS fin_b FROM pairs
           |ORDER BY user_id, event_id""".stripMargin))

  val all: Seq[Q] = Seq(qMatchRecognizeSeq, qMatchRecognizePlus,
    qMatchRecognizeMeasures, qMatchRecognizeAllRows, qMatchRecognizeGroup,
    qMatchRecognizeWithin, qMatchRecognizeSkipNext, qMatchRecognizePrev,
    qMatchRecognizeSubset, qMatchRecognizeFinal)
}
