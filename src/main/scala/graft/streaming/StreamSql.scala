package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, SessionWindow, TimeWindow}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Cast, GetStructField, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, BinaryExpression, EqualNullSafe, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.catalyst.expressions.{And, Between, Subtract, SubtractDates, SubtractTimestamps}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, Sort}
import org.apache.spark.sql.types.{DateType, StructType, TimestampNTZType, TimestampType}

/** `SELECT STREAM` front end — the reference's streaming SQL surface.
  *
  * In the reference, the STREAM keyword wraps the query's source in a
  * Delta operator (reference: rel/stream/Delta.java:38) which the eight
  * StreamRules push down to the table (rel/stream/StreamRules.java:70-292)
  * until it lands on `StreamableTable.stream()`
  * (schema/StreamableTable.java:26); validation rejects STREAM over a
  * table that is not streamable ("Cannot convert table to stream").
  *
  * Spark mapping: the delta of a table IS `spark.readStream` over the same
  * source (SURVEY.md §2.7), so `SELECT STREAM <rest>` parses `<rest>`
  * against a catalog where every streamable table resolves to its
  * readStream twin and everything else stays a batch view (stream-to-table
  * joins fall out of Structured Streaming's stream-static join). The
  * pushdown rules need no re-implementation — Catalyst's incremental
  * planner plays StreamRules' role.
  */
object StreamSql {

  private val Shell = """(?is)^\s*SELECT\s+STREAM\b(.*)""".r

  /** Tables with a streaming twin (the fixture's StreamableTable set):
    * the event stream and the corpus-ingest documents stream. */
  val streamable: Set[String] = Set("events", "documents")

  /** Additional streamable tables — the analogue of registering a
    * StreamableTable in the reference's model schema
    * (StreamTest.OrdersStreamTableFactory): name → its readStream twin.
    * Registered twins shadow any same-named batch view inside
    * `SELECT STREAM` resolution. */
  private val extraStreamables =
    scala.collection.concurrent.TrieMap.empty[String, SparkSession => DataFrame]
  def registerStreamable(name: String, make: SparkSession => DataFrame): Unit =
    extraStreamables.put(name, make)
  def unregisterStreamable(name: String): Unit = extraStreamables.remove(name)

  // The reference's grouped window functions (SqlStdOperatorTable:2268-2330
  // TUMBLE/HOP/SESSION + their _START/_END auxiliaries) lowered onto
  // Spark's window()/session_window() struct API. INTERVAL 'n' UNIT is
  // rewritten to Spark's duration-string form.
  private val IntervalLit = """(?i)INTERVAL\s+'(\d+)'\s+(\w+)""".r
  private def dur(m: String, unit: String) = s"'$m ${unit.toLowerCase}'"

  private val Tumble = """(?i)TUMBLE\s*\(\s*(\w+)\s*,\s*(INTERVAL[^)]+)\)""".r
  private val Hop = """(?i)HOP\s*\(\s*(\w+)\s*,\s*(INTERVAL[^,)]+),\s*(INTERVAL[^)]+)\)""".r
  private val SessionW = """(?i)SESSION\s*\(\s*(\w+)\s*,\s*(INTERVAL[^)]+)\)""".r
  private val StartEnd =
    """(?i)(TUMBLE|HOP|SESSION)_(START|END)\s*\([^)]*\)""".r
  // the reference's time-bucketing idiom `FLOOR(ts TO HOUR)`
  // (StreamTest.java streaming GROUP BY goldens) → Spark date_trunc
  private val FloorTo = """(?i)FLOOR\s*\(\s*([\w.]+)\s+TO\s+(\w+)\s*\)""".r

  /** Rewrite reference grouped-window syntax into Spark's window functions.
    * The auxiliary _START/_END functions become `.start`/`.end` access on
    * the grouping struct (`window` / `session_window`), exactly the Spark
    * replacement SURVEY §2.4 prescribes. */
  def rewriteGroupedWindows(sql: String): String = {
    def iv(text: String): String = IntervalLit.replaceAllIn(text,
      m => dur(m.group(1), m.group(2)))
    var out = sql
    // ---- the reference validator's two grouped-window rules ----------
    // (SqlValidatorTest.testStreamTumble/Hop/Session; validate/
    // SqlValidatorImpl's auxiliary-group-function matching):
    //  1. an auxiliary _START/_END call must have a MATCHING group
    //     function call (same function, structurally identical
    //     arguments) in the GROUP BY clause — align defaulting does NOT
    //     count ("structural equivalence, not semantic equivalence");
    //  2. the bare group functions may ONLY appear in GROUP BY.
    val gbSplit = """(?i)\bGROUP\s+BY\b""".r.findFirstMatchIn(sql)
    val (head, tail) = gbSplit match {
      case Some(m) => (sql.substring(0, m.start), sql.substring(m.end))
      case None => (sql, "")
    }
    def norm(t: String) = t.replaceAll("\\s+", " ").trim.toUpperCase
    val GroupFn = """(?i)\b(TUMBLE|HOP|SESSION)\s*\(([^)]*)\)""".r
    val grouped = GroupFn.findAllMatchIn(tail)
      .map(m => (m.group(1).toUpperCase, norm(m.group(2)))).toSet
    for (m <- StartEnd.findAllMatchIn(sql)) {
      val fn = m.group(1).toUpperCase
      val args = norm(m.matched.replaceAll("""(?is)^\w+\s*\(""", "").stripSuffix(")"))
      if (!grouped.contains((fn, args)))
        throw new IllegalArgumentException(
          s"Call to auxiliary group function '${fn}_${m.group(2).toUpperCase}' " +
            s"must have matching call to group function '$fn' in GROUP BY clause")
    }
    // strip auxiliaries (their names contain the bare function names)
    // before scanning the head for misplaced group functions
    val headNoAux = StartEnd.replaceAllIn(head, "")
    GroupFn.findFirstMatchIn(headNoAux).foreach { m =>
      throw new IllegalArgumentException(
        s"Group function '${m.group(1).toUpperCase}' can only appear in " +
          "GROUP BY clause")
    }
    // auxiliaries first — their names contain the bare function names
    out = StartEnd.replaceAllIn(out, m => {
      val struct = if (m.group(1).equalsIgnoreCase("SESSION")) "session_window" else "window"
      s"$struct.${m.group(2).toLowerCase}"
    })
    // HOP's reference argument order is (ts, slide, size); Spark's is
    // (ts, size, slide)
    out = Hop.replaceAllIn(out, m =>
      s"window(${m.group(1)}, ${iv(m.group(3))}, ${iv(m.group(2))})")
    out = Tumble.replaceAllIn(out, m => s"window(${m.group(1)}, ${iv(m.group(2))})")
    out = SessionW.replaceAllIn(out, m =>
      s"session_window(${m.group(1)}, ${iv(m.group(2))})")
    out = FloorTo.replaceAllIn(out, m =>
      s"date_trunc('${m.group(2).toUpperCase}', ${m.group(1)})")
    out
  }

  def isStreamQuery(text: String): Boolean = Shell.pattern.matcher(text).matches()

  /** Parse and analyze a `SELECT STREAM` query into an unbounded
    * DataFrame. Throws (mirroring the reference's validator error) when
    * the FROM clause holds no streamable table. */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame =
    text match {
      case Shell(rest) =>
        // batch views first (dimension sides of stream-table joins) ...
        Tables.registerAll(spark, sfDir)
        // ... then the streaming twins shadow the streamable tables.
        // Snapshot what each twin shadows FIRST: the analyzed plan below
        // resolves against the twins, and the finally must put back every
        // shadowed batch view (not only `events` — an extra streamable
        // named after any existing view would otherwise leave the twin
        // permanently shadowing it, defeating registerAll's memo).
        val shadowed: Map[String, Option[DataFrame]] =
          (extraStreamables.keySet ++ streamable).iterator.map { n =>
            n -> (try Some(spark.table(n)) catch { case _: Exception => None })
          }.toMap
        StreamOps.readEventsStream(spark, sfDir).createOrReplaceTempView("events")
        StreamOps.readDocumentsStream(spark, sfDir).createOrReplaceTempView("documents")
        extraStreamables.foreach { case (n, mk) =>
          mk(spark).createOrReplaceTempView(n)
        }
        val df =
          try spark.sql(rewriteGroupedWindows("SELECT " + rest))
          finally shadowed.foreach {
            case (n, Some(prior)) => prior.createOrReplaceTempView(n)
            case (n, None) => spark.catalog.dropTempView(n)
          }
        if (!df.isStreaming)
          throw new IllegalArgumentException(
            "SELECT STREAM requires a streamable table in FROM " +
              s"(streamable: ${(streamable ++ extraStreamables.keySet).mkString(", ")})" +
              " — the reference rejects this as 'Cannot convert table to stream'")
        validateMonotonicAggregation(df)
        df
      case _ =>
        throw new IllegalArgumentException("not a SELECT STREAM query")
    }

  /** The reference validator's streaming-aggregation rule
    * (site/_docs/stream.md:185-264, enforced by
    * SqlValidatorImpl/StreamTest): a GROUP BY over a stream must contain
    * at least one monotonic or time-windowed expression, otherwise the
    * aggregate can never emit (its groups stay open forever) and state is
    * unbounded. Spark would silently accept such a query and run it as
    * unbounded-state complete-mode; we reject it up front with the
    * reference's error shape instead.
    *
    * Monotonic here = derived from event time: a timestamp/date-typed
    * grouping key (`rowtime`, `FLOOR(rowtime TO HOUR)` → date_trunc,
    * `CAST(rowtime AS DATE)`), or a grouped-window struct
    * (window()/session_window(), whose start/end fields are timestamps).
    */
  private[graft] def validateMonotonicAggregation(df: DataFrame): Unit = {
    def isTimeType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case TimestampType | TimestampNTZType | DateType => true
      case st: StructType =>
        // the window/session_window grouping struct: start/end timestamps
        st.fields.exists(f => isTimeType(f.dataType))
      case _ => false
    }
    // Monotonic = derived from event time by an ORDER-PRESERVING function.
    // This is a WHITELIST of known monotonic shapes, not "contains a
    // time-typed subexpression": cyclic derivations such as
    // EXTRACT(HOUR FROM rowtime) or dayofweek(rowtime) contain the event
    // time but wrap around, which is exactly the unbounded-state condition
    // the rule exists to reject (stream.md "Aggregation and windows").
    // Accepted: the bare event-time column (or the window/session_window
    // grouping struct Spark's TimeWindowing rule substitutes for it),
    // date_trunc / FLOOR-TO over a monotonic input, a widening CAST to
    // DATE/TIMESTAMP, struct-field access (window.start/.end), and
    // aliases thereof.
    def monotonic(e: Expression): Boolean = e match {
      case a: Attribute => isTimeType(a.dataType)
      case Alias(child, _) => monotonic(child)
      case _: TimeWindow | _: SessionWindow => true
      case t: TruncTimestamp => t.children.exists(monotonic)
      case c: Cast if isTimeType(c.dataType) => monotonic(c.child)
      case g: GetStructField => monotonic(g.child)
      case _ => false
    }
    df.queryExecution.analyzed.foreach {
      case agg: Aggregate if agg.child.isStreaming &&
          !agg.groupingExpressions.exists(monotonic) =>
        throw new IllegalArgumentException(
          "Streaming aggregation requires at least one monotonic expression " +
            "in GROUP BY clause — group on the event-time column, " +
            "FLOOR(rowtime TO unit), or TUMBLE/HOP/SESSION " +
            "(reference: site/_docs/stream.md 'Aggregation and windows on streams')")
      // the reference's sorting rule (stream.md 'Sorting'): a stream can
      // only be emitted in an order whose LEADING key is monotonic —
      // ORDER BY units on an unbounded stream can never emit its first row
      // Direction matters too: ORDER BY rowtime DESC asks for the LAST
      // event first, which an unbounded stream can never produce — only an
      // ASCENDING leading key over a monotonic value can emit incrementally.
      case srt: Sort if srt.child.isStreaming &&
          !srt.order.headOption.exists(o =>
            o.direction == Ascending && monotonic(o.child)) =>
        throw new IllegalArgumentException(
          "Streaming ORDER BY must start with an ASCENDING monotonic " +
            "expression (the event-time column or an expression derived " +
            "from it) — a stream cannot be sorted on an unbounded or " +
            "descending key (reference: site/_docs/stream.md 'Sorting streams')")
      // the joining rule (stream.md 'Joining streams': "a window of one
      // hour" over both rowtimes): a STREAM-to-STREAM join must carry an
      // INEQUALITY over event time bounding how far the sides can drift —
      // without it, matching state is unbounded on both sides. Spark would
      // reject this too, but only when the sink starts; surface the
      // reference validator's decision at analysis instead.
      // A time bound must actually RELATE the two streams' event times —
      // a comparison against a literal (rowtime > DATE '2020-01-01') or a
      // same-side bound constrains nothing about their relative drift. We
      // require bounds on the signed drift (leftTime − rightTime) in BOTH
      // directions (an upper and a lower bound, the shape of the
      // reference's BETWEEN example): one-sided drift still accumulates
      // unbounded state on one side. Three accepted shapes (r10 ADVICE):
      //  - operand-per-side: l.rowtime <= r.rowtime + INTERVAL '1' HOUR,
      //    where each operand is the MONOTONIC event time of one side
      //    plus optional time-free interval arithmetic (a raw time-typed
      //    reference is not enough: EXTRACT(HOUR FROM rowtime) wraps
      //    around and bounds nothing);
      //  - difference-style: (r.rowtime − l.rowtime) BETWEEN INTERVAL '0'
      //    SECOND AND INTERVAL '1' HOUR — the difference references both
      //    sides, the comparand is time-free; </> bound the signed
      //    difference above/below per its orientation;
      //  - exact equality l.rowtime = r.rowtime (drift bounded to zero).
      // Only CONJUNCTIVE positions count: an inequality under an OR
      // branch guarantees nothing.
      case j: Join if j.left.isStreaming && j.right.isStreaming && {
        val leftOut = j.left.outputSet
        val rightOut = j.right.outputSet
        // monotonic event time + interval arithmetic: monotonic(), or a
        // binary op combining a monotonicArith with a reference-free
        // (literal interval) operand — covers TimeAdd/DatetimeSub shapes
        def monotonicArith(e: Expression): Boolean = monotonic(e) || (e match {
          // the analyzer wraps interval arithmetic in casts:
          // rowtime + INTERVAL '1' HOUR → cast(rowtime + iv AS timestamp)
          case c: Cast if isTimeType(c.dataType) => monotonicArith(c.child)
          // subtraction is only monotonic in its LEFT operand:
          // (literal_ts − rowtime) DECREASES in rowtime, so crediting it
          // would flip a bound's direction (r11 ADVICE) — e.g.
          // (TS − l.rowtime) >= (TS − r.rowtime) means l <= r, an UPPER
          // bound on the drift, not the lower bound the shape suggests
          case b @ (_: Subtract | _: SubtractTimestamps | _: SubtractDates) =>
            val s = b.asInstanceOf[BinaryExpression]
            monotonicArith(s.left) && s.right.references.isEmpty
          case b: BinaryExpression =>
            (monotonicArith(b.left) && b.right.references.isEmpty) ||
              (monotonicArith(b.right) && b.left.references.isEmpty)
          case _ => false
        })
        // Some(true)=rooted in LEFT side's event time, Some(false)=right
        def sideOf(e: Expression): Option[Boolean] =
          if (!monotonicArith(e)) None
          else {
            val l = e.references.exists(leftOut.contains)
            val r = e.references.exists(rightOut.contains)
            if (l && !r) Some(true) else if (r && !l) Some(false) else None
          }
        // a subtraction of one side's monotonic time from the other's:
        // Some(true) = (leftTime − rightTime), Some(false) = reversed
        def diffOrientation(e: Expression): Option[Boolean] = e match {
          case c: Cast => diffOrientation(c.child)
          case b @ (_: Subtract | _: SubtractTimestamps | _: SubtractDates) =>
            val s = b.asInstanceOf[BinaryExpression]
            (sideOf(s.left), sideOf(s.right)) match {
              case (Some(true), Some(false)) => Some(true)
              case (Some(false), Some(true)) => Some(false)
              case _ => None
            }
          case _ => None
        }
        // which drift directions the condition bounds:
        // "upper" = (leftTime − rightTime) bounded above, "lower" = below
        var upper, lower = false
        def credit(orientation: Option[Boolean], boundsAbove: Boolean): Unit =
          orientation.foreach { lMinusR =>
            if (if (lMinusR) boundsAbove else !boundsAbove) upper = true
            else lower = true
          }
        def conjuncts(e: Expression): Seq[Expression] = e match {
          case And(l, r) => conjuncts(l) ++ conjuncts(r)
          // the analyzer keeps BETWEEN as a RuntimeReplaceable Between
          // node (its replacement uses With/CommonExpressionRef, which
          // hides the operand) — lower it to its two comparisons here
          case b: Between =>
            Seq(GreaterThanOrEqual(b.input, b.lower), LessThanOrEqual(b.input, b.upper))
          case other => Seq(other)
        }
        j.condition.toSeq.flatMap(conjuncts).foreach {
          case cmp: BinaryComparison =>
            val lSide = sideOf(cmp.left); val rSide = sideOf(cmp.right)
            val lFree = cmp.left.references.isEmpty
            val rFree = cmp.right.references.isEmpty
            cmp match {
              case _: EqualTo | _: EqualNullSafe =>
                // cross-side equality, or (diff = interval): both bounds
                if ((lSide == Some(true) && rSide == Some(false)) ||
                    (lSide == Some(false) && rSide == Some(true)) ||
                    (rFree && diffOrientation(cmp.left).isDefined) ||
                    (lFree && diffOrientation(cmp.right).isDefined)) {
                  upper = true; lower = true
                }
              case _: LessThan | _: LessThanOrEqual =>
                (lSide, rSide) match {
                  case (Some(true), Some(false)) => upper = true
                  case (Some(false), Some(true)) => lower = true
                  case _ =>
                    if (rFree) credit(diffOrientation(cmp.left), boundsAbove = true)
                    if (lFree) credit(diffOrientation(cmp.right), boundsAbove = false)
                }
              case _: GreaterThan | _: GreaterThanOrEqual =>
                (lSide, rSide) match {
                  case (Some(true), Some(false)) => lower = true
                  case (Some(false), Some(true)) => upper = true
                  case _ =>
                    if (rFree) credit(diffOrientation(cmp.left), boundsAbove = false)
                    if (lFree) credit(diffOrientation(cmp.right), boundsAbove = true)
                }
              case _ => ()
            }
          case _ => ()
        }
        !(upper && lower)
      } =>
        throw new IllegalArgumentException(
          "Stream-to-stream join requires a two-sided time bound: interval " +
            "conditions relating the event-time columns of BOTH inputs (e.g. " +
            "s1.rowtime BETWEEN s2.rowtime AND s2.rowtime + INTERVAL '1' HOUR) " +
            "— unbounded state otherwise " +
            "(reference: site/_docs/stream.md 'Joining streams')")
      case _ => ()
    }
  }
}
