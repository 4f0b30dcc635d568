package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE — row-pattern matching over partitioned, ordered rows.
  *
  * The reference compiles the pattern regex to an NFA/DFA and runs it over
  * the sorted input (reference: core/src/main/java/org/apache/calcite/runtime/Pattern.java,
  * Automaton.java, AutomatonBuilder.java, Matcher.java; logical operator
  * rel/core/Match.java:57; physical adapter/enumerable/EnumerableMatch.java:66;
  * SQL node sql/SqlMatchRecognize.java:35).
  *
  * Spark-first shape: `ds.groupByKey(partition).flatMapGroups` — each
  * partition key's rows are sorted in memory and scanned by a backtracking
  * matcher with SQL:2016 PREFERENCE semantics: leftmost-preferred, i.e.
  * alternation left-to-right and greedy quantifiers, first accepting path
  * wins — the same preferment the reference's automaton implements
  * (runtime/Matcher.java). ONE ROW PER MATCH + AFTER MATCH SKIP PAST LAST
  * ROW semantics, Match.java:57 defaults.
  *
  * Scale notes: the shuffle is one hash exchange on the partition key —
  * identical to what any engine needs for this operator. Per-key groups are
  * sorted in executor memory; MATCH_RECOGNIZE partitions are user-bounded
  * (sessions, devices, symbols) so this holds at 100 TB total as long as a
  * single key's history fits an executor — the same contract Spark's own
  * `flatMapGroupsWithState` imposes. The streaming variant maps to
  * flatMapGroupsWithState with the NFA state in the state store.
  */
object MatchRecognize {

  /** Row-pattern AST — mirrors the reference's Pattern ops
    * (runtime/Pattern.java: SEQ, OR, REPEAT, STAR, PLUS, OPTIONAL; the
    * SQL-level PERMUTE and `{- -}` exclusion of SqlMatchRecognize.java —
    * PATTERN_PERMUTE/PATTERN_EXCLUDE in SqlStdOperatorTable). */
  sealed trait Pat
  object Pat {
    final case class Sym(name: String) extends Pat
    final case class Cat(ps: Seq[Pat]) extends Pat
    final case class Alt(ps: Seq[Pat]) extends Pat
    /** min..max repetitions; max = -1 for unbounded. `greedy = false` is
      * the reluctant form (`*?` `+?` `??` `{m,n}?`): prefer the FEWEST
      * repetitions, java.util.regex preferment. */
    final case class Rep(p: Pat, min: Int, max: Int,
        greedy: Boolean = true) extends Pat
    /** `{- p -}`: rows matched inside are part of the match (and visible
      * to measures) but excluded from ALL ROWS PER MATCH output
      * (SQL:2016 row-pattern exclusion). */
    final case class Excl(p: Pat) extends Pat
    def plus(p: Pat): Pat = Rep(p, 1, -1)
    def star(p: Pat): Pat = Rep(p, 0, -1)
    def opt(p: Pat): Pat = Rep(p, 0, 1)
    def atLeast(p: Pat, n: Int): Pat = Rep(p, n, -1)
    /** PERMUTE(p1..pn): any order of the operands. SQL:2016 defines it
      * as the alternation of all permutations in LEXICOGRAPHIC order of
      * the operand positions — which fixes the preference order — and
      * that is exactly how it expands (the reference's parser expands
      * PERMUTE the same way). */
    def permute(ps: Pat*): Pat =
      Alt(ps.toIndexedSeq.permutations.map(perm => Cat(perm)).toSeq)
    /** Can the pattern match zero rows? (Position-independent: a
      * zero-width match evaluates no predicates.) */
    def nullable(p: Pat): Boolean = p match {
      case Sym(_) => false
      case Cat(ps) => ps.forall(nullable)
      case Alt(ps) => ps.exists(nullable)
      case Rep(q, min, _, _) => min == 0 || nullable(q)
      case Excl(q) => nullable(q)
    }
  }

  /** DEFINE predicate: (current row, previous row in partition) => matches.
    * The previous row enables PREV()-style conditions
    * (reference: SqlStdOperatorTable PREV :1734-1759). */
  type Define = (Row, Option[Row]) => Boolean

  /** DEFINE default for symbols the clause leaves undefined (SQL:2016:
    * such variables match every row). */
  val alwaysTrue: Define = (_, _) => true

  /** Zero-copy view of the partial match under construction during one
    * anchored attempt: rows[start, end) with their current-path
    * classifiers. RUNNING aggregates in DEFINE (SQL:2016 §R010 —
    * `DEFINE B AS SUM(B.value) <= k`, the reference's own disabled
    * match.iq:55-85 block: its enumerable engine never implemented
    * aggregates in DEFINE) evaluate against this view; the candidate row
    * itself is NOT part of the view — the predicate decides its
    * inclusion per the variable under test. */
  final class Partial private[MatchRecognize] (
      rows: IndexedSeq[Row], syms: Array[String],
      val start: Int, val end: Int) {
    /** Number of rows matched so far in this attempt. */
    def size: Int = end - start
    /** The row `n` positions before the candidate in PARTITION order —
      * SQL:2016 PREV(col, n) navigates the partition, not the match, so
      * it can reach rows before the match start. n=0 is the candidate
      * itself (None here: the caller already holds it). */
    def prevRow(n: Int): Option[Row] =
      if (n <= 0 || end - n < 0) None else Some(rows(end - n))
    /** The row `n` positions AFTER the candidate in PARTITION order —
      * SQL:2016 NEXT(col, n) physical lookahead (SqlStdOperatorTable
      * NEXT :1750; a navigation the reference's enumerable engine never
      * executes). Sets [[touchedEnd]] when the buffer ends first: in
      * batch that simply means "no such row" (NULL semantics), while the
      * streaming matcher must hold the attempt back — the value could
      * arrive with the next micro-batch. */
    def nextRow(n: Int): Option[Row] =
      if (n <= 0) None
      else if (end + n >= rows.length) { touchedEnd = true; None }
      else Some(rows(end + n))
    /** True once navigation reached past the buffered rows. */
    private[MatchRecognize] var touchedEnd: Boolean = false
    /** Rows the variable has matched so far, in match order (exclusion
      * markers stripped — `{- -}` affects output, not aggregation). */
    def rowsOf(v: String): IndexedSeq[Row] = {
      val b = IndexedSeq.newBuilder[Row]
      var i = start
      while (i < end) {
        if (syms(i) == v || (syms(i) != null && syms(i).length == v.length + 1 &&
            syms(i).charAt(0) == '~' && syms(i).endsWith(v))) b += rows(i)
        i += 1
      }
      b.result()
    }
  }

  /** DEFINE predicate with full running-match context:
    * (candidate row, previous row in partition, partial match so far,
    * name of the variable under test) => matches. */
  type DefineCtx = (Row, Option[Row], Partial, String) => Boolean

  private val alwaysTrueCtx: DefineCtx = (_, _, _, _) => true

  /** Lift plain (row, prev) defines into the context form and merge the
    * context-aware ones on top. */
  private def lift(defines: Map[String, Define],
      ctx: Map[String, DefineCtx]): Map[String, DefineCtx] =
    defines.map { case (k, f) =>
      k -> ((r: Row, p: Option[Row], _: Partial, _: String) => f(r, p))
    } ++ ctx

  /** Result of one anchored match attempt: the PREFERRED complete match
    * (if any) plus whether some explored path ran off the end of the
    * buffer — i.e. the attempt could complete, or a MORE-preferred path
    * could complete, given more rows. The streaming matcher uses `hitEnd`
    * to hold back rows instead of declaring failure (the reference's
    * Matcher keeps partial automaton states across input for the same
    * reason). `best` may be an empty match (end == start) when the
    * pattern is nullable and its preferred path consumes nothing. */
  private final case class Attempt(
      best: Option[(Int, Array[String])], hitEnd: Boolean)

  /** Backtracking match of `pattern` anchored at `start`, SQL:2016
    * preference order (leftmost-preferred, NOT POSIX-longest): paths are
    * explored alternatives-left-to-right and greedy-quantifiers-most-
    * repetitions-first, and the FIRST accepting path is THE match —
    * `PATTERN (A | A B)` matches `A` even where `A B` also accepts,
    * mirroring the reference's automaton (runtime/Matcher.java) and
    * java.util.regex preferment. */
  private def matchAt(
      pattern: Pat,
      rows: IndexedSeq[Row],
      start: Int,
      defines: Map[String, DefineCtx],
      limit: Int = Int.MaxValue): Attempt = {
    // `limit` is the WITHIN horizon: the first row index past the anchor's
    // time bound. A path stopped by the horizon FAILS WITHOUT hitEnd when
    // the horizon lies inside the buffer (later input is later still, so
    // no future row can fall back under the bound — the attempt's outcome
    // is already decided); only running off the buffer itself sets hitEnd.
    val end = math.min(limit, rows.length)
    val syms = new Array[String](rows.length)
    var best: Option[(Int, Array[String])] = None
    var hitEnd = false
    // > 0 while matching inside a `{- -}` exclusion: assigned classifiers
    // get the "~" marker so output stages can drop the rows (backtracking
    // re-assigns a position on every alternative path, so markers from
    // abandoned paths never survive into an accepted match).
    var exclDepth = 0

    def go(p: Pat, pos: Int)(k: Int => Boolean): Boolean = p match {
      case Pat.Sym(name) =>
        if (pos >= end) { if (pos >= rows.length) hitEnd = true; false }
        else {
          val prev = if (pos == 0) None else Some(rows(pos - 1))
          // a pattern variable with no DEFINE matches any row (SQL:2016
          // §R020; the reference's undefined symbols — e.g. the leading S
          // in match.iq's PATTERN (S UP) — behave the same way)
          val part = new Partial(rows, syms, start, pos)
          val ok = defines.getOrElse(name, alwaysTrueCtx)(
            rows(pos), prev, part, name)
          // NEXT() ran off the buffer: the decision could change once
          // more rows arrive — streaming holds the attempt back exactly
          // like a path that ran off the end
          if (part.touchedEnd) hitEnd = true
          ok && { syms(pos) = if (exclDepth > 0) "~" + name else name; k(pos + 1) }
        }
      case Pat.Cat(ps) =>
        def cat(i: Int, q: Int): Boolean =
          if (i == ps.length) k(q) else go(ps(i), q)(r => cat(i + 1, r))
        cat(0, pos)
      case Pat.Alt(ps) => ps.exists(alt => go(alt, pos)(k))
      case Pat.Excl(inner) =>
        // depth bookkeeping across backtracking: the continuation runs
        // OUTSIDE the exclusion, so depth drops before k and is restored
        // when k fails back into the exclusion's remaining alternatives.
        exclDepth += 1
        val matched = go(inner, pos) { q =>
          exclDepth -= 1
          val ok = k(q)
          if (!ok) exclDepth += 1
          ok
        }
        if (!matched) exclDepth -= 1
        matched
      case Pat.Rep(inner, min, max, greedy) =>
        // greedy: consume as many as allowed, then fall back. Zero-width
        // iteration handling follows regex preferment exactly: an
        // iteration whose body matches EMPTY exits the loop THROUGH that
        // path (`k(q)`, in the body's own preference position) — it does
        // not fail the path and fall to less-preferred non-empty body
        // alternatives first. An empty body match also proves min is
        // satisfiable by empty repetitions (matching empty evaluates no
        // predicates), mirroring regex {m,n} semantics.
        val minSatisfiableEmpty = Pat.nullable(inner)
        if (greedy) {
          def rep(count: Int, q: Int): Boolean = {
            val more = (max < 0 || count < max) &&
              go(inner, q)(r => if (r > q) rep(count + 1, r) else k(q))
            more || ((count >= min || minSatisfiableEmpty) && k(q))
          }
          rep(0, pos)
        } else {
          // reluctant (`*?`): FEWEST repetitions first — the exit is
          // tried before another iteration, but ONLY once `min` real
          // iterations ran; below `min` the loop must iterate, and each
          // iteration follows its own internal preference (a greedy body
          // still consumes greedily inside a reluctant loop). A zero-
          // width iteration exits the loop through that path (`k(q)`),
          // exactly like the greedy branch — java.util.regex preferment
          // (MatcherHammer's 2M differential fuzz pins this).
          def rep(count: Int, q: Int): Boolean = {
            val exit = count >= min && k(q)
            exit || ((max < 0 || count < max) &&
              go(inner, q)(r => if (r > q) rep(count + 1, r) else k(q)))
          }
          rep(0, pos)
        }
    }

    go(pattern, start) { end =>
      best = Some((end, syms.clone()))
      true // first accept in preference order IS the match — stop here
    }
    Attempt(best, hitEnd)
  }

  /** AFTER MATCH SKIP policy (reference: SqlMatchRecognize.AfterOption /
    * rel/core/Match after clause): where the next attempt anchors after a
    * completed match. */
  sealed trait Skip
  object Skip {
    /** Default: resume after the match's last row (non-overlapping). */
    case object PastLastRow extends Skip
    /** Resume at the row after the match's FIRST row (overlap allowed). */
    case object ToNextRow extends Skip
    /** Resume AT the first row the named variable matched (SQL:2016
      * AFTER MATCH SKIP TO FIRST var — the skipped-to row can anchor the
      * next match, e.g. a shared peak between adjacent V-shapes).
      * `members` carries a SUBSET union variable's expansion: the target
      * matches any member classifier. */
    final case class ToFirst(variable: String,
        members: Set[String] = Set.empty) extends Skip
    /** Resume AT the last row the named variable matched (SKIP TO LAST
      * var — the canonical ticker example's mode). */
    final case class ToLast(variable: String,
        members: Set[String] = Set.empty) extends Skip
  }

  /** WITHIN horizon: the first index past `within` of the anchor's order
    * value (rows are sorted by it, so binary search). Int.MaxValue = no
    * bound. The bound is INCLUSIVE — a match may span exactly the
    * interval (last.ord - first.ord <= within), matching the
    * duration-filter oracle formulation. */
  private def horizonFor(rows: IndexedSeq[Row], i: Int,
      within: Option[Long], ordOf: Row => Long): Int = within match {
    case None => Int.MaxValue
    case Some(w) =>
      val bound = ordOf(rows(i)) + w
      var lo = i
      var hi = rows.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ordOf(rows(mid)) <= bound) lo = mid + 1 else hi = mid
      }
      lo
  }

  /** Pattern-matching scan with the given AFTER MATCH SKIP policy.
    * Bounded-input (batch) semantics: end-of-input means no extension.
    * `within` bounds a match's duration (SqlMatchRecognize's interval
    * operand, reference sql/SqlMatchRecognize.java getInterval): rows
    * past anchor.ord + within are invisible to the attempt, so a greedy
    * quantifier truncates at the horizon exactly like Flink CEP's
    * time-bounded NFA. Requires `ordOf` (the ORDER BY value). */
  def findMatches(
      rows: IndexedSeq[Row],
      pattern: Pat,
      defines: Map[String, Define],
      skip: Skip = Skip.PastLastRow,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None,
      ordOf: Row => Long = null)
      : Seq[IndexedSeq[(Row, String)]] = {
    val defs = lift(defines, ctxDefines)
    val out = Seq.newBuilder[IndexedSeq[(Row, String)]]
    var i = 0
    while (i < rows.length) {
      matchAt(pattern, rows, i, defs,
          horizonFor(rows, i, within, ordOf)).best match {
        case Some((end, syms)) if end > i =>
          out += (i until end).map(j => (rows(j), syms(j)))
          i = advance(skip, i, end, syms)
        // empty preferred match (nullable pattern): nothing to emit, the
        // scan advances one row — java.util.regex's empty-match rule
        case _ => i += 1
      }
    }
    out.result()
  }

  /** AFTER MATCH advance: where the next attempt anchors after a match
    * over [i, end). SKIP TO [FIRST|LAST] var resumes AT the variable's
    * row; SQL:2016 makes a non-advancing target (the match's first row)
    * and an unmatched variable runtime errors — both would loop or
    * silently change semantics if papered over. */
  private def advance(skip: Skip, i: Int, end: Int,
      syms: Array[String]): Int = {
    def varAnchor(name: String, members: Set[String], last: Boolean): Int = {
      // classifier comparison is case-insensitive, like every other part of
      // the grammar: `SKIP TO LAST up` must hit PATTERN (... UP ...)
      val js = (i until end).filter { j =>
        val s = syms(j).stripPrefix("~")
        s.equalsIgnoreCase(name) || members.exists(_.equalsIgnoreCase(s))
      }
      if (js.isEmpty) throw new IllegalStateException(
        s"AFTER MATCH SKIP TO $name: variable matched no row")
      val j = if (last) js.last else js.head
      if (j <= i) throw new IllegalStateException(
        s"AFTER MATCH SKIP TO $name: target is the match's first row")
      j
    }
    skip match {
      case Skip.PastLastRow => end
      case Skip.ToNextRow => i + 1
      case Skip.ToFirst(v, ms) => varAnchor(v, ms, last = false)
      case Skip.ToLast(v, ms) => varAnchor(v, ms, last = true)
    }
  }

  /** Unbounded-input scan: emits only matches that cannot extend with
    * future rows, and reports the index from which rows must stay
    * buffered — either because an attempt hit the end of the buffer
    * (could complete/extend later) or because a complete match might
    * still grow, or because the AFTER MATCH policy re-anchors INSIDE an
    * emitted match (overlapping skip modes). Rows before that index are
    * consumed for good. */
  def findMatchesStreaming(
      rows: IndexedSeq[Row],
      pattern: Pat,
      defines: Map[String, Define],
      skip: Skip = Skip.PastLastRow,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None,
      ordOf: Row => Long = null)
      : (Seq[IndexedSeq[(Row, String)]], Int) = {
    val defs = lift(defines, ctxDefines)
    val out = Seq.newBuilder[IndexedSeq[(Row, String)]]
    var i = 0
    var retainFrom = rows.length
    var open = false
    while (i < rows.length && !open) {
      // WITHIN sharpens streaming emission: an attempt whose horizon ends
      // INSIDE the buffer is decided now (no future row can be in-bound),
      // so matchAt reports no hitEnd for it and rows release promptly.
      val attempt = matchAt(pattern, rows, i, defs,
        horizonFor(rows, i, within, ordOf))
      if (attempt.hitEnd) {
        // a viable path wants more input: hold everything from i
        retainFrom = i
        open = true
      } else attempt.best match {
        case Some((end, syms)) if end > i =>
          out += (i until end).map(j => (rows(j), syms(j)))
          i = advance(skip, i, end, syms)
        case _ => i += 1 // no match, or empty preferred match
      }
    }
    (out.result(), retainFrom)
  }

  /** Generic batch MATCH_RECOGNIZE over a Long partition key. */
  def matchRecognize[Out: org.apache.spark.sql.Encoder](
      df: DataFrame,
      partitionKey: Row => Long,
      orderKey: Row => (Long, Long),
      pattern: Pat,
      defines: Map[String, Define],
      measure: (Long, IndexedSeq[(Row, String)]) => Out,
      skip: Skip = Skip.PastLastRow,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None)
      : org.apache.spark.sql.Dataset[Out] = {
    import df.sparkSession.implicits._
    df.groupByKey(partitionKey)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val rows = it.toIndexedSeq.sortBy(orderKey)
        // ONE ROW PER MATCH: measures see every matched row, exclusion
        // markers stripped (SQL:2016 — `{- -}` affects only ALL ROWS
        // output, not aggregation)
        findMatches(rows, pattern, defines, skip, ctxDefines,
            within, r => orderKey(r)._1).iterator
          .map(m => measure(key, m.map { case (r, s) => (r, s.stripPrefix("~")) }))
      }
  }

  /** ALL ROWS PER MATCH: one OUTPUT row per MATCHED INPUT row, carrying
    * the per-row CLASSIFIER() and MATCH_NUMBER() (reference:
    * SqlMatchRecognize RowsPerMatchOption.ALL_ROWS, the match.iq
    * per-row goldens). `emit(partitionKey, matchNumber, rowIndexInMatch,
    * row, classifier)`. */
  def matchRecognizeAllRows[Out: org.apache.spark.sql.Encoder](
      df: DataFrame,
      partitionKey: Row => Long,
      orderKey: Row => (Long, Long),
      pattern: Pat,
      defines: Map[String, Define],
      skip: Skip = Skip.PastLastRow,
      emit: (Long, Int, Int, Row, String) => Out,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None)
      : org.apache.spark.sql.Dataset[Out] = {
    import df.sparkSession.implicits._
    df.groupByKey(partitionKey)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val rows = it.toIndexedSeq.sortBy(orderKey)
        // rows matched inside `{- -}` exclusions carry a "~" marker:
        // part of the match, omitted from ALL ROWS output (SQL:2016).
        // `ri` numbers the SURVIVING rows so output stays dense.
        findMatches(rows, pattern, defines, skip, ctxDefines,
            within, r => orderKey(r)._1).iterator.zipWithIndex.flatMap {
          case (m, mi) => m.iterator.filter(!_._2.startsWith("~"))
            .zipWithIndex.map {
              case ((row, sym), ri) => emit(key, mi + 1, ri, row, sym)
            }
        }
      }
  }

  /** ALL ROWS PER MATCH with whole-match context: `emitMatch` receives the
    * full match (exclusion markers intact) and returns that match's output
    * rows. RUNNING/FINAL aggregate measures (SQL:2016 §R030 — per-row
    * prefix aggregates vs whole-match aggregates) need this view; the
    * per-row `emit` of [[matchRecognizeAllRows]] cannot see past its row. */
  def matchRecognizeAllRowsFull[Out: org.apache.spark.sql.Encoder](
      df: DataFrame,
      partitionKey: Row => Long,
      orderKey: Row => (Long, Long),
      pattern: Pat,
      defines: Map[String, Define],
      skip: Skip = Skip.PastLastRow,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None)(
      emitMatch: (Long, Int, IndexedSeq[(Row, String)]) => Iterator[Out])
      : org.apache.spark.sql.Dataset[Out] = {
    import df.sparkSession.implicits._
    df.groupByKey(partitionKey)
      .flatMapGroups { (key: Long, it: Iterator[Row]) =>
        val rows = it.toIndexedSeq.sortBy(orderKey)
        findMatches(rows, pattern, defines, skip, ctxDefines,
            within, r => orderKey(r)._1).iterator
          .zipWithIndex.flatMap { case (m, mi) => emitMatch(key, mi + 1, m) }
      }
  }

  /** Streaming MATCH_RECOGNIZE: the NFA state (the unconsumed row buffer)
    * lives in the state store, matches emit in append mode — the
    * `flatMapGroupsWithState` mapping SURVEY.md §7 prescribes for the
    * reference's streaming Match. Emission policy: a match is emitted only
    * once no viable pattern path could extend it with future rows;
    * attempts that hit the end of the buffer hold their rows in state.
    * Assumes per-key event-time-ordered arrival across micro-batches
    * (replay sources and watermarked upstreams provide this).
    */
  def matchRecognizeStream[Out: org.apache.spark.sql.Encoder](
      df: DataFrame,
      partitionKey: Row => Long,
      orderKey: Row => (Long, Long),
      pattern: Pat,
      defines: Map[String, Define],
      measure: (Long, IndexedSeq[(Row, String)]) => Out,
      skip: Skip = Skip.PastLastRow,
      ctxDefines: Map[String, DefineCtx] = Map.empty,
      within: Option[Long] = None)
      : org.apache.spark.sql.Dataset[Out] = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val stateEnc: org.apache.spark.sql.Encoder[IndexedSeq[Row]] =
      org.apache.spark.sql.Encoders.kryo[IndexedSeq[Row]]
    df.groupByKey(partitionKey)
      .flatMapGroupsWithState[IndexedSeq[Row], Out](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[Row], state: GroupState[IndexedSeq[Row]]) =>
          val buffered = state.getOption.getOrElse(IndexedSeq.empty)
          val all = (buffered ++ it).sortBy(orderKey)
          val (matches, retainFrom) =
            findMatchesStreaming(all, pattern, defines, skip, ctxDefines,
              within, r => orderKey(r)._1)
          state.update(all.drop(retainFrom))
          matches.iterator
            .map(m => measure(key, m.map { case (r, s) => (r, s.stripPrefix("~")) }))
      }
  }

  private[graft] def tsMicros(r: Row, field: String): Long = {
    val t = r.getAs[java.sql.Timestamp](field)
    (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
  }

  final case class ClickRun(user_id: Long, n_clicks: Long, purchase_id: Long)
  final case class VShape(user_id: Long, len: Long, start_id: Long, end_id: Long)
  final case class PermutePair(user_id: Long, mn: Long, ri: Long,
      event_id: Long, classifier: String)
  final case class ExclRow(user_id: Long, event_id: Long, classifier: String)

  val defs: Seq[QDef] = Seq(

    // ---- Pattern: CLICK{3,} PURCHASE per user, ordered by event time ------
    // MATCH_RECOGNIZE (PARTITION BY user_id ORDER BY ts
    //   MEASURES COUNT(C.*) AS n_clicks, P.event_id AS purchase_id
    //   ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
    //   PATTERN (C{3,} P)
    //   DEFINE C AS event_type = 'click', P AS event_type = 'purchase')
    // Oracle: gaps-and-islands formulation of the same semantics.
    QDef.sql("match_recognize_runs",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, event_type, max(rn) AS end_rn, count(*) AS len
        |  FROM runs GROUP BY user_id, event_type, grp
        |)
        |SELECT p.user_id, i.len AS n_clicks, p.event_id AS purchase_id
        |FROM seq p
        |JOIN islands i ON p.user_id = i.user_id AND i.event_type = 'click'
        |              AND i.end_rn = p.rn - 1 AND i.len >= 3
        |WHERE p.event_type = 'purchase'""") { (s, dir) =>
      import Pat._
      val ev = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      implicit val enc: org.apache.spark.sql.Encoder[ClickRun] =
        org.apache.spark.sql.Encoders.product[ClickRun]
      matchRecognize[ClickRun](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = r => (tsMicros(r, "ts"), r.getAs[Long]("event_id")),
        pattern = Cat(Seq(atLeast(Sym("C"), 3), Sym("P"))),
        defines = Map(
          "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
          "P" -> ((r, _) => r.getAs[String]("event_type") == "purchase")),
        measure = (key, m) => ClickRun(
          user_id = key,
          n_clicks = m.count(_._2 == "C").toLong,
          purchase_id = m.last._1.getAs[Long]("event_id"))
      ).toDF()
    },

    // ---- Pattern with PREV(): falling-then-rising value (V-shape) ---------
    // DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value) —
    // exercises the PREV navigation the reference implements in
    // EnumerableMatch.java's history buffer. Oracle: greedy (DOWN+ UP+)
    // with SKIP PAST LAST ROW consumes whole maximal runs, so a match is
    // exactly a maximal falling run immediately followed by a rising run —
    // gaps-and-islands over the lag-classified direction, D-islands joined
    // to the U-island starting at the next row.
    QDef.sql("match_recognize_vshape",
      """WITH seq AS (
        |  SELECT user_id, event_id,
        |    row_number() OVER w AS rn,
        |    CASE WHEN value < lag(value) OVER w THEN 'D'
        |         WHEN value > lag(value) OVER w THEN 'U'
        |         ELSE 'F' END AS dir
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, dir, min(rn) AS srn, max(rn) AS ern,
        |    count(*) AS n, arg_min(event_id, rn) AS sid, arg_max(event_id, rn) AS eid
        |  FROM runs GROUP BY user_id, dir, grp
        |)
        |SELECT d.user_id, CAST(d.n + u.n AS BIGINT) AS len,
        |  d.sid AS start_id, u.eid AS end_id
        |FROM islands d JOIN islands u
        |  ON u.user_id = d.user_id AND d.dir = 'D' AND u.dir = 'U'
        | AND u.srn = d.ern + 1""") { (s, dir) =>
      import Pat._
      val ev = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "value", "ts")
      implicit val enc: org.apache.spark.sql.Encoder[VShape] =
        org.apache.spark.sql.Encoders.product[VShape]
      matchRecognize[VShape](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = r => (tsMicros(r, "ts"), r.getAs[Long]("event_id")),
        pattern = Cat(Seq(plus(Sym("DOWN")), plus(Sym("UP")))),
        defines = Map(
          "DOWN" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") < p.getAs[Double]("value"))),
          "UP" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") > p.getAs[Double]("value")))),
        measure = (key, m) => VShape(
          user_id = key,
          len = m.length.toLong,
          start_id = m.head._1.getAs[Long]("event_id"),
          end_id = m.last._1.getAs[Long]("event_id"))
      ).toDF()
    },

    // ---- PERMUTE: any-order operands (SqlMatchRecognize PATTERN_PERMUTE) --
    // PATTERN (PERMUTE(C, E)) — a click/error pair in EITHER order — with
    // ALL ROWS PER MATCH and AFTER MATCH SKIP TO NEXT ROW, so every
    // qualifying 2-row window emits (overlap allowed). The oracle is the
    // lead()-pair formulation: a row whose (type, next-type) is a
    // permutation of (click, error); per-key match numbers are the rank of
    // qualifying start rows.
    QDef.sql("match_recognize_permute",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), pairs AS (
        |  SELECT user_id, rn, event_id, event_type,
        |         lead(event_id) OVER w AS nid, lead(event_type) OVER w AS ntype
        |  FROM seq WINDOW w AS (PARTITION BY user_id ORDER BY rn)
        |), m AS (
        |  SELECT *, rank() OVER (PARTITION BY user_id ORDER BY rn) AS mn
        |  FROM pairs
        |  WHERE (event_type = 'click' AND ntype = 'error')
        |     OR (event_type = 'error' AND ntype = 'click')
        |)
        |SELECT user_id, mn, CAST(0 AS BIGINT) AS ri, event_id,
        |  CASE WHEN event_type = 'click' THEN 'C' ELSE 'E' END AS classifier
        |FROM m
        |UNION ALL
        |SELECT user_id, mn, CAST(1 AS BIGINT) AS ri, nid,
        |  CASE WHEN ntype = 'click' THEN 'C' ELSE 'E' END
        |FROM m""") { (s, dir) =>
      import Pat._
      val ev = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      implicit val enc: org.apache.spark.sql.Encoder[PermutePair] =
        org.apache.spark.sql.Encoders.product[PermutePair]
      matchRecognizeAllRows[PermutePair](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = r => (tsMicros(r, "ts"), r.getAs[Long]("event_id")),
        pattern = permute(Sym("C"), Sym("E")),
        defines = Map(
          "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
          "E" -> ((r, _) => r.getAs[String]("event_type") == "error")),
        skip = Skip.ToNextRow,
        emit = (key, mn, ri, row, sym) => PermutePair(
          user_id = key, mn = mn.toLong, ri = ri.toLong,
          event_id = row.getAs[Long]("event_id"), classifier = sym)
      ).toDF()
    },

    // ---- Exclusion: {- C{2,} -} E (SqlMatchRecognize PATTERN_EXCLUDE) -----
    // ALL ROWS PER MATCH where the click run is matched but EXCLUDED from
    // output — only the terminating error row emits. Same match regions as
    // match_recognize_sql, so the oracle is its islands formulation
    // projected to the error row.
    QDef.sql("match_recognize_exclusion",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, event_type, max(rn) AS end_rn, count(*) AS len
        |  FROM runs GROUP BY user_id, event_type, grp
        |)
        |SELECT i.user_id, s2.event_id, 'E' AS classifier
        |FROM islands i
        |JOIN seq s2 ON s2.user_id = i.user_id AND s2.rn = i.end_rn + 1
        |WHERE i.event_type = 'click' AND i.len >= 2 AND s2.event_type = 'error'""") { (s, dir) =>
      import Pat._
      val ev = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "event_type", "ts")
      implicit val enc: org.apache.spark.sql.Encoder[ExclRow] =
        org.apache.spark.sql.Encoders.product[ExclRow]
      matchRecognizeAllRows[ExclRow](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = r => (tsMicros(r, "ts"), r.getAs[Long]("event_id")),
        pattern = Cat(Seq(Excl(atLeast(Sym("C"), 2)), Sym("E"))),
        defines = Map(
          "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
          "E" -> ((r, _) => r.getAs[String]("event_type") == "error")),
        skip = Skip.PastLastRow,
        emit = (key, _, _, row, sym) => ExclRow(
          user_id = key, event_id = row.getAs[Long]("event_id"),
          classifier = sym)
      ).toDF()
    },

    // ---- Reluctant quantifier through the SQL front end -------------------
    // PATTERN (C{2,}?): fewest-first matches EXACTLY 2 clicks per match, so
    // SKIP PAST LAST ROW pairs up each click run greedily from its start —
    // a run of length L yields floor(L/2) matches. (Greedy C{2,} would
    // consume whole runs: one match per run — the discriminating case.)
    // Oracle: islands × an unnested pair index.
    QDef.sql("match_recognize_reluctant",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, min(rn) AS srn, count(*) AS len
        |  FROM runs WHERE event_type = 'click' GROUP BY user_id, grp
        |  HAVING count(*) >= 2
        |), anchors AS (
        |  SELECT i.user_id, i.srn + 2 * t.k AS rn1
        |  FROM islands i, unnest(range(0, i.len // 2)) AS t(k)
        |)
        |SELECT a.user_id, s1.event_id AS first_id, s2.event_id AS last_id
        |FROM anchors a
        |JOIN seq s1 ON s1.user_id = a.user_id AND s1.rn = a.rn1
        |JOIN seq s2 ON s2.user_id = a.user_id AND s2.rn = a.rn1 + 1""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES FIRST(event_id) AS first_id, LAST(event_id) AS last_id
          |  PATTERN (C{2,}?)
          |  DEFINE C AS event_type = 'click')""".stripMargin)
    },

    // ---- AFTER MATCH SKIP TO LAST var (the canonical ticker shape) --------
    // PATTERN (STRT DOWN+ UP+) AFTER MATCH SKIP TO LAST UP: adjacent
    // V-shapes SHARE their peak row — the last UP anchors the next STRT.
    // Oracle: every adjacent (D-island, U-island) pair is a match whose
    // STRT is the row just before the decline (first rows are 'F', so a
    // D-island never starts a partition and the STRT row always exists);
    // SKIP PAST LAST ROW would shift or drop matches after shared peaks,
    // which is what the spec's W-shape golden pins.
    QDef.sql("match_recognize_skip_to_last",
      """WITH seq AS (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER w AS rn,
        |    CASE WHEN value < lag(value) OVER w THEN 'D'
        |         WHEN value > lag(value) OVER w THEN 'U'
        |         ELSE 'F' END AS dir
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, dir ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, dir, min(rn) AS srn, max(rn) AS ern, count(*) AS n,
        |    arg_max(event_id, rn) AS eid
        |  FROM runs GROUP BY user_id, dir, grp
        |)
        |SELECT d.user_id, CAST(d.n + u.n + 1 AS BIGINT) AS len,
        |  s.event_id AS start_id, u.eid AS end_id
        |FROM islands d
        |JOIN islands u ON u.user_id = d.user_id AND d.dir = 'D'
        |              AND u.dir = 'U' AND u.srn = d.ern + 1
        |JOIN seq s ON s.user_id = d.user_id AND s.rn = d.srn - 1""") { (s, dir) =>
      import Pat._
      val ev = Tables.t(s, dir, "events")
        .select("user_id", "event_id", "value", "ts")
      implicit val enc: org.apache.spark.sql.Encoder[VShape] =
        org.apache.spark.sql.Encoders.product[VShape]
      matchRecognize[VShape](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = r => (tsMicros(r, "ts"), r.getAs[Long]("event_id")),
        pattern = Cat(Seq(Sym("STRT"), plus(Sym("DOWN")), plus(Sym("UP")))),
        defines = Map(
          "DOWN" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") < p.getAs[Double]("value"))),
          "UP" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") > p.getAs[Double]("value")))),
        measure = (key, m) => VShape(
          user_id = key,
          len = m.length.toLong,
          start_id = m.head._1.getAs[Long]("event_id"),
          end_id = m.last._1.getAs[Long]("event_id")),
        skip = Skip.ToLast("UP")
      ).toDF()
    },

    // ---- SQL-syntax MATCH_RECOGNIZE (parser injection) --------------------
    // The SAME operator, but entered through the injected SQL grammar
    // (plans/GraftSqlParser + plans/MatchRecognizeSql — the analogue of the
    // reference's Parser.jj MatchRecognizeOpt production). Runs of 2+
    // clicks ending in an error; oracle is the gaps-and-islands rendering.
    QDef.sql("match_recognize_sql",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, event_type, min(rn) AS start_rn, max(rn) AS end_rn,
        |         count(*) AS len
        |  FROM runs GROUP BY user_id, event_type, grp
        |)
        |SELECT i.user_id, s1.event_id AS first_id, s2.event_id AS last_id,
        |       i.len AS n_clicks
        |FROM islands i
        |JOIN seq s1 ON s1.user_id = i.user_id AND s1.rn = i.start_rn
        |JOIN seq s2 ON s2.user_id = i.user_id AND s2.rn = i.end_rn + 1
        |WHERE i.event_type = 'click' AND i.len >= 2 AND s2.event_type = 'error'""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES FIRST(event_id) AS first_id, LAST(event_id) AS last_id,
          |           COUNT(C.*) AS n_clicks
          |  PATTERN (C{2,} E)
          |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin)
    },

    // ---- WITHIN: time-bounded matches (r6 VERDICT #5) ----------------------
    // PATTERN (C+ P) WITHIN INTERVAL '4' HOUR — the reference parses an
    // interval operand on SqlMatchRecognize (sql/SqlMatchRecognize.java
    // getInterval) but never executes it; here it bounds the match span:
    // rows past anchor.ts + interval are invisible to the attempt, so a
    // greedy C+ truncates at the horizon (Flink-CEP-style pruned NFA).
    // With SKIP PAST LAST ROW the surviving match per click-island is the
    // LEFTMOST anchor whose whole span (through the purchase) fits the
    // bound — which the oracle states in closed form: the earliest island
    // click with ts >= purchase.ts - interval (the purchase is the span's
    // latest row, so it alone decides feasibility).
    QDef.sql("match_recognize_within",
      """WITH seq AS (
        |  SELECT user_id, event_id, event_type, ts,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), runs AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id, event_type ORDER BY rn) AS grp
        |  FROM seq
        |), islands AS (
        |  SELECT user_id, min(rn) AS srn, max(rn) AS ern
        |  FROM runs WHERE event_type = 'click' GROUP BY user_id, grp
        |), cands AS (
        |  SELECT p.user_id, p.event_id AS purchase_id, p.ts AS pts, p.rn AS prn,
        |         i.srn, i.ern
        |  FROM seq p JOIN islands i ON p.user_id = i.user_id AND i.ern = p.rn - 1
        |  WHERE p.event_type = 'purchase'
        |)
        |SELECT c.user_id, CAST(c.prn - min(s.rn) AS BIGINT) AS n_clicks,
        |       c.purchase_id
        |FROM cands c JOIN seq s
        |  ON s.user_id = c.user_id AND s.rn BETWEEN c.srn AND c.ern
        |WHERE s.ts >= c.pts - INTERVAL 4 HOUR
        |GROUP BY c.user_id, c.prn, c.purchase_id""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES COUNT(C.*) AS n_clicks, P.event_id AS purchase_id
          |  PATTERN (C+ P)
          |  WITHIN INTERVAL '4' HOUR
          |  DEFINE C AS event_type = 'click', P AS event_type = 'purchase')""".stripMargin)
    },

    // ---- RUNNING aggregate in DEFINE: SUM-bounded packing (SQL:2016) -----
    // DEFINE B AS SUM(B.value) <= 150 — the aggregate runs over B's rows
    // so far INCLUDING the candidate; with greedy B* and SKIP PAST LAST
    // ROW the matcher becomes a sequential greedy packer (each match = one
    // bin: a free S row, then B rows while the bin's B-sum stays within
    // budget). The reference never ran this — its match.iq running-
    // aggregate block sits inside `!if (false)` (match.iq:55-85) because
    // the enumerable engine has no aggregates in DEFINE. The oracle
    // replays the identical greedy recurrence as a recursive CTE; both
    // sides accumulate the SAME double sequence in the SAME order, and
    // b_sum is rounded at 9 decimals per the repo determinism convention.
    QDef.sql("match_recognize_agg_define",
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events
        |), walk AS (
        |  SELECT user_id, rn, value, 1 AS bin, rn AS bin_start,
        |         CAST(0 AS DOUBLE) AS cum
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.user_id, s.rn, s.value,
        |    CASE WHEN w.cum + s.value <= 150 THEN w.bin ELSE w.bin + 1 END,
        |    CASE WHEN w.cum + s.value <= 150 THEN w.bin_start ELSE s.rn END,
        |    CASE WHEN w.cum + s.value <= 150 THEN w.cum + s.value
        |         ELSE CAST(0 AS DOUBLE) END
        |  FROM seq s JOIN walk w ON s.user_id = w.user_id AND s.rn = w.rn + 1
        |), bins AS (
        |  SELECT user_id, bin, bin_start, COUNT(*) AS n_rows,
        |    CASE WHEN COUNT(*) > 1
        |         THEN ROUND(SUM(CASE WHEN rn > bin_start THEN value END), 9)
        |    END AS b_sum
        |  FROM walk GROUP BY user_id, bin, bin_start
        |)
        |SELECT b.user_id, b.n_rows, s.event_id AS start_id, b.b_sum
        |FROM bins b JOIN seq s ON s.user_id = b.user_id AND s.rn = b.bin_start""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES COUNT(*) AS n_rows, FIRST(event_id) AS start_id,
          |           SUM(B.value) AS b_sum
          |  ONE ROW PER MATCH
          |  AFTER MATCH SKIP PAST LAST ROW
          |  PATTERN (S B*)
          |  DEFINE B AS SUM(B.value) <= 150)""".stripMargin)
        .withColumn("b_sum", round(col("b_sum"), 9))
    },

    // ---- RUNNING / FINAL aggregate measures in ALL ROWS PER MATCH --------
    // SQL:2016 §R030: RUNNING aggregates see the match prefix up to the
    // current row, FINAL the whole match — per OUTPUT row. Matches here
    // are maximal click runs (greedy A+ with SKIP PAST LAST ROW), so the
    // oracle is gaps-and-islands with a running windowed sum inside each
    // island. ts is pre-projected to epoch micros so the ALL ROWS
    // passthrough columns compare engine-exactly.
    QDef.sql("match_recognize_running_measures",
      """WITH seq AS (
        |  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS tsm, event_id,
        |         event_type, value,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |c AS (
        |  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM seq WHERE event_type = 'click')
        |SELECT user_id,
        |  DENSE_RANK() OVER (PARTITION BY user_id ORDER BY grp) AS mn,
        |  'A' AS cls,
        |  row_number() OVER w AS rc,
        |  COUNT(*) OVER (PARTITION BY user_id, grp) AS fc,
        |  ROUND(SUM(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9) AS rs,
        |  ROUND(SUM(value) OVER (PARTITION BY user_id, grp), 9) AS fs,
        |  tsm, event_id, event_type, value
        |FROM c
        |WINDOW w AS (PARTITION BY user_id, grp ORDER BY rn)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      Tables.t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("tsm"),
          col("event_id"), col("event_type"), col("value"))
        .createOrReplaceTempView("events_m")
      s.sql(
        """SELECT * FROM events_m MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY tsm, event_id
          |  MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls,
          |           RUNNING COUNT(*) AS rc, FINAL COUNT(*) AS fc,
          |           RUNNING SUM(A.value) AS rs, FINAL SUM(A.value) AS fs
          |  ALL ROWS PER MATCH
          |  PATTERN (A+)
          |  DEFINE A AS event_type = 'click')""".stripMargin)
        .withColumn("rs", round(col("rs"), 9))
        .withColumn("fs", round(col("fs"), 9))
    }
  )
}
