package graft.plans

import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.{Define, Pat}
import org.apache.spark.sql.{Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types._

/** SQL-syntax MATCH_RECOGNIZE — the parser front end for the
  * [[graft.operators.MatchRecognize]] operator, injected through
  * `SparkSessionExtensions.injectParser` (the Spark analogue of the
  * reference's parser-level support:
  * core/src/main/java/org/apache/calcite/sql/SqlMatchRecognize.java:35 and
  * the Parser.jj MatchRecognizeOpt production).
  *
  * Restricted grammar (enough for the reference's canonical examples;
  * keywords case-insensitive):
  * {{{
  * SELECT * FROM <table> MATCH_RECOGNIZE (
  *   PARTITION BY <col>                      -- integral column
  *   ORDER BY <col> [, <col>]               -- timestamp/integral [+ tiebreak]
  *   MEASURES <m> AS <name> [, ...]         -- m := COUNT(*) | COUNT(S.*)
  *                                          --    | FIRST(<col>) | LAST(<col>)
  *                                          --    | FIRST/LAST(v.col) | v.col
  *                                          --    | SUM(v.col) | <intlit>
  *                                          --    | [RUNNING|FINAL] COUNT(*)/SUM(v.col)
  *                                          --    | CLASSIFIER() | MATCH_NUMBER()
  *   [ONE ROW PER MATCH | ALL ROWS PER MATCH]
  *   AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] <var>
  *   PATTERN ( <pat> )                      -- symbols, | ( ) * + ? {m,n} {m,}
  *                                          --   reluctant *? +? ?? {m,n}?
  *                                          --   PERMUTE(p1, ..), {- p -}
  *   [WITHIN INTERVAL 'n' SECOND|MINUTE|HOUR|DAY]  -- match-span bound
  *   DEFINE S AS <pred> [, ...]             -- pred := conj of
  *                                          --   <col> op <lit | col | PREV(col)>
  *                                          --   | <col|v.col> op PREV(<col|v.col> [, n])
  *                                          -- or RUNNING-aggregate terms:
  *                                          --   addend (+ addend)* op <numlit>,
  *                                          --   addend := SUM|MIN|MAX|AVG(v.col)
  *                                          --   | SUM(CHAR_LENGTH(v.col [|| 'x']))
  *                                          --   | COUNT(v.*) | COUNT(*) | v.col
  *                                          --   | CHAR_LENGTH(v.col|'x') | numlit
  * )
  * }}}
  * Semantics follow the operator: ONE ROW PER MATCH with aggregate
  * measures (default) or ALL ROWS PER MATCH with per-row CLASSIFIER() /
  * MATCH_NUMBER() measures; AFTER MATCH SKIP PAST LAST ROW unless the
  * clause picks another mode. Unsupported syntax falls through to the
  * delegate parser untouched.
  */
object MatchRecognizeSql {

  /** Canonical MATCH_RECOGNIZE clause text, pinned on the lowered plan's
    * root so [[RelToSql]] can re-emit the statement (the reference keeps
    * the clause declaratively on its Match RelNode and renders it in
    * rel2sql; our lowered MapGroups holds closures, so the text IS the
    * declarative form). Catalyst copies tags through plan transforms, so
    * the tag survives analysis. */
  val RenderTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[String] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[String]("graft.matchRecognize.sql")

  private val Shell =
    ("""(?is)\s*SELECT\s+\*\s+FROM\s+(\w+)\s+MATCH_RECOGNIZE\s*\(\s*""" +
      """PARTITION\s+BY\s+(\w+)\s+ORDER\s+BY\s+(\w+)\s*(?:,\s*(\w+))?\s+""" +
      """MEASURES\s+(.*?)\s+(?:(ONE|ALL)\s+ROWS?\s+PER\s+MATCH\s+)?""" +
      """(?:AFTER\s+MATCH\s+SKIP\s+(.*?)\s+)?""" +
      """PATTERN\s*\(\s*(.*?)\s*\)\s+""" +
      """(?:WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)\s+)?""" +
      """(?:SUBSET\s+(.*?)\s+)?DEFINE\s+(.*?)\s*\)\s*""").r

  /** Attempt to parse; None when the text is not (our) MATCH_RECOGNIZE. */
  def tryParse(spark: SparkSession, sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Shell(table, partCol, ordCol, ordTie, measures, rowsMode,
          afterMatch, pattern, withinN, withinUnit, subsets, defines) =>
        // A statement can match the shell regex yet carry measures/defines
        // this restricted form does not support (or name an unknown table —
        // build() resolves it eagerly). Fall through to the delegate parser
        // so the user gets its canonical ParseException/AnalysisException
        // instead of an IllegalArgumentException from here. Only the two
        // EXPECTED rejection types fall through (ADVICE r3: a blanket
        // NonFatal catch would mask a genuine bug in the supported path
        // as a generic delegate ParseException).
        try Some(build(spark, table, partCol, ordCol, Option(ordTie),
          measures, Option(rowsMode), Option(afterMatch), pattern,
          Option(withinN).map(n => parseWithin(n, withinUnit)),
          Option(subsets), defines))
        catch {
          case _: IllegalArgumentException => None
          case _: org.apache.spark.sql.AnalysisException => None
        }
      case _ => None
    }

  /** MATCH_RECOGNIZE in a SUBQUERY: `SELECT ... FROM (SELECT * FROM t
    * MATCH_RECOGNIZE (...)) alias ...`. The whole-statement Shell cannot
    * see it, and Spark's own parser rejects the clause — so extract each
    * embedded `(SELECT * FROM <t> MATCH_RECOGNIZE (...))` fragment (by
    * balanced-paren scan), build its plan with [[tryParse]], hand the
    * outer text to the delegate with the fragment replaced by a stub
    * relation name, and splice the fragment plans back over the stubs.
    * This is what [[RelToSql]]'s re-render emits whenever a projection
    * sits above the tagged match (e.g. the determinism ROUND wrappers),
    * so the full-registry cycle gate depends on it. */
  def tryParseEmbedded(spark: SparkSession,
      delegate: org.apache.spark.sql.catalyst.parser.ParserInterface,
      sqlText: String): Option[LogicalPlan] = {
    val Opener =
      """(?is)\(\s*SELECT\s+\*\s+FROM\s+\w+\s+MATCH_RECOGNIZE\s*\(""".r
    if (Opener.findFirstIn(sqlText).isEmpty) return None
    var text = sqlText
    val stubs = scala.collection.mutable.Map.empty[String, LogicalPlan]
    var k = 0
    var found = true
    while (found) {
      Opener.findFirstMatchIn(text) match {
        case Some(m) =>
          // balance parens from the fragment's outer '(' — skipping
          // single-quoted literals (honoring '' escapes), so a quoted
          // '(' or ')' inside a DEFINE/MEASURES literal cannot mis-locate
          // the fragment close
          var depth = 0
          var i = m.start
          var close = -1
          while (i < text.length && close < 0) {
            text.charAt(i) match {
              case '\'' =>
                i += 1
                var inStr = true
                while (i < text.length && inStr) {
                  if (text.charAt(i) == '\'') {
                    // '' inside a literal is an escaped quote, not a close
                    if (i + 1 < text.length && text.charAt(i + 1) == '\'') i += 1
                    else inStr = false
                  }
                  i += 1
                }
                i -= 1 // compensate the shared increment below
              case '(' => depth += 1
              case ')' => depth -= 1; if (depth == 0) close = i
              case _ =>
            }
            i += 1
          }
          if (close < 0) return None // unbalanced — not ours
          val fragment = text.substring(m.start + 1, close)
          tryParse(spark, fragment) match {
            case Some(inner) =>
              val stub = s"__graft_mr_sub_$k"
              k += 1
              stubs(stub) = inner
              text = text.substring(0, m.start) + stub + text.substring(close + 1)
            case None => return None // unsupported inner form — delegate
          }
        case None => found = false
      }
    }
    val outer = try delegate.parsePlan(text)
      catch { case _: org.apache.spark.sql.catalyst.parser.ParseException =>
        return None }
    Some(outer.resolveOperatorsUp {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
          if r.multipartIdentifier.size == 1 &&
            stubs.contains(r.multipartIdentifier.head) =>
        stubs(r.multipartIdentifier.head)
    })
  }

  // ---- WITHIN ------------------------------------------------------------
  /** `PATTERN (...) WITHIN INTERVAL 'n' <unit>` (the reference parses an
    * interval operand on SqlMatchRecognize — sql/SqlMatchRecognize.java
    * getInterval). The bound converts to MICROSECONDS of the ORDER BY
    * column's time line (a timestamp ORDER BY key is epoch-micros in the
    * matcher), so a match's last-to-first row span must be <= it. */
  def parseWithin(amount: String, unit: String): Long = {
    val n = amount.toLong
    unit.toUpperCase match {
      case "SECOND" => n * 1000000L
      case "MINUTE" => n * 60L * 1000000L
      case "HOUR" => n * 3600L * 1000000L
      case "DAY" => n * 86400L * 1000000L
      case other => throw new IllegalArgumentException(
        s"unsupported WITHIN interval unit: $other")
    }
  }

  // ---- AFTER MATCH SKIP --------------------------------------------------
  /** SQL:2016 after-match options (SqlMatchRecognize.AfterOption):
    * PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] <var> (bare
    * `TO <var>` is shorthand for TO LAST <var>, as in the standard). */
  def parseSkip(text: String): MatchRecognize.Skip = {
    val t = text.trim.replaceAll("\\s+", " ")
    val up = t.toUpperCase
    if (up == "PAST LAST ROW") MatchRecognize.Skip.PastLastRow
    else if (up == "TO NEXT ROW") MatchRecognize.Skip.ToNextRow
    else if (up.startsWith("TO FIRST "))
      MatchRecognize.Skip.ToFirst(t.substring(9).trim.toUpperCase)
    else if (up.startsWith("TO LAST "))
      MatchRecognize.Skip.ToLast(t.substring(8).trim.toUpperCase)
    else if (up.startsWith("TO "))
      MatchRecognize.Skip.ToLast(t.substring(3).trim.toUpperCase)
    else throw new IllegalArgumentException(
      s"unsupported AFTER MATCH SKIP clause: '$text'")
  }

  /** Attach a SUBSET union variable's member set to a skip target —
    * name lookup case-insensitive, like the rest of the grammar. */
  private def resolveSubsetSkip(skip: MatchRecognize.Skip,
      subsets: Map[String, Set[String]]): MatchRecognize.Skip = {
    def membersOf(v: String): Set[String] =
      subsets.collectFirst { case (k, ms) if k.equalsIgnoreCase(v) => ms }
        .getOrElse(Set.empty)
    skip match {
      case MatchRecognize.Skip.ToFirst(v, _) =>
        MatchRecognize.Skip.ToFirst(v, membersOf(v))
      case MatchRecognize.Skip.ToLast(v, _) =>
        MatchRecognize.Skip.ToLast(v, membersOf(v))
      case other => other
    }
  }

  // ---- SUBSET ------------------------------------------------------------
  /** SUBSET clause: `X = (A, B), Y = (C)` — union variables whose
    * classifier set is the union of their members (SqlMatchRecognize
    * subset list). */
  def parseSubsets(text: String): Map[String, Set[String]] = {
    val Entry = """(?is)\s*(\w+)\s*=\s*\(([^)]*)\)\s*""".r
    text.split(",(?![^()]*\\))").toSeq.map {
      case Entry(name, members) =>
        name.toUpperCase ->
          members.split(",").map(_.trim.toUpperCase).filter(_.nonEmpty).toSet
      case other => throw new IllegalArgumentException(
        s"unsupported SUBSET entry: '$other'")
    }.toMap
  }

  // ---- pattern ----------------------------------------------------------
  /** Recursive-descent parse of the row-pattern regex. */
  def parsePattern(text: String): Pat = {
    var pos = 0
    val s = text.trim
    def peek: Char = if (pos < s.length) s(pos) else '\u0000'
    def skipWs(): Unit = while (pos < s.length && s(pos).isWhitespace) pos += 1
    def alt(): Pat = {
      val first = cat()
      val alts = Seq.newBuilder[Pat]; alts += first
      skipWs()
      while (peek == '|') { pos += 1; alts += cat(); skipWs() }
      val all = alts.result()
      if (all.size == 1) all.head else Pat.Alt(all)
    }
    def cat(): Pat = {
      val ps = Seq.newBuilder[Pat]
      skipWs()
      // ',' terminates only inside PERMUTE argument lists; '-' only as
      // the `-}` exclusion closer — neither occurs in plain patterns
      // (quantifier commas are consumed inside postfix's '{' branch).
      while (pos < s.length && peek != '|' && peek != ')' &&
          peek != ',' && peek != '-') {
        ps += postfix(); skipWs()
      }
      val all = ps.result()
      if (all.size == 1) all.head else Pat.Cat(all)
    }
    def reluctant(p: Pat): Pat = p match {
      case r: Pat.Rep if peek == '?' => pos += 1; r.copy(greedy = false)
      case other => other
    }
    def postfix(): Pat = {
      var p = atom()
      skipWs()
      var more = true
      while (more) more = peek match {
        case '*' => pos += 1; p = reluctant(Pat.star(p)); true
        case '+' => pos += 1; p = reluctant(Pat.plus(p)); true
        case '?' => pos += 1; p = reluctant(Pat.opt(p)); true
        case '{' if pos + 1 < s.length && s(pos + 1) == '-' =>
          false // `{-`: an exclusion atom follows, not a quantifier
        case '{' =>
          val close = s.indexOf('}', pos)
          require(close > 0, s"unclosed quantifier in pattern: $s")
          val body = s.substring(pos + 1, close)
          pos = close + 1
          val parts = body.split(",", -1).map(_.trim)
          p = parts match {
            case Array(n) => Pat.Rep(p, n.toInt, n.toInt)
            case Array(n, "") => Pat.atLeast(p, n.toInt)
            case Array(n, m) => Pat.Rep(p, n.toInt, m.toInt)
            case _ => throw new IllegalArgumentException(s"bad quantifier {$body}")
          }
          p = reluctant(p)
          true
        case _ => false
      }
      p
    }
    def atom(): Pat = {
      skipWs()
      if (peek == '{' && pos + 1 < s.length && s(pos + 1) == '-') {
        // `{- pat -}` row-pattern exclusion (SqlMatchRecognize PATTERN_EXCLUDE)
        pos += 2
        val p = alt()
        skipWs()
        require(pos + 1 < s.length && s(pos) == '-' && s(pos + 1) == '}',
          s"unclosed exclusion in pattern: $s")
        pos += 2
        Pat.Excl(p)
      } else if (peek == '(') {
        pos += 1
        val p = alt()
        skipWs()
        require(peek == ')', s"unclosed group in pattern: $s")
        pos += 1
        p
      } else {
        val start = pos
        while (pos < s.length && (s(pos).isLetterOrDigit || s(pos) == '_')) pos += 1
        require(pos > start, s"expected symbol at '$s'[$start]")
        val name = s.substring(start, pos)
        skipWs()
        if (name.equalsIgnoreCase("PERMUTE") && peek == '(') {
          // PERMUTE(p1, ..., pn) (SqlMatchRecognize PATTERN_PERMUTE)
          pos += 1
          val args = Seq.newBuilder[Pat]
          args += alt()
          skipWs()
          while (peek == ',') { pos += 1; args += alt(); skipWs() }
          require(peek == ')', s"unclosed PERMUTE in pattern: $s")
          pos += 1
          Pat.permute(args.result(): _*)
        } else Pat.Sym(name.toUpperCase) // unquoted ids normalize to upper (Calcite semantics)
      }
    }
    val p = alt()
    skipWs()
    require(pos == s.length, s"trailing pattern input: '${s.substring(pos)}'")
    p
  }

  // ---- DEFINE predicates ------------------------------------------------
  private def numeric(v: Any): Option[Double] = v match {
    case null => None
    case n: Number => Some(n.doubleValue())
    case t: java.sql.Timestamp => Some(t.getTime.toDouble)
    case _ => None
  }

  private def cmp(op: String, l: Any, r: Any): Boolean = {
    if (l == null || r == null) return false // SQL three-valued: unknown
    (numeric(l), numeric(r)) match {
      case (Some(a), Some(b)) => op match {
        case "=" => a == b
        case "<>" | "!=" => a != b
        case "<" => a < b
        case "<=" => a <= b
        case ">" => a > b
        case ">=" => a >= b
      }
      case _ =>
        val a = l.toString; val b = r.toString
        op match {
          case "=" => a == b
          case "<>" | "!=" => a != b
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
        }
    }
  }

  private val Term =
    """(?is)\s*(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*(?:PREV\s*\(\s*(\w+)\s*\)|'([^']*)'|(-?\d+(?:\.\d+)?)|(\w+))\s*""".r

  /** One DEFINE body: a conjunction of simple comparisons. */
  def parsePredicate(body: String): Define = {
    val terms: Seq[Define] = body.split("(?i)\\bAND\\b").toSeq.map {
      case Term(lcol, op, prevCol, strLit, numLit, rcol) =>
        if (prevCol != null)
          (row: Row, prev: Option[Row]) =>
            prev.exists(p => cmp(op, row.getAs[Any](lcol), p.getAs[Any](prevCol)))
        else if (strLit != null)
          (row: Row, _: Option[Row]) => cmp(op, row.getAs[Any](lcol), strLit)
        else if (numLit != null) {
          val v = numLit.toDouble
          (row: Row, _: Option[Row]) => cmp(op, row.getAs[Any](lcol), v)
        } else
          (row: Row, _: Option[Row]) =>
            cmp(op, row.getAs[Any](lcol), row.getAs[Any](rcol))
      case other =>
        if (other.trim.equalsIgnoreCase("TRUE")) (_: Row, _: Option[Row]) => true
        else throw new IllegalArgumentException(s"unsupported DEFINE term: '$other'")
    }
    (row, prev) => terms.forall(t => t(row, prev))
  }

  // ---- running aggregates in DEFINE (SQL:2016) ---------------------------
  // `DEFINE B AS SUM(B.value) <= 100` — the aggregate runs over the rows
  // the variable has matched SO FAR in this attempt, including the
  // candidate row when it is the variable under test. The reference's own
  // engine never implemented this (match.iq:55-85 sits inside
  // `!if (false)`); the backtracker's Partial view makes it direct here.
  // Supported term shape: an additive chain of aggregate/navigation
  // addends compared to a numeric literal.
  private type Num =
    (Row, Option[Row], MatchRecognize.Partial, String) => Option[Double]

  private val ANum = """\s*(-?\d+(?:\.\d+)?)\s*""".r
  private val ACountStar = """(?is)\s*COUNT\s*\(\s*\*\s*\)\s*""".r
  private val ACountVar = """(?is)\s*COUNT\s*\(\s*(\w+)\s*\.\s*\*\s*\)\s*""".r
  private val ASumLen =
    """(?is)\s*SUM\s*\(\s*CHAR_LENGTH\s*\(\s*(\w+)\s*\.\s*(\w+)\s*((?:\s*\|\|\s*'[^']*')*)\s*\)\s*\)\s*""".r
  private val ASumCol = """(?is)\s*SUM\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s*""".r
  private val AMinCol = """(?is)\s*MIN\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s*""".r
  private val AMaxCol = """(?is)\s*MAX\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s*""".r
  private val AAvgCol = """(?is)\s*AVG\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s*""".r
  private val ALenVar =
    """(?is)\s*CHAR_LENGTH\s*\(\s*(\w+)\s*\.\s*(\w+)\s*((?:\s*\|\|\s*'[^']*')*)\s*\)\s*""".r
  private val ALenLit = """(?is)\s*CHAR_LENGTH\s*\(\s*'([^']*)'\s*\)\s*""".r
  private val AVarCol = """\s*(\w+)\s*\.\s*(\w+)\s*""".r

  /** Total length of the string literals in a `|| 'x' || 'y'` tail. */
  private def litLen(tail: String): Int =
    if (tail == null) 0
    else "'([^']*)'".r.findAllMatchIn(tail).map(_.group(1).length).sum

  /** The variable's rows so far, candidate included when it is the
    * variable under test (SQL:2016 RUNNING semantics in DEFINE). */
  private def rowsIncl(part: MatchRecognize.Partial, v: String, cand: Row,
      curVar: String): IndexedSeq[Row] = {
    val vv = v.toUpperCase
    val base = part.rowsOf(vv)
    if (vv == curVar) base :+ cand else base
  }

  private def parseAddend(text: String): Num = text match {
    case ANum(n) => val c = n.toDouble; (_, _, _, _) => Some(c)
    case ACountStar() => (_, _, p, _) => Some((p.size + 1).toDouble)
    case ACountVar(v) =>
      (r, _, p, cv) => Some(rowsIncl(p, v, r, cv).size.toDouble)
    case ASumLen(v, c, tail) =>
      val extra = litLen(tail)
      (r, _, p, cv) => {
        val rs = rowsIncl(p, v, r, cv)
        if (rs.isEmpty) None
        else {
          val ls = rs.flatMap(row => Option(row.getAs[Any](c))
            .map(_.toString.length + extra))
          if (ls.isEmpty) None else Some(ls.sum.toDouble)
        }
      }
    case ASumCol(v, c) =>
      (r, _, p, cv) => {
        val vals = rowsIncl(p, v, r, cv).flatMap(row => numeric(row.getAs[Any](c)))
        if (vals.isEmpty) None else Some(vals.sum)
      }
    case AMinCol(v, c) =>
      (r, _, p, cv) => {
        val vals = rowsIncl(p, v, r, cv).flatMap(row => numeric(row.getAs[Any](c)))
        if (vals.isEmpty) None else Some(vals.min)
      }
    case AMaxCol(v, c) =>
      (r, _, p, cv) => {
        val vals = rowsIncl(p, v, r, cv).flatMap(row => numeric(row.getAs[Any](c)))
        if (vals.isEmpty) None else Some(vals.max)
      }
    case AAvgCol(v, c) =>
      (r, _, p, cv) => {
        val vals = rowsIncl(p, v, r, cv).flatMap(row => numeric(row.getAs[Any](c)))
        if (vals.isEmpty) None else Some(vals.sum / vals.size)
      }
    case ALenVar(v, c, tail) =>
      val extra = litLen(tail)
      (r, _, p, cv) => rowsIncl(p, v, r, cv).lastOption
        .flatMap(row => Option(row.getAs[Any](c)))
        .map(_.toString.length.toDouble + extra)
    case ALenLit(s) => val c = s.length.toDouble; (_, _, _, _) => Some(c)
    case AVarCol(v, c) =>
      (r, _, p, cv) => rowsIncl(p, v, r, cv).lastOption
        .flatMap(row => numeric(row.getAs[Any](c)))
    case other =>
      throw new IllegalArgumentException(s"unsupported DEFINE addend: '$other'")
  }

  /** Split on top-level '+' (never inside parens or quotes). */
  private def splitAdditive(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var inQ = false; var cur = new StringBuilder
    s.foreach {
      case '\'' => inQ = !inQ; cur += '\''
      case '(' if !inQ => depth += 1; cur += '('
      case ')' if !inQ => depth -= 1; cur += ')'
      case '+' if !inQ && depth == 0 => out += cur.toString; cur = new StringBuilder
      case ch => cur += ch
    }
    out += cur.toString
    out.result()
  }

  private val AdditiveCmp =
    """(?s)\A(.*?)(<=|>=|<>|!=|=|<|>)\s*(-?\d+(?:\.\d+)?)\s*\z""".r

  /** One aggregate/additive DEFINE term: addend (+ addend)* relop number. */
  private def parseAdditiveTerm(term: String): MatchRecognize.DefineCtx =
    term match {
      case AdditiveCmp(lhs, op, lit) =>
        val target = lit.toDouble
        val addends = splitAdditive(lhs).map(parseAddend)
        (r, prev, part, cv) => {
          val vals = addends.map(_(r, prev, part, cv))
          vals.forall(_.isDefined) && cmp(op, vals.flatten.sum, target)
        }
      case other => throw new IllegalArgumentException(
        s"unsupported DEFINE term: '$other'")
    }

  private val NeedsCtx =
    """(?is)SUM\s*\(|COUNT\s*\(|CHAR_LENGTH\s*\(|\w\s*\.\s*\w|\+|PREV\s*\(\s*\w+\s*,|NEXT\s*\(""".r

  /** `col op PREV(col, n)` — explicit-offset navigation (SqlStdOperatorTable
    * PREV's two-arg form). Offset 1 is the plain-Define path; n > 1 needs
    * the Partial's partition-relative navigation. */
  private val TermPrevN =
    """(?is)\s*(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*PREV\s*\(\s*(\w+)\s*,\s*(\d+)\s*\)\s*""".r

  /** Var-qualified form `v.col op PREV(v.col [, n])` — the reference's
    * disabled `DEFINE up AS up.deptno < prev(up.deptno)` (match.iq:44-53).
    * The qualifier on the left resolves to the candidate row when it names
    * the variable under test (RUNNING semantics), else to the qualifier's
    * last row so far; PREV navigates the PARTITION row sequence. */
  private val TermVarPrev =
    ("""(?is)\s*(\w+)\s*\.\s*(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*""" +
      """PREV\s*\(\s*(\w+)\s*\.\s*(\w+)\s*(?:,\s*(\d+))?\s*\)\s*""").r

  /** `col op NEXT(col [, n])` — SQL:2016 physical LOOKAHEAD navigation
    * (SqlStdOperatorTable NEXT:1750; the reference parses it but its
    * enumerable engine never executes it). Batch: the row n past the
    * candidate, NULL semantics past the partition end. Streaming: a
    * NEXT that runs off the buffer holds the attempt open until the
    * row arrives (Partial.touchedEnd → hitEnd). */
  private val TermNextN =
    """(?is)\s*(\w+)\s*(=|<>|!=|<=|>=|<|>)\s*NEXT\s*\(\s*(\w+)\s*(?:,\s*(\d+))?\s*\)\s*""".r

  /** One DEFINE body → simple predicate (Left) when every conjunct fits
    * the plain comparison grammar, context-aware (Right) when any
    * conjunct carries an aggregate / navigation addend. */
  def parseDefineBody(body: String): Either[Define, MatchRecognize.DefineCtx] = {
    val conjuncts = body.split("(?i)\\bAND\\b").toSeq
    if (conjuncts.forall(c => NeedsCtx.findFirstIn(c).isEmpty))
      Left(parsePredicate(body))
    else {
      val terms: Seq[MatchRecognize.DefineCtx] = conjuncts.map { c =>
        if (NeedsCtx.findFirstIn(c).isEmpty) {
          val simple = parsePredicate(c)
          (r: Row, p: Option[Row], _: MatchRecognize.Partial, _: String) =>
            simple(r, p)
        } else c match {
          case TermVarPrev(lv, lcol, op, _, pcol, nStr) =>
            val n = Option(nStr).map(_.toInt).getOrElse(1)
            (r: Row, _: Option[Row], part: MatchRecognize.Partial, cv: String) => {
              val lval =
                if (lv.toUpperCase == cv) Some(r.getAs[Any](lcol))
                else rowsIncl(part, lv, r, cv).lastOption.map(_.getAs[Any](lcol))
              lval.exists(l => part.prevRow(n).exists(pr =>
                cmp(op, l, pr.getAs[Any](pcol))))
            }
          case TermPrevN(lcol, op, pcol, nStr) =>
            val n = nStr.toInt
            (r: Row, _: Option[Row], part: MatchRecognize.Partial, _: String) =>
              part.prevRow(n).exists(pr =>
                cmp(op, r.getAs[Any](lcol), pr.getAs[Any](pcol)))
          case TermNextN(lcol, op, ncol, nStr) =>
            val n = Option(nStr).map(_.toInt).getOrElse(1)
            (r: Row, _: Option[Row], part: MatchRecognize.Partial, _: String) =>
              part.nextRow(n).exists(nr =>
                cmp(op, r.getAs[Any](lcol), nr.getAs[Any](ncol)))
          case _ => parseAdditiveTerm(c)
        }
      }
      Right((r, p, part, cv) => terms.forall(t => t(r, p, part, cv)))
    }
  }

  // ---- measures ---------------------------------------------------------
  private sealed trait Measure { def name: String }
  private case class CountAll(name: String) extends Measure
  private case class CountSym(sym: String, name: String) extends Measure
  private case class FirstCol(col: String, name: String) extends Measure
  private case class LastCol(col: String, name: String) extends Measure

  private case class ClassifierM(name: String) extends Measure
  private case class MatchNumberM(name: String) extends Measure
  private case class VarFirst(sym: String, col: String, name: String) extends Measure
  private case class VarLast(sym: String, col: String, name: String) extends Measure
  private case class VarSum(sym: String, col: String, name: String) extends Measure
  // SQL:2016 RUNNING/FINAL aggregate measures (ALL ROWS PER MATCH emits
  // the per-row prefix value for RUNNING and the whole-match value for
  // FINAL; in ONE ROW PER MATCH both collapse to the final value)
  private case class LitM(value: Long, name: String) extends Measure
  private case class RunningCountM(name: String) extends Measure
  private case class FinalCountM(name: String) extends Measure
  private case class RunningSumM(sym: String, col: String, name: String) extends Measure
  private case class FinalSumM(sym: String, col: String, name: String) extends Measure

  private val MLit = """\s*(-?\d+)\s+AS\s+(\w+)\s*""".r
  private val MCls = """(?is)\s*CLASSIFIER\s*\(\s*\)\s+AS\s+(\w+)\s*""".r
  private val MMn = """(?is)\s*MATCH_NUMBER\s*\(\s*\)\s+AS\s+(\w+)\s*""".r
  private val MCountAll = """(?is)\s*COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)\s*""".r
  private val MCountSym = """(?is)\s*COUNT\s*\(\s*(\w+)\s*\.\s*\*\s*\)\s+AS\s+(\w+)\s*""".r
  private val MFirst = """(?is)\s*FIRST\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MLast = """(?is)\s*LAST\s*\(\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MVarSum = """(?is)\s*SUM\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MRunCount = """(?is)\s*RUNNING\s+COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)\s*""".r
  private val MFinCount = """(?is)\s*FINAL\s+COUNT\s*\(\s*\*\s*\)\s+AS\s+(\w+)\s*""".r
  private val MRunSum = """(?is)\s*RUNNING\s+SUM\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MFinSum = """(?is)\s*FINAL\s+SUM\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MVarFirst = """(?is)\s*FIRST\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MVarLast = """(?is)\s*LAST\s*\(\s*(\w+)\s*\.\s*(\w+)\s*\)\s+AS\s+(\w+)\s*""".r
  private val MVarBare = """(?is)\s*(\w+)\s*\.\s*(\w+)\s+AS\s+(\w+)\s*""".r

  private def parseMeasures(text: String): Seq[Measure] =
    text.split(",").toSeq.map {
      case MLit(v, n) => LitM(v.toLong, n)
      case MCls(n) => ClassifierM(n)
      case MMn(n) => MatchNumberM(n)
      case MCountAll(n) => CountAll(n)
      case MRunCount(n) => RunningCountM(n)
      case MFinCount(n) => FinalCountM(n)
      case MRunSum(v, c, n) => RunningSumM(v.toUpperCase, c, n)
      case MFinSum(v, c, n) => FinalSumM(v.toUpperCase, c, n)
      case MVarSum(v, c, n) => VarSum(v.toUpperCase, c, n)
      case MVarFirst(v, c, n) => VarFirst(v.toUpperCase, c, n)
      case MVarLast(v, c, n) => VarLast(v.toUpperCase, c, n)
      // bare VAR.col in ONE ROW PER MATCH is FINAL LAST(VAR.col)
      case MVarBare(v, c, n) => VarLast(v.toUpperCase, c, n)
      case MCountSym(s, n) => CountSym(s.toUpperCase, n)
      case MFirst(c, n) => FirstCol(c, n)
      case MLast(c, n) => LastCol(c, n)
      case other => throw new IllegalArgumentException(s"unsupported measure: '$other'")
    }

  // ---- assembly ---------------------------------------------------------
  /** Normalize an ordering/partition value to a monotone Long key.
    * floorDiv: /-division truncates toward zero, so a pre-epoch
    * timestamp like -0.5s would order AFTER -1s; getNanos is always
    * non-negative, so floor-seconds * 1e6 + micros is monotone. */
  private[graft] def asLong(v: Any): Long = v match {
    case n: Number => n.longValue()
    case t: java.sql.Timestamp =>
      Math.floorDiv(t.getTime, 1000L) * 1000000L + (t.getNanos / 1000L)
    case other => throw new IllegalArgumentException(s"non-integral key: $other")
  }

  private def build(spark: SparkSession, table: String, partCol: String,
      ordCol: String, ordTie: Option[String], measuresText: String,
      rowsMode: Option[String], afterMatch: Option[String],
      patternText: String, withinMicros: Option[Long],
      subsetsText: Option[String],
      definesText: String): LogicalPlan = {
    val allRows = rowsMode.exists(_.equalsIgnoreCase("ALL"))
    val subsets = subsetsText.map(parseSubsets).getOrElse(Map.empty)
    val plan = dataframe(spark.table(table), partCol, ordCol, ordTie,
      measuresText, patternText, definesText,
      afterMatch.map(a => resolveSubsetSkip(parseSkip(a), subsets))
        .getOrElse(MatchRecognize.Skip.PastLastRow),
      allRows, subsets, withinMicros)
      .queryExecution.logical
    val canonical =
      s"SELECT * FROM $table MATCH_RECOGNIZE (" +
        s"PARTITION BY $partCol ORDER BY $ordCol" +
        ordTie.map(t => s", $t").getOrElse("") +
        s" MEASURES $measuresText" +
        rowsMode.map(m => s" ${m.toUpperCase} ROWS PER MATCH").getOrElse("") +
        afterMatch.map(a => s" AFTER MATCH SKIP $a").getOrElse("") +
        s" PATTERN ($patternText)" +
        withinMicros.map(w => s" WITHIN INTERVAL '${w / 1000000L}' SECOND")
          .getOrElse("") +
        subsetsText.map(t => s" SUBSET $t").getOrElse("") +
        s" DEFINE $definesText)"
    plan.setTagValue(RenderTag, canonical)
    plan
  }

  /** Assemble a MATCH_RECOGNIZE over an arbitrary DataFrame from the
    * textual clause bodies — shared by the SQL front end and the
    * RelBuilder facade (`Rel.matchRecognize`, mirroring
    * tools/RelBuilder.java match:2474). */
  def dataframe(df: org.apache.spark.sql.DataFrame, partCol: String,
      ordCol: String, ordTie: Option[String], measuresText: String,
      patternText: String, definesText: String,
      skip: MatchRecognize.Skip = MatchRecognize.Skip.PastLastRow,
      allRows: Boolean = false,
      subsets: Map[String, Set[String]] = Map.empty,
      within: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    // a pattern variable reference resolves to itself plus, for a SUBSET
    // union variable, any member classifier
    def ofVar(m: IndexedSeq[(Row, String)], v: String): IndexedSeq[(Row, String)] =
      m.filter { case (_, s) =>
        s == v || subsets.getOrElse(v, Set.empty).contains(s) }
    val spark = df.sparkSession
    val schema = df.schema
    val pattern = parsePattern(patternText)
    val measures = parseMeasures(measuresText)
    val defSeq: Seq[(String, Either[Define, MatchRecognize.DefineCtx])] =
      definesText.split(",(?![^()]*\\))").toSeq.map { d =>
        val Array(sym, body) = d.split("(?i)\\bAS\\b", 2).map(_.trim)
        sym.toUpperCase -> parseDefineBody(body)
      }
    // SQL:2016: one definition per pattern variable (reference
    // SqlValidatorMatchTest "Pattern variable 'DOWN' has already been
    // defined" — a silent last-wins toMap would accept it)
    defSeq.groupBy(_._1).collectFirst { case (k, vs) if vs.size > 1 => k }
      .foreach(k => throw new IllegalArgumentException(
        s"Pattern variable '$k' has already been defined"))
    val parsed: Map[String, Either[Define, MatchRecognize.DefineCtx]] =
      defSeq.toMap
    val defines: Map[String, Define] =
      parsed.collect { case (k, Left(f)) => k -> f }
    val ctxDefines: Map[String, MatchRecognize.DefineCtx] =
      parsed.collect { case (k, Right(f)) => k -> f }

    // ---- SQL:2016 name-scope validation (reference:
    // test/SqlValidatorMatchTest.java — "Unknown pattern '...'" for a
    // DEFINE symbol / SKIP target / SUBSET member outside the PATTERN,
    // "Pattern variable '...' has already been defined" for a SUBSET name
    // colliding with a pattern variable, "First column of ORDER BY must
    // be of type TIMESTAMP" under WITHIN). Raised as
    // IllegalArgumentException, which the SQL front end canonicalizes to
    // its parse rejection (tryParse fall-through).
    def patSyms(p: Pat): Set[String] = p match {
      case Pat.Sym(n) => Set(n.toUpperCase)
      case Pat.Cat(ps) => ps.flatMap(patSyms).toSet
      case Pat.Alt(ps) => ps.flatMap(patSyms).toSet
      case Pat.Rep(p1, _, _, _) => patSyms(p1)
      case Pat.Excl(p1) => patSyms(p1)
    }
    val syms = patSyms(pattern)
    for (k <- parsed.keys if !syms.contains(k) && !subsets.contains(k))
      throw new IllegalArgumentException(s"Unknown pattern '$k'")
    for (s <- subsets.keys if syms.contains(s))
      throw new IllegalArgumentException(
        s"Pattern variable '$s' has already been defined")
    for ((_, members) <- subsets; m <- members if !syms.contains(m))
      throw new IllegalArgumentException(s"Unknown pattern '$m'")
    skip match {
      case MatchRecognize.Skip.ToFirst(v, _) if !syms.contains(v) &&
          !subsets.contains(v) =>
        throw new IllegalArgumentException(s"Unknown pattern '$v'")
      case MatchRecognize.Skip.ToLast(v, _) if !syms.contains(v) &&
          !subsets.contains(v) =>
        throw new IllegalArgumentException(s"Unknown pattern '$v'")
      case _ =>
    }
    if (within.isDefined &&
        !schema(ordCol).dataType.isInstanceOf[org.apache.spark.sql.types.TimestampType])
      throw new IllegalArgumentException(
        "First column of ORDER BY must be of type TIMESTAMP when WITHIN is used")

    val orderFn: Row => (Long, Long) = ordTie match {
      case Some(tie) => r => (asLong(r.getAs[Any](ordCol)), asLong(r.getAs[Any](tie)))
      case None => r => (asLong(r.getAs[Any](ordCol)), 0L)
    }

    val keyFn: Row => Long = r => asLong(r.getAs[Any](partCol))
    if (allRows) {
      // ALL ROWS PER MATCH (SqlMatchRecognize RowsPerMatchOption.ALL_ROWS):
      // one output row per MATCHED INPUT row — the partition key, the
      // per-row measures (CLASSIFIER / MATCH_NUMBER / RUNNING and FINAL
      // aggregates, SQL:2016 §R030), then every input column except the
      // partition key. Unprefixed aggregates stay ONE-ROW-only; RUNNING
      // sees the match prefix up to and including the current row
      // (excluded rows included in aggregation, as everywhere else),
      // FINAL the whole match.
      measures.collectFirst {
        case m: CountAll => m; case m: CountSym => m
        case m: FirstCol => m; case m: LastCol => m; case m: VarSum => m
      }.foreach(m => throw new IllegalArgumentException(
        s"aggregate measure '$m' requires ONE ROW PER MATCH " +
          "(use RUNNING/FINAL for per-row aggregates)"))
      val passCols = schema.fields.filter(_.name != partCol)
      val outSchema = StructType(
        StructField(partCol, LongType, nullable = false) +:
          (measures.map {
            case ClassifierM(n) => StructField(n, StringType, nullable = false)
            case MatchNumberM(n) => StructField(n, LongType, nullable = false)
            case RunningCountM(n) => StructField(n, LongType, nullable = false)
            case FinalCountM(n) => StructField(n, LongType, nullable = false)
            case RunningSumM(_, _, n) => StructField(n, DoubleType, nullable = true)
            case FinalSumM(_, _, n) => StructField(n, DoubleType, nullable = true)
            case other => throw new IllegalArgumentException(
              s"unsupported ALL ROWS measure: $other")
          } ++ passCols))
      require(!df.isStreaming,
        "ALL ROWS PER MATCH over a stream is not supported in this form")
      return MatchRecognize.matchRecognizeAllRowsFull[Row](
        df, keyFn, orderFn, pattern, defines, skip, ctxDefines, within) {
        (key, mn, m) =>
          def sumOver(rows: Seq[(Row, String)], v: String, c: String): Any = {
            val vals = rows.filter { case (_, s0) =>
              val s = s0.stripPrefix("~")
              s == v || subsets.getOrElse(v, Set.empty).contains(s)
            }.flatMap(p => numeric(p._1.getAs[Any](c)))
            if (vals.isEmpty) null else vals.sum
          }
          m.iterator.zipWithIndex
            .filter { case ((_, sym), _) => !sym.startsWith("~") }
            .map { case ((row, sym), pos) =>
              val prefix = m.take(pos + 1)
              Row.fromSeq(key +: (measures.map {
                case ClassifierM(_) => sym
                case MatchNumberM(_) => mn.toLong
                case RunningCountM(_) => (pos + 1).toLong
                case FinalCountM(_) => m.size.toLong
                case RunningSumM(v, c, _) => sumOver(prefix, v, c)
                case FinalSumM(v, c, _) => sumOver(m, v, c)
                case _ => throw new IllegalStateException("unreachable")
              } ++ passCols.map(f => row.getAs[Any](f.name))))
            }
      }(Encoders.row(outSchema)).toDF()
    }
    val outSchema = StructType(
      // partition key is normalized to long by the operator's key function
      StructField(partCol, LongType, nullable = false) +: measures.map {
        case CountAll(n) => StructField(n, LongType, nullable = false)
        case CountSym(_, n) => StructField(n, LongType, nullable = false)
        case FirstCol(c, n) => StructField(n, schema(c).dataType, schema(c).nullable)
        case LastCol(c, n) => StructField(n, schema(c).dataType, schema(c).nullable)
        // a variable (or subset) may match no rows -> nullable
        case VarFirst(_, c, n) => StructField(n, schema(c).dataType, nullable = true)
        case VarLast(_, c, n) => StructField(n, schema(c).dataType, nullable = true)
        // RUNNING/FINAL SUM over a variable's rows (SQL:2016 aggregate
        // measures) — null when the variable matched no row
        case VarSum(_, _, n) => StructField(n, DoubleType, nullable = true)
        // a constant measure (the reference's `MEASURES 1 AS m1` shape)
        case LitM(_, n) => StructField(n, LongType, nullable = false)
        // in ONE ROW PER MATCH, RUNNING and FINAL both see the whole match
        case RunningCountM(n) => StructField(n, LongType, nullable = false)
        case FinalCountM(n) => StructField(n, LongType, nullable = false)
        case RunningSumM(_, _, n) => StructField(n, DoubleType, nullable = true)
        case FinalSumM(_, _, n) => StructField(n, DoubleType, nullable = true)
        case other => throw new IllegalArgumentException(
          s"per-row measure '$other' requires ALL ROWS PER MATCH")
      })

    val measureFn: (Long, IndexedSeq[(Row, String)]) => Row = (key, m) => {
      val vals: Seq[Any] = measures.map {
        case CountAll(_) => m.size.toLong
        case CountSym(s, _) => ofVar(m, s).size.toLong
        case FirstCol(c, _) => m.head._1.getAs[Any](c)
        case LastCol(c, _) => m.last._1.getAs[Any](c)
        case VarFirst(v, c, _) =>
          ofVar(m, v).headOption.map(_._1.getAs[Any](c)).orNull
        case VarLast(v, c, _) =>
          ofVar(m, v).lastOption.map(_._1.getAs[Any](c)).orNull
        case VarSum(v, c, _) =>
          val vals = ofVar(m, v).flatMap(p => numeric(p._1.getAs[Any](c)))
          if (vals.isEmpty) null else vals.sum
        case LitM(v, _) => v
        case RunningCountM(_) | FinalCountM(_) => m.size.toLong
        case RunningSumM(v, c, _) =>
          val vals = ofVar(m, v).flatMap(p => numeric(p._1.getAs[Any](c)))
          if (vals.isEmpty) null else vals.sum
        case FinalSumM(v, c, _) =>
          val vals = ofVar(m, v).flatMap(p => numeric(p._1.getAs[Any](c)))
          if (vals.isEmpty) null else vals.sum
        case _ => throw new IllegalStateException("unreachable")
      }
      Row.fromSeq(key +: vals)
    }
    // a streaming source (e.g. `SELECT STREAM ... MATCH_RECOGNIZE`, where
    // the STREAM front end resolved the table to its readStream twin)
    // lowers onto the flatMapGroupsWithState matcher — the reference's
    // Delta-over-Match plan; a batch source onto flatMapGroups
    val out =
      if (df.isStreaming)
        MatchRecognize.matchRecognizeStream[Row](df, keyFn, orderFn,
          pattern, defines, measureFn, skip, ctxDefines,
          within)(Encoders.row(outSchema))
      else
        MatchRecognize.matchRecognize[Row](df, keyFn, orderFn,
          pattern, defines, measureFn, skip, ctxDefines,
          within)(Encoders.row(outSchema))
    out.toDF()
  }
}
