package graft.plans

import org.apache.spark.sql.SparkSession

/** SQL completion advisor — the reference's editor-assist surface
  * (reference: core/src/main/java/org/apache/calcite/sql/advise/
  * SqlAdvisor.java `getCompletionHints(sql, cursor)` returning
  * SqlMoniker hints of type TABLE/COLUMN/KEYWORD/SCHEMA, backed by
  * SqlAdvisorValidator; test expectations in
  * core/src/test/java/org/apache/calcite/sql/test/SqlAdvisorTest.java).
  *
  * Architecture-divergent on purpose: the reference re-parses with a
  * sentinel token spliced at the caret and asks a completion validator
  * for the namespace in scope. Spark's parser has no such hook, so this
  * advisor derives the same three scope facts directly:
  *
  *   1. the FROM/JOIN clause items of the statement enclosing the caret
  *      (alias → table map — both halves of the text, so a caret inside
  *      `SELECT ^ FROM t` still sees `t`),
  *   2. the identifier prefix being typed at the caret (possibly
  *      `qualifier.prefix`), and
  *   3. the token immediately before it (FROM/JOIN ⇒ table position).
  *
  * and answers from the session catalog (temp views + tables via
  * `spark.catalog`), exactly the hint classes the reference emits:
  * qualified COLUMN hints for `alias.^`, TABLE hints in FROM position,
  * COLUMN ∪ TABLE ∪ KEYWORD elsewhere, everything filtered by the
  * prefix case-insensitively and deduplicated. Driver-side string+catalog
  * work only — no jobs, no data touched.
  */
object SqlAdvisor {

  /** One hint (reference: sql/validate/SqlMoniker.java — type + path). */
  final case class Hint(kind: String, name: String, qualifier: Option[String] = None) {
    def render: String = qualifier.map(q => s"$q.$name").getOrElse(name)
  }

  /** The keyword subset the advisor offers in expression position —
    * the reference's getReservedAndKeyWords trimmed to statement-level
    * keywords a completion UI actually wants. */
  private val keywords = Vector(
    "SELECT", "FROM", "WHERE", "GROUP BY", "HAVING", "ORDER BY", "LIMIT",
    "JOIN", "INNER JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN", "CROSS JOIN",
    "ON", "AND", "OR", "NOT", "IN", "EXISTS", "BETWEEN", "LIKE", "IS NULL",
    "IS NOT NULL", "UNION", "UNION ALL", "INTERSECT", "EXCEPT", "AS",
    "CASE", "WHEN", "THEN", "ELSE", "END", "DISTINCT", "CAST", "OVER",
    "PARTITION BY", "ROWS BETWEEN", "WITH")

  private val kwTokens: Set[String] = Set(
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "join", "inner", "left", "right", "full", "cross", "on", "and", "or",
    "not", "in", "exists", "between", "like", "is", "null", "union", "all",
    "intersect", "except", "as", "case", "when", "then", "else", "end",
    "distinct", "cast", "over", "partition", "rows", "with", "offset")

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** Session-scoped catalog memo (r8 verdict #6): a completion endpoint
    * is called per keystroke, and `spark.catalog.listTables().collect()`
    * per call would hammer the catalog for metadata that only changes on
    * DDL. The memo caches the table list and per-table column lists until
    * [[invalidate]] — which every graft path that alters the temp-view
    * namespace calls (TableDdlSql CREATE/DROP, materialized-view DDL,
    * EXTEND view registration, Engine.registerAll). WeakHashMap keys keep
    * dropped sessions collectable (the Engine.Tables cache pattern). */
  private final class Memo {
    @volatile var tables: Map[String, String] = _
    val columns = scala.collection.concurrent.TrieMap.empty[String, Seq[String]]
  }
  private val memos = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, Memo])
  private def memoOf(spark: SparkSession): Memo = {
    val m = memos.get(spark)
    if (m != null) m else { val fresh = new Memo; memos.put(spark, fresh); fresh }
  }
  /** Count of ACTUAL catalog round-trips (listTables/listColumns), for
    * the memo's effectiveness spec. */
  private[graft] val catalogFetches = new java.util.concurrent.atomic.AtomicLong
  /** Drop the session's memo — call after any DDL that changes the
    * visible table set or a table's columns. */
  def invalidate(spark: SparkSession): Unit = memos.remove(spark)

  /** Completion hints for `sql` with the caret at `offset` (0-based,
    * may sit mid-identifier; everything from the identifier start to the
    * caret is the prefix being typed). Deterministic order:
    * COLUMN, TABLE, KEYWORD, each alphabetical. */
  def complete(spark: SparkSession, sql: String, offset: Int): Seq[Hint] = {
    val at = math.max(0, math.min(offset, sql.length))
    // the (qualifier, prefix) being typed: scan identifier chars (and at
    // most one dot) backwards from the caret
    var i = at
    while (i > 0 && isIdentChar(sql(i - 1))) i -= 1
    val prefix = sql.substring(i, at)
    val (qualifier, word) =
      if (i > 0 && sql(i - 1) == '.') {
        var j = i - 1
        while (j > 0 && isIdentChar(sql(j - 1))) j -= 1
        (Some(sql.substring(j, i - 1)), prefix)
      } else (None, prefix)

    val scope = fromScope(sql)
    val tables = catalogTables(spark)
    def cols(table: String): Seq[String] =
      if (tables.contains(table.toLowerCase))
        memoOf(spark).columns.getOrElseUpdate(table.toLowerCase, {
          catalogFetches.incrementAndGet()
          spark.catalog.listColumns(table).collect().map(_.name).toSeq
        })
      else Seq.empty
    def matches(s: String): Boolean = s.toLowerCase.startsWith(word.toLowerCase)

    val hints: Seq[Hint] = qualifier match {
      case Some(q) =>
        // alias.prefix → that relation's columns, qualified
        scope.get(q.toLowerCase).toSeq.flatMap(t =>
          cols(t).filter(matches).map(c => Hint("COLUMN", c, Some(q))))
      case None if inFromPosition(sql, i) =>
        tables.values.toSeq.filter(matches).map(Hint("TABLE", _))
      case None =>
        val inScope = scope.values.toSeq.distinct
        val columnHints = inScope.flatMap(t => cols(t).filter(matches))
          .distinct.map(Hint("COLUMN", _))
        val tableHints = tables.values.toSeq.filter(matches).map(Hint("TABLE", _))
        val kwHints =
          if (word.isEmpty) keywords.map(Hint("KEYWORD", _))
          else keywords.filter(matches).map(Hint("KEYWORD", _))
        columnHints ++ tableHints ++ kwHints
    }
    val kindRank = Map("COLUMN" -> 0, "TABLE" -> 1, "KEYWORD" -> 2)
    hints.distinct.sortBy(h => (kindRank(h.kind), h.name))
  }

  /** Cheap validity probe (reference: SqlAdvisor.isValid — parse only). */
  def isValid(spark: SparkSession, sql: String): Boolean =
    try { spark.sessionState.sqlParser.parsePlan(sql); true }
    catch { case _: Exception => false }

  /** alias/table (lowercased) → table name for every FROM/JOIN item in
    * the statement — a bare table registers under its own name too. */
  private def fromScope(sql: String): Map[String, String] = {
    val item = """(?i)\b(?:from|join)\s+([A-Za-z_][A-Za-z0-9_]*)(?:\s+(?:as\s+)?([A-Za-z_][A-Za-z0-9_]*))?"""
    item.r.findAllMatchIn(sql).flatMap { m =>
      val table = m.group(1)
      val alias = Option(m.group(2)).filterNot(a => kwTokens(a.toLowerCase))
      if (kwTokens(table.toLowerCase)) Seq.empty
      else Seq(table.toLowerCase -> table) ++
        alias.map(a => a.toLowerCase -> table).toSeq
    }.toMap
  }

  /** True when the token right before the prefix start is FROM or JOIN
    * (or a comma continuing a FROM list) — table position. */
  private def inFromPosition(sql: String, prefixStart: Int): Boolean = {
    var j = prefixStart
    while (j > 0 && sql(j - 1).isWhitespace) j -= 1
    if (j > 0 && sql(j - 1) == ',') return inFromListTail(sql, j - 1)
    var k = j
    while (k > 0 && isIdentChar(sql(k - 1))) k -= 1
    val tok = sql.substring(k, j).toLowerCase
    tok == "from" || tok == "join"
  }

  /** A comma right before the caret continues a FROM list only if the
    * nearest preceding clause keyword is FROM (not SELECT/GROUP BY/...). */
  private def inFromListTail(sql: String, commaAt: Int): Boolean = {
    val head = sql.substring(0, commaAt).toLowerCase
    val lastFrom = head.lastIndexOf("from")
    if (lastFrom < 0) return false
    Seq("select", "where", "group", "having", "order")
      .forall(kw => head.lastIndexOf(kw) < lastFrom)
  }

  /** lowercased name → name for catalog-visible tables and temp views,
    * memoized per session until [[invalidate]]. */
  private def catalogTables(spark: SparkSession): Map[String, String] = {
    val m = memoOf(spark)
    if (m.tables == null) {
      catalogFetches.incrementAndGet()
      m.tables = spark.catalog.listTables().collect()
        .map(t => t.name.toLowerCase -> t.name).toMap
    }
    m.tables
  }

  /** Registry wiring: completions for a fixed caret case, pinned by a
    * VALUES oracle (the SqlAdvisorTest fixed-expectation shape) — caret
    * after `l_` in the select list of a lineitem query yields exactly
    * that table's columns, alphabetical. */
  val defs: Seq[graft.QDef] = Seq(
    graft.QDef.sql("profile_sql_advisor",
      """SELECT * FROM (VALUES
        |  ('COLUMN', 'l_discount'), ('COLUMN', 'l_extendedprice'),
        |  ('COLUMN', 'l_linenumber'), ('COLUMN', 'l_linestatus'),
        |  ('COLUMN', 'l_orderkey'), ('COLUMN', 'l_partkey'),
        |  ('COLUMN', 'l_quantity'), ('COLUMN', 'l_returnflag'),
        |  ('COLUMN', 'l_shipdate'), ('COLUMN', 'l_suppkey'),
        |  ('COLUMN', 'l_tax')) AS t(kind, name)""") { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      val hints = complete(s, "SELECT l_ FROM lineitem", 9)
      import s.implicits._
      hints.map(h => (h.kind, h.name)).toDF("kind", "name")
    })
}
