package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** CREATE / DROP MATERIALIZED VIEW through the SQL front end — the
  * reference's DDL surface (reference: server/src/main/java/org/apache/
  * calcite/sql/ddl/SqlCreateMaterializedView.java, executed eagerly by
  * ServerDdlExecutor). Grammar:
  *
  *   CREATE MATERIALIZED VIEW [IF NOT EXISTS] <name> [(alias, ...)] AS <query>
  *   DROP MATERIALIZED VIEW [IF EXISTS] <name>
  *
  * The optional column list is ALIASES ONLY (the reference's grammar:
  * `create materialized view d7 (x int, y) as ...` is a parse error —
  * server materialized_view.iq:204), and its degree must equal the
  * definition's column count (materialized_view.iq:210-220).
  *
  * Lowering: the definition query is parsed/analyzed by the full session
  * pipeline (re-entrant `spark.sql`), materialized to parquet under the
  * session warehouse dir, registered with [[MaterializedViews]] for
  * substitution, and exposed as a temp view named <name> so SQL can also
  * scan the tile directly. Like the reference's DdlExecutor, execution is
  * eager at prepare time — DDL has no lazily-executable plan; the returned
  * plan is a one-row result describing the action.
  */
object MaterializedViewSql {

  private val CreateRe =
    """(?is)^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(IF\s+NOT\s+EXISTS\s+)?([A-Za-z_][A-Za-z_0-9]*)\s*(\([^)]*\))?\s+AS\s+(.+)$""".r
  private val AliasRe = """[A-Za-z_][A-Za-z_0-9]*""".r
  private val DropRe =
    """(?is)^\s*DROP\s+MATERIALIZED\s+VIEW\s+(IF\s+EXISTS\s+)?([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$""".r
  private val RefreshRe =
    """(?is)^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+([A-Za-z_][A-Za-z_0-9]*)\s*;?\s*$""".r

  private def tilePath(spark: SparkSession, name: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    s"${wh.stripSuffix("/")}/graft_mv/$name"
  }

  /** Recognize and eagerly execute MV DDL; None for any other statement. */
  def tryParse(spark: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case CreateRe(ifNotExists, name, aliasList, defText) =>
      // column list: bare aliases only — a typed entry like `(x int, y)`
      // is a parse error in the reference's grammar too
      // (server materialized_view.iq:204-208)
      val aliases: Seq[String] = Option(aliasList).toSeq.flatMap { a =>
        a.stripPrefix("(").stripSuffix(")").split(",").map(_.trim).toSeq
          .map { entry =>
            if (!AliasRe.pattern.matcher(entry).matches())
              throw new IllegalArgumentException(
                s"Materialized view column list must contain only aliases; " +
                  s"found '$entry' (column declarations are not allowed)")
            entry
          }
      }
      // reference semantics (server materialized_view.iq): duplicate
      // CREATE fails; IF NOT EXISTS keeps the existing tile untouched
      // a fixture-table name would shadow the registered batch view for
      // the session's lifetime (registerAll memoizes and would not
      // self-heal) — reject, like a catalog refusing to shadow a table
      if (graft.Tables.names.contains(name.toLowerCase))
        throw new IllegalArgumentException(
          s"Materialized view '$name' would shadow the fixture table of " +
            "the same name")
      if (MaterializedViews.exists(name)) {
        if (ifNotExists == null) throw new IllegalStateException(
          s"Materialized view '$name' already exists")
        Some(delegate.parsePlan(
          s"SELECT 'exists' AS status, '$name' AS materialized_view"))
      } else {
        val df0 = spark.sql(defText)
        // alias-list degree must match the definition's column count
        // (server materialized_view.iq:210-220)
        if (aliases.nonEmpty && aliases.length != df0.columns.length)
          throw new IllegalArgumentException(
            s"List of column aliases must have same degree as table; table " +
              s"has ${df0.columns.length} columns " +
              s"(${df0.columns.map("'" + _ + "'").mkString(", ")}), whereas " +
              s"alias list has ${aliases.length} columns")
        val df = if (aliases.isEmpty) df0 else df0.toDF(aliases: _*)
        MaterializedViews.create(spark, name, df, tilePath(spark, name))
        MaterializedViews.install(spark)
        spark.read.parquet(tilePath(spark, name)).createOrReplaceTempView(name)
        SqlAdvisor.invalidate(spark)
        Some(delegate.parsePlan(
          s"SELECT 'created' AS status, '$name' AS materialized_view"))
      }
    case DropRe(ifExists, name) =>
      // reference semantics (server materialized_view.iq): dropping an
      // absent view raises "Table not found" unless IF EXISTS was given
      // (then the statement is a silent no-op)
      if (!MaterializedViews.exists(name) && ifExists == null)
        throw new IllegalStateException(s"Materialized view '$name' not found")
      MaterializedViews.drop(name)
      spark.catalog.dropTempView(name)
      SqlAdvisor.invalidate(spark)
      // CREATE rejects fixture names, but an MV created through the API
      // (MaterializedViews.create) could have reused one — re-register on
      // the next query instead of leaving the fixture view missing
      if (graft.Tables.names.contains(name.toLowerCase))
        graft.Tables.invalidateRegistration(spark)
      Some(delegate.parsePlan(
        s"SELECT 'dropped' AS status, '$name' AS materialized_view"))
    case RefreshRe(name) =>
      // re-materialize from the definition against the CURRENT base tables
      // and clear staleness (the reference's MaterializationService validity
      // lifecycle; stale tiles stop answering queries until refreshed)
      MaterializedViews.refresh(spark, name) // throws if the view is absent
      MaterializedViews.tilePathOf(name).foreach(p =>
        spark.read.parquet(p).createOrReplaceTempView(name))
      Some(delegate.parsePlan(
        s"SELECT 'refreshed' AS status, '$name' AS materialized_view"))
    case _ => None
  }
}
