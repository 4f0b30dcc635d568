package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import graft.iq.Iq

/** Full-file censuses of the reference's remaining server-module DDL
  * golden scripts (reference: server/src/test/resources/sql/{view,table,
  * table_as,type,schema}.iq), the same discipline as the 18 core .iq
  * suites and [[MvIqCensusSpec]]: every block re-runs against our engine
  * in script order (DDL state carries across blocks) or is documented-
  * skipped, and a census test pins run + skipped = total.
  *
  * Directive semantics: `!update` must succeed, `!ok` must reproduce the
  * golden table, `!error` must be REJECTED, `!type` is pinned against
  * the Spark schema (`StructType.toDDL`; the reference golden's
  * RecordType spelling is quoted in each pin's comment), and `!plan`
  * blocks either assert the plan shape that the golden pins (computed
  * virtual columns in the read projection) or are skipped where
  * re-running the command would mutate state (the reference prints
  * INSERT plans for statements the preceding `!update` already ran —
  * quidem reuses one command for consecutive directives, so re-executing
  * the `!plan` block would double-insert).
  *
  * Dialect adaptations (syntax only): object names are prefixed per
  * suite (the scripts run inside a shared test session), double-quoted
  * identifiers become backticks, and declared varchar widths the script
  * itself overflows (table_as.iq inserts the 11-char 'Engineering' into
  * varchar(10)) widen to string — the reference treats the length as
  * advisory, Spark enforces it at write. */
abstract class ServerIqCensusBase extends AnyFunSuite {
  import SparkTestSession._

  def iqFile: String
  def expectedTotal: Int
  def renames: Seq[(String, String)]
  def rewrites: Map[Int, String => String] = Map.empty
  def skips: Map[Int, String] = Map.empty
  /** !type pins: directive line → expected StructType.toDDL. */
  def typePins: Map[Int, String] = Map.empty
  /** !plan checks: directive line → assertion over the analyzed plan. */
  def planChecks: Map[Int, String => Unit] = Map.empty
  def cleanupSql: Seq[String]

  protected def dialect(sql: String): String = {
    var s = sql.replaceAll("\"([^\"]+)\"", "`$1`")
    for ((from, to) <- renames)
      s = s.replaceAll("(?i)\\b" + from + "\\b", to)
    s
  }

  private lazy val blocks: Seq[Iq.Block] =
    Iq.parse(s"/root/reference/server/src/test/resources/sql/$iqFile")

  private def cleanup(): Unit = cleanupSql.foreach { q =>
    try spark.sql(q).collect() catch { case _: Exception => () }
  }

  /** What a block produced, snapshotted AT RUN TIME — later blocks drop
    * the underlying tables, so a lazily re-collected DataFrame would read
    * deleted parquet. `local` is the result re-hosted on collected rows. */
  protected final case class Res(local: DataFrame, analyzedPlan: String,
      schemaDdl: String)

  private lazy val results: Map[Int, Either[Throwable, Res]] = {
    cleanup()
    val out = Map.newBuilder[Int, Either[Throwable, Res]]
    for (b <- blocks if !skips.contains(b.line)) {
      val sql = rewrites.get(b.line).fold(dialect(b.sql))(f => f(dialect(b.sql)))
      val r =
        try Right {
          val df = spark.sql(sql)
          val rows = if (b.directive == "error") Array.empty[org.apache.spark.sql.Row]
            else df.collect()
          val local = spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), df.schema)
          Res(local, df.queryExecution.analyzed.toString, df.schema.toDDL)
        }
        catch { case e: Throwable => Left(e) }
      out += b.line -> r
    }
    out.result()
  }

  protected def generateTests(): Unit = {
    for (b <- blocks if !skips.contains(b.line)) {
      test(s"$iqFile:${b.line} [${b.directive}] ${b.sql.take(60)}") {
        (b.directive, results(b.line)) match {
          case ("error", Left(_)) => succeed
          case ("error", Right(_)) =>
            fail(s"expected rejection, but the statement succeeded: ${b.sql}")
          case (_, Left(e)) =>
            fail(s"block failed: ${b.sql}\n  ${e.getClass.getSimpleName}: ${e.getMessage}")
          case ("ok", Right(res)) =>
            Iq.assertMatches(s"$iqFile:${b.line}", res.local, b.expected)
          case ("type", Right(res)) =>
            assert(res.schemaDdl == typePins(b.line),
              s"$iqFile:${b.line}: schema pin mismatch — got: ${res.schemaDdl}")
          case ("plan", Right(res)) =>
            planChecks(b.line)(res.analyzedPlan)
          case ("update", Right(_)) => succeed
          case (d, r) => fail(s"unexpected directive/result: $d / $r")
        }
      }
    }

    test(s"census: every $iqFile block is run or documented-skipped") {
      val total = blocks.size
      val skipped = blocks.count(b => skips.contains(b.line))
      val run = total - skipped
      assert(total == expectedTotal, s"$iqFile block count changed: $total")
      val lines = blocks.map(_.line).toSet
      assert(skips.keySet.subsetOf(lines), s"stale skips: ${skips.keySet.diff(lines)}")
      info(s"$iqFile census: $total blocks = $run run + $skipped skipped")
    }

    test("zzz cleanup: script objects dropped from the shared session") {
      cleanup()
      succeed
    }
  }
}

/** view.iq — CREATE [OR REPLACE] VIEW, column alias lists, duplicate and
  * arity errors, views over views, DROP VIEW [IF EXISTS]. All 21 blocks
  * run (Spark's native view DDL carries the whole script). */
class ViewIqCensusSpec extends ServerIqCensusBase {
  def iqFile = "view.iq"
  def expectedTotal = 21
  def renames = Seq("v2" -> "sviq_v2", "v3" -> "sviq_v3",
    "v" -> "sviq_v", "t" -> "sviq_t")
  override def rewrites = Map(
    // Spark refuses a PERMANENT view over an unaliased expression even
    // when the view declares a column list (CREATE_PERMANENT_VIEW_WITHOUT_
    // ALIAS) — add the alias the column list will rename anyway
    137 -> ((s: String) => s.replace("i + 1 from", "i + 1 as d0 from")))
  def cleanupSql = Seq(
    "drop view if exists sviq_v2", "drop view if exists sviq_v",
    "drop table if exists sviq_t")
  generateTests()
}

/** table.iq — CREATE TABLE with NOT NULL / IF NOT EXISTS, DEFAULT
  * expression columns and VIRTUAL generated columns (our TableDdlSql
  * layer), INSERT completion through defaults, generated-column insert
  * rejection, DROP TABLE [IF EXISTS]. The four INSERT `!plan` blocks are
  * skipped (re-running them would double-insert — see the base scaladoc);
  * the two SELECT `!plan` blocks assert the golden's shape: the virtual
  * column computed in the read projection. */
class TableIqCensusSpec extends ServerIqCensusBase {
  def iqFile = "table.iq"
  def expectedTotal = 37
  def renames = Seq("t" -> "tbiq_t")
  override def skips = Map(
    111 -> "INSERT !plan — the preceding !update already ran this command",
    120 -> "INSERT !plan — same",
    175 -> "INSERT !plan — same",
    184 -> "INSERT !plan — same")
  override def typePins = Map(
    // golden: RecordType(INTEGER I, INTEGER NOT NULL J) NOT NULL —
    // IF NOT EXISTS kept the original two columns (no K). Spark's file-
    // source catalog accepts the NOT NULL declaration but records the
    // column nullable, so the pin carries no NOT NULL
    36 -> "i INT,j INT")
  override def planChecks = Map(
    // golden: EnumerableCalc over the scan computing J = I + K + 2
    // (analyzed attributes print with expression ids: i#N + k#M)
    134 -> ((plan: String) => assert(
      plan.matches("(?s).*i#\\d+ \\+ k#\\d+.*"),
      s"virtual column not computed in the read projection:\n$plan")),
    // golden: EnumerableCalc computing J = CHAR_LENGTH(I)
    198 -> ((plan: String) => assert(plan.toLowerCase.contains("char_length"),
      s"virtual column not computed in the read projection:\n$plan")))
  def cleanupSql = Seq("drop table if exists tbiq_t")
  generateTests()
}

/** table_as.iq — CREATE TABLE AS with duplicate/IF NOT EXISTS semantics,
  * UNION and VALUES sources, column alias lists, mixed alias+typed lists
  * (accepted for tables, unlike materialized views), and degree errors.
  * All 29 blocks run: list-less CTAS is Spark-native; the column-list
  * forms go through TableDdlSql's CtasRe. */
class TableAsIqCensusSpec extends ServerIqCensusBase {
  def iqFile = "table_as.iq"
  def expectedTotal = 29
  def renames = Seq("dept" -> "taiq_dept", "d10" -> "taiq_d10",
    "d2" -> "taiq_d2", "d3" -> "taiq_d3", "d4" -> "taiq_d4",
    "d5" -> "taiq_d5", "d6" -> "taiq_d6", "d7" -> "taiq_d7",
    "d8" -> "taiq_d8", "d9" -> "taiq_d9", "d" -> "taiq_d")
  override def rewrites = Map(
    25 -> ((s: String) => s.replace("varchar(10)", "string")
      .replace("not null", "") + " using parquet"))
  def cleanupSql = Seq("drop table if exists taiq_dept",
    "drop table if exists taiq_d", "drop table if exists taiq_d2",
    "drop table if exists taiq_d3", "drop table if exists taiq_d4",
    "drop table if exists taiq_d5", "drop table if exists taiq_d6",
    "drop table if exists taiq_d7", "drop table if exists taiq_d8",
    "drop table if exists taiq_d9", "drop table if exists taiq_d10")
  generateTests()
}

/** type.iq — CREATE TYPE as a scalar alias and as a named row type,
  * tables declared with custom types, inserts through them (including a
  * NULL struct), and the declared read schemas. All 13 blocks run
  * through TableDdlSql's CREATE TYPE registry. */
class TypeIqCensusSpec extends ServerIqCensusBase {
  def iqFile = "type.iq"
  def expectedTotal = 13
  def renames = Seq("myint1" -> "tyiq_myint1", "mytype1" -> "tyiq_mytype1",
    "t" -> "tyiq_t", "v" -> "tyiq_v", "w" -> "tyiq_w")
  override def typePins = Map(
    // golden: RecordType(INTEGER NOT NULL I, INTEGER NOT NULL J) NOT NULL
    // (the custom-type table stores through typed CASTs, so Spark records
    // the columns nullable — the reference's NOT NULL is declaration-only)
    35 -> "i INT,j INT",
    // golden: RecordType(INTEGER NOT NULL myInt,
    //         RecordType(INTEGER NOT NULL II) NOT NULL myStruct) NOT NULL
    71 -> "myInt INT,myStruct STRUCT<ii: INT>",
    // golden: RecordType(INTEGER NOT NULL myInt,
    //         RecordType(INTEGER NOT NULL II) myNullableStruct) NOT NULL
    87 -> "myInt INT,myNullableStruct STRUCT<ii: INT>")
  def cleanupSql = Seq("drop table if exists tyiq_t",
    "drop table if exists tyiq_v", "drop table if exists tyiq_w",
    "drop type if exists tyiq_myint1", "drop type if exists tyiq_mytype1")
  generateTests()
}

/** schema.iq — CREATE/DROP SCHEMA, schema-qualified tables and views,
  * duplicate-schema errors, and the foreign-schema statements. Foreign
  * (JDBC) schemas are out of scope like the rest of the reference's
  * adapter modules: the blocks expecting them to WORK are skipped
  * (:109 hsqldb connect, :119 scott query, :155/:161/:166 DROP FOREIGN
  * SCHEMA no-ops), while the blocks expecting ERRORS run — Spark rejects
  * the same statements at parse. `create or replace schema` (:56) is
  * also skipped: Spark's grammar has no OR REPLACE for schemas. The one
  * DROP SCHEMA of a non-empty schema gains CASCADE (:125 — the
  * reference drops contents implicitly; Spark requires the keyword). */
class SchemaIqCensusSpec extends ServerIqCensusBase {
  def iqFile = "schema.iq"
  def expectedTotal = 25
  def renames = Seq("sss" -> "sciq_sss", "scott" -> "sciq_scott",
    "fs" -> "sciq_fs", "s" -> "sciq_s", "t" -> "sciq_t", "v" -> "sciq_v")
  override def rewrites = Map(
    125 -> ((s: String) => s + " cascade"))
  override def skips = Map(
    56 -> "CREATE OR REPLACE SCHEMA — no Spark grammar for OR REPLACE",
    109 -> "CREATE FOREIGN SCHEMA (hsqldb JDBC) — adapter out of scope",
    119 -> "query over the foreign scott schema — adapter out of scope",
    155 -> "DROP FOREIGN SCHEMA IF EXISTS — foreign schemas out of scope",
    161 -> "DROP FOREIGN SCHEMA IF EXISTS — same",
    166 -> "DROP FOREIGN SCHEMA IF EXISTS — same")
  def cleanupSql = Seq("drop schema if exists sciq_s cascade",
    "drop schema if exists sciq_sss cascade")
  generateTests()
}
