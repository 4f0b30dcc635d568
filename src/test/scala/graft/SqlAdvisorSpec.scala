package graft

import graft.plans.SqlAdvisor
import graft.plans.SqlAdvisor.Hint
import org.scalatest.funsuite.AnyFunSuite

/** Completion-hint expectations mirroring the reference's SqlAdvisorTest
  * (reference: core/src/test/java/org/apache/calcite/sql/test/
  * SqlAdvisorTest.java — testFrom, testSelectList `a.^` qualified columns,
  * table hints after FROM, keyword hints in expression position). The `^`
  * marker in each case is the caret. */
class SqlAdvisorSpec extends AnyFunSuite {
  import SparkTestSession._

  private def hints(sqlWithCaret: String): Seq[Hint] = {
    Tables.registerAll(spark, sfDir)
    val at = sqlWithCaret.indexOf('^')
    require(at >= 0, "test case needs a ^ caret")
    SqlAdvisor.complete(spark, sqlWithCaret.replace("^", ""), at)
  }

  test("table position after FROM filters catalog tables by prefix") {
    val h = hints("SELECT * FROM ord^")
    assert(h.contains(Hint("TABLE", "orders")))
    assert(h.forall(_.kind == "TABLE"))
    assert(!h.exists(_.name == "lineitem"))
  }

  test("table position after JOIN and after a FROM-list comma") {
    assert(hints("SELECT * FROM lineitem JOIN ord^").contains(Hint("TABLE", "orders")))
    assert(hints("SELECT * FROM lineitem, nat^").contains(Hint("TABLE", "nation")))
    // a comma in the select list is NOT table position
    val sel = hints("SELECT l_orderkey, l_^ FROM lineitem")
    assert(sel.nonEmpty && sel.forall(_.kind == "COLUMN"))
  }

  test("alias-qualified prefix completes that relation's columns") {
    val h = hints("SELECT o.o_order^ FROM orders o")
    assert(h.contains(Hint("COLUMN", "o_orderkey", Some("o"))))
    assert(h.contains(Hint("COLUMN", "o_orderpriority", Some("o"))))
    assert(h.forall(_.qualifier.contains("o")))
    // the ON clause of a join sees the other side's alias too
    val on = hints("SELECT 1 FROM lineitem l JOIN orders o ON l.l_orderkey = o.^")
    assert(on.size == Tables.t(spark, sfDir, "orders").schema.size)
  }

  test("unqualified expression position offers scope columns, tables, keywords") {
    val h = hints("SELECT * FROM lineitem WHERE l_ship^")
    assert(h == Seq(Hint("COLUMN", "l_shipdate")))
    assert(!h.exists(_.name == "o_orderkey"))
    val empty = hints("SELECT * FROM lineitem WHERE ^")
    assert(empty.exists(_.kind == "KEYWORD"))
    assert(empty.exists(_.name == "l_quantity"))
  }

  test("caret before FROM still sees the FROM scope (reference testSelectList)") {
    val h = hints("SELECT l_order^ FROM lineitem")
    assert(h == Seq(Hint("COLUMN", "l_orderkey")))
  }

  test("hints are deterministic: columns, then tables, then keywords, alphabetical") {
    val h = hints("SELECT * FROM region WHERE r^")
    val kinds = h.map(_.kind)
    assert(kinds == kinds.sortBy(Map("COLUMN" -> 0, "TABLE" -> 1, "KEYWORD" -> 2)))
    val cols = h.filter(_.kind == "COLUMN").map(_.name)
    assert(cols == cols.sorted)
    assert(cols == Seq("r_name", "r_regionkey"))
    assert(h.filter(_.kind == "TABLE").map(_.name) == Seq("region"))
  }

  test("isValid is a parse probe") {
    assert(SqlAdvisor.isValid(spark, "SELECT 1"))
    assert(!SqlAdvisor.isValid(spark, "SELECT 1 +"))
  }

  test("catalog memo: repeated completions cost zero catalog calls (r8 verdict #6)") {
    Tables.registerAll(spark, sfDir)
    // warm the memo (first call after registerAll's invalidate fetches)
    SqlAdvisor.complete(spark, "SELECT l_ FROM lineitem", 9)
    val before = SqlAdvisor.catalogFetches.get()
    // a keystroke burst: 50 completions across table list, qualified and
    // unqualified column positions — all served from the session memo
    for (_ <- 1 to 50) {
      SqlAdvisor.complete(spark, "SELECT l_ FROM lineitem", 9)
      SqlAdvisor.complete(spark, "SELECT * FROM ord", 17)
      SqlAdvisor.complete(spark, "SELECT o.o_order FROM orders o", 16)
    }
    assert(SqlAdvisor.catalogFetches.get() == before,
      "memoized completions must not touch the catalog")
    // DDL through the injected parser invalidates: the new table appears
    // and exactly the re-fetch happens, not one fetch per completion
    Engine.sql(spark, sfDir,
      "CREATE TABLE advisor_memo_t (k INT, v INT DEFAULT 7)")
    try {
      val h = SqlAdvisor.complete(spark, "SELECT * FROM advisor_mem", 25)
      assert(h.exists(_.name == "advisor_memo_t"),
        s"post-DDL completion must see the new table, got $h")
      val afterDdl = SqlAdvisor.catalogFetches.get()
      assert(afterDdl > before)
      SqlAdvisor.complete(spark, "SELECT * FROM advisor_mem", 25)
      assert(SqlAdvisor.catalogFetches.get() == afterDdl,
        "second post-DDL completion must hit the refreshed memo")
    } finally Engine.sql(spark, sfDir, "DROP TABLE advisor_memo_t")
  }
}
