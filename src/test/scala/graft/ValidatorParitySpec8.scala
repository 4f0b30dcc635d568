package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 11 (r15) — FROM-clause and name
  * resolution: AS-column-list arity and shadowing, star (*) placement
  * errors, aggregate argument counts, alias obscuring and forward scope,
  * NATURAL/USING join errors, GROUP BY table-alias resolution, WITH
  * column-alias arity, and set-op ORDER BY ordinals. One case per
  * reference assertion family, cited per family; same contract as
  * tranches 1-10 (ValidatorParitySpec..7).
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testAsColumnList:4837, testStarIdentifier:4792,
  * testStarAliasFails:4797, testNonLocalStar:4802, testStarInFromFails:4815,
  * testStarDotIdFails:4826, testSumTooManyArgs:5410, testSumTooFewArgs:5415,
  * testObscuredAliasFails:5424, testFromReferenceFails:5432,
  * testJoinUsing:5568, testInnerJoinWithoutUsingOrOnFails:5630,
  * testNaturalJoinWithOnFails:5637, testNaturalJoinWithUsing:5642,
  * testNaturalJoinIncompatibleDatatype:5666, testJoinUsingDupColsFails:5705,
  * testInvalidGroupByWithInvalidTableName:5117, testWithColumnAlias:5967,
  * testOrderUnion:6269). */
class ValidatorParitySpec8 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit = {
    spark.sql("SELECT 10 AS deptno, 'acc' AS name FROM range(2)")
      .createOrReplaceTempView("vp8_dept")
    spark.sql(
      "SELECT 1 AS empno, 'Bob' AS ename, 10 AS deptno, 100.0 AS sal FROM range(3)")
      .createOrReplaceTempView("vp8_emp")
  }

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testAsColumnList:4837 -------------------------------------------
    ("AS-column-list hides the original column name",
      "select d.deptno from vp8_dept as d(a, b)"),
    ("AS-column-list wider than the table",
      "select 1 from vp8_dept as d(a, b, c)"),
    ("AS-column-list narrower than the table",
      "select 1 from vp8_dept as d(a)"),
    // ---- star placement (testStarIdentifier:4792, testStarAliasFails:4797,
    // testNonLocalStar:4802, testStarInFromFails:4815, testStarDotIdFails:4826)
    ("star with a field access", "select *.deptno from vp8_dept"),
    ("star given an alias", "select * as x from vp8_dept"),
    ("qualified star of a table not in scope", "select vp8_emp.* from vp8_dept"),
    ("star inside an expression", "select * + 1 from vp8_dept"),
    // ---- aggregate argument counts (testSumTooManyArgs:5410, TooFew:5415)
    ("SUM with two arguments",
      "select sum(empno, deptno) from vp8_emp group by deptno"),
    ("SUM with no arguments",
      "select sum() from vp8_emp group by deptno"),
    // ---- alias scope (testObscuredAliasFails:5424, testFromReferenceFails:5432)
    ("reference to a table obscured by its alias",
      """select * from vp8_emp as e where exists (
        |  select 1 from vp8_dept where vp8_dept.deptno = vp8_emp.deptno)""".stripMargin),
    ("FROM item referencing a sibling FROM alias (non-lateral)",
      """select * from vp8_emp as e1 where exists (
        |  select * from vp8_emp as e2 join
        |    (select * from vp8_dept where vp8_dept.deptno = e2.deptno))""".stripMargin),
    // ---- NATURAL / USING joins (testNaturalJoinWithOnFails:5637,
    // testNaturalJoinWithUsing:5642, testNaturalJoinIncompatibleDatatype:5666,
    // testJoinUsing:5568)
    ("NATURAL join with an ON clause",
      "select * from vp8_emp natural join vp8_dept on vp8_emp.deptno = vp8_dept.deptno"),
    ("NATURAL join with a USING clause",
      "select * from vp8_emp natural join vp8_dept using (deptno)"),
    ("NATURAL join over incomparable shared-column types",
      """select * from (select ename as name, sal as deptno from vp8_emp)
        |natural join (select deptno, named_struct('a', 1) as name from vp8_dept)""".stripMargin),
    ("USING column that exists on neither side",
      "select * from vp8_emp join vp8_dept using (bogus)"),
    ("USING column missing from one side",
      "select * from vp8_emp join (select name from vp8_dept) using (deptno)"),
    // ---- GROUP BY resolution (testInvalidGroupByWithInvalidTableName:5117)
    ("GROUP BY a column of an unknown table alias",
      "select deptno from vp8_emp group by unknown_alias.deptno"),
    // ---- WITH column alias arity (testWithColumnAlias:5967) ---------------
    ("WITH column-alias list wider than the CTE select",
      "with w(a, b) as (select 1) select * from w"),
    // ---- set-op ORDER BY ordinal (testOrderUnion:6269) --------------------
    ("UNION ORDER BY ordinal beyond the output",
      """select deptno from vp8_dept union select deptno from vp8_dept
        |order by 3""".stripMargin))

  for ((name, sql) <- rejects)
    test(s"rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[IllegalArgumentException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS ---------
  test("divergence pin: join laxities the reference rejects at validation") {
    fixtures
    Seq(
      // testInnerJoinWithoutUsingOrOnFails:5630 — Calcite requires a
      // condition on INNER JOIN; Spark treats the bare join as cross-like
      // and lets WHERE carry the predicate
      """select * from vp8_emp inner join vp8_dept
        |where vp8_emp.deptno = vp8_dept.deptno""".stripMargin,
      // testJoinUsingDupColsFails:5705 — a USING column duplicated on one
      // side; Spark resolves to the first match
      """select * from vp8_emp join
        |(select deptno, deptno from vp8_dept) using (deptno)""".stripMargin,
      // testWithColumnAlias:5967 duplicate-name row — Spark allows
      // duplicate column aliases in a WITH item until referenced
      "with w(a, a) as (select 1, 2) select * from w")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("control: the accepted twins analyze cleanly") {
    fixtures
    Seq(
      "select d.a, b from vp8_dept as d(a, b)",
      "select * from (values ('a', 1), ('bc', 2)) t (a, b)",
      "select vp8_dept.* from vp8_dept",
      "select sum(empno) from vp8_emp group by deptno",
      "select * from vp8_emp natural join vp8_dept",
      "select * from vp8_emp join vp8_dept using (deptno)",
      "with w(a, b) as (select 1, 2) select a, b from w",
      """select deptno from vp8_dept union select deptno from vp8_dept
        |order by 1""".stripMargin)
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
