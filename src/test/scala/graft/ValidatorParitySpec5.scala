package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 7 (r14) — ORDER BY / GROUP BY
  * ordinal and alias errors, nested aggregates, HAVING scope, set-op
  * arity/type mismatches, expression type checking, ambiguity and
  * scoping, inline-VALUES shape errors, TABLESAMPLE bounds and LIMIT
  * legality — one case per reference assertion, cited per family.
  * Same contract as tranches 1-6 (ValidatorParitySpec..4): each
  * statement must be REJECTED before execution; accepted-control twins
  * guard vacuity; reference-rejects Spark ACCEPTS (through implicit
  * coercion or laxer scoping) are pinned as documented divergences.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testOrder:6145, testOrderGroup:6327,
  * testGroupByOrdinal family via testOrderGroup, testNestedAggFails:6881,
  * testAggregateInGroupByFails:7046, testHaving:5877,
  * testUnionCountMismatchFails:5465,
  * testUnionCountMismatcWithValuesFails:5472,
  * testUnionTypeMismatchFails:5489, testValuesTypeMismatchFails:5551,
  * testArithmeticOperatorsFails:490, testCaseExpressionFails:570,
  * testAmbiguousColumn:4723, testWith:5899). */
class ValidatorParitySpec5 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql(
      """SELECT * FROM VALUES ('Jane', 10, 1000.0), ('Bob', 20, 2000.0)
        |AS t(ename, deptno, sal)""".stripMargin)
      .createOrReplaceTempView("vp5_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testOrder:6145 — ORDER BY ordinal bounds ----------------------
    ("ORDER BY ordinal beyond the select list",
      "select ename from vp5_emp order by 2"),
    ("ORDER BY ordinal zero",
      "select ename from vp5_emp order by 0"),
    ("ORDER BY an ambiguous duplicate output alias",
      "select ename as x, deptno as x from vp5_emp order by x"),
    // ---- testOrderGroup:6327 / GROUP BY ordinals -----------------------
    ("GROUP BY ordinal beyond the select list",
      "select ename, deptno from vp5_emp group by 3"),
    ("GROUP BY ordinal pointing at an aggregate (testAggregateInGroupByFails:7046)",
      "select ename, count(*) from vp5_emp group by 2"),
    ("non-aggregated column outside GROUP BY",
      "select ename, deptno from vp5_emp group by deptno"),
    // ---- testNestedAggFails:6881 ---------------------------------------
    ("nested aggregate COUNT(COUNT(*))",
      "select count(count(*)) from vp5_emp"),
    ("nested aggregate in ORDER BY over grouped query",
      "select sum(max(sal)) from vp5_emp group by deptno order by max(count(*))"),
    // ---- testHaving:5877 — HAVING scope --------------------------------
    ("HAVING references a non-grouped column",
      "select deptno, avg(sal) from vp5_emp group by deptno having ename = 'Bob'"),
    // ---- testUnionCountMismatchFails:5465 / TypeMismatch:5489 ----------
    ("UNION column-count mismatch",
      "select ename, deptno from vp5_emp union select ename from vp5_emp"),
    ("UNION incompatible column types (int vs struct)",
      "select deptno from vp5_emp union select named_struct('a', 1) from vp5_emp"),
    // ---- testArithmeticOperatorsFails:490 / type checking --------------
    ("addition over a struct operand",
      "select 1 + named_struct('a', 1)"),
    ("CASE branches of irreconcilable types (testCaseExpressionFails:570)",
      "select case when true then 1 else named_struct('a', 2) end"),
    ("SUBSTRING position of struct type",
      "select substring(1234, named_struct('a',1))"),
    ("array subscript of struct type",
      "select array(1,2)[named_struct('a',1)]"),
    // ---- testAmbiguousColumn:4723 --------------------------------------
    ("ambiguous unqualified column across two relations",
      "select e1.ename from vp5_emp e1, vp5_emp e2 where ename = 'Bob'"),
    ("unknown column",
      "select unknowncol from vp5_emp"),
    // ---- testWith:5899 — duplicate CTE names ---------------------------
    ("duplicate CTE names in one WITH",
      "with w as (select 1 a), w as (select 2 b) select * from w"),
    // ---- testUnionCountMismatcWithValuesFails:5472 /
    //      testValuesTypeMismatchFails:5551 -------------------------------
    ("inline VALUES rows of different arity",
      "select * from values (1, 2), (3) as t(a, b)"),
    ("inline VALUES rows of incompatible types",
      "select * from values (1, 2), ('a', named_struct('x',1)) as t(a, b)"),
    // ---- TABLESAMPLE bounds / LIMIT legality ---------------------------
    ("TABLESAMPLE above 100 percent",
      "select * from vp5_emp tablesample (150 percent)"),
    ("TABLESAMPLE negative percent",
      "select * from vp5_emp tablesample (-1 percent)"),
    ("negative LIMIT",
      "select * from vp5_emp limit -5"),
    ("non-constant LIMIT",
      "select * from vp5_emp limit sal"),
    ("OVER applied to a plain column (window of a non-function)",
      "select deptno over () from vp5_emp"))

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

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS --------
  test("divergence pin: implicit coercions and lax scoping the reference rejects") {
    fixtures
    Seq(
      // INTERSECT of string vs int — Spark coerces to a common type
      "select ename from vp5_emp intersect select deptno from vp5_emp",
      // string AND boolean — Spark casts the string
      "select 'true' AND true",
      // duplicate relation alias in one FROM — Calcite 'Duplicate relation name'
      "select * from vp5_emp e1 join vp5_emp e1 on true",
      // EXISTS with a multi-column sub-query select list
      "select exists (select deptno, ename from vp5_emp) and true")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("control: the accepted twins of the rejection families analyze cleanly") {
    fixtures
    Seq(
      "select ename from vp5_emp order by 1",
      "select ename, deptno from vp5_emp group by 1, 2",
      "select count(*) from vp5_emp",
      "select deptno, avg(sal) from vp5_emp group by deptno having deptno > 5",
      "select ename from vp5_emp union select ename from vp5_emp",
      "select case when true then 1 else 2 end",
      "select e1.ename from vp5_emp e1, vp5_emp e2 where e1.ename = 'Bob'",
      "with w as (select 1 a), w2 as (select 2 b) select * from w, w2",
      "select * from values (1, 2), (3, 4) as t(a, b)",
      "select * from vp5_emp tablesample (50 percent)",
      "select * from vp5_emp limit 5")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
