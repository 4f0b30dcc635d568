package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 13 (r15) — clause-condition and
  * aggregate-placement validation: WHERE/ON must be conditions, HAVING
  * scope, ungrouped select columns, aggregates in GROUP BY / ORDER BY /
  * VALUES, SUM arity, GROUPING over a non-grouped expression, WITHIN
  * GROUP legality, CASE branch mixing, name-resolution suggestions,
  * UNNEST operand/alias degree, and string-function operand typing.
  * One case per reference assertion family, cited per family; same
  * contract as tranches 1-12 (ValidatorParitySpec..9): each statement
  * must be REJECTED before execution; accepted-control twins guard
  * vacuity; reference-rejects Spark ACCEPTS (through implicit coercion)
  * are pinned as documented divergences.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testWhere:5867, testOn:5872, testHaving:5877,
  * testInvalidGroupBy:5086, testAggregateInNonGroupBy:7051,
  * testAggregateInGroupByFails:7046, testAggregateInOrderByFails:7068,
  * testSumTooManyArgs:5410, testCubeGrouping:5395, testWithinGroup:7101,
  * testValuesWithAggFuncs:8309, testScalarsFails:338,
  * testCaseExpressionFails:570, testColumnNotFoundDidYouMean:8593,
  * testTableNotFoundDidYouMean:8553, testUnnestArray:7482,
  * testSubstringFails:958, testOverlay:899, testPosition:816,
  * testUnionTypeMismatchWithStarFails:5503). */
class ValidatorParitySpec10 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql(
      """SELECT 1 AS empno, 'Bob' AS ename, 10 AS deptno, 100.0 AS sal,
        |timestamp '2020-01-01 00:00:00' AS hiredate FROM range(3)""".stripMargin)
      .createOrReplaceTempView("vp10_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // ---- clause-condition typing (testWhere:5867, testOn:5872) -----------
    ("WHERE clause that is not a condition",
      "select * from vp10_emp where ename"),
    ("join ON clause that is not a condition",
      "select * from vp10_emp e1 left outer join vp10_emp e2 on e1.sal"),
    // ---- HAVING scope (testHaving:5877) -----------------------------------
    ("star select with HAVING and no GROUP BY",
      "select * from vp10_emp having sum(sal) > 10"),
    ("HAVING referencing a non-grouped column",
      "select deptno from vp10_emp group by deptno having sal > 10"),
    // ---- grouping discipline (testInvalidGroupBy:5086,
    // testAggregateInNonGroupBy:7051) ---------------------------------------
    ("select column absent from GROUP BY",
      "select empno, deptno from vp10_emp group by deptno"),
    ("aggregate mixed with a bare column and no GROUP BY",
      "select count(1), empno from vp10_emp"),
    // ---- aggregate placement (testAggregateInGroupByFails:7046,
    // testAggregateInOrderByFails:7068, testValuesWithAggFuncs:8309) --------
    ("aggregate function inside GROUP BY",
      "select count(*) from vp10_emp group by sum(empno)"),
    ("ORDER BY an aggregate in a non-aggregate query",
      "select empno from vp10_emp order by sum(empno)"),
    ("aggregate call inside a VALUES row",
      "values(count(1))"),
    // ---- aggregate signatures (testSumTooManyArgs:5410) -------------------
    ("SUM with two arguments",
      "select sum(empno, deptno) from vp10_emp group by deptno"),
    // ---- GROUPING operand (testCubeGrouping:5395) --------------------------
    ("GROUPING over an expression not in the grouping set",
      """select deptno, grouping(deptno + 1) from vp10_emp
        |group by cube(deptno, empno)""".stripMargin),
    // ---- WITHIN GROUP legality (testWithinGroup:7101) ----------------------
    ("WITHIN GROUP attached to a non-aggregate function",
      "select power(deptno, 1) within group(order by 1) from vp10_emp"),
    ("aggregate inside the WITHIN GROUP sort key",
      """select listagg(cast(empno as string)) within group(order by count(*))
        |from vp10_emp group by deptno""".stripMargin),
    // ---- scalar typing (testScalarsFails:338) ------------------------------
    ("adding an integer to a boolean",
      "select 1 + true from (values(true))"),
    // ---- CASE branch mixing (testCaseExpressionFails:570 "Illegal mixing
    // of types in CASE or COALESCE statement") -------------------------------
    ("CASE whose THEN branches cannot be unified",
      "select case when true then 1 when false then array(1) end"),
    // ---- name resolution with suggestions (testColumnNotFoundDidYouMean:
    // 8593, testTableNotFoundDidYouMean:8553) --------------------------------
    ("misspelled column (did-you-mean family)",
      "select empNoo from vp10_emp"),
    ("unknown table",
      "select * from vp10_unknown_table"),
    // ---- UNNEST operand and alias degree (testUnnestArray:7503,7506) -------
    ("UNNEST/explode of a scalar operand",
      "select * from vp10_emp lateral view explode(empno) t as x"),
    ("table-function alias list with the wrong degree",
      "select * from vp10_emp lateral view explode(array(1,2)) t as x, y"),
    // ---- string-function operand typing (testSubstringFails:958,
    // testOverlay:899 coercion-off rows; Spark rejects the datetime operand
    // even with coercion on) --------------------------------------------------
    ("SUBSTRING with a timestamp start position",
      "select substring(ename from hiredate) from vp10_emp"),
    ("OVERLAY with a timestamp FROM position",
      "select overlay(ename placing 'x' from hiredate) from vp10_emp"))

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

  // ---- stricter pin: Spark REJECTS what the reference only rejects with
  // coercion disabled --------------------------------------------------------
  test("stricter pin: star-expanded UNION with an uncoercible column") {
    fixtures
    // testUnionTypeMismatchWithStarFails:5503 rejects "Type mismatch in
    // column 2 of UNION" only withTypeCoercion(false); Spark will not
    // unify timestamp with int in a UNION even by default
    val ex = intercept[Exception](spark.sql(
      "select * from vp10_emp union select 1, 2, 3, 4, 5 from vp10_emp")
      .queryExecution.analyzed)
    assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException], ex.getMessage)
  }

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS ----------
  test("divergence pin: HAVING a non-boolean aggregate analyzes in Spark") {
    fixtures
    // testHaving:5877 "HAVING clause must be a condition"; Spark casts the
    // decimal aggregate to boolean under its HAVING condition coercion
    assert(spark.sql(
      "select deptno from vp10_emp group by deptno having sum(sal)")
      .queryExecution.analyzed != null)
  }

  test("divergence pin: POSITION of a binary needle in a string haystack") {
    fixtures
    // testPosition:816 "Parameters must be of the same type"; Spark coerces
    // the binary literal to string and evaluates
    assert(spark.sql("select position(x'12' in 'abc')")
      .queryExecution.analyzed != null)
  }

  test("divergence pin: CASE with all-NULL branches types as NULL") {
    fixtures
    // testCaseExpressionFails:578 rejects "ELSE clause or at least one THEN
    // clause must be non-NULL" with coercion off; Spark types it NULL
    assert(spark.sql("select case 1 when 1 then null else null end")
      .queryExecution.analyzed != null)
  }

  test("control: the accepted forms analyze cleanly") {
    fixtures
    Seq(
      // testInvalidGroupBy3 accepted row: rollup over expressions
      "select deptno / 2 + 1, count(*) c from vp10_emp group by rollup(deptno / 2, sal)",
      // testAggregateInOrderByFails accepted row
      "select sum(empno) from vp10_emp group by deptno order by sum(empno)",
      // testWithinGroup accepted rows
      """select listagg(cast(empno as string)) within group(order by empno)
        |from vp10_emp group by deptno""".stripMargin,
      // testTrimFails/testSubstring default-coercion accepts
      "select trim(123 from 'beard')",
      "select substring('a' from 1 for '3')",
      // testScalars accepted arithmetic
      "select 1 + 2, 1.2 * 3.4, 1 / 2.3 from (values(true))")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
