package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 14 (r15) — SELECT DISTINCT
  * discipline, ORDER BY visibility under DISTINCT and GROUP BY,
  * window-over-aggregate grouping (the testNestedAggOver matrix), and
  * GROUP BY expression equivalence. One case per reference assertion
  * family, cited per family; same contract as tranches 1-13
  * (ValidatorParitySpec..10): each statement must be REJECTED before
  * execution; accepted-control twins guard vacuity.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testSelectDistinct:~1030, testOrderGroupDistinct,
  * testNestedAggOver, testGroupExpressionEquivalenceId,
  * testGroupExpressionEquivalenceLiteral). */
class ValidatorParitySpec11 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql(
      """SELECT 1 AS empno, 'Bob' AS ename, 10 AS deptno, 100.0 AS sal
        |FROM range(3)""".stripMargin)
      .createOrReplaceTempView("vp11_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testSelectDistinct ------------------------------------------------
    ("DISTINCT column absent from GROUP BY",
      "SELECT DISTINCT deptno FROM vp11_emp GROUP BY sal"),
    ("DISTINCT mixing a bare column with an aggregate, no GROUP BY",
      "SELECT DISTINCT deptno, avg(sal) FROM vp11_emp"),
    ("DISTINCT star over a grouped query",
      "SELECT DISTINCT * FROM vp11_emp GROUP BY deptno"),
    ("DISTINCT with HAVING over a non-grouped column",
      "SELECT DISTINCT deptno, 33 FROM vp11_emp HAVING deptno > 55"),
    // ---- ORDER BY visibility (testSelectDistinct, testOrderGroupDistinct) --
    ("ORDER BY a column outside the DISTINCT select list",
      "SELECT DISTINCT deptno FROM vp11_emp ORDER BY deptno, empno"),
    ("ORDER BY an aggregate under a non-aggregating DISTINCT select",
      "SELECT DISTINCT deptno FROM vp11_emp ORDER BY deptno, sum(empno)"),
    ("grouped ORDER BY a non-grouped column",
      "SELECT deptno FROM vp11_emp GROUP BY deptno ORDER BY deptno, empno"),
    ("DISTINCT projects before ORDER BY even when GROUP BY is wider",
      """SELECT DISTINCT deptno FROM vp11_emp
        |GROUP BY deptno, empno ORDER BY deptno, empno""".stripMargin),
    // ---- testNestedAggOver matrix -------------------------------------------
    ("window PARTITION BY over a non-grouped column",
      """select avg(sum(sal)) OVER (partition by empno)
        |from vp11_emp group by deptno""".stripMargin),
    ("triple-nested aggregate inside OVER",
      """select avg(sum(min(sal))) OVER (partition by deptno)
        |from vp11_emp group by deptno""".stripMargin),
    ("windowed bare column beside a windowed nested aggregate",
      """select avg(sal) OVER (), avg(count(empno)) OVER (partition by 1)
        |from vp11_emp group by deptno""".stripMargin),
    // ---- testGroupExpressionEquivalenceId -----------------------------------
    ("CASE select expression not equivalent to the grouped CASE",
      """select case empno when 10 then deptno else null end from vp11_emp
        |group by case empno when 10 then sal else null end""".stripMargin))

  for ((name, sql) <- rejects)
    test(s"rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  test("control: the accepted forms analyze cleanly") {
    fixtures
    Seq(
      // testSelectDistinct accepted rows
      "SELECT DISTINCT deptno FROM vp11_emp",
      "SELECT DISTINCT deptno, sal FROM vp11_emp",
      "SELECT DISTINCT deptno FROM vp11_emp GROUP BY deptno",
      "SELECT DISTINCT avg(sal) from vp11_emp",
      "SELECT DISTINCT deptno, sal from vp11_emp GROUP BY sal, deptno",
      "SELECT DISTINCT deptno, 33 FROM vp11_emp GROUP BY deptno HAVING deptno > 55",
      "SELECT DISTINCT deptno from vp11_emp ORDER BY deptno + 2",
      // testOrderGroupDistinct accepted rows
      "select distinct count(empno) AS countEMPNO from vp11_emp order by 1",
      // (the un-aliased `order by sum(empno)` spelling of this row is the
      // stricter pin below — Spark sorts DISTINCT output by alias/ordinal)
      """SELECT DISTINCT deptno, sum(empno) AS s FROM vp11_emp
        |GROUP BY deptno ORDER BY deptno, s""".stripMargin,
      // testNestedAggOver accepted rows
      "select avg(sum(sal)) OVER (partition by 1) from vp11_emp group by deptno",
      "select avg(count(*)) OVER () from vp11_emp group by deptno",
      "select count(deptno) OVER () from vp11_emp group by deptno",
      // testGroupExpressionEquivalenceId: qualified/unqualified equivalence
      """select case empno when 10 then deptno else null end from vp11_emp
        |group by case empno when 10 then vp11_emp.deptno else null end""".stripMargin)
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("stricter pin: ORDER BY re-spelling an un-aliased DISTINCT aggregate") {
    fixtures
    // testOrderGroupDistinct ACCEPTS `select distinct count(empno) from emp
    // order by count(empno)`; Spark resolves the sort against the DISTINCT
    // output and will not recompute the aggregate — the ordinal or an
    // alias is the Spark spelling (both in the controls above)
    val ex = intercept[Exception](spark.sql(
      "select distinct count(empno) from vp11_emp order by count(empno)")
      .queryExecution.analyzed)
    assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException], ex.getMessage)
  }
}
