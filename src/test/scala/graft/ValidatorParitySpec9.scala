package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 12 (r15) — inline window
  * definitions and the WINDOW clause: illegal frame bound combinations,
  * RANGE prerequisites, named-window resolution and duplication,
  * PARTITION BY expression typing, and join-ON subquery scope errors.
  * One case per reference assertion family, cited per family; same
  * contract as tranches 1-11 (ValidatorParitySpec..8). Complements
  * tranche 6's frame-bound cases (inverted numeric bounds, DISALLOW
  * PARTIAL, RANGE key typing) with the remaining testInlineWinDef
  * failure rows.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testInlineWinDef:4293 failure block,
  * testPartitionByExpr:4381, testWindowClause RANGE-without-ORDER row,
  * testWindowClause2:4533, testJoinOnInCorrelatedFails:5792,
  * testJoinOnScalarFails:5810). */
class ValidatorParitySpec9 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql(
      """SELECT 1 AS empno, 'Bob' AS ename, 10 AS deptno, 100.0 AS sal,
        |timestamp '2020-01-01 00:00:00' AS hiredate FROM range(3)""".stripMargin)
      .createOrReplaceTempView("vp9_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testInlineWinDef:4293 failure rows -------------------------------
    ("frame lower bound UNBOUNDED FOLLOWING",
      """select sum(sal) over (order by deptno
        |rows between unbounded following and unbounded preceding) from vp9_emp""".stripMargin),
    ("frame upper bound UNBOUNDED PRECEDING",
      """select sum(sal) over (order by deptno
        |rows between 2 preceding and unbounded preceding) from vp9_emp""".stripMargin),
    ("frame FOLLOWING lower with PRECEDING upper",
      """select sum(sal) over (order by deptno
        |rows between 2 following and 2 preceding) from vp9_emp""".stripMargin),
    ("RANGE offsets with a compound ORDER BY",
      """select sum(sal) over (order by deptno, empno
        |range between 2 preceding and 2 following) from vp9_emp""".stripMargin),
    ("reference to an undefined named window",
      "select sum(sal) over w1 from vp9_emp"),
    ("named-window reference combined with an inline spec",
      """select sum(sal) over (w1 partition by deptno order by empno rows 2 preceding)
        |from vp9_emp window w1 as (order by empno)""".stripMargin),
    // ---- testWindowClause2:4533 -------------------------------------------
    ("duplicate window name in one WINDOW clause",
      """select sum(sal) over w from vp9_emp
        |window w as (partition by deptno order by empno rows 2 preceding),
        |       w as (order by empno)""".stripMargin),
    // ---- testWindowClause RANGE-without-ORDER row --------------------------
    ("RANGE frame in a named window without ORDER BY",
      "select sum(sal) over w from vp9_emp window w as (range 100 preceding)"),
    // ---- testPartitionByExpr:4381 ------------------------------------------
    ("PARTITION BY over an ill-typed expression",
      """select sum(sal) over (partition by empno + named_struct('a', 1)
        |order by empno) from vp9_emp""".stripMargin),
    // ---- join-ON subquery scope (testJoinOnInCorrelatedFails:5792,
    // testJoinOnScalarFails:5810)
    ("join ON with a correlated IN over an unknown column",
      """select * from vp9_emp as e join (select 10 as dno) d
        |on d.dno in (select deptno from vp9_emp where deptno < d.bogus)""".stripMargin),
    ("join ON equating to a multi-column scalar subquery",
      """select * from vp9_emp as e join (select 10 as dno) d
        |on d.dno = (select 1, 2 from vp9_emp where deptno < e.deptno)""".stripMargin))

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
  test("divergence pin: empty-frame bound combinations analyze in Spark") {
    fixtures
    // testInlineWinDef rejects CURRENT ROW..PRECEDING and
    // FOLLOWING..CURRENT ROW as boundary-order errors; Spark admits them
    // as (empty or reversed) frames and evaluates to NULL/empty sums
    Seq(
      """select sum(sal) over (order by deptno
        |rows between current row and 2 preceding) from vp9_emp""".stripMargin,
      """select sum(sal) over (order by deptno
        |rows between 2 following and current row) from vp9_emp""".stripMargin)
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("divergence pin: RANGE interval offsets over a numeric ORDER BY key") {
    fixtures
    // testInlineWinDef: "Data Type mismatch between ORDER BY and RANGE
    // clause" for INTERVAL offsets over an INTEGER key; Spark coerces
    assert(spark.sql(
      """select sum(sal) over (order by deptno
        |range between interval '1' second preceding and interval '1' second following)
        |from vp9_emp""".stripMargin).queryExecution.analyzed != null)
  }

  test("control: the accepted window forms analyze cleanly") {
    fixtures
    Seq(
      "select sum(sal) over (partition by deptno order by empno) from vp9_emp",
      """select sum(sal) over (order by deptno
        |rows between unbounded preceding and current row) from vp9_emp""".stripMargin,
      """select sum(sal) over (order by deptno
        |rows between current row and current row) from vp9_emp""".stripMargin,
      """select sum(sal) over (partition by empno + deptno
        |order by empno range 5 preceding) from vp9_emp""".stripMargin,
      "select sum(sal) over w from vp9_emp window w as (order by sal range 100 preceding)",
      """select sum(sal) over w, sum(deptno) over w from vp9_emp
        |window w as (order by hiredate range interval '1' minute preceding)""".stripMargin)
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("stricter pin: correlated scalar subquery in a join ON (reference accepts)") {
    fixtures
    // testJoinOnScalarCorrelated:5804 ACCEPTS a single-column correlated
    // scalar subquery in the ON clause; Spark restricts correlated scalar
    // subqueries to filters/aggregations/projections/DML and rejects it —
    // stricter in Spark, the rewrite is to pre-join or move it to WHERE
    val ex = intercept[Exception](spark.sql(
      """select * from vp9_emp as e join (select 10 as dno) d
        |on d.dno = (select 1 from vp9_emp where deptno < e.deptno)""".stripMargin)
      .queryExecution.analyzed)
    assert(ex.getMessage.contains("UNSUPPORTED_CORRELATED_SCALAR_SUBQUERY"), ex.getMessage)
  }
}
