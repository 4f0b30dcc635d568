package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 19 (r16) — the rank-family window
  * rules of testWindowFunctions2 (reference: core/src/test/java/org/
  * apache/calcite/test/SqlValidatorTest.java testWindowFunctions2 —
  * rule 6a RANK_REQUIRES_ORDER_BY for RANK/DENSE_RANK, rule 6b
  * ROW_RANGE_NOT_ALLOWED_WITH_RANK for explicit frames under the rank
  * family, OVER-clause-required, both inline and through the WINDOW
  * clause). Same contract as tranches 1-18.
  *
  * Divergence pins: Spark extends rule 6a to the WHOLE rank family —
  * ROW_NUMBER/PERCENT_RANK/CUME_DIST also require an ordered window
  * (the reference accepts `row_number() over ()`; Spark's stance makes
  * the nondeterminism an error instead of silent). Window REFINEMENT
  * (`w2 as (w order by deptno)`) is a parse-level gap: Spark's WINDOW
  * clause has no window-reference grammar, so the reference's .ok()
  * refinement row rejects at parse — pinned as a divergence. */
class ValidatorParitySpec16 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql("SELECT 1 AS empno, 10 AS deptno, 100.0 AS sal FROM range(3)")
      .createOrReplaceTempView("vp16_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // rule 6a — ORDER BY required with RANK & DENSE_RANK
    ("RANK over an unordered window",
      "select rank() over (partition by deptno) from vp16_emp"),
    ("DENSE_RANK over an unordered window",
      "select dense_rank() over (partition by deptno) from vp16_emp"),
    ("PERCENT_RANK over an unordered window",
      "select percent_rank() over (partition by empno) from vp16_emp"),
    ("CUME_DIST over an empty window spec",
      "select cume_dist() over () from vp16_emp"),
    ("RANK over an unordered WINDOW-clause definition",
      "select rank() over w from vp16_emp window w as (partition by sal)"),
    ("DENSE_RANK over an unordered WINDOW-clause definition",
      "select dense_rank() over w from vp16_emp window w as (partition by deptno)"),
    // rule 6b — framing not allowed with the rank family
    ("RANK with an explicit ROWS frame",
      """select rank() over (order by empno rows between 2 preceding and current row)
        |from vp16_emp""".stripMargin),
    ("DENSE_RANK with an explicit ROWS frame",
      """select dense_rank() over (order by empno rows between 2 preceding and current row)
        |from vp16_emp""".stripMargin),
    ("ROW_NUMBER with an explicit ROWS frame",
      """select row_number() over (order by deptno rows between 2 preceding and current row)
        |from vp16_emp""".stripMargin),
    ("RANK with a ROWS frame through the WINDOW clause",
      """select rank() over w from vp16_emp
        |window w as (order by empno rows between 2 preceding and current row)""".stripMargin),
    // OVER clause is necessary for window functions
    ("DENSE_RANK without an OVER clause",
      "select dense_rank() from vp16_emp"))

  for ((name, sql) <- rejects)
    test(s"window rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  test("window controls: the accepted rank-family forms analyze cleanly") {
    fixtures
    Seq(
      "select rank() over (order by empno) from vp16_emp",
      "select dense_rank() over (order by deptno) from vp16_emp",
      "select percent_rank() over (order by empno) from vp16_emp",
      "select cume_dist() over (order by empno) from vp16_emp",
      "select row_number() over (order by deptno) from vp16_emp",
      "select nth_value(sal, 2) over (order by empno) from vp16_emp",
      "select rank() over w from vp16_emp window w as (order by empno)")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("pinned divergence: unordered ROW_NUMBER and window refinement") {
    fixtures
    // the reference accepts row_number() over () / over (partition by x);
    // Spark requires an ordered window for the whole rank family
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select row_number() over () from vp16_emp")
        .queryExecution.analyzed
    }
    // the reference accepts WINDOW refinement `w2 as (w order by deptno)`;
    // Spark's WINDOW clause has no window-reference grammar
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      spark.sql(
        """select rank() over w2 from vp16_emp
          |window w as (partition by sal), w2 as (w order by deptno)""".stripMargin)
        .queryExecution.analyzed
    }
  }
}
