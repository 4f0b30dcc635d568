package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 18 (r16) — GROUPING/GROUPING_ID
  * placement validation and GROUP BY alias resolution (reference:
  * core/src/test/java/org/apache/calcite/test/SqlValidatorTest.java
  * testGroupId, testGroupingId ["may only occur in an aggregate query" /
  * "may only occur in SELECT, HAVING or ORDER BY clause", nested
  * aggregates], testAliasInGroupBy [a select alias that shadows a real
  * column resolves to the COLUMN in GROUP BY]). Same contract as
  * tranches 1-17; accepted controls mirror the .ok() rows.
  *
  * Divergence pins: Spark implements ORACLE's stricter rule — GROUPING
  * over a plain (non-CUBE/ROLLUP/SETS) GROUP BY is rejected — which the
  * reference itself footnotes on these exact rows ("Oracle throws
  * 'GROUPING function only supported with GROUP BY CUBE or ROLLUP'");
  * and GROUP_ID() has no Spark builtin — the engine's GROUP_ID surface
  * is the computed form the agg_group_id registry query oracles
  * (grouping_id-derived duplicate-set counter). */
class ValidatorParitySpec15 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit =
    spark.sql(
      """SELECT 1 AS empno, 'Bob' AS ename, 10 AS deptno, 100.0 AS sal
        |FROM range(3)""".stripMargin)
      .createOrReplaceTempView("vp15_emp")

  private val rejects: Seq[(String, String)] = Seq(
    // testGroupId/testGroupingId: "may only occur in an aggregate query"
    ("GROUPING in a non-aggregate select",
      "select grouping(deptno) from vp15_emp"),
    ("GROUPING in ORDER BY of a non-aggregate query",
      "select deptno from vp15_emp order by grouping(deptno)"),
    // "may only occur in SELECT, HAVING or ORDER BY clause"
    ("GROUPING_ID in WHERE",
      "select deptno from vp15_emp where grouping_id(deptno) = 1 group by deptno"),
    ("GROUPING_ID as a GROUP BY key",
      "select deptno from vp15_emp group by grouping_id(deptno)"),
    ("GROUPING beside a plain GROUP BY key list",
      "select deptno from vp15_emp group by deptno, grouping(deptno)"),
    ("GROUPING inside a CUBE key",
      "select deptno from vp15_emp group by cube(empno, grouping(deptno))"),
    ("GROUPING inside a GROUPING SETS key",
      "select deptno from vp15_emp group by grouping sets(deptno, grouping(deptno))"),
    // "Aggregate expressions cannot be nested"
    ("GROUPING over an aggregate",
      "select grouping(sum(empno)) from vp15_emp group by deptno"),
    // testAliasInGroupBy: an alias shadowing a REAL column resolves to
    // the column — deptno stays non-aggregated and the query rejects
    ("GROUP BY alias shadowed by a real column resolves to the column",
      "select deptno as empno, count(*) from vp15_emp group by empno"))

  for ((name, sql) <- rejects)
    test(s"grouping rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  test("grouping controls: the accepted placements analyze cleanly") {
    fixtures
    Seq(
      // grouping/grouping_id over CUBE/ROLLUP/GROUPING SETS in SELECT,
      // HAVING and ORDER BY — the reference's .ok() placements on the
      // lattice-grouped forms
      "select deptno, grouping(deptno) from vp15_emp group by cube(deptno)",
      "select deptno, grouping_id(deptno, empno) from vp15_emp group by cube(deptno, empno)",
      "select deptno from vp15_emp group by rollup(deptno) having grouping(deptno) = 0",
      "select deptno from vp15_emp group by grouping sets(deptno, ()) order by grouping(deptno)",
      // testAliasInGroupBy accepted rows: alias and ordinal grouping
      "select deptno as d from vp15_emp group by d",
      "select deptno as d, count(*) from vp15_emp group by d",
      "select 1 as uno from vp15_emp group by uno",
      "select deptno as dno, count(*) from vp15_emp group by cube(dno)",
      // testAliasInHaving accepted rows
      "select count(empno) as e from vp15_emp having e > 1",
      "select deptno as d, count(*) as c from vp15_emp group by d having c > 1")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("pinned divergence: GROUPING over a plain GROUP BY key") {
    fixtures
    // the reference ACCEPTS `select deptno, grouping(deptno) ... group by
    // deptno`; Spark rejects unless the grouping is CUBE/ROLLUP/SETS —
    // Oracle's rule, which the reference's own comments cite on the
    // adjacent GROUP_ID rows
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("select deptno, grouping(deptno) from vp15_emp group by deptno")
        .queryExecution.analyzed
    }
    assert(ex.getMessage.contains("grouping"), ex.getMessage)
  }
}
