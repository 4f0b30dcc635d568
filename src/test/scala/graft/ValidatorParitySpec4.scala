package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 6 (r13 VERDICT #3): window-in-
  * wrong-clause errors, window frame-bound errors, interval literal/
  * qualifier errors, collection-table and CURSOR operands, DEFAULT in
  * call positions, grouping-function placement, and MATCH_RECOGNIZE
  * define/subset/skip/measure errors — one case per reference assertion,
  * cited per family. Same contract as [[ValidatorParitySpec]]/2/3: each
  * statement must be REJECTED before execution; accepted-control twins
  * guard against vacuity; reference-rejects that Spark ACCEPTS are
  * pinned as documented divergences.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testWindowFunctionsWithoutOver:3906,
  * testOverInPartitionBy:3930, testOverInOrderBy:3941,
  * testAggregateInsideOverClause:3965, testWindowClause:4394,
  * testWindowNegative:4603, testWindowPartial:4635,
  * testIntervalLiterals:3497 with its negative sub-tests,
  * testMultiset:1619, testMultisetSetOperators:1653, testUnnest:7453,
  * testCollectionTable:7910, testCollectionTableWithCursorParam:7976,
  * testInsertTargetTableWithVirtualColumns:9288,
  * testInsertFailNullability:9322, testGroupingFunc family) and
  * core/src/test/java/org/apache/calcite/test/SqlValidatorMatchTest.java
  * (testMatchRecognizeDefines2:57, testMatchRecognizeSkipTo3:146,
  * testMatchRecognizeSubset:187, testMatchRecognizeSubset2:200,
  * testMatchRecognizeWithin:213). MATCH_RECOGNIZE cases raise inside
  * graft's SQL front end (plans/MatchRecognizeSql — its build-time
  * name-scope validation; the injected parser then falls through to the
  * delegate, whose rejection is what the user sees), one step earlier
  * than the reference's validator with the same outcome — the
  * established tranche convention for parse-level rejections.
  */
class ValidatorParitySpec4 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit = {
    spark.sql(
      """SELECT * FROM VALUES ('Jane', 10, 1000.0), ('Bob', 20, 2000.0)
        |AS t(ename, deptno, sal)""".stripMargin)
      .createOrReplaceTempView("vp4_emp")
    Tables.registerAll(spark, sfDir) // events, for the MATCH_RECOGNIZE shells
  }

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testWindowFunctionsWithoutOver:3906 ---------------------------
    ("window function without OVER in ORDER BY",
      "select sum(deptno) from vp4_emp group by deptno order by row_number()"),
    ("bare RANK() without OVER",
      "select rank() from vp4_emp"),
    ("bare NTH_VALUE without OVER",
      "select nth_value(sal, 2) from vp4_emp"),
    // ---- testAggregateInsideOverClause:3965 ----------------------------
    ("ungrouped column next to aggregate-partitioned window",
      "select deptno, sum(deptno) over (partition by min(sal)) from vp4_emp"),
    // ---- testWindowNegative:4603 — negative-size frames ----------------
    ("ROWS frame lower bound above upper (2 preceding .. 4 preceding)",
      "select sum(deptno) over (order by deptno rows between 2 preceding and 4 preceding) from vp4_emp"),
    ("ROWS frame 1 following .. 0 following",
      "select sum(deptno) over (order by deptno rows between 1 following and 0 following) from vp4_emp"),
    ("RANGE frame 4 following .. 3 following",
      "select sum(deptno) over (order by deptno range between 4 following and 3 following) from vp4_emp"),
    // ---- testWindowPartial:4635 — DISALLOW PARTIAL is not SQL here -----
    ("DISALLOW PARTIAL window suffix",
      "select sum(deptno) over (order by deptno, ename rows 2 preceding disallow partial) from vp4_emp"),
    // ---- testWindowClause:4394 — RANGE prerequisites -------------------
    ("RANGE with offsets over a non-numeric ORDER BY key",
      "select sum(deptno) over (order by ename range between 2 preceding and 2 following) from vp4_emp"),
    ("RANGE with compound ORDER BY",
      "select first_value(sal) over (order by deptno range between 2 preceding and 2 following, deptno) from vp4_emp"),
    // ---- testIntervalLiterals:3497 negative sub-tests ------------------
    ("fractional value in non-second interval (INTERVAL '1.0' HOUR)",
      "select interval '1.0' hour"),
    ("malformed interval value (INTERVAL '1,5' YEAR)",
      "select interval '1,5' year"),
    ("YEAR TO MONTH with time-shaped literal (INTERVAL '1:2')",
      "select interval '1:2' year to month"),
    ("DAY TO HOUR with year-month-shaped literal (INTERVAL '1-2')",
      "select interval '1-2' day to hour"),
    ("interval value overflow (20-digit seconds)",
      "select interval '99999999999999999999' second"),
    ("non-numeric interval value (INTERVAL 'bogus' DAY)",
      "select interval 'bogus' day"),
    ("inverted qualifier (HOUR TO YEAR)",
      "select interval '1' hour to year"),
    ("HOUR TO MINUTE with three fields",
      "select interval '20:1:42' hour to minute"),
    ("mixed-family qualifier (MONTH TO DAY)",
      "select timestamp '2001-01-01 00:00:00' + interval '1' month to day"),
    // ---- testCollectionTable:7910 / WithCursorParam:7976 ---------------
    ("unknown table function (nonExistentRamp)",
      "select * from table(nonexistentramp('3'))"),
    ("CURSOR parameter to a table function (no CURSOR grammar — parse reject)",
      "select * from table(dedup(cursor(select * from vp4_emp), 'ename'))"),
    ("table function argument of the wrong type (range('a'))",
      "select * from range('a')"),
    ("generator over a non-collection (explode(1))",
      "select * from explode(1)"),
    // ---- testUnnest:7453 — unnest of a scalar --------------------------
    ("lateral unnest of a scalar column",
      "select * from vp4_emp, lateral explode(deptno)"),
    ("unnest of a scalar column in SELECT",
      "select explode(deptno) from vp4_emp"),
    // ---- testMultiset:1619 / testMultisetSetOperators:1653 -------------
    ("collection equality across incompatible element types",
      "select array(1,2) = array('a','b')"),
    ("collection set-op with a non-collection operand",
      "select array_union(array(1,2), 3)"),
    // ---- DEFAULT in call positions (testInsertTargetTableWithVirtual-
    // Columns:9288 — DEFAULT is INSERT-position-only) ---------------------
    ("DEFAULT inside a scalar call",
      "select coalesce(default, 1)"),
    ("DEFAULT for a column with no default (testInsertFailNullability:9322)",
      "insert into vp4_emp values (default, 1, default)"),
    // ---- grouping-function placement (testGroupingFunc family) ---------
    ("GROUPING() without grouping sets",
      "select grouping(deptno) from vp4_emp"),
    ("GROUPING() over a non-grouped column in HAVING",
      "select deptno from vp4_emp group by deptno having grouping(ename) = 0"),
    ("GROUPING_ID() columns not matching the grouping columns",
      "select grouping_id(deptno, ename) from vp4_emp group by cube(deptno)"))

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

  // ---- MATCH_RECOGNIZE name-scope/shape errors (SqlValidatorMatchTest;
  // raised by MatchRecognizeSql.build's validation, surfaced through the
  // injected parser's delegate fall-through) ----------------------------
  private def mr(defineTail: String,
      pattern: String = "C{2,} E",
      extra: String = "",
      orderBy: String = "ts, event_id"): String =
    s"""SELECT * FROM events MATCH_RECOGNIZE (
       |  PARTITION BY user_id ORDER BY $orderBy
       |  MEASURES FIRST(event_id) AS first_id
       |  $extra
       |  PATTERN ($pattern)
       |  DEFINE $defineTail)""".stripMargin

  private val mrRejects: Seq[(String, String)] = Seq(
    ("testMatchRecognizeDefines2:57 — pattern variable defined twice",
      mr("C AS event_type = 'click', C AS event_type = 'error'")),
    ("DEFINE symbol absent from PATTERN ('Unknown pattern')",
      mr("C AS event_type = 'click', Z AS event_type = 'error'")),
    ("testMatchRecognizeSubset:187 — unknown SUBSET member",
      mr("C AS event_type = 'click'", extra = "SUBSET S = (C, Q)")),
    ("testMatchRecognizeSubset2:200 — SUBSET name collides with pattern variable",
      mr("C AS event_type = 'click'", extra = "SUBSET C = (C, E)")),
    ("testMatchRecognizeSkipTo3:146 — SKIP TO unknown pattern",
      mr("C AS event_type = 'click'", extra = "AFTER MATCH SKIP TO FIRST Q")),
    ("testMatchRecognizeWithin:213 — WITHIN needs a time-ordered key",
      s"""SELECT * FROM events MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY event_id
         |  MEASURES FIRST(event_id) AS first_id
         |  PATTERN (C{2,} E) WITHIN INTERVAL '5' MINUTE
         |  DEFINE C AS event_type = 'click')""".stripMargin))

  for ((name, sql) <- mrRejects)
    test(s"rejects: $name") {
      fixtures
      val ex = intercept[Exception] { spark.sql(sql).queryExecution.analyzed }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected the front end's rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  // ---- pattern-grammar rejections, message-pinned (the reference's
  // parser-level pattern errors; ours raise from parsePattern directly) --
  test("rejects: unclosed quantifier in PATTERN (A{2,)") {
    val ex = intercept[IllegalArgumentException](
      graft.plans.MatchRecognizeSql.parsePattern("A{2,"))
    assert(ex.getMessage.contains("unclosed quantifier"))
  }
  test("rejects: unclosed group in PATTERN ((A B)") {
    val ex = intercept[IllegalArgumentException](
      graft.plans.MatchRecognizeSql.parsePattern("(A B"))
    assert(ex.getMessage.contains("unclosed group"))
  }
  test("rejects: trailing input after PATTERN (A) B)") {
    val ex = intercept[IllegalArgumentException](
      graft.plans.MatchRecognizeSql.parsePattern("A) B"))
    assert(ex.getMessage.contains("trailing pattern input"))
  }

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS --------
  test("divergence pin: OVER inside PARTITION BY / ORDER BY specs analyzes in Spark " +
      "(testOverInPartitionBy:3930, testOverInOrderBy:3941 reject in the reference)") {
    fixtures
    Seq(
      "select sum(deptno) over (partition by sum(deptno) over (order by deptno)) from vp4_emp",
      "select sum(deptno) over (order by sum(deptno) over (order by deptno)) from vp4_emp",
      "select sum(sal) over w from vp4_emp window w as (partition by sum(deptno) over (order by deptno))")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("control: the accepted twins of the rejection families analyze cleanly") {
    fixtures
    Seq(
      "select rank() over (order by deptno) from vp4_emp",
      "select sum(deptno) over (order by deptno rows between 2 preceding and 2 preceding) from vp4_emp",
      "select sum(deptno) over (order by deptno range between 2 preceding and 2 following) from vp4_emp",
      "select interval '1.0' second",
      "select interval '1-2' year to month",
      "select interval '20:1' hour to minute",
      "select * from range(3)",
      "select * from vp4_emp, lateral explode(array(deptno))",
      "select array(1,2) = array(3,4)",
      "select array_union(array(1,2), array(3))",
      "select deptno, grouping(deptno) from vp4_emp group by cube(deptno)")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
    // the MATCH_RECOGNIZE shell itself is accepted when well-formed
    assert(spark.sql(mr("C AS event_type = 'click', E AS event_type = 'error'"))
      .queryExecution.analyzed != null)
  }
}
