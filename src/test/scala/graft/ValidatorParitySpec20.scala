package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validator parity, tranche 23 (r17) — aggregate/window/function
  * validation and metadata-introspection families from SqlValidatorTest
  * found uncited by the census walk (reference: core/src/test/java/org/
  * apache/calcite/test/SqlValidatorTest.java; method names cited per
  * case). Same EMP/DEPT analog as tranche 22.
  */
class ValidatorParitySpec20 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixture: Unit = {
    spark.sql("""CREATE OR REPLACE TEMP VIEW emp AS
      SELECT CAST(id AS INT) AS empno, concat('E', id) AS ename,
             'CLERK' AS job, CAST(id % 5 AS INT) AS mgr,
             timestamp'2020-01-01' AS hiredate,
             CAST(1000 + id AS INT) AS sal, CAST(id AS INT) AS comm,
             CAST(id % 4 AS INT) AS deptno, id % 2 = 0 AS slacker
      FROM range(20)""")
    spark.sql("""CREATE OR REPLACE TEMP VIEW dept AS
      SELECT CAST(id AS INT) AS deptno, concat('D', id) AS name
      FROM range(4)""")
  }

  private def okSql(citation: String, sql: String): Unit =
    test(s"$citation: ok: ${sql.replace('\n', ' ').take(80)}") {
      fixture
      spark.sql(sql).queryExecution.analyzed
      succeed
    }

  private def rejected(citation: String, sql: String): Unit =
    test(s"$citation: rejects: ${sql.replace('\n', ' ').take(80)}") {
      fixture
      val ex = intercept[Exception] { spark.sql(sql).queryExecution.analyzed }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}")
    }

  // ---- aggregate FILTER (testAggregateFilter:7079,
  //      testAggregateFilterNotBoolean:7084, testAggregateFilterInHaving:7089,
  //      testAggregateFilterContainsAggregate:7096) ---------------------------
  test("testAggregateFilter: FILTER aggregate keeps the argument type") {
    fixture
    val f = spark.sql(
      "select sum(empno) filter (where deptno < 10) as s from emp").schema.head
    assert(f.name == "s" && f.dataType.simpleString == "bigint" && f.nullable)
  }
  rejected("testAggregateFilterNotBoolean",
    "select sum(empno) filter (where deptno + 10) from emp")
  okSql("testAggregateFilterInHaving",
    """select sum(empno) as s from emp group by deptno
      |having sum(empno) filter (where deptno < 20) > 10""".stripMargin)
  rejected("testAggregateFilterContainsAggregate",
    "select sum(empno) filter (where count(*) < 10) from emp")

  // ---- aggregates inside OVER (testAggregateFunctionInOver:3952,
  //      testAggregateInsideOverClause2:3976,
  //      testInvalidWindowFunctionWithGroupBy:4279) ----------------------------
  okSql("testAggregateFunctionInOver",
    "select sum(deptno) over (order by count(empno)) from emp group by deptno")
  rejected("testAggregateFunctionInOver",
    "select sum(empno) over (order by count(empno)) from emp group by deptno")
  rejected("testAggregateInsideOverClause2",
    """select empno, sum(empno) over ()
      | + sum(empno) over (partition by min(sal)) empno_sum from emp""".stripMargin)
  rejected("testInvalidWindowFunctionWithGroupBy",
    "select max(empno) over () from emp group by deptno")
  rejected("testInvalidWindowFunctionWithGroupBy",
    "select max(deptno) over (partition by empno) from emp group by deptno")
  rejected("testInvalidWindowFunctionWithGroupBy",
    "select rank() over (order by empno) from emp group by deptno")

  // ---- IGNORE/RESPECT NULLS placement (testWindowFunctionsIgnoreNulls:4162,
  //      testWindowFunctionsRespectNulls:4207) ---------------------------------
  for (fn <- Seq("lead(sal, 4)", "lag(sal, 4)", "first_value(sal)",
    "last_value(sal)")) {
    okSql("testWindowFunctionsIgnoreNulls",
      s"select $fn IGNORE NULLS over (w) from emp window w as (order by empno)")
    okSql("testWindowFunctionsRespectNulls",
      s"select $fn RESPECT NULLS over (w) from emp window w as (order by empno)")
  }
  rejected("testWindowFunctionsIgnoreNulls (SUM cannot take it)",
    "select sum(sal) IGNORE NULLS over (w) from emp window w as (order by empno)")
  rejected("testWindowFunctionsIgnoreNulls (COUNT cannot take it)",
    "select count(sal) IGNORE NULLS over (w) from emp window w as (order by empno)")
  // pinned divergence: Calcite rejects RESPECT NULLS after SUM too;
  // Spark's parser accepts it as the (no-op) default and only polices
  // IGNORE NULLS placement
  okSql("testWindowFunctionsRespectNulls (divergence: no-op default accepted)",
    "select sum(sal) RESPECT NULLS over (w) from emp window w as (order by empno)")

  // ---- WINDOW clause (testOneWinFunc:4650, testWindowClauseWithSubQuery:4543)
  okSql("testOneWinFunc",
    """select sum(sal) over w from emp
      |window w as (partition by sal order by deptno rows 2 preceding)""".stripMargin)
  okSql("testWindowClauseWithSubQuery",
    """select * from
      |( select sum(empno) over w, sum(deptno) over w from emp
      |window w as (order by hiredate range interval '1' minute preceding))""".stripMargin)
  // pinned divergence: Calcite resolves the outer WINDOW clause against
  // the derived table's output and rejects ("Column 'HIREDATE' not
  // found"); Spark resolves the named window inside the subquery's scope
  // and accepts
  okSql("testWindowClauseWithSubQuery (divergence: outer WINDOW resolves inward)",
    """select * from
      |( select sum(empno) over w2, sum(deptno) over w2 from emp)
      |window w2 as (order by hiredate range interval '1' minute preceding)""".stripMargin)

  // ---- navigation functions (testLastFunction:7752) ---------------------------
  okSql("testLastFunction", "select LAST_VALUE(sal) over (order by empno) from emp")
  okSql("testLastFunction", "select FIRST_VALUE(ename) over (order by empno) from emp")
  okSql("testLastFunction", "select NTH_VALUE(sal, 2) over (order by empno) from emp")

  // ---- simple aggregates (testMinMaxFunctions:7763, testAnyValueFunction:7773,
  //      testCountFunction:7731, testCountCompositeFunction:7740,
  //      testFunctionalDistinct:7777, testSumInvalidArgs:5402) ------------------
  okSql("testMinMaxFunctions", "SELECT MIN(true) from emp")
  okSql("testMinMaxFunctions", "SELECT MAX(false) from emp")
  okSql("testMinMaxFunctions", "SELECT MIN(sal+deptno) FROM emp")
  okSql("testMinMaxFunctions", "SELECT MAX(ename) FROM emp")
  okSql("testAnyValueFunction", "SELECT any_value(ename) from emp")
  okSql("testCountFunction", "select count(*) from emp")
  okSql("testCountFunction", "select count(ename) from emp")
  rejected("testCountFunction", "select count() from emp")
  okSql("testCountCompositeFunction", "select count(ename, deptno) from emp")
  okSql("testCountCompositeFunction",
    "select count(distinct ename, 1, deptno) from emp")
  // pinned divergence: Calcite parse-rejects `count(deptno, *)`; Spark
  // expands the trailing star into the full column list
  okSql("testCountCompositeFunction (divergence: trailing star expands)",
    "select count(deptno, *) from emp")
  rejected("testFunctionalDistinct", "select COALESCE(distinct sal) from emp")
  // pinned divergence: Calcite's lenient SUM(<VARCHAR>) derives
  // DECIMAL(19,19); Spark coerces the string argument to DOUBLE
  test("testSumInvalidArgs (divergence: Spark coerces to double)") {
    fixture
    assert(spark.sql("select sum(ename) from emp").schema.head
      .dataType.simpleString == "double")
  }

  // ---- unknown/wrong-typed calls (testInvalidFunctionCall:11124) --------------
  rejected("testInvalidFunctionCall",
    "select unknown_udf_vp20(1, 2)")
  rejected("testInvalidFunctionCall",
    "select power(cast(1 as timestamp), cast(2 as timestamp))")

  // ---- case-insensitive built-in names (testUnquotedBuiltInFunctionNames:8636,
  //      testQuotedFunction:1537 — the quoted-TRIM cell) -------------------------
  okSql("testUnquotedBuiltInFunctionNames",
    "select count(*), sum(deptno), floor(2.5) from dept")
  okSql("testUnquotedBuiltInFunctionNames", "select cOuNt(*), FlOOr(2.5) from dept")
  okSql("testUnquotedBuiltInFunctionNames", "select CuRrEnT_TiMeStAmP from dept")
  okSql("testUnquotedBuiltInFunctionNames (quoted builtin still resolves)",
    "select `count`(*) from dept")
  test("testQuotedFunction: quoted TRIM resolves as the builtin") {
    fixture
    assert(spark.sql("select `trim`('b')").schema.head
      .dataType.simpleString == "string")
  }

  // ---- UNNEST (testUnnestArrayColumn:7609,
  //      unnestMapMustNameColumnsKeyAndValueWhenNotAliased:7678) -----------------
  okSql("testUnnestArrayColumn",
    """select d.deptno, e.* from
      |(select 1 as deptno, array(named_struct('empno', 10, 'ename', 'x')) as employees) d
      |LATERAL VIEW explode(d.employees) t AS e""".stripMargin)
  test("testUnnestArrayColumn: nested struct fields surface through the unnest") {
    fixture
    val df = spark.sql(
      """select d.deptno, e.empno, e.ename from
        |(select 1 as deptno, array(named_struct('empno', 10, 'ename', 'x')) as employees) d
        |LATERAL VIEW explode(d.employees) t AS e""".stripMargin)
    assert(df.schema.map(_.name) == Seq("deptno", "empno", "ename"))
  }
  test("unnestMapMustNameColumnsKeyAndValueWhenNotAliased: explode(map) names key/value") {
    fixture
    val cols = spark.sql("select * from (select explode(map(1, 12, 2, 22)))")
      .schema.map(_.name)
    assert(cols == Seq("key", "value"))
  }

  // ---- period predicates (testOverlaps:7219, testContains:7286 — the
  //      OVERLAPS/CONTAINS value surface is operators/Periods; syntax-level
  //      arity rows are parser-specific, censused under the same methods) ------
  test("testOverlaps + testContains: period predicate family types BOOLEAN") {
    fixture
    import graft.operators.Periods._
    import spark.implicits._
    val df = Seq((1, 3, 2, 4)).toDF("a1", "a2", "b1", "b2").select(
      overlapsP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("o"),
      containsP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("c"),
      precedesP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("p"),
      succeedsP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("s"),
      immediatelyPrecedesP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("ip"),
      immediatelySucceedsP(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("is"),
      periodEquals(period(col("a1"), col("a2")), period(col("b1"), col("b2"))).as("eq"))
    assert(df.schema.forall(_.dataType.simpleString == "boolean"))
    val r = df.head
    assert(r.getBoolean(0) && !r.getBoolean(1))
  }

  // ---- JSON functions (testJsonArrayAgg:10946, testJsonObjectAgg:11046,
  //      testJsonPretty:10961, testJsonValueExpressionOperator:10870) -----------
  test("testJsonArrayAgg: json_arrayagg dialect = to_json(collect_list(...))") {
    fixture
    val r = spark.sql(
      "select to_json(collect_list(deptno)) from (select deptno from dept order by deptno limit 2)")
      .head.getString(0)
    assert(r == "[0,1]", r)
  }
  test("testJsonObjectAgg: json_objectagg dialect = to_json(map_from_entries(collect_list(struct(k,v))))") {
    fixture
    val r = spark.sql(
      """select to_json(map_from_entries(collect_list(struct(name, deptno))))
        |from (select * from dept order by deptno limit 2)""".stripMargin)
      .head.getString(0)
    assert(r == """{"D0":0,"D1":1}""", r)
  }
  test("testJsonPretty: json_pretty (functions/JsonIntrospect) round-trips") {
    fixture
    import graft.functions.JsonIntrospect.json_pretty
    import spark.implicits._
    val r = Seq("""{"foo":"bar"}""").toDF("j")
      .select(json_pretty(col("j"))).head.getString(0)
    assert(r.contains("\"foo\"") && r.contains("\n"), r)
  }
  okSql("testJsonValueExpressionOperator (FORMAT JSON carried by from_json)",
    "select from_json('{}', 'map<string,string>')")

  // ---- field origins (testFieldOrigin:8315 — plans/ColumnOrigins) -------------
  test("testFieldOrigin: star over a join originates from base tables; constants have none") {
    val dir = sfDir
    val n = Tables.t(spark, dir, "nation")
    val r = Tables.t(spark, dir, "region")
    val joined = n.join(r, col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name"), lit(1).as("uno"),
        (col("n_nationkey") * 2).as("twice"))
    val os = graft.plans.ColumnOrigins.origins(joined).toMap
    assert(os("n_name").map(_.column) == Set("n_name"))
    assert(os("r_name").map(_.column) == Set("r_name"))
    assert(os("uno").isEmpty)       // constant → no origin (reference: null)
    assert(os("twice").nonEmpty && os("twice").forall(_.derived))
  }

  // ---- monotonicity (testMonotonic:9746 — the SELECT STREAM validator's
  //      monotonic-expression whitelist gates windowless streaming aggs;
  //      StreamSql's matrix specs assert both directions) ------------------------
  test("testMonotonic: floor-to-hour over rowtime is monotonic (accepted), " +
    "extract(minute) is not (rejected)") {
    val dir = sfDir
    Tables.registerAll(spark, dir)
    // monotonic grouping: accepted by the stream validator
    graft.Engine.sqlStream(spark, dir,
      "SELECT STREAM date_trunc('HOUR', ts) AS h, count(*) AS c FROM events GROUP BY date_trunc('HOUR', ts)")
    // non-monotonic grouping: rejected ("not monotonic" aux rule)
    val ex = intercept[Exception] {
      graft.Engine.sqlStream(spark, dir,
        "SELECT STREAM extract(minute from ts) AS m, count(*) AS c FROM events GROUP BY extract(minute from ts)")
    }
    assert(ex.getMessage.toLowerCase.contains("monoton") ||
      ex.getMessage.toLowerCase.contains("window"), ex.getMessage)
  }
}
