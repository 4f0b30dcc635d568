package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator parity, tranche 22 (r17) — name resolution, join typing,
  * CTE scoping, and GROUP BY families from SqlValidatorTest found
  * uncited by the census walk (reference: core/src/test/java/org/apache/
  * calcite/test/SqlValidatorTest.java; method names cited per case).
  *
  * Runs over an EMP/DEPT analog registered as temp views with the
  * reference fixture's column names (values don't matter — every case
  * here is an analysis-time accept/reject/type check). Conformance rows
  * map to Spark's single behavior: Spark's GROUP BY ordinal = Calcite
  * LENIENT, Spark's FROM-less SELECT = Calcite DEFAULT — asserted at
  * those cells; the opposite-knob cells are documented non-portable in
  * the census.
  */
class ValidatorParitySpec19 extends AnyFunSuite {
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

  // ---- FROM basics (testSingleNoAlias:5420, testDoubleNoAlias:4979,
  //      testOrderJoin:6239) ----------------------------------------------
  okSql("testSingleNoAlias", "select * from emp")
  okSql("testDoubleNoAlias", "select * from emp join dept on true")
  okSql("testDoubleNoAlias", "select * from emp, dept")
  okSql("testDoubleNoAlias", "select * from emp cross join dept")
  okSql("testOrderJoin", "select * from emp as e, dept as d order by e.empno")

  // ---- aliases (testDuplicateColumnAliasIsOK:4985,
  //      testDuplicateTableAliasFails:4990) --------------------------------
  okSql("testDuplicateColumnAliasIsOK", "select 1 as a, 2 as b, 3 as a from emp")
  // pinned divergence: Calcite rejects duplicate relation names in FROM
  // ("Duplicate relation name 'EMP'"); Spark allows the self-product and
  // only rejects on ambiguous REFERENCE
  okSql("testDuplicateTableAliasFails (divergence: Spark allows)",
    "select 1 from emp, emp")
  rejected("testDuplicateTableAliasFails (ambiguous reference still rejects)",
    "select empno from emp, emp")
  okSql("testDuplicateTableAliasFails",
    "select 1 from emp as e join emp on emp.empno = e.deptno")

  // ---- star expansion (testExpandStar:4771) --------------------------------
  rejected("testExpandStar", "select r.* from dept")
  okSql("testExpandStar", "select e.* from emp as e")
  okSql("testExpandStar", "select emp.* from emp")
  rejected("testExpandStar", "select empno.* from emp")

  // ---- unknown columns (testColumnNotFound2:7788, testColumnNotFound3:7793)
  rejected("testColumnNotFound2", "select b0 from emp, dept")
  rejected("testColumnNotFound3", "select e.b0 from emp as e")

  // ---- scoping in VALUES/joins (testNameResolutionInValuesClause:4655) -----
  rejected("testNameResolutionInValuesClause",
    """select * from (select 1 as deptno from (values (1))) a
      | join (select 10 as deptno from (values (1))) b on emps.deptno = deptno""".stripMargin)
  okSql("testNameResolutionInValuesClause",
    """select * from (select 1 as deptno from (values (1))) as e
      | join (select 10 as deptno from (values (1))) as d on e.deptno = d.deptno""".stripMargin)
  rejected("testNameResolutionInValuesClause (ambiguous in WHERE)",
    "select * from emp as e, dept where deptno > 5")
  rejected("testNameResolutionInValuesClause (ambiguous in ON)",
    "select 1 from emp as e join dept as d on e.deptno = deptno")

  // ---- nested FROM (testNestedFrom:4704) ------------------------------------
  okSql("testNestedFrom", "select * from (select * from (values(true)))")
  okSql("testNestedFrom",
    "select * from (select * from (select * from (values(true))))")
  okSql("testNestedFrom",
    """select * from (
      |  select * from (
      |    select * from (values(true))
      |    union
      |    select * from (values (false)))
      |  except
      |  select * from (values(true)))""".stripMargin)

  // ---- ORDER BY resolution (testOrderByColumn:4576) --------------------------
  okSql("testOrderByColumn", "select emp.deptno from emp, dept order by emp.deptno")
  okSql("testOrderByColumn", "select emp.deptno as deptno from emp, dept order by deptno")
  okSql("testOrderByColumn", "select emp.empno as deptno from emp, dept order by deptno")
  rejected("testOrderByColumn",
    "select emp.deptno as n, dept.deptno as n from emp, dept order by n")
  okSql("testOrderByColumn",
    "select emp.empno as deptno, dept.deptno from emp, dept order by 1, 2")

  // ---- ambiguity under case-insensitive resolution (testSelectAmbiguousField
  //      :7856 — Spark's default resolver is case-insensitive, the test's
  //      withCaseSensitive(false) cell) ---------------------------------------
  rejected("testSelectAmbiguousField",
    "select t0 from (select 1 as t0, 2 as T0 from dept)")
  okSql("testSelectAmbiguousField (unreferenced duplicates allowed)",
    "select 1 as t0, 2 as t0 from dept")

  // ---- join typing (testJoinRowType:5710, testLeftOuterJoinWithAlias:4252) ---
  test("testJoinRowType: outer joins null-widen the non-preserved side") {
    fixture
    def nullability(sql: String): Seq[Boolean] =
      spark.sql(sql).schema.map(_.nullable)
    val left = nullability("select emp.empno, dept.name from emp left join dept on emp.deptno = dept.deptno")
    assert(left == Seq(false, true), s"left join: emp stays, dept widens: $left")
    val right = nullability("select emp.empno, dept.name from emp right join dept on emp.deptno = dept.deptno")
    assert(right == Seq(true, false), s"right join: emp widens, dept stays: $right")
    val full = nullability("select emp.empno, dept.name from emp full join dept on emp.deptno = dept.deptno")
    assert(full == Seq(true, true), s"full join widens both: $full")
  }
  test("testLeftOuterJoinWithAlias: row_number output null-widens under left join") {
    fixture
    val df = spark.sql(
      """select * from (select row_number() over (order by sal) as r1 from emp) emp1
        |left outer join (select dense_rank() over (order by sal) as r2 from emp) emp2
        |on emp1.r1 = emp2.r2""".stripMargin)
    assert(df.schema.map(f => (f.name, f.nullable)) ==
      Seq(("r1", false), ("r2", true)))
  }

  // ---- join misc (testJoinSubQuery:5773, testJoinOnExistsCorrelated:5798,
  //      testSubQueryInOnClause:8030, testJoinUsingThreeWay:5819) -------------
  // pinned divergence: Calcite requires an alias on a joined sub-query;
  // Spark auto-generates one
  okSql("testJoinSubQuery (divergence: Spark auto-aliases)",
    "select * from (select 1 as uno from emp) join (values (1), (2)) on true")
  okSql("testJoinOnExistsCorrelated",
    "select * from emp as e join dept on exists (select 1 from emp where deptno < e.deptno)")
  okSql("testSubQueryInOnClause",
    """select * from emp as emps left outer join dept as depts
      |on emps.deptno = depts.deptno and emps.deptno = (
      |select min(deptno) from dept as depts2)""".stripMargin)
  okSql("testJoinUsingThreeWay",
    "select * from emp as e join dept as d using (deptno) join emp as e2 using (empno)")
  test("testJoinUsingThreeWay: USING output puts key columns first") {
    fixture
    val cols = spark.sql("select * from emp as e join dept as d using (deptno)")
      .schema.map(_.name)
    assert(cols.head == "deptno" && cols.count(_ == "deptno") == 1, cols.mkString(","))
  }
  // pinned divergence: Calcite rejects a USING column that is not unique
  // on one side after a previous USING join; Spark's USING coalesces the
  // earlier key so the second USING resolves
  okSql("testJoinUsingThreeWay (non-unique USING divergence: Spark accepts)",
    "select * from emp as e join dept as d using (deptno) join dept as d2 using (deptno)")

  // ---- correlation (testWhereReference:5441, testCorrelatingVariables:7135,
  //      testLateral:7703) -----------------------------------------------------
  okSql("testWhereReference",
    """select * from emp as e1 where exists (
      |  select * from emp as e2,
      |    (select * from dept where dept.deptno = e1.deptno))""".stripMargin)
  okSql("testCorrelatingVariables",
    "select * from emp where exists (select * from dept where deptno = sal)")
  okSql("testCorrelatingVariables",
    "select * from emp where exists (select * from dept where deptno = emp.sal)")
  rejected("testLateral (non-lateral cannot see siblings)",
    "select * from emp, (select * from dept where emp.deptno=dept.deptno)")
  okSql("testLateral",
    "select * from emp, LATERAL (select * from dept where emp.deptno=dept.deptno)")
  okSql("testLateral",
    "select * from emp, LATERAL (select * from dept where emp.deptno=dept.deptno) ldt")

  // ---- UNION resolution (testUnionNameResolution:5451,
  //      testUnionTypeMismatchWithValuesFails:5517 — the with-coercion cells;
  //      coercion-off cells are a Calcite knob, censused non-portable) --------
  rejected("testUnionNameResolution",
    """select * from emp as e1 where exists (
      |  select * from emp as e2,
      |  (select deptno from dept as d
      |   union
      |   select deptno from emp as e3 where deptno = e2.deptno))""".stripMargin)
  rejected("testUnionNameResolution",
    "select * from emp union select * from dept where empno < 10")
  okSql("testUnionTypeMismatchWithValuesFails (coercion cell)",
    "select 1 from (values ('x')) union select 'a' from (values ('y'))")
  okSql("testUnionTypeMismatchWithValuesFails (coercion cell)",
    "select 1, 2, 3 union select deptno, name, deptno from dept")

  // ---- WITH scoping (testWithUnion:5958, testWithSubQuery:5984,
  //      testWithOrder:6246, testWithOrderInParentheses:6257,
  //      testWithOrderAgg:6032) ------------------------------------------------
  okSql("testWithUnion",
    "with emp2 as (select * from emp) select * from emp2 union all select * from emp")
  okSql("testWithSubQuery",
    """with emp2 as (select * from emp)
      |(
      |  with dept2 as (select * from dept)
      |  (
      |    with empDept as (select emp2.empno, dept2.deptno from dept2 join emp2 using (deptno))
      |    select 1 as uno from empDept))""".stripMargin)
  okSql("testWithSubQuery (WITH inside WHERE sees enclosing tables)",
    """select * from emp
      |where exists (
      |  with dept2 as (select * from dept where dept.deptno >= emp.deptno)
      |  select 1 from dept2 where deptno <= emp.deptno)""".stripMargin)
  rejected("testWithSubQuery (WITH inside FROM cannot see enclosing tables)",
    """select * from emp
      |join (
      |  with dept2 as (select * from dept where dept.deptno >= emp.deptno)
      |  select * from dept2) as d on true""".stripMargin)
  okSql("testWithOrder",
    "with e as (select * from emp) select * from e as e1 order by e1.empno")
  okSql("testWithOrder",
    "with e as (select * from emp) select * from e as e1, e as e2 order by e1.empno")
  okSql("testWithOrderInParentheses",
    "with e as (select * from emp) (select e.empno from e order by e.empno)")
  okSql("testWithOrderInParentheses",
    "with e as (select * from emp) (select e.empno from e order by 1)")
  okSql("testWithOrderAgg", "select count(*) from emp order by count(*)")
  okSql("testWithOrderAgg",
    "with q as (select * from emp) select count(*) from q group by deptno order by count(*)")

  // ---- GROUP BY families (testGroupAgg:6876, testHavingBetween:5889,
  //      testGroupingSets:6717, testGroupBySystemFunction:6709,
  //      testInvalidGroupBy2:5091, testCubeExpression:5133,
  //      testGroupExpressionEquivalenceStringLiteral:6850,
  //      testOrdinalInGroupBy:6468, testGroupByCorrelatedColumn:6756) ---------
  okSql("testGroupAgg", "select deptno as d, count(*) as c from emp group by deptno")
  okSql("testHavingBetween",
    "select deptno from emp group by deptno having deptno between 10 and 12")
  okSql("testHavingBetween",
    "select deptno from emp group by deptno having deptno + 5 > 10")
  rejected("testGroupingSets",
    "select count(1), empno from emp group by grouping sets (deptno)")
  okSql("testGroupingSets",
    """select deptno, ename, sum(sal) from emp
      |group by grouping sets ((deptno), (ename, deptno)) order by 2""".stripMargin)
  // pinned divergence: Calcite accepts NESTED grouping sets and flattens
  // them; Spark's grammar rejects grouping sets inside grouping sets
  rejected("testGroupingSets (nested-sets divergence: Spark rejects)",
    """select sum(sal) from emp
      |group by deptno, grouping sets (deptno, grouping sets (deptno, ename), (ename)), ()""".stripMargin)
  okSql("testGroupBySystemFunction",
    "select CURRENT_USER from emp group by CURRENT_USER")
  okSql("testGroupBySystemFunction",
    "select CURRENT_USER from emp group by rollup(CURRENT_USER)")
  rejected("testGroupBySystemFunction",
    "select CURRENT_USER from emp group by rollup(CURRENT_USER, x)")
  okSql("testInvalidGroupBy2 (coercion cell)",
    "select count(*) from emp group by deptno + 'a'")
  okSql("testCubeExpression", "select deptno + 1 from emp group by cube(deptno + 1)")
  rejected("testCubeExpression",
    "select deptno from emp group by cube(deptno + 1)")
  okSql("testCubeExpression",
    "select deptno + 10 from emp group by rollup(deptno + 10 - 10, deptno)")
  okSql("testGroupExpressionEquivalenceStringLiteral",
    """select case empno when 10 then 'foo bar' else null end from emp
      |group by case empno when 10 then 'foo bar' else null end""".stripMargin)
  rejected("testGroupExpressionEquivalenceStringLiteral (different literal)",
    """select case empno when 10 then 'foo bar' else null end from emp
      |group by case empno when 10 then 'other' else null end""".stripMargin)
  // Spark's GROUP BY ordinal = the reference's LENIENT conformance cells
  okSql("testOrdinalInGroupBy (lenient cells)",
    "select empno, deptno from emp group by 1, deptno")
  okSql("testOrdinalInGroupBy (lenient cells)",
    "select e.empno from emp as e group by 1, empno")
  rejected("testOrdinalInGroupBy (ordinal out of range)",
    "select deptno from emp group by deptno, 100")
  // pinned divergence: Calcite treats correlated GROUP BY keys in a
  // subquery as a harmless extension; Spark rejects outer references in
  // the subquery's GROUP BY
  rejected("testGroupByCorrelatedColumn (divergence: Spark rejects)",
    "select count(*) from emp where exists (select count(*) from dept group by emp.empno)")

  // ---- explicit TABLE / FROM-less SELECT / sampling (testExplicitTable:7887,
  //      testSelectWithoutFrom:7844 DEFAULT cell, testSample:8117 —
  //      BERNOULLI/SYSTEM carried by Spark's TABLESAMPLE; SUBSTITUTE is a
  //      Calcite fixture hook, censused non-portable) --------------------------
  okSql("testExplicitTable", "table emp")
  okSql("testExplicitTable", "select * from (table emp)")
  rejected("testExplicitTable", "table nonexistent_vp19")
  okSql("testSelectWithoutFrom", "select 2+2")
  okSql("testSample", "SELECT * FROM emp TABLESAMPLE (50 PERCENT)")
  // Spark's TABLESAMPLE binds to the relation BEFORE the alias — the
  // reference's "AS x TABLESAMPLE" spelling parses the other way around
  okSql("testSample",
    """SELECT * FROM (
      |SELECT deptno FROM emp UNION ALL SELECT deptno FROM dept)
      |TABLESAMPLE (50 PERCENT) WHERE deptno < 100""".stripMargin)
  okSql("testSample",
    """select * from (
      |select * from emp join dept on emp.deptno = dept.deptno
      |) tablesample (10 percent)""".stripMargin)
  rejected("testSample (scope: sampled derived table hides inner columns)",
    """SELECT empno FROM (
      |SELECT deptno FROM emp UNION ALL SELECT deptno FROM dept)
      |TABLESAMPLE (50 PERCENT) ORDER BY 1""".stripMargin)

  // ---- large generated query (testLarge:6052 — checkLarge(700): a
  //      700-branch CASE and a 700-element IN list must analyze) ---------------
  test("testLarge: 700-arm CASE and 700-element IN list analyze") {
    fixture
    val inList = (1 to 700).mkString(", ")
    spark.sql(s"select * from emp where empno in ($inList)").queryExecution.analyzed
    val arms = (1 to 700).map(i => s"when $i then ${i + 1}").mkString(" ")
    spark.sql(s"select case empno $arms else 0 end from emp").queryExecution.analyzed
    succeed
  }
}
