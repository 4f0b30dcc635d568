package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden tests ported from the reference's own quidem suite — the POST
  * schema (reference: core/src/test/java/org/apache/calcite/test/
  * CalciteAssert.java:812-855 — EMP 9 rows / DEPT 4 rows / EMPS 5 rows)
  * and committed expected outputs from
  * core/src/test/resources/sql/agg.iq (line references per test). This is
  * the "matches the reference's results on its own test queries" check,
  * row-for-row.
  *
  * Adaptations (SQL dialect only, semantics pinned by the goldens):
  * Calcite's composite COUNT(a, b) (count rows where NO arg is null) is
  * expressed with an explicit CASE; Calcite's integer-typed STDDEV over
  * INT input truncates — expressed as CAST(stddev AS INT).
  */
object GoldenSpec {
  case class MR(mno: Int, c: Option[Int], empid: Long, cl: String)
  case class M(c: Option[Int], lastSEmpid: Long)
}

class GoldenSpec extends AnyFunSuite {
  import GoldenSpec.{M, MR}
  import SparkTestSession._
  import spark.implicits._

  private lazy val emp: DataFrame = Seq(
    ("Jane", Some(10), "F"), ("Bob", Some(10), "M"), ("Eric", Some(20), "M"),
    ("Susan", Some(30), "F"), ("Alice", Some(30), "F"), ("Adam", Some(50), "M"),
    ("Eve", Some(50), "F"), ("Grace", Some(60), "F"), ("Wilma", None, "F"))
    .toDF("ename", "deptno", "gender")

  private lazy val emps: DataFrame = Seq(
    (100L, "Fred", 10, None: Option[String], None: Option[String]),
    (110L, "Eric", 20, Some("M"), Some("San Francisco")),
    (110L, "John", 40, Some("M"), Some("Vancouver")),
    (120L, "Wilma", 20, Some("F"), None),
    (130L, "Alice", 40, Some("F"), Some("Vancouver")))
    .toDF("empno", "name", "deptno", "gender", "city")

  test("agg.iq:22-63 — COUNT over non-null / nullable / composite args") {
    assert(emp.agg(count(col("ename"))).head().getLong(0) == 9)
    assert(emp.agg(count(col("deptno"))).head().getLong(0) == 8)
    // composite count(deptno, ename, 1, deptno): rows where no arg is null
    val composite = emp.agg(count(
      when(col("deptno").isNotNull && col("ename").isNotNull, 1))).head().getLong(0)
    assert(composite == 8)
  }

  test("agg.iq:66-79 — DISTINCT deptno, COUNT(*) GROUP BY deptno") {
    val got = emp.groupBy(col("deptno")).agg(count(lit(1)).as("c")).distinct()
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toSet
    assert(got == Set(
      (Some(10), 2L), (Some(20), 1L), (Some(30), 2L),
      (Some(50), 2L), (Some(60), 1L), (None, 1L)))
  }

  // The reference's STDDEV over INT input is INTEGER-TYPED and integer-
  // divides at each step of the AggregateReduceFunctionsRule decomposition
  // ((Σx² − Σx·Σx div n) div n, then CAST(sqrt AS INT)) — e.g. the M group's
  // pop variance is 867 div 3 = 289 → exactly 17, where double arithmetic
  // gives 16.99…; these helpers replicate that to match the goldens exactly.
  private def stddevIntPop(x: org.apache.spark.sql.Column) = {
    val n = count(x); val s = sum(x); val s2 = sum(x * x)
    floor(sqrt(floor((s2 - floor(s * s / n)) / n))).cast("int")
  }
  private def stddevIntSamp(x: org.apache.spark.sql.Column) = {
    val n = count(x); val s = sum(x); val s2 = sum(x * x)
    floor(sqrt(floor((s2 - floor(s * s / n)) / (n - 1)))).cast("int")
  }

  test("agg.iq:152-183 — STDDEV_SAMP / STDDEV_POP (integer-typed in the reference)") {
    assert(emp.agg(stddevIntSamp(col("deptno"))).head().getInt(0) == 19)
    assert(emp.agg(stddevIntPop(col("deptno"))).head().getInt(0) == 17)
  }

  test("agg.iq:185-199 — stddev family grouped by gender") {
    val got = emp.groupBy(col("gender")).agg(
      stddevIntPop(col("deptno")).as("p"),
      stddevIntSamp(col("deptno")).as("s"),
      count(col("deptno")).as("c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == Set(("F", 17, 19, 5L), ("M", 17, 20, 3L)))
  }

  test("agg.iq:217-230 — SELECT DISTINCT includes fully and partially null rows") {
    val got = emps.select(col("city"), col("gender")).distinct()
      .collect().map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    assert(got == Set(
      (None, None), (Some("Vancouver"), Some("M")), (None, Some("F")),
      (Some("San Francisco"), Some("M")), (Some("Vancouver"), Some("F"))))
    assert(got.size == 5)
  }

  test("agg.iq:232-251 — composite COUNT and COUNT DISTINCT exclude partially-null rows") {
    val bothNonNull = when(col("city").isNotNull && col("gender").isNotNull,
      struct(col("city"), col("gender")))
    assert(emps.agg(count(bothNonNull)).head().getLong(0) == 3)
    assert(emps.agg(countDistinct(bothNonNull)).head().getLong(0) == 3)
  }

  test("agg.iq:253-284 — DISTINCT and COUNT over expression args with nulls") {
    val m = pmod(col("deptno"), lit(20))
    val got = emps.select(m.as("m"), col("gender")).distinct()
      .collect().map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(got == Set((10, None), (0, Some("M")), (0, Some("F"))))
    val nonNullPair = when(m.isNotNull && col("gender").isNotNull,
      struct(m, col("gender")))
    assert(emps.agg(countDistinct(nonNullPair)).head().getLong(0) == 2)
    assert(emps.agg(count(nonNullPair)).head().getLong(0) == 4)
  }

  test("agg.iq:287-302 — nulls in GROUP BY key") {
    val got = Seq(Some(0), Some(1), Some(2), None).toDF("x")
      .groupBy((col("x") === 1).as("x1")).agg(count(lit(1)).as("c"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toSet
    assert(got == Set((Some(false), 2L), (Some(true), 1L), (None, 1L)))
  }

  test("agg.iq:359-373 — ROLLUP on one column (deptno + 1 projected)") {
    val got = emp.rollup(col("deptno"))
      .agg(count(lit(1)).as("c"))
      .select((col("deptno") + 1).as("d1"), col("c"))
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toList.sorted(
        Ordering.by((t: (Option[Any], Long)) => (t._1.map(_.toString).getOrElse(""), t._2)))
    // 7 rows: 5 groups, the NULL-deptno group, and the grand total
    assert(got.map(t => (t._1.map(_.asInstanceOf[Int]), t._2)).toSet == Set(
      (Some(11), 2L), (Some(21), 1L), (Some(31), 2L), (Some(51), 2L),
      (Some(61), 1L), (None, 1L), (None, 9L)))
    assert(got.size == 7)
  }

  test("winagg.iq:203-248 — RANK / DENSE_RANK with a NULL key (reference: NULLS LAST)") {
    // Calcite's window ORDER BY defaults to NULLS LAST for ASC; Spark's
    // default is nulls-first, so the port pins asc_nulls_last explicitly.
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("deptno").asc_nulls_last)
    val got = emp.select(col("ename"), rank().over(w).as("r"),
      dense_rank().over(w).as("dr"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(got == Map(
      "Jane" -> (1, 1), "Bob" -> (1, 1), "Eric" -> (3, 2),
      "Susan" -> (4, 3), "Alice" -> (4, 3), "Adam" -> (6, 4),
      "Eve" -> (6, 4), "Grace" -> (8, 5), "Wilma" -> (9, 6)))
  }

  test("conditions.iq:21-83 — three-valued logic truth table under NOT/AND/OR") {
    // the reference's 3×3 (1/0/NULL) truth-table goldens, run VERBATIM as
    // dialect-shared SQL
    val cte =
      """with tmp(a, b) as (
        |  values (1, 1), (1, 0), (1, cast(null as int))
        |       , (0, 1), (0, 0), (0, cast(null as int))
        |       , (cast(null as int), 1), (cast(null as int), 0),
        |         (cast(null as int), cast(null as int)))
        |select * from tmp where %s""".stripMargin
    def rows(cond: String): Set[(Option[Int], Option[Int])] =
      spark.sql(cte.format(cond)).collect()
        .map(r => (Option(r.get(0)).map(_.asInstanceOf[Int]),
          Option(r.get(1)).map(_.asInstanceOf[Int]))).toSet
    assert(rows("a = 1 or b = 1") == Set(
      (Some(0), Some(1)), (Some(1), Some(0)), (Some(1), Some(1)),
      (Some(1), None), (None, Some(1))))
    assert(rows("not (a = 1 or b = 1)") == Set((Some(0), Some(0))))
    assert(rows("a = 1 AND b = 1") == Set((Some(1), Some(1))))
    assert(rows("not (a = 1 AND b = 1)") == Set(
      (Some(0), Some(0)), (Some(0), Some(1)), (Some(0), None),
      (Some(1), Some(0)), (None, Some(0))))
  }

  private lazy val dept: DataFrame = Seq(
    (10, "Sales"), (20, "Marketing"), (30, "Engineering"), (40, "Empty"))
    .toDF("dno", "dname")

  test("outer.iq:21-113 — join null semantics: WHERE vs pushed predicates") {
    // inner join drops the NULL-deptno row and unmatched depts: 5 rows
    val inner = emp.join(dept, col("deptno") === col("dno"))
    assert(inner.count() == 5)
    // left join + WHERE on the LEFT side keeps unmatched left rows: 6 F rows
    val leftW = emp.join(dept, col("deptno") === col("dno"), "left")
      .where(col("gender") === "F")
    val gotLeft = leftW.collect()
      .map(r => (r.getString(0), Option(r.get(4)))).toSet
    assert(gotLeft == Set(
      ("Jane", Some("Sales")), ("Susan", Some("Engineering")),
      ("Alice", Some("Engineering")), ("Eve", None), ("Grace", None),
      ("Wilma", None)))
    // right join + WHERE on the LEFT side eliminates null-extended rows: 3
    val rightW = emp.join(dept, col("deptno") === col("dno"), "right")
      .where(col("gender") === "F")
    assert(rightW.count() == 3)
    // pre-filtered right join keeps unmatched depts null-extended: 5 rows
    val rightPre = emp.where(col("gender") === "F")
      .join(dept, col("deptno") === col("dno"), "right")
    val gotRight = rightPre.collect()
      .map(r => (Option(r.get(0)), r.getString(4))).toSet
    assert(gotRight == Set(
      (Some("Jane"), "Sales"), (Some("Susan"), "Engineering"),
      (Some("Alice"), "Engineering"), (None, "Marketing"), (None, "Empty")))
    // full join + WHERE on the left side collapses to the left-join rows: 6
    // (outer.iq:196-207)
    assert(emp.join(dept, col("deptno") === col("dno"), "full")
      .where(col("gender") === "F").count() == 6)
    // pre-filtered full join keeps BOTH unmatched sides: 8 (outer.iq:210-224)
    val fullPre = emp.where(col("gender") === "F")
      .join(dept, col("deptno") === col("dno"), "full")
    assert(fullPre.count() == 8)
    val gotFull = fullPre.collect()
      .map(r => (Option(r.get(0)), Option(r.get(4)))).toSet
    assert(gotFull.contains((None, Some("Marketing"))) &&
      gotFull.contains((None, Some("Empty"))) &&
      gotFull.contains((Some("Wilma"), None)))
    // the same full join as a non-equi (nested-loop) condition — NULL
    // arithmetic never matches, so the result set is identical
    // (outer.iq:226-240)
    assert(emp.where(col("gender") === "F")
      .join(dept, col("deptno") - col("dno") === 0, "full").count() == 8)
  }

  test("sub-query.iq:20-180 — NOT IN null traps (CALCITE-373 / Dayal VLDB-87)") {
    emp.createOrReplaceTempView("g_emp")
    dept.createOrReplaceTempView("g_dept")
    // IN-list containing NULL: NOT IN returns no rows
    assert(spark.sql(
      """with t1(x) as (select * from (values (1),(2),(cast(null as int)))),
        |     t2(x) as (select * from (values (1),(cast(null as int))))
        |select * from t1 where t1.x not in (select t2.x from t2)""".stripMargin)
      .count() == 0)
    // RHS mixes NULL and non-NULL keys: the FILTER form is null-aware
    // (0 rows, matching the golden) — this is the form that decides query
    // results
    assert(spark.sql(
      "select * from g_dept where dno not in (select deptno from g_emp)").count() == 0)
    // KNOWN DEVIATION: the PROJECTED (select-list) IN-subquery is
    // two-valued in Spark (ExistenceJoin rewrite) — dept 40 yields FALSE
    // where the reference golden yields NULL (UNKNOWN). Pinned here so a
    // future Spark change is caught; the filter forms above/below carry
    // the standard semantics.
    val mixed = spark.sql(
      "select dno, dno not in (select deptno from g_emp) as x from g_dept")
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(mixed == Map(10 -> Some(false), 20 -> Some(false),
      30 -> Some(false), 40 -> Some(false))) // reference: 40 -> null
    // RHS all-NULL, filter form: x NOT IN {NULL} is UNKNOWN for every row
    assert(spark.sql(
      """select * from g_dept where dno not in
        |  (select deptno from g_emp where deptno is null)""".stripMargin)
      .count() == 0)
    // NULLs excluded: ordinary anti-join semantics, dept 40 survives
    val nn = spark.sql(
      """select * from g_dept where dno not in
        |  (select deptno from g_emp where deptno is not null)""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(nn == Seq(40))
  }

  test("scalar.iq:4-60 — correlated scalar subqueries incl. the COUNT-over-empty distinction") {
    scott.createOrReplaceTempView("s_emp")
    scottDept.createOrReplaceTempView("s_dept")
    def m(q: String): Map[Int, Option[Any]] = spark.sql(q).collect()
      .map(r => r.getInt(0) -> Option(r.get(1))).toMap
    // correlated MIN: empty group -> NULL
    assert(m("""select d.deptno, (select min(empno) from s_emp e
               |  where e.deptno = d.deptno) as x from s_dept d""".stripMargin) ==
      Map(10 -> Some(7782), 20 -> Some(7369), 30 -> Some(7499), 40 -> None))
    // correlated COUNT(*): empty group -> 0 (the COUNT-bug case decorrelation
    // must get right)
    assert(m("""select d.deptno, (select count(*) from s_emp e
               |  where e.deptno = d.deptno) as x from s_dept d""".stripMargin) ==
      Map(10 -> Some(3L), 20 -> Some(5L), 30 -> Some(6L), 40 -> Some(0L)))
    // ... but COUNT(*) under GROUP BY returns NO row for the empty group -> NULL
    assert(m("""select d.deptno, (select count(*) from s_emp e
               |  where e.deptno = d.deptno group by e.deptno) as x from s_dept d"""
        .stripMargin) ==
      Map(10 -> Some(3L), 20 -> Some(5L), 30 -> Some(6L), 40 -> None))
    // correlated SUM under GROUP BY: empty -> NULL; sums per the golden
    assert(m("""select d.deptno, (select sum(empno) from s_emp e
               |  where e.deptno = d.deptno group by e.deptno) as x from s_dept d"""
        .stripMargin) ==
      Map(10 -> Some(23555L), 20 -> Some(38501L), 30 -> Some(46116L), 40 -> None))
    // uncorrelated empty: COUNT is 0 everywhere
    assert(m("select deptno, (select count(*) from s_emp where 1 = 0) as x from s_dept")
      .values.forall(_.contains(0L)))
  }

  test("join.iq:4-60 — disjunctive (OR) join conditions with a NULL key") {
    val cond = col("deptno") === col("dno") || col("ename") === col("dname")
    assert(emp.join(dept, cond).count() == 5)
    // left join: every emp row survives, non-matching (incl. Wilma's NULL
    // deptno) null-extended
    val left = emp.join(dept, cond, "left")
    assert(left.count() == 9)
    assert(left.where(col("dname").isNull).collect().map(_.getString(0)).toSet ==
      Set("Adam", "Eve", "Grace", "Wilma"))
  }

  test("join.iq:150-290 — USING joins, CUBE over a join, arithmetic join chains") {
    scott.createOrReplaceTempView("s_emp")
    scottDept.createOrReplaceTempView("s_dept")
    // distinct (dept.deptno, emp.deptno) through USING — both qualified
    // references stay addressable (join.iq golden: exactly the 3 matched)
    val pairs = spark.sql(
      """select distinct d.deptno as dd, e.deptno as ed
        |from s_emp e join s_dept d using (deptno)""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(pairs == Set((10, 10), (20, 20), (30, 30)))
    // CUBE over the join's two (equal) key columns — the 10-row golden:
    // 3 matched pairs, each side's subtotals, and the grand total
    val cube = spark.sql(
      """select e.deptno as e, d.deptno as d
        |from s_emp e join s_dept d using (deptno)
        |group by cube(e.deptno, d.deptno)""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(cube == Set(
      (Some(10), Some(10)), (Some(20), Some(20)), (Some(30), Some(30)),
      (Some(10), None), (Some(20), None), (Some(30), None),
      (None, Some(10)), (None, Some(20)), (None, Some(30)), (None, None)))
    // three-way self join with an ARITHMETIC condition
    // (emp1.deptno + emp2.deptno = emp3.deptno + 10) — join.iq's 9-row golden
    val tri = spark.sql(
      """select distinct emp1.deptno, emp3.ename
        |from s_emp emp1 join s_emp emp2 on emp1.deptno = emp2.deptno
        |join s_emp emp3 on emp1.deptno + emp2.deptno = emp3.deptno + 10"""
        .stripMargin).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(tri == Set(
      (10, "CLARK"), (10, "KING"), (10, "MILLER"),
      (20, "ALLEN"), (20, "BLAKE"), (20, "JAMES"),
      (20, "MARTIN"), (20, "TURNER"), (20, "WARD")))
    // theta product: e.deptno + 10 = d.deptno * 2 — (10,10)×3 and (30,20)×6
    val theta = spark.sql(
      """select e.deptno as ed, d.deptno as dd
        |from s_dept d, s_emp e where e.deptno + 10 = d.deptno * 2"""
        .stripMargin).collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(theta.groupBy(identity).view.mapValues(_.size).toMap ==
      Map((10, 10) -> 3, (30, 20) -> 6))
    // VALUES join USING (join.iq's inline-relation golden)
    val v = spark.sql(
      """select * from (values (100, 'Bill', 1), (200, 'Eric', 1),
        |  (150, 'Sebastian', 3)) as e(empid, name, deptno)
        |join (values (1, 'LeaderShip'), (2, 'TestGroup'),
        |  (3, 'Development')) as d(deptno, name) using (deptno)"""
        .stripMargin).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(v == Set((1, 100, "Bill", "LeaderShip"),
      (1, 200, "Eric", "LeaderShip"), (3, 150, "Sebastian", "Development")))
    // left join USING wrapped in subqueries, ordered + limited
    val first = spark.sql(
      """select empno from (select * from s_emp) e left join
        |  (select * from s_dept) d using (deptno)
        |order by empno limit 5""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(first == Seq(7369, 7499, 7521, 7566, 7654))
  }

  test("scalar.iq:150-216 — LIMIT inside scalar subqueries") {
    scott.createOrReplaceTempView("s_emp")
    scottDept.createOrReplaceTempView("s_dept")
    // uncorrelated ordered LIMIT 1: the same scalar for every outer row
    val one = spark.sql(
      """select deptno, (select empno from s_emp order by empno limit 1) as x
        |from s_dept""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(one == Map(10 -> 7369, 20 -> 7369, 30 -> 7369, 40 -> 7369))
    // LIMIT 0: an empty scalar subquery is NULL for every row
    val zero = spark.sql(
      """select deptno, (select empno from s_emp limit 0) as x from s_dept"""
        .stripMargin).collect().map(r => Option(r.get(1)))
    assert(zero.length == 4 && zero.forall(_.isEmpty))
  }

  test("blank.iq — DDL-created tables, correlated IN, NOT-IN with NULL keys") {
    def sql(q: String) = spark.sql(q)
    for (t <- Seq("blank_foo", "blank_t1", "blank_t2"))
      sql(s"DROP TABLE IF EXISTS $t")
    try {
      sql("CREATE TABLE blank_foo (i INT NOT NULL, j INT) USING parquet")
      sql("INSERT INTO blank_foo VALUES (1, 0)")
      sql("INSERT INTO blank_foo VALUES (0, 2)")
      assert(sql("SELECT * FROM blank_foo").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 0), (0, 2)))
      // correlated IN with an INEQUALITY correlation (blank.iq:27-35)
      assert(sql(
        """SELECT * FROM blank_foo f WHERE i IN (
          |  SELECT j FROM blank_foo WHERE i > f.i)""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((0, 2)))
      sql("CREATE TABLE blank_t1 (i INT, j INT) USING parquet")
      sql("CREATE TABLE blank_t2 (i INT, j INT) USING parquet")
      sql("INSERT INTO blank_t1 VALUES (1, 2), (1, 3)")
      sql("INSERT INTO blank_t2 VALUES (NULL, 1), (2, 1)")
      // correlated NOT IN whose inner NULL key blocks every proof
      assert(sql(
        """SELECT i, j FROM blank_t1 WHERE blank_t1.j NOT IN (
          |  SELECT i FROM blank_t2 WHERE blank_t1.i = blank_t2.j)"""
          .stripMargin).count() == 0)
      // uncorrelated NOT IN with a NULL key: UNKNOWN everywhere -> 0 rows
      assert(sql(
        "SELECT * FROM blank_t1 WHERE j NOT IN (SELECT i FROM blank_t2)")
        .count() == 0)
      // ... but an OR branch can still rescue rows (blank.iq:116-126)
      assert(sql(
        """SELECT * FROM blank_t1
          |WHERE j NOT IN (SELECT i FROM blank_t2) OR i = 1""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
        Set((1, 2), (1, 3)))
    } finally
      for (t <- Seq("blank_foo", "blank_t1", "blank_t2"))
        sql(s"DROP TABLE IF EXISTS $t")
  }

  test("struct.iq:17-28 — DISTINCT over ROW-typed values") {
    val got = spark.sql(
      """select distinct * from (values
        |  (1, struct(1, 1)), (1, struct(1, 1)), (2, struct(2, 2))) as v(id, s)"""
        .stripMargin).collect().map(r => (r.getInt(0), r.getStruct(1).toString)).toSet
    assert(got.size == 2)
  }

  test("sort.iq:38-50 — NULL sorts as LARGEST in the reference's ORDER BY") {
    // reference golden: `order by 2 DESC` lists the NULL-valued row FIRST
    // (sort.iq store query) — Calcite treats NULL as the largest value
    // (NULLS LAST under ASC, NULLS FIRST under DESC). Spark's defaults are
    // the opposite, so ports of reference ORDER BY use the explicit
    // null-ordering variants.
    val asc = emp.orderBy(col("deptno").asc_nulls_last)
      .select("ename").collect().map(_.getString(0))
    assert(asc.last == "Wilma")
    val desc = emp.orderBy(col("deptno").desc_nulls_first)
      .select("ename").collect().map(_.getString(0))
    assert(desc.head == "Wilma")
  }

  // scott EMP (reference: some.iq / agg.iq `!use scott`) — the columns the
  // quantified-comparison and GROUPING-family goldens touch
  private def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
  private lazy val scott: DataFrame = Seq(
    (7369, "SMITH", "CLERK", 800.0, None: Option[Double], 20, Some(7902), d("1980-12-17")),
    (7499, "ALLEN", "SALESMAN", 1600.0, Some(300.0), 30, Some(7698), d("1981-02-20")),
    (7521, "WARD", "SALESMAN", 1250.0, Some(500.0), 30, Some(7698), d("1981-02-22")),
    (7566, "JONES", "MANAGER", 2975.0, None, 20, Some(7839), d("1981-02-04")),
    (7654, "MARTIN", "SALESMAN", 1250.0, Some(1400.0), 30, Some(7698), d("1981-09-28")),
    (7698, "BLAKE", "MANAGER", 2850.0, None, 30, Some(7839), d("1981-01-05")),
    (7782, "CLARK", "MANAGER", 2450.0, None, 10, Some(7839), d("1981-06-09")),
    (7788, "SCOTT", "ANALYST", 3000.0, None, 20, Some(7566), d("1987-04-19")),
    (7839, "KING", "PRESIDENT", 5000.0, None, 10, None: Option[Int], d("1981-11-17")),
    (7844, "TURNER", "SALESMAN", 1500.0, Some(0.0), 30, Some(7698), d("1981-09-08")),
    (7876, "ADAMS", "CLERK", 1100.0, None, 20, Some(7788), d("1987-05-23")),
    (7900, "JAMES", "CLERK", 950.0, None, 30, Some(7698), d("1981-12-03")),
    (7902, "FORD", "ANALYST", 3000.0, None, 20, Some(7566), d("1981-12-03")),
    (7934, "MILLER", "CLERK", 1300.0, None, 10, Some(7782), d("1982-01-23")))
    .toDF("empno", "ename", "job", "sal", "comm", "deptno", "mgr", "hiredate")

  private lazy val scottDept: DataFrame = Seq(
    (10, "ACCOUNTING"), (20, "RESEARCH"), (30, "SALES"), (40, "OPERATIONS"))
    .toDF("deptno", "dname")

  test("some.iq:101-135,183,583 — `> ALL` null semantics (SubQueryRemoveRule)") {
    scott.createOrReplaceTempView("scott_emp")
    // x > ALL(S): FALSE when some s >= x; TRUE when S empty or all-non-null
    // max < x; UNKNOWN when nulls block the proof — the reference's
    // SubQueryRemoveRule expansion, as dialect-shared SQL
    val allExpr =
      """CASE WHEN (SELECT COUNT(*) FROM scott_emp) = 0 THEN TRUE
        |     WHEN sal <= (SELECT MAX(comm) FROM scott_emp) THEN FALSE
        |     WHEN (SELECT COUNT(comm) FROM scott_emp)
        |        < (SELECT COUNT(*) FROM scott_emp) THEN NULL
        |     ELSE TRUE END""".stripMargin
    // WHERE sal > ALL (select comm ...): null comm blocks every proof -> 0 rows
    assert(spark.sql(s"SELECT * FROM scott_emp WHERE $allExpr").count() == 0)
    // scalar form: FALSE iff some comm >= sal (i.e. sal <= 1400), else UNKNOWN
    val xs = spark.sql(s"SELECT ename, $allExpr AS x FROM scott_emp")
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(xs("SMITH") == Some(false) && xs("WARD") == Some(false) &&
      xs("MARTIN") == Some(false) && xs("MILLER") == Some(false))
    assert(xs("ALLEN").isEmpty && xs("KING").isEmpty && xs("FORD").isEmpty)
    // empty subquery: trivially TRUE for every row, null comm included
    val emptyAll = spark.sql(
      """SELECT * FROM scott_emp WHERE
        |  CASE WHEN (SELECT COUNT(*) FROM scott_emp WHERE 1 = 0) = 0 THEN TRUE
        |       WHEN comm >= (SELECT MIN(comm) FROM scott_emp WHERE 1 = 0) THEN FALSE
        |       ELSE NULL END""".stripMargin)
    assert(emptyAll.count() == 14)
    // nulls excluded in the subquery: plain MAX rewrite, 8 rows
    assert(spark.sql(
      """SELECT * FROM scott_emp
        |WHERE sal > (SELECT MAX(comm) FROM scott_emp WHERE comm IS NOT NULL)"""
        .stripMargin).count() == 8)
  }

  test("agg.iq:404-418 — ROLLUP on a column with nulls") {
    val got = emp.rollup(col("gender")).agg(count(lit(1)).as("c"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1))).toSet
    assert(got == Set((Some("F"), 6L), (Some("M"), 3L), (None, 9L)))
  }

  test("lateral.iq:41-137 — LATERAL subqueries over the scott schema") {
    scott.createOrReplaceTempView("scott_emp")
    scottDept.createOrReplaceTempView("scott_dept")
    // lateral.iq:41-52 — LATERAL (subquery) as the first FROM item
    assert(spark.sql(
      "SELECT * FROM LATERAL (SELECT * FROM scott_emp) WHERE deptno = 10")
      .count() == 3)
    // lateral.iq:85-97 — LATERAL joined to a parenthesized TABLE
    val joined = spark.sql(
      """SELECT * FROM LATERAL (SELECT * FROM scott_emp) AS e
        |JOIN (TABLE scott_dept) USING (deptno) WHERE e.deptno = 10""".stripMargin)
    assert(joined.count() == 3)
    assert(joined.select("dname").distinct().head().getString(0) == "ACCOUNTING")
    // lateral.iq:99-122 — CORRELATED lateral: dept, LATERAL (emp where
    // emp.deptno = dept.deptno); golden = 14 rows (no dept-40 row)
    val corr = spark.sql(
      """SELECT d.deptno, d.dname, e.empno, e.ename
        |FROM scott_dept d,
        |  LATERAL (SELECT * FROM scott_emp WHERE scott_emp.deptno = d.deptno) AS e"""
        .stripMargin)
    assert(corr.count() == 14)
    val byDept = corr.groupBy("deptno").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDept == Map(10 -> 3L, 20 -> 5L, 30 -> 6L))
    // lateral.iq:124-134 — [CALCITE-2391] aggregate over LATERAL
    assert(spark.sql(
      """SELECT count(*) AS c FROM scott_dept d,
        |  LATERAL (SELECT * FROM scott_emp WHERE scott_emp.deptno = d.deptno) AS e"""
        .stripMargin).head().getLong(0) == 14)
  }

  // POST DEPT (reference: CalciteAssert.java:830-836)
  private lazy val postDept: DataFrame = Seq(
    (10, "Sales"), (20, "Marketing"), (30, "Engineering"), (40, "Empty"))
    .toDF("deptno", "dname")

  test("sub-query.iq:207-253 — IN/EXISTS mixes and composite keys (POST schema)") {
    emp.createOrReplaceTempView("post_emp")
    postDept.createOrReplaceTempView("post_dept")
    // :207-219 — multiple IN connected by OR
    assert(spark.sql(
      """SELECT * FROM post_dept
        |WHERE deptno IN (SELECT deptno FROM post_emp WHERE gender = 'F')
        |   OR deptno IN (SELECT deptno FROM post_emp WHERE gender = 'M')"""
        .stripMargin).collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20, 30))
    // :222-234 — IN OR EXISTS (empty exists side contributes nothing);
    // only depts present in DEPT survive → 10, 30
    assert(spark.sql(
      """SELECT * FROM post_dept
        |WHERE deptno IN (SELECT deptno FROM post_emp WHERE gender = 'F')
        |   OR EXISTS (SELECT 99 FROM post_emp WHERE gender = 'X')"""
        .stripMargin).collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 30))
    // :241-250 — composite IN key with a literal component
    val comp = spark.sql(
      """SELECT * FROM post_emp
        |WHERE (gender, deptno) IN (SELECT gender, 10 FROM post_emp WHERE gender = 'F')"""
        .stripMargin).collect()
    assert(comp.length == 1 && comp(0).getString(0) == "Jane")
  }

  test("sub-query.iq:255-341 — IN-lists over columns, HAVING subqueries (scott)") {
    scott.createOrReplaceTempView("scott_emp")
    // :255-264 — [CALCITE-1155] value IN (column list); our scott mirror
    // carries no mgr column, so the shape is pinned on (empno, deptno):
    // only CLARK's own empno matches
    assert(spark.sql(
      "SELECT empno FROM scott_emp WHERE 7782 IN (empno, deptno)")
      .collect().map(_.getInt(0)).toSeq == Seq(7782))
    // :267-279 — [CALCITE-694] IN-list inside CASE inside HAVING
    assert(spark.sql(
      """SELECT count(*) AS c FROM scott_emp GROUP BY deptno
        |HAVING sum(CASE WHEN empno IN (7369, 7839, 7902) THEN sal ELSE 0 END)
        |       BETWEEN 5000.0 AND 10000.0""".stripMargin)
      .collect().map(_.getLong(0)).toSeq == Seq(3))
    // :283-296 — [CALCITE-716] scalar subquery in HAVING
    assert(spark.sql(
      """SELECT deptno FROM scott_emp GROUP BY deptno
        |HAVING max(empno) > (SELECT min(empno) FROM scott_emp)""".stripMargin)
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(10, 20, 30))
    // :300-313 — [CALCITE-716] scalar subquery + aggregate in SELECT
    val bbbb = spark.sql(
      """SELECT deptno,
        |  max(empno) > (SELECT min(empno) FROM scott_emp) AS bbbb
        |FROM scott_emp GROUP BY deptno""".stripMargin).collect()
    assert(bbbb.length == 3 && bbbb.forall(_.getBoolean(1)))
    // :316-327 — [DRILL-4407] GROUP BY a (null) scalar subquery: one group
    assert(spark.sql(
      """SELECT count(*) AS c FROM scott_emp
        |GROUP BY (SELECT deptno FROM scott_emp WHERE empno = 10)""".stripMargin)
      .collect().map(_.getLong(0)).toSeq == Seq(14))
  }

  test("spatial.iq — geo function goldens (point/predicate subset)") {
    import graft.operators.Geo._
    val one = spark.range(1).toDF()
    def b(c: org.apache.spark.sql.Column): Boolean = one.select(c).head().getBoolean(0)
    def d(c: org.apache.spark.sql.Column): Double = one.select(c).head().getDouble(0)
    // spatial.iq:392-397 — ST_Distance(POINT(10 10), POINT(40 50)) = 50.0
    assert(d(stDistance(stPoint(lit(10.0), lit(10.0)),
      stPoint(lit(40.0), lit(50.0)))) == 50.0)
    // spatial.iq:632-641 — point contains point: coincident only
    assert(!b(stContains(stPoint(lit(0.0), lit(0.0)), stPoint(lit(1.0), lit(2.0)))))
    assert(b(stContains(stPoint(lit(0.0), lit(0.0)), stPoint(lit(0.0), lit(0.0)))))
    // spatial.iq:723-729 — ST_Equals over different linestrings = false
    val l1 = stMakeLine(stPoint(lit(1.0), lit(3.0)), stPoint(lit(5.0), lit(3.0)))
    val l2 = stMakeLine(stPoint(lit(1.0), lit(1.0)), stPoint(lit(5.0), lit(2.0)),
      stPoint(lit(2.0), lit(5.0)))
    assert(!b(stEquals(l1, l2)))
    // spatial.iq:715-720, 733-738 — envelopes of those lines intersect,
    // so ST_EnvelopesIntersect and (envelope-dispatched) ST_Intersects hold
    assert(b(stEnvelopesIntersect(l1, l2)))
    assert(b(stIntersects(l1, l2)))
    // spatial.iq:661-666 — ST_Crosses of the same linestrings = true
    // (the second line crosses y=3 transversally at x=4)
    assert(b(stCrosses(l1, l2)))
    // spatial.iq:755-760 — ST_Touches = false (they cross, not touch)
    assert(!b(stTouches(l1, l2)))
    // and a touch case: a line ending ON l1's interior touches it
    val l3 = stMakeLine(stPoint(lit(3.0), lit(1.0)), stPoint(lit(3.0), lit(3.0)))
    assert(b(stTouches(l1, l3)) && !b(stCrosses(l1, l3)))
    // spatial.iq:36-39, 197-200 — WKT POINT round-trip (both spacings)
    assert(d(stX(stPointFromText(lit("POINT(-71.064544 42.28787)")))) == -71.064544)
    assert(d(stY(stPointFromText(lit("POINT (-71.064544 42.28787)")))) == 42.28787)
    val wkt = one.select(stAsText(stPointFromText(
      lit("POINT(-71.064544 42.28787)")))).head().getString(0)
    assert(wkt == "POINT (-71.064544 42.28787)", wkt)
  }

  // ---- match.iq — MATCH_RECOGNIZE over the HR schema --------------------
  // Data: JdbcTest.HrSchema emps (empid, deptno, name, salary, commission).
  // The goldens (match.iq:104-160) encode the reference's ACTUAL behavior:
  // its EnumerableMatch matches over INPUT order (the clause's ORDER BY
  // "empid" DESC is not applied), emits every matched row (per-row
  // measures + CLASSIFIER), and resolves LAST(S.col) with final semantics.
  // We pin the same row sequence with an explicit position key.
  private lazy val hrEmps: DataFrame = Seq(
    (0L, 100L, 10, "Bill", 10000.0, Some(1000)),
    (1L, 200L, 20, "Eric", 8000.0, Some(500)),
    (2L, 150L, 10, "Sebastian", 7000.0, None),
    (3L, 110L, 10, "Theodore", 11500.0, Some(250)))
    .toDF("pos", "empid", "deptno", "name", "salary", "commission")

  test("misc.iq:277-318 — mixed equi and non-equi join (CALCITE-377)") {
    // HR depts (JdbcTest.HrSchema): 10 Sales, 30 Marketing, 40 HR
    val hrDepts = Seq((10, "Sales"), (30, "Marketing"), (40, "HR"))
      .toDF("deptno", "dname")
    val got = hrEmps.join(hrDepts,
      hrEmps("deptno") === hrDepts("deptno") && col("name") =!= col("dname"))
      .select(col("empid"), col("dname"), col("name"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (100L, "Sales", "Bill"), (110L, "Sales", "Theodore"),
      (150L, "Sales", "Sebastian")))
  }

  test("misc.iq:824-940 — DISTINCT and GROUP BY combinations (DERBY-3616)") {
    // select distinct gender from emp group by gender, deptno → 2 rows
    assert(emp.groupBy(col("gender"), col("deptno")).agg(lit(1))
      .select("gender").distinct().count() == 2)
    // distinct (gender, deptno) grouped by (gender, deptno[, ename]) → 8
    assert(emp.groupBy(col("gender"), col("deptno"), col("ename")).agg(lit(1))
      .select("gender", "deptno").distinct().count() == 8)
    assert(emp.groupBy(col("gender"), col("deptno")).agg(lit(1))
      .select("gender", "deptno").distinct().count() == 8)
    // distinct gender, sum(deptno) group by gender, deptno → 7 rows
    // (the F/60 sum appears from BOTH dept 30×2 and dept 60 and collapses)
    val s1 = emp.groupBy(col("gender"), col("deptno"))
      .agg(sum(col("deptno")).as("s")).select("gender", "s").distinct()
    assert(s1.count() == 7)
    // without DISTINCT the duplicate F/60 stays → 8 rows
    val s2 = emp.groupBy(col("gender"), col("deptno"))
      .agg(sum(col("deptno")).as("s")).select("gender", "s")
    assert(s2.count() == 8)
    val f = s2.where(col("gender") === "F" && col("s") === 60)
    assert(f.count() == 2)
  }

  test("match.iq:104-128 — (s up) with PREV, per-row measures + CLASSIFIER") {
    import graft.operators.MatchRecognize
    import MatchRecognize.Pat._
    implicit val enc: org.apache.spark.sql.Encoder[MR] =
      org.apache.spark.sql.Encoders.product[MR]
    val out = MatchRecognize.matchRecognizeAllRows[MR](
      hrEmps,
      partitionKey = _ => 0L,
      orderKey = r => (r.getAs[Long]("pos"), 0L),
      pattern = Cat(Seq(Sym("S"), Sym("UP"))),
      defines = Map(
        // UP AS up.commission < PREV(up.commission); null → unknown → false
        "UP" -> ((r, prev) => prev.exists { p =>
          !r.isNullAt(r.fieldIndex("commission")) &&
            !p.isNullAt(p.fieldIndex("commission")) &&
            r.getAs[Int]("commission") < p.getAs[Int]("commission")
        })),
      emit = (_, mno, _, row, cl) => MR(mno,
        if (row.isNullAt(row.fieldIndex("commission"))) None
        else Some(row.getAs[Int]("commission")),
        row.getAs[Long]("empid"), cl)
    ).collect().toSeq.sortBy(r => (r.mno, r.empid))
    // golden: exactly one match — rows (1000, 100, S), (500, 200, UP)
    assert(out == Seq(
      MR(1, Some(1000), 100L, "S"),
      MR(1, Some(500), 200L, "UP")), out.toString)
  }

  test("match.iq:146-160 — LAST(S.empid) has final semantics over the match") {
    import graft.operators.MatchRecognize
    import MatchRecognize.Pat._
    implicit val enc: org.apache.spark.sql.Encoder[M] =
      org.apache.spark.sql.Encoders.product[M]
    val out = MatchRecognize.matchRecognize[M](
      hrEmps,
      partitionKey = _ => 0L,
      orderKey = r => (r.getAs[Long]("pos"), 0L),
      pattern = Cat(Seq(Sym("S"), Sym("UP"))),
      defines = Map(
        "UP" -> ((r, prev) => prev.exists { p =>
          !r.isNullAt(r.fieldIndex("commission")) &&
            !p.isNullAt(p.fieldIndex("commission")) &&
            r.getAs[Int]("commission") < p.getAs[Int]("commission")
        })),
      measure = (_, m) => M(
        // running measure "commission" at match end = last row's value
        Option(m.last._1.getAs[Int]("commission")),
        // LAST(S."empid"): last row classified S
        m.filter(_._2 == "S").last._1.getAs[Long]("empid"))
    ).collect().toSeq
    // golden: C=500 (final row), LAST(S.empid)=100 — one match
    assert(out == Seq(M(Some(500), 100L)), out.toString)
  }

  test("winagg.iq:21-43 — multiple window functions sharing windows") {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(col("gender")).orderBy(col("ename"))
    val wd = Window.partitionBy(col("deptno")).orderBy(col("ename"))
    val got = emp.select(
      count(lit(1)).over(wg).as("count1"), count(lit(1)).over(wd).as("count2"),
      sum(col("deptno")).over(wg).as("sum1"), sum(col("deptno")).over(wd).as("sum2"))
      .orderBy(asc_nulls_last("sum1"), asc_nulls_last("sum2"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toLong), Option(r.get(3)).map(_.toString.toLong))).toSeq
    assert(got == Seq(
      (1L, 1L, Some(30L), Some(30L)), (1L, 1L, Some(50L), Some(50L)),
      (2L, 1L, Some(60L), Some(10L)), (3L, 1L, Some(80L), Some(20L)),
      (2L, 2L, Some(80L), Some(100L)), (3L, 1L, Some(140L), Some(60L)),
      (4L, 2L, Some(150L), Some(20L)), (5L, 2L, Some(180L), Some(60L)),
      (6L, 1L, Some(180L), None)), got.toString)
  }

  test("winagg.iq:45-89 — multi-column and degenerate PARTITION BY") {
    import org.apache.spark.sql.expressions.Window
    val got = emp.select(col("gender"), col("deptno"),
      count(lit(1)).over(Window.partitionBy(col("gender"), col("deptno"))).as("count1"))
      .collect().map(r => (r.getString(0), Option(r.get(1)), r.getLong(2)))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == Map(
      (("F", Some(10), 1L), 1), (("F", Some(30), 2L), 2), (("F", Some(50), 1L), 1),
      (("F", Some(60), 1L), 1), (("F", None, 1L), 1),
      (("M", Some(10), 1L), 1), (("M", Some(20), 1L), 1), (("M", Some(50), 1L), 1)))
    // partition by gender,gender (degenerate duplicate column)
    val dup = emp.select(col("gender"),
      count(lit(1)).over(Window.partitionBy(col("gender"), col("gender"))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dup == Set(("F", 6L), ("M", 3L)))
  }

  test("winagg.iq:299-358 — no-ORDER-BY windows, WINDOW clause, composite COUNT") {
    import org.apache.spark.sql.expressions.Window
    val byDept = emp.select(col("ename"),
      count(lit(1)).over(Window.partitionBy(col("deptno"))).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byDept == Map("Adam" -> 2L, "Alice" -> 2L, "Bob" -> 2L, "Eric" -> 1L,
      "Eve" -> 2L, "Grace" -> 1L, "Jane" -> 2L, "Susan" -> 2L, "Wilma" -> 1L))
    // WINDOW clause: w1 global, w2 by deptno (min(gender) over each)
    val w1 = Window.partitionBy(); val w2 = Window.partitionBy(col("deptno"))
    val wcl = emp.select(col("ename"), min(col("gender")).over(w1).as("a"),
      min(col("gender")).over(w2).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // only dept 20 (Eric alone) has min gender M
    assert(wcl.forall(_._2 == "F"))
    assert(wcl.filter(_._3 == "M").map(_._1) == Set("Eric"))
    // composite COUNT(gender, deptno) over (): 8 rows with neither null
    val comp = emp.select(count(
      when(col("gender").isNotNull && col("deptno").isNotNull, 1)).over(w1).as("a"))
      .collect().map(_.getLong(0))
    assert(comp.length == 9 && comp.forall(_ == 8L))
  }

  test("winagg.iq:360-406 — window functions over GROUP BY aggregates") {
    import org.apache.spark.sql.expressions.Window
    val got = emp.groupBy(col("deptno"), col("ename")).agg(min(col("deptno")).as("x"))
      .select(col("x"),
        rank().over(Window.orderBy(asc_nulls_last("ename"))).as("y"),
        max(col("ename")).over(Window.partitionBy(col("deptno"))).as("z"))
      .collect().map(r => (Option(r.get(0)).map(_.toString.toInt), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      (None, 9, "Wilma"), (Some(50), 1, "Eve"), (Some(50), 5, "Eve"),
      (Some(20), 4, "Eric"), (Some(10), 3, "Jane"), (Some(10), 7, "Jane"),
      (Some(60), 6, "Grace"), (Some(30), 2, "Susan"), (Some(30), 8, "Susan")))
    // rank/sum over aggregates in partition/order clauses
    val wg = Window.partitionBy(col("gender")).orderBy(asc_nulls_last("x"))
    val agg = emp.groupBy(col("deptno"), col("gender"))
      .agg(min(col("ename")).as("x"), sum(col("deptno")).as("y"))
      .select(col("gender"), col("x"), col("y"),
        rank().over(wg).as("r"), sum(col("y")).over(wg).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1),
        Option(r.get(2)).map(_.toString.toLong), r.getInt(3),
        Option(r.get(4)).map(_.toString.toLong))).toSet
    assert(agg == Set(
      ("F", "Alice", Some(60L), 1, Some(60L)), ("F", "Eve", Some(50L), 2, Some(110L)),
      ("F", "Grace", Some(60L), 3, Some(170L)), ("F", "Jane", Some(10L), 4, Some(180L)),
      ("F", "Wilma", None, 5, Some(180L)),
      ("M", "Adam", Some(50L), 1, Some(50L)), ("M", "Bob", Some(10L), 2, Some(60L)),
      ("M", "Eric", Some(20L), 3, Some(80L))), agg.toString)
  }

  test("winagg.iq:407-500 — windows under filter and JOIN (CALCITE-311/2081/2271)") {
    import org.apache.spark.sql.expressions.Window
    // CALCITE-311: filtering the results of windowed aggregation
    val c311 = hrEmps.select(col("empid"), count(lit(1)).over(Window.partitionBy()).as("c"))
      .where(col("empid") === 100).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(c311 == Seq((100L, 4L)))
    // CALCITE-2081: first_value/last_value windows on both sides of a join.
    // Reference NULLS LAST in window ORDER BY; default running frame makes
    // last_value = current row's value. (Golden's LIMIT 5 dropped: the full
    // join result is asserted, which subsumes it.)
    val w = Window.partitionBy(col("deptno")).orderBy(asc_nulls_last("commission"))
    val a = hrEmps.select(col("empid").as("a_empid"), col("deptno").as("a_deptno"),
      first(col("empid")).over(w).as("ar"))
    val b = hrEmps.select(col("empid").as("b_empid"), col("deptno").as("b_deptno"),
      last(col("empid")).over(w).as("br"))
    val byDept = a.join(b, col("a_deptno") === col("b_deptno"))
      .select(col("a_deptno"), col("ar"), col("br"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(byDept.length == 10)
    assert(byDept.filter(_._1 == 10).forall(_._2 == 110L))
    assert(byDept.filter(_._1 == 10).map(_._3).sorted ==
      Seq(100L, 100L, 100L, 110L, 110L, 110L, 150L, 150L, 150L))
    val byEmp = a.join(b, col("a_empid") === col("b_empid"))
      .select(col("a_empid"), col("ar"), col("br"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(byEmp == Set((100L, 110L, 100L), (110L, 110L, 110L),
      (150L, 110L, 150L), (200L, 200L, 200L)))
    // CALCITE-2271: dense_rank windows on both sides, map-unnest input
    val t1 = Seq((1, 1), (2, 2)).toDF("key", "v")
      .select(dense_rank().over(Window.orderBy(col("key"))).as("l"), col("key"))
    val t2 = Seq((2, 2)).toDF("key", "v")
      .select(dense_rank().over(Window.orderBy(col("key"))).as("l"), col("key"))
    val c2271 = t1.join(t2, t1("l") === t2("l") && t1("key") + 1 === t2("key"))
      .select(t1("l"), t1("key"), t2("key"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(c2271 == Seq((1, 1, 2)))
  }

  test("winagg.iq:502-526 — NTH_VALUE over the whole unordered partition") {
    import org.apache.spark.sql.expressions.Window
    // over() reads the partition in input order; pin it with a position col
    val withPos = emp.withColumn("pos", monotonically_increasing_id())
    val w = Window.orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val got = withPos.select(col("ename"),
      nth_value(col("deptno"), 1).over(w).as("n1"),
      nth_value(col("deptno"), 2).over(w).as("n2"),
      nth_value(col("deptno"), 5).over(w).as("n5"),
      nth_value(col("deptno"), 8).over(w).as("n8"),
      nth_value(col("deptno"), 10).over(w).as("n10"))
      .collect().map(r => (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        Option(r.get(4)), Option(r.get(5))))
    assert(got.length == 9)
    assert(got.forall(_ == ((Some(10), Some(10), Some(30), Some(60), None))), got.toSeq.toString)
  }

  test("winagg.iq:527-560 — windowed REGR_COUNT / COVAR_POP integer decomposition") {
    import org.apache.spark.sql.expressions.Window
    // POST EMPS ages: Fred 25 (null gender), Eric 80/M, John null/M,
    // Wilma 5/F, Alice null/F
    val ea = Seq(
      (Some(25), 10, None: Option[String]), (Some(80), 20, Some("M")),
      (None: Option[Int], 40, Some("M")), (Some(5), 20, Some("F")),
      (None: Option[Int], 40, Some("F")))
      .toDF("age", "deptno", "gender")
    // the reference decomposes COVAR_POP over INT args with integer division
    // at every step (winagg.iq:528-530 spells out the formula)
    def covarPopInt(w: org.apache.spark.sql.expressions.WindowSpec) = {
      val bothX = sum(when(col("age").isNotNull, col("deptno"))).over(w)
      val bothY = sum(when(col("deptno").isNotNull, col("age"))).over(w)
      val rc = count(when(col("age").isNotNull && col("deptno").isNotNull, 1)).over(w)
      floor((sum(col("age") * col("deptno")).over(w) - floor(bothX * bothY / rc)) / rc)
        .cast("long")
    }
    val wAll = Window.partitionBy()
    val all = ea.select(
      sum(col("age") * col("deptno")).over(wAll).as("sxy"),
      count(when(col("age").isNotNull && col("deptno").isNotNull, 1)).over(wAll).as("rc"),
      covarPopInt(wAll).as("cp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(all.length == 5 && all.forall(_ == ((1950L, 3L, 39L))), all.toSeq.toString)
    val wG = Window.partitionBy(col("gender"))
    val byG = ea.select(col("gender"),
      sum(col("age") * col("deptno")).over(wG).as("sxy"),
      count(when(col("age").isNotNull && col("deptno").isNotNull, 1)).over(wG).as("rc"),
      covarPopInt(wG).as("cp"))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(byG == Set(
      (Some("F"), 100L, 1L, 0L), (Some("M"), 1600L, 1L, 0L), (None, 250L, 1L, 0L)),
      byG.toString)
  }

  test("sort.iq:58-111 — CALCITE-970/969 null collation: nulls high both directions") {
    // foodmart store subset: (store_id, grocery_sqft, florist). The goldens
    // order by (florist, grocery_sqft) identically to grocery_sqft alone, so
    // florist is a constant prefix key across these three stores.
    val store = Seq((0, None: Option[Int], true), (1, Some(17475), true),
      (2, Some(22271), true)).toDF("store_id", "grocery_sqft", "florist")
    def ids(df: DataFrame): Seq[Int] = df.collect().map(_.getInt(0)).toSeq
    // nulls first under DESC
    assert(ids(store.orderBy(desc_nulls_first("grocery_sqft"))) == Seq(0, 2, 1))
    assert(ids(store.orderBy(col("florist"), desc_nulls_first("grocery_sqft")))
      == Seq(0, 2, 1))
    // nulls last under ASC
    assert(ids(store.orderBy(asc_nulls_last("grocery_sqft"))) == Seq(1, 2, 0))
    assert(ids(store.orderBy(col("florist"), asc_nulls_last("grocery_sqft")))
      == Seq(1, 2, 0))
  }

  test("sort.iq:124-205 — duplicate sort keys, WITH+ORDER BY, OFFSET 0, DISTINCT agg") {
    // CALCITE-2102: duplicate ORDER BY keys are ignored
    val dd = scottDept.orderBy(desc("deptno"), col("dname"), col("deptno"))
      .collect().map(_.getInt(0)).toSeq
    assert(dd == Seq(40, 30, 20, 10))
    // CALCITE-603: WITH ... ORDER BY over a self-joined CTE
    val e = hrEmps.where(col("empid") < 120).select(col("empid"))
    val selfJoin = e.as("e1").crossJoin(e.as("e2").withColumnRenamed("empid", "empid0"))
      .orderBy(col("empid") + col("empid0"), col("empid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(selfJoin == Seq((100L, 100L), (100L, 110L), (110L, 100L), (110L, 110L)))
    // WITH ... LIMIT: fewer rows than the limit
    val lim = hrEmps.where(col("empid") < 200).select(col("empid"))
      .where(col("empid") > 100).limit(5).collect().map(_.getLong(0)).toSet
    assert(lim == Set(110L, 150L))
    // CALCITE-1015: OFFSET 0 is a no-op
    assert(hrEmps.offset(0).count() == 4)
    // CALCITE-634: ORDER BY aggregate in SELECT DISTINCT
    val d634 = hrEmps.groupBy(col("deptno")).agg(count(lit(1)).as("c")).distinct()
      .orderBy(desc("c")).collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(d634 == Seq((10, 3L), (20, 1L)))
    val d634b = hrEmps.groupBy(col("empid")).agg(count(col("empid")).as("c"))
      .select(col("c")).distinct().orderBy(col("c"))
      .collect().map(_.getLong(0)).toSeq
    assert(d634b == Seq(1L))
  }

  test("join.iq:64-84 — LEFT join with disjunctive (OR) condition") {
    val dept = Seq((10, "Sales"), (20, "Marketing"), (30, "Engineering"), (40, "Empty"))
      .toDF("deptno0", "dname")
    val got = emp.join(dept,
      emp("deptno") === dept("deptno0") || emp("ename") === dept("dname"), "left")
      .collect().map(r => (r.getString(0), Option(r.get(3)).map(_.toString.toInt),
        Option(r.getString(4)))).toSet
    assert(got == Set(
      ("Adam", None, None), ("Alice", Some(30), Some("Engineering")),
      ("Bob", Some(10), Some("Sales")), ("Eric", Some(20), Some("Marketing")),
      ("Eve", None, None), ("Grace", None, None), ("Jane", Some(10), Some("Sales")),
      ("Susan", Some(30), Some("Engineering")), ("Wilma", None, None)))
  }

  test("join.iq:112-153 — aggregate pushed through join; CUBE over a join") {
    val j = scott.join(scottDept, "deptno")
    val dd = j.select(col("deptno")).distinct().collect().map(_.getInt(0)).toSet
    assert(dd == Set(10, 20, 30))
    // CALCITE-676: CUBE over the joined deptnos
    val cube = scott.as("e").join(scottDept.as("d"),
      col("e.deptno") === col("d.deptno"))
      .select(col("e.deptno").as("ed"), col("d.deptno").as("dd"))
      .cube(col("ed"), col("dd")).agg(lit(1))
      .select(col("ed"), col("dd"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(cube == Set(
      (Some(10), Some(10)), (Some(10), None), (Some(20), Some(20)), (Some(20), None),
      (Some(30), Some(30)), (Some(30), None), (None, Some(10)), (None, Some(20)),
      (None, Some(30)), (None, None)))
  }

  test("join.iq:158-230 — cross-input join conditions (CALCITE-688/457)") {
    // emp1.deptno + emp2.deptno = emp3.deptno + 10
    val e1 = scott.select(col("deptno").as("d1"))
    val e2 = scott.select(col("deptno").as("d2"))
    val e3 = scott.select(col("deptno").as("d3"), col("ename"))
    val got = e1.join(e2, col("d1") === col("d2"))
      .join(e3, col("d1") + col("d2") === col("d3") + 10)
      .select(col("d1"), col("ename")).distinct()
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((10, "CLARK"), (10, "KING"), (10, "MILLER"),
      (20, "ALLEN"), (20, "BLAKE"), (20, "JAMES"), (20, "MARTIN"),
      (20, "TURNER"), (20, "WARD")))
    // CALCITE-457: expression condition in a comma join
    val c457 = scottDept.as("d").crossJoin(scott.as("e"))
      .where(col("e.deptno") + 10 === col("d.deptno") * 2)
      .select(col("e.deptno"), col("d.deptno"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq.sorted
    assert(c457 == Seq.fill(3)((10, 10)) ++ Seq.fill(6)((30, 20)))
  }

  test("join.iq:238-283 — USING over VALUES aliases; left join + sort + limit") {
    // CALCITE-801
    val e = Seq((100, "Bill", 1), (200, "Eric", 1), (150, "Sebastian", 3))
      .toDF("empid", "name", "deptno")
    val d = Seq((1, "LeaderShip"), (2, "TestGroup"), (3, "Development"))
      .toDF("deptno", "dname")
    val got = e.join(d, "deptno")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3))).toSet
    assert(got == Set((1, 100, "Bill", "LeaderShip"), (1, 200, "Eric", "LeaderShip"),
      (3, 150, "Sebastian", "Development")))
    // CALCITE-1018: left join USING + ORDER BY + LIMIT (first 10 by empno)
    val lj = scott.join(scottDept, Seq("deptno"), "left")
      .orderBy(col("empno")).limit(10)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getAs[String]("dname"))).toSeq
    assert(lj == Seq(
      (7369, "SMITH", "RESEARCH"), (7499, "ALLEN", "SALES"), (7521, "WARD", "SALES"),
      (7566, "JONES", "RESEARCH"), (7654, "MARTIN", "SALES"), (7698, "BLAKE", "SALES"),
      (7782, "CLARK", "ACCOUNTING"), (7788, "SCOTT", "RESEARCH"),
      (7839, "KING", "ACCOUNTING"), (7844, "TURNER", "SALES")), lj.toString)
  }

  test("operator.iq:21-67 — NOT precedence binds above comparisons") {
    // [CALCITE-1095]: NOT sal > 1300 parses as NOT (sal > 1300)
    assert(scott.where(!(col("sal") > 1300)).count() == 6)
    assert(scott.where(!(col("ename") === "SMITH")).count() == 13)
    assert(scott.where(!(!(col("ename") === "SMITH"))).count() == 1)
    val got = scott.where(!(col("sal") > 1300) && !(col("sal") < 1200))
      .collect().map(_.getAs[String]("ename")).toSet
    assert(got == Set("WARD", "MARTIN", "MILLER"))
  }

  test("operator.iq:69-166 — MULTISET EXCEPT/UNION/INTERSECT, ALL + DISTINCT") {
    import graft.functions.Multisets._
    val df = Seq(1).toDF("one").select(
      array(lit("a"), lit("c"), lit("a")).as("aca"),
      array(lit("a")).as("a1"),
      array(lit("a"), lit("c"), lit("b")).as("acb"),
      array(lit("a"), lit("c"), lit("a"), lit("a")).as("acaa"),
      array(lit("a"), lit("a")).as("aa"))
    def arr(c: org.apache.spark.sql.Column): List[String] =
      df.select(c).head().getSeq[String](0).toList
    // bare operators default to ALL (bag semantics)
    assert(arr(multisetExceptAll(col("aca"), col("a1"))) == List("c", "a"))
    assert(arr(multisetExceptDistinct(col("aca"), col("a1"))) == List("c"))
    assert(arr(multisetUnionAll(col("acb"), col("a1"))) == List("a", "c", "b", "a"))
    assert(arr(multisetUnionDistinct(col("acb"), col("a1"))) == List("a", "b", "c"))
    assert(arr(multisetIntersectAll(col("acaa"), col("aa"))) == List("a", "a"))
    assert(arr(multisetIntersectDistinct(col("acaa"), col("aa"))) == List("a"))
    // predicates (SqlStdOperatorTable MEMBER_OF / SUBMULTISET_OF / IS_A_SET)
    def b(c: org.apache.spark.sql.Column): Boolean = df.select(c).head().getBoolean(0)
    assert(b(memberOf(lit("c"), col("aca"))))
    assert(!b(memberOf(lit("z"), col("aca"))))
    assert(b(submultisetOf(col("aa"), col("acaa"))))
    assert(!b(submultisetOf(col("acaa"), col("aa"))))
    assert(b(isASet(col("acb"))))
    assert(!b(isASet(col("aca"))))
  }

  // ---- GROUPING / GROUPING_ID family (agg.iq:564-930) ---------------------
  // Adaptations, dialect only: Calcite's free-form GROUPING_ID (any subset,
  // any order, duplicates) is composed from per-column GROUPING bits —
  // grouping_id(a, b) == grouping(a)*2 + grouping(b) by definition; Spark's
  // own grouping_id() demands the exact grouping-column list. GROUP_ID()
  // is 0 wherever the grouping-set list has no duplicates (every golden
  // here; Calcite itself returns 0 pre-CALCITE-1824). Plain-GROUP-BY
  // GROUPING is entered through a single-set GROUPING SETS, which is the
  // same query.

  private def gRows(sql: String): Set[List[Any]] = {
    emp.createOrReplaceTempView("g_emp")
    scott.createOrReplaceTempView("g_scott")
    spark.sql(sql).collect().toList.map(_.toSeq.toList).groupBy(identity)
      .map { case (row, occ) => row :+ occ.size }.toSet
  }

  test("agg.iq:564-578 — GROUPING in SELECT of plain GROUP BY (via single-set)") {
    val got = gRows(
      """SELECT count(*) AS c, CAST(grouping(deptno) AS INT) AS g
        |FROM g_emp GROUP BY GROUPING SETS ((deptno))""".stripMargin)
    assert(got == Set(List(1L, 0, 3), List(2L, 0, 3)))
  }

  test("agg.iq:583-611 — GROUPING over CUBE on scott (18-row golden)") {
    val got = gRows(
      """SELECT deptno, job, count(*) AS c,
        |  CAST(grouping(deptno) AS INT) AS d, CAST(grouping(job) AS INT) AS j,
        |  CAST(grouping(deptno) AS INT) * 2 + CAST(grouping(job) AS INT) AS x
        |FROM g_scott GROUP BY CUBE(deptno, job)""".stripMargin)
    val want = Set[List[Any]](
      List(10, "CLERK", 1L, 0, 0, 0, 1), List(10, "MANAGER", 1L, 0, 0, 0, 1),
      List(10, "PRESIDENT", 1L, 0, 0, 0, 1), List(10, null, 3L, 0, 1, 1, 1),
      List(20, "ANALYST", 2L, 0, 0, 0, 1), List(20, "CLERK", 2L, 0, 0, 0, 1),
      List(20, "MANAGER", 1L, 0, 0, 0, 1), List(20, null, 5L, 0, 1, 1, 1),
      List(30, "CLERK", 1L, 0, 0, 0, 1), List(30, "MANAGER", 1L, 0, 0, 0, 1),
      List(30, "SALESMAN", 4L, 0, 0, 0, 1), List(30, null, 6L, 0, 1, 1, 1),
      List(null, "ANALYST", 2L, 1, 0, 2, 1), List(null, "CLERK", 4L, 1, 0, 2, 1),
      List(null, "MANAGER", 3L, 1, 0, 2, 1), List(null, "PRESIDENT", 1L, 1, 0, 2, 1),
      List(null, "SALESMAN", 4L, 1, 0, 2, 1), List(null, null, 14L, 1, 1, 3, 1))
    assert(got == want)
  }

  test("agg.iq:616-645 — GROUPING_ID compositions over ROLLUP (15-row golden)") {
    val got = gRows(
      """SELECT count(*) AS c, CAST(grouping(deptno) AS INT) AS g,
        |  0 AS gid,
        |  CAST(grouping(deptno) AS INT) AS gd,
        |  CAST(grouping(gender) AS INT) AS gg,
        |  CAST(grouping(gender) AS INT) * 2 + CAST(grouping(deptno) AS INT) AS ggd,
        |  CAST(grouping(deptno) AS INT) * 2 + CAST(grouping(gender) AS INT) AS gdg
        |FROM g_emp GROUP BY ROLLUP(deptno, gender)""".stripMargin)
    val want = Set[List[Any]](
      List(1L, 0, 0, 0, 0, 0, 0, 7), List(2L, 0, 0, 0, 0, 0, 0, 1),
      List(9L, 1, 0, 1, 1, 3, 3, 1),
      List(1L, 0, 0, 0, 1, 2, 1, 3), List(2L, 0, 0, 0, 1, 2, 1, 3))
    assert(got == want)
  }

  test("agg.iq:648-677 — HAVING over composed GROUPING_ID (15-row golden)") {
    // HAVING on GROUPING compositions expressed as a filter over the
    // projected bits (Spark resolves grouping() only in the aggregate's
    // own select list) — same rows by construction
    val got = gRows(
      """SELECT c, gd, gid, gdgd, gidgd FROM (
        |  SELECT count(*) AS c, CAST(grouping(deptno) AS INT) AS gd,
        |    CAST(grouping(deptno) AS INT) AS gid,
        |    CAST(grouping(deptno) AS INT) * 5 + CAST(grouping(gender) AS INT) * 2 AS gdgd,
        |    CAST(grouping(deptno) AS INT) * 5 + CAST(grouping(gender) AS INT) * 2 AS gidgd
        |  FROM g_emp GROUP BY ROLLUP(deptno, gender))
        |WHERE gd <= gidgd""".stripMargin)
    val want = Set[List[Any]](
      List(1L, 0, 0, 0, 0, 7), List(2L, 0, 0, 0, 0, 1),
      List(1L, 0, 0, 2, 2, 3), List(2L, 0, 0, 2, 2, 3),
      List(9L, 1, 1, 7, 7, 1))
    assert(got == want)
  }

  test("agg.iq:680-694 — GROUPING in ORDER BY") {
    emp.createOrReplaceTempView("g_emp")
    // ordering on GROUPING goes through a projected bit column (Spark
    // resolves grouping() only in the aggregate's own select list)
    val got = spark.sql(
      """SELECT c FROM (
        |  SELECT count(*) AS c, CAST(grouping(deptno) AS INT) AS g
        |  FROM g_emp GROUP BY ROLLUP(deptno))
        |ORDER BY g, c""".stripMargin)
      .collect().map(_.getLong(0)).toList
    assert(got == List(1L, 1L, 1L, 2L, 2L, 2L, 9L))
  }

  test("agg.iq:698-714 — duplicate argument to GROUPING_ID (composed)") {
    val got = gRows(
      """SELECT deptno, gender,
        |  CAST(grouping(deptno) AS INT) * 5 + CAST(grouping(gender) AS INT) * 2 AS x,
        |  count(*) AS c
        |FROM g_emp WHERE deptno = 10 GROUP BY ROLLUP(gender, deptno)""".stripMargin)
    val want = Set[List[Any]](
      List(10, "F", 0, 1L, 1), List(10, "M", 0, 1L, 1),
      List(null, "F", 5, 1L, 1), List(null, "M", 5, 1L, 1),
      List(null, null, 7, 2L, 1))
    assert(got == want)
  }

  test("agg.iq:739-771 — GROUPING, GROUPING_ID, GROUP_ID over CUBE (17-row golden)") {
    val got = gRows(
      """SELECT deptno, gender,
        |  CAST(grouping(deptno) AS INT) AS gd, CAST(grouping(gender) AS INT) AS gg,
        |  CAST(grouping(deptno) AS INT) * 2 + CAST(grouping(gender) AS INT) AS dg,
        |  CAST(grouping(gender) AS INT) * 2 + CAST(grouping(deptno) AS INT) AS gd2,
        |  0 AS gid, count(*) AS c
        |FROM g_emp GROUP BY CUBE(deptno, gender)""".stripMargin)
    val want = Set[List[Any]](
      List(10, "F", 0, 0, 0, 0, 0, 1L, 1), List(10, "M", 0, 0, 0, 0, 0, 1L, 1),
      List(20, "M", 0, 0, 0, 0, 0, 1L, 1), List(30, "F", 0, 0, 0, 0, 0, 2L, 1),
      List(50, "F", 0, 0, 0, 0, 0, 1L, 1), List(50, "M", 0, 0, 0, 0, 0, 1L, 1),
      List(60, "F", 0, 0, 0, 0, 0, 1L, 1), List(null, "F", 0, 0, 0, 0, 0, 1L, 1),
      List(null, null, 1, 1, 3, 3, 0, 9L, 1),
      List(10, null, 0, 1, 1, 2, 0, 2L, 1), List(20, null, 0, 1, 1, 2, 0, 1L, 1),
      List(30, null, 0, 1, 1, 2, 0, 2L, 1), List(50, null, 0, 1, 1, 2, 0, 2L, 1),
      List(60, null, 0, 1, 1, 2, 0, 1L, 1), List(null, null, 0, 1, 1, 2, 0, 1L, 1),
      List(null, "F", 1, 0, 2, 1, 0, 6L, 1), List(null, "M", 1, 0, 2, 1, 0, 3L, 1))
    assert(got == want)
  }

  test("agg.iq:774-787 — CALCITE-1781 expression in ROLLUP") {
    emp.createOrReplaceTempView("g_emp")
    val got = spark.sql(
      """SELECT d1, d1 - 1 AS d0, c FROM (
        |  SELECT deptno + 1 AS d1, count(*) AS c
        |  FROM g_emp GROUP BY ROLLUP(deptno + 1))""".stripMargin)
      .collect().toList.map(_.toSeq.toList).groupBy(identity)
      .map { case (r, o) => r :+ o.size }.toSet
    val want = Set[List[Any]](
      List(11, 10, 2L, 1), List(21, 20, 1L, 1), List(31, 30, 2L, 1),
      List(51, 50, 2L, 1), List(61, 60, 1L, 1),
      List(null, null, 1L, 1), List(null, null, 9L, 1))
    assert(got == want)
  }

  test("agg.iq:789-830 — CUBE and ROLLUP over an expression (mod)") {
    val cube = gRows(
      """SELECT mod(deptno, 20) AS d, count(*) AS c, gender AS g
        |FROM g_emp GROUP BY CUBE(mod(deptno, 20), gender)""".stripMargin)
    val wantCube = Set[List[Any]](
      List(0, 1L, "F", 1), List(0, 1L, "M", 1), List(0, 2L, null, 1),
      List(10, 2L, "M", 1), List(10, 4L, "F", 1), List(10, 6L, null, 1),
      List(null, 1L, "F", 1), List(null, 1L, null, 1), List(null, 3L, "M", 1),
      List(null, 6L, "F", 1), List(null, 9L, null, 1))
    assert(cube == wantCube)
    val rollup = gRows(
      """SELECT mod(deptno, 20) AS d, count(*) AS c, gender AS g
        |FROM g_emp GROUP BY ROLLUP(mod(deptno, 20), gender)""".stripMargin)
    val wantRollup = Set[List[Any]](
      List(0, 1L, "F", 1), List(0, 1L, "M", 1), List(0, 2L, null, 1),
      List(10, 2L, "M", 1), List(10, 4L, "F", 1), List(10, 6L, null, 1),
      List(null, 1L, "F", 1), List(null, 1L, null, 1), List(null, 9L, null, 1))
    assert(rollup == wantRollup)
  }

  test("agg.iq:832-855 — CUBE/ROLLUP of a constant (via non-ordinal 1+0)") {
    emp.createOrReplaceTempView("g_emp")
    // `GROUP BY CUBE(1)` is ordinal in Spark; `1+0` is the same constant
    // grouping without ordinal resolution
    val cube = spark.sql("SELECT count(*) AS c FROM g_emp GROUP BY CUBE(1+0)")
      .collect().map(_.getLong(0)).toList.sorted
    assert(cube == List(9L, 9L))
    val rollup = spark.sql("SELECT count(*) AS c FROM g_emp GROUP BY ROLLUP(1+0)")
      .collect().map(_.getLong(0)).toList.sorted
    assert(rollup == List(9L, 9L))
  }

  test("agg.iq:996-1026 — KYLIN-751/CALCITE-735 max/min over negative double/float") {
    val d = spark.sql(
      "SELECT max(v) AS x, min(v) AS n FROM (VALUES CAST(-86.4 AS DOUBLE), CAST(-100 AS DOUBLE)) AS t(v)")
      .head()
    assert(d.getDouble(0) == -86.4 && d.getDouble(1) == -100.0)
    val d3 = spark.sql(
      "SELECT max(v) AS x, min(v) AS n FROM (VALUES CAST(-86.4 AS DOUBLE), CAST(-100 AS DOUBLE), CAST(2 AS DOUBLE)) AS t(v)")
      .head()
    assert(d3.getDouble(0) == 2.0 && d3.getDouble(1) == -100.0)
    val f = spark.sql(
      "SELECT max(v) AS x, min(v) AS n FROM (VALUES CAST(-86.4 AS FLOAT), CAST(-100 AS FLOAT)) AS t(v)")
      .head()
    assert(f.getFloat(0) == -86.4f && f.getFloat(1) == -100.0f)
  }

  test("agg.iq:1030-1065 — CALCITE-551 sub-query inside aggregate function") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    val s1 = spark.sql(
      """SELECT SUM(CASE WHEN deptno IN (SELECT deptno FROM g_dept) THEN 1
        |  ELSE 0 END) AS s FROM g_scott""".stripMargin).head().getLong(0)
    assert(s1 == 14L)
    val s2 = spark.sql(
      "SELECT SUM((SELECT min(deptno) FROM g_dept)) AS s FROM g_scott")
      .head().getLong(0)
    assert(s2 == 140L)
    val s3 = spark.sql(
      """SELECT SUM((SELECT min(deptno) FROM g_dept)) AS s, deptno
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(s3 == Set((30L, 10), (50L, 20), (60L, 30)))
  }

  test("agg.iq:1095-1152 — FUSION (bag union of collections) and COLLECT") {
    scott.createOrReplaceTempView("g_scott")
    // FUSION == flatten over the collected collections (bag semantics)
    val card = spark.sql(
      """SELECT size(flatten(collect_list(empnos))) AS f FROM (
        |  SELECT deptno, collect_list(empno) AS empnos
        |  FROM g_scott GROUP BY deptno)""".stripMargin).head().getInt(0)
    assert(card == 14)
    // FUSION on sub-total: per-job union of per-(deptno, job) collections
    val byJob = spark.sql(
      """SELECT job, sort_array(flatten(collect_list(empnos))) AS empnos FROM (
        |  SELECT job, collect_list(empno) AS empnos
        |  FROM g_scott GROUP BY deptno, job) GROUP BY job""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getSeq[Int](1).toList).toMap
    assert(byJob == Map(
      "ANALYST" -> List(7788, 7902), "CLERK" -> List(7369, 7876, 7900, 7934),
      "MANAGER" -> List(7566, 7698, 7782), "PRESIDENT" -> List(7839),
      "SALESMAN" -> List(7499, 7521, 7654, 7844)))
    // COLLECT per group
    val collected = spark.sql(
      """SELECT deptno, sort_array(collect_list(empno)) AS empnos
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(collected == Map(
      10 -> List(7782, 7839, 7934), 20 -> List(7369, 7566, 7788, 7876, 7902),
      30 -> List(7499, 7521, 7654, 7698, 7844, 7900)))
  }

  test("agg.iq:1174-1250 — COLLECT FILTER and the aggregate FILTER suite") {
    scott.createOrReplaceTempView("g_scott")
    val cf = spark.sql(
      """SELECT deptno, sort_array(collect_list(empno) FILTER (WHERE empno < 7550)) AS e
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(cf == Map(10 -> Nil, 20 -> List(7369), 30 -> List(7499, 7521)))
    // sum/max/min FILTER incl. empty-group NULLs (agg.iq:1189-1211)
    val f = spark.sql(
      """SELECT deptno,
        |  sum(sal) FILTER (WHERE job = 'CLERK') AS c_sal,
        |  sum(sal) FILTER (WHERE job = 'CLERK' AND deptno > 10) AS c10_sal,
        |  max(sal) FILTER (WHERE job = 'CLERK')
        |    - min(sal) FILTER (WHERE job = 'CLERK') AS range_c,
        |  max(sal) FILTER (WHERE job = 'SALESMAN')
        |    - min(sal) FILTER (WHERE job = 'SALESMAN') AS range_m
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0),
        Option(r.get(1)), Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toSet
    assert(f == Set(
      (10, Some(1300.0), None, Some(0.0), None),
      (20, Some(1900.0), Some(1900.0), Some(300.0), None),
      (30, Some(950.0), Some(950.0), Some(0.0), Some(350.0))))
    // FILTER on the GROUP BY condition (agg.iq:1214-1229)
    val g10 = spark.sql(
      """SELECT deptno, sum(sal) FILTER (WHERE deptno = 10) AS sal_10
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), Option(r.get(1)))).toSet
    assert(g10 == Set((10, Some(8750.0)), (20, None), (30, None)))
    // FILTER inside HAVING (agg.iq:1232-1242)
    val hv = spark.sql(
      """SELECT deptno FROM g_scott GROUP BY deptno
        |HAVING sum(sal) FILTER (WHERE job = 'CLERK') > 1000""".stripMargin)
      .collect().map(_.getInt(0)).toSet
    assert(hv == Set(10, 20))
    // FILTER inside ORDER BY (agg.iq:1245-1256)
    val ob = spark.sql(
      """SELECT deptno FROM g_scott GROUP BY deptno
        |ORDER BY sum(sal) FILTER (WHERE job = 'CLERK')""".stripMargin)
      .collect().map(_.getInt(0)).toList
    assert(ob == List(30, 10, 20))
  }

  test("agg.iq:1259-1315 — FILTER with JOIN, DISTINCT+FILTER, COUNT DISTINCT of group col") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    val j = spark.sql(
      """SELECT g_dept.deptno,
        |  sum(sal) FILTER (WHERE 1 < 2) AS s, sum(sal) AS s1,
        |  count(*) FILTER (WHERE g_scott.ename < g_dept.dname) AS c
        |FROM g_scott JOIN g_dept USING (deptno)
        |GROUP BY g_dept.deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getLong(3))).toSet
    assert(j == Set(
      (10, 8750.0, 8750.0, 0L), (20, 10875.0, 10875.0, 3L),
      (30, 9400.0, 9400.0, 4L)))
    val cdj = spark.sql(
      """SELECT deptno, count(DISTINCT job) FILTER (WHERE job <> 'SALESMAN') AS cdj
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(cdj == Set((10, 3L), (20, 3L), (30, 2L)))
    // CALCITE-1293: COUNT(DISTINCT groupcol)
    val cd = spark.sql(
      """SELECT count(DISTINCT deptno) AS cd, count(*) AS c
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cd == Set((1L, 3L), (1L, 5L), (1L, 6L)))
  }

  test("agg.iq:1317-1412 — COUNT DISTINCT over CUBE; multiple distinct + mixed aggregates") {
    scott.createOrReplaceTempView("g_scott")
    val cube = spark.sql(
      """SELECT count(DISTINCT deptno) AS cd, count(*) AS c
        |FROM g_scott GROUP BY CUBE(deptno)""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(cube == List((1L, 3L), (1L, 5L), (1L, 6L), (3L, 14L)))
    val multi = spark.sql(
      """SELECT deptno, count(DISTINCT job) AS dj, count(job) AS j,
        |  count(DISTINCT mgr) AS m, sum(sal) AS s
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(multi == Set(
      (10, 3L, 3L, 2L, 8750.0), (20, 3L, 5L, 4L, 10875.0),
      (30, 3L, 6L, 2L, 9400.0)))
    val global = spark.sql(
      """SELECT count(DISTINCT job) AS dj, count(job) AS j,
        |  count(DISTINCT mgr) AS m, sum(sal) AS s FROM g_scott""".stripMargin)
      .head()
    assert((global.getLong(0), global.getLong(1), global.getLong(2),
      global.getDouble(3)) == ((5L, 14L, 6L, 29025.0)))
  }

  test("agg.iq:1414-1470 — CALCITE-280 avg; CALCITE-846 FILTER through UNION ALL; CALCITE-751 agg-join") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // avg(comm) over {300, 500, 1400}: the BigDecimal-underflow regression.
    // The reference evaluates in DECIMAL64 (…3333), Spark in IEEE double
    // (…3334) — same quantity, last-ulp representation difference.
    val a = spark.sql(
      "SELECT avg(comm) AS a, count(comm) AS c FROM g_scott WHERE empno < 7844")
      .head()
    assert(a.getDouble(0) == 2200.0 / 3 && a.getLong(1) == 3L)
    // FILTERed count pushed through UNION ALL
    val u = spark.sql(
      """SELECT deptno, count(*) FILTER (WHERE job = 'CLERK') AS cf, count(*) AS c
        |FROM (SELECT * FROM g_scott WHERE deptno < 20
        |      UNION ALL SELECT * FROM g_scott WHERE deptno > 20)
        |GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(u == Set((10, 1L, 3L), (30, 1L, 6L)))
    // aggregate-join transpose results
    assert(spark.sql(
      "SELECT count(*) FROM g_scott JOIN g_dept USING (deptno)")
      .head().getLong(0) == 14L)
    assert(spark.sql(
      "SELECT sum(sal) FROM g_scott JOIN g_dept USING (deptno)")
      .head().getDouble(0) == 29025.0)
  }

  test("agg.iq:1472-1710 — aggregate-join transpose result family") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    def sums(sql: String): List[Double] =
      spark.sql(sql).collect().map(_.getDouble(0)).toList.sorted
    // group by join key (both spellings collapse to the same grouping)
    assert(sums(
      """SELECT sum(sal) FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.deptno, d.deptno""".stripMargin)
      == List(8750.0, 9400.0, 10875.0))
    assert(sums(
      """SELECT sum(sal) FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.deptno""".stripMargin)
      == List(8750.0, 9400.0, 10875.0))
    // min pushes like sum
    assert(sums(
      """SELECT min(sal) FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.deptno""".stripMargin)
      == List(800.0, 950.0, 1300.0))
    // count + sum grouped by join key / superset / non-join column
    def pairs(sql: String): Set[(Long, Double)] =
      spark.sql(sql).collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(pairs(
      """SELECT count(*) AS c, sum(sal) AS s
        |FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.deptno""".stripMargin)
      == Set((3L, 8750.0), (5L, 10875.0), (6L, 9400.0)))
    val byJobDept = spark.sql(
      """SELECT count(*) AS c, sum(sal) AS s
        |FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.job, d.deptno""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList.sorted
    assert(byJobDept == List((1L, 950.0), (1L, 1300.0), (1L, 2450.0),
      (1L, 2850.0), (1L, 2975.0), (1L, 5000.0), (2L, 1900.0), (2L, 6000.0),
      (4L, 5600.0)))
    assert(pairs(
      """SELECT count(*) AS c, sum(sal) AS s
        |FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY e.job""".stripMargin)
      == Set((1L, 5000.0), (2L, 6000.0), (3L, 8275.0), (4L, 4150.0),
        (4L, 5600.0)))
  }

  test("agg.iq:1759-1840 — self-join aggregate push; CALCITE-783/822 collation") {
    scott.createOrReplaceTempView("g_scott")
    // aggregate by the "many" side vs the "one" side of emp ⋈ mgr
    val many = spark.sql(
      """SELECT sum(e.sal) AS s FROM g_scott e JOIN g_scott m ON e.mgr = m.empno
        |GROUP BY m.empno""".stripMargin)
      .collect().map(_.getDouble(0)).toList.sorted
    assert(many == List(800.0, 1100.0, 1300.0, 6000.0, 6550.0, 8275.0))
    val one = spark.sql(
      """SELECT sum(m.sal) AS s FROM g_scott e JOIN g_scott m ON e.mgr = m.empno
        |GROUP BY m.empno""".stripMargin)
      .collect().map(_.getDouble(0)).toList.sorted
    assert(one == List(2450.0, 3000.0, 3000.0, 5950.0, 14250.0, 15000.0))
    // collation through nested aggregate + order (CALCITE-783/822)
    val coll = spark.sql(
      """SELECT sum(x) AS sum_cnt, count(DISTINCT y) AS cnt_dist FROM (
        |  SELECT count(*) AS x, t1.job AS y, t1.deptno AS z
        |  FROM g_scott t1 GROUP BY t1.job, t1.deptno
        |  ORDER BY t1.job, t1.deptno) sq
        |GROUP BY z ORDER BY sum_cnt""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toList
    assert(coll == List((3L, 3L), (5L, 3L), (6L, 3L)))
  }

  test("agg.iq:1843-1950 — CALCITE-938 join-distinct; CALCITE-1016 empty-relation GROUP BY") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    val jd = spark.sql(
      """SELECT empno, d.deptno
        |FROM g_scott JOIN (SELECT DISTINCT deptno FROM g_dept) d USING (deptno)"""
        .stripMargin).collect()
    assert(jd.length == 14)
    // grouped aggregate over empty input → 0 rows; global → 1 row of 0
    assert(spark.sql(
      "SELECT '1' FROM g_scott WHERE false GROUP BY 1").count() == 0)
    // Calcite groups by the CONSTANT 1 (no GROUP BY ordinals); Spark's
    // ordinal would hit the aggregate, so the constant is spelled 1+0
    assert(spark.sql(
      "SELECT count('1') FROM g_scott WHERE false GROUP BY 1+0").count() == 0)
    // DIVERGENCE, documented: Calcite's `GROUP BY ()` (empty grouping
    // set) over an empty relation yields one zero row per the standard;
    // Spark lowers GROUPING SETS through Expand, so the same query
    // yields ZERO rows. The plain global aggregate (next assert) is the
    // Spark spelling that carries the standard one-row semantics.
    assert(spark.sql(
      "SELECT count('1') FROM g_scott WHERE false GROUP BY GROUPING SETS (())")
      .count() == 0)
    assert(spark.sql(
      "SELECT count('1') FROM g_scott WHERE false").head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT count('1') FROM (VALUES (1, 2), (3, 4)) WHERE false")
      .head().getLong(0) == 0L)
    assert(spark.sql(
      "SELECT count('1') FROM (VALUES (1, 2), (3, 4)) WHERE false GROUP BY 1+0")
      .count() == 0)
  }

  test("agg.iq:1992-2150 — constant keys, FLOOR windows, ordered ROLLUP, HAVING count, system fns") {
    scott.createOrReplaceTempView("g_scott")
    // CALCITE-1023: constant aggregate key survives
    val ck = spark.sql(
      """SELECT job, sum(sal) AS sum_sal, deptno FROM g_scott
        |WHERE deptno = 10 GROUP BY deptno, job""".stripMargin)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getInt(2))).toSet
    assert(ck == Set(("CLERK", 1300.0, 10), ("MANAGER", 2450.0, 10),
      ("PRESIDENT", 5000.0, 10)))
    // orinoco FLOOR(rowtime TO HOUR) grouping (date_trunc is the Spark
    // spelling of the reference's FLOOR-to-unit)
    val fl = spark.sql(
      """SELECT CAST(date_trunc('HOUR', rowtime) AS STRING) AS rowtime, count(*) AS c
        |FROM (VALUES
        |  (TIMESTAMP '2015-02-15 10:15:00', 1), (TIMESTAMP '2015-02-15 10:24:15', 2),
        |  (TIMESTAMP '2015-02-15 10:24:45', 3), (TIMESTAMP '2015-02-15 10:58:00', 4),
        |  (TIMESTAMP '2015-02-15 11:10:00', 5)) AS t(rowtime, id)
        |GROUP BY date_trunc('HOUR', rowtime)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fl == Set(("2015-02-15 10:00:00", 4L), ("2015-02-15 11:00:00", 1L)))
    // CALCITE-729: ROLLUP ordered by its grouping columns (the reference
    // sorts NULLs last by default; pinned explicitly, like the winagg
    // window-default adaptation)
    val ru = spark.sql(
      """SELECT deptno, job, count(*) AS c FROM g_scott
        |GROUP BY ROLLUP(deptno, job)
        |ORDER BY deptno NULLS LAST, job NULLS LAST""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), r.getLong(2))).toList
    assert(ru.length == 13)
    assert(ru.last == ((None, None, 14L)))
    assert(ru.take(4) == List(
      (Some(10), Some("CLERK"), 1L), (Some(10), Some("MANAGER"), 1L),
      (Some(10), Some("PRESIDENT"), 1L), (Some(10), None, 3L)))
    // CALCITE-799/801: HAVING count(*) > 1 over VALUES join (both spellings)
    for (joinClause <- Seq("ON e.deptno = d.deptno", "USING (deptno)")) {
      val hv = spark.sql(
        s"""SELECT d.deptno, min(e.empid) AS empid
           |FROM (VALUES (100, 'Bill', 1), (200, 'Eric', 1), (150, 'Sebastian', 3))
           |  AS e(empid, name, deptno)
           |JOIN (VALUES (1, 'LeaderShip'), (2, 'TestGroup'), (3, 'Development'))
           |  AS d(deptno, name) $joinClause
           |GROUP BY d.deptno HAVING count(*) > 1""".stripMargin)
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(hv == Set((1, 100)), joinClause)
    }
    // CALCITE-886: system function in GROUP BY (value is session-dependent)
    val cu = spark.sql(
      "SELECT current_user() AS cuser FROM g_scott GROUP BY current_user()")
      .collect()
    assert(cu.length == 1 && cu.head.getString(0).nonEmpty)
    // CALCITE-1381: function quantifier retained through clone
    assert(spark.sql(
      "SELECT nullif(count(DISTINCT '1'), 0) FROM (VALUES (1, 2), (3, 4))")
      .head().getLong(0) == 1L)
  }

  test("agg.iq:2160-2280 — CALCITE-1930 multi-distinct with shared input refs; ANY_VALUE") {
    scott.createOrReplaceTempView("g_scott")
    val a = spark.sql(
      "SELECT count(DISTINCT empno), count(sal), min(sal), max(sal) FROM g_scott")
      .head()
    assert((a.getLong(0), a.getLong(1), a.getDouble(2), a.getDouble(3))
      == ((14L, 14L, 800.0, 5000.0)))
    val b = spark.sql(
      "SELECT count(DISTINCT deptno), count(job), min(sal), max(sal) FROM g_scott")
      .head()
    assert((b.getLong(0), b.getLong(1), b.getDouble(2), b.getDouble(3))
      == ((3L, 14L, 800.0, 5000.0)))
    val byMgr = spark.sql(
      """SELECT mgr, count(DISTINCT deptno) AS cd, count(job) AS cj,
        |  min(sal) AS mn, max(sal) AS mx
        |FROM g_scott GROUP BY mgr""".stripMargin)
      .collect().map(r => (Option(r.get(0)), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(byMgr == Set(
      (Some(7566), 1L, 2L, 3000.0, 3000.0), (Some(7698), 1L, 5L, 950.0, 1600.0),
      (Some(7782), 1L, 1L, 1300.0, 1300.0), (Some(7788), 1L, 1L, 1100.0, 1100.0),
      (Some(7839), 3L, 3L, 2450.0, 2975.0), (Some(7902), 1L, 1L, 800.0, 800.0),
      (None, 1L, 1L, 5000.0, 5000.0)))
    // composite DISTINCT argument
    val comp = spark.sql(
      """SELECT mgr, count(DISTINCT deptno, job) AS c
        |FROM g_scott GROUP BY mgr""".stripMargin)
      .collect().map(r => (Option(r.get(0)), r.getLong(1))).toSet
    assert(comp == Set(
      (Some(7566), 1L), (Some(7698), 2L), (Some(7782), 1L), (Some(7788), 1L),
      (Some(7839), 3L), (Some(7902), 1L), (None, 1L)))
    // CALCITE-2366 ANY_VALUE: one row globally; per-sal-group the value is
    // SOME member of the group (the reference's pick is storage-order)
    assert(spark.sql("SELECT any_value(empno) FROM g_scott").collect().length == 1)
    val groups = scott.collect()
      .groupBy(_.getAs[Double]("sal")).map { case (s, rs) =>
        s -> rs.map(_.getAs[Int]("empno")).toSet }
    val av = spark.sql(
      "SELECT sal, any_value(empno) FROM g_scott GROUP BY sal").collect()
    assert(av.length == 12)
    av.foreach(r => assert(groups(r.getDouble(0)).contains(r.getInt(1))))
  }

  test("agg.iq:2284-2360 — REGR_COUNT/SXX/SYY and COVAR/VAR family") {
    scott.createOrReplaceTempView("g_scott")
    val rc = spark.sql(
      """SELECT regr_count(comm, sal), regr_count(empno, sal) FROM g_scott""")
      .head()
    assert((rc.getLong(0), rc.getLong(1)) == ((4L, 14L)))
    // Spark's regr_sxx accumulates moments in double (…99999 at the last
    // ulp); the reference evaluates the decimal formula exactly
    val sx = spark.sql(
      """SELECT regr_sxx(comm, sal), regr_syy(comm, sal),
        |  regr_sxx(sal, comm), regr_syy(sal, comm) FROM g_scott""".stripMargin)
      .head()
    Seq(sx.getDouble(0) -> 95000.0, sx.getDouble(1) -> 1090000.0,
      sx.getDouble(2) -> 1090000.0, sx.getDouble(3) -> 95000.0)
      .foreach { case (got, want) => assert(math.abs(got - want) < 1e-6) }
    val cv = spark.sql(
      """SELECT covar_pop(comm, comm), covar_samp(sal, sal),
        |  var_pop(comm), var_samp(sal) FROM g_scott""".stripMargin)
      .head()
    assert(cv.getDouble(0) == 272500.0 && cv.getDouble(2) == 272500.0)
    // sample variance over 14 doubles: engines differ in accumulation
    // order, so pin to a relative ulp-scale tolerance
    assert(math.abs(cv.getDouble(1) - 1398313.873626374) < 1e-6)
    assert(math.abs(cv.getDouble(3) - 1398313.873626374) < 1e-6)
    // REGR_COUNT with GROUP BY: only the two-comm sal=1250 group pairs up
    val g = spark.sql(
      """SELECT sal, regr_count(comm, sal) AS rc, regr_count(empno, sal) AS re
        |FROM g_scott GROUP BY sal""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).toSet
    assert(g == Set(
      (1100.0, 0L, 1L), (1250.0, 2L, 2L), (1300.0, 0L, 1L), (1500.0, 1L, 1L),
      (1600.0, 1L, 1L), (2450.0, 0L, 1L), (2850.0, 0L, 1L), (2975.0, 0L, 1L),
      (3000.0, 0L, 2L), (5000.0, 0L, 1L), (800.0, 0L, 1L), (950.0, 0L, 1L)))
  }

  test("agg.iq:2403-2530 — WITHIN GROUP collect (as sorted collect_list) with FILTER and JOIN") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // WITHIN GROUP (ORDER BY empno DESC) == sort_array(collect_list, desc)
    val desc = spark.sql(
      """SELECT deptno, sort_array(collect_list(empno), false) AS empnos
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(desc == Map(
      10 -> List(7934, 7839, 7782), 20 -> List(7902, 7876, 7788, 7566, 7369),
      30 -> List(7900, 7844, 7698, 7654, 7521, 7499)))
    // DESC + FILTER
    val df2 = spark.sql(
      """SELECT deptno,
        |  sort_array(collect_list(empno) FILTER (WHERE empno > 7500), false) AS empnos
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(df2 == Map(
      10 -> List(7934, 7839, 7782), 20 -> List(7902, 7876, 7788, 7566),
      30 -> List(7900, 7844, 7698, 7654, 7521)))
    // JOIN variant: ordered sals + filtered ordered sals
    val j = spark.sql(
      """SELECT d.deptno,
        |  sort_array(collect_list(sal), false) AS s,
        |  sort_array(collect_list(sal) FILTER (WHERE sal > 2000)) AS s2
        |FROM g_scott e JOIN g_dept d ON e.deptno = d.deptno
        |GROUP BY d.deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList,
        r.getSeq[Double](2).toList)).toSet
    assert(j == Set(
      (10, List(5000.0, 2450.0, 1300.0), List(2450.0, 5000.0)),
      (20, List(3000.0, 3000.0, 2975.0, 1100.0, 800.0), List(2975.0, 3000.0, 3000.0)),
      (30, List(2850.0, 1600.0, 1500.0, 1250.0, 1250.0, 950.0), List(2850.0))))
    // collect over an expression
    val expr = spark.sql(
      """SELECT deptno, sort_array(collect_list(empno + 1)) AS empnos
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Int](1).toList).toMap
    assert(expr(10) == List(7783, 7840, 7935))
  }

  test("agg.iq:2532-2600 — BIT_AND/BIT_OR; DRUID-7593 distinct-count of complex CASE") {
    scott.createOrReplaceTempView("g_scott")
    val bits = spark.sql(
      "SELECT bit_and(deptno), bit_or(deptno) FROM g_scott").head()
    assert((bits.getInt(0), bits.getInt(1)) == ((0, 30)))
    val byDept = spark.sql(
      """SELECT deptno, bit_and(empno), bit_or(empno)
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(byDept == Set((10, 7686, 7935), (20, 7168, 8191), (30, 7168, 8191)))
    // DRUID-7593: COUNT(DISTINCT complex CASE) minus a MAX-derived
    // constant. The +Long.MaxValue+1 arithmetic runs in Scala: Spark's
    // ANSI constant reassociation folds the two literals together and
    // overflows where Calcite evaluates left-to-right without overflow.
    val druid = spark.sql(
      """WITH wikipedia AS (
        |  SELECT empno AS delta,
        |    CASE WHEN deptno = 10 THEN 'true' ELSE 'false' END AS isRobot,
        |    ename AS user FROM g_scott)
        |SELECT COUNT(DISTINCT
        |    CASE WHEN (((CASE WHEN wikipedia.delta IN (1,2,3,4,5,6,7,8,9,10)
        |                      THEN REPLACE('Yes', 'Yes', 'Yes')
        |                      ELSE REPLACE('No', 'No', 'No') END) = 'No'))
        |         AND (wikipedia.isRobot = 'true')
        |         THEN (wikipedia.user) ELSE NULL END) AS cd,
        |  MAX(CASE WHEN (((CASE WHEN wikipedia.delta IN (1,2,3,4,5,6,7,8,9,10)
        |                        THEN REPLACE('Yes', 'Yes', 'Yes')
        |                        ELSE REPLACE('No', 'No', 'No') END) = 'No'))
        |           AND (wikipedia.isRobot = 'true')
        |           THEN NULL ELSE -9223372036854775807L END) AS mx
        |FROM wikipedia LIMIT 500""".stripMargin).head()
    val druidResult = druid.getLong(0) - (druid.getLong(1) + 9223372036854775807L + 1L)
    assert(druidResult == 2L)
  }

  test("misc.iq:132-275 — timestamp→date casts, nested ORDER BY, complex join conditions") {
    // CALCITE-307 / DRILL-1051: CAST(timestamp AS DATE) across centuries
    // and the 1996 leap boundary
    val casted = spark.sql(
      """SELECT CAST(c_timestamp AS STRING) AS s, CAST(c_timestamp AS DATE) AS d
        |FROM (VALUES
        |  (1, TIMESTAMP '1997-01-02 03:04:05'),
        |  (2, TIMESTAMP '1997-01-02 00:00:00'),
        |  (3, TIMESTAMP '2001-09-22 18:19:20'),
        |  (16, TIMESTAMP '1697-02-16 17:32:01'),
        |  (20, TIMESTAMP '2097-02-16 17:32:01'),
        |  (21, TIMESTAMP '1996-02-28 17:32:01'),
        |  (22, TIMESTAMP '1996-02-29 17:32:01'),
        |  (23, TIMESTAMP '1996-03-01 17:32:01')) AS t(c_row, c_timestamp)"""
        .stripMargin)
      .collect().map(r => (r.getString(0), r.getDate(1).toString)).toSet
    assert(casted == Set(
      ("1997-01-02 03:04:05", "1997-01-02"), ("1997-01-02 00:00:00", "1997-01-02"),
      ("2001-09-22 18:19:20", "2001-09-22"), ("1697-02-16 17:32:01", "1697-02-16"),
      ("2097-02-16 17:32:01", "2097-02-16"), ("1996-02-28 17:32:01", "1996-02-28"),
      ("1996-02-29 17:32:01", "1996-02-29"), ("1996-03-01 17:32:01", "1996-03-01")))
    // DRILL-1149: SELECT *, expr
    hrEmps.drop("pos").createOrReplaceTempView("hr_emps")
    Seq((10, "Sales"), (30, "Marketing"), (40, "HR")).toDF("deptno", "dname")
      .createOrReplaceTempView("hr_depts")
    val star = spark.sql("SELECT *, upper(name) FROM hr_emps").collect()
    assert(star.length == 4 && star.map(_.getString(5)).toSet
      == Set("BILL", "THEODORE", "SEBASTIAN", "ERIC"))
    // DRILL-1199: ORDER BY nested inside a filtered subquery (Tableau shape)
    assert(spark.sql(
      "SELECT * FROM (SELECT * FROM hr_emps ORDER BY empid) WHERE (0=1)")
      .count() == 0)
    // DRILL-1842: HAVING over an implicit global aggregate with a join
    assert(spark.sql(
      """SELECT count(DISTINCT salary) AS c FROM hr_emps
        |JOIN hr_depts ON hr_emps.deptno = hr_depts.deptno
        |HAVING count(1) > 0""".stripMargin).head().getLong(0) == 3L)
    // CALCITE-340: complex (but equi-reducible) join conditions, both
    // operand orders and the mixed form
    for (cond <- Seq(
      "e.deptno + 1 - 1 = d.deptno + 2 - 2 AND e.deptno + 10 - 10 = d.deptno + 20 - 20",
      "d.deptno + 2 - 2 = e.deptno + 1 - 1 AND d.deptno + 20 - 20 = e.deptno + 10 - 10",
      "d.deptno + 2 - 2 = e.deptno + 1 - 1 AND e.deptno + 10 - 10 = d.deptno + 20 - 20")) {
      val got = spark.sql(
        s"SELECT e.deptno, d.deptno FROM hr_emps e JOIN hr_depts d ON ($cond)")
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(got.length == 3 && got.forall(_ == ((10, 10))), cond)
    }
  }

  test("misc.iq:707-824 — correlated count IN, HAVING EXISTS, dup aliases, DERBY GROUP BY shapes") {
    // HIVE-5873 / CALCITE-365: orderOnHand IN (correlated COUNT) — the
    // zero-supply part matches count 0, the one-supply part count 1
    val pnum = spark.sql(
      """WITH parts (PNum, OrderOnHand)
        |  AS (SELECT * FROM (VALUES (3, 6), (10, 1), (8, 0)) AS t(PNum, OrderOnHand)),
        |supply (PNum, Qty)
        |  AS (SELECT * FROM (VALUES (3, 4), (3, 2), (10, 1)) AS t(PNum, Qty))
        |SELECT pnum FROM parts p
        |WHERE orderOnHand IN (SELECT count(*) FROM supply s WHERE s.pnum = p.pnum)"""
        .stripMargin).collect().map(_.getInt(0)).toSet
    assert(pnum == Set(8, 10))
    // HIVE-7362: HAVING EXISTS with correlation
    val he = spark.sql(
      """WITH src (key, value) AS (SELECT * FROM (VALUES (1, 'a'), (2, 'z')) AS t(key, value))
        |SELECT b.key, count(*) AS c FROM src b GROUP BY b.key
        |HAVING EXISTS (SELECT a.key FROM src a
        |               WHERE a.key = b.key AND a.value > 'val_9')""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(he.toSeq == Seq((2, 1L)))
    // CALCITE-411: duplicate output aliases are legal
    val dup = spark.sql("SELECT 1 AS a, 2 AS a FROM (VALUES (true))").head()
    assert((dup.getInt(0), dup.getInt(1)) == ((1, 2)))
    // days fixture for the DERBY shapes
    Seq((1, "Mon"), (2, "Tue"), (3, "Wed"), (4, "Thu"), (5, "Fri"),
      (6, "Sat"), (7, "Sun")).toDF("day", "week_day")
      .createOrReplaceTempView("g_days")
    // DERBY-5313: CASE in GROUP BY over a self-join
    val cse = spark.sql(
      """SELECT CASE WHEN t1.day = 1 THEN 1 ELSE 2 END AS e
        |FROM g_days t1 JOIN g_days t2 ON t1.day = t2.day
        |GROUP BY CASE WHEN t1.day = 1 THEN 1 ELSE 2 END""".stripMargin)
      .collect().map(_.getInt(0)).toSet
    assert(cse == Set(1, 2))
    // DERBY-4450: GROUP BY inside an IN-sub-query inside HAVING
    val havingIn = spark.sql(
      """SELECT sum(day) FROM g_days GROUP BY week_day
        |HAVING week_day IN (
        |  SELECT week_day FROM g_days GROUP BY week_day, day)""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(havingIn == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // DERBY-4701: aggregate of the grouped column in HAVING
    val hc = spark.sql(
      """SELECT max(day) AS m, count(T.week_day) AS c FROM g_days T
        |GROUP BY T.week_day HAVING count(T.week_day) = 1""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(hc == (1 to 7).map(d => (d, 1L)).toSet)
    // misc.iq:698-705: merged duplicate filter conditions
    assert(spark.sql(
      "SELECT * FROM (SELECT * FROM g_days WHERE day = 1) WHERE day = 1")
      .count() == 1)
    // CALCITE-393: no projected fields still scans correctly
    assert(spark.sql("SELECT 1 FROM g_days").count() == 7)
  }

  test("misc.iq:1116-1225 — CALCITE-613 implicit string coercion in comparisons") {
    scott.createOrReplaceTempView("g_scott")
    def n(where: String): Long =
      spark.sql(s"SELECT count(*) FROM g_scott WHERE $where").head().getLong(0)
    // date vs string literal, both operand orders, BETWEEN, concatenation
    assert(n("hiredate < '1981-01-02'") == 1L)
    assert(n("'1981-01-02' > hiredate") == 1L)
    assert(n("hiredate BETWEEN '1981-01-02' AND '1981-06-01'") == 4L)
    assert(n("hiredate > '1986-01-02'") == 2L)
    assert(n("'1986-' || '01-02' < hiredate") == 2L)
    // numeric vs string literal
    assert(n("sal < '1100'") == 2L)
    assert(n("empno IN ('7369', '7876')") == 2L)
    assert(n("empno BETWEEN '7500' AND '07600'") == 2L)
    assert(n("'7369' BETWEEN empno AND '7876'") == 1L)
  }

  test("misc.iq:1456-1600 — composite set ops, NULL intersection, string padding") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // composite UNION / MINUS on duplicated keys
    assert(spark.sql(
      """SELECT deptno, deptno FROM g_scott UNION
        |SELECT deptno, deptno FROM g_dept""".stripMargin).count() == 4)
    assert(spark.sql(
      """SELECT deptno, deptno FROM g_scott EXCEPT
        |SELECT deptno, deptno FROM g_dept WHERE deptno = 10""".stripMargin)
      .count() == 2)
    // EXISTS over a FROM-less one-row subquery
    assert(spark.sql(
      "SELECT count(*) AS c FROM g_dept WHERE EXISTS (SELECT 1)")
      .head().getLong(0) == 4L)
    // INTERSECT [DISTINCT] and the NULL-bearing intersection: NULLs ARE
    // equal under set-op grouping semantics
    assert(spark.sql(
      "SELECT deptno FROM g_scott INTERSECT SELECT deptno FROM g_dept").count() == 3)
    assert(spark.sql(
      "SELECT deptno FROM g_scott INTERSECT DISTINCT SELECT deptno FROM g_dept")
      .count() == 3)
    val nullInt = spark.sql(
      """SELECT comm FROM g_scott WHERE mgr = 7698 INTERSECT
        |SELECT comm FROM g_scott WHERE deptno = 10""".stripMargin).collect()
    assert(nullInt.length == 1 && nullInt.head.isNullAt(0))
    val compInt = spark.sql(
      """SELECT job, comm FROM g_scott WHERE mgr = 7698 INTERSECT
        |SELECT job, comm FROM g_scott WHERE deptno = 10""".stripMargin).collect()
    assert(compInt.length == 1 && compInt.head.getString(0) == "CLERK"
      && compInt.head.isNullAt(1))
    // IN must not pad-compare the shorter string ('MARTIN' ∉ 'MARTINGALE')
    val inStr = spark.sql(
      "SELECT ename FROM g_scott WHERE ename IN ('MARTINGALE', 'WARD')")
      .collect().map(_.getString(0)).toSet
    assert(inStr == Set("WARD"))
    // DRILL-4906: CASE with no ELSE
    assert(spark.sql(
      "SELECT (CASE WHEN (true) THEN 1 END) FROM (VALUES (1))")
      .head().getInt(0) == 1)
  }

  test("misc.iq:1980-2243 — NOT NOT IN, self-comparison, distinct over VALUES") {
    scott.createOrReplaceTempView("g_scott")
    // CALCITE-1592: NOT (x NOT IN list) — 'Fred' is not an ename
    assert(spark.sql(
      "SELECT * FROM g_scott WHERE NOT (ename NOT IN ('Fred'))").count() == 0)
    assert(spark.sql(
      "SELECT count(*) AS c FROM g_scott WHERE NOT (ename IN ('Fred'))")
      .head().getLong(0) == 14L)
    // CALCITE-1638: x > x simplifies to empty (never NULL-true)
    assert(spark.sql(
      "SELECT count(*) AS c FROM g_scott WHERE deptno > deptno")
      .head().getLong(0) == 0L)
    // CALCITE-1659/1664: string→timestamp casts keep the sub-second value
    // intact (no fraction bleeding into seconds); second-difference is 0
    val ts = spark.sql(
      """SELECT CAST('2016-02-26 19:06:00.123' AS TIMESTAMP) AS a,
        |  unix_timestamp(TIMESTAMP '2016-02-26 19:06:00.123456')
        |    - unix_timestamp(CAST('2016-02-26 19:06:00.123456' AS TIMESTAMP)) AS d"""
        .stripMargin).head()
    assert(ts.getTimestamp(0).toString.startsWith("2016-02-26 19:06:00"))
    assert(ts.getLong(1) == 0L)
    // CALCITE-1188: EXTRACT in WHERE ... IN over nullable timestamps
    val ex = spark.sql(
      """SELECT t FROM (VALUES (TIMESTAMP '1970-01-01 00:00:00'),
        |  (CAST(NULL AS TIMESTAMP)), (TIMESTAMP '2001-06-01 12:00:00')) AS v(t)
        |WHERE extract(YEAR FROM t) IN (1969, 1970)""".stripMargin).collect()
    assert(ex.length == 1 && ex.head.getTimestamp(0).toString.startsWith("1970-01-01"))
    // CALCITE-2002: DISTINCT over VALUES
    assert(spark.sql(
      """SELECT DISTINCT T.B
        |FROM (VALUES (1, 'X'), (2, 'Y'), (3, 'X'), (4, 'X')) AS T(A, B)"""
        .stripMargin).collect().map(_.getString(0)).toSet == Set("X", "Y"))
  }

  test("misc.iq:325-500 — the EXISTS family over the hr schema") {
    hrEmps.drop("pos").createOrReplaceTempView("hr_emps")
    Seq((10, "Sales"), (30, "Marketing"), (40, "HR")).toDF("deptno", "dname")
      .createOrReplaceTempView("hr_depts")
    // un-correlated EXISTS / NOT EXISTS, non-empty and empty inner
    assert(spark.sql(
      "SELECT deptno FROM hr_depts WHERE EXISTS (SELECT 1 FROM hr_emps)")
      .collect().map(_.getInt(0)).toSet == Set(10, 30, 40))
    assert(spark.sql(
      "SELECT deptno FROM hr_depts WHERE NOT EXISTS (SELECT 1 FROM hr_emps)")
      .count() == 0)
    assert(spark.sql(
      """SELECT deptno FROM hr_depts
        |WHERE EXISTS (SELECT 1 FROM hr_emps WHERE empid < 0)""".stripMargin)
      .count() == 0)
    assert(spark.sql(
      """SELECT deptno FROM hr_depts
        |WHERE NOT EXISTS (SELECT 1 FROM hr_emps WHERE empid < 0)""".stripMargin)
      .collect().map(_.getInt(0)).toSet == Set(10, 30, 40))
    // correlated EXISTS → the three deptno-10 employees
    assert(spark.sql(
      """SELECT name FROM hr_emps WHERE EXISTS (
        |  SELECT 1 FROM hr_depts WHERE hr_depts.deptno = hr_emps.deptno)"""
        .stripMargin).collect().map(_.getString(0)).toSet
      == Set("Bill", "Theodore", "Sebastian"))
    // correlated NOT EXISTS → Eric (deptno 20 has no dept row)
    assert(spark.sql(
      """SELECT name FROM hr_emps WHERE NOT EXISTS (
        |  SELECT 1 FROM hr_depts WHERE hr_depts.deptno = hr_emps.deptno)"""
        .stripMargin).collect().map(_.getString(0)).toSet == Set("Eric"))
    // NOT EXISTS .. OR NOT EXISTS (CALCITE-374 shape)
    assert(spark.sql(
      """SELECT name FROM hr_emps WHERE NOT EXISTS (
        |  SELECT 1 FROM hr_depts WHERE hr_depts.deptno = hr_emps.deptno)
        |OR NOT EXISTS (
        |  SELECT 1 FROM hr_depts WHERE hr_depts.deptno + 90 = hr_emps.empid)"""
        .stripMargin).collect().map(_.getString(0)).toSet
      == Set("Theodore", "Sebastian", "Eric"))
    // left join to a one-row aggregate keeps all left rows
    assert(spark.sql(
      """SELECT e.deptno FROM hr_emps e
        |LEFT JOIN (SELECT count(*) FROM hr_depts) ON true""".stripMargin)
      .collect().map(_.getInt(0)).toList.sorted == List(10, 10, 10, 20))
  }

  test("misc.iq:1033-1105 — DISTINCT ORDER BY expression; negation; UNION of counts; NULL compare") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    val d = spark.sql(
      """SELECT DISTINCT deptno, job FROM g_scott
        |ORDER BY substring(job, 2, 1), -deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getString(1))).toList
    assert(d == List(
      (30, "SALESMAN"), (30, "MANAGER"), (20, "MANAGER"), (10, "MANAGER"),
      (30, "CLERK"), (20, "CLERK"), (10, "CLERK"), (20, "ANALYST"),
      (10, "PRESIDENT")))
    // CALCITE-2180: negation of small integer types
    assert(spark.sql("SELECT -deptno AS d FROM g_dept")
      .collect().map(_.getInt(0)).toList.sorted == List(-40, -30, -20, -10))
    // CALCITE-2099: UNION over grouped counts
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott GROUP BY deptno
        |UNION
        |SELECT count(*) AS c FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(_.getLong(0)).toList.sorted == List(3L, 5L, 6L))
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott GROUP BY job
        |UNION ALL
        |SELECT count(*) AS c FROM g_dept GROUP BY deptno""".stripMargin)
      .collect().map(_.getLong(0)).toList.sorted
      == List(1L, 1L, 1L, 1L, 1L, 2L, 3L, 4L, 4L))
    // CALCITE-1864: comparison against a NULL literal selects nothing
    assert(spark.sql(
      "SELECT count(*) AS c FROM g_scott WHERE empno > CAST(NULL AS INT)")
      .head().getLong(0) == 0L)
  }

  test("sub-query.iq:266-327 — HAVING sub-queries; scalar sub-query with aggregates") {
    scott.createOrReplaceTempView("g_scott")
    // CALCITE-694: IN-list inside a HAVING aggregate
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott GROUP BY deptno
        |HAVING sum(CASE WHEN empno IN (7369, 7839, 7902) THEN sal ELSE 0 END)
        |  BETWEEN 5000.0 AND 10000.0""".stripMargin)
      .collect().map(_.getLong(0)).toList == List(3L))
    // CALCITE-716: scalar sub-query compared against an aggregate
    assert(spark.sql(
      """SELECT deptno FROM g_scott GROUP BY deptno
        |HAVING max(empno) > (SELECT min(empno) FROM g_scott)""".stripMargin)
      .collect().map(_.getInt(0)).toSet == Set(10, 20, 30))
    assert(spark.sql(
      """SELECT deptno, max(empno) > (SELECT min(empno) FROM g_scott) AS bbbb
        |FROM g_scott GROUP BY deptno""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getBoolean(1))).toSet
      == Set((10, true), (20, true), (30, true)))
  }

  test("sub-query.iq:373-422 — NOT IN with NULL keys (the Oracle-verified triple)") {
    scott.createOrReplaceTempView("g_scott")
    // a NULL in the NOT IN list poisons every row → 0
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott
        |WHERE sal + 100 NOT IN (SELECT comm FROM g_scott)""".stripMargin)
      .head().getLong(0) == 0L)
    // restricting to SALESMAN comms HAPPENS to keep a NULL-free list minus
    // the {MARTIN, comm 1400} hit → 13
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott
        |WHERE sal + 100 NOT IN (
        |  SELECT comm FROM g_scott WHERE job = 'SALESMAN')""".stripMargin)
      .head().getLong(0) == 13L)
    // comm < 1000 PROVABLY eliminates NULLs → all 14 rows survive
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott
        |WHERE sal + 100 NOT IN (
        |  SELECT comm FROM g_scott WHERE comm < 1000)""".stripMargin)
      .head().getLong(0) == 14L)
  }

  test("sub-query.iq:552-631 — two EXISTS, two scalar sub-queries, CALCITE-1494, DRILL-5644") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // CALCITE-1511: conjunction of two differently-correlated EXISTS
    assert(spark.sql(
      """SELECT deptno FROM g_dept d
        |WHERE EXISTS (SELECT 1 FROM g_scott WHERE empno > d.deptno)
        |AND EXISTS (SELECT 0 FROM g_scott
        |            WHERE deptno = d.deptno AND ename = 'SMITH')""".stripMargin)
      .collect().map(_.getInt(0)).toList == List(20))
    // two scalar sub-queries side by side
    val two = spark.sql(
      """SELECT deptno,
        |  (SELECT min(1) FROM g_scott WHERE empno > d.deptno) AS i0,
        |  (SELECT min(0) FROM g_scott
        |   WHERE deptno = d.deptno AND ename = 'SMITH') AS i1
        |FROM g_dept d""".stripMargin)
      .collect().map(r => (r.getInt(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(two == Set((10, Some(1), None), (20, Some(1), Some(0)),
      (30, Some(1), None), (40, Some(1), None)))
    // CALCITE-1494: correlated IN whose key never matches
    assert(spark.sql(
      """SELECT sal FROM g_scott emp WHERE empno IN (
        |  SELECT deptno FROM g_dept dept WHERE emp.job = dept.dname)"""
        .stripMargin).count() == 0)
    // DRILL-5644: IN-list over VALUES inside CASE — 10 ∉ {1} for every row
    val drill = spark.sql(
      """SELECT TJOIN1.RNUM, TJOIN1.C1,
        |  CASE WHEN 10 IN (SELECT C1 FROM (VALUES (1)) T(C1))
        |       THEN 'yes' ELSE 'no' END AS C3
        |FROM (VALUES (0, 10, 15), (1, 20, 25),
        |  (2, CAST(NULL AS INTEGER), 50)) TJOIN1 (RNUM, C1, C2)""".stripMargin)
      .collect().map(r => (r.getInt(0), Option(r.get(1)), r.getString(2))).toSet
    assert(drill == Set((0, Some(10), "no"), (1, Some(20), "no"),
      (2, None, "no")))
  }

  test("sub-query.iq:649-744 — CALCITE-2028 IN+EXISTS mixes; CALCITE-2071 IN with OR") {
    scott.createOrReplaceTempView("g_scott")
    // IN over the 1980-12-17 hire (SMITH → CLERK) AND a same-dept EXISTS
    assert(spark.sql(
      """SELECT empno FROM g_scott emp
        |WHERE job IN (SELECT job FROM g_scott ee
        |              WHERE ee.hiredate = DATE '1980-12-17')
        |AND EXISTS (SELECT * FROM g_scott e WHERE emp.deptno = e.deptno)"""
        .stripMargin).collect().map(_.getInt(0)).toSet
      == Set(7369, 7876, 7900, 7934))
    // OR variant widens to deptno = e.deptno + 20 matches
    assert(spark.sql(
      """SELECT empno FROM g_scott emp
        |WHERE job IN (SELECT job FROM g_scott ee
        |              WHERE ee.hiredate = DATE '1980-12-17')
        |OR EXISTS (SELECT * FROM g_scott e WHERE emp.deptno = e.deptno + 20)"""
        .stripMargin).collect().map(_.getInt(0)).toSet
      == Set(7369, 7876, 7900, 7934, 7499, 7521, 7654, 7698, 7844))
    // CALCITE-2071: (IN-subquery OR IN-list) AND IN-list
    assert(spark.sql(
      """SELECT empno FROM g_scott
        |WHERE (empno IN (SELECT empno FROM g_scott)
        |    OR empno IN (1,2,3,4,5,6,7,8,9,10,11,12,13,14,
        |                 15,16,17,18,19,20,21,22,23,24,25))
        |AND empno IN (7876, 7698, 7900)""".stripMargin)
      .collect().map(_.getInt(0)).toSet == Set(7698, 7876, 7900))
  }

  test("sub-query.iq:766-1600 — CALCITE-2329 IN/NOT IN three-valued truth matrix") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // (expr, standard truth value, Spark's projected value). Spark plans
    // IN-subqueries as existence joins, which COLLAPSE the
    // no-match-with-NULLs UNKNOWN to FALSE in a projection (three cases
    // below). Filter behavior is indistinguishable — UNKNOWN and FALSE
    // both drop the row — so the reference's filter-form results hold for
    // every case (asserted after each projection).
    val cases: Seq[(String, Option[Boolean], Option[Boolean])] = Seq(
      // null IN null / literal IN null / null IN literal / null IN required
      ("CAST(NULL AS INT) IN (SELECT CAST(NULL AS INT) FROM g_dept)", None, None),
      ("123 IN (SELECT CAST(NULL AS INT) FROM g_dept)", None, Some(false)),
      ("CAST(NULL AS INT) IN (SELECT 1 FROM g_dept)", None, None),
      ("CAST(NULL AS INT) IN (SELECT deptno FROM g_dept)", None, None),
      ("CAST(NULL AS INT) IN (SELECT mgr FROM g_scott)", None, None),
      // literal IN required: plain two-valued membership
      ("10 IN (SELECT deptno FROM g_dept)", Some(true), Some(true)),
      ("123 IN (SELECT deptno FROM g_dept)", Some(false), Some(false)),
      // literal IN nullable: TRUE on a match; a miss with NULLs present is
      // standard-UNKNOWN, Spark-FALSE
      ("7902 IN (SELECT mgr FROM g_scott)", Some(true), Some(true)),
      ("123 IN (SELECT mgr FROM g_scott)", None, Some(false)),
      // NOT IN mirrors through 3VL negation (null-aware anti join)
      ("CAST(NULL AS INT) NOT IN (SELECT CAST(NULL AS INT) FROM g_dept)", None, None),
      ("123 NOT IN (SELECT CAST(NULL AS INT) FROM g_dept)", None, Some(false)),
      ("10 NOT IN (SELECT deptno FROM g_dept)", Some(false), Some(false)),
      ("123 NOT IN (SELECT deptno FROM g_dept)", Some(true), Some(true)),
      ("7902 NOT IN (SELECT mgr FROM g_scott)", Some(false), Some(false)),
      ("123 NOT IN (SELECT mgr FROM g_scott)", None, Some(false)),
      // empty RHS: IN is FALSE and NOT IN TRUE even for a NULL lhs
      ("123 IN (SELECT deptno FROM g_dept WHERE false)", Some(false), Some(false)),
      ("CAST(NULL AS INT) IN (SELECT deptno FROM g_dept WHERE false)", Some(false), Some(false)),
      ("123 NOT IN (SELECT deptno FROM g_dept WHERE false)", Some(true), Some(true)),
      ("CAST(NULL AS INT) NOT IN (SELECT deptno FROM g_dept WHERE false)", Some(true), Some(true)))
    cases.foreach { case (expr, standard, sparkWant) =>
      val got = Option(spark.sql(s"SELECT ($expr) AS v").head().get(0))
        .map(_.asInstanceOf[Boolean])
      assert(got == sparkWant, expr)
      // the filter form keeps rows only on TRUE — identical to the
      // reference for every case, collapsed or not
      val kept = spark.sql(s"SELECT 1 FROM g_dept WHERE $expr").count()
      assert(kept == (if (standard.contains(true)) 4 else 0), s"filter: $expr")
    }
  }

  test("sub-query.iq:1981-2130 — nested sub-queries; CALCITE-1513; correlated ANY") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // nested sub-query in PROJECT within FILTER
    assert(spark.sql(
      """SELECT empno FROM g_scott WHERE deptno IN (
        |  SELECT (SELECT max(deptno) FROM g_scott t1) FROM g_scott t2)"""
        .stripMargin).collect().map(_.getInt(0)).toSet
      == Set(7499, 7521, 7654, 7698, 7844, 7900))
    // nested sub-query in FILTER within PROJECT
    val nested = spark.sql(
      """SELECT (SELECT max(deptno) FROM g_scott
        |        WHERE deptno IN (SELECT deptno FROM g_scott)) FROM g_scott"""
        .stripMargin).collect().map(_.getInt(0))
    assert(nested.length == 14 && nested.forall(_ == 30))
    // CALCITE-1513: correlated NOT IN whose inner never matches
    assert(spark.sql(
      """SELECT count(*) AS c FROM g_scott e
        |WHERE sal + 100 NOT IN (
        |  SELECT deptno FROM g_dept WHERE dname = e.ename)""".stripMargin)
      .head().getLong(0) == 14L)
    // correlated ANY — Spark has no quantified-subquery comparison, so the
    // standard rewrite (x > ANY(S) ≡ EXISTS(s ∈ S: x > s)) carries the
    // golden; all 14 empnos exceed 2 where their dept exists
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE EXISTS (
        |  SELECT 1 FROM g_dept e2 WHERE e2.deptno = e.deptno AND e.empno > 2)"""
        .stripMargin).count() == 14)
    // empty inner relation → ANY is FALSE for every row
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE EXISTS (
        |  SELECT 1 FROM g_dept e2 WHERE e2.deptno = e.empno AND e.deptno > 2)"""
        .stripMargin).count() == 0)
  }

  test("some.iq:47-240 — quantified comparisons via the SubQueryRemoveRule expansions") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // Spark has no quantified sub-query comparison, so each golden runs
    // through the reference's own rewrite (SubQueryRemoveRule): ANY in a
    // filter is EXISTS of the comparison; ALL is NOT EXISTS of the
    // falsifier with NULL right-side values treated as potential
    // falsifiers (UNKNOWN filters like FALSE).
    // empno > ANY (non-null deptnos) — every empno beats min(deptno)
    assert(spark.sql(
      """SELECT empno FROM g_scott
        |WHERE empno > (SELECT min(deptno) FROM g_dept)""".stripMargin)
      .count() == 14)
    // sal > ANY (nullable comms) — min non-null comm is 0, all qualify
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE EXISTS (
        |  SELECT 1 FROM g_scott s WHERE e.sal > s.comm)""".stripMargin)
      .count() == 14)
    // sal > ALL (nullable comms) — NULL comms block the proof: 0 rows
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE NOT EXISTS (
        |  SELECT 1 FROM g_scott s
        |  WHERE e.sal <= s.comm OR s.comm IS NULL)""".stripMargin)
      .count() == 0)
    // comm < ALL (empty sub-query) — trivially TRUE, even for NULL comm
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE NOT EXISTS (
        |  SELECT 1 FROM g_scott s WHERE 1 = 0
        |  AND (e.comm >= s.comm OR s.comm IS NULL))""".stripMargin)
      .count() == 14)
    // comm < SOME (empty sub-query) — trivially FALSE
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE EXISTS (
        |  SELECT 1 FROM g_scott s WHERE 1 = 0 AND e.comm < s.comm)"""
        .stripMargin).count() == 0)
    // sal > ALL (comm <> null) — `comm <> NULL` is UNKNOWN for every row,
    // the inner is empty, ALL holds trivially: all 14 rows
    assert(spark.sql(
      """SELECT empno FROM g_scott e WHERE NOT EXISTS (
        |  SELECT 1 FROM g_scott s WHERE s.comm <> NULL
        |  AND (e.sal <= s.comm OR s.comm IS NULL))""".stripMargin)
      .count() == 14)
  }

  test("outer.iq:275-367 — CALCITE-554 outer joins over NULL keys") {
    // NULL keys never join but left rows always survive
    val keyed = spark.sql(
      """WITH t1(x) AS (SELECT * FROM (VALUES 1, 2, CAST(NULL AS INTEGER))),
        |  t2(x) AS (SELECT * FROM (VALUES 1, CAST(NULL AS INTEGER)))
        |SELECT t1.x, t2.x FROM t1 LEFT JOIN t2 ON t1.x = t2.x""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(keyed == Set((Some(1), Some(1)), (Some(2), None), (None, None)))
    // two columns each side, left and full
    val left2 = spark.sql(
      """WITH t1(x, y) AS (SELECT * FROM (VALUES (1, 10), (2, 20),
        |    (CAST(NULL AS INTEGER), 30)) AS t),
        |  t2(x, y) AS (SELECT * FROM (VALUES (1, 100),
        |    (CAST(NULL AS INTEGER), 200)) AS t)
        |SELECT * FROM t1 LEFT JOIN t2 ON t1.x = t2.x""".stripMargin)
      .collect().map(r => (Option(r.get(0)), r.getInt(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(left2 == Set(
      (Some(1), 10, Some(1), Some(100)), (Some(2), 20, None, None),
      (None, 30, None, None)))
    val full2 = spark.sql(
      """WITH t1(x, y) AS (SELECT * FROM (VALUES (1, 10), (2, 20),
        |    (CAST(NULL AS INTEGER), 30)) AS t),
        |  t2(x, y) AS (SELECT * FROM (VALUES (1, 100),
        |    (CAST(NULL AS INTEGER), 200)) AS t)
        |SELECT * FROM t1 FULL JOIN t2 ON t1.x = t2.x""".stripMargin)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(full2 == Set(
      (Some(1), Some(10), Some(1), Some(100)), (Some(2), Some(20), None, None),
      (None, Some(30), None, None), (None, None, None, Some(200))))
    // right join whose condition references only the left side: nothing
    // qualifies (sal < 100 never holds), every dept row null-extends
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    val oneSided = spark.sql(
      """SELECT ename, dname FROM g_scott RIGHT JOIN g_dept ON sal < 100""")
      .collect().map(r => (Option(r.get(0)), r.getString(1))).toSet
    assert(oneSided == Set((None, "ACCOUNTING"), (None, "RESEARCH"),
      (None, "SALES"), (None, "OPERATIONS")))
  }

  test("scalar.iq:113-216 — scalar sub-queries with empty grouping, LIMIT 0, ORDER BY LIMIT 1") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // grouped-but-empty scalar sub-query is NULL per dept row
    val emptyGrouped = spark.sql(
      """SELECT deptno, (SELECT sum(empno) FROM g_scott
        |  WHERE 1 = 0 GROUP BY GROUPING SETS (())) AS x FROM g_dept"""
        .stripMargin).collect().map(r => (r.getInt(0), Option(r.get(1)))).toSet
    assert(emptyGrouped == Set((10, None), (20, None), (30, None), (40, None)))
    // LIMIT 0 scalar sub-query is NULL
    val limit0 = spark.sql(
      """SELECT deptno, (SELECT deptno FROM g_scott
        |  WHERE deptno = g_dept.deptno LIMIT 0) AS x FROM g_dept"""
        .stripMargin).collect().map(r => (r.getInt(0), Option(r.get(1)))).toSet
    assert(limit0 == Set((10, None), (20, None), (30, None), (40, None)))
    // ORDER BY + LIMIT 1 pins the scalar value
    val top1 = spark.sql(
      """SELECT deptno, (SELECT empno FROM g_scott
        |  ORDER BY empno LIMIT 1) AS x FROM g_dept""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(top1 == Set((10, 7369), (20, 7369), (30, 7369), (40, 7369)))
  }

  test("winagg.iq:560-660 — windowed COVAR_SAMP / VAR_POP / VAR_SAMP / REGR_SXX decompositions") {
    import org.apache.spark.sql.expressions.Window
    val ea = Seq(
      (Some(25), 10, None: Option[String]), (Some(80), 20, Some("M")),
      (None: Option[Int], 40, Some("M")), (Some(5), 20, Some("F")),
      (None: Option[Int], 40, Some("F")))
      .toDF("age", "deptno", "gender")
    // the reference evaluates the SAMP/POP formulas over INT args with
    // integer division at every step (winagg.iq:569-571, 589-591)
    def decomp(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
        w: org.apache.spark.sql.expressions.WindowSpec, samp: Boolean) = {
      val bothX = sum(when(y.isNotNull, x)).over(w)
      val bothY = sum(when(x.isNotNull, y)).over(w)
      val rc = count(when(x.isNotNull && y.isNotNull, 1)).over(w)
      // zero pair counts / SAMP over one pair are NULL, not errors
      def nz(c: org.apache.spark.sql.Column) =
        when(c === 0, lit(null)).otherwise(c)
      val denom = nz(if (samp) rc - 1 else rc)
      floor((sum(x * y).over(w) - floor(bothX * bothY / nz(rc))) / denom)
        .cast("long")
    }
    val wAll = Window.partitionBy()
    // var_samp(age) = 1508, covar_samp(deptno, age) = 58 — uniform rows
    val sampAll = ea.select(
      decomp(col("age"), col("age"), wAll, samp = true).as("vs"),
      decomp(col("deptno"), col("age"), wAll, samp = true).as("cs"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sampAll.length == 5 && sampAll.forall(_ == ((1508L, 58L))))
    // var_pop(age) = 1005 globally; 0 per single-age partition
    val popAll = ea.select(
      decomp(col("age"), col("age"), wAll, samp = false).as("vp"),
      decomp(col("age"), col("age"), Window.partitionBy(col("age")),
        samp = false).as("vpByAge"),
      col("age"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    assert(popAll.forall(_._1 == 1005L))
    assert(popAll.filter(_._3.nonEmpty).forall(_._2.contains(0L)))
    // var_samp by gender: every gender has at most one non-null age → NULL
    val vsByG = ea.select(
      decomp(col("age"), col("age"), Window.partitionBy(col("gender")),
        samp = true).as("v"))
      .collect().map(r => Option(r.get(0)))
    assert(vsByG.forall(_.isEmpty))
    // REGR_SXX(x, y) = RC * VAR_POP(y over the non-null pairs); SYY mirrors
    def regrS(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
        w: org.apache.spark.sql.expressions.WindowSpec) = {
      val rc = count(when(x.isNotNull && y.isNotNull, 1)).over(w)
      val rcSafe = when(rc === 0, lit(null)).otherwise(rc)
      val pairY = when(x.isNotNull, y)
      val vp = floor((sum(pairY * pairY).over(w)
        - floor(sum(pairY).over(w) * sum(pairY).over(w) / rcSafe)) / rcSafe)
      (rc * vp).cast("long")
    }
    val sxx = ea.select(
      regrS(col("age"), col("deptno"), wAll).as("sxx"),
      regrS(col("deptno"), col("age"), wAll).as("syy"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sxx.forall(_ == ((66L, 3015L))), sxx.toSeq.toString)
    // partitioned by gender: one pair per partition → 0
    val sxxByG = ea.select(
      regrS(col("age"), col("deptno"),
        Window.partitionBy(col("gender"))).as("sxx"))
      .collect().map(_.getLong(0))
    assert(sxxByG.forall(_ == 0L))
  }

  test("sub-query.iq:1617-1900 — correlated filter IN/NOT IN matrix") {
    scott.createOrReplaceTempView("g_scott")
    scottDept.createOrReplaceTempView("g_dept")
    // (lhs, inner select, op) → surviving row count; the correlated inner
    // restricts to the OUTER row's dept. NULL lhs or NULL-bearing inner
    // never yields TRUE; literal membership decides the rest.
    val cases: Seq[(String, String, String, Long)] = Seq(
      ("CAST(NULL AS INT)", "CAST(NULL AS INT)", "IN", 0L),
      ("123", "CAST(NULL AS INT)", "IN", 0L),
      ("CAST(NULL AS INT)", "1", "IN", 0L),
      ("CAST(NULL AS INT)", "deptno", "IN", 0L),
      ("CAST(NULL AS INT)", "CASE WHEN true THEN deptno ELSE NULL END", "IN", 0L),
      ("10", "deptno", "IN", 3L),
      ("10", "CASE WHEN true THEN deptno ELSE NULL END", "IN", 3L),
      ("CAST(NULL AS INT)", "CAST(NULL AS INT)", "NOT IN", 0L),
      ("123", "CAST(NULL AS INT)", "NOT IN", 0L),
      ("CAST(NULL AS INT)", "1", "NOT IN", 0L),
      ("CAST(NULL AS INT)", "deptno", "NOT IN", 0L),
      ("CAST(NULL AS INT)", "CASE WHEN true THEN deptno ELSE NULL END", "NOT IN", 0L),
      // NOT IN with a correlated EMPTY inner (dept 20's emp rows have no
      // matching d row only when... all depts exist, so the inner is
      // one-row everywhere): non-members survive
      ("10", "deptno", "NOT IN", 11L),
      ("10", "CASE WHEN true THEN deptno ELSE NULL END", "NOT IN", 11L))
    cases.foreach { case (lhs, inner, op, want) =>
      val got = spark.sql(
        s"""SELECT sal FROM g_scott e WHERE $lhs $op (
           |  SELECT $inner FROM g_dept d WHERE e.deptno = d.deptno)""".stripMargin)
        .count()
      assert(got == want, s"$lhs $op ($inner)")
    }
  }

  test("agg.iq:880-930 — rwijk composite ROLLUP(deptno, job, (empno, ename))") {
    scott.createOrReplaceTempView("g_scott")
    val got = spark.sql(
      """SELECT deptno, job, empno, ename, sum(sal) AS sumsal,
        |  CASE CAST(grouping(deptno) AS INT) * 4
        |     + CAST(grouping(job) AS INT) * 2
        |     + CAST(grouping(empno) AS INT)
        |    WHEN 0 THEN 'grouped by deptno,job,empno,ename'
        |    WHEN 1 THEN 'grouped by deptno,job'
        |    WHEN 3 THEN 'grouped by deptno'
        |    WHEN 7 THEN 'grouped by ()'
        |  END AS gr_text
        |FROM g_scott
        |GROUP BY ROLLUP(deptno, job, (empno, ename))
        |ORDER BY deptno, job, empno""".stripMargin)
      .collect().toList.map(_.toSeq.toList)
    assert(got.size == 27)
    val byText = got.groupBy(_.last)
    assert(byText("grouped by deptno,job,empno,ename").size == 14)
    assert(byText("grouped by deptno,job").size == 9)
    assert(byText("grouped by deptno").size == 3)
    assert(byText("grouped by ()").size == 1)
    // the golden's pinned subtotal sums
    def sumOf(text: String, dept: Any, job: Any): Double =
      got.find(r => r.last == text && r.head == dept && r(1) == job)
        .get(4).asInstanceOf[Double]
    assert(sumOf("grouped by deptno", 10, null) == 8750.0)
    assert(sumOf("grouped by deptno", 20, null) == 10875.0)
    assert(sumOf("grouped by deptno", 30, null) == 9400.0)
    assert(sumOf("grouped by ()", null, null) == 29025.0)
    assert(sumOf("grouped by deptno,job", 20, "ANALYST") == 6000.0)
    assert(sumOf("grouped by deptno,job", 30, "SALESMAN") == 5600.0)
  }
}
