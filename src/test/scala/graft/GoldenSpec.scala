package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DataFrame-API twins of the reference's quidem goldens. The exhaustive
  * SQL-path ports live in the `graft.iq` census suites (18/18 .iq files,
  * every `!ok` block asserted against the committed golden or skipped for
  * a pinned reason — *IqSpec.scala); the ranged spark.sql duplicates this
  * file used to carry were retired once those censuses landed (r12).
  * What remains here, deliberately:
  *
  *  - tests that drive the SAME golden semantics through the
  *    Dataset/Column API (`groupBy`/`agg`/`Window`/`rollup`/`cube`/typed
  *    joins, the Geo and MatchRecognize operator APIs) — the §3
  *    "RelBuilder-style DSL" entry point, which the SQL censuses cannot
  *    exercise;
  *  - tests covering blocks the censuses SKIP for documented reasons
  *    (agg.iq:1341 wrong-golden CUBE count, agg.iq:2124/2138
  *    CURRENT_USER session pins, winagg.iq:447 nondeterministic LIMIT) —
  *    asserted here with deterministic reformulations.
  *
  * Fixtures: the POST schema (reference: core/src/test/java/org/apache/
  * calcite/test/CalciteAssert.java:812-855 — EMP 9 / DEPT 4 / EMPS 5),
  * scott, and the hr schema, as typed Datasets.
  *
  * Adaptations (semantics pinned by the goldens): Calcite's composite
  * COUNT(a, b) (count rows where NO arg is null) is expressed with an
  * explicit CASE; Calcite's integer-typed STDDEV over INT input
  * truncates — expressed as CAST(stddev AS INT).
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
