package graft

import org.apache.spark.sql.SparkSession
import graft.plans.MaterializedViews
import org.scalatest.funsuite.AnyFunSuite

/** The reference's HR-FKUK schema fixture (reference:
  * core/src/test/java/org/apache/calcite/test/MaterializationTest.java:2867
  * HrFKUKSchema — emps/depts/dependents/locations/events VALUES verbatim),
  * plus the scott `emp` and foodmart minis a handful of tests use, written
  * as parquet so tile-vs-base plan assertions can key on scan paths. */
object MvParityFixture {
  val base = "/tmp/graft_mvp/base"
  private val tables = Seq(
    "emps" ->
      """SELECT * FROM VALUES
        |  (100, 10, 'Bill',      CAST(10000 AS DOUBLE), 1000),
        |  (200, 20, 'Eric',      CAST(8000  AS DOUBLE),  500),
        |  (150, 10, 'Sebastian', CAST(7000  AS DOUBLE), CAST(NULL AS INT)),
        |  (110, 10, 'Theodore',  CAST(10000 AS DOUBLE),  250)
        |AS t(empid, deptno, name, salary, commission)""".stripMargin,
    "depts" ->
      """SELECT * FROM VALUES (10, 'Sales'), (30, 'Marketing'), (20, 'HR')
        |AS t(deptno, name)""".stripMargin,
    "dependents" ->
      """SELECT * FROM VALUES (10, 'Michael'), (10, 'Jane')
        |AS t(empid, name)""".stripMargin,
    "locations" ->
      """SELECT * FROM VALUES (10, 'San Francisco'), (20, 'San Diego')
        |AS t(empid, name)""".stripMargin,
    "events" ->
      """SELECT * FROM VALUES
        |  (100, TIMESTAMP'1970-01-01 00:00:00'),
        |  (200, TIMESTAMP'1970-01-01 00:00:00'),
        |  (150, TIMESTAMP'1970-01-01 00:00:00'),
        |  (110, CAST(NULL AS TIMESTAMP))
        |AS t(eventid, ts)""".stripMargin,
    // scott EMP (empno/deptno slice testScan reads)
    "emp" ->
      """SELECT * FROM VALUES
        |  (7369, 'SMITH', 20), (7499, 'ALLEN', 30), (7521, 'WARD', 30),
        |  (7566, 'JONES', 20), (7654, 'MARTIN', 30), (7698, 'BLAKE', 30),
        |  (7782, 'CLARK', 10), (7788, 'SCOTT', 20), (7839, 'KING', 10),
        |  (7844, 'TURNER', 30), (7876, 'ADAMS', 20), (7900, 'JAMES', 30),
        |  (7902, 'FORD', 20), (7934, 'MILLER', 10)
        |AS t(empno, ename, deptno)""".stripMargin,
    // foodmart minis (testSwapJoin / testQueryOnStar)
    "sales_fact_1997" ->
      """SELECT * FROM VALUES
        |  (1, 1, CAST(2.0 AS DOUBLE)), (2, 2, CAST(1.0 AS DOUBLE)),
        |  (3, 2, CAST(3.0 AS DOUBLE)), (1, 3, CAST(1.0 AS DOUBLE)),
        |  (2, 1, CAST(4.0 AS DOUBLE))
        |AS t(product_id, time_id, unit_sales)""".stripMargin,
    "time_by_day" ->
      """SELECT * FROM VALUES
        |  (1, 1997, 'January', 1), (2, 1997, 'October', 10), (3, 1998, 'March', 3)
        |AS t(time_id, the_year, the_month, month_of_year)""".stripMargin,
    "product" ->
      """SELECT * FROM VALUES
        |  (1, 10, 'Alpha'), (2, 10, 'Beta'), (3, 20, 'Gamma')
        |AS t(product_id, product_class_id, product_name)""".stripMargin,
    "product_class" ->
      """SELECT * FROM VALUES (10, 'Food', 'Snacks'), (20, 'Drink', 'Soda')
        |AS t(product_class_id, product_department, product_category)""".stripMargin)

  @volatile private var written = false
  def ensure(spark: SparkSession): Unit = synchronized {
    if (!written) {
      tables.foreach { case (n, sql) =>
        spark.sql(sql).write.mode("overwrite").parquet(s"$base/$n")
      }
      written = true
    }
    // (re-)register views every time: other suites use some of these names
    tables.foreach { case (n, _) =>
      spark.read.parquet(s"$base/$n").createOrReplaceTempView(n)
    }
    // the schema's one referential constraint (MaterializationTest.java:2901
    // rcs0: emps column 1 → depts column 0, i.e. deptno → deptno); declared
    // before any MV registration so reduced normal forms see it
    MaterializedViews.declareForeignKey(spark,
      s"$base/emps", Seq("deptno"), s"$base/depts", Seq("deptno"))
  }
}

/** Census port of the reference MV-unifier corpus —
  * core/src/test/java/org/apache/calcite/test/MaterializationTest.java
  * (167 @Test methods, names pinned against the file at test time).
  *
  * Every reference test is either PORTED (run end-to-end: `Mat` asserts
  * the query plan scans the tile and not the base parquet with results
  * identical to the MV-less run; `NoMat` asserts no tile scan) or
  * REJECTED with a one-line reason (FK-UK metadata, grouping-sets Expand
  * lowering, range-union compensation, Calcite model-file machinery, …).
  * ported + rejected = 167, enforced by the census test.
  *
  * SQL transcription: the reference's quoted identifiers unquoted;
  * `floor(ts to unit)` → `date_trunc('UNIT', ts)`; everything else
  * verbatim. `divergent` marks cases whose reference outcome differs from
  * ours with the reason inline (ours being a superset capability is
  * allowed, e.g. exact-matching a join-of-union the reference's star-table
  * converter cannot absorb).
  */
class MaterializationParitySpec extends AnyFunSuite {
  import SparkTestSession._

  sealed trait Expect
  /** Reference checkMaterialize → our rewriter must answer from the tile.
    * `partial`: the reference itself leaves part of the query on the base
    * tables (one union branch, an outer scan), so only tile-presence is
    * asserted. */
  case class Mat(partial: Boolean = false) extends Expect
  /** Reference checkNoMaterialize → our rewriter must NOT rewrite. */
  case object NoMat extends Expect
  /** Not portable — reason recorded, counted in the census. */
  case class Reject(reason: String) extends Expect

  case class MCase(name: String, expect: Expect,
      mvs: Seq[(String, String)] = Seq.empty, query: String = "",
      note: String = "")

  private def m(name: String, mv: String, query: String,
      partial: Boolean = false, note: String = ""): MCase =
    MCase(name, Mat(partial), Seq("m0" -> mv), query, note)
  private def n(name: String, mv: String, query: String): MCase =
    MCase(name, NoMat, Seq("m0" -> mv), query)
  private def r(name: String, reason: String): MCase =
    MCase(name, Reject(reason))

  // ---------------------------------------------------------------- cases
  private val scanAndFilter = Seq(
    m("testScan",
      "select empno, deptno from emp order by deptno",
      "select empno, deptno from emp"),
    m("testFilter",
      "select * from emps where deptno = 10",
      "select empid + 1 from emps where deptno = 10"),
    m("testFilterToProject0",
      "select *, empid * 2 from (select * from emps where empid > 300 union all select * from emps where empid < 200)",
      "select * from (select * from emps where empid > 300 union all select * from emps where empid < 200) where (empid * 2) > 3"),
    n("testFilterToProject1",
      "select c, s, s from (select deptno, count(*) as c, sum(salary) as s from emps group by deptno)",
      "select * from (select deptno, count(*) as c, sum(salary) as s from emps group by deptno) where (s * 0.8) > 10000"),
    m("testFilterQueryOnProjectView",
      "select deptno, empid from emps",
      "select empid + 1 as x from emps where deptno = 10"),
    m("testFilterQueryOnProjectView0",
      "select deptno, empid from emps",
      "select empid + 1 as x from emps where deptno = 10"),
    m("testFilterQueryOnProjectView1",
      "select deptno, empid, name from emps",
      "select empid + 1 as x from emps where deptno = 10"),
    m("testFilterQueryOnProjectView2",
      "select deptno, empid, name from emps",
      "select empid + 1 as x, name from emps where deptno = 10"),
    m("testFilterQueryOnProjectView3",
      "select deptno - 10 as x, empid + 1, name from emps",
      "select name from emps where deptno - 10 = 0"),
    n("testFilterQueryOnProjectView4",
      "select deptno - 10 as x, empid + 1, name from emps",
      "select name from emps where deptno + 10 = 20"),
    m("testFilterQueryOnProjectView5",
      "select deptno - 10 as x, empid + 1 as ee, name from emps",
      "select name, empid + 1 as e from emps where deptno - 10 = 2"),
    n("testFilterQueryOnProjectView6",
      "select deptno - 10 as x, empid from emps",
      "select name from emps where deptno - 10 = 0"),
    n("testFilterQueryOnProjectView7",
      "select deptno - 10 as x, empid + 1, name from emps",
      "select name, empid + 2 from emps where deptno - 10 = 0"),
    m("testFilterQueryOnProjectView8",
      "select salary, commission, deptno, empid, name from emps",
      "select * from (select * from emps where name is null) where commission is null",
      note = "reference routes the query through a model-file view V; inlined here"))

  private val filterViews = Seq(
    m("testFilterQueryOnFilterView",
      "select deptno, empid, name from emps where deptno = 10",
      "select empid + 1 as x, name from emps where deptno = 10"),
    m("testFilterQueryOnFilterView2",
      "select deptno, empid, name from emps where deptno = 10",
      "select empid + 1 as x, name from emps where deptno = 10 and empid < 150"),
    m("testFilterQueryOnFilterView3",
      "select deptno, empid, name from emps where deptno = 10 or deptno = 20 or empid < 160",
      "select empid + 1 as x, name from emps where deptno = 10"),
    m("testFilterQueryOnFilterView4",
      "select * from emps where deptno > 10",
      "select name from emps where deptno > 30"),
    m("testFilterQueryOnFilterView5",
      "select name, deptno from emps where deptno > 10",
      "select name from emps where deptno > 30"),
    m("testFilterQueryOnFilterView6",
      "select name, deptno, salary from emps where salary > 2000.5",
      "select name from emps where deptno > 30 and salary > 3000"),
    m("testFilterQueryOnFilterView7",
      "select * from emps where ((salary < 1111.9 and deptno > 10) or (empid > 400 and salary > 5000) or salary > 500)",
      "select name from emps where (salary > 1000 or (deptno >= 30 and salary <= 500))"),
    n("testFilterQueryOnFilterView8",
      "select name, deptno from emps where deptno > 10",
      "select name, empid from emps where deptno > 30"),
    n("testFilterQueryOnFilterView9",
      "select name, deptno from emps where deptno > 10",
      "select name, empid from emps where deptno > 30 or empid > 10"),
    n("testFilterQueryOnFilterView10",
      "select name, deptno from emps where deptno > 10 and name = 'calcite'",
      "select name, empid from emps where deptno > 30 or empid > 10"),
    n("testFilterQueryOnFilterView11",
      "select name, deptno from emps where (salary < 1111.9 and deptno > 10) or (empid > 400 and salary > 5000)",
      "select name from emps where deptno > 30 and salary > 3000"),
    n("testFilterQueryOnFilterView12",
      "select name, deptno from emps where salary > 2000.5",
      "select name from emps where deptno > 30 and salary > 3000"),
    n("testFilterQueryOnFilterView13",
      "select * from emps where (salary < 1111.9 and deptno > 10) or (empid > 400 and salary > 5000)",
      "select name from emps where salary > 1000 or (deptno > 30 and salary > 3000)"),
    m("testFilterQueryOnFilterView14",
      "select deptno, empid, name, salary, commission from emps as em where ((salary < 1111.9 and deptno > 10) or (empid > 400 and salary > 5000) or salary > 500)",
      "select * from emps where (salary > 1000 or (deptno >= 30 and salary <= 500))"),
    m("testAlias",
      "select * from emps as em where (em.salary < 1111.9 and em.deptno > 10) or (em.empid > 400 and em.salary > 5000)",
      "select name as n from emps as e where (e.empid > 500 and e.salary > 6000)"))

  private val aggregates = Seq(
    m("testAggregate0",
      "select count(*) as c from emps group by empid",
      "select count(*) + 1 as c from emps group by empid"),
    m("testAggregate1",
      "select count(*) as c0 from emps group by empid",
      "select count(*) as c1 from emps group by empid"),
    m("testAggregate2",
      "select deptno, count(*) as c, sum(empid) as s from emps group by deptno",
      "select count(*) + 1 as c, deptno from emps group by deptno"),
    m("testAggregate3",
      "select deptno, sum(salary), sum(commission), sum(k) from (select deptno, salary, commission, 100 as k from (select empid, deptno, name, salary, commission from emps group by empid, deptno, name, salary, commission)) group by deptno",
      "select deptno, sum(salary), sum(k) from (select deptno, salary, 100 as k from (select empid, deptno, name, salary, commission from emps group by empid, deptno, name, salary, commission)) group by deptno"),
    m("testAggregate4",
      "select deptno, commission, sum(salary) from emps group by deptno, commission",
      "select deptno, sum(salary) from emps where commission = 100 group by deptno"),
    m("testAggregate5",
      "select deptno + commission, commission, sum(salary) from emps group by deptno + commission, commission",
      "select commission, sum(salary) from emps where commission * (deptno + commission) = 100 group by commission"),
    n("testAggregate6",
      "select * from (select deptno, sum(salary) as sum_salary, sum(commission) from emps group by deptno) where sum_salary > 10",
      "select * from (select deptno, sum(salary) as sum_salary from emps where salary > 1000 group by deptno) where sum_salary > 10"),
    m("testCompensatingCalcWithAggregate0",
      "select * from (select deptno, sum(salary) as sum_salary, sum(commission) from emps group by deptno) where sum_salary > 10",
      "select * from (select deptno, sum(salary) as sum_salary from emps group by deptno) where sum_salary > 10"),
    m("testCompensatingCalcWithAggregate1",
      "select * from (select deptno, sum(salary) as sum_salary, sum(commission) from emps group by deptno) where sum_salary > 10",
      "select * from (select deptno, sum(salary) as sum_salary from emps where deptno >= 20 group by deptno) where sum_salary > 10",
      note = "filtered-aggregate tile (r14): the under-aggregate deptno >= 20 selects whole groups, the shared top filter matches — tile rows filtered by both"),
    m("testCompensatingCalcWithAggregate2",
      "select * from (select deptno, sum(salary) as sum_salary, sum(commission) from emps where deptno >= 10 group by deptno) where sum_salary > 10",
      "select * from (select deptno, sum(salary) as sum_salary from emps where deptno >= 20 group by deptno) where sum_salary > 20",
      note = "as CompensatingCalcWithAggregate1 plus top-filter strengthening: sum_salary > 20 implies the tile's > 10 (r14)"),
    m("testAggregateGroupSets1",
      "select empid, deptno, count(*) as c, sum(salary) as s from emps group by cube(empid, deptno)",
      "select count(*) + 1 as c, deptno from emps group by cube(empid, deptno)",
      note = "same-level grouping-sets tile (r14): each tile row is one (set, group) of the query — pure projection"),
    n("testAggregateGroupSets2",
      "select empid, deptno, count(*) as c, sum(salary) as s from emps group by cube(empid, deptno)",
      "select count(*) + 1 as c, deptno from emps group by rollup(empid, deptno)"),
    m("testAggregateRollUp",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by deptno"),
    m("testAggregateGroupSetsRollUp",
      "select empid, deptno, count(*) as c, sum(salary) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by cube(empid, deptno)"),
    m("testAggregateGroupSetsRollUp2",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by cube(empid, deptno)"),
    m("testAggregateProject",
      "select deptno, count(*) as c, empid + 2, sum(empid) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by deptno"),
    m("testAggregateOnProject1",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by deptno, empid"),
    m("testAggregateOnProject2",
      "select empid, deptno, count(*) as c, sum(salary) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by cube(deptno, empid)"),
    m("testAggregateOnProject3",
      "select empid, deptno, count(*) as c, sum(salary) as s from emps group by empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by rollup(deptno, empid)"),
    m("testAggregateOnProject4",
      "select salary, empid, deptno, count(*) as c, sum(commission) as s from emps group by salary, empid, deptno",
      "select count(*) + 1 as c, deptno from emps group by rollup(empid, deptno, salary)"),
    m("testAggregateOnProjectAndFilter",
      "select deptno, sum(salary), count(1) from emps group by deptno",
      "select deptno, count(1) from emps where deptno = 10 group by deptno"),
    m("testProjectOnProject",
      "select deptno, sum(salary) + 2, sum(commission) from emps group by deptno",
      "select deptno, sum(salary) + 2 from emps group by deptno"),
    m("testPermutationError",
      "select min(salary), count(*), max(salary), sum(salary), empid from emps group by empid",
      "select count(*), empid from emps group by empid"))

  private val joinsOnProjects = Seq(
    m("testJoinOnLeftProjectToJoin",
      "select * from (select deptno, sum(salary), sum(commission) from emps group by deptno) A join (select deptno, count(name) from depts group by deptno) B on A.deptno = B.deptno",
      "select * from (select deptno, sum(salary) from emps group by deptno) A join (select deptno, count(name) from depts group by deptno) B on A.deptno = B.deptno"),
    m("testJoinOnRightProjectToJoin",
      "select * from (select deptno, sum(salary), sum(commission) from emps group by deptno) A join (select deptno, count(name) from depts group by deptno) B on A.deptno = B.deptno",
      "select * from (select deptno, sum(salary), sum(commission) from emps group by deptno) A join (select deptno from depts group by deptno) B on A.deptno = B.deptno"),
    m("testJoinOnProjectsToJoin",
      "select * from (select deptno, sum(salary), sum(commission) from emps group by deptno) A join (select deptno, count(name) from depts group by deptno) B on A.deptno = B.deptno",
      "select * from (select deptno, sum(salary) from emps group by deptno) A join (select deptno from depts group by deptno) B on A.deptno = B.deptno"),
    m("testJoinOnCalcToJoin0",
      "select emps.empid, emps.deptno, depts.deptno from emps join depts on emps.deptno = depts.deptno",
      "select A.empid, A.deptno, depts.deptno from (select empid, deptno from emps where deptno > 10) A join depts on A.deptno = depts.deptno"),
    m("testJoinOnCalcToJoin1",
      "select emps.empid, emps.deptno, depts.deptno from emps join depts on emps.deptno = depts.deptno",
      "select emps.empid, emps.deptno, B.deptno from emps join (select deptno from depts where deptno > 10) B on emps.deptno = B.deptno"),
    m("testJoinOnCalcToJoin2",
      "select emps.empid, emps.deptno, depts.deptno from emps join depts on emps.deptno = depts.deptno",
      "select * from (select empid, deptno from emps where empid > 10) A join (select deptno from depts where deptno > 10) B on A.deptno = B.deptno"),
    m("testJoinOnCalcToJoin3",
      "select emps.empid, emps.deptno, depts.deptno from emps join depts on emps.deptno = depts.deptno",
      "select * from (select empid, deptno + 1 as deptno from emps where empid > 10) A join (select deptno from depts where deptno > 10) B on A.deptno = B.deptno",
      partial = true,
      note = "DIVERGENT, ours stronger: with the schema FK declared, the MV's depts join is row-preserving, so its REDUCED form (emps alone) answers the calc-join's emps side; the query's own deptno+1 join to depts compensates on base. Reference checkNoMaterialize"),
    m("testJoinOnCalcToJoin4",
      "select emps.empid, emps.deptno, depts.deptno from emps join depts on emps.deptno = depts.deptno",
      "select * from (select empid, deptno from emps where empid is not null) A full join (select deptno from depts where deptno is not null) B on A.deptno = B.deptno",
      partial = true,
      note = "DIVERGENT, ours stronger: the FULL JOIN stays, but its left branch (a plain emps calc) answers from the FK-reduced tile. Reference checkNoMaterialize"),
    m("testSwapJoin",
      "select count(*) as c from sales_fact_1997 as s join time_by_day as t on s.time_id = t.time_id",
      "select count(*) as c from time_by_day as t join sales_fact_1997 as s on t.time_id = s.time_id"),
    m("testOrderByQueryOnProjectView",
      "select deptno, empid from emps",
      "select empid from emps order by deptno",
      note = "reference @Ignore; ours handles it (rewrite lands below the query Sort)"),
    m("testOrderByQueryOnOrderByView",
      "select deptno, empid from emps order by deptno",
      "select empid from emps order by deptno",
      note = "reference @Ignore; MV-side top Sort stripped at registration"))

  private val refEmpty = Seq(
    r("testDifferentColumnNames", "empty body in the reference (stub)"),
    r("testDifferentType", "empty body in the reference (stub)"),
    r("testPartialUnion", "empty body in the reference (stub)"),
    r("testNonDisjointUnion", "empty body in the reference (stub)"),
    r("testMaterializationReferencesTableInOtherSchema",
      "empty body in the reference (stub)"),
    r("testSatisfiable",
      "RexSimplify satisfiability unit test with no MV surface; Catalyst's BooleanSimplification/ConstantFolding owns that role here"),
    MCase("testSplitFilter", Mat(),
      Seq("m0" -> "select empid, deptno, salary from emps where deptno = 10 and salary = 2"),
      "select empid, deptno, salary from emps where salary = 2 and deptno = 10",
      note = "splitFilter's residual algebra is exercised through the rewriter: commuted conjuncts cancel exactly; the sibling split cases run in the dedicated splitFilter-algebra test below"))

  private val stars = Seq(
    r("testFilterGroupQueryOnStar",
      "reference @Ignore; the MV joins a SUPERSET of the query's tables — star-table FK row-preservation reasoning not implemented"),
    m("testQueryOnStar",
      "select * from sales_fact_1997 as f join time_by_day as t on f.time_id = t.time_id join product as p on f.product_id = p.product_id join product_class as pc on p.product_class_id = pc.product_class_id",
      "select * from sales_fact_1997 as f join time_by_day as t on f.time_id = t.time_id join product as p on f.product_id = p.product_id join product_class as pc on p.product_class_id = pc.product_class_id where t.month_of_year = 10",
      note = "reference @Ignore (star-table infra); plain SPJ residual for ours"),
    m("testJoinOnUnionMaterialization",
      "select * from (select * from emps union all select * from emps) join depts using (deptno)",
      "select * from (select * from emps union all select * from emps) join depts using (deptno)",
      note = "DIVERGENT, ours stronger: reference checkNoMaterialize (its star-table converter cannot absorb a join-of-union); our exact matcher answers the identical plan soundly"),
    m("testJoinMaterialization",
      "select * from emps where empid < 500",
      "select * from (select * from emps where empid < 300) join depts using (deptno)",
      partial = true,
      note = "depts is the compensating join and stays on base, as in the reference's expected plan"),
    m("testJoinMaterialization2",
      "select deptno, empid, name, salary, commission from emps",
      "select * from emps join depts using (deptno)",
      partial = true,
      note = "depts stays on base (the reference plan also scans hr.depts)"),
    m("testJoinMaterialization3",
      "select empid deptno from emps join depts using (deptno)",
      "select empid deptno from emps join depts using (deptno) where empid = 1"),
    m("testUnionAll",
      "select * from emps where empid < 500",
      "select * from emps where empid > 300 union all select * from emps where empid < 200",
      partial = true,
      note = "reference expects exactly one branch on the tile (empid>300 is not covered by empid<500)"))

  private val aggMaterializations = Seq(
    m("testAggregateMaterializationNoAggregateFuncs1",
      "select empid, deptno from emps group by empid, deptno",
      "select empid, deptno from emps group by empid, deptno"),
    m("testAggregateMaterializationNoAggregateFuncs2",
      "select empid, deptno from emps group by empid, deptno",
      "select deptno from emps group by deptno"),
    n("testAggregateMaterializationNoAggregateFuncs3",
      "select deptno from emps group by deptno",
      "select empid, deptno from emps group by empid, deptno"),
    m("testAggregateMaterializationNoAggregateFuncs4",
      "select empid, deptno from emps where deptno = 10 group by empid, deptno",
      "select deptno from emps where deptno = 10 group by deptno"),
    n("testAggregateMaterializationNoAggregateFuncs5",
      "select empid, deptno from emps where deptno = 5 group by empid, deptno",
      "select deptno from emps where deptno = 10 group by deptno"),
    m("testAggregateMaterializationNoAggregateFuncs6",
      "select empid, deptno from emps where deptno > 5 group by empid, deptno",
      "select deptno from emps where deptno > 10 group by deptno"),
    n("testAggregateMaterializationNoAggregateFuncs7",
      "select empid, deptno from emps where deptno > 5 group by empid, deptno",
      "select deptno from emps where deptno < 10 group by deptno"),
    n("testAggregateMaterializationNoAggregateFuncs8",
      "select empid from emps group by empid, deptno",
      "select deptno from emps group by deptno"),
    n("testAggregateMaterializationNoAggregateFuncs9",
      "select empid, deptno from emps where salary > 1000 group by name, empid, deptno",
      "select empid from emps where salary > 2000 group by name, empid"),
    m("testAggregateMaterializationAggregateFuncs1",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select deptno from emps group by deptno"),
    m("testAggregateMaterializationAggregateFuncs2",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select deptno, count(*) as c, sum(empid) as s from emps group by deptno"),
    m("testAggregateMaterializationAggregateFuncs3",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select deptno, empid, sum(empid) as s, count(*) as c from emps group by empid, deptno"),
    m("testAggregateMaterializationAggregateFuncs4",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps where deptno >= 10 group by empid, deptno",
      "select deptno, sum(empid) as s from emps where deptno > 10 group by deptno"),
    m("testAggregateMaterializationAggregateFuncs5",
      "select empid, deptno, count(*) + 1 as c, sum(empid) as s from emps where deptno >= 10 group by empid, deptno",
      "select deptno, sum(empid) + 1 as s from emps where deptno > 10 group by deptno"),
    n("testAggregateMaterializationAggregateFuncs6",
      "select empid, deptno, count(*) + 1 as c, sum(empid) + 2 as s from emps where deptno >= 10 group by empid, deptno",
      "select deptno, sum(empid) + 1 as s from emps where deptno > 10 group by deptno"),
    m("testAggregateMaterializationAggregateFuncs7",
      "select empid, deptno, count(*) + 1 as c, sum(empid) as s from emps where deptno >= 10 group by empid, deptno",
      "select deptno + 1, sum(empid) + 1 as s from emps where deptno > 10 group by deptno"),
    r("testAggregateMaterializationAggregateFuncs8",
      "reference @Ignore (its own planner misses the top project); the MV stores deptno+1 only — recovering bare deptno needs lossless-inverse mapping"),
    m("testAggregateMaterializationAggregateFuncs9",
      "select empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp)), count(*) + 1 as c, sum(empid) as s from emps group by empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp))",
      "select date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) as s from emps group by date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs10",
      "select empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp)), count(*) + 1 as c, sum(empid) as s from emps group by empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp))",
      "select date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) + 1 as s from emps group by date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs11",
      "select empid, date_trunc('SECOND', cast('1997-01-20 12:34:56' as timestamp)), count(*) + 1 as c, sum(empid) as s from emps group by empid, date_trunc('SECOND', cast('1997-01-20 12:34:56' as timestamp))",
      "select date_trunc('MINUTE', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) as s from emps group by date_trunc('MINUTE', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs12",
      "select empid, date_trunc('SECOND', cast('1997-01-20 12:34:56' as timestamp)), count(*) + 1 as c, sum(empid) as s from emps group by empid, date_trunc('SECOND', cast('1997-01-20 12:34:56' as timestamp))",
      "select date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) as s from emps group by date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs13",
      "select empid, cast('1997-01-20 12:34:56' as timestamp), count(*) + 1 as c, sum(empid) as s from emps group by empid, cast('1997-01-20 12:34:56' as timestamp)",
      "select date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) as s from emps group by date_trunc('YEAR', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs14",
      "select empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp)), count(*) + 1 as c, sum(empid) as s from emps group by empid, date_trunc('MONTH', cast('1997-01-20 12:34:56' as timestamp))",
      "select date_trunc('HOUR', cast('1997-01-20 12:34:56' as timestamp)), sum(empid) as s from emps group by date_trunc('HOUR', cast('1997-01-20 12:34:56' as timestamp))"),
    m("testAggregateMaterializationAggregateFuncs15",
      "select eventid, date_trunc('SECOND', ts), count(*) + 1 as c, sum(eventid) as s from events group by eventid, date_trunc('SECOND', ts)",
      "select date_trunc('MINUTE', ts), sum(eventid) as s from events group by date_trunc('MINUTE', ts)"),
    m("testAggregateMaterializationAggregateFuncs16",
      "select eventid, ts, count(*) + 1 as c, sum(eventid) as s from events group by eventid, ts",
      "select date_trunc('YEAR', ts), sum(eventid) as s from events group by date_trunc('YEAR', ts)"),
    n("testAggregateMaterializationAggregateFuncs17",
      "select eventid, date_trunc('MONTH', ts), count(*) + 1 as c, sum(eventid) as s from events group by eventid, date_trunc('MONTH', ts)",
      "select date_trunc('HOUR', ts), sum(eventid) as s from events group by date_trunc('HOUR', ts)"),
    m("testAggregateMaterializationAggregateFuncs18",
      "select empid, deptno, count(*) + 1 as c, sum(empid) as s from emps group by empid, deptno",
      "select empid * deptno, sum(empid) as s from emps group by empid * deptno"),
    m("testAggregateMaterializationAggregateFuncs19",
      "select empid, deptno, count(*) as c, sum(empid) as s from emps group by empid, deptno",
      "select empid + 10, count(*) + 1 as c from emps group by empid + 10"))

  private val joinAggs = Seq(
    m("testJoinAggregateMaterializationNoAggregateFuncs1",
      "select empid, depts.deptno from emps join depts using (deptno) where depts.deptno > 10 group by empid, depts.deptno",
      "select empid from emps join depts using (deptno) where depts.deptno > 20 group by empid, depts.deptno"),
    m("testJoinAggregateMaterializationNoAggregateFuncs2",
      "select depts.deptno, empid from depts join emps using (deptno) where depts.deptno > 10 group by empid, depts.deptno",
      "select empid from emps join depts using (deptno) where depts.deptno > 20 group by empid, depts.deptno"),
    n("testJoinAggregateMaterializationNoAggregateFuncs3",
      "select empid from emps join depts using (deptno) where depts.deptno > 10 group by empid, depts.deptno",
      "select empid from emps join depts using (deptno) where depts.deptno > 20 group by empid, depts.deptno"),
    m("testJoinAggregateMaterializationNoAggregateFuncs4",
      "select empid, depts.deptno from emps join depts using (deptno) where emps.deptno > 10 group by empid, depts.deptno",
      "select empid from emps join depts using (deptno) where depts.deptno > 20 group by empid, depts.deptno"),
    m("testJoinAggregateMaterializationNoAggregateFuncs5",
      "select depts.deptno, emps.empid from depts join emps using (deptno) where emps.empid > 10 group by depts.deptno, emps.empid",
      "select depts.deptno from depts join emps using (deptno) where emps.empid > 15 group by depts.deptno, emps.empid"),
    m("testJoinAggregateMaterializationNoAggregateFuncs6",
      "select depts.deptno, emps.empid from depts join emps using (deptno) where emps.empid > 10 group by depts.deptno, emps.empid",
      "select depts.deptno from depts join emps using (deptno) where emps.empid > 15 group by depts.deptno"),
    m("testJoinAggregateMaterializationNoAggregateFuncs7",
      "select depts.deptno, dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 11 group by depts.deptno, dependents.empid",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 group by dependents.empid",
      partial = true,
      note = "tile-grain range-union (r14): tile UNION ALL re-grouped complement slice, re-aggregated"),
    n("testJoinAggregateMaterializationNoAggregateFuncs8",
      "select depts.deptno, dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 20 group by depts.deptno, dependents.empid",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 and depts.deptno < 20 group by dependents.empid"),
    m("testJoinAggregateMaterializationNoAggregateFuncs9",
      "select depts.deptno, dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 11 and depts.deptno < 19 group by depts.deptno, dependents.empid",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 and depts.deptno < 20 group by dependents.empid",
      partial = true,
      note = "two-sided range-union (r14): both tile bounds land in the complement filter"),
    m("testJoinAggregateMaterializationNoAggregateFuncs10",
      "select depts.name, dependents.name as name2, emps.deptno, depts.deptno as deptno2, dependents.empid from depts, dependents, emps where depts.deptno > 10 group by depts.name, dependents.name, emps.deptno, depts.deptno, dependents.empid",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 group by dependents.empid"),
    m("testJoinAggregateMaterializationAggregateFuncs1",
      "select empid, depts.deptno, count(*) as c, sum(empid) as s from emps join depts using (deptno) group by empid, depts.deptno",
      "select deptno from emps group by deptno",
      note = "emps-only rollup from an emps⋈depts aggregate tile — the FK makes the tile's depts join row-preserving (r14)"),
    m("testJoinAggregateMaterializationAggregateFuncs2",
      "select empid, emps.deptno, count(*) as c, sum(empid) as s from emps join depts using (deptno) group by empid, emps.deptno",
      "select depts.deptno, count(*) as c, sum(empid) as s from emps join depts using (deptno) group by depts.deptno"),
    m("testJoinAggregateMaterializationAggregateFuncs3",
      "select empid, depts.deptno, count(*) as c, sum(empid) as s from emps join depts using (deptno) group by empid, depts.deptno",
      "select deptno, empid, sum(empid) as s, count(*) as c from emps group by empid, deptno",
      note = "emps-only same-level projection from an emps⋈depts aggregate tile via the FK (r14)"),
    m("testJoinAggregateMaterializationAggregateFuncs4",
      "select empid, emps.deptno, count(*) as c, sum(empid) as s from emps join depts using (deptno) where emps.deptno >= 10 group by empid, emps.deptno",
      "select depts.deptno, sum(empid) as s from emps join depts using (deptno) where emps.deptno > 10 group by depts.deptno"),
    m("testJoinAggregateMaterializationAggregateFuncs5",
      "select empid, depts.deptno, count(*) + 1 as c, sum(empid) as s from emps join depts using (deptno) where depts.deptno >= 10 group by empid, depts.deptno",
      "select depts.deptno, sum(empid) + 1 as s from emps join depts using (deptno) where depts.deptno > 10 group by depts.deptno"),
    r("testJoinAggregateMaterializationAggregateFuncs6",
      "reference @Ignore (its own planner discards the rewriting); needs a generated pre-aggregation below the join"),
    m("testJoinAggregateMaterializationAggregateFuncs7",
      "select dependents.empid, emps.deptno, sum(salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno",
      "select dependents.empid, sum(salary) as s from emps join depts on (emps.deptno = depts.deptno) join dependents on (emps.empid = dependents.empid) group by dependents.empid",
      partial = true,
      note = "reference joins the tile back to depts — the compensating depts scan stays on base"),
    m("testJoinAggregateMaterializationAggregateFuncs8",
      "select dependents.empid, emps.deptno, sum(salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno",
      "select depts.name, sum(salary) as s from emps join depts on (emps.deptno = depts.deptno) join dependents on (emps.empid = dependents.empid) group by depts.name",
      partial = true,
      note = "compensating depts join as in AggregateFuncs7"),
    m("testJoinAggregateMaterializationAggregateFuncs9",
      "select dependents.empid, emps.deptno, count(distinct salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno",
      "select emps.deptno, count(distinct salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno"),
    n("testJoinAggregateMaterializationAggregateFuncs10",
      "select dependents.empid, emps.deptno, count(distinct salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno",
      "select emps.deptno, count(distinct salary) as s from emps join dependents on (emps.empid = dependents.empid) group by emps.deptno"),
    m("testJoinAggregateMaterializationAggregateFuncs11",
      "select depts.deptno, dependents.empid, count(emps.salary) as s from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 11 and depts.deptno < 19 group by depts.deptno, dependents.empid",
      "select dependents.empid, count(emps.salary) + 1 from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 and depts.deptno < 20 group by dependents.empid",
      partial = true,
      note = "range-union with COUNT partials: tile counts + complement-slice counts re-added by the SUM rollup (r14)"),
    n("testJoinAggregateMaterializationAggregateFuncs12",
      "select depts.deptno, dependents.empid, count(distinct emps.salary) as s from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 11 and depts.deptno < 19 group by depts.deptno, dependents.empid",
      "select dependents.empid, count(distinct emps.salary) + 1 from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10 and depts.deptno < 20 group by dependents.empid"),
    n("testJoinAggregateMaterializationAggregateFuncs13",
      "select dependents.empid, emps.deptno, count(distinct salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno",
      "select emps.deptno, count(salary) as s from emps join dependents on (emps.empid = dependents.empid) group by dependents.empid, emps.deptno"),
    m("testJoinAggregateMaterializationAggregateFuncs14",
      "select empid, emps.name, emps.deptno, depts.name, count(*) as c, sum(empid) as s from emps join depts using (deptno) where (depts.name is not null and emps.name = 'a') or (depts.name is not null and emps.name = 'b') group by empid, emps.name, depts.name, emps.deptno",
      "select depts.deptno, sum(empid) as s from emps join depts using (deptno) where depts.name is not null and emps.name = 'a' group by depts.deptno"))

  private val joinMats = Seq(
    m("testJoinMaterialization4",
      "select empid deptno from emps join depts using (deptno)",
      "select empid deptno from emps join depts using (deptno) where empid = 1"),
    m("testJoinMaterialization5",
      "select cast(empid as BIGINT) from emps join depts using (deptno)",
      "select empid deptno from emps join depts using (deptno) where empid > 1",
      note = "bare empid recovered as cast(tile as int) — widening casts are injective (r14)"),
    m("testJoinMaterialization6",
      "select cast(empid as BIGINT) from emps join depts using (deptno)",
      "select empid deptno from emps join depts using (deptno) where empid = 1",
      note = "cast-inverse mapping as in testJoinMaterialization5 (r14)"),
    m("testJoinMaterialization7",
      "select depts.name from emps join depts on (emps.deptno = depts.deptno)",
      "select dependents.empid from emps join depts on (emps.deptno = depts.deptno) join dependents on (depts.name = dependents.name)",
      partial = true,
      note = "compensating dependents join stays on base"),
    m("testJoinMaterialization8",
      "select depts.name from emps join depts on (emps.deptno = depts.deptno)",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join emps on (emps.deptno = depts.deptno)",
      partial = true),
    m("testJoinMaterialization9",
      "select depts.name from emps join depts on (emps.deptno = depts.deptno)",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join locations on (locations.name = dependents.name) join emps on (emps.deptno = depts.deptno)",
      partial = true),
    m("testJoinMaterialization10",
      "select depts.deptno, dependents.empid from depts join dependents on (depts.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 30",
      "select dependents.empid from depts join dependents on (depts.name = dependents.name) join emps on (emps.deptno = depts.deptno) where depts.deptno > 10",
      partial = true,
      note = "range-union compensation (r14): tile UNION ALL base slice where deptno > 10 and not (deptno > 30) is true"),
    m("testJoinMaterialization11",
      "select empid from emps join depts using (deptno)",
      "select empid from emps where deptno in (select deptno from depts)",
      note = "both sides reduce to bare emps under the FK (r14): the MV's inner join is row-preserving, the query's IN semi join filters nothing"),
    m("testJoinMaterialization12",
      "select empid, emps.name, emps.deptno, depts.name from emps join depts using (deptno) where (depts.name is not null and emps.name = 'a') or (depts.name is not null and emps.name = 'b') or (depts.name is not null and emps.name = 'c')",
      "select depts.deptno, depts.name from emps join depts using (deptno) where (depts.name is not null and emps.name = 'a') or (depts.name is not null and emps.name = 'b')"))

  private val ukfk = Seq(
    m("testJoinMaterializationUKFK1",
      "select a.empid deptno from (select * from emps where empid = 1) a join depts using (deptno) join dependents using (empid)",
      "select a.empid from (select * from emps where empid = 1) a join dependents using (empid)"),
    m("testJoinMaterializationUKFK2",
      "select a.empid, a.deptno from (select * from emps where empid = 1) a join depts using (deptno) join dependents using (empid)",
      "select a.empid from (select * from emps where empid = 1) a join dependents using (empid)"),
    n("testJoinMaterializationUKFK3",
      "select a.empid, a.deptno from (select * from emps where empid = 1) a join depts using (deptno) join dependents using (empid)",
      "select a.name from (select * from emps where empid = 1) a join dependents using (empid)"),
    m("testJoinMaterializationUKFK4",
      "select empid deptno from (select * from emps where empid = 1) join depts using (deptno)",
      "select empid from emps where empid = 1"),
    m("testJoinMaterializationUKFK5",
      "select emps.empid, emps.deptno from emps join depts using (deptno) join dependents using (empid) where emps.empid = 1",
      "select emps.empid from emps join dependents using (empid) where emps.empid = 1"),
    m("testJoinMaterializationUKFK6",
      "select emps.empid, emps.deptno from emps join depts a on (emps.deptno = a.deptno) join depts b on (emps.deptno = b.deptno) join dependents using (empid) where emps.empid = 1",
      "select emps.empid from emps join dependents using (empid) where emps.empid = 1"),
    n("testJoinMaterializationUKFK7",
      "select emps.empid, emps.deptno from emps join depts a on (emps.name = a.name) join depts b on (emps.name = b.name) join dependents using (empid) where emps.empid = 1",
      "select emps.empid from emps join dependents using (empid) where emps.empid = 1"),
    n("testJoinMaterializationUKFK8",
      "select emps.empid, emps.deptno from emps join depts a on (emps.deptno = a.deptno) join depts b on (emps.name = b.name) join dependents using (empid) where emps.empid = 1",
      "select emps.empid from emps join dependents using (empid) where emps.empid = 1"),
    m("testJoinMaterializationUKFK9",
      "select * from emps join dependents using (empid)",
      "select emps.empid, dependents.empid, emps.deptno from emps join dependents using (empid) join depts a on (emps.deptno = a.deptno) where emps.name = 'Bill'",
      note = "the query-side depts join is FK-UK row-preserving and is dropped outright — no compensating join"))

  private val machinery = Seq(
    r("testViewMaterialization",
      "binds an EXISTING model-file view as the materialization body (existing=true); our registry materializes definitions itself"),
    m("testSubQuery",
      "select empid, deptno from emps",
      "select empid, deptno, salary from emps e1 where empid = (select max(empid) from emps where deptno = e1.deptno)",
      partial = true,
      note = "the correlated scalar subquery's inner scan answers from the tile; the outer scan needs salary and stays on base — the reference likewise pins exactly one m0 occurrence"),
    r("testTableModify",
      "UPSERT target substitution through Calcite's TableModify machinery; our TableModify surface is a separate operator, not a substitution client"),
    r("testPrePopulated",
      "binds a pre-populated EXISTING table (locations) as the tile with column renames from the model file"),
    r("testViewSchemaPath",
      "model-file viewSchemaPath resolution across schemas — Calcite model machinery"),
    m("testSingleMaterializationMultiUsage",
      "select * from emps where empid < 500",
      "select * from (select * from emps where empid < 300) join (select * from emps where empid < 200) using (empid)",
      partial = true,
      note = "our unifier answers one join side from the tile and keeps the other as the compensating self-join leaf (the reference substitutes both)"),
    MCase("testMultiMaterializationMultiUsage", Mat(),
      Seq("m0" -> "select deptno, count(*) as c, sum(empid) as s from emps group by deptno",
        "m1" -> "select * from emps where empid < 500"),
      "select * from (select * from emps where empid < 300) join (select deptno, count(*) as c from emps group by deptno) using (deptno)"),
    m("testMaterializationOnJoinQuery",
      "select * from emps where empid < 500",
      "select * from emps join depts using (deptno) where empid < 300",
      partial = true,
      note = "depts is the compensating join and stays on base"),
    MCase("testMultiMaterializationOnJoinQuery", Mat(),
      Seq("m0" -> "select * from emps where empid < 500",
        "m1" -> "select * from depts where deptno > 100"),
      "select * from emps join depts using (deptno) where empid < 300 and depts.deptno > 200",
      note = "reference @Ignore (its own mv-creation infra); both sides answer from tiles here"),
    m("testAggregateMaterializationOnCountDistinctQuery1",
      "select deptno, empid, salary from emps group by deptno, empid, salary",
      "select deptno, count(distinct empid) as c from (select deptno, empid from emps group by deptno, empid) group by deptno"),
    m("testAggregateMaterializationOnCountDistinctQuery2",
      "select deptno, salary, empid from emps group by deptno, salary, empid",
      "select deptno, count(distinct empid) as c from (select deptno, empid from emps group by deptno, empid) group by deptno"),
    m("testAggregateMaterializationOnCountDistinctQuery3",
      "select deptno, empid, salary from emps group by deptno, empid, salary",
      "select deptno, count(distinct salary) from (select deptno, salary from emps group by deptno, salary) group by deptno"),
    m("testAggregateMaterializationOnCountDistinctQuery4",
      "select deptno, salary, empid from emps group by deptno, salary, empid",
      "select deptno, count(salary) from (select deptno, salary from emps group by deptno, salary) group by deptno"),
    r("testMaterializationSubstitution",
      "asserts the full ENUMERATION of substitution combinations via a planner hook (8 plans); our rule rewrites deterministically — no Volcano search space to enumerate"),
    r("testMaterializationSubstitution2",
      "substitution-set enumeration (15 plans incl. an MV-over-MV) as above"),
    m("testMaterializationAfterTrimingOfUnusedFields",
      "select y.deptno, y.name, x.sum_salary from (select deptno, sum(salary) sum_salary from emps group by deptno) x join depts y on x.deptno = y.deptno",
      "select y.deptno, y.name, x.sum_salary from (select deptno, sum(salary) sum_salary from emps group by deptno) x join depts y on x.deptno = y.deptno"),
    m("testUnionAllToUnionAll",
      "select * from emps where empid < 300 union all select * from emps where empid > 200",
      "select * from emps where empid > 200 union all select * from emps where empid < 300"),
    m("testUnionDistinctToUnionDistinct",
      "select * from emps where empid < 300 union select * from emps where empid > 200",
      "select * from emps where empid > 200 union select * from emps where empid < 300"),
    n("testUnionDistinctToUnionAll",
      "select * from emps where empid < 300 union select * from emps where empid > 200",
      "select * from emps where empid < 300 union all select * from emps where empid > 200"),
    m("testUnionOnCalcsToUnion",
      "select deptno, salary from emps where empid > 300 union all select deptno, salary from emps where empid < 100",
      "select deptno, salary * 2 from emps where empid > 300 and salary > 100 union all select deptno, salary * 2 from emps where empid < 100 and salary > 100"))

  val cases: Seq[MCase] = scanAndFilter ++ filterViews ++ aggregates ++
    joinsOnProjects ++ refEmpty ++ stars ++ aggMaterializations ++
    joinAggs ++ joinMats ++ ukfk ++ machinery

  // ---------------------------------------------------------------- harness
  private val tileRoot = "/tmp/graft_mvp/tiles"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def run(c: MCase): Unit = {
    MvParityFixture.ensure(spark)
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    val want = rows(spark.sql(c.query))
    c.mvs.foreach { case (nm, sql) =>
      MaterializedViews.create(spark, nm, spark.sql(sql), s"$tileRoot/${c.name}_$nm")
    }
    try {
      val df = spark.sql(c.query)
      val plan = df.queryExecution.executedPlan.toString
      c.expect match {
        case Mat(partial) =>
          // key on the tiles directory, not the case name — FileScan's
          // InMemoryFileIndex string truncates long paths
          assert(plan.contains("graft_mvp/tiles"), s"${c.name}: tile not scanned:\n$plan")
          if (!partial)
            assert(!plan.contains("graft_mvp/base"),
              s"${c.name}: base table still scanned:\n$plan")
        case NoMat =>
          assert(!plan.contains("graft_mvp/tiles"),
            s"${c.name}: wrongly rewritten:\n$plan")
        case Reject(_) => ()
      }
      assert(rows(df) == want, s"${c.name}: results diverge with the tile registered")
    } finally {
      MaterializedViews.clear()
      // the fixture CLOBBERS the engine's memoized `events` view (the
      // reference's hr events vs the testdata events table) — restore the
      // engine registration per the Engine.registerAll shadowing protocol
      Tables.invalidateRegistration(spark)
      Tables.registerAll(spark, sfDir)
    }
  }

  // one ScalaTest test per runnable case
  for (c <- cases) c.expect match {
    case Mat(_) => test(s"${c.name} materializes") { run(c) }
    case NoMat => test(s"${c.name} does not materialize") { run(c) }
    case Reject(_) => () // counted by the census below
  }

  test("census: every reference @Test is ported or documented-rejected") {
    val src = scala.io.Source.fromFile(
      "/root/reference/core/src/test/java/org/apache/calcite/test/MaterializationTest.java")
    val text = try src.mkString finally src.close()
    val refNames = """@Test public void (\w+)\(""".r
      .findAllMatchIn(text).map(_.group(1)).toSeq
    assert(refNames.size == 167, s"reference test count drifted: ${refNames.size}")
    val ours = cases.map(_.name)
    assert(ours.size == ours.distinct.size, "duplicate case names")
    val missing = refNames.toSet -- ours.toSet
    val extra = ours.toSet -- refNames.toSet
    assert(missing.isEmpty && extra.isEmpty,
      s"census mismatch — missing: $missing, extra: $extra")
    val mat = cases.count(_.expect match { case Mat(_) => true; case _ => false })
    val noMat = cases.count(_.expect == NoMat)
    val rej = cases.count(_.expect match { case Reject(_) => true; case _ => false })
    assert(mat + noMat + rej == 167)
    info(s"census: $mat materialize + $noMat no-materialize ported, $rej documented rejects")
  }

  test("testSplitFilter's residual algebra (sibling cases through the rewriter)") {
    // the reference's splitFilter unit cases re-expressed as behavior:
    // (reference MaterializationTest.java:1246-1400)
    MvParityFixture.ensure(spark)
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def tilePlan(mv: String, q: String, tag: String): String = {
      MaterializedViews.clear()
      MaterializedViews.create(spark, "m0",
        spark.sql(mv), s"$tileRoot/splitfilter_$tag")
      spark.sql(q).queryExecution.executedPlan.toString
    }
    // x = 1 AND y = 2 answers from an x = 1 tile (residual y = 2)
    assert(tilePlan(
      "select empid, deptno, salary from emps where empid = 100",
      "select empid, deptno, salary from emps where empid = 100 and deptno = 10",
      "a").contains("splitfilter_a"))
    // ...and an x = 1 query against an x = 1 AND y = 2 tile takes the
    // range-union path (r14): tile UNION the y-=-2-not-true base slice —
    // the reference's splitFilter returns null here (no rewrite); ours
    // is a sound superset via union compensation
    val planB = tilePlan(
      "select empid, deptno, salary from emps where empid = 100 and deptno = 10",
      "select empid, deptno, salary from emps where empid = 100",
      "b")
    assert(planB.contains("splitfilter_b") && planB.contains("Union"),
      s"expected the union-compensated rewrite:\n$planB")
    // 1 = x spelling matches x = 1 (operand normalization)
    assert(tilePlan(
      "select empid, deptno, salary from emps where empid = 100",
      "select empid, deptno, salary from emps where 100 = empid and deptno = 10",
      "c").contains("splitfilter_c"))
    // disjunct containment: x = 1 answers from an (x = 1 OR y = 2) tile
    assert(tilePlan(
      "select empid, deptno, salary from emps where empid = 100 or deptno = 20",
      "select empid, deptno, salary from emps where empid = 100",
      "d").contains("splitfilter_d"))
    MaterializedViews.clear()
    Tables.invalidateRegistration(spark)
    Tables.registerAll(spark, sfDir)
  }
}
