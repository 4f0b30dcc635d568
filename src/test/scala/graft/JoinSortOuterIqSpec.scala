package graft

import graft.iq.IqSuite

/** Exhaustive port of sort.iq — sort/limit/offset over the foodmart
  * mini fixture (days/store), scott, and post hr.emps (reference:
  * core/src/test/resources/sql/sort.iq). The goldens pin VALUES (order
  * is covered by the harness's multiset compare; the file's
  * sorted-scan/limit-pushdown plan assertions are Enumerable-specific
  * `!plan` blocks, outside the `!ok` census). Rewrites: the WITH-self-
  * join block spells its select list because the golden's EMPID0 is
  * the reference renamer's duplicate-name disambiguation; the DISTINCT
  * block orders by its own output alias (Spark cannot order a DISTINCT
  * by an aggregate expression not in the select list — values are
  * unchanged, and output order is not part of the compare). */
class SortIqSpec extends IqSuite {
  val iqFile = "sort.iq"
  val expectedTotal = 12
  val rewrites: Map[Int, String => String] = Map(
    156 -> (_ => """with e as (select empid as empid from hr_emps where empid < 120)
      select e1.empid, e2.empid as empid0 from e as e1, e as e2
      order by e1.empid + e2.empid, e1.empid"""),
    201 -> (_.replace("order by count(*) desc", "order by c desc"))
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Exhaustive port of join.iq — OR-condition joins (the reference's
  * nested-loop path; Catalyst plans the same shape as BNLJ), aggregate
  * pushdown through joins, CUBE over a join, multi-input conditions
  * (CALCITE-688), non-ANSI comma joins with expression conditions
  * (CALCITE-457), and USING column disambiguation (CALCITE-801/1018).
  * Star-select rewrites spell the select list where the golden's
  * DEPTNO0/NAME0 names come from the reference renamer; values are
  * position-identical. */
class JoinIqSpec extends IqSuite {
  val iqFile = "join.iq"
  val expectedTotal = 9

  private def starPostEmpDept(tail: String) =
    "select emp.ename, emp.deptno, emp.gender, dept.deptno as deptno0, " +
      s"dept.dname from emp $tail dept " +
      "on emp.deptno = dept.deptno or emp.ename = dept.dname"

  val rewrites: Map[Int, String => String] = Map(
    37 -> (_ => starPostEmpDept("join")),
    84 -> (_ => starPostEmpDept("left join")),
    259 -> (_ => """select e.deptno, e.empid, e.name, d.name as name0
      from (values (100, 'Bill', 1),
                   (200, 'Eric', 1),
                   (150, 'Sebastian', 3)) as e(empid, name, deptno)
      join (values (1, 'LeaderShip'),
                   (2, 'TestGroup'),
                   (3, 'Development')) as d(deptno, name)
      using (deptno)""")
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Exhaustive port of outer.iq — inner/left/right/full joins with
  * filters above vs inside the condition, outer join over NULL keys
  * (CALCITE-554), and a constant-false right-join condition. The only
  * rewrites are star-select spell-outs where the golden's
  * DEPTNO0/X0/Y0 names are the reference renamer's duplicate-name
  * disambiguation; join shape and values are untouched. */
class OuterIqSpec extends IqSuite {
  val iqFile = "outer.iq"
  val expectedTotal = 21

  /** emp(✕)dept star select list with the golden's DEPTNO0 alias; the
    * join clause comes from the original block, everything after "from"
    * is preserved verbatim. */
  private def starPost(sql: String): String =
    "select emp.ename, emp.deptno, emp.gender, dept.deptno as deptno0, dept.dname " +
      sql.replaceAll("(?is)^select \\* ", "")

  private def starT1T2(sql: String): String =
    sql.replaceAll("(?is)select \\* from t1",
      "select t1.x, t1.y, t2.x as x0, t2.y as y0 from t1")

  val rewrites: Map[Int, String => String] = Map(
    50 -> starPost _, 75 -> starPost _, 87 -> starPost _,
    119 -> starPost _, 134 -> starPost _, 162 -> starPost _,
    176 -> starPost _, 214 -> starPost _, 231 -> starPost _,
    249 -> starPost _,
    333 -> starT1T2 _, 349 -> starT1T2 _,
    365 -> (_ => """select e.empno, e.ename, e.job, e.mgr, e.hiredate,
      e.sal, e.comm, e.deptno, d.deptno as deptno0, d.dname, d.loc
      from emp e right join dept d on sal < 100""")
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}
