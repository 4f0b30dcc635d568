package graft

import graft.iq.IqSuite

/** Exhaustive port of the reference's sub-query.iq golden script
  * (r10 VERDICT #6): IN / NOT IN / EXISTS / scalar subqueries with the
  * three-valued-logic edge cases (nullable keys, empty subqueries,
  * correlation) — every `!ok` block runs against our engine on the same
  * POST/scott fixtures and must reproduce the committed golden, or is
  * skipped with a documented reason; the census pins the partition. */
class SubQueryIqSpec extends IqSuite {
  val iqFile = "sub-query.iq"
  val expectedTotal = 96

  /** Quantified comparison subqueries (`> ANY(...)`) have no Spark
    * spelling — rewritten to the equivalent EXISTS form (the same
    * SubQueryRemoveRule expansion the reference's planner applies; the
    * correlation keys here are non-null, so the three-valued-logic
    * corners the expansion guards don't bite). */
  /** Projected IN/NOT IN with NULLs in the RHS: Spark plans a projected
    * IN-subquery as an existence join, which yields FALSE where standard
    * three-valued logic yields UNKNOWN (a non-matching LHS with NULLs in
    * the set). Spelled as the SubQueryRemoveRule CASE expansion — TRUE on
    * a match, NULL when the set contains NULLs, FALSE otherwise — which
    * is exactly how the reference itself lowers these. */
  private def in3vl(lhs: String, rhsFrom: String, negate: Boolean): String = {
    val (t, f) = if (negate) ("false", "true") else ("true", "false")
    s"""case when $lhs in (select deptno from $rhsFrom) then $t
       |     when (select count(deptno) from $rhsFrom)
       |        < (select count(*) from $rhsFrom) then cast(null as boolean)
       |     else $f end""".stripMargin
  }

  val rewrites: Map[Int, String => String] = Map(
    91 -> (_ => s"select deptno, ${in3vl("deptno", "emp", negate = false)} from dept"),
    101 -> (_ => s"select deptno, ${in3vl("deptno", "emp", negate = true)} from dept"),
    119 -> (_ => "select deptno, " +
      in3vl("deptno", "(select deptno from emp where deptno is null)", negate = false) +
      " from dept"),
    129 -> (_ => "select deptno, " +
      in3vl("deptno", "(select deptno from emp where deptno is null)", negate = true) +
      " from dept"),
    826 -> (_ => "select sal, " +
      in3vl("123", "(select cast(null as int) as deptno from dept)", negate = false) +
      " from emp"),
    1076 -> (_ => "select sal, " +
      in3vl("123", "(select cast(null as int) as deptno from dept)", negate = true) +
      " from emp"),
    2096 -> (_ => """select empno from emp as e
      where exists (select 1 from dept e2
                    where e2.deptno = e.deptno and e.empno > 2)"""),
    2130 -> (_ => """select empno,
      exists (select 1 from dept e2
              where e2.deptno = e.empno and e.deptno > 2)
      from emp as e"""),
    // `<IN-predicate> IS UNKNOWN`: Spark's grammar needs the predicate
    // parenthesized before IS NULL can apply (UNKNOWN ≡ NULL on booleans)
    1290 -> (_ => """select sal,
      (cast(null as int) IN (select deptno from dept)) is null
      from emp"""),
    1603 -> (_ => """select sal from emp
      where (cast(null as int) IN (select deptno from dept)) is null"""),
    1891 -> (_ => """select sal from emp e
      where (cast(null as int) IN (
        select deptno from dept d where e.deptno = d.deptno)) is null""")
  )
  val skips: Map[Int, String] = Map(
    1891 -> ("Spark's decorrelation evaluates NULL IN (correlated " +
      "non-empty subquery) to FALSE where the reference (and standard " +
      "3VL) gives UNKNOWN — pinned as a documented delta below; the " +
      "uncorrelated twin (block 1603) matches the reference")
  )

  generateTests()

  test("documented delta: correlated NULL IN loses UNKNOWN (sub-query.iq:1891)") {
    // the reference's golden keeps all 14 rows (NULL IN S with S ≠ ∅ is
    // UNKNOWN, so IS UNKNOWN is TRUE); Spark's decorrelated plan yields
    // FALSE for the IN — pinned so a future engine fix surfaces here
    // and the skip above can be retired
    register("scott")
    val vals = spark.sql(
      """select (cast(null as int) IN (
        |  select deptno from dept d where emp.deptno = d.deptno)) as v
        |from emp""".stripMargin).collect().map(r => Option(r.get(0)))
    assert(vals.length == 14 && vals.forall(_.contains(false)),
      "current engine behavior: FALSE (reference: UNKNOWN)")
  }
}
