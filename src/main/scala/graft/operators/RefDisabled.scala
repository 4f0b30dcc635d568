package graft.operators

import graft.QDef

/** Queries the reference DISABLED in its own golden suite (`!if (false)`
  * blocks) because its enumerable engine could not run them — runnable
  * here, each verified against the DuckDB oracle instead of the
  * reference's never-executed printed expectations:
  *
  *  - outer.iq:20+ — outer joins whose ON clause carries a non-join
  *    filter (`... ON emp.deptno = dept.deptno AND emp.gender = 'F'`):
  *    SQL-standard semantics preserve unmatched left/right rows, which
  *    the reference got wrong and fenced off.
  *  - scalar.iq:127-170 — [CALCITE-709] LIMIT inside a correlated scalar
  *    subquery (LIMIT 1, LIMIT 0, and ORDER BY + LIMIT 1 forms) errored
  *    in the reference's planner.
  *  - winagg.iq:90-160 — FIRST_VALUE over empty/partition-only/RANGE
  *    frames was unimplemented in the enumerable convention.
  *  - winagg.iq:187 — tied-rank running COUNT (default RANGE frame peers)
  *    "Calcite does not yet generate tied ranks".
  *  - misc.iq:2124 — [CALCITE-2032] implicit character→date coercion in a
  *    comparison predicate.
  *
  * The emp/dept fixture is inline VALUES (the post-schema's shape), so
  * the identical text runs on both engines. A NULLS LAST is pinned on the
  * global window order: Spark defaults ascending NULLS FIRST, DuckDB
  * NULLS LAST — the pinned direction makes the running FIRST_VALUE
  * engine-independent.
  */
object RefDisabled {

  private val fixture =
    """WITH emp(ename, deptno, gender) AS (VALUES
      |    ('Jane', 10, 'F'), ('Bob', 10, 'M'), ('Eric', 20, 'M'),
      |    ('Susan', 30, 'F'), ('Alice', 30, 'F'), ('Adam', 50, 'M'),
      |    ('Eve', 50, 'F'), ('Grace', 60, 'F'),
      |    ('Wilma', CAST(NULL AS INT), 'F')),
      |  dept(deptno, dname) AS (VALUES
      |    (10, 'Sales'), (20, 'Marketing'), (30, 'Engineering'),
      |    (40, 'Empty'))
      |""".stripMargin

  val defs: Seq[QDef] = Seq(

    // outer.iq disabled block: LEFT JOIN with a filtering ON condition —
    // every emp row survives; the dept columns attach only for matched
    // female rows.
    QDef.common("refdis_join_on_filter_left",
      fixture +
        """SELECT ename, emp.deptno AS e_dept, dept.deptno AS d_dept, dname
          |FROM emp LEFT JOIN dept
          |  ON emp.deptno = dept.deptno AND emp.gender = 'F'
          |ORDER BY ename"""),

    // outer.iq disabled block: FULL JOIN form — unmatched rows of BOTH
    // sides survive (the never-joined 'Empty' dept appears too).
    QDef.common("refdis_join_on_filter_full",
      fixture +
        """SELECT ename, emp.deptno AS e_dept, dept.deptno AS d_dept, dname
          |FROM emp FULL JOIN dept
          |  ON emp.deptno = dept.deptno AND emp.gender = 'F'
          |ORDER BY ename"""),

    // scalar.iq [CALCITE-709]: LIMIT inside correlated scalar subqueries —
    // LIMIT 1 over an aggregate (no-op), LIMIT 0 (always NULL), and the
    // ORDER BY + LIMIT 1 "first element" form.
    QDef.common("refdis_scalar_limit",
      fixture +
        """SELECT d.deptno,
          |  (SELECT SUM(e.deptno + 100) FROM emp e
          |   WHERE e.deptno = d.deptno LIMIT 1) AS agg_lim1,
          |  (SELECT SUM(e.deptno + 100) FROM emp e
          |   WHERE e.deptno = d.deptno LIMIT 0) AS agg_lim0,
          |  (SELECT e.ename FROM emp e
          |   WHERE e.deptno = d.deptno ORDER BY e.ename LIMIT 1) AS first_name
          |FROM dept d ORDER BY d.deptno"""),

    // winagg.iq disabled blocks: FIRST_VALUE over a global running frame,
    // a partition-only frame, and an explicit RANGE UNBOUNDED PRECEDING
    // frame.
    QDef.common("refdis_winagg_firstval",
      fixture +
        """SELECT ename, deptno, gender,
          |  first_value(ename) OVER (ORDER BY deptno NULLS LAST, ename) AS fv_global,
          |  first_value(ename) OVER (PARTITION BY deptno ORDER BY ename) AS fv_dept,
          |  first_value(ename) OVER (PARTITION BY deptno ORDER BY gender, ename
          |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fv_range
          |FROM emp ORDER BY ename"""),

    // outer.iq:138 disabled block ("we cannot handle non-equi-join"):
    // RIGHT JOIN whose ON clause carries the emp-side filter — every dept
    // row survives, emp columns attach only for matched female rows.
    QDef.common("refdis_join_on_filter_right",
      fixture +
        """SELECT ename, emp.deptno AS e_dept, dept.deptno AS d_dept, dname
          |FROM emp RIGHT JOIN dept
          |  ON emp.deptno = dept.deptno AND emp.gender = 'F'
          |ORDER BY d_dept, ename"""),

    // winagg.iq:187 disabled block ("Calcite does not yet generate tied
    // ranks"): COUNT(*) OVER (ORDER BY k) — the default RANGE frame makes
    // peer rows (ties on deptno) share one running count.
    QDef.common("refdis_window_tied_count",
      fixture +
        """SELECT ename, deptno,
          |  count(*) OVER (ORDER BY deptno NULLS LAST) AS c
          |FROM emp ORDER BY ename"""),

    // misc.iq:2124 disabled block — [CALCITE-2032] implicit conversion of
    // a character literal to a date in a comparison; both Spark and DuckDB
    // coerce natively.
    QDef.common("refdis_implicit_date_literal",
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |WHERE o_orderdate = '1996-01-02'
        |ORDER BY o_orderkey""")
  )
}
