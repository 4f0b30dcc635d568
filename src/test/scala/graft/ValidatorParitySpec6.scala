package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 8 (r15) — DML statement validation:
  * INSERT column-list/arity/type errors, UPDATE and DELETE column and
  * expression errors, MERGE resolution errors, structured-type field
  * access errors, table-function and CURSOR/procedure call errors, and
  * LATERAL scope errors. One case per reference assertion family, cited
  * per family. Same contract as tranches 1-7 (ValidatorParitySpec..5):
  * each statement must be REJECTED before any data moves; accepted-control
  * twins guard vacuity; reference-rejects Spark ACCEPTS are pinned as
  * documented divergences.
  *
  * DML control twins need one nuance: Spark's v1 parquet tables have no
  * row-level mutation capability, so a SEMANTICALLY VALID UPDATE / DELETE
  * / MERGE still throws — but with the CAPABILITY error
  * (UNSUPPORTED_FEATURE.TABLE_OPERATION), which fires only AFTER the
  * statement resolved and type-checked. The controls therefore assert the
  * failure is exactly the capability gate, proving the validator accepted
  * the statement (the engine's own row-level DML runs through the
  * copy-on-write plans in operators/TableModify.scala).
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testInsertWithNonEqualSourceSinkFieldsNum:9000,
  * testInsertFailNullability:9321, testInsertFailCaseSensitivity:9557,
  * testInsertFailExcludedColumn:9575, testInsertExtendedColumnFailDuplicate:10231,
  * testInsertFailDataType:10269, testUpdateFailDataType:10286,
  * testUpdateFailCaseSensitivity:10300, testDelete:10557,
  * testStructuredTypes:7692, testCollectionTable:7910,
  * testCollectionTableWithLateral2:7965,
  * testCollectionTableWithCursorParam:7976) and the MERGE statement
  * grammar of core/src/test/java/org/apache/calcite/sql/parser/
  * SqlParserTest.java:3841-3906 (validated through the same
  * INSERT/UPDATE column rules once parsed). */
class ValidatorParitySpec6 extends AnyFunSuite {
  import SparkTestSession._

  /** A real catalog table (not a temp view): INSERT/UPDATE/DELETE/MERGE
    * column-list validation only runs against resolvable catalog relations. */
  private lazy val fixtures: Unit = {
    spark.sql("DROP TABLE IF EXISTS vp6_emp")
    spark.sql(
      """CREATE TABLE vp6_emp (empno INT, ename STRING, deptno INT, sal DOUBLE)
        |USING parquet LOCATION 'target/vp6_emp'""".stripMargin)
    spark.sql(
      """SELECT named_struct('zip', 10, 'city', 'a') AS home_address,
        |  named_struct('zip', 20, 'city', 'b') AS mailing_address, 1 AS empno
        |FROM range(2)""".stripMargin)
      .createOrReplaceTempView("vp6_emp_address")
  }

  private val rejects: Seq[(String, String)] = Seq(
    // ---- INSERT arity (testInsertWithNonEqualSourceSinkFieldsNum:9000) --
    ("INSERT column list narrower than the source select",
      "insert into vp6_emp (empno, ename) select 1, 'a', 2"),
    ("INSERT VALUES wider than the table",
      "insert into vp6_emp values (1, 'a', 2, 3.0, 99)"),
    ("INSERT VALUES narrower than the table (no column list)",
      "insert into vp6_emp values (1, 'a')"),
    // ---- INSERT column-list resolution (testInsertFailExcludedColumn:9575,
    // testInsertFailCaseSensitivity:9557 'Unknown target column') ---------
    ("INSERT with an unknown target column",
      "insert into vp6_emp (empno, bogus) values (1, 'x')"),
    ("INSERT into a nonexistent table",
      "insert into vp6_no_such_table values (1)"),
    // ---- duplicate name in the INSERT column list
    // (testInsertExtendedColumnFailDuplicate:10231) -----------------------
    ("INSERT with a duplicate column in the column list",
      "insert into vp6_emp (empno, empno) values (1, 2)"),
    // ---- INSERT assignment typing (testInsertFailDataType:10269) --------
    ("INSERT a struct into an INT column",
      "insert into vp6_emp values (named_struct('a', 1), 'b', 1, 1.0)"),
    ("INSERT a non-numeric string into an INT column",
      "insert into vp6_emp values ('notanint', 'a', 1, 1.0)"),
    ("INSERT an array into a DOUBLE column",
      "insert into vp6_emp values (1, 'a', 1, array(1.0))"),
    // ---- UPDATE column resolution (testUpdateFailCaseSensitivity:10300
    // 'Unknown target column', testDelete:10557 WHERE resolution) ---------
    ("UPDATE SET of an unknown column",
      "update vp6_emp set bogus = 1 where empno = 1"),
    ("UPDATE WHERE referencing an unknown column",
      "update vp6_emp set sal = 1.0 where bogus = 1"),
    ("UPDATE of a nonexistent table",
      "update vp6_no_such_table set x = 1"),
    // ---- UPDATE assignment typing (testUpdateFailDataType:10286) --------
    ("UPDATE SET a struct into a DOUBLE column",
      "update vp6_emp set sal = named_struct('a', 1) where empno = 1"),
    ("UPDATE SET an array into an INT column",
      "update vp6_emp set deptno = array(1, 2)"),
    // ---- aggregate / window expressions where the validator forbids them
    ("UPDATE SET with an aggregate",
      "update vp6_emp set sal = sum(sal)"),
    ("DELETE WHERE with a window function",
      "delete from vp6_emp where rank() over (order by sal) = 1"),
    ("DELETE WHERE referencing an unknown column",
      "delete from vp6_emp where bogus = 1"),
    // ---- MERGE resolution (the parser corpus' merge statements validate
    // through the same column rules: SqlParserTest.java:3841-3906) --------
    ("MERGE with an unknown column in the ON condition",
      """merge into vp6_emp t using vp6_emp s on t.bogus = s.empno
        |when matched then update set ename = s.ename""".stripMargin),
    ("MERGE UPDATE SET from an unknown source column",
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when matched then update set ename = s.nope""".stripMargin),
    ("MERGE INSERT with an unknown target column",
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when not matched then insert (bogus) values (1)""".stripMargin),
    ("MERGE with a nonexistent source table",
      """merge into vp6_emp t using vp6_no_such_src s on t.empno = s.empno
        |when matched then delete""".stripMargin),
    ("MERGE with an aggregate in a WHEN MATCHED condition",
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when matched and sum(s.sal) > 1 then delete""".stripMargin),
    ("MERGE INSERT VALUES arity mismatch with its column list",
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when not matched then insert (empno) values (1, 2)""".stripMargin),
    // ---- structured-type field access (testStructuredTypes:7692) --------
    ("unknown field of a struct column",
      "select ea.home_address.bogus from vp6_emp_address ea"),
    ("field extraction from a scalar column",
      "select ea.empno.zip from vp6_emp_address ea"),
    ("field extraction past a leaf field",
      "select home_address.city.x from vp6_emp_address"),
    // ---- table-function calls (testCollectionTable:7910) ----------------
    ("unknown table-valued function",
      "select * from vp6_no_such_tvf(1)"),
    ("table function with too many arguments",
      "select * from range(1, 2, 3, 4, 5)"),
    ("generator applied to a scalar",
      "select * from explode(1)"),
    ("generator with too many arguments",
      "select * from posexplode(array(1), array(2))"),
    // ---- CURSOR parameters (testCollectionTableWithCursorParam:7976 —
    // the reference resolves inside the cursor; Spark has no CURSOR
    // construct at all, rejecting the whole call one stage earlier) -------
    ("CURSOR-parameterized table function call",
      "select * from table(dedup(cursor(select * from vp6_emp), 'ename'))"),
    // ---- procedure calls (the reference validates CALL against its
    // routine namespace; Spark rejects CALL against a catalog without
    // procedure support — both reject before execution) -------------------
    ("CALL of an unknown procedure",
      "call vp6_no_such_proc(1)"),
    // ---- LATERAL scope (testCollectionTableWithLateral2:7965) -----------
    ("LATERAL item referencing its own alias",
      "select * from vp6_emp, lateral (select z.empno) as z"),
    ("LATERAL item referencing a table that appears later in FROM",
      "select * from lateral (select d.sal + 1 as s2 from range(1)) l, vp6_emp d"))

  for ((name, sql) <- rejects)
    test(s"rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        // analysis alone for queries; DML commands resolve (and would
        // execute) inside sql() itself — both reject before any data moves
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[IllegalArgumentException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
      // the DML capability gate must NOT be what rejected these: each case
      // must die in resolution/typing, not at "parquet can't mutate rows"
      assert(!String.valueOf(ex.getMessage).contains("TABLE_OPERATION"),
        s"case fell through to the capability gate (validator accepted it): ${ex.getMessage}")
    }

  // ---- documented divergences -------------------------------------------
  test("divergence pin: NOT NULL nullability is enforced at runtime, not validation") {
    fixtures
    // the reference rejects INSERT of NULL into a NOT NULL column at
    // validation (testInsertFailNullability:9321); Spark's v1 parquet
    // tables carry nullability as metadata and enforce on write — the
    // statement ANALYZES cleanly (no resolution/type error)
    val plan = spark.sql(
      "insert into vp6_emp values (null, null, 1, 1.0)")
    assert(plan != null)
  }

  test("divergence pin: case-insensitive column resolution the reference rejects") {
    fixtures
    // Calcite (case-sensitive quoted identifiers) rejects "EMPNO" vs empno
    // (testInsertFailCaseSensitivity:9557); Spark resolves case-insensitively
    Seq(
      "insert into vp6_emp (EMPNO, ENAME) values (7, 'ok-case')",
      "select EA.HOME_ADDRESS.ZIP from vp6_emp_address EA")
      .foreach(q => assert(spark.sql(q) != null, q))
  }

  test("divergence pin: MERGE semantic checks the reference runs at validation, Spark at capability/runtime") {
    fixtures
    // duplicate SET assignment, non-boolean ON, subquery in a WHEN
    // condition: the reference's validator rejects each outright; Spark's
    // analyzer accepts them and only the parquet capability gate throws —
    // asserting TABLE_OPERATION proves resolution/typing passed
    Seq(
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when matched then update set sal = 1.0, sal = 2.0""".stripMargin,
      """merge into vp6_emp t using vp6_emp s on 42
        |when matched then delete""".stripMargin,
      """update vp6_emp set sal = 1.0, sal = 2.0""")
      .foreach { q =>
        val ex = intercept[Exception](spark.sql(q))
        assert(String.valueOf(ex.getMessage).contains("TABLE_OPERATION"),
          s"expected the capability gate (validator-accepted), got: ${ex.getMessage}")
      }
  }

  test("control: valid UPDATE/DELETE/MERGE reach the capability gate (analysis passed)") {
    fixtures
    Seq(
      "update vp6_emp set sal = 1.0 where empno = 1",
      "delete from vp6_emp where empno = 1",
      """merge into vp6_emp t using vp6_emp s on t.empno = s.empno
        |when matched then update set ename = s.ename
        |when not matched then insert (empno, ename) values (s.empno, s.ename)""".stripMargin)
      .foreach { q =>
        val ex = intercept[Exception](spark.sql(q))
        assert(String.valueOf(ex.getMessage).contains("TABLE_OPERATION"),
          s"control should die ONLY at the capability gate: ${ex.getMessage}")
      }
  }

  test("control: the accepted twins of the non-DML rejection families analyze cleanly") {
    fixtures
    Seq(
      "select ea.home_address.zip from vp6_emp_address ea",
      "select ea.mailing_address.city from vp6_emp_address ea",
      "select * from range(1, 5, 2)",
      "select * from explode(array(1, 2))",
      "select * from posexplode(array(1, 2))",
      "select * from vp6_emp d, lateral (select d.sal + 1 as s2) l")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
    // INSERT control actually lands a row (parquet supports append)
    spark.sql("insert into vp6_emp values (1, 'a', 1, 1.0)")
    assert(spark.sql("select * from vp6_emp where empno = 1").count() >= 1)
  }
}
