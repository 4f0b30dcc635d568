package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator parity, tranche 24 (r17) — schema-qualified name
  * resolution (against a real `sales` database), ROLLUP nullability
  * widening, and the EXTEND column-list validation rules (reference:
  * core/src/test/java/org/apache/calcite/test/SqlValidatorTest.java;
  * method names cited per case).
  */
class ValidatorParitySpec21 extends AnyFunSuite {
  import SparkTestSession._

  // a REAL catalog table (temp views live outside databases), torn down
  // by the zzz test; `semp` not `emp` so the shared session's temp view
  // cannot shadow it
  private lazy val fixture: Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS sales")
    spark.sql("DROP TABLE IF EXISTS sales.semp")
    spark.sql("CREATE TABLE sales.semp (empno INT, deptno INT) USING PARQUET")
    spark.sql("""CREATE OR REPLACE TEMP VIEW vp21_emp AS
      SELECT CAST(id AS INT) AS empno, concat('E', id) AS ename,
             CAST(1000 + id AS INT) AS sal, CAST(id % 4 AS INT) AS deptno
      FROM range(20)""")
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
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[IllegalArgumentException],
        s"expected analysis/parse rejection, got ${ex.getClass}")
    }

  // ---- schema-qualified columns (testSchemaTableColumn:5047) ---------------
  okSql("testSchemaTableColumn", "select semp.empno from sales.semp")
  okSql("testSchemaTableColumn", "select sales.semp.empno from sales.semp")
  okSql("testSchemaTableColumn",
    "select sales.semp.empno from sales.semp where sales.semp.deptno > 0")
  rejected("testSchemaTableColumn",
    "select 1 from sales.semp where sales.semp.bad < 0")
  rejected("testSchemaTableColumn",
    "select sales.bad.empno from sales.semp where sales.semp.deptno > 0")
  okSql("testSchemaTableColumn", "select 1 from sales.semp order by sales.semp.deptno")
  // alias hides the fully-qualified name (consistent with MySQL and the
  // reference)
  rejected("testSchemaTableColumn",
    "select sales.semp.deptno from sales.semp as e")
  // pinned divergence: the reference keeps the fully-qualified name
  // visible when the alias EQUALS the table name; Spark's alias replaces
  // qualification unconditionally
  rejected("testSchemaTableColumn (divergence: alias always hides)",
    "select sales.semp.deptno from sales.semp as semp")

  // ---- schema-qualified star (testSchemaTableStar:5033) ----------------------
  okSql("testSchemaTableStar", "select sales.semp.* from sales.semp")
  rejected("testSchemaTableStar", "select sales.semp.* from sales.semp as e")

  // ---- schema-qualified GROUP BY (testSchemaTableColumnInGroupBy:5080) -------
  okSql("testSchemaTableColumnInGroupBy",
    "select 1 from sales.semp group by sales.semp.deptno")
  okSql("testSchemaTableColumnInGroupBy",
    "select deptno from sales.semp group by sales.semp.deptno")
  okSql("testSchemaTableColumnInGroupBy",
    "select deptno + 1 from sales.semp group by sales.semp.deptno")

  // ---- ROLLUP nullability widening (testRollup:?) -----------------------------
  test("testRollup: rolled-up keys widen to nullable, others keep NOT NULL") {
    fixture
    def nullability(sql: String): Seq[Boolean] =
      spark.sql(sql).schema.map(_.nullable)
    // deptno is NOT NULL in the view, but rollup introduces nulls
    assert(nullability(
      "select deptno, count(*) as c from vp21_emp group by rollup(deptno)")
      == Seq(true, false))
    // empno stays NOT NULL because it is not rolled up
    assert(nullability(
      "select deptno, empno from vp21_emp group by empno, rollup(deptno)")
      == Seq(true, false))
    // pinned divergence: with the plain key AFTER the rollup, Calcite
    // keeps the non-rolled key NOT NULL; Spark's grouping-analytics
    // resolution widens it too (key-before-rollup keeps NOT NULL — the
    // case above)
    assert(nullability(
      "select deptno, empno from vp21_emp group by rollup(empno), deptno")
      == Seq(true, true))
  }

  // ---- window partition over join alias (testPartitionByColumnInJoinAlias
  //      :4561) -----------------------------------------------------------------
  okSql("testPartitionByColumnInJoinAlias",
    "select sum(1) over(partition by t1.ename) from vp21_emp t1, vp21_emp t2")
  rejected("testPartitionByColumnInJoinAlias (ambiguous partition key)",
    "select sum(1) over(partition by deptno) from vp21_emp t1, vp21_emp t2")

  // ---- EXTEND column-list validation (testTableExtend:?,
  //      testSelectExtendedColumnDuplicate:?, testSelectExtendedColumnCollision
  //      :?, testSelectExtendedColumnFailCollision:? — through ExtendSql's
  //      SELECT surface; the EMP_MODIFIABLEVIEW rows are fixture-bound and
  //      censused non-portable) --------------------------------------------------
  test("testTableExtend: extend appends the typed column to the row type") {
    val dir = sfDir
    Tables.registerAll(spark, dir)
    val df = spark.sql("select * from nation extend (x int)")
    assert(df.schema.fieldNames.last == "x" &&
      df.schema.fields.last.dataType.simpleString == "int")
    val z = spark.sql(
      "select n_nationkey + x as z from nation extend (x int) where n_nationkey > 10")
    assert(z.schema.map(_.name) == Seq("z"))
  }
  test("testSelectExtendedColumnDuplicate: duplicate name in extend list rejects") {
    val dir = sfDir
    Tables.registerAll(spark, dir)
    val ex = intercept[Exception] {
      spark.sql("select * from nation extend (extra int, extra int)")
    }
    assert(ex.getMessage.contains("Duplicate name 'EXTRA'"), ex.getMessage)
  }
  test("testSelectExtendedColumnCollision: redeclaring a column at its own type is a no-op") {
    val dir = sfDir
    Tables.registerAll(spark, dir)
    val df = spark.sql("select * from nation extend (n_regionkey int)")
    assert(df.schema.fieldNames.count(_.equalsIgnoreCase("n_regionkey")) == 1)
  }
  test("testSelectExtendedColumnFailCollision: redeclaring at a different type rejects") {
    val dir = sfDir
    Tables.registerAll(spark, dir)
    val ex = intercept[Exception] {
      spark.sql("select * from nation extend (n_regionkey boolean)")
    }
    assert(ex.getMessage.contains("Cannot assign to target field"), ex.getMessage)
  }

  test("zzz cleanup: sales database dropped") {
    spark.sql("DROP TABLE IF EXISTS sales.semp")
    spark.sql("DROP DATABASE IF EXISTS sales")
    succeed
  }
}
