package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 5 (r13 VERDICT #4): sub-query
  * cardinality/shape errors, IN/quantified-list type errors, record-type
  * field errors, temporal-table (FOR SYSTEM_TIME) errors, and
  * grouped-window auxiliary-function validation — one representative
  * case per reference test method, cited per case. Same contract as
  * [[ValidatorParitySpec]]/[[ValidatorParitySpec2]]: each statement must
  * be REJECTED before execution, matching the reference's negative
  * assertion; accepted-control twins guard against vacuity.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testInList:4863, testInSubQuery:4915,
  * testAnyList:4927, testTemporalTable:7983, testScalarSubQuery:8004,
  * testRecordType:8031, testArrayOfRecordType:8057,
  * testStreamTumble:10076, testStreamHop:10126, testStreamSession).
  * Grouped-window cases raise inside graft's stream front end
  * (streaming/StreamSql.rewriteGroupedWindows — the reference
  * SqlValidatorImpl's auxiliary-group-function matching re-expressed
  * over the window()/session_window() lowering).
  */
class ValidatorParitySpec3 extends AnyFunSuite {
  import SparkTestSession._

  private lazy val fixtures: Unit = {
    spark.sql(
      """SELECT * FROM VALUES
        |  ('Jane', 10, 1000.0), ('Bob', 20, 2000.0)
        |AS t(ename, deptno, sal)""".stripMargin)
      .createOrReplaceTempView("vp3_emp")
    spark.sql(
      """SELECT * FROM VALUES (10, 'Sales'), (20, 'Marketing')
        |AS t(deptno, dname)""".stripMargin)
      .createOrReplaceTempView("vp3_dept")
    // the reference's customer.contact with a COORD record column
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, named_struct('x', 1, 'y', 2))
        |AS t(id, coord)""".stripMargin)
      .createOrReplaceTempView("vp3_contact")
    // a NON-temporal table (no period columns) for testTemporalTable
    spark.sql("SELECT * FROM VALUES (1, 'p') AS t(productid, name)")
      .createOrReplaceTempView("vp3_products")
  }

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testInList:4863 — IN value-list type errors ------------------
    ("testInList — scalar IN list of mixed scalar/struct",
      "select 1 in (struct(2), struct(3, 4))"),
    ("testInList — row IN scalar list ((1,2) in (3, 4))",
      "select (struct(1, 2)) in (3, 4)"),
    ("testInList — row IN dates ((1,2) in (date, date))",
      "select (struct(1, 2)) in (date '2012-01-02', date '2012-01-04')"),
    // ---- testInSubQuery:4915 — column-count mismatch ------------------
    ("testInSubQuery — scalar IN two-column sub-query",
      "select * from vp3_emp where deptno in (select deptno, deptno from vp3_dept)"),
    ("testInSubQuery — two-column row IN one-column sub-query",
      "select * from vp3_emp where (ename, deptno) in (select deptno from vp3_dept)"),
    // ---- testAnyList:4927 — quantified comparison shape. Spark's
    // grammar has no quantified comparisons at all (the engine's
    // ANY/SOME/ALL surface is the some.iq census's MIN/MAX rewrite,
    // SomeIqSpec.quantify), so the malformed forms reject at PARSE —
    // one step earlier than the reference's validator, same outcome ----
    ("testAnyList — scalar < ANY two-column sub-query",
      "select * from vp3_emp where deptno < any (select deptno, deptno from vp3_dept)"),
    ("testAnyList — scalar = SOME two-column sub-query",
      "select * from vp3_emp where deptno = some (select deptno, dname from vp3_dept)"),
    // ---- testScalarSubQuery:8004 — multi-column scalar sub-query ------
    ("testScalarSubQuery — two-column scalar sub-query in SELECT",
      "select ename, (select deptno, dname from vp3_dept where deptno = 10) from vp3_emp"),
    ("testScalarSubQuery — two-column scalar sub-query under + ",
      "select ename, 1 + (select deptno, deptno from vp3_dept where deptno = 10) from vp3_emp"),
    // ---- testRecordType:8031 / testArrayOfRecordType:8057 -------------
    ("testRecordType — unqualified record alias ('Table COORD not found')",
      "select coordx.x from vp3_contact"),
    ("testArrayOfRecordType — unknown nested field ('Unknown field NE')",
      "select coord.ne from vp3_contact"),
    // ---- testTemporalTable:7983 ---------------------------------------
    ("testTemporalTable — FOR SYSTEM_TIME on a non-temporal table",
      "select * from vp3_products for system_time as of timestamp '2011-01-02 00:00:00'"),
    ("testTemporalTable — AS OF a non-timestamp operand",
      "select * from vp3_products for system_time as of 'not-a-time'"))

  for ((name, sql) <- rejects)
    test(s"rejects: $name") {
      fixtures
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[IllegalArgumentException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  // ---- grouped-window auxiliary validation (testStreamTumble:10076,
  // testStreamHop:10126, testStreamSession) — raised by the stream front
  // end's rewrite, before any plan is built -----------------------------
  private def mustRejectWindowed(name: String, sql: String, fragment: String): Unit =
    test(s"rejects: $name") {
      val ex = intercept[IllegalArgumentException] {
        graft.streaming.StreamSql.rewriteGroupedWindows(sql)
      }
      assert(ex.getMessage.contains(fragment),
        s"expected '$fragment' in: ${ex.getMessage}")
    }

  mustRejectWindowed(
    "testStreamTumble — TUMBLE in SELECT list ('can only appear in GROUP BY')",
    """SELECT STREAM tumble(rowtime, INTERVAL '2' HOUR) AS rowtime FROM orders
      |GROUP BY tumble(rowtime, INTERVAL '2' HOUR), productId""".stripMargin,
    "Group function 'TUMBLE' can only appear in GROUP BY clause")
  mustRejectWindowed(
    "testStreamTumble — TUMBLE_END without matching TUMBLE",
    """SELECT STREAM tumble_end(rowtime, INTERVAL '2' HOUR) AS rowtime FROM orders
      |GROUP BY floor(rowtime TO HOUR)""".stripMargin,
    "Call to auxiliary group function 'TUMBLE_END' must have matching call")
  mustRejectWindowed(
    "testStreamTumble — TUMBLE_START with different align argument",
    """SELECT STREAM tumble_start(rowtime, INTERVAL '2' HOUR, time '00:13:00')
      |FROM orders GROUP BY tumble(rowtime, INTERVAL '2' HOUR, time '00:12:00')""".stripMargin,
    "Call to auxiliary group function 'TUMBLE_START' must have matching call")
  mustRejectWindowed(
    "testStreamTumble — structural (not semantic) equivalence: explicit default align",
    """SELECT STREAM tumble_end(rowtime, INTERVAL '2' HOUR, time '00:00:00')
      |FROM orders GROUP BY tumble(rowtime, INTERVAL '2' HOUR)""".stripMargin,
    "Call to auxiliary group function 'TUMBLE_END' must have matching call")
  mustRejectWindowed(
    "testStreamHop — HOP_START with mismatched intervals",
    """SELECT STREAM hop_start(rowtime, INTERVAL '1' HOUR, INTERVAL '2' HOUR)
      |FROM orders GROUP BY hop(rowtime, INTERVAL '1' HOUR, INTERVAL '3' HOUR)""".stripMargin,
    "Call to auxiliary group function 'HOP_START' must have matching call")
  mustRejectWindowed(
    "testStreamSession — SESSION_END against HOP group",
    """SELECT STREAM session_end(rowtime, INTERVAL '1' HOUR)
      |FROM orders GROUP BY hop(rowtime, INTERVAL '1' HOUR, INTERVAL '3' HOUR)""".stripMargin,
    "Call to auxiliary group function 'SESSION_END' must have matching call")

  test("control: matching grouped-window auxiliaries are accepted and lowered") {
    val ok = graft.streaming.StreamSql.rewriteGroupedWindows(
      """SELECT STREAM tumble_end(rowtime, INTERVAL '2' HOUR) AS rowtime FROM orders
        |GROUP BY tumble(rowtime, INTERVAL '2' HOUR), productId""".stripMargin)
    assert(ok.contains("window.end") && ok.contains("window(rowtime, '2 hour')"))
    val hop = graft.streaming.StreamSql.rewriteGroupedWindows(
      """SELECT STREAM hop_start(rowtime, INTERVAL '1' HOUR, INTERVAL '3' HOUR)
        |FROM orders GROUP BY hop(rowtime, INTERVAL '1' HOUR, INTERVAL '3' HOUR)""".stripMargin)
    assert(hop.contains("window.start"))
  }

  test("control: the accepted twins of the rejection families analyze cleanly") {
    fixtures
    // IN sub-query, row IN, quantified ANY, scalar sub-query, record field
    Seq(
      "select * from vp3_emp where deptno in (select deptno from vp3_dept)",
      "select * from vp3_emp where (ename, deptno) in (select dname, deptno from vp3_dept)",
      // the quantified twin goes through the engine's rewrite (SomeIqSpec)
      "select * from vp3_emp where deptno < (select max(deptno) from vp3_dept)",
      "select ename, (select dname from vp3_dept where deptno = 10) from vp3_emp",
      "select coord.x, coord.y from vp3_contact")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
