package graft

import org.scalatest.funsuite.AnyFunSuite

/** Aggregate-function VALUE parity, tranche 14 (r15) — the reference's
  * checkAgg matrix: each aggregate evaluated over the same literal value
  * lists (reference: core/src/test/java/org/apache/calcite/sql/test/
  * SqlOperatorBaseTest.java — testCountFunc, testSumFunc, testAvgFunc,
  * testMinFunc, testMaxFunc, testAnyValueFunc, testBitAndFunc,
  * testBitOrFunc, testStddevPopFunc, testStddevSampFunc, testStddevFunc,
  * testVarPopFunc, testVarSampFunc, testVarFunc, testCovarPopFunc,
  * testCovarSampFunc, testRegrSxxFunc, testRegrSyyFunc, testListAggFunc,
  * testCollectFunc; values transcribed verbatim, cited per case). Same
  * harness discipline as FunctionParitySpec..8.
  *
  * Dialect adaptations (syntax only): COLLECT → collect_list (the .iq
  * censuses' rule; WITHIN GROUP ordering becomes sort_array), LISTAGG's
  * separator is spelled explicitly (Calcite's default is ',', Spark's is
  * '') and the reference's input-order concatenation is pinned through
  * WITHIN GROUP over an ordinal. Inputs are single-partition VALUES
  * relations, so input order is deterministic. */
class FunctionParitySpec9 extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case class D(v: Double, tol: Double) extends Want

  /** Evaluate `expr` over a one-column relation t(x) built from the
    * reference's literal list. */
  private def agg(citation: String, expr: String, values: Seq[String],
      want: Want): Unit =
    test(s"$citation: $expr over (${values.mkString(", ")})") {
      val rel =
        if (values.isEmpty) "(SELECT CAST(NULL AS INTEGER) AS x WHERE 1 = 0)"
        else s"(VALUES ${values.map("(" + _ + ")").mkString(", ")}) AS t(x)"
      val got = spark.sql(s"SELECT $expr AS v FROM $rel").head().get(0)
      want match {
        case NULL => assert(got == null, s"expected NULL, got $got")
        case D(v, tol) =>
          assert(got != null, s"expected $v, got NULL")
          val d = got.toString.toDouble
          assert(math.abs(d - v) <= tol, s"expected $v +- $tol, got $d")
        case S(v) => assert(got != null && got.toString == v,
          s"expected '$v', got '$got'")
      }
    }

  private val ints = Seq("0", "CAST(null AS INTEGER)", "2", "2")
  private val floats = Seq("CAST(0 AS FLOAT)", "CAST(null AS FLOAT)",
    "CAST(3 AS FLOAT)", "CAST(3 AS FLOAT)")
  private val counts = Seq("0", "CAST(null AS INTEGER)", "1", "0")
  private val strs = Seq("'a'", "CAST(NULL AS VARCHAR(1))", "''")

  // ---- testCountFunc -------------------------------------------------------
  agg("testCountFunc", "COUNT(x)", counts, S("3"))
  agg("testCountFunc", "COUNT(CASE x WHEN 0 THEN NULL ELSE -1 END)", counts, S("2"))
  agg("testCountFunc", "COUNT(DISTINCT x)", counts, S("2"))
  agg("testCountFunc", "COUNT(*)", strs, S("3"))
  agg("testCountFunc", "COUNT(x)", strs, S("2"))
  agg("testCountFunc", "COUNT(DISTINCT x)", strs, S("2"))
  agg("testCountFunc", "COUNT(DISTINCT 123)", strs, S("1"))

  // ---- testSumFunc ---------------------------------------------------------
  agg("testSumFunc", "sum(x)", ints, S("4"))
  agg("testSumFunc", "sum(CASE x WHEN 0 THEN NULL ELSE -1 END)", ints, S("-3"))
  agg("testSumFunc", "sum(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)", ints, S("-1"))
  agg("testSumFunc", "sum(DISTINCT x)", ints, S("2"))

  // ---- testAvgFunc ---------------------------------------------------------
  agg("testAvgFunc", "AVG(x)", floats, D(2d, 0))
  agg("testAvgFunc", "AVG(DISTINCT x)", floats, D(1.5d, 0))
  agg("testAvgFunc", "avg(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)",
    floats, D(-1d, 0))

  // ---- testMinFunc / testMaxFunc -------------------------------------------
  agg("testMinFunc", "min(x)", ints, S("0"))
  agg("testMinFunc", "min(CASE x WHEN 0 THEN NULL ELSE -1 END)", ints, S("-1"))
  agg("testMinFunc", "min(DISTINCT x)", ints, S("0"))
  agg("testMaxFunc", "max(x)", ints, S("2"))
  agg("testMaxFunc", "max(CASE x WHEN 0 THEN NULL ELSE -1 END)", ints, S("-1"))
  agg("testMaxFunc", "max(DISTINCT x)", ints, S("2"))

  // ---- testAnyValueFunc (single-partition VALUES: first value is THE value)
  agg("testAnyValueFunc", "any_value(x)", ints, S("0"))
  // the reference's ANY_VALUE yields a non-null when one exists; Spark's
  // spelling for that contract is the explicit ignoreNulls argument
  agg("testAnyValueFunc", "any_value(CASE x WHEN 0 THEN NULL ELSE -1 END, true)",
    ints, S("-1"))

  // ---- testBitAndFunc / testBitOrFunc ---------------------------------------
  agg("testBitAndFunc", "bit_and(x)", Seq("3", "2", "2"), S("2"))
  agg("testBitOrFunc", "bit_or(x)", Seq("1", "2", "2"), S("3"))

  // ---- testStddevPopFunc ----------------------------------------------------
  agg("testStddevPopFunc", "stddev_pop(x)", floats, D(1.414213562373095d, 1e-15))
  agg("testStddevPopFunc", "stddev_pop(DISTINCT x)", floats, D(1.5d, 0))
  agg("testStddevPopFunc", "stddev_pop(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)",
    floats, D(0d, 0))
  agg("testStddevPopFunc", "stddev_pop(x)", Seq("5"), D(0d, 0))
  agg("testStddevPopFunc", "stddev_pop(x)", Seq.empty, NULL)

  // ---- testStddevSampFunc / testStddevFunc ----------------------------------
  agg("testStddevSampFunc", "stddev_samp(x)", floats, D(1.732050807568877d, 1e-15))
  agg("testStddevSampFunc", "stddev_samp(DISTINCT x)", floats, D(2.121320343559642d, 1e-15))
  agg("testStddevSampFunc", "stddev_samp(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)",
    floats, NULL)
  agg("testStddevSampFunc", "stddev_samp(x)", Seq.empty, NULL)
  agg("testStddevFunc", "stddev(x)", floats, D(1.732050807568877d, 1e-15))
  agg("testStddevFunc", "stddev(x)", Seq.empty, NULL)

  // ---- testVarPopFunc / testVarSampFunc / testVarFunc ------------------------
  agg("testVarPopFunc", "var_pop(x)", floats, D(2d, 0))
  agg("testVarPopFunc", "var_pop(DISTINCT x)", floats, D(2.25d, 0.0001))
  agg("testVarPopFunc", "var_pop(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)",
    floats, D(0d, 0))
  agg("testVarPopFunc", "var_pop(x)", Seq("5"), D(0d, 0))
  agg("testVarPopFunc", "var_pop(x)", Seq.empty, NULL)
  agg("testVarSampFunc", "var_samp(x)", floats, D(3d, 0))
  agg("testVarSampFunc", "var_samp(DISTINCT x)", floats, D(4.5d, 0.0001))
  agg("testVarSampFunc", "var_samp(DISTINCT CASE x WHEN 0 THEN NULL ELSE -1 END)",
    floats, NULL)
  agg("testVarSampFunc", "var_samp(x)", Seq.empty, NULL)
  agg("testVarFunc", "variance(x)", floats, D(3d, 0))
  agg("testVarFunc", "variance(x)", Seq.empty, NULL)

  // ---- testCovarPopFunc / testCovarSampFunc / testRegrSxxFunc / testRegrSyyFunc
  // (the reference's enabled rows are the zero-input NULLs)
  agg("testCovarPopFunc", "covar_pop(x, x)", Seq.empty, NULL)
  agg("testCovarSampFunc", "covar_samp(x, x)", Seq.empty, NULL)
  agg("testRegrSxxFunc", "regr_sxx(x, x)", Seq.empty, NULL)
  agg("testRegrSyyFunc", "regr_syy(x, x)", Seq.empty, NULL)

  // ---- testListAggFunc (explicit ',' separator — Calcite's default; order
  // pinned through WITHIN GROUP over the input ordinal) -----------------------
  test("testListAggFunc: listagg over ('hello', null, 'world', '!')") {
    val got = spark.sql(
      """SELECT listagg(x, ',') WITHIN GROUP (ORDER BY i) AS v
        |FROM (VALUES ('hello', 1), (CAST(null AS STRING), 2),
        |             ('world', 3), ('!', 4)) AS t(x, i)""".stripMargin)
      .head().getString(0)
    assert(got == "hello,world,!")
  }
  test("testListAggFunc: listagg over casted ints 0..3") {
    val got = spark.sql(
      """SELECT listagg(CAST(x AS STRING), ',') WITHIN GROUP (ORDER BY x) AS v
        |FROM (VALUES (0), (1), (2), (3)) AS t(x)""".stripMargin)
      .head().getString(0)
    assert(got == "0,1,2,3")
  }

  // ---- testCollectFunc (COLLECT → collect_list, the .iq dialect rule) --------
  test("testCollectFunc: collect(x) over (0, null, 2, 2)") {
    val got = spark.sql(
      "SELECT collect_list(x) AS v FROM (VALUES (0), (CAST(null AS INT)), (2), (2)) AS t(x)")
      .head().getSeq[Int](0)
    assert(got == Seq(0, 2, 2))
  }
  test("testCollectFunc: collect(x) within group (order by x desc)") {
    val got = spark.sql(
      """SELECT sort_array(collect_list(x), false) AS v
        |FROM (VALUES (0), (CAST(null AS INT)), (2), (2)) AS t(x)""".stripMargin)
      .head().getSeq[Int](0)
    assert(got == Seq(2, 2, 0))
  }
}
