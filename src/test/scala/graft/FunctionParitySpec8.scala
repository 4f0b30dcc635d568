package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function VALUE parity, tranche 13 (r15) — interval-operand
  * operators and the remaining operator-table families: interval
  * comparisons (<=, >=, <>), NULLIF/ABS/prefix-sign over intervals,
  * lazy boolean evaluation, ARRAY/MAP value constructors, chained
  * multiplicative/additive literal folding, and COT (reference:
  * core/src/test/java/org/apache/calcite/sql/test/SqlOperatorBaseTest.java
  * — testLessThanOrEqualOperatorInterval,
  * testGreaterThanOrEqualOperatorIntervals, testNotEqualsOperatorIntervals,
  * testNullIfOperatorIntervals, testAbsFuncIntervals,
  * testPrefixMinusOperatorIntervals, testPrefixPlusOperatorIntervals,
  * testAndOperatorLazy, testOrOperatorLazy, testArrayValueConstructor,
  * testMapValueConstructor, testComplexLiteral, testLiteralChain,
  * testCotFunc; values transcribed verbatim, cited per case). Same
  * harness discipline as FunctionParitySpec..7.
  *
  * Interval-valued results compare through equality probes
  * (`-interval '-6:2:8' hour to second = interval '6:2:8' hour to second`)
  * — the reference's "+6:02:08.000000" rendering is its own formatter,
  * the VALUE is what is ported (same adaptation as tranche 11's interval
  * canonicalization cases). The reference's lazy-evaluation rows accept
  * value-or-exception; Spark's sqrt(-4) is NaN (never an error), which is
  * the lazy outcome — the stronger of the two admitted behaviors. */
class FunctionParitySpec8 extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case class D(v: Double, tol: Double) extends Want
  private case object ERR extends Want

  private def value(expr: String): Any =
    spark.sql(s"select $expr as v").head().get(0)

  private def check(citation: String, expr: String, want: Want): Unit =
    test(s"$citation: $expr") {
      want match {
        case ERR =>
          val e = intercept[Exception](value(expr))
          assert(e.isInstanceOf[org.apache.spark.SparkThrowable] ||
            e.getCause != null && e.getCause.isInstanceOf[org.apache.spark.SparkThrowable] ||
            e.isInstanceOf[org.apache.spark.sql.AnalysisException],
            s"expected a rejection, got $e")
        case NULL => assert(value(expr) == null)
        case D(v, tol) =>
          val got = value(expr).toString.toDouble
          assert(math.abs(got - v) <= tol, s"expected $v +- $tol, got $got")
        case S(v) =>
          val got = value(expr)
          assert(got != null && got.toString == v, s"expected '$v', got '$got'")
      }
    }

  // ---- testLessThanOrEqualOperatorInterval -------------------------------
  check("testLessThanOrEqualOperatorInterval", "interval '2' day <= interval '1' day", S("false"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' day <= interval '5' day", S("true"))
  check("testLessThanOrEqualOperatorInterval", "interval '2 2:2:2' day to second <= interval '2' day", S("false"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' day <= interval '2' day", S("true"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' day <= interval '-2' day", S("false"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' day <= interval '2' hour", S("false"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' minute <= interval '2' hour", S("true"))
  check("testLessThanOrEqualOperatorInterval", "interval '2' second <= interval '2' minute", S("true"))
  check("testLessThanOrEqualOperatorInterval", "cast(null as interval hour) <= interval '2' minute", NULL)
  check("testLessThanOrEqualOperatorInterval", "interval '2:2' hour to minute <= cast(null as interval second)", NULL)

  // ---- testGreaterThanOrEqualOperatorIntervals ---------------------------
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' day >= interval '1' day", S("true"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' day >= interval '5' day", S("false"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2 2:2:2' day to second >= interval '2' day", S("true"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' day >= interval '2' day", S("true"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' day >= interval '-2' day", S("true"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' day >= interval '2' hour", S("true"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' minute >= interval '2' hour", S("false"))
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2' second >= interval '2' minute", S("false"))
  check("testGreaterThanOrEqualOperatorIntervals", "cast(null as interval hour) >= interval '2' minute", NULL)
  check("testGreaterThanOrEqualOperatorIntervals", "interval '2:2' hour to minute >= cast(null as interval second)", NULL)

  // ---- testNotEqualsOperatorIntervals ------------------------------------
  check("testNotEqualsOperatorIntervals", "interval '2' day <> interval '1' day", S("true"))
  check("testNotEqualsOperatorIntervals", "interval '2' day <> interval '2' day", S("false"))
  check("testNotEqualsOperatorIntervals", "interval '2:2:2' hour to second <> interval '2' hour", S("true"))
  check("testNotEqualsOperatorIntervals", "cast(null as interval hour) <> interval '2' minute", NULL)

  // ---- testNullIfOperatorIntervals (values via equality probes) ----------
  check("testNullIfOperatorIntervals",
    "nullif(interval '2' month, interval '3' year) = interval '2' month", S("true"))
  check("testNullIfOperatorIntervals",
    "nullif(interval '2 5' day to hour, interval '5' second) = interval '2 5' day to hour", S("true"))
  check("testNullIfOperatorIntervals", "nullif(interval '3' day, interval '3' day)", NULL)

  // ---- testAbsFuncIntervals ----------------------------------------------
  check("testAbsFuncIntervals", "abs(interval '-2' day) = interval '2' day", S("true"))
  check("testAbsFuncIntervals",
    "abs(interval '-5-03' year to month) = interval '5-3' year to month", S("true"))
  check("testAbsFuncIntervals", "abs(cast(null as interval hour))", NULL)

  // ---- testPrefixMinusOperatorIntervals ----------------------------------
  check("testPrefixMinusOperatorIntervals",
    "-interval '-6:2:8' hour to second = interval '6:2:8' hour to second", S("true"))
  check("testPrefixMinusOperatorIntervals",
    "- -interval '-6:2:8' hour to second = interval '-6:2:8' hour to second", S("true"))
  check("testPrefixMinusOperatorIntervals",
    "-interval '5' month = interval '-5' month", S("true"))
  check("testPrefixMinusOperatorIntervals", "-cast(null as interval day to minute)", NULL)

  // ---- testPrefixPlusOperatorIntervals -----------------------------------
  check("testPrefixPlusOperatorIntervals",
    "+interval '-6:2:8' hour to second = interval '-6:2:8' hour to second", S("true"))
  check("testPrefixPlusOperatorIntervals",
    "++interval '-6:2:8' hour to second = interval '-6:2:8' hour to second", S("true"))
  check("testPrefixPlusOperatorIntervals",
    "+interval '5' month = interval '5' month", S("true"))
  check("testPrefixPlusOperatorIntervals", "+cast(null as interval day to minute)", NULL)

  // ---- lazy boolean evaluation (testAndOperatorLazy, testOrOperatorLazy).
  // The reference admits value-or-exception; Spark's sqrt(-4) is NaN so
  // the value branch — the lazy outcome — is what executes.
  check("testAndOperatorLazy", "1 > 2 and sqrt(-4) = -2", S("false"))
  check("testOrOperatorLazy", "1 < cast(null as integer) or sqrt(-4) = -2", NULL)
  check("testOrOperatorLazy", "1 < 2 or sqrt(-4) = -2", S("true"))
  check("testOrOperatorLazy", "1 < cast(null as integer) or sqrt(4) = -2", NULL)
  check("testOrOperatorLazy", "1 < cast(null as integer) or sqrt(4) = 2", S("true"))

  // ---- testComplexLiteral -------------------------------------------------
  check("testComplexLiteral", "(select 2 * 2 * x from (select 2 as x))", S("8"))
  check("testComplexLiteral", "(select 1 * 2 * 3 * x from (select 2 as x))", S("12"))
  check("testComplexLiteral", "(select 1 + 2 + 3 + 4 + x from (select 2 as x))", S("12"))

  // ---- testArrayValueConstructor (bracket syntax → array(...) like the
  // .iq censuses' dialect rule) ---------------------------------------------
  test("testArrayValueConstructor: Array['foo', 'bar']") {
    val got = spark.sql("select array('foo', 'bar') as v").head().getSeq[String](0)
    assert(got == Seq("foo", "bar"))
  }

  // ---- testMapValueConstructor --------------------------------------------
  test("testMapValueConstructor: map['washington', 1, 'obama', 44]") {
    val got = spark.sql("select map('washington', 1, 'obama', 44) as v")
      .head().getMap[String, Int](0)
    assert(got == Map("washington" -> 1, "obama" -> 44))
  }
  check("testMapValueConstructor", "map(1, 'x', 2)", ERR) // odd argument count
  // "map[1, 1, 2, 'x'] — Parameters must be of the same type": Spark's
  // ANSI coercion casts the value to BIGINT and rejects 'x' at runtime —
  // both engines reject, at different phases
  check("testMapValueConstructor", "map(1, 1, 2, 'x')[2]", ERR)

  // ---- testCotFunc ---------------------------------------------------------
  check("testCotFunc", "cot(1)", D(0.6420926159343306, 1e-12))
  check("testCotFunc", "cot(cast(null as double))", NULL)

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS ----------
  test("divergence pin: empty ARRAY[] and MAP[] constructors are legal in Spark") {
    // testArrayValueConstructor "Require at least 1 argument" /
    // testMapValueConstructor "Map requires at least 2 arguments": Spark
    // types array() as ARRAY<STRING> and map() as MAP<STRING, STRING>
    assert(spark.sql("select array() as v").head().getSeq[Any](0).isEmpty)
    assert(spark.sql("select map() as v").head().getMap[Any, Any](0).isEmpty)
  }

  // ---- testLiteralChain: the SQL-standard adjacent-literal fold ----------
  check("testLiteralChain", "'buttered'\n' toast'", S("buttered toast"))
  check("testLiteralChain", "'corned'\n' beef'\n' on'\n' rye'", S("corned beef on rye"))
}
