package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function VALUE parity, tranche 11 (r15) — interval
  * canonicalization: the reference validates every interval literal by
  * converting it to canonical months (year-month family) or canonical
  * milliseconds (day-time family) — testIntervalMonthsConversion:1763 and
  * testIntervalMillisConversion:1770 in core/src/test/java/org/apache/
  * calcite/test/SqlValidatorTest.java pin those conversions. The
  * observable twin here: two interval spellings are EQUAL iff their
  * canonical forms agree, so each reference conversion row becomes an
  * equality between the tested literal and its canonical-unit spelling
  * (e.g. INTERVAL '3-2' YEAR TO MONTH ↔ 38 months). Spark's year-month
  * intervals canonicalize to months and day-time intervals to
  * microseconds, so every row agrees except sub-millisecond fractions —
  * pinned below (Calcite truncates to millis: '1.12345' SECOND → 1123 ms;
  * Spark keeps 1.123450 s). */
class FunctionParitySpec6 extends AnyFunSuite {
  import SparkTestSession._

  private def isTrue(expr: String): Unit =
    assert(spark.sql(s"select $expr as v").head().getBoolean(0), expr)

  private def check(citation: String, expr: String): Unit =
    test(s"$citation: $expr")(isTrue(expr))

  // ---- testIntervalMonthsConversion:1763 ---------------------------------
  check("testIntervalMonthsConversion:1763",
    "interval '1' year = interval '12' month")
  check("testIntervalMonthsConversion:1763",
    "interval '5' month = interval '5' month")
  check("testIntervalMonthsConversion:1763",
    "interval '3-2' year to month = interval '38' month")
  check("testIntervalMonthsConversion:1763",
    "interval '-5-4' year to month = interval '-64' month")

  // ---- testIntervalMillisConversion:1770 ---------------------------------
  check("testIntervalMillisConversion:1770",
    "interval '1' day = interval '86400' second")
  check("testIntervalMillisConversion:1770",
    "interval '1' hour = interval '3600' second")
  check("testIntervalMillisConversion:1770",
    "interval '1' minute = interval '60' second")
  check("testIntervalMillisConversion:1770",
    "interval '1' second = interval '1' second")
  check("testIntervalMillisConversion:1770",
    "interval '1:05' hour to minute = interval '3900' second")
  check("testIntervalMillisConversion:1770",
    "interval '1:05' minute to second = interval '65' second")
  check("testIntervalMillisConversion:1770",
    "interval '1 1' day to hour = interval '90000' second")
  check("testIntervalMillisConversion:1770",
    "interval '1 1:05' day to minute = interval '90300' second")
  check("testIntervalMillisConversion:1770",
    "interval '1 1:05:03' day to second = interval '90303' second")
  check("testIntervalMillisConversion:1770",
    "interval '1 1:05:03.12345' day to second = interval '90303.12345' second")
  check("testIntervalMillisConversion:1770",
    "interval '1:05.12345' minute to second = interval '65.12345' second")
  check("testIntervalMillisConversion:1770",
    "interval '1:05:03' hour to second = interval '3903' second")
  check("testIntervalMillisConversion:1770",
    "interval '1:05:03.12345' hour to second = interval '3903.12345' second")

  // ---- documented divergence ---------------------------------------------
  test("divergence pin: sub-millisecond interval fractions survive in Spark") {
    // Calcite canonicalizes '1.12345' SECOND to 1123 milliseconds
    // (truncation at millis — testIntervalMillisConversion row "1123");
    // Spark's day-time interval is microsecond-precise, so the literal
    // keeps 1.123450 s and does NOT equal its millis truncation
    isTrue("interval '1.12345' second = interval '1.12345' second")
    isTrue("NOT (interval '1.12345' second = interval '1.123' second)")
  }
}
