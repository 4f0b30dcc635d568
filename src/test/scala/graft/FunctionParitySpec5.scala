package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function VALUE parity, tranche 10 (r15) — the datetime field
  * extraction tables (named field functions, EXTRACT over timestamps
  * incl. the pre-Unix-epoch table, EXTRACT over intervals), FLOOR-to-
  * datetime-unit, the ITEM operator, and arithmetic operator overflow
  * (reference: core/src/test/java/org/apache/calcite/sql/test/
  * SqlOperatorBaseTest.java — testYear:6662, testQuarter:6675,
  * testMonth:6732, testDayOfMonth:6781, testHour:6810, testMinute:6823,
  * testSecond:6836, testExtractTimestamp:7187,
  * testExtractWithDatesBeforeUnixEpoch:7408,
  * testExtractIntervalYearMonth:6849, testExtractIntervalDayTime:6944,
  * testFloorFuncDateTime:7607, testItemOp:7494, testPlusOperator:3337,
  * testMinusOperator:2935, testMultiplyOperator:3140,
  * testDivideOperator:2218, testModOperatorDivByZero:2205; values
  * transcribed verbatim, cited per case).
  *
  * Dialect adaptations (syntax-only, value-preserving):
  *  - Calcite `FLOOR(ts TO unit)` → Spark `date_trunc('unit', ts)`
  *    (identical truncation semantics; the TIME-typed rows are covered
  *    by the engine's fn_time_* registry queries);
  *  - Calcite `ITEM` (1-based, NULL out of bounds) → Spark
  *    `try_element_at` (1-based, NULL out of bounds). Spark's native
  *    `[..]` subscript is 0-based and ANSI-errors out of bounds —
  *    pinned as a divergence below;
  *  - EXTRACT fields Spark does not define (EPOCH, ISOYEAR,
  *    MILLISECOND/MICROSECOND/NANOSECOND, DECADE, CENTURY, MILLENNIUM)
  *    are out of surface — the shared fields are what is ported. */
class FunctionParitySpec5 extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case object ERR extends Want

  private def value(expr: String): Any =
    spark.sql(s"select $expr as v").head().get(0)

  private def render(got0: Any): String = got0 match {
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case o => o.toString
  }

  private def check(citation: String, expr: String, want: Want): Unit =
    test(s"$citation: $expr") {
      want match {
        case ERR =>
          val e = intercept[Exception](value(expr))
          assert(e.isInstanceOf[org.apache.spark.SparkThrowable] ||
            e.getCause.isInstanceOf[org.apache.spark.SparkThrowable],
            s"expected a runtime rejection, got $e")
        case NULL => assert(value(expr) == null)
        case S(v) =>
          val got0 = value(expr)
          assert(got0 != null, s"expected '$v', got NULL")
          val got = render(got0)
          val same = (try {
            new java.math.BigDecimal(got).compareTo(new java.math.BigDecimal(v)) == 0
          } catch { case _: NumberFormatException => false }) || got == v
          assert(same, s"expected '$v', got '$got'")
      }
    }

  // ======================================================================
  // named datetime field functions
  // ======================================================================
  check("testYear:6662", "year(date '2008-1-23')", S("2008"))
  check("testYear:6662", "year(cast(null as date))", NULL)
  check("testQuarter:6675", "quarter(date '2008-1-23')", S("1"))
  check("testQuarter:6675", "quarter(date '2008-4-23')", S("2"))
  check("testQuarter:6675", "quarter(date '2008-9-23')", S("3"))
  check("testQuarter:6675", "quarter(date '2008-12-23')", S("4"))
  check("testQuarter:6675", "quarter(cast(null as date))", NULL)
  check("testMonth:6732", "month(date '2008-1-23')", S("1"))
  check("testMonth:6732", "month(cast(null as date))", NULL)
  check("testDayOfMonth:6781", "dayofmonth(date '2008-1-23')", S("23"))
  check("testDayOfMonth:6781", "dayofmonth(cast(null as date))", NULL)
  check("testHour:6810", "hour(timestamp '2008-1-23 12:34:56')", S("12"))
  check("testHour:6810", "hour(cast(null as timestamp))", NULL)
  check("testMinute:6823", "minute(timestamp '2008-1-23 12:34:56')", S("34"))
  check("testMinute:6823", "minute(cast(null as timestamp))", NULL)
  check("testSecond:6836", "second(timestamp '2008-1-23 12:34:56')", S("56"))
  check("testSecond:6836", "second(cast(null as timestamp))", NULL)

  // ======================================================================
  // EXTRACT over timestamps (testExtractTimestamp:7187)
  // ======================================================================
  check("testExtractTimestamp:7187",
    "extract(second from timestamp '2008-2-23 12:34:56')", S("56"))
  check("testExtractTimestamp:7187",
    "extract(minute from timestamp '2008-2-23 12:34:56')", S("34"))
  check("testExtractTimestamp:7187",
    "extract(hour from timestamp '2008-2-23 12:34:56')", S("12"))
  check("testExtractTimestamp:7187",
    "extract(day from timestamp '2008-2-23 12:34:56')", S("23"))
  check("testExtractTimestamp:7187",
    "extract(month from timestamp '2008-2-23 12:34:56')", S("2"))
  check("testExtractTimestamp:7187",
    "extract(quarter from timestamp '2008-7-23 12:34:56')", S("3"))
  check("testExtractTimestamp:7187",
    "extract(year from timestamp '2008-2-23 12:34:56')", S("2008"))

  // ======================================================================
  // EXTRACT before the Unix epoch (testExtractWithDatesBeforeUnixEpoch:7408
  // — the field math must not wobble around the epoch boundary)
  // ======================================================================
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(year from timestamp '1970-01-01 00:00:00')", S("1970"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(year from timestamp '1969-12-31 10:13:17')", S("1969"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(quarter from timestamp '1969-12-31 08:13:17')", S("4"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(quarter from timestamp '1969-5-31 21:13:17')", S("2"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(month from timestamp '1969-12-31 00:13:17')", S("12"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(day from timestamp '1969-12-31 12:13:17')", S("31"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(week from timestamp '1969-2-23 01:23:45')", S("8"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(doy from timestamp '1969-12-31 21:13:17.357')", S("365"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(dow from timestamp '1969-12-31 01:13:17.357')", S("4"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(hour from timestamp '1969-12-31 21:13:17.357')", S("21"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(minute from timestamp '1969-12-31 21:13:17.357')", S("13"))
  check("testExtractWithDatesBeforeUnixEpoch:7408",
    "extract(second from timestamp '1969-12-31 21:13:17.357')", S("17.357"))

  // ======================================================================
  // EXTRACT over intervals
  // ======================================================================
  check("testExtractIntervalYearMonth:6849",
    "extract(month from interval '4-2' year to month)", S("2"))
  check("testExtractIntervalYearMonth:6849",
    "extract(year from interval '4-2' year to month)", S("4"))
  check("testExtractIntervalDayTime:6944",
    "extract(day from interval '2 3:4:5.678' day to second)", S("2"))
  check("testExtractIntervalDayTime:6944",
    "extract(hour from interval '2 3:4:5.678' day to second)", S("3"))
  check("testExtractIntervalDayTime:6944",
    "extract(minute from interval '2 3:4:5.678' day to second)", S("4"))

  // ======================================================================
  // FLOOR to datetime unit (testFloorFuncDateTime:7607, via date_trunc)
  // ======================================================================
  check("testFloorFuncDateTime:7607",
    "date_trunc('SECOND', timestamp '2015-02-19 12:34:56.78')",
    S("2015-02-19 12:34:56"))
  check("testFloorFuncDateTime:7607",
    "date_trunc('MINUTE', timestamp '2015-02-19 12:34:56')",
    S("2015-02-19 12:34:00"))
  check("testFloorFuncDateTime:7607",
    "date_trunc('YEAR', timestamp '2015-02-19 12:34:56')",
    S("2015-01-01 00:00:00"))
  check("testFloorFuncDateTime:7607",
    "date_trunc('MONTH', timestamp '2015-02-19 12:34:56')",
    S("2015-02-01 00:00:00"))
  check("testFloorFuncDateTime:7607",
    "date_trunc('MONTH', cast(null as timestamp))", NULL)

  // ======================================================================
  // ITEM operator (testItemOp:7494 — 1-based, NULL out of bounds; the
  // try_element_at twin matches exactly)
  // ======================================================================
  check("testItemOp:7494", "try_element_at(array('foo', 'bar'), 1)", S("foo"))
  check("testItemOp:7494", "try_element_at(array('foo', 'bar'), 2)", S("bar"))
  check("testItemOp:7494", "try_element_at(array('foo', 'bar'), 3)", NULL)
  check("testItemOp:7494", "try_element_at(array(2, 4, 6), 2)", S("4"))
  check("testItemOp:7494", "try_element_at(array(2, 4, 6), 4)", NULL)
  check("testItemOp:7494",
    "try_element_at(array('foo', 'bar'), 1 + cast(null as integer))", NULL)
  check("testItemOp:7494", "map('foo', 3, 'bar', 7)['bar']", S("7"))
  check("testItemOp:7494", "map('foo', cast(null as integer), 'bar', 7)['bar']", S("7"))
  check("testItemOp:7494", "map('foo', cast(null as integer), 'bar', 7)['baz']", NULL)

  // ======================================================================
  // arithmetic operator overflow (the checkFails(OUT_OF_RANGE) rows —
  // live in Spark's ANSI session exactly as in the reference)
  // ======================================================================
  check("testPlusOperator:3337",
    "cast(100 as tinyint) + cast(100 as tinyint)", ERR)
  check("testPlusOperator:3337",
    "cast(-20000 as smallint) + cast(-20000 as smallint)", ERR)
  check("testPlusOperator:3337",
    "cast(1.5e9 as integer) + cast(1.5e9 as integer)", ERR)
  check("testPlusOperator:3337",
    "cast(5e18 as bigint) + cast(5e18 as bigint)", ERR)
  check("testMinusOperator:2935",
    "cast(-5e18 as bigint) - cast(5e18 as bigint)", ERR)
  check("testMultiplyOperator:3140",
    "cast(2e9 as integer) * cast(2e9 as integer)", ERR)
  check("testDivideOperator:2218", "1 / 0", ERR)
  check("testDivideOperator:2218", "cast(1.5 as double) / 0", ERR)
  check("testModOperatorDivByZero:2205", "mod(3, 0)", ERR)

  // ---- documented divergences -------------------------------------------
  test("divergence pin: native [] subscript is 0-based and ANSI-errors out of bounds") {
    // the reference's ITEM is 1-based and returns NULL out of bounds
    // (try_element_at above matches it); Spark's a[i] subscript indexes
    // from 0 and throws INVALID_ARRAY_INDEX beyond the end
    assert(render(value("array('foo', 'bar')[0]")) == "foo")
    val e = intercept[Exception](value("array('foo', 'bar')[5]"))
    assert(e.getMessage.contains("INVALID_ARRAY_INDEX"), e.getMessage)
  }

  test("divergence pin: interval SECOND extraction keeps the fraction") {
    // reference: extract(second from interval '2 3:4:5.678' day to second)
    // = 5 (whole seconds; the fraction surfaces via MILLISECOND=5678);
    // Spark returns DECIMAL 5.678000 — same instant, fraction attached
    assert(new java.math.BigDecimal(render(
      value("extract(second from interval '2 3:4:5.678' day to second)")))
      .compareTo(new java.math.BigDecimal("5.678")) == 0)
  }
}
