package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 16 (r16) — the INTERVAL literal
  * negative matrix: the reference validates interval literal FORMAT
  * against the qualifier (13 field combinations, each with its
  * malformed-format, cross-field-format, fraction-where-integral,
  * out-of-range-subfield, and magnitude-overflow rows). One case per
  * distinctive row per field combination, transcribed from the
  * subTestIntervalXXXNegative tables; accepted controls carry one
  * canonical literal per combination from the XXXPositive twins.
  *
  * Out of fixture scope, documented: the reference's leading-field
  * PRECISION rows (`YEAR(2)`, `SECOND(2,6)` and the precision-out-of-
  * range family) — Spark's interval grammar has no leading-precision
  * syntax, so those spellings are parser-rejected for a different
  * reason and carry no validation semantics to compare.
  *
  * Reference: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java subTestIntervalYearNegative:2530,
  * YearToMonth:2586, Month:2651, Day:2705, DayToHour:2763,
  * DayToMinute:2828, DayToSecond:2911, Hour:3038, HourToMinute,
  * HourToSecond, Minute, MinuteToSecond, Second (the 13-table block
  * ending ~3500). */
class ValidatorParitySpec13 extends AnyFunSuite {
  import SparkTestSession._

  private val rejects: Seq[(String, String)] = Seq(
    // ---- subTestIntervalYearNegative:2530 -----------------------------------
    ("YEAR: bare sign", "INTERVAL '-' YEAR"),
    ("YEAR: year-to-month format", "INTERVAL '1-2' YEAR"),
    ("YEAR: fractional field", "INTERVAL '1.2' YEAR"),
    ("YEAR: space-separated fields", "INTERVAL '1 2' YEAR"),
    ("YEAR: non-numeric text", "INTERVAL 'bogus text' YEAR"),
    ("YEAR: double negative", "INTERVAL '--1' YEAR"),
    ("YEAR: magnitude beyond int range", "INTERVAL '2147483648' YEAR"),
    // ---- subTestIntervalYearToMonthNegative:2586 ----------------------------
    ("YEAR TO MONTH: single field", "INTERVAL '1' YEAR TO MONTH"),
    ("YEAR TO MONTH: colon separator", "INTERVAL '1:2' YEAR TO MONTH"),
    ("YEAR TO MONTH: three fields", "INTERVAL '1-2-3' YEAR TO MONTH"),
    ("YEAR TO MONTH: month subfield out of range", "INTERVAL '1-13' YEAR TO MONTH"),
    // ---- subTestIntervalMonthNegative:2651 ----------------------------------
    ("MONTH: fractional field", "INTERVAL '1.2' MONTH"),
    ("MONTH: year-to-month format", "INTERVAL '1-2' MONTH"),
    // ---- subTestIntervalDayNegative:2705 ------------------------------------
    ("DAY: day-to-hour format", "INTERVAL '1 2' DAY"),
    ("DAY: colon separator", "INTERVAL '1:2' DAY"),
    ("DAY: fractional field", "INTERVAL '1.2' DAY"),
    ("DAY: magnitude overflow", "INTERVAL '99999999999' DAY"),
    // ---- subTestIntervalDayToHourNegative:2763 ------------------------------
    ("DAY TO HOUR: single field", "INTERVAL '1' DAY TO HOUR"),
    ("DAY TO HOUR: colon separator", "INTERVAL '1:2' DAY TO HOUR"),
    ("DAY TO HOUR: too many fields", "INTERVAL '1 2:3' DAY TO HOUR"),
    ("DAY TO HOUR: hour subfield out of range", "INTERVAL '1 24' DAY TO HOUR"),
    // ---- subTestIntervalDayToMinuteNegative:2828 ----------------------------
    ("DAY TO MINUTE: missing minute field", "INTERVAL '1 2' DAY TO MINUTE"),
    ("DAY TO MINUTE: seconds field present", "INTERVAL '1 2:3:4' DAY TO MINUTE"),
    ("DAY TO MINUTE: minute subfield out of range", "INTERVAL '1 2:60' DAY TO MINUTE"),
    // ---- subTestIntervalDayToSecondNegative:2911 ----------------------------
    ("DAY TO SECOND: missing second field", "INTERVAL '1 2:3' DAY TO SECOND"),
    ("DAY TO SECOND: second subfield out of range", "INTERVAL '1 2:3:60' DAY TO SECOND"),
    // ---- subTestIntervalHourNegative:3038 -----------------------------------
    ("HOUR: fractional field", "INTERVAL '1.2' HOUR"),
    ("HOUR: colon separator", "INTERVAL '1:2' HOUR"),
    // ---- subTestIntervalHourToMinuteNegative --------------------------------
    ("HOUR TO MINUTE: single field", "INTERVAL '1' HOUR TO MINUTE"),
    ("HOUR TO MINUTE: minute subfield out of range", "INTERVAL '1:60' HOUR TO MINUTE"),
    // ---- subTestIntervalHourToSecondNegative --------------------------------
    ("HOUR TO SECOND: missing second field", "INTERVAL '1:2' HOUR TO SECOND"),
    ("HOUR TO SECOND: second subfield out of range", "INTERVAL '1:2:60' HOUR TO SECOND"),
    // ---- subTestIntervalMinuteNegative --------------------------------------
    ("MINUTE: colon separator", "INTERVAL '1:2' MINUTE"),
    // ---- subTestIntervalMinuteToSecondNegative ------------------------------
    ("MINUTE TO SECOND: single field", "INTERVAL '1' MINUTE TO SECOND"),
    ("MINUTE TO SECOND: second subfield out of range", "INTERVAL '1:60' MINUTE TO SECOND"),
    // ---- subTestIntervalSecondNegative --------------------------------------
    ("SECOND: colon separator", "INTERVAL '1:2' SECOND"),
    ("SECOND: two fraction points", "INTERVAL '1.2.3' SECOND"))

  for ((name, sql) <- rejects)
    test(s"interval rejects: $name") {
      val ex = intercept[Exception] {
        spark.sql(s"SELECT $sql").queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[java.lang.IllegalArgumentException],
        s"expected parse/analysis rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  test("interval controls: one canonical literal per field combination") {
    // the subTestIntervalXXXPositive canonical rows
    Seq(
      "INTERVAL '1' YEAR", "INTERVAL '-1' YEAR", "INTERVAL '1-2' YEAR TO MONTH",
      "INTERVAL '-1-2' YEAR TO MONTH", "INTERVAL '1' MONTH",
      "INTERVAL '1' DAY", "INTERVAL '-1' DAY", "INTERVAL '1 2' DAY TO HOUR",
      "INTERVAL '1 2:3' DAY TO MINUTE", "INTERVAL '1 2:3:4' DAY TO SECOND",
      "INTERVAL '1 2:3:4.5' DAY TO SECOND", "INTERVAL '1' HOUR",
      "INTERVAL '1:2' HOUR TO MINUTE", "INTERVAL '1:2:3' HOUR TO SECOND",
      "INTERVAL '1' MINUTE", "INTERVAL '1:2' MINUTE TO SECOND",
      "INTERVAL '1' SECOND", "INTERVAL '1.5' SECOND")
      .foreach(q => assert(
        spark.sql(s"SELECT $q").queryExecution.analyzed != null, q))
  }
}
