package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function VALUE parity, tranche 12 (r15) — the Oracle/Postgres
  * library functions the reference registers via SqlLibraryOperators:
  * NVL, DECODE (incl. its NULL-equals-NULL matching), three-argument
  * TRANSLATE with shorter/empty mapping strings, TO_DATE/TO_TIMESTAMP
  * with format strings, and CONVERT_TIMEZONE (reference:
  * core/src/test/java/org/apache/calcite/sql/test/SqlOperatorBaseTest.java
  * testNvlFunc:6369, testDecodeFunc:6397, testTranslate3Func:4152, and
  * core/src/test/java/org/apache/calcite/test/SqlValidatorTest.java
  * testToDateFunction:1408, testToTimestampFunction:1439,
  * testConvertTimezoneFunction:1377; values transcribed verbatim, cited
  * per case). Format-pattern spellings are dialect-adapted
  * ('YYYY-MM-DD' → 'yyyy-MM-dd', value-preserving). */
class FunctionParitySpec7 extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want

  private def value(expr: String): Any =
    spark.sql(s"select $expr as v").head().get(0)

  private def check(citation: String, expr: String, want: Want): Unit =
    test(s"$citation: $expr") {
      want match {
        case NULL => assert(value(expr) == null)
        case S(v) =>
          val got0 = value(expr)
          assert(got0 != null, s"expected '$v', got NULL")
          val got = got0 match {
            case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
            case o => o.toString
          }
          assert(got == v, s"expected '$v', got '$got'")
      }
    }

  // ---- testNvlFunc:6369 ---------------------------------------------------
  check("testNvlFunc:6369", "nvl(1, 2)", S("1"))
  check("testNvlFunc:6369", "nvl(true, false)", S("true"))
  check("testNvlFunc:6369", "nvl(false, true)", S("false"))
  check("testNvlFunc:6369", "nvl('abc', 'de')", S("abc"))
  check("testNvlFunc:6369", "nvl('abc', 'defg')", S("abc"))
  check("testNvlFunc:6369", "nvl('abc', cast(null as varchar(20)))", S("abc"))
  check("testNvlFunc:6369", "nvl(cast(null as varchar(20)), 'abc')", S("abc"))
  check("testNvlFunc:6369",
    "nvl(cast(null as varchar(20)), cast(null as varchar(20)))", NULL)

  // ---- testDecodeFunc:6397 --------------------------------------------------
  check("testDecodeFunc:6397", "decode(0, 0, 'a', 1, 'b', 2, 'c')", S("a"))
  check("testDecodeFunc:6397", "decode(1, 0, 'a', 1, 'b', 2, 'c')", S("b"))
  check("testDecodeFunc:6397", "decode(1, 0, 'a', 1, 'b', 1, 'z', 2, 'c')", S("b"))
  check("testDecodeFunc:6397", "decode(3, 0, 'a', 1, 'b', 2, 'c')", NULL)
  check("testDecodeFunc:6397", "decode(3, 0, 'a', 1, 'b', 2, 'c', 'd')", S("d"))
  check("testDecodeFunc:6397", "decode(1, 0, 'a', 1, 'b', 2, 'c', 'd')", S("b"))
  // DECODE's distinguishing semantics: a NULL search value MATCHES a
  // NULL comparand (unlike CASE '=')
  check("testDecodeFunc:6397",
    "decode(cast(null as integer), 0, 'a', cast(null as integer), 'b', 2, 'c')",
    S("b"))

  // ---- testTranslate3Func:4152 ----------------------------------------------
  check("testTranslate3Func:4152", "translate('aabbcc', 'ab', '+-')", S("++--cc"))
  check("testTranslate3Func:4152", "translate('aabbcc', 'ab', 'ba')", S("bbaacc"))
  check("testTranslate3Func:4152", "translate('aabbcc', 'ab', '')", S("cc"))
  check("testTranslate3Func:4152", "translate('aabbcc', '', '+-')", S("aabbcc"))
  check("testTranslate3Func:4152",
    "translate(cast('aabbcc' as varchar(10)), 'ab', '+-')", S("++--cc"))
  check("testTranslate3Func:4152",
    "translate(cast(null as varchar(7)), 'ab', '+-')", NULL)
  check("testTranslate3Func:4152",
    "translate('aabbcc', cast(null as varchar(2)), '+-')", NULL)
  check("testTranslate3Func:4152",
    "translate('aabbcc', 'ab', cast(null as varchar(2)))", NULL)

  // ---- testToDateFunction:1408 / testToTimestampFunction:1439 ---------------
  check("testToDateFunction:1408",
    "to_date('2000-01-01', 'yyyy-MM-dd')", S("2000-01-01"))
  check("testToTimestampFunction:1439",
    "to_timestamp('2000-01-01 01:00:00', 'yyyy-MM-dd HH:mm:ss')",
    S("2000-01-01 01:00:00"))

  // ---- testConvertTimezoneFunction:1377 --------------------------------------
  check("testConvertTimezoneFunction:1377",
    "cast(convert_timezone('UTC', 'America/Los_Angeles', timestamp_ntz '2000-01-01 00:00:00') as string)",
    S("1999-12-31 16:00:00"))
}
