package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 9 (r15) — operator/operand type
  * checking: NOT/AND/OR/IS on non-booleans, binary-vs-numeric
  * comparisons, CAST operand legality, unknown functions and argument
  * counts, invalid dot operations, element/collection operands, BETWEEN
  * operand comparability, and datetime arithmetic operand errors. One
  * case per reference assertion family, cited per family; same contract
  * as tranches 1-8 (ValidatorParitySpec..6).
  *
  * This tranche also pins the COERCION-ON AGREEMENTS: several reference
  * families fail only `.withTypeCoercion(false)` and ACCEPT under the
  * default coercing validator (coalesce('a',1) → VARCHAR, trim with
  * numeric operands, substring with a string length) — Spark's analyzer
  * agrees with the coercing mode, so those are asserted as accepted
  * twins, not rejections.
  *
  * References: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java (testAndOrIllegalTypesFails:251,
  * testNotIllegalTypeFails:271, testIs:283, testIsFails:301,
  * testEqualNotEqualFails:409, testBinaryStringFails:441,
  * testNullIf:599, testCoalesceFails:620, testConcatFails:689,
  * testBetween:721, testTrimFails:848, testSubstringFails:953,
  * testCastFails:1189, testDateTime:1224, testInvalidFunction:1470,
  * testRowWithInvalidDotOperation:1608, testElement:1685). */
class ValidatorParitySpec7 extends AnyFunSuite {
  import SparkTestSession._

  private val rejects: Seq[(String, String)] = Seq(
    // ---- testNotIllegalTypeFails:271 ------------------------------------
    ("NOT of a decimal", "select NOT 3.141"),
    ("NOT of an integer", "select NOT 1"),
    // ---- testAndOrIllegalTypesFails:251 ----------------------------------
    ("OR of boolean and integer", "select TRUE OR 1"),
    ("OR of boolean and double", "select true OR 1.0e4"),
    // ---- testIsFails:301 / testIs:283 ------------------------------------
    ("IS TRUE on an integer", "select 1 IS TRUE"),
    ("IS NOT FALSE on a decimal", "select 1.1 IS NOT FALSE"),
    ("IS NOT FALSE on a double", "select 1.1e1 IS NOT FALSE"),
    ("IS NOT UNKNOWN on a string", "select 'abc' IS NOT UNKNOWN"),
    // ---- testEqualNotEqualFails:409 / testBinaryStringFails:441 ----------
    ("binary = integer", "select x'a4' = 1"),
    ("binary <> decimal", "select x'13' <> 0.01"),
    ("binary <> integer", "select x'abcd' <> 1"),
    ("binary <> double", "select x'' <> 1.1e-1"),
    // ---- testCastFails:1189 ----------------------------------------------
    ("CAST to an unknown type name", "select cast('foo' as bar)"),
    ("CAST binary to decimal", "select cast(x'ff' as decimal(5,2))"),
    ("CAST a collection to integer (multiset twin)",
      "select cast(array(1) as integer)"),
    ("CAST date to boolean (date/time cross-cast family)",
      "select cast(DATE '1243-12-01' as boolean)"),
    // ---- testInvalidFunction:1470 / testNullIf:599 -------------------------
    ("unknown function signature", "select foo()"),
    ("MOD with one argument", "select mod(123)"),
    ("NULLIF with three arguments", "select nullif(1, 2, 3)"),
    // ---- testRowWithInvalidDotOperation:1608 -------------------------------
    ("dot field access on an array literal", "select array(1, 2, 3).f"),
    ("dot field access on a string literal", "select 'mystr'.f"),
    // ---- testElement:1685 — ELEMENT of a non-collection --------------------
    ("element access on a scalar (ELEMENT twin)", "select element_at(1, 1)"),
    // ---- testBetween:721 ----------------------------------------------------
    ("BETWEEN with incomparable bounds", "select 1 between x'ff' and x'aa'"),
    // ---- testDateTime:1224 — datetime arithmetic operand errors ------------
    ("DATE + DATE", "select date '2020-01-01' + date '2020-01-02'"),
    ("TIMESTAMP - BOOLEAN", "select timestamp '2020-01-01 00:00:00' - true"))

  for ((name, sql) <- rejects)
    test(s"rejects: $name") {
      val ex = intercept[Exception] {
        spark.sql(sql).queryExecution.analyzed
      }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
        ex.isInstanceOf[IllegalArgumentException],
        s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    }

  // ---- coercion-ON agreements: the reference's default validator ACCEPTS
  // these (they fail only withTypeCoercion(false)) and so does Spark ------
  test("agreement: the coercing validator's accepted forms analyze cleanly") {
    Seq(
      "select coalesce('a', 1)",          // testCoalesceFails — VARCHAR
      "select coalesce('a', 'b', 1)",
      "select trim(123 FROM 'beard')",    // testTrimFails coercion rows
      "select trim('a' FROM 123)",
      "select substring('a' from 1 for 'b')", // testSubstringFails coercion row
      "select '' <> 1",                   // testEqualNotEqualFails ok rows
      "select '1' >= 1",
      "select '' = .1",
      "select false = ''",
      "select 1 IS NULL",                 // testIs ok rows
      "select 1.2 IS NULL",
      "select TRUE IS NOT FALSE")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  // ---- documented divergences: reference REJECTS, Spark ACCEPTS ---------
  test("divergence pin: string→boolean coercion in NOT/AND the reference rejects outright") {
    // testAndOrIllegalTypesFails rejects 'abc' AND FALSE unconditionally
    // (CHAR AND BOOLEAN); testNotIllegalTypeFails rejects NOT 'abc'.
    // Spark casts the string to boolean — laxer than even Calcite's
    // coercing mode.
    Seq("select 'abc' AND false", "select NOT 'abc'")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("divergence pin: string/binary || concatenation the reference rejects") {
    // testConcatFails rejects 'a'||x'ff' unconditionally ('<STRING> ||
    // <STRING>' only); Spark's concat coerces binary to string
    assert(spark.sql("select 'a' || x'ff'").queryExecution.analyzed != null)
  }

  test("divergence pin: binary = string comparison (coercion-off family)") {
    // testBinaryStringFails rejects x'ffee'='abc' only withTypeCoercion
    // (false); Spark, like the coercing mode, accepts
    assert(spark.sql("select x'ffee' = 'abc'").queryExecution.analyzed != null)
  }
}
