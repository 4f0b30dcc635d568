package graft

import graft.operators.JsonModes
import graft.operators.JsonModes.{Behavior, Wrapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r17 JSON advice fixes (ADVICE.md r16 → JsonModes.scala):
  *
  *  1. jsonValue no longer misclassifies a STRING scalar whose content
  *     starts with '{'/'[' as non-scalar (get_json_object strips JSON
  *     string quotes; the non-scalar check now requires the extracted
  *     text to itself reparse as JSON, like the reference's
  *     isScalarObject checking the parsed type).
  *  2. jsonQuery WITHOUT WRAPPER routes a scalar to ON EMPTY in lax mode
  *     and ON ERROR only in strict (reference JsonFunctions.jsonQuery;
  *     SqlOperatorBaseTest testJsonQuery:4718-4724).
  *  3. jsonIsValid accepts the JSON `null` literal (reference dejsonize
  *     parses it), consistent with the IS JSON predicates' wellFormed.
  *  4. jsonType returns LONG for integer numerals outside Int range
  *     (Jackson parses them as Long) and raises beyond Long range
  *     (Jackson yields BigInteger, which the reference's classifier
  *     has no arm for).
  *  5. jsonLength/jsonKeys raise on MALFORMED input in both modes
  *     (reference invalidInputForJsonLength/invalidInputForJsonKeys) —
  *     only a missing path is mode-sensitive.
  */
class JsonAdviceFixSpec extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case class RAISES(fragment: String) extends Want

  private def checkCol(label: String, c: Column, want: Want): Unit =
    test(label) {
      import spark.implicits._
      def run() = Seq(1).toDF("one").select(c.cast("string").as("r")).head()
      want match {
        case S(v) =>
          val r = run(); assert(!r.isNullAt(0) && r.getString(0) == v,
            s"expected '$v', got '${r.get(0)}'")
        case NULL => assert(run().isNullAt(0))
        case RAISES(frag) =>
          val ex = intercept[Exception](run())
          assert(ex.getMessage.contains(frag),
            s"expected raise containing '$frag', got: ${ex.getMessage}")
      }
    }

  import Behavior.{Default, Error}

  // ---- fix 1: string scalar with container-looking content ----------------
  private val trickStr = lit("""{"k":"[a]"}""")
  checkCol("jsonValue: string scalar '[a]' is a VALUE, not non-scalar-empty",
    JsonModes.jsonValue(trickStr, "$.k"), S("[a]"))
  checkCol("jsonValue: string scalar '[a]' strict does not raise scalar-required",
    JsonModes.jsonValue(trickStr, "$.k", strict = true, onError = Error),
    S("[a]"))
  checkCol("jsonValue: string scalar '{x}' is a VALUE",
    JsonModes.jsonValue(lit("""{"k":"{x}"}"""), "$.k"), S("{x}"))
  // a genuine container is still non-scalar → lax ON EMPTY
  checkCol("jsonValue: genuine object result is still empty in lax",
    JsonModes.jsonValue(lit("""{"k":{"a":1}}"""), "$.k",
      onEmpty = Default(lit("empty"))), S("empty"))

  // ---- fix 2: jsonQuery WITHOUT WRAPPER scalar routing ---------------------
  private val obj = lit("""{"foo":100}""")
  checkCol("jsonQuery: lax scalar WITHOUT WRAPPER takes ON EMPTY default",
    JsonModes.jsonQuery(obj, "$.foo", onEmpty = Default(lit("[]"))), S("[]"))
  checkCol("jsonQuery: lax scalar WITHOUT WRAPPER, ERROR ON EMPTY raises",
    JsonModes.jsonQuery(obj, "$.foo", onEmpty = Error), RAISES("ON EMPTY"))
  checkCol("jsonQuery: lax scalar WITHOUT WRAPPER ignores ON ERROR",
    JsonModes.jsonQuery(obj, "$.foo", onError = Default(lit("ERR"))), NULL)
  checkCol("jsonQuery: strict scalar WITHOUT WRAPPER still takes ON ERROR",
    JsonModes.jsonQuery(obj, "$.foo", strict = true,
      onError = Default(lit("ERR"))), S("ERR"))
  // string scalar with container-looking content is still a scalar here
  checkCol("jsonQuery: string scalar '[a]' WITHOUT WRAPPER is scalar (lax empty)",
    JsonModes.jsonQuery(trickStr, "$.k", onEmpty = Default(lit("none"))),
    S("none"))
  checkCol("jsonQuery: string scalar '[a]' CONDITIONAL wraps re-quoted",
    JsonModes.jsonQuery(trickStr, "$.k", wrapper = Wrapper.Conditional),
    S("""["[a]"]"""))

  // ---- fix 3: the JSON null literal is valid input --------------------------
  checkCol("jsonIsValid: 'null' literal is well-formed",
    JsonModes.jsonIsValid(lit("null")), S("true"))
  checkCol("jsonValue: 'null' input is NOT the ON ERROR path",
    JsonModes.jsonValue(lit("null"), "$.k", onError = Default(lit("ERR"))),
    NULL)
  checkCol("jsonExists: 'null' input lax missing path -> false, not errorResult",
    JsonModes.jsonExists(lit("null"), "$.k", errorResult = lit(true)),
    S("false"))

  // ---- fix 4: jsonType INTEGER vs LONG --------------------------------------
  checkCol("jsonType: numeral beyond Int range -> LONG",
    JsonModes.jsonType(lit("100000000000")), S("LONG"))
  checkCol("jsonType: negative numeral beyond Int range -> LONG",
    JsonModes.jsonType(lit("-3000000000")), S("LONG"))
  checkCol("jsonType: Int.MaxValue stays INTEGER",
    JsonModes.jsonType(lit("2147483647")), S("INTEGER"))
  checkCol("jsonType: Int.MinValue stays INTEGER",
    JsonModes.jsonType(lit("-2147483648")), S("INTEGER"))
  checkCol("jsonType: one past Int.MaxValue -> LONG",
    JsonModes.jsonType(lit("2147483648")), S("LONG"))
  // beyond Long the reference's classifier has no arm (Jackson hands it a
  // BigInteger) and raises — and an over-wide numeral must take that
  // raise, not an ANSI CAST_OVERFLOW from the internal decimal compare
  checkCol("jsonType: beyond Long range raises like the reference",
    JsonModes.jsonType(lit("99999999999999999999")), RAISES("invalid JSON"))
  checkCol("jsonType: 40-digit numeral raises (not CAST_OVERFLOW)",
    JsonModes.jsonType(lit("1" * 40)), RAISES("invalid JSON"))

  // ---- fix 5: jsonLength/jsonKeys raise on malformed input ------------------
  checkCol("jsonLength: malformed input raises in lax mode",
    JsonModes.jsonLength(lit("{broken")), RAISES("invalid input"))
  checkCol("jsonLength: malformed input raises in strict mode",
    JsonModes.jsonLength(lit("{broken"), strict = true),
    RAISES("invalid input"))
  checkCol("jsonKeys: malformed input raises",
    JsonModes.jsonKeys(lit("{broken")), RAISES("invalid input"))
  checkCol("jsonLength: 'null' literal input is valid, scalar -> 1",
    JsonModes.jsonLength(lit("null")), S("1"))
  checkCol("jsonKeys: 'null' literal input is valid, non-object -> json null",
    JsonModes.jsonKeys(lit("null")), S("null"))
}
