package graft

import graft.operators.JsonModes
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Function VALUE parity, tranche 16 (r16) — the remaining
  * SqlOperatorBaseTest JSON families: the JSON_TYPE classifier,
  * JSON_LENGTH/JSON_KEYS over paths, and the JSON_OBJECT/JSON_ARRAY
  * value constructors (reference: core/src/test/java/org/apache/calcite/
  * sql/test/SqlOperatorBaseTest.java — testJsonType, testJsonLength,
  * testJsonKeys, testJsonObject, testJsonArray; values transcribed
  * verbatim, cited per case).
  *
  * Dialect mapping: JSON_TYPE/LENGTH/KEYS lower to JsonModes (operators/
  * JsonModes.scala — codegen'd composition over get_json_object /
  * json_object_keys / json_array_length); the constructors lower to
  * Spark's to_json over map()/array() with map_filter/filter carrying
  * ABSENT ON NULL and from_json carrying FORMAT JSON (raw embedding).
  * The reference's 'invalid $.path' syntax-error rows are not portable
  * (Spark compiles the path; a bad path is indistinguishable from an
  * empty result) — the strict missing-path ERROR rows carry that
  * behavior cell instead. */
class FunctionParitySpec11 extends AnyFunSuite {
  import SparkTestSession._

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case class RAISES(fragment: String) extends Want

  private def checkCol(citation: String, label: String, c: Column,
      want: Want): Unit =
    test(s"$citation: $label") {
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

  private val nullStr = lit(null).cast("string")

  // ---- testJsonType --------------------------------------------------------
  checkCol("testJsonType", "quoted scalar -> STRING",
    JsonModes.jsonType(lit("\"1\"")), S("STRING"))
  checkCol("testJsonType", "integer numeral -> INTEGER",
    JsonModes.jsonType(lit("1")), S("INTEGER"))
  checkCol("testJsonType", "fractional numeral -> DOUBLE",
    JsonModes.jsonType(lit("11.45")), S("DOUBLE"))
  checkCol("testJsonType", "true -> BOOLEAN",
    JsonModes.jsonType(lit("true")), S("BOOLEAN"))
  checkCol("testJsonType", "json null literal -> NULL",
    JsonModes.jsonType(lit("null")), S("NULL"))
  checkCol("testJsonType", "SQL null input -> null",
    JsonModes.jsonType(nullStr), NULL)
  checkCol("testJsonType", "object -> OBJECT",
    JsonModes.jsonType(lit("""{"a": [10, true]}""")), S("OBJECT"))
  checkCol("testJsonType", "empty object -> OBJECT",
    JsonModes.jsonType(lit("{}")), S("OBJECT"))
  checkCol("testJsonType", "array -> ARRAY",
    JsonModes.jsonType(lit("[10, true]")), S("ARRAY"))
  checkCol("testJsonType", "quoted datetime-looking text -> STRING",
    JsonModes.jsonType(lit("\"2019-01-27 21:24:00\"")), S("STRING"))
  checkCol("testJsonType", "invalid JSON raises",
    JsonModes.jsonType(lit("{broken")), RAISES("invalid JSON"))

  // ---- testJsonLength ------------------------------------------------------
  checkCol("testJsonLength", "empty object -> 0",
    JsonModes.jsonLength(lit("{}")), S("0"))
  checkCol("testJsonLength", "empty array -> 0",
    JsonModes.jsonLength(lit("[]")), S("0"))
  checkCol("testJsonLength", "one-member object -> 1",
    JsonModes.jsonLength(lit("""{"foo":100}""")), S("1"))
  checkCol("testJsonLength", "nested members count top-level only -> 2",
    JsonModes.jsonLength(lit("""{"a": 1, "b": {"c": 30}}""")), S("2"))
  checkCol("testJsonLength", "array elements -> 3",
    JsonModes.jsonLength(lit("""[1, 2, {"a": 3}]""")), S("3"))
  checkCol("testJsonLength", "lax $.b nested object -> 1",
    JsonModes.jsonLength(lit("""{"a": 1, "b": {"c": 30}}"""), "$.b"), S("1"))
  checkCol("testJsonLength", "lax missing path -> null",
    JsonModes.jsonLength(lit("""{"foo":100}"""), "$.foo1"), NULL)
  checkCol("testJsonLength", "strict $.b nested object -> 1",
    JsonModes.jsonLength(lit("""{"a": 1, "b": {"c": 30}}"""), "$.b",
      strict = true), S("1"))
  checkCol("testJsonLength", "strict missing path raises (No results for path)",
    JsonModes.jsonLength(lit("""{"foo":100}"""), "$.foo1", strict = true),
    RAISES("No results for path"))
  checkCol("testJsonLength", "SQL null input -> null",
    JsonModes.jsonLength(nullStr), NULL)
  checkCol("testJsonLength", "scalar -> 1",
    JsonModes.jsonLength(lit("100")), S("1"))

  // ---- testJsonKeys --------------------------------------------------------
  checkCol("testJsonKeys", "empty object -> []",
    JsonModes.jsonKeys(lit("{}")), S("[]"))
  checkCol("testJsonKeys", "array -> json null text",
    JsonModes.jsonKeys(lit("[]")), S("null"))
  checkCol("testJsonKeys", "one-member object -> [\"foo\"]",
    JsonModes.jsonKeys(lit("""{"foo":100}""")), S("""["foo"]"""))
  checkCol("testJsonKeys", "two members -> [\"a\",\"b\"]",
    JsonModes.jsonKeys(lit("""{"a": 1, "b": {"c": 30}}""")), S("""["a","b"]"""))
  checkCol("testJsonKeys", "non-empty array -> json null text",
    JsonModes.jsonKeys(lit("""[1, 2, {"a": 3}]""")), S("null"))
  checkCol("testJsonKeys", "lax $.b nested object -> [\"c\"]",
    JsonModes.jsonKeys(lit("""{"a": 1, "b": {"c": 30}}"""), "$.b"),
    S("""["c"]"""))
  checkCol("testJsonKeys", "missing path -> json null text",
    JsonModes.jsonKeys(lit("""{"foo":100}"""), "$.foo1"), S("null"))
  checkCol("testJsonKeys", "SQL null input -> null",
    JsonModes.jsonKeys(nullStr), NULL)

  // ---- testJsonObject (constructor; to_json(map...) dialect) --------------
  checkCol("testJsonObject", "json_object() -> {}",
    to_json(map()), S("{}"))
  checkCol("testJsonObject", "one pair",
    to_json(map(lit("foo"), lit("bar"))), S("""{"foo":"bar"}"""))
  checkCol("testJsonObject", "two pairs",
    to_json(map(lit("foo"), lit("bar"), lit("foo2"), lit("bar2"))),
    S("""{"foo":"bar","foo2":"bar2"}"""))
  checkCol("testJsonObject", "null value, default NULL ON NULL",
    to_json(map(lit("foo"), nullStr)), S("""{"foo":null}"""))
  checkCol("testJsonObject", "null value, explicit NULL ON NULL",
    to_json(map(lit("foo"), nullStr)), S("""{"foo":null}"""))
  checkCol("testJsonObject", "null value, ABSENT ON NULL -> {}",
    to_json(map_filter(map(lit("foo"), nullStr), (_, v) => v.isNotNull)),
    S("{}"))
  checkCol("testJsonObject", "numeric value",
    to_json(map(lit("foo"), lit(100))), S("""{"foo":100}"""))
  checkCol("testJsonObject", "nested constructor WITHOUT format json escapes",
    to_json(map(lit("foo"), to_json(map(lit("foo"), lit("bar"))))),
    S("""{"foo":"{\"foo\":\"bar\"}"}"""))
  checkCol("testJsonObject", "nested constructor FORMAT JSON embeds raw",
    to_json(map(lit("foo"),
      from_json(lit("""{"foo":"bar"}"""), lit("map<string,string>")))),
    S("""{"foo":{"foo":"bar"}}"""))

  // ---- testJsonArray (constructor; to_json(array...) dialect) -------------
  checkCol("testJsonArray", "json_array() -> []",
    to_json(array()), S("[]"))
  checkCol("testJsonArray", "one element",
    to_json(array(lit("foo"))), S("""["foo"]"""))
  checkCol("testJsonArray", "two elements",
    to_json(array(lit("foo"), lit("bar"))), S("""["foo","bar"]"""))
  checkCol("testJsonArray", "null element, default ABSENT ON NULL -> []",
    to_json(filter(array(nullStr), x => x.isNotNull)), S("[]"))
  checkCol("testJsonArray", "null element, NULL ON NULL -> [null]",
    to_json(array(nullStr)), S("[null]"))
  checkCol("testJsonArray", "null element, explicit ABSENT ON NULL -> []",
    to_json(filter(array(nullStr), x => x.isNotNull)), S("[]"))
  checkCol("testJsonArray", "numeric element",
    to_json(array(lit(100))), S("[100]"))
  checkCol("testJsonArray", "nested constructor WITHOUT format json escapes",
    to_json(array(to_json(array(lit("foo"))))), S("""["[\"foo\"]"]"""))
  checkCol("testJsonArray", "nested constructor FORMAT JSON embeds raw",
    to_json(array(from_json(lit("""["foo"]"""), lit("array<string>")))),
    S("""[["foo"]]"""))
}
