package graft

import graft.operators.JsonModes
import graft.operators.JsonModes.Behavior
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL:2016 JSON path-mode behaviors not expressible in the oracle:
  * the ERROR behavior must raise at runtime. */
class JsonModesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def one(c: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).head().getString(0)
  }

  test("lax mode: missing path hits ON EMPTY, malformed hits ON ERROR") {
    assert(one(JsonModes.jsonValue(lit("""{"k":1}"""), "$.k")) == "1")
    assert(one(JsonModes.jsonValue(lit("""{"k":1}"""), "$.m",
      onEmpty = Behavior.Default(lit("E")))) == "E")
    assert(one(JsonModes.jsonValue(lit("""{broken"""), "$.k",
      onError = Behavior.Default(lit("X")))) == "X")
  }

  test("strict mode: missing path is an error") {
    assert(one(JsonModes.jsonValue(lit("""{"k":1}"""), "$.m", strict = true,
      onEmpty = Behavior.Default(lit("EMPTY")),
      onError = Behavior.Default(lit("ERR")))) == "ERR")
  }

  test("ERROR behavior raises at runtime") {
    val ex = intercept[Exception] {
      one(JsonModes.jsonValue(lit("""{broken"""), "$.k",
        onError = Behavior.Error))
    }
    assert(ex.getMessage.contains("JSON_VALUE"), ex.getMessage)
  }

  test("JSON_QUERY wrapper semantics") {
    assert(one(JsonModes.jsonQuery(lit("""{"a":{"b":1}}"""), "$.a")) == """{"b":1}""")
    // scalar WITHOUT WRAPPER: ON EMPTY in lax mode, ON ERROR in strict
    // (reference JsonFunctions.jsonQuery; r16 ADVICE fix — the earlier
    // unconditional-ON-ERROR routing was wrong in lax)
    import spark.implicits._
    val r = Seq(1).toDF("x")
      .select(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a").as("r")).head()
    assert(r.isNullAt(0)) // defaults coincide at NULL
    assert(one(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a",
      onEmpty = Behavior.Default(lit("EMPTY")),
      onError = Behavior.Default(lit("ERR")))) == "EMPTY")
    assert(one(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a", strict = true,
      onEmpty = Behavior.Default(lit("EMPTY")),
      onError = Behavior.Default(lit("ERR")))) == "ERR")
    assert(one(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a",
      wrapper = JsonModes.Wrapper.Unconditional)) == "[1]")
  }

  test("IS JSON predicates: leading tabs/newlines and the null literal (r15 ADVICE)") {
    import spark.implicits._
    def row(s: String) = Seq(s).toDF("j").select(
      JsonModes.isJsonValue(col("j")).as("v"),
      JsonModes.isJsonObject(col("j")).as("o"),
      JsonModes.isJsonArray(col("j")).as("a"),
      JsonModes.isJsonScalar(col("j")).as("s")).head()
    // a valid object/array behind a tab or newline classifies by its first
    // SIGNIFICANT character, not the raw first byte (trim strips spaces only)
    assert(row("\n{\"a\":1}") == org.apache.spark.sql.Row(true, true, false, false))
    assert(row("\t[1,2]") == org.apache.spark.sql.Row(true, false, true, false))
    // the JSON literal null is a value and a scalar (reference dejsonize),
    // even though Spark's get_json_object probe returns SQL NULL for it
    assert(row("null") == org.apache.spark.sql.Row(true, false, false, true))
    assert(row("  null ") == org.apache.spark.sql.Row(true, false, false, true))
    // malformed stays not-JSON; SQL NULL input stays NULL-typed
    assert(row("{broken") == org.apache.spark.sql.Row(false, false, false, false))
    val n = Seq[String](null).toDF("j")
      .select(JsonModes.isJsonValue(col("j"))).head()
    assert(n.isNullAt(0))
  }

  test("JSON introspection quartet: depth/pretty/remove/storage_size edge cases") {
    import graft.functions.JsonIntrospect
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u8}
    // depth: scalars and empty containers are 1 (MySQL semantics)
    assert(JsonIntrospect.depth(u8("42")) == 1)
    assert(JsonIntrospect.depth(u8("{}")) == 1 && JsonIntrospect.depth(u8("[]")) == 1)
    assert(JsonIntrospect.depth(u8("""{"a": [], "b": [[1]]}""")) == 4)
    // escaped quotes survive parsing/serialization verbatim
    val esc = """{"a": "x\"y", "b": 1}"""
    assert(JsonIntrospect.remove(u8(esc), u8("$.b")).toString == """{"a":"x\"y"}""")
    // absent path is a no-op; nested and array-index paths remove in place
    assert(JsonIntrospect.remove(u8("""{"a": 1}"""), u8("$.zz")).toString == """{"a":1}""")
    assert(JsonIntrospect.remove(u8("""{"a": {"b": 1, "c": 2}}"""), u8("$.a.b")).toString
      == """{"a":{"c":2}}""")
    assert(JsonIntrospect.remove(u8("""[1, 2, 3]"""), u8("$[1]")).toString == "[1,3]")
    assert(JsonIntrospect.remove(u8("""[1]"""), u8("$[5]")).toString == "[1]")
    // storage size is whitespace-insensitive (canonical compact length)
    assert(JsonIntrospect.storageSize(u8("""{ "a" : 1 }""")) ==
      JsonIntrospect.storageSize(u8("""{"a": 1}""")))
    // pretty round-trips structure with 2-space indent
    assert(JsonIntrospect.pretty(u8("""{"a": [1]}""")).toString ==
      "{\n  \"a\": [\n    1\n  ]\n}")
    // malformed input raises (MySQL errors on invalid JSON)
    intercept[IllegalArgumentException] { JsonIntrospect.depth(u8("{broken")) }
    // codegen == interpreted through the column API
    import spark.implicits._
    val df = Seq("""{"a": {"b": [1, 2]}}""").toDF("j")
    def run() = df.select(
      JsonIntrospect.json_depth(col("j")),
      JsonIntrospect.json_remove(col("j"), lit("$.a.b[0]")),
      JsonIntrospect.json_storage_size(col("j"))).head()
    val cg = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(cg == interp)
    assert(cg.getInt(0) == 4 && cg.getString(1) == """{"a":{"b":[2]}}""")
  }
}
