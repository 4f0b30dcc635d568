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
    // scalar WITHOUT WRAPPER is a structural ERROR (SQL:2016): it takes
    // the ON ERROR behavior, not ON EMPTY
    import spark.implicits._
    val r = Seq(1).toDF("x")
      .select(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a").as("r")).head()
    assert(r.isNullAt(0)) // default ON ERROR = NULL
    assert(one(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a",
      onEmpty = Behavior.Default(lit("EMPTY")),
      onError = Behavior.Default(lit("ERR")))) == "ERR")
    assert(one(JsonModes.jsonQuery(lit("""{"a":1}"""), "$.a",
      arrayWrapper = true)) == "[1]")
  }
}
