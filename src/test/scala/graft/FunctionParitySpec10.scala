package graft

import graft.operators.JsonModes
import graft.operators.JsonModes.{Behavior, Wrapper}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Function VALUE parity, tranche 15 (r16) — the two families the r15
  * verdict listed as the last unported: the checkWinAgg windowed-
  * aggregate value tables and the SQL:2016 JSON behavior matrix
  * (reference: core/src/test/java/org/apache/calcite/sql/test/
  * SqlOperatorBaseTest.java — testLastValueFunc:8520, testFirstValueFunc
  * :8546, testJsonExists:4583, testJsonValue:4629, testJsonQuery:4708;
  * values transcribed verbatim, cited per case).
  *
  * checkWinAgg harness mapping: the reference builds `SELECT expr OVER
  * (ROWS 3 PRECEDING) FROM <union of single-value selects>` with no
  * ORDER BY and compares the DISTINCT SET of per-row outputs. Spark
  * requires an ORDER BY for a row frame, so the rows carry their union
  * ordinal and the window orders by it — reproducing the reference's
  * arrival order deterministically. The reference's FIRST_VALUE/
  * LAST_VALUE skip nulls (its expected sets contain no null even though
  * the input does), so the parity calls use Spark's explicit
  * IGNORE NULLS spelling; the RESPECT NULLS default is pinned as a
  * divergence case. CHAR(4) literals pad in the reference
  * ("foo " vs "foo") — normalized by trim, the censuses' CHAR rule.
  *
  * JSON mapping: json_value/json_query/json_exists with lax/strict
  * paths and ON EMPTY / ON ERROR behaviors lower to JsonModes (operators/
  * JsonModes.scala). The reference's 'invalid $.foo' PATH-SYNTAX error
  * rows are carried with malformed JSON INPUT as the error trigger
  * (Spark compiles the path; a bad path is indistinguishable from an
  * empty result), exercising the same behavior cell.
  */
class FunctionParitySpec10 extends AnyFunSuite {
  import SparkTestSession._

  // ---- checkWinAgg ---------------------------------------------------------

  /** Evaluate `expr OVER (ORDER BY i <frame>)` per row over values in
    * the reference's arrival order; compare the distinct result set. */
  private def winAgg(citation: String, expr: String, values: Seq[String],
      frame: String, want: Set[Option[String]]): Unit =
    test(s"$citation: $expr over (${values.mkString(", ")}) $frame") {
      val rel = values.zipWithIndex
        .map { case (v, i) => s"($i, $v)" }.mkString(", ")
      val got = spark.sql(
        s"SELECT $expr OVER (ORDER BY i $frame) AS v FROM (VALUES $rel) AS t(i, x)")
        .collect().map(r => Option(r.get(0)).map(_.toString)).toSet
      assert(got == want, s"expected $want, got $got")
    }

  private val winInts = Seq("0", "CAST(null AS INTEGER)", "3", "3")
  private val winDecs = Seq("1.6", "1.2")
  private val winStrs = Seq("'foo'", "'bar'", "'name'")

  // testLastValueFunc:8526 — expected {"3", "0"}: the null row's frame
  // yields the last non-null (reference LAST_VALUE skips nulls)
  winAgg("testLastValueFunc", "last_value(x) IGNORE NULLS", winInts,
    "ROWS 3 PRECEDING", Set(Some("3"), Some("0")))
  // testLastValueFunc:8529 — decimals {"1.6", "1.2"}
  winAgg("testLastValueFunc", "last_value(x) IGNORE NULLS", winDecs,
    "ROWS 3 PRECEDING", Set(Some("1.6"), Some("1.2")))
  // testLastValueFunc:8537 — strings {"foo ", "bar ", "name"}; the
  // reference's CHAR(4) literals pad — Spark strings don't, so the
  // expected set is the unpadded spellings (the censuses' CHAR rule)
  winAgg("testLastValueFunc", "last_value(x) IGNORE NULLS", winStrs,
    "ROWS 3 PRECEDING", Set(Some("foo"), Some("bar"), Some("name")))
  // testFirstValueFunc:8552 — {"0"}: every 4-row frame starts at row 1
  winAgg("testFirstValueFunc", "first_value(x) IGNORE NULLS", winInts,
    "ROWS 3 PRECEDING", Set(Some("0")))
  // testFirstValueFunc:8555 — {"1.6"}
  winAgg("testFirstValueFunc", "first_value(x) IGNORE NULLS", winDecs,
    "ROWS 3 PRECEDING", Set(Some("1.6")))
  // testFirstValueFunc:8563 — {"foo "} (unpadded here, same CHAR rule)
  winAgg("testFirstValueFunc", "first_value(x) IGNORE NULLS", winStrs,
    "ROWS 3 PRECEDING", Set(Some("foo")))
  // pinned divergence: SQL:2016 default is RESPECT NULLS — Spark's
  // default last_value surfaces the null row ({0, NULL, 3}), which the
  // reference's null-skipping runtime never emits
  winAgg("testLastValueFunc (RESPECT NULLS divergence)", "last_value(x)",
    winInts, "ROWS 3 PRECEDING", Set(Some("3"), Some("0"), None))

  // ---- JSON behavior matrix ------------------------------------------------

  private sealed trait Want
  private case class S(v: String) extends Want
  private case object NULL extends Want
  private case class RAISES(fragment: String) extends Want

  private def checkCol(citation: String, label: String, c: Column,
      want: Want): Unit =
    test(s"$citation: $label") {
      import spark.implicits._
      def run() = Seq(1).toDF("one").select(c.as("r")).head()
      want match {
        case S(v) =>
          val r = run(); assert(!r.isNullAt(0) && r.get(0).toString == v,
            s"expected '$v', got '${r.get(0)}'")
        case NULL => assert(run().isNullAt(0))
        case RAISES(frag) =>
          val ex = intercept[Exception](run())
          assert(ex.getMessage.contains(frag),
            s"expected raise containing '$frag', got: ${ex.getMessage}")
      }
    }

  private val obj = lit("""{"foo":100}""")
  private val objStr = lit("""{"foo":"100"}""")
  private val objEmpty = lit("""{"foo":{}}""")
  private val objArr = lit("""{"foo":[100]}""")
  private val bad = lit("""{broken""")
  import Behavior.{Default, Error}

  // ---- testJsonExists:4583 ----
  checkCol("testJsonExists", "strict $.foo false on error -> true",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo", strict = true), S("true"))
  checkCol("testJsonExists", "strict $.foo true on error -> true",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo", strict = true,
      errorResult = lit(true)), S("true"))
  checkCol("testJsonExists", "strict $.foo unknown on error -> true",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo", strict = true,
      errorResult = lit(null)), S("true"))
  checkCol("testJsonExists", "lax $.foo false on error -> true",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo"), S("true"))
  checkCol("testJsonExists", "error trigger, false on error -> false",
    JsonModes.jsonExists(bad, "$.foo"), S("false"))
  checkCol("testJsonExists", "error trigger, true on error -> true",
    JsonModes.jsonExists(bad, "$.foo", errorResult = lit(true)), S("true"))
  checkCol("testJsonExists", "error trigger, unknown on error -> null",
    JsonModes.jsonExists(bad, "$.foo", errorResult = lit(null)), NULL)
  checkCol("testJsonExists", "strict $.foo1 false on error -> false (missing is an error)",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1", strict = true), S("false"))
  checkCol("testJsonExists", "strict $.foo1 true on error -> true",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1", strict = true,
      errorResult = lit(true)), S("true"))
  checkCol("testJsonExists", "strict $.foo1 unknown on error -> null",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1", strict = true,
      errorResult = lit(null)), NULL)
  checkCol("testJsonExists", "lax $.foo1 true on error -> false (missing is not an error)",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1",
      errorResult = lit(true)), S("false"))
  checkCol("testJsonExists", "lax $.foo1 false on error -> false",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1"), S("false"))
  checkCol("testJsonExists", "lax $.foo1 unknown on error -> false",
    JsonModes.jsonExists(lit("""{"foo":"bar"}"""), "$.foo1",
      errorResult = lit(null)), S("false"))
  checkCol("testJsonExists", "null input -> null",
    JsonModes.jsonExists(lit(null).cast("string"), "$.foo1",
      errorResult = lit(null)), NULL)

  // ---- testJsonValue:4629 ----
  checkCol("testJsonValue", "strict $.foo -> 100",
    JsonModes.jsonValue(obj, "$.foo", strict = true), S("100"))
  checkCol("testJsonValue", "strict $.foo returning integer -> 100",
    JsonModes.jsonValue(obj, "$.foo", strict = true).cast("int"), S("100"))
  checkCol("testJsonValue", "lax $.foo1 returning integer default 100.0 on empty -> 100",
    JsonModes.jsonValue(obj, "$.foo1",
      onEmpty = Default(lit(100.0))).cast("int"), S("100"))
  checkCol("testJsonValue", "lax $.foo null on empty (present) -> 100",
    JsonModes.jsonValue(obj, "$.foo"), S("100"))
  checkCol("testJsonValue", "lax $.foo error on empty (present) -> 100",
    JsonModes.jsonValue(obj, "$.foo", onEmpty = Error), S("100"))
  checkCol("testJsonValue", "lax $.foo default 'empty' on empty (present) -> 100",
    JsonModes.jsonValue(obj, "$.foo", onEmpty = Default(lit("empty"))), S("100"))
  checkCol("testJsonValue", "lax $.foo1 null on empty -> null",
    JsonModes.jsonValue(obj, "$.foo1"), NULL)
  checkCol("testJsonValue", "lax $.foo1 error on empty raises",
    JsonModes.jsonValue(obj, "$.foo1", onEmpty = Error), RAISES("ON EMPTY"))
  checkCol("testJsonValue", "lax $.foo1 default 'empty' on empty -> empty",
    JsonModes.jsonValue(obj, "$.foo1", onEmpty = Default(lit("empty"))), S("empty"))
  checkCol("testJsonValue", "lax $.foo over {} null on empty -> null (non-scalar is empty)",
    JsonModes.jsonValue(objEmpty, "$.foo"), NULL)
  checkCol("testJsonValue", "lax $.foo over {} error on empty raises",
    JsonModes.jsonValue(objEmpty, "$.foo", onEmpty = Error), RAISES("ON EMPTY"))
  checkCol("testJsonValue", "lax $.foo over {} default 'empty' on empty -> empty",
    JsonModes.jsonValue(objEmpty, "$.foo", onEmpty = Default(lit("empty"))),
    S("empty"))
  checkCol("testJsonValue", "lax $.foo null on error (no error) -> 100",
    JsonModes.jsonValue(obj, "$.foo", onError = Error), S("100"))
  checkCol("testJsonValue", "error trigger, null on error -> null",
    JsonModes.jsonValue(bad, "$.foo"), NULL)
  checkCol("testJsonValue", "error trigger, error on error raises",
    JsonModes.jsonValue(bad, "$.foo", onError = Error), RAISES("ON ERROR"))
  checkCol("testJsonValue", "error trigger, default 'empty' on error -> empty",
    JsonModes.jsonValue(bad, "$.foo", onError = Default(lit("empty"))), S("empty"))
  checkCol("testJsonValue", "strict $.foo null on empty (present) -> 100",
    JsonModes.jsonValue(obj, "$.foo", strict = true), S("100"))
  checkCol("testJsonValue", "strict $.foo1 null on error -> null (missing is an error)",
    JsonModes.jsonValue(obj, "$.foo1", strict = true), NULL)
  checkCol("testJsonValue", "strict $.foo1 error on error raises",
    JsonModes.jsonValue(obj, "$.foo1", strict = true, onError = Error),
    RAISES("ON ERROR"))
  checkCol("testJsonValue", "strict $.foo1 default 'empty' on error -> empty",
    JsonModes.jsonValue(obj, "$.foo1", strict = true,
      onError = Default(lit("empty"))), S("empty"))
  checkCol("testJsonValue", "strict $.foo over {} null on error -> null (scalar required)",
    JsonModes.jsonValue(objEmpty, "$.foo", strict = true), NULL)
  checkCol("testJsonValue", "strict $.foo over {} error on error raises scalar-required",
    JsonModes.jsonValue(objEmpty, "$.foo", strict = true, onError = Error),
    RAISES("requires scalar value"))
  checkCol("testJsonValue", "strict $.foo over {} default 'empty' on error -> empty",
    JsonModes.jsonValue(objEmpty, "$.foo", strict = true,
      onError = Default(lit("empty"))), S("empty"))
  checkCol("testJsonValue", "string-typed scalar extracts unquoted",
    JsonModes.jsonValue(objStr, "$.foo", strict = true), S("100"))
  checkCol("testJsonValue", "null input -> null",
    JsonModes.jsonValue(lit(null).cast("string"), "$.foo", strict = true), NULL)

  // ---- testJsonQuery:4708 ----
  checkCol("testJsonQuery", "lax $ null on empty -> whole object",
    JsonModes.jsonQuery(obj, "$"), S("""{"foo":100}"""))
  checkCol("testJsonQuery", "lax $ error on empty -> whole object",
    JsonModes.jsonQuery(obj, "$", onEmpty = Error), S("""{"foo":100}"""))
  checkCol("testJsonQuery", "lax $ empty array on empty -> whole object",
    JsonModes.jsonQuery(obj, "$", onEmpty = Default(lit("[]"))),
    S("""{"foo":100}"""))
  checkCol("testJsonQuery", "lax $.foo1 null on empty -> null",
    JsonModes.jsonQuery(obj, "$.foo1"), NULL)
  checkCol("testJsonQuery", "lax $.foo1 error on empty raises",
    JsonModes.jsonQuery(obj, "$.foo1", onEmpty = Error), RAISES("ON EMPTY"))
  checkCol("testJsonQuery", "lax $.foo1 empty array on empty -> []",
    JsonModes.jsonQuery(obj, "$.foo1", onEmpty = Default(lit("[]"))), S("[]"))
  checkCol("testJsonQuery", "lax $.foo1 empty object on empty -> {}",
    JsonModes.jsonQuery(obj, "$.foo1", onEmpty = Default(lit("{}"))), S("{}"))
  checkCol("testJsonQuery", "error trigger, null on error -> null",
    JsonModes.jsonQuery(bad, "$.foo"), NULL)
  checkCol("testJsonQuery", "error trigger, error on error raises",
    JsonModes.jsonQuery(bad, "$.foo", onError = Error), RAISES("ON ERROR"))
  checkCol("testJsonQuery", "error trigger, empty array on error -> []",
    JsonModes.jsonQuery(bad, "$.foo", onError = Default(lit("[]"))), S("[]"))
  checkCol("testJsonQuery", "error trigger, empty object on error -> {}",
    JsonModes.jsonQuery(bad, "$.foo", onError = Default(lit("{}"))), S("{}"))
  checkCol("testJsonQuery", "strict $ null on empty -> whole object",
    JsonModes.jsonQuery(obj, "$", strict = true), S("""{"foo":100}"""))
  checkCol("testJsonQuery", "strict $.foo1 null on error -> null",
    JsonModes.jsonQuery(obj, "$.foo1", strict = true), NULL)
  checkCol("testJsonQuery", "strict $.foo1 error on error raises",
    JsonModes.jsonQuery(obj, "$.foo1", strict = true, onError = Error),
    RAISES("ON ERROR"))
  checkCol("testJsonQuery", "strict $.foo1 empty array on error -> []",
    JsonModes.jsonQuery(obj, "$.foo1", strict = true,
      onError = Default(lit("[]"))), S("[]"))
  checkCol("testJsonQuery", "strict $.foo1 empty object on error -> {}",
    JsonModes.jsonQuery(obj, "$.foo1", strict = true,
      onError = Default(lit("{}"))), S("{}"))
  checkCol("testJsonQuery", "strict scalar WITHOUT WRAPPER null on error -> null",
    JsonModes.jsonQuery(obj, "$.foo", strict = true), NULL)
  checkCol("testJsonQuery", "strict scalar WITHOUT WRAPPER error on error raises",
    JsonModes.jsonQuery(obj, "$.foo", strict = true, onError = Error),
    RAISES("WITHOUT WRAPPER"))
  checkCol("testJsonQuery", "strict scalar WITHOUT WRAPPER empty array on error -> []",
    JsonModes.jsonQuery(obj, "$.foo", strict = true,
      onError = Default(lit("[]"))), S("[]"))
  // wrapper rows — scalar
  checkCol("testJsonQuery", "scalar WITH WRAPPER -> [100]",
    JsonModes.jsonQuery(obj, "$.foo", wrapper = Wrapper.Unconditional,
      strict = true), S("[100]"))
  checkCol("testJsonQuery", "scalar WITH UNCONDITIONAL WRAPPER -> [100]",
    JsonModes.jsonQuery(obj, "$.foo", wrapper = Wrapper.Unconditional,
      strict = true), S("[100]"))
  checkCol("testJsonQuery", "scalar WITH CONDITIONAL WRAPPER -> [100]",
    JsonModes.jsonQuery(obj, "$.foo", wrapper = Wrapper.Conditional,
      strict = true), S("[100]"))
  // wrapper rows — array
  checkCol("testJsonQuery", "array WITHOUT WRAPPER -> [100]",
    JsonModes.jsonQuery(objArr, "$.foo", strict = true), S("[100]"))
  checkCol("testJsonQuery", "array WITH UNCONDITIONAL WRAPPER -> [[100]]",
    JsonModes.jsonQuery(objArr, "$.foo", wrapper = Wrapper.Unconditional,
      strict = true), S("[[100]]"))
  checkCol("testJsonQuery", "array WITH CONDITIONAL WRAPPER -> [100] (already an array)",
    JsonModes.jsonQuery(objArr, "$.foo", wrapper = Wrapper.Conditional,
      strict = true), S("[100]"))
  checkCol("testJsonQuery", "null input -> null",
    JsonModes.jsonQuery(lit(null).cast("string"), "$"), NULL)
}
