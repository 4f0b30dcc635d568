package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL:2016 JSON path modes and behaviors — JSON_VALUE / JSON_QUERY /
  * JSON_EXISTS with LAX vs STRICT path semantics and NULL / ERROR /
  * DEFAULT(...) ON EMPTY / ON ERROR behaviors
  * (reference: core/src/main/java/org/apache/calcite/runtime/JsonFunctions.java —
  * PathMode LAX/STRICT, jsonValueExpression emptyBehavior/errorBehavior;
  * SqlJsonValueFunction, SqlJsonQueryFunction, SqlJsonExistsFunction in
  * sql/fun/).
  *
  * Spark-first: everything composes `get_json_object` (codegen'd) plus
  * conditional logic — no UDFs. The mode/behavior matrix:
  *   - malformed JSON           → ON ERROR behavior (both modes)
  *   - path yields nothing, LAX → ON EMPTY behavior
  *   - path yields nothing, STRICT → ON ERROR behavior (structural error)
  * ERROR behavior raises at runtime via `raise_error` — like the
  * reference's JsonFunctions throwing CalciteException.
  */
object JsonModes {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  sealed trait Behavior
  object Behavior {
    case object Null extends Behavior
    case object Error extends Behavior
    final case class Default(value: Column) extends Behavior
  }
  import Behavior._

  /** SQL:2016 IS JSON [VALUE | OBJECT | ARRAY | SCALAR] predicate family
    * (reference: runtime/JsonFunctions.java isJsonValue/isJsonObject/
    * isJsonArray/isJsonScalar; value rows in SqlOperatorBaseTest
    * testJsonPredicate — '{}' is json object, '[]' is json array,
    * '100' is json scalar). A well-formedness parse plus a
    * first-significant-character dispatch; NULL input yields NULL like
    * the predicates' SQL typing. Everything composes codegen'd
    * expressions — no UDFs. */
  // The JSON literal `null` is a valid JSON value/scalar (reference:
  // JsonFunctions dejsonize accepts it) but Spark's get_json_object probe
  // returns SQL NULL for it — special-cased before the probe.
  private def isNullLiteral(c: Column): Column = c.rlike("^\\s*null\\s*$")
  private def wellFormed(c: Column): Column =
    get_json_object(c, "$").isNotNull || isNullLiteral(c)
  // First significant character: regex \s covers tabs/newlines, unlike
  // trim() which strips only spaces — '\n{}' must classify as object.
  private def firstChar(c: Column): Column = regexp_extract(c, "^\\s*(.)", 1)
  def isJsonValue(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(wellFormed(c))
  def isJsonObject(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(wellFormed(c) && firstChar(c) === "{")
  def isJsonArray(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(wellFormed(c) && firstChar(c) === "[")
  def isJsonScalar(c: Column): Column =
    when(c.isNull, lit(null)).otherwise(
      wellFormed(c) && firstChar(c) =!= "{" && firstChar(c) =!= "[")

  /** Is the string well-formed JSON? Defined via `wellFormed` so the JSON
    * `null` literal counts as valid (the reference's dejsonize parses it)
    * and every entry point — JSON_VALUE/QUERY/EXISTS and the IS JSON
    * predicates — agrees on what "malformed" means. A null SCALAR at a
    * path is still indistinguishable from a missing path downstream
    * (`get_json_object` returns SQL NULL for both), matching the
    * behaviors only at the NULL defaults — documented residual. */
  def jsonIsValid(json: Column): Column =
    when(json.isNull, lit(null)).otherwise(wellFormed(json))

  /** MySQL/Calcite JSON_TYPE classifier (reference: SqlLibraryOperators
    * JSON_TYPE; value rows in SqlOperatorBaseTest testJsonType —
    * '"1"'→STRING, '1'→INTEGER, '11.45'→DOUBLE, 'true'→BOOLEAN,
    * 'null'→NULL, containers→OBJECT/ARRAY; invalid JSON raises). Pure
    * codegen'd expression composition. */
  def jsonType(c: Column): Column = {
    val f = firstChar(c)
    when(c.isNull, lit(null).cast("string"))
      .when(!wellFormed(c),
        raise_error(concat(lit("JSON_TYPE invalid JSON: "), c)))
      .when(f === "{", lit("OBJECT"))
      .when(f === "[", lit("ARRAY"))
      .when(f === "\"", lit("STRING"))
      .when(isNullLiteral(c), lit("NULL"))
      .when(f === "t" || f === "f", lit("BOOLEAN"))
      // Jackson parses integer numerals as Integer when they fit, Long
      // when they fit a long, and BigInteger beyond — and the reference's
      // classifier has no BigInteger arm, so it RAISES for those
      // (runtime/JsonFunctions.java jsonType else-branch). The >19-digit
      // guard runs before the decimal cast so an over-wide numeral takes
      // the raise, never an ANSI CAST_OVERFLOW. FLOAT is unreachable from
      // text input (Jackson never yields Float for JSON numerals).
      .when(regexp_replace(c, "^\\s+|\\s+$", "").rlike("^-?[0-9]+$"), {
        val numeral = regexp_replace(c, "^\\s+|\\s+$", "")
        when(length(regexp_replace(numeral, "^-", "")) > 19,
          raise_error(concat(lit("JSON_TYPE invalid JSON: "), c)))
          .when(numeral.cast("decimal(38,0)")
              .between(Int.MinValue.toLong, Int.MaxValue.toLong), lit("INTEGER"))
          .when(numeral.cast("decimal(38,0)")
              .between(Long.MinValue, Long.MaxValue), lit("LONG"))
          .otherwise(raise_error(concat(lit("JSON_TYPE invalid JSON: "), c)))
      })
      .otherwise(lit("DOUBLE"))
  }

  /** MySQL/Calcite JSON_LENGTH (SqlOperatorBaseTest testJsonLength):
    * object → member count, array → element count, scalar → 1; a missing
    * path is NULL in lax mode and an error in strict mode. */
  def jsonLength(json: Column, path: String = "$",
      strict: Boolean = false): Column = {
    val v = get_json_object(json, path)
    val f = firstChar(v)
    val missing =
      if (strict)
        raise_error(lit(s"JSON_LENGTH: No results for path: $path")).cast("int")
      else lit(null).cast("int")
    when(json.isNull, lit(null).cast("int"))
      // malformed input raises in BOTH modes (reference
      // invalidInputForJsonLength) — only a missing PATH is mode-sensitive
      .when(!wellFormed(json),
        raise_error(concat(lit("JSON_LENGTH invalid input: "), json)).cast("int"))
      .when(v.isNull, missing)
      .when(f === "{", size(json_object_keys(v)))
      .when(f === "[", json_array_length(v))
      .otherwise(lit(1))
  }

  /** MySQL/Calcite JSON_KEYS (SqlOperatorBaseTest testJsonKeys): the
    * member names of an object at the path as JSON text; non-objects and
    * missing paths yield the JSON literal "null" (the reference
    * serializes a Java null through jsonize, not SQL NULL). */
  def jsonKeys(json: Column, path: String = "$"): Column = {
    val v = get_json_object(json, path)
    when(json.isNull, lit(null).cast("string"))
      // malformed input raises (reference invalidInputForJsonKeys); a
      // missing path or non-object is the serialized "null" instead
      .when(!wellFormed(json),
        raise_error(concat(lit("JSON_KEYS invalid input: "), json)).cast("string"))
      .when(v.isNotNull && firstChar(v) === "{", to_json(json_object_keys(v)))
      .otherwise(lit("null"))
  }

  private def behave(b: Behavior, what: String): Column = b match {
    case Null => lit(null).cast("string")
    case Default(v) => v
    case Error => raise_error(lit(what))
  }

  /** JSON_VALUE(json, path [mode] [behaviors]) → string scalar.
    * SQL:2016 §9.40 / reference JsonFunctions.jsonValue: a NON-SCALAR
    * result (object/array) is EMPTY in lax mode but a structural ERROR
    * in strict mode ("Strict jsonpath mode requires scalar value" —
    * SqlOperatorBaseTest testJsonValue); a missing path is EMPTY in lax,
    * ERROR in strict. */
  def jsonValue(json: Column, path: String, strict: Boolean = false,
      onEmpty: Behavior = Null, onError: Behavior = Null): Column = {
    val v = get_json_object(json, path)
    // `get_json_object` strips JSON string quotes, so a STRING scalar whose
    // content starts with '{'/'[' would look like a container by first char
    // alone — require the extracted text to itself be well-formed container
    // JSON before classifying non-scalar (reference isScalarObject checks
    // the PARSED type). Residual ambiguity (same as jsonQuery's wrap
    // comment): a string scalar whose content IS valid container JSON
    // ('"[1]"') is indistinguishable after extraction.
    val nonScalar =
      substring(v, 1, 1).isin("{", "[") && get_json_object(v, "$").isNotNull
    when(json.isNull, lit(null).cast("string"))
      .when(!jsonIsValid(json), behave(onError, "JSON_VALUE malformed JSON (ON ERROR)"))
      .when(v.isNull,
        if (strict) behave(onError, s"JSON_VALUE strict $path found nothing (ON ERROR)")
        else behave(onEmpty, s"JSON_VALUE lax $path found nothing (ON EMPTY)"))
      .when(nonScalar,
        if (strict) behave(onError,
          s"JSON_VALUE strict jsonpath mode requires scalar value (ON ERROR)")
        else behave(onEmpty, s"JSON_VALUE lax non-scalar is empty (ON EMPTY)"))
      .otherwise(v)
  }

  /** JSON_EXISTS(json, path) — `errorResult` is the ON ERROR outcome
    * (SQL:2016 default FALSE; TRUE/UNKNOWN spellable by passing
    * lit(true) / lit(null)). In strict mode a missing path is an ERROR
    * (takes `errorResult`); in lax it is simply FALSE
    * (SqlOperatorBaseTest testJsonExists rows). */
  def jsonExists(json: Column, path: String, strict: Boolean = false,
      errorResult: Column = lit(false)): Column =
    when(json.isNull, lit(null).cast("boolean"))
      .when(!jsonIsValid(json), errorResult.cast("boolean"))
      .otherwise(
        if (strict)
          when(get_json_object(json, path).isNull, errorResult.cast("boolean"))
            .otherwise(lit(true))
        else get_json_object(json, path).isNotNull)

  /** SQL:2016 JSON_QUERY wrapper modes. */
  sealed trait Wrapper
  object Wrapper {
    /** WITHOUT [ARRAY] WRAPPER — scalar results are a structural error. */
    case object Without extends Wrapper
    /** WITH CONDITIONAL [ARRAY] WRAPPER — wrap unless already an array. */
    case object Conditional extends Wrapper
    /** WITH [UNCONDITIONAL] [ARRAY] WRAPPER — always wrap. */
    case object Unconditional extends Wrapper
  }

  /** JSON_QUERY(json, path [mode] [wrapper] [behaviors]) → JSON text.
    * Under WITHOUT WRAPPER a scalar result is a STRUCTURAL ERROR (ON
    * ERROR behavior, per SQL:2016 and the reference's JsonFunctions
    * "Strict jsonpath mode requires array or object value");
    * CONDITIONAL wraps any non-array result, UNCONDITIONAL wraps
    * everything (['[100]'] → [[100]] — testJsonQuery wrapper rows). A
    * missing path is EMPTY in lax mode, ERROR in strict. */
  def jsonQuery(json: Column, path: String,
      wrapper: Wrapper = Wrapper.Without, strict: Boolean = false,
      onEmpty: Behavior = Null, onError: Behavior = Null): Column = {
    val v = get_json_object(json, path)
    // same parsed-type narrowing as jsonValue's nonScalar: a string scalar
    // whose content starts with '{'/'[' is NOT a container unless the
    // extracted text itself parses as JSON
    val reparses = get_json_object(v, "$").isNotNull
    val isArray = substring(v, 1, 1) === "[" && reparses
    val isStruct = substring(v, 1, 1).isin("{", "[") && reparses
    // wrapping a scalar must RE-QUOTE strings (`get_json_object` strips
    // JSON string quotes): ["bar"], not [bar] — the reference's
    // JsonFunctions wrapper emits JSON text. Numbers/booleans/null keep
    // their lexical form, gated by the STRICT JSON number grammar so a
    // malformed numeral-lookalike ("1-2", "1.2.3", "1e") falls to the
    // to_json re-quoting path and stays valid JSON. Known limit: a
    // string whose extracted form IS a valid JSON literal ("123",
    // "true") is indistinguishable after extraction and wraps unquoted.
    val plain =
      v.rlike("^(-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?|true|false|null)$")
    val wrapScalar = when(plain, concat(lit("["), v, lit("]")))
      .otherwise(to_json(array(v)))
    // arrays/objects are already JSON text — bracket them verbatim
    val wrapStruct = concat(lit("["), v, lit("]"))
    when(json.isNull, lit(null).cast("string"))
      .when(!jsonIsValid(json), behave(onError, "JSON_QUERY malformed JSON (ON ERROR)"))
      .when(v.isNull,
        if (strict) behave(onError,
          s"JSON_QUERY strict $path found nothing (ON ERROR)")
        else behave(onEmpty, "JSON_QUERY path found nothing (ON EMPTY)"))
      .otherwise(wrapper match {
        case Wrapper.Without =>
          // a scalar WITHOUT WRAPPER takes the ON EMPTY behavior in lax
          // mode but ON ERROR in strict (reference JsonFunctions.jsonQuery;
          // SqlOperatorBaseTest testJsonQuery:4718-4724 — 'lax $.foo'
          // empty-array-on-empty → '[]', strict raises)
          when(isStruct, v).otherwise(
            if (strict) behave(onError,
              "JSON_QUERY scalar WITHOUT WRAPPER (ON ERROR)")
            else behave(onEmpty,
              "JSON_QUERY lax scalar WITHOUT WRAPPER (ON EMPTY)"))
        case Wrapper.Conditional =>
          when(isArray, v).when(isStruct, wrapStruct).otherwise(wrapScalar)
        case Wrapper.Unconditional =>
          when(isStruct, wrapStruct).otherwise(wrapScalar)
      })
  }

  val defs: Seq[QDef] = Seq(

    // LAX vs STRICT over a partially-corrupted JSON column: rows with
    // event_id % 5 = 0 get malformed JSON ('{' prefixed), exercising every
    // cell of the mode × behavior matrix the oracle can express (the ERROR
    // behavior — a runtime raise — is spec-verified instead).
    QDef.sql("fn_json_modes",
      """SELECT event_id,
        |  json_extract_string(okj, '$.k') AS jv_lax,
        |  CASE WHEN okj IS NULL THEN 'ERR'
        |       ELSE COALESCE(json_extract_string(okj, '$.k'), '-') END AS jv_default_err,
        |  CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 'ERR'
        |       ELSE json_extract_string(props, '$.missing') END AS jv_strict_missing,
        |  COALESCE(json_extract_string(props, '$.missing'), 'none') AS jv_lax_missing,
        |  okj IS NOT NULL AND json_extract_string(okj, '$.k') IS NOT NULL AS je_lax,
        |  CAST(json_extract('{"a":{"b":[10,20]}}', '$.a') AS VARCHAR) AS jq_obj,
        |  concat('[', json_extract_string(props, '$.k'), ']') AS jq_wrap
        |FROM (
        |  SELECT event_id, props,
        |    CASE WHEN json_valid(broken) THEN broken END AS okj
        |  FROM (
        |    SELECT event_id, props,
        |      CASE WHEN event_id % 5 = 0 THEN concat('{', props) ELSE props END AS broken
        |    FROM events WHERE event_id % 3 = 0))""") { (s, dir) =>
      val base = t(s, dir, "events").where(col("event_id") % 3 === 0)
        .select(col("event_id"), col("props"),
          when(col("event_id") % 5 === 0, concat(lit("{"), col("props")))
            .otherwise(col("props")).as("broken"))
      base.select(
        col("event_id"),
        jsonValue(col("broken"), "$.k").as("jv_lax"),
        jsonValue(col("broken"), "$.k",
          onEmpty = Default(lit("-")), onError = Default(lit("ERR"))).as("jv_default_err"),
        jsonValue(col("props"), "$.missing", strict = true,
          onError = Default(lit("ERR"))).as("jv_strict_missing"),
        jsonValue(col("props"), "$.missing",
          onEmpty = Default(lit("none"))).as("jv_lax_missing"),
        jsonExists(col("broken"), "$.k").as("je_lax"),
        jsonQuery(lit("""{"a":{"b":[10,20]}}"""), "$.a").as("jq_obj"),
        jsonQuery(col("props"), "$.k", wrapper = Wrapper.Unconditional).as("jq_wrap"))
    },

    // IS JSON predicate family over a mixed column: objects (events
    // props), arrays, numeric/string/boolean scalars, malformed text, and
    // NULL — one row per kind per event. The DuckDB oracle mirrors the
    // dispatch with json_valid + the first significant character.
    QDef.sql("fn_json_predicates",
      """WITH mixed AS (
        |  SELECT event_id,
        |    CASE (event_id % 9)
        |      WHEN 0 THEN props WHEN 1 THEN '[1, 2, 3]' WHEN 2 THEN '100'
        |      WHEN 3 THEN '"abc"' WHEN 4 THEN 'true'
        |      WHEN 5 THEN concat('{', props)
        |      WHEN 6 THEN 'null'
        |      WHEN 7 THEN concat(chr(9), chr(10), '{"a":1}') END AS j
        |  FROM events WHERE event_id % 3 = 0)
        |SELECT event_id, j,
        |  json_valid(j) AS is_value,
        |  json_valid(j) AND regexp_extract(j, '^\s*(.)', 1) = '{' AS is_object,
        |  json_valid(j) AND regexp_extract(j, '^\s*(.)', 1) = '[' AS is_array,
        |  json_valid(j) AND regexp_extract(j, '^\s*(.)', 1) NOT IN ('{', '[') AS is_scalar,
        |  NOT json_valid(j) AS not_value
        |FROM mixed""") { (s, dir) =>
      val m = col("event_id") % 9
      val j = when(m === 0, col("props"))
        .when(m === 1, lit("[1, 2, 3]"))
        .when(m === 2, lit("100"))
        .when(m === 3, lit("\"abc\""))
        .when(m === 4, lit("true"))
        .when(m === 5, concat(lit("{"), col("props")))
        .when(m === 6, lit("null"))
        .when(m === 7, lit("\t\n{\"a\":1}"))
      t(s, dir, "events").where(col("event_id") % 3 === 0)
        .select(col("event_id"), j.as("j"),
          isJsonValue(j).as("is_value"),
          isJsonObject(j).as("is_object"),
          isJsonArray(j).as("is_array"),
          isJsonScalar(j).as("is_scalar"),
          (!isJsonValue(j)).as("not_value"))
    }
  )
}
