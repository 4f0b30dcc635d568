package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 15 (r16) — the three families the
  * r15 verdict named as un-mined: MATCH_RECOGNIZE validation scope
  * (pattern-variable resolution, define/measure typing), charset/
  * collation comparison errors, and structured-type field access. One
  * case per reference assertion family, cited per family; same contract
  * as tranches 1-14: each statement must be REJECTED before execution;
  * accepted-control twins guard vacuity.
  *
  * References:
  *  - core/src/test/java/org/apache/calcite/test/SqlValidatorMatchTest.java
  *    (testMatchRecognizeDefines2/4/5/6, testMatchRecognizeMeasures1,
  *    testMatchRecognizeSkipTo3, testMatchRecognizeSubset/Subset2,
  *    testMatchRecognizeWithin/Within2). Our MR front end re-raises its
  *    scope validations through the SQL entry as the delegate parser's
  *    canonical rejection (MatchRecognizeSql.tryParse fall-through), so
  *    every case here asserts statement-level rejection.
  *  - core/src/test/java/org/apache/calcite/test/SqlValidatorTest.java
  *    testCharsetMismatch:730 (ISO-8859-1 vs UTF-16LE comparisons reject
  *    across =, <>, <, <=, >, >=, ||). Spark's analog of the two-charset
  *    model is per-value collation; explicit-vs-explicit mismatches
  *    reject as COLLATION_MISMATCH.EXPLICIT.
  *  - SqlValidatorTest.java testArrayOfRecordType:8055 ("Unknown field
  *    'NE'"), testItemOperatorException:8068 ("Cannot apply 'ITEM' to
  *    arguments of type 'ITEM(<VARCHAR(10)>, <INTEGER>)'"), and the
  *    nested-record access rows (customer.contact.coord:8040).
  */
class ValidatorParitySpec12 extends AnyFunSuite {
  import SparkTestSession._

  private def ensureEvents(): Unit = Tables.registerAll(spark, sfDir)

  private def rejected(sql: String): Exception = {
    val ex = intercept[Exception] {
      spark.sql(sql).queryExecution.analyzed
    }
    assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
      ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
      ex.isInstanceOf[org.apache.spark.SparkException],
      s"expected analysis/parse rejection, got ${ex.getClass}: ${ex.getMessage}")
    ex
  }

  // ---- MATCH_RECOGNIZE validation scope (SqlValidatorMatchTest) ----------

  private def mr(measures: String, skip: String, pattern: String,
      within: String, subset: String, defines: String): String =
    s"""SELECT * FROM events MATCH_RECOGNIZE (
       |  PARTITION BY user_id ORDER BY ts, event_id
       |  MEASURES $measures
       |  $skip
       |  PATTERN ($pattern)
       |  $within
       |  $subset
       |  DEFINE $defines)""".stripMargin.replaceAll("(?m)^\\s*$\\n", "")

  private val mrRejects: Seq[(String, String)] = Seq(
    // testMatchRecognizeDefines2:57 — "Pattern variable 'DOWN' has
    // already been defined" (duplicate DEFINE entry)
    ("duplicate DEFINE of the same pattern variable",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "",
        "C AS event_type = 'click', C AS event_type = 'view', E AS event_type = 'error'")),
    // "Unknown pattern" family — a DEFINE symbol outside the PATTERN
    ("DEFINE symbol not present in PATTERN",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "",
        "C AS event_type = 'click', Z AS event_type = 'view'")),
    // testMatchRecognizeSkipTo3:162 — "Unknown pattern 'NO_EXISTS'"
    ("AFTER MATCH SKIP TO an undeclared variable",
      mr("COUNT(C.*) AS n", "AFTER MATCH SKIP TO FIRST NO_EXISTS", "C{2,} E",
        "", "", "C AS event_type = 'click', E AS event_type = 'error'")),
    // testMatchRecognizeSubset:198 — "Unknown pattern 'STRT1'" (a SUBSET
    // member outside the PATTERN)
    ("SUBSET member not present in PATTERN",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "SUBSET S = (C, STRT1)",
        "C AS event_type = 'click', E AS event_type = 'error'")),
    // testMatchRecognizeSubset2:211 — "Pattern variable 'STRT' has
    // already been defined" (SUBSET name colliding with a pattern var)
    ("SUBSET name colliding with a pattern variable",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "SUBSET E = (C)",
        "C AS event_type = 'click', E AS event_type = 'error'")),
    // testMatchRecognizeWithin2:236 — "First column of ORDER BY must be
    // of type TIMESTAMP" when WITHIN is used (event_id is BIGINT)
    ("WITHIN over a non-timestamp leading ORDER BY column",
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY event_id
        |  MEASURES COUNT(C.*) AS n
        |  PATTERN (C+ E)
        |  WITHIN INTERVAL '4' HOUR
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin),
    // testMatchRecognizeDefines4:79 — "Cannot nest PREV/NEXT under
    // LAST/FIRST 'PREV(`UP`.`SAL`, 1)'"
    ("PREV nested under FIRST in DEFINE",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "",
        "C AS event_type = 'click', E AS value > FIRST(PREV(E.value))")),
    // testMatchRecognizeDefines5:91 — "Cannot nest PREV/NEXT under
    // LAST/FIRST 'FIRST(`UP`.`SAL`, 0)'" (FIRST under FIRST)
    ("FIRST nested under FIRST in DEFINE",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "",
        "C AS event_type = 'click', E AS value > FIRST(FIRST(E.value))")),
    // testMatchRecognizeDefines6:103 — "Invalid number of parameters to
    // COUNT method"
    ("COUNT with two column parameters in DEFINE",
      mr("COUNT(C.*) AS n", "", "C{2,} E", "", "",
        "C AS event_type = 'click', E AS value > COUNT(C.value, E.value)")),
    // testMatchRecognizeMeasures1:115 — "Null parameters in 'LAST(NULL, 0)'"
    ("LAST(NULL) measure",
      mr("LAST(NULL) AS bottom", "", "C{2,} E", "", "",
        "C AS event_type = 'click', E AS event_type = 'error'")),
    // testMatchRecognizeWithin:224 — "Must contain an ORDER BY clause
    // when WITHIN is used" (no ORDER BY at all)
    ("WITHIN without an ORDER BY clause",
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  MEASURES COUNT(C.*) AS n
        |  PATTERN (C+ E)
        |  WITHIN INTERVAL '4' HOUR
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin))

  for ((name, sql) <- mrRejects)
    test(s"MR rejects: $name") {
      ensureEvents()
      rejected(sql)
    }

  test("MR control: the declared form analyzes and runs") {
    ensureEvents()
    val ok = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(C.*) AS n_clicks
        |  PATTERN (C{2,} E)
        |  SUBSET S = (C, E)
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin)
    assert(ok.queryExecution.analyzed != null)
  }

  // ---- charset/collation comparisons (testCharsetMismatch:730) -----------

  private val collationRejects: Seq[(String, String)] = Seq(
    ("equals across explicit collations",
      "SELECT 'a' COLLATE UNICODE = 'b' COLLATE UTF8_LCASE"),
    ("not-equals across explicit collations",
      "SELECT 'a' COLLATE UNICODE <> 'b' COLLATE UTF8_LCASE"),
    ("less-than across explicit collations",
      "SELECT 'a' COLLATE UNICODE < 'b' COLLATE UTF8_BINARY"),
    ("less-or-equal across explicit collations",
      "SELECT 'a' COLLATE UNICODE <= 'b' COLLATE UTF8_BINARY"),
    ("greater-than across explicit collations",
      "SELECT 'a' COLLATE UNICODE > 'b' COLLATE UTF8_LCASE"),
    ("greater-or-equal across explicit collations",
      "SELECT 'a' COLLATE UNICODE >= 'b' COLLATE UTF8_LCASE"),
    ("concat across explicit collations (the || row)",
      "SELECT concat('a' COLLATE UNICODE, 'b' COLLATE UTF8_LCASE)"),
    ("IN-list across explicit collations",
      "SELECT 'a' COLLATE UNICODE IN ('b' COLLATE UTF8_LCASE)"),
    ("function argument across explicit collations",
      "SELECT array_contains(array('a' COLLATE UNICODE), 'b' COLLATE UTF8_LCASE)"),
    ("unknown collation name",
      "SELECT 'a' COLLATE NOSUCHCOLL"))

  for ((name, sql) <- collationRejects)
    test(s"collation rejects: $name") {
      rejected(sql)
    }

  test("collation controls: consistent collations analyze cleanly") {
    Seq(
      "SELECT 'a' COLLATE UNICODE = 'b' COLLATE UNICODE",
      "SELECT 'a' COLLATE UTF8_LCASE < 'b' COLLATE UTF8_LCASE",
      // explicit vs default coerces (the reference's COERCIBLE vs
      // EXPLICIT precedence — _testCharsetAndCollateMismatch's accepted half)
      "SELECT 'a' COLLATE UNICODE = 'b'",
      "SELECT concat('a' COLLATE UTF8_LCASE, 'b' COLLATE UTF8_LCASE)")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }

  test("pinned divergence: string || binary coerces in Spark") {
    // testConcatFails:690 rejects 'a'||x'ff' ("Cannot apply '||' to
    // arguments of type '<CHAR(1)> || <BINARY(1)>'"); Spark implicitly
    // casts the binary operand and accepts — pinned as a divergence, the
    // same adjudication as the 14 FunctionParity pins.
    assert(spark.sql("SELECT 'a' || X'FF'").queryExecution.analyzed != null)
  }

  // ---- structured-type field access (testArrayOfRecordType:8055,
  //      testItemOperatorException:8068, nested records :8040) -------------

  private val structRejects: Seq[(String, String)] = Seq(
    // "Unknown field 'NE'" — unknown field on a record
    ("unknown field on a struct",
      "SELECT named_struct('ename', 'x').ne"),
    // unknown field two levels down (customer.contact.coord analog)
    ("unknown field on a nested struct",
      "SELECT named_struct('coord', named_struct('x', 1)).coord.z"),
    // testArrayOfRecordType — employees[1].^ne^ (field of an array element)
    ("unknown field on an array-of-records element",
      "SELECT array(named_struct('ename', 'x'))[1].ne"),
    // testItemOperatorException — ITEM on a VARCHAR ("Cannot apply 'ITEM'")
    ("ITEM access on a varchar",
      "SELECT 'name'[0]"),
    ("field access on a numeric expression",
      "SELECT (1 + 2).x"),
    // ITEM with a mistyped key (<ARRAY>[<INTEGER>] supported form)
    ("array ITEM with a string index",
      "SELECT array(1, 2)['x']"))

  for ((name, sql) <- structRejects)
    test(s"struct rejects: $name") {
      rejected(sql)
    }

  test("struct controls: the accepted access forms analyze cleanly") {
    Seq(
      // testStructuredTypes accepted rows: record field, nested record
      "SELECT named_struct('zip', 1).zip",
      "SELECT named_struct('coord', named_struct('x', 1, 'y', 2)).coord.x",
      // testArrayOfRecordType accepted rows: employees[1].ename and the
      // deep skills[1].others.a chain
      "SELECT array(named_struct('ename', 'x'))[0].ename",
      """SELECT array(named_struct('detail', named_struct('skills',
        |array(named_struct('others', named_struct('a', 'y'))))))[0]
        |.detail.skills[0].others.a""".stripMargin,
      // map ITEM (the supported <MAP>[<key>] form)
      "SELECT map('k', 1)['k']")
      .foreach(q => assert(spark.sql(q).queryExecution.analyzed != null, q))
  }
}
