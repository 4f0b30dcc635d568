package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Validator parity, tranche 21 (r17) — expression/literal TYPING and
  * cast families from SqlValidatorTest that the census walk found
  * uncited (reference: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java; method names cited per case — these citations
  * are what ValidatorCensusSpec counts as "ported" evidence).
  *
  * Type mapping (the censuses' standing dialect rules): CHAR(n)/VARCHAR
  * → STRING, TINYINT..DOUBLE map 1:1, DECIMAL(p,s) maps 1:1, Calcite's
  * "NOT NULL" ↔ Spark's nullable=false flag, BINARY(n)/VARBINARY →
  * BINARY, INTERVAL qualifiers → Spark's ANSI year-month / day-time
  * interval types. Where Spark's DERIVATION differs (floor(int)→BIGINT,
  * sum(string)→DOUBLE, odd-hexit binary literals zero-padded), the case
  * is a PINNED DIVERGENCE, asserted at Spark's value so a silent change
  * of either engine trips it.
  */
class ValidatorParitySpec18 extends AnyFunSuite {
  import SparkTestSession._

  /** Expression analyzes; its single output column has this Spark type
    * string ("int NOT NULL" style — simpleString + nullability). */
  private def typed(citation: String, expr: String, want: String): Unit =
    test(s"$citation: $expr : $want") {
      val f = spark.sql(s"SELECT $expr").schema.head
      val got = f.dataType.simpleString + (if (f.nullable) "" else " NOT NULL")
      assert(got == want, s"expected '$want', got '$got'")
    }

  private def okSql(citation: String, sql: String): Unit =
    test(s"$citation: ok: ${sql.take(70)}") {
      spark.sql(sql).queryExecution.analyzed
      succeed
    }

  private def rejected(citation: String, sql: String): Unit =
    test(s"$citation: rejects: ${sql.take(70)}") {
      val ex = intercept[Exception] { spark.sql(sql).queryExecution.analyzed }
      assert(ex.isInstanceOf[org.apache.spark.sql.AnalysisException] ||
        ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
        s"expected analysis/parse rejection, got ${ex.getClass}")
    }

  // ---- aliases (testMultipleSameAsPass:172, testMultipleDifferentAs:177,
  //      testTypeOfAs:181) -----------------------------------------------
  okSql("testMultipleSameAsPass",
    "select 1 as again, 2 as `again`, 3 as AGAiN from (values (true))")
  okSql("testMultipleDifferentAs", "select 1 as c1, 2 as c2 from (values(true))")
  typed("testTypeOfAs", "1", "int NOT NULL")
  typed("testTypeOfAs", "'hej'", "string NOT NULL")
  typed("testTypeOfAs", "x'deadbeef'", "binary NOT NULL")
  typed("testTypeOfAs", "cast(null as boolean)", "boolean")

  // ---- literal types (testTypesLiterals:192) ----------------------------
  typed("testTypesLiterals", "'abc'", "string NOT NULL")
  typed("testTypesLiterals", "1234567890", "int NOT NULL")
  typed("testTypesLiterals", "123456.7890", "decimal(10,4) NOT NULL")
  typed("testTypesLiterals", "123456.7890e3", "double NOT NULL")
  typed("testTypesLiterals", "true", "boolean NOT NULL")
  typed("testTypesLiterals", "false", "boolean NOT NULL")
  typed("testTypesLiterals", "x'abcd'", "binary NOT NULL")
  // pinned divergence: Calcite rejects odd-hexit binary literals
  // ("must contain an even number of hexits", also testCastBinaryLiteral
  // :1206); Spark zero-pads to X'0ABC'
  test("testTypesLiterals + testCastBinaryLiteral: odd-hexit divergence — Spark pads") {
    val r = spark.sql("select hex(X'abc')").head.getString(0)
    assert(r == "0ABC", s"Spark pads odd hexits: got $r")
  }

  // ---- booleans (testBooleans:243, testNumbers:344) ----------------------
  // Calcite's UNKNOWN literal is Spark's boolean NULL (dialect rule)
  okSql("testBooleans", "select TRUE OR cast(null as boolean) from (values(true))")
  okSql("testBooleans", "select false AND cast(null as boolean) from (values(true))")
  okSql("testBooleans", "select not cast(null as boolean) from (values(true))")
  okSql("testBooleans", "select not true from (values(true))")
  okSql("testBooleans", "select not false from (values(true))")
  okSql("testNumbers", "select 1+-2.*-3.e-1/-4>+5 AND true from (values(true))")

  // ---- string literals (testStringLiteralBroken:464) ---------------------
  // newline-separated literal continuation concatenates (SQL:2003) —
  // Spark agrees; the SAME-LINE case is a pinned divergence: Calcite
  // rejects "String literal continued on same line", Spark concatenates
  test("testStringLiteralBroken: newline continuation concatenates") {
    assert(spark.sql("select 'foo'\n'bar'").head.getString(0) == "foobar")
  }
  test("testStringLiteralBroken: same-line divergence — Spark concatenates") {
    assert(spark.sql("select 'foo' 'bar'").head.getString(0) == "foobar")
  }

  // ---- CASE typing (testCaseExpressionTypes:535) --------------------------
  typed("testCaseExpressionTypes",
    "case 1 when 1 then 'one' else 'not one' end", "string NOT NULL")
  typed("testCaseExpressionTypes",
    "case when 2<1 then 'impossible' end", "string")
  typed("testCaseExpressionTypes",
    "case 'one' when 'two' then 2.00 when 'one' then 1.3 else 3.2 end",
    "decimal(3,2) NOT NULL")
  typed("testCaseExpressionTypes",
    "case 1 when 1 then 'one' when 2 then null else 'more' end", "string")
  typed("testCaseExpressionTypes",
    "CASE 1 WHEN 1 THEN cast(null as integer) END", "int")
  typed("testCaseExpressionTypes",
    "CASE 1 WHEN 1 THEN NULL WHEN 2 THEN cast(cast(null as tinyint) as integer) END",
    "int")

  // ---- string comparison (testStringCompare:633, testStringCompareType:649)
  for (op <- Seq("=", "<>", ">", "<", ">=", "<="))
    typed("testStringCompare + testStringCompareType", s"'a' $op 'b'",
      "boolean NOT NULL")
  typed("testStringCompareType", "CAST(NULL AS VARCHAR(33)) > 'foo'", "boolean")

  // ---- CONCAT function (testConcatFunction:698) ---------------------------
  okSql("testConcatFunction", "select concat('a', 'b')")
  okSql("testConcatFunction", "select concat(x'12', x'34')")
  typed("testConcatFunction", "concat('aabbcc', 'ab', '+-')", "string NOT NULL")
  typed("testConcatFunction", "concat('aabbcc', CAST(NULL AS STRING), '+-')",
    "string")
  // pinned divergence: Calcite rejects concat over non-character args
  // ("Cannot apply 'CONCAT'"); Spark coerces anything to string
  typed("testConcatFunction (coercion divergence)", "concat(true, false)",
    "string NOT NULL")

  // ---- UPPER/LOWER (testUpperLower:804) -----------------------------------
  typed("testUpperLower", "lower('sadf')", "string NOT NULL")
  // the reference's with-coercion row: upper(123) → VARCHAR; Spark agrees
  typed("testUpperLower", "upper(123)", "string NOT NULL")

  // ---- LIKE / SIMILAR TO (testLikeAndSimilar:967) --------------------------
  okSql("testLikeAndSimilar", "select 'a' like 'b'")
  // SIMILAR TO lowers through the engine's SQL:2003 pattern translation
  // (Extras.similarToRegex — the similar_to registry query's surface)
  test("testLikeAndSimilar: similar to via similarToRegex") {
    import graft.operators.Extras
    assert(!spark.sql(s"select 'a' rlike '${Extras.similarToRegex("b")}'")
      .head.getBoolean(0))
    assert(spark.sql(s"select 'ab' rlike '${Extras.similarToRegex("a_")}'")
      .head.getBoolean(0))
  }

  // ---- NULL casts (testNullCast:1038) --------------------------------------
  for ((sqlT, sparkT) <- Seq("tinyint" -> "tinyint", "smallint" -> "smallint",
    "integer" -> "int", "bigint" -> "bigint", "float" -> "float",
    "double" -> "double", "boolean" -> "boolean", "varchar(1)" -> "string",
    "binary" -> "binary", "date" -> "date", "timestamp" -> "timestamp",
    "decimal" -> "decimal(10,0)"))
    typed("testNullCast", s"cast(null as $sqlT)", sparkT)

  // ---- cast type-to-type (testCastTypeToType:1075) --------------------------
  // nullability divergence (standing censuses rule): a cast that can fail
  // at runtime (string→numeric, narrowing, string→timestamp) is NULLABLE
  // in Spark where Calcite derives NOT NULL from the literal; casts that
  // cannot fail keep NOT NULL in both engines
  typed("testCastTypeToType", "cast(123 as varchar(3))", "string NOT NULL")
  typed("testCastTypeToType", "cast('123' as integer)", "int")
  typed("testCastTypeToType", "cast('123' as double)", "double")
  typed("testCastTypeToType", "cast(1.0 as tinyint)", "tinyint")
  typed("testCastTypeToType", "cast(1.0 as bigint)", "bigint")
  typed("testCastTypeToType", "cast(123 as decimal(6,4))", "decimal(6,4)")
  typed("testCastTypeToType", "cast(123 as decimal(6))", "decimal(6,0)")
  typed("testCastTypeToType", "cast(1 as boolean)", "boolean NOT NULL")
  typed("testCastTypeToType", "cast('abc' as timestamp)", "timestamp")

  // ---- registered/custom types (testCastRegisteredType:1180) ----------------
  // our CREATE TYPE surface (plans/TableDdlSql) registers the alias; an
  // unregistered name rejects at parse
  test("testCastRegisteredType: cast to CREATE TYPE alias") {
    spark.sql("CREATE TYPE vp18_bigint AS bigint")
    try {
      val f = spark.sql("SELECT CAST(123 AS vp18_bigint) AS c").schema.head
      assert(f.dataType.simpleString == "bigint")
    } finally spark.sql("DROP TYPE IF EXISTS vp18_bigint")
  }
  rejected("testCastRegisteredType", "select cast(123 as nonexistent_custom_type)")
  test("testCastRegisteredType: cast-like TEXT inside a string literal is never rewritten") {
    spark.sql("CREATE TYPE vp18_money AS decimal(19,4)")
    try {
      // the literal survives verbatim; a real cast in the same statement
      // still resolves through the registry
      val r = spark.sql(
        "SELECT 'CAST(1 AS vp18_money)' AS doc, CAST(2 AS vp18_money) AS v").head
      assert(r.getString(0) == "CAST(1 AS vp18_money)")
      assert(r.getDecimal(1).toPlainString == "2.0000")
      // a literal INSIDE the cast argument does not block resolution
      val f = spark.sql("SELECT CAST('3' AS vp18_money) AS c").schema.head
      assert(f.dataType.simpleString == "decimal(19,4)")
    } finally spark.sql("DROP TYPE IF EXISTS vp18_money")
  }

  // ---- datetime casts (testDateTimeCast:1366) -------------------------------
  rejected("testDateTimeCast", "SELECT CAST(1 as DATE)")
  okSql("testDateTimeCast", "SELECT CAST(DATE '2001-12-21' AS VARCHAR(10))")
  okSql("testDateTimeCast", "SELECT CAST('2001-12-21' AS DATE)")
  okSql("testDateTimeCast", "SELECT CAST('2004-12-21 10:12:21' AS TIMESTAMP)")

  // ---- numeric operator typing (testNumericOperators:3684) ------------------
  typed("testNumericOperators", "- cast(1 as TINYINT)", "tinyint NOT NULL")
  typed("testNumericOperators", "-1.643", "decimal(4,3) NOT NULL")
  typed("testNumericOperators", "cast(1 as TINYINT) + cast(5 as INTEGER)",
    "int NOT NULL")
  typed("testNumericOperators", "cast(null as SMALLINT) + cast(5 as BIGINT)",
    "bigint")
  // decimal arithmetic: same precision/scale rules for +, one-higher
  // precision for * (Spark p1+p2+1 vs Calcite p1+p2), overflow-nullable
  // results throughout (the cast rule above)
  typed("testNumericOperators",
    "cast(1 as DECIMAL(5, 2)) + cast(1 as DECIMAL(6, 2))", "decimal(7,2)")
  typed("testNumericOperators",
    "cast(1 as DECIMAL(4, 2)) + cast(1 as DECIMAL(6, 4))", "decimal(7,4)")
  typed("testNumericOperators (divergence: * gains one precision digit)",
    "cast(1 as DECIMAL(5, 2)) * cast(1 as DECIMAL(5, 2))", "decimal(11,4)")
  typed("testNumericOperators",
    "cast(1 as DECIMAL(5, 2)) / cast(1 as DECIMAL(5, 2))", "decimal(13,8)")
  // pinned divergence: Spark's / is TRUE division (4/3 → double); the
  // reference's integer division is spelled `div` and widens to BIGINT
  typed("testNumericOperators (divergence: / is true division)", "4/3", "double")
  typed("testNumericOperators (integer division spelled div)", "4 div 3", "bigint")
  typed("testNumericOperators (divergence: float / promotes to double)",
    "cast(2.3 as float)/3", "double")
  typed("testNumericOperators", "cast(2.3 as float)/null", "double")

  // ---- FLOOR/CEIL typing (testFloorCeil:3864) --------------------------------
  typed("testFloorCeil", "floor(cast(null as tinyint))", "bigint")
  typed("testFloorCeil", "floor(1.2)", "decimal(2,0)")
  typed("testFloorCeil", "ceil(1.2)", "decimal(2,0)")
  // pinned divergence: Calcite floor(DOUBLE)→DOUBLE; Spark floor of a
  // double returns BIGINT
  typed("testFloorCeil (divergence: double floors to bigint)",
    "floor(1.2e-2)", "bigint")
  // pinned divergence: Calcite floor(INTEGER)→INTEGER; Spark widens to BIGINT
  typed("testFloorCeil (divergence: int widens)", "floor(1)", "bigint")

  // ---- interval comparisons (testIntervalCompare:7145) ------------------------
  typed("testIntervalCompare", "interval '1' hour < interval '1' second",
    "boolean NOT NULL")
  typed("testIntervalCompare", "interval '1' month = interval '1' year",
    "boolean NOT NULL")
  rejected("testIntervalCompare",
    "select interval '1' second >= interval '1' year")
  rejected("testIntervalCompare",
    "select interval '1' month = interval '1' day")

  // ---- date/string comparison coercion (testDateCompare:7178) -----------------
  typed("testDateCompare", "date '2015-03-17' < '2015-03-18'", "boolean")
  typed("testDateCompare", "'2015-03-17' < date '2015-03-18'", "boolean")
  typed("testDateCompare",
    "date '2015-03-17' between '2015-03-16' and '2015-03-19'", "boolean")
  typed("testDateCompare", "123 > '72'", "boolean")
  typed("testDateCompare", "true = 'true'", "boolean")
  // pinned divergence: Calcite rejects <BOOLEAN> AND <CHAR(4)>; Spark
  // coerces the string to boolean
  typed("testDateCompare (AND coercion divergence)", "true and 'true'", "boolean")

  // ---- interval casts (testCastToInterval:7389) --------------------------------
  typed("testCastToInterval", "cast(interval '1' hour as bigint)",
    "bigint NOT NULL")
  typed("testCastToInterval", "cast(interval '1' month as interval year)",
    "interval year NOT NULL")
  typed("testCastToInterval",
    "cast(interval '1-1' year to month as interval month)",
    "interval month NOT NULL")
  rejected("testCastToInterval",
    "select cast(interval '1:1' hour to minute as interval month)")
  rejected("testCastToInterval",
    "select cast(interval '1-1' year to month as interval second)")

  // ---- timestamp + null interval typing (testDatetimePlusNullInterval:3481,
  //      testTimestampAddNullInterval:3675; TIME type has no Spark analog —
  //      the TIMESTAMP rows carry the family) -----------------------------------
  typed("testDatetimePlusNullInterval",
    "TIMESTAMP '1990-12-12 12:12:12' + cast(NULL AS interval hour)", "timestamp")
  typed("testDatetimePlusNullInterval",
    "cast(NULL AS interval hour) + TIMESTAMP '1990-12-12 12:12:12'", "timestamp")
  typed("testTimestampAddNullInterval",
    "timestampadd(SECOND, cast(NULL AS INTEGER), current_timestamp)", "timestamp")

  // ---- TIMESTAMPADD/DIFF (testTimestampAddAndDiff:3627) -------------------------
  for (unit <- Seq("MICROSECOND", "MINUTE", "HOUR", "DAY", "WEEK", "MONTH",
    "QUARTER", "YEAR")) {
    okSql("testTimestampAddAndDiff",
      s"select timestampadd($unit, 12, current_timestamp)")
    okSql("testTimestampAddAndDiff",
      s"select timestampdiff($unit, current_timestamp, current_timestamp)")
  }
  typed("testTimestampAddAndDiff",
    "timestampadd(WEEK, 2, cast(null as timestamp))", "timestamp")
  rejected("testTimestampAddAndDiff",
    "select timestampadd(incorrect, 1, current_timestamp)")
  // pinned divergence: the JDBC SQL_TSI_* unit aliases are not in Spark's
  // unit vocabulary (the standard names above are)
  rejected("testTimestampAddAndDiff (SQL_TSI_ divergence)",
    "select timestampadd(SQL_TSI_WEEK, 2, current_timestamp)")

  // ---- collection constructors & casts (testArrayConstructor:7514,
  //      testCastAsCollectionType:7526, testCastAsRowType:7573,
  //      testMultisetConstructor:7604 — multisets carried as arrays) ------------
  typed("testArrayConstructor", "array(1,2)", "array<int> NOT NULL")
  typed("testArrayConstructor", "array(1,cast(null as integer),2)",
    "array<int> NOT NULL")
  typed("testArrayConstructor", "array('1',null,'234','')", "array<string> NOT NULL")
  typed("testCastAsCollectionType", "cast(array(1,null,2) as array<int>)",
    "array<int> NOT NULL")
  typed("testCastAsCollectionType", "cast(array('1',null,'2') as array<string>)",
    "array<string> NOT NULL")
  typed("testCastAsRowType",
    "cast(named_struct('x',1,'y','a') as struct<f0:int,f1:string>)",
    "struct<f0:int,f1:string> NOT NULL")
  typed("testMultisetConstructor", "array(1,null,2)", "array<int> NOT NULL")

  // ---- IS A SET (testIsASet:1705; Multisets.isASet over the array carrier) ----
  test("testIsASet: multiset[1] is a set; duplicates are not") {
    import spark.implicits._
    val row = Seq((Seq(1), Seq(1, 1))).toDF("a", "b").select(
      graft.functions.Multisets.isASet(col("a")).as("x"),
      graft.functions.Multisets.isASet(col("b")).as("y")).head
    assert(row.getBoolean(0) && !row.getBoolean(1))
  }

  // ---- VALUES row types (testRowtype:1575, testRowWithValidDot:1599) -----------
  okSql("testRowtype", "values (1),(2),(1)")
  typed("testRowtype", "* from (values (1,'1'),(2,'2'))",
    "int NOT NULL")  // first column of the two-column rowtype
  rejected("testRowtype", "values ('1'),(2)") // incompatible inline-table types
  typed("testRowWithValidDot", "struct(1,2).col2", "int NOT NULL")
  typed("testRowWithValidDot", "named_struct('a',1,'b',2).b", "int NOT NULL")
}
