package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scalar-function VALUE parity, tranche 8 (r13 VERDICT #6) — the
  * runtime function families from
  * core/src/test/java/org/apache/calcite/test/SqlFunctionsTest.java
  * (string functions, POSIX regex, REGEXP_REPLACE with position,
  * ADD_MONTHS end-of-month clamping, FLOOR/CEIL-to-multiple,
  * ROUND/SROUND at positive and negative scales, base64, MD5/SHA1,
  * LESSER/GREATER) and the window-function value edges
  * (SqlOperatorBaseTest.java testFirstValueFunc:8546 /
  * testLastValueFunc:8520, plus LEAD/LAG defaults at partition edges,
  * NTILE remainder distribution, and the rank family on ties — the
  * semantics SqlLeadLagAggFunction / SqlNtileAggFunction /
  * SqlRankFunction define and winagg.iq pins as goldens).
  *
  * Values transcribed verbatim; cited per case. Dialect adaptations:
  * Calcite's floor(x, y)/ceil(x, y) "to a multiple of y" maps to
  * Spark's floor(x, scale)/ceil(x, scale) at the power-of-ten scales
  * the reference exercises; sround(x, n) is ROUND(x, n). Divergences
  * pinned at the bottom with the reference value inline.
  */
class FunctionParitySpec3 extends AnyFunSuite {
  import SparkTestSession._

  private def value(expr: String): Any =
    spark.sql(s"select $expr as v").head().get(0)

  private def render(got0: Any): String = got0 match {
    case b: Array[Byte] => b.map("%02x".format(_)).mkString
    case t: java.sql.Timestamp => t.toString.stripSuffix(".0")
    case s: collection.Seq[_] => s.map(x => if (x == null) "null" else x.toString)
      .mkString("[", ", ", "]")
    case o => o.toString
  }

  private def check(citation: String, expr: String, want: String): Unit =
    test(s"$citation: $expr") {
      val got0 = value(expr)
      assert(got0 != null, s"$expr: expected '$want', got NULL")
      val got = render(got0)
      val same = (try got.toDouble == want.toDouble catch { case _: Throwable => false }) ||
        got == want
      assert(same, s"$expr: expected '$want', got '$got'")
    }

  private def checkNull(citation: String, expr: String): Unit =
    test(s"$citation: $expr IS NULL") {
      assert(value(expr) == null, s"$expr: expected NULL")
    }

  private def checkD(citation: String, expr: String, want: Double, tol: Double = 1e-3): Unit =
    test(s"$citation: $expr") {
      val got = value(expr) match {
        case d: java.lang.Double => d.doubleValue
        case b: java.math.BigDecimal => b.doubleValue
        case o => o.toString.toDouble
      }
      assert(math.abs(got - want) <= tol, s"$expr: expected $want +- $tol, got $got")
    }

  /** Full ordered result of a windowed expression over an inline
    * relation — the reference's checkWinAgg re-expressed as the whole
    * per-row value list (strictly stronger than its distinct-set check). */
  private def winCheck(citation: String, label: String, sql: String,
      want: Seq[String]): Unit =
    test(s"$citation: $label") {
      val got = spark.sql(sql).collect()
        .map(r => if (r.isNullAt(0)) "null" else r.get(0).toString).toSeq
      assert(got == want, s"$label: expected $want, got $got")
    }

  // ======================================================================
  // SqlFunctionsTest string families
  // ======================================================================

  check("testCharLength:72", "char_length('xyz')", "3")
  check("testLower:143", "lower('A bCd Iijk')", "a bcd iijk")
  check("testUpper:183", "upper('A bCd iIjk')", "A BCD IIJK")

  // initcap: word starts after non-letter boundaries per the reference
  check("testInitcap:187", "initcap('aA')", "Aa")
  check("testInitcap:187", "initcap('zz')", "Zz")
  check("testInitcap:187", "initcap('AZ')", "Az")
  check("testInitcap:187", "initcap('1A')", "1a")

  // rtrim / ltrim / trim (testRtrim:224, testLtrim:235, testTrim:246)
  check("testRtrim:224", "concat('[', rtrim('   x  '), ']')", "[   x]")
  check("testRtrim:224", "concat('[', rtrim('   x '), ']')", "[   x]")
  check("testRtrim:224", "concat('[', rtrim('   x y '), ']')", "[   x y]")
  check("testRtrim:224", "concat('[', rtrim('x'), ']')", "[x]")
  check("testRtrim:224", "concat('[', rtrim('    '), ']')", "[]")
  check("testLtrim:235", "concat('[', ltrim('   x  '), ']')", "[x  ]")
  check("testLtrim:235", "concat('[', ltrim('   x '), ']')", "[x ]")
  check("testLtrim:235", "concat('[', ltrim('   x y '), ']')", "[x y ]")
  check("testLtrim:235", "concat('[', ltrim(''), ']')", "[]")
  check("testTrim:246", "concat('[', trim('   x  '), ']')", "[x]")
  check("testTrim:246", "concat('[', trim('   x y '), ']')", "[x y]")
  check("testTrim:246", "concat('[', trim(''), ']')", "[]")

  // POSIX regex (testPosixRegex:86 — the alternation/anchor subset; the
  // [[:class:]] POSIX-bracket cases are pinned as a divergence below)
  check("testPosixRegex:86", "'abc' rlike 'abc'", "true")
  check("testPosixRegex:86", "'abc' rlike '^a'", "true")
  check("testPosixRegex:86", "'abc' rlike '(b|d)'", "true")
  check("testPosixRegex:86", "'abc' rlike '^(b|c)'", "false")
  check("testPosixRegex:86", "'abc' rlike '(?i)ABC'", "true")
  check("testPosixRegex:86", "'abc' rlike '(?i)^A'", "true")
  check("testPosixRegex:86", "'abc' rlike '(?i)(B|D)'", "true")
  check("testPosixRegex:86", "'abc' rlike '(?i)^(B|C)'", "false")

  // REGEXP_REPLACE, global and from-position (testRegexpReplace:106)
  check("testRegexpReplace:106", "regexp_replace('a b c', 'b', 'X')", "a X c")
  check("testRegexpReplace:106", "regexp_replace('abc def ghi', '[g-z]+', 'X')", "abc def X")
  check("testRegexpReplace:106", "regexp_replace('abc def ghi', '[a-z]+', 'X')", "X X X")
  check("testRegexpReplace:106", "regexp_replace('a b c', 'a|b', 'X')", "X X c")
  check("testRegexpReplace:106", "regexp_replace('a b c', 'y', 'X')", "a b c")
  check("testRegexpReplace:106", "regexp_replace('100-200', '(\\\\d+)', 'num')", "num-num")
  check("testRegexpReplace:106", "regexp_replace('100-200', '(-)', '###')", "100###200")
  check("testRegexpReplace:106", "regexp_replace('abc def ghi', '[a-z]+', 'X', 1)", "X X X")
  check("testRegexpReplace:106", "regexp_replace('abc def ghi', '[a-z]+', 'X', 2)", "aX X X")

  // base64 (testToBase64:160 / testFromBase64:147)
  check("testToBase64:160",
    "base64('This is a test String.')", "VGhpcyBpcyBhIHRlc3QgU3RyaW5nLg==")
  check("testToBase64:160", "concat('[', base64(''), ']')", "[]")
  check("testFromBase64:147",
    "cast(unbase64('VGhpcyBpcyBhIHRlc3QgU3RyaW5nLg==') as string)",
    "This is a test String.")

  // LESSER / GREATER — the null-SKIPPING pair (Calcite's
  // SqlFunctions.lesser/greater used by Oracle LEAST/GREATEST; Spark's
  // least/greatest have exactly these semantics)
  check("testLesser:197", "least('a', 'bc')", "a")
  check("testLesser:197", "least('bc', 'ac')", "ac")
  check("testLesser:197", "least(cast(null as string), 'a')", "a")
  checkNull("testLesser:197", "least(cast(null as string), cast(null as string))")
  check("testGreater:210", "greatest('a', 'bc')", "bc")
  check("testGreater:210", "greatest('bc', 'ac')", "bc")
  check("testGreater:210", "greatest(cast(null as string), 'a')", "a")
  checkNull("testGreater:210", "greatest(cast(null as string), cast(null as string))")

  // MD5 / SHA1 (testMd5:919 / testSha1:933)
  check("testMd5:919", "md5('')", "d41d8cd98f00b204e9800998ecf8427e")
  check("testMd5:919", "md5('ABC')", "902fbdd2b1df0c4f70b4a5d23525e932")
  check("testSha1:933", "sha1('')", "da39a3ee5e6b4b0d3255bfef95601890afd80709")
  check("testSha1:933", "sha1('ABC')", "3c01bdbb26f358bab27f267924aa2c9a03fcfdb8")

  // ======================================================================
  // ADD_MONTHS with end-of-month clamping (testAddMonths:260)
  // ======================================================================

  check("testAddMonths:260", "add_months(date '2016-01-01', 1)", "2016-02-01")
  check("testAddMonths:260", "add_months(date '2016-01-01', 12)", "2017-01-01")
  check("testAddMonths:260", "add_months(date '2016-01-01', 13)", "2017-02-01")
  check("testAddMonths:260", "add_months(date '2016-01-01', -12)", "2015-01-01")
  check("testAddMonths:260", "add_months(date '2016-01-01', 33)", "2018-10-01")
  check("testAddMonths:260", "add_months(date '2016-01-31', 3)", "2016-04-30")
  check("testAddMonths:260", "add_months(date '2016-04-30', 3)", "2016-07-30")
  check("testAddMonths:260", "add_months(date '2016-01-31', 1)", "2016-02-29")
  check("testAddMonths:260", "add_months(date '2016-03-31', -1)", "2016-02-29")
  check("testAddMonths:260", "add_months(date '2016-03-31', 1200)", "2116-03-31")
  check("testAddMonths:260", "add_months(date '2016-02-28', 1200)", "2116-02-28")

  // ======================================================================
  // FLOOR / CEIL to a multiple (testFloor:299 / testCeil:317, y = 10 →
  // Spark scale -1) and ROUND at scales (testTruncateInt:365 round
  // block, testSRound*:437-507)
  // ======================================================================

  check("testFloor:299", "floor(0, -1)", "0")
  check("testFloor:299", "floor(27, -1)", "20")
  check("testFloor:299", "floor(30, -1)", "30")
  check("testFloor:299", "floor(-30, -1)", "-30")
  check("testFloor:299", "floor(-27, -1)", "-30")
  check("testCeil:317", "ceil(0, -1)", "0")
  check("testCeil:317", "ceil(27, -1)", "30")
  check("testCeil:317", "ceil(30, -1)", "30")
  check("testCeil:317", "ceil(-30, -1)", "-30")
  check("testCeil:317", "ceil(-27, -1)", "-20")
  check("testCeil:317", "ceil(-27, 0)", "-27")

  check("testTruncateInt:365 (round block)", "round(12345, -3)", "12000")
  check("testTruncateInt:365 (round block)", "round(12845, -3)", "13000")
  check("testTruncateInt:365 (round block)", "round(-12345, -3)", "-12000")
  check("testTruncateInt:365 (round block)", "round(-12845, -3)", "-13000")

  checkD("testSRoundDouble:437", "round(cast(12.345 as double), 3)", 12.345)
  checkD("testSRoundDouble:437", "round(cast(12.345 as double), 2)", 12.350)
  checkD("testSRoundDouble:437", "round(cast(12.345 as double), 1)", 12.300)
  checkD("testSRoundDouble:437", "round(cast(12.999 as double), 2)", 13.000)
  checkD("testSRoundDouble:437", "round(cast(12.999 as double), 1)", 13.000)
  checkD("testSRoundDouble:437", "round(cast(12.999 as double), 0)", 13.000)
  checkD("testSRoundDouble:437", "round(cast(-12.345 as double), 2)", -12.350)
  checkD("testSRoundDouble:437", "round(cast(-12.999 as double), 1)", -13.000)
  checkD("testSRoundDouble:437", "round(cast(12345 as double), -1)", 12350)
  checkD("testSRoundDouble:437", "round(cast(12345 as double), -2)", 12300)
  checkD("testSRoundDouble:437", "round(cast(12345 as double), -3)", 12000)
  checkD("testSRoundDouble:437", "round(cast(12001 as double), -3)", 12000)
  checkD("testSRoundDouble:437", "round(cast(12000 as double), -4)", 10000)
  checkD("testSRoundDouble:437", "round(cast(12000 as double), -5)", 0)
  checkD("testSRoundDouble:437", "round(cast(11999 as double), -3)", 12000)
  checkD("testSRoundDouble:437", "round(cast(-12345 as double), -1)", -12350)
  checkD("testSRoundDouble:437", "round(cast(-12345 as double), -3)", -12000)
  checkD("testSRoundDouble:437", "round(cast(-11999 as double), -3)", -12000)
  check("testSRoundLong:470", "round(12345L, -1)", "12350")
  check("testSRoundLong:470", "round(12345L, -2)", "12300")
  check("testSRoundLong:470", "round(12001L, -3)", "12000")
  check("testSRoundLong:470", "round(12000L, -4)", "10000")
  check("testSRoundLong:470", "round(12000L, -5)", "0")
  check("testSRoundLong:470", "round(11999L, -3)", "12000")
  check("testSRoundLong:470", "round(-12345L, -1)", "-12350")
  check("testSRoundLong:470", "round(-11999L, -3)", "-12000")

  // ======================================================================
  // Window value edges
  // ======================================================================

  private val fourVals =
    "values (1, 0), (2, cast(null as int)), (3, 3), (4, 3) as t(i, x)"

  winCheck("testFirstValueFunc:8546", "first_value over ROWS 3 PRECEDING",
    s"""select v from (select i,
       |  first_value(x) over (order by i rows between 3 preceding and current row) as v
       |  from $fourVals) order by i""".stripMargin,
    Seq("0", "0", "0", "0"))
  winCheck("testLastValueFunc:8520", "last_value over ROWS 3 PRECEDING",
    s"""select v from (select i,
       |  last_value(x) over (order by i rows between 3 preceding and current row) as v
       |  from $fourVals) order by i""".stripMargin,
    Seq("0", "null", "3", "3"))
  winCheck("testLastValueFunc:8520", "last_value IGNORE NULLS over ROWS 3 PRECEDING",
    s"""select v from (select i,
       |  last_value(x) ignore nulls over (order by i rows between 3 preceding and current row) as v
       |  from $fourVals) order by i""".stripMargin,
    Seq("0", "0", "3", "3"))
  winCheck("testFirstValueFunc:8546", "first_value over a SLIDING frame (1 preceding)",
    s"""select v from (select i,
       |  first_value(x) over (order by i rows between 1 preceding and current row) as v
       |  from $fourVals) order by i""".stripMargin,
    Seq("0", "0", "null", "3"))
  winCheck("SqlNthValueAggFunction semantics", "nth_value(x, 2) over ROWS 3 PRECEDING",
    """select v from (select i,
      |  nth_value(x, 2) over (order by i rows between 3 preceding and current row) as v
      |  from values (1, 10), (2, 20), (3, 30) as t(i, x)) order by i""".stripMargin,
    Seq("null", "20", "20"))

  // LEAD/LAG defaults at partition edges
  private val partVals =
    "values (1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 40), (2, 2, 50) as t(p, i, x)"

  winCheck("SqlLeadLagAggFunction semantics", "lag(x) null at each partition's first row",
    s"""select v from (select p, i,
       |  lag(x) over (partition by p order by i) as v
       |  from $partVals) order by p, i""".stripMargin,
    Seq("null", "10", "20", "null", "40"))
  winCheck("SqlLeadLagAggFunction semantics", "lag(x, 1, -1) explicit default at the edge",
    s"""select v from (select p, i,
       |  lag(x, 1, -1) over (partition by p order by i) as v
       |  from $partVals) order by p, i""".stripMargin,
    Seq("-1", "10", "20", "-1", "40"))
  winCheck("SqlLeadLagAggFunction semantics", "lead(x) null at each partition's last row",
    s"""select v from (select p, i,
       |  lead(x) over (partition by p order by i) as v
       |  from $partVals) order by p, i""".stripMargin,
    Seq("20", "30", "null", "50", "null"))
  winCheck("SqlLeadLagAggFunction semantics", "lead(x, 2, 99) default beyond the partition",
    s"""select v from (select p, i,
       |  lead(x, 2, 99) over (partition by p order by i) as v
       |  from $partVals) order by p, i""".stripMargin,
    Seq("30", "99", "99", "99", "99"))
  winCheck("SqlLeadLagAggFunction semantics", "lag(x, 0) is the row itself",
    s"""select v from (select p, i,
       |  lag(x, 0) over (partition by p order by i) as v
       |  from $partVals) order by p, i""".stripMargin,
    Seq("10", "20", "30", "40", "50"))

  // NTILE remainder distribution: earlier buckets take the extra rows
  private val fiveRows = "values (1), (2), (3), (4), (5) as t(i)"
  winCheck("SqlNtileAggFunction semantics", "ntile(3) over 5 rows",
    s"select v from (select i, ntile(3) over (order by i) as v from $fiveRows) order by i",
    Seq("1", "1", "2", "2", "3"))
  winCheck("SqlNtileAggFunction semantics", "ntile(2) over 5 rows",
    s"select v from (select i, ntile(2) over (order by i) as v from $fiveRows) order by i",
    Seq("1", "1", "1", "2", "2"))
  winCheck("SqlNtileAggFunction semantics", "ntile(7) over 3 rows (more tiles than rows)",
    """select v from (select i, ntile(7) over (order by i) as v
      |  from values (1), (2), (3) as t(i)) order by i""".stripMargin,
    Seq("1", "2", "3"))

  // rank family on ties (10, 20, 20, 30)
  private val tieVals = "values (1, 10), (2, 20), (3, 20), (4, 30) as t(i, x)"
  winCheck("SqlRankFunction semantics", "rank with a tie leaves a gap",
    s"select v from (select i, rank() over (order by x) as v from $tieVals) order by i",
    Seq("1", "2", "2", "4"))
  winCheck("SqlRankFunction semantics", "dense_rank with a tie leaves no gap",
    s"select v from (select i, dense_rank() over (order by x) as v from $tieVals) order by i",
    Seq("1", "2", "2", "3"))
  winCheck("SqlRankFunction semantics", "percent_rank on ties",
    s"select v from (select i, percent_rank() over (order by x) as v from $tieVals) order by i",
    Seq("0.0", "0.3333333333333333", "0.3333333333333333", "1.0"))
  winCheck("SqlRankFunction semantics", "cume_dist on ties",
    s"select v from (select i, cume_dist() over (order by x) as v from $tieVals) order by i",
    Seq("0.25", "0.75", "0.75", "1.0"))
  winCheck("SqlRankFunction semantics", "percent_rank over a single row is 0",
    "select percent_rank() over (order by i) from values (1) as t(i)",
    Seq("0.0"))

  // ======================================================================
  // Pinned divergences (reference value in the comment)
  // ======================================================================

  test("divergence pin: initcap word boundaries (testInitcap:187)") {
    // Calcite starts a new word after ANY non-alphanumeric ("won't
    // it?no" -> "Won'T It?No"); Spark splits on whitespace only.
    assert(value("initcap(\"won't it?no\")") == "Won't It?no")
  }
  test("divergence pin: POSIX bracket classes (testPosixRegex:86)") {
    // Calcite translates [[:xdigit:]] to the POSIX class; Spark's rlike
    // is Java regex, where the equivalent spelling is \p{XDigit}.
    assert(value("'abc' rlike '^\\\\p{XDigit}+$'") == true)
    assert(value("'abcq' rlike '^\\\\p{XDigit}+$'") == false)
  }
  test("divergence pin: CONCAT null handling (testConcat:76)") {
    // Calcite's runtime concat renders NULL as the string 'null'
    // ("anull"); Spark's concat is null-propagating.
    assert(value("concat('a', cast(null as string))") == null)
  }
}
