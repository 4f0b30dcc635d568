package graft

import graft.iq.{Iq, IqFixtures, IqSuite}

/** Exhaustive port of the reference's misc.iq golden script (r10 VERDICT
  * #6): CALCITE-numbered regression queries over the POST/scott/hr/
  * catchall fixtures. Extra fixtures beyond IqFixtures:
  *  - hr (JdbcTest.HrSchema:7152-7163 — 4 emps, 3 depts), visible from
  *    the post dataset as `"hr"."emps"`/`"hr"."depts"`;
  *  - catchall (ReflectiveSchemaTest.CatchallSchema:946 — the 2-row
  *    everyTypes table of every JDBC type, epoch + max/null rows).
  * Foodmart-dataset blocks whose goldens pin the external hydromatic
  * foodmart data are skipped with that reason (our foodmart coverage
  * ports the SHAPES onto the TPC-H star — operators/FoodMart.scala).
  */
class MiscIqSpec extends IqSuite {
  val iqFile = "misc.iq"
  val expectedTotal = 141

  private def view(name: String, sql: String): Unit =
    spark.sql(sql).createOrReplaceTempView(name)

  private def registerHr(): Unit = {
    view("hr_emps",
      """SELECT * FROM VALUES
        |  (100, 10, 'Bill', CAST(10000 AS FLOAT), CAST(1000 AS INT)),
        |  (200, 20, 'Eric', CAST(8000 AS FLOAT), 500),
        |  (150, 10, 'Sebastian', CAST(7000 AS FLOAT), CAST(NULL AS INT)),
        |  (110, 10, 'Theodore', CAST(11500 AS FLOAT), 250)
        |AS t(empid, deptno, name, salary, commission)""".stripMargin)
    view("hr_depts",
      """SELECT * FROM VALUES (10, 'Sales'), (30, 'Marketing'), (40, 'HR')
        |AS t(deptno, name)""".stripMargin)
  }

  private def registerCatchall(): Unit =
    // ReflectiveSchemaTest.CatchallSchema.everyTypes: row 1 = all-epoch/
    // zero values, row 2 = primitive maxes with every wrapper null
    view("everyTypes",
      """SELECT * FROM VALUES
        |  (false, CAST(0 AS TINYINT), '\u0000', CAST(0 AS SMALLINT), 0,
        |   CAST(0 AS BIGINT), CAST(0 AS FLOAT), CAST(0 AS DOUBLE),
        |   false, CAST(0 AS TINYINT), '\u0000', CAST(0 AS SMALLINT), 0,
        |   CAST(0 AS BIGINT), CAST(0 AS FLOAT), CAST(0 AS DOUBLE),
        |   DATE '1970-01-01', '00:00:00', TIMESTAMP '1970-01-01 00:00:00',
        |   TIMESTAMP '1970-01-01 00:00:00', '1'),
        |  (true, CAST(127 AS TINYINT), '\uffff', CAST(32767 AS SMALLINT),
        |   2147483647, CAST(9223372036854775807 AS BIGINT),
        |   CAST(3.4028235E38 AS FLOAT), CAST(1.7976931348623157E308 AS DOUBLE),
        |   CAST(NULL AS BOOLEAN), CAST(NULL AS TINYINT), CAST(NULL AS STRING),
        |   CAST(NULL AS SMALLINT), CAST(NULL AS INT), CAST(NULL AS BIGINT),
        |   CAST(NULL AS FLOAT), CAST(NULL AS DOUBLE),
        |   CAST(NULL AS DATE), CAST(NULL AS STRING),
        |   CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
        |   CAST(NULL AS STRING))
        |AS t(primitiveBoolean, primitiveByte, primitiveChar, primitiveShort,
        |     primitiveInt, primitiveLong, primitiveFloat, primitiveDouble,
        |     wrapperBoolean, wrapperByte, wrapperCharacter, wrapperShort,
        |     wrapperInteger, wrapperLong, wrapperFloat, wrapperDouble,
        |     sqlDate, sqlTime, sqlTimestamp, utilDate, string)""".stripMargin)

  override protected def register(dataset: String): Unit = dataset match {
    case "post" => super.register("post"); registerHr()
    case "catchall" => registerCatchall()
    case "foodmart" =>
      // only `days` is small enough to carry inline (the canonical 7-row
      // week table); blocks over the full foodmart data are skipped
      view("days",
        """SELECT * FROM VALUES (1, 'Sunday'), (2, 'Monday'), (3, 'Tuesday'),
          |  (4, 'Wednesday'), (5, 'Thursday'), (6, 'Friday'), (7, 'Saturday')
          |AS t(day, week_day)""".stripMargin)
    case other => super.register(other)
  }

  /** The hr schema arrives qualified; Spark temp views are unqualified. */
  override protected def dialect(sql: String): String =
    super.dialect(sql
      .replaceAll("\"hr\"\\.\"emps\"|\"hr\"\\.emps|hr\\.\"emps\"|\\bhr\\.emps", "hr_emps")
      .replaceAll("\"hr\"\\.\"depts\"|\"hr\"\\.depts|hr\\.\"depts\"|\\bhr\\.depts", "hr_depts")
      // unaliased FROM items are referenced by their original quoted
      // table name — point those qualifiers at the renamed views
      .replace("\"emps\".", "hr_emps.")
      .replace("\"depts\".", "hr_depts."))

  val rewrites: Map[Int, String => String] = Map(
    // the fixture models sqlTime as a string (Spark has no TIME type in
    // this engine's model — TimeTypeSpec documents the emulation)
    603 -> (s => s.replace("TIME '01:23:45'", "'01:23:45'")),
    // niladic PI: Spark requires the call parens
    1967 -> (_ => "select pi() as pi"),
    1978 -> (_ => "select degrees(pi()), degrees(-pi() / 2)"),
    // display-precision: the reference prints TIMESTAMP at its default
    // second precision; truncate explicitly so the rendered strings match
    2050 -> (_ => """select
      date_trunc('second', TIMESTAMP '2016-02-26 19:06:00.123456'),
      date_trunc('second', CAST('2016-02-26 19:06:00.12345678' as TIMESTAMP)),
      TIMESTAMPDIFF(SECOND,
        TIMESTAMP '2016-02-26 19:06:00.123456',
        CAST('2016-02-26 19:06:00.123456789' as TIMESTAMP))"""),
    // OVERLAPS (CALCITE-1167 order-insensitive form): Spark has no
    // OVERLAPS predicate — spelled as the normalized interval test
    // lo1 <= hi2 AND lo2 <= hi1
    2192 -> (_ => overlapsSql("date '1999-12-01'", "date '2001-12-31'",
      "date '2001-01-01'", "date '2002-11-11'")),
    2197 -> (_ => overlapsSql("date '2001-12-31'", "date '1999-12-01'",
      "date '2001-01-01'", "date '2002-11-11'")),
    2202 -> (_ => overlapsSql("date '2001-12-31'", "date '1999-12-01'",
      "date '2002-11-11'", "date '2001-01-01'")),
    2207 -> (_ => overlapsSql("date '2001-12-31'", "date '1999-12-01'",
      "date '2002-01-01'", "date '2002-11-11'")),
    // SQL:2016 json_exists with ON ERROR clause → the equivalent
    // path-probe (strict $.foo over a valid object cannot error)
    2220 -> (_ =>
      "select get_json_object('{\"foo\":\"bar\"}', '$.foo') is not null")
  )

  private def overlapsSql(a1: String, a2: String, b1: String, b2: String) =
    s"""select least($a1, $a2) <= greatest($b1, $b2)
        |   and least($b1, $b2) <= greatest($a1, $a2)""".stripMargin

  val skips: Map[Int, String] = Map(
    634 -> ("PERIOD constructor golden prints Calcite's internal " +
      "month-offset pair ({0, 12} / {null, 12}); our period surface " +
      "models (start, end) values — plans/Periods.scala registry coverage"),
    652 -> "golden pins a count over the external hydromatic foodmart customer table",
    1263 -> ("Spark resolves quoted identifiers case-insensitively by " +
      "default, so aliases `a` and `A` are ambiguous — resolver-contract delta"),
    1273 -> ("Spark resolves quoted identifiers case-insensitively by " +
      "default, so aliases `a` and `A` are ambiguous — resolver-contract delta"),
    1388 -> ("Calcite's signed interval-literal rendering (+20 / -45:00 " +
      "/ +12-06) and the INTERVAL -'3' HOUR minus-prefix spelling have no " +
      "Spark equivalent; interval arithmetic is covered by fn_datetime " +
      "registry queries"),
    1693 -> ("reference accepts '123.45' as DECIMAL(4,2) — 5 digits in a " +
      "precision-4 type, its validator is lax here; the ANSI overflow " +
      "check rejects it"),
    1707 -> ("reference accepts '123.45' as DECIMAL(4,2) — 5 digits in a " +
      "precision-4 type, its validator is lax here; the ANSI overflow " +
      "check rejects it"),
    1892 -> "golden pins Calcite's seeded RAND_INTEGER PRNG sequence — engine-specific",
    1908 -> "golden pins Calcite's seeded RAND_INTEGER PRNG sequence — engine-specific",
    1924 -> "golden pins Calcite's seeded RAND_INTEGER PRNG sequence — engine-specific",
    1940 -> "golden pins Calcite's seeded RAND_INTEGER PRNG sequence — engine-specific",
    1956 -> "golden pins Calcite's seeded RAND(-1) PRNG sequence — engine-specific",
    2031 -> ("TIMESTAMP(p) parameterized precision casts: Spark " +
      "timestamps are fixed micro-precision, TIMESTAMP(0..9) types are " +
      "unsupported; sub-second rounding covered at the default precision " +
      "by the 2050 block")
  )

  generateTests()
}
