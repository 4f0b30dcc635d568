package graft

import graft.plans.{RelToSql, RelToSqlDemo, RelToSqlPinned}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** rel2sql: plan → dialect SQL → re-execute → same result. Mirrors the
  * reference's RelToSqlConverter tests (rel/rel2sql/RelToSqlConverterTest
  * golden strings + re-parse round trips). */
class RelToSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  private def roundTrip(df: DataFrame): Unit = {
    Tables.registerAll(spark, sfDir)
    val sql = RelToSql.convert(df, RelToSql.Spark)
    val direct = df.collect().map(_.toString).sorted
    val rerun = spark.sql(sql).collect().map(_.toString).sorted
    assert(direct.nonEmpty, "round-trip fixture query returned no rows")
    assert(direct.toSeq == rerun.toSeq, s"round trip diverged for:\n$sql")
  }

  test("pinned renderings match the live converter (oracle sync guard)") {
    val plan = RelToSqlDemo.demoPlan(spark, sfDir)
    assert(RelToSql.convert(plan, RelToSql.Ansi) == RelToSqlPinned.ansi)
    assert(RelToSql.convert(plan, RelToSql.Spark) == RelToSqlPinned.spark)
    assert(RelToSql.convert(plan, RelToSql.Postgres) == RelToSqlPinned.postgres)
  }

  test("PostgreSQL dialect: quoting, type renames, TO_TIMESTAMP, int division") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_name").cast("string").as("s"),
        col("c_acctbal").cast("double").as("d"),
        (col("c_custkey") / 7).cast("long").as("q"))
    val sql = RelToSql.convert(c, RelToSql.Postgres)
    assert(sql.contains("\"c_name\""), sql)
    assert(sql.contains("AS TEXT"), sql)
    assert(sql.contains("DOUBLE PRECISION"), sql)
    // micros→timestamp renders as TO_TIMESTAMP(us / 1e6)
    val ts = Tables.t(spark, sfDir, "orders")
      .select((col("o_orderkey") * 1000000L).as("us"))
      .select(timestamp_micros(col("us")).as("t"))
    val tsSql = RelToSql.convert(ts, RelToSql.Postgres)
    assert(tsSql.contains("TO_TIMESTAMP("), tsSql)
    // integer division renders as plain '/' (integral on int operands in
    // PostgreSQL; documented text-only vs DuckDB, whose int '/' is float)
    val idiv = Tables.t(spark, sfDir, "orders")
      .selectExpr("o_orderkey div 10 AS b")
    val divSql = RelToSql.convert(idiv, RelToSql.Postgres)
    assert(divSql.contains(" / "), divSql)
    assert(!divSql.contains("DIV") && !divSql.contains("//"), divSql)
  }

  test("demo plan round-trips through its Spark rendering") {
    roundTrip(RelToSqlDemo.demoPlan(spark, sfDir))
  }

  test("scalar expressions round-trip: CASE, IN, LIKE, concat, substring") {
    val c = Tables.t(spark, sfDir, "customer")
    roundTrip(c.select(
      col("c_custkey"),
      upper(col("c_mktsegment")).as("seg"),
      when(col("c_acctbal") > 0.0, lit("pos")).otherwise(lit("neg")).as("sign"),
      concat(col("c_name"), lit("!")).as("bang"),
      substring(col("c_name"), 1, 8).as("pfx"),
      length(col("c_name")).as("len"))
      .where(col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD", "BUILDING") &&
        col("c_name").like("%1%")))
  }

  test("semi and anti joins render as EXISTS / NOT EXISTS and round-trip") {
    val c = Tables.t(spark, sfDir, "customer")
    val o = Tables.t(spark, sfDir, "orders")
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"))
    // restrict the right side so the anti join is non-empty at sf0.001
    val oSmall = o.where(col("o_custkey") < 50)
    val anti = c.join(oSmall, c("c_custkey") === oSmall("o_custkey"), "left_anti")
      .select(col("c_custkey"))
    val semiSql = RelToSql.convert(semi, RelToSql.Spark)
    assert(semiSql.contains("WHERE EXISTS"))
    assert(RelToSql.convert(anti, RelToSql.Spark).contains("WHERE NOT EXISTS"))
    roundTrip(semi)
    roundTrip(anti)
  }

  test("outer join, set ops, distinct, sort+limit round-trip") {
    val n = Tables.t(spark, sfDir, "nation")
    val r = Tables.t(spark, sfDir, "region")
    roundTrip(n.join(r, n("n_regionkey") === r("r_regionkey"), "left")
      .select(col("n_name"), col("r_name")))
    val a = n.select(col("n_nationkey").as("k"))
    val b = n.where(col("n_regionkey") === 0).select(col("n_nationkey").as("k"))
    roundTrip(a.union(b))
    roundTrip(a.intersect(b))
    roundTrip(a.except(b))
    roundTrip(a.union(b).distinct())
    roundTrip(n.orderBy(col("n_name").desc).limit(5))
    roundTrip(n.orderBy(col("n_name")).offset(3).limit(4))
  }

  test("self-join disambiguates the duplicated column names") {
    // Tables.t memoizes, so both sides are the same Dataset instance —
    // alias them as a user must (DetectAmbiguousSelfJoin rejects bare
    // same-Dataset column refs). Both outputs are still named n_name, so
    // the converter's global-scope suffixing is exercised unchanged.
    val n1 = Tables.t(spark, sfDir, "nation").as("sj_a")
    val n2 = Tables.t(spark, sfDir, "nation").as("sj_b")
    val df = n1.join(n2, col("sj_a.n_regionkey") === col("sj_b.n_regionkey") &&
        col("sj_a.n_nationkey") < col("sj_b.n_nationkey"))
      .select(col("sj_a.n_name"), col("sj_b.n_name"))
    val sql = RelToSql.convert(df, RelToSql.Spark)
    // the second n_name must have been suffixed inside the query body
    assert(sql.contains("n_name_2"))
    roundTrip(df)
  }

  test("window functions round-trip: rank, row_number, lag, framed sum") {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.t(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    roundTrip(o.select(
      col("o_custkey"), col("o_orderkey"),
      rank().over(w).as("rk"),
      row_number().over(w).as("rn"),
      lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"),
      sum(col("o_orderkey")).over(w.rowsBetween(Window.unboundedPreceding, 0))
        .as("cum_key")))
    // sliding frame with numeric bounds
    roundTrip(o.select(col("o_custkey"), col("o_orderkey"),
      sum(col("o_orderkey")).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
          .rowsBetween(-2, 1)).as("near_sum")))
  }

  test("Expand over a non-Project child renders (optimized rollup plan)") {
    // the optimizer collapses the analyzer's grouping-source Project when
    // the sources are plain columns — the Expand then sits directly on the
    // relation, the shape the generic inline-source recovery handles
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(
      "SELECT r_name, count(1) AS n FROM region GROUP BY ROLLUP(r_name)")
    val opt = df.queryExecution.optimizedPlan
    val expandChildren = opt.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e.child.nodeName
    }
    assert(expandChildren.nonEmpty)
    val sql = RelToSql.convertPlan(opt, RelToSql.Spark)
    val direct = df.collect().map(_.toString).sorted.toSeq
    val rerun = spark.sql(sql).collect().map(_.toString).sorted.toSeq
    assert(direct == rerun, s"optimized-Expand cycle diverged:\n$sql\nchild=$expandChildren")
  }

  test("MATCH_RECOGNIZE renders its clause in the Spark dialect and rejects Ansi") {
    Tables.registerAll(spark, sfDir)
    val mrSql =
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(C.*) AS n_clicks
        |  PATTERN (C{2,} E)
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin
    val df = spark.sql(mrSql)
    val regen = RelToSql.convert(df, RelToSql.Spark)
    assert(regen.contains("MATCH_RECOGNIZE"), s"clause lost:\n$regen")
    val a = df.collect().map(_.toString).sorted.toSeq
    val b = spark.sql(regen).collect().map(_.toString).sorted.toSeq
    assert(a == b, s"MATCH_RECOGNIZE cycle diverged:\n$regen")
    intercept[UnsupportedOperationException] {
      RelToSql.convert(df, RelToSql.Ansi)
    }
  }

  test("MySQL dialect: backticks and CONCAT()") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(concat(col("c_name"), lit("x")).as("n"))
    val sql = RelToSql.convert(c, RelToSql.MySql)
    assert(sql.contains("`c_name`"))
    assert(sql.contains("CONCAT("))
    assert(!sql.contains("||"))
  }

  test("Oracle dialect: NUMBER casts, OFFSET/FETCH, no BOOLEAN") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        col("c_acctbal").cast("double").as("d"),
        col("c_name").cast("string").as("s"))
    val sql = RelToSql.convert(c, RelToSql.Oracle)
    assert(sql.contains("AS NUMBER(19)"), sql)
    assert(sql.contains("AS DOUBLE PRECISION"), sql)
    assert(sql.contains("AS VARCHAR2(4000)"), sql)
    val lim = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(5).limit(10)
    val limSql = RelToSql.convert(lim, RelToSql.Oracle)
    assert(limSql.contains("OFFSET 5 ROWS FETCH NEXT 10 ROWS ONLY"), limSql)
    assert(!limSql.contains("LIMIT"), limSql)
    val bool = Tables.t(spark, sfDir, "nation")
      .select(col("n_nationkey").cast("boolean").as("b"))
    intercept[UnsupportedOperationException] {
      RelToSql.convert(bool, RelToSql.Oracle)
    }
  }

  test("MSSQL dialect: brackets, + concat, ORDER BY carrier for OFFSET/FETCH") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(concat(col("c_name"), lit("x")).as("n"))
    val sql = RelToSql.convert(c, RelToSql.Mssql)
    assert(sql.contains("[c_name]"), sql)
    assert(sql.contains(" + "), sql)
    assert(!sql.contains("||"), sql)
    // ordered limit+offset: OFFSET/FETCH rides the real ORDER BY
    val ordered = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(3).limit(7)
    val oSql = RelToSql.convert(ordered, RelToSql.Mssql)
    assert(oSql.matches("(?s).*ORDER BY \\[n_nationkey\\][^,]* OFFSET 3 ROWS FETCH NEXT 7 ROWS ONLY.*"),
      oSql)
    // bare limit: the (SELECT NULL) carrier, never a bare OFFSET/FETCH
    val bare = Tables.t(spark, sfDir, "nation").limit(4)
    val bSql = RelToSql.convert(bare, RelToSql.Mssql)
    assert(bSql.contains("ORDER BY (SELECT NULL) OFFSET 0 ROWS FETCH NEXT 4 ROWS ONLY"),
      bSql)
    // a plain sort keeps its ORDER BY with no OFFSET clause
    val sorted = Tables.t(spark, sfDir, "nation").orderBy(col("n_name"))
    val sSql = RelToSql.convert(sorted, RelToSql.Mssql)
    assert(sSql.contains("ORDER BY [n_name]") && !sSql.contains("OFFSET"), sSql)
  }

  test("BigQuery dialect: INT64/FLOAT64 casts, set-op quantifiers, CONCAT") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        col("c_acctbal").cast("double").as("d"),
        concat(col("c_name"), lit("x")).as("n"))
    val sql = RelToSql.convert(c, RelToSql.BigQuery)
    assert(sql.contains("AS INT64"), sql)
    assert(sql.contains("AS FLOAT64"), sql)
    assert(sql.contains("CONCAT("), sql)
    assert(sql.contains("`c_custkey`"), sql)
    val n = Tables.t(spark, sfDir, "nation").select(col("n_nationkey").as("k"))
    val bqIntersect = RelToSql.convert(n.intersect(n), RelToSql.BigQuery)
    assert(bqIntersect.contains("INTERSECT DISTINCT"), bqIntersect)
    val bqExcept = RelToSql.convert(n.except(n), RelToSql.BigQuery)
    assert(bqExcept.contains("EXCEPT DISTINCT"), bqExcept)
    val bqUnion = RelToSql.convert(n.union(n), RelToSql.BigQuery)
    assert(bqUnion.contains("UNION ALL"), bqUnion)
    // the quantifier stays implicit in every other dialect
    val ansiIntersect = RelToSql.convert(n.intersect(n), RelToSql.Ansi)
    assert(ansiIntersect.contains("INTERSECT") &&
      !ansiIntersect.contains("INTERSECT DISTINCT"), ansiIntersect)
  }

  test("Hive dialect: backticks, INT/STRING casts, CONCAT") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("int").as("k"),
        col("c_name").cast("string").as("s"),
        concat(col("c_name"), lit("x")).as("n"))
    val sql = RelToSql.convert(c, RelToSql.Hive)
    assert(sql.contains("`c_custkey`"), sql)
    assert(sql.contains("AS INT)"), sql)
    assert(sql.contains("AS STRING)"), sql)
    assert(sql.contains("CONCAT("), sql)
  }

  test("Presto dialect: OFFSET before LIMIT, double quotes") {
    val lim = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(5).limit(10)
    val sql = RelToSql.convert(lim, RelToSql.Presto)
    assert(sql.contains("OFFSET 5 LIMIT 10"), sql)
    assert(sql.contains("\"n_nationkey\""), sql)
    // ANSI keeps the reverse order for the same plan
    val ansi = RelToSql.convert(lim, RelToSql.Ansi)
    assert(ansi.contains("LIMIT 10 OFFSET 5"), ansi)
  }

  test("ClickHouse dialect: case-sensitive type identifiers") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("long").as("k"),
        col("c_acctbal").cast("double").as("d"),
        col("c_name").cast("string").as("s"))
    val sql = RelToSql.convert(c, RelToSql.ClickHouse)
    assert(sql.contains("AS Int64)"), sql)
    assert(sql.contains("AS Float64)"), sql)
    assert(sql.contains("AS String)"), sql)
    assert(sql.contains("`c_name`"), sql)
  }

  test("Redshift dialect: VARCHAR(MAX), LIMIT fetch, DATEDIFF micros") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_name").cast("string").as("s"),
        col("c_acctbal").cast("double").as("d"))
    val sql = RelToSql.convert(c, RelToSql.Redshift)
    assert(sql.contains("VARCHAR(MAX)"), sql)
    assert(sql.contains("DOUBLE PRECISION"), sql)
    // LIMIT-style fetch (reference RedshiftSqlDialect.java
    // unparseOffsetFetch -> unparseFetchUsingLimit)
    val lim = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(5).limit(10)
    val limSql = RelToSql.convert(lim, RelToSql.Redshift)
    assert(limSql.contains("LIMIT 10 OFFSET 5"), limSql)
    // exact epoch micros both directions
    val ts = Tables.t(spark, sfDir, "events")
      .select(unix_micros(col("ts")).as("us"))
    val tsSql = RelToSql.convert(ts, RelToSql.Redshift)
    assert(tsSql.contains("DATEDIFF(MICROSECOND"), tsSql)
    val inv = Tables.t(spark, sfDir, "orders")
      .select(timestamp_micros(col("o_orderkey") * 1000000L).as("t"))
    val invSql = RelToSql.convert(inv, RelToSql.Redshift)
    assert(invSql.contains("DATEADD(MICROSECOND"), invSql)
  }

  test("Teradata dialect: BYTEINT/FLOAT casts, ANSI OFFSET/FETCH, micros partial") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("byte").as("b"),
        col("c_acctbal").cast("double").as("d"))
    val sql = RelToSql.convert(c, RelToSql.Teradata)
    assert(sql.contains("AS BYTEINT"), sql)
    assert(sql.contains("AS FLOAT"), sql)
    val lim = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(3).limit(7)
    val limSql = RelToSql.convert(lim, RelToSql.Teradata)
    assert(limSql.contains("OFFSET 3 ROWS FETCH NEXT 7 ROWS ONLY"), limSql)
    assert(!limSql.contains("LIMIT"), limSql)
    // no sub-second epoch accessor: documented partial like MySQL/Hive
    val ts = Tables.t(spark, sfDir, "events")
      .select(unix_micros(col("ts")).as("us"))
    intercept[UnsupportedOperationException] {
      RelToSql.convert(ts, RelToSql.Teradata)
    }
  }

  test("Snowflake dialect: STRING/TIMESTAMP_NTZ, EPOCH_MICROSECOND both ways") {
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_name").cast("string").as("s"))
    val sql = RelToSql.convert(c, RelToSql.Snowflake)
    assert(sql.contains("AS STRING"), sql)
    val ts = Tables.t(spark, sfDir, "events")
      .select(unix_micros(col("ts")).as("us"))
    val tsSql = RelToSql.convert(ts, RelToSql.Snowflake)
    assert(tsSql.contains("DATE_PART(EPOCH_MICROSECOND"), tsSql)
    val inv = Tables.t(spark, sfDir, "orders")
      .select(timestamp_micros(col("o_orderkey") * 1000000L).as("t"))
    val invSql = RelToSql.convert(inv, RelToSql.Snowflake)
    assert(invSql.contains("TO_TIMESTAMP_NTZ("), invSql)
  }

  test("thin-dialect tail: Db2, Vertica, Netezza, Derby, Sybase TOP, Informix bare") {
    val lim = Tables.t(spark, sfDir, "nation")
      .orderBy(col("n_nationkey")).offset(3).limit(7)
    // DB2/Derby: ANSI OFFSET/FETCH, FIRST vs NEXT keyword
    assert(RelToSql.convert(lim, RelToSql.Db2)
      .contains("OFFSET 3 ROWS FETCH FIRST 7 ROWS ONLY"))
    assert(RelToSql.convert(lim, RelToSql.Derby)
      .contains("OFFSET 3 ROWS FETCH NEXT 7 ROWS ONLY"))
    // Sybase: select-list TOP with 1-based START AT, never a tail clause
    val syb = RelToSql.convert(lim, RelToSql.Sybase)
    assert(syb.contains("SELECT TOP (7) START AT 4 *"), syb)
    assert(!syb.contains("OFFSET") && !syb.contains("LIMIT"), syb)
    // Sybase bare OFFSET: no TOP form -> documented partial
    intercept[UnsupportedOperationException] {
      RelToSql.convert(Tables.t(spark, sfDir, "nation").offset(3), RelToSql.Sybase)
    }
    // type collapses
    val c = Tables.t(spark, sfDir, "customer")
      .select(col("c_custkey").cast("byte").as("b"),
        col("c_acctbal").cast("double").as("d"))
    assert(RelToSql.convert(c, RelToSql.Vertica).contains("AS INT"))
    assert(RelToSql.convert(c, RelToSql.Vertica).contains("AS FLOAT"))
    assert(RelToSql.convert(c, RelToSql.Netezza).contains("AS BYTEINT"))
    assert(RelToSql.convert(c, RelToSql.Db2).contains("AS SMALLINT"))
    // Informix: plain identifiers render bare
    val inf = RelToSql.convert(
      Tables.t(spark, sfDir, "nation").select(col("n_name")), RelToSql.Informix)
    assert(inf.contains("n_name") && !inf.contains("\"n_name\""), inf)
    // H2/Phoenix: ANSI base renderings parse as SELECT text
    assert(RelToSql.convert(lim, RelToSql.H2).startsWith("SELECT"))
    assert(RelToSql.convert(lim, RelToSql.Phoenix).startsWith("SELECT"))
  }

  test("Oracle/MSSQL exact-micros partials closed: interval fold + DATEADD") {
    val ts = Tables.t(spark, sfDir, "events")
      .select(unix_micros(col("ts")).as("us"))
    val oSql = RelToSql.convert(ts, RelToSql.Oracle)
    assert(oSql.contains("EXTRACT(SECOND FROM") && oSql.contains("* 1000000"), oSql)
    assert(oSql.contains("AS NUMBER(19)"), oSql)
    val inv = Tables.t(spark, sfDir, "orders")
      .select(timestamp_micros(col("o_orderkey") * 1000000L).as("t"))
    val oInv = RelToSql.convert(inv, RelToSql.Oracle)
    assert(oInv.contains("NUMTODSINTERVAL("), oInv)
    val mInv = RelToSql.convert(inv, RelToSql.Mssql)
    assert(mInv.contains("DATEADD(MICROSECOND") && mInv.contains("DATETIME2(6)"), mInv)
  }

  // the r7 ask: extend the cycle gate's corpus to the new dialects — every
  // Spark-convertible registry query must also either render in each new
  // dialect or reject with the converter's documented partial-by-design
  // message (never any other failure)
  test("new dialects render-or-reject the full Spark-convertible corpus") {
    Tables.registerAll(spark, sfDir)
    val convertible = SparkEntry.queries.keys.toSeq.sorted.flatMap { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      if (df.isStreaming) None
      else try { RelToSql.convert(df, RelToSql.Spark); Some(q -> df) }
      catch { case _: UnsupportedOperationException => None }
    }
    assert(convertible.size >= 100, s"corpus shrank: ${convertible.size}")
    for ((q, df) <- convertible;
         d <- Seq(RelToSql.Redshift, RelToSql.Teradata, RelToSql.Snowflake,
           RelToSql.Db2, RelToSql.Vertica, RelToSql.Phoenix, RelToSql.Netezza,
           RelToSql.H2, RelToSql.Derby, RelToSql.Sybase, RelToSql.Informix)) {
      try {
        val text = RelToSql.convert(df, d)
        assert(text.startsWith("SELECT"), s"$q/${d.name}: $text")
      } catch {
        case e: UnsupportedOperationException =>
          assert(e.getMessage.startsWith("rel2sql: unsupported"),
            s"$q/${d.name}: unexpected failure ${e.getMessage}")
      }
    }
  }

  test("temp-view plans convert (View unwrapping)") {
    Tables.registerAll(spark, sfDir)
    roundTrip(spark.table("nation")
      .where(col("n_regionkey") === 1).select(col("n_name")))
    // view joined with a direct read
    val r = Tables.t(spark, sfDir, "region")
    roundTrip(spark.table("nation").join(r,
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_name"), col("r_name")))
  }

  test("SQL-origin plans with subqueries round-trip (EXISTS, IN, scalar)") {
    // SQL text → Catalyst plan → regenerated SQL → same result: the full
    // rel2sql cycle the reference drives through its JDBC adapter
    def cycle(sqlText: String): Unit = {
      val df = Engine.sql(spark, sfDir, sqlText)
      val regen = RelToSql.convert(df, RelToSql.Spark)
      val direct = df.collect().map(_.toString).sorted.toSeq
      val rerun = spark.sql(regen).collect().map(_.toString).sorted.toSeq
      assert(direct.nonEmpty && direct == rerun, s"cycle diverged for:\n$regen")
    }
    cycle("""SELECT c_custkey FROM customer WHERE EXISTS (
            |  SELECT 1 FROM orders WHERE o_custkey = c_custkey
            |    AND o_totalprice > 100000.0)""".stripMargin)
    cycle("""SELECT n_name FROM nation
            |WHERE n_nationkey IN (SELECT c_nationkey FROM customer
            |                      WHERE c_acctbal > 5000.0)""".stripMargin)
    cycle("""SELECT c_custkey FROM customer
            |WHERE c_acctbal > (SELECT 2.0 * avg(c_acctbal) FROM customer)""".stripMargin)
  }

  test("fuzz: 40 seeded random expression trees round-trip exactly") {
    // the reference fuzzes its simplifier with random Rex trees
    // (RexProgramFuzzyTest); here random Column trees render to SQL and
    // re-execute — any mis-parenthesization or operator mistranslation
    // changes the result set
    import org.apache.spark.sql.Column
    val rnd = new scala.util.Random(20260813L)
    val n = Tables.t(spark, sfDir, "nation")
    def num(depth: Int): Column = rnd.nextInt(if (depth <= 0) 3 else 6) match {
      case 0 => col("n_nationkey")
      case 1 => col("n_regionkey")
      case 2 => lit((rnd.nextInt(21) - 10).toLong)
      case 3 => num(depth - 1) + num(depth - 1)
      case 4 => num(depth - 1) * lit((rnd.nextInt(5) + 1).toLong)
      case 5 => when(bool(depth - 1), num(depth - 1)).otherwise(num(depth - 1))
    }
    def bool(depth: Int): Column = rnd.nextInt(if (depth <= 0) 3 else 6) match {
      case 0 => col("n_nationkey") > lit(rnd.nextInt(25).toLong)
      case 1 => col("n_regionkey") === lit(rnd.nextInt(5).toLong)
      case 2 => col("n_name").like("%" + "AEIN".charAt(rnd.nextInt(4)) + "%")
      case 3 => bool(depth - 1) && bool(depth - 1)
      case 4 => bool(depth - 1) || bool(depth - 1)
      case 5 => !bool(depth - 1)
    }
    Tables.registerAll(spark, sfDir)
    for (i <- 1 to 40) {
      val df = n.select(col("n_nationkey"), num(2).as("e1"), num(2).as("e2"))
        .where(bool(2))
      val sql = RelToSql.convert(df, RelToSql.Spark)
      val direct = df.collect().map(_.toString).sorted.toSeq
      val rerun = spark.sql(sql).collect().map(_.toString).sorted.toSeq
      assert(direct == rerun, s"fuzz case $i diverged for:\n$sql")
    }
  }

  test("unsupported nodes are rejected, not mistranslated") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
    val e = intercept[UnsupportedOperationException] {
      RelToSql.convert(docs, RelToSql.Ansi)
    }
    assert(e.getMessage.contains("rel2sql"))
  }
}
