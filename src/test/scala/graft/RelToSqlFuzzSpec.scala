package graft

import graft.plans.RelToSql
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the rel2sql converter — MatcherHammer's strategy
  * applied to plan rendering. Seeded-random DataFrame plans are built from a
  * combinator grammar over the fixture tables; each plan executes twice —
  * directly, and re-parsed from its regenerated Spark-dialect SQL — and the
  * multiset of result rows must agree. The Ansi rendering is additionally
  * generated for every case (it must never throw on a supported shape; its
  * executable subset is the oracle gate's `rel2sql_roundtrip`).
  *
  * Mirrors the reference's converter test intent (RelToSqlConverterTest's
  * hundreds of pinned renderings) but replaces pinning with execution: a
  * rendering that parses and returns the same rows is correct by
  * construction, over a far larger shape space than hand-pinned strings.
  *
  * Determinism: LIMIT only ever follows ORDER BY over every output column,
  * so the kept prefix is a deterministic multiset even with ties; DOUBLE
  * columns are aggregated only with order-insensitive MIN/MAX/COUNT.
  */
class RelToSqlFuzzSpec extends AnyFunSuite {
  import SparkTestSession._

  private val CASES = 140

  private def table(name: String): DataFrame = Tables.t(spark, sfDir, name)

  /** (table, numeric key columns usable as join/group keys, string columns,
    * numeric measure columns). Small fixture tables keep each case fast. */
  private case class Src(name: String, keys: Seq[String], strs: Seq[String],
      nums: Seq[String])
  private val srcs = Seq(
    Src("nation", Seq("n_nationkey", "n_regionkey"), Seq("n_name"), Seq("n_nationkey")),
    Src("region", Seq("r_regionkey"), Seq("r_name"), Seq("r_regionkey")),
    Src("supplier", Seq("s_suppkey", "s_nationkey"), Seq("s_name"), Seq("s_acctbal")),
    Src("customer", Seq("c_custkey", "c_nationkey"), Seq("c_name", "c_mktsegment"),
      Seq("c_acctbal")))

  private final class Gen(seed: Long) {
    val rnd = new scala.util.Random(seed)
    def pick[A](xs: Seq[A]): A = xs(rnd.nextInt(xs.size))

    def base(): (DataFrame, Src) = {
      val s = pick(srcs)
      (table(s.name), s)
    }

    def predicate(s: Src): Column = rnd.nextInt(4) match {
      case 0 => col(pick(s.keys)) % (rnd.nextInt(5) + 2) === rnd.nextInt(3)
      case 1 => col(pick(s.keys)) >= rnd.nextInt(20)
      case 2 => col(pick(s.strs)).isNotNull && length(col(pick(s.strs))) > rnd.nextInt(8)
      case 3 => col(pick(s.keys)) =!= rnd.nextInt(10) || col(pick(s.keys)) < rnd.nextInt(40)
    }

    /** A unary chain of 0-3 supported operators over one source. */
    def chain(): DataFrame = {
      val (df0, s) = base()
      var df = df0
      var aggregated = false // an aggregate drops the source columns: terminal
      (0 until rnd.nextInt(4)).foreach { _ =>
        if (!aggregated) rnd.nextInt(5) match {
          case 0 => df = df.where(predicate(s))
          case 1 =>
            df = df.select((s.keys ++ s.strs).distinct.map(col) :+
              (col(pick(s.keys)) * (rnd.nextInt(3) + 1) + rnd.nextInt(7)).as("derived"): _*)
          case 2 => df = df.distinct()
          case 3 =>
            val cols = df.columns.toSeq.map(col)
            df = df.orderBy(cols: _*).limit(rnd.nextInt(25) + 1)
          case 4 => // aggregate collapses the chain to (key, measures);
            // key and measure must still be present after any projection
            val key = pick(if (df.columns.contains("derived")) s.keys :+ "derived" else s.keys)
            val numeric = df.columns.toSeq.filter(c =>
              s.nums.contains(c) || s.keys.contains(c) || c == "derived")
            val measure = pick(numeric)
            df = df.groupBy(col(key))
              .agg(count(lit(1)).as("cnt"),
                min(col(measure)).as("mn"), max(col(measure)).as("mx"))
            aggregated = true
        }
      }
      df
    }

    /** Full case: a chain, or a binary combinator over two shapes. */
    def plan(): DataFrame = rnd.nextInt(10) match {
      case 0 | 1 => // equi-join nation/region or customer/nation
        val joinType = pick(Seq("inner", "left", "left_semi", "left_anti"))
        if (rnd.nextBoolean()) {
          val n = table("nation"); val r = table("region")
          val j = n.join(r, n("n_regionkey") === r("r_regionkey"), joinType)
          if (joinType.startsWith("left_")) j else j.select(n("n_nationkey"), n("n_name"), r("r_name"))
        } else {
          val c = table("customer").where(predicate(srcs.find(_.name == "customer").get))
          val n = table("nation")
          val j = c.join(n, c("c_nationkey") === n("n_nationkey"), joinType)
          if (joinType.startsWith("left_")) j.select(c("c_custkey"), c("c_name"))
          else j.select(c("c_custkey"), c("c_acctbal"), n("n_name"))
        }
      case 2 => // set operation over two projections of one source
        val s = pick(srcs)
        val cols = (s.keys ++ s.strs).distinct.map(col)
        val l = table(s.name).where(predicate(s)).select(cols: _*)
        val r = table(s.name).where(predicate(s)).select(cols: _*)
        rnd.nextInt(5) match {
          case 0 => l.union(r)
          case 1 => l.intersect(r)
          case 2 => l.except(r)
          case 3 => l.intersectAll(r)
          case 4 => l.exceptAll(r)
        }
      case 3 => // aggregate over a join
        val c = table("customer"); val n = table("nation")
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(n("n_name"))
          .agg(count(lit(1)).as("cnt"), max(c("c_acctbal")).as("mx"))
      case 4 => // window: rank family over a deterministic total order
        val s = pick(srcs)
        val df = table(s.name)
        val order = df.columns.toSeq.map(col)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(pick(s.keys))).orderBy(order: _*)
        val winCol = rnd.nextInt(3) match {
          case 0 => row_number().over(w)
          case 1 => rank().over(w)
          case 2 => sum(col(pick(s.keys))).over(w)
        }
        df.select((s.keys ++ s.strs).distinct.map(col) :+ winCol.as("wv"): _*)
      case 5 => // HAVING: filter over an aggregate's output
        val s = pick(srcs)
        table(s.name).groupBy(col(pick(s.keys)))
          .agg(count(lit(1)).as("cnt"), max(col(pick(s.nums))).as("mx"))
          .where(col("cnt") > rnd.nextInt(3))
      case 6 => // OFFSET with and without a trailing LIMIT
        val s = pick(srcs)
        val df = table(s.name)
        val ordered = df.orderBy(df.columns.toSeq.map(col): _*)
          .offset(rnd.nextInt(10))
        if (rnd.nextBoolean()) ordered.limit(rnd.nextInt(15) + 1) else ordered
      case 7 => // inline VALUES (LocalRelation): standalone or joined in
        val sess = spark
        import sess.implicits._
        val n = rnd.nextInt(4) + 1
        val inline = (0 until n)
          .map(i => (i, rnd.nextInt(50), s"tag_${rnd.nextInt(5)}"))
          .toDF("vk", "vnum", "vtag")
        if (rnd.nextBoolean()) inline
        else table("region")
          .join(inline, col("r_regionkey") === col("vk"),
            pick(Seq("inner", "left")))
      case _ => chain()
    }

    /** Shapes whose rendering is legitimately partial across the dialect
      * tail (RexSubQuery forms, GROUPING SETS text): Spark must render
      * and re-execute; other dialects render or documented-reject. */
    def advancedPlan(): DataFrame = rnd.nextInt(4) match {
      case 0 => // correlated EXISTS (RexSubQuery rendering)
        spark.sql(
          s"""SELECT n_nationkey, n_name FROM nation
             |WHERE EXISTS (SELECT 1 FROM supplier
             |              WHERE s_nationkey = n_nationkey
             |                AND s_acctbal >= ${rnd.nextInt(1000)})""".stripMargin)
      case 1 => // IN subquery
        spark.sql(
          s"""SELECT n_nationkey, n_name FROM nation
             |WHERE n_regionkey IN (SELECT r_regionkey FROM region
             |                      WHERE r_regionkey >= ${rnd.nextInt(4)})""".stripMargin)
      case 2 => // correlated scalar subquery in the select list
        spark.sql(
          """SELECT r_name,
            |  (SELECT count(*) FROM nation WHERE n_regionkey = r_regionkey) AS cnt
            |FROM region""".stripMargin)
      case 3 => // ROLLUP / CUBE (Expand inversion to GROUPING SETS text)
        val s = pick(Seq(srcs.head, srcs(2), srcs(3)))
        val k1 = col(pick(s.keys)); val k2 = col(pick(s.strs))
        val grouped = if (rnd.nextBoolean()) table(s.name).rollup(k1, k2)
          else table(s.name).cube(k1, k2)
        grouped.agg(count(lit(1)).as("cnt"))
    }
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test(s"$CASES seeded-random plans execute identically through their Spark rendering") {
    Tables.registerAll(spark, sfDir)
    var nonEmpty = 0
    (1 to CASES).foreach { i =>
      val g = new Gen(0xC0FFEEL + i * 7919L)
      val df = g.plan()
      val spk = try RelToSql.convert(df, RelToSql.Spark) catch {
        case e: Throwable => fail(s"case $i: Spark rendering threw ${e.getMessage}")
      }
      // every other dialect must also render — or reject with the
      // converter's documented partial-by-design message, never any
      // other failure (Ansi's executable subset is gated against DuckDB
      // by rel2sql_roundtrip; the grammar never casts to BOOLEAN, so
      // even Oracle renders every case — the only legal rejection in
      // this shape space is Sybase's LIMIT-less OFFSET, which has no
      // TOP form)
      Seq(RelToSql.Ansi, RelToSql.Postgres, RelToSql.MySql, RelToSql.Oracle,
        RelToSql.Mssql, RelToSql.BigQuery, RelToSql.Hive, RelToSql.Presto,
        RelToSql.ClickHouse, RelToSql.Redshift, RelToSql.Teradata,
        RelToSql.Snowflake, RelToSql.Db2, RelToSql.Vertica, RelToSql.Phoenix,
        RelToSql.Netezza, RelToSql.H2, RelToSql.Derby, RelToSql.Sybase,
        RelToSql.Informix).foreach { d =>
        try {
          val text = RelToSql.convert(df, d)
          assert(text.startsWith("SELECT"), s"case $i/${d.name}: $text")
        } catch {
          case e: UnsupportedOperationException =>
            assert(e.getMessage.startsWith("rel2sql: unsupported") &&
              (d eq RelToSql.Sybase),
              s"case $i/${d.name}: unexpected rejection ${e.getMessage}")
        }
      }
      val direct = rows(df)
      val rerun = try rows(spark.sql(spk)) catch {
        case e: Throwable => fail(s"case $i: regenerated SQL failed to execute:\n$spk\n${e.getMessage}")
      }
      if (direct.nonEmpty) nonEmpty += 1
      assert(direct == rerun, s"case $i diverged (${direct.size} vs ${rerun.size} rows):\n$spk")
    }
    // the grammar must actually exercise data, not vacuous empty results
    assert(nonEmpty > CASES / 2, s"only $nonEmpty/$CASES cases returned rows")
  }

  test("subquery and grouping-set shapes cycle in Spark; tail dialects render or documented-reject") {
    Tables.registerAll(spark, sfDir)
    val allDialects = Seq(RelToSql.Ansi, RelToSql.Postgres, RelToSql.MySql,
      RelToSql.Oracle, RelToSql.Mssql, RelToSql.BigQuery, RelToSql.Hive,
      RelToSql.Presto, RelToSql.ClickHouse, RelToSql.Redshift,
      RelToSql.Teradata, RelToSql.Snowflake, RelToSql.Db2, RelToSql.Vertica,
      RelToSql.Phoenix, RelToSql.Netezza, RelToSql.H2, RelToSql.Derby,
      RelToSql.Sybase, RelToSql.Informix)
    var nonEmpty = 0
    (1 to 40).foreach { i =>
      val g = new Gen(0xBEEFL + i * 104729L)
      val df = g.advancedPlan()
      val spk = try RelToSql.convert(df, RelToSql.Spark) catch {
        case e: UnsupportedOperationException =>
          assert(e.getMessage.startsWith("rel2sql: unsupported"),
            s"adv case $i: non-documented Spark rejection ${e.getMessage}")
          null
        case e: Throwable => fail(s"adv case $i: Spark rendering threw ${e.getMessage}")
      }
      allDialects.foreach { d =>
        try {
          val text = RelToSql.convert(df, d)
          assert(text.startsWith("SELECT"), s"adv case $i/${d.name}: $text")
        } catch {
          case e: UnsupportedOperationException =>
            assert(e.getMessage.startsWith("rel2sql: unsupported"),
              s"adv case $i/${d.name}: non-documented rejection ${e.getMessage}")
        }
      }
      if (spk != null) {
        val direct = rows(df)
        val rerun = try rows(spark.sql(spk)) catch {
          case e: Throwable =>
            fail(s"adv case $i: regenerated SQL failed to execute:\n$spk\n${e.getMessage}")
        }
        assert(direct == rerun,
          s"adv case $i diverged (${direct.size} vs ${rerun.size} rows):\n$spk")
        if (direct.nonEmpty) nonEmpty += 1
      }
    }
    assert(nonEmpty > 10, s"only $nonEmpty advanced cases cycled with rows")
  }
}
