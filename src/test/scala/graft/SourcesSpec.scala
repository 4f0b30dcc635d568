package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink adapters (SURVEY.md §2.6): csv and json round-trips with
  * schema inference (the reference's CsvScannableTable / JsonScannableTable
  * shapes), plus DDL through the SQL entry (CREATE/DROP VIEW — the
  * reference's server module DDL). */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def fresh(name: String): String = {
    val dir = s"/tmp/graft_sources/$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    dir
  }

  test("csv round-trip with header + schema inference") {
    val dir = fresh("csv")
    val src = Tables.t(spark, sfDir, "part")
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    assert(back.count() == src.count())
    // inference lands on usable numeric types
    assert(back.schema("p_size").dataType == org.apache.spark.sql.types.IntegerType)
    val sumSrc = src.agg(sum("p_size")).head().getLong(0)
    val sumBack = back.agg(sum("p_size")).head().getLong(0)
    assert(sumSrc == sumBack)
  }

  test("json round-trip with schema inference (schema-on-read)") {
    val dir = fresh("json")
    val src = Tables.t(spark, sfDir, "customer")
    src.write.json(dir)
    val back = spark.read.json(dir) // full inference, no declared schema
    assert(back.count() == src.count())
    assert(back.columns.sorted.toSeq == src.columns.sorted.toSeq)
    val m1 = src.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val m2 = back.groupBy("c_mktsegment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1 == m2)
  }

  test("orc round-trip preserves schema and values exactly") {
    val dir = fresh("orc")
    val src = Tables.t(spark, sfDir, "supplier")
    src.write.orc(dir)
    val back = spark.read.orc(dir) // ORC carries the schema — no inference
    assert(back.schema == src.schema)
    assert(back.count() == src.count())
    val a = src.orderBy("s_suppkey").collect().toSeq
    val b = back.orderBy("s_suppkey").collect().toSeq
    assert(a == b)
  }

  test("hive-partitioned parquet: partition pruning reaches the scan") {
    // At 100 TB, directory-level pruning is the difference between
    // scanning one partition and scanning the lake: a filter on the
    // partition column must land in the scan's PartitionFilters (pruned
    // BEFORE any file is opened), never as a post-scan Filter.
    val dir = fresh("partitioned")
    Tables.t(spark, sfDir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").parquet(dir)
    val pruned = spark.read.parquet(dir)
      .where(col("yr") === 1996)
      .select(col("o_orderkey"), col("o_totalprice"))
    val formatted = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.matches("(?s).*PartitionFilters: \\[[^\\]]*1996[^\\]]*\\].*"),
      s"partition filter not pushed:\n$formatted")
    // column pruning holds too: the read schema carries only the two
    // referenced data columns
    assert(formatted.matches("(?s).*ReadSchema: [^\\n]*o_orderkey[^\\n]*o_totalprice.*")
      && !formatted.matches("(?s).*ReadSchema: [^\\n]*o_orderdate.*"),
      s"read schema not pruned:\n$formatted")
    // and the pruned read returns exactly the partition's rows
    val want = Tables.t(spark, sfDir, "orders")
      .where(year(col("o_orderdate")) === 1996).count()
    assert(pruned.count() == want)
  }

  test("bucketed tables: equi-join on the bucket key plans with no shuffle") {
    import graft.sources.Bucketing
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    // AQE can veto bucketed-scan reuse on tiny inputs; the plan property
    // under test is shuffle-freeness, so pin the planner's hand here
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.t(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
      val ord = Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
      Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey")
      Bucketing.writeBucketed(ord, "ord_bucketed", "l_orderkey")
      val joined = Bucketing.coLocatedJoin(spark, "li_bucketed", "ord_bucketed", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.count()) // every lineitem has its order
      // aggregation on the bucket key is also shuffle-free
      val agg = spark.table("li_bucketed").groupBy("l_orderkey").count()
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed aggregation still shuffles")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("DDL: CREATE / query / DROP temp view through the SQL entry") {
    Tables.registerAll(spark, sfDir)
    spark.sql("CREATE OR REPLACE TEMP VIEW big_orders AS " +
      "SELECT * FROM orders WHERE o_totalprice > 100000.0")
    val n = spark.sql("SELECT count(*) AS n FROM big_orders").head().getLong(0)
    val want = Tables.t(spark, sfDir, "orders")
      .where(col("o_totalprice") > 100000.0).count()
    assert(n == want)
    spark.sql("DROP VIEW big_orders")
    assertThrows[Exception](spark.sql("SELECT * FROM big_orders").collect())
  }

  test("server table_as.iq — CTAS lifecycle: duplicate fails, IF NOT EXISTS silent, drop gone") {
    spark.sql("DROP TABLE IF EXISTS tas_dept")
    spark.sql("DROP TABLE IF EXISTS tas_d")
    spark.sql("DROP TABLE IF EXISTS tas_d3")
    spark.sql("CREATE TABLE tas_dept (deptno INT NOT NULL, name VARCHAR(20))")
    spark.sql(
      "INSERT INTO tas_dept VALUES (10, 'Sales'), (20, 'Marketing'), (30, 'Engineering')")
    // create as select (:33-42)
    spark.sql("CREATE TABLE tas_d AS SELECT * FROM tas_dept WHERE deptno > 10")
    assert(spark.sql("SELECT * FROM tas_d").count() == 2)
    // create again — fails (:44-48)
    assertThrows[Exception](spark.sql(
      "CREATE TABLE tas_d AS SELECT * FROM tas_dept WHERE deptno < 30"))
    // IF NOT EXISTS — silent, contents unchanged (:50-62)
    spark.sql(
      "CREATE TABLE IF NOT EXISTS tas_d AS SELECT * FROM tas_dept WHERE deptno < 30")
    assert(spark.sql("SELECT * FROM tas_d").count() == 2)
    // drop; it's gone; second DROP IF EXISTS silent (:64-80)
    spark.sql("DROP TABLE IF EXISTS tas_d")
    assertThrows[Exception](spark.sql("SELECT * FROM tas_d").collect())
    spark.sql("DROP TABLE IF EXISTS tas_d")
    // create based on itself — object not found (:95-97)
    assertThrows[Exception](spark.sql(
      "CREATE TABLE tas_d2 AS SELECT * FROM tas_d2"))
    // CTAS over a UNION ALL (:99-105)
    spark.sql(
      """CREATE TABLE tas_d3 AS
        |SELECT deptno AS dd FROM tas_dept WHERE deptno < 15
        |UNION ALL SELECT deptno AS ee FROM tas_dept WHERE deptno > 25""".stripMargin)
    assert(spark.sql("SELECT * FROM tas_d3").collect().map(_.getInt(0)).toSet
      == Set(10, 30))
    spark.sql("DROP TABLE IF EXISTS tas_d3")
    spark.sql("DROP TABLE IF EXISTS tas_dept")
  }

  test("server schema.iq — schema DDL: create, qualified objects, duplicate fails, IF NOT EXISTS") {
    spark.sql("DROP SCHEMA IF EXISTS sch_s CASCADE")
    spark.sql("CREATE SCHEMA sch_s")
    // table and view inside the schema, qualified references (:24-35)
    spark.sql("CREATE TABLE sch_s.t (i INT)")
    spark.sql("CREATE VIEW sch_s.v AS SELECT * FROM sch_s.t")
    assert(spark.sql("SELECT count(*) AS c FROM sch_s.v").head().getLong(0) == 0L)
    spark.sql("INSERT INTO sch_s.t VALUES (1), (2)")
    assert(spark.sql("SELECT count(*) AS c FROM sch_s.v").head().getLong(0) == 2L)
    // duplicate create fails; IF NOT EXISTS is silent (:37-48)
    assertThrows[Exception](spark.sql("CREATE SCHEMA sch_s"))
    spark.sql("CREATE SCHEMA IF NOT EXISTS sch_s")
    assert(spark.sql("SELECT count(*) FROM sch_s.t").head().getLong(0) == 2L)
    // drop cascade removes the contained objects
    spark.sql("DROP SCHEMA sch_s CASCADE")
    assertThrows[Exception](spark.sql("SELECT * FROM sch_s.t").collect())
  }

  test("server view.iq — view DDL: duplicate fails, OR REPLACE, explicit column list") {
    spark.sql("DROP VIEW IF EXISTS viq_v")
    spark.sql("CREATE VIEW viq_v AS SELECT 1 AS a, 1 + 1 AS b")
    assert(spark.sql("SELECT * FROM viq_v").head().getInt(1) == 2)
    // duplicate create fails (:30-34); OR REPLACE swaps the definition
    assertThrows[Exception](spark.sql(
      "CREATE VIEW viq_v AS SELECT 1 AS a, 1 + 2 AS b"))
    spark.sql("CREATE OR REPLACE VIEW viq_v AS SELECT 1 AS a, 1 + 3 AS b")
    assert(spark.sql("SELECT * FROM viq_v").head().getInt(1) == 4)
    spark.sql("DROP VIEW viq_v")
    // explicit column names rename the projection (:46-52)
    spark.sql("CREATE VIEW viq_v (x, y) AS SELECT 1 AS a, 1 + 4 AS b")
    assert(spark.sql("SELECT y FROM viq_v").head().getInt(0) == 5)
    // wrong arity fails (:54-57)
    assertThrows[Exception](spark.sql(
      "CREATE OR REPLACE VIEW viq_v (x, y, z) AS SELECT 1 AS a, 1 + 5 AS b"))
    spark.sql("DROP VIEW viq_v")
  }
}
