package graft

import graft.operators.TableModify
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TableModify write-path semantics + Rel builder surface + Catalyst
  * plan-shape assertions (the reference's planner-rule golden tests,
  * adapted: we assert on the optimized/physical plan of OUR queries —
  * pushdown reached the scan, dimensions broadcast, aggregates partial). */
class ModifyAndPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshTable(name: String): String = {
    val dir = s"/tmp/graft_modify/$name"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    Tables.t(spark, sfDir, "region").write.parquet(dir)
    dir
  }

  test("TableModify insert appends rows") {
    val dir = freshTable("ins")
    val extra = spark.createDataFrame(Seq((9, "ATLANTIS"))).toDF("r_regionkey", "r_name")
    TableModify.insertInto(extra, dir)
    assert(spark.read.parquet(dir).count() == 6)
  }

  test("TableModify delete removes matching rows") {
    val dir = freshTable("del")
    TableModify.delete(spark, dir, col("r_regionkey") >= 3)
    val names = spark.read.parquet(dir).select("r_regionkey").collect().map(_.getInt(0)).sorted
    assert(names.toSeq == Seq(0, 1, 2))
  }

  test("TableModify update rewrites matching rows only") {
    val dir = freshTable("upd")
    TableModify.update(spark, dir, col("r_regionkey") === 0,
      Map("r_name" -> lit("PANGAEA")))
    val m = spark.read.parquet(dir).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m(0) == "PANGAEA" && m(1) != "PANGAEA")
  }

  test("TableModify merge updates matched and inserts new") {
    val dir = freshTable("mrg")
    val src = spark.createDataFrame(Seq((0, "ZERO"), (7, "SEVEN")))
      .toDF("r_regionkey", "r_name")
    TableModify.merge(spark, dir, src, "r_regionkey",
      Map("r_name" -> col("s.r_name")))
    val m = spark.read.parquet(dir).collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m.size == 6 && m(0) == "ZERO" && m(7) == "SEVEN" && m(1) != "ZERO")
  }

  test("TableModify scd2Merge keeps history and serves snapshots") {
    import spark.implicits._
    val dir = "/tmp/graft_modify/scd2"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // initial load: two open versions at t0
    Seq((1L, "bronze", ts("2024-01-01 00:00:00")),
        (2L, "silver", ts("2024-01-01 00:00:00")))
      .toDF("id", "tier", "valid_from")
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .write.parquet(dir)
    // day 2: id=1 changes tier, id=2 unchanged, id=3 is new
    val day2 = Seq((1L, "gold", ts("2024-01-02 00:00:00")),
        (2L, "silver", ts("2024-01-02 00:00:00")),
        (3L, "bronze", ts("2024-01-02 00:00:00")))
      .toDF("id", "tier", "ts")
    TableModify.scd2Merge(spark, dir, day2, "id", Seq("tier"), "ts")
    val all = spark.read.parquet(dir)
    assert(all.count() == 4) // closed v1 of id=1, open gold, silver untouched, new id=3
    // current state
    val current = all.where(col("valid_to").isNull)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(current == Map(1L -> "gold", 2L -> "silver", 3L -> "bronze"))
    // snapshot AS OF day 1: id=1 was bronze, id=3 absent
    val asOf = ts("2024-01-01 12:00:00")
    val snap = all.where(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(snap == Map(1L -> "bronze", 2L -> "silver"))
  }

  test("TableModify compact coalesces small files, values unchanged") {
    val dir = "/tmp/graft_modify/compact"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    // simulate small-file accumulation: many appends
    val src = Tables.t(spark, sfDir, "customer")
    for (_ <- 0 until 5) src.repartition(4).write.mode("append").parquet(dir)
    def parquetFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(parquetFiles() >= 20)
    val before = spark.read.parquet(dir).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    TableModify.compact(spark, dir, targetFileMB = 128)
    assert(parquetFiles() == 1, s"expected 1 compacted file, got ${parquetFiles()}")
    val after = spark.read.parquet(dir).groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(before == after)
  }

  test("Rel builder mirrors RelBuilder programs") {
    val df = Rel.builder(spark, sfDir)
      .scan("customer")
      .filter(col("c_acctbal") > 0)
      .project(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .scan("nation")
      .join("inner", col("c_nationkey") === col("n_nationkey"))
      .aggregate(Seq(col("n_name")), count(lit(1)).as("n"))
      .sortLimit(0, 5, col("n").desc, col("n_name"))
      .build()
    assert(df.count() == 5)
    val setop = Rel.builder(spark, sfDir)
      .scan("customer").project(col("c_nationkey").as("nk"))
      .scan("supplier").project(col("s_nationkey").as("nk"))
      .intersect(all = false)
      .build()
    assert(setop.count() > 0)
  }

  test("Rel builder: correlate, pivot, functionScan, match, asofJoin") {
    val lateral = Rel.builder(spark, sfDir)
      .scan("part")
      .correlate(posexplode(split(col("p_type"), " ")), "pos", "word")
      .build()
    assert(lateral.columns.contains("word") && lateral.count() > 0)

    val piv = Rel.builder(spark, sfDir)
      .scan("customer")
      .pivot(col("c_nationkey"), "c_mktsegment", Seq("AUTOMOBILE", "BUILDING"),
        count(lit(1)))
      .build()
    assert(piv.columns.toSet == Set("c_nationkey", "AUTOMOBILE", "BUILDING"))

    val fs = Rel.builder(spark, sfDir).functionScan(0, 10).build()
    assert(fs.count() == 10)

    val mr = Rel.builder(spark, sfDir)
      .scan("events")
      .matchRecognize("user_id", "ts", Some("event_id"),
        "COUNT(C.*) AS n_clicks, LAST(event_id) AS last_id",
        "C{2,} E",
        "C AS event_type = 'click', E AS event_type = 'error'")
      .build()
    assert(mr.columns.toSeq == Seq("user_id", "n_clicks", "last_id") && mr.count() > 0)

    val asof = Rel.builder(spark, sfDir)
      .scan("events").filter(col("event_type") === "purchase")
      .scan("events").filter(col("event_type") === "click")
      .asofJoin(col("user_id"), col("user_id"), col("ts"), col("ts"),
        Seq("event_id"), col("event_id"))
      .build()
    assert(asof.columns.contains("asof_event_id") && asof.count() > 0)
  }

  test("plan: filters and projections reach the parquet scan") {
    val df = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 45)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_quantity"),
      s"no pushed filter in scan: $scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_extendedprice"),
      "column pruning failed — scan reads unused columns")
  }

  test("plan: dimension joins broadcast, no shuffle of the fact side") {
    val plan = SparkEntry.queries("join_inner_multiway")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("plan: aggregation is partial (map-side combine) before the shuffle") {
    val plan = SparkEntry.queries("agg_tpch_q1")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), "expected hash aggregation")
    // partial + final pair: two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, "no partial aggregation")
  }

  test("plan: the weighted_avg UDAF aggregates partially like a built-in") {
    val plan = SparkEntry.queries("fn_udaf_wavg")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_weighted_avg"),
      s"no map-side partial for the UDAF:\n$plan")
  }

  test("weighted_avg is callable from SQL via the session extension") {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT weighted_avg(l_extendedprice, l_quantity) AS w
        |FROM lineitem""".stripMargin).head().getDouble(0)
    val direct = spark.sql(
      """SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |     / CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |FROM lineitem""".stripMargin).head().getDouble(0)
    assert(viaSql == direct)
  }

  test("approx_count_distinct lands within HLL++ tolerance of exact") {
    val li = Tables.t(spark, sfDir, "lineitem")
    val exact = li.agg(countDistinct(col("l_orderkey"))).head().getLong(0)
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.02))
      .head().getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err < 0.06, s"approx=$approx exact=$exact err=$err") // 3× rsd

  }

  test("similarToRegex translation matches reference Like.java semantics") {
    import graft.operators.Extras.similarToRegex
    assert("PROMO BRASS".matches(similarToRegex("%BRASS")))
    assert("PROMO BRASS".matches(similarToRegex("PROMO%")))
    assert(!"PROMO BRASS".matches(similarToRegex("BRASS")))
    assert("abc".matches(similarToRegex("a_c")))
    assert(!"a.c".matches(similarToRegex("a_c")) == false) // '_' matches '.' too
    assert("a.c".matches(similarToRegex("a.c")))           // '.' is literal
    assert(!"axc".matches(similarToRegex("a.c")))
    assert("ab".matches(similarToRegex("a(b|d)")))
    assert("aaab".matches(similarToRegex("a{2,4}b")))
  }
}
