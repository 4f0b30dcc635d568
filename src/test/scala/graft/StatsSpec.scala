package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Statistics & cost (SURVEY.md §4.3): the reference's RelMetadataQuery /
  * Statistic machinery maps to ANALYZE TABLE + CBO + AQE runtime stats.
  * These tests pin that the stats actually flow into plans: row counts and
  * column NDVs land in the catalog, the CBO uses sizes to pick broadcast
  * sides, and AQE splits skewed shuffle partitions at runtime. */
class StatsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"spark-warehouse/$name"), true)
  }

  test("ANALYZE TABLE populates row counts and column stats (Statistic.java analogue)") {
    freshTable("nation_stats")
    Tables.t(spark, sfDir, "nation").write.mode("overwrite")
      .saveAsTable("nation_stats")
    spark.sql("ANALYZE TABLE nation_stats COMPUTE STATISTICS FOR COLUMNS n_nationkey, n_regionkey")
    val rows = spark.sql("DESCRIBE EXTENDED nation_stats n_nationkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("distinct_count") == "25", rows.toString)
    assert(rows("max") == "24")
    // rowCount propagates into plan stats when the CBO reads the catalog
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table("nation_stats").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)), s"rowCount=${stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.sql("DROP TABLE nation_stats")
  }

  test("CBO: catalog sizes drive the broadcast-side choice") {
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      freshTable("li_stats"); freshTable("r_stats")
      Tables.t(spark, sfDir, "lineitem").write.mode("overwrite").saveAsTable("li_stats")
      Tables.t(spark, sfDir, "region").write.mode("overwrite").saveAsTable("r_stats")
      spark.sql("ANALYZE TABLE li_stats COMPUTE STATISTICS")
      spark.sql("ANALYZE TABLE r_stats COMPUTE STATISTICS")
      val joined = spark.table("li_stats")
        .join(spark.table("r_stats"), col("l_linenumber") === col("r_regionkey"))
      val plan = joined.queryExecution.executedPlan.toString
      // the 5-row side must be the broadcast build side, not the fact table
      assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.sql("DROP TABLE IF EXISTS li_stats")
      spark.sql("DROP TABLE IF EXISTS r_stats")
    }
  }

  test("AQE splits a skewed shuffle join at runtime (RelMdDistribution analogue)") {
    // one hot key owning ~90% of rows — the classic skew shape
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      import spark.implicits._
      val skewed = spark.range(0, 200000)
        .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k")
      // AQE decides skew handling at RUNTIME: execute THIS QueryExecution,
      // then read back the final adaptive plan
      assert(joined.collect().length > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew="), s"AQE skew handling not engaged:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }
}
