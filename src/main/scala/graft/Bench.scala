package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every registry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON metrics line.
  *
  * Each query is fully materialized through the `noop` sink (columnar
  * scan → ... → row output, nothing skipped), not `count()` — count lets
  * Catalyst prune the whole projection and under-measures scan-heavy
  * queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional local-iteration filter; the driver leaves this unset.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val defs = only match {
      case Some(names) => SparkEntry.allDefs.filter(d => names(d.name))
      case None => SparkEntry.allDefs
    }
    // Warm up the JVM/codegen/parquet-reader/shuffle paths once so the
    // first timed queries don't absorb session initialization (standard
    // JMH-style discipline; the reference's JMH harness does the same).
    try {
      SparkEntry.allDefs.headOption.foreach(
        _.fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      spark.range(0, 1000000)
        .selectExpr("id % 7 AS k", "CAST(id AS DOUBLE) AS x")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.expr("sum(CAST(x AS DECIMAL(18,4)))"),
          org.apache.spark.sql.functions.expr("count(1)"))
        .write.mode("overwrite").format("noop").save()
    } catch { case _: Throwable => () }
    val results = defs.map { d =>
      val t0 = System.nanoTime()
      try d.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${d.name} failed: ${e.getMessage}")
      }
      d.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
