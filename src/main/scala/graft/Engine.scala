package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table catalog for the graft engine.
  *
  * The reference (Apache Calcite 1.21.0-drill-r9) mounts schemas of tables
  * and exposes `Enumerable<Object[]>` scans
  * (reference: core/src/main/java/org/apache/calcite/schema/ScannableTable.java:29).
  * Our equivalent: a SparkSession tuned for the target scale plus a catalog
  * that registers the parquet fixture tables as temp views, so both the
  * DataFrame API and `spark.sql` entry points (Calcite's RelBuilder / JDBC
  * prepare, reference: core/src/main/java/org/apache/calcite/tools/RelBuilder.java,
  * prepare/CalcitePrepareImpl.java:138) resolve the same tables.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting), broadcast
  * threshold left to Spark's default, shuffle partitions sized for local[32]
  * but overridable — on a 1000-executor cluster this is the one knob that
  * must change (or be left to AQE coalescing).
  */
object Engine {
  def session(
      appName: String = "graft",
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.GraftExtensions())
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** SQL entry point over the fixture catalog — the analogue of the
    * reference's JDBC prepare chain (parse → validate → optimize → execute,
    * reference: prepare/CalcitePrepareImpl.java:467). Spark's ANTLR parser,
    * Analyzer, Catalyst and codegen play the roles of JavaCC, SqlValidatorImpl,
    * Volcano/Hep and Janino linq4j codegen respectively (SURVEY.md §3).
    */
  def sql(spark: SparkSession, sfDir: String, query: String): DataFrame = {
    if (streaming.StreamSql.isStreamQuery(query))
      return streaming.StreamSql.sql(spark, sfDir, query)
    Tables.registerAll(spark, sfDir)
    functions.GraftExtensions.register(spark)
    spark.sql(query)
  }

  /** Streaming SQL entry point: `SELECT STREAM ...` (the reference's
    * STREAM keyword, rel/stream/Delta.java) → unbounded DataFrame. */
  def sqlStream(spark: SparkSession, sfDir: String, query: String): DataFrame =
    streaming.StreamSql.sql(spark, sfDir, query)
}

/** Catalog of the driver-generated parquet fixture tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scan one table. Parquet → columnar read with predicate pushdown and
    * column pruning for free; this is the moral equivalent of the reference's
    * ProjectableFilterableTable (schema/ProjectableFilterableTable.java:36)
    * done by the format, not the engine.
    *
    * `events.ts` is TIMESTAMP(NANOS) in the fixture parquet, which Spark's
    * TimestampType (µs) cannot represent: we read nanos as long and
    * floor-divide to µs — exactly the truncation DuckDB 1.x applies when it
    * reads the same file, so oracle comparisons stay value-identical. The
    * full-precision nanos stay available as `ts_ns`.
    */
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts_ns div 1000")))
        .select("event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns")
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    names.foreach(n => t(spark, sfDir, n).createOrReplaceTempView(n))
    // the RAW events file (nanos-as-long ts) under its own name: the
    // `events` view above is a transformed projection of this relation,
    // so SQL regenerated from a plan (plans.RelToSql) must reference the
    // raw table its scan actually reads, not the view
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet").createOrReplaceTempView("events_raw")
  }
}
