package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** TableModify — INSERT / UPDATE / DELETE / MERGE
  * (reference: core/src/main/java/org/apache/calcite/rel/core/TableModify.java:54,
  * Operation enum :60; physical EnumerableTableModify; sinks via
  * ModifiableTable, schema/ModifiableTable.java).
  *
  * Plain parquet has no row-level mutation, so updates/deletes/merges are
  * copy-on-write: read → transform → swap (write to a fresh directory,
  * then promote). That is the mechanism table formats (Delta/Iceberg CoW)
  * use underneath; here it is explicit and self-contained. All transforms
  * are distributed DataFrame plans — the rewrite scales with cluster size;
  * only the directory promotion is a driver-side step. NOTE the promotion
  * is two renames, not one atomic operation: the old data survives at
  * `target__old` until the staged directory is promoted, so a crash
  * between the renames is recoverable (restore `__old`), but readers can
  * observe a missing directory in that window. A production deployment
  * gets true atomicity from a metastore/table-format pointer swap.
  */
object TableModify {

  private def swapIn(spark: SparkSession, staged: String, target: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val t = new org.apache.hadoop.fs.Path(target)
    val tmpOld = new org.apache.hadoop.fs.Path(target + "__old")
    if (fs.exists(t)) fs.rename(t, tmpOld)
    fs.rename(new org.apache.hadoop.fs.Path(staged), t)
    if (fs.exists(tmpOld)) fs.delete(tmpOld, true)
    // any materialized tile built over this table is now STALE: it stops
    // answering queries until REFRESH MATERIALIZED VIEW re-materializes it
    // (the reference's MaterializationService validity lifecycle)
    graft.plans.MaterializedViews.invalidate(spark, target)
  }

  /** INSERT INTO target VALUES/SELECT — append semantics. */
  def insertInto(rows: DataFrame, targetDir: String): Unit = {
    rows.write.mode(SaveMode.Append).parquet(targetDir)
    graft.plans.MaterializedViews.invalidate(rows.sparkSession, targetDir)
  }

  /** DELETE FROM target WHERE cond — copy-on-write anti-filter.
    * SQL DELETE removes only rows where the predicate is TRUE; rows where
    * it evaluates to NULL are retained, hence NOT coalesce(cond, false)
    * rather than a bare !cond (which would drop NULL-predicate rows). */
  def delete(spark: SparkSession, targetDir: String, cond: Column): Unit = {
    val staged = targetDir + "__staged"
    spark.read.parquet(targetDir).where(!coalesce(cond, lit(false)))
      .write.mode(SaveMode.Overwrite).parquet(staged)
    swapIn(spark, staged, targetDir)
  }

  /** UPDATE target SET assignments WHERE cond — copy-on-write projection. */
  def update(spark: SparkSession, targetDir: String, cond: Column,
      assignments: Map[String, Column]): Unit = {
    val df = spark.read.parquet(targetDir)
    val updated = df.columns.foldLeft(df) { (acc, c) =>
      assignments.get(c) match {
        case Some(expr) => acc.withColumn(c, when(cond, expr).otherwise(col(c)))
        case None => acc
      }
    }
    val staged = targetDir + "__staged"
    updated.write.mode(SaveMode.Overwrite).parquet(staged)
    swapIn(spark, staged, targetDir)
  }

  /** SCD Type-2 MERGE — the history-preserving upsert behind
    * FOR SYSTEM_TIME AS OF serving (pairs with the Snapshot operator;
    * reference: schema/TemporalTable.java + TableModify MERGE semantics).
    * The target carries (key, compareCols..., valid_from, valid_to) with
    * `valid_to IS NULL` marking the current version. For each source row:
    * a changed current version is CLOSED (valid_to := source ts) and a new
    * open version inserted; an unchanged match is left alone; a new key is
    * inserted open. One left join per side over the key — no per-row
    * driver work, CoW-rewritten like update/delete. */
  def scd2Merge(spark: SparkSession, targetDir: String, source: DataFrame,
      key: String, compareCols: Seq[String], tsCol: String): Unit = {
    val target = spark.read.parquet(targetDir)
    val changed = compareCols
      .map(c => !(col(s"t.$c") <=> col(s"s.$c"))).reduce(_ || _)
    // one row per key: a batch carrying several updates for the same key
    // would fan out both joins (duplicated closed rows, several open
    // versions) — keep only the latest change per key, which is also the
    // end state SCD2 records for the batch
    val wLatest = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(tsCol).desc)
    val src = source
      .withColumn("__rn", row_number().over(wLatest))
      .where(col("__rn") === 1).drop("__rn")
      .alias("s")
    // close changed current versions
    val closed = target.alias("t")
      .join(src, col(s"t.$key") === col(s"s.$key") &&
        col("t.valid_to").isNull && changed, "left")
      .select(target.columns.map {
        case "valid_to" =>
          when(col(s"s.$key").isNotNull, col(s"s.$tsCol"))
            .otherwise(col("t.valid_to")).as("valid_to")
        case c => col(s"t.$c").as(c)
      }: _*)
    // open new versions for changed or brand-new keys
    val current = target.where(col("valid_to").isNull).alias("t")
    val opened = src
      .join(current, col(s"t.$key") === col(s"s.$key"), "left")
      .where(col(s"t.$key").isNull || changed)
      .select((key +: compareCols).map(c => col(s"s.$c").as(c)) ++
        Seq(col(s"s.$tsCol").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to")): _*)
    val staged = targetDir + "__staged"
    closed.unionByName(opened).write.mode(SaveMode.Overwrite).parquet(staged)
    swapIn(spark, staged, targetDir)
  }

  /** Compact a table directory to ~targetFileMB-sized files — the
    * maintenance pass every CoW table needs: repeated INSERT/UPDATE cycles
    * accumulate small files until scan task scheduling dominates runtime.
    * Sizing by actual on-disk bytes (not row counts) keeps the output
    * balanced regardless of row width. */
  def compact(spark: SparkSession, targetDir: String, targetFileMB: Int = 128): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(targetDir)).getLength
    val nFiles = math.max(1, (bytes / (targetFileMB * 1024L * 1024L)).toInt)
    val staged = targetDir + "__staged"
    spark.read.parquet(targetDir).repartition(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(staged)
    swapIn(spark, staged, targetDir)
  }

  /** MERGE INTO target USING source ON key:
    * matched → update assignments; not matched → insert source row.
    * One full-outer join over the key — the scalable CoW merge plan. */
  def merge(spark: SparkSession, targetDir: String, source: DataFrame,
      key: String, updateAssignments: Map[String, Column]): Unit = {
    val target = spark.read.parquet(targetDir).alias("t")
    val src = source.alias("s")
    val joined = target.join(src, col(s"t.$key") === col(s"s.$key"), "full")
    val merged = joined.select(target.columns.map { c =>
      val tCol = col(s"t.$c"); val sCol = col(s"s.$c")
      val matchedValue = updateAssignments.getOrElse(c, tCol)
      when(col(s"s.$key").isNotNull && col(s"t.$key").isNotNull, matchedValue) // matched
        .when(col(s"t.$key").isNull, sCol)                                     // insert
        .otherwise(tCol)                                                       // keep
        .as(c)
    }: _*)
    val staged = targetDir + "__staged"
    merged.write.mode(SaveMode.Overwrite).parquet(staged)
    swapIn(spark, staged, targetDir)
  }

  /** The full DML lifecycle as an ORACLE-VERIFIED query: copy the nation
    * fixture to a scratch table, DELETE a key slice, UPDATE a region's
    * names, MERGE a shifted-key source (matched rows marked, unmatched
    * inserted), and return the final table. Every invocation rebuilds
    * from the fixture, so the result is a pure function of the input —
    * the DuckDB oracle replays the identical algebra (delete = filter,
    * update = projection, merge = left-join CASE + anti-join insert). */
  val defs: Seq[graft.QDef] = Seq(
    // CREATE TYPE + column-list CTAS through the SQL front end — the
    // server DDL surface the TableDdlSql layer supplies (reference:
    // server/src/test/resources/sql/type.iq:24-50, table_as.iq:238-249).
    // The typed column list CASTs positionally; the custom type resolves
    // through the session type registry. Idempotent across bench reps:
    // the table is dropped and re-created each run.
    graft.QDef.sql("ddl_ctas_typed",
      """SELECT CAST(n_nationkey AS INTEGER) AS k, CAST(n_name AS VARCHAR(25)) AS nm
        |FROM nation WHERE n_regionkey = 1 ORDER BY k""") { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql("DROP TABLE IF EXISTS ddl_ctas_t")
      s.sql("CREATE TYPE ddl_name_t AS varchar(25)")
      s.sql("""CREATE TABLE ddl_ctas_t (k int, nm ddl_name_t) AS
              |SELECT n_nationkey, n_name FROM nation WHERE n_regionkey = 1""".stripMargin)
      s.sql("SELECT k, nm FROM ddl_ctas_t ORDER BY k")
    },

    // DEFAULT-expression and VIRTUAL generated columns end-to-end
    // (reference: server/src/test/resources/sql/table.iq:62-131 — the
    // DEFAULT may reference other inserted columns; the VIRTUAL column
    // is computed in the read projection, never stored). The oracle
    // replays the completion algebra: rows inserted without the DEFAULT
    // column take n_regionkey + 2, and the virtual column is the
    // declared expression over the stored ones.
    graft.QDef.sql("ddl_default_virtual",
      """SELECT n_nationkey AS k,
        |  CASE WHEN n_nationkey % 2 = 0 THEN CAST(n_regionkey AS INTEGER)
        |       ELSE CAST(n_nationkey + 2 AS INTEGER) END AS d,
        |  CAST(n_nationkey * 10 + (CASE WHEN n_nationkey % 2 = 0
        |       THEN n_regionkey ELSE n_nationkey + 2 END) AS INTEGER) AS v
        |FROM nation ORDER BY k""") { (s, dir) =>
      graft.Tables.registerAll(s, dir)
      s.sql("DROP TABLE IF EXISTS ddl_dv_t")
      s.sql("""CREATE TABLE ddl_dv_t (k int, d int DEFAULT k + 2,
              |v int AS (k * 10 + d) VIRTUAL)""".stripMargin)
      // even keys provide d explicitly; odd keys take the DEFAULT — which
      // references the other inserted column, table.iq's `i + 2` shape
      s.sql("""INSERT INTO ddl_dv_t (k, d)
              |SELECT n_nationkey, n_regionkey FROM nation
              |WHERE n_nationkey % 2 = 0""".stripMargin)
      s.sql("""INSERT INTO ddl_dv_t (k)
              |SELECT n_nationkey FROM nation WHERE n_nationkey % 2 = 1""".stripMargin)
      s.sql("SELECT k, d, v FROM ddl_dv_t ORDER BY k")
    },

    graft.QDef.sql("modify_lifecycle",
      """WITH del AS (SELECT * FROM nation WHERE n_nationkey % 7 <> 3),
        |upd AS (SELECT n_nationkey,
        |  CASE WHEN n_regionkey = 2 THEN n_name || '_U' ELSE n_name END AS n_name,
        |  n_regionkey FROM del),
        |src AS (SELECT n_nationkey * 2 AS n_nationkey, 'SRC_' || n_name AS n_name,
        |  n_regionkey FROM nation WHERE n_nationkey BETWEEN 8 AND 15),
        |matched AS (
        |  SELECT t.n_nationkey,
        |    CASE WHEN s.n_nationkey IS NOT NULL THEN 'MERGED' ELSE t.n_name END AS n_name,
        |    t.n_regionkey
        |  FROM upd t LEFT JOIN src s ON t.n_nationkey = s.n_nationkey),
        |ins AS (
        |  SELECT s.n_nationkey, s.n_name, s.n_regionkey
        |  FROM src s LEFT JOIN upd t ON s.n_nationkey = t.n_nationkey
        |  WHERE t.n_nationkey IS NULL)
        |SELECT * FROM matched UNION ALL SELECT * FROM ins""") { (s, dir) =>
      import org.apache.spark.sql.functions.{col, concat, lit, upper => _}
      val work = "/tmp/graft_modify/lifecycle_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val nation = graft.Tables.t(s, dir, "nation")
      nation.write.mode(SaveMode.Overwrite).parquet(work)
      delete(s, work, col("n_nationkey") % 7 === 3)
      update(s, work, col("n_regionkey") === 2,
        Map("n_name" -> concat(col("n_name"), lit("_U"))))
      val src = nation.where(col("n_nationkey").between(8, 15))
        .select((col("n_nationkey") * 2).as("n_nationkey"),
          concat(lit("SRC_"), col("n_name")).as("n_name"),
          col("n_regionkey"))
      merge(s, work, src, "n_nationkey", Map("n_name" -> lit("MERGED")))
      s.read.parquet(work)
    },

    // SCD2 as an oracle query: day-1 history seeded from customer,
    // a day-2 batch that changes every third key and introduces fifty
    // new ones; changed current versions CLOSE (valid_to := batch ts),
    // changed/new keys OPEN a fresh version. The DuckDB oracle replays
    // the close (left-join CASE) and open (anti/changed filter) algebra.
    graft.QDef.sql("modify_scd2",
      """WITH t0 AS (
        |  SELECT c_custkey AS id, c_mktsegment AS tier,
        |    TIMESTAMP '1995-01-01 00:00:00' AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM customer WHERE c_custkey < 100),
        |s AS (
        |  SELECT c_custkey AS id,
        |    CASE WHEN c_custkey % 3 = 0 THEN 'CHANGED' ELSE c_mktsegment END AS tier,
        |    TIMESTAMP '1996-06-01 00:00:00' AS ts
        |  FROM customer WHERE c_custkey BETWEEN 50 AND 149),
        |closed AS (
        |  SELECT t0.id, t0.tier, t0.valid_from,
        |    CASE WHEN s.id IS NOT NULL AND s.tier <> t0.tier
        |         THEN s.ts ELSE t0.valid_to END AS valid_to
        |  FROM t0 LEFT JOIN s ON t0.id = s.id),
        |opened AS (
        |  SELECT s.id, s.tier, s.ts AS valid_from,
        |    CAST(NULL AS TIMESTAMP) AS valid_to
        |  FROM s LEFT JOIN t0 ON s.id = t0.id
        |  WHERE t0.id IS NULL OR s.tier <> t0.tier)
        |SELECT * FROM closed UNION ALL SELECT * FROM opened""") { (s, dir) =>
      import org.apache.spark.sql.functions.{col, lit, when}
      val work = "/tmp/graft_modify/scd2_" +
        dir.replaceAll("[^A-Za-z0-9]", "_")
      val cust = graft.Tables.t(s, dir, "customer")
      cust.where(col("c_custkey") < 100)
        .select(col("c_custkey").as("id"), col("c_mktsegment").as("tier"),
          lit("1995-01-01 00:00:00").cast("timestamp").as("valid_from"),
          lit(null).cast("timestamp").as("valid_to"))
        .write.mode(SaveMode.Overwrite).parquet(work)
      val src = cust.where(col("c_custkey").between(50, 149))
        .select(col("c_custkey").as("id"),
          when(col("c_custkey") % 3 === 0, lit("CHANGED"))
            .otherwise(col("c_mktsegment")).as("tier"),
          lit("1996-06-01 00:00:00").cast("timestamp").as("ts"))
      scd2Merge(s, work, src, "id", Seq("tier"), "ts")
      s.read.parquet(work)
    })
}
