package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the operator-coverage registry from the per-area modules:
  * queries() is the operator inventory of SURVEY.md §2 re-expressed
  * Spark-first; oracleSql() carries the DuckDB-equivalent ANSI SQL for the
  * hash-exact correctness gate.
  */
object SparkEntry {
  /** All operator definitions, in registration order. */
  def allDefs: Seq[QDef] =
    operators.Relational.defs ++ operators.Functions.defs ++
      operators.Recursive.defs ++ operators.AsOf.defs ++
      operators.MatchRecognize.defs ++ operators.Extras.defs ++
      operators.JsonModes.defs ++
      operators.Tpch.defs ++ operators.Tpcds.defs ++
      operators.FoodMart.defs ++
      operators.RefDisabled.defs ++
      operators.Geo.defs ++ operators.SchemaOnRead.defs ++
      operators.Periods.defs ++ operators.Sequences.defs ++
      operators.TableModify.defs ++
      plans.Profiler.defs ++ plans.RelToSqlDemo.defs ++
      plans.MvRewriteDemo.defs ++
      plans.ColumnOrigins.defs ++ plans.SqlAdvisor.defs ++
      plans.PlanMetadata.defs ++
      pipeline.Dedup.defs ++ pipeline.Similarity.defs ++
      pipeline.TextAnalysis.defs ++ pipeline.Multimodal.defs ++
      pipeline.Packing.defs ++
      streaming.StreamOps.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allDefs.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
