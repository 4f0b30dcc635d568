package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `SELECT STREAM` front end — the reference's streaming SQL surface.
  *
  * In the reference, the STREAM keyword wraps the query's source in a
  * Delta operator (reference: rel/stream/Delta.java:38) which the eight
  * StreamRules push down to the table (rel/stream/StreamRules.java:70-292)
  * until it lands on `StreamableTable.stream()`
  * (schema/StreamableTable.java:26); validation rejects STREAM over a
  * table that is not streamable ("Cannot convert table to stream").
  *
  * Spark mapping: the delta of a table IS `spark.readStream` over the same
  * source (SURVEY.md §2.7), so `SELECT STREAM <rest>` parses `<rest>`
  * against a catalog where every streamable table resolves to its
  * readStream twin and everything else stays a batch view (stream-to-table
  * joins fall out of Structured Streaming's stream-static join). The
  * pushdown rules need no re-implementation — Catalyst's incremental
  * planner plays StreamRules' role.
  */
object StreamSql {

  private val Shell = """(?is)^\s*SELECT\s+STREAM\b(.*)""".r

  /** Tables with a streaming twin (the fixture's StreamableTable set). */
  val streamable: Set[String] = Set("events")

  def isStreamQuery(text: String): Boolean = Shell.pattern.matcher(text).matches()

  /** Parse and analyze a `SELECT STREAM` query into an unbounded
    * DataFrame. Throws (mirroring the reference's validator error) when
    * the FROM clause holds no streamable table. */
  def sql(spark: SparkSession, sfDir: String, text: String): DataFrame =
    text match {
      case Shell(rest) =>
        // batch views first (dimension sides of stream-table joins) ...
        Tables.registerAll(spark, sfDir)
        // ... then the streaming twins shadow the streamable tables
        StreamOps.readEventsStream(spark, sfDir).createOrReplaceTempView("events")
        val df =
          try spark.sql("SELECT " + rest)
          finally {
            // restore the batch view; the analyzed plan above already
            // resolved against the streaming twin
            Tables.t(spark, sfDir, "events").createOrReplaceTempView("events")
          }
        if (!df.isStreaming)
          throw new IllegalArgumentException(
            "SELECT STREAM requires a streamable table in FROM " +
              s"(streamable: ${streamable.mkString(", ")}) — the reference " +
              "rejects this as 'Cannot convert table to stream'")
        df
      case _ =>
        throw new IllegalArgumentException("not a SELECT STREAM query")
    }
}
