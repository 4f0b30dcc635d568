package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL:2011 `FOR SYSTEM_TIME AS OF` over system-versioned tables —
  * the reference's temporal table surface (reference: sql/SqlSnapshot.java,
  * rel/core/Snapshot.java:47; parsed by Parser.jj tableRef3). Spark's own
  * grammar accepts the clause only for time-travel datasources; this
  * front end lowers it for any relation carrying the SCD2 period columns
  * `valid_from` / `valid_to` (exactly what [[graft.operators.TableModify]]'s
  * SCD2 merge writes): the version valid AT t is
  * `valid_from <= t AND (valid_to IS NULL OR valid_to > t)` — a plain
  * filter Catalyst pushes into the scan, so a snapshot query costs one
  * pruned scan at any scale. Tables without the period columns fall
  * through to the delegate (Spark's own time-travel handling / error).
  */
object SystemTimeSql {

  private val Re =
    """(?is)\b([A-Za-z_][A-Za-z_0-9]*)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+(TIMESTAMP\s*'[^']+')""".r

  private def versioned(spark: SparkSession, table: String): Boolean =
    try {
      val cols = spark.table(table).columns.toSet
      cols.contains("valid_from") && cols.contains("valid_to")
    } catch { case _: Throwable => false }

  /** Rewrite every `t FOR SYSTEM_TIME AS OF ts` over a versioned table
    * into the filtered subquery, then delegate-parse the rewritten text.
    * None when nothing rewrites (not our statement). */
  def tryParse(spark: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = {
    var any = false
    val rewritten = Re.replaceAllIn(sqlText, m => {
      val (table, ts) = (m.group(1), m.group(2))
      if (versioned(spark, table)) {
        any = true
        scala.util.matching.Regex.quoteReplacement(
          s"(SELECT * FROM $table WHERE valid_from <= $ts" +
            s" AND (valid_to IS NULL OR valid_to > $ts)) $table")
      } else m.matched
    })
    if (any) Some(delegate.parsePlan(rewritten)) else None
  }
}
