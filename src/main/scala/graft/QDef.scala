package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator-coverage query: a Spark-side implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle that must hash-match.
  *
  * Mirrors the reference's quidem golden-test pattern
  * (reference: core/src/test/resources/sql/agg.iq:18-49 — SQL + expected
  * table), with DuckDB instead of committed expected output.
  *
  * Determinism contract for oracle-bearing queries:
  *   - double aggregations are computed as DECIMAL sums (order-independent,
  *     identical in Spark and DuckDB) and cast back to double;
  *   - window/running sums fix a total order with a unique tiebreaker;
  *   - decimal scale is chosen so (integer digits + scale) < 15, keeping
  *     double→decimal rounding identical across both engines.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, Some(oracle.stripMargin.trim))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QDef =
    QDef(name, fn, None)
  /** One SQL text valid in both Spark SQL and DuckDB: runs through
    * Engine.sql (our parse→validate→optimize→execute entry, the analogue of
    * the reference's JDBC prepare) and doubles as its own oracle. */
  def common(name: String, text: String): QDef = {
    val sqlText = text.stripMargin.trim
    QDef(name, (s, dir) => Engine.sql(s, dir, sqlText), Some(sqlText))
  }
}
