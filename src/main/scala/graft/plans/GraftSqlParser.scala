package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating SQL parser — the `SparkSessionExtensions.injectParser` hook.
  * Recognizes the restricted MATCH_RECOGNIZE form (see
  * [[MatchRecognizeSql]]), CREATE/DROP MATERIALIZED VIEW DDL (see
  * [[MaterializedViewSql]]), `FOR SYSTEM_TIME AS OF` over
  * system-versioned tables (see [[SystemTimeSql]]), sequence DDL +
  * NEXT/CURRENT VALUE FOR (see [[SequenceSql]]), CREATE TABLE with
  * DEFAULT-expression / VIRTUAL generated columns (see [[TableDdlSql]]),
  * and the `FROM t EXTEND (...)` schema-on-query clause (see
  * [[ExtendSql]]) and lowers them onto the native operators;
  * every other statement goes to Spark's own parser verbatim. This mirrors
  * how the reference extends its grammar
  * (reference: core/src/main/codegen/templates/Parser.jj MatchRecognizeOpt;
  * sql/SqlMatchRecognize.java:35; server/.../SqlCreateMaterializedView.java)
  * — a parser-level capability, not a rewrite of the engine.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    MaterializedViewSql.tryParse(spark, delegate, sqlText)
      .orElse(MatchRecognizeSql.tryParse(spark, sqlText))
      .orElse(MatchRecognizeSql.tryParseEmbedded(spark, delegate, sqlText))
      .orElse(SystemTimeSql.tryParse(spark, delegate, sqlText))
      .orElse(SequenceSql.tryParse(spark, delegate, sqlText))
      .orElse(TableDdlSql.tryParse(spark, delegate, sqlText))
      .orElse(ExtendSql.tryParse(spark, delegate, sqlText))
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    MaterializedViewSql.tryParse(spark, delegate, sqlText)
      .orElse(MatchRecognizeSql.tryParse(spark, sqlText))
      .orElse(MatchRecognizeSql.tryParseEmbedded(spark, delegate, sqlText))
      .orElse(SystemTimeSql.tryParse(spark, delegate, sqlText))
      .orElse(SequenceSql.tryParse(spark, delegate, sqlText))
      .orElse(TableDdlSql.tryParse(spark, delegate, sqlText))
      .orElse(ExtendSql.tryParse(spark, delegate, sqlText))
      .getOrElse(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
