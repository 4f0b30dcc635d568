package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.{StructField, StructType}

/** The `FROM t EXTEND (col type, ...)` clause — schema-on-query, the
  * Drill fork's headline capability surfaced in SQL
  * (reference: core/src/main/codegen/templates/Parser.jj:1366 `[<EXTEND>]`
  * in TableRef → SqlStdOperatorTable.EXTEND; lowered through
  * schema/ExtensibleTable.java:39 `extend(fields)` — "there may exist
  * columns that have values in the table but which are not declared in
  * the table schema; a particular query may wish to reference these
  * columns as if they were defined"; the fork's validator tolerance at
  * tools/RelBuilder.java:2220, SURVEY §1.3-1.4).
  *
  * Spark-first lowering = the schema-merge read SURVEY §1.4 maps
  * ExtensibleTable to: when the table resolves to a file scan, the SAME
  * files are re-read with the extended row type appended — columns that
  * exist in storage but not in the declared schema surface with their
  * REAL values (Parquet's reader binds by name), and columns absent from
  * storage read as typed NULLs, exactly Drill's late-schema behavior.
  * A non-scan relation (view over joins, object boundary) extends with
  * typed NULL projections — the declared-type contract still holds.
  * The clause rewrites to a scoped temp view so the RESTRICTED form
  * composes with the full SQL surface around it (one EXTEND per
  * statement, like the other injected-grammar forms).
  *
  * At 100 TB this is free: the extended scan is the same pruned columnar
  * scan with extra (possibly all-null) columns bound by name — no copy,
  * no shuffle, no schema migration.
  */
object ExtendSql {

  private val Re =
    """(?is)^(.*?\bFROM\s+)([A-Za-z_][A-Za-z0-9_]*)\s+EXTEND\s*\(([^)]*)\)(.*)$""".r

  private val ColRe = """(?is)^\s*([A-Za-z_][A-Za-z0-9_]*)\s+(.+?)\s*$""".r

  def tryParse(spark: SparkSession, delegate: ParserInterface,
      sqlText: String): Option[LogicalPlan] = sqlText match {
    case Re(pre, table, colsText, post) =>
      val parsed = colsText.split(",").toSeq.map {
        case ColRe(name, tpe) =>
          try Some(StructField(name, delegate.parseDataType(tpe)))
          catch { case _: Exception => None }
        case _ => None
      }
      if (parsed.exists(_.isEmpty)) None
      else {
        val base =
          try spark.table(table)
          catch { case _: Exception =>
            throw new IllegalArgumentException(s"Table '$table' not found") }
        val extended = extend(spark, base, parsed.flatten)
        val view = s"${table}_extend_${math.abs(sqlText.hashCode)}"
        extended.createOrReplaceTempView(view)
        SqlAdvisor.invalidate(spark)
        Some(delegate.parsePlan(pre + view + post))
      }
    case _ => None
  }

  /** ExtensibleTable.extend: the base relation with `fields` appended to
    * its row type. File scans re-read storage under the merged schema
    * (real values when the file has the column); everything else gets
    * typed NULLs. Fields already declared with the SAME type are left
    * untouched; redeclaring at a DIFFERENT type rejects, as does naming
    * the same extended column twice (reference: SqlValidatorTest
    * testSelectExtendedColumnDuplicate "Duplicate name in column list",
    * testSelectExtendedColumnFailCollision "Cannot assign to target
    * field"; the reference's nullability-only collisions are declaration-
    * weak here — the standing NOT NULL rule). */
  def extend(spark: SparkSession, base: DataFrame,
      fields: Seq[StructField]): DataFrame = {
    fields.groupBy(_.name.toLowerCase).collectFirst {
      case (_, fs) if fs.size > 1 => fs.head.name
    }.foreach { dup =>
      throw new IllegalArgumentException(
        s"Duplicate name '${dup.toUpperCase}' in column list")
    }
    fields.foreach { f =>
      base.schema.fields.find(_.name.equalsIgnoreCase(f.name)).foreach { d =>
        if (d.dataType != f.dataType)
          throw new IllegalArgumentException(
            s"Cannot assign to target field '${f.name.toUpperCase}' of type " +
              s"${d.dataType.sql} from source field '${f.name.toUpperCase}' " +
              s"of type ${f.dataType.sql}")
      }
    }
    val fresh = fields.filterNot(f =>
      base.schema.fieldNames.exists(_.equalsIgnoreCase(f.name)))
    if (fresh.isEmpty) base
    else scanOf(base) match {
      case Some((paths, format)) =>
        val merged = StructType(base.schema.fields ++ fresh)
        spark.read.schema(merged).format(format).load(paths: _*)
      case None =>
        base.select(col("*") +: fresh.map(f =>
          lit(null).cast(f.dataType).as(f.name)): _*)
    }
  }

  /** The (paths, format) of a BARE file scan — a plan that is just the
    * relation (a registered base table), not a derived view. */
  private def scanOf(base: DataFrame): Option[(Seq[String], String)] = {
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case sa: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => strip(sa.child)
      case v: org.apache.spark.sql.catalyst.plans.logical.View => strip(v.child)
      case other => other
    }
    strip(base.queryExecution.analyzed) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          val fmt = fs.fileFormat.toString.toLowerCase match {
            case s if s.contains("parquet") => "parquet"
            case s if s.contains("orc") => "orc"
            case s if s.contains("csv") => "csv"
            case s if s.contains("json") => "json"
            case _ => return None
          }
          Some((fs.location.rootPaths.map(_.toString), fmt))
        case _ => None
      }
      case _ => None
    }
  }
}
