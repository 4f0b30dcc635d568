package graft.plans

import graft.{QDef, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Column-origin (lineage) metadata over analyzed Catalyst plans — the
  * reference's RelMdColumnOrigins handler
  * (reference: core/src/main/java/org/apache/calcite/rel/metadata/
  * RelMdColumnOrigins.java + RelColumnOrigin.java: each output column maps
  * to the SET of base-table columns it descends from, with an isDerived
  * flag that is false only for a straight copy/rename and true the moment
  * any function, aggregate, generator, or window sits between).
  *
  * The governance workhorse at warehouse scale: which physical columns
  * feed a report column, which tables a masking policy must follow, what
  * a schema change breaks. Spark exposes no public equivalent, so this
  * walks the ANALYZED logical plan (pre-optimization — origins are a
  * property of what the user asked, not of what the optimizer collapsed)
  * resolving attributes structurally by ExprId:
  *
  *   - Project / Aggregate: alias-of-attribute keeps the derived flag
  *     (a rename is not a derivation — RelMdColumnOrigins.java:140's
  *     RexInputRef case); any other defining expression marks every
  *     referenced origin derived (its :188 default case). Aggregate calls
  *     are expressions, so SUM(x) yields a derived origin on x and
  *     COUNT(*) yields the empty set — "no origins", the reference's
  *     contract for constants.
  *   - Union: the output column at ordinal i descends from EVERY branch's
  *     column i (the reference's set-op handler unions branch origins).
  *   - Generate (UDTF/explode): generator outputs are derived from the
  *     generator's inputs.
  *   - Leaves: file relations are named by their root path stem (the
  *     fixture convention) or catalog identifier; Values/Range and
  *     object-boundary leaves (LogicalRDD from mapGroups/driver loops)
  *     have no base table, so contribute nothing — mirroring the
  *     reference's null return for non-table origins.
  *
  * Driver-side plan analysis, zero jobs — like EXPLAIN, this never touches
  * data, so "scale" is plan width, not table size.
  */
object ColumnOrigins {

  /** One base-table origin (reference: RelColumnOrigin.java —
    * originTable, originColumn, isDerived). */
  final case class Origin(table: String, column: String, derived: Boolean)

  /** Every output column of `df` mapped to its base-table origin set, in
    * output order. Empty set = no table origin (constant, count star,
    * object boundary). */
  def origins(df: DataFrame): Seq[(String, Set[Origin])] = {
    val plan = df.queryExecution.analyzed
    plan.output.map(a => a.name -> trace(plan, a.exprId, derived = false))
  }

  /** Lineage as a DataFrame (out_col, origin_table, origin_column,
    * derived) — one row per origin, output columns with no origin absent,
    * deterministic order. */
  def originsDf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    origins(df)
      .flatMap { case (out, os) =>
        os.toSeq.sortBy(o => (o.table, o.column))
          .map(o => (out, o.table, o.column, o.derived))
      }
      .toDF("out_col", "origin_table", "origin_column", "derived")
  }

  private[plans] def leafName(lr: LogicalRelation): String =
    lr.catalogTable.map(_.identifier.table).getOrElse {
      lr.relation match {
        case fs: HadoopFsRelation =>
          val stem = fs.location.rootPaths.headOption.map(_.getName).getOrElse("?")
          Seq(".parquet", ".csv", ".json", ".orc")
            .foldLeft(stem)((s, ext) => s.stripSuffix(ext))
        case _ => "?"
      }
    }

  private def trace(plan: LogicalPlan, id: ExprId, derived: Boolean): Set[Origin] =
    plan match {
      case lr: LogicalRelation =>
        lr.output.find(_.exprId == id)
          .map(a => Set(Origin(leafName(lr), a.name, derived)))
          .getOrElse(Set.empty)
      case p: Project =>
        p.projectList.find(_.exprId == id) match {
          case Some(a: Attribute) => trace(p.child, a.exprId, derived)
          case Some(Alias(e, _)) => traceExpr(p.child, e, derived)
          case _ => traceChildren(p, id, derived)
        }
      case a: Aggregate =>
        a.aggregateExpressions.find(_.exprId == id) match {
          case Some(attr: Attribute) => trace(a.child, attr.exprId, derived)
          case Some(Alias(e, _)) => traceExpr(a.child, e, derived)
          case _ => traceChildren(a, id, derived)
        }
      case w: Window =>
        w.windowExpressions.find(_.exprId == id) match {
          case Some(attr: Attribute) => trace(w.child, attr.exprId, derived)
          case Some(Alias(e, _)) => traceExpr(w.child, e, derived = true)
          case _ => trace(w.child, id, derived)
        }
      case u: Union =>
        val idx = u.output.indexWhere(_.exprId == id)
        if (idx < 0) Set.empty
        else u.children.flatMap(c => trace(c, c.output(idx).exprId, derived)).toSet
      case g: Generate =>
        if (g.generatorOutput.exists(_.exprId == id))
          traceExpr(g.child, g.generator, derived = true)
        else trace(g.child, id, derived)
      case sa: SubqueryAlias => trace(sa.child, id, derived)
      case _: LocalRelation | _: Range | _: OneRowRelation => Set.empty
      case other => traceChildren(other, id, derived)
    }

  /** Pass-through nodes (Filter, Join, Sort, Limit, set ops resolving to
    * the left child, Distinct, ...): recurse into every child that
    * actually outputs the attribute; none ⇒ unknown leaf ⇒ no origins. */
  private def traceChildren(plan: LogicalPlan, id: ExprId, derived: Boolean): Set[Origin] = {
    val owners = plan.children.filter(_.output.exists(_.exprId == id))
    owners.flatMap(c => trace(c, id, derived)).toSet
  }

  /** A defining expression: a bare attribute is a copy (flag unchanged);
    * anything else derives from every attribute it references. */
  private def traceExpr(child: LogicalPlan, e: Expression, derived: Boolean): Set[Origin] =
    e match {
      case a: Attribute => trace(child, a.exprId, derived)
      case _ =>
        e.references.toSeq.flatMap(a => trace(child, a.exprId, derived = true)).toSet
    }

  val defs: Seq[QDef] = Seq(
    // Lineage of the rel2sql demo plan (scan→filter→join→agg→cast→sort):
    // n_name is a straight copy from nation, avg_src derives from
    // customer.c_acctbal through SUM+CAST, and n_cust (COUNT(*)) has no
    // origins so contributes no rows. The oracle pins the expected
    // lineage literally — the same fixed-expectation shape as the
    // reference's RelMetadataTest.testColumnOriginsAggregate.
    QDef.sql("profile_column_origins",
      """SELECT * FROM (VALUES
        |  ('avg_src', 'customer', 'c_acctbal', true),
        |  ('n_name', 'nation', 'n_name', false))
        |  AS t(out_col, origin_table, origin_column, derived)""") { (s, dir) =>
      originsDf(RelToSqlDemo.demoPlan(s, dir))
    }
  )
}
