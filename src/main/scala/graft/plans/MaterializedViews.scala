package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite — the exact-match subset of the reference's
  * substitution machinery
  * (reference: core/src/main/java/org/apache/calcite/plan/SubstitutionVisitor.java:120
  * and MaterializedViewSubstitutionVisitor.java:26 — unify a query subtree
  * with a materialization's definition and replace it with a scan of the
  * stored tile; registration via materialize/MaterializationService.java).
  *
  * Scope: EXACT plan-shape match (canonicalized logical-plan equality).
  * The reference additionally unifies through residual filters/projects —
  * that generalization is future work; the exact match already converts a
  * full fact-table scan+aggregate into a tile read, which at 100 TB is the
  * difference between touching the corpus and touching kilobytes.
  *
  * Mechanics: the rewrite keeps the ORIGINAL output attribute ids by
  * wrapping the tile scan in a Project of aliases with the replaced
  * subtree's exprIds — references above the substitution stay valid.
  * Installed through `spark.experimental.extraOptimizations` (Catalyst's
  * public optimizer extension point).
  */
object MaterializedViews {

  private case class Entry(name: String, canonical: LogicalPlan, path: String)
  private val registry = mutable.ArrayBuffer[Entry]()

  /** Define + materialize a view: stores the result as parquet and
    * registers the definition for rewriting. */
  def create(spark: SparkSession, name: String, definition: DataFrame, path: String): Unit = {
    definition.write.mode("overwrite").parquet(path)
    // register the OPTIMIZED canonical form: extraOptimizations runs after
    // the main optimizer batches, so incoming subtrees are already pruned/
    // collapsed — the match must be against the same normal form
    registry += Entry(name, definition.queryExecution.optimizedPlan.canonicalized, path)
  }

  def drop(name: String): Unit =
    registry.filterInPlace(_.name != name)

  def clear(): Unit = registry.clear()

  /** The rewrite rule; idempotent to install once per session. */
  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case sub if registry.nonEmpty =>
        registry.find(_.canonical == sub.canonicalized) match {
          case Some(entry) =>
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            // rebind: tile columns take over the replaced subtree's exprIds
            Project(sub.output.zip(scan.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, scan)
          case None => sub
        }
    }
  }

  /** Install the rewrite into the session's optimizer (once). */
  def install(spark: SparkSession): Unit = {
    val already = spark.experimental.extraOptimizations.exists(_.isInstanceOf[Rewrite])
    if (!already)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new Rewrite(spark)
  }
}
