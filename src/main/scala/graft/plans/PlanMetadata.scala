package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeSet, ExprId}
import org.apache.spark.sql.catalyst.plans.logical._

/** Plan-metadata queries beside [[ColumnOrigins]] — the rest of the
  * reference's RelMetadataQuery handler family mapped onto what Catalyst
  * already knows (reference: rel/metadata/RelMetadataQuery.java with
  * RelMdPredicates.java, RelMdRowCount.java, RelMdSize.java,
  * RelMdColumnUniqueness.java compiled by JaninoRelMetadataProvider):
  *
  *   - pulledUpPredicates → Catalyst's constraint propagation: every
  *     filter/join predicate (and the non-null facts they imply) that is
  *     GUARANTEED to hold on the output rows. The reference uses these
  *     for MV unification and redundant-filter elimination; Spark uses
  *     the same set for its own InferFiltersFromConstraints.
  *   - rowCount / sizeInBytes → plan statistics (CBO column stats when
  *     ANALYZE ran, size-based estimates otherwise — the
  *     schema/Statistic.java sourcing noted in SURVEY §4.3).
  *   - areColumnsUnique → structural key reasoning: grouping keys of an
  *     Aggregate are unique, Deduplicate keys are unique, supersets of a
  *     unique set stay unique, and uniqueness survives forwarding
  *     operators (Filter/Sort/Limit and renaming Projects). Anything the
  *     walk cannot prove returns false — the conservative answer, where
  *     the reference returns null for "unknown"
  *     (RelMdColumnUniqueness.java's default).
  *
  * All driver-side plan analysis: no jobs, no data read.
  */
object PlanMetadata {

  /** Predicates guaranteed true on every output row, rendered as SQL. */
  def pulledUpPredicates(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.constraints.toSeq.map(_.sql).sorted

  /** Estimated (or CBO-exact) output row count, when the plan knows one. */
  def rowCount(df: DataFrame): Option[BigInt] =
    df.queryExecution.optimizedPlan.stats.rowCount

  /** Estimated output size in bytes (RelMdSize analogue). */
  def sizeInBytes(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Are the named output columns unique (a key) for every result row?
    * False = could not prove, like the reference's null. */
  def areColumnsUnique(df: DataFrame, cols: Seq[String]): Boolean = {
    val plan = df.queryExecution.analyzed
    val ids = cols.flatMap(c => plan.output.find(_.name == c)).map(_.exprId)
    if (ids.size != cols.size) false
    else unique(plan, ids.toSet)
  }

  private def unique(plan: LogicalPlan, ids: Set[ExprId]): Boolean = plan match {
    case a: Aggregate =>
      // the grouping keys are a key of the output, and every SUPERSET of
      // a key is unique — so `ids` is unique iff each grouping expression
      // is an attribute surfacing (possibly via rename) under an id ∈ ids
      a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
        case at: Attribute =>
          a.aggregateExpressions.exists {
            case out: Attribute => out.exprId == at.exprId && ids.contains(out.exprId)
            case al @ Alias(at2: Attribute, _) =>
              at2.exprId == at.exprId && ids.contains(al.exprId)
            case _ => false
          }
        case _ => false
      }
    case d: Deduplicate =>
      d.keys.forall(k => ids.contains(k.exprId))
    case _: Distinct => true // all output columns together are unique
    case p: Project =>
      // map requested ids through renames; a non-trivial expression output
      // cannot carry uniqueness down
      val mapped: Set[Option[ExprId]] = ids.map { id =>
        p.projectList.find(_.exprId == id) match {
          case Some(at: Attribute) => Some(at.exprId)
          case Some(Alias(at: Attribute, _)) => Some(at.exprId)
          case Some(_) => None // non-trivial expression — unknown
          case None => Some(id)
        }
      }
      if (mapped.contains(None)) false
      else unique(p.child, mapped.flatten)
    case f: Filter => unique(f.child, ids)
    case s: Sort => unique(s.child, ids)
    case l: GlobalLimit => unique(l.child, ids)
    case l: LocalLimit => unique(l.child, ids)
    case sa: SubqueryAlias => unique(sa.child, ids)
    case r: RepartitionOperation => unique(r.child, ids)
    case _ => false // unknown — conservative
  }

  /** Registry wiring: the pulled-up predicate set of a filtered scan,
    * pinned against a VALUES oracle — the RelMetadataTest
    * getPulledUpPredicates fixed-expectation shape (constraint
    * propagation must keep yielding exactly the filter conjuncts plus
    * their implied non-null facts). */
  val defs: Seq[graft.QDef] = Seq(
    graft.QDef.sql("profile_plan_predicates",
      """SELECT * FROM (VALUES
        |  ('(l_quantity > 10.0D)'), ('(l_quantity IS NOT NULL)'),
        |  ('(l_returnflag = ''R'')'), ('(l_returnflag IS NOT NULL)'))
        |  AS t(predicate)""") { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val preds = pulledUpPredicates(
        graft.Tables.t(s, dir, "lineitem")
          .where(col("l_quantity") > 10 && col("l_returnflag") === "R"))
      import s.implicits._
      preds.toDF("predicate")
    })

  /** Referenced base columns per leaf table — the column set a pruned
    * scan must read (ReadSchema reasoning at plan level): every attribute
    * any operator above references, join keys and filter columns
    * included, not just the ones that survive to the output. */
  def referencedLeafColumns(df: DataFrame): Map[String, Set[String]] = {
    import org.apache.spark.sql.execution.datasources.LogicalRelation
    // the OPTIMIZED plan: analysis keeps analyzer-inserted full-width
    // Projects around joins; column pruning is what narrows each leaf to
    // the set actually read
    val plan = df.queryExecution.optimizedPlan
    // leaves self-list their output attributes as expressions — only
    // NON-leaf operators constitute a real reference
    val referenced: Set[ExprId] =
      plan.collectWithSubqueries { case n if n.children.nonEmpty =>
        n.expressions.flatMap(_.references.toSeq.map(_.exprId))
      }.flatten.toSet ++ plan.output.map(_.exprId)
    val perLeaf = plan.collectWithSubqueries { case lr: LogicalRelation =>
      ColumnOrigins.leafName(lr) ->
        lr.output.filter(a => referenced.contains(a.exprId)).map(_.name).toSet
    }
    perLeaf.groupBy(_._1).map { case (t, xs) => t -> xs.flatMap(_._2).toSet }
  }
}
