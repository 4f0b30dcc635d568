package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, Coalesce, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, Or, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite — the reference's substitution machinery
  * (reference: core/src/main/java/org/apache/calcite/plan/SubstitutionVisitor.java:120
  * and MaterializedViewSubstitutionVisitor.java:26 — unify a query subtree
  * with a materialization's definition and replace it with a scan of the
  * stored tile; registration via materialize/MaterializationService.java).
  *
  * Two unification levels:
  *  1. EXACT match — canonicalized logical-plan equality; the subtree is
  *     replaced by the tile scan.
  *  2. FILTER RESIDUAL — query `Filter(q, X)` unifies with a registered
  *     `Filter(m, X)` when m's conjuncts are a subset of q's: the query is
  *     answered by applying only the RESIDUAL conjuncts (q \ m) to the
  *     tile — the reference's FilterToFilterUnifyRule with a compensating
  *     predicate.
  *  3. AGGREGATE ROLLUP — query `Aggregate(Gq, Fq, X)` unifies with a
  *     registered `Aggregate(Gm, Fm, X)` when Gq ⊆ Gm and every Fq is a
  *     re-aggregable SUM/COUNT/MIN/MAX over the same argument as some Fm:
  *     the query is answered by RE-aggregating the tile
  *     (SUM→SUM, COUNT→SUM, MIN→MIN, MAX→MAX) — the reference's
  *     AggregateOnCalcToAggregateUnifyRule family. Residual filters and
  *     projections ABOVE the unified subtree need no special handling:
  *     the substitution keeps the original output exprIds, so enclosing
  *     operators keep working against the tile-backed columns.
  *
  * At 100 TB this rewrite is the difference between touching the corpus and
  * touching kilobytes; rollup extends that to the whole dimensional lattice
  * below a registered cube tile.
  *
  * Installed through `spark.experimental.extraOptimizations` (Catalyst's
  * public optimizer extension point) — it therefore sees and must produce
  * plans in the main optimizer's normal form.
  */
object MaterializedViews {

  private final class Entry(
      val name: String, val canonical: LogicalPlan,
      val optimized: LogicalPlan, val path: String,
      val definition: DataFrame, val sources: Set[String],
      var stale: Boolean = false)
  private val registry = mutable.ArrayBuffer[Entry]()

  /** Base-table paths a definition reads (subqueries included) — the
    * staleness dependency set, the analogue of the reference's
    * MaterializationService tracking which tables a materialization uses
    * (materialize/MaterializationService.java). */
  private def sourcePaths(plan: LogicalPlan): Set[String] =
    plan.collectWithSubqueries {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            h.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten.toSet

  /** Define + materialize a view: stores the result as parquet and
    * registers the definition for rewriting. */
  def create(spark: SparkSession, name: String, definition: DataFrame, path: String): Unit = {
    definition.write.mode("overwrite").parquet(path)
    // register the OPTIMIZED canonical form: extraOptimizations runs after
    // the main optimizer batches, so incoming subtrees are already pruned/
    // collapsed — the match must be against the same normal form
    val opt = definition.queryExecution.optimizedPlan
    registry += new Entry(name, opt.canonicalized, opt, path,
      definition, sourcePaths(definition.queryExecution.analyzed))
  }

  def drop(name: String): Unit =
    registry.filterInPlace(_.name != name)

  def exists(name: String): Boolean = registry.exists(_.name == name)

  def isStale(name: String): Boolean = registry.exists(e => e.name == name && e.stale)

  def clear(): Unit = registry.clear()

  /** Mark every tile whose definition reads `mutatedPath` as STALE — called
    * by TableModify after a write. Stale tiles stop answering queries (the
    * rewrite skips them) until REFRESH re-materializes; the lifecycle the
    * reference models as MaterializationService validity. Paths compare
    * after filesystem qualification so "/x/t", "file:/x/t" and children
    * ("/x/t/part-0.parquet") all hit. */
  def invalidate(spark: SparkSession, mutatedPath: String): Unit = {
    val q = qualify(spark, mutatedPath)
    registry.foreach { e =>
      if (e.sources.exists(s => s == q || s.startsWith(q + "/") || q.startsWith(s + "/")))
        e.stale = true
    }
  }

  private def qualify(spark: SparkSession, p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(hp).toString
  }

  /** Re-materialize a tile from its definition against the CURRENT base
    * tables and clear staleness — REFRESH MATERIALIZED VIEW. The
    * definition's captured file listings are refreshed first so a
    * copy-on-write swap (TableModify) is picked up instead of the listing
    * cached at CREATE time. */
  def refresh(spark: SparkSession, name: String): Unit = {
    val e = registry.find(_.name == name).getOrElse(throw new IllegalStateException(
      s"Materialized view '$name' not found"))
    // stale during the rebuild: the write below re-optimizes the definition
    // with the rewrite installed, which would otherwise answer the rebuild
    // from the very tile being overwritten (reading files the overwrite is
    // deleting). Stale entries are skipped by every rewrite path. Cleared
    // only on success — a failed rebuild leaves the tile marked stale.
    e.stale = true
    e.definition.queryExecution.analyzed.collectWithSubqueries {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation => lr
    }.foreach(_.relation match {
      case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
        h.location.refresh()
      case _ => ()
    })
    e.definition.write.mode("overwrite").parquet(e.path)
    e.stale = false
  }

  def tilePathOf(name: String): Option[String] =
    registry.find(_.name == name).map(_.path)

  /** Normalize an expression for cross-plan comparison: wrap it in a
    * Project over its child and canonicalize — attribute references become
    * child-output ordinals, so expressions over structurally-equal children
    * compare equal regardless of exprIds. */
  private def canonExpr(e: Expression, child: LogicalPlan): Expression =
    Project(Seq(Alias(e, "c")()), child).canonicalized match {
      case Project(Seq(a: Alias), _) => a.child
      case Project(Seq(x), _) => x
      case other => other.expressions.head
    }

  private def strip(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case e => e
  }

  /** Strip column-pruning Projects (attribute-only project lists): the
    * optimizer prunes each side to ITS referenced columns, so a coarser
    * query and the MV definition see differently-pruned copies of the same
    * base relation. Recursive — under a join each INPUT carries its own
    * pruning Project (the AGGREGATE/JOIN unification case), so pruning is
    * stripped everywhere before comparing against the un-pruned base. */
  private def stripPrune(p: LogicalPlan): LogicalPlan = p transform {
    case Project(pl, c) if pl.forall(_.isInstanceOf[Attribute]) => c
  }

  /** Try to answer `q` by re-aggregating a registered aggregate tile.
    *
    * COMPOSED with filter residual (the reference's SubstitutionVisitor
    * composes unify rules in one pass, SubstitutionVisitor.java:120): the
    * query child and MV child may carry DIFFERENT filters, as long as the
    * MV's conjuncts are each present in or implied by the query's
    * (disjunctive splitting included) and the residual conjuncts are
    * expressible over the tile's GROUPING columns — a residual over
    * grouping expressions is constant within each tile group, so filtering
    * tile rows before re-aggregation is exact. */
  private def rollup(spark: SparkSession, q: Aggregate): Option[LogicalPlan] =
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      entry.optimized match {
        case Aggregate(_, am, childM, _) =>
          def peel(p: LogicalPlan): (Seq[Expression], LogicalPlan) = p match {
            case Filter(c, ch) => (Conjuncts.split(c), ch)
            case other => (Seq.empty, other)
          }
          val (qConj, baseQ) = peel(stripPrune(q.child))
          val (mConj, baseM) = peel(stripPrune(childM))
          if (baseQ.canonicalized != baseM.canonicalized) None else {
          val scan = spark.read.parquet(entry.path).queryExecution.analyzed
          val tile = scan.output // positionally matches the MV output `am`
          def cq(e: Expression) = canonExpr(e, baseQ)
          def cm(e: Expression) = canonExpr(e, baseM)
          // MV output index by canonical grouping expression / agg call
          val mGroup: Map[Expression, Int] = am.zipWithIndex.collect {
            case (ne, i) if !strip(ne).exists(_.isInstanceOf[AggregateExpression]) =>
              cm(strip(ne)) -> i
          }.toMap
          val mAggs: Seq[(Int, AggregateExpression)] = am.zipWithIndex.collect {
            case (ne, i) => strip(ne) match {
              case ae: AggregateExpression => Some(i -> ae)
              case _ => None
            }
          }.flatten

          def reAgg(f: AggregateFunction, t: Attribute): Option[AggregateFunction] =
            f match {
              case _: Sum => Some(Sum(t))
              case _: Count => Some(Sum(t)) // partial counts re-add
              case _: Min => Some(Min(t))
              case _: Max => Some(Max(t))
              case _ => None
            }

          // Re-aggregate one query aggregate call from a tile column that
          // stores that aggregate BARE (else exactness would be lost —
          // a tile holding e.g. cast(sum AS double) cannot reproduce the
          // decimal-exact total).
          def reAggCall(ae: AggregateExpression): Option[Expression] =
            if (ae.isDistinct || ae.filter.nonEmpty) None
            else mAggs.collectFirst {
              case (i, mae)
                  if !mae.isDistinct && mae.filter.isEmpty &&
                    mae.aggregateFunction.getClass == ae.aggregateFunction.getClass &&
                    ae.aggregateFunction.children.map(cq) ==
                      mae.aggregateFunction.children.map(cm) =>
                reAgg(ae.aggregateFunction, tile(i)).map { f =>
                  val sum: Expression = AggregateExpression(f, Complete, isDistinct = false)
                  // COUNT is non-null (0 over an empty input) but its tile
                  // re-aggregation Sum(partial counts) is NULL over an empty
                  // tile (global aggregate, no groups) — restore COUNT's
                  // semantics and non-nullability.
                  val re: Expression = ae.aggregateFunction match {
                    case _: Count => Coalesce(Seq(sum, Literal(0L)))
                    case _ => sum
                  }
                  if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
                }
            }.flatten

          // A query output is either a (whole) grouping expression, or a
          // scalar shell over aggregate calls (e.g. cast(sum(x) AS double)):
          // replace each embedded call with its tile re-aggregation and
          // keep the shell — it then runs once over the re-aggregated
          // values, exactly as it ran once over the direct aggregates.
          def mapOutput(ne: NamedExpression): Option[NamedExpression] = {
            val e = strip(ne)
            if (!e.exists(_.isInstanceOf[AggregateExpression]))
              mGroup.get(cq(e)).map(i => Alias(tile(i), ne.name)(exprId = ne.exprId))
            else {
              var ok = true
              val replaced = e.transformUp {
                case ae: AggregateExpression =>
                  reAggCall(ae) match {
                    case Some(r) => r
                    case None => ok = false; ae
                  }
              }
              if (ok) Some(Alias(replaced, ne.name)(exprId = ne.exprId)) else None
            }
          }

          // predicate coverage: every MV conjunct must appear in (or be
          // implied by) the query's conjuncts — else the tile is missing
          // rows the query needs
          val mCanon = mConj.map(cm)
          val qCanonConj = qConj.map(cq)
          val covered = mCanon.forall(mc =>
            qCanonConj.contains(mc) ||
              qCanonConj.exists(qc => impliesPred(qc, mc)))
          val hasSubquery = qConj.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))

          // map a residual conjunct onto tile columns: replace maximal
          // subtrees matching an MV grouping expression with the tile
          // attribute; any surviving base attribute means the predicate
          // needs finer-than-tile data — not answerable
          def mapPredicate(c: Expression): Option[Expression] = {
            def rec(e: Expression): Option[Expression] =
              mGroup.get(cq(e)).map(i => tile(i): Expression).orElse(e match {
                case _: Attribute => None
                case _ if e.children.isEmpty => Some(e)
                case _ =>
                  val kids = e.children.map(rec)
                  if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
                  else None
              })
            rec(c)
          }
          val residual = qConj.zip(qCanonConj).collect {
            case (c, canon) if !mCanon.contains(canon) => mapPredicate(c)
          }

          val groups = q.groupingExpressions.map(g => mGroup.get(cq(g)))
          val outs = q.aggregateExpressions.map(mapOutput)
          if (!hasSubquery && covered && residual.forall(_.isDefined) &&
              groups.forall(_.isDefined) && outs.forall(_.isDefined)) {
            val child: LogicalPlan =
              if (residual.isEmpty) scan
              else Filter(residual.map(_.get).reduce(And), scan)
            Some(Aggregate(groups.map(i => tile(i.get)), outs.map(_.get), child))
          } else None
          }
        case _ => None
      }
    }.nextOption()

  /** Answer `Filter(q, X)` from a `Filter(m, X)` tile when m's conjuncts
    * subsume q's, compensating with the residual predicate. Requires the
    * filter children to be positionally identical (the usual shape: column
    * pruning sits ABOVE pushed-down filters in the optimized plan). */
  private object Conjuncts extends PredicateHelper {
    def split(e: Expression): Seq[Expression] = splitConjunctivePredicates(e)
  }

  /** Normalize a comparison conjunct to (expr, op, literal) with the
    * non-literal side on the left. */
  private def asRange(e: Expression): Option[(Expression, String, Literal)] = e match {
    case GreaterThan(x, l: Literal) => Some((x, ">", l))
    case GreaterThanOrEqual(x, l: Literal) => Some((x, ">=", l))
    case LessThan(x, l: Literal) => Some((x, "<", l))
    case LessThanOrEqual(x, l: Literal) => Some((x, "<=", l))
    case EqualTo(x, l: Literal) => Some((x, "=", l))
    case GreaterThan(l: Literal, x) => Some((x, "<", l))
    case GreaterThanOrEqual(l: Literal, x) => Some((x, "<=", l))
    case LessThan(l: Literal, x) => Some((x, ">", l))
    case LessThanOrEqual(l: Literal, x) => Some((x, ">=", l))
    case EqualTo(l: Literal, x) => Some((x, "=", l))
    case _ => None
  }

  /** Range implication (the reference's SubstitutionVisitor
    * splitFilter/implies over RexCall ranges): does query conjunct `q`
    * imply MV conjunct `m`? Both must be literal comparisons over the SAME
    * canonical expression; then e.g. x > 15 implies x > 10. */
  private def implies(q: Expression, m: Expression): Boolean =
    (asRange(q), asRange(m)) match {
      case (Some((xq, oq, lq)), Some((xm, om, lm)))
          if xq == xm && lq.dataType == lm.dataType &&
            lq.value != null && lm.value != null =>
        val ord = org.apache.spark.sql.catalyst.util.TypeUtils
          .getInterpretedOrdering(lq.dataType)
        val c = ord.compare(lq.value, lm.value) // sign of (queryLit - mvLit)
        (om, oq) match {
          case (">", ">") => c >= 0
          case (">", ">=") => c > 0
          case (">", "=") => c > 0
          case (">=", ">") => c >= 0
          case (">=", ">=") => c >= 0
          case (">=", "=") => c >= 0
          case ("<", "<") => c <= 0
          case ("<", "<=") => c < 0
          case ("<", "=") => c < 0
          case ("<=", "<") => c <= 0
          case ("<=", "<=") => c <= 0
          case ("<=", "=") => c <= 0
          case ("=", "=") => c == 0
          case _ => false
        }
      case _ => false
    }
  private def splitDisjuncts(e: Expression): Seq[Expression] = e match {
    case Or(a, b) => splitDisjuncts(a) ++ splitDisjuncts(b)
    case other => Seq(other)
  }

  /** q ⇒ m with DISJUNCTIVE splitting (the reference SubstitutionVisitor's
    * splitFilter over OR forms): every disjunct of q must imply some
    * disjunct of m — so `x < 5 OR x = 7` is answerable from a tile
    * filtered to `x < 10 OR x = 7`. Sound because each q-disjunct lands
    * inside one m-disjunct, hence inside m; the full q conjunct stays in
    * the residual. */
  private def impliesPred(q: Expression, m: Expression): Boolean = {
    val md = splitDisjuncts(m)
    splitDisjuncts(q).forall(dq => md.exists(dm => dq == dm || implies(dq, dm)))
  }

  private def filterResidual(spark: SparkSession, f: Filter): Option[LogicalPlan] =
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      entry.optimized match {
        case Filter(mPred, childM)
            if f.child.canonicalized == childM.canonicalized =>
          val qConj = Conjuncts.split(f.condition)
          val mConj = Conjuncts.split(mPred)
          val mSet = mConj.map(canonExpr(_, childM)).toSet
          val qCanon = qConj.map(c => canonExpr(c, f.child))
          // a residual carrying a subquery cannot be re-based onto the tile
          // (its outer references live in a nested plan the attribute
          // substitution does not reach) — leave such filters alone
          val hasSubquery = qConj.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))
          // every MV conjunct must be exactly present in the query, or be
          // IMPLIED by some query conjunct (range subsumption: the query's
          // x > 15 is answerable from a tile filtered to x > 10). Implied-
          // but-not-equal conjuncts stay in the residual via qConj \ mSet.
          val covered = mSet.forall(mc =>
            qCanon.contains(mc) || qCanon.exists(qc => impliesPred(qc, mc)))
          if (hasSubquery || !covered) None
          else {
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            val attrMap: Map[Attribute, Attribute] =
              f.child.output.zip(scan.output).toMap
            val residual = qConj.zip(qCanon).collect {
              case (c, canon) if !mSet.contains(canon) =>
                c.transform { case a: Attribute => attrMap(a) }
            }
            val filtered: LogicalPlan =
              if (residual.isEmpty) scan else Filter(residual.reduce(And), scan)
            Some(Project(f.output.zip(scan.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, filtered))
          }
        case _ => None
      }
    }.nextOption()

  /** Unify a query UNION ALL with a registered UNION ALL tile — the
    * reference's UnionToUnionUnifyRule family (SubstitutionVisitor.java:120):
    * the MV's branches must match a sub-MULTISET of the query's branches
    * (canonical equality, any order); matched branches collapse into one
    * tile scan, unmatched branches stay as a compensating union. Exact
    * same-order matches never reach here (whole-plan canonical equality
    * fires first); this rule adds permutation + subset coverage. */
  private def unionUnify(spark: SparkSession,
      u: org.apache.spark.sql.catalyst.plans.logical.Union): Option[LogicalPlan] =
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      entry.optimized match {
        case mu: org.apache.spark.sql.catalyst.plans.logical.Union
            if mu.children.size <= u.children.size =>
          val remaining = mutable.ArrayBuffer(u.children: _*)
          val allMatched = mu.children.forall { m =>
            val i = remaining.indexWhere(_.canonicalized == m.canonicalized)
            if (i >= 0) { remaining.remove(i); true } else false
          }
          if (!allMatched) None
          else {
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            val replaced: LogicalPlan =
              if (remaining.isEmpty) scan
              else org.apache.spark.sql.catalyst.plans.logical.Union(
                scan +: remaining.toSeq)
            // rebind: the new plan's columns take over the union's exprIds
            Some(Project(u.output.zip(replaced.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, replaced))
          }
        case _ => None
      }
    }.nextOption()

  /** The rewrite rule; idempotent to install once per session. */
  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case sub if registry.nonEmpty =>
        registry.find(e => !e.stale && e.canonical == sub.canonicalized) match {
          case Some(entry) =>
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            // rebind: tile columns take over the replaced subtree's exprIds
            Project(sub.output.zip(scan.output).map { case (o, n) =>
              Alias(n, o.name)(exprId = o.exprId)
            }, scan)
          case None =>
            sub match {
              case agg: Aggregate => rollup(spark, agg).getOrElse(sub)
              case flt: Filter => filterResidual(spark, flt).getOrElse(flt)
              case un: org.apache.spark.sql.catalyst.plans.logical.Union =>
                unionUnify(spark, un).getOrElse(un)
              case _ => sub
            }
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
