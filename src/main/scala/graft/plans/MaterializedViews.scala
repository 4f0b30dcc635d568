package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, BinaryComparison, Cast, Coalesce, EqualTo, Expression, ExprId, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, NamedExpression, Or, PredicateHelper, SubqueryExpression, TruncTimestamp}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, Sort, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-view rewrite — the reference's substitution machinery
  * (reference: core/src/main/java/org/apache/calcite/plan/SubstitutionVisitor.java:120
  * and MaterializedViewSubstitutionVisitor.java:26 — unify a query subtree
  * with a materialization's definition and replace it with a scan of the
  * stored tile; registration via materialize/MaterializationService.java;
  * behavioral corpus: core/src/test/java/org/apache/calcite/test/
  * MaterializationTest.java, census-ported by MaterializationParitySpec).
  *
  * Unification levels, mirroring the reference's unify-rule families
  * (SubstitutionVisitor's ProjectToProject / FilterToProject /
  * FilterToFilter / AggregateToAggregate / AggregateOnCalcToAggregate /
  * UnionToUnion rules) but implemented over ONE shared normal form
  * instead of rule pairs:
  *
  *  1. EXACT match — canonicalized logical-plan equality; the subtree is
  *     replaced by the tile scan.
  *  2. SPJ UNIFICATION — any query subtree of Project/Filter/inner-Join
  *     operators is normalized to (leaves, conjuncts, output expressions)
  *     with every expression rewritten into leaf-attribute terms (filters
  *     and join conditions pulled up through projects and inner joins —
  *     sound for bag semantics). An MV in the same normal form answers the
  *     query when (a) its leaves match a sub-multiset of the query's —
  *     canonical equality, or LEAF SUBSUMPTION: a query Aggregate leaf
  *     whose outputs are a subset of an MV Aggregate leaf's over the same
  *     child and groups, or a Union leaf equal modulo branch order;
  *     (b) every MV conjunct is present in or IMPLIED by the query's
  *     conjuncts (range subsumption x>15 ⇒ x>10, disjunct-wise with
  *     conjunctions inside disjuncts — the reference's
  *     SubstitutionVisitor.splitFilter), modulo the EQUIVALENCE CLASSES
  *     induced by each side's equi-join conjuncts (the reference
  *     MaterializedViewRule's EquivalenceClasses: under e.deptno=d.deptno
  *     the two columns are interchangeable); and (c) the query's outputs
  *     and residual conjuncts are expressible over the MV's outputs plus
  *     any unmatched (compensating-join) leaves. The rewrite is then
  *     tile ⋈ extra-leaves, filtered by the residual, projected.
  *  3. AGGREGATE unification — query `Aggregate(Gq, Fq, X)` against a
  *     registered `Aggregate(Gm, Fm, Y)` where X SPJ-unifies with Y plus
  *     possibly EXTRA query leaves (compensating joins below the
  *     aggregate are sound because every joined-in conjunct references
  *     only tile GROUPING columns and extra-leaf columns, so the join
  *     multiplies whole tile groups exactly as it multiplies base rows),
  *     and the query's extra conjuncts are expressible over tile GROUPING
  *     columns (constant within each group, so pre-filtering tile rows is
  *     exact):
  *       - SAME-LEVEL (Gq ≡ Gm as canonical sets, no extra leaves): each
  *         tile row is one group — aggregate calls (DISTINCT and FILTER
  *         included) map to the tile column storing the identical call;
  *         no re-aggregation at all.
  *       - ROLLUP: re-aggregate the tile (SUM→SUM, COUNT→SUM, MIN→MIN,
  *         MAX→MAX); DISTINCT aggregates re-aggregate exactly when their
  *         arguments are tile grouping columns (the tile preserves the
  *         distinct value set); MIN/MAX over grouping columns re-aggregate
  *         regardless (multiplicity-insensitive). Grouping expressions
  *         may be ANY expression over tile grouping columns (empid*deptno,
  *         date_trunc coarsening: a YEAR-grain group rolls up from a
  *         MONTH-grain tile — the reference SubstitutionVisitor's floor
  *         granularity lattice).
  *  4. UNION unification — the MV's UNION ALL branches match a
  *     sub-multiset of the query's branches in any order (unmatched query
  *     branches stay as a compensating union); failing that, each MV
  *     branch SPJ-unifies with a distinct query branch and all pairs
  *     produce the SAME tile-level residual + projection, which then
  *     distributes over the union (Filter/Project pushed through Union by
  *     the optimizer re-hoisted — the reference's UnionOnCalcsToUnion).
  *
  * At 100 TB this rewrite is the difference between touching the corpus and
  * touching kilobytes; rollup extends that to the whole dimensional lattice
  * below a registered cube tile.
  *
  * Installed through `spark.experimental.extraOptimizations` (Catalyst's
  * public optimizer extension point) — it therefore sees and must produce
  * plans in the main optimizer's normal form; in particular filters have
  * already been pushed below projects and into join branches on BOTH the
  * query and the stored definition, which is exactly what the shared SPJ
  * normal form strips back off.
  */
object MaterializedViews {

  private final class Entry(
      val name: String, val canonical: LogicalPlan,
      val optimized: LogicalPlan, val path: String,
      val definition: DataFrame, val sources: Set[String],
      var stale: Boolean = false) {
    /** Cached SPJ normal form + leaf canonicals — computed once per
      * registration, not once per optimized query node. The constraint-
      * independent normalization stays lazy; the FK-UK-reduced variants
      * are EPOCH-GATED on the constraint set (ADVICE r14: a lazy val
      * computed under one FK set kept matching via its reduced variant
      * after clearConstraints — now any declare/clear bumps the epoch
      * and the variants recompute at next use). */
    lazy val spj: Option[Spj] = normalize(optimized)
    private lazy val aggBase: Option[(Seq[Expression], Seq[NamedExpression], LogicalPlan, Spj)] =
      optimized match {
        case Aggregate(gm, am, childM, _) =>
          normalize(childM).map(s => (gm, am, childM, s))
        case _ => None
      }
    private var cachedEpoch: Long = -1L
    private var spjVariantsCache: Seq[(Spj, Seq[LogicalPlan])] = Seq.empty
    private var aggChildSpjCache: Seq[(Seq[Expression], Seq[NamedExpression], LogicalPlan, Spj)] = Seq.empty
    private def refresh(): Unit = synchronized {
      val e = constraintsEpoch
      if (cachedEpoch != e) {
        spjVariantsCache = (spj.toSeq ++ spj.flatMap(reduceFkUk))
          .map(s => (s, s.leaves.map(_.canonicalized)))
        aggChildSpjCache = aggBase.toSeq.flatMap { case (gm, am, childM, s) =>
          (s +: reduceFkUk(s).toSeq).map(v => (gm, am, childM, v)) }
        cachedEpoch = e
      }
    }
    /** Matchable normal forms, full first, FK-UK-reduced second, each
      * with its precomputed leaf canonicals. */
    def spjVariants: Seq[(Spj, Seq[LogicalPlan])] = { refresh(); spjVariantsCache }
    def aggChildSpj: Seq[(Seq[Expression], Seq[NamedExpression], LogicalPlan, Spj)] = {
      refresh(); aggChildSpjCache
    }
  }
  private val registry = mutable.ArrayBuffer[Entry]()

  // ======================================================================
  // Referential constraints
  // ======================================================================

  /** A declared foreign key: every `childPath` row has `childCols` all
    * non-null and matching EXACTLY ONE `parentPath` row on `parentCols`
    * (which form a unique key of the parent). Like the reference's
    * RelReferentialConstraint on HrFKUKSchema
    * (core/src/test/java/org/apache/calcite/test/MaterializationTest.java:2901
    * — rcs0: emps(deptno) → depts(deptno)), a declaration is TRUSTED,
    * not checked against the data. */
  final case class ForeignKey(childPath: String, childCols: Seq[String],
      parentPath: String, parentCols: Seq[String])

  private val foreignKeys = mutable.ArrayBuffer[ForeignKey]()
  /** Bumped on every constraint change; Entry caches FK-reduced normal
    * forms per epoch so a withdrawn constraint cannot keep matching
    * through a stale cached variant. */
  @volatile private var constraintsEpoch: Long = 0L

  /** Declare an FK→UK constraint between two parquet tables (paths as
    * passed to `spark.read.parquet`). Declare BEFORE registering MVs —
    * each entry's reduced normal form is computed at first use. */
  def declareForeignKey(spark: SparkSession, childPath: String,
      childCols: Seq[String], parentPath: String, parentCols: Seq[String]): Unit = {
    require(childCols.size == parentCols.size && childCols.nonEmpty)
    val fk = ForeignKey(qualify(spark, childPath), childCols,
      qualify(spark, parentPath), parentCols)
    if (!foreignKeys.contains(fk)) { foreignKeys += fk; constraintsEpoch += 1 }
  }

  def clearConstraints(): Unit =
    if (foreignKeys.nonEmpty) { foreignKeys.clear(); constraintsEpoch += 1 }

  /** FK-UK join elimination over a normal form (the reference
    * AbstractMaterializedViewRule's referential-constraint compensation;
    * behavioral corpus testJoinMaterializationUKFK1-9,
    * MaterializationTest.java:2325): a leaf joined ONLY by the
    * equi-conditions of a declared FK — one child leaf's FK columns
    * against this parent leaf's full unique key — is row-preserving
    * (every child row matches exactly one parent row), so the form minus
    * that leaf and its join conjuncts answers the same queries. Parent
    * attributes surviving in the outputs are rewritten to their
    * child-side equals first; a parent attribute used anywhere else
    * keeps the leaf. Iterated to fixpoint (UKFK6 joins depts twice).
    * Returns None when nothing was eliminable. */
  /** The parquet path behind a bare relation leaf — the key constraint
    * declarations are registered under. */
  private def leafPath(p: LogicalPlan): Option[String] = p match {
    case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
      lr.relation match {
        // a multi-path scan (spark.read.parquet(a, b)) whose FIRST root
        // equals a declared table is NOT that table — parent uniqueness /
        // row-preservation would silently break (ADVICE r14). Same for
        // partitioned relations: a pruned FileIndex is a SLICE of the
        // declared table, so constraint matching only accepts a bare
        // single-root unpartitioned scan.
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation
            if h.location.rootPaths.size == 1 && h.partitionSchema.isEmpty =>
          Some(h.location.rootPaths.head.toString)
        case _ => None
      }
    case _ => None
  }

  /** Is this LeftSemi join a NO-OP under a declared FK? True when the
    * right side is the BARE parent table (no filters — any would break
    * the guarantee), the condition equates one left leaf's FK columns
    * with the parent's full unique key, and the declaration promises
    * every left row a match — `deptno IN (select deptno from depts)`
    * filters nothing (testJoinMaterialization11's query side,
    * MaterializationTest.java:2299). */
  private def semiFkNoOp(l: LogicalPlan, r: LogicalPlan, cond: Expression): Boolean = {
    if (foreignKeys.isEmpty) return false
    (normalize(l), normalize(r)) match {
      case (Some(ls), Some(rs)) if rs.conjuncts.isEmpty && rs.leaves.size == 1 =>
        val parent = rs.leaves.head
        val rightIds = parent.output.map(_.exprId).toSet
        def leftLeafOf(a: Attribute): Option[Int] =
          ls.leaves.indices.find(i => ls.leaves(i).output.exists(_.exprId == a.exprId))
        val pairs = Conjuncts.split(cond).map {
          case EqualTo(a: Attribute, b: Attribute) if rightIds.contains(b.exprId) =>
            leftLeafOf(a).map(i => (i, a, b))
          case EqualTo(b: Attribute, a: Attribute) if rightIds.contains(b.exprId) =>
            leftLeafOf(a).map(i => (i, a, b))
          case _ => None
        }
        pairs.nonEmpty && pairs.forall(_.isDefined) && {
          val ps = pairs.map(_.get)
          val childLeaves = ps.map(_._1).distinct
          childLeaves.size == 1 && {
            val joined = ps.map { case (_, ca, pa) => (ca.name, pa.name) }.toSet
            (leafPath(ls.leaves(childLeaves.head)), leafPath(parent)) match {
              case (Some(cp), Some(pp)) => foreignKeys.exists(fk =>
                fk.childPath == cp && fk.parentPath == pp &&
                  fk.childCols.zip(fk.parentCols).toSet == joined)
              case _ => false
            }
          }
        }
      case _ => false
    }
  }

  private def reduceFkUk(s0: Spj): Option[Spj] = {
    if (foreignKeys.isEmpty) return None
    def step(s: Spj): Option[Spj] = {
      val paths = s.leaves.map(leafPath)
      val attrLeaf: Map[ExprId, Int] = s.leaves.zipWithIndex.flatMap {
        case (l, i) => l.output.map(_.exprId -> i)
      }.toMap
      s.leaves.indices.iterator.flatMap { pi =>
        paths(pi).iterator.flatMap { pp =>
          val onParent = s.conjuncts.filter(
            _.references.exists(a => attrLeaf.get(a.exprId).contains(pi)))
          // every conjunct touching the parent must be `child = parent`
          // over bare attributes, all from ONE child leaf — except
          // optimizer-inferred IsNotNull on the joined parent key,
          // vacuous once the join is gone (the FK guarantees the
          // surviving child keys are non-null and matched)
          val (equis, rest) = onParent.partition {
            case EqualTo(_: Attribute, _: Attribute) => true
            case _ => false
          }
          val pairs = equis.map {
            case EqualTo(a: Attribute, b: Attribute) =>
              (attrLeaf.get(a.exprId), attrLeaf.get(b.exprId)) match {
                case (Some(ci), Some(`pi`)) if ci != pi => Some((ci, a, b))
                case (Some(`pi`), Some(ci)) if ci != pi => Some((ci, b, a))
                case _ => None
              }
            case _ => None
          }
          if (pairs.isEmpty || pairs.exists(_.isEmpty)) Iterator.empty
          else {
            val ps = pairs.map(_.get)
            val parentKeyIds = ps.map(_._3.exprId).toSet
            val childKeyIds = ps.map(_._2.exprId).toSet
            val restOk = rest.forall {
              case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: Attribute) =>
                parentKeyIds.contains(a.exprId)
              case _ => false
            }
            val childLeaves = ps.map(_._1).distinct
            if (!restOk || childLeaves.size != 1) Iterator.empty
            else {
              val joined = ps.map { case (_, ca, pa) => (ca.name, pa.name) }.toSet
              val ok = paths(childLeaves.head).exists(cp => foreignKeys.exists(
                fk => fk.childPath == cp && fk.parentPath == pp &&
                  fk.childCols.zip(fk.parentCols).toSet == joined))
              if (!ok) Iterator.empty
              else {
                // parent attr → its child-side equal, for surviving
                // outputs; a replaced TOP-LEVEL attribute keeps its
                // original exprId behind an Alias — on the query side the
                // surrounding plan references the pre-reduction ids
                val sub: Map[ExprId, Attribute] =
                  ps.map { case (_, ca, pa) => pa.exprId -> ca }.toMap
                val outs = s.outputs.map {
                  case a: Attribute if sub.contains(a.exprId) =>
                    Alias(sub(a.exprId), a.name)(exprId = a.exprId)
                  case ne => ne.transformUp {
                    case a: Attribute => sub.getOrElse(a.exprId, a)
                  }.asInstanceOf[NamedExpression]
                }
                val leftover = outs.exists(_.references.exists(
                  a => attrLeaf.get(a.exprId).contains(pi)))
                if (leftover) Iterator.empty
                else Iterator.single(Spj(
                  s.leaves.zipWithIndex.collect { case (l, i) if i != pi => l },
                  // the child-side inferred IsNotNull on the FK columns is
                  // equally vacuous (FK columns are declared non-null) and
                  // the now-smaller query side will not re-infer it
                  s.conjuncts.filterNot(onParent.contains).filterNot {
                    case org.apache.spark.sql.catalyst.expressions.IsNotNull(a: Attribute) =>
                      childKeyIds.contains(a.exprId)
                    case _ => false
                  },
                  outs))
              }
            }
          }
        }
      }.nextOption()
    }
    var cur = s0
    var any = false
    var next = step(cur)
    while (next.isDefined) { cur = next.get; any = true; next = step(cur) }
    if (any) Some(cur) else None
  }

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

  /** A global Sort atop a definition is storage-order only — parquet
    * tiles are unordered bags, and the reference likewise treats a sorted
    * materialization as usable for unsorted queries
    * (MaterializationTest.testScan's `order by deptno` MV). Stripped at
    * registration so matching ignores it; a query-side ORDER BY survives
    * as a Sort node ABOVE the substituted subtree. */
  private def stripTopSort(p: LogicalPlan): LogicalPlan = p match {
    case Sort(_, true, c, _) => stripTopSort(c)
    case _ => p
  }

  /** Define + materialize a view: stores the result as parquet and
    * registers the definition for rewriting. */
  def create(spark: SparkSession, name: String, definition: DataFrame,
      path: String): Unit = {
    // parquet refuses duplicate column names (`select c, s, s`; join MVs
    // carrying deptno from both sides) — store under uniquified names.
    // Harmless for matching: the unifier maps tile columns POSITIONALLY
    // against the definition's outputs, never by name.
    writeTile(definition, path)
    // register the OPTIMIZED canonical form: extraOptimizations runs after
    // the main optimizer batches, so incoming subtrees are already pruned/
    // collapsed — the match must be against the same normal form
    val opt = stripTopSort(definition.queryExecution.optimizedPlan)
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
    writeTile(e.definition, e.path)
    e.stale = false
  }

  private def writeTile(definition: DataFrame, path: String): Unit = {
    val names = definition.columns
    val toWrite =
      if (names.distinct.length == names.length) definition
      else definition.toDF(names.zipWithIndex.map { case (n, i) => s"${n}_$i" }: _*)
    toWrite.write.mode("overwrite").parquet(path)
  }

  def tilePathOf(name: String): Option[String] =
    registry.find(_.name == name).map(_.path)

  // ======================================================================
  // SPJ normal form
  // ======================================================================

  /** A Project/Filter/inner-Join subtree reduced to: the non-SPJ LEAVES it
    * reads (left-to-right), every filter + join conjunct, and the output
    * expressions — conjuncts and outputs rewritten into leaf-attribute
    * terms (aliases introduced by intermediate Projects inlined). */
  private final case class Spj(
      leaves: Seq[LogicalPlan],
      conjuncts: Seq[Expression],
      outputs: Seq[NamedExpression])

  /** Inline a child SPJ's output definitions into an expression that
    * references the child's output attributes. */
  private def inline(e: Expression, sub: Map[ExprId, Expression]): Expression =
    e.transformUp { case a: Attribute => sub.getOrElse(a.exprId, a) }

  private def subMap(child: LogicalPlan, s: Spj): Map[ExprId, Expression] =
    child.output.map(_.exprId).zip(s.outputs.map(strip)).toMap

  /** Normalize a subtree; everything that is not Project/Filter/inner-Join
    * is a leaf — Sort included, deliberately: crossing a query-side Sort
    * would let a substitution silently drop the query's ORDER BY, whereas
    * leaving it a leaf means the rewrite happens BELOW the Sort when the
    * rule descends (MV-side top sorts are stripped at registration
    * instead). Bails (None) on non-deterministic expressions and
    * subqueries — neither survives re-basing onto a tile. */
  private def normalize(p: LogicalPlan): Option[Spj] = {
    def ok(e: Expression): Boolean =
      e.deterministic && !e.exists(_.isInstanceOf[SubqueryExpression])
    p match {
      case Project(pl, c) =>
        normalize(c).flatMap { s =>
          if (!pl.forall(ok)) None
          else {
            val sub = subMap(c, s)
            val outs = pl.map {
              case a: Attribute => sub.get(a.exprId) match {
                case Some(at: Attribute) if at.exprId == a.exprId => a
                case Some(e) => Alias(e, a.name)(exprId = a.exprId)
                case None => a
              }
              case al @ Alias(e, n) => Alias(inline(e, sub), n)(exprId = al.exprId)
              case ne => ne
            }
            Some(Spj(s.leaves, s.conjuncts, outs))
          }
        }
      case Filter(cond, c) =>
        normalize(c).flatMap { s =>
          if (!ok(cond)) None
          else Some(s.copy(conjuncts =
            s.conjuncts ++ Conjuncts.split(inline(cond, subMap(c, s)))))
        }
      // an FK-guaranteed membership test keeps every left row — the semi
      // join normalizes to its left side alone
      case Join(l, r, LeftSemi, Some(cond), _) if ok(cond) && semiFkNoOp(l, r, cond) =>
        normalize(l)
      case Join(l, r, Inner | Cross, cond, _) =>
        for {
          ls <- normalize(l); rs <- normalize(r)
          if cond.forall(ok)
        } yield {
          val sub = subMap(l, ls) ++ subMap(r, rs)
          Spj(ls.leaves ++ rs.leaves,
            ls.conjuncts ++ rs.conjuncts ++
              cond.toSeq.flatMap(c => Conjuncts.split(inline(c, sub))),
            ls.outputs ++ rs.outputs)
        }
      case leaf => Some(Spj(Seq(leaf), Seq.empty, leaf.output))
    }
  }

  /** Can a query leaf be answered row-for-row by an MV leaf? Yields the
    * substitution from query-leaf output attrs onto MV-leaf output attrs.
    *  - canonical equality → positional;
    *  - both Aggregates over canonically-equal children with equal
    *    grouping SETS and the query's outputs a subset of the MV's →
    *    per-group rows are identical, outputs matched canonically (the
    *    reference's trimmed-field tolerance: the optimizer prunes each
    *    consumer's copy of a shared aggregate differently);
    *  - both Unions whose branch multisets match (any order) → positional
    *    (the reference's UnionToUnion branch permutation). */
  private def leafSub(qL: LogicalPlan, mL: LogicalPlan): Option[Map[ExprId, Attribute]] =
    if (qL.canonicalized == mL.canonicalized)
      Some(qL.output.map(_.exprId).zip(mL.output).toMap)
    else (qL, mL) match {
      case (Aggregate(gq, aq, cq, _), Aggregate(gm, am, cm, _)) =>
        // tolerate differently-PRUNED children (the optimizer trims each
        // consumer's copy of a shared aggregate to its own columns):
        // compare at the leaf level — same leaves, same conjunct sets,
        // same grouping sets, query outputs a subset of the MV's
        (normalize(cq), normalize(cm)) match {
          case (Some(qsc), Some(msc))
              if qsc.leaves.size == msc.leaves.size &&
                qsc.leaves.zip(msc.leaves).forall { case (a, b) =>
                  a.canonicalized == b.canonicalized } =>
            val refq = refChild(qsc.leaves)
            val refm = refChild(msc.leaves)
            val qSub = subMap(cq, qsc)
            val mSub = subMap(cm, msc)
            def cqe(e: Expression) = canonExpr(inline(e, qSub), refq)
            def cme(e: Expression) = canonExpr(inline(e, mSub), refm)
            if (qsc.conjuncts.map(cqe).toSet != msc.conjuncts.map(cme).toSet ||
                gq.map(cqe).toSet != gm.map(cme).toSet) None
            else {
              val mIdx = am.map(o => cme(strip(o))).zipWithIndex.reverse.toMap
              val pairs = aq.map(o =>
                mIdx.get(cqe(strip(o))).map(i => o.exprId -> mL.output(i)))
              if (pairs.forall(_.isDefined)) Some(pairs.flatten.toMap) else None
            }
          case _ => None
        }
      case (qu: Union, mu: Union) if qu.children.size == mu.children.size =>
        val remaining = mutable.ArrayBuffer(mu.children.map(_.canonicalized): _*)
        val allMatched = qu.children.forall { qb =>
          val i = remaining.indexOf(qb.canonicalized)
          if (i >= 0) { remaining.remove(i); true } else false
        }
        if (allMatched) Some(qu.output.map(_.exprId).zip(mu.output).toMap) else None
      case _ => None
    }

  /** Match each MV leaf to a distinct query leaf (backtracking over
    * duplicates). Returns the chosen query-leaf index per MV leaf, the
    * unmatched (compensating) query-leaf indices, and the combined
    * attribute substitution onto MV-leaf outputs. */
  private def matchLeaves(qs: Seq[LogicalPlan], ms: Seq[LogicalPlan])
      : Option[(Seq[Int], Seq[Int], Map[ExprId, Attribute])] = {
    def rec(mi: Int, used: Set[Int], accSel: List[Int],
        accSub: Map[ExprId, Attribute]): Option[(List[Int], Map[ExprId, Attribute])] =
      if (mi == ms.size) Some((accSel.reverse, accSub))
      else qs.indices.iterator.filterNot(used).flatMap { qi =>
        leafSub(qs(qi), ms(mi)).flatMap(sub =>
          rec(mi + 1, used + qi, qi :: accSel, accSub ++ sub))
      }.nextOption()
    rec(0, Set.empty, Nil, Map.empty).map { case (sel, sub) =>
      (sel, qs.indices.filterNot(sel.toSet), sub)
    }
  }

  /** Reference child for canonicalizing leaf-term expressions: the given
    * leaves joined left-deep. Matched leaves (REPLACED by the MV's own
    * leaf plans via the leafSub substitution) come first on the query
    * side, extras after, so shared expressions canonicalize to the same
    * ordinals on both sides. */
  private def refChild(leaves: Seq[LogicalPlan]): LogicalPlan =
    if (leaves.size == 1) leaves.head
    else leaves.reduceLeft((a, b) => Join(a, b, Inner, None, JoinHint.NONE))

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

  /** Equivalence classes induced by equi-join conjuncts over attributes —
    * the reference MaterializedViewRule's EquivalenceClasses: under
    * emps.deptno = depts.deptno the two columns are interchangeable, so
    * a query grouping by depts.deptno matches an MV grouping by
    * emps.deptno. Each class maps to the member earliest in `order`
    * (matched leaves precede extras, so representatives coincide between
    * the query and MV sides whenever their classes do). */
  private def eqClasses(conjs: Seq[Expression], order: Seq[Attribute])
      : Map[ExprId, Attribute] = {
    val pos = order.map(_.exprId).zipWithIndex.toMap
    val byId = order.map(a => a.exprId -> a).toMap
    val parent = mutable.Map[ExprId, ExprId]()
    def find(x: ExprId): ExprId = parent.get(x) match {
      case Some(p) if p != x => val r = find(p); parent(x) = r; r
      case Some(_) => x
      case None => x
    }
    def union(a: ExprId, b: ExprId): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        // keep the earlier-positioned attr as root
        if (pos.getOrElse(ra, Int.MaxValue) <= pos.getOrElse(rb, Int.MaxValue))
          parent(rb) = ra
        else parent(ra) = rb
      }
    }
    conjs.foreach {
      case EqualTo(a: Attribute, b: Attribute)
          if pos.contains(a.exprId) && pos.contains(b.exprId) =>
        parent.getOrElseUpdate(a.exprId, a.exprId)
        parent.getOrElseUpdate(b.exprId, b.exprId)
        union(a.exprId, b.exprId)
      case _ => ()
    }
    parent.keys.flatMap { k =>
      val r = find(k)
      if (r != k) byId.get(r).map(k -> _) else None
    }.toMap
  }

  /** Everything the unifiers derive from a (query Spj, MV Spj) pair once
    * leaves are matched: σ-substitution onto MV leaf attributes,
    * equivalence-normalized canonicalizers for both sides, conjunct
    * coverage, residual, and the canonical→tile-ordinal output index. */
  private final class Unifier(q: Spj, m: Spj, sel: Seq[Int], extras: Seq[Int],
      sigma: Map[ExprId, Attribute]) {
    private val matchedM = m.leaves
    private val extraLeaves = extras.map(q.leaves)
    val extraAttrIds: Set[ExprId] = extraLeaves.flatMap(_.output.map(_.exprId)).toSet
    private val refQ = refChild(matchedM ++ extraLeaves)
    private val refM = refChild(matchedM)

    /** σ: query-side expressions re-based onto MV leaf attributes. */
    def toM(e: Expression): Expression =
      e.transformUp { case a: Attribute => sigma.getOrElse(a.exprId, a) }

    private val qOrder = (matchedM ++ extraLeaves).flatMap(_.output)
    private val mOrder = matchedM.flatMap(_.output)
    private val qConjM = q.conjuncts.map(toM)

    // equi-attr-pair conjuncts (`a.k = b.k`) feed equivalence classes and
    // are compared by CLASS IMPLICATION, never by normalized canonical
    // equality — two different pairings that share a leading attribute
    // would otherwise both normalize to the same `rep = rep` tautology
    // and spuriously cancel (an unsoundness, not just a missed rewrite)
    private def equiPair(e: Expression): Option[(Attribute, Attribute)] = e match {
      case EqualTo(a: Attribute, b: Attribute) => Some((a, b))
      case _ => None
    }
    private val (qEqui, qRest) = qConjM.partition(equiPair(_).isDefined)
    private val (mEqui, mRest) = m.conjuncts.partition(equiPair(_).isDefined)
    private val normQ = eqClasses(qEqui, qOrder)
    private val normM = eqClasses(mEqui, mOrder)
    private def repQ(a: Attribute): ExprId = normQ.getOrElse(a.exprId, a).exprId
    private def repM(a: Attribute): ExprId = normM.getOrElse(a.exprId, a).exprId

    def cq(e: Expression): Expression =
      canonExpr(toM(e).transformUp { case a: Attribute => normQ.getOrElse(a.exprId, a) }, refQ)
    def cm(e: Expression): Expression =
      canonExpr(e.transformUp { case a: Attribute => normM.getOrElse(a.exprId, a) }, refM)
    /** Equivalence-free canonicalizers — residual mapping tries these
      * FIRST so `depts.name = dependents.name` maps each side to its OWN
      * tile column instead of both collapsing to the class representative
      * (which would turn the enforced equality into a tautology). */
    def cqPlain(e: Expression): Expression = canonExpr(toM(e), refQ)
    def cmPlain(e: Expression): Expression = canonExpr(e, refM)

    private val qRestCanon = qRest.map(c => canonExpr(
      c.transformUp { case a: Attribute => normQ.getOrElse(a.exprId, a) }, refQ))
    private val mRestCanon = mRest.map(cm)
    private val mRestCanonSet = mRestCanon.toSet

    /** Every MV conjunct present in or implied by the query's conjuncts —
      * else the tile is missing rows the query needs. Equi-pairs are
      * covered when the query's equivalence classes already merge both
      * sides; other conjuncts by canonical equality or DNF implication
      * with the WHOLE query conjunction as the antecedent (testAlias:
      * `empid > 500 AND salary > 6000` jointly implies the MV's
      * `... OR (empid > 400 AND salary > 5000)` — no single conjunct
      * does). */
    private val equiCovered: Boolean =
      mEqui.forall(c => { val (a, b) = equiPair(c).get; repQ(a) == repQ(b) })
    /** MV non-equi conjuncts the query does NOT imply — the rows the
      * tile is missing relative to the query. */
    val uncoveredRest: Seq[Expression] = mRest.zip(mRestCanon).collect {
      case (c, mc) if !qRestCanon.contains(mc) && !impliesDnf(qRestCanon, mc) => c
    }
    val covered: Boolean = equiCovered && uncoveredRest.isEmpty

    /** Preconditions for RANGE-UNION compensation (the reference
      * AbstractMaterializedViewRule's union rewriting —
      * testJoinMaterialization10, MaterializationTest.java:2280, and the
      * aggregate variants NoAggregateFuncs7/9, AggregateFuncs11): the
      * tile's filter is strictly NARROWER than the query's, so the
      * query splits exactly into tile rows plus the base rows where the
      * tile's extra conjuncts are NOT TRUE (false or null — the
      * complement filter is null-tolerant, making the split a partition
      * regardless of the filtered column's nulls). Requires: the MV's
      * equi-joins all covered, its remaining uncovered conjuncts
      * deterministic (normalize guarantees it), and every QUERY conjunct
      * implied by the MV's — the subset direction. */
    val rangeUnionApplicable: Boolean =
      equiCovered && uncoveredRest.nonEmpty &&
        qEqui.forall { c =>
          val (a, b) = equiPair(c).get
          sigmaRange(a) && sigmaRange(b) && repM(a) == repM(b)
        } &&
        qRestCanon.forall(qc =>
          mRestCanonSet.contains(qc) || impliesDnf(mRestCanon, qc))

    /** The query's conjuncts σ-rebased onto MV leaf attributes — the
      * complement arm's filters (equi joins included). */
    def qConjOnM: Seq[Expression] = qConjM

    /** Query conjuncts the tile does not already enforce: non-equi
      * conjuncts not exactly cancelled by an MV conjunct (implied-but-not-
      * equal ones stay, preserving the stronger query filter), plus equi-
      * pairs the MV's own equivalences do not merge (compensating-join
      * keys included). σ-rebased onto MV leaf attributes. */
    val residual: Seq[Expression] =
      qRest.zip(qRestCanon).collect {
        case (c, canon) if !mRestCanonSet.contains(canon) => c
      } ++ qEqui.filter { c =>
        val (a, b) = equiPair(c).get
        !(sigmaRange(a) && sigmaRange(b) && repM(a) == repM(b))
      }
    /** Is this attribute a matched-MV-leaf attribute (so m-side reps are
      * meaningful for it)? Extra-leaf attrs are never merged by the MV. */
    private def sigmaRange(a: Attribute): Boolean = !extraAttrIds(a.exprId)

    /** Canonical MV output expression → tile ordinal (first wins on
      * duplicate columns, e.g. `select c, s, s`). */
    val mOut: Map[Expression, Int] =
      m.outputs.map(o => cm(strip(o))).zipWithIndex.reverse.toMap
    val mOutPlain: Map[Expression, Int] =
      m.outputs.map(o => cmPlain(strip(o))).zipWithIndex.reverse.toMap

    /** Map the residual onto tile (+ compensating-leaf) terms with the
      * given per-conjunct mapper. A conjunct the tile cannot express is
      * fatal UNLESS it is an optimizer-inferred `IsNotNull(col)` whose
      * null rejection is already enforced by a SIBLING conjunct that DID
      * map and null-INTOLERANTLY reaches the same column (Spark's
      * InferFiltersFromConstraints adds `isnotnull(deptno)` next to
      * `deptno - 10 = 0`; the tile stores only `deptno - 10`, but the
      * mapped comparison filters the nulls by itself). Reaching the
      * column through a null-tolerant node (`b > coalesce(a, 0)`, a
      * null-safe `<=>`) does NOT reject null rows, so mere reference is
      * not enough — the walk mirrors InferFiltersFromConstraints'.
      *
      * Rejects the whole rewrite when a residual equality collapses to
      * `t = t`: a query-side equality the tile does not enforce is
      * exactly what the residual must still apply, so a conjunct whose
      * sides both mapped through normQ's class for THAT equality has
      * been substituted through itself — the filter would be a
      * tautology and rows violating the equality would leak. */
    def mapResidual(mapper: Expression => Option[Expression])
        : Option[Seq[Expression]] = {
      val mapped = residual.map(c => c -> mapper(c))
      // ANY comparison whose mapped sides collapsed into the same tile
      // expression while the originals differed has been substituted
      // through itself — EqualTo becomes an always-true tautology,
      // EqualNullSafe (<=>) likewise, an ordering comparison an
      // always-false over-filter; all are wrong, reject the rewrite
      // (ADVICE r14 extended this beyond top-level EqualTo).
      val circular = mapped.exists {
        case (o: BinaryComparison, Some(r: BinaryComparison)) =>
          r.left.semanticEquals(r.right) && !o.left.semanticEquals(o.right)
        case _ => false
      }
      if (circular) return None
      def nullRejects(c: Expression, a: Attribute): Boolean = c match {
        case x: Attribute => x.exprId == a.exprId
        case _ => c.nullIntolerant && c.children.exists(nullRejects(_, a))
      }
      def coveredByNullRejectingSibling(a: Attribute): Boolean =
        mapped.exists { case (c, r) => r.isDefined && nullRejects(c, a) }
      val kept = mapped.flatMap {
        case (_, Some(m)) => Some(Some(m))
        case (org.apache.spark.sql.catalyst.expressions.IsNotNull(a: Attribute), None)
            if coveredByNullRejectingSibling(a) => None // droppable
        case (_, None) => Some(None)
      }
      if (kept.forall(_.isDefined)) Some(kept.map(_.get)) else None
    }

    /** Rewrite a σ-rebased query expression onto tile attributes: replace
      * maximal subtrees matching an MV output with the tile column;
      * attributes of compensating leaves pass through; any other surviving
      * attribute needs data the tile does not store — not answerable,
      * UNLESS the tile stores a lossless WIDENING CAST of it
      * (testJoinMaterialization5/6, MaterializationTest.java:2201: the
      * tile stores cast(empid as bigint); int→bigint is injective, so
      * bare empid is recoverable as cast(tile_col as int)). */
    def mapExpr(e: Expression, tile: Seq[Attribute]): Option[Expression] = {
      // the extra-attr check runs BEFORE the canonical lookup: the
      // equivalence classes would otherwise redirect a compensating
      // leaf's join key into the tile column it equals, collapsing the
      // compensating join's condition into a tautology (cartesian)
      def castInverse(a: Attribute): Option[Expression] = {
        import org.apache.spark.sql.types._
        val wider: Seq[DataType] = a.dataType match {
          case ByteType => Seq(ShortType, IntegerType, LongType)
          case ShortType => Seq(IntegerType, LongType)
          case IntegerType => Seq(LongType)
          case FloatType => Seq(DoubleType)
          case _ => Seq.empty
        }
        // the stored Cast's evalMode depends on the session the MV was
        // analyzed under — probe both spellings
        val modes = Seq(
          org.apache.spark.sql.catalyst.expressions.EvalMode.LEGACY,
          org.apache.spark.sql.catalyst.expressions.EvalMode.ANSI)
        wider.view.flatMap { t =>
          modes.view.flatMap { m =>
            val probe: Expression = Cast(a, t, None, m)
            mOutPlain.get(cqPlain(probe)).orElse(mOut.get(cq(probe)))
          }.headOption
        }.headOption.map(i => Cast(tile(i), a.dataType): Expression)
      }
      def rec(x: Expression): Option[Expression] = x match {
        case a: Attribute if extraAttrIds(a.exprId) => Some(a)
        case l: Literal => Some(l)
        case _ => mOutPlain.get(cqPlain(x)).map(i => tile(i): Expression)
          .orElse(mOut.get(cq(x)).map(i => tile(i): Expression)).orElse(x match {
          case a: Attribute => castInverse(a)
          case _ if x.children.isEmpty => Some(x)
          case _ =>
            val kids = x.children.map(rec)
            if (kids.forall(_.isDefined)) Some(x.withNewChildren(kids.map(_.get)))
            else None
        })
      }
      rec(e)
    }

    /** Join the compensating leaves back onto the tile scan and apply the
      * mapped residual, attaching each conjunct at the first level where
      * its references resolve (extraOptimizations runs after pushdown —
      * nobody will re-push a filter we leave on top). */
    def rebuild(scan: LogicalPlan, mappedResidual: Seq[Expression]): LogicalPlan = {
      var remaining = mappedResidual
      var plan: LogicalPlan = scan
      for (x <- extraLeaves) {
        val avail = AttributeSet(plan.output ++ x.output)
        val (now, later) = remaining.partition(_.references.subsetOf(avail))
        plan = Join(plan, x, Inner,
          if (now.isEmpty) None else Some(now.reduce(And)), JoinHint.NONE)
        remaining = later
      }
      if (remaining.nonEmpty) plan = Filter(remaining.reduce(And), plan)
      plan
    }
  }

  /** `NOT (e IS TRUE)` — the range-union complement filter: keeps rows
    * where `e` is false OR null, so tile-arm (e true) plus complement-arm
    * partition the input exactly, nulls included. */
  private def notTrue(e: Expression): Expression =
    org.apache.spark.sql.catalyst.expressions.Not(
      Coalesce(Seq(e, Literal(false))))

  /** Reconstruct an executable plan from normal-form pieces, attaching
    * each conjunct at the LOWEST level where its references resolve —
    * the optimizer has already run (extraOptimizations), so nothing
    * re-pushes a filter left on top, and an unconditioned Join would
    * execute as a cartesian product. */
  private[plans] def rebuildSpj(leaves: Seq[LogicalPlan], conjuncts: Seq[Expression],
      outputs: Seq[NamedExpression]): LogicalPlan = {
    var plan: LogicalPlan = leaves.head
    var remaining = conjuncts
    val (now0, later0) = remaining.partition(_.references.subsetOf(plan.outputSet))
    if (now0.nonEmpty) plan = Filter(now0.reduce(And), plan)
    remaining = later0
    // connected join order: always attach next a leaf that shares a
    // cross-side conjunct with the accumulated plan — leaves [A,B,C]
    // with only A-C and B-C conjuncts must produce (A⋈C)⋈B, not a
    // cartesian Join(A,B) (ADVICE r14). Declaration order is the
    // fallback only when no remaining leaf connects at all.
    val pending = mutable.ArrayBuffer[LogicalPlan](leaves.tail: _*)
    while (pending.nonEmpty) {
      val idx = pending.indexWhere { x =>
        remaining.exists { c =>
          c.references.subsetOf(AttributeSet(plan.output ++ x.output)) &&
            c.references.exists(plan.outputSet.contains) &&
            c.references.exists(x.outputSet.contains)
        }
      }
      val x = pending.remove(math.max(idx, 0))
      val avail = AttributeSet(plan.output ++ x.output)
      val (now, later) = remaining.partition(_.references.subsetOf(avail))
      plan = Join(plan, x, Inner, now.reduceOption(And), JoinHint.NONE)
      remaining = later
    }
    if (remaining.nonEmpty) plan = Filter(remaining.reduce(And), plan)
    Project(outputs, plan)
  }

  /** Cheap pre-gate: every MV leaf must have SOME plausible partner among
    * the query leaves (canonical equality, or a same-kind pair the
    * subsumption matcher might unify) — avoids the expensive Unifier on
    * the vast majority of non-matching nodes when tiles are registered. */
  private def leafGate(qLeaves: Seq[LogicalPlan], mLeafCanon: Seq[LogicalPlan]): Boolean = {
    lazy val qCanon = qLeaves.map(_.canonicalized)
    mLeafCanon.forall(mc =>
      qCanon.exists(qc => qc == mc ||
        (qc.isInstanceOf[Aggregate] && mc.isInstanceOf[Aggregate]) ||
        (qc.isInstanceOf[Union] && mc.isInstanceOf[Union])))
  }

  /** Try to answer an SPJ query subtree from a registered tile — the
    * full normal forms first, then the FK-UK-reduced ones on either
    * side (a query-side FK join to a leaf no tile carries is
    * row-preserving and can be dropped outright — UKFK9's shape). */
  private def spjRewrite(spark: SparkSession, sub: LogicalPlan): Option[LogicalPlan] =
    normalize(sub).flatMap { q0 =>
      // reduced form FIRST: when the query's own FK join is droppable, the
      // tile answer that skips it beats the one that compensates it back
      (reduceFkUk(q0).toSeq :+ q0).iterator.flatMap { q =>
      registry.iterator.filterNot(_.stale).flatMap { entry =>
        entry.spjVariants.iterator.collect {
          case (m, lc) if leafGate(q.leaves, lc) => (entry, m)
        }
      }.flatMap { case (entry, m) =>
        matchLeaves(q.leaves, m.leaves).flatMap { case (sel, extras, sigma) =>
          val u = new Unifier(q, m, sel, extras, sigma)
          if (u.covered) {
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            val tile = scan.output
            val resid = u.mapResidual(u.mapExpr(_, tile))
            val outs = q.outputs.map(ne =>
              u.mapExpr(u.toM(strip(ne)), tile).map(e =>
                Alias(e, ne.name)(exprId = ne.exprId)))
            if (resid.isEmpty || outs.exists(_.isEmpty)) None
            else Some(Project(outs.map(_.get), u.rebuild(scan, resid.get)))
          } else if (u.rangeUnionApplicable && extras.isEmpty) {
            // RANGE-UNION compensation (testJoinMaterialization10): tile
            // rows are a strict subset of the query's — answer with
            // tile UNION ALL the base slice where the tile's extra
            // conjuncts are NOT TRUE. No residual on the tile arm: the
            // subset direction makes every query conjunct vacuous there.
            val scan = spark.read.parquet(entry.path).queryExecution.analyzed
            val tile = scan.output
            val outs = q.outputs.map(ne =>
              u.mapExpr(u.toM(strip(ne)), tile).map(e =>
                Alias(e, ne.name)(exprId = ne.exprId)))
            if (outs.exists(_.isEmpty)) None
            else {
              val armA = Project(outs.map(_.get), scan)
              val armB = rebuildSpj(m.leaves,
                u.qConjOnM :+ notTrue(u.uncoveredRest.reduce(And)),
                q.outputs.map(ne =>
                  Alias(u.toM(strip(ne)), ne.name)(exprId = ne.exprId)))
              Some(Union(Seq(armA, armB)))
            }
          } else None
        }
      }
      }.nextOption()
    }

  // ======================================================================
  // Aggregate unification
  // ======================================================================

  /** Try to answer `q` from a registered aggregate tile — same-level,
    * rollup, and compensating-join variants (scaladoc at the top of this
    * object, level 3). */
  private def rollup(spark: SparkSession, q: Aggregate): Option[LogicalPlan] =
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      entry.aggChildSpj.iterator.flatMap { case (gm, am, childM, ms) =>
          normalize(q.child) match {
            case Some(qs) if leafGate(qs.leaves, ms.leaves.map(_.canonicalized)) =>
              matchLeaves(qs.leaves, ms.leaves).flatMap { case (sel, extras, sigma) =>
                val u = new Unifier(qs, ms, sel, extras, sigma)
                // RANGE-UNION at the tile grain (NoAggregateFuncs7/9,
                // AggregateFuncs11): when the tile's filter is narrower,
                // a parallel Aggregate over the complement slice — the MV
                // definition re-instantiated with the query's filters AND
                // the tile's extra conjuncts NOT TRUE — supplies the
                // missing tile-grain partials; the union re-aggregates
                // below. Sound for the re-aggregation paths (SUM/COUNT
                // partials add across the split; MIN/MAX and
                // grouping-column DISTINCT are multiplicity-insensitive);
                // the same-level shortcut is disabled because a group may
                // now span both arms as two partial rows.
                val rangeUnion = !u.covered && u.rangeUnionApplicable && extras.isEmpty
                if (!u.covered && !rangeUnion) None else {
                val scan = spark.read.parquet(entry.path).queryExecution.analyzed
                val tile = scan.output
                val tileOrUnion: LogicalPlan =
                  if (!rangeUnion) scan
                  else Union(Seq(scan, Aggregate(gm, am, rebuildSpj(ms.leaves,
                    u.qConjOnM :+ notTrue(u.uncoveredRest.reduce(And)),
                    ms.outputs))))
                // group exprs / agg calls are in CHILD-output terms on both
                // sides — inline them into leaf terms first
                val qSub = subMap(q.child, qs)
                val mSub = subMap(childM, ms)
                def inQ(e: Expression) = inline(e, qSub)
                def inM(e: Expression) = inline(e, mSub)

                // MV output index by canonical grouping expression / bare
                // agg call / whole output (same-level shells)
                val mAll: Map[Expression, Int] =
                  am.map(ne => u.cm(inM(strip(ne)))).zipWithIndex.reverse.toMap
                val mGroup: Map[Expression, Int] = am.zipWithIndex.collect {
                  case (ne, i) if !strip(ne).exists(_.isInstanceOf[AggregateExpression]) =>
                    u.cm(inM(strip(ne))) -> i
                }.reverse.toMap
                val mGroupPlain: Map[Expression, Int] = am.zipWithIndex.collect {
                  case (ne, i) if !strip(ne).exists(_.isInstanceOf[AggregateExpression]) =>
                    u.cmPlain(inM(strip(ne))) -> i
                }.reverse.toMap
                val mAggs: Seq[(Int, AggregateExpression, Expression)] =
                  am.zipWithIndex.collect {
                    case (ne, i) => strip(ne) match {
                      case ae: AggregateExpression => Some((i, ae, u.cm(inM(ae))))
                      case _ => None
                    }
                  }.flatten

                val qGroupCanon = q.groupingExpressions.map(e => u.cq(inQ(e)))
                val mGroupCanon = gm.map(e => u.cm(inM(e)))
                // with compensating extra leaves the tile rows get
                // multiplied by the join — a re-aggregation is always
                // required, so the project-only shortcut needs equal
                // grouping AND no extras
                val sameLevel = extras.isEmpty && !rangeUnion &&
                  qGroupCanon.toSet == mGroupCanon.toSet

                // map a grouping-level expression onto tile GROUPING
                // columns (plus compensating-leaf columns): replace maximal
                // subtrees matching an MV grouping expression with the tile
                // attribute; date_trunc re-coarsens through the granularity
                // lattice; any surviving matched-leaf attribute means
                // finer-than-tile data — not answerable
                def mapGroupExpr(c: Expression): Option[Expression] = {
                  def rec(e: Expression): Option[Expression] = e match {
                    case a: Attribute if u.extraAttrIds(a.exprId) => Some(a)
                    // a constant-folded literal stays a literal: mapping it
                    // onto a same-valued tile column would put a
                    // non-grouping attribute in the aggregate output
                    case l: Literal => Some(l)
                    case _ => mGroupPlain.get(u.cqPlain(e)).map(i => tile(i): Expression)
                      .orElse(mGroup.get(u.cq(e)).map(i => tile(i): Expression)).orElse(e match {
                      case TruncTimestamp(f @ Literal(_, _), x, tz) =>
                        // granularity coarsening (YEAR from a MONTH tile),
                        // falling through to plain child recursion when the
                        // tile stores the raw timestamp itself
                        truncFiner(f).flatMap { finer =>
                          finer.view.flatMap(f2 =>
                            mGroup.get(u.cq(TruncTimestamp(f2, x, tz)))).headOption
                        }.map(i => TruncTimestamp(f, tile(i), tz): Expression)
                          .orElse(rec(x).map(m => TruncTimestamp(f, m, tz)))
                      case _: Attribute => None
                      case _ if e.children.isEmpty => Some(e)
                      case _ =>
                        val kids = e.children.map(rec)
                        if (kids.forall(_.isDefined))
                          Some(e.withNewChildren(kids.map(_.get)))
                        else None
                    })
                  }
                  rec(c)
                }

                def reAgg(f: AggregateFunction, t: Attribute): Option[AggregateFunction] =
                  f match {
                    case _: Sum => Some(Sum(t))
                    case _: Count => Some(Sum(t)) // partial counts re-add
                    case _: Min => Some(Min(t))
                    case _: Max => Some(Max(t))
                    case _ => None
                  }

                // Re-aggregate one query aggregate call from a tile column
                // storing the SAME call (SUM→SUM, COUNT→SUM of partials,
                // MIN→MIN, MAX→MAX). DISTINCT MIN/MAX qualify too — the
                // flag is a no-op for them, so a tile storing MIN(x) per
                // finer group re-aggregates MIN(DISTINCT x) exactly.
                def tileAggPath(ae: AggregateExpression): Option[Expression] = {
                  val minMax = ae.aggregateFunction.isInstanceOf[Min] ||
                    ae.aggregateFunction.isInstanceOf[Max]
                  if (ae.filter.nonEmpty || (ae.isDistinct && !minMax)) None
                  else mAggs.collectFirst {
                    case (i, mae, _)
                        if !mae.isDistinct && mae.filter.isEmpty &&
                          mae.aggregateFunction.getClass == ae.aggregateFunction.getClass &&
                          ae.aggregateFunction.children.map(e => u.cq(inQ(e))) ==
                            mae.aggregateFunction.children.map(e => u.cm(inM(e))) =>
                      reAgg(ae.aggregateFunction, tile(i)).map { f =>
                        val sum: Expression =
                          AggregateExpression(f, Complete, isDistinct = false)
                        // COUNT is non-null (0 over an empty input) but its
                        // tile re-aggregation Sum(partial counts) is NULL
                        // over an empty tile (global aggregate, no groups)
                        // — restore COUNT's semantics and non-nullability.
                        val re: Expression = ae.aggregateFunction match {
                          case _: Count => Coalesce(Seq(sum, Literal(0L)))
                          case _ => sum
                        }
                        if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
                      }
                  }.flatten
                }

                // Re-aggregate one query aggregate call from the tile.
                def reAggCall(ae: AggregateExpression): Option[Expression] =
                  if (sameLevel)
                    // one tile row per group: the tile column IS the value
                    mAggs.collectFirst {
                      case (i, _, mCanon) if mCanon == u.cq(ae) => tile(i): Expression
                    }
                  else if (ae.isDistinct || ae.aggregateFunction.isInstanceOf[Min] ||
                      ae.aggregateFunction.isInstanceOf[Max]) {
                    // DISTINCT aggregates roll up exactly when every
                    // argument is a tile grouping column (the tile keeps
                    // the distinct value set per coarser group); MIN/MAX
                    // over grouping columns are multiplicity-insensitive.
                    // When the argument is NOT a grouping column, MIN/MAX
                    // still roll up from a tile column storing the same
                    // call (multiplicity-insensitive again) — the
                    // tile-column fallthrough below.
                    val kids = ae.aggregateFunction.children.map(mapGroupExpr)
                    val filt = ae.filter.map(mapGroupExpr)
                    if (kids.forall(_.isDefined) && filt.forall(_.isDefined))
                      Some(AggregateExpression(
                        ae.aggregateFunction.withNewChildren(kids.map(_.get))
                          .asInstanceOf[AggregateFunction],
                        Complete, isDistinct = ae.isDistinct,
                        filter = filt.map(_.get)))
                    else tileAggPath(ae)
                  } else tileAggPath(ae)

                // A query output: grouping-level subtrees map onto the tile
                // (whole MV outputs too at same level — shells like
                // sum(x)+2 stored verbatim); embedded aggregate calls map
                // through reAggCall; the scalar shell around them is kept.
                def mapOutput(ne: NamedExpression): Option[NamedExpression] = {
                  def rec(e: Expression): Option[Expression] = {
                    val whole =
                      if (sameLevel) mAll.get(u.cq(e)).map(i => tile(i): Expression)
                      else None
                    whole.orElse(e match {
                      case ae: AggregateExpression => reAggCall(ae)
                      case _ if !e.exists(_.isInstanceOf[AggregateExpression]) =>
                        mapGroupExpr(e)
                      case _ =>
                        val kids = e.children.map(rec)
                        if (kids.forall(_.isDefined))
                          Some(e.withNewChildren(kids.map(_.get)))
                        else None
                    })
                  }
                  rec(u.toM(inQ(strip(ne)))).map(r => Alias(r, ne.name)(exprId = ne.exprId))
                }

                val residual = u.mapResidual(mapGroupExpr)
                val outs = q.aggregateExpressions.map(mapOutput)
                // at SAME LEVEL no re-grouping happens (Project only), so
                // the grouping keys need not be tile-expressible — an MV
                // may group by a column it never outputs (testAggregate0)
                val groups =
                  if (sameLevel) Seq.empty
                  else q.groupingExpressions.map(e => mapGroupExpr(u.toM(inQ(e))))

                if (groups.exists(_.isEmpty) || residual.isEmpty ||
                    outs.exists(_.isEmpty)) None
                else {
                  val child = u.rebuild(tileOrUnion, residual.get)
                  if (sameLevel)
                    // one tile row per group: no aggregation needed at all
                    Some(Project(outs.map(_.get), child))
                  else
                    Some(Aggregate(groups.map(_.get), outs.map(_.get), child))
                }
                }
              }
            case _ => None
          }
      }
    }.nextOption()

  /** FILTERED-AGGREGATE tile, same level — the reference's Calc-over-
    * Aggregate compensation (testCompensatingCalcWithAggregate1/2,
    * MaterializationTest.java:702): the MV is `Filter(mf, Aggregate)`
    * (groups pre-filtered on their aggregate outputs), the query is
    * `Filter(qf, Aggregate)` at the SAME grouping level whose child may
    * add extra conjuncts E over GROUPING columns (each group's row set
    * is then identical between the two sides, E only selects whole
    * groups). Answerable from the tile when qf ∧ E implies every mf
    * conjunct — the tile's missing groups are exactly ones the query
    * discards anyway — by filtering tile rows with the mapped qf ∧ E.
    */
  private def filteredRollup(spark: SparkSession, qTop: Filter): Option[LogicalPlan] = {
    val (qfConjs, qa) = qTop match {
      case Filter(c, a: Aggregate) => (Conjuncts.split(c), a)
      case _ => return None
    }
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      (entry.optimized match {
        case Filter(mc, Aggregate(gm, am, childM, _)) =>
          normalize(childM).map(ms => (Conjuncts.split(mc), gm, am, childM, ms))
        case _ => None
      }).iterator.flatMap { case (mfConjs, gm, am, childM, ms) =>
        (normalize(qa.child) match {
          case Some(qs) if leafGate(qs.leaves, ms.leaves.map(_.canonicalized)) =>
            matchLeaves(qs.leaves, ms.leaves).flatMap { case (sel, extras, sigma) =>
              if (extras.nonEmpty) None
              else {
                val u = new Unifier(qs, ms, sel, extras, sigma)
                if (!u.covered) None
                else {
                  val qSub = subMap(qa.child, qs)
                  val mSub = subMap(childM, ms)
                  def inQ(e: Expression) = inline(e, qSub)
                  def inM(e: Expression) = inline(e, mSub)
                  // same grouping level only — each tile row IS one group
                  val qGroupCanon = qa.groupingExpressions.map(e => u.cq(inQ(e)))
                  val mGroupCanon = gm.map(e => u.cm(inM(e)))
                  if (qGroupCanon.toSet != mGroupCanon.toSet) None
                  else {
                    val scan = spark.read.parquet(entry.path).queryExecution.analyzed
                    val tile = scan.output
                    val mAll: Map[Expression, Int] =
                      am.map(ne => u.cm(inM(strip(ne)))).zipWithIndex.reverse.toMap
                    // map a query expression ALREADY INLINED to leaf+agg
                    // terms onto tile columns (whole-output shells, then
                    // recursion; bare leaf attrs only via stored columns)
                    def mapQ(e: Expression): Option[Expression] = {
                      def rec(x: Expression): Option[Expression] = x match {
                        case l: Literal => Some(l)
                        case _ => mAll.get(u.cq(x)).map(i => tile(i): Expression)
                          .orElse(x match {
                            case _: Attribute => None
                            case _: AggregateExpression => None
                            case _ if x.children.isEmpty => Some(x)
                            case _ =>
                              val kids = x.children.map(rec)
                              if (kids.forall(_.isDefined))
                                Some(x.withNewChildren(kids.map(_.get)))
                              else None
                          })
                      }
                      rec(e)
                    }
                    // the query's top-filter conjuncts in leaf+agg terms:
                    // substitute the aggregate's output attrs by their
                    // defining expressions, then inline the child
                    val aqById: Map[ExprId, Expression] =
                      qa.aggregateExpressions.map(ne => ne.exprId -> strip(ne)).toMap
                    def hoist(c: Expression): Expression =
                      inQ(c.transformUp {
                        case a: Attribute => aqById.getOrElse(a.exprId, a)
                      })
                    val amById: Map[ExprId, Expression] =
                      am.map(ne => ne.exprId -> strip(ne)).toMap
                    def hoistM(c: Expression): Expression =
                      inM(c.transformUp {
                        case a: Attribute => amById.getOrElse(a.exprId, a)
                      })
                    // E = query child conjuncts beyond the MV's; they must
                    // sit on grouping columns (whole-group selectors) —
                    // mGroup-mappable is exactly that
                    val eConjs = u.residual
                    // antecedent for mf implication: qf + E, canonicalized
                    val qfHoisted = qfConjs.map(hoist)
                    val anteCanon = qfHoisted.map(u.cq) ++ eConjs.map(u.cq)
                    val mfCovered = mfConjs.map(hoistM).map(u.cm).forall(mc =>
                      anteCanon.contains(mc) || impliesDnf(anteCanon, mc))
                    if (!mfCovered) None
                    else {
                      val mappedFilter =
                        sequence(qfHoisted.map(mapQ) ++ eConjs.map(mapQ))
                      val outs = qTop.output.zip(qa.aggregateExpressions).map {
                        case (o, ne) => mapQ(u.toM(inQ(strip(ne))))
                          .map(e => Alias(e, o.name)(exprId = o.exprId))
                      }
                      if (mappedFilter.isEmpty || outs.exists(_.isEmpty)) None
                      else {
                        val filtered: LogicalPlan = mappedFilter.get match {
                          case Seq() => scan
                          case cs => Filter(cs.reduce(And), scan)
                        }
                        Some(Project(outs.map(_.get), filtered))
                      }
                    }
                  }
                }
              }
            }
          case _ => None
        }): Option[LogicalPlan]
      }
    }.nextOption()
  }

  /** SAME-LEVEL grouping-sets tile (testAggregateGroupSets1,
    * MaterializationTest.java:743): both the MV and the query are
    * CUBE/ROLLUP/GROUPING SETS aggregates over the SAME child with the
    * SAME grouping sets — each tile row is exactly one (set, group) of
    * the query, so the rewrite is a pure Project over the tile. The gid
    * itself is not stored (and need not be: a projection consumes tile
    * rows 1:1, set-ambiguous null groups included), so query outputs
    * referencing it — grouping()/grouping_id() — bail to base. */
  private def expandSameLevel(spark: SparkSession, q: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.VirtualColumn
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    def isNullLit(e: Expression) = e match {
      case Literal(null, _) => true
      case _ => false
    }
    /** (expand, grouping positions, per-position base expr, gid attr) —
      * None when the shape is not the grouping-sets lowering. */
    def parse(agg: Aggregate): Option[(Expand, Seq[Int], Map[Int, Expression], Attribute)] =
      agg.child match {
        case ex @ Expand(projections, exOut, _) if exOut.nonEmpty &&
            exOut.last.name == VirtualColumn.groupingIdName &&
            projections.nonEmpty && projections.forall(_.last.isInstanceOf[Literal]) &&
            agg.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
            agg.groupingExpressions.exists {
              case a: Attribute => a.exprId == exOut.last.exprId; case _ => false } =>
          val groupIds = agg.groupingExpressions
            .collect { case a: Attribute => a.exprId }.toSet
          val groupPos = (0 until exOut.size - 1)
            .filter(j => groupIds.contains(exOut(j).exprId))
          val baseExpr: Map[Int, Expression] = groupPos.flatMap { j =>
            projections.map(_(j)).find(e => !isNullLit(e)).map(j -> _)
          }.toMap
          val ok = groupPos.forall(j => baseExpr.contains(j) &&
            projections.forall(p => isNullLit(p(j)) || p(j) == baseExpr(j)))
          if (ok) Some((ex, groupPos, baseExpr, exOut.last)) else None
        case _ => None
      }
    parse(q).flatMap { case (exQ, groupPosQ, baseQ, gidQ) =>
      registry.iterator.filterNot(_.stale).flatMap { entry =>
        (entry.optimized match {
          case ma @ Aggregate(_, am, _, _) =>
            parse(ma).map(p => (am, p))
          case _ => None
        }).iterator.flatMap { case (am, (exM, groupPosM, baseM, _)) =>
          if (exQ.projections.size != exM.projections.size) None
          else (normalize(exQ.child), normalize(exM.child)) match {
            case (Some(qs), Some(ms)) if leafGate(qs.leaves, ms.leaves.map(_.canonicalized)) =>
              matchLeaves(qs.leaves, ms.leaves).flatMap { case (sel, extras, sigma) =>
                if (extras.nonEmpty) None
                else {
                  val u = new Unifier(qs, ms, sel, extras, sigma)
                  // two-sided conjunct equality: tile rows must be the
                  // query's groups EXACTLY, nothing narrower or wider
                  if (!u.covered || u.residual.nonEmpty) None
                  else {
                    val qSub = subMap(exQ.child, qs)
                    val mSub = subMap(exM.child, ms)
                    def inQ(e: Expression) = inline(e, qSub)
                    def inM(e: Expression) = inline(e, mSub)
                    // align grouping positions by canonical base expr
                    val mByCanon: Map[Expression, Int] =
                      groupPosM.map(j => u.cm(inM(baseM(j))) -> j).toMap
                    val align: Map[Int, Int] = groupPosQ.flatMap(j =>
                      mByCanon.get(u.cq(inQ(baseQ(j)))).map(j -> _)).toMap
                    val aligned = align.size == groupPosQ.size &&
                      align.values.toSet.size == groupPosM.size &&
                      groupPosQ.size == groupPosM.size &&
                      // identical per-row masks over aligned positions AND
                      // identical gid literals (rows correspond by index —
                      // the sets come out of the same lowering in the same
                      // order when they match at all; the mask check makes
                      // a mismatch fail loudly rather than silently)
                      exQ.projections.zip(exM.projections).forall { case (pq, pm) =>
                        pq.last == pm.last &&
                          groupPosQ.forall(j =>
                            isNullLit(pq(j)) == isNullLit(pm(align(j))))
                      }
                    if (!aligned) None
                    else {
                      val scan = spark.read.parquet(entry.path).queryExecution.analyzed
                      val tile = scan.output
                      // tile ordinal per MV Expand-copy attribute, and per
                      // canonical aggregate call
                      val copyIdx: Map[ExprId, Int] = am.zipWithIndex.collect {
                        case (ne, i) => strip(ne) match {
                          case a: Attribute => Some(a.exprId -> i)
                          case _ => None
                        }
                      }.flatten.toMap
                      val passSubQ: Map[ExprId, Expression] =
                        (0 until exQ.output.size - 1).filterNot(groupPosQ.contains)
                          .map(j => exQ.output(j).exprId -> exQ.projections.head(j)).toMap
                      val passSubM: Map[ExprId, Expression] =
                        (0 until exM.output.size - 1).filterNot(groupPosM.contains)
                          .map(j => exM.output(j).exprId -> exM.projections.head(j)).toMap
                      val mAggIdx: Map[Expression, Int] = am.zipWithIndex.collect {
                        case (ne, i) => strip(ne) match {
                          case ae: AggregateExpression =>
                            val rebased = ae.transformUp {
                              case a: Attribute if passSubM.contains(a.exprId) =>
                                passSubM(a.exprId)
                            }
                            Some(u.cm(inM(rebased)) -> i)
                          case _ => None
                        }
                      }.flatten.toMap
                      val qCopyToTile: Map[ExprId, Int] = groupPosQ.flatMap { j =>
                        copyIdx.get(exM.output(align(j)).exprId)
                          .map(exQ.output(j).exprId -> _)
                      }.toMap
                      def mapOut(ne: NamedExpression): Option[NamedExpression] = {
                        def rec(e: Expression): Option[Expression] = e match {
                          case ae: AggregateExpression =>
                            if (ae.isDistinct || ae.filter.nonEmpty) None
                            else {
                              val rebased = ae.transformUp {
                                case a: Attribute if passSubQ.contains(a.exprId) =>
                                  passSubQ(a.exprId)
                              }
                              if (rebased.references.exists(a =>
                                  a.exprId == gidQ.exprId ||
                                    qCopyToTile.contains(a.exprId))) None
                              else mAggIdx.get(u.cq(inQ(rebased)))
                                .map(i => tile(i): Expression)
                            }
                          case a: Attribute =>
                            // grouping copy → the aligned tile column; the
                            // gid (or anything else) has no tile analogue
                            qCopyToTile.get(a.exprId).map(i => tile(i): Expression)
                          case l: Literal => Some(l)
                          case _ =>
                            val kids = e.children.map(rec)
                            if (kids.forall(_.isDefined))
                              Some(e.withNewChildren(kids.map(_.get)))
                            else None
                        }
                        rec(strip(ne)).map(r => Alias(r, ne.name)(exprId = ne.exprId))
                      }
                      val outs = q.aggregateExpressions.map(mapOut)
                      if (outs.exists(_.isEmpty)) None
                      else Some(Project(outs.map(_.get), scan))
                    }
                  }
                }
              }
            case _ => None
          }
        }
      }.nextOption()
    }
  }

  /** GROUPING SETS rollup — a query `Aggregate` over Spark's `Expand`
    * lowering of CUBE/ROLLUP/GROUPING SETS answered from a PLAIN
    * aggregate tile (the reference's AggregateToAggregate unification
    * with Aggregate.groupSets: testAggregateGroupSetsRollUp/RollUp2 and
    * testAggregateOnProject2-4,
    * core/src/test/java/org/apache/calcite/test/MaterializationTest.java:777,828).
    *
    * The lowered query shape is
    * {{{
    *   Aggregate [gCopies..., gid] [outs]
    *   +- Expand [[pass..., masked grouping exprs..., gidLit], ...]
    *              [passAttrs..., gCopies..., gid]
    *      +- <SPJ child>
    * }}}
    * The rewrite keeps the Aggregate and Expand SHAPES — same per-set
    * null masks, same gid literals, same output exprIds, so grouping()/
    * grouping_id() shells over the gid keep working — and re-bases them
    * onto the tile: grouping expressions map onto tile GROUPING columns,
    * each aggregate call re-aggregates its tile column through a fresh
    * pass-through slot (COUNT→SUM of partial counts, SUM→SUM, MIN→MIN,
    * MAX→MAX), and query conjuncts beyond the tile's pre-filter the tile
    * (grouping-column-expressible, hence exact). Sound exactly as plain
    * rollup is: every grouping set is coarser than the tile grain, so
    * each set's re-aggregation consumes every base row's partial once.
    *
    * At 100 TB this turns a CUBE over the fact table — which Expand
    * would otherwise multiply by the number of grouping sets BEFORE the
    * shuffle — into the same Expand over the (tiny) tile. */
  private def expandRollup(spark: SparkSession, q: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, VirtualColumn}
    import org.apache.spark.sql.catalyst.plans.logical.Expand
    def isNullLit(e: Expression) = e match {
      case Literal(null, _) => true
      case _ => false
    }
    q.child match {
      case Expand(projections, exOut, child) if exOut.nonEmpty &&
          exOut.last.name == VirtualColumn.groupingIdName &&
          projections.nonEmpty && projections.forall(_.last.isInstanceOf[Literal]) &&
          q.groupingExpressions.forall(_.isInstanceOf[Attribute]) &&
          q.groupingExpressions.exists {
            case a: Attribute => a.exprId == exOut.last.exprId; case _ => false } &&
          q.groupingExpressions.forall { case a: Attribute =>
            exOut.exists(_.exprId == a.exprId); case _ => false } =>
        val gidAttr = exOut.last
        val groupIds = q.groupingExpressions
          .collect { case a: Attribute => a.exprId }.toSet
        val groupPos = (0 until exOut.size - 1)
          .filter(j => groupIds.contains(exOut(j).exprId))
        val passPos = (0 until exOut.size - 1)
          .filterNot(j => groupIds.contains(exOut(j).exprId))
        // per grouping position: the one unmasked base expression; per
        // pass-through position: the same child expression in every row
        val baseExpr: Map[Int, Expression] = groupPos.flatMap { j =>
          projections.map(_(j)).find(e => !isNullLit(e)).map(j -> _)
        }.toMap
        val shapeOk =
          groupPos.forall(j => baseExpr.contains(j) &&
            projections.forall(p => isNullLit(p(j)) || p(j) == baseExpr(j))) &&
          passPos.forall(j => projections.forall(_(j) == projections.head(j)))
        if (!shapeOk) None
        else registry.iterator.filterNot(_.stale).flatMap { entry =>
          entry.aggChildSpj.iterator.flatMap { case (gm, am, childM, ms) =>
            (normalize(child) match {
              case Some(qs) if leafGate(qs.leaves, ms.leaves.map(_.canonicalized)) =>
                matchLeaves(qs.leaves, ms.leaves).flatMap { case (sel, extras, sigma) =>
                  if (extras.nonEmpty) None
                  else {
                    val u = new Unifier(qs, ms, sel, extras, sigma)
                    if (!u.covered) None
                    else {
                      val scan = spark.read.parquet(entry.path).queryExecution.analyzed
                      val tile = scan.output
                      val qSub = subMap(child, qs)
                      val mSub = subMap(childM, ms)
                      def inQ(e: Expression) = inline(e, qSub)
                      def inM(e: Expression) = inline(e, mSub)
                      val mGroup: Map[Expression, Int] = am.zipWithIndex.collect {
                        case (ne, i)
                            if !strip(ne).exists(_.isInstanceOf[AggregateExpression]) =>
                          u.cm(inM(strip(ne))) -> i
                      }.reverse.toMap
                      val mGroupPlain: Map[Expression, Int] = am.zipWithIndex.collect {
                        case (ne, i)
                            if !strip(ne).exists(_.isInstanceOf[AggregateExpression]) =>
                          u.cmPlain(inM(strip(ne))) -> i
                      }.reverse.toMap
                      val mAggs: Seq[(Int, AggregateExpression)] = am.zipWithIndex.collect {
                        case (ne, i) => strip(ne) match {
                          case ae: AggregateExpression => Some((i, ae))
                          case _ => None
                        }
                      }.flatten
                      // tile-grouping-column mapper (rollup's, minus the
                      // date_trunc coarsening and compensating leaves)
                      def mapGroupExpr(c: Expression): Option[Expression] = {
                        def rec(e: Expression): Option[Expression] = e match {
                          case l: Literal => Some(l)
                          case _ => mGroupPlain.get(u.cqPlain(e))
                            .map(i => tile(i): Expression)
                            .orElse(mGroup.get(u.cq(e)).map(i => tile(i): Expression))
                            .orElse(e match {
                              case _: Attribute => None
                              case _ if e.children.isEmpty => Some(e)
                              case _ =>
                                val kids = e.children.map(rec)
                                if (kids.forall(_.isDefined))
                                  Some(e.withNewChildren(kids.map(_.get)))
                                else None
                            })
                        }
                        rec(c)
                      }
                      // grouping expressions onto tile grouping columns
                      val mappedBase: Map[Int, Option[Expression]] =
                        groupPos.map(j => j ->
                          mapGroupExpr(u.toM(inQ(baseExpr(j)))).map(e =>
                            if (e.dataType == exOut(j).dataType) e
                            else Cast(e, exOut(j).dataType))).toMap
                      // aggregate calls: re-base pass-through slots to the
                      // child expressions they carry, find the tile column
                      // storing the identical call, re-aggregate it through
                      // a fresh pass-through slot
                      val passSub: Map[ExprId, Expression] =
                        passPos.map(j => exOut(j).exprId -> projections.head(j)).toMap
                      // pass-through slots REUSE the child attr's exprId, so
                      // only the masked copies and the gid are barred from
                      // aggregate arguments (their per-set null masking has
                      // no tile analogue)
                      val maskedIds =
                        (groupPos.map(j => exOut(j).exprId) :+ gidAttr.exprId).toSet
                      val slots = mutable.LinkedHashMap[Int, AttributeReference]()
                      def slot(i: Int): Attribute = slots.getOrElseUpdate(i,
                        AttributeReference(s"_tile_agg_$i", tile(i).dataType)())
                      def mapAggCall(ae: AggregateExpression): Option[Expression] = {
                        if (ae.isDistinct || ae.filter.nonEmpty) return None
                        val rebased = ae.transformUp {
                          case a: Attribute if passSub.contains(a.exprId) => passSub(a.exprId)
                        }.asInstanceOf[AggregateExpression]
                        if (rebased.references.exists(a => maskedIds.contains(a.exprId)))
                          return None
                        val canonArgs =
                          rebased.aggregateFunction.children.map(e => u.cq(inQ(e)))
                        mAggs.collectFirst {
                          case (i, mae)
                              if !mae.isDistinct && mae.filter.isEmpty &&
                                mae.aggregateFunction.getClass ==
                                  rebased.aggregateFunction.getClass &&
                                canonArgs ==
                                  mae.aggregateFunction.children.map(e => u.cm(inM(e))) =>
                            val t = slot(i)
                            val sum: Expression = rebased.aggregateFunction match {
                              case _: Sum => AggregateExpression(Sum(t), Complete, false)
                              case _: Count => Coalesce(Seq(
                                AggregateExpression(Sum(t), Complete, false), Literal(0L)))
                              case _: Min => AggregateExpression(Min(t), Complete, false)
                              case _: Max => AggregateExpression(Max(t), Complete, false)
                              case _ => null
                            }
                            Option(sum).map(s =>
                              if (s.dataType == ae.dataType) s else Cast(s, ae.dataType))
                        }.flatten
                      }
                      def mapOut(ne: NamedExpression): Option[NamedExpression] = ne match {
                        case a: Attribute => Some(a) // grouping copy / gid
                        case _ =>
                          def rec(e: Expression): Option[Expression] = e match {
                            case ae: AggregateExpression => mapAggCall(ae)
                            // grouping copies and the gid survive; a bare
                            // pass-through slot outside an aggregate call
                            // would dangle once its position is dropped
                            case a: Attribute =>
                              if (passSub.contains(a.exprId)) None else Some(a)
                            case _ =>
                              val kids = e.children.map(rec)
                              if (kids.forall(_.isDefined))
                                Some(e.withNewChildren(kids.map(_.get)))
                              else None
                          }
                          rec(strip(ne)).map(r => Alias(r, ne.name)(exprId = ne.exprId))
                      }
                      val residual = u.mapResidual(mapGroupExpr)
                      val outs = q.aggregateExpressions.map(mapOut)
                      if (residual.isEmpty || outs.exists(_.isEmpty) ||
                          mappedBase.values.exists(_.isEmpty)) None
                      else {
                        val filtered: LogicalPlan = residual.get match {
                          case Seq() => scan
                          case rs => Filter(rs.reduce(And), scan)
                        }
                        val keptPos = groupPos :+ (exOut.size - 1)
                        val newOut = keptPos.map(exOut) ++ slots.values.toSeq
                        val newProj = projections.map { p =>
                          groupPos.map(j =>
                            if (isNullLit(p(j))) p(j) else mappedBase(j).get) ++
                            Seq(p.last) ++ slots.keys.toSeq.map(i => tile(i): Expression)
                        }
                        Some(Aggregate(q.groupingExpressions, outs.map(_.get),
                          Expand(newProj, newOut, filtered)))
                      }
                    }
                  }
                }
              case _ => None
            }): Option[LogicalPlan]
          }
        }.nextOption()
      case _ => None
    }
  }

  /** date_trunc formats STRICTLY finer than `f` along the nesting chain
    * (a WEEK boundary does not nest inside MONTH/QUARTER/YEAR, so WEEK
    * only coarsens DAY and below). */
  private def truncFiner(f: Literal): Option[Seq[Literal]] = {
    val chain = Seq("MICROSECOND", "MILLISECOND", "SECOND", "MINUTE", "HOUR",
      "DAY", "MONTH", "QUARTER", "YEAR")
    val name = String.valueOf(f.value).toUpperCase match {
      case "DD" => "DAY"
      case "MM" | "MON" => "MONTH"
      case "YYYY" | "YY" => "YEAR"
      case other => other
    }
    def lits(names: Seq[String]) =
      names.map(n => Literal(org.apache.spark.unsafe.types.UTF8String.fromString(n)))
    if (name == "WEEK") Some(lits(chain.takeWhile(_ != "MONTH")))
    else {
      val i = chain.indexOf(name)
      if (i < 0) None else Some(lits(chain.take(i)))
    }
  }

  // ======================================================================
  // Predicate implication
  // ======================================================================

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

  /** Disjunctive normal form as conjunct-sets, size-capped (a blowup
    * means "don't know" → not covered, which is the sound direction). */
  private def dnf(e: Expression): Option[Seq[Seq[Expression]]] = e match {
    case And(a, b) =>
      for { x <- dnf(a); y <- dnf(b); if x.size * y.size <= 64 }
        yield for { c <- x; d <- y } yield c ++ d
    case Or(a, b) =>
      for { x <- dnf(a); y <- dnf(b); if x.size + y.size <= 64 } yield x ++ y
    // canonicalization collapses 3+-way AND/OR chains into this node
    case op: org.apache.spark.sql.catalyst.expressions.MultiCommutativeOp =>
      val rebuilt: Expression =
        if (op.opCls == classOf[Or]) op.operands.reduceLeft(Or(_, _))
        else if (op.opCls == classOf[And]) op.operands.reduceLeft(And(_, _))
        else op
      if (rebuilt eq op) Some(Seq(Seq(op))) else dnf(rebuilt)
    case other => Some(Seq(Seq(other)))
  }

  /** Does the conjunction of `qConjuncts` imply `m`? The reference
    * SubstitutionVisitor's splitFilter implication, DNF-wise: every
    * disjunct (conjunct-set) of the query's combined predicate must land
    * inside some disjunct of `m`, atom-by-atom (equality or range
    * subsumption) — so `x < 5 OR x = 7` is answerable from a tile
    * filtered to `x < 10 OR x = 7`, and `x > 500 AND y > 6000` from one
    * filtered to `... OR (x > 400 AND y > 5000)`. */
  private def impliesDnf(qConjuncts: Seq[Expression], m: Expression): Boolean = {
    val qAnd = qConjuncts.reduceOption(And)
    (qAnd.flatMap(dnf), dnf(m)) match {
      case (Some(qd), Some(md)) =>
        qd.forall(c => md.exists(d =>
          d.forall(ma => c.exists(qa => qa == ma || implies(qa, ma)))))
      case _ => false
    }
  }

  // ======================================================================
  // Union unification
  // ======================================================================

  /** Unify a query UNION ALL with a registered UNION ALL tile — the
    * reference's UnionToUnionUnifyRule family (SubstitutionVisitor.java:120):
    * the MV's branches must match a sub-MULTISET of the query's branches
    * (canonical equality, any order); matched branches collapse into one
    * tile scan, unmatched branches stay as a compensating union. Failing
    * that, each MV branch may SPJ-unify with a distinct query branch —
    * accepted when every pair yields the SAME tile-level residual and
    * projection, which then distributes over the union (a Filter/Project
    * the optimizer pushed through the Union, re-hoisted — the reference's
    * UnionOnCalcsToUnion / FilterToProject0 shapes). */
  private def unionUnify(spark: SparkSession, u: Union): Option[LogicalPlan] =
    registry.iterator.filterNot(_.stale).flatMap { entry =>
      entry.optimized match {
        case mu: Union if mu.children.size <= u.children.size =>
          exactBranches(spark, entry, u, mu)
            .orElse(spjBranches(spark, entry, u, mu))
        case _ => None
      }
    }.nextOption()

  private def exactBranches(spark: SparkSession, entry: Entry, u: Union,
      mu: Union): Option[LogicalPlan] = {
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
        else Union(scan +: remaining.toSeq)
      // rebind: the new plan's columns take over the union's exprIds
      Some(Project(u.output.zip(replaced.output).map { case (o, n) =>
        Alias(n, o.name)(exprId = o.exprId)
      }, replaced))
    }
  }

  private def spjBranches(spark: SparkSession, entry: Entry, u: Union,
      mu: Union): Option[LogicalPlan] = {
    val scan = spark.read.parquet(entry.path).queryExecution.analyzed
    val tile = scan.output
    // unify one (query branch, MV branch) pair; signature = (residual
    // conjuncts, output exprs) over the SHARED tile attributes
    def unifyPair(qb: LogicalPlan, mb: LogicalPlan)
        : Option[(Seq[Expression], Seq[Expression])] =
      for {
        q <- normalize(qb); m <- normalize(mb)
        (sel, extras, sigma) <- matchLeaves(q.leaves, m.leaves)
        if extras.isEmpty
        un = new Unifier(q, m, sel, extras, sigma)
        if un.covered
        resid <- un.mapResidual(un.mapExpr(_, tile))
        outs <- sequence(q.outputs.map(ne => un.mapExpr(un.toM(strip(ne)), tile)))
      } yield (resid, outs)
    val remaining = mutable.ArrayBuffer(u.children.zipWithIndex: _*)
    val sigs = mu.children.map { mb =>
      val hit = remaining.iterator.map { case (qb, i) => (unifyPair(qb, mb), i) }
        .collectFirst { case (Some(sig), i) => (sig, i) }
      hit.foreach { case (_, i) => remaining.filterInPlace(_._2 != i) }
      hit.map(_._1)
    }
    if (sigs.exists(_.isEmpty)) None
    else {
      val all = sigs.map(_.get)
      val (r0, o0) = all.head
      val uniform = all.tail.forall { case (r, o) =>
        r.size == r0.size && r.zip(r0).forall { case (a, b) => a.semanticEquals(b) } &&
          o.size == o0.size && o.zip(o0).forall { case (a, b) => a.semanticEquals(b) }
      }
      if (!uniform) None
      else {
        val filtered: LogicalPlan =
          if (r0.isEmpty) scan else Filter(r0.reduce(And), scan)
        val rew: LogicalPlan = Project(
          o0.zip(u.output).map { case (e, o) => Alias(e, o.name)() }, filtered)
        val replaced: LogicalPlan =
          if (remaining.isEmpty) rew else Union(rew +: remaining.map(_._1).toSeq)
        Some(Project(u.output.zip(replaced.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, replaced))
      }
    }
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  // ======================================================================
  // The rule
  // ======================================================================

  /** The rewrite rule; idempotent to install once per session. Top-down so
    * the LARGEST answerable subtree wins (an aggregate unifies against an
    * aggregate tile before its join child is consumed by a join tile). */
  final class Rewrite(spark: SparkSession) extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformDown {
        case sub =>
          registry.find(e => !e.stale && e.canonical == sub.canonicalized) match {
            case Some(entry) =>
              val scan = spark.read.parquet(entry.path).queryExecution.analyzed
              // rebind: tile columns take over the replaced subtree's exprIds
              Project(sub.output.zip(scan.output).map { case (o, n) =>
                Alias(n, o.name)(exprId = o.exprId)
              }, scan)
            case None =>
              sub match {
                case agg: Aggregate =>
                  rollup(spark, agg).orElse(expandRollup(spark, agg))
                    .orElse(expandSameLevel(spark, agg)).getOrElse(sub)
                case f: Filter =>
                  spjRewrite(spark, f).orElse(filteredRollup(spark, f)).getOrElse(sub)
                case p @ (_: Project | _: Join) =>
                  spjRewrite(spark, p).getOrElse(sub)
                case un: Union => unionUnify(spark, un).getOrElse(un)
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
