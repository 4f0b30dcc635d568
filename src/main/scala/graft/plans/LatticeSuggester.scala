package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.col

import scala.collection.mutable

/** Lattice suggester — grows star/snowflake lattices from OBSERVED query
  * shapes (reference: core/src/main/java/org/apache/calcite/materialize/
  * LatticeSuggester.java — addQuery extracts each query's join graph,
  * measures and dimensions; `evolve` merges a new query's graph into an
  * existing lattice with the same root, so the lattice GROWS as the
  * workload reveals more arms; getLatticeSet returns the surviving set).
  *
  * Spark-first divergences from the reference's implementation:
  *  - the query graph comes from the ANALYZED Catalyst plan (join trees
  *    are trees of Join nodes over LogicalRelation leaves), so with
  *    per-occurrence vertices the graph is acyclic by construction — the
  *    reference's CycleDetector guard exists because its LatticeSpace
  *    unifies table occurrences first (LatticeSuggester.java:171);
  *  - step direction is the join's syntactic orientation (left→right),
  *    the same convention as the reference's Hop(source=left side);
  *  - a cartesian frame (no equi-step connecting its components) is
  *    rejected outright rather than split into multiple lattices.
  *
  * The suggested lattice feeds the EXISTING advisors: [[Profiler.suggestTiles]]
  * measures true tile cardinalities over [[joinedFrame]], and the winning
  * tile materializes through [[MaterializedViews]] whose rewriter then
  * answers matching queries from the tile (the reference's
  * Lattice → TileSuggester → MaterializationService chain).
  *
  * Scale: addQuery is pure plan analysis — no job runs. Only tile
  * cardinality measurement scans data (one aggregate pass, see
  * Profiler.suggestTiles' scale note).
  */
object LatticeSuggester {

  /** One many-to-one arm of the snowflake: source ⋈ target on key pairs. */
  final case class Step(source: String, target: String, keys: Seq[(String, String)]) {
    override def toString =
      s"$source->$target [${keys.map { case (a, b) => s"$a=$b" }.mkString(",")}]"
  }

  /** An aggregate measure observed in a query. */
  final case class Measure(fn: String, distinct: Boolean, args: Seq[String]) {
    override def toString = {
      val d = if (distinct) "DISTINCT " else ""
      s"$fn($d${args.mkString(", ")})"
    }
  }

  /** A lattice: fact root, snowflake steps, dimension columns, measures.
    * Dims are `table.column` for plain attributes, `expr:<sql>` for
    * derived grouping expressions (the reference's DerivedColRef). */
  final case class Lattice(root: String, steps: Seq[Step],
      dims: Set[String], measures: Set[Measure]) {
    /** Graph growth: union of arms, dims and measures (reference:
      * LatticeSuggester `evolve` / Lattice merge). Step identity is the
      * full (source, target, keys) triple — the nodesByParent dedup. */
    def merge(other: Lattice): Lattice = {
      require(root == other.root, s"cannot merge lattices rooted at $root / ${other.root}")
      Lattice(root, (steps ++ other.steps).distinct,
        dims ++ other.dims, measures ++ other.measures)
    }
  }

  private def tableOf(lr: LogicalRelation): Option[String] = lr.relation match {
    case fs: HadoopFsRelation =>
      fs.location.rootPaths.headOption.map(_.getName
        .stripSuffix(".parquet").stripSuffix(".orc").stripSuffix(".csv"))
    case _ => None
  }

  /** Extract (root, steps, attr→table map) from a join tree; None when the
    * shape is not a connected acyclic equi-join frame. */
  private def frame(plan: LogicalPlan): Option[(String, Seq[Step], Map[ExprId, (String, String)])] = {
    val attrTable = mutable.Map.empty[ExprId, (String, String)]
    val tables = mutable.ArrayBuffer.empty[String]
    val steps = mutable.ArrayBuffer.empty[Step]
    var ok = true

    def tablesUnder(p: LogicalPlan): Set[String] = p.collect {
      case lr: LogicalRelation => tableOf(lr).getOrElse("")
    }.toSet

    def walk(p: LogicalPlan): Unit = p match {
      case SubqueryAlias(_, c) => walk(c)
      case ResolvedHint(c, _) => walk(c)
      case Project(_, c) => walk(c)
      case Filter(_, c) => walk(c)
      case j @ Join(l, r, joinType, cond, _) =>
        if (joinType != org.apache.spark.sql.catalyst.plans.Inner) ok = false
        walk(l); walk(r)
        val leftTables = tablesUnder(l)
        val pairs = cond.toSeq
          .flatMap(c => splitConjuncts(c))
          .collect { case EqualTo(a: AttributeReference, b: AttributeReference)
              if attrTable.contains(a.exprId) && attrTable.contains(b.exprId) =>
            (attrTable(a.exprId), attrTable(b.exprId))
          }
        if (pairs.isEmpty) ok = false // cartesian or non-equi frame
        // orient every pair left→right (the reference's Hop convention)
        val oriented = pairs.map { case (ta, tb) =>
          if (leftTables.contains(ta._1)) (ta, tb) else (tb, ta)
        }
        for (((st, _), grp) <- oriented.groupBy(p => (p._1._1, p._2._1))) {
          steps += Step(grp.head._1._1, grp.head._2._1,
            grp.map { case (a, b) => (a._2, b._2) })
        }
      case lr: LogicalRelation =>
        tableOf(lr) match {
          case Some(t) =>
            tables += t
            lr.output.foreach(a => attrTable(a.exprId) = (t, a.name))
          case None => ok = false
        }
      case _ => ok = false
    }
    walk(plan)
    if (!ok || tables.isEmpty) return None
    // root = the unique vertex with no inward edge
    val targets = steps.map(_.target).toSet
    val roots = tables.distinct.filterNot(targets)
    // connectivity: every non-root table must be some step's target
    if (roots.size != 1 || targets.size != tables.distinct.size - 1) None
    else Some((roots.head, steps.toSeq.distinct, attrTable.toMap))
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** The workload-observing suggester. Thread-confined like a session. */
  final class Suggester(evolve: Boolean = true) {
    private val byRoot = mutable.LinkedHashMap.empty[String, Lattice]

    /** Observe one query; returns the lattice it joined or founded, None
      * when the shape is not latticeable (no aggregate, non-inner joins,
      * cartesian, subquery leaves). */
    def addQuery(df: DataFrame): Option[Lattice] = {
      val agg = df.queryExecution.analyzed.collectFirst { case a: Aggregate => a }
      agg.flatMap { a =>
        frame(a.child).map { case (root, steps, attrs) =>
          def ref(e: Expression): String = e match {
            case at: AttributeReference if attrs.contains(at.exprId) =>
              val (t, c) = attrs(at.exprId); s"$t.$c"
            case Literal(_, _) => "*"
            case other => s"expr:${other.sql}"
          }
          val dims = a.groupingExpressions.map(ref).toSet
          // measure args look THROUGH casts: the engine's determinism
          // contract routes sums via decimal casts, and the measure's
          // identity is the underlying column (the reference's BaseColRef),
          // not the re-aggregation-safe cast around it
          def mref(e: Expression): String = e match {
            case c: Cast => mref(c.child)
            case other => ref(other)
          }
          val measures = a.aggregateExpressions.flatMap(_.collect {
            case ae: AggregateExpression =>
              Measure(ae.aggregateFunction.prettyName.toUpperCase,
                ae.isDistinct,
                ae.aggregateFunction.children.filter(_.dataType != org.apache.spark.sql.types.NullType)
                  .map(mref) match { case Nil => Seq("*"); case xs => xs })
          }).toSet
          val lat = Lattice(root, steps, dims, measures)
          val grown = byRoot.get(root) match {
            case Some(prev) if evolve => prev.merge(lat)
            case _ => lat
          }
          byRoot(root) = grown
          grown
        }
      }
    }

    /** The surviving lattices, in first-seen root order (reference:
      * getLatticeSet — obsolete lattices are already merged away here
      * because growth happens in place per root). */
    def latticeSet: Seq[Lattice] = byRoot.values.toSeq
  }

  /** Materialize the lattice's join as a DataFrame (root first, arms in
    * step order — every arm a broadcast-friendly many-to-one join). */
  def joinedFrame(spark: SparkSession, sfDir: String, lattice: Lattice): DataFrame =
    lattice.steps.foldLeft(graft.Tables.t(spark, sfDir, lattice.root)) { (acc, s) =>
      val cond = s.keys.map { case (a, b) => col(a) === col(b) }.reduce(_ && _)
      acc.join(graft.Tables.t(spark, sfDir, s.target), cond)
    }

  /** Plain-attribute dimension columns of the lattice (derived dims are
    * not tileable — the reference skips expression measures the same way,
    * LatticeSuggester.java "Cannot handle expressions ... yet"). */
  def tileDims(lattice: Lattice): Seq[String] =
    lattice.dims.toSeq.filterNot(_.startsWith("expr:")).map(_.split('.').last).sorted

  /** Suggest tiles for a grown lattice: true grouped cardinality of every
    * dim subset (one pass, Profiler.suggestTiles), affordable ones only.
    * `approx = true` switches to the HLL advisor
    * (Profiler.suggestTilesApprox) — one Expand-free pass, the form that
    * survives wide dimension sets; the reference's ProfilerImpl is the
    * sketched path for exactly this reason. */
  def suggestTiles(spark: SparkSession, sfDir: String, lattice: Lattice,
      rowBudget: Long, maxDims: Int = 2,
      approx: Boolean = false): Seq[(Seq[String], Long)] = {
    val df = joinedFrame(spark, sfDir, lattice)
    if (approx) Profiler.suggestTilesApprox(df, tileDims(lattice), rowBudget, maxDims)
    else Profiler.suggestTiles(df, tileDims(lattice), rowBudget, maxDims)
  }

  /** The whole advisory loop in one call — the reference's
    * workload → LatticeSuggester → tile → MaterializationService chain:
    * observe the workload, grow lattices, measure tiles, and MATERIALIZE
    * the widest affordable tile per lattice (re-aggregable SUM/COUNT
    * measures over the observed measure columns) so the MV rewriter
    * starts answering matching rollups from it. Returns the created MV
    * names. Tiles store BARE decimal sums + counts (exact under
    * re-aggregation, per the MV contract).
    *
    * Scale: one cardinality pass + one tile write per lattice; every
    * later matching query replaces its fact-scan star join with one tile
    * scan — at 100 TB that is the entire point of the lattice machinery.
    */
  def adviseAndMaterialize(spark: SparkSession, sfDir: String,
      workload: Seq[DataFrame], rowBudget: Long, pathPrefix: String,
      maxDims: Int = 2, approx: Boolean = false): Seq[String] = {
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum}
    val sg = new Suggester()
    workload.foreach(sg.addQuery)
    sg.latticeSet.flatMap { lat =>
      val tiles = suggestTiles(spark, sfDir, lat, rowBudget, maxDims, approx)
      tiles.headOption.map { case (dims, _) =>
        // measured SUM args that are plain lattice columns become exact
        // decimal sums in the tile; COUNT(*) is always included
        val sumCols = lat.measures.toSeq
          .filter(m => m.fn == "SUM" && !m.distinct)
          .flatMap(_.args.filterNot(a => a == "*" || a.startsWith("expr:")))
          .distinct.sorted
        val aggs = sumCols.map(a =>
          fsum(col(a.split('.').last)
            .cast(org.apache.spark.sql.types.DecimalType(28, 4)))
            .as(s"sum_${a.split('.').last}")) :+
          fcount(flit(1)).as("cnt")
        val name = s"lattice_${lat.root}_${dims.mkString("_")}"
        val tileDef = joinedFrame(spark, sfDir, lat)
          .groupBy(dims.map(col): _*)
          .agg(aggs.head, aggs.tail: _*)
        MaterializedViews.create(spark, name, tileDef, s"$pathPrefix/$name")
        name
      }
    }
  }
}
