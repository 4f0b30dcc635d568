package graft

import graft.plans.Profiler
import org.scalatest.funsuite.AnyFunSuite

/** Sketch-mode profiler (r8 verdict #3): HLL NDV accuracy against the
  * exact profiler, the one-pass/no-Expand plan property that motivates
  * the mode, and the surprise-driven combination-pruning bound of the
  * reference's ProfilerImpl exploration. */
class ProfilerSketchSpec extends AnyFunSuite {
  import SparkTestSession._

  private val cols =
    Seq("l_returnflag", "l_linestatus", "l_quantity", "l_orderkey",
      "l_partkey", "l_suppkey")
  private def li = Tables.t(spark, sfDir, "lineitem")

  test("sketch NDV lands within 3 sigma of exact; nulls/min/max are exact") {
    val exact = Profiler.profile(li, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    val sketch = Profiler.profileSketch(li, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap
    assert(sketch.keySet == exact.keySet)
    for (c <- cols) {
      val (en, enulls, endv, emin, emax) = exact(c)
      val (sn, snulls, sndv, smin, smax) = sketch(c)
      assert((sn, snulls, smin, smax) == (en, enulls, emin, emax),
        s"$c: non-NDV stats must be exact in sketch mode")
      assert(math.abs(sndv.toDouble - endv) <= 0.15 * endv,
        s"$c: sketch ndv $sndv outside 15% of exact $endv")
    }
  }

  test("sketch profile is ONE pass: single scan, no Expand, hash aggregate") {
    val qe = Profiler.profileSketch(li, cols).queryExecution
    assert(qe.optimizedPlan.collectLeaves().size == 1,
      "sketch mode must scan the table exactly once")
    val physical = qe.executedPlan.toString
    assert(!physical.contains("Expand"),
      "HLL aggregation must not trigger the COUNT(DISTINCT) Expand")
    // the exact profiler needs two jobs for the same reason (its scaladoc)
    assert(Profiler.profile(li, cols).queryExecution
      .optimizedPlan.collectLeaves().size == 2)
  }

  test("sketch tile advisor: same decisions as exact, one Expand-free pass") {
    val dims = Seq("l_returnflag", "l_linestatus", "l_shipdate")
    val budget = 5000L
    val exact = Profiler.suggestTiles(li, dims, budget, maxDims = 2)
    val approx = Profiler.suggestTilesApprox(li, dims, budget, maxDims = 2)
    // at fixture cardinalities (far from the budget boundary and inside
    // HLL's sparse-exact regime for the small subsets) both advisors
    // admit the same tiles in the same widest-affordable-first order
    assert(approx.map(_._1) == exact.map(_._1))
    for (((_, ae), (_, ee)) <- approx.zip(exact))
      assert(math.abs(ae.toDouble - ee) <= 0.15 * ee + 1)
    // the plan property that motivates the sketch path: no Expand
    import org.apache.spark.sql.functions.{approx_count_distinct, struct, col, countDistinct}
    val sketchPlan = li.agg(
      approx_count_distinct(struct(col("l_returnflag"), col("l_shipdate"))),
      approx_count_distinct(struct(col("l_linestatus"), col("l_shipdate"))))
      .queryExecution.executedPlan.toString
    assert(!sketchPlan.contains("Expand"))
    val exactPlan = li.agg(
      countDistinct(struct(col("l_returnflag"), col("l_shipdate"))),
      countDistinct(struct(col("l_linestatus"), col("l_shipdate"))))
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "multi-distinct exact advisory should show the Expand the sketch avoids")
  }

  test("lattice advisor inherits the sketch path (approx = true)") {
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val sg = new graft.plans.LatticeSuggester.Suggester()
    val ord = Tables.t(spark, sfDir, "orders")
    sg.addQuery(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("m"), count(lit(1)).as("n")))
    val lat = sg.latticeSet.head
    val exact = graft.plans.LatticeSuggester
      .suggestTiles(spark, sfDir, lat, rowBudget = 100000L)
    val approx = graft.plans.LatticeSuggester
      .suggestTiles(spark, sfDir, lat, rowBudget = 100000L, approx = true)
    assert(approx.map(_._1) == exact.map(_._1))
  }

  test("FD discovery: sketch screen + exact confirm equals exhaustive exact") {
    val ord = Tables.t(spark, sfDir, "orders")
    val fdCols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val got = Profiler.discoverFds(ord, fdCols).toMap
    // exhaustive exact truth over the same pairs
    val allPairs = for { a <- fdCols; b <- fdCols if a != b } yield (a, b)
    val wantFd = Profiler.functionalDeps(ord, allPairs).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val wantUq = Profiler.uniqueKeys(ord, fdCols).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for ((k, v) <- wantFd) assert(got(k) == v, s"$k: got ${got(k)}, want $v")
    for ((k, v) <- wantUq) assert(got(k) == v, s"$k: got ${got(k)}, want $v")
    // sanity on the fixture's known structure
    assert(got("o_orderkey->o_custkey"), "the key determines everything")
    assert(!got("o_custkey->o_orderstatus"))
    assert(got("unique:o_orderkey") && !got("unique:o_custkey"))
  }

  test("combination exploration: Apriori + surprise pruning bounds the lattice") {
    val stats = Profiler.profileCombos(li, cols, maxDims = 3,
      surpriseThreshold = 0.2, comboBudget = 64)
    val byCols = stats.map(s => s.cols -> s).toMap
    // singletons are always present and retained (the ProfilerImpl seeds)
    for (c <- cols) assert(byCols(Seq(c)).retained)
    // every measured k-combination has ALL its (k-1)-subsets measured AND
    // retained — the Apriori expansion invariant
    for (s <- stats if s.cols.size >= 2; sub <- s.cols.combinations(s.cols.size - 1))
      assert(byCols.get(sub).exists(_.retained),
        s"${s.cols} measured but subset $sub was not a retained parent")
    // the surprise math is the reference's formula
    for (s <- stats) {
      val want =
        if (s.expected + s.actual == 0) 0.0
        else math.abs(s.expected.toDouble - s.actual) / (s.expected.toDouble + s.actual)
      assert(math.abs(s.surprise - want) < 1e-12)
      assert(s.retained == (s.cols.size == 1 || s.surprise >= 0.2))
    }
    // the pruning BOUND: the full 3-level lattice over 6 columns holds
    // C(6,2)+C(6,3) = 35 multi-column spaces; pruning must have refused
    // to measure a strict majority of them (near-unique pairs like
    // (l_orderkey, l_partkey) saturate at the row count — unsurprising —
    // and everything above them is estimated, never measured)
    val measuredMulti = stats.count(_.cols.size >= 2)
    assert(measuredMulti < 35, s"measured $measuredMulti of 35 possible")
    val prunedPairs = stats.filter(s => s.cols.size == 2 && !s.retained)
    assert(prunedPairs.nonEmpty, "expected at least one unsurprising pair")
    // a pair of near-keys saturates at the row count and is never
    // surprising: its actual ≈ expected ≈ |lineitem|
    val okPk = byCols(Seq("l_orderkey", "l_partkey"))
    assert(!okPk.retained && okPk.surprise < 0.05)
  }
}
