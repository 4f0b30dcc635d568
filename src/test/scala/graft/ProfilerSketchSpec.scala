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
