package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Materialized-view rewrite: a query matching a registered definition is
  * answered from the stored tile (plan shows the tile scan, not the fact
  * scan), with identical results; non-matching queries are untouched. */
class MaterializedViewSpec extends AnyFunSuite {
  import SparkTestSession._

  private def aggQuery() =
    Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))

  test("exact-match query is rewritten to the tile and results are identical") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    val path = "/tmp/graft_mv/agg_tile"
    val want = aggQuery().collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet

    MaterializedViews.create(spark, "mv_agg", aggQuery(), path)
    val rewritten = aggQuery() // same shape, fresh plan
    val optimized = rewritten.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("Aggregate"), s"aggregate not replaced:\n$optimized")
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(physical.contains("agg_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), "fact table still scanned")
    val got = rewritten.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == want)
    MaterializedViews.drop("mv_agg")
  }

  test("rollup: coarser grouping over the same child re-aggregates the tile") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // the MV stores BARE aggregates (decimal sum, count) — exact under
    // re-aggregation; the query's scalar shell (cast to double) stays on top
    def mvDef() =
      Tables.t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("sum_qty_raw"),
          count(lit(1)).as("cnt"))
    // group by a SUBSET of the MV's keys with re-aggregable calls
    def coarser() =
      Tables.t(spark, sfDir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
    // expected values BEFORE the MV exists — computed from the fact table,
    // so the equality actually pins the re-aggregation
    val want = coarser().collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    MaterializedViews.create(spark, "mv_agg", mvDef(), "/tmp/graft_mv/agg_tile_ru")
    val q = coarser()
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("agg_tile_ru"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact table still scanned:\n$physical")
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
    MaterializedViews.drop("mv_agg")
  }

  test("rollup over a JOIN tile: star-join aggregate MV answers coarser queries") {
    // the reference's AGGREGATE/JOIN MV variants
    // (rel/rules/AbstractMaterializedViewRule.java) unify an aggregate
    // over a join subtree; here the tile is customer x orders and the
    // query regroups the same join more coarsely — at warehouse scale
    // this replaces the fact-dimension join with one tile scan
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def joined() =
      Tables.t(spark, sfDir, "orders").join(Tables.t(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
    def mvDef() = joined()
      .groupBy(col("c_mktsegment"), col("o_orderstatus"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev_raw"),
        count(lit(1)).as("cnt"))
    def coarser() = joined()
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("rev"),
        count(lit(1)).as("n"))
    val want = coarser().collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    MaterializedViews.create(spark, "mv_join_agg", mvDef(), "/tmp/graft_mv/join_tile")
    val q = coarser()
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("join_tile"), s"join tile not scanned:\n$physical")
    assert(!physical.contains("orders.parquet"), s"fact join still executed:\n$physical")
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
    MaterializedViews.drop("mv_join_agg")
  }

  test("filter residual: stronger predicate is answered from the tile") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mvDef() = Tables.t(spark, sfDir, "lineitem").where(col("l_quantity") > 10.0)
    def q() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 10.0 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    // expected values BEFORE the MV exists (direct fact-table evaluation)
    val want = q().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    MaterializedViews.create(spark, "mv_filt", mvDef(), "/tmp/graft_mv/filt_tile")
    val rewritten = q()
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(physical.contains("filt_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact table still scanned:\n$physical")
    val got = rewritten.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == want)
    // a WEAKER predicate is answered by range-union compensation (r14):
    // tile rows plus the base slice where the tile's filter is not true
    def weaker() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 5.0).select("l_orderkey", "l_linenumber")
    MaterializedViews.drop("mv_filt")
    val wantW = weaker().collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    MaterializedViews.create(spark, "mv_filt", mvDef(), "/tmp/graft_mv/filt_tile")
    val w = weaker()
    val wPlan = w.queryExecution.executedPlan.toString
    assert(wPlan.contains("filt_tile") && wPlan.contains("Union"),
      s"weaker predicate should take the range-union path:\n$wPlan")
    assert(w.collect().map(r => (r.getLong(0), r.getInt(1))).toSet == wantW,
      "range-union values diverge from direct evaluation")
    MaterializedViews.drop("mv_filt")
  }

  test("filter subsumption: x > 20 is answered from the x > 10 tile") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mvDef() = Tables.t(spark, sfDir, "lineitem").where(col("l_quantity") > 10.0)
    // the predicate is not syntactically equal to the MV's but IMPLIES it
    def q() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 20.0)
      .select("l_orderkey", "l_quantity")
    val want = q().collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    MaterializedViews.create(spark, "mv_rng", mvDef(), "/tmp/graft_mv/rng_tile")
    val rewritten = q()
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(physical.contains("rng_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact table still scanned:\n$physical")
    val got = rewritten.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(got == want)
    // x > 5 does not imply x > 10, so a tile-only answer is impossible —
    // range-union compensation (r14) serves it as tile UNION ALL the
    // 5 < x <= 10 base slice instead; same for the x >= 10 boundary,
    // whose complement is exactly the x = 10 rows
    def cnt(df: org.apache.spark.sql.DataFrame): Long = df.count()
    def weaker() = Tables.t(spark, sfDir, "lineitem").where(col("l_quantity") > 5.0)
    def boundary() = Tables.t(spark, sfDir, "lineitem").where(col("l_quantity") >= 10.0)
    MaterializedViews.drop("mv_rng")
    val (wantWeaker, wantBoundary) = (cnt(weaker()), cnt(boundary()))
    MaterializedViews.create(spark, "mv_rng", mvDef(), "/tmp/graft_mv/rng_tile")
    val wPlan = weaker().queryExecution.executedPlan.toString
    assert(wPlan.contains("rng_tile") && wPlan.contains("Union"),
      s"weaker range should take the range-union path:\n$wPlan")
    assert(cnt(weaker()) == wantWeaker, "range-union row count diverges (weaker)")
    val bPlan = boundary().queryExecution.executedPlan.toString
    assert(bPlan.contains("rng_tile") && bPlan.contains("Union"),
      s"boundary should take the range-union path:\n$bPlan")
    assert(cnt(boundary()) == wantBoundary, "range-union row count diverges (boundary)")
    MaterializedViews.drop("mv_rng")
  }

  test("disjunctive splitting: x<5 OR x=7 answered from the x<10 OR x=7 tile (r8 #7)") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mvDef() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") < 10 || col("l_quantity") === 17)
    def q() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") < 5 || col("l_quantity") === 17)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
    val want = q().collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    MaterializedViews.create(spark, "mv_or", mvDef(), "/tmp/graft_mv/or_tile")
    val physical = q().queryExecution.executedPlan.toString
    assert(physical.contains("or_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact still scanned:\n$physical")
    assert(q().collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet == want)
    // a query disjunct OUTSIDE the tile's OR (x=30 ∉ x<10 ∨ x=17) must NOT unify
    val miss = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") < 5 || col("l_quantity") === 30)
      .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
    assert(!miss.queryExecution.executedPlan.toString.contains("or_tile"),
      "uncovered disjunct must keep the fact scan")
    MaterializedViews.drop("mv_or")
  }

  test("rollup COMPOSED with filter residual: filtered coarser query over unfiltered tile (r8 #7)") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mvDef() = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("sum_qty_raw"),
        count(lit(1)).as("cnt"))
    // the query filters on a GROUPING column and rolls up to a coarser key:
    // the reference's SubstitutionVisitor composes FilterToFilter with
    // AggregateToAggregate in one unification; previously this shape fell
    // back to the fact scan because the aggregate children differ by the
    // Filter node
    def q() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_returnflag") =!= "R")
      .groupBy(col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
    val want = q().collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    MaterializedViews.create(spark, "mv_rf", mvDef(), "/tmp/graft_mv/rf_tile")
    val physical = q().queryExecution.executedPlan.toString
    assert(physical.contains("rf_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact still scanned:\n$physical")
    assert(q().collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet == want)
    // a filter on a NON-grouping column needs finer-than-tile data
    val miss = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_discount") > 0.05)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    assert(!miss.queryExecution.executedPlan.toString.contains("rf_tile"),
      "non-grouping residual must keep the fact scan")
    MaterializedViews.drop("mv_rf")
  }

  test("rollup over a FILTERED tile: query filter implies the tile filter (r8 #7)") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // tile: per-(flag,status) aggregates over quantity > 10 rows only
    def mvDef() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 10)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("cnt"))
    // wrong: query over quantity > 5 includes rows the tile lacks
    def tooWide() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 5)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    // right: the exact same predicate rolls up fine
    def samePred() = Tables.t(spark, sfDir, "lineitem")
      .where(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val wantSame = samePred().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    MaterializedViews.create(spark, "mv_ft", mvDef(), "/tmp/graft_mv/ft_tile")
    assert(!tooWide().queryExecution.executedPlan.toString.contains("ft_tile"),
      "tile filtered narrower than the query must not answer it")
    val physical = samePred().queryExecution.executedPlan.toString
    assert(physical.contains("ft_tile"), s"tile not scanned:\n$physical")
    assert(samePred().collect().map(r => (r.getString(0), r.getLong(1))).toSet == wantSame)
    MaterializedViews.drop("mv_ft")
  }

  test("rollup of COUNT over an empty tile yields 0, not null (global agg)") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // a filter no row satisfies → the stored tile is EMPTY
    def base() = Tables.t(spark, sfDir, "lineitem").where(col("l_quantity") < 0.0)
    def mvDef() = base().groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
    // global (no GROUP BY) COUNT over the same child: SQL answer is one
    // row with 0 — Sum over the empty tile alone would return null
    def q() = base().agg(count(lit(1)).as("n"))
    val want = q().collect().map(_.getLong(0)).toSeq
    assert(want == Seq(0L))
    MaterializedViews.create(spark, "mv_empty", mvDef(), "/tmp/graft_mv/empty_tile")
    val rewritten = q()
    val physical = rewritten.queryExecution.executedPlan.toString
    assert(physical.contains("empty_tile"), s"tile not scanned:\n$physical")
    val rows = rewritten.collect()
    assert(rows.length == 1 && !rows(0).isNullAt(0) && rows(0).getLong(0) == 0L,
      s"expected 0, got ${rows.toSeq}")
    assert(!rewritten.schema("n").nullable, "COUNT rewrite became nullable")
    MaterializedViews.drop("mv_empty")
  }

  test("rollup of DISTINCT aggregates: exact over tile GROUP columns, rejected otherwise") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // COUNT(DISTINCT l_linestatus) rolls up EXACTLY from a tile grouped by
    // (l_returnflag, l_linestatus): the tile preserves the distinct value
    // set per coarser group (MaterializationTest's CountDistinctQuery family)
    def cd() = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_linestatus")).as("nd"))
    val want = cd().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    MaterializedViews.create(spark, "mv_agg", aggQuery(), "/tmp/graft_mv/agg_tile_cd")
    val q = cd()
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("agg_tile_cd"), s"distinct-over-group-col not rewritten:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact table still scanned:\n$physical")
    assert(q.collect().map(r => (r.getString(0), r.getLong(1))).toSet == want)
    // a DISTINCT over a NON-grouping column needs finer-than-tile data
    val reject = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_quantity")).as("nd"))
    val rejPlan = reject.queryExecution.executedPlan.toString
    assert(!rejPlan.contains("agg_tile_cd"), s"wrongly rewritten:\n$rejPlan")
    MaterializedViews.drop("mv_agg")
  }

  test("non-matching queries are left untouched") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    MaterializedViews.create(spark, "mv_agg", aggQuery(), "/tmp/graft_mv/agg_tile2")
    val other = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"))
    val optimized = other.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("agg_tile"), "unrelated query wrongly rewritten")
    assert(other.count() == 3)
    MaterializedViews.drop("mv_agg")
  }

  test("profiler tile advisor feeds the MV registry (Lattice analogue)") {
    import graft.plans.Profiler
    val li = Tables.t(spark, sfDir, "lineitem")
    val tiles = Profiler.suggestTiles(li,
      Seq("l_returnflag", "l_linestatus", "l_orderkey"), rowBudget = 1000)
    val dims = tiles.map(_._1.toSet)
    // the (flag, status) pair is affordable; anything with orderkey is not
    assert(dims.contains(Set("l_returnflag", "l_linestatus")), tiles.toString)
    assert(!dims.exists(_.contains("l_orderkey")), tiles.toString)
    // widest affordable tile first, and its true cardinality is reported
    val (best, n) = tiles.head
    assert(best.toSet == Set("l_returnflag", "l_linestatus") && n <= 6)
    // the suggested tile is exactly what the rollup rewrite serves from
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    val mv = li.groupBy(best.map(col): _*)
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("sq"),
        count(lit(1)).as("cnt"))
    MaterializedViews.create(spark, "mv_tile", mv, "/tmp/graft_mv/suggested_tile")
    val q = li.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(q.queryExecution.executedPlan.toString.contains("suggested_tile"))
    MaterializedViews.drop("mv_tile")
  }

  test("dropping the view restores direct evaluation") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    MaterializedViews.create(spark, "mv_agg", aggQuery(), "/tmp/graft_mv/agg_tile3")
    MaterializedViews.drop("mv_agg")
    val optimized = aggQuery().queryExecution.optimizedPlan.toString
    assert(!optimized.contains("agg_tile"))
  }
}
