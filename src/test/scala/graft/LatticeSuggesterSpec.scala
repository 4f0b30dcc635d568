package graft

import graft.plans.{LatticeSuggester, MaterializedViews}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** LatticeSuggester: grow lattices from observed query shapes (reference
  * materialize/LatticeSuggesterTest), then hand the winning tile to the
  * MV machinery and watch the rewriter answer a matching query from it. */
class LatticeSuggesterSpec extends AnyFunSuite {
  import SparkTestSession._

  private def li = Tables.t(spark, sfDir, "lineitem")
  private def ord = Tables.t(spark, sfDir, "orders")
  private def prt = Tables.t(spark, sfDir, "part")

  test("two queries with the same root grow ONE lattice (evolve)") {
    val sg = new LatticeSuggester.Suggester()
    val l1 = sg.addQuery(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("m")))
    assert(l1.exists(_.root == "lineitem"))
    assert(l1.get.steps.map(_.toString) == Seq("lineitem->orders [l_orderkey=o_orderkey]"))
    val l2 = sg.addQuery(
      li.join(prt, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("m")))
    assert(l2.get.steps.size == 2, "second arm did not grow the lattice")
    assert(sg.latticeSet.size == 1, "evolve should merge same-root lattices")
    assert(l2.get.dims == Set("orders.o_orderpriority", "part.p_brand"))
    assert(l2.get.measures.map(_.toString) ==
      Set("SUM(lineitem.l_quantity)", "COUNT(*)"))
  }

  test("different roots found different lattices; join direction decides the root") {
    val sg = new LatticeSuggester.Suggester()
    sg.addQuery(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("m")))
    sg.addQuery(ord.join(Tables.t(spark, sfDir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("m")))
    assert(sg.latticeSet.map(_.root) == Seq("lineitem", "orders"))
  }

  test("snowflake: a two-hop arm keeps its intermediate orientation") {
    val sg = new LatticeSuggester.Suggester()
    val l = sg.addQuery(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.t(spark, sfDir, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("m")))
    assert(l.get.steps.map(_.toString).toSet == Set(
      "lineitem->orders [l_orderkey=o_orderkey]",
      "orders->customer [o_custkey=c_custkey]"))
  }

  test("non-latticeable shapes are rejected: cartesian, no aggregate, outer join") {
    val sg = new LatticeSuggester.Suggester()
    assert(sg.addQuery(li.crossJoin(ord)
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("m"))).isEmpty)
    assert(sg.addQuery(li.select(col("l_orderkey"))).isEmpty)
    assert(sg.addQuery(li.join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("m"))).isEmpty)
    assert(sg.latticeSet.isEmpty)
  }

  test("derived grouping expressions are recorded but excluded from tiles") {
    val sg = new LatticeSuggester.Suggester()
    val l = sg.addQuery(
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("m")))
    assert(l.get.dims.exists(_.startsWith("expr:")), l.get.dims.toString)
    assert(LatticeSuggester.tileDims(l.get) == Seq("o_orderpriority"))
  }

  test("adviseAndMaterialize: one call observes, grows, tiles and registers MVs") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def workloadQ() = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast(DecimalType(28, 4))).as("sum_l_quantity"),
        count(lit(1)).as("cnt"))
    val names = LatticeSuggester.adviseAndMaterialize(spark, sfDir,
      Seq(workloadQ()), rowBudget = 1000L, pathPrefix = "/tmp/graft_mv/advise")
    assert(names == Seq("lattice_lineitem_o_orderpriority"), names.toString)
    // the SAME workload query re-arrives: the advisor's tile answers it
    val user = workloadQ()
    val physical = user.queryExecution.executedPlan.toString
    assert(physical.contains("lattice_lineitem_o_orderpriority"),
      s"advised tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), "fact table still scanned")
    names.foreach(MaterializedViews.drop)
  }

  test("suggested tile materializes and the MV rewriter answers from it") {
    val sg = new LatticeSuggester.Suggester()
    sg.addQuery(li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("sq"),
        count(lit(1)).as("n")))
    val lat = sg.latticeSet.head
    val tiles = LatticeSuggester.suggestTiles(spark, sfDir, lat, rowBudget = 1000L)
    assert(tiles.nonEmpty, "no affordable tile suggested")
    val dims = tiles.head._1
    assert(dims == Seq("o_orderpriority"))

    // materialize the winning tile with re-aggregable measures
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def tileDef() = LatticeSuggester.joinedFrame(spark, sfDir, lat)
      .groupBy(dims.map(col): _*)
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("sq"),
        count(lit(1)).as("n"))
    val want = tileDef().collect().map(_.toString).sorted.toSeq
    MaterializedViews.create(spark, "mv_lattice_tile", tileDef(), "/tmp/graft_mv/lattice_tile")
    val user = tileDef() // the workload query re-arrives
    val physical = user.queryExecution.executedPlan.toString
    assert(physical.contains("lattice_tile"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), "fact table still scanned")
    assert(user.collect().map(_.toString).sorted.toSeq == want)
    MaterializedViews.drop("mv_lattice_tile")
  }
}
