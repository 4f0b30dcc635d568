package graft

import graft.plans.ColumnOrigins
import graft.plans.ColumnOrigins.Origin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-origin lineage over analyzed plans — the expectations mirror the
  * reference's RelMetadataTest column-origin cases
  * (reference: core/src/test/java/org/apache/calcite/test/RelMetadataTest.java
  * testColumnOrigins* — straight copy non-derived, expression/aggregate
  * derived, union merging both branches, constants with no origins). */
class ColumnOriginsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def li = Tables.t(spark, sfDir, "lineitem")
  private def orders = Tables.t(spark, sfDir, "orders")

  private def originMap(df: org.apache.spark.sql.DataFrame) =
    ColumnOrigins.origins(df).toMap

  test("straight copy and rename are non-derived") {
    val m = originMap(li.select(col("l_orderkey"), col("l_tax").as("t")))
    assert(m("l_orderkey") == Set(Origin("lineitem", "l_orderkey", false)))
    assert(m("t") == Set(Origin("lineitem", "l_tax", false)))
  }

  test("expressions derive from every referenced column") {
    val m = originMap(li.select(
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net")))
    assert(m("net") == Set(
      Origin("lineitem", "l_extendedprice", true),
      Origin("lineitem", "l_discount", true)))
  }

  test("aggregates: group keys copy, calls derive, COUNT(*) has no origins") {
    val m = originMap(
      li.groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("q"), count(lit(1)).as("n")))
    assert(m("l_returnflag") == Set(Origin("lineitem", "l_returnflag", false)))
    assert(m("q") == Set(Origin("lineitem", "l_quantity", true)))
    assert(m("n") == Set.empty[Origin])
  }

  test("joins keep each side's origins; filters and sorts pass through") {
    val j = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .where(col("o_totalprice") > 0)
      .orderBy(col("l_orderkey"))
      .select(col("l_partkey"), col("o_orderpriority"))
    val m = originMap(j)
    assert(m("l_partkey") == Set(Origin("lineitem", "l_partkey", false)))
    assert(m("o_orderpriority") == Set(Origin("orders", "o_orderpriority", false)))
  }

  test("union merges the origins of every branch by ordinal") {
    val u = li.select(col("l_orderkey").as("k"))
      .union(orders.select(col("o_orderkey").as("k")))
    assert(originMap(u)("k") == Set(
      Origin("lineitem", "l_orderkey", false),
      Origin("orders", "o_orderkey", false)))
  }

  test("window and generator outputs are derived") {
    import org.apache.spark.sql.expressions.Window
    val w = li.select(col("l_orderkey"),
      row_number().over(
        Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber")))
        .as("rn"))
    val mw = originMap(w)
    assert(mw("rn").forall(_.derived) && mw("rn").nonEmpty)
    val g = orders.select(col("o_orderkey"),
      explode(split(col("o_orderpriority"), "-")).as("piece"))
    assert(originMap(g)("piece") == Set(Origin("orders", "o_orderpriority", true)))
  }

  test("values and object-boundary leaves contribute no origins") {
    import spark.implicits._
    val v = Seq((1, "a")).toDF("x", "y")
    assert(originMap(v)("x") == Set.empty[Origin])
    val rdd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("z",
          org.apache.spark.sql.types.IntegerType))))
    assert(originMap(rdd)("z") == Set.empty[Origin])
  }

  test("originsDf pins the demo plan lineage (the registry oracle rows)") {
    val rows = ColumnOrigins.originsDf(
      graft.plans.RelToSqlDemo.demoPlan(spark, sfDir))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getBoolean(3)))
    assert(rows.toSeq == Seq(
      ("n_name", "nation", "n_name", false),
      ("avg_src", "customer", "c_acctbal", true)))
  }
}
