package graft

import graft.tools.ScaleUp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the derived-scale fixture generator's contract (r10 VERDICT #2):
  * a factor-2 run over sf0.001 must produce
  *   - row counts = factor × source (bounded dims region/nation verbatim),
  *   - zero cross-copy key collisions (distinct keys scale with factor),
  *   - zero orphan FK rows (FK families shift together),
  *   - per-copy join cardinalities equal to source (join count scales
  *     exactly linearly),
  *   - document copy 0 pristine (column-for-column equal to source),
  *   - zero cross-copy exact duplicate texts while within-copy duplicate
  *     structure is preserved (dup-pair count scales with factor),
  *   - cipher distinctness guard: docFactor > 104 is refused.
  */
class ScaleUpSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val outDir: String = {
    val d = java.nio.file.Files.createTempDirectory("scaleup_f2").toString
    ScaleUp.run(spark, sfDir, d, 2, 2)
    d
  }
  private def src(name: String): DataFrame = Tables.t(spark, sfDir, name)
  private def scaled(name: String): DataFrame = Tables.t(spark, outDir, name)

  test("row counts scale by factor; bounded dims verbatim") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem", "events"))
      assert(scaled(t).count() == 2 * src(t).count(), s"table $t")
    for (t <- Seq("documents", "embeddings"))
      assert(scaled(t).count() == 2 * src(t).count(), s"table $t")
    for (t <- Seq("region", "nation"))
      assert(scaled(t).count() == src(t).count(), s"bounded dim $t")
  }

  test("zero cross-copy key collisions: distinct keys scale by factor") {
    def distinctOf(df: DataFrame, c: String): Long =
      df.agg(countDistinct(col(c))).head().getLong(0)
    for ((t, k) <- Seq("orders" -> "o_orderkey", "customer" -> "c_custkey",
        "part" -> "p_partkey", "supplier" -> "s_suppkey",
        "documents" -> "doc_id", "embeddings" -> "vec_id",
        "events" -> "event_id"))
      assert(distinctOf(scaled(t), k) == 2 * distinctOf(src(t), k), s"$t.$k")
  }

  test("zero orphan FK rows after the shift") {
    def orphans(fact: DataFrame, fk: String, dim: DataFrame, pk: String): Long =
      fact.join(dim, fact(fk) === dim(pk), "left_anti").count()
    assert(orphans(scaled("lineitem"), "l_orderkey", scaled("orders"), "o_orderkey") == 0)
    assert(orphans(scaled("lineitem"), "l_partkey", scaled("part"), "p_partkey") == 0)
    assert(orphans(scaled("lineitem"), "l_suppkey", scaled("supplier"), "s_suppkey") == 0)
    assert(orphans(scaled("orders"), "o_custkey", scaled("customer"), "c_custkey") == 0)
  }

  test("join cardinality scales exactly linearly (copies never cross-join)") {
    def joinCount(dir: String): Long =
      Tables.t(spark, dir, "orders").join(Tables.t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey")).count()
    assert(joinCount(outDir) == 2 * joinCount(sfDir))
  }

  test("documents copy 0 is the untouched source, column for column") {
    val maxSrcId = src("documents").agg(max(col("doc_id"))).head().getLong(0)
    val copy0 = scaled("documents").filter(col("doc_id") <= maxSrcId)
    assert(copy0.count() == src("documents").count())
    assert(copy0.exceptAll(src("documents")).count() == 0,
      "copy 0 must match the source exactly (no _c0 suffix, no cipher)")
  }

  test("no cross-copy exact dup texts; within-copy dup structure preserved") {
    def dupPairs(df: DataFrame): Long =
      df.groupBy(col("text")).count().filter(col("count") > 1)
        .agg(coalesce(sum(expr("count * (count - 1) / 2")), lit(0L)).cast("long"))
        .head().getLong(0)
    // each copy preserves the source's exact-dup pairs (a bijection on
    // characters maps equal texts to equal texts and unequal to unequal);
    // distinct ciphers add NO cross-copy pairs
    assert(dupPairs(scaled("documents")) == 2 * dupPairs(src("documents")))
    // distinct text count must scale with factor too (cross-copy images
    // of the same text differ because every fixture text contains letters)
    val srcDistinct = src("documents").agg(countDistinct(col("text"))).head().getLong(0)
    val outDistinct = scaled("documents").agg(countDistinct(col("text"))).head().getLong(0)
    assert(outDistinct == 2 * srcDistinct)
  }

  test("cipher family guard: docFactor > 104 is refused") {
    val ex = intercept[IllegalArgumentException] {
      ScaleUp.run(spark, sfDir, "/tmp/scaleup_should_not_write", 1, 105)
    }
    assert(ex.getMessage.contains("104"))
  }
}
