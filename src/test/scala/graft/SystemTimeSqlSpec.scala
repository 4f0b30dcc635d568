package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FOR SYSTEM_TIME AS OF through the injected parser (reference
  * sql/SqlSnapshot.java): correctness on a versioned table and the scale
  * property — on a MATERIALIZED versioned table the period filter is
  * pushed into the parquet scan. */
class SystemTimeSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("snapshot of a materialized SCD2 table: correct rows, filter pushed to scan") {
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, 'v1', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-03-01 00:00:00'),
        |  (1, 'v2', TIMESTAMP '2024-03-01 00:00:00', CAST(NULL AS TIMESTAMP)),
        |  (2, 'w1', TIMESTAMP '2024-02-01 00:00:00', CAST(NULL AS TIMESTAMP)),
        |  (3, 'x1', TIMESTAMP '2024-07-01 00:00:00', CAST(NULL AS TIMESTAMP))
        |AS t(id, payload, valid_from, valid_to)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir).createOrReplaceTempView("scd2_items")

    val q = spark.sql(
      "SELECT id, payload FROM scd2_items FOR SYSTEM_TIME AS OF TIMESTAMP '2024-06-01 00:00:00'")
    val got = q.collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((1, "v2"), (2, "w1"))) // v1 closed, x1 not yet valid

    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("PushedFilters") && phys.contains("valid_from"),
      s"period filter not pushed:\n$phys")
  }

  test("non-versioned tables fall through to the delegate untouched") {
    Tables.registerAll(spark, sfDir)
    // orders has no valid_from/valid_to: Spark's own time-travel error
    intercept[Exception] {
      spark.sql(
        "SELECT * FROM orders FOR SYSTEM_TIME AS OF TIMESTAMP '2024-01-01 00:00:00'").collect()
    }
    // and plain statements never enter the rewrite
    assert(spark.sql("SELECT count(1) FROM orders").head().getLong(0) > 0)
  }
}
