package graft

import org.scalatest.funsuite.AnyFunSuite

/** The tpcds_s_channels engine plan is a single-scan (brand, segment)
  * pivot while its oracle stays the literal TPC-DS q33/q56 UNION ALL of
  * three per-segment scans. This spec pins (a) bit-identical results
  * between the two forms and (b) the plan property that motivates the
  * rewrite: exactly ONE lineitem scan instead of three. */
class TpcdsChannelsSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val qdef =
    SparkEntry.allDefs.find(_.name == "tpcds_s_channels").get

  test("single-scan pivot matches the UNION ALL oracle form bit-for-bit") {
    val pivot = qdef.fn(spark, sfDir)
    val unionAll = Engine.sql(spark, sfDir, qdef.oracle.get)
    val a = pivot.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val b = unionAll.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(a == b)
  }

  test("plan scans lineitem exactly once") {
    val plan = qdef.fn(spark, sfDir).queryExecution.optimizedPlan
    val scans = plan.collectLeaves().count(
      _.output.exists(_.name == "l_extendedprice"))
    assert(scans == 1, s"expected one lineitem scan, found $scans:\n$plan")
  }
}
