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

  // --- tpcds_s_missingchannel vs its single-scan conditional-agg twin ----

  test("missingchannel twin: conditional aggregation matches the anti-join form") {
    val twoCte = SparkEntry.queries("tpcds_s_missingchannel")(spark, sfDir)
    val oneScan = SparkEntry.queries("tpcds_s_missingchannel_1scan")(spark, sfDir)
    val a = twoCte.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = oneScan.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("missingchannel twin: one fact scan instead of two") {
    def factScans(name: String): Int =
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan.collectLeaves()
        .count(_.output.exists(_.name == "l_extendedprice"))
    // leaves carrying l_returnflag also count — the two-CTE form reads
    // lineitem once for revenue and once for the returns slice
    def lineitemScans(name: String): Int =
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan.collectLeaves()
        .count(_.output.exists(n => n.name == "l_extendedprice" || n.name == "l_returnflag"))
    assert(lineitemScans("tpcds_s_missingchannel") == 2)
    assert(lineitemScans("tpcds_s_missingchannel_1scan") == 1)
    assert(factScans("tpcds_s_missingchannel_1scan") == 1)
  }

  // --- tpcds_s_crossitems_iceberg vs its single-scan window twin (r16) ----

  test("crossitems twin: window membership matches the INTERSECT form") {
    val intersectForm =
      SparkEntry.queries("tpcds_s_crossitems_iceberg")(spark, sfDir)
    val oneScan = SparkEntry.queries("tpcds_s_crossitems_1scan")(spark, sfDir)
    val a = intersectForm.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val b = oneScan.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("crossitems twin: one fact scan instead of five") {
    def factScans(name: String): Int =
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.optimizedPlan.collectLeaves()
        .count(_.output.exists(_.name == "l_extendedprice"))
    assert(factScans("tpcds_s_crossitems_iceberg") == 5,
      "the literal INTERSECT form inlines the cells CTE five times")
    assert(factScans("tpcds_s_crossitems_1scan") == 1)
  }
}
