package graft

import graft.plans.RelToSql
import org.scalatest.funsuite.AnyFunSuite

/** The full-corpus rel2sql cycle: every query here is re-rendered from its
  * analyzed plan into Spark-dialect SQL, re-parsed and re-executed, and
  * must reproduce the exact result set — all 22 TPC-H queries, 8 of the 10
  * TPC-DS shapes, and a core-operator sample — including the grouping
  * machinery (ROLLUP/CUBE/GROUPING SETS inverted from Expand plans) and
  * window navigation (IGNORE NULLS, NTH_VALUE). This is the reference's
  * RelToSqlConverter whole-corpus test run as a live round trip instead
  * of golden strings.
  */
class TpchCycleSpec extends AnyFunSuite {
  import SparkTestSession._

  private val cycling = Seq("agg_tpch_q1", "tpch_q2", "tpch_q3", "tpch_q4", "tpch_q5", "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q10", "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20", "tpch_q21", "tpch_q22", "tpcds_s_catavg", "tpcds_s_intersect", "tpcds_s_channels", "tpcds_s_orderband", "tpcds_s_multicount", "tpcds_s_salesgrowth", "tpcds_s_yoyratio", "tpcds_s_cumcompare", "tpcds_s_lochierarchy", "tpcds_s_rolluptopk", "tpcds_s_movingdev",
    "tpcds_s_dualrank", "tpcds_s_returnavg", "tpcds_s_quantitystats",
    "tpcds_s_staterollup", "tpcds_s_equalshare", "tpcds_s_dategap",
    "tpcds_s_existschain", "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_grouping_fn", "scan_filter_project", "join_inner_multiway", "sort_limit_offset", "setop_union_all", "setop_intersect", "setop_except", "subq_in", "subq_scalar", "subq_exists_correlated", "subq_not_in", "window_rank_frames", "window_ntile", "window_navigation", "match_recognize_sql", "match_recognize_reluctant", "lateral_posexplode")

  for (q <- cycling) {
    test(s"$q cycles through its regenerated SQL") {
      Tables.registerAll(spark, sfDir)
      val df = SparkEntry.queries(q)(spark, sfDir)
      val regen = RelToSql.convert(df, RelToSql.Spark)
      val a = df.collect().map(_.toString).sorted.toSeq
      val b = spark.sql(regen).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"cycle diverged for $q:\n$regen")
    }
  }


}
