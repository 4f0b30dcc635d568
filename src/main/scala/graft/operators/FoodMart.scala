package graft.operators

import graft.QDef

/** FoodMart-style BI workload — the reference's FoodMartQuerySet
  * (core/src/test/java/org/apache/calcite/test/FoodMartQuerySet.java loads
  * thousands of MDX-generated SQL queries from the hydromatic
  * foodmart-queries artifact; FoodmartTest replays them). The artifact is
  * external, so these port the set's canonical SHAPES — star-join measure
  * rollups, CASE-pivoted crossjoins, distinct-count measures, top-k
  * members, HAVING screens, virtual-cube unions — onto the TPC-H-ish star
  * (lineitem/orders facts; part/supplier/customer/nation/region
  * dimensions).
  *
  * All entries are dual-engine texts (QDef.common): one statement runs
  * through Engine.sql on Spark AND verbatim in the DuckDB oracle.
  * Determinism: double-typed measures aggregate as DECIMAL (order-
  * independent, QDef contract); LIMIT queries carry a unique total order.
  *
  * Scale posture: every query is a fact-scan + broadcast-dimension join +
  * partial aggregate — the shape Catalyst already executes as
  * BroadcastHashJoin with map-side combine; nothing here shuffles the
  * fact table more than once.
  */
object FoodMart {

  val defs: Seq[QDef] = Seq(

    // FoodMartQuerySet shape #1: one measure rolled up by one dimension
    // attribute through the star (time_by_day.the_year × unit_sales ≈
    // order year × quantity).
    QDef.common("foodmart_rollup_year",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS c0,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY EXTRACT(YEAR FROM o_orderdate)"""),

    // Shape #2: two-level drill-down (product_family, product_department)
    // with a dimension filter — family ≈ part type, department ≈ brand;
    // the filter hits the dimension before the join.
    QDef.common("foodmart_drilldown",
      """SELECT p_type AS c0, p_brand AS c1,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  COUNT(*) AS m1
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 15
        |GROUP BY p_type, p_brand"""),

    // Shape #3: distinct-count measure (customer_count) by dimension —
    // the FoodMart "Sales cube" customer_count measure.
    QDef.common("foodmart_distinct_customers",
      """SELECT c_mktsegment AS c0, n_name AS c1,
        |  COUNT(DISTINCT o_custkey) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY c_mktsegment, n_name"""),

    // Shape #4: the MDX crossjoin-of-quarters pivot — quarters become
    // CASE columns (the classic foodmart "rows are product, columns are
    // Q1..Q4 unit sales" layout), a single fact scan.
    QDef.common("foodmart_quarter_pivot",
      """SELECT p_brand AS c0,
        |  CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 1
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q1,
        |  CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 2
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q2,
        |  CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 3
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q3,
        |  CAST(SUM(CASE WHEN EXTRACT(QUARTER FROM o_orderdate) = 4
        |    THEN CAST(l_quantity AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS q4
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand"""),

    // Shape #5: many-way star — fact plus four dimension tables, filters
    // on three different dimensions (the widest FoodMart join shapes hit
    // 5-6 tables the same way).
    QDef.common("foodmart_star_5way",
      """SELECT r_name AS c0, p_type AS c1, o_orderpriority AS c2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  COUNT(*) AS m1
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size BETWEEN 5 AND 20
        |  AND o_orderstatus = 'F'
        |  AND s_acctbal > 0
        |GROUP BY r_name, p_type, o_orderpriority"""),

    // Shape #6: top-k member by measure (MDX TopCount) — deterministic
    // total order via the measure plus the member as tiebreak.
    QDef.common("foodmart_topcount",
      """SELECT p_brand AS c0, COUNT(*) AS m0
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand
        |ORDER BY m0 DESC, c0 LIMIT 10"""),

    // Shape #7: HAVING screen on an aggregate (MDX Filter over members).
    QDef.common("foodmart_having",
      """SELECT n_name AS c0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |HAVING COUNT(*) > 100"""),

    // Shape #8: IN-list member selection on a dimension attribute (MDX
    // member sets render as IN lists).
    QDef.common("foodmart_in_list",
      """SELECT o_orderpriority AS c0, c_mktsegment AS c1, COUNT(*) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY')
        |GROUP BY o_orderpriority, c_mktsegment"""),

    // Shape #9: several measures over one grouping (sum, min, max, row
    // count, and an avg derived as exact decimal sum cast to double, THEN
    // divided — one IEEE division on both engines; decimal division would
    // round at engine-specific scales, and a double AVG at engine-specific
    // orders).
    QDef.common("foodmart_multi_measure",
      """SELECT l_returnflag AS c0, l_linestatus AS c1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  MIN(l_quantity) AS m1, MAX(l_quantity) AS m2, COUNT(*) AS m3,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS m4
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus"""),

    // Shape #10: month-of-year rollup (time_by_day.month_of_year) with a
    // year filter pushed to the fact's date column.
    QDef.common("foodmart_month_rollup",
      """SELECT CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS c0,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM orders
        |WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |GROUP BY EXTRACT(MONTH FROM o_orderdate)"""),

    // Shape #11: virtual cube — UNION ALL of two fact grains (Sales +
    // Warehouse in FoodMart; here order-grain and line-grain measures)
    // re-aggregated above the union.
    QDef.common("foodmart_virtual_cube",
      """SELECT c0, CAST(SUM(m) AS DOUBLE) AS m0 FROM (
        |  SELECT o_orderpriority AS c0, CAST(o_totalprice AS DECIMAL(18,2)) AS m
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderpriority AS c0, CAST(l_extendedprice AS DECIMAL(18,2)) AS m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |) v GROUP BY c0"""),

    // Shape #12: grouped dimension attribute derived by CASE banding
    // (FoodMart yearly_income-style buckets over a numeric attribute).
    QDef.common("foodmart_banding",
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
        |            WHEN c_acctbal < 5000 THEN 'low'
        |            ELSE 'high' END AS c0,
        |  c_mktsegment AS c1, COUNT(*) AS m0
        |FROM customer
        |GROUP BY CASE WHEN c_acctbal < 0 THEN 'negative'
        |              WHEN c_acctbal < 5000 THEN 'low'
        |              ELSE 'high' END, c_mktsegment"""),

    // Shape #13: parallel-period calculated member — each member carries
    // this-period and prior-period measures side by side (MDX
    // ParallelPeriod; FoodMart "unit sales vs last year"). One fact scan,
    // CASE-split by year.
    QDef.common("foodmart_parallel_period",
      """SELECT o_orderpriority AS c0,
        |  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1996
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS cur,
        |  CAST(SUM(CASE WHEN EXTRACT(YEAR FROM o_orderdate) = 1995
        |    THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS prior
        |FROM orders GROUP BY o_orderpriority"""),

    // Shape #14: share-of-total calculated member (MDX [Measures].[x] /
    // ([Measures].[x], [Dim].[All]) — each member's measure over the grand
    // total. The total is a one-row scalar aggregate cross-joined in (a
    // broadcast at scale), not an unpartitioned window over the fact.
    QDef.common("foodmart_share_of_total",
      """SELECT c0, CAST(m AS DOUBLE) AS m0,
        |  CAST(m AS DOUBLE) / CAST(tot AS DOUBLE) AS share
        |FROM (
        |  SELECT n_name AS c0, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS m
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name) t
        |CROSS JOIN (
        |  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS tot
        |  FROM customer) g"""),

    // Shape #15: named members vs 'Other' (MDX picks explicit members and
    // aggregates the remainder — FoodMart "CA, OR and everything else").
    QDef.common("foodmart_members_vs_other",
      """SELECT CASE WHEN n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |            THEN n_name ELSE 'Other' END AS c0,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY CASE WHEN n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |              THEN n_name ELSE 'Other' END"""),

    // Shape #16: NON EMPTY CrossJoin of two dimensions — only member pairs
    // that actually occur in the fact survive (inner joins through the
    // fact impose the non-emptiness, exactly like the MDX NON EMPTY axis).
    QDef.common("foodmart_nonempty_crossjoin",
      """SELECT n_name AS c0, o_orderpriority AS c1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, o_orderpriority"""),

    // Shape #17: multiple distinct-count measures at different grains in
    // one statement (FoodMart customer_count + a product-level distinct).
    QDef.common("foodmart_multi_distinct",
      """SELECT o_orderstatus AS c0,
        |  COUNT(DISTINCT o_custkey) AS customers,
        |  COUNT(DISTINCT l_partkey) AS products,
        |  COUNT(*) AS line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus"""),

    // Shape #18: TopCount members with detail columns carried along — the
    // top-k join-back (rank on one measure, report several others).
    QDef.common("foodmart_topcount_detail",
      """SELECT t.c0, t.m0, CAST(s_acctbal AS DOUBLE) AS acctbal, s_nationkey
        |FROM (
        |  SELECT s_suppkey AS c0,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  GROUP BY s_suppkey
        |  ORDER BY m0 DESC, c0 LIMIT 10) t
        |JOIN supplier ON t.c0 = s_suppkey
        |ORDER BY t.m0 DESC, t.c0""")
  )
}
