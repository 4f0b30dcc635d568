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
        |ORDER BY t.m0 DESC, t.c0"""),

    // ---- second tranche (r7 verdict #4): semi-additive measures, ----------
    // ---- multi-hierarchy drilldown, TopCount with ties, and the -----------
    // ---- calculated-member family around them -----------------------------

    // Shape #19: SEMI-ADDITIVE measure — the warehouse-cube closing
    // balance: LAST over the time hierarchy (each customer's latest
    // order), then SUM over the customer dimension. The non-additive
    // time step is a per-key window top-1, not a self-join.
    QDef.common("foodmart_semiadd_closing",
      """SELECT n_name AS c0,
        |  CAST(SUM(last_price) AS DOUBLE) AS m0
        |FROM (
        |  SELECT o_custkey, last_price FROM (
        |    SELECT o_custkey, CAST(o_totalprice AS DECIMAL(18,2)) AS last_price,
        |      ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) w
        |  WHERE rn = 1) lasto
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name"""),

    // Shape #20: semi-additive AVERAGE over time of per-period sums —
    // average monthly sales per priority (AVG over the time hierarchy of
    // a SUM over everything else; derived as decimal-sum / count so both
    // engines divide once, in IEEE doubles).
    QDef.common("foodmart_semiadd_avg_period",
      """SELECT c0, CAST(SUM(m) AS DOUBLE) / COUNT(*) AS m0 FROM (
        |  SELECT o_orderpriority AS c0,
        |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders
        |  GROUP BY o_orderpriority, EXTRACT(YEAR FROM o_orderdate),
        |    EXTRACT(MONTH FROM o_orderdate)) per_month
        |GROUP BY c0"""),

    // Shape #21: MULTI-HIERARCHY drilldown — the calendar hierarchy
    // (year, quarter) crossed with a second hierarchy over the same time
    // dimension (fiscal half), the MDX two-hierarchies-of-one-dimension
    // axis shape.
    QDef.common("foodmart_multi_hierarchy",
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS c0,
        |  CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS c1,
        |  CASE WHEN EXTRACT(QUARTER FROM o_orderdate) <= 2 THEN 'H1'
        |       ELSE 'H2' END AS c2,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM orders
        |GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(QUARTER FROM o_orderdate),
        |  CASE WHEN EXTRACT(QUARTER FROM o_orderdate) <= 2 THEN 'H1' ELSE 'H2' END"""),

    // Shape #22: geographic × product multi-hierarchy drill — two levels
    // of each hierarchy on one axis (region > nation crossed with
    // type > brand), the deepest FoodMart drill layout.
    QDef.common("foodmart_multi_hierarchy_geo",
      """SELECT r_name AS c0, n_name AS c1, p_type AS c2, p_brand AS c3,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE p_size < 10
        |GROUP BY r_name, n_name, p_type, p_brand"""),

    // Shape #23: TopCount WITH TIES — RANK (not row_number) against the
    // measure, keeping every member tied at the cutoff (the MDX
    // TopCount + HeadTies refinement the first-tranche topcount lacks).
    QDef.common("foodmart_topcount_ties",
      """SELECT c0, m0 FROM (
        |  SELECT p_type AS c0, COUNT(*) AS m0,
        |    RANK() OVER (ORDER BY COUNT(*) DESC) AS rk
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_type) t
        |WHERE rk <= 5
        |ORDER BY m0 DESC, c0"""),

    // Shape #24: BottomCount with a non-empty floor — the weakest members
    // that still have fact rows (MDX BottomCount's NON EMPTY companion).
    QDef.common("foodmart_bottomcount",
      """SELECT n_name AS c0, COUNT(*) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY m0 ASC, c0 LIMIT 5"""),

    // Shape #25: YTD running sum (MDX Sum(YTD(), measure)) — cumulative
    // within each year over the month level, one window over the monthly
    // rollup.
    QDef.common("foodmart_ytd_running",
      """SELECT y AS c0, mo AS c1, CAST(m AS DOUBLE) AS m0,
        |  CAST(SUM(m) OVER (PARTITION BY y ORDER BY mo) AS DOUBLE) AS ytd
        |FROM (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders
        |  GROUP BY EXTRACT(YEAR FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate)) t"""),

    // Shape #26: member RANK as a reported column (MDX Rank(member, set))
    // — every member carries its position under the measure order.
    QDef.common("foodmart_member_rank",
      """SELECT n_name AS c0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  RANK() OVER (ORDER BY SUM(CAST(o_totalprice AS DECIMAL(18,2))) DESC) AS rk
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name"""),

    // Shape #27: percent-of-parent in a two-level hierarchy — each
    // nation's share within its region (MDX member / member.Parent), the
    // parent total as a partition window, no second scan.
    QDef.common("foodmart_pct_of_parent",
      """SELECT c0, c1, CAST(m AS DOUBLE) AS m0,
        |  CAST(m AS DOUBLE) / CAST(SUM(m) OVER (PARTITION BY c0) AS DOUBLE) AS pct
        |FROM (
        |  SELECT r_name AS c0, n_name AS c1,
        |    SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS m
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name) t"""),

    // Shape #28: Filter(...).Count — per parent, how many children clear
    // a measure threshold (MDX Count(Filter(children, measure > X))).
    QDef.common("foodmart_filter_count",
      """SELECT c0, COUNT(*) AS n_big FROM (
        |  SELECT p_type AS c0, p_brand AS c1,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_type, p_brand
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 500) big
        |GROUP BY c0"""),

    // Shape #29: MEDIAN measure (MDX Median) — continuous percentile per
    // member; both engines interpolate over the same sorted values.
    QDef.common("foodmart_median_measure",
      """SELECT l_returnflag AS c0,
        |  PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY l_quantity) AS m0
        |FROM lineitem
        |GROUP BY l_returnflag"""),

    // Shape #30: two fact grains joined at a dimension — sales vs
    // returned per nation with a derived return-rate (the Sales-vs-
    // Warehouse virtual-cube ratio member; LEFT JOIN keeps nations with
    // no returns).
    QDef.common("foodmart_two_fact_ratio",
      """SELECT a.c0, CAST(a.m AS DOUBLE) AS sales,
        |  CAST(COALESCE(b.m, CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS returned,
        |  CAST(COALESCE(b.m, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
        |    / CAST(a.m AS DOUBLE) AS return_rate
        |FROM (
        |  SELECT n_name AS c0, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS m
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name) a
        |LEFT JOIN (
        |  SELECT n_name AS c0, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS m
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY n_name) b ON a.c0 = b.c0"""),

    // Shape #31: crossjoin with NON EMPTY OFF — the full dimension
    // product survives even where no fact rows exist (all regions × all
    // priorities, zeros filled), the axis shape the inner-join tranche-1
    // crossjoin cannot produce.
    QDef.common("foodmart_allmembers_crossjoin",
      """SELECT r_name AS c0, pr AS c1,
        |  COALESCE(m0, 0) AS m0
        |FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderpriority AS pr FROM orders) p
        |LEFT JOIN (
        |  SELECT r_regionkey AS rk2, o_orderpriority AS pr2, COUNT(*) AS m0
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region r2 ON n_regionkey = r2.r_regionkey
        |  WHERE o_orderstatus = 'P'
        |  GROUP BY r_regionkey, o_orderpriority) f
        |ON r_regionkey = rk2 AND pr = pr2"""),

    // Shape #32: tuple slicer — the MDX WHERE clause with a SET of
    // member tuples ({(Q1 1996, EUROPE), (Q2 1996, ASIA)}): row-value IN
    // over composite tuples, the sub-cube restriction no single-column
    // filter expresses.
    QDef.common("foodmart_tuple_slicer",
      """SELECT p_type AS c0,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE (CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT), r_name)
        |      IN ((1, 'EUROPE'), (2, 'ASIA'))
        |  AND EXTRACT(YEAR FROM o_orderdate) = 1996
        |GROUP BY p_type"""),

    // Shape #33: aggregate of a named set — MDX's Aggregate(TopCount(...))
    // calculated member: the top-5 nations by revenue become ONE combined
    // member, reported beside the all-nations total and its share.
    QDef.common("foodmart_topcount_aggregate",
      """WITH by_nation AS (
        |  SELECT n_name, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY n_name),
        |ranked AS (
        |  SELECT n_name, rev,
        |    ROW_NUMBER() OVER (ORDER BY rev DESC, n_name) AS rk
        |  FROM by_nation)
        |SELECT CAST(SUM(CASE WHEN rk <= 5 THEN rev END) AS DOUBLE) AS top5_rev,
        |  CAST(SUM(rev) AS DOUBLE) AS total_rev,
        |  CAST(SUM(CASE WHEN rk <= 5 THEN rev END) AS DOUBLE)
        |    / CAST(SUM(rev) AS DOUBLE) AS top5_share
        |FROM ranked"""),

    // Shape #34b: VISUAL TOTALS — the parent member's total recomputed
    // over only the SELECTED children (MDX VisualTotals: picking three
    // nations makes each region's "total" the sum of just those), child
    // rows union'd with the recomputed parent rows.
    QDef.common("foodmart_visual_totals",
      """WITH sel AS (
        |  SELECT n_nationkey, n_name, n_regionkey FROM nation
        |  WHERE n_name IN ('NATION_2', 'NATION_7', 'NATION_11', 'NATION_16', 'NATION_21')
        |), child AS (
        |  SELECT r_name AS c0, n_name AS c1,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN sel ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name
        |)
        |SELECT c0, c1, m0 FROM child
        |UNION ALL
        |SELECT c0, '*VISUAL_TOTAL*' AS c1,
        |  CAST(SUM(CAST(m0 AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM child GROUP BY c0"""),

    // Shape #34: DRILLTHROUGH — the detail rows behind one aggregate
    // cell (year 1996 × EUROPE × returnflag R), the MDX DRILLTHROUGH
    // statement's relational form: same slicers, base-grain output,
    // deterministic order + fetch.
    QDef.common("foodmart_drillthrough",
      """SELECT l_orderkey AS c0, l_linenumber AS c1, n_name AS c2,
        |  l_quantity AS m0, l_extendedprice AS m1
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' AND l_returnflag = 'R'
        |  AND EXTRACT(YEAR FROM o_orderdate) = 1996
        |ORDER BY l_orderkey, l_linenumber
        |LIMIT 50"""),

    // ---- tranche 4 (r8 verdict #2): named-set algebra, Descendants,
    // ---- ParallelPeriod across hierarchy edges, correlated ranks -------

    // Shape #35: named-set UNION — two named sets of product members
    // ([High Volume] by a fact screen, [Premium] by an attribute screen)
    // unioned into one set, measures over the combined membership (MDX
    // Union(set1, set2) named-set algebra; FoodMartQuerySet's named-set
    // queries). The member screens are one fact aggregate + one dimension
    // scan; the membership probe is a semi-join.
    QDef.common("foodmart_namedset_union",
      """WITH high_volume AS (
        |  SELECT l_partkey AS pk FROM lineitem GROUP BY l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 900),
        |premium AS (
        |  SELECT p_partkey AS pk FROM part WHERE p_retailprice > 990),
        |named_set AS (SELECT pk FROM high_volume UNION SELECT pk FROM premium)
        |SELECT p_brand AS c0, COUNT(*) AS m0,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey IN (SELECT pk FROM named_set)
        |GROUP BY p_brand"""),

    // Shape #36: named-set EXCEPT — [High Volume] minus [Premium]
    // (MDX Except(set1, set2)): high-turnover products that are NOT
    // premium-priced.
    QDef.common("foodmart_namedset_except",
      """WITH high_volume AS (
        |  SELECT l_partkey AS pk FROM lineitem GROUP BY l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 900),
        |premium AS (
        |  SELECT p_partkey AS pk FROM part WHERE p_retailprice > 990),
        |named_set AS (SELECT pk FROM high_volume EXCEPT SELECT pk FROM premium)
        |SELECT p_type AS c0, COUNT(*) AS m0,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey IN (SELECT pk FROM named_set)
        |GROUP BY p_type"""),

    // Shape #37: named-set INTERSECT — members in BOTH screens (MDX
    // Intersect(set1, set2)); the 44-member set at sf0.01 keeps the probe
    // side broadcastable at any scale (membership shrinks as screens
    // tighten).
    QDef.common("foodmart_namedset_intersect",
      """WITH high_volume AS (
        |  SELECT l_partkey AS pk FROM lineitem GROUP BY l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 900),
        |premium AS (
        |  SELECT p_partkey AS pk FROM part WHERE p_retailprice > 990),
        |named_set AS (SELECT pk FROM high_volume INTERSECT SELECT pk FROM premium)
        |SELECT p_brand AS c0, COUNT(*) AS m0,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_partkey IN (SELECT pk FROM named_set)
        |GROUP BY p_brand"""),

    // Shape #38: Generate(region set, TopCount(nations, 1)) — for every
    // region, its top nation by revenue becomes a member of the generated
    // set; measures then roll up over exactly those members (the MDX
    // Generate named-set builder). Deterministic: rank ties break on name.
    QDef.common("foodmart_namedset_generate",
      """WITH per_nation AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |generated AS (
        |  SELECT r_name, n_name FROM (
        |    SELECT r_name, n_name,
        |      RANK() OVER (PARTITION BY r_name ORDER BY m DESC, n_name) AS rk
        |    FROM per_nation) t WHERE rk = 1)
        |SELECT g.r_name AS c0, g.n_name AS c1,
        |  COUNT(DISTINCT o_custkey) AS m0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN generated g ON nation.n_name = g.n_name
        |GROUP BY g.r_name, g.n_name"""),

    // Shape #39: Descendants([Geography].[EUROPE], [Nation]) — all
    // members one level below a named member, with measures (MDX
    // Descendants at an explicit depth).
    QDef.common("foodmart_descendants_depth",
      """SELECT r_name AS c0, n_name AS c1,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |GROUP BY r_name, n_name"""),

    // Shape #40: Descendants(..., , LEAVES) — the leaf members under a
    // named ancestor (suppliers under EUROPE), detail attributes carried,
    // deterministic unique order + fetch (the leaf set is large; MDX
    // clients always page it).
    QDef.common("foodmart_descendants_leaves",
      """SELECT n_name AS c0, s_suppkey AS c1,
        |  CAST(s_acctbal AS DOUBLE) AS m0
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |ORDER BY n_name, s_suppkey
        |LIMIT 40"""),

    // Shape #41: ParallelPeriod([Time].[Quarter], 1) ACROSS the year
    // edge — Q1's parallel period is the PREVIOUS YEAR's Q4, which the
    // CASE-split form (foodmart_parallel_period) cannot express; a lag
    // over the composite (year, quarter) order walks the hierarchy edge.
    QDef.common("foodmart_parallel_period_quarter_edge",
      """WITH q AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1, 2)
        |SELECT y, q, CAST(m AS DOUBLE) AS cur,
        |  CAST(LAG(m) OVER (ORDER BY y, q) AS DOUBLE) AS prior_period
        |FROM q"""),

    // Shape #42: ParallelPeriod([Time].[Year], 1) at MONTH grain — the
    // same month one year back (lag along the month's own series, the
    // other hierarchy-edge traversal: partition by the child level, step
    // the parent level).
    QDef.common("foodmart_parallel_period_month_year",
      """WITH m AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |    COUNT(*) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1, 2)
        |SELECT y, mo, n, CAST(rev AS DOUBLE) AS cur,
        |  CAST(LAG(rev) OVER (PARTITION BY mo ORDER BY y) AS DOUBLE)
        |    AS same_month_prior_year
        |FROM m"""),

    // Shape #43: growth vs the parallel period — the calculated member
    // (cur - prior) / prior with the standard first-period NULL and a
    // NULLIF division guard; operands stay decimal-exact until one final
    // double division.
    QDef.common("foodmart_period_growth_pct",
      """WITH q AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1, 2)
        |SELECT y, q, CAST(m AS DOUBLE) AS cur,
        |  CAST(m - LAG(m) OVER (ORDER BY y, q) AS DOUBLE)
        |    / NULLIF(CAST(LAG(m) OVER (ORDER BY y, q) AS DOUBLE), 0.0)
        |    AS growth
        |FROM q"""),

    // Shape #44: correlated rank across TWO hierarchies — each
    // (region, priority) cell ranked within its region (geography
    // hierarchy) AND within its priority (order hierarchy); MDX RANK over
    // two axes of one tuple (FoodMartQuerySet's correlated-rank family).
    QDef.common("foodmart_corr_rank",
      """WITH cell AS (
        |  SELECT r_name, o_orderpriority AS pri,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, o_orderpriority)
        |SELECT r_name AS c0, pri AS c1, CAST(m AS DOUBLE) AS m0,
        |  RANK() OVER (PARTITION BY r_name ORDER BY m DESC, pri) AS rk_in_region,
        |  RANK() OVER (PARTITION BY pri ORDER BY m DESC, r_name) AS rk_in_priority
        |FROM cell"""),

    // Shape #45: member rank vs parent rank — a nation's rank inside its
    // region, the same nation's global rank, and the region's own rank,
    // side by side (the MDX Rank(member, set) correlated against
    // Rank(member.Parent, parents)).
    QDef.common("foodmart_rank_vs_parent_rank",
      """WITH nat AS (
        |  SELECT r_name, n_name, SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS m
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |reg AS (
        |  SELECT r_name, RANK() OVER (ORDER BY SUM(m) DESC, r_name) AS rk_region
        |  FROM nat GROUP BY r_name)
        |SELECT n.r_name AS c0, n.n_name AS c1,
        |  RANK() OVER (PARTITION BY n.r_name ORDER BY n.m DESC, n.n_name)
        |    AS rk_in_region,
        |  RANK() OVER (ORDER BY n.m DESC, n.n_name) AS rk_global,
        |  r.rk_region
        |FROM nat n JOIN reg r ON n.r_name = r.r_name"""),

    // Shape #46: Hierarchize — parents emitted above their children in
    // one result (region subtotal rows + nation child rows), the MDX
    // Hierarchize(set) axis order realized as GROUPING SETS with a level
    // indicator.
    QDef.common("foodmart_hierarchize",
      """SELECT r_name AS c0, n_name AS c1,
        |  CAST(GROUPING(n_name) AS INT) AS lvl,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (r_name, n_name))"""),

    // ---- tranche 5: cumulative-share sets, exact-moment regression,
    // ---- LastPeriods, tuple-filtered shares ----------------------------

    // Shape #47: TopPercent(brands, 60%, revenue) — the smallest leading
    // set (by descending measure) whose cumulative share reaches 60%,
    // crossing member included (MDX TopPercent semantics: members whose
    // cumulative-share-BEFORE-them is still under the cut). Cumulative
    // sums stay decimal-exact; the only doubles are display casts. The
    // unpartitioned windows run over the |brands|-row aggregate, never
    // the fact.
    QDef.common("foodmart_toppercent",
      """WITH m AS (
        |  SELECT p_brand AS c0,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |r AS (
        |  SELECT c0, rev,
        |    SUM(rev) OVER (ORDER BY rev DESC, c0
        |                   ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(rev) OVER () AS tot
        |  FROM m)
        |SELECT c0, CAST(rev AS DOUBLE) AS m0,
        |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
        |FROM r WHERE cum - rev < 0.6 * tot"""),

    // Shape #48: TopSum(nations, 500000, acctbal) — leading members until
    // the running sum first reaches an absolute threshold.
    QDef.common("foodmart_topsum",
      """WITH m AS (
        |  SELECT n_name AS c0,
        |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS bal
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |r AS (
        |  SELECT c0, bal,
        |    SUM(bal) OVER (ORDER BY bal DESC, c0
        |                   ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM m)
        |SELECT c0, CAST(bal AS DOUBLE) AS m0, CAST(cum AS DOUBLE) AS running
        |FROM r WHERE cum - bal < 500000"""),

    // Shape #49: BottomPercent(brands, 25%, quantity) — the trailing set
    // (ascending) whose cumulative share stays within the bottom quarter.
    QDef.common("foodmart_bottompercent",
      """WITH m AS (
        |  SELECT p_brand AS c0,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_brand),
        |r AS (
        |  SELECT c0, qty,
        |    SUM(qty) OVER (ORDER BY qty ASC, c0
        |                   ROWS UNBOUNDED PRECEDING) AS cum,
        |    SUM(qty) OVER () AS tot
        |  FROM m)
        |SELECT c0, CAST(qty AS DOUBLE) AS m0,
        |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS cum_share
        |FROM r WHERE cum - qty < 0.25 * tot"""),

    // Shape #50: LinRegSlope/Intercept/R2 (the MDX linear-regression
    // functions) from DECIMAL-EXACT moments: every sum is decimal
    // (order-independent, identical across engines); the regression
    // arithmetic then runs in double over identical operands — the
    // fn_agg stats-decomposition discipline, so the result is hash-exact
    // without trusting either engine's native regr_* double accumulation.
    QDef.common("foodmart_regression",
      """WITH mo AS (
        |  SELECT l_returnflag AS c0, COUNT(*) AS n,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |      * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT c0, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
        |  (CAST(sy AS DOUBLE) - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
        |FROM mo"""),

    // Shape #51: LastPeriods(3) aggregation — each quarter carries the
    // trailing three-quarter rolling total (the MDX LastPeriods set fed
    // to Aggregate), a ROWS frame over the quarter series.
    QDef.common("foodmart_lastperiods",
      """WITH q AS (
        |  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
        |    CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS q,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders GROUP BY 1, 2)
        |SELECT y, q, CAST(m AS DOUBLE) AS cur,
        |  CAST(SUM(m) OVER (ORDER BY y, q
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_3q
        |FROM q"""),

    // Shape #53: Head(set, 3) ∪ Tail(set, 2) — the leading and trailing
    // members of a measure-ordered set in one result, each row labelled
    // with its end (MDX Head/Tail set navigation).
    QDef.common("foodmart_set_head_tail",
      """WITH m AS (
        |  SELECT n_name AS c0,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |r AS (
        |  SELECT c0, rev,
        |    RANK() OVER (ORDER BY rev DESC, c0) AS rk,
        |    COUNT(*) OVER () AS n
        |  FROM m)
        |SELECT c0, CAST(rev AS DOUBLE) AS m0,
        |  CASE WHEN rk <= 3 THEN 'head' ELSE 'tail' END AS seg, rk
        |FROM r WHERE rk <= 3 OR rk > n - 2"""),

    // Shape #54: three-level ancestor shares — nation grain, share within
    // region and region's share of all, with the TELESCOPING IDENTITY
    // share_in_region × region_share = share_of_all pinned as a boolean
    // (the MDX member/ancestor ratio chain; the identity makes the
    // query self-validating on both engines).
    QDef.common("foodmart_ancestor_3level",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS m
        |  FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |shares AS (
        |  SELECT r_name, n_name, m,
        |    CAST(m AS DOUBLE) / CAST(SUM(m) OVER (PARTITION BY r_name) AS DOUBLE)
        |      AS share_in_region,
        |    CAST(SUM(m) OVER (PARTITION BY r_name) AS DOUBLE)
        |      / CAST(SUM(m) OVER () AS DOUBLE) AS region_share,
        |    CAST(m AS DOUBLE) / CAST(SUM(m) OVER () AS DOUBLE) AS share_of_all
        |  FROM nat)
        |SELECT r_name AS c0, n_name AS c1, CAST(m AS DOUBLE) AS m0,
        |  share_in_region, region_share, share_of_all,
        |  ABS(share_in_region * region_share - share_of_all) < 1e-12 AS telescoped
        |FROM shares"""),

    // Shape #55: tuple TopCount — the top-10 (nation, priority) TUPLES of
    // a crossjoin by the tuple measure (MDX TopCount over a CrossJoin,
    // vs the single-dimension TopCounts above), deterministic tiebreak.
    QDef.common("foodmart_order_crossjoin",
      """WITH cell AS (
        |  SELECT n_name AS c0, o_orderpriority AS c1,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, o_orderpriority)
        |SELECT c0, c1, CAST(m AS DOUBLE) AS m0
        |FROM cell
        |ORDER BY m DESC, c0, c1
        |LIMIT 10"""),

    // Shape #56: TopCount + Aggregate(Except(...)) — the top members as
    // rows plus everything else collapsed into one 'Other' member (the
    // MDX report idiom combining a named top set with its complement's
    // aggregate).
    QDef.common("foodmart_except_remainder",
      """WITH m AS (
        |  SELECT n_name AS c0,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |r AS (
        |  SELECT c0, rev, RANK() OVER (ORDER BY rev DESC, c0) AS rk FROM m)
        |SELECT c0, CAST(rev AS DOUBLE) AS m0 FROM r WHERE rk <= 5
        |UNION ALL
        |SELECT 'Other' AS c0,
        |  CAST(SUM(rev) AS DOUBLE) AS m0
        |FROM r WHERE rk > 5"""),

    // Shape #57: AVG(member.Children) — each region carries the average
    // of its CHILD MEMBERS' sums (not the average of fact rows); the
    // division runs in double over decimal-exact child sums.
    QDef.common("foodmart_avg_of_children",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS m
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name AS c0, COUNT(*) AS n_children,
        |  CAST(SUM(m) AS DOUBLE) AS total,
        |  CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_child
        |FROM nat GROUP BY r_name"""),

    // Shape #52: CrossJoin members filtered on the TUPLE's measure, with
    // share-of-parent computed over the UNFILTERED parent (MDX Filter on
    // a crossjoin displays a subset but shares keep the full denominator
    // — the window runs in the subquery, the screen applies outside).
    QDef.common("foodmart_tuple_filter_share",
      """WITH cell AS (
        |  SELECT n_name AS c0, o_orderpriority AS c1,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m, COUNT(*) AS cnt
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, o_orderpriority),
        |shared AS (
        |  SELECT c0, c1, m, cnt,
        |    CAST(m AS DOUBLE)
        |      / CAST(SUM(m) OVER (PARTITION BY c0) AS DOUBLE) AS share_in_nation
        |  FROM cell)
        |SELECT c0, c1, CAST(m AS DOUBLE) AS m0, cnt, share_in_nation
        |FROM shared WHERE cnt >= 20"""),

    // ---- tranche 7 (r11): single-representative MDX families ------------

    // Shape #58: Generate(regions, TopCount(nations, 2)) — a PER-PARENT
    // top-k set with k > 1 (the general Generate; #38 is the argmax
    // special case). Measures roll up over exactly the generated members,
    // each labelled with its in-parent rank.
    QDef.common("foodmart_generate_topk",
      """WITH per_nation AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |generated AS (
        |  SELECT r_name, n_name, rk FROM (
        |    SELECT r_name, n_name,
        |      RANK() OVER (PARTITION BY r_name ORDER BY m DESC, n_name) AS rk
        |    FROM per_nation) t WHERE rk <= 2)
        |SELECT g.r_name AS c0, g.rk AS c1, g.n_name AS c2,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN generated g ON nation.n_name = g.n_name
        |GROUP BY g.r_name, g.rk, g.n_name"""),

    // Shape #59: multi-level NON EMPTY crossjoin — TWO hierarchies at TWO
    // levels each ((region > nation) × (type > brand)) with a tuple
    // screen; NON EMPTY = the inner star join plus a cell-count floor.
    QDef.common("foodmart_nonempty_4level",
      """SELECT r_name AS c0, n_name AS c1, p_type AS c2, p_brand AS c3,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  COUNT(*) AS m1
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size < 10 AND r_name IN ('EUROPE', 'ASIA')
        |GROUP BY r_name, n_name, p_type, p_brand
        |HAVING COUNT(*) > 1"""),

    // Shape #60: Aggregate over a named-set INTERSECTION used as a
    // slicer — [high-revenue nations] ∩ [high-customer-count nations]
    // defines the sub-cube; the measure reports per region over only
    // those members (MDX Aggregate(Intersect(set1, set2))).
    QDef.common("foodmart_namedset_slicer",
      """WITH rev AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m,
        |    COUNT(DISTINCT o_custkey) AS nc
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |picked AS (
        |  SELECT n_name FROM (
        |    SELECT n_name,
        |      RANK() OVER (ORDER BY m DESC, n_name) AS rk_m,
        |      RANK() OVER (ORDER BY nc DESC, n_name) AS rk_c
        |    FROM rev) t WHERE rk_m <= 12 AND rk_c <= 12)
        |SELECT r_name AS c0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m0,
        |  COUNT(*) AS m1
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE n_name IN (SELECT n_name FROM picked)
        |GROUP BY r_name"""),

    // Shape #61: Count(NonEmptyCrossJoin(nations, segments)) — the
    // DISTINCT non-empty tuple count per region, a measure over the set's
    // cardinality rather than the cells.
    QDef.common("foodmart_nonempty_count",
      """SELECT r_name AS c0, COUNT(*) AS m0 FROM (
        |  SELECT DISTINCT r_name, n_name, c_mktsegment
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey) t
        |GROUP BY r_name"""),

    // Shape #62: Correlation(quarters, revenue, order count) per nation —
    // the MDX Correlation statistical measure, computed from
    // decimal-exact moments (the LinReg discipline of shape #50: no
    // trust in either engine's double accumulation order).
    QDef.common("foodmart_correlation",
      """WITH q AS (
        |  SELECT n_name, EXTRACT(QUARTER FROM o_orderdate) AS qt,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x,
        |    CAST(COUNT(*) AS DECIMAL(18,2)) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, EXTRACT(QUARTER FROM o_orderdate)),
        |moments AS (
        |  SELECT n_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM q GROUP BY n_name)
        |SELECT n_name AS c0,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
        |       * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS corr_xy
        |FROM moments WHERE n >= 2
        |  AND CAST(n * sxx - sx * sx AS DOUBLE) > 0
        |  AND CAST(n * syy - sy * sy AS DOUBLE) > 0"""),

    // Shape #63: the MDX member-range operator [A]:[B] — the ordered
    // slice of a level between two named members (inclusive), as a
    // positional screen over the level's natural order.
    QDef.common("foodmart_member_range",
      """WITH pos AS (
        |  SELECT n_name, ROW_NUMBER() OVER (ORDER BY n_name) AS p
        |  FROM nation),
        |bounds AS (
        |  SELECT MIN(CASE WHEN n_name = 'NATION_12' THEN p END) AS lo,
        |    MIN(CASE WHEN n_name = 'NATION_18' THEN p END) AS hi
        |  FROM pos)
        |SELECT n_name AS c0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IN (
        |  SELECT n_name FROM pos, bounds WHERE p BETWEEN lo AND hi)
        |GROUP BY n_name"""),

    // Shape #64: OpeningPeriod / ClosingPeriod — each quarter reports the
    // measure of its FIRST and LAST month (semi-additive endpoints at the
    // child grain; the closing-balance twin of the tranche-2 shape).
    QDef.common("foodmart_opening_closing",
      """WITH monthly AS (
        |  SELECT EXTRACT(QUARTER FROM o_orderdate) AS qt,
        |    EXTRACT(MONTH FROM o_orderdate) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders
        |  GROUP BY EXTRACT(QUARTER FROM o_orderdate),
        |    EXTRACT(MONTH FROM o_orderdate)),
        |ranked AS (
        |  SELECT qt, mo, m,
        |    ROW_NUMBER() OVER (PARTITION BY qt ORDER BY mo) AS fwd,
        |    ROW_NUMBER() OVER (PARTITION BY qt ORDER BY mo DESC) AS bwd
        |  FROM monthly)
        |SELECT qt AS c0,
        |  CAST(MIN(CASE WHEN fwd = 1 THEN m END) AS DOUBLE) AS opening_m,
        |  CAST(MIN(CASE WHEN bwd = 1 THEN m END) AS DOUBLE) AS closing_m
        |FROM ranked GROUP BY qt"""),

    // Shape #65: Order(..., BDESC) vs DESC — the break-hierarchy rank
    // (global across all nations) SIDE BY SIDE with the in-parent rank,
    // the two MDX ordering modes in one row.
    QDef.common("foodmart_bdesc_rank",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name AS c0, n_name AS c1, CAST(m AS DOUBLE) AS m0,
        |  RANK() OVER (ORDER BY m DESC, n_name) AS bdesc_rk,
        |  RANK() OVER (PARTITION BY r_name ORDER BY m DESC, n_name) AS desc_rk
        |FROM nat"""),

    // Shape #66: a GENERATED named set crossed with the time level and a
    // YTD running sum INSIDE the set — per top-nation cumulative quarters
    // (Generate × Ytd composition).
    QDef.common("foodmart_set_ytd",
      """WITH rev AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |top3 AS (
        |  SELECT n_name FROM (
        |    SELECT n_name, RANK() OVER (ORDER BY m DESC, n_name) AS rk
        |    FROM rev) t WHERE rk <= 3),
        |cells AS (
        |  SELECT n_name,
        |    EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    EXTRACT(QUARTER FROM o_orderdate) AS qt,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name IN (SELECT n_name FROM top3)
        |  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
        |    EXTRACT(QUARTER FROM o_orderdate))
        |SELECT n_name AS c0, yr AS c1, qt AS c2, CAST(m AS DOUBLE) AS m0,
        |  CAST(SUM(m) OVER (PARTITION BY n_name, yr ORDER BY qt) AS DOUBLE) AS ytd
        |FROM cells"""),

    // Shape #67: Aggregate(Union(set1, set2)) — MDX set union is
    // DISTINCT (a member in both input sets contributes once); the two
    // overlapping attribute screens dedup before the rollup.
    QDef.common("foodmart_union_dedup_agg",
      """WITH s1 AS (SELECT n_name FROM nation WHERE n_nationkey < 8),
        |s2 AS (SELECT n_name FROM nation WHERE n_nationkey BETWEEN 4 AND 12),
        |u AS (SELECT n_name FROM s1 UNION SELECT n_name FROM s2)
        |SELECT COUNT(DISTINCT n_name) AS members,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m0
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE n_name IN (SELECT n_name FROM u)"""),

    // ---- tranche 8 (r12): remaining single-representative families ------

    // Shape #68: LinRegPoint — the regression's PREDICTED value at a
    // chosen point (MDX LinRegPoint(x0, set, y, x)): per nation, fit
    // monthly revenue against the month index and predict the next month.
    // Moments accumulate in DECIMAL (exact, order-independent); the
    // closed-form slope/intercept/prediction runs in double at the end
    // over identical operands — the foodmart_regression discipline.
    QDef.common("foodmart_linregpoint",
      """WITH monthly AS (
        |  SELECT n_name,
        |    (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS x,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
        |      + EXTRACT(MONTH FROM o_orderdate)),
        |moments AS (
        |  SELECT n_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(CAST(x AS DECIMAL(18,2))) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy,
        |    SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS sxx,
        |    MAX(x) AS xmax
        |  FROM monthly GROUP BY n_name)
        |SELECT n_name AS c0,
        |  ROUND((CAST(sy AS DOUBLE)
        |      - CAST(n * sxy - sx * sy AS DOUBLE)
        |        / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE)
        |    + CAST(n * sxy - sx * sy AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE)
        |      * (CAST(xmax AS DOUBLE) + 1.0), 6) AS predicted_m
        |FROM moments WHERE CAST(n * sxx - sx * sx AS DOUBLE) > 0"""),

    // Shape #69: Rank over TUPLES with ties — MDX Rank((n, seg), set)
    // over a composite tuple set; the integer measure makes real ties, a
    // tied tuple pair shares its rank and the next rank skips (RANK, not
    // DENSE_RANK — the MDX default).
    QDef.common("foodmart_rank_tuple_ties",
      """WITH cell AS (
        |  SELECT n_name, c_mktsegment, COUNT(*) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, c_mktsegment)
        |SELECT n_name AS c0, c_mktsegment AS c1, m AS m0,
        |  RANK() OVER (ORDER BY m DESC) AS rk
        |FROM cell"""),

    // Shape #70: CoalesceEmpty chain — CoalesceEmpty(m1, m2, 0): a sparse
    // measure falls through to a second sparse measure and then to the
    // literal. The two screens (deep-debit / top-credit customers) leave
    // most (nation) cells empty at small SF, so every arm of the chain is
    // exercised.
    QDef.common("foodmart_coalesceempty",
      """WITH base AS (
        |  SELECT n_name FROM nation),
        |rare1 AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_acctbal < -990 GROUP BY n_name),
        |rare2 AS (
        |  SELECT n_name, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE c_acctbal > 9990 GROUP BY n_name)
        |SELECT base.n_name AS c0,
        |  CAST(COALESCE(rare1.m, rare2.m, 0) AS DOUBLE) AS m0,
        |  CASE WHEN rare1.m IS NOT NULL THEN 1
        |       WHEN rare2.m IS NOT NULL THEN 2 ELSE 3 END AS arm
        |FROM base LEFT JOIN rare1 ON base.n_name = rare1.n_name
        |LEFT JOIN rare2 ON base.n_name = rare2.n_name"""),

    // Shape #71: Item(0) of an ordered set — Order(nations × segments,
    // m, DESC).Item(0) per region: exactly ONE tuple survives per parent
    // (the deterministic argmax; Generate/TopCount report k members, Item
    // projects a single tuple out of the set).
    QDef.common("foodmart_item_first",
      """WITH cell AS (
        |  SELECT r_name, n_name, c_mktsegment,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name, c_mktsegment)
        |SELECT r_name AS c0, n_name AS c1, c_mktsegment AS c2,
        |  CAST(m AS DOUBLE) AS m0
        |FROM (SELECT r_name, n_name, c_mktsegment, m,
        |    ROW_NUMBER() OVER (PARTITION BY r_name
        |      ORDER BY m DESC, n_name, c_mktsegment) AS rn
        |  FROM cell) t WHERE rn = 1"""),

    // Shape #72: Var / Stdev over children — the dispersion of the
    // per-nation measure within each region (MDX Var(children, m)).
    // Population variance from exact DECIMAL moments of the ≤25 child
    // sums; double only in the final division.
    QDef.common("foodmart_var_children",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |moments AS (
        |  SELECT r_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(m) AS sx, SUM(m * m) AS sxx
        |  FROM nat GROUP BY r_name)
        |SELECT r_name AS c0,
        |  ROUND(CAST(n * sxx - sx * sx AS DOUBLE)
        |    / CAST(n * n AS DOUBLE) / 1000000000000.0, 6) AS var_pop_tril,
        |  ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
        |    / CAST(n AS DOUBLE), 4) AS stdev_pop
        |FROM moments"""),

    // Shape #73: Covariance between two measures over the time set —
    // MDX Covariance(quarters, order count, revenue) per nation; the
    // correlation shape's sibling reporting the unnormalized comoment.
    QDef.common("foodmart_covariance",
      """WITH q AS (
        |  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    EXTRACT(QUARTER FROM o_orderdate) AS qt,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x,
        |    CAST(COUNT(*) AS DECIMAL(18,2)) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
        |    EXTRACT(QUARTER FROM o_orderdate)),
        |moments AS (
        |  SELECT n_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy
        |  FROM q GROUP BY n_name)
        |SELECT n_name AS c0,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |    / CAST(n * n AS DOUBLE), 4) AS covar_pop
        |FROM moments WHERE n >= 2"""),

    // Shape #74: IIf null-guarded ratio — the calculated member
    // IIf(m_denom = 0, NULL, m_num / m_denom): returned-share of revenue
    // per (nation, year) with the zero-denominator arm surfacing as NULL
    // rather than an error (MDX divide semantics).
    QDef.common("foodmart_safe_divide",
      """WITH cell AS (
        |  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    SUM(CASE WHEN l_returnflag = 'R'
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_m,
        |    SUM(CASE WHEN l_linestatus = 'F' AND l_discount > 0.09
        |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS denom_m
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate))
        |SELECT n_name AS c0, yr AS c1,
        |  ROUND(CAST(ret_m AS DOUBLE)
        |    / NULLIF(CAST(denom_m AS DOUBLE), 0.0), 9) AS guarded_ratio
        |FROM cell"""),

    // Shape #75: Cousin — the member at the SAME ordinal position under a
    // different parent (MDX Cousin(nation, EUROPE)): each nation lines up
    // against the same-ranked nation of the reference region, reporting
    // both measures side by side.
    QDef.common("foodmart_cousin",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |ranked AS (
        |  SELECT r_name, n_name, m,
        |    ROW_NUMBER() OVER (PARTITION BY r_name
        |      ORDER BY m DESC, n_name) AS pos
        |  FROM nat)
        |SELECT a.r_name AS c0, a.n_name AS c1, a.pos AS c2,
        |  CAST(a.m AS DOUBLE) AS m0,
        |  b.n_name AS cousin_name, CAST(b.m AS DOUBLE) AS cousin_m
        |FROM ranked a JOIN ranked b
        |  ON b.r_name = 'EUROPE' AND b.pos = a.pos
        |WHERE a.r_name <> 'EUROPE'"""),

    // Shape #76: Qtd — quarter-to-date running sum at the month grain
    // (MDX Qtd(month)): the year-to-date shape re-anchored to the
    // enclosing quarter, one window partitioned by (nation, year,
    // quarter).
    QDef.common("foodmart_qtd_running",
      """WITH monthly AS (
        |  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    EXTRACT(QUARTER FROM o_orderdate) AS qt,
        |    EXTRACT(MONTH FROM o_orderdate) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
        |  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
        |    EXTRACT(QUARTER FROM o_orderdate), EXTRACT(MONTH FROM o_orderdate))
        |SELECT n_name AS c0, yr AS c1, qt AS c2, mo AS c3,
        |  CAST(m AS DOUBLE) AS m0,
        |  CAST(SUM(m) OVER (PARTITION BY n_name, yr, qt
        |    ORDER BY mo) AS DOUBLE) AS qtd
        |FROM monthly"""),

    // Shape #77: Filter(children, m > Avg(children, m)) — members above
    // their parent's average. The comparison stays EXACT: m > sx / n is
    // evaluated as m * n > sx in DECIMAL, no division, no epsilon.
    QDef.common("foodmart_above_avg_members",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |parent AS (
        |  SELECT r_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n, SUM(m) AS sx
        |  FROM nat GROUP BY r_name)
        |SELECT nat.r_name AS c0, n_name AS c1, CAST(m AS DOUBLE) AS m0,
        |  ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 4) AS parent_avg
        |FROM nat JOIN parent ON nat.r_name = parent.r_name
        |WHERE m * n > sx"""),

    // ---- tranche 9 (r12): statistical + time-navigation stragglers ------

    // Shape #78: Mtd — month-to-date running sum at the DAY grain (the
    // finest time navigation; Ytd is #25, Qtd is #76). One month keeps
    // the result bounded; the window partitions by (nation, month).
    QDef.common("foodmart_mtd_running",
      """WITH daily AS (
        |  SELECT n_name, o_orderdate AS d,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE o_orderdate >= DATE '1995-03-01'
        |    AND o_orderdate < DATE '1995-04-01'
        |  GROUP BY n_name, o_orderdate)
        |SELECT n_name AS c0, d AS c1, CAST(m AS DOUBLE) AS m0,
        |  CAST(SUM(m) OVER (PARTITION BY n_name ORDER BY d) AS DOUBLE) AS mtd
        |FROM daily"""),

    // Shape #79: Stdev (SAMPLE, n-1 denominator) over children — the MDX
    // Stdev sibling of #72's StdevP; same decimal-exact moments, the
    // sample divisor exercised on its own row.
    QDef.common("foodmart_stdev_sample_children",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |moments AS (
        |  SELECT r_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(m) AS sx, SUM(m * m) AS sxx
        |  FROM nat GROUP BY r_name)
        |SELECT r_name AS c0,
        |  ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
        |    / CAST(n * (n - 1) AS DOUBLE)), 4) AS stdev_samp
        |FROM moments WHERE n >= 2"""),

    // Shape #80: Count(Filter(children, m > threshold)) — the member
    // count measure over a screened set (the COUNT twin of #77's Filter;
    // MDX Count(Filter(...)) reports cardinality, not cells).
    QDef.common("foodmart_count_filtered_members",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m,
        |    COUNT(*) AS orders_n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name AS c0,
        |  COUNT(*) AS members,
        |  CAST(SUM(CASE WHEN orders_n > 500 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS busy_members
        |FROM nat GROUP BY r_name"""),

    // Shape #81: Sum(TopCount(children, 3, m)) / Sum(children) — the
    // top-k CONCENTRATION ratio (how much of the parent the top three
    // members carry); numerator and denominator stay DECIMAL until the
    // final guarded division.
    QDef.common("foodmart_topk_concentration",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name),
        |ranked AS (
        |  SELECT r_name, m,
        |    ROW_NUMBER() OVER (PARTITION BY r_name
        |      ORDER BY m DESC, n_name) AS rk
        |  FROM nat)
        |SELECT r_name AS c0,
        |  ROUND(CAST(SUM(CASE WHEN rk <= 3 THEN m
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |    / CAST(SUM(m) AS DOUBLE), 9) AS top3_share
        |FROM ranked GROUP BY r_name"""),

    // Shape #82: Avg over the time descendants — the average MONTHLY
    // revenue per nation (MDX Avg(Descendants([Time], month), m):
    // average of member sums at the month grain, not of fact rows).
    QDef.common("foodmart_avg_time_members",
      """WITH monthly AS (
        |  SELECT n_name, EXTRACT(YEAR FROM o_orderdate) AS yr,
        |    EXTRACT(MONTH FROM o_orderdate) AS mo,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate),
        |    EXTRACT(MONTH FROM o_orderdate))
        |SELECT n_name AS c0, COUNT(*) AS months,
        |  ROUND(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4)
        |    AS avg_month_m
        |FROM monthly GROUP BY n_name"""),

    // Shape #83: LinRegR2 — the regression's coefficient of
    // determination (completes the LinReg family: slope/intercept #51,
    // point #68). R^2 = (n*sxy - sx*sy)^2 / ((n*sxx - sx^2)(n*syy -
    // sy^2)), decimal moments, double only at the end.
    QDef.common("foodmart_linreg_r2",
      """WITH monthly AS (
        |  SELECT n_name,
        |    (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
        |      + EXTRACT(MONTH FROM o_orderdate) AS x,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name, (EXTRACT(YEAR FROM o_orderdate) - 1992) * 12
        |      + EXTRACT(MONTH FROM o_orderdate)),
        |moments AS (
        |  SELECT n_name, CAST(COUNT(*) AS DECIMAL(18,2)) AS n,
        |    SUM(CAST(x AS DECIMAL(18,2))) AS sx, SUM(y) AS sy,
        |    SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy,
        |    SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS sxx,
        |    SUM(y * y) AS syy
        |  FROM monthly GROUP BY n_name)
        |SELECT n_name AS c0,
        |  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |      * CAST(n * sxy - sx * sy AS DOUBLE)
        |    / (CAST(n * sxx - sx * sx AS DOUBLE)
        |      * CAST(n * syy - sy * sy AS DOUBLE)), 9) AS r2
        |FROM moments
        |WHERE CAST(n * sxx - sx * sx AS DOUBLE) > 0
        |  AND CAST(n * syy - sy * sy AS DOUBLE) > 0"""),

    // Shape #84: ratio to the PREVIOUS member in rank order (MDX
    // m / (m, member.PrevMember) over an Ordered set) — sequential
    // share chain within the parent, NULL for the leader.
    QDef.common("foodmart_prev_member_ratio",
      """WITH nat AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name AS c0, n_name AS c1, CAST(m AS DOUBLE) AS m0,
        |  ROUND(CAST(m AS DOUBLE) / CAST(LAG(m) OVER (PARTITION BY r_name
        |    ORDER BY m DESC, n_name) AS DOUBLE), 9) AS vs_prev
        |FROM nat"""),

    // Shape #85: degenerate dimension — attributes carried ON the fact
    // table itself (order priority / ship mode families in FoodMart:
    // no dimension join at all, the rollup runs straight off the fact).
    QDef.common("foodmart_degenerate_dim",
      """SELECT o_orderpriority AS c0, o_orderstatus AS c1,
        |  COUNT(*) AS m0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM orders
        |GROUP BY o_orderpriority, o_orderstatus"""),

    // ---- tranche 10 (r13 verdict #6): the family-census closure -----------

    // Shape #91: Stdev measure (MDX Stdev(set, measure) — the spread of a
    // member's monthly sales; the one MDX statistical family the census
    // audit found uncovered). Sample stddev decomposed into decimal
    // sums (n, Σv, Σv²) so the double arithmetic starts from identical
    // bits in both engines; sqrt guarded with GREATEST(...,0) for the
    // DuckDB negative-argument error (catastrophic-cancellation floor).
    QDef.common("foodmart_stdev_months",
      """WITH m AS (
        |  SELECT n_name, CAST(month(o_orderdate) AS INT) AS mo,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM orders, customer, nation
        |  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        |    AND year(o_orderdate) = 1996
        |  GROUP BY n_name, CAST(month(o_orderdate) AS INT))
        |SELECT n_name, COUNT(*) AS n,
        |  ROUND(sqrt(greatest(
        |    (CAST(SUM(CAST(v AS DECIMAL(28,4)) * CAST(v AS DECIMAL(28,4))) AS DOUBLE)
        |      - CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE)
        |        * CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*))
        |      / (COUNT(*) - 1), 0.0)), 4) AS sd
        |FROM m GROUP BY n_name HAVING COUNT(*) > 1
        |ORDER BY n_name"""),

    // Shape #92: Min/Max over a member set (MDX Min(children, measure) /
    // Max(children, measure) — the spread endpoints the census audit
    // found uncovered; the region's cheapest and dearest nation-month
    // side by side).
    QDef.common("foodmart_minmax_children",
      """WITH m AS (
        |  SELECT r_name, n_name,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM orders, customer, nation, region
        |  WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, MIN(v) AS min_child, MAX(v) AS max_child,
        |  COUNT(*) AS n_children
        |FROM m GROUP BY r_name ORDER BY r_name""")
  )
}
