package graft.operators

import graft.QDef

/** TPC-DS-shaped query set — the reference's second benchmark corpus
  * (reference: plus/src/test/java/org/apache/calcite/adapter/tpcds/TpcdsTest.java,
  * correctness-run subset). The TPC-DS schema itself is out of fixture
  * scope, so these carry the queries' distinctive STRUCTURES onto the
  * fixture star schema: category-average deviation via windowed
  * re-aggregation (q53/q63), multi-period INTERSECT of customer sets
  * (q38/q87), multi-channel UNION ALL re-aggregation (q33/q56), an
  * order-count band with join-back (q34/q73), ROLLUP + GROUPING-level
  * rank (q36), one-scan FILTERed slice counts (q88), LAG year-over-year
  * growth (q75), YoY two-channel ratio self-join (q11/q74), per-group
  * top-k over ROLLUP (q67), and FULL OUTER JOIN of cumulative series
  * (q51). Dialect-shared SQL; each doubles as its own DuckDB oracle.
  */
object Tpcds {
  val defs: Seq[QDef] = Seq(

    // q53/q63 shape — brand-year sales that deviate >10% above the brand's
    // average year (aggregate → window re-aggregate → deviation filter).
    // The window average goes through a decimal sum: window sums over
    // doubles are accumulation-order-dependent, decimals are not.
    QDef.common("tpcds_s_catavg",
      """WITH s AS (
        |  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sales
        |  FROM lineitem, orders, part
        |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  GROUP BY p_brand, CAST(year(o_orderdate) AS INT)
        |)
        |SELECT p_brand, yr, sales FROM (
        |  SELECT p_brand, yr, sales,
        |    CAST(SUM(CAST(sales AS DECIMAL(18,4))) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY p_brand) AS avg_sales
        |  FROM s
        |)
        |WHERE sales > 1.1 * avg_sales
        |ORDER BY p_brand, yr"""),

    // q38/q87 shape — customers active in BOTH periods (INTERSECT of
    // distinct key sets, then a scalar count).
    QDef.common("tpcds_s_intersect",
      """SELECT count(*) AS n FROM (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  INTERSECT
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |) both_years"""),

    // q33/q56 shape — per-"channel" (market segment) restricted aggregates
    // re-aggregated by brand. TPC-DS writes this as three UNION ALL branches
    // differing only in the channel literal — three scans of the same star.
    // The oracle keeps that literal form; the ENGINE plan is the one you'd
    // want at 100 TB: ONE scan grouped by (brand, segment), then the same
    // outer re-aggregation. The two are bit-identical because GROUP BY
    // (p_brand, c_mktsegment) partitions exactly the rows each UNION branch
    // saw, with the same DECIMAL(28,4)-sum → DOUBLE → DECIMAL(18,4)-sum hops.
    QDef.sql("tpcds_s_channels",
      """WITH ch AS (
        |  SELECT p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM lineitem, orders, customer, part
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND l_partkey = p_partkey AND c_mktsegment = 'AUTOMOBILE'
        |  GROUP BY p_brand
        |  UNION ALL
        |  SELECT p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM lineitem, orders, customer, part
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND l_partkey = p_partkey AND c_mktsegment = 'BUILDING'
        |  GROUP BY p_brand
        |  UNION ALL
        |  SELECT p_brand,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM lineitem, orders, customer, part
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND l_partkey = p_partkey AND c_mktsegment = 'MACHINERY'
        |  GROUP BY p_brand
        |)
        |SELECT p_brand, CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM ch GROUP BY p_brand
        |ORDER BY total DESC, p_brand LIMIT 25""") { (s, dir) =>
      graft.Engine.sql(s, dir,
        """WITH ch AS (
          |  SELECT p_brand, c_mktsegment,
          |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS v
          |  FROM lineitem, orders, customer, part
          |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          |    AND l_partkey = p_partkey
          |    AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
          |  GROUP BY p_brand, c_mktsegment
          |)
          |SELECT p_brand, CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total
          |FROM ch GROUP BY p_brand
          |ORDER BY total DESC, p_brand LIMIT 25""".stripMargin)
    },

    // q34/q73 shape — order-count band per customer (GROUP BY + HAVING
    // BETWEEN), joined back to the customer dimension.
    QDef.common("tpcds_s_orderband",
      """SELECT c_custkey, c_name, cnt FROM (
        |  SELECT o_custkey, count(*) AS cnt FROM orders
        |  WHERE o_orderstatus = 'O'
        |  GROUP BY o_custkey HAVING count(*) BETWEEN 3 AND 7
        |) bands JOIN customer ON c_custkey = o_custkey
        |ORDER BY cnt DESC, c_custkey"""),

    // q36 shape — profit hierarchy: ROLLUP over (region, nation) with the
    // grouping level derived from GROUPING(), then RANK within each level
    // (partitioned by the parent when ranking leaf rows). NULLS FIRST is
    // pinned explicitly — the engines' default null order differs.
    QDef.common("tpcds_s_lochierarchy",
      """SELECT lvl, r_name, n_name, rev, rk FROM (
        |  SELECT r_name, n_name, rev, lvl,
        |    rank() OVER (
        |      PARTITION BY lvl, CASE WHEN lvl = 0 THEN r_name ELSE NULL END
        |      ORDER BY rev DESC, n_name NULLS FIRST) AS rk
        |  FROM (
        |    SELECT r_name, n_name,
        |      CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS rev,
        |      CAST(GROUPING(r_name) + GROUPING(n_name) AS INT) AS lvl
        |    FROM lineitem, supplier, nation, region
        |    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |      AND n_regionkey = r_regionkey
        |    GROUP BY ROLLUP(r_name, n_name)
        |  ) base
        |) ranked
        |ORDER BY lvl, rk, r_name NULLS FIRST, n_name NULLS FIRST"""),

    // q88 shape — one query, many disjoint-slice counts. TPC-DS writes 8
    // scalar subqueries (8 scans); the engine answer is a SINGLE scan with
    // FILTER'd aggregates — the map-side rewrite that matters at 100 TB.
    QDef.common("tpcds_s_multicount",
      """SELECT
        |  count(*) FILTER (WHERE h >= 0  AND h < 3)  AS h0,
        |  count(*) FILTER (WHERE h >= 3  AND h < 6)  AS h3,
        |  count(*) FILTER (WHERE h >= 6  AND h < 9)  AS h6,
        |  count(*) FILTER (WHERE h >= 9  AND h < 12) AS h9,
        |  count(*) FILTER (WHERE h >= 12 AND h < 15) AS h12,
        |  count(*) FILTER (WHERE h >= 15 AND h < 18) AS h15,
        |  count(*) FILTER (WHERE h >= 18 AND h < 21) AS h18,
        |  count(*) FILTER (WHERE h >= 21)            AS h21
        |FROM (SELECT CAST(hour(ts) AS INT) AS h FROM events) t"""),

    // q75 shape — year-over-year sales change per brand via LAG over the
    // per-(brand, year) aggregate. The ratio divides two identical doubles
    // on both engines, so it is bit-exact without rounding.
    QDef.common("tpcds_s_salesgrowth",
      """WITH s AS (
        |  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS sales
        |  FROM lineitem, orders, part
        |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  GROUP BY p_brand, CAST(year(o_orderdate) AS INT)
        |)
        |SELECT p_brand, yr, sales, prev_sales,
        |  CASE WHEN prev_sales > 0 THEN sales / prev_sales END AS ratio
        |FROM (
        |  SELECT p_brand, yr, sales,
        |    lag(sales) OVER (PARTITION BY p_brand ORDER BY yr) AS prev_sales
        |  FROM s
        |) g
        |ORDER BY p_brand, yr"""),

    // q11/q74 shape — customers whose "priority channel" spend grew
    // faster year-over-year than their "standard channel" spend: two
    // per-(customer, year) channel aggregates, the years self-joined, the
    // growth ratios compared. The ratio comparison is cross-multiplied
    // (b.hi/a.hi > b.lo/a.lo ⇔ b.hi*a.lo > b.lo*a.hi for positive
    // denominators) so no engine ever divides — products of identical
    // doubles are bit-exact on both sides.
    QDef.common("tpcds_s_yoyratio",
      """WITH t AS (
        |  SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN CAST(o_totalprice AS DECIMAL(28,4))
        |      ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS hi,
        |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN CAST(0 AS DECIMAL(28,4))
        |      ELSE CAST(o_totalprice AS DECIMAL(28,4)) END) AS DOUBLE) AS lo
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |  GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
        |)
        |SELECT a.o_custkey AS c_key, a.hi AS hi96, b.hi AS hi97,
        |  a.lo AS lo96, b.lo AS lo97
        |FROM t a JOIN t b ON a.o_custkey = b.o_custkey
        |WHERE a.yr = 1996 AND b.yr = 1997
        |  AND a.hi > 0 AND a.lo > 0
        |  AND b.hi * a.lo > b.lo * a.hi
        |ORDER BY c_key"""),

    // q67 shape — ROLLUP over (brand, year) then rank() partitioned by
    // brand, keeping each brand's top-3 slices. Null ordering is pinned
    // explicitly: DuckDB defaults NULLS LAST on ASC, Spark NULLS FIRST.
    QDef.common("tpcds_s_rolluptopk",
      """WITH s AS (
        |  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem, orders, part
        |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  GROUP BY ROLLUP(p_brand, CAST(year(o_orderdate) AS INT))
        |)
        |SELECT p_brand, yr, qty, rk FROM (
        |  SELECT p_brand, yr, qty,
        |    rank() OVER (PARTITION BY p_brand
        |                 ORDER BY qty DESC, yr ASC NULLS FIRST) AS rk
        |  FROM s WHERE p_brand IS NOT NULL
        |) ranked
        |WHERE rk <= 3
        |ORDER BY p_brand, rk, yr ASC NULLS FIRST"""),

    // q51 shape — two channels' daily revenue series FULL OUTER JOINed on
    // the day, then cumulative sums over the combined axis compared. The
    // running sums accumulate decimals over a unique ROWS frame, so both
    // engines produce identical prefixes.
    //
    // SCALE INVARIANT — the unpartitioned window (`WINDOW w AS (ORDER BY
    // day ...)`, which Spark executes on a single partition) is bounded BY
    // CONSTRUCTION, not by data volume: its input is the post-aggregate
    // day axis of a six-month window — at most ~182 rows regardless of how
    // many orders feed the aggregate (100 TB of orders still collapses to
    // ≤182 (seg, day) groups before the window runs). A global cumulative
    // sum over an UNBOUNDED day axis would instead need the two-pass
    // range-partitioned prefix-sum (partition-local sums → broadcast
    // per-partition offsets), which this shape deliberately does not.
    QDef.common("tpcds_s_cumcompare",
      """WITH d AS (
        |  SELECT c_mktsegment AS seg, CAST(o_orderdate AS DATE) AS day,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
        |  FROM orders, customer
        |  WHERE o_custkey = c_custkey
        |    AND c_mktsegment IN ('BUILDING', 'MACHINERY')
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  GROUP BY c_mktsegment, CAST(o_orderdate AS DATE)
        |), j AS (
        |  SELECT COALESCE(a.day, b.day) AS day, a.rev AS arev, b.rev AS brev
        |  FROM (SELECT day, rev FROM d WHERE seg = 'BUILDING') a
        |  FULL JOIN (SELECT day, rev FROM d WHERE seg = 'MACHINERY') b
        |    ON a.day = b.day
        |)
        |SELECT day, cum_a, cum_b FROM (
        |  SELECT day,
        |    CAST(SUM(CAST(COALESCE(arev, 0.0) AS DECIMAL(28,4))) OVER w AS DOUBLE) AS cum_a,
        |    CAST(SUM(CAST(COALESCE(brev, 0.0) AS DECIMAL(28,4))) OVER w AS DOUBLE) AS cum_b
        |  FROM j
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |) c
        |WHERE cum_a > cum_b
        |ORDER BY day"""),

    // q47 shape — moving-window deviation: per-(brand, month) revenue with
    // the brand-year average plus the ADJACENT months' revenue (lag/lead
    // neighbors carried alongside the deviation filter). Window averages go
    // through decimal SUM / COUNT (the catavg discipline) so both engines
    // produce identical doubles. Windows are partitioned by brand — no
    // global window; the star join broadcasts part and shuffles once on
    // the group key.
    QDef.common("tpcds_s_movingdev",
      """WITH monthly AS (
        |  SELECT p_brand, CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(month(o_orderdate) AS INT) AS mon,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,4))) AS DOUBLE) AS rev
        |  FROM lineitem, orders, part
        |  WHERE l_orderkey = o_orderkey AND l_partkey = p_partkey
        |  GROUP BY p_brand, CAST(year(o_orderdate) AS INT), CAST(month(o_orderdate) AS INT)
        |), v AS (
        |  SELECT p_brand, yr, mon, rev,
        |    CAST(SUM(CAST(rev AS DECIMAL(18,4))) OVER (PARTITION BY p_brand, yr) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY p_brand, yr) AS yr_avg,
        |    lag(rev) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS prev_rev,
        |    lead(rev) OVER (PARTITION BY p_brand ORDER BY yr, mon) AS next_rev
        |  FROM monthly
        |)
        |SELECT p_brand, yr, mon, rev, yr_avg, prev_rev, next_rev
        |FROM v
        |WHERE yr_avg > 0 AND abs(rev - yr_avg) / yr_avg > 0.1
        |  AND prev_rev IS NOT NULL AND next_rev IS NOT NULL
        |ORDER BY p_brand, yr, mon"""),

    // q49 shape — dual ranking: per-part return ratios ranked two ways
    // (by returned quantity share and by returned amount share), keeping
    // rows in EITHER top-10. The rank windows run over the per-part
    // aggregate — dimension-sized input by construction (|part|), exactly
    // the original q49 shape; FILTERed sums are coalesced so ratio NULLs
    // never reach the rank order, and pk breaks all ties deterministically.
    QDef.common("tpcds_s_dualrank",
      """WITH perpart AS (
        |  SELECT l_partkey AS pk,
        |    COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |      FILTER (WHERE l_returnflag = 'R') AS DOUBLE), 0.0) AS ret_qty,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
        |      FILTER (WHERE l_returnflag = 'R') AS DOUBLE), 0.0) AS ret_amt,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS amt
        |  FROM lineitem GROUP BY l_partkey
        |), ranked AS (
        |  SELECT pk, ret_qty / qty AS qty_ratio, ret_amt / amt AS amt_ratio,
        |    rank() OVER (ORDER BY ret_qty / qty DESC, pk) AS qty_rank,
        |    rank() OVER (ORDER BY ret_amt / amt DESC, pk) AS amt_rank
        |  FROM perpart WHERE qty > 0 AND amt > 0
        |)
        |SELECT pk, qty_ratio, amt_ratio, qty_rank, amt_rank FROM ranked
        |WHERE qty_rank <= 10 OR amt_rank <= 10
        |ORDER BY qty_rank, amt_rank, pk""")
  )
}
