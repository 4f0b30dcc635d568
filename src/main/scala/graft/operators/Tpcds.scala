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
  * (q51); plus carriers for each of the reference's ENABLED TpcdsTest
  * queries — q1 (CTE + correlated above-average filter), q17 (fact×fact
  * returns join with decomposed stats), q27 (AVG measures over ROLLUP),
  * q58 (cross-channel equal-share band), q72 (equi + non-equi date-band
  * join), q95 (double-EXISTS chain with a self-join inside); and the r14
  * tranche — q57 (monthly deviation with LAG/LEAD neighbors), q32/q92
  * (correlated excess-discount threshold), q62 (ship-latency bucket
  * pivot), q76 (tagged-channel union), q44 (best/worst rank-position
  * join), q61 (promotional-share ratio of two scalar aggregates); and
  * the r15 tranche of full multi-CTE structures — q23 (frequent-item ∩
  * max-derived best-customer sets restricting two UNION ALL channels),
  * q49 (three channels dual-ranked separately then tag-unioned), q78
  * (anti-join returns exclusion + zero-filled cross-channel ratio),
  * q95 (shared multi-supplier CTE referenced directly and through the
  * returns slice — the two-hop ship-chain).
  * Dialect-shared SQL; each doubles as its own DuckDB oracle.
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
        |ORDER BY qty_rank, amt_rank, pk"""),

    // ---- The reference's ENABLED TpcdsTest queries (q1, q17, q27, q58,
    // q72, q95 — TpcdsTest.java:212-271) — structure carriers for each.

    // q1 shape: CTE of per-entity totals, kept where above 1.2× the
    // group's average via a correlated scalar subquery over the same CTE.
    // The average divides as IEEE doubles after exact decimal sums.
    QDef.common("tpcds_s_returnavg",
      """WITH ctotal AS (
        |  SELECT o_custkey AS cust, c_nationkey AS nat,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_orderstatus = 'F'
        |  GROUP BY o_custkey, c_nationkey)
        |SELECT cust, total FROM ctotal c1
        |WHERE total > 1.2 * (
        |  SELECT CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |  FROM ctotal c2 WHERE c2.nat = c1.nat)
        |ORDER BY cust"""),

    // q17 shape: fact×fact join (sales rows matched to a return row of the
    // same order+part) plus the order and item dimensions, with mean and
    // sum-of-squared-deviation per brand from exact decimal power sums
    // (the q17 count/avg/stdev block, decomposed like fn_agg_stats).
    QDef.common("tpcds_s_quantitystats",
      """SELECT p_brand AS brand, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(ls.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_q,
        |  CAST(SUM(CAST(ls.l_quantity * ls.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    - CAST(SUM(CAST(ls.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |      * CAST(SUM(CAST(ls.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS ssq_dev
        |FROM lineitem ls
        |JOIN lineitem lr ON ls.l_orderkey = lr.l_orderkey
        |  AND ls.l_partkey = lr.l_partkey
        |  AND lr.l_returnflag = 'R' AND lr.l_linenumber <> ls.l_linenumber
        |JOIN orders ON ls.l_orderkey = o_orderkey
        |JOIN part ON ls.l_partkey = p_partkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY p_brand"""),

    // q27 shape: multiple AVG measures over ROLLUP(state, ...) — averages
    // as exact decimal sums divided once as doubles; NULL rollup keys are
    // part of the compared output.
    QDef.common("tpcds_s_staterollup",
      """SELECT n_name AS c0, o_orderpriority AS c1,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |GROUP BY ROLLUP(n_name, o_orderpriority)"""),

    // q58 shape: the same measure computed per channel (disjoint fact
    // slices), items kept only where every channel sits within ±10% of
    // the three-channel average.
    QDef.common("tpcds_s_equalshare",
      """WITH ch AS (
        |  SELECT l_partkey AS item, l_returnflag AS flag,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS rev
        |  FROM lineitem GROUP BY l_partkey, l_returnflag)
        |SELECT a.item, a.rev AS rev_a, n.rev AS rev_n, r.rev AS rev_r
        |FROM ch a
        |JOIN ch n ON a.item = n.item AND n.flag = 'N'
        |JOIN ch r ON a.item = r.item AND r.flag = 'R'
        |WHERE a.flag = 'A'
        |  AND a.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
        |              AND 1.1 * (a.rev + n.rev + r.rev) / 3
        |  AND n.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
        |              AND 1.1 * (a.rev + n.rev + r.rev) / 3
        |  AND r.rev BETWEEN 0.9 * (a.rev + n.rev + r.rev) / 3
        |              AND 1.1 * (a.rev + n.rev + r.rev) / 3
        |ORDER BY a.item"""),

    // q72 shape: equi-join on the entity plus a non-equi date band (the
    // d1.d_date + 5 < d2.d_date inventory window) — a follow-up order by
    // the same customer 3-30 days later.
    QDef.common("tpcds_s_dategap",
      """SELECT o1.o_orderpriority AS c0, COUNT(*) AS m0
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey
        | AND o2.o_orderdate > o1.o_orderdate + INTERVAL 3 DAY
        | AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
        |GROUP BY o1.o_orderpriority"""),

    // q95 shape: the double-EXISTS chain — orders shipped by more than one
    // supplier (self-join inside the first EXISTS) that also have a
    // returned line, counted and totaled per priority.
    QDef.common("tpcds_s_existschain",
      """SELECT o_orderpriority AS c0,
        |  COUNT(DISTINCT o_orderkey) AS m0,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS m1
        |FROM orders o
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l1 JOIN lineitem l2
        |      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        |    WHERE l1.l_orderkey = o.o_orderkey)
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem lr
        |    WHERE lr.l_orderkey = o.o_orderkey AND lr.l_returnflag = 'R')
        |GROUP BY o_orderpriority"""),

    // q14 iceberg shape: per-channel item cells kept only above the
    // cross-channel average computed over the UNION ALL of all slices
    // (the scalar threshold broadcasts; no channel is scanned twice for
    // the threshold — one union, one average).
    QDef.common("tpcds_s_iceberg",
      """WITH cells AS (
        |  SELECT l_returnflag AS channel, l_partkey AS item,
        |    SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS rev
        |  FROM lineitem GROUP BY l_returnflag, l_partkey),
        |threshold AS (
        |  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev FROM cells)
        |SELECT channel, item, CAST(rev AS DOUBLE) AS rev
        |FROM cells, threshold
        |WHERE CAST(rev AS DOUBLE) > 2.0 * avg_rev
        |ORDER BY channel, item"""),

    // q23 shape: frequent items (sold in many distinct orders) ∩ best
    // customers (top spenders) — two filtered CTEs semi-joining the fact,
    // then one scalar total over the doubly-restricted slice.
    QDef.common("tpcds_s_freqbest",
      """WITH freq_items AS (
        |  SELECT l_partkey FROM lineitem
        |  GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 3),
        |best_cust AS (
        |  SELECT o_custkey FROM orders
        |  GROUP BY o_custkey
        |  HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 500000),
        |restricted AS (
        |  SELECT l_extendedprice FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_partkey IN (SELECT l_partkey FROM freq_items)
        |    AND o_custkey IN (SELECT o_custkey FROM best_cust))
        |SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS total,
        |  COUNT(*) AS n
        |FROM restricted"""),

    // q78 shape: per (customer, item) cells present in the primary
    // channel but ABSENT from the returns slice — an anti join between
    // two aggregates of the same fact at the same grain.
    QDef.common("tpcds_s_missingchannel",
      """WITH sold AS (
        |  SELECT o_custkey AS cust, l_partkey AS item,
        |    SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY o_custkey, l_partkey),
        |returned AS (
        |  SELECT o_custkey AS cust, l_partkey AS item
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY o_custkey, l_partkey)
        |SELECT s.cust, s.item, CAST(s.rev AS DOUBLE) AS rev
        |FROM sold s LEFT JOIN returned r
        |  ON s.cust = r.cust AND s.item = r.item
        |WHERE r.cust IS NULL AND CAST(s.rev AS DOUBLE) > 150000
        |ORDER BY s.cust, s.item"""),

    // The single-scan rewrite of tpcds_s_missingchannel (r8 verdict #5):
    // both CTEs aggregate the same fact join at the same (cust, item)
    // grain, so the anti join collapses into conditional aggregation —
    // one scan, one Exchange, HAVING carries the "no returned row" and
    // revenue predicates. The two-CTE text above stays as the q78
    // structure carrier; TpcdsTwinSpec pins both hash-equal. This is the
    // teaching example for "two aggregates of one fact at one grain =
    // one scan": at 100 TB the second lineitem⋈orders pass is pure waste.
    QDef.common("tpcds_s_missingchannel_1scan",
      """SELECT o_custkey AS cust, l_partkey AS item,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_custkey, l_partkey
        |HAVING MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 0
        |  AND CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) > 150000
        |ORDER BY cust, item"""),

    // q54 shape: point-in-time cohort segmentation — customers who bought
    // a target slice (month × product type), their revenue over the
    // FOLLOWING three months, bucketed into revenue bands, count per
    // band. One cohort semi-join (the cohort set is small → broadcast),
    // one date-bounded fact pass, the banding on the per-customer
    // aggregate.
    QDef.common("tpcds_s_segmentbands",
      """WITH target_cust AS (
        |  SELECT DISTINCT o_custkey AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |    AND EXTRACT(MONTH FROM o_orderdate) = 3
        |    AND p_type = 'PROMO'),
        |cohort_rev AS (
        |  SELECT o_custkey AS ck,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |  WHERE o_custkey IN (SELECT ck FROM target_cust)
        |    AND o_orderdate >= DATE '1996-04-01'
        |    AND o_orderdate < DATE '1996-07-01'
        |  GROUP BY o_custkey)
        |SELECT CAST(FLOOR(CAST(rev AS DOUBLE) / 50000) AS INT) AS band,
        |  COUNT(*) AS n
        |FROM cohort_rev GROUP BY 1"""),

    // q89 shape: deviation-from-mean screen — per (brand, month) quantity
    // vs the brand's monthly mean; keep cells deviating more than 10%.
    // The mean is SUM/COUNT windows evaluated in double over
    // decimal-exact operands (no decimal division — engine scale rules
    // differ); the window partitions by brand over the small aggregate.
    QDef.common("tpcds_s_meandev",
      """WITH cell AS (
        |  SELECT p_brand,
        |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
        |    SUM(CAST(l_quantity AS DECIMAL(18,2))) AS s
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
        |  GROUP BY p_brand, EXTRACT(MONTH FROM o_orderdate)),
        |w AS (
        |  SELECT p_brand, m, s,
        |    CAST(SUM(s) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      / CAST(COUNT(*) OVER (PARTITION BY p_brand) AS DOUBLE) AS brand_avg
        |  FROM cell)
        |SELECT p_brand, m, CAST(s AS DOUBLE) AS qty, brand_avg
        |FROM w
        |WHERE brand_avg > 0
        |  AND ABS(CAST(s AS DOUBLE) - brand_avg) / brand_avg > 0.1"""),

    // q10/q35 shape: demographic counts over customers qualified by an
    // OR of EXISTS across channels AND a further required channel — the
    // existence-OR structure existschain's AND chain cannot produce.
    QDef.common("tpcds_s_orexists",
      """SELECT c_mktsegment AS seg, COUNT(*) AS n
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderstatus = 'F')
        |  AND (EXISTS (
        |      SELECT 1 FROM orders o2 WHERE o2.o_custkey = c.c_custkey
        |        AND o2.o_orderpriority = '1-URGENT')
        |    OR EXISTS (
        |      SELECT 1 FROM orders o3 WHERE o3.o_custkey = c.c_custkey
        |        AND o3.o_orderpriority = '2-HIGH'))
        |GROUP BY c_mktsegment
        |ORDER BY seg"""),

    // q90 shape: the ratio of two scalar counts over disjoint slices of
    // one fact (am/pm ratio) — two scalar aggregates cross-joined into a
    // single-row division.
    QDef.common("tpcds_s_sliceratio",
      """SELECT CAST(early.n AS DOUBLE) / CAST(late.n AS DOUBLE) AS ratio
        |FROM (
        |  SELECT COUNT(*) AS n FROM orders
        |  WHERE EXTRACT(MONTH FROM o_orderdate) <= 6) early
        |CROSS JOIN (
        |  SELECT COUNT(*) AS n FROM orders
        |  WHERE EXTRACT(MONTH FROM o_orderdate) > 6) late"""),

    // q39 shape: statistical volatility pairing — per (item, month)
    // demand stats, keep coefficient-of-variation outliers, then
    // SELF-JOIN consecutive months so each row carries both months'
    // volatility (the "inventory instability across adjacent periods"
    // structure). Stats go through decimal power sums like fn_agg_stats.
    QDef.common("tpcds_s_volatility",
      """WITH m AS (
        |  SELECT l_partkey AS item, CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4)) * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS ss
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |  GROUP BY l_partkey, EXTRACT(MONTH FROM o_orderdate)
        |), v AS (
        |  SELECT item, mo,
        |    sqrt(greatest((ss - s * s / n) / n, 0)) / (s / n) AS cov
        |  FROM m WHERE n >= 2 AND s > 0
        |)
        |SELECT a.item, a.mo AS mo1, a.cov AS cov1, b.mo AS mo2, b.cov AS cov2
        |FROM v a JOIN v b ON a.item = b.item AND b.mo = a.mo + 1
        |WHERE a.cov > 0.5 AND b.cov > 0.5
        |ORDER BY a.item, a.mo"""),

    // q93 shape: sales NET OF RETURNS — the fact left-joined to its
    // returns slice at line grain, quantity reduced where a return
    // matched, then re-aggregated per customer (the "effective sales"
    // two-grain structure; returnflag plays store_returns).
    QDef.common("tpcds_s_netreturns",
      """SELECT o_custkey AS cust,
        |  CAST(SUM(CAST(CASE WHEN r.l_orderkey IS NOT NULL
        |                     THEN s.l_quantity - r.ret_qty
        |                     ELSE s.l_quantity END AS DECIMAL(18,2))) AS DOUBLE)
        |    AS net_qty
        |FROM lineitem s
        |JOIN orders ON s.l_orderkey = o_orderkey
        |LEFT JOIN (
        |  SELECT l_orderkey, l_linenumber, l_quantity AS ret_qty
        |  FROM lineitem WHERE l_returnflag = 'R') r
        |  ON s.l_orderkey = r.l_orderkey AND s.l_linenumber = r.l_linenumber
        |GROUP BY o_custkey
        |HAVING CAST(SUM(CAST(CASE WHEN r.l_orderkey IS NOT NULL
        |                          THEN s.l_quantity - r.ret_qty
        |                          ELSE s.l_quantity END AS DECIMAL(18,2))) AS DOUBLE) > 500
        |ORDER BY cust"""),

    // q16 shape: distinct-count of qualified orders — EXISTS a second
    // supplier on the same order (ships from another "warehouse") AND
    // NOT EXISTS a returned line; COUNT(DISTINCT) + the EXISTS/NOT
    // EXISTS pair over the same fact at different correlations.
    QDef.common("tpcds_s_multiwarehouse",
      """SELECT o_orderpriority AS pri,
        |  COUNT(DISTINCT o_orderkey) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders o
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l1 JOIN lineitem l2
        |      ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey
        |    WHERE l1.l_orderkey = o.o_orderkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem lr
        |    WHERE lr.l_orderkey = o.o_orderkey AND lr.l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY pri"""),

    // ---- r13 carriers: the structurally-distinct untouched remainder ----

    // q4 shape — the three-channel year_total CTE self-joined FOUR ways:
    // customers whose second-year/first-year growth in the "item" channel
    // exceeds their growth in the "order" channel. The giant multi-CTE
    // self-join is the point; the ratio compare runs on doubles derived
    // from decimal sums, so both engines divide identical bits.
    QDef.common("tpcds_s_yeartotal",
      """WITH year_total AS (
        |  SELECT o_custkey AS cust, 'ord' AS channel,
        |    CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
        |  UNION ALL
        |  SELECT o_custkey, 'item', CAST(year(o_orderdate) AS INT),
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE)
        |  FROM orders, lineitem WHERE l_orderkey = o_orderkey
        |  GROUP BY o_custkey, CAST(year(o_orderdate) AS INT)
        |)
        |SELECT t_s_secyear.cust
        |FROM year_total t_s_firstyear, year_total t_s_secyear,
        |     year_total t_c_firstyear, year_total t_c_secyear
        |WHERE t_s_secyear.cust = t_s_firstyear.cust
        |  AND t_s_firstyear.cust = t_c_secyear.cust
        |  AND t_s_firstyear.cust = t_c_firstyear.cust
        |  AND t_s_firstyear.channel = 'ord' AND t_s_secyear.channel = 'ord'
        |  AND t_c_firstyear.channel = 'item' AND t_c_secyear.channel = 'item'
        |  AND t_s_firstyear.yr = 1996 AND t_s_secyear.yr = 1997
        |  AND t_c_firstyear.yr = 1996 AND t_c_secyear.yr = 1997
        |  AND t_s_firstyear.total > 0 AND t_c_firstyear.total > 0
        |  AND t_c_secyear.total / t_c_firstyear.total
        |      > t_s_secyear.total / t_s_firstyear.total
        |ORDER BY t_s_secyear.cust"""),

    // q64 shape — the two-year HANDOFF chain: the same part sold in
    // consecutive years where the second year's revenue fell to at most
    // the first's (q64 joins its giant cross-channel CTE to itself on
    // item with cnt <= cnt; this carries the self-join-on-consecutive-
    // period skeleton).
    QDef.common("tpcds_s_handoff",
      """WITH py AS (
        |  SELECT l_partkey AS pk, CAST(year(o_orderdate) AS INT) AS yr,
        |    COUNT(*) AS cnt,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS rev
        |  FROM lineitem, orders WHERE l_orderkey = o_orderkey
        |  GROUP BY l_partkey, CAST(year(o_orderdate) AS INT))
        |SELECT a.pk, a.yr, a.cnt, a.rev, b.cnt AS cnt2, b.rev AS rev2
        |FROM py a, py b
        |WHERE a.pk = b.pk AND b.yr = a.yr + 1 AND b.rev <= a.rev AND a.cnt > 2
        |ORDER BY a.pk, a.yr"""),

    // q31 shape — consecutive-quarter share growth compared ACROSS TWO
    // CHANNELS: six instances of two quarterly CTEs joined on nation,
    // keeping nations whose item-channel growth kept pace with the
    // order-channel growth in q1->q2 and q2->q3.
    QDef.common("tpcds_s_sharegrowth",
      """WITH oq AS (
        |  SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS qtr,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM orders, customer
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996
        |  GROUP BY c_nationkey, CAST(quarter(o_orderdate) AS INT)),
        |lq AS (
        |  SELECT c_nationkey AS nk, CAST(quarter(o_orderdate) AS INT) AS qtr,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) AS v
        |  FROM lineitem, orders, customer
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND year(o_orderdate) = 1996
        |  GROUP BY c_nationkey, CAST(quarter(o_orderdate) AS INT))
        |SELECT o1.nk
        |FROM oq o1, oq o2, oq o3, lq w1, lq w2, lq w3
        |WHERE o1.nk = o2.nk AND o2.nk = o3.nk
        |  AND o1.nk = w1.nk AND w1.nk = w2.nk AND w2.nk = w3.nk
        |  AND o1.qtr = 1 AND o2.qtr = 2 AND o3.qtr = 3
        |  AND w1.qtr = 1 AND w2.qtr = 2 AND w3.qtr = 3
        |  AND o1.v > 0 AND o2.v > 0 AND w1.v > 0 AND w2.v > 0
        |  AND w2.v / w1.v >= o2.v / o1.v
        |  AND w3.v / w2.v >= o3.v / o2.v
        |ORDER BY o1.nk"""),

    // q66 shape — the monthly CASE-pivot over UNION ALL'd channels
    // (q66 pivots web+catalog shipping into 12 monthly columns per
    // warehouse; this pivots two fixture channels into monthly columns
    // per nation, then re-aggregates the union).
    QDef.common("tpcds_s_monthpivot",
      """WITH ch AS (
        |  SELECT c_nationkey AS nk, CAST(month(o_orderdate) AS INT) AS mo,
        |    CAST(o_totalprice AS DECIMAL(28,4)) AS amt
        |  FROM orders, customer
        |  WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996
        |  UNION ALL
        |  SELECT c_nationkey, CAST(month(o_orderdate) AS INT),
        |    CAST(l_extendedprice AS DECIMAL(28,4))
        |  FROM lineitem, orders, customer
        |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND year(o_orderdate) = 1996)
        |SELECT n_name,
        |  CAST(SUM(CASE WHEN mo = 1 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS jan,
        |  CAST(SUM(CASE WHEN mo = 2 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS feb,
        |  CAST(SUM(CASE WHEN mo = 3 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS mar,
        |  CAST(SUM(CASE WHEN mo = 4 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS apr,
        |  CAST(SUM(CASE WHEN mo = 5 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS may,
        |  CAST(SUM(CASE WHEN mo = 6 THEN amt ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS jun
        |FROM ch, nation WHERE nk = n_nationkey
        |GROUP BY n_name ORDER BY n_name"""),

    // q2/q59 shape — week-over-year ratios of in-week-slot pivots: weekly
    // slot sums for year Y joined to year Y+1 on the ISO week number,
    // emitting per-slot ratios. (The weekday itself is carried as
    // `day(date) % 7` — a deterministic in-week slot available in both
    // engines; Spark's and DuckDB's dayofweek origins differ.)
    QDef.common("tpcds_s_weekpivot",
      """WITH wk AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |    CAST(weekofyear(o_orderdate) AS INT) AS wk,
        |    CAST(SUM(CASE WHEN day(o_orderdate) % 7 = 0
        |      THEN CAST(o_totalprice AS DECIMAL(28,4)) ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS s0,
        |    CAST(SUM(CASE WHEN day(o_orderdate) % 7 = 3
        |      THEN CAST(o_totalprice AS DECIMAL(28,4)) ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS s3,
        |    CAST(SUM(CASE WHEN day(o_orderdate) % 7 = 6
        |      THEN CAST(o_totalprice AS DECIMAL(28,4)) ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS s6
        |  FROM orders
        |  GROUP BY CAST(year(o_orderdate) AS INT), CAST(weekofyear(o_orderdate) AS INT))
        |SELECT a.wk, ROUND(a.s0 / b.s0, 4) AS r0, ROUND(a.s3 / b.s3, 4) AS r3,
        |  ROUND(a.s6 / b.s6, 4) AS r6
        |FROM wk a, wk b
        |WHERE a.wk = b.wk AND a.yr = 1996 AND b.yr = 1997
        |  AND b.s0 > 0 AND b.s3 > 0 AND b.s6 > 0
        |ORDER BY a.wk"""),

    // q21 shape — the before/after pivot-date quantity ratio per
    // (supplier, part), banded to [2/3, 3/2] (q21's warehouse/item
    // inventory-shift band, carried onto the order timeline).
    QDef.common("tpcds_s_beforeafter",
      """WITH sp AS (
        |  SELECT l_suppkey AS sk, l_partkey AS pk,
        |    CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |      THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS before_q,
        |    CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        |      THEN CAST(l_quantity AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS after_q
        |  FROM lineitem, orders WHERE l_orderkey = o_orderkey
        |    AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
        |  GROUP BY l_suppkey, l_partkey)
        |SELECT sk, pk, before_q, after_q FROM sp
        |WHERE before_q > 0
        |  AND after_q / before_q BETWEEN 2.0 / 3.0 AND 3.0 / 2.0
        |ORDER BY sk, pk"""),

    // q48 shape — one aggregate under a disjunction of per-segment
    // (price-band AND quantity-band) conjuncts: the optimizer must keep
    // the OR-of-ANDs intact on one fact scan.
    QDef.common("tpcds_s_orbands",
      """SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND ((c_mktsegment = 'AUTOMOBILE'
        |        AND l_extendedprice BETWEEN 500 AND 50000
        |        AND l_quantity BETWEEN 1 AND 20)
        |    OR (c_mktsegment = 'BUILDING'
        |        AND l_extendedprice BETWEEN 1000 AND 60000
        |        AND l_quantity BETWEEN 10 AND 30)
        |    OR (c_mktsegment = 'MACHINERY'
        |        AND l_extendedprice BETWEEN 1500 AND 70000
        |        AND l_quantity BETWEEN 20 AND 40))"""),

    // q41 shape — DISTINCT dimension attributes filtered by an EXISTS
    // whose body is its own OR-of-band conjuncts over the same dimension
    // (q41's manufacturer self-probe; p_brand stands in for p_mfgr,
    // p_type for p_container).
    QDef.common("tpcds_s_existsbands",
      """SELECT DISTINCT p_name FROM part p1
        |WHERE p_size BETWEEN 10 AND 20
        |  AND EXISTS (
        |    SELECT 1 FROM part p2
        |    WHERE p2.p_brand = p1.p_brand
        |      AND ((p2.p_type = 'SMALL' AND p2.p_size BETWEEN 5 AND 15)
        |        OR (p2.p_type = 'LARGE' AND p2.p_size BETWEEN 15 AND 25)))
        |ORDER BY p_name"""),

    // q57 shape (r14) — the call-center monthly deviation twin of q47:
    // per-(brand, month) sales vs the brand's yearly average, with the
    // NEIGHBORING months' sales carried through LAG/LEAD in the same
    // window family; only large deviations with both neighbors survive.
    QDef.common("tpcds_s_monthneighbor",
      """WITH v AS (
        |  SELECT p_brand AS brand,
        |    CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mo,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sales
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                JOIN part ON l_partkey = p_partkey
        |  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
        |  GROUP BY p_brand, EXTRACT(MONTH FROM o_orderdate)
        |), w AS (
        |  SELECT brand, mo, sales,
        |    CAST(SUM(CAST(sales AS DECIMAL(18,4))) OVER (PARTITION BY brand) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY brand) AS avg_sales,
        |    LAG(sales) OVER (PARTITION BY brand ORDER BY mo) AS prev_sales,
        |    LEAD(sales) OVER (PARTITION BY brand ORDER BY mo) AS next_sales
        |  FROM v)
        |SELECT brand, mo, sales, avg_sales, prev_sales, next_sales
        |FROM w
        |WHERE avg_sales > 0 AND abs(sales - avg_sales) / avg_sales > 0.4
        |  AND prev_sales IS NOT NULL AND next_sales IS NOT NULL
        |ORDER BY brand, mo"""),

    // q32/q92 shape (r14) — "excess discount": lines whose discount
    // exceeds 1.3x the per-item average, the threshold a CORRELATED
    // scalar sub-query against the same fact (decorrelates to a
    // per-item aggregate joined back — one extra pass, no N+1 scans).
    QDef.common("tpcds_s_excessdiscount",
      """SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS excess,
        |  COUNT(*) AS n
        |FROM lineitem l
        |WHERE l.l_discount > 1.3 * (
        |  SELECT CAST(SUM(CAST(l2.l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
        |  FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""),

    // q62 shape (r14) — shipping-latency bucket pivot: per-priority counts
    // in 30/60/90/90+ day ship-lag bands, one scan, CASE-banded sums
    // (the interval-shifted comparisons keep the date math portable).
    QDef.common("tpcds_s_shipbuckets",
      """SELECT o_orderpriority AS c0,
        |  CAST(SUM(CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS d30,
        |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 30 DAY
        |                 AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS d60,
        |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
        |                 AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS d90,
        |  CAST(SUM(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |                THEN 1 ELSE 0 END) AS BIGINT) AS d120
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY c0"""),

    // q76 shape (r14) — tagged-channel union: each channel slice carries a
    // literal tag through a UNION ALL, then one aggregation over the
    // union (counts + amounts per tag x status).
    QDef.common("tpcds_s_uniontags",
      """SELECT channel, c0, COUNT(*) AS cnt,
        |  CAST(SUM(CAST(price AS DECIMAL(28,2))) AS DOUBLE) AS amt
        |FROM (
        |  SELECT 'returned' AS channel, l_linestatus AS c0, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT 'accepted' AS channel, l_linestatus AS c0, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'A'
        |  UNION ALL
        |  SELECT 'neither' AS channel, l_linestatus AS c0, l_extendedprice AS price
        |  FROM lineitem WHERE l_returnflag = 'N'
        |) u
        |GROUP BY channel, c0
        |ORDER BY channel, c0"""),

    // q44 shape (r14) — best/worst performers joined at rank position:
    // the same per-item net-revenue aggregate ranked ascending AND
    // descending, the two rankings equi-joined on rank (ties broken by
    // item so both rankings are total orders).
    QDef.common("tpcds_s_bestworst",
      """WITH perf AS (
        |  SELECT l_partkey AS item,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * CAST(1 - l_discount AS DECIMAL(8,2))) AS DOUBLE) AS net
        |  FROM lineitem GROUP BY l_partkey),
        |best AS (
        |  SELECT item, net, RANK() OVER (ORDER BY net DESC, item) AS r FROM perf),
        |worst AS (
        |  SELECT item, net, RANK() OVER (ORDER BY net ASC, item) AS r FROM perf)
        |SELECT b.r AS rnk, b.item AS best_item, w.item AS worst_item
        |FROM best b JOIN worst w ON b.r = w.r
        |WHERE b.r <= 10
        |ORDER BY rnk"""),

    // q61 shape (r14) — promotional-revenue share: two restricted
    // aggregates of the same fact cross-joined into one ratio row
    // (both scalar aggregates broadcast; no fact re-shuffle).
    QDef.common("tpcds_s_promoratio",
      """WITH promo AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS p
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_type LIKE 'PROMO%'),
        |total AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS t
        |  FROM lineitem)
        |SELECT p AS promo_rev, t AS total_rev, p / t * 100.0 AS pct
        |FROM promo, total"""),

    // ---- r15 tranche: the four TpcdsTest structures named in the r13/r14
    // verdicts as still-absent (plus/src/.../tpcds/TpcdsTest.java) --------

    // q23 FULL shape — the existing tpcds_s_freqbest carries only the
    // frequent-items ∩ best-customers intersection; the real q23 adds
    // (a) a data-derived spend threshold (best customers = spend above a
    // fraction of the MAX customer spend — a scalar subquery over the
    // same per-customer CTE, not a literal), and (b) TWO channel slices
    // each doubly restricted by both CTEs, combined by UNION ALL into one
    // grand total. Both IN-lists broadcast (item and customer sets are
    // dimension-sized); each channel scans the fact once with the filter
    // pushed — no fact self-join anywhere.
    QDef.common("tpcds_s_freqbest_channels",
      """WITH freq_items AS (
        |  SELECT l_partkey AS item FROM lineitem
        |  GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) > 3),
        |percust AS (
        |  SELECT o_custkey AS cust,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey),
        |best_cust AS (
        |  SELECT cust FROM percust
        |  WHERE total > 0.5 * (SELECT MAX(total) FROM percust)),
        |chan1 AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linestatus = 'O'
        |    AND l_partkey IN (SELECT item FROM freq_items)
        |    AND o_custkey IN (SELECT cust FROM best_cust)),
        |chan2 AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS rev
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_linestatus = 'F'
        |    AND l_partkey IN (SELECT item FROM freq_items)
        |    AND o_custkey IN (SELECT cust FROM best_cust))
        |SELECT CAST(SUM(CAST(rev AS DECIMAL(28,2))) AS DOUBLE) AS total_rev
        |FROM (SELECT rev FROM chan1 UNION ALL SELECT rev FROM chan2) u"""),

    // q49 FULL shape — tpcds_s_dualrank ranks ONE channel two ways; the
    // real q49 runs the dual ranking separately in THREE channels and
    // UNION ALLs the tagged survivors. Channels here are market segments
    // (the fixture's channel-like dimension); each branch aggregates its
    // slice to per-item grain, ranks by returned-quantity share and
    // returned-amount share with item tiebreaks, keeps rows in EITHER
    // top-10. Each rank window runs over a dimension-sized per-item
    // aggregate, never the fact.
    QDef.common("tpcds_s_threechannel_rank",
      """WITH base AS (
        |  SELECT c_mktsegment AS seg, l_partkey AS item,
        |    COALESCE(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
        |      FILTER (WHERE l_returnflag = 'R') AS DOUBLE), 0.0) AS ret_qty,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    COALESCE(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2)))
        |      FILTER (WHERE l_returnflag = 'R') AS DOUBLE), 0.0) AS ret_amt,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS amt
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        |  GROUP BY c_mktsegment, l_partkey),
        |building AS (
        |  SELECT 'BUILDING' AS channel, item, ret_qty / qty AS qty_ratio,
        |    ret_amt / amt AS amt_ratio,
        |    RANK() OVER (ORDER BY ret_qty / qty DESC, item) AS qty_rank,
        |    RANK() OVER (ORDER BY ret_amt / amt DESC, item) AS amt_rank
        |  FROM base WHERE seg = 'BUILDING' AND qty > 0 AND amt > 0),
        |machinery AS (
        |  SELECT 'MACHINERY' AS channel, item, ret_qty / qty AS qty_ratio,
        |    ret_amt / amt AS amt_ratio,
        |    RANK() OVER (ORDER BY ret_qty / qty DESC, item) AS qty_rank,
        |    RANK() OVER (ORDER BY ret_amt / amt DESC, item) AS amt_rank
        |  FROM base WHERE seg = 'MACHINERY' AND qty > 0 AND amt > 0),
        |automobile AS (
        |  SELECT 'AUTOMOBILE' AS channel, item, ret_qty / qty AS qty_ratio,
        |    ret_amt / amt AS amt_ratio,
        |    RANK() OVER (ORDER BY ret_qty / qty DESC, item) AS qty_rank,
        |    RANK() OVER (ORDER BY ret_amt / amt DESC, item) AS amt_rank
        |  FROM base WHERE seg = 'AUTOMOBILE' AND qty > 0 AND amt > 0)
        |SELECT channel, item, qty_ratio, amt_ratio, qty_rank, amt_rank FROM (
        |  SELECT * FROM building WHERE qty_rank <= 10 OR amt_rank <= 10
        |  UNION ALL
        |  SELECT * FROM machinery WHERE qty_rank <= 10 OR amt_rank <= 10
        |  UNION ALL
        |  SELECT * FROM automobile WHERE qty_rank <= 10 OR amt_rank <= 10
        |) tagged
        |ORDER BY channel, qty_rank, amt_rank, item"""),

    // q78 FULL shape — tpcds_s_missingchannel carries only the anti join;
    // the real q78 (a) EXCLUDES returned sales via a left-join-IS-NULL
    // anti pattern at the sales grain, (b) aggregates the surviving rows
    // per (customer, item) in each channel (years here), and (c) LEFT
    // JOINs the primary channel to the other with COALESCE ZERO-FILL so
    // customers absent from the second channel still appear, ordered by
    // the cross-channel growth ratio. The returned-pair set is
    // dimension-small after DISTINCT → broadcast anti join; each year
    // aggregate shuffles once on (cust, item).
    QDef.common("tpcds_s_channelratio",
      """WITH returned_pairs AS (
        |  SELECT DISTINCT l_orderkey AS rok, l_partkey AS rpk
        |  FROM lineitem WHERE l_returnflag = 'R'),
        |clean AS (
        |  SELECT o_custkey AS cust, l_partkey AS item,
        |    CAST(year(o_orderdate) AS INT) AS yr, l_quantity, l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  LEFT JOIN returned_pairs ON l_orderkey = rok AND l_partkey = rpk
        |  WHERE rok IS NULL),
        |y96 AS (
        |  SELECT cust, item,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS amt
        |  FROM clean WHERE yr = 1996 GROUP BY cust, item),
        |y97 AS (
        |  SELECT cust, item,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS amt
        |  FROM clean WHERE yr = 1997 GROUP BY cust, item)
        |SELECT w.cust, w.item, w.qty AS qty96, COALESCE(o.qty, 0.0) AS qty97,
        |  w.amt AS amt96, COALESCE(o.amt, 0.0) AS amt97,
        |  COALESCE(o.qty, 0.0) / w.qty AS growth_ratio
        |FROM y96 w LEFT JOIN y97 o ON w.cust = o.cust AND w.item = o.item
        |WHERE w.qty > 40
        |ORDER BY growth_ratio, w.cust, w.item"""),

    // q95 FULL shape — tpcds_s_existschain nests the supplier self-join
    // inside an EXISTS; the real q95's distinguishing structure is a
    // SHARED multi-supplier CTE referenced TWICE: once directly (orders
    // shipped by >1 supplier) and once joined through the returns slice
    // (returned orders that ALSO flowed through the chain) — the two-hop
    // ship-chain. Both IN-lists reduce to DISTINCT order-key sets
    // (semi-join sized), and the date window prunes the probe side first.
    QDef.common("tpcds_s_shipchain2hop",
      """WITH multi_supp AS (
        |  SELECT DISTINCT l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
        |ret_chain AS (
        |  SELECT DISTINCT lr.l_orderkey AS ok
        |  FROM lineitem lr JOIN multi_supp m ON lr.l_orderkey = m.ok
        |  WHERE lr.l_returnflag = 'R')
        |SELECT o_orderpriority AS pri,
        |  COUNT(DISTINCT o_orderkey) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderkey IN (SELECT ok FROM multi_supp)
        |  AND o_orderkey IN (SELECT ok FROM ret_chain)
        |GROUP BY o_orderpriority
        |ORDER BY pri"""),

    // q94 shape — the ANTI twin of q95/tpcds_s_shipchain2hop: orders
    // shipped by more than one supplier with NO returned line at all
    // (IN over the shared multi-supplier set + NOT IN over the returns
    // slice — a semi join and an anti join against the same fact's
    // derived key sets). TPC-DS pairs q94 (NOT EXISTS web_returns) with
    // q95 (the two-hop IN) over the same ws_wh CTE.
    QDef.common("tpcds_s_shipchain_anti",
      """WITH multi_supp AS (
        |  SELECT DISTINCT l1.l_orderkey AS ok
        |  FROM lineitem l1 JOIN lineitem l2
        |    ON l1.l_orderkey = l2.l_orderkey AND l1.l_suppkey <> l2.l_suppkey),
        |returned AS (
        |  SELECT DISTINCT l_orderkey AS ok FROM lineitem
        |  WHERE l_returnflag = 'R')
        |SELECT o_orderpriority AS pri,
        |  COUNT(DISTINCT o_orderkey) AS order_cnt,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderkey IN (SELECT ok FROM multi_supp)
        |  AND o_orderkey NOT IN (SELECT ok FROM returned)
        |GROUP BY o_orderpriority
        |ORDER BY pri"""),

    // q69/q35/q10 exclusion shape — customers ACTIVE in the primary
    // channel during the window but ABSENT from the secondary channel
    // (EXISTS + NOT EXISTS over two slices of the same fact), rolled up
    // by a demographic-like dimension with per-group counts. The OR-of-
    // EXISTS variant is tpcds_s_orexists; this carries q69's conjunctive
    // include/exclude screen.
    QDef.common("tpcds_s_existsnotexists",
      """SELECT c_mktsegment AS seg,
        |  COUNT(*) AS cnt,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |      AND o.o_orderstatus = 'F')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey
        |      AND o2.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND o2.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |      AND o2.o_orderstatus = 'O')
        |GROUP BY c_mktsegment
        |ORDER BY seg"""),

    // q64 shape — the famous two-epoch mega-CTE: ONE aggregate CTE
    // (cross_sales: item × location × year cells with count/sales/qty
    // measures) joined to ITSELF at two adjacent year grains on the
    // non-year keys, keeping pairs whose second-year activity did not
    // grow (cs2.cnt <= cs1.cnt) — the only registry structure where the
    // same CTE appears twice at different parameter pins. Plan posture:
    // Catalyst inlines the CTE per arm and pushes each arm's year pin
    // below the aggregate to the Filter directly over the orders scan
    // (year(o_orderdate) = 1999 / 2000 — an expression predicate, so it
    // lands in the scan-adjacent Filter rather than parquet PushedFilters;
    // PLANS.md "tpcds_s_twoepoch_selfjoin" nodes (4)/(21)), so each arm
    // reads the fact ONCE with its epoch filter applied before the
    // aggregate; the join runs over two post-aggregate dimension-sized
    // cell sets on (item, loc), never fact × fact.
    QDef.common("tpcds_s_twoepoch_selfjoin",
      """WITH cross_sales AS (
        |  SELECT l_partkey AS item, c_nationkey AS loc,
        |    CAST(year(o_orderdate) AS INT) AS syear,
        |    COUNT(*) AS cnt,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sales,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  GROUP BY l_partkey, c_nationkey, CAST(year(o_orderdate) AS INT))
        |SELECT cs1.item, cs1.loc,
        |  cs1.syear AS year1, cs2.syear AS year2,
        |  cs1.cnt AS cnt1, cs2.cnt AS cnt2,
        |  cs1.sales AS sales1, cs2.sales AS sales2,
        |  cs1.qty AS qty1, cs2.qty AS qty2
        |FROM cross_sales cs1
        |JOIN cross_sales cs2
        |  ON cs1.item = cs2.item AND cs1.loc = cs2.loc
        |WHERE cs1.syear = 1999 AND cs2.syear = 2000
        |  AND cs2.cnt <= cs1.cnt
        |ORDER BY cs1.item, cs1.loc"""),

    // q14 cross_items shape — completes the q14 pair begun by
    // tpcds_s_iceberg (which carries only the avg-sales threshold half):
    // cross_items = items present in ALL THREE channels via a two-deep
    // INTERSECT of per-channel item sets; the channel cells are then
    // restricted to that set AND held above the iceberg threshold
    // computed over the UNRESTRICTED union of all cells (real q14
    // computes avg_sales over everything, not the restricted slice).
    // Plan posture: each INTERSECT arm scans the fact once with its
    // channel pin pushed down and aggregates to a dimension-sized item
    // set; the IN-list broadcasts into the cells scan; the threshold is
    // one scalar broadcast. No fact self-join.
    QDef.common("tpcds_s_crossitems_iceberg",
      """WITH chan AS (
        |  SELECT c_mktsegment AS channel, l_partkey AS item,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        |  GROUP BY c_mktsegment, l_partkey),
        |cross_items AS (
        |  SELECT item FROM chan WHERE channel = 'BUILDING'
        |  INTERSECT
        |  SELECT item FROM chan WHERE channel = 'MACHINERY'
        |  INTERSECT
        |  SELECT item FROM chan WHERE channel = 'AUTOMOBILE'),
        |threshold AS (
        |  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev FROM chan)
        |SELECT channel, item, CAST(rev AS DOUBLE) AS rev
        |FROM chan, threshold
        |WHERE item IN (SELECT item FROM cross_items)
        |  AND CAST(rev AS DOUBLE) > 1.2 * avg_rev
        |ORDER BY channel, item"""),

    // The single-scan rewrite of tpcds_s_crossitems_iceberg (the
    // SCALING.md r16 guidance made executable, same pattern as
    // tpcds_s_missingchannel_1scan): the literal INTERSECT form inlines
    // the `chan` CTE five times (three INTERSECT arms + restricted
    // cells + threshold — five fact scans, measured 36.8 s at ×100).
    // Because (channel, item) is the cells' group key, "item present in
    // all three channels" is COUNT(*) OVER (PARTITION BY item) = 3 and
    // the unrestricted threshold is SUM/COUNT OVER () — one fact scan,
    // two window passes over the dimension-sized cells.
    // TpcdsChannelsSpec pins both twins row-equal and the scan counts.
    QDef.common("tpcds_s_crossitems_1scan",
      """WITH chan AS (
        |  SELECT c_mktsegment AS channel, l_partkey AS item,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DECIMAL(28,2)) AS rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
        |  GROUP BY c_mktsegment, l_partkey),
        |marked AS (
        |  SELECT channel, item, rev,
        |    COUNT(*) OVER (PARTITION BY item) AS nchan,
        |    CAST(SUM(rev) OVER () AS DOUBLE) / COUNT(*) OVER () AS avg_rev
        |  FROM chan)
        |SELECT channel, item, CAST(rev AS DOUBLE) AS rev
        |FROM marked
        |WHERE nchan = 3 AND CAST(rev AS DOUBLE) > 1.2 * avg_rev
        |ORDER BY channel, item""")
  )
}
