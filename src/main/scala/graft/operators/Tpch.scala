package graft.operators

import graft.QDef

/** Adapted TPC-H query suite — the reference's benchmark-capability corpus
  * (reference: plus/src/test/java/org/apache/calcite/adapter/tpch/TpchTest.java,
  * QUERIES:68 — all 22 queries; several @Disabled there because the
  * enumerable engine is too slow; here they run distributed).
  *
  * The fixture schema is a simplified TPC-H (FIXTURES.md §A: fewer columns,
  * timestamps, double prices) so query text is lightly adapted: date
  * constants shifted into the generated 1995-2001 range, references to
  * missing columns (shippriority, shipmode, phone, partsupp) dropped or
  * remapped. Each runs as ONE dialect-shared SQL text through Engine.sql
  * (our parse→optimize→execute chain) and doubles as its own DuckDB oracle.
  */
object Tpch {
  val defs: Seq[QDef] = Seq(

    // Q2 — minimum-cost supplier (adapted: no partsupp, so the part↔supplier
    // relation and the "supply cost" come from lineitem: cost proxy =
    // unit price l_extendedprice/l_quantity; correlated MIN subquery kept)
    QDef.common("tpch_q2",
      """SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name
        |FROM part, supplier, lineitem, nation, region
        |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |  AND p_size = 15 AND p_type = 'ECONOMY'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND l_extendedprice / l_quantity = (
        |    SELECT MIN(l2.l_extendedprice / l2.l_quantity)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
        |      AND r2.r_name = 'ASIA')
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""),

    // Q3 — shipping-priority revenue (adapted: no shippriority column)
    QDef.common("tpch_q3",
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
        |  o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10"""),

    // Q4 — order-priority checking (adapted: no commit/receipt dates, so
    // "late" = shipped 60+ days after the order date; correlated EXISTS kept)
    QDef.common("tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority"""),

    // Q5 — local-supplier volume (customer and supplier in the same nation)
    QDef.common("tpch_q5",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name"""),

    // Q6 — forecasting revenue change
    QDef.common("tpch_q6",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),

    // Q7 — volume shipping between two nations (six-way join, two nation
    // roles — the join-reorder workout)
    QDef.common("tpch_q7",
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(SUM(CAST(volume AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS INT) AS l_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        |      OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |) shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year"""),

    // Q8 — national market share (two nation roles, conditional share of a
    // decimal-summed volume; the classic 8-way join)
    QDef.common("tpch_q8",
      """SELECT o_year,
        |  CAST(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END
        |        AS DECIMAL(28,8))) AS DOUBLE)
        |    / CAST(SUM(CAST(volume AS DECIMAL(28,8))) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) AS volume,
        |    n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        |    AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |    AND p_type = 'STANDARD'
        |) all_nations
        |GROUP BY o_year ORDER BY o_year"""),

    // Q9 — product-type profit (adapted: no partsupp, cost proxied at 50%)
    QDef.common("tpch_q9",
      """SELECT nation, o_year,
        |  CAST(SUM(CAST(amount AS DECIMAL(28,8))) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        |    l_extendedprice * (1.0 - l_discount) - 0.5 * l_extendedprice AS amount
        |  FROM part, supplier, lineitem, orders, nation
        |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%a%'
        |) profit
        |GROUP BY nation, o_year ORDER BY nation, o_year DESC"""),

    // Q10 — returned-item reporting
    QDef.common("tpch_q10",
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
        |  c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20"""),

    // Q11 — important stock (adapted: no partsupp; per-part "value" =
    // Σ price×qty via this nation's suppliers, HAVING vs a scalar-subquery
    // fraction of the global total — the decimal sums keep the strict
    // inequality bit-identical across engines)
    QDef.common("tpch_q11",
      """SELECT l_partkey,
        |  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_name = 'NATION_3'
        |GROUP BY l_partkey
        |HAVING CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE) > (
        |  SELECT CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE) * 0.002
        |  FROM lineitem, supplier, nation
        |  WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |    AND n_name = 'NATION_3')
        |ORDER BY value DESC, l_partkey"""),

    // Q12 — shipping-mode priority counts (adapted: no shipmode/receiptdate —
    // mode proxied by returnflag, "late" = shipped 30+ days after order)
    QDef.common("tpch_q12",
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
        |           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL '30' DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag"""),

    // Q13 — customer order-count distribution
    QDef.common("tpch_q13",
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey
        |) GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""),

    // Q14 — promotion effect
    QDef.common("tpch_q14",
      """SELECT CAST(100.00 * CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END AS DECIMAL(28,8))) AS DOUBLE)
        |  / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS DOUBLE) AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'"""),

    // Q15 — top supplier (the CTE stands in for the reference's CREATE VIEW;
    // referenced twice: once joined, once under MAX)
    QDef.common("tpch_q15",
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE)
        |      AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey
        |)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        |ORDER BY s_suppkey"""),

    // Q16 — part/supplier relationship (adapted: the relation comes from
    // lineitem; NOT IN suppliers whose name ends in '7' stands in for the
    // complaints filter)
    QDef.common("tpch_q16",
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND p_brand <> 'Brand#13' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),

    // Q17 — small-quantity-order revenue (correlated average with the
    // decimal-sum AVG decomposition so both engines compare the same double)
    QDef.common("tpch_q17",
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,8))) AS DOUBLE) / 7.0 AS DOUBLE)
        |  AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_size = 5
        |  AND l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)"""),

    // Q18 — large-volume customers
    QDef.common("tpch_q18",
      """SELECT c_custkey, o_orderkey, o_orderdate,
        |  CAST(o_totalprice AS DOUBLE) AS total,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 250)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY total DESC, o_orderkey LIMIT 100"""),

    // Q19 — discounted revenue for quantity/brand/size bands
    QDef.common("tpch_q19",
      """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND (
        |     (p_brand = 'Brand#2' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 15)
        |  OR (p_brand = 'Brand#4' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 25)
        |  OR (p_brand = 'Brand#17' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 40))"""),

    // Q20 — potential part promotion (adapted: no partsupp/availqty — the
    // "excess stock" supplier set is the IN + GROUP BY/HAVING subquery over
    // lineitem volume of the promoted parts)
    QDef.common("tpch_q20",
      """SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem, part
        |    WHERE l_partkey = p_partkey AND p_name LIKE 'small%'
        |      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |    GROUP BY l_suppkey
        |    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 100)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_2'
        |ORDER BY s_name"""),

    // Q21 — suppliers who kept orders waiting (adapted: "late" = shipped
    // 60+ days after order date; the EXISTS / NOT EXISTS pair over two more
    // lineitem roles is kept, NOT EXISTS correlating on the outer order date)
    QDef.common("tpch_q21",
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL '60' DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL '60' DAY)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""),

    // Q22 — global sales opportunity (adapted: nation group instead of
    // phone country code; "no recent large order" instead of "no order")
    QDef.common("tpch_q22",
      """SELECT grp, count(*) AS numcust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM (
        |  SELECT c_nationkey % 5 AS grp, c_acctbal, c_custkey FROM customer
        |  WHERE c_acctbal > (
        |      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
        |      FROM customer WHERE c_acctbal > 0.0)
        |    AND NOT EXISTS (SELECT 1 FROM orders
        |                    WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        |) GROUP BY grp ORDER BY grp""")
  )
}
