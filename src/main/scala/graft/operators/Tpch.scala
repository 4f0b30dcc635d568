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
