package graft.plans

/** Character-exact pinned renderings of [[RelToSqlDemo.demoPlan]] in the
  * two execution dialects. RelToSqlSpec regenerates both from the live
  * converter and compares — any converter change that alters the rendering
  * fails the spec before it can desync the DuckDB oracle (which runs
  * [[ansi]] verbatim) from the Spark execution (which runs [[spark]]).
  */
object RelToSqlPinned {

  val ansi: String =
    """SELECT * FROM (SELECT "n_name", "n_cust", CAST("sum_bal" AS DOUBLE) AS "avg_src" FROM (SELECT "n_name", COUNT(*) AS "n_cust", SUM(CAST("c_acctbal" AS DECIMAL(18,2))) AS "sum_bal" FROM (SELECT * FROM (SELECT "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "n_nationkey", "n_name", "n_regionkey" FROM (SELECT "c_custkey" AS "c_custkey", "c_name" AS "c_name", "c_nationkey" AS "c_nationkey", "c_acctbal" AS "c_acctbal", "c_mktsegment" AS "c_mktsegment" FROM "customer") t1 INNER JOIN (SELECT "n_nationkey" AS "n_nationkey", "n_name" AS "n_name", "n_regionkey" AS "n_regionkey" FROM "nation") t2 ON ("c_nationkey" = "n_nationkey")) t3 WHERE ("c_acctbal" > 100.0E0)) t4 GROUP BY "n_name") t5) t6 ORDER BY "n_name" ASC NULLS FIRST"""

  val postgres: String =
    """SELECT * FROM (SELECT "n_name", "n_cust", CAST("sum_bal" AS DOUBLE PRECISION) AS "avg_src" FROM (SELECT "n_name", COUNT(*) AS "n_cust", SUM(CAST("c_acctbal" AS DECIMAL(18,2))) AS "sum_bal" FROM (SELECT * FROM (SELECT "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "n_nationkey", "n_name", "n_regionkey" FROM (SELECT "c_custkey" AS "c_custkey", "c_name" AS "c_name", "c_nationkey" AS "c_nationkey", "c_acctbal" AS "c_acctbal", "c_mktsegment" AS "c_mktsegment" FROM "customer") t1 INNER JOIN (SELECT "n_nationkey" AS "n_nationkey", "n_name" AS "n_name", "n_regionkey" AS "n_regionkey" FROM "nation") t2 ON ("c_nationkey" = "n_nationkey")) t3 WHERE ("c_acctbal" > 100.0E0)) t4 GROUP BY "n_name") t5) t6 ORDER BY "n_name" ASC NULLS FIRST"""

  val spark: String =
    """SELECT * FROM (SELECT `n_name`, `n_cust`, CAST(`sum_bal` AS DOUBLE) AS `avg_src` FROM (SELECT `n_name`, COUNT(*) AS `n_cust`, SUM(CAST(`c_acctbal` AS DECIMAL(18,2))) AS `sum_bal` FROM (SELECT * FROM (SELECT `c_custkey`, `c_name`, `c_nationkey`, `c_acctbal`, `c_mktsegment`, `n_nationkey`, `n_name`, `n_regionkey` FROM (SELECT `c_custkey` AS `c_custkey`, `c_name` AS `c_name`, `c_nationkey` AS `c_nationkey`, `c_acctbal` AS `c_acctbal`, `c_mktsegment` AS `c_mktsegment` FROM `customer`) t1 INNER JOIN (SELECT `n_nationkey` AS `n_nationkey`, `n_name` AS `n_name`, `n_regionkey` AS `n_regionkey` FROM `nation`) t2 ON (`c_nationkey` = `n_nationkey`)) t3 WHERE (`c_acctbal` > 100.0E0)) t4 GROUP BY `n_name`) t5) t6 ORDER BY `n_name` ASC NULLS FIRST"""
}
