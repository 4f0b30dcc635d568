package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Relational-core operator coverage (SURVEY.md §2.1–§2.3).
  *
  * Each QDef exercises one logical operator of the reference algebra
  * (reference: core/src/main/java/org/apache/calcite/rel/core/ — TableScan,
  * Project, Filter, Calc, Join incl. semi/anti, Aggregate incl. groupSets,
  * Window, Sort w/ offset+fetch, Union/Intersect/Minus w/ ALL, Values,
  * Correlate/Uncollect, Sample) through the idiomatic Spark DataFrame API,
  * letting Catalyst pick physical operators (broadcast vs shuffle join,
  * partial aggregation, TakeOrderedAndProject...).
  *
  * Scale notes (100 TB posture):
  *  - dimension tables (region/nation/supplier/part) are broadcast — no
  *    shuffle of the fact table for those joins;
  *  - fact-fact joins (lineitem⋈orders) shuffle on the join key, which AQE
  *    re-plans at runtime (skew split, partition coalescing);
  *  - aggregations rely on partial (map-side) aggregation; DECIMAL sums are
  *    order-independent so the result is stable under any parallelism.
  */
object Relational {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  /** Order-independent exact sum of a double column: decimal-sum → double. */
  private def dsum(c: Column, p: Int = 18, sc: Int = 4): Column =
    sum(c.cast(DecimalType(p, sc))).cast("double")

  val defs: Seq[QDef] = Seq(

    // ---- TableScan + Filter + Project + Calc ------------------------------
    // reference: rel/core/TableScan.java:46, Filter.java:51, Project.java:57,
    // Calc.java:47 (fused program — Catalyst's CollapseProject/CombineFilters
    // does the fusion for us).
    QDef.sql("scan_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |       l_extendedprice * (1.0 - l_discount) AS net_price,
        |       l_quantity + l_tax AS qty_tax,
        |       CASE WHEN l_discount > 0.05 THEN 'HI' ELSE 'LO' END AS disc_band
        |FROM lineitem
        |WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag <> 'A'""") { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_quantity").between(10, 20) && col("l_returnflag") =!= "A")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net_price"),
          (col("l_quantity") + col("l_tax")).as("qty_tax"),
          when(col("l_discount") > 0.05, "HI").otherwise("LO").as("disc_band"))
    },

    // ---- Aggregate (hash agg, multiple aggs, avg decomposition) -----------
    // reference: rel/core/Aggregate.java:73; AVG decomposition mirrors
    // rel/rules/AggregateReduceFunctionsRule.java (sum/count arithmetic).
    // TPC-H Q1 shape (reference: plus/.../tpch/TpchTest.java QUERIES:68).
    QDef.sql("agg_tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(28,8))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""") { (s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 28, 8).as("sum_disc_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 28, 8).as("sum_charge"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", col("sum_qty") / col("count_order"))
        .select("l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
          "sum_disc_price", "sum_charge", "avg_qty", "count_order")
    },

    // ---- Inner equi-join, multiway, broadcast dims ------------------------
    // reference: rel/core/Join.java:55, physical EnumerableHashJoin.java:48.
    // TPC-H Q5 shape: fact-fact shuffle join + broadcast dimension joins.
    QDef.sql("join_inner_multiway",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,8))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY n_name""") { (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 28, 8).as("revenue"),
          count(lit(1)).as("n_items"))
    },

    // ---- Left outer join --------------------------------------------------
    QDef.sql("join_left_outer",
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
        |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_orders"),
          coalesce(dsum(col("o_totalprice")), lit(0.0)).as("total_spent"))
    },

    // ---- Full outer join --------------------------------------------------
    QDef.sql("join_full_outer",
      """SELECT COALESCE(c.nk, s.nk) AS nk, c.n_cust, s.n_supp
        |FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
        |FULL JOIN (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1) s
        |  ON c.nk = s.nk""") { (s, dir) =>
      val c = t(s, dir, "customer").groupBy(col("c_nationkey").as("cnk"))
        .agg(count(lit(1)).as("n_cust"))
      val sp = t(s, dir, "supplier").groupBy(col("s_nationkey").as("snk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sp, col("cnk") === col("snk"), "full")
        .select(coalesce(col("cnk"), col("snk")).as("nk"), col("n_cust"), col("n_supp"))
    },

    // ---- Semi join (EXISTS) -----------------------------------------------
    // reference: JoinRelType.SEMI (rel/core/JoinRelType.java:24-71),
    // runtime BuiltInMethod.SEMI_JOIN; Spark: left_semi.
    QDef.sql("join_semi",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""") { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---- Anti join (NOT EXISTS) -------------------------------------------
    QDef.sql("join_anti",
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity > 45)""") { (s, dir) =>
      t(s, dir, "part")
        .join(
          t(s, dir, "lineitem").where(col("l_quantity") > 45),
          col("p_partkey") === col("l_partkey"), "left_anti")
        .select("p_partkey", "p_name")
    },

    // ---- Cross join + theta (nested-loop) ---------------------------------
    // reference: EnumerableNestedLoopJoin.java:44 (arbitrary theta condition).
    QDef.sql("join_theta_nl",
      """SELECT r_name, n_name FROM region JOIN nation ON n_regionkey < r_regionkey""") { (s, dir) =>
      t(s, dir, "region")
        .join(t(s, dir, "nation"), col("n_regionkey") < col("r_regionkey"))
        .select("r_name", "n_name")
    },

    // ---- Window: ranks, frames, lead/lag, ntile ---------------------------
    // reference: rel/core/Window.java:66, frame bounds rex/RexWindowBound.java;
    // ranked fns registered at adapter/enumerable/RexImpTable.java:616-627.
    QDef.sql("window_rank_frames",
      """SELECT o_orderkey, o_custkey,
        |  rank()       OVER w AS rnk,
        |  dense_rank() OVER w AS drnk,
        |  row_number() OVER w AS rn,
        |  ntile(4)     OVER w AS quartile,
        |  lag(o_orderkey)  OVER w AS prev_ok,
        |  lead(o_orderkey) OVER w AS next_ok,
        |  first_value(o_orderkey) OVER w AS first_ok,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""") { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        row_number().over(w).as("rn"),
        ntile(4).over(w).as("quartile"),
        lag(col("o_orderkey"), 1).over(w).as("prev_ok"),
        lead(col("o_orderkey"), 1).over(w).as("next_ok"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        sum(col("o_totalprice").cast(DecimalType(18, 4)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_spend"))
    },

    // ---- Window: range frame ----------------------------------------------
    QDef.sql("window_range_frame",
      """SELECT s_suppkey, s_nationkey, s_acctbal,
        |  COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
        |                 RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING) AS peers_within_500
        |FROM supplier""") { (s, dir) =>
      // DataFrame rangeBetween only accepts Long offsets; double-valued
      // range frames go through the SQL window syntax.
      t(s, dir, "supplier").select(
        col("s_suppkey"), col("s_nationkey"), col("s_acctbal"),
        expr("""COUNT(*) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal
                RANGE BETWEEN 500.0 PRECEDING AND 500.0 FOLLOWING)""").as("peers_within_500"))
    },

    // ---- Sort + offset + fetch (one Sort node in the reference) -----------
    // reference: rel/core/Sort.java:45 (collation + offset + fetch).
    QDef.sql("sort_limit_offset",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10""") { (s, dir) =>
      t(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .offset(10).limit(50)
    },

    // ---- Set operations: ALL + DISTINCT variants --------------------------
    // reference: rel/core/Union.java:35, Intersect.java:35, Minus.java:39;
    // runtime linq4j/EnumerableDefaults.java distinct:441/intersect:951/except:534.
    QDef.sql("setop_union_distinct",
      """SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey"))).distinct()
    },
    QDef.sql("setop_union_all",
      """SELECT nk, COUNT(*) AS n FROM (
        |  SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier
        |) GROUP BY nk""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey")))
        .groupBy(col("nk")).agg(count(lit(1)).as("n"))
    },
    QDef.sql("setop_intersect",
      """SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey")))
    },
    QDef.sql("setop_intersect_all",
      """SELECT c_nationkey AS nk FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .intersectAll(t(s, dir, "supplier").select(col("s_nationkey")))
    },
    QDef.sql("setop_except",
      """SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier""") { (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey")))
    },
    QDef.sql("setop_except_all",
      """SELECT o_custkey AS k FROM orders EXCEPT ALL SELECT c_custkey FROM customer""") { (s, dir) =>
      t(s, dir, "orders").select(col("o_custkey").as("k"))
        .exceptAll(t(s, dir, "customer").select(col("c_custkey")))
    },

    // ---- GROUPING SETS / ROLLUP / CUBE ------------------------------------
    // reference: rel/core/Aggregate.java:109-135 (groupSets), executed by
    // expansion in EnumerableAggregate.java:60.
    QDef.sql("agg_rollup",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""") { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "n", "sum_qty")
    },
    QDef.sql("agg_cube",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""") { (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
    },
    QDef.sql("agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n
              |FROM lineitem
              |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin)
    },

    // ---- DISTINCT aggregates + FILTER clause ------------------------------
    // reference: AggregateCall.java:40 (distinct, filterArg);
    // rel/rules/AggregateExpandDistinctAggregatesRule.java.
    QDef.sql("agg_distinct_filter",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 25) AS nd_supp_hi,
        |  COUNT(*) FILTER (WHERE l_discount = 0) AS n_nodisc
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("nd_part"),
          expr("COUNT(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 25)").as("nd_supp_hi"),
          expr("COUNT(*) FILTER (WHERE l_discount = 0)").as("n_nodisc"))
    },

    // ---- Values (inline literal rows) -------------------------------------
    // reference: rel/core/Values.java:46.
    QDef.sql("values_inline",
      """SELECT r_name, v.bonus FROM region
        |JOIN (VALUES (0, 10), (1, 20), (2, 30), (3, 40), (4, 50)) AS v(rk, bonus)
        |  ON r_regionkey = v.rk""") { (s, dir) =>
      import s.implicits._
      val v = Seq((0, 10), (1, 20), (2, 30), (3, 40), (4, 50)).toDF("rk", "bonus")
      t(s, dir, "region").join(broadcast(v), col("r_regionkey") === col("rk"))
        .select("r_name", "bonus")
    },

    // ---- Correlate / Uncollect: lateral explode with ordinality -----------
    // reference: rel/core/Correlate.java:68, Uncollect.java:46 (WITH
    // ORDINALITY); Spark: posexplode == UNNEST WITH ORDINALITY.
    QDef.sql("lateral_posexplode",
      """SELECT p_partkey, i - 1 AS pos, parts[i] AS word
        |FROM (SELECT p_partkey, string_split(p_type, ' ') AS parts FROM part),
        |     LATERAL (SELECT unnest(generate_series(1, len(parts))) AS i) g""") { (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), posexplode(split(col("p_type"), " ")).as(Seq("pos", "word")))
        .select("p_partkey", "pos", "word")
    },

    // ---- Collect (nest rows into arrays) ----------------------------------
    // reference: rel/core/Collect.java:44; deterministic via sort.
    // Array output serialized to canonical text so the driver's hash
    // comparator (pandas sort + hash) can handle it (arrays are unhashable).
    QDef.sql("collect_array",
      """SELECT n_regionkey, array_to_string(list_sort(list(n_name)), ',') AS nations
        |FROM nation GROUP BY n_regionkey""") { (s, dir) =>
      t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"))
    },

    // ---- Salted two-phase aggregation (hot-key scale path) ----------------
    // When one group key owns a disproportionate share of rows, a plain
    // groupBy funnels it through one reducer. Salting splits each key into
    // `salts` sub-groups for the partial phase, then a cheap final phase
    // over #keys × salts rows removes the salt — algebraic aggregates
    // (SUM/COUNT here) recombine exactly. Results are identical to the
    // direct groupBy, which is what the oracle pins.
    QDef.sql("agg_salted_hotkey",
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      val salts = 16
      t(s, dir, "lineitem")
        .withColumn("__salt", pmod(col("l_orderkey"), lit(salts)))
        .groupBy(col("l_returnflag"), col("__salt"))
        .agg(count(lit(1)).as("pn"),
          sum(col("l_quantity").cast(DecimalType(18, 4))).as("psum"))
        .groupBy(col("l_returnflag"))
        .agg(sum(col("pn")).as("n"),
          sum(col("psum")).cast("double").as("sum_qty"))
    },

    // ---- Scalar subquery --------------------------------------------------
    // reference: rex/RexSubQuery + SubQueryRemoveRule (tools/Programs.subQuery:247).
    QDef.sql("subq_scalar",
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey, o_totalprice FROM orders
              |WHERE o_totalprice > 1.5 * (
              |  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders)""".stripMargin)
    },

    // ---- IN / NOT IN subquery ---------------------------------------------
    QDef.sql("subq_in",
      """SELECT l_orderkey, l_partkey FROM lineitem
        |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 30)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT l_orderkey, l_partkey FROM lineitem
              |WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size > 30)""".stripMargin)
    },
    QDef.sql("subq_not_in",
      """SELECT p_partkey FROM part
        |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT p_partkey FROM part
              |WHERE p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)""".stripMargin)
    },

    // ---- Correlated EXISTS ------------------------------------------------
    // reference: sql2rel/RelDecorrelator.java (decorrelation); Catalyst
    // DecorrelateInnerQuery plays the same role.
    QDef.sql("subq_exists_correlated",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT c_custkey, c_name FROM customer c
              |WHERE EXISTS (SELECT 1 FROM orders o
              |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000.0)""".stripMargin)
    },

    // ---- Quantified comparison (ALL) --------------------------------------
    // reference: SqlQuantifyOperator (sql/fun/); Spark lacks ALL/SOME so we
    // apply the standard max/min rewrite — same rewrite Calcite's
    // SubQueryRemoveRule performs.
    QDef.sql("subq_quantified_all",
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice >= ALL (SELECT o_totalprice FROM orders WHERE o_custkey = 1)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey FROM orders
              |WHERE o_totalprice >= (SELECT COALESCE(MAX(o_totalprice), -1e308) FROM orders WHERE o_custkey = 1)""".stripMargin)
    },

    // ---- Quantified comparison (SOME/ANY) ---------------------------------
    // The dual rewrite: x > SOME (sub) ⟺ x > (SELECT MIN(sub)) — NULL (→
    // no row in WHERE) over an empty subquery on both engines, matching
    // SOME's FALSE. reference: SqlQuantifyOperator SOME_GT.
    QDef.sql("subq_quantified_some",
      """SELECT o_orderkey FROM orders
        |WHERE o_totalprice > SOME (SELECT o_totalprice FROM orders WHERE o_custkey = 1)""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderkey FROM orders
              |WHERE o_totalprice > (SELECT MIN(o_totalprice) FROM orders WHERE o_custkey = 1)""".stripMargin)
    },

    // ---- Sample (TABLESAMPLE) — nondeterministic across engines → rows-only.
    // reference: rel/core/Sample.java:36.
    QDef.rowsOnly("sample_fraction") { (s, dir) =>
      t(s, dir, "lineitem").sample(withReplacement = false, fraction = 0.1, seed = 42L)
    },

    // ---- Deterministic hash sample — the reproducible counterpart.
    // Bernoulli TABLESAMPLE draws from an engine-private PRNG; a pipeline
    // that must re-produce the SAME sample across engines, runs, and
    // repartitionings (eval splits, A/B slices at 100 TB) keys the draw on
    // a multiplicative hash of a stable id instead. The key is reduced mod
    // a prime FIRST so the product stays < 2^63 for any BIGINT key —
    // Spark wraps silently on overflow where DuckDB raises, so an
    // unreduced key diverges at orderkey ≳ 3.5e9 (ADVICE r3). Exact BIGINT
    // arithmetic in both engines -> oracle-verifiable, ~10% selectivity.
    QDef.sql("sample_hash",
      """SELECT l_orderkey, l_linenumber, l_quantity
        |FROM lineitem
        |WHERE ((l_orderkey % 1000003) * 2654435761 + l_linenumber * 40503) % 100 < 10""") { (s, dir) =>
      t(s, dir, "lineitem")
        .where(((col("l_orderkey") % lit(1000003L)) * lit(2654435761L)
          + col("l_linenumber") * lit(40503L)) % 100 < 10)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }
  )
}
