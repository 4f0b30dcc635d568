package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** MV DDL through the SQL front end + the union-shape rewrite —
  * VERDICT r4 items 5 and 6 (reference:
  * server/.../SqlCreateMaterializedView.java for the DDL;
  * plan/SubstitutionVisitor.java:120 union unify rules). */
class MaterializedViewSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("CREATE MATERIALIZED VIEW via SQL: later aggregate answered from the tile") {
    MaterializedViews.clear()
    Tables.registerAll(spark, sfDir)
    val status = spark.sql(
      """CREATE MATERIALIZED VIEW mv_sql_agg AS
        |SELECT l_returnflag, l_linestatus,
        |  sum(CAST(l_quantity AS DECIMAL(18,4))) AS sq, count(1) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin).head()
    assert(status.getString(0) == "created" && status.getString(1) == "mv_sql_agg")

    // coarser SQL aggregate over the same base: must be answered from the tile
    val q = spark.sql(
      """SELECT l_returnflag,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  count(1) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("graft_mv/mv_sql_agg"), s"tile not scanned:\n$physical")
    assert(!physical.contains("lineitem.parquet"), s"fact table still scanned:\n$physical")

    // result identity vs the direct computation
    val direct = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val got = q.collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == direct)

    // the MV is also directly queryable by name
    assert(spark.sql("SELECT count(1) FROM mv_sql_agg").head().getLong(0) > 0)

    val dropped = spark.sql("DROP MATERIALIZED VIEW mv_sql_agg").head()
    assert(dropped.getString(0) == "dropped")
    // after DROP, the rewrite no longer applies
    val q2 = spark.sql(
      """SELECT l_returnflag, count(1) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    assert(!q2.queryExecution.executedPlan.toString.contains("graft_mv/mv_sql_agg"))
  }

  test("union rewrite: a UNION ALL branch matching a registered tile is replaced") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def branchA() =
      Tables.t(spark, sfDir, "orders").where(col("o_orderstatus") === "F")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    def branchB() =
      Tables.t(spark, sfDir, "orders").where(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    val want = branchA().unionAll(branchB()).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

    MaterializedViews.create(spark, "mv_union_branch", branchA(), "/tmp/graft_mv/union_branch")
    val q = branchA().unionAll(branchB())
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("union_branch"), s"tile not scanned:\n$physical")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    MaterializedViews.drop("mv_union_branch")
  }

  test("union unify: permuted branches and subset-with-compensation") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def slice(status: String) =
      Tables.t(spark, sfDir, "orders").where(col("o_orderstatus") === status)
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    // expected values BEFORE the MV exists, so the equality pins the rewrite
    val wantPerm = slice("O").unionAll(slice("F"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val want = slice("P").unionAll(slice("O")).unionAll(slice("F"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq

    // MV = F ∪ O; queries permute and extend the branch set
    MaterializedViews.create(spark, "mv_union_fo",
      slice("F").unionAll(slice("O")), "/tmp/graft_mv/union_fo")

    // permuted: O ∪ F answered wholly from the tile
    val perm = slice("O").unionAll(slice("F"))
    val permPhys = perm.queryExecution.executedPlan.toString
    assert(permPhys.contains("union_fo"), s"tile not scanned:\n$permPhys")
    assert(!permPhys.contains("orders.parquet"), s"fact still scanned:\n$permPhys")
    val gotPerm = perm.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(gotPerm == wantPerm)

    // subset: P ∪ O ∪ F keeps P as the compensating branch
    val sub = slice("P").unionAll(slice("O")).unionAll(slice("F"))
    val subPhys = sub.queryExecution.executedPlan.toString
    assert(subPhys.contains("union_fo"), s"tile not scanned:\n$subPhys")
    val got = sub.collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == want)
    MaterializedViews.drop("mv_union_fo")
  }

  test("MV lifecycle: TableModify marks tiles stale, REFRESH re-materializes") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // private mutable copy of nation so TableModify can rewrite it
    val dir = "/tmp/graft_mv_life/nation"
    Tables.t(spark, sfDir, "nation").write.mode("overwrite").parquet(dir)
    def agg() = spark.read.parquet(dir)
      .groupBy(col("n_regionkey")).agg(count(lit(1)).as("n"))
    MaterializedViews.create(spark, "mv_life", agg(), "/tmp/graft_mv_life/tile")

    val q1 = agg()
    assert(q1.queryExecution.executedPlan.toString.contains("graft_mv_life/tile"),
      "fresh tile should answer the query")
    val before = q1.collect().map(r => (r.getInt(0), r.getLong(1))).toMap

    // copy-on-write DELETE on the base table → the tile must go stale and
    // STOP answering; results must reflect the delete immediately
    graft.operators.TableModify.delete(spark, dir, col("n_regionkey") === 0L)
    assert(MaterializedViews.isStale("mv_life"), "TableModify must mark the tile stale")
    val q2 = agg()
    val phys2 = q2.queryExecution.executedPlan.toString
    assert(!phys2.contains("graft_mv_life/tile"), s"stale tile still answering:\n$phys2")
    val after = q2.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(!after.contains(0) && after == (before - 0),
      s"post-delete results wrong: before=$before after=$after")

    // REFRESH → re-materialized from the CURRENT base, answering again
    MaterializedViews.refresh(spark, "mv_life")
    assert(!MaterializedViews.isStale("mv_life"))
    val q3 = agg()
    assert(q3.queryExecution.executedPlan.toString.contains("graft_mv_life/tile"),
      "refreshed tile should answer again")
    assert(q3.collect().map(r => (r.getInt(0), r.getLong(1))).toMap == after)
    MaterializedViews.drop("mv_life")
  }

  test("REFRESH MATERIALIZED VIEW DDL verb; DROP without IF EXISTS on absent view fails") {
    MaterializedViews.clear()
    Tables.registerAll(spark, sfDir)
    spark.sql(
      "CREATE MATERIALIZED VIEW mv_refresh_ddl AS SELECT n_regionkey, count(1) AS n FROM nation GROUP BY n_regionkey")
    val st = spark.sql("REFRESH MATERIALIZED VIEW mv_refresh_ddl").head()
    assert(st.getString(0) == "refreshed" && st.getString(1) == "mv_refresh_ddl")
    assert(spark.sql("SELECT count(1) FROM mv_refresh_ddl").head().getLong(0) > 0)
    spark.sql("DROP MATERIALIZED VIEW mv_refresh_ddl")
    // refresh of an absent view raises, like the reference's "Table not found"
    val e1 = intercept[IllegalStateException] {
      spark.sql("REFRESH MATERIALIZED VIEW mv_refresh_ddl")
    }
    assert(e1.getMessage.contains("not found"))
    // ADVICE r5: DROP without IF EXISTS on an absent view must raise, not
    // silently report 'dropped' (server materialized_view.iq semantics)
    val e2 = intercept[IllegalStateException] {
      spark.sql("DROP MATERIALIZED VIEW mv_refresh_ddl")
    }
    assert(e2.getMessage.contains("not found"))
  }

  test("server materialized_view.iq DDL semantics: duplicate fails, IF NOT EXISTS keeps contents") {
    MaterializedViews.drop("mv_ddl_sem")
    spark.sql(
      "CREATE MATERIALIZED VIEW mv_ddl_sem AS SELECT n_nationkey FROM nation WHERE n_nationkey > 20")
    val original = spark.sql("SELECT * FROM mv_ddl_sem").count()
    assert(original == 4)
    // create again — fails (materialized_view.iq:44-50)
    val e = intercept[IllegalStateException] {
      spark.sql(
        "CREATE MATERIALIZED VIEW mv_ddl_sem AS SELECT n_nationkey FROM nation WHERE n_nationkey < 30")
    }
    assert(e.getMessage.contains("already exists"))
    // IF NOT EXISTS — fails SILENTLY, contents unchanged (:52-66)
    val st = spark.sql(
      "CREATE MATERIALIZED VIEW IF NOT EXISTS mv_ddl_sem AS SELECT n_nationkey FROM nation WHERE n_nationkey < 30")
      .head().getString(0)
    assert(st == "exists")
    assert(spark.sql("SELECT * FROM mv_ddl_sem").count() == original)
    // drop — gone (:68-76); a second DROP IF EXISTS stays silent
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS mv_ddl_sem")
    assert(!MaterializedViews.exists("mv_ddl_sem"))
    intercept[Exception] { spark.sql("SELECT * FROM mv_ddl_sem").collect() }
    spark.sql("DROP MATERIALIZED VIEW IF EXISTS mv_ddl_sem")
  }

  test("fixture-table names are rejected: an MV cannot shadow the catalog (r6 ADVICE)") {
    MaterializedViews.clear()
    Tables.registerAll(spark, sfDir)
    val e = intercept[IllegalArgumentException] {
      spark.sql("CREATE MATERIALIZED VIEW nation AS SELECT 1 AS x")
    }
    assert(e.getMessage.contains("shadow"))
    // the fixture view is untouched and queries keep working
    assert(spark.sql("SELECT count(*) FROM nation").head().getLong(0) == 25L)

    // an API-created MV that reused a fixture name: SQL DROP must heal the
    // registration memo so the next query re-registers the fixture view
    Tables.t(spark, sfDir, "region").limit(1)
      .createOrReplaceTempView("supplier") // simulate the shadowing
    MaterializedViews.create(spark, "supplier",
      Tables.t(spark, sfDir, "region").limit(1),
      java.nio.file.Files.createTempDirectory("mv_shadow").toString + "/t")
    spark.sql("DROP MATERIALIZED VIEW supplier")
    Tables.registerAll(spark, sfDir) // memo invalidated → re-registers
    assert(spark.sql("SELECT count(*) FROM supplier").head().getLong(0) > 1L,
      "fixture view must be restored after dropping the shadowing MV")
    MaterializedViews.clear()
  }
}
