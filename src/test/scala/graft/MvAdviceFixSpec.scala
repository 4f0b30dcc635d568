package graft

import graft.plans.MaterializedViews
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the r13-advice MV-unifier findings: the residual
  * equality tautology (unsound rewrite), the IsNotNull drop past a
  * null-TOLERANT sibling (unsound rewrite), and the lost non-grouping
  * MIN/MAX rollup (missed rewrite). Plus the JSON_QUERY wrapper's strict
  * number grammar. */
class MvAdviceFixSpec extends AnyFunSuite {
  import SparkTestSession._

  private def emps() = {
    MvParityFixture.ensure(spark)
    spark.read.parquet(s"${MvParityFixture.base}/emps")
  }

  test("residual equality between two query columns must not collapse to a tautology") {
    // MV stores empid but not deptno; the query's empid = deptno is a
    // query-only equality the tile does not enforce. Substituting the
    // non-stored side through the query's own equivalence class would
    // filter the tile by empid = empid (i.e. nothing) and leak every
    // row where empid != deptno — in this fixture, ALL rows.
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def q() = emps().where(col("empid") === col("deptno")).select(col("name"))
    val want = q().collect().map(_.getString(0)).sorted
    assert(want.isEmpty, "fixture invariant: no emps row has empid = deptno")
    MaterializedViews.create(spark, "mv_taut",
      emps().select(col("empid"), col("name")), "/tmp/graft_mv/taut_tile")
    try {
      val got = q().collect().map(_.getString(0)).sorted
      assert(got.sameElements(want), s"unsound tautology rewrite leaked rows: ${got.mkString(",")}")
    } finally MaterializedViews.drop("mv_taut")
  }

  test("user-written IS NOT NULL is not dropped for a null-TOLERANT mapped sibling") {
    // The sibling salary > coalesce(commission, 0) maps onto the tile and
    // REFERENCES commission, but a null commission does not null the
    // comparison (coalesce absorbs it) — so it must NOT license dropping
    // the unmappable `commission is not null`. Sebastian (commission
    // NULL, salary 7000 > 0) is exactly the row that would leak.
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def q() = emps()
      .where(col("salary") > coalesce(col("commission").cast("double"), lit(0.0)) &&
        col("commission").isNotNull)
      .select(col("name"))
    val want = q().collect().map(_.getString(0)).sorted
    assert(!want.contains("Sebastian"), "fixture invariant: Sebastian has NULL commission")
    MaterializedViews.create(spark, "mv_nn",
      emps().select(col("salary"),
        coalesce(col("commission").cast("double"), lit(0.0)).as("cc"), col("name")),
      "/tmp/graft_mv/nn_tile")
    try {
      val got = q().collect().map(_.getString(0)).sorted
      assert(got.sameElements(want),
        s"IS NOT NULL dropped past a null-tolerant sibling: got ${got.mkString(",")}")
    } finally MaterializedViews.drop("mv_nn")
  }

  test("inferred IsNotNull still drops when a mapped sibling is null-intolerant in the column") {
    // The pre-advice capability must survive the tightened walk:
    // `deptno - 10 = 0` reaches deptno through null-intolerant nodes, so
    // the optimizer-inferred isnotnull(deptno) is redundant and the tile
    // (storing only deptno - 10) still answers the query.
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def q() = emps().where(col("deptno") - 10 === 0).select(col("name"))
    val want = q().collect().map(_.getString(0)).sorted
    MaterializedViews.create(spark, "mv_ni",
      emps().select((col("deptno") - 10).as("x"), col("name")), "/tmp/graft_mv/ni_tile")
    try {
      val qq = q()
      val plan = qq.queryExecution.executedPlan.toString
      assert(plan.contains("ni_tile"), s"tile not scanned:\n$plan")
      val got = qq.collect().map(_.getString(0)).sorted
      assert(got.sameElements(want))
    } finally MaterializedViews.drop("mv_ni")
  }

  test("non-grouping MIN/MAX rolls up from a tile storing the same call") {
    // reference SubstitutionVisitor rollup: MIN->MIN / MAX->MAX over the
    // tile's stored aggregate columns; the advice flagged this path as
    // dead after the grouping-column branch took over MIN/MAX entirely.
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mv() = emps().groupBy(col("deptno"), col("empid"))
      .agg(min(col("salary")).as("ms"), max(col("salary")).as("xs"))
    def q() = emps().groupBy(col("deptno"))
      .agg(min(col("salary")).as("lo"), max(col("salary")).as("hi"))
    val want = q().collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
    MaterializedViews.create(spark, "mv_mm", mv(), "/tmp/graft_mv/mm_tile")
    try {
      val qq = q()
      val plan = qq.queryExecution.executedPlan.toString
      assert(plan.contains("mm_tile"), s"MIN/MAX rollup not taken:\n$plan")
      val got = qq.collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally MaterializedViews.drop("mv_mm")
  }

  test("MIN(DISTINCT x) over a non-grouping column also rolls up (distinct is a no-op)") {
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def mv() = emps().groupBy(col("deptno"), col("empid"))
      .agg(min(col("salary")).as("ms"))
    def q() = emps().groupBy(col("deptno"))
      .agg(expr("min(DISTINCT salary)").as("lo"))
    val want = q().collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    MaterializedViews.create(spark, "mv_md", mv(), "/tmp/graft_mv/md_tile")
    try {
      val qq = q()
      val plan = qq.queryExecution.executedPlan.toString
      assert(plan.contains("md_tile"), s"MIN DISTINCT rollup not taken:\n$plan")
      assert(qq.collect().map(r => (r.getInt(0), r.getDouble(1))).toSet == want)
    } finally MaterializedViews.drop("mv_md")
  }

  test("EqualNullSafe residual must not collapse to a tautology either (r14 advice)") {
    // same shape as the EqualTo tautology pin, spelled with <=>: the tile
    // stores empid but not deptno, so empid <=> deptno is a query-only
    // comparison the residual must still apply — substituting it through
    // its own equivalence class would yield t <=> t (always true on the
    // non-null fixture) and leak every row.
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def q() = emps().where(col("empid") <=> col("deptno")).select(col("name"))
    val want = q().collect().map(_.getString(0)).sorted
    assert(want.isEmpty, "fixture invariant: no emps row has empid = deptno")
    MaterializedViews.create(spark, "mv_tautns",
      emps().select(col("empid"), col("name")), "/tmp/graft_mv/tautns_tile")
    try {
      val got = q().collect().map(_.getString(0)).sorted
      assert(got.sameElements(want),
        s"unsound <=> tautology rewrite leaked rows: ${got.mkString(",")}")
    } finally MaterializedViews.drop("mv_tautns")
  }

  test("multi-path scan is not mistaken for a declared FK table (r14 advice)") {
    // ghost table = emps schema plus one row with deptno 99 (no depts
    // parent). A multi-path scan (emps, ghost) whose FIRST root is the
    // declared FK child must NOT be treated as bare emps: the query's
    // join to depts really does filter the 99-row, so FK join elimination
    // on the multi-path leaf would leak it.
    MvParityFixture.ensure(spark)
    spark.sql(
      """SELECT * FROM VALUES (999, 99, 'Ghost', CAST(1.0 AS DOUBLE), 0)
        |AS t(empid, deptno, name, salary, commission)""".stripMargin)
      .write.mode("overwrite").parquet("/tmp/graft_mv/ghost_emps")
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    def ms() = spark.read.parquet(s"${MvParityFixture.base}/emps", "/tmp/graft_mv/ghost_emps")
    def depts() = spark.read.parquet(s"${MvParityFixture.base}/depts")
    def q() = ms().join(depts().select(col("deptno")), Seq("deptno"))
      .select(col("empid"), col("name"))
    val want = q().collect().map(_.getString(1)).sorted
    assert(!want.contains("Ghost"), "fixture invariant: deptno 99 has no depts parent")
    MaterializedViews.create(spark, "mv_mp",
      ms().select(col("empid"), col("deptno"), col("name")), "/tmp/graft_mv/mp_tile")
    try {
      val got = q().collect().map(_.getString(1)).sorted
      assert(got.sameElements(want),
        s"FK elimination misfired on a multi-path scan: got ${got.mkString(",")}")
    } finally MaterializedViews.drop("mv_mp")
  }

  test("clearConstraints invalidates cached FK-reduced variants (r14 advice)") {
    // A join tile answers an emps-only query VIA its FK-reduced variant;
    // withdrawing the constraint (tile still registered) must stop that
    // rewrite at the next query — the r14 lazy-val cache kept matching.
    MvParityFixture.ensure(spark) // declares emps→depts
    MaterializedViews.clear()
    MaterializedViews.install(spark)
    // read parquet directly: emps() would re-run ensure(), which re-declares
    // the FK and would silently undo the clearConstraints under test
    def empsRaw() = spark.read.parquet(s"${MvParityFixture.base}/emps")
    def depts() = spark.read.parquet(s"${MvParityFixture.base}/depts")
    def q() = empsRaw().select(col("empid"), col("name"))
    val want = q().collect().map(_.getString(1)).sorted
    MaterializedViews.create(spark, "mv_epoch",
      empsRaw().join(depts().select(col("deptno")), Seq("deptno"))
        .select(col("empid"), col("name")),
      "/tmp/graft_mv/epoch_tile")
    try {
      val withFk = q()
      assert(withFk.queryExecution.executedPlan.toString.contains("epoch_tile"),
        "precondition: the FK-reduced variant should answer the emps-only query")
      assert(withFk.collect().map(_.getString(1)).sorted.sameElements(want))
      MaterializedViews.clearConstraints()
      val withoutFk = q()
      assert(!withoutFk.queryExecution.executedPlan.toString.contains("epoch_tile"),
        "stale FK-reduced variant still matching after clearConstraints")
      assert(withoutFk.collect().map(_.getString(1)).sorted.sameElements(want))
    } finally {
      MaterializedViews.drop("mv_epoch")
      MvParityFixture.ensure(spark) // restore the schema FK for later suites
    }
  }

  test("JSON_QUERY wrapper quotes malformed numeral-lookalike strings (strict number grammar)") {
    import graft.operators.JsonModes
    val df = spark.range(1).select(
      JsonModes.jsonQuery(lit("""{"k":"1-2"}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("a"),
      JsonModes.jsonQuery(lit("""{"k":"1.2.3"}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("b"),
      JsonModes.jsonQuery(lit("""{"k":"1e"}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("c"),
      JsonModes.jsonQuery(lit("""{"k":"007"}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("d"),
      JsonModes.jsonQuery(lit("""{"k":12}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("e"),
      JsonModes.jsonQuery(lit("""{"k":-0.5}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("f"),
      JsonModes.jsonQuery(lit("""{"k":true}"""), "$.k", wrapper = JsonModes.Wrapper.Unconditional).as("g"))
    val r = df.collect().head
    assert(r.getString(0) == """["1-2"]""")
    assert(r.getString(1) == """["1.2.3"]""")
    assert(r.getString(2) == """["1e"]""")
    assert(r.getString(3) == """["007"]""") // leading zero: not a JSON number
    assert(r.getString(4) == "[12]")
    assert(r.getString(5) == "[-0.5]")
    assert(r.getString(6) == "[true]")
  }
}
