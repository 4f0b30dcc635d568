package graft

import org.scalatest.funsuite.AnyFunSuite

/** Scale posture of the SQL-registered spatial surface (operators/GeoSql
  * through functions/ColumnBridge): every ST_* function resolves to a
  * Column-combinator tree of Spark built-ins (plus the native codegen'd
  * kernels), so a spatial projection/predicate must stay INSIDE
  * WholeStageCodegen — no ScalaUDF, no driver work, nothing per-row
  * interpreted. At 100 TB a spatial filter runs at scan throughput or it
  * is the bottleneck. The load-bearing piece is GeoSql.staticKind: the
  * generic geometry dispatch carries higher-order functions (lambdas),
  * and ONE lambda anywhere in an expression disqualifies the whole
  * operator from codegen — point-point distance must therefore
  * specialize at function-build time, which this spec pins. */
class GeoSqlPlanSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val pts: Unit = {
    // a 19x19 unit grid centered on the origin, strictly inside the
    // test polygon below
    spark.range(1000)
      .selectExpr("cast(id % 19 as double) - 9.0 as lon",
        "cast((id div 19) % 19 as double) - 9.0 as lat")
      .createOrReplaceTempView("geo_pts")
  }

  /** First executed-plan line containing `marker`, with the tree-drawing
    * prefix (`+-`, `:`, spaces) stripped so the WholeStageCodegen `*(n)`
    * tag is what remains. */
  private def planLine(plan: String, marker: String): String =
    plan.linesIterator.find(_.contains(marker)).getOrElse("")
      .dropWhile(c => c == ' ' || c == '+' || c == '-' || c == ':')

  test("ST_ projection + predicate stays inside WholeStageCodegen") {
    pts
    val df = spark.sql(
      """SELECT ST_Distance(ST_Point(lon, lat), ST_Point(0.0D, 0.0D)) AS d
        |FROM geo_pts
        |WHERE ST_DWithin(ST_Point(lon, lat), ST_Point(0.0D, 0.0D), 90.0D)""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(planLine(plan, "Project").startsWith("*"),
      s"spatial Project not codegen'd:\n$plan")
    assert(planLine(plan, "Filter").startsWith("*"),
      s"spatial Filter not codegen'd:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"interpreted UDF in the spatial plan:\n$plan")
    // the point-point specialization: no higher-order function (lambda)
    // survives into the plan — that is WHY it codegens
    assert(!plan.contains("lambdafunction"),
      s"generic multi-part dispatch leaked into a point-point plan:\n$plan")
    assert(df.count() > 0)
  }

  test("WKT polygon literal folds at plan time; containment scan codegens") {
    pts
    val df = spark.sql(
      """SELECT count(*) AS n FROM geo_pts
        |WHERE ST_Contains(
        |  ST_GeomFromText('POLYGON((-10 -10, 10 -10, 10 10, -10 10, -10 -10))'),
        |  ST_Point(lon, lat))""".stripMargin)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"interpreted UDF in the WKT plan:\n$plan")
    // the polygon literal folds at plan time: no per-row WKT parsing
    // (regexp machinery) may survive into the executed filter
    val filt = plan.linesIterator.find(_.contains("Filter")).getOrElse("")
    assert(!filt.contains("regexp_extract"),
      s"WKT literal not constant-folded out of the filter:\n$filt")
    assert(df.head().getLong(0) == 1000L) // every row lands on the grid inside
  }

  test("parenthesized MULTIPOINT import round-trips every member") {
    // the reference's OWN output spelling is parenthesized —
    // 'MULTIPOINT ((1 1), (2 2))' — and the group split parses that
    // into one part per member; import must flatten to the renderers'
    // single-part convention or members after the first silently drop
    val rows = spark.sql(
      """SELECT ST_AsText(ST_GeomFromText('MULTIPOINT ((1 1), (2 2), (3 3))')) AS p,
        |       ST_AsText(ST_GeomFromText('MULTIPOINT (1 1, 2 2, 3 3)')) AS u
        |""".stripMargin).head()
    assert(rows.getString(0) == "MULTIPOINT ((1 1), (2 2), (3 3))")
    assert(rows.getString(1) == rows.getString(0)) // both spellings identical
  }

  test("2-arg ST_Union of non-points is NULL, not a fabricated MULTIPOINT") {
    val rows = spark.sql(
      """SELECT ST_Union(ST_GeomFromText('LINESTRING (0 0, 1 1)'),
        |                ST_GeomFromText('LINESTRING (2 2, 3 3)')) IS NULL AS lineNull,
        |       ST_AsText(ST_Union(ST_Point(1.0D, 1.0D), ST_Point(2.0D, 2.0D))) AS pts
        |""".stripMargin).head()
    assert(rows.getBoolean(0), "line-line union must degrade to NULL")
    assert(rows.getString(1) == "MULTIPOINT ((1 1), (2 2))")
  }
}
