package graft

import graft.sources.ModelFile
import org.scalatest.funsuite.AnyFunSuite

/** Model-file mounting against the fixture lake — the reference's
  * ModelHandler behaviors: schemas→tables→views in order, sql as string
  * or list of lines, defaultSchema, materializations feeding the MV
  * rewriter, and JSON/YAML parity. */
class ModelFileSpec extends AnyFunSuite {
  import SparkTestSession._

  private def write(name: String, text: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), name)
    java.nio.file.Files.writeString(p, text)
    p.toString
  }

  test("JSON model mounts file tables, views, defaultSchema (hsqldb-model.json shape)") {
    val model = write("graft_model.json",
      s"""{
         |  "version": "1.0",
         |  "defaultSchema": "SALES",
         |  "schemas": [ {
         |    "name": "SALES",
         |    "type": "map",
         |    "tables": [
         |      { "name": "region", "type": "custom",
         |        "operand": { "path": "$sfDir/region.parquet", "format": "parquet" } },
         |      { "name": "nation", "type": "custom",
         |        "operand": { "path": "$sfDir/nation.parquet", "format": "parquet" } },
         |      { "name": "nations_of_region", "type": "view",
         |        "sql": [ "SELECT r_name, count(*) AS n_nations",
         |                 "FROM SALES.nation JOIN SALES.region ON n_regionkey = r_regionkey",
         |                 "GROUP BY r_name" ] }
         |    ]
         |  } ]
         |}""".stripMargin)
    val m = ModelFile.mount(spark, model)
    try {
      assert(m.schemas == Seq("SALES") && m.defaultSchema.contains("SALES"))
      assert(m.tables == Seq("SALES.region", "SALES.nation"))
      assert(m.views == Seq("SALES.nations_of_region"))
      // qualified access
      val nRegion = spark.table("SALES.region").count()
      assert(nRegion == spark.read.parquet(s"$sfDir/region.parquet").count())
      // defaultSchema makes bare names resolve (the model's USE semantics)
      val viaDefault = spark.sql(
        "SELECT n_nations FROM nations_of_region WHERE r_name = 'EUROPE'")
        .collect().head.getLong(0)
      val direct = spark.read.parquet(s"$sfDir/nation.parquet")
        .join(spark.read.parquet(s"$sfDir/region.parquet"),
          org.apache.spark.sql.functions.col("n_regionkey") ===
            org.apache.spark.sql.functions.col("r_regionkey"))
        .where("r_name = 'EUROPE'").count()
      assert(viaDefault == direct)
      // the external table scan is the columnar parquet relation — a
      // metadata mount, not a copy
      val plan = spark.table("SALES.region").queryExecution.executedPlan.toString
      assert(plan.contains("FileScan parquet") || plan.contains("Scan parquet"))
    } finally ModelFile.unmount(spark, m)
    assert(!spark.catalog.databaseExists("SALES"))
  }

  test("YAML model parses to the same mount (reference accepts .yaml models)") {
    val model = write("graft_model.yaml",
      s"""version: "1.0"
         |schemas:
         |  - name: LAKE
         |    type: map
         |    tables:
         |      - name: supplier
         |        type: custom
         |        operand:
         |          path: $sfDir/supplier.parquet
         |          format: parquet
         |      - name: big_suppliers
         |        type: view
         |        sql: SELECT s_suppkey, s_acctbal FROM LAKE.supplier WHERE s_acctbal > 0
         |""".stripMargin)
    val m = ModelFile.mount(spark, model)
    try {
      assert(m.tables == Seq("LAKE.supplier"))
      assert(spark.sql("SELECT count(*) FROM LAKE.big_suppliers").collect()
        .head.getLong(0) > 0)
      // no defaultSchema in this model: current database is untouched
      assert(m.defaultSchema.isEmpty)
    } finally ModelFile.unmount(spark, m)
  }

  test("functions element aliases the graft pack by class name (addFunctions)") {
    val model = write("graft_model_fn.json",
      s"""{
         |  "schemas": [ {
         |    "name": "FNS",
         |    "functions": [
         |      { "name": "model_dot", "className": "graft.functions.DotProduct" }
         |    ]
         |  } ]
         |}""".stripMargin)
    val m = ModelFile.mount(spark, model)
    try {
      val got = spark.sql(
        "SELECT model_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
        .collect().head.getDouble(0)
      assert(got == 11.0)
      // unknown class names reject with the known list
      val bad = write("graft_model_fn_bad.json",
        """{ "schemas": [ { "name": "FNS2", "functions": [
          |  { "name": "nope", "className": "com.example.Missing" } ] } ] }""".stripMargin)
      val e = intercept[IllegalArgumentException](ModelFile.mount(spark, bad))
      assert(e.getMessage.contains("unknown function class"))
      spark.sql("DROP DATABASE IF EXISTS FNS2 CASCADE")
    } finally ModelFile.unmount(spark, m)
  }

  test("lattices declare tiles the rewriter serves (JsonLattice shape)") {
    val model = write("graft_model_lat.json",
      s"""{
         |  "schemas": [ {
         |    "name": "LAT",
         |    "tables": [
         |      { "name": "nation", "type": "custom",
         |        "operand": { "path": "$sfDir/nation.parquet" } },
         |      { "name": "region", "type": "custom",
         |        "operand": { "path": "$sfDir/region.parquet" } }
         |    ],
         |    "lattices": [ {
         |      "name": "geo",
         |      "sql": [ "SELECT n_name, r_name FROM LAT.nation",
         |               "JOIN LAT.region ON n_regionkey = r_regionkey" ],
         |      "tiles": [ { "dimensions": [ "r_name" ] },
         |                 { "dimensions": [ "n_name", "r_name" ] } ]
         |    } ]
         |  } ]
         |}""".stripMargin)
    val m = ModelFile.mount(spark, model)
    try {
      assert(m.materializations ==
        Seq("geo_tile_r_name", "geo_tile_n_name_r_name"))
      // the coarse rollup is answered from the r_name tile: the 2-table
      // star join disappears from the optimized plan
      val q = spark.sql(
        """SELECT r_name, count(*) AS n FROM LAT.nation
          |JOIN LAT.region ON n_regionkey = r_regionkey GROUP BY r_name""".stripMargin)
      val opt = q.queryExecution.optimizedPlan.toString
      assert(!opt.contains("lat.nation"), opt)
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = spark.table("LAT.nation")
        .join(spark.table("LAT.region"),
          org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
        .groupBy("r_name").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    } finally ModelFile.unmount(spark, m)
  }

  test("materializations register tiles the MV rewriter answers from") {
    val model = write("graft_model_mv.json",
      s"""{
         |  "schemas": [ {
         |    "name": "MVS",
         |    "tables": [
         |      { "name": "orders", "type": "custom",
         |        "operand": { "path": "$sfDir/orders.parquet" } }
         |    ],
         |    "materializations": [ {
         |      "view": "orders_by_priority",
         |      "sql": "SELECT o_orderpriority, count(*) AS n FROM MVS.orders GROUP BY o_orderpriority"
         |    } ]
         |  } ]
         |}""".stripMargin)
    val m = ModelFile.mount(spark, model)
    try {
      assert(m.materializations == Seq("orders_by_priority"))
      assert(graft.plans.MaterializedViews.exists("orders_by_priority"))
      // the same aggregate now optimizes to the stored tile scan: the
      // base table disappears from the plan and the relation narrows to
      // the tile's two columns
      val q = spark.sql(
        "SELECT o_orderpriority, count(*) AS n FROM MVS.orders GROUP BY o_orderpriority")
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("mvs.orders"))
      assert(optimized.contains("Relation [o_orderpriority"))
      // and still returns the right rows
      val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = spark.read.parquet(s"$sfDir/orders.parquet")
        .groupBy("o_orderpriority").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    } finally ModelFile.unmount(spark, m)
  }
}
