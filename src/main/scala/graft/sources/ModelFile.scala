package graft.sources

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Model-file schema mounting — the reference's JSON/YAML model handler
  * (reference: core/src/main/java/org/apache/calcite/model/ModelHandler.java
  * driving JsonRoot/JsonSchema/JsonTable/JsonView/JsonMaterialization,
  * `model/JsonRoot.java:51`; example models like
  * core/src/test/resources/hsqldb-model.json). A model file is how a
  * Calcite user mounts their universe without code: schemas containing
  * file-backed tables, SQL views (whose `sql` may be a string OR a list
  * of lines, ModelHandler's toString concatenation), materializations,
  * and a defaultSchema.
  *
  * Spark-first mapping — everything lands in the session catalog, nothing
  * is copied:
  *   - schema            → database (CREATE DATABASE IF NOT EXISTS)
  *   - file table        → EXTERNAL table (CREATE TABLE ... USING fmt
  *                         LOCATION path) — the scan stays columnar with
  *                         pushdown/pruning; at 100 TB mounting is a
  *                         metadata operation, zero data movement
  *   - view              → CREATE OR REPLACE VIEW schema.name
  *   - materialization   → [[graft.plans.MaterializedViews]] tile +
  *                         rewrite registration (the reference's
  *                         JsonMaterialization → MaterializationService)
  *   - defaultSchema     → catalog.setCurrentDatabase
  *
  * JSON and YAML both parse (the reference accepts .json/.yaml models;
  * jackson-databind and the YAML dataformat ship with Spark). The
  * supported table types are the file-adapter subset (`file`/`custom`
  * with a path+format operand) — JDBC schemas mount through
  * spark.read.jdbc and are out of fixture scope like the rest of the
  * adapter SPI (COVERAGE §2.6).
  */
object ModelFile {

  final case class Mounted(schemas: Seq[String], tables: Seq[String],
      views: Seq[String], materializations: Seq[String],
      defaultSchema: Option[String], functions: Seq[String] = Seq.empty)

  /** Model-mountable function classes → their session-registered SQL
    * names (the JsonFunction className contract). */
  private val functionClassNames: Map[String, String] = Map(
    "graft.functions.DotProduct" -> "dot_product",
    "graft.functions.IntersectSizeSorted" -> "intersect_size_sorted",
    "graft.functions.WeightedAvg" -> "weighted_avg",
    "graft.functions.ShingleHashes" -> "shingle_hashes",
    "graft.functions.HyperplaneBits" -> "hyperplane_bits")

  private def mapper(path: String): ObjectMapper =
    if (path.endsWith(".yaml") || path.endsWith(".yml"))
      new ObjectMapper(new YAMLFactory) else new ObjectMapper

  private def str(m: java.util.Map[String, Object], k: String): Option[String] =
    Option(m.get(k)).map {
      // JsonView.sql may be a list of lines (ModelHandler concatenates)
      case l: java.util.List[_] => l.asScala.map(_.toString).mkString(" ")
      case other => other.toString
    }

  private def list(m: java.util.Map[String, Object], k: String): Seq[java.util.Map[String, Object]] =
    Option(m.get(k)).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
      .asScala.toSeq).getOrElse(Seq.empty)

  /** Mount every schema in the model file into the session catalog.
    * `mvDir` stores materialization tiles (one parquet dir per tile). */
  def mount(spark: SparkSession, modelPath: String,
      mvDir: String = System.getProperty("java.io.tmpdir") + "/graft_model_mv"): Mounted = {
    val root = mapper(modelPath).readValue(
      new java.io.File(modelPath), classOf[java.util.Map[String, Object]])
    val schemas = Seq.newBuilder[String]
    val tables = Seq.newBuilder[String]
    val views = Seq.newBuilder[String]
    val mats = Seq.newBuilder[String]
    val fns = Seq.newBuilder[String]

    for (schema <- list(root, "schemas")) {
      val sName = str(schema, "name").getOrElse(
        throw new IllegalArgumentException("model schema needs a name"))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$sName`")
      schemas += sName
      for (table <- list(schema, "tables")) {
        val tName = str(table, "name").getOrElse(
          throw new IllegalArgumentException(s"table in schema '$sName' needs a name"))
        str(table, "type").getOrElse("custom") match {
          case "view" =>
            val sql = str(table, "sql").getOrElse(
              throw new IllegalArgumentException(s"view '$tName' needs sql"))
            spark.sql(s"CREATE OR REPLACE VIEW `$sName`.`$tName` AS $sql")
            views += s"$sName.$tName"
          case _ => // file/custom: operand carries path + format
            val operand = Option(table.get("operand"))
              .map(_.asInstanceOf[java.util.Map[String, Object]])
              .getOrElse(table)
            val path = str(operand, "path").getOrElse(
              throw new IllegalArgumentException(s"table '$tName' needs operand.path"))
            val format = str(operand, "format").getOrElse("parquet")
            spark.sql(s"CREATE TABLE IF NOT EXISTS `$sName`.`$tName` " +
              s"USING $format LOCATION '$path'")
            tables += s"$sName.$tName"
        }
      }
      for (mat <- list(schema, "materializations")) {
        val vName = str(mat, "view").getOrElse(
          throw new IllegalArgumentException("materialization needs a view name"))
        val sql = str(mat, "sql").getOrElse(
          throw new IllegalArgumentException(s"materialization '$vName' needs sql"))
        graft.plans.MaterializedViews.install(spark)
        graft.plans.MaterializedViews.create(
          spark, vName, spark.sql(sql), s"$mvDir/$vName")
        mats += vName
      }
      // functions (reference model/JsonFunction.java → ModelHandler
      // addFunctions: a schema mounts scalar functions by class name —
      // how the reference's geo pack reaches SQL). The graft expression
      // pack is session-registered already, so a model function is an
      // ALIAS: the declared className resolves to its registered builder
      // and re-registers under the model's name.
      for (fn <- list(schema, "functions")) {
        val fName = str(fn, "name").getOrElse(
          throw new IllegalArgumentException("function needs a name"))
        val className = str(fn, "className").getOrElse(
          throw new IllegalArgumentException(s"function '$fName' needs className"))
        val underlying = functionClassNames.getOrElse(className,
          throw new IllegalArgumentException(
            s"unknown function class '$className' — known: ${functionClassNames.keys.mkString(", ")}"))
        val reg = spark.sessionState.functionRegistry
        val builder = reg.lookupFunctionBuilder(
          org.apache.spark.sql.catalyst.FunctionIdentifier(underlying)).getOrElse(
          throw new IllegalStateException(s"'$underlying' not registered in this session"))
        reg.registerFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(fName),
          new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(className, fName),
          builder)
        fns += fName
      }
      // lattices (reference model/JsonLattice.java: a star-join SQL plus
      // declared TILES — each tile is a materialized aggregate over the
      // star's dimensions, exactly what the MV rewriter then serves;
      // Lattice.java:93 builds the same structures from this element).
      for (lat <- list(schema, "lattices")) {
        val lName = str(lat, "name").getOrElse(
          throw new IllegalArgumentException("lattice needs a name"))
        val starSql = str(lat, "sql").getOrElse(
          throw new IllegalArgumentException(s"lattice '$lName' needs sql"))
        val star = spark.sql(starSql)
        graft.plans.MaterializedViews.install(spark)
        for ((tile, i) <- list(lat, "tiles").zipWithIndex) {
          val dims = Option(tile.get("dimensions"))
            .map(_.asInstanceOf[java.util.List[Object]].asScala.toSeq.map(_.toString))
            .getOrElse(throw new IllegalArgumentException(
              s"lattice '$lName' tile $i needs dimensions"))
          val tName = s"${lName}_tile_${dims.mkString("_")}"
          val tileDf = star.groupBy(dims.map(org.apache.spark.sql.functions.col): _*)
            .agg(org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))
          graft.plans.MaterializedViews.create(
            spark, tName, tileDf, s"$mvDir/$tName")
          mats += tName
        }
      }
    }
    val default = str(root, "defaultSchema")
    default.foreach(d => spark.catalog.setCurrentDatabase(d))
    Mounted(schemas.result(), tables.result(), views.result(),
      mats.result(), default, fns.result())
  }

  /** Drop everything a model mounted (databases cascade; tiles are
    * unregistered from the rewriter). */
  def unmount(spark: SparkSession, mounted: Mounted): Unit = {
    mounted.materializations.foreach(graft.plans.MaterializedViews.drop)
    mounted.functions.foreach(f =>
      spark.sessionState.functionRegistry.dropFunction(
        org.apache.spark.sql.catalyst.FunctionIdentifier(f)))
    if (mounted.defaultSchema.isDefined)
      spark.catalog.setCurrentDatabase("default")
    mounted.schemas.foreach(s =>
      spark.sql(s"DROP DATABASE IF EXISTS `$s` CASCADE"))
  }
}
