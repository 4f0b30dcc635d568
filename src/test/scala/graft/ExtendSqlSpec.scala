package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `FROM t EXTEND (col type, ...)` — Drill-fork schema-on-query
  * (reference Parser.jj TableRef EXTEND + ExtensibleTable.extend):
  * columns present in STORAGE but not in the declared schema surface with
  * real values; columns absent everywhere read as typed NULLs; the
  * extended relation composes with the surrounding SQL. */
class ExtendSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  private val dir = java.nio.file.Files.createTempDirectory("graft_extend").toString

  test("storage columns beyond the declared schema surface with real values") {
    import spark.implicits._
    // the file has THREE columns...
    Seq((1L, "a", 10.5), (2L, "b", 20.5), (3L, "c", 30.5))
      .toDF("id", "tag", "score").write.mode("overwrite").parquet(s"$dir/late")
    // ...but the catalog declares only two (late schema)
    spark.read.schema("id LONG, tag STRING").parquet(s"$dir/late")
      .createOrReplaceTempView("late_table")
    assert(!spark.table("late_table").columns.contains("score"))
    // EXTEND brings the undeclared column into the query's row type, and
    // the storage values come back — Drill's schema-on-query
    val rows = spark.sql(
      """SELECT id, score FROM late_table EXTEND (score DOUBLE)
        |WHERE score > 15 ORDER BY id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((2L, 20.5), (3L, 30.5)))
  }

  test("columns absent from storage read as typed NULLs") {
    val rows = spark.sql(
      """SELECT id, missing_col FROM late_table EXTEND (missing_col INT)
        |ORDER BY id""".stripMargin).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.isNullAt(1)))
    assert(rows.head.schema("missing_col").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("EXTEND composes: aliases, joins, aggregation over extended columns") {
    val n = spark.sql(
      """SELECT t.tag, count(*) AS n, sum(t.score) AS s
        |FROM late_table EXTEND (score DOUBLE) AS t
        |GROUP BY t.tag ORDER BY t.tag""".stripMargin).collect()
    assert(n.length == 3 && n.head.getDouble(2) == 10.5)
    // fixture tables extend too (typed-NULL path for the derived view)
    Tables.registerAll(spark, sfDir)
    val fx = spark.sql(
      "SELECT count(*) FROM region EXTEND (discovered_at TIMESTAMP)")
      .collect().head.getLong(0)
    assert(fx == Tables.t(spark, sfDir, "region").count())
  }

  test("already-declared columns are untouched; unknown table errors") {
    val same = spark.sql(
      "SELECT id, tag FROM late_table EXTEND (tag STRING) ORDER BY id")
      .collect().map(_.getString(1))
    assert(same.toSeq == Seq("a", "b", "c"))
    val e = intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM no_such_table EXTEND (x INT)"))
    assert(e.getMessage.contains("not found"))
  }
}
