package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 ADVICE fixes on TableDdlSql: multi-word ANSI type
  * spellings in CTAS column lists, and the duplicate-name check on the
  * custom-typed CREATE TABLE branch covering the Spark catalog too
  * (reference: server/src/test/resources/sql/table_as.iq column-list
  * CTAS; table.iq 'already exists'). */
class TableDdlAdviceFixSpec extends AnyFunSuite {
  import SparkTestSession._

  private def drop(names: String*): Unit = names.foreach { n =>
    try spark.sql(s"DROP TABLE IF EXISTS $n").collect()
    catch { case _: Exception => () }
    try spark.catalog.dropTempView(n) catch { case _: Exception => () }
  }

  test("CTAS column list admits multi-word ANSI types and CASTs through them") {
    drop("ddlfix_mw")
    spark.sql(
      """CREATE TABLE ddlfix_mw (a double precision, b character varying(20), ts timestamp with time zone)
        |AS SELECT 1, 'x', TIMESTAMP '2024-01-02 03:04:05'""".stripMargin).collect()
    val df = spark.table("ddlfix_mw")
    assert(df.schema("a").dataType == org.apache.spark.sql.types.DoubleType)
    assert(df.schema("b").dataType.typeName.startsWith("varchar") ||
      df.schema("b").dataType == org.apache.spark.sql.types.StringType)
    assert(df.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(df.count() == 1)
    drop("ddlfix_mw")
  }

  test("custom-typed CREATE TABLE cannot shadow an existing view ('already exists')") {
    drop("ddlfix_dup")
    spark.sql("CREATE TYPE ddlfix_mytype AS INTEGER").collect()
    // a pre-existing Spark-native temp view with the same name
    spark.range(3).createOrReplaceTempView("ddlfix_dup")
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE ddlfix_dup (x ddlfix_mytype)").collect()
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
    // the original view survives untouched
    assert(spark.table("ddlfix_dup").count() == 3)
    // IF NOT EXISTS keeps the original definition instead of registering
    spark.sql("CREATE TABLE IF NOT EXISTS ddlfix_dup (x ddlfix_mytype)").collect()
    assert(spark.table("ddlfix_dup").count() == 3)
    spark.sql("DROP TYPE ddlfix_mytype").collect()
    drop("ddlfix_dup")
  }

  test("DEFAULT-table duplicate check also sees the Spark catalog") {
    drop("ddlfix_dup2")
    spark.range(2).createOrReplaceTempView("ddlfix_dup2")
    val ex = intercept[Exception] {
      spark.sql("CREATE TABLE ddlfix_dup2 (i int, j int DEFAULT i + 2)").collect()
    }
    assert(ex.getMessage.contains("already exists"), ex.getMessage)
    assert(spark.table("ddlfix_dup2").count() == 2)
    drop("ddlfix_dup2")
  }
}
