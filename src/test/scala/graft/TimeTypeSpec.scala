package graft

import org.apache.spark.sql.types.TimeType
import org.scalatest.funsuite.AnyFunSuite

/** TIME as a first-class column type (SURVEY §1.2; reference
  * sql/type/SqlTypeName.java:64): Spark 4.1's native TimeType behind
  * spark.sql.timeType.enabled. Pins the parts the fn_time_type oracle
  * query can't show — the TIME-typed schema itself, the parquet
  * round-trip, and ordering/grouping on a TIME column. */
class TimeTypeSpec extends AnyFunSuite {
  import SparkTestSession._

  spark.conf.set("spark.sql.timeType.enabled", "true")

  test("TIME column survives a parquet round-trip with its type") {
    val out = java.nio.file.Files.createTempDirectory("time_rt").toString
    spark.sql(
      """SELECT * FROM VALUES
        |  (1, TIME '01:02:03'), (2, TIME '23:59:59.123456'),
        |  (3, CAST(NULL AS TIME)) AS t(id, tm)""".stripMargin)
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("tm").dataType.isInstanceOf[TimeType])
    val got = back.orderBy("id").selectExpr("CAST(tm AS STRING)")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("01:02:03", "23:59:59.123456", null))
  }

  test("ordering, grouping and min/max work on TIME") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  ('a', TIME '12:00:00'), ('a', TIME '03:30:00'),
        |  ('b', TIME '22:15:00'), ('b', TIME '22:15:00') AS t(k, tm)""".stripMargin)
    val mins = df.groupBy("k").agg(org.apache.spark.sql.functions.expr("min(tm) AS lo"))
      .orderBy("k").selectExpr("k", "CAST(lo AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(mins == Seq(("a", "03:30:00"), ("b", "22:15:00")))
    assert(df.distinct().count() == 3)
  }

  test("fn_time_type registry query returns TIME-derived primitives") {
    val df = SparkEntry.queries("fn_time_type")(spark, sfDir)
    val row = df.orderBy("event_id").head()
    val secs = row.getAs[Long]("secs_of_day")
    assert(secs == row.getAs[Long]("hr") * 3600 +
      row.getAs[Long]("mi") * 60 + row.getAs[Long]("se"))
    assert(df.count() > 0)
  }
}
