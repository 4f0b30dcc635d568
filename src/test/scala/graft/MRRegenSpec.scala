package graft
import graft.plans.RelToSql
import org.scalatest.funsuite.AnyFunSuite
class MRRegenSpec extends AnyFunSuite {
  import SparkTestSession._
  for (q <- Seq("match_recognize_agg_define", "match_recognize_running_measures", "match_recognize_within")) {
    test(s"$q cycles") {
      Tables.registerAll(spark, sfDir)
      val df = SparkEntry.queries(q)(spark, sfDir)
      val regen = RelToSql.convert(df, RelToSql.Spark)
      val a = df.collect().map(_.toString).sorted.toSeq
      val b = spark.sql(regen).collect().map(_.toString).sorted.toSeq
      assert(a == b, s"cycle diverged:\n$regen")
    }
  }
}
