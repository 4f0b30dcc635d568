package graft
import graft.plans.RelToSql
import org.scalatest.funsuite.AnyFunSuite
class CycleProbeSpec extends AnyFunSuite {
  import SparkTestSession._
  test("probe") {
    Tables.registerAll(spark, sfDir)
    val results = SparkEntry.queries.keys.toSeq.sorted.map { q =>
      val r = try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        if (df.isStreaming) "STREAMING"
        else {
          val regen = RelToSql.convert(df, RelToSql.Spark)
          val a = df.collect().map(_.toString).sorted.toSeq
          val b = spark.sql(regen).collect().map(_.toString).sorted.toSeq
          if (a == b) "CYCLE_OK" else "CYCLE_DIVERGED"
        }
      } catch {
        case e: UnsupportedOperationException => "UNSUP: " + e.getMessage.take(80)
        case e: Throwable => "ERROR: " + e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(80)
      }
      s"$q\t$r"
    }
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/cycle_probe.txt"),
      results.mkString("\n").getBytes)
  }
}
