package graft

import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Spark behavior the bucketed-accumulator fixpoint
  * (Recursive.repeatUnionBucketed) depends on: `localCheckpoint`
  * preserves the physical HashPartitioning in its LogicalRDD ONLY when
  * AQE is off — under AdaptiveSparkPlanExec the captured partitioning is
  * UnknownPartitioning, which would re-insert an exchange on every
  * accumulator piece in the anti-join chain. If a Spark upgrade changes
  * either side of this, the loop's AQE toggle needs revisiting. */
class CheckpointPartitioningSpec extends AnyFunSuite {
  import SparkTestSession._

  private def checkpointPartitioning(aqe: Boolean): String = {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
    try {
      val a = Seq(1L, 2L, 3L).toDF("n").repartition(8, col("n"))
        .localCheckpoint(eager = true)
      val part = a.queryExecution.analyzed.collect {
        case l: LogicalRDD => l.outputPartitioning.toString
      }
      Checkpoints.release(a)
      part.mkString
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("localCheckpoint preserves HashPartitioning with AQE off") {
    assert(checkpointPartitioning(aqe = false).startsWith("hashpartitioning(n#"))
  }

  test("localCheckpoint LOSES partitioning under AQE (why the bucketed loop disables it)") {
    assert(checkpointPartitioning(aqe = true).startsWith("UnknownPartitioning"))
  }
}
