package graft.tools

import java.nio.file.{Files, Paths}
import graft.{Engine, SparkEntry}

/** Round-17 plan-audit snapshots: write `plans/r17/<query>_<suffix>.txt`
  * (the `.explain("formatted")` output) for a comma-separated list of
  * registry queries in ONE JVM —
  * `runMain graft.tools.PlanSnap <suffix> <q1,q2,...> [sfDir]`.
  * The before/after pairs are the optimization round's evidence that a
  * claimed plan change (Exchange removed, join strategy flipped, filter
  * pushed) actually happened. */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse(sys.error(
      "usage: PlanSnap <suffix> <q1,q2,...> [sfDir]"))
    val names = args.lift(1).getOrElse(sys.error("missing query list"))
      .split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-plansnap")
    Files.createDirectories(Paths.get("plans/r17"))
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r17/${n}_$suffix.txt"), txt)
      println(s"wrote plans/r17/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
