package graft.tools

import graft.{Engine, SparkEntry}

/** Plan-audit helper: print the formatted physical plan of one registry
  * query at an arbitrary fixture scale —
  * `runMain graft.tools.Explain <name> [sfDir]`. The per-scale plan diff
  * is the scale audit's primary instrument (a BroadcastExchange that is
  * right at sf0.1 can be lethal at sf1-equivalent). */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Explain <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("graft-explain")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
