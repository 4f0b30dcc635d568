package graft.tools

import graft.{Engine, Tables}
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.{Pat, VShape}
import org.apache.spark.sql.Row

/** Stage-isolation profiler for the match-recognize cost model
  * (r11 VERDICT #2: `match_recognize_vshape` read 21× on ×10 events).
  * Times, at one fixture scale, each candidate cost layer of the NFA
  * path so the super-linear term can be NAMED rather than guessed:
  *   scan        — events scan + projection only
  *   groupsort   — groupByKey + per-group materialize + sort, no NFA
  *   nfa         — the full vshape query (scan+groupsort+findMatches)
  * Usage: `tools/run.sh graft.tools.MrProfile [sfDir] [reps]`.
  */
object MrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session("graft-mr-profile")
    import spark.implicits._

    def timed(label: String)(body: => Long): Unit = {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); val n = body
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val med = times.map(_._1).sorted.apply(times.size / 2)
      println(f"$label%-12s median $med%7.2f s  (rows=${times.head._2})")
    }

    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "value", "ts")

    timed("scan")(ev.count())

    val orderKey: Row => (Long, Long) =
      r => (MatchRecognize.tsMicros(r, "ts"), r.getAs[Long]("event_id"))
    timed("groupsort") {
      ev.groupByKey(_.getAs[Long]("user_id"))
        .flatMapGroups { (_: Long, it: Iterator[Row]) =>
          val rows = it.toIndexedSeq.sortBy(orderKey)
          Iterator.single(rows.length.toLong)
        }.reduce(_ + _)
    }

    import Pat._
    implicit val enc: org.apache.spark.sql.Encoder[VShape] =
      org.apache.spark.sql.Encoders.product[VShape]
    timed("nfa") {
      MatchRecognize.matchRecognize[VShape](
        ev,
        partitionKey = _.getAs[Long]("user_id"),
        orderKey = orderKey,
        pattern = Cat(Seq(plus(Sym("DOWN")), plus(Sym("UP")))),
        defines = Map(
          "DOWN" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") < p.getAs[Double]("value"))),
          "UP" -> ((r, prev) => prev.exists(p =>
            r.getAs[Double]("value") > p.getAs[Double]("value")))),
        measure = (key, m) => VShape(key, m.length.toLong,
          m.head._1.getAs[Long]("event_id"), m.last._1.getAs[Long]("event_id"))
      ).count()
    }

    // distribution facts that decide sort-vs-skew
    val users = ev.groupBy("user_id").count()
    val stats = users.agg(
      org.apache.spark.sql.functions.count("*").as("n_users"),
      org.apache.spark.sql.functions.max("count").as("max_rows"),
      org.apache.spark.sql.functions.expr("approx_percentile(count, 0.5)").as("p50"),
      org.apache.spark.sql.functions.expr("approx_percentile(count, 0.99)").as("p99")
    ).head()
    println(s"users=${stats.get(0)} maxRowsPerUser=${stats.get(1)} " +
      s"p50=${stats.get(2)} p99=${stats.get(3)}")
    spark.stop()
  }
}
