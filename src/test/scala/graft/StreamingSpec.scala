package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Structured Streaming behavior: the same events table replayed as a
  * stream must reproduce the batch results (the reference's unified
  * Delta/table semantics), plus watermarked append mode, stateful dedup,
  * stream-static joins, and flatMapGroupsWithState custom state. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  private def runToCompletion(df: org.apache.spark.sql.DataFrame,
      name: String, mode: OutputMode): org.apache.spark.sql.DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("streaming tumbling agg equals batch tumbling agg") {
    val stream = StreamOps.readEventsStream(spark, sfDir)
    val got = runToCompletion(
      StreamOps.tumblingAgg(stream, "1 hour"), "t_tumble", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val want = StreamOps.tumblingAgg(Tables.t(spark, sfDir, "events"), "1 hour")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == want)
  }

  test("watermarked append-mode windows are a closed subset of batch") {
    val stream = StreamOps.readEventsStream(spark, sfDir)
      .withWatermark("ts", "2 hours")
    val appended = runToCompletion(
      stream.groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
        .select(col("window.start").as("w_start"), col("n")),
      "t_append", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    val batch = Tables.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toMap
    assert(appended.nonEmpty)
    // every emitted (closed) window must agree exactly with batch
    assert(appended.forall { case (w, n) => batch.get(w).contains(n) })
  }

  test("streaming dropDuplicates dedups by key") {
    val stream = StreamOps.readEventsStream(spark, sfDir)
    val got = runToCompletion(
      stream.dropDuplicates("user_id").select("user_id"),
      "t_dedup", OutputMode.Append())
    assert(got.count() == Tables.t(spark, sfDir, "events")
      .select("user_id").distinct().count())
  }

  test("stream-static join matches batch join") {
    val stream = StreamOps.readEventsStream(spark, sfDir)
    val cust = Tables.t(spark, sfDir, "customer")
    val got = runToCompletion(
      stream.join(cust, col("user_id") === col("c_custkey"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n")),
      "t_sjoin", OutputMode.Complete())
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.t(spark, sfDir, "events")
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("parquet sink with checkpoint is exactly-once across restarts") {
    val outDir = "/tmp/graft_stream_sink/out"
    val ckDir = "/tmp/graft_stream_sink/ck"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path("/tmp/graft_stream_sink"), true)
    def runOnce(): Unit = {
      val q = StreamOps.readEventsStream(spark, sfDir)
        .select("event_id", "user_id", "event_type")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val batchCount = Tables.t(spark, sfDir, "events").count()
    assert(spark.read.parquet(outDir).count() == batchCount)
    // restart against the same checkpoint: no new input -> no duplicates
    runOnce()
    assert(spark.read.parquet(outDir).count() == batchCount,
      "restart duplicated rows despite the checkpoint")
    assert(spark.read.parquet(outDir).select("event_id").distinct().count() == batchCount)
  }

  test("stateful dedup state survives a checkpoint restart with new input") {
    // True mid-stream recovery: process half the input, stop, deliver the
    // other half, restart from the same checkpoint. The dedup state from
    // run 1 must be restored in run 2 — if it were lost, every user_id
    // seen in part 1 would be re-emitted by part 2 and the sink would
    // roughly double.
    val base = "/tmp/graft_stream_ck2"
    val stage = s"$base/in"; val outDir = s"$base/out"; val ckDir = s"$base/ck"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val ev = Tables.t(spark, sfDir, "events").select("event_id", "user_id")
    ev.where(col("event_id") % 2 === 0).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(stage)
        .dropDuplicates("user_id")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce()
    val afterP1 = spark.read.parquet(outDir).count()
    // deliver the second half into the same source directory, restart
    ev.where(col("event_id") % 2 === 1).write.mode("append").parquet(stage)
    runOnce()
    val out = spark.read.parquet(outDir)
    val nDistinct = ev.select("user_id").distinct().count()
    assert(afterP1 <= nDistinct)
    assert(out.count() == nDistinct,
      s"expected $nDistinct deduped rows after recovery, got ${out.count()}")
    assert(out.select("user_id").distinct().count() == nDistinct,
      "restart re-emitted user_ids whose state predates the checkpoint")
  }

  test("stream-stream interval join equals the batch range join") {
    // clicks ⋈ purchases per user within [click.ts, click.ts + 30 min] —
    // the reference's stream-to-stream join (stream.md) with the event-time
    // range bound Structured Streaming requires for state cleanup
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
          col("event_id").as("c_id"))
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("p_id"))
    val cond = col("c_user") === col("p_user") &&
      col("p_ts") >= col("c_ts") &&
      col("p_ts") <= col("c_ts") + expr("INTERVAL 30 MINUTES")
    val streamed = clicks(StreamOps.readEventsStream(spark, sfDir))
      .withWatermark("c_ts", "1 hour")
      .join(purchases(StreamOps.readEventsStream(spark, sfDir))
        .withWatermark("p_ts", "1 hour"), cond)
      .select(col("c_id"), col("p_id"))
    val got = runToCompletion(streamed, "t_ssjoin", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ev = Tables.t(spark, sfDir, "events")
    val want = clicks(ev).join(purchases(ev), cond)
      .select(col("c_id"), col("p_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming MATCH_RECOGNIZE equals batch matches across micro-batches") {
    import graft.operators.MatchRecognize
    import MatchRecognize.{ClickRun, Pat}
    // stage events into 4 event-time-range files so the file source
    // delivers them as 4 ordered micro-batches
    val stagedDir = "/tmp/graft_stream_mr"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stagedDir), true)
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "ts")
    // sequential writes: the file source replays in modification-time
    // order, and a parallel write stamps files in task-completion order
    val w0 = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val bucketed0 = ev.withColumn("__b", ntile(4).over(w0)).cache()
    for (k <- 1 to 4) {
      bucketed0.where(col("__b") === k).drop("__b").coalesce(1)
        .write.mode("append").parquet(stagedDir)
      Thread.sleep(60)
    }
    bucketed0.unpersist()
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
    def micros(r: org.apache.spark.sql.Row) = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    }
    implicit val enc: org.apache.spark.sql.Encoder[ClickRun] =
      org.apache.spark.sql.Encoders.product[ClickRun]
    val pattern = Pat.Cat(Seq(Pat.atLeast(Pat.Sym("C"), 3), Pat.Sym("P")))
    val defines = Map[String, MatchRecognize.Define](
      "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
      "P" -> ((r, _) => r.getAs[String]("event_type") == "purchase"))
    val measure = (key: Long, m: IndexedSeq[(org.apache.spark.sql.Row, String)]) =>
      ClickRun(key, m.count(_._2 == "C").toLong, m.last._1.getAs[Long]("event_id"))
    val streamed = MatchRecognize.matchRecognizeStream[ClickRun](
      stream, _.getAs[Long]("user_id"), r => (micros(r), r.getAs[Long]("event_id")),
      pattern, defines, measure).toDF()
    val got = runToCompletion(streamed, "t_mr", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = SparkEntry.queries("match_recognize_runs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream=${got.size} batch=${want.size} diff=${(got diff want) ++ (want diff got)}")
  }

  test("streaming MATCH_RECOGNIZE WITHIN equals the batch time-bounded matches") {
    import graft.operators.MatchRecognize
    import MatchRecognize.{ClickRun, Pat}
    val stagedDir = "/tmp/graft_stream_mr_within"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stagedDir), true)
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val w0 = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val bucketed0 = ev.withColumn("__b", ntile(4).over(w0)).cache()
    for (k <- 1 to 4) {
      bucketed0.where(col("__b") === k).drop("__b").coalesce(1)
        .write.mode("append").parquet(stagedDir)
      Thread.sleep(60)
    }
    bucketed0.unpersist()
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
    def micros(r: org.apache.spark.sql.Row) = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    }
    implicit val enc: org.apache.spark.sql.Encoder[ClickRun] =
      org.apache.spark.sql.Encoders.product[ClickRun]
    val fourHours = 4L * 3600L * 1000000L
    val pattern = Pat.Cat(Seq(Pat.plus(Pat.Sym("C")), Pat.Sym("P")))
    val defines = Map[String, MatchRecognize.Define](
      "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
      "P" -> ((r, _) => r.getAs[String]("event_type") == "purchase"))
    val measure = (key: Long, m: IndexedSeq[(org.apache.spark.sql.Row, String)]) =>
      ClickRun(key, m.count(_._2 == "C").toLong, m.last._1.getAs[Long]("event_id"))
    val streamed = MatchRecognize.matchRecognizeStream[ClickRun](
      stream, _.getAs[Long]("user_id"), r => (micros(r), r.getAs[Long]("event_id")),
      pattern, defines, measure, within = Some(fourHours)).toDF()
    val got = runToCompletion(streamed, "t_mr_within", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // ground truth: the registry's SQL-front-end WITHIN query
    val want = SparkEntry.queries("match_recognize_within")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"stream=${got.size} batch=${want.size} diff=${(got diff want) ++ (want diff got)}")
  }

  test("streaming MATCH_RECOGNIZE with SKIP TO LAST equals batch (overlapping retention)") {
    import graft.operators.MatchRecognize
    import MatchRecognize.{Pat, Skip, VShape}
    // the ticker shape: V-shapes share peaks, so the skip re-anchors
    // INSIDE emitted matches — the retention rule must hold those rows
    val stagedDir = "/tmp/graft_stream_mr_skip"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stagedDir), true)
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "value", "ts")
    // The file source replays files in MODIFICATION-TIME order, and a
    // parallel range-partitioned write stamps files in task-completion
    // order — which can deliver later time ranges first. The dense ticker
    // matcher needs per-key event-time-ordered arrival, so each quarter
    // is written SEQUENTIALLY (strictly increasing mod times).
    val w = org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")
    val bucketed = ev.withColumn("__b", ntile(4).over(w)).cache()
    for (k <- 1 to 4) {
      bucketed.where(col("__b") === k).drop("__b").coalesce(1)
        .write.mode("append").parquet(stagedDir)
      Thread.sleep(60)
    }
    bucketed.unpersist()
    // The ticker pattern ends in greedy UP+, so each key's FINAL match
    // always hits the buffer end and stays pending — correct streaming
    // semantics (the matcher cannot know the stream ended). Append a
    // per-user sentinel row BELOW every value, in a last later-ts file:
    // the decline terminates the last V definitively (emitting it) and
    // the sentinel itself can never complete a match, so stream == batch.
    ev.groupBy("user_id")
      .agg(max("ts").as("mts"), max("event_id").as("mid"))
      .select(col("user_id"), (col("mid") + 1000000L).as("event_id"),
        lit(-1e9).as("value"),
        (col("mts") + expr("INTERVAL 1 HOUR")).as("ts"))
      .coalesce(1).write.mode("append").parquet(stagedDir)
    val stream = spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
    def micros(r: org.apache.spark.sql.Row) = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      (t.getTime / 1000L) * 1000000L + (t.getNanos / 1000L)
    }
    implicit val enc: org.apache.spark.sql.Encoder[VShape] =
      org.apache.spark.sql.Encoders.product[VShape]
    val pattern = Pat.Cat(Seq(Pat.Sym("STRT"), Pat.plus(Pat.Sym("DOWN")),
      Pat.plus(Pat.Sym("UP"))))
    val defines = Map[String, MatchRecognize.Define](
      "DOWN" -> ((r, p) => p.exists(pr =>
        r.getAs[Double]("value") < pr.getAs[Double]("value"))),
      "UP" -> ((r, p) => p.exists(pr =>
        r.getAs[Double]("value") > pr.getAs[Double]("value"))))
    val measure = (key: Long, m: IndexedSeq[(org.apache.spark.sql.Row, String)]) =>
      VShape(key, m.length.toLong, m.head._1.getAs[Long]("event_id"),
        m.last._1.getAs[Long]("event_id"))
    val streamed = MatchRecognize.matchRecognizeStream[VShape](
      stream, _.getAs[Long]("user_id"), r => (micros(r), r.getAs[Long]("event_id")),
      pattern, defines, measure, Skip.ToLast("UP")).toDF()
    val got = runToCompletion(streamed, "t_mr_skip", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = SparkEntry.queries("match_recognize_skip_to_last")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("len"),
        r.getAs[Long]("start_id"), r.getAs[Long]("end_id"))).toSet
    assert(got == want, s"stream=${got.size} batch=${want.size}")
    assert(got.nonEmpty)
  }

  test("SELECT STREAM ... MATCH_RECOGNIZE lowers onto the streaming matcher and equals batch") {
    val mrBody =
      """* FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(C.*) AS n_clicks
        |  PATTERN (C{2,} E)
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin
    val streamed = graft.streaming.StreamSql.sql(spark, sfDir, "SELECT STREAM " + mrBody)
    assert(streamed.isStreaming, "SELECT STREAM MATCH_RECOGNIZE must stay a stream")
    val got = runToCompletion(streamed, "t_mr_sql", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    Tables.registerAll(spark, sfDir)
    val want = spark.sql("SELECT " + mrBody)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == want, s"stream=${got.size} batch=${want.size}")
    assert(got.nonEmpty)
  }

  test("flatMapGroupsWithState running per-user count equals batch count") {
    val s = spark
    import s.implicits._
    val stream = StreamOps.readEventsStream(spark, sfDir)
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
    val counted = stream.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val newCount = state.getOption.getOrElse(0L) + rows.size
          state.update(newCount)
          Iterator.single((key, newCount))
      }.toDF("user_id", "n")
    val got = runToCompletion(counted, "t_fmgws", OutputMode.Append())
      // last emitted count per key is the final state
      .groupBy("user_id").agg(max("n").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Tables.t(spark, sfDir, "events").groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("SELECT STREAM windowed agg equals the batch run of the same text") {
    val body = """SELECT window.start AS w_start, event_type,
                 |  count(*) AS n
                 |FROM events GROUP BY window(ts, '1 hour'), event_type""".stripMargin
    val streamed = Engine.sqlStream(spark, sfDir, "SELECT STREAM " + body.stripPrefix("SELECT "))
    assert(streamed.isStreaming)
    val got = runToCompletion(streamed, "t_sel_stream", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Engine.sql(spark, sfDir, body)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("SELECT STREAM over documents resolves the corpus-ingest twin") {
    // a screening projection (documents carry no event time, so an
    // aggregate here would be rejected by the monotonicity validator —
    // exactly the reference's rule; the ingest screen is append-shaped)
    val body = """SELECT doc_id, lang
                 |FROM documents WHERE n_chars > 500""".stripMargin
    val streamed = Engine.sqlStream(spark, sfDir,
      "SELECT STREAM " + body.stripPrefix("SELECT "))
    assert(streamed.isStreaming)
    val got = runToCompletion(streamed, "t_docs_stream", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Engine.sql(spark, sfDir, body)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.nonEmpty && got == want)
    // a lang-only rollup of the unbounded ingest is the reference's
    // canonical rejection (stream.md: "GROUP BY clause must contain at
    // least one monotonic expression")
    val ex = intercept[IllegalArgumentException] {
      Engine.sqlStream(spark, sfDir,
        "SELECT STREAM lang, count(*) AS n FROM documents GROUP BY lang")
    }
    assert(ex.getMessage.contains("monotonic expression"))
    // ...and the batch view is restored afterwards (no permanent shadow)
    assert(!Engine.sql(spark, sfDir, "SELECT count(*) FROM documents").isStreaming)
  }

  test("SELECT STREAM TUMBLE syntax (reference grouped windows) lowers to window()") {
    // the reference's TUMBLE/TUMBLE_START grouped-window SQL
    // (SqlStdOperatorTable TUMBLE; site/_docs/stream.md examples)
    val streamed = Engine.sqlStream(spark, sfDir,
      """SELECT STREAM TUMBLE_START(ts, INTERVAL '1' HOUR) AS w_start,
        |  event_type, count(*) AS n
        |FROM events
        |GROUP BY TUMBLE(ts, INTERVAL '1' HOUR), event_type""".stripMargin)
    assert(streamed.isStreaming)
    val got = runToCompletion(streamed, "t_tumble_syntax", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = Engine.sql(spark, sfDir,
      """SELECT window.start AS w_start, event_type, count(*) AS n
        |FROM events GROUP BY window(ts, '1 hour'), event_type""".stripMargin)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("SELECT STREAM HOP and SESSION syntax lower to sliding/session windows") {
    val hop = Engine.sqlStream(spark, sfDir,
      """SELECT STREAM HOP_START(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR) AS w_start,
        |  count(*) AS n
        |FROM events GROUP BY HOP(ts, INTERVAL '30' MINUTE, INTERVAL '1' HOUR)""".stripMargin)
    assert(hop.isStreaming)
    val gotHop = runToCompletion(hop, "t_hop_syntax", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val wantHop = Engine.sql(spark, sfDir,
      """SELECT window.start AS w_start, count(*) AS n
        |FROM events GROUP BY window(ts, '1 hour', '30 minute')""".stripMargin)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(gotHop.nonEmpty && gotHop == wantHop)
    val sess = Engine.sqlStream(spark, sfDir,
      """SELECT STREAM user_id, SESSION_START(ts, INTERVAL '30' MINUTE) AS s_start,
        |  count(*) AS n
        |FROM events GROUP BY user_id, SESSION(ts, INTERVAL '30' MINUTE)""".stripMargin)
    assert(sess.isStreaming)
    // session windows in streaming need a watermark for Complete-mode-free
    // runs; batch comparison is enough here — the stream analyzed cleanly
    val wantSess = Engine.sql(spark, sfDir,
      """SELECT user_id, session_window.start AS s_start, count(*) AS n
        |FROM events GROUP BY user_id, session_window(ts, '30 minute')""".stripMargin)
    assert(wantSess.collect().nonEmpty)
  }

  test("SELECT STREAM joins a batch dimension (stream-table join)") {
    val streamed = Engine.sql(spark, sfDir,
      """SELECT STREAM e.event_id, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)
    assert(streamed.isStreaming)
    val got = runToCompletion(streamed, "t_sel_stream_join", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val want = Engine.sql(spark, sfDir,
      """SELECT e.event_id, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got.nonEmpty && got == want)
  }

  test("unbounded source: rate stream windows and aggregates (Kafka-table shape)") {
    // the reference's KafkaStreamTable is an infinite ScannableTable over a
    // consumer (kafka/.../KafkaStreamTable.java:52); the rate source is
    // Spark's built-in equivalent of an unbounded row feed — this pins the
    // plumbing (schema, event-time window, sink) without needing a broker
    val rate = spark.readStream.format("rate")
      .option("rowsPerSecond", "500").load()
    assert(rate.isStreaming)
    val agg = rate
      .withWatermark("timestamp", "0 seconds")
      .groupBy(window(col("timestamp"), "1 second"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("window.start").as("w_start"), col("n"), col("sum_v"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("t_rate").start()
    try {
      q.processAllAvailable()
      // wait until at least one non-empty micro-batch landed
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("t_rate").isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(200); q.processAllAvailable()
      }
      val rows = spark.table("t_rate").collect()
      assert(rows.nonEmpty, "rate stream produced no windows in 30s")
      // counts are per-1s-window of a 500 rows/s feed: all positive
      assert(rows.forall(_.getLong(1) > 0))
    } finally q.stop()
  }

  test("SELECT STREAM over a non-streamable table is rejected") {
    val e = intercept[IllegalArgumentException] {
      Engine.sqlStream(spark, sfDir, "SELECT STREAM c_custkey FROM customer")
    }
    assert(e.getMessage.contains("streamable"))
    // and the batch view is restored afterwards
    assert(!Engine.sql(spark, sfDir, "SELECT * FROM events LIMIT 1").isStreaming)
  }
}
