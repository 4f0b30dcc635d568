package graft

import graft.streaming.StreamSql
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from the reference's own streaming suite
  * (reference: core/src/test/java/org/apache/calcite/test/StreamTest.java —
  * the 5-row ORDERS stream of OrdersStreamTableFactory.getRowList and the
  * PRODUCTS relation, with the committed expected outputs). Queries run
  * through OUR `SELECT STREAM` front end against a replayed stream; the
  * reference's `FLOOR(rowtime TO HOUR)` idiom is rewritten to date_trunc
  * by the front end. */
class StreamGoldenSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val setup: Unit = {
    // StreamTest.java:394-403 — the ORDERS stream rows
    val dir = java.nio.file.Files.createTempDirectory("stream_orders").toString
    spark.sql(
      """SELECT * FROM VALUES
        |  (TIMESTAMP '2015-02-15 10:15:00', 1, 'paint', 10),
        |  (TIMESTAMP '2015-02-15 10:24:15', 2, 'paper', 5),
        |  (TIMESTAMP '2015-02-15 10:24:45', 3, 'brush', 12),
        |  (TIMESTAMP '2015-02-15 10:58:00', 4, 'paint', 3),
        |  (TIMESTAMP '2015-02-15 11:10:00', 5, 'paint', 3)
        |AS t(rowtime, id, product, units)""".stripMargin)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    StreamSql.registerStreamable("orders_s",
      s => s.readStream.schema(schema).parquet(dir))
    // StreamTest.java:502-506 — the PRODUCTS relation (id, supplier)
    spark.sql(
      """SELECT * FROM VALUES ('paint', 1), ('paper', 0), ('brush', 1)
        |AS t(id, supplier)""".stripMargin)
      .createOrReplaceTempView("products_s")
  }

  private def run(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory")
      .queryName(name).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("StreamTest.testStream — select stream * emits the whole order stream") {
    setup
    val got = run(StreamSql.sql(spark, sfDir, "SELECT STREAM * FROM orders_s"),
      "g_stream_all", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0).toString, r.getInt(1), r.getString(2), r.getInt(3)))
      .sortBy(_._2).toSeq
    assert(got == Seq(
      ("2015-02-15 10:15:00.0", 1, "paint", 10),
      ("2015-02-15 10:24:15.0", 2, "paper", 5),
      ("2015-02-15 10:24:45.0", 3, "brush", 12),
      ("2015-02-15 10:58:00.0", 4, "paint", 3),
      ("2015-02-15 11:10:00.0", 5, "paint", 3)))
  }

  test("StreamTest.testStreamFilterProject — where units > 6") {
    setup
    val got = run(
      StreamSql.sql(spark, sfDir, "SELECT STREAM product FROM orders_s WHERE units > 6"),
      "g_stream_filter", OutputMode.Append())
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == Seq("brush", "paint")) // StreamTest.java:141-147 golden
  }

  test("StreamTest.testStreamGroupByHaving — FLOOR(rowtime TO HOUR) buckets") {
    setup
    val got = run(
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM floor(rowtime TO hour) AS rowtime, product, count(*) AS c
          |FROM orders_s GROUP BY floor(rowtime TO hour), product
          |HAVING count(*) > 1""".stripMargin),
      "g_stream_gbh", OutputMode.Complete())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq
    // StreamTest.java:168 — exactly ROWTIME=10:00:00, PRODUCT=paint, C=2
    assert(got == Seq(("2015-02-15 10:00:00.0", "paint", 2L)))
  }

  test("StreamTest.testStreamToRelationJoin — stream-table join picks suppliers") {
    setup
    val got = run(
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o.rowtime AS rowtime, o.id AS orderId, p.supplier AS supplierId
          |FROM orders_s o JOIN products_s p ON o.product = p.id""".stripMargin),
      "g_stream_join", OutputMode.Append())
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1).toSeq
    // StreamTest.java:294-296 golden (+ the two later paint orders)
    assert(got == Seq((1, 1), (2, 0), (3, 1), (4, 1), (5, 1)))
  }

  test("StreamTest.testStreamUnionAllOrderBy — union of two deltas") {
    setup
    val got = run(
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM * FROM (
          |  SELECT rowtime, product FROM orders_s
          |  UNION ALL
          |  SELECT rowtime, product FROM orders_s)""".stripMargin),
      "g_stream_union", OutputMode.Append())
      .collect().map(r => (r.getTimestamp(0).toString, r.getString(1))).sorted.toSeq
    assert(got.size == 10 && got.distinct.size == 5)
    assert(got.head == ("2015-02-15 10:15:00.0", "paint"))
  }

  test("StreamTest.testStreamGroupByRejected — non-monotonic GROUP BY raises") {
    setup
    // the reference validator: "Streaming aggregation requires at least one
    // monotonic expression in GROUP BY clause" (stream.md:185-264) — a
    // product-only grouping never closes its groups, so state is unbounded
    val ex = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        "SELECT STREAM product, count(*) AS c FROM orders_s GROUP BY product")
    }
    assert(ex.getMessage.contains("monotonic expression"))
    // a global aggregate over a stream is the degenerate case of the same
    // defect (no grouping key can ever be monotonic)
    val ex2 = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir, "SELECT STREAM count(*) AS c FROM orders_s")
    }
    assert(ex2.getMessage.contains("monotonic expression"))
    // a CYCLIC derivation of event time is NOT monotonic (r9 ADVICE):
    // EXTRACT(HOUR FROM rowtime) wraps around every day, so its groups
    // reopen forever — "contains a time-typed subexpression" must not pass
    val ex3 = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        "SELECT STREAM EXTRACT(HOUR FROM rowtime) AS h, count(*) AS c " +
          "FROM orders_s GROUP BY EXTRACT(HOUR FROM rowtime)")
    }
    assert(ex3.getMessage.contains("monotonic expression"))
    // ... while every monotonic shape is accepted: raw rowtime, FLOOR-TO
    // (via date_trunc), TUMBLE, SESSION, and CAST(rowtime AS DATE)
    for (q <- Seq(
      "SELECT STREAM rowtime, count(*) AS c FROM orders_s GROUP BY rowtime",
      "SELECT STREAM floor(rowtime TO hour) AS h, count(*) AS c FROM orders_s GROUP BY floor(rowtime TO hour)",
      "SELECT STREAM TUMBLE_START(rowtime, INTERVAL '1' HOUR) AS ws, count(*) AS c " +
        "FROM orders_s GROUP BY TUMBLE(rowtime, INTERVAL '1' HOUR)",
      "SELECT STREAM count(*) AS c FROM orders_s GROUP BY SESSION(rowtime, INTERVAL '30' MINUTE)",
      "SELECT STREAM CAST(rowtime AS DATE) AS d, product, count(*) AS c " +
        "FROM orders_s GROUP BY CAST(rowtime AS DATE), product"))
      assert(StreamSql.sql(spark, sfDir, q).isStreaming, s"should accept: $q")
  }

  test("StreamTest sorting rule — ORDER BY on a stream must lead with rowtime") {
    setup
    // stream.md 'Sorting streams': ORDER BY units can never emit row one
    val ex = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        "SELECT STREAM rowtime, product, units FROM orders_s ORDER BY units")
    }
    assert(ex.getMessage.contains("monotonic"))
    // DESCENDING event time is just as impossible — the first row of
    // ORDER BY rowtime DESC is the stream's LAST event (r9 ADVICE)
    val exDesc = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        "SELECT STREAM rowtime, product FROM orders_s ORDER BY rowtime DESC")
    }
    assert(exDesc.getMessage.contains("monotonic"))
    // ... while a monotonic leading key analyzes fine (rowtime, or a
    // derived FLOOR-TO bucket; secondary keys are unrestricted)
    for (q <- Seq(
      "SELECT STREAM rowtime, product FROM orders_s ORDER BY rowtime",
      "SELECT STREAM rowtime, product, units FROM orders_s " +
        "ORDER BY floor(rowtime TO hour), units DESC"))
      assert(StreamSql.sql(spark, sfDir, q).isStreaming, s"should accept: $q")
  }

  test("StreamTest joining rule — stream-stream join needs a time bound") {
    setup
    // equality-only stream-stream self join: unbounded state, rejected
    val ex = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product""".stripMargin)
    }
    assert(ex.getMessage.contains("time bound"))
    // a comparison against a LITERAL is not a bound between the streams
    // (r9 ADVICE): it has a time-typed operand but relates nothing
    val exLit = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product
          | AND o1.rowtime > TIMESTAMP '2015-01-01 00:00:00'""".stripMargin)
    }
    assert(exLit.getMessage.contains("time bound"))
    // a ONE-SIDED bound still lets the other side drift without limit
    val exOne = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product
          | AND o2.rowtime >= o1.rowtime""".stripMargin)
    }
    assert(exOne.getMessage.contains("time bound"))
    // an interval condition over the rowtimes bounds the drift: accepted
    val ok = StreamSql.sql(spark, sfDir,
      """SELECT STREAM o1.id AS a, o2.id AS b FROM orders_s o1
        |JOIN orders_s o2 ON o1.product = o2.product
        | AND o2.rowtime >= o1.rowtime
        | AND o2.rowtime < o1.rowtime + INTERVAL '1' HOUR""".stripMargin)
    assert(ok.isStreaming)
    // difference-style bounds (r10 ADVICE): both rowtimes on ONE operand,
    // a literal interval on the other — legal bounded-state shape in both
    // Spark and the reference; BETWEEN lowers to >= lit AND <= lit
    val okDiff = StreamSql.sql(spark, sfDir,
      """SELECT STREAM o1.id AS a, o2.id AS b FROM orders_s o1
        |JOIN orders_s o2 ON o1.product = o2.product
        | AND o2.rowtime - o1.rowtime BETWEEN INTERVAL '0' SECOND
        |   AND INTERVAL '1' HOUR""".stripMargin)
    assert(okDiff.isStreaming, "difference-style BETWEEN bound must be accepted")
    // exact rowtime equality bounds drift to zero: accepted (r10 ADVICE)
    val okEq = StreamSql.sql(spark, sfDir,
      """SELECT STREAM o1.id AS a, o2.id AS b FROM orders_s o1
        |JOIN orders_s o2 ON o1.product = o2.product
        | AND o1.rowtime = o2.rowtime""".stripMargin)
    assert(okEq.isStreaming, "cross-side rowtime equality must be accepted")
    // two UPPER bounds on opposite orientations = bounded both ways
    val okTwoUpper = StreamSql.sql(spark, sfDir,
      """SELECT STREAM o1.id AS a, o2.id AS b FROM orders_s o1
        |JOIN orders_s o2 ON o1.product = o2.product
        | AND o2.rowtime - o1.rowtime <= INTERVAL '1' HOUR
        | AND o1.rowtime - o2.rowtime <= INTERVAL '1' HOUR""".stripMargin)
    assert(okTwoUpper.isStreaming, "opposite-orientation upper bounds must be accepted")
    // non-monotonic wrappers are NOT bounds (r10 ADVICE): EXTRACT(HOUR)
    // wraps around — the state needed is still unbounded
    val exHour = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product
          | AND EXTRACT(HOUR FROM o1.rowtime)
          |     BETWEEN EXTRACT(HOUR FROM o2.rowtime) - 1
          |         AND EXTRACT(HOUR FROM o2.rowtime) + 1""".stripMargin)
    }
    assert(exHour.getMessage.contains("time bound"),
      "cyclic EXTRACT(HOUR) derivation must not count as a bound")
    // inequalities under an OR branch guarantee nothing: rejected
    val exOr = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product
          | AND (o1.units > 5 OR (o2.rowtime >= o1.rowtime
          |   AND o2.rowtime < o1.rowtime + INTERVAL '1' HOUR))""".stripMargin)
    }
    assert(exOr.getMessage.contains("time bound"),
      "OR-nested time bounds must not be credited")
    // anti-monotonic subtraction (r11 ADVICE): (TS − rowtime) DECREASES
    // in rowtime, so (TS − o1.rowtime) >= (TS − o2.rowtime) really means
    // o1 <= o2 — an UPPER bound on the drift, same direction as the
    // explicit upper bound below; no lower bound exists → reject
    val exAnti = intercept[IllegalArgumentException] {
      StreamSql.sql(spark, sfDir,
        """SELECT STREAM o1.id, o2.id FROM orders_s o1
          |JOIN orders_s o2 ON o1.product = o2.product
          | AND TIMESTAMP '2030-01-01 00:00:00' - o1.rowtime
          |     >= TIMESTAMP '2030-01-01 00:00:00' - o2.rowtime
          | AND o1.rowtime - o2.rowtime <= INTERVAL '1' HOUR""".stripMargin)
    }
    assert(exAnti.getMessage.contains("time bound"),
      "(literal - rowtime) must not be credited as a monotonic bound")
    // stream-to-TABLE joins are unrestricted (stream-static, bounded side)
    assert(StreamSql.sql(spark, sfDir,
      """SELECT STREAM o.id, p.supplier FROM orders_s o
        |JOIN products_s p ON o.product = p.id""".stripMargin).isStreaming)
  }

  test("streaming twins restore every shadowed batch view, not just events (r6 ADVICE)") {
    setup
    Tables.registerAll(spark, sfDir)
    // an extra streamable that reuses a fixture table's name shadows the
    // batch view only WITHIN the SELECT STREAM resolution
    StreamSql.registerStreamable("nation",
      s => streaming.StreamOps.readEventsStream(s, sfDir))
    try {
      val df = StreamSql.sql(spark, sfDir, "SELECT STREAM event_type FROM nation")
      assert(df.isStreaming)
      assert(!spark.table("nation").isStreaming,
        "the batch fixture view must be restored after resolution")
      assert(spark.sql("SELECT count(*) FROM nation").head().getLong(0) == 25L)
    } finally StreamSql.unregisterStreamable("nation")
    // a twin with no prior batch view is dropped again after resolution
    assert(!spark.catalog.tableExists("orders_s"),
      "a twin without a shadowed batch view must not linger")
  }
}
