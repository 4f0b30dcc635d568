package graft

import org.scalatest.funsuite.AnyFunSuite

/** Validator-rejection parity, tranche 17 (r16) — the SELECT STREAM
  * validation matrix: the reference validates streamability of FROM
  * relations, monotonicity of streaming GROUP BY / HAVING / ORDER BY,
  * and stream-vs-relation consistency in set operations. Our analog is
  * StreamSql's validator behind Engine.sqlStream (streaming/
  * StreamSql.scala — streamable-FROM check, the monotonic-grouping
  * whitelist, the ascending-monotonic-leading-key ORDER BY rule). One
  * case per reference assertion family, cited per family; accepted
  * controls mirror the matrix's .ok() rows.
  *
  * Reference: core/src/test/java/org/apache/calcite/test/
  * SqlValidatorTest.java testStream:9683, testStreamWhere:9691,
  * testStreamGroupBy:9704, testStreamHaving:9724, testStreamValues:9862,
  * testStreamOrderBy:9875, testStreamJoin:9901. Fixture mapping:
  * `orders` (streamable, rowtime) → `events` (ts); `emp`
  * (non-streamable) → `customer`/`lineitem`.
  */
class ValidatorParitySpec14 extends AnyFunSuite {
  import SparkTestSession._

  private def rejectedStream(sql: String, fragment: String): Unit = {
    val ex = intercept[IllegalArgumentException] {
      Engine.sqlStream(spark, sfDir, sql)
    }
    assert(ex.getMessage.contains(fragment),
      s"expected '$fragment' in: ${ex.getMessage}")
  }

  // ---- testStream:9683 — cannotConvertToStream ----------------------------
  test("stream rejects: STREAM over a non-streamable table") {
    rejectedStream("SELECT STREAM c_custkey FROM customer", "streamable")
  }

  // ---- testStreamWhere:9691 — the WHERE clause doesn't legalize it --------
  test("stream rejects: STREAM over a non-streamable table with WHERE") {
    rejectedStream(
      "SELECT STREAM c_custkey FROM customer WHERE c_nationkey = 10",
      "streamable")
  }
  test("stream rejects: STREAM over an aliased non-streamable table") {
    rejectedStream(
      "SELECT STREAM e.c_custkey FROM customer AS e WHERE e.c_nationkey = 10",
      "streamable")
  }
  test("stream rejects: STREAM over a subquery of a non-streamable table") {
    rejectedStream(
      "SELECT STREAM * FROM (SELECT * FROM customer) AS e", "streamable")
  }

  // ---- testStreamGroupBy:9704 — STR_AGG_REQUIRES_MONO ---------------------
  test("stream rejects: grouped aggregate with no monotonic key") {
    rejectedStream(
      "SELECT STREAM event_type, count(*) AS c FROM events GROUP BY event_type",
      "monotonic")
  }
  test("stream rejects: global aggregate over a stream") {
    rejectedStream("SELECT STREAM count(*) AS c FROM events", "monotonic")
  }
  test("stream rejects: GROUP BY () over a stream") {
    // Spark's parser rejects the empty-grouping-set spelling itself;
    // either layer satisfies the reference's negative assertion (the
    // statement never executes)
    val ex = intercept[Exception] {
      Engine.sqlStream(spark, sfDir,
        "SELECT STREAM count(*) AS c FROM events GROUP BY ()")
    }
    assert(ex.isInstanceOf[IllegalArgumentException] ||
      ex.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException],
      ex.getMessage)
  }

  // ---- testStreamHaving:9724 ----------------------------------------------
  test("stream rejects: HAVING over a non-monotonic streaming group") {
    rejectedStream(
      """SELECT STREAM event_type, count(*) AS c FROM events
        |GROUP BY event_type HAVING count(*) > 5""".stripMargin, "monotonic")
  }

  // ---- testStreamValues:9862 ----------------------------------------------
  test("stream rejects: STREAM over VALUES") {
    rejectedStream("SELECT STREAM * FROM (VALUES 1) AS e(x)", "streamable")
  }

  // ---- testStreamOrderBy:9875 — STR_ORDER_REQUIRES_MONO -------------------
  test("stream rejects: ORDER BY with a non-monotonic leading key") {
    rejectedStream(
      "SELECT STREAM ts, event_id FROM events ORDER BY event_type, ts",
      "monotonic")
  }
  test("stream rejects: ORDER BY rowtime DESC") {
    rejectedStream(
      "SELECT STREAM ts, event_id FROM events ORDER BY ts DESC", "monotonic")
  }

  // ---- testStreamJoin:9901 — both inputs non-streaming --------------------
  test("stream rejects: join of two non-streamable tables") {
    rejectedStream(
      """SELECT STREAM c_custkey FROM customer
        |JOIN nation ON c_nationkey = n_nationkey""".stripMargin, "streamable")
  }

  // ---- the matrix's .ok() rows through the same entry ----------------------
  test("stream controls: the accepted matrix rows run as streams") {
    def streams(sql: String): Unit = {
      val df = Engine.sqlStream(spark, sfDir, sql)
      assert(df.isStreaming, sql)
    }
    // testStream/testStreamWhere accepted rows
    streams("SELECT STREAM * FROM events")
    streams("SELECT STREAM * FROM events WHERE event_id < 10")
    // testStreamGroupBy accepted rows: plain rowtime key; FLOOR(rowtime
    // TO HOUR) spelled as date_trunc (the engine's grouped-window rule)
    streams(
      """SELECT STREAM ts, event_type, count(*) AS c FROM events
        |GROUP BY event_type, ts""".stripMargin)
    streams(
      """SELECT STREAM date_trunc('HOUR', ts) AS rowtime, count(*) AS c
        |FROM events GROUP BY date_trunc('HOUR', ts)""".stripMargin)
    // testStreamHaving accepted row
    streams(
      """SELECT STREAM date_trunc('HOUR', ts) AS rowtime, count(*) AS c
        |FROM events GROUP BY date_trunc('HOUR', ts)
        |HAVING count(*) > 5""".stripMargin)
    // testStreamOrderBy accepted rows: monotonic leading key ascending
    streams("SELECT STREAM ts, event_id FROM events ORDER BY ts")
    streams(
      """SELECT STREAM date_trunc('MINUTE', ts) AS m, event_id FROM events
        |ORDER BY date_trunc('MINUTE', ts), event_id DESC""".stripMargin)
    // testStreamJoin accepted row: stream ⋈ table
    streams(
      """SELECT STREAM e.ts, e.event_id, n.n_name FROM events e
        |JOIN nation n ON e.event_id % 25 = n.n_nationkey""".stripMargin)
  }
}
