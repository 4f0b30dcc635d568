package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal operators: as-of join + snapshot.
  *
  * The reference models these as Snapshot (`FOR SYSTEM_TIME AS OF`,
  * reference: core/src/main/java/org/apache/calcite/rel/core/Snapshot.java:47,
  * sql/SqlSnapshot.java:30, schema/TemporalTable.java); an as-of join is the
  * correlated form (probe row's time against the build side's history).
  *
  * Scale design — the union+window trick, NOT a per-row subquery:
  * interleave probe and build rows on (key, time), then a single
  * partition-by-key running `last(_, ignoreNulls)` carries the most recent
  * build attributes forward onto each probe row. One shuffle on the key,
  * no nested-loop, no skew amplification; this is the plan that survives a
  * 100 TB build side (a lateral subquery re-scans the build side per probe
  * row and does not).
  */
object AsOf {

  /** Left as-of join: for each probe row, attach the latest build row with
    * the same key and buildTime strictly earlier than probeTime.
    * Probe keeps all its columns; selected build columns arrive as
    * `asof_<name>` (null when no earlier build row exists).
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      probeKey: Column,
      buildKey: Column,
      probeTime: Column,
      buildTime: Column,
      buildCols: Seq[String],
      tieBreak: Column): DataFrame = {
    val probeCols = probe.columns
    // Carry ONE struct of all requested build columns, so every asof_* value
    // comes from the same (latest) build row: a NULL field in the latest row
    // stays NULL rather than falling back to an older row per-column.
    val pType = org.apache.spark.sql.types.StructType(probeCols.map(c => probe.schema(c)))
    val bType = org.apache.spark.sql.types.StructType(buildCols.map(c => build.schema(c)))
    val pTagged = probe.select(
      probeKey.as("__k"), probeTime.as("__t"), lit(1).as("__isProbe"),
      lit(null).cast("long").as("__tie"),
      struct(probeCols.map(probe(_)): _*).as("__p"),
      lit(null).cast(bType).as("__b"))
    val bTagged = build.select(
      buildKey.as("__k"), buildTime.as("__t"), lit(0).as("__isProbe"),
      tieBreak.cast("long").as("__tie"),
      lit(null).cast(pType).as("__p"),
      struct(buildCols.map(build(_)): _*).as("__b"))
    // Strict '<': at equal time, probes sort BEFORE builds (desc on __isProbe)
    // so the running last() cannot see a same-timestamp build row.
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__isProbe").desc, col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = pTagged.unionByName(bTagged)
      .select(col("__isProbe"), col("__p"),
        last(col("__b"), ignoreNulls = true).over(w).as("__asof"))
    carried.where(col("__isProbe") === 1)
      .select(probeCols.map(c => col(s"__p.$c").as(c)) ++
        buildCols.map(c => col(s"__asof.$c").as(s"asof_$c")): _*)
  }

  /** Nearest-within-tolerance join: each probe row pairs with the build
    * row of smallest |probeTime − buildTime| among same-key rows inside
    * ±toleranceUs, ties broken by `tieBreak`; unmatched probes survive
    * with nulls. One equi-key bounded-interval join + one rank per probe
    * row (`probeId` must uniquely identify probe rows). */
  def nearestJoin(
      probe: DataFrame,
      build: DataFrame,
      probeId: Column,
      probeKey: Column,
      buildKey: Column,
      probeTime: Column,
      buildTime: Column,
      toleranceUs: Long,
      buildIdCol: String,
      tieBreak: Column): DataFrame = {
    val p = probe.select(probeId.as("__pid"), probeKey.as("__pk"),
      unix_micros(probeTime).as("__pt"),
      struct(probe.columns.map(probe(_)): _*).as("__p"))
    val b = build.select(buildKey.as("__bk"), unix_micros(buildTime).as("__bt"),
      build(buildIdCol).as("b_" + buildIdCol))
    val joined = p.join(b,
      col("__pk") === col("__bk") &&
        abs(col("__bt") - col("__pt")) <= toleranceUs, "left")
      .withColumn("gap_us", abs(col("__bt") - col("__pt")))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("gap_us").asc_nulls_last, tieBreak.asc_nulls_last)
    joined.withColumn("__rk", row_number().over(w)).where(col("__rk") === 1)
      .select(col("__p.*"),
        col("b_" + buildIdCol).as("near_" + buildIdCol), col("gap_us"))
  }

  val defs: Seq[QDef] = Seq(

    // ---- As-of join: each purchase gets the user's latest prior click -----
    QDef.sql("asof_join_events",
      """SELECT p.event_id, p.user_id, p.ts,
        |       c.event_id AS asof_event_id, c.value AS asof_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT e.event_id, e.value
        |  FROM events e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'click' AND e.ts < p.ts
        |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1
        |) c ON TRUE""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
      asofJoin(
        probe = purchases, build = clicks,
        probeKey = col("user_id"), buildKey = col("user_id"),
        probeTime = col("ts"), buildTime = col("ts"),
        buildCols = Seq("event_id", "value"),
        tieBreak = col("event_id"))
    },

    // ---- Nearest join: closest event either direction within tolerance ----
    // The "nearest" as-of variant (pandas merge_asof direction='nearest'):
    // each purchase pairs with the user's click of SMALLEST |time gap|
    // within ±30 minutes — sensor alignment and attribution both want
    // this, and it is NOT expressible as the carry-forward union trick
    // (future rows compete with past rows). Scale shape: an equi-key +
    // bounded-interval join (state per key bounded by the tolerance,
    // exactly the stream-stream join contract) then ONE rank per probe
    // row on (|gap|, tie) — no lateral per-row rescan of the build side.
    QDef.sql("asof_join_nearest",
      """SELECT p.event_id, p.user_id,
        |       c.event_id AS near_event_id, c.gap_us
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        |  SELECT e.event_id,
        |    CAST(abs(date_diff('microsecond', p.ts, e.ts)) AS BIGINT) AS gap_us
        |  FROM events e
        |  WHERE e.user_id = p.user_id AND e.event_type = 'click'
        |    AND e.ts BETWEEN p.ts - INTERVAL '30 minutes'
        |                 AND p.ts + INTERVAL '30 minutes'
        |  ORDER BY gap_us, e.event_id LIMIT 1
        |) c ON TRUE""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      nearestJoin(
        probe = ev.where(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        build = ev.where(col("event_type") === "click"),
        probeId = col("event_id"),
        probeKey = col("user_id"), buildKey = col("user_id"),
        probeTime = col("ts"), buildTime = col("ts"),
        toleranceUs = 30L * 60 * 1000000,
        buildIdCol = "event_id", tieBreak = col("b_event_id"))
        .select(col("event_id"), col("user_id"),
          col("near_event_id"), col("gap_us"))
    },

    // ---- Snapshot: table state FOR SYSTEM_TIME AS OF a cutoff -------------
    // Latest row per key with ts <= cutoff — Delta-style time travel
    // reduced to a window dedup (reference: Snapshot.java:47 semantics).
    QDef.sql("temporal_snapshot",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events WHERE ts <= TIMESTAMP '2024-06-01 00:00:00'
        |) WHERE rn = 1""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.t(s, dir, "events")
        .where(col("ts") <= lit("2024-06-01 00:00:00").cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
    },

    // ---- SQL:2011 FOR SYSTEM_TIME AS OF over a system-versioned view ------
    // Events become per-user versions ((valid_from, valid_to] via LEAD),
    // then the SQL:2011 clause — parsed by the injected SystemTimeSql
    // front end, reference sql/SqlSnapshot.java — selects the versions
    // valid at the cutoff. The lowering is a plain pushable filter: one
    // pruned scan at any scale. Oracle: the same construction spelled
    // longhand in DuckDB.
    QDef.sql("temporal_system_time",
      """WITH user_versions AS (
        |  SELECT user_id, event_id, value, ts AS valid_from,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM events
        |)
        |SELECT user_id, event_id, value FROM user_versions
        |WHERE valid_from <= TIMESTAMP '2024-06-01 00:00:00'
        |  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-06-01 00:00:00')""") { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(
        """CREATE OR REPLACE TEMP VIEW user_versions AS
          |SELECT user_id, event_id, value, ts AS valid_from,
          |       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
          |FROM events""".stripMargin)
      s.sql(
        """SELECT user_id, event_id, value FROM user_versions
          |FOR SYSTEM_TIME AS OF TIMESTAMP '2024-06-01 00:00:00'""".stripMargin)
    }
  )
}
