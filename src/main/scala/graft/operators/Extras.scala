package graft.operators

import graft.{QDef, Tables}
import graft.operators.JsonModes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Remaining operator-surface items: window navigation functions with
  * IGNORE NULLS, pivot, SIMILAR TO translation, SOUNDEX/DIFFERENCE.
  */
object Extras {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  /** Translate a SQL:2003 SIMILAR TO pattern into a Java/RE2 regex —
    * the reference's semantics live in runtime/Like.java (% → .*, _ → .,
    * SQL character classes and (|) pass through, regex metacharacters not
    * special in SIMILAR TO are escaped). Anchored on both ends.
    */
  def similarToRegex(pattern: String): String = {
    val sb = new StringBuilder("^")
    pattern.foreach {
      case '%' => sb.append(".*")
      case '_' => sb.append('.')
      case c @ ('.' | '^' | '$' | '\\') => sb.append("\\").append(c)
      case c => sb.append(c) // [], (), |, *, +, ?, {n,m} are SIMILAR TO syntax
    }
    sb.append("$").toString
  }

  /** SOUNDEX DIFFERENCE (reference: SqlLibraryOperators DIFFERENCE,
    * runtime SqlFunctions.difference) — index of the FIRST mismatching
    * position of the two 4-char soundex codes, i.e. their common-prefix
    * length; 4 when the codes are identical. */
  def differenceCol(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val sa = soundex(a); val sb = soundex(b)
    (3 to 0 by -1).foldLeft(lit(4): org.apache.spark.sql.Column) { (acc, i) =>
      when(substring(sa, i + 1, 1) =!= substring(sb, i + 1, 1), lit(i)).otherwise(acc)
    }
  }

  val defs: Seq[QDef] = Seq(

    // ---- Window navigation: IGNORE NULLS, nth_value, offsets/defaults -----
    // reference: RexImpTable.java:616-627 (FIRST_VALUE, NTH_VALUE,
    // LAST_VALUE, LEAD, LAG) + RexWindowBound frames.
    QDef.sql("window_navigation",
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
        |    OVER w AS last_ok_value,
        |  nth_value(event_id, 2) OVER w AS second_event,
        |  lag(event_id, 2, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lag2,
        |  lead(event_id, 2, -1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS lead2,
        |  round(cume_dist() OVER (PARTITION BY user_id ORDER BY ts, event_id), 9) AS cdist,
        |  round(percent_rank() OVER (PARTITION BY user_id ORDER BY ts, event_id), 9) AS prank
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""") { (s, dir) =>
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val w = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        last(when(col("event_type") === "error", lit(null)).otherwise(col("value")),
          ignoreNulls = true).over(w).as("last_ok_value"),
        nth_value(col("event_id"), 2).over(w).as("second_event"),
        lag(col("event_id"), 2, -1).over(wOrd).as("lag2"),
        lead(col("event_id"), 2, -1).over(wOrd).as("lead2"),
        round(cume_dist().over(wOrd), 9).as("cdist"),
        round(percent_rank().over(wOrd), 9).as("prank"))
    },

    // ---- Pivot (groupBy().pivot() ≡ per-value FILTER aggregates) ----------
    QDef.sql("pivot_segments",
      """SELECT c_nationkey,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE'), 0) AS AUTOMOBILE,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING'), 0) AS BUILDING,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'FURNITURE'), 0) AS FURNITURE,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD'), 0) AS HOUSEHOLD,
        |  COALESCE(COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY'), 0) AS MACHINERY
        |FROM customer GROUP BY c_nationkey""") { (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_nationkey"))
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // ---- SIMILAR TO (SQL:2003 pattern → regex translation) ----------------
    // reference semantics: runtime/Like.java. The oracle uses DuckDB's
    // SIMILAR TO, which takes an (anchored) regex — i.e. exactly the
    // translation target — so it pins the translated semantics per row.
    QDef.sql("similar_to",
      """SELECT p_partkey, p_type,
        |  p_type SIMILAR TO '.*(BRASS|STEEL).*' AS m_metal,
        |  p_type SIMILAR TO '(ECONOMY|PROMO).*' AS m_class,
        |  p_type SIMILAR TO '.{5,20}' AS m_len
        |FROM part""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"), col("p_type"),
        col("p_type").rlike(similarToRegex("%(BRASS|STEEL)%")).as("m_metal"),
        col("p_type").rlike(similarToRegex("(ECONOMY|PROMO)%")).as("m_class"),
        // SIMILAR TO quantified wildcard: _{5,20} → .{5,20}
        col("p_type").rlike(similarToRegex("_{5,20}")).as("m_len"))
    },

    // ---- SOUNDEX + DIFFERENCE ---------------------------------------------
    // DuckDB ships no soundex, so the oracle RE-IMPLEMENTS the algorithm
    // as a list_reduce state machine over the (distinct) inputs: map each
    // letter to its code ('7' = H/W skip, '0' = vowel reset), fold with a
    // "digits:lastCode" state, keep the first letter + 3 digits. Valid for
    // the fixture's uppercase-alpha inputs (c_mktsegment). DIFFERENCE is
    // the common-prefix length of the two codes (reference:
    // SqlFunctions.difference).
    QDef.sql("soundex_difference",
      """WITH inputs AS (
        |  SELECT DISTINCT c_mktsegment AS s FROM customer UNION SELECT 'BUILDING'
        |), mapped AS (
        |  SELECT s, list_transform(
        |      list_transform(generate_series(1, len(s)), i -> substr(s, i, 1)),
        |      c -> CASE WHEN c IN ('B','F','P','V') THEN '1'
        |                WHEN c IN ('C','G','J','K','Q','S','X','Z') THEN '2'
        |                WHEN c IN ('D','T') THEN '3'
        |                WHEN c = 'L' THEN '4'
        |                WHEN c IN ('M','N') THEN '5'
        |                WHEN c = 'R' THEN '6'
        |                WHEN c IN ('H','W') THEN '7'
        |                ELSE '0' END) AS codes
        |  FROM inputs
        |), coded AS (
        |  SELECT s, substr(s, 1, 1) || substr(string_split(
        |      list_reduce(list_prepend(':' || codes[1], codes[2:]),
        |        (acc, c) -> CASE WHEN c = '7' THEN acc
        |                         WHEN c = '0' THEN string_split(acc, ':')[1] || ':0'
        |                         WHEN c = string_split(acc, ':')[2] THEN acc
        |                         ELSE string_split(acc, ':')[1] || c || ':' || c END),
        |      ':')[1] || '000', 1, 3) AS code
        |  FROM mapped
        |)
        |SELECT c.c_custkey, cm.code AS sdx,
        |  CAST(CASE WHEN substr(cm.code,1,1) <> substr(cb.code,1,1) THEN 0
        |            WHEN substr(cm.code,2,1) <> substr(cb.code,2,1) THEN 1
        |            WHEN substr(cm.code,3,1) <> substr(cb.code,3,1) THEN 2
        |            WHEN substr(cm.code,4,1) <> substr(cb.code,4,1) THEN 3
        |            ELSE 4 END AS INT) AS diff_building
        |FROM customer c
        |JOIN coded cm ON cm.s = c.c_mktsegment
        |CROSS JOIN (SELECT code FROM coded WHERE s = 'BUILDING') cb""") { (s, dir) =>
      t(s, dir, "customer").select(
        col("c_custkey"),
        soundex(col("c_mktsegment")).as("sdx"),
        differenceCol(col("c_mktsegment"), lit("BUILDING")).as("diff_building"))
    },

    // ---- Datetime dialect extras (SqlLibraryOperators) --------------------
    // MONTHNAME/DAYNAME, TIMESTAMP_ADD/TIMESTAMP_DIFF, timezone conversion
    // (reference: SqlLibraryOperators MONTHNAME/DAYNAME; SqlStdOperatorTable
    // TIMESTAMP_ADD:1859/TIMESTAMP_DIFF:1862, CONVERT_TIMEZONE).
    // DuckDB's timezone(tz, naive_ts) LOCALIZES (tz → UTC), which is
    // Spark's to_utc_timestamp — both on IANA tzdata. The outer
    // timezone('UTC', ...) converts the resulting TIMESTAMPTZ back to a
    // NAIVE UTC timestamp before hour(), pinning the result regardless of
    // the oracle session's TimeZone setting (ADVICE r3: bare
    // hour(TIMESTAMPTZ) renders in the session zone).
    QDef.sql("fn_datetime_extras",
      """SELECT o_orderkey,
        |  monthname(o_orderdate) AS mname,
        |  dayname(o_orderdate) AS dname,
        |  o_orderdate + INTERVAL 2 MONTH AS plus2m,
        |  date_diff('day', TIMESTAMP '1996-01-01 00:00:00', o_orderdate) AS dd,
        |  CAST(hour(timezone('UTC', timezone('America/New_York', o_orderdate))) AS INT)
        |    AS utc_hour_ny
        |FROM orders WHERE o_orderkey % 13 = 0""") { (s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") % 13 === 0).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "MMMM").as("mname"),
        date_format(col("o_orderdate"), "EEEE").as("dname"),
        expr("timestampadd(MONTH, 2, o_orderdate)").as("plus2m"),
        expr("timestampdiff(DAY, TIMESTAMP'1996-01-01 00:00:00', o_orderdate)").as("dd"),
        hour(to_utc_timestamp(col("o_orderdate"), "America/New_York")).as("utc_hour_ny"))
    },

    // ---- JSON introspection (SqlLibraryOperators JSON_TYPE/LENGTH/KEYS) ---
    // JSON_KEYS via the native key extractor; JSON_LENGTH on a constructed
    // array; JSON_TYPE as the top-level classifier (valid for the
    // validated-JSON fixture; DuckDB runs its real json_type).
    QDef.sql("fn_json_info",
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS ks,
        |  CAST(json_array_length('[' || event_id || ',' || user_id || ']') AS INT)
        |    AS arr_len,
        |  json_type(props) AS jtype
        |FROM events WHERE event_id % 11 = 0""") { (s, dir) =>
      t(s, dir, "events").where(col("event_id") % 11 === 0).select(
        col("event_id"),
        array_join(json_object_keys(col("props")), ",").as("ks"),
        json_array_length(concat(lit("["), col("event_id"), lit(","),
          col("user_id"), lit("]"))).as("arr_len"),
        // the full MySQL classifier (JsonModes.jsonType, r16); the
        // fixture's props are all objects, where DuckDB's json_type
        // agrees on the spelling
        JsonModes.jsonType(col("props")).as("jtype"))
    },

    // ---- JSON introspection II: DEPTH / PRETTY / REMOVE / STORAGE_SIZE ----
    // (SqlLibraryOperators JSON_DEPTH/JSON_PRETTY/JSON_REMOVE/
    // JSON_STORAGE_SIZE — the rest of the MySQL introspection family,
    // native kernels in functions/JsonIntrospect). DuckDB 1.0 has none of
    // the four, so the oracle pins expected outputs CLOSED-FORM over
    // constructed JSON of known shape: a nested document for even ids, a
    // flat one for odd; STORAGE_SIZE parses a whitespace-riddled variant
    // and must equal the canonical compact length.
    QDef.sql("fn_json_info2",
      """SELECT event_id,
        |  CASE WHEN event_id % 2 = 0 THEN 4 ELSE 2 END AS jd,
        |  CASE WHEN event_id % 2 = 0 THEN
        |      '{' || chr(10) || '  "a": ' || CAST(event_id AS VARCHAR) || ',' || chr(10)
        |      || '  "b": [' || chr(10) || '    1,' || chr(10) || '    {' || chr(10)
        |      || '      "c": "x"' || chr(10) || '    }' || chr(10) || '  ]' || chr(10) || '}'
        |    ELSE '{' || chr(10) || '  "k": ' || CAST(event_id AS VARCHAR) || chr(10) || '}'
        |  END AS jp,
        |  CASE WHEN event_id % 2 = 0 THEN '{"b":[1,{"c":"x"}]}'
        |       ELSE '{"k":' || CAST(event_id AS VARCHAR) || '}' END AS jr,
        |  CASE WHEN event_id % 2 = 0
        |       THEN '{"a":' || CAST(event_id AS VARCHAR) || ',"b":[{"c":"x"}]}'
        |       ELSE '{"k":' || CAST(event_id AS VARCHAR) || '}' END AS jr2,
        |  CAST(length(CASE WHEN event_id % 2 = 0
        |    THEN '{"a":' || CAST(event_id AS VARCHAR) || ',"b":[1,{"c":"x"}]}'
        |    ELSE '{"k":' || CAST(event_id AS VARCHAR) || '}' END) AS INT) AS sz
        |FROM events WHERE event_id % 13 = 0""") { (s, dir) =>
      import graft.functions.JsonIntrospect._
      val id = col("event_id").cast("string")
      val even = col("event_id") % 2 === 0
      val j = when(even,
          concat(lit("{\"a\": "), id, lit(", \"b\": [1, {\"c\": \"x\"}]}")))
        .otherwise(concat(lit("{\"k\": "), id, lit("}")))
      // same documents, hostile whitespace — STORAGE_SIZE must see through
      val messy = when(even,
          concat(lit("{ \"a\" :"), id, lit(" ,  \"b\":[ 1,{\"c\": \"x\"} ] }")))
        .otherwise(concat(lit("{  \"k\":"), id, lit(" }")))
      t(s, dir, "events").where(col("event_id") % 13 === 0).select(
        col("event_id"),
        json_depth(j).as("jd"),
        json_pretty(j).as("jp"),
        json_remove(j, lit("$.a")).as("jr"),
        json_remove(j, lit("$.b[0]")).as("jr2"),
        json_storage_size(messy).as("sz"))
    },

    // ---- JSON aggregation: JSON_ARRAYAGG / JSON_OBJECTAGG -----------------
    // reference: RexImpTable.java:544-553 JSON_OBJECTAGG/JSON_ARRAYAGG.
    // Aggregation order is pinned (sorted by key) so the emitted text is
    // deterministic under any parallelism; the oracle renders the same
    // text with ORDER BY'd string_agg.
    QDef.sql("fn_agg_json",
      """SELECT o_orderpriority,
        |  '[' || string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |      || ']' AS j_arr,
        |  '{' || string_agg('"' || CAST(o_orderkey AS VARCHAR) || '":'
        |                        || CAST(o_custkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |      || '}' AS j_obj
        |FROM orders WHERE o_orderkey % 97 = 0
        |GROUP BY o_orderpriority""") { (s, dir) =>
      t(s, dir, "orders").where(col("o_orderkey") % 97 === 0)
        .groupBy(col("o_orderpriority"))
        .agg(
          to_json(array_sort(collect_list(col("o_orderkey")))).as("j_arr"),
          to_json(map_from_entries(transform(
            array_sort(collect_list(struct(col("o_orderkey").as("k"),
              col("o_custkey").as("v")))),
            e => struct(e.getField("k").cast("string").as("k"),
              e.getField("v").as("v"))))).as("j_obj"))
    },

    // ---- JSON construction: JSON_OBJECT / JSON_ARRAY ----------------------
    // reference: SqlStdOperatorTable JSON_OBJECT/JSON_ARRAY :1298-1337,
    // runtime/JsonFunctions.java. Both engines emit compact key-ordered
    // JSON, so the text compares exactly.
    QDef.sql("fn_json_build",
      """SELECT event_id,
        |  to_json({'id': event_id, 'type': event_type}) AS j_obj,
        |  to_json([event_id, user_id]) AS j_arr,
        |  to_json({'outer': {'k': CAST(json_extract_string(props, '$.k') AS BIGINT)}}) AS j_nested
        |FROM events WHERE event_id % 13 = 0""") { (s, dir) =>
      t(s, dir, "events").where(col("event_id") % 13 === 0).select(
        col("event_id"),
        to_json(struct(col("event_id").as("id"), col("event_type").as("type"))).as("j_obj"),
        to_json(array(col("event_id"), col("user_id"))).as("j_arr"),
        to_json(struct(struct(get_json_object(col("props"), "$.k").cast("long").as("k"))
          .as("outer"))).as("j_nested"))
    },

    // ---- Misc encodings: HEX/UNHEX/BIN/printf/isnan -----------------------
    // reference: SqlLibraryOperators TO_BASE64-family and format functions;
    // runtime/SqlFunctions.java hex/toBase.
    QDef.sql("fn_misc_encodings",
      """SELECT p_partkey,
        |  hex(p_size) AS hex_size,
        |  hex(p_brand) AS hex_brand,
        |  CAST(unhex(hex(p_brand)) AS VARCHAR) AS roundtrip,
        |  bin(p_size) AS bin_size,
        |  printf('%s=%d', p_brand, p_size) AS fmt,
        |  isnan(CAST(p_retailprice AS DOUBLE)) AS is_nan
        |FROM part""") { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        hex(col("p_size")).as("hex_size"),
        hex(col("p_brand")).as("hex_brand"),
        unhex(hex(col("p_brand"))).cast("string").as("roundtrip"),
        bin(col("p_size")).as("bin_size"),
        format_string("%s=%d", col("p_brand"), col("p_size")).as("fmt"),
        isnan(col("p_retailprice")).as("is_nan"))
    },

    // ---- GROUPING() indicator over ROLLUP ---------------------------------
    // reference: SqlStdOperatorTable GROUPING / GROUPING_ID — distinguishes
    // a real NULL group key from a super-aggregate row.
    QDef.sql("agg_grouping_fn",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)""") { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
          grouping(col("l_linestatus")).cast("int").as("g_status"),
          count(lit(1)).as("n"))
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status", "n")
    },

    // ---- GROUP_ID() over duplicate grouping sets --------------------------
    // reference: fun/SqlGroupIdFunction.java — GROUP_ID() numbers duplicate
    // grouping sets 0..n-1 (GROUPING SETS ((k),(k),()) emits each per-k
    // group twice with GROUP_ID 0 and 1), lowered by expanding the
    // duplicates into a union of distinct-set aggregates; we apply the
    // same rewrite declaratively — one aggregate per distinct set, reused
    // across its duplicates with the literal id attached.
    // DELIBERATE DEVIATION from the pinned reference's OUTPUT: its
    // agg.iq:858-876 golden still carries the CALCITE-1824 bug (duplicate
    // sets collapse, gid always 0, with an in-golden comment promising the
    // extra rows "when [CALCITE-1824] is fixed"). This implements the
    // fixed semantics that comment describes — the later upstream fix —
    // not the buggy collapsed output.
    QDef.sql("agg_group_id",
      """SELECT CAST(n_regionkey AS BIGINT) AS rk, CAST(0 AS BIGINT) AS gid,
        |  count(*) AS cnt, CAST(sum(n_nationkey) AS BIGINT) AS sk
        |FROM nation GROUP BY n_regionkey
        |UNION ALL
        |SELECT CAST(n_regionkey AS BIGINT), 1, count(*), CAST(sum(n_nationkey) AS BIGINT)
        |FROM nation GROUP BY n_regionkey
        |UNION ALL
        |SELECT NULL, 0, count(*), CAST(sum(n_nationkey) AS BIGINT) FROM nation""") { (s, dir) =>
      val per = t(s, dir, "nation").groupBy(col("n_regionkey"))
        .agg(count(lit(1)).as("cnt"), sum("n_nationkey").cast("long").as("sk"))
      def tagged(gid: Int) = per.select(
        col("n_regionkey").cast("long").as("rk"), lit(gid.toLong).as("gid"),
        col("cnt"), col("sk"))
      val total = t(s, dir, "nation")
        .agg(count(lit(1)).as("cnt"), sum("n_nationkey").cast("long").as("sk"))
        .select(lit(null).cast("long").as("rk"), lit(0L).as("gid"), col("cnt"), col("sk"))
      tagged(0).unionAll(tagged(1)).unionAll(total)
    },

    // ---- NTILE (equal-height bucketing) -----------------------------------
    // reference: SqlStdOperatorTable NTILE window function.
    QDef.sql("window_ntile",
      """SELECT event_id, user_id,
        |  ntile(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS quartile
        |FROM events WHERE user_id < 40""") { (s, dir) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").where(col("user_id") < 40)
        .select(col("event_id"), col("user_id"), ntile(4).over(w).as("quartile"))
    },

    // ---- IS [NOT] DISTINCT FROM (null-safe comparison) --------------------
    // reference: SqlStdOperatorTable IS DISTINCT FROM / IS NOT DISTINCT
    // FROM; Spark's <=> is IS NOT DISTINCT FROM, also usable as a
    // null-safe join key.
    QDef.sql("fn_distinct_from",
      """SELECT e1.event_id,
        |  json_extract_string(e1.props, '$.missing') IS DISTINCT FROM 'x' AS d_lit,
        |  json_extract_string(e1.props, '$.missing')
        |    IS NOT DISTINCT FROM json_extract_string(e1.props, '$.alsomissing') AS nd_nulls,
        |  e1.event_type IS NOT DISTINCT FROM e1.event_type AS nd_self
        |FROM events e1 WHERE e1.event_id % 17 = 0""") { (s, dir) =>
      t(s, dir, "events").where(col("event_id") % 17 === 0).select(
        col("event_id"),
        (!(get_json_object(col("props"), "$.missing") <=> lit("x"))).as("d_lit"),
        (get_json_object(col("props"), "$.missing")
          <=> get_json_object(col("props"), "$.alsomissing")).as("nd_nulls"),
        (col("event_type") <=> col("event_type")).as("nd_self"))
    },

    // ---- RANGE frame with interval bounds ---------------------------------
    // reference: RexWindowBound with interval offsets (OVER ... RANGE
    // BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) — the sliding
    // event-time analytic; dialect-shared SQL text runs on both engines.
    QDef.common("window_range_interval",
      """SELECT event_id, user_id,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
        |                 RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
        |    AS n_last_hour,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6)))
        |       OVER (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS sum_last_hour
        |FROM events WHERE user_id < 50"""),

    // ---- Native UDAF: weighted average (DeclarativeAggregate) -------------
    // functions.WeightedAvg — the codegen-quality UDAF path (reference:
    // schema/impl/AggregateFunctionImpl.java init/add/merge/result). The
    // decimal accumulators make it bit-equal to the oracle's SUM/SUM form,
    // and Spark plans it with a map-side partial like any built-in.
    QDef.sql("fn_udaf_wavg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(28,4))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(28,4))) AS DOUBLE) AS wavg_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          graft.functions.WeightedAvg
            .weighted_avg(col("l_extendedprice"), col("l_quantity")).as("wavg_price"),
          count(lit(1)).as("n"))
    },

    // ---- MULTISET operators ------------------------------------------------
    // reference: SqlMultisetSetOperator (MULTISET UNION/INTERSECT/EXCEPT),
    // MEMBER OF, IS A SET (SqlStdOperatorTable :2033-2206). Multisets map
    // to arrays; results are sort-normalized since multiset identity is
    // order-free.
    // Bag (ALL) variants follow the operator.iq:69-166 goldens: EXCEPT ALL
    // removes the first k occurrences, INTERSECT ALL keeps min-multiplicity
    // occurrences in left order, UNION ALL concatenates. DuckDB expresses
    // the per-occurrence counting with indexed lambdas (l[1:i] prefix).
    QDef.sql("fn_multiset",
      """WITH m AS (
        |  SELECT n_regionkey,
        |    list_sort(list(n_nationkey)) AS ks,
        |    list_sort(list(n_nationkey % 5)) AS ms
        |  FROM nation GROUP BY n_regionkey
        |)
        |SELECT n_regionkey,
        |  array_to_string(list_sort(list_distinct(list_concat(ks, ms))), ',') AS m_union,
        |  array_to_string(list_sort(list_intersect(ks, ms)), ',') AS m_intersect,
        |  array_to_string(list_sort(list_filter(ks, x -> NOT list_contains(ms, x))), ',') AS m_except,
        |  array_to_string(list_concat(ks, ms), ',') AS m_union_all,
        |  array_to_string(list_filter(ks, (x, i) ->
        |    len(list_filter(ks[1:i], y -> y = x)) > len(list_filter(ms, y -> y = x))), ',')
        |    AS m_except_all,
        |  array_to_string(list_filter(ks, (x, i) ->
        |    len(list_filter(ks[1:i], y -> y = x)) <= len(list_filter(ms, y -> y = x))), ',')
        |    AS m_intersect_all,
        |  len(list_filter(list_distinct(ms), x ->
        |    len(list_filter(ms, y -> y = x)) > len(list_filter(ks, y -> y = x)))) = 0
        |    AS ms_submultiset,
        |  list_contains(ks, 7) AS member_of_7,
        |  len(list_distinct(ms)) = len(ms) AS is_a_set,
        |  len(ks) AS card
        |FROM m""") { (s, dir) =>
      import graft.functions.Multisets._
      // Array outputs serialized to text for the driver's hash comparator.
      def js(c: org.apache.spark.sql.Column) = array_join(c.cast("array<string>"), ",")
      Tables.t(s, dir, "nation")
        .groupBy(col("n_regionkey"))
        .agg(
          sort_array(collect_list(col("n_nationkey"))).as("ks"),
          sort_array(collect_list(col("n_nationkey") % 5)).as("ms"))
        .select(
          col("n_regionkey"),
          js(sort_array(array_union(col("ks"), col("ms")))).as("m_union"),
          js(sort_array(array_intersect(col("ks"), col("ms")))).as("m_intersect"),
          js(sort_array(array_except(col("ks"), col("ms")))).as("m_except"),
          js(multisetUnionAll(col("ks"), col("ms"))).as("m_union_all"),
          js(multisetExceptAll(col("ks"), col("ms"))).as("m_except_all"),
          js(multisetIntersectAll(col("ks"), col("ms"))).as("m_intersect_all"),
          submultisetOf(col("ms"), col("ks")).as("ms_submultiset"),
          memberOf(lit(7), col("ks")).as("member_of_7"),
          isASet(col("ms")).as("is_a_set"),
          size(col("ks")).as("card"))
    }
  )
}
