package graft

import graft.operators.MatchRecognize.Pat
import graft.plans.MatchRecognizeSql
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL-syntax MATCH_RECOGNIZE front end: pattern grammar, DEFINE
  * predicates, fallthrough to the delegate parser, and end-to-end
  * equivalence with the programmatic operator. */
object MatchRecognizeSqlSpec {
  final case class Out(user_id: Long, first_id: Long, last_id: Long, n_clicks: Long)
}

class MatchRecognizeSqlSpec extends AnyFunSuite {
  import SparkTestSession._
  import MatchRecognizeSqlSpec.Out

  test("pattern grammar: quantifiers, groups, alternation") {
    import Pat._
    assert(MatchRecognizeSql.parsePattern("A B") == Cat(Seq(Sym("A"), Sym("B"))))
    assert(MatchRecognizeSql.parsePattern("A{3,} B") ==
      Cat(Seq(Rep(Sym("A"), 3, -1), Sym("B"))))
    assert(MatchRecognizeSql.parsePattern("A{2,5}") == Rep(Sym("A"), 2, 5))
    assert(MatchRecognizeSql.parsePattern("A | B C") ==
      Alt(Seq(Sym("A"), Cat(Seq(Sym("B"), Sym("C"))))))
    assert(MatchRecognizeSql.parsePattern("(A B)+ C?") ==
      Cat(Seq(Rep(Cat(Seq(Sym("A"), Sym("B"))), 1, -1), Rep(Sym("C"), 0, 1))))
  }

  test("pattern grammar: reluctant quantifiers, PERMUTE, exclusion") {
    import Pat._
    assert(MatchRecognizeSql.parsePattern("A+? B") ==
      Cat(Seq(Rep(Sym("A"), 1, -1, greedy = false), Sym("B"))))
    assert(MatchRecognizeSql.parsePattern("A{2,}?") ==
      Rep(Sym("A"), 2, -1, greedy = false))
    assert(MatchRecognizeSql.parsePattern("A*? B??") ==
      Cat(Seq(Rep(Sym("A"), 0, -1, greedy = false),
        Rep(Sym("B"), 0, 1, greedy = false))))
    // PERMUTE expands to the alternation of permutations in lexicographic
    // operand order (SQL:2016; the reference's parser does the same)
    assert(MatchRecognizeSql.parsePattern("PERMUTE(A, B)") ==
      Alt(Seq(Cat(Seq(Sym("A"), Sym("B"))), Cat(Seq(Sym("B"), Sym("A"))))))
    assert(MatchRecognizeSql.parsePattern("{- A+ -} B") ==
      Cat(Seq(Excl(Rep(Sym("A"), 1, -1)), Sym("B"))))
    assert(MatchRecognizeSql.parsePattern("A {- B C -} D") ==
      Cat(Seq(Sym("A"), Excl(Cat(Seq(Sym("B"), Sym("C")))), Sym("D"))))
  }

  test("running aggregates in DEFINE: the reference's disabled match.iq block") {
    // The exact shape of match.iq:55-85 — disabled in the reference
    // (`!if (false)`) because its engine has no aggregates in DEFINE:
    //   DEFINE B AS CHAR_LENGTH(S.ename)
    //             + SUM(CHAR_LENGTH(b.ename || ';')) + CHAR_LENGTH(';') <= 15
    // packs names into runs whose ;-joined length stays within 15.
    import spark.implicits._
    val df = Seq(
      (1L, 1L, "CLARK"), (1L, 2L, "KING"), (1L, 3L, "SMITH"),
      (1L, 4L, "JONES"), (1L, 5L, "SCOTT"), (1L, 6L, "ADAMS")
    ).toDF("g", "seq", "ename")
    val out = graft.plans.MatchRecognizeSql.dataframe(df, "g", "seq", None,
      "COUNT(*) AS n, FIRST(ename) AS s_name, LAST(ename) AS b_last",
      "S B+",
      "B AS CHAR_LENGTH(S.ename) + SUM(CHAR_LENGTH(b.ename || ';')) + CHAR_LENGTH(';') <= 15")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[String]("s_name"),
        r.getAs[String]("b_last"))).toSeq
    // CLARK(5): KING fits (5+5+1=11), SMITH would be 17 -> [CLARK KING];
    // then [SMITH JONES] (12), then [SCOTT ADAMS] (12)
    assert(out == Seq((2L, "CLARK", "KING"), (2L, "SMITH", "JONES"),
      (2L, "SCOTT", "ADAMS")), out.toString)
  }

  test("parseDefineBody routes simple vs aggregate bodies") {
    import graft.plans.MatchRecognizeSql
    assert(MatchRecognizeSql.parseDefineBody("t = 'click'").isLeft)
    assert(MatchRecognizeSql.parseDefineBody("v < PREV(v)").isLeft)
    assert(MatchRecognizeSql.parseDefineBody("SUM(B.value) <= 100").isRight)
    assert(MatchRecognizeSql.parseDefineBody("COUNT(B.*) < 3").isRight)
    // mixed conjunction: any aggregate conjunct makes the body contextual
    assert(MatchRecognizeSql.parseDefineBody(
      "t = 'click' AND SUM(B.value) <= 100").isRight)
    intercept[IllegalArgumentException] {
      MatchRecognizeSql.parseDefineBody("AVG(B.value) FILTER (WHERE 1=1) <= 1")
    }
  }

  test("the reference's first disabled match block: up.deptno < PREV(up.deptno)") {
    // match.iq:44-53, inside `!if (false)`:
    //   PATTERN (s up) DEFINE up AS up.deptno < prev(up.deptno)
    // with the literal measure `1 AS m1` — var-qualified left side plus
    // partition-navigation PREV (a constant partition key stands in for
    // the clause's partitionless form).
    import spark.implicits._
    val df = Seq((1L, 1L, 10), (1L, 2L, 30), (1L, 3L, 20),
      (1L, 4L, 5), (1L, 5L, 50)).toDF("g", "hiredate", "deptno")
    val got = graft.plans.MatchRecognizeSql.dataframe(df, "g", "hiredate", None,
      "1 AS m1, FIRST(deptno) AS d0, LAST(deptno) AS d1",
      "S UP", "UP AS up.deptno < PREV(up.deptno)")
      .collect().map(r => (r.getAs[Long]("m1"), r.getAs[Int]("d0"),
        r.getAs[Int]("d1"))).toSeq
    // the only S-then-drop pair after SKIP PAST LAST ROW: rows (30, 20)
    assert(got == Seq((1L, 30, 20)), got.toString)
  }

  test("PREV(col, n) explicit-offset navigation in DEFINE") {
    import spark.implicits._
    // U matches rows higher than the value TWO rows back (partition
    // navigation: the offset can reach before the match start)
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 6.0),
      (1L, 4L, 2.0), (1L, 5L, 7.0)).toDF("g", "seq", "value")
    val got = graft.plans.MatchRecognizeSql.dataframe(df, "g", "seq", None,
      "COUNT(*) AS n, FIRST(seq) AS s0", "U+", "U AS value > PREV(value, 2)")
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("s0"))).toSeq
    // row3 (6 > 5 at offset 2) and row5 (7 > 6) qualify; row4 (2 > 3) no
    assert(got == Seq((1L, 3L), (1L, 5L)), got.toString)
  }

  test("NEXT(col [, n]) lookahead navigation in DEFINE") {
    import spark.implicits._
    val df = Seq((1L, 1L, 5.0), (1L, 2L, 3.0), (1L, 3L, 6.0),
      (1L, 4L, 2.0), (1L, 5L, 7.0)).toDF("g", "seq", "value")
    // peaks: strictly above the FOLLOWING row; the last row has no next
    // (NULL semantics → no match), exactly the lead() formulation
    val peaks = graft.plans.MatchRecognizeSql.dataframe(df, "g", "seq", None,
      "FIRST(seq) AS s0", "PK", "PK AS value > NEXT(value)")
      .collect().map(_.getAs[Long]("s0")).toSeq
    assert(peaks == Seq(1L, 3L), peaks.toString)
    // explicit offset: below the value TWO rows ahead
    val rises = graft.plans.MatchRecognizeSql.dataframe(df, "g", "seq", None,
      "FIRST(seq) AS s0", "U", "U AS value < NEXT(value, 2)")
      .collect().map(_.getAs[Long]("s0")).toSeq
    assert(rises == Seq(1L, 3L), rises.toString)
  }

  test("NEXT holds the streaming attempt open until the lookahead row arrives") {
    import graft.operators.MatchRecognize
    import graft.plans.MatchRecognizeSql
    val defs = MatchRecognizeSql.parseDefineBody("value > NEXT(value)")
      .toOption.get
    def row(seq: Long, v: Double): Row = Row(1L, seq, v)
    // schema-tagged rows for getAs("value")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("g", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("seq", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    def gr(seq: Long, v: Double): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](1L, seq, v), schema)
    val all = IndexedSeq(gr(1, 5.0), gr(2, 3.0), gr(3, 6.0))
    // with only the first row buffered, the peak at seq=1 CANNOT be
    // decided (its NEXT row is missing): everything is retained
    val (none, retain1) = MatchRecognize.findMatchesStreaming(
      all.take(1), MatchRecognize.Pat.Sym("PK"), Map.empty,
      ctxDefines = Map("PK" -> defs))
    assert(none.isEmpty && retain1 == 0)
    // once the second row arrives the peak emits and releases
    val (m2, _) = MatchRecognize.findMatchesStreaming(
      all.take(2), MatchRecognize.Pat.Sym("PK"), Map.empty,
      ctxDefines = Map("PK" -> defs))
    assert(m2.map(_.head._1.getAs[Long]("seq")) == Seq(1L))
    // full buffer equals the batch matcher
    val batch = MatchRecognize.findMatches(
      all, MatchRecognize.Pat.Sym("PK"), Map.empty,
      ctxDefines = Map("PK" -> defs))
    assert(batch.map(_.head._1.getAs[Long]("seq")) == Seq(1L))
  }

  test("MIN/MAX/AVG running aggregates in DEFINE") {
    import spark.implicits._
    val avg = Seq((1L, 1L, 2.0), (1L, 2L, 4.0), (1L, 3L, 9.0),
      (1L, 4L, 20.0), (1L, 5L, 1.0)).toDF("g", "seq", "value")
    // B extends while the B-rows' running average stays <= 5
    val got = graft.plans.MatchRecognizeSql.dataframe(avg, "g", "seq", None,
      "COUNT(*) AS n", "S B*", "B AS AVG(B.value) <= 5")
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(got == Seq(2L, 1L, 2L), got.toString)
    val mn = Seq((1L, 1L, 5.0), (1L, 2L, 4.0), (1L, 3L, 3.0),
      (1L, 4L, 2.0), (1L, 5L, 10.0)).toDF("g", "seq", "value")
    val gotMin = graft.plans.MatchRecognizeSql.dataframe(mn, "g", "seq", None,
      "COUNT(*) AS n", "S B*", "B AS MIN(B.value) >= 3")
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(gotMin == Seq(3L, 2L), gotMin.toString)
  }

  test("COUNT in DEFINE bounds repetition length") {
    import spark.implicits._
    val df = (1L to 10L).map(i => (1L, i, i.toDouble)).toDF("g", "seq", "value")
    // B accepts while the match (S plus B's so far, incl. candidate) holds
    // at most 4 rows total: every match is S B B B
    val out = graft.plans.MatchRecognizeSql.dataframe(df, "g", "seq", None,
      "COUNT(*) AS n", "S B*", "B AS COUNT(*) <= 4")
      .collect().map(_.getAs[Long]("n")).toSeq
    assert(out == Seq(4L, 4L, 2L), out.toString)
  }

  test("DEFINE predicates: literals, PREV, conjunction, three-valued null") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("t", org.apache.spark.sql.types.StringType)))
    def row(v: java.lang.Double, t: String): Row =
      new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
        Array[Any](v, t), schema)
    val p1 = MatchRecognizeSql.parsePredicate("t = 'click'")
    assert(p1(row(1.0, "click"), None))
    assert(!p1(row(1.0, "error"), None))
    val p2 = MatchRecognizeSql.parsePredicate("v < PREV(v)")
    assert(p2(row(1.0, "x"), Some(row(2.0, "x"))))
    assert(!p2(row(3.0, "x"), Some(row(2.0, "x"))))
    assert(!p2(row(1.0, "x"), None)) // PREV on first row -> unknown -> false
    val p3 = MatchRecognizeSql.parsePredicate("v >= 2 AND t <> 'error'")
    assert(p3(row(2.0, "click"), None))
    assert(!p3(row(2.0, "error"), None))
    assert(!p3(row(1.0, "click"), None))
    assert(!p3(row(null, "click"), None)) // null comparison -> false
  }

  test("non-MATCH_RECOGNIZE statements fall through to Spark's parser") {
    Tables.registerAll(spark, sfDir)
    assert(spark.sql("SELECT count(*) AS n FROM nation").head().getLong(0) == 25)
  }

  test("shell-matching statement with unsupported DEFINE falls through") {
    Tables.registerAll(spark, sfDir)
    // matches the MATCH_RECOGNIZE shell regex but the DEFINE term is not
    // in our restricted grammar — must reach the delegate parser and raise
    // its canonical ParseException, not an IllegalArgumentException
    val bad =
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts
        |  MEASURES FIRST(event_id) AS a
        |  PATTERN (X+)
        |  DEFINE X AS some_udf(event_type) BETWEEN 1 AND 2)""".stripMargin
    val e = intercept[Exception](spark.sql(bad))
    assert(e.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException]
      || e.isInstanceOf[org.apache.spark.sql.AnalysisException],
      s"expected the delegate parser's error, got ${e.getClass}: ${e.getMessage}")
  }

  test("pre-epoch timestamps order correctly as match keys") {
    import java.sql.Timestamp
    def key(t: Timestamp): Long = MatchRecognizeSql.asLong(t)
    val tNeg1 = new Timestamp(-1000L)  // 1969-12-31T23:59:59Z
    val tNegHalf = new Timestamp(-500L) // 23:59:59.5 — AFTER -1s
    val tZero = new Timestamp(0L)
    assert(key(tNeg1) < key(tNegHalf), s"${key(tNeg1)} !< ${key(tNegHalf)}")
    assert(key(tNegHalf) < key(tZero))
  }

  test("SQL syntax result equals the programmatic operator") {
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES FIRST(event_id) AS first_id, LAST(event_id) AS last_id,
        |           COUNT(C.*) AS n_clicks
        |  PATTERN (C{2,} E)
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    import graft.operators.MatchRecognize
    import MatchRecognize.Pat._
    implicit val enc: org.apache.spark.sql.Encoder[Out] =
      org.apache.spark.sql.Encoders.product[Out]
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val viaApi = MatchRecognize.matchRecognize[Out](
      ev,
      partitionKey = _.getAs[Long]("user_id"),
      orderKey = r => {
        val t = r.getAs[java.sql.Timestamp]("ts")
        ((t.getTime / 1000L) * 1000000L + t.getNanos / 1000L, r.getAs[Long]("event_id"))
      },
      pattern = Cat(Seq(atLeast(Sym("C"), 2), Sym("E"))),
      defines = Map(
        "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
        "E" -> ((r, _) => r.getAs[String]("event_type") == "error")),
      measure = (key, m) => Out(key, m.head._1.getAs[Long]("event_id"),
        m.last._1.getAs[Long]("event_id"), m.count(_._2 == "C").toLong)
    ).collect().map(o => (o.user_id, o.first_id, o.last_id, o.n_clicks)).toSet

    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("ALL ROWS PER MATCH emits per-row CLASSIFIER/MATCH_NUMBER plus input columns") {
    import graft.operators.MatchRecognize
    import MatchRecognize.{Pat, Skip}
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES MATCH_NUMBER() AS mn, CLASSIFIER() AS cls
        |  ALL ROWS PER MATCH
        |  PATTERN (C{2,} E)
        |  DEFINE C AS event_type = 'click', E AS event_type = 'error')"""
        .stripMargin)
    // schema: user_id, mn, cls, then the non-partition input columns
    assert(viaSql.columns.take(3).toSeq == Seq("user_id", "mn", "cls"))
    val got = viaSql.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getAs[Long]("event_id"))).toSet
    // API equivalent through matchRecognizeAllRows
    implicit val enc: org.apache.spark.sql.Encoder[(Long, Long, String, Long)] =
      org.apache.spark.sql.Encoders.product[(Long, Long, String, Long)]
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "ts")
    val viaApi = MatchRecognize.matchRecognizeAllRows[(Long, Long, String, Long)](
      ev,
      partitionKey = _.getAs[Long]("user_id"),
      orderKey = r => {
        val t = r.getAs[java.sql.Timestamp]("ts")
        ((t.getTime / 1000L) * 1000000L + t.getNanos / 1000L, r.getAs[Long]("event_id"))
      },
      pattern = Pat.Cat(Seq(Pat.atLeast(Pat.Sym("C"), 2), Pat.Sym("E"))),
      defines = Map(
        "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
        "E" -> ((r, _) => r.getAs[String]("event_type") == "error")),
      skip = Skip.PastLastRow,
      emit = (key, mn, _, row, sym) =>
        (key, mn.toLong, sym, row.getAs[Long]("event_id"))
    ).collect().toSet
    assert(got == viaApi)
    assert(got.nonEmpty)
    // aggregate measures are rejected in ALL ROWS mode (falls through to
    // the delegate parser, which raises its own parse error)
    intercept[Exception] {
      spark.sql(
        """SELECT * FROM events MATCH_RECOGNIZE (
          |  PARTITION BY user_id ORDER BY ts, event_id
          |  MEASURES COUNT(*) AS c
          |  ALL ROWS PER MATCH
          |  PATTERN (C{2,} E)
          |  DEFINE C AS event_type = 'click', E AS event_type = 'error')"""
          .stripMargin).collect()
    }
  }

  test("the reference's canonical ticker query runs verbatim (var measures + SKIP TO LAST)") {
    // match.iq:164-180 (the SQL:2016 flagship example), adapted only in
    // table/column names: events(value) for ticker(price), ts for tstamp
    Tables.registerAll(spark, sfDir)
    val got = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES STRT.event_id AS start_id,
        |           LAST(DOWN.event_id) AS bottom_id,
        |           LAST(UP.event_id) AS end_id
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO LAST UP
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value))"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // cross-check start/end against the oracle-verified registry query
    val want = graft.SparkEntry.queries("match_recognize_skip_to_last")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_id"),
        r.getAs[Long]("end_id"))).toSet
    assert(got.map(t => (t._1, t._2, t._4)) == want)
    // the bottom is strictly between start and end in event order per
    // construction of the V
    assert(got.forall(t => t._3 > t._2 && t._3 < t._4))
    assert(got.nonEmpty)
  }

  test("SKIP TO target is case-insensitive against pattern variables (ADVICE r5)") {
    // 'skip to last up' in lowercase must hit PATTERN (... UP ...): the
    // whole grammar is case-insensitive, and varAnchor used to compare the
    // skip target case-sensitively → IllegalStateException at runtime
    Tables.registerAll(spark, sfDir)
    val got = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES STRT.event_id AS start_id, LAST(up.event_id) AS end_id
        |  ONE ROW PER MATCH
        |  after match skip to last up
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value))"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = graft.SparkEntry.queries("match_recognize_skip_to_last")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_id"),
        r.getAs[Long]("end_id"))).toSet
    assert(got == want && got.nonEmpty)
    // lowercase SUBSET name in the skip target resolves too
    val sub = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(*) AS len, LAST(w.event_id) AS end_id
        |  AFTER MATCH SKIP TO LAST w
        |  PATTERN (STRT DOWN+ UP+)
        |  SUBSET W = (DOWN, UP)
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value))"""
        .stripMargin).collect()
    assert(sub.nonEmpty)
  }

  test("SUBSET union variables resolve in measures and skip targets") {
    Tables.registerAll(spark, sfDir)
    // W = (DOWN, UP): the whole movement; COUNT(W.*) excludes only STRT
    val got = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(*) AS len, COUNT(W.*) AS moves,
        |           LAST(W.event_id) AS end_id
        |  AFTER MATCH SKIP TO LAST W
        |  PATTERN (STRT DOWN+ UP+)
        |  SUBSET W = (DOWN, UP)
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value))"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // the subset covers every row but STRT, and its LAST row is the match
    // end, so SKIP TO LAST W ≡ SKIP TO LAST UP — equal to the registry query
    assert(got.forall(t => t._3 == t._2 - 1))
    val want = graft.SparkEntry.queries("match_recognize_skip_to_last")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("len"),
        r.getAs[Long]("end_id"))).toSet
    assert(got.map(t => (t._1, t._2, t._4)).toSet == want)
    assert(got.nonEmpty)
  }

  test("AFTER MATCH SKIP clause parses and lowers (ticker shape via SQL)") {
    import graft.operators.MatchRecognize.Skip
    assert(MatchRecognizeSql.parseSkip("PAST LAST ROW") == Skip.PastLastRow)
    assert(MatchRecognizeSql.parseSkip("TO NEXT ROW") == Skip.ToNextRow)
    assert(MatchRecognizeSql.parseSkip("TO LAST UP") == Skip.ToLast("UP"))
    assert(MatchRecognizeSql.parseSkip("TO FIRST DOWN") == Skip.ToFirst("DOWN"))
    // unquoted identifiers normalize to upper case (Calcite semantics)
    assert(MatchRecognizeSql.parseSkip("to up") == Skip.ToLast("UP"))
    // the SQL form must agree with the registry's API-built ticker query
    Tables.registerAll(spark, sfDir)
    val viaSql = spark.sql(
      """SELECT * FROM events MATCH_RECOGNIZE (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  MEASURES COUNT(*) AS len, FIRST(event_id) AS start_id,
        |           LAST(event_id) AS end_id
        |  AFTER MATCH SKIP TO LAST UP
        |  PATTERN (STRT DOWN+ UP+)
        |  DEFINE DOWN AS value < PREV(value), UP AS value > PREV(value))"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaApi = graft.SparkEntry.queries("match_recognize_skip_to_last")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("len"),
        r.getAs[Long]("start_id"), r.getAs[Long]("end_id"))).toSet
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty)
  }

  test("WITHIN bounds the match span (SqlMatchRecognize interval operand)") {
    import graft.plans.MatchRecognizeSql
    // unit conversions to micros
    assert(MatchRecognizeSql.parseWithin("90", "SECOND") == 90L * 1000000L)
    assert(MatchRecognizeSql.parseWithin("4", "hour") == 4L * 3600L * 1000000L)
    assert(MatchRecognizeSql.parseWithin("2", "DAY") == 2L * 86400L * 1000000L)
    intercept[IllegalArgumentException] {
      MatchRecognizeSql.parseWithin("1", "FORTNIGHT")
    }
    Tables.registerAll(spark, sfDir)
    def q(withinClause: String) = spark.sql(
      s"""SELECT * FROM events MATCH_RECOGNIZE (
         |  PARTITION BY user_id ORDER BY ts, event_id
         |  MEASURES COUNT(C.*) AS n_clicks, P.event_id AS purchase_id
         |  PATTERN (C+ P)
         |  $withinClause
         |  DEFINE C AS event_type = 'click', P AS event_type = 'purchase')"""
        .stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val bounded = q("WITHIN INTERVAL '4' HOUR")
    val unbounded = q("")
    assert(bounded.nonEmpty)
    assert(bounded.size < unbounded.size,
      "the 4h bound must reject some spans at this fixture's event spacing")
    // every bounded match's span is genuinely <= 4h, and each surviving
    // (user, purchase) keeps at most as many clicks as its unbounded twin
    val unboundedBy = unbounded.groupBy(t => (t._1, t._3))
    bounded.foreach { case (u, n, p) =>
      val twin = unboundedBy.get((u, p))
      assert(twin.exists(_.head._2 >= n), s"($u,$p): bounded n_clicks=$n")
    }
  }
}
