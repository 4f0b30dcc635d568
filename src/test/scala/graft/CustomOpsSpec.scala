package graft

import graft.operators.{AsOf, MatchRecognize, Recursive}
import graft.operators.MatchRecognize.Pat
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Unit-level semantics for the custom operators (the parts Spark doesn't
  * provide): greedy pattern matcher, repeat-union fixpoint, as-of join
  * tie-handling. Mirrors the reference's operator tests
  * (reference: core/src/test/java/org/apache/calcite/test/enumerable/
  * EnumerableRepeatUnionTest.java, EnumerableMatchTest). */
object CustomOpsSpec {
  final case class M(user_id: Long, match_no: Int, idx: Int,
      event_id: Long, classifier: String)
}

class CustomOpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import CustomOpsSpec.M

  private val schema = StructType(Seq(
    StructField("v", StringType), StructField("x", DoubleType)))
  private def rows(vs: (String, Double)*): IndexedSeq[Row] =
    vs.toIndexedSeq.map { case (a, b) => new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(Array(a, b), schema): Row }
  private def sym(name: String, want: String): (String, MatchRecognize.Define) =
    name -> ((r: Row, _: Option[Row]) => r.getAs[String]("v") == want)

  test("matcher: greedy plus consumes maximal run") {
    val rs = rows("a" -> 1, "a" -> 2, "a" -> 3, "b" -> 4)
    val m = MatchRecognize.findMatches(rs,
      Pat.Cat(Seq(Pat.plus(Pat.Sym("A")), Pat.Sym("B"))),
      Map(sym("A", "a"), sym("B", "b")))
    assert(m.size == 1)
    assert(m.head.map(_._2) == Seq("A", "A", "A", "B"))
  }

  test("matcher: skip past last row yields non-overlapping matches") {
    val rs = rows("a" -> 1, "b" -> 2, "a" -> 3, "b" -> 4)
    val m = MatchRecognize.findMatches(rs,
      Pat.Cat(Seq(Pat.Sym("A"), Pat.Sym("B"))),
      Map(sym("A", "a"), sym("B", "b")))
    assert(m.size == 2)
  }

  test("matcher: SKIP TO NEXT ROW yields overlapping matches") {
    // a a b: PAST LAST ROW finds one A+B match; TO NEXT ROW also finds the
    // suffix match anchored at the second 'a'
    val rs = rows("a" -> 1, "a" -> 2, "b" -> 3)
    val pat = Pat.Cat(Seq(Pat.plus(Pat.Sym("A")), Pat.Sym("B")))
    val defs = Map(sym("A", "a"), sym("B", "b"))
    assert(MatchRecognize.findMatches(rs, pat, defs).size == 1)
    val overlapping = MatchRecognize.findMatches(rs, pat, defs,
      MatchRecognize.Skip.ToNextRow)
    assert(overlapping.size == 2)
    assert(overlapping.map(_.length) == Seq(3, 2))
  }

  test("ALL ROWS PER MATCH emits one row per matched input row with classifier") {
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, sfDir, "events")
      .select("user_id", "event_id", "event_type", "ts")
    implicit val enc: org.apache.spark.sql.Encoder[M] =
      org.apache.spark.sql.Encoders.product[M]
    import MatchRecognize.Pat._
    val pattern = Cat(Seq(atLeast(Sym("C"), 3), Sym("P")))
    val defines: Map[String, MatchRecognize.Define] = Map(
      "C" -> ((r, _) => r.getAs[String]("event_type") == "click"),
      "P" -> ((r, _) => r.getAs[String]("event_type") == "purchase"))
    def micros(r: org.apache.spark.sql.Row) = {
      val t = r.getAs[java.sql.Timestamp]("ts")
      ((t.getTime / 1000L) * 1000000L + t.getNanos / 1000L, r.getAs[Long]("event_id"))
    }
    val allRows = MatchRecognize.matchRecognizeAllRows[M](
      ev, _.getAs[Long]("user_id"), micros, pattern, defines,
      emit = (key, mNo, idx, row, cls) =>
        M(key, mNo, idx, row.getAs[Long]("event_id"), cls)).collect()
    // consistency with ONE ROW PER MATCH: per-match row count equals the
    // one-row query's n_clicks + 1, classifiers follow the pattern
    val oneRow = SparkEntry.queries("match_recognize_runs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
    val byMatch = allRows.groupBy(m => (m.user_id, m.match_no))
    assert(byMatch.nonEmpty)
    byMatch.foreach { case ((uid, _), ms) =>
      val sorted = ms.sortBy(_.idx)
      assert(sorted.init.forall(_.classifier == "C"))
      assert(sorted.last.classifier == "P")
      assert(sorted.length >= 4)
    }
    // total matched rows = Σ (n_clicks + 1) over the one-row results
    val expectedRows = oneRow.values.flatten.map(_._2 + 1).sum
    assert(allRows.length.toLong == expectedRows)
  }

  test("matcher: bounded repetition {2,3} is greedy but capped") {
    val rs = rows("a" -> 1, "a" -> 2, "a" -> 3, "a" -> 4, "b" -> 5)
    val m = MatchRecognize.findMatches(rs,
      Pat.Cat(Seq(Pat.Rep(Pat.Sym("A"), 2, 3), Pat.Sym("B"))),
      Map(sym("A", "a"), sym("B", "b")))
    // greedy: 3 a's max, but match must end with b ⇒ starts at index 1
    assert(m.size == 1)
    assert(m.head.size == 4)
  }

  test("matcher: alternation picks whichever branch fits") {
    val rs = rows("c" -> 1, "b" -> 2)
    val m = MatchRecognize.findMatches(rs,
      Pat.Cat(Seq(Pat.Alt(Seq(Pat.Sym("A"), Pat.Sym("C"))), Pat.Sym("B"))),
      Map(sym("A", "a"), sym("B", "b"), sym("C", "c")))
    assert(m.size == 1 && m.head.map(_._2) == Seq("C", "B"))
  }

  test("matcher: AFTER MATCH SKIP TO LAST shares the peak between V-shapes (ticker shape)") {
    // W: 10 9 8 9 10 8 7 9 — two V-shapes sharing nothing but the peak row
    val rs = rows("x" -> 10, "x" -> 9, "x" -> 8, "x" -> 9, "x" -> 10,
      "x" -> 8, "x" -> 7, "x" -> 9)
    val down: MatchRecognize.Define =
      (r, p) => p.exists(pr => r.getAs[Double]("x") < pr.getAs[Double]("x"))
    val up: MatchRecognize.Define =
      (r, p) => p.exists(pr => r.getAs[Double]("x") > pr.getAs[Double]("x"))
    val pat = Pat.Cat(Seq(Pat.Sym("STRT"), Pat.plus(Pat.Sym("DOWN")),
      Pat.plus(Pat.Sym("UP"))))
    val defs = Map("DOWN" -> down, "UP" -> up)
    // SKIP TO LAST UP: the second match STARTS at the first match's peak
    val toLast = MatchRecognize.findMatches(rs, pat, defs,
      MatchRecognize.Skip.ToLast("UP"))
    assert(toLast.map(m => (m.head._1.getAs[Double]("x"), m.size))
      == Seq((10.0, 5), (10.0, 4)))
    // PAST LAST ROW anchors after the peak: the second V loses its STRT
    // row to the first match and shifts
    val pastLast = MatchRecognize.findMatches(rs, pat, defs,
      MatchRecognize.Skip.PastLastRow)
    assert(pastLast.map(m => (m.head._1.getAs[Double]("x"), m.size))
      == Seq((10.0, 5), (8.0, 3)))
    // SKIP TO FIRST DOWN from the first match would target row 1 > 0: legal,
    // overlapping restart inside the first decline
    val toFirst = MatchRecognize.findMatches(rs, pat, defs,
      MatchRecognize.Skip.ToFirst("DOWN"))
    assert(toFirst.head.size == 5 &&
      toFirst(1).head._1.getAs[Double]("x") == 9.0)
    // unmatched skip variable is the SQL:2016 runtime error
    val e = intercept[IllegalStateException] {
      MatchRecognize.findMatches(rs, pat, defs,
        MatchRecognize.Skip.ToLast("NOPE"))
    }
    assert(e.getMessage.contains("matched no row"))
  }

  test("matcher: PREV-style define sees previous row") {
    val rs = rows("x" -> 5, "x" -> 3, "x" -> 1, "x" -> 4)
    val down: MatchRecognize.Define =
      (r, p) => p.exists(pr => r.getAs[Double]("x") < pr.getAs[Double]("x"))
    val up: MatchRecognize.Define =
      (r, p) => p.exists(pr => r.getAs[Double]("x") > pr.getAs[Double]("x"))
    val m = MatchRecognize.findMatches(rs,
      Pat.Cat(Seq(Pat.plus(Pat.Sym("D")), Pat.plus(Pat.Sym("U")))),
      Map("D" -> down, "U" -> up))
    assert(m.size == 1)
    assert(m.head.map(_._2) == Seq("D", "D", "U"))
  }

  test("repeatUnion: converges and deduplicates") {
    val s = spark
    import s.implicits._
    val out = Recursive.repeatUnion(
      Seq(1).toDF("n"),
      d => d.where(col("n") < 10).select((col("n") + 1).as("n")))
    assert(out.as[Int].collect().sorted.toSeq == (1 to 10))
  }

  test("repeatUnion: respects maxIter") {
    val s = spark
    import s.implicits._
    val out = Recursive.repeatUnion(
      Seq(0).toDF("n"),
      d => d.select((col("n") + 1).as("n")),
      maxIter = 3)
    assert(out.count() == 4) // seed + 3 iterations
  }

  test("asofJoin: strict inequality and latest-wins") {
    val s = spark
    import s.implicits._
    val probe = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "t", "tag")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("tag"))
    val build = Seq((1L, 100L, 10.0), (1L, 150L, 20.0), (2L, 60L, 30.0))
      .toDF("k", "t", "v")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("v"),
        monotonically_increasing_id().as("id"))
    val out = AsOf.asofJoin(probe, build,
      probeKey = col("k"), buildKey = col("k"),
      probeTime = col("t"), buildTime = col("t"),
      buildCols = Seq("v"), tieBreak = col("id"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("p1").isEmpty)        // build at t=100 NOT matched (strict <)
    assert(out("p2").contains(20.0)) // latest earlier build wins
    assert(out("p3").isEmpty)        // build at t=60 is after probe t=50
  }

  test("ctx defines: COUNT(B.*) <= k is equivalent to B{0,k} (20k differential)") {
    // A running COUNT bound in DEFINE must coincide with the same bound
    // expressed structurally as a quantifier — a self-differential that
    // exercises the DefineCtx path against the plain backtracking path
    // across random inputs, bounds and skip modes.
    val rnd = new scala.util.Random(0xBEEF)
    val aDef = sym("A", "a")
    val bPlain = sym("B", "b")
    for (_ <- 1 to 20000) {
      val k = 1 + rnd.nextInt(4)
      val n = rnd.nextInt(12)
      val s = (1 to n).map(_ => "ab" (rnd.nextInt(2))).mkString
      val rs = rows(s.map(c => c.toString -> 1.0): _*)
      val skip = Seq(MatchRecognize.Skip.PastLastRow,
        MatchRecognize.Skip.ToNextRow)(rnd.nextInt(2))
      val viaCtx = MatchRecognize.findMatches(rs,
        Pat.Cat(Seq(Pat.Sym("A"), Pat.star(Pat.Sym("B")))),
        Map(aDef), skip,
        ctxDefines = Map("B" -> ((r: Row, _: Option[Row],
            p: MatchRecognize.Partial, _: String) =>
          r.getAs[String]("v") == "b" && p.rowsOf("B").size + 1 <= k)))
        .map(_.map(_._2))
      val viaPattern = MatchRecognize.findMatches(rs,
        Pat.Cat(Seq(Pat.Sym("A"), Pat.Rep(Pat.Sym("B"), 0, k))),
        Map(aDef, bPlain), skip).map(_.map(_._2))
      assert(viaCtx == viaPattern, s"k=$k s='$s' skip=$skip")
    }
  }

  test("ctx defines: streaming prefix equivalence (10k differential)") {
    // The hammer's streaming property applied to the DefineCtx path: a
    // cut anywhere in the input, with the retained suffix re-fed, must
    // reproduce the batch matches exactly — the running-aggregate state
    // is part of no persisted state (it derives from the retained rows),
    // so retention alone must suffice.
    val rnd = new scala.util.Random(0xFACE)
    val aDef = sym("A", "a")
    for (_ <- 1 to 10000) {
      val k = 1 + rnd.nextInt(3)
      val n = rnd.nextInt(11)
      val s = (1 to n).map(_ => "ab" (rnd.nextInt(2))).mkString
      val rs = rows(s.map(c => c.toString -> 1.0): _*)
      val cut = rnd.nextInt(s.length + 1)
      val pat = Pat.Cat(Seq(Pat.Sym("A"), Pat.star(Pat.Sym("B"))))
      val ctx = Map("B" -> ((r: Row, _: Option[Row],
          p: MatchRecognize.Partial, _: String) =>
        r.getAs[String]("v") == "b" && p.rowsOf("B").size + 1 <= k))
      val batch = MatchRecognize.findMatches(rs, pat, Map(aDef),
        ctxDefines = ctx).map(_.map(_._2))
      val (m1, retain) = MatchRecognize.findMatchesStreaming(
        rs.take(cut), pat, Map(aDef), ctxDefines = ctx)
      val carried = rs.take(cut).drop(retain) ++ rs.drop(cut)
      val m2 = MatchRecognize.findMatches(carried, pat, Map(aDef),
        ctxDefines = ctx)
      assert((m1.map(_.map(_._2)) ++ m2.map(_.map(_._2))) == batch,
        s"k=$k s='$s' cut=$cut")
    }
  }
}
