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
class CustomOpsSpec extends AnyFunSuite {
  import SparkTestSession._

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
}
