package graft
import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.Pat
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import scala.util.Random

object MatcherHammer {
  val schema = StructType(Seq(StructField("v", StringType)))
  def rowsOf(s: String): IndexedSeq[Row] =
    s.map(c => new GenericRowWithSchema(Array(c.toString), schema): Row).toIndexedSeq
  val defines: Map[String, MatchRecognize.Define] = Map(
    "A" -> ((r, _) => r.getAs[String]("v") == "a"),
    "B" -> ((r, _) => r.getAs[String]("v") == "b"),
    "C" -> ((r, _) => r.getAs[String]("v") == "c"))
  def toRegex(p: Pat): String = p match {
    case Pat.Sym(n) => n.toLowerCase
    case Pat.Cat(ps) => ps.map(q => s"(?:${toRegex(q)})").mkString
    case Pat.Alt(ps) => ps.map(q => s"(?:${toRegex(q)})").mkString("(?:", "|", ")")
    case Pat.Rep(q, min, -1, g) =>
      s"(?:${toRegex(q)}){$min,}" + (if (g) "" else "?")
    case Pat.Rep(q, min, max, g) =>
      s"(?:${toRegex(q)}){$min,$max}" + (if (g) "" else "?")
    // exclusion changes OUTPUT marking only, never acceptance
    case Pat.Excl(q) => s"(?:${toRegex(q)})"
  }
  def referenceSpans(s: String, p: Pat): Seq[(Int, Int)] = {
    val re = toRegex(p).r.pattern
    val out = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < s.length) {
      val m = re.matcher(s); m.region(i, s.length)
      if (m.lookingAt() && m.end() > i) { out += ((i, m.end())); i = m.end() }
      else i += 1
    }
    out.result()
  }
  def gotSpans(s: String, p: Pat): List[(Int,Int)] = {
    val rows = rowsOf(s)
    var spans = List.empty[(Int, Int)]
    var consumed = 0
    MatchRecognize.findMatches(rows, p, defines).foreach { m =>
      val start = rows.indexWhere(_ eq m.head._1, consumed)
      spans :+= ((start, start + m.size))
      consumed = start + m.size
    }
    spans
  }
  def genPat(r: Random, depth: Int): Pat =
    if (depth <= 0) Pat.Sym(Seq("A","B","C")(r.nextInt(3)))
    else r.nextInt(10) match {
      case 0|1|2 => Pat.Sym(Seq("A","B","C")(r.nextInt(3)))
      case 3|4 => Pat.Cat(Seq(genPat(r, depth-1), genPat(r, depth-1)))
      case 5|6 => Pat.Alt(Seq(genPat(r, depth-1), genPat(r, depth-1)))
      case 9 => Pat.Excl(genPat(r, depth-1))
      case _ =>
        val min = r.nextInt(3)
        val max = Seq(-1, math.max(min,1), 3)(r.nextInt(3))
        Pat.Rep(genPat(r, depth-1), min,
          if (max != -1 && max < min) min else max,
          greedy = r.nextBoolean())
    }
  def main(args: Array[String]): Unit = {
    val r = new Random(12345)
    var bad = 0
    for (iter <- 1 to 2000000) {
      val p = genPat(r, 3)
      val n = r.nextInt(13)
      val s = (1 to n).map(_ => "abc"(r.nextInt(3))).mkString
      // batch property
      val want = referenceSpans(s, p).toList
      val got = gotSpans(s, p)
      if (got != want) {
        bad += 1
        if (bad <= 5) println(s"BATCH MISMATCH pat=$p regex=${toRegex(p)} s='$s' got=$got want=$want")
      }
      // exclusion property: `{- p -}` must change ONLY the classifier
      // markers — stripping every Excl node from the pattern must yield
      // identical spans AND identical classifiers modulo the "~" marker
      // (pins the exclDepth save/restore bookkeeping under backtracking,
      // which the regex oracle cannot see)
      def stripExcl(q: Pat): Pat = q match {
        case Pat.Excl(inner) => stripExcl(inner)
        case Pat.Cat(ps) => Pat.Cat(ps.map(stripExcl))
        case Pat.Alt(ps) => Pat.Alt(ps.map(stripExcl))
        case rep: Pat.Rep => rep.copy(p = stripExcl(rep.p))
        case sym => sym
      }
      val stripped = stripExcl(p)
      if (stripped != p) {
        val withMarks = MatchRecognize.findMatches(rowsOf(s), p, defines)
          .map(_.map(t => t._2.stripPrefix("~")))
        val without = MatchRecognize.findMatches(rowsOf(s), stripped, defines)
          .map(_.map(_._2))
        if (withMarks != without) {
          bad += 1
          if (bad <= 5) println(s"EXCL MISMATCH pat=$p s='$s' got=$withMarks want=$without")
        }
      }
      // streaming property — for the default skip AND the overlapping
      // ToNextRow mode (anchoring inside emitted matches must retain the
      // right buffer suffix)
      val cut = r.nextInt(s.length + 1)
      val rows = rowsOf(s)
      for (sk <- Seq(MatchRecognize.Skip.PastLastRow: MatchRecognize.Skip,
          MatchRecognize.Skip.ToNextRow)) {
        val batch = MatchRecognize.findMatches(rows, p, defines, sk).map(_.map(_._2))
        val (m1, retain1) =
          MatchRecognize.findMatchesStreaming(rows.take(cut), p, defines, sk)
        val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
        val m2 = MatchRecognize.findMatches(carried, p, defines, sk)
        if ((m1.map(_.map(_._2)) ++ m2.map(_.map(_._2))) != batch) {
          bad += 1
          if (bad <= 5) println(s"STREAM MISMATCH skip=$sk pat=$p s='$s' cut=$cut")
        }
      }
      // streaming property for SKIP TO FIRST/LAST <var> (r5 ADVICE): the
      // retention interaction is compared differentially against batch,
      // with the SQL:2016 runtime errors (variable matched no row /
      // non-advancing target) treated as part of the compared OUTCOME —
      // both sides must either produce the same matches or both raise.
      def symsOf(q: Pat): Seq[String] = q match {
        case Pat.Sym(nm) => Seq(nm)
        case Pat.Cat(ps) => ps.flatMap(symsOf)
        case Pat.Alt(ps) => ps.flatMap(symsOf)
        case rep: Pat.Rep => symsOf(rep.p)
        case Pat.Excl(inner) => symsOf(inner)
      }
      val targets = symsOf(p).distinct
      val tv = targets(r.nextInt(targets.size))
      def outcome(f: => Seq[Seq[String]]): Either[String, Seq[Seq[String]]] =
        try Right(f) catch { case _: IllegalStateException => Left("sql2016-skip-error") }
      for (sk <- Seq(MatchRecognize.Skip.ToFirst(tv): MatchRecognize.Skip,
          MatchRecognize.Skip.ToLast(tv))) {
        val batchO = outcome(
          MatchRecognize.findMatches(rows, p, defines, sk).map(_.map(_._2)))
        val streamO = outcome {
          val (m1, retain1) =
            MatchRecognize.findMatchesStreaming(rows.take(cut), p, defines, sk)
          val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
          val m2 = MatchRecognize.findMatches(carried, p, defines, sk)
          (m1 ++ m2).map(_.map(_._2))
        }
        if (batchO != streamO) {
          bad += 1
          if (bad <= 5) println(s"STREAM-SKIPVAR MISMATCH skip=$sk pat=$p s='$s' cut=$cut got=$streamO want=$batchO")
        }
      }
      if (iter % 500000 == 0) println(s"$iter iters, $bad bad")
      if (bad > 5) sys.exit(1)
    }
    println(s"done, $bad bad")
  }
}
