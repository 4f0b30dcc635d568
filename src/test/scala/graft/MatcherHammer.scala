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
  /** WITHIN × SKIP differential oracle: horizon-limited matching must
    * equal matching over the EXPLICIT region slice [i, h(i)) at every
    * anchor — "rows past the horizon are invisible to the attempt" is the
    * contract, and slice-matching is itself validated against the regex
    * reference by the base property. The AFTER MATCH advance (including
    * both SQL:2016 runtime errors) is re-implemented here independently
    * of the engine's `advance`. Returns Left(error) like the engine. */
  def refWithinSkip(rows: IndexedSeq[Row], p: Pat, ords: IndexedSeq[Long],
      w: Long, skip: MatchRecognize.Skip)
      : Either[String, List[IndexedSeq[(Row, String)]]] = {
    val out = List.newBuilder[IndexedSeq[(Row, String)]]
    var i = 0
    while (i < rows.length) {
      var h = i
      while (h < rows.length && ords(h) <= ords(i) + w) h += 1
      val slice = rows.slice(i, h)
      val anchored = MatchRecognize.findMatches(slice, p, defines)
        .headOption.filter(m => m.head._1 eq slice(0))
      anchored match {
        case Some(m) =>
          out += m
          val end = i + m.size
          val syms = m.map(_._2)
          skip match {
            case MatchRecognize.Skip.PastLastRow => i = end
            case MatchRecognize.Skip.ToNextRow => i += 1
            case MatchRecognize.Skip.ToFirst(v, ms) =>
              val js = (0 until m.size).filter { j =>
                val s0 = syms(j).stripPrefix("~")
                s0.equalsIgnoreCase(v) || ms.exists(_.equalsIgnoreCase(s0))
              }
              if (js.isEmpty) return Left("sql2016-skip-error")
              if (js.head == 0) return Left("sql2016-skip-error")
              i = i + js.head
            case MatchRecognize.Skip.ToLast(v, ms) =>
              val js = (0 until m.size).filter { j =>
                val s0 = syms(j).stripPrefix("~")
                s0.equalsIgnoreCase(v) || ms.exists(_.equalsIgnoreCase(s0))
              }
              if (js.isEmpty) return Left("sql2016-skip-error")
              if (js.last == 0) return Left("sql2016-skip-error")
              i = i + js.last
          }
        case None => i += 1
      }
    }
    Right(out.result())
  }

  def main(args: Array[String]): Unit = {
    val r = new Random(12345)
    var bad = 0
    val iters = args.headOption.map(_.toInt).getOrElse(2000000)
    for (iter <- 1 to iters) {
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
      // WITHIN × SKIP (r7 ask #8): horizon-limited matching under ALL
      // FOUR skip modes against the slice-differential oracle, with
      // non-uniform ord gaps so the horizon cut is a real time bound,
      // not an index offset
      if (s.nonEmpty) {
        val ords: IndexedSeq[Long] = {
          var t = 0L
          s.map { _ => t += r.nextInt(3); t }.toIndexedSeq
        }
        val w = r.nextInt(5).toLong
        val ordOf: Row => Long = row => ords(rows.indexWhere(_ eq row))
        val skips: Seq[MatchRecognize.Skip] = Seq(
          MatchRecognize.Skip.PastLastRow, MatchRecognize.Skip.ToNextRow,
          MatchRecognize.Skip.ToFirst(tv), MatchRecognize.Skip.ToLast(tv))
        for (sk <- skips) {
          val gotO = outcome(MatchRecognize
            .findMatches(rows, p, defines, sk, within = Some(w), ordOf = ordOf)
            .map(_.map(_._2)))
          val wantO = refWithinSkip(rows, p, ords, w, sk) match {
            case Left(e) => Left(e)
            case Right(ms) => Right(ms.map(_.map(_._2)))
          }
          if (gotO != wantO) {
            bad += 1
            if (bad <= 5) println(
              s"WITHIN-SKIP MISMATCH skip=$sk w=$w pat=$p s='$s' ords=$ords got=$gotO want=$wantO")
          }
          // streaming split × WITHIN × skip: stream + batch-of-carried
          // must equal batch (outcome-compared, errors included)
          val streamO = outcome {
            val (m1, retain1) = MatchRecognize.findMatchesStreaming(
              rows.take(cut), p, defines, sk, within = Some(w),
              ordOf = ordOf)
            val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
            val m2 = MatchRecognize.findMatches(carried, p, defines, sk,
              within = Some(w), ordOf = ordOf)
            (m1 ++ m2).map(_.map(_._2))
          }
          if (streamO != gotO) {
            bad += 1
            if (bad <= 5) println(
              s"WITHIN-SKIP STREAM MISMATCH skip=$sk w=$w pat=$p s='$s' cut=$cut got=$streamO want=$gotO")
          }
        }
      }
      if (iter % math.max(1, iters / 4) == 0) println(s"$iter iters, $bad bad")
      if (bad > 5) sys.exit(1)
    }
    println(s"done, $bad bad")
  }
}
