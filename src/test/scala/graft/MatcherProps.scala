package graft

import graft.operators.MatchRecognize
import graft.operators.MatchRecognize.Pat
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based check of the MATCH_RECOGNIZE matcher against an
  * independent reference implementation (java.util.regex anchored
  * preferred-match scanning) — the reference project's fuzzing strategy
  * (reference: core/src/test/java/org/apache/calcite/test/fuzzer/
  * RexProgramFuzzyTest.java applies the same idea to the simplifier).
  *
  * Model: each row carries one symbol character; a Pat over symbols A/B/C
  * is equivalent to a regex over the induced character string. The matcher
  * must produce exactly the leftmost-PREFERRED non-overlapping spans that
  * java.util.regex `lookingAt` yields — SQL:2016 preference semantics
  * (ordered alternation, greedy quantifiers, first accepting path wins),
  * with an empty preferred match emitting nothing and advancing one row.
  */
object MatcherProps extends Properties("MatchRecognize.matcher") {

  private val schema = StructType(Seq(StructField("v", StringType)))
  private def rowsOf(s: String): IndexedSeq[Row] =
    s.map(c => new GenericRowWithSchema(Array(c.toString), schema): Row).toIndexedSeq

  private val defines: Map[String, MatchRecognize.Define] = Map(
    "A" -> ((r, _) => r.getAs[String]("v") == "a"),
    "B" -> ((r, _) => r.getAs[String]("v") == "b"),
    "C" -> ((r, _) => r.getAs[String]("v") == "c"))

  private def toRegex(p: Pat): String = p match {
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

  /** Reference scan: at each position, take java.util.regex's PREFERRED
    * anchored match (`lookingAt` — ordered alternation, greedy
    * quantifiers); skip past a non-empty match; advance one on an empty
    * match or no match. */
  private def referenceSpans(s: String, p: Pat): Seq[(Int, Int)] = {
    val re = toRegex(p).r.pattern
    val out = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < s.length) {
      val m = re.matcher(s)
      m.region(i, s.length)
      if (m.lookingAt() && m.end() > i) { out += ((i, m.end())); i = m.end() }
      else i += 1
    }
    out.result()
  }

  private val genSym: Gen[Pat] = Gen.oneOf("A", "B", "C").map(Pat.Sym.apply)
  private def genPat(depth: Int): Gen[Pat] =
    if (depth <= 0) genSym
    else Gen.frequency(
      3 -> genSym,
      2 -> Gen.listOfN(2, genPat(depth - 1)).map(Pat.Cat.apply),
      2 -> Gen.listOfN(2, genPat(depth - 1)).map(Pat.Alt.apply),
      1 -> genPat(depth - 1).map(Pat.Excl.apply),
      2 -> (for {
        inner <- genPat(depth - 1)
        min <- Gen.choose(0, 2)
        max <- Gen.oneOf(-1, math.max(min, 1), 3)
        greedy <- Gen.oneOf(true, false)
      } yield Pat.Rep(inner, min,
        if (max != -1 && max < min) min else max, greedy)))

  private val genInput: Gen[String] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  /** The VERDICT-r4 discriminating golden: where both alternatives accept,
    * the LEFT one wins even though the right is longer — SQL:2016
    * preferment, not POSIX-longest (a longest-matcher yields `A B` here). */
  property("PATTERN (A | A B) on 'ab' matches A alone") = {
    val p = Pat.Alt(Seq(Pat.Sym("A"), Pat.Cat(Seq(Pat.Sym("A"), Pat.Sym("B")))))
    val got = MatchRecognize.findMatches(rowsOf("ab"), p, defines).map(_.map(_._2))
    got == Seq(Seq("A"))
  }

  /** And the converse order prefers the longer alternative. */
  property("PATTERN (A B | A) on 'ab' matches A B") = {
    val p = Pat.Alt(Seq(Pat.Cat(Seq(Pat.Sym("A"), Pat.Sym("B"))), Pat.Sym("A")))
    val got = MatchRecognize.findMatches(rowsOf("ab"), p, defines).map(_.map(_._2))
    got == Seq(Seq("A", "B"))
  }

  property("matches equal regex leftmost-preferred non-overlapping spans") =
    forAll(genPat(3), genInput) { (p: Pat, s: String) =>
      val got = {
        val rows = rowsOf(s)
        var spans = List.empty[(Int, Int)]
        var consumed = 0
        MatchRecognize.findMatches(rows, p, defines).foreach { m =>
          // recover the span from row identity (rows are distinct objects)
          val start = rows.indexWhere(_ eq m.head._1, consumed)
          spans :+= ((start, start + m.size))
          consumed = start + m.size
        }
        spans
      }
      val want = referenceSpans(s, p).toList
      got == want
    }

  /** WITHIN differential: bounding an attempt to ord <= anchor.ord + w
    * (index ordering here) is EXACTLY java.util.regex scanning with each
    * region capped at i + w + 1 — the regex backtracks inside the
    * truncated region precisely like the horizon-limited matcher. */
  property("WITHIN horizon equals regex scanning over truncated regions") =
    forAll(genPat(3), genInput, Gen.choose(0, 6)) { (p: Pat, s: String, w: Int) =>
      val rows = rowsOf(s)
      val ordOf: Row => Long = r => rows.indexWhere(_ eq r).toLong
      val got = {
        var spans = List.empty[(Int, Int)]
        var consumed = 0
        MatchRecognize.findMatches(rows, p, defines,
          within = Some(w.toLong), ordOf = ordOf).foreach { m =>
          val start = rows.indexWhere(_ eq m.head._1, consumed)
          spans :+= ((start, start + m.size))
          consumed = start + m.size
        }
        spans
      }
      val want = {
        val re = toRegex(p).r.pattern
        val out = List.newBuilder[(Int, Int)]
        var i = 0
        while (i < s.length) {
          val m = re.matcher(s)
          m.region(i, math.min(s.length, i + w + 1))
          if (m.lookingAt() && m.end() > i) { out += ((i, m.end())); i = m.end() }
          else i += 1
        }
        out.result()
      }
      got == want
    }

  property("streaming split with WITHIN emits the same matches as batch") =
    forAll(genPat(2), genInput, Gen.choose(0, 12), Gen.choose(0, 6)) {
      (p: Pat, s: String, cutRaw: Int, w: Int) =>
        val cut = math.min(cutRaw, s.length)
        val rows = rowsOf(s)
        val ordOf: Row => Long = r => rows.indexWhere(_ eq r).toLong
        val batch = MatchRecognize.findMatches(rows, p, defines,
          within = Some(w.toLong), ordOf = ordOf).map(_.map(_._2))
        val (m1, retain1) = MatchRecognize.findMatchesStreaming(
          rows.take(cut), p, defines,
          within = Some(w.toLong), ordOf = ordOf)
        val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
        val m2 = MatchRecognize.findMatches(carried, p, defines,
          within = Some(w.toLong), ordOf = ordOf)
        (m1.map(_.map(_._2)) ++ m2.map(_.map(_._2))) == batch
    }

  /** WITHIN × SKIP (all four modes, r7 ask #8): horizon-limited matching
    * equals the slice-differential oracle (rows past the horizon are
    * invisible), with the SQL:2016 advance rules — including both runtime
    * errors — re-implemented independently in MatcherHammer.refWithinSkip.
    * Ords carry non-uniform gaps so the horizon is a real time bound. */
  property("WITHIN x all four SKIP modes equals the slice oracle") =
    forAll(genPat(3), genInput, Gen.choose(0, 4),
      Gen.listOfN(16, Gen.choose(0, 2))) { (p: Pat, s: String, w: Int, gaps: List[Int]) =>
      s.isEmpty || {
        val rows = MatcherHammer.rowsOf(s)
        val ords: IndexedSeq[Long] =
          gaps.take(s.length).padTo(s.length, 1).scanLeft(0L)(_ + _).tail.toIndexedSeq
        val ordOf: Row => Long = row => ords(rows.indexWhere(_ eq row))
        def symsOf(q: Pat): Seq[String] = q match {
          case Pat.Sym(nm) => Seq(nm)
          case Pat.Cat(ps) => ps.flatMap(symsOf)
          case Pat.Alt(ps) => ps.flatMap(symsOf)
          case rep: Pat.Rep => symsOf(rep.p)
          case Pat.Excl(inner) => symsOf(inner)
        }
        val tv = symsOf(p).head
        def outcome(f: => Seq[Seq[String]]): Either[String, Seq[Seq[String]]] =
          try Right(f) catch { case _: IllegalStateException => Left("sql2016-skip-error") }
        Seq[MatchRecognize.Skip](MatchRecognize.Skip.PastLastRow,
          MatchRecognize.Skip.ToNextRow, MatchRecognize.Skip.ToFirst(tv),
          MatchRecognize.Skip.ToLast(tv)).forall { sk =>
          val gotO = outcome(MatchRecognize.findMatches(rows, p,
            MatcherHammer.defines, sk, within = Some(w.toLong), ordOf = ordOf)
            .map(_.map(_._2)))
          val wantO = MatcherHammer.refWithinSkip(rows, p, ords, w.toLong, sk) match {
            case Left(e) => Left(e)
            case Right(ms) => Right(ms.map(_.map(_._2)))
          }
          val streamOk = {
            val cut = s.length / 2
            val streamO = outcome {
              val (m1, retain1) = MatchRecognize.findMatchesStreaming(
                rows.take(cut), p, MatcherHammer.defines, sk,
                within = Some(w.toLong), ordOf = ordOf)
              val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
              val m2 = MatchRecognize.findMatches(carried, p,
                MatcherHammer.defines, sk, within = Some(w.toLong), ordOf = ordOf)
              (m1 ++ m2).map(_.map(_._2))
            }
            streamO == gotO
          }
          gotO == wantO && streamOk
        }
      }
    }

  property("streaming split at any boundary emits the same matches") =
    forAll(genPat(2), genInput, Gen.choose(0, 12)) { (p: Pat, s: String, cutRaw: Int) =>
      val cut = math.min(cutRaw, s.length)
      val rows = rowsOf(s)
      // batch ground truth
      val batch = MatchRecognize.findMatches(rows, p, defines).map(_.map(_._2))
      // streaming: first chunk, retain buffer, then rest + flush semantics
      val (m1, retain1) = MatchRecognize.findMatchesStreaming(rows.take(cut), p, defines)
      val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
      // end-of-stream flush = batch semantics on the carried buffer
      val m2 = MatchRecognize.findMatches(carried, p, defines)
      (m1.map(_.map(_._2)) ++ m2.map(_.map(_._2))) == batch
    }

  // ---- NEXT lookahead navigation ------------------------------------------

  private val idxSchema = StructType(Seq(
    StructField("v", StringType),
    StructField("idx", org.apache.spark.sql.types.IntegerType)))
  private def idxRowsOf(s: String): IndexedSeq[Row] =
    s.zipWithIndex.map { case (c, i) =>
      new GenericRowWithSchema(Array(c.toString, i), idxSchema): Row
    }.toIndexedSeq
  private def spansOf(ms: Seq[IndexedSeq[(Row, String)]]): Seq[(Int, Int)] =
    ms.map(m => (m.head._1.getAs[Int]("idx"), m.last._1.getAs[Int]("idx") + 1))

  /** NEXT evaluated lazily inside the matcher must equal the same
    * condition precomputed as a plain per-row column — the lookahead
    * differential (there is no regex oracle for lookahead-defined
    * symbols, so the precomputation IS the reference). */
  property("NEXT(col, n) equals its precomputed-column twin") =
    forAll(genInput, Gen.choose(1, 3)) { (s: String, n: Int) =>
      val rows = idxRowsOf(s)
      val pat = Pat.Rep(Pat.Sym("N"), 1, -1)
      val nextCtx: Map[String, MatchRecognize.DefineCtx] = Map(
        "N" -> ((_, _, part, _) =>
          part.nextRow(n).exists(_.getAs[String]("v") == "a")))
      val got = spansOf(MatchRecognize.findMatches(
        rows, pat, Map.empty, ctxDefines = nextCtx))
      // twin: mark each position whose n-ahead char is 'a', plain define
      val marked = s.indices.map(i => if (i + n < s.length && s(i + n) == 'a') 'n' else 'x')
      val twinRows = idxRowsOf(marked.mkString)
      val twin = spansOf(MatchRecognize.findMatches(twinRows, pat,
        Map("N" -> ((r, _) => r.getAs[String]("v") == "n"))))
      got == twin
    }

  property("streaming split with NEXT lookahead emits the same matches") =
    forAll(genInput, Gen.choose(0, 12), Gen.choose(1, 3)) {
      (s: String, cutRaw: Int, n: Int) =>
        val cut = math.min(cutRaw, s.length)
        val rows = idxRowsOf(s)
        val pat = Pat.Rep(Pat.Sym("N"), 1, -1)
        val nextCtx: Map[String, MatchRecognize.DefineCtx] = Map(
          "N" -> ((_, _, part, _) =>
            part.nextRow(n).exists(_.getAs[String]("v") == "a")))
        val batch = spansOf(MatchRecognize.findMatches(
          rows, pat, Map.empty, ctxDefines = nextCtx))
        val (m1, retain1) = MatchRecognize.findMatchesStreaming(
          rows.take(cut), pat, Map.empty, ctxDefines = nextCtx)
        val carried = rows.take(cut).drop(retain1) ++ rows.drop(cut)
        val m2 = MatchRecognize.findMatches(
          carried, pat, Map.empty, ctxDefines = nextCtx)
        (spansOf(m1) ++ spansOf(m2)) == batch
    }
}
