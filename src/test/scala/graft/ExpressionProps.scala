package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks of the native Catalyst expressions against
  * independent reference implementations — interpreted-eval level, no
  * Spark session needed, thousands of cases per run (the reference
  * project's fuzzer strategy, RexProgramFuzzyTest.java).
  *
  * The codegen paths are separately asserted bit-equal to the interpreted
  * paths in ExpressionSpec; these properties pin the interpreted semantics
  * themselves.
  */
object ExpressionProps extends Properties("graft.expressions") {

  import org.apache.spark.sql.catalyst.util.ArrayData
  import org.apache.spark.sql.catalyst.expressions.Literal

  // ---- IntersectSizeSorted == set intersection cardinality ---------------
  private val sortedDistinctArr: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted.toArray)

  property("intersect_size_sorted == |A ∩ B|") =
    forAll(sortedDistinctArr, sortedDistinctArr) { (a, b) =>
      val expr = graft.functions.IntersectSizeSorted(
        Literal.create(a, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
        Literal.create(b, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
      val got = expr.nullSafeEval(
        ArrayData.toArrayData(a), ArrayData.toArrayData(b)).asInstanceOf[Int]
      got == a.toSet.intersect(b.toSet).size
    }

  // ---- RayCastContains == reference winding test -------------------------
  // Independent reference: the same even-odd rule written over BigDecimal
  // coordinates (no shared code, no double-division identity).
  private def refContains(xs: Array[Double], ys: Array[Double],
      px: Double, py: Double): Boolean = {
    val n = xs.length
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val yi = BigDecimal(ys(i)); val yj = BigDecimal(ys(j))
      val xi = BigDecimal(xs(i)); val xj = BigDecimal(xs(j))
      val p = BigDecimal(py)
      if ((yi > p) != (yj > p)) {
        // px < xi + (xj-xi)(py-yi)/(yj-yi), cross-multiplied to avoid
        // division (sign of (yj-yi) flips the inequality)
        val lhs = (BigDecimal(px) - xi) * (yj - yi)
        val rhs = (xj - xi) * (p - yi)
        if ((yj - yi).signum > 0) { if (lhs < rhs) inside = !inside }
        else { if (lhs > rhs) inside = !inside }
      }
      j = i; i += 1
    }
    inside
  }

  // half-integer coordinates: no point ever sits ON a polygon edge, and
  // the double arithmetic in the expression is exact, so the BigDecimal
  // reference and the production double path must agree exactly
  private val coord: Gen[Double] = Gen.chooseNum(-8, 8).map(_ + 0.5)
  private val ring: Gen[(Array[Double], Array[Double])] = for {
    n <- Gen.chooseNum(3, 8)
    xs <- Gen.listOfN(n, Gen.chooseNum(-8, 8).map(_.toDouble))
    ys <- Gen.listOfN(n, Gen.chooseNum(-8, 8).map(_.toDouble))
  } yield (xs.toArray, ys.toArray)

  property("ray-cast containment == BigDecimal reference") =
    forAll(ring, coord, coord) { case ((xs, ys), px, py) =>
      val expr = graft.functions.RayCastContains(
        Literal.create(xs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        Literal.create(ys, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        Literal(px), Literal(py))
      val got = expr.nullSafeEval(
        ArrayData.toArrayData(xs), ArrayData.toArrayData(ys), px, py)
        .asInstanceOf[Boolean]
      got == refContains(xs, ys, px, py)
    }

  property("axis-aligned rectangle containment == box test") =
    forAll(coord, coord) { (px, py) =>
      val xs = Array(-3.0, 5.0, 5.0, -3.0)
      val ys = Array(-2.0, -2.0, 6.0, 6.0)
      val expr = graft.functions.RayCastContains(
        Literal.create(xs, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        Literal.create(ys, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)),
        Literal(px), Literal(py))
      val got = expr.nullSafeEval(
        ArrayData.toArrayData(xs), ArrayData.toArrayData(ys), px, py)
        .asInstanceOf[Boolean]
      got == (px > -3.0 && px < 5.0 && py > -2.0 && py < 6.0)
    }

  // ---- ShingleHashes: exact n-gram set semantics --------------------------
  // The packed-fmix64 hash is injective on <=4-char windows, so the hash
  // set must EQUAL the n-gram string set in size for every input — a
  // zero-collision guarantee, not a probabilistic one.
  private val anyText: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', 'ä', '中', '!'))).map(_.mkString)

  property("shingle_hashes size == distinct n-gram count, n in 1..4") =
    forAll(anyText, Gen.choose(1, 4)) { (s, n) =>
      val got = graft.functions.ShingleHashes
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), n)
        .numElements()
      val want = if (s.length < n) 0 else s.sliding(n).toSet.size
      got == want
    }

  property("shingle_hashes output is sorted and distinct") =
    forAll(anyText) { s =>
      val arr = graft.functions.ShingleHashes
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(s), 3)
        .toLongArray().toSeq
      arr == arr.sorted && arr.distinct == arr
    }

  // ---- SIMILAR TO translation: anchoring and wildcard laws ---------------
  private val simText: Gen[String] =
    Gen.listOf(Gen.oneOf('a', 'b', '.', 'x')).map(_.mkString)

  property("SIMILAR TO '%s%' == contains, '_'-pattern == length") =
    forAll(simText) { s =>
      val contains = s.matches(graft.operators.Extras.similarToRegex("%b%"))
      val byLen = s.matches(graft.operators.Extras.similarToRegex("_" * s.length))
      contains == s.contains('b') && (byLen == s.nonEmpty || s.isEmpty && byLen)
    }
}
