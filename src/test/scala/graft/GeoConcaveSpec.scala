package graft

import graft.functions.PolyClip
import org.scalatest.funsuite.AnyFunSuite

/** Concave-lift kernels (r8 verdict #4): ear-clipping + Hertel–Mehlhorn
  * decomposition, iterated convex difference, disjoint union — the
  * exactness discipline is that piece areas SUM to the true area, pinned
  * here against shoelace/inclusion-exclusion closed forms. */
class GeoConcaveSpec extends AnyFunSuite {

  private def area(p: (Array[Double], Array[Double])): Double = {
    val (px, py) = p; var s = 0.0
    for (i <- px.indices) { val j = (i + 1) % px.length; s += px(i) * py(j) - px(j) * py(i) }
    s / 2
  }
  private def shoelace(xs: Array[Double], ys: Array[Double]): Double =
    math.abs(area((xs, ys)))

  // L = [0,w]×[0,h] minus the top-right notch [cx,w]×[cy,h]
  private def lShape(w: Double, h: Double, cx: Double, cy: Double) =
    (Array(0.0, w, w, cx, cx, 0), Array(0.0, 0, cy, cy, h, h))

  test("decomposition: convex parts, positive CCW areas, exact cover") {
    for ((w, h, cx, cy) <- Seq((4.0, 4.0, 1.0, 1.0), (6.0, 4.0, 1.0, 2.0),
        (4.0, 5.0, 2.0, 1.0), (5.0, 4.0, 1.0, 3.0), (6.0, 5.0, 2.0, 2.0))) {
      val (xs, ys) = lShape(w, h, cx, cy)
      val parts = PolyClip.decomposeConvex(xs, ys)
      assert(parts.forall { case (px, py) => PolyClip.isConvexRing(px, py) })
      assert(parts.forall(p => area(p) > 0), "parts must be CCW positive-area")
      val want = w * cy + cx * (h - cy)
      assert(math.abs(parts.map(area).sum - want) < 1e-9)
      // no part may reach into the notch
      val notchCx = (cx + w) / 2; val notchCy = (cy + h) / 2
      assert(!parts.exists { case (px, py) => PolyClip.pointIn(px, py, notchCx, notchCy) })
    }
  }

  test("scale-relative epsilon: projected-meter and micro-scale rings classify alike (r9 ADVICE)") {
    // cross products scale with extent², so a FIXED threshold misreads
    // rings far from unit scale. The same L-shape at three magnitudes must
    // classify concave, decompose, and cover the scaled area exactly.
    for (s <- Seq(1e-4, 1.0, 1e6)) {
      val (xs0, ys0) = lShape(4, 4, 1, 1)
      val xs = xs0.map(_ * s); val ys = ys0.map(_ * s)
      assert(!PolyClip.isConvexRing(xs, ys), s"L-shape at scale $s must be concave")
      val parts = PolyClip.decomposeConvex(xs, ys)
      assert(parts.forall(p => area(p) > 0))
      val want = 7.0 * s * s
      assert(math.abs(parts.map(area).sum - want) <= 1e-9 * s * s,
        s"area at scale $s")
    }
    // ...and a numerically-collinear "pentagon" (one vertex a relative
    // 1e-14 INTO a square's bottom edge — rounding noise at meter scale)
    // stays CONVEX: the absolute -1e-9 gate would have called its
    // 1e-2-magnitude cross product reflex and sent an effectively-exact
    // square down the decompose path
    val s = 1e6
    val xs = Array(0.0, 0.5 * s, s, s, 0.0)
    val ys = Array(0.0, 1e-14 * s, 0.0, s, s)
    assert(PolyClip.isConvexRing(xs, ys),
      "numerically-collinear midpoint at meter scale must classify convex")
  }

  test("offset-invariance: small ring at UTM-scale coordinates keeps its shape (r10 ADVICE)") {
    // the tolerance must scale with the ring's DIAMETER, not the combined
    // coordinate range: a 6×5 m footprint translated to UTM easting/northing
    // (x≈7e5, y≈4e6) has genuine cross products ~tens of m², which a
    // tol = Eps·(4e6)² ≈ 16 would swamp — reflex turns would classify
    // convex and the convex kernels would return silently wrong areas.
    for ((dx, dy) <- Seq((0.0, 0.0), (7e5, 4e6), (-7e5, 4e6))) {
      val (xs0, ys0) = lShape(6, 5, 2, 2)
      val xs = xs0.map(_ + dx); val ys = ys0.map(_ + dy)
      assert(!PolyClip.isConvexRing(xs, ys),
        s"6×5 m L-footprint at offset ($dx,$dy) must stay concave")
      val parts = PolyClip.decomposeConvex(xs, ys)
      assert(parts.forall { case (px, py) => PolyClip.isConvexRing(px, py) })
      assert(parts.forall(p => area(p) > 0), "parts must be CCW positive-area")
      // tolerance 1e-2: the test-side shoelace itself accumulates ~1e-3
      // roundoff from |x·y| ≈ 2.8e12 products at this offset
      val want = 6.0 * 2 + 2.0 * 3 // w·cy + cx·(h−cy) = 18
      assert(math.abs(parts.map(area).sum - want) < 1e-2,
        s"area at offset ($dx,$dy)")
      assert(!parts.exists { case (px, py) =>
        PolyClip.pointIn(px, py, 4.0 + dx, 3.5 + dy) }, "no part reaches the notch")
    }
    // ...while a genuinely near-collinear turn at the same offset (vertex
    // a relative 1e-12 off a 6 m edge → cross ≈ 2e-11 m², below the
    // roundoff floor 2⁻⁴⁸·(4e6)² ≈ 0.057) still classifies convex
    val sq = (Array(0.0, 3, 6, 6, 0).map(_ + 7e5),
              Array(0.0, 1e-11, 0, 5, 5).map(_ + 4e6))
    assert(PolyClip.isConvexRing(sq._1, sq._2),
      "roundoff-level wobble at UTM offset must classify convex")
  }

  test("regression: reflex vertex ON the candidate ear diagonal (w=h, cx+cy spans)") {
    // L(5,5,2,3): the notch corner (2,3) lies exactly on the bbox diagonal
    // x+y=5 — a strict-interior ear test admits a diagonal that exits
    // through the notch and the 'decomposition' degenerates into signed
    // cancellation (r9 bug, caught by geo_concave rows 1/7/13/19)
    val (xs, ys) = lShape(5, 5, 2, 3)
    val parts = PolyClip.decomposeConvex(xs, ys)
    assert(parts.forall(p => area(p) > 0))
    assert(math.abs(parts.map(area).sum - 19.0) < 1e-9)
    assert(!parts.exists { case (px, py) => PolyClip.pointIn(px, py, 4.0, 4.5) })
  }

  test("convexDiff: disjoint pieces, exact difference area") {
    val s = (Array(0.0, 2, 2, 0), Array(0.0, 0, 2, 2))
    val c = (Array(1.0, 3, 3, 1), Array(1.0, 1, 3, 3))
    val d = PolyClip.convexDiff(s._1, s._2, c._1, c._2)
    assert(math.abs(d.map(area).sum - 3.0) < 1e-12)
    // disjoint clip → whole subject back; containment → empty
    val far = (Array(10.0, 11, 11, 10), Array(0.0, 0, 1, 1))
    assert(math.abs(PolyClip.convexDiff(s._1, s._2, far._1, far._2).map(area).sum - 4.0) < 1e-12)
    val big = (Array(-1.0, 5, 5, -1), Array(-1.0, -1, 5, 5))
    assert(PolyClip.convexDiff(s._1, s._2, big._1, big._2).isEmpty)
  }

  test("regression: duplicate ring vertices must not double-count in unionDisjoint") {
    // a ring with a repeated vertex has a zero-length edge; treating it
    // as a half-plane keeps everything on 'both sides' and convexDiff
    // emits the whole region twice (r9 bug: +2.8125 on every union row)
    val dup = (Array(0.0, 2, 2, 2, 0), Array(0.0, 0, 0, 2, 2)) // (2,0) twice
    val other = (Array(1.0, 3, 3, 1), Array(1.0, 1, 3, 3))
    val u = PolyClip.unionDisjoint(Array(dup, other))
    assert(math.abs(u.map(area).sum - 7.0) < 1e-12)
  }

  test("non-axis-aligned dart: intersection + union satisfy inclusion-exclusion") {
    // dart with reflex vertex (4,2): area = shoelace
    val dart = (Array(0.0, 4, 8, 4), Array(0.0, 2, 0, 6))
    val dartArea = shoelace(dart._1, dart._2)
    val box = (Array(2.25, 6.25, 6.25, 2.25), Array(0.75, 0.75, 3.75, 3.75))
    val boxArea = 4.0 * 3.0
    val parts = PolyClip.decomposeConvex(dart._1, dart._2)
    assert(math.abs(parts.map(area).sum - dartArea) < 1e-9)
    val inter = parts.flatMap { case (px, py) =>
      val r = PolyClip.clip(px, py, box._1, box._2)
      if (r._1.length >= 3) Some(math.abs(area(r))) else None
    }.sum
    val union = PolyClip.unionDisjoint(parts :+ box).map(area).sum
    assert(math.abs(union - (dartArea + boxArea - inter)) < 1e-9)
    assert(inter > 0 && inter < boxArea)
  }

  test("fuzz: random staircase polygons decompose exactly (seeded)") {
    // rectilinear 'staircase' rings: x walks right in random integer
    // steps while y alternates up/down — simple, concave at every inner
    // corner, closed by a top edge. 60 shapes, seeded.
    val rnd = new scala.util.Random(20260814)
    for (_ <- 1 to 60) {
      val steps = 2 + rnd.nextInt(4)
      // top boundary staircase over a flat bottom
      val topXs = scala.collection.mutable.ArrayBuffer[Double]()
      val topYs = scala.collection.mutable.ArrayBuffer[Double]()
      var cx = 0.0
      topXs += cx
      var cy = 1.0 + rnd.nextInt(3)
      topYs += cy
      for (_ <- 1 to steps) {
        cx += 1 + rnd.nextInt(3)
        topXs += cx; topYs += cy          // run right
        cy = 1.0 + rnd.nextInt(3)
        topXs += cx; topYs += cy          // step up/down
      }
      cx += 1 + rnd.nextInt(3)
      topXs += cx; topYs += cy            // final run
      // drop zero-height steps (consecutive equal y would duplicate points)
      val ring = scala.collection.mutable.ArrayBuffer[(Double, Double)]()
      ring += ((0.0, 0.0)); ring += ((cx, 0.0)) // bottom edge right→... CCW: bottom L→R
      // walk the top boundary right→left to close CCW
      val top = topXs.zip(topYs).toSeq
      ring ++= top.reverse
      // dedupe consecutive duplicates
      val clean = ring.foldLeft(Vector.empty[(Double, Double)]) {
        case (acc, p) if acc.nonEmpty && acc.last == p => acc
        case (acc, p) => acc :+ p
      }
      val rxs = clean.map(_._1).toArray
      val rys = clean.map(_._2).toArray
      val want = shoelace(rxs, rys)
      val parts = PolyClip.decomposeConvex(rxs, rys)
      assert(parts.forall { case (px, py) => PolyClip.isConvexRing(px, py) })
      assert(parts.forall(p => area(p) > 0),
        s"negative part in ${clean.mkString(" ")}")
      assert(math.abs(parts.map(area).sum - want) < 1e-9,
        s"area mismatch for ${clean.mkString(" ")}")
    }
  }

  test("fuzz: unionDisjoint of random convex triples matches inclusion-exclusion") {
    // |A∪B∪C| computed by the iterated-difference fold must equal the
    // closed-form Σ|X| − Σ|X∩Y| + |A∩B∩C|, where every intersection runs
    // through the independently-tested Sutherland–Hodgman kernel. 40
    // seeded triples of random convex hulls with real overlap mixes.
    val rnd = new scala.util.Random(99)
    def hull(cx: Double, cy: Double, r0: Double): (Array[Double], Array[Double]) = {
      // random convex polygon: sorted distinct angles on a circle of
      // random radius (varying the radius per-vertex would make a
      // star-shaped, NON-convex ring — the fold requires convex inputs)
      val n = 5 + rnd.nextInt(4)
      val r = r0 * (0.7 + 0.6 * rnd.nextDouble())
      val angles = Array.fill(n)(rnd.nextDouble() * 2 * math.Pi).sorted
      (angles.map(a => cx + r * math.cos(a)), angles.map(a => cy + r * math.sin(a)))
    }
    def interArea(p: (Array[Double], Array[Double]),
        q: (Array[Double], Array[Double])): Double = {
      val r = PolyClip.clip(p._1, p._2, q._1, q._2)
      if (r._1.length < 3) 0.0 else math.abs(area(r))
    }
    def interRing(p: (Array[Double], Array[Double]),
        q: (Array[Double], Array[Double])): Option[(Array[Double], Array[Double])] = {
      val r = PolyClip.clip(p._1, p._2, q._1, q._2)
      if (r._1.length < 3 || math.abs(area(r)) < 1e-12) None else Some(r)
    }
    for (_ <- 1 to 40) {
      val a = hull(0, 0, 2)
      val b = hull(rnd.nextDouble() * 3 - 1.5, rnd.nextDouble() * 3 - 1.5, 2)
      val c = hull(rnd.nextDouble() * 3 - 1.5, rnd.nextDouble() * 3 - 1.5, 2)
      val ie = math.abs(area(a)) + math.abs(area(b)) + math.abs(area(c)) -
        interArea(a, b) - interArea(a, c) - interArea(b, c) +
        interRing(a, b).map(interArea(_, c)).getOrElse(0.0)
      val got = PolyClip.unionDisjoint(Array(a, b, c)).map(area).sum
      assert(math.abs(got - ie) < 1e-6 * math.max(1.0, ie),
        s"union fold $got vs inclusion-exclusion $ie")
    }
  }

  test("difference: donut semantics — holes as first-class disjoint parts") {
    // outer 6×6 minus centered 2×2 hole: area 32, the hole uncovered,
    // the rim covered; a further clip over the holed parts is exact
    val outer = (Array(0.0, 6, 6, 0), Array(0.0, 0, 6, 6))
    val hole = (Array(2.0, 4, 4, 2), Array(2.0, 2, 4, 4))
    val donut = PolyClip.decomposeConvex(outer._1, outer._2).toList.flatMap { p =>
      PolyClip.decomposeConvex(hole._1, hole._2).foldLeft(List(p)) { (fs, h) =>
        fs.flatMap(f => PolyClip.convexDiff(f._1, f._2, h._1, h._2).toList)
      }
    }
    assert(math.abs(donut.map(area).sum - 32.0) < 1e-9)
    assert(!donut.exists { case (px, py) => PolyClip.pointIn(px, py, 3.0, 3.0) },
      "hole center must be uncovered")
    assert(donut.exists { case (px, py) => PolyClip.pointIn(px, py, 1.0, 3.0) },
      "rim must be covered")
    // further intersection over the holed parts: clip each part against
    // a band crossing the hole — area = band∩outer − band∩hole = 12 − 4
    val band = (Array(1.5, 4.5, 4.5, 1.5), Array(0.0, 0, 6, 6))
    val clipped = donut.map { case (px, py) =>
      val r = PolyClip.clip(px, py, band._1, band._2)
      if (r._1.length < 3) 0.0 else math.abs(area(r))
    }.sum
    assert(math.abs(clipped - (3.0 * 6 - 2.0 * 2)) < 1e-9)
    // symmetric difference of two overlapping squares: both one-sided
    // differences are disjoint; areas sum to |A|+|B|−2|A∩B|
    val a = (Array(0.0, 4, 4, 0), Array(0.0, 0, 4, 4))
    val b = (Array(2.0, 6, 6, 2), Array(2.0, 2, 6, 6))
    val ab = PolyClip.convexDiff(a._1, a._2, b._1, b._2).map(p => math.abs(area(p))).sum
    val ba = PolyClip.convexDiff(b._1, b._2, a._1, a._2).map(p => math.abs(area(p))).sum
    assert(math.abs(ab + ba - (16 + 16 - 2 * 4)) < 1e-12)
  }

  test("concave buffer: Minkowski distributes over the decomposition") {
    // buffer(L) as disjoint pieces must equal the two-rectangle
    // inclusion-exclusion: |buf(R1)| + |buf(R2)| − |buf(R1) ∩ buf(R2)|,
    // with the convex buffer areas closed-form (w·h + 2r(w+h) + 32-gon)
    val r = 0.5
    val ring32 = 16.0 * r * r * math.sin(math.Pi / 16)
    for ((w, h, cx, cy) <- Seq((4.0, 4.0, 1.0, 1.0), (5.0, 5.0, 2.0, 3.0))) {
      val (xs, ys) = lShape(w, h, cx, cy)
      val bufParts = PolyClip.decomposeConvex(xs, ys)
        .map { case (px, py) => PolyClip.minkowski32(px, py, r) }
      val bufArea = PolyClip.unionDisjoint(bufParts).map(area).sum
      val a1 = w * cy + 2 * r * (w + cy) + ring32
      val a2 = cx * (h - cy) + 2 * r * (cx + h - cy) + ring32
      val b1 = PolyClip.minkowski32(Array(0.0, w, w, 0), Array(0.0, 0, cy, cy), r)
      val b2 = PolyClip.minkowski32(Array(0.0, cx, cx, 0), Array(cy, cy, h, h), r)
      val overlap = math.abs(area(PolyClip.clip(b1._1, b1._2, b2._1, b2._2)))
      assert(math.abs(bufArea - (a1 + a2 - overlap)) < 1e-9,
        s"L($w,$h,$cx,$cy): $bufArea vs ${a1 + a2 - overlap}")
    }
  }
}
