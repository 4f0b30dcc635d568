package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Native polygon-clipping kernels — the last spatial gap from the
  * reference surface (reference: core/src/main/java/org/apache/calcite/
  * runtime/GeoFunctions.java ST_Intersection/ST_Union/ST_Buffer, which
  * delegate to ESRI's operator set; here the kernels are implemented
  * directly over the engine's parallel-coordinate-array geometry).
  *
  * Contract (documented, spec-pinned): CONVEX inputs in generic position —
  * no shared vertices, no edge-on-edge overlap, crossings transversal.
  * Inputs of either winding are normalized to CCW. Within that contract:
  *
  *  - [[ConvexClip]]: Sutherland–Hodgman intersection of a subject polygon
  *    with a convex clip polygon → single polygon (possibly empty).
  *  - [[PolyUnion]]: union of two convex polygons — boundary walk that
  *    switches rings at every transversal crossing (the two-polygon case
  *    of Weiler–Atherton). Disjoint inputs → two parts; containment →
  *    the container; overlapping → the traced (possibly non-convex)
  *    union polygon.
  *  - [[PolyBuffer]]: line mode strokes each segment into a 34-gon capsule
  *    (rectangle + two half-32-gon caps, one part per segment); polygon
  *    mode is the EXACT Minkowski sum of the convex polygon with a regular
  *    32-gon of circumradius r (sorted edge-vector merge) — the same
  *    32-gon circle discretization as the existing point buffer.
  *
  * All three run as static kernels callable from generated code, keeping
  * the surrounding projection in WholeStageCodegen (the ShingleHashes
  * extension path; reference RexImpTable.java:274).
  */
object PolyClip {

  private def toArr(a: ArrayData): Array[Double] = a.toDoubleArray()

  private def signedArea2(xs: Array[Double], ys: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = xs.length
    while (i < n) {
      val j = (i + 1) % n
      s += xs(i) * ys(j) - xs(j) * ys(i)
      i += 1
    }
    s
  }

  private def ccw(xs: Array[Double], ys: Array[Double]): (Array[Double], Array[Double]) =
    if (signedArea2(xs, ys) >= 0) (xs, ys) else (xs.reverse, ys.reverse)

  /** Even-odd point-in-polygon (boundary undefined — generic position). */
  def pointIn(xs: Array[Double], ys: Array[Double], px: Double, py: Double): Boolean = {
    var inside = false
    var i = 0
    var j = xs.length - 1
    while (i < xs.length) {
      if ((ys(i) > py) != (ys(j) > py) &&
          px < (xs(j) - xs(i)) * (py - ys(i)) / (ys(j) - ys(i)) + xs(i))
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  // ---- Sutherland–Hodgman intersection -----------------------------------

  /** Clip subject polygon (sx, sy) against CONVEX polygon (cx, cy). */
  def clip(sx0: Array[Double], sy0: Array[Double],
      cx0: Array[Double], cy0: Array[Double]): (Array[Double], Array[Double]) = {
    val (cx, cy) = ccw(cx0, cy0)
    var outX = sx0.toBuffer
    var outY = sy0.toBuffer
    var e = 0
    val m = cx.length
    while (e < m && outX.nonEmpty) {
      val x1 = cx(e); val y1 = cy(e)
      val x2 = cx((e + 1) % m); val y2 = cy((e + 1) % m)
      // inside = left of the CCW clip edge
      def inside(px: Double, py: Double): Boolean =
        (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1) >= 0
      def inter(px: Double, py: Double, qx: Double, qy: Double): (Double, Double) = {
        val t = ((x1 - px) * (y2 - y1) - (y1 - py) * (x2 - x1)) /
          ((qx - px) * (y2 - y1) - (qy - py) * (x2 - x1))
        (px + t * (qx - px), py + t * (qy - py))
      }
      val inX = outX; val inY = outY
      outX = collection.mutable.Buffer.empty
      outY = collection.mutable.Buffer.empty
      var i = 0
      val n = inX.length
      while (i < n) {
        val px = inX((i + n - 1) % n); val py = inY((i + n - 1) % n)
        val qx = inX(i); val qy = inY(i)
        val qIn = inside(qx, qy); val pIn = inside(px, py)
        if (qIn) {
          if (!pIn) { val (ix, iy) = inter(px, py, qx, qy); outX += ix; outY += iy }
          outX += qx; outY += qy
        } else if (pIn) {
          val (ix, iy) = inter(px, py, qx, qy); outX += ix; outY += iy
        }
        i += 1
      }
      e += 1
    }
    (outX.toArray, outY.toArray)
  }

  def clipRow(ax: ArrayData, ay: ArrayData, bx: ArrayData, by: ArrayData): InternalRow = {
    val (sx, sy) = ccw(toArr(ax), toArr(ay))
    val (rx, ry) = clip(sx, sy, toArr(bx), toArr(by))
    new GenericInternalRow(Array[Any](new GenericArrayData(rx), new GenericArrayData(ry)))
  }

  // ---- convex-convex union boundary walk ---------------------------------

  private final case class Node(x: Double, y: Double, crossId: Int) // -1 = vertex

  /** Union of two convex polygons → one or two (xs, ys) parts. */
  def union(ax0: Array[Double], ay0: Array[Double],
      bx0: Array[Double], by0: Array[Double]): Array[(Array[Double], Array[Double])] = {
    val (ax, ay) = ccw(ax0, ay0)
    val (bx, by) = ccw(bx0, by0)
    val n = ax.length; val m = bx.length
    // proper crossings (tA in (0,1), tB in (0,1)) between edge i of A and j of B
    final case class Cross(id: Int, i: Int, tA: Double, j: Int, tB: Double,
        x: Double, y: Double)
    val crossings = collection.mutable.ArrayBuffer[Cross]()
    var i = 0
    while (i < n) {
      val x1 = ax(i); val y1 = ay(i)
      val x2 = ax((i + 1) % n); val y2 = ay((i + 1) % n)
      var j = 0
      while (j < m) {
        val x3 = bx(j); val y3 = by(j)
        val x4 = bx((j + 1) % m); val y4 = by((j + 1) % m)
        val d = (x2 - x1) * (y4 - y3) - (y2 - y1) * (x4 - x3)
        if (d != 0.0) {
          val t = ((x3 - x1) * (y4 - y3) - (y3 - y1) * (x4 - x3)) / d
          val u = ((x3 - x1) * (y2 - y1) - (y3 - y1) * (x2 - x1)) / d
          if (t > 0 && t < 1 && u > 0 && u < 1)
            crossings += Cross(crossings.size, i, t, j, u,
              x1 + t * (x2 - x1), y1 + t * (y2 - y1))
        }
        j += 1
      }
      i += 1
    }
    if (crossings.isEmpty) {
      if (pointIn(bx, by, ax(0), ay(0))) return Array((bx, by)) // A inside B
      if (pointIn(ax, ay, bx(0), by(0))) return Array((ax, ay)) // B inside A
      return Array((ax, ay), (bx, by)) // disjoint
    }
    // augmented rings: vertices + crossings in traversal order
    def ring(xs: Array[Double], ys: Array[Double], isA: Boolean): Array[Node] = {
      val out = collection.mutable.ArrayBuffer[Node]()
      var e = 0
      while (e < xs.length) {
        out += Node(xs(e), ys(e), -1)
        val onEdge = crossings.filter(c => (if (isA) c.i else c.j) == e)
          .sortBy(c => if (isA) c.tA else c.tB)
        onEdge.foreach(c => out += Node(c.x, c.y, c.id))
        e += 1
      }
      out.toArray
    }
    val ringA = ring(ax, ay, isA = true)
    val ringB = ring(bx, by, isA = false)
    val posA = new Array[Int](crossings.size)
    val posB = new Array[Int](crossings.size)
    ringA.zipWithIndex.foreach { case (nd, k) => if (nd.crossId >= 0) posA(nd.crossId) = k }
    ringB.zipWithIndex.foreach { case (nd, k) => if (nd.crossId >= 0) posB(nd.crossId) = k }
    // start from an A vertex strictly outside B (exists: crossings exist,
    // so neither contains the other)
    val startIdx = ringA.indexWhere(nd =>
      nd.crossId < 0 && !pointIn(bx, by, nd.x, nd.y))
    if (startIdx < 0) throw new IllegalStateException(
      "st_union: degenerate input (no outside vertex; generic position required)")
    val rx = collection.mutable.ArrayBuffer[Double]()
    val ry = collection.mutable.ArrayBuffer[Double]()
    var onA = true
    var k = startIdx
    var steps = 0
    val maxSteps = 2 * (ringA.length + ringB.length) + 4
    while (steps == 0 || !(onA && k == startIdx)) {
      val cur = if (onA) ringA(k) else ringB(k)
      rx += cur.x; ry += cur.y
      if (cur.crossId >= 0) {
        // switch rings at every transversal crossing (union walk)
        onA = !onA
        k = if (onA) posA(cur.crossId) else posB(cur.crossId)
      }
      k = (k + 1) % (if (onA) ringA.length else ringB.length)
      steps += 1
      if (steps > maxSteps) throw new IllegalStateException(
        "st_union: walk did not close (degenerate input; generic position required)")
    }
    Array((rx.toArray, ry.toArray))
  }

  def unionRow(ax: ArrayData, ay: ArrayData, bx: ArrayData, by: ArrayData): InternalRow = {
    val parts = union(toArr(ax), toArr(ay), toArr(bx), toArr(by))
    new GenericInternalRow(Array[Any](
      new GenericArrayData(parts.map(p => new GenericArrayData(p._1): Any)),
      new GenericArrayData(parts.map(p => new GenericArrayData(p._2): Any))))
  }

  // ---- buffers ------------------------------------------------------------

  /** One 34-gon capsule per segment: rectangle + two half-32-gon caps.
    * Cap vertices sit exactly at distance r (the 32-gon circle
    * discretization of the existing point buffer). */
  def capsule(axv: Double, ayv: Double, bxv: Double, byv: Double, r: Double)
      : (Array[Double], Array[Double]) = {
    val dx = bxv - axv; val dy = byv - ayv
    val len = math.sqrt(dx * dx + dy * dy)
    val phi = math.atan2(dy, dx)
    val xs = new Array[Double](34)
    val ys = new Array[Double](34)
    var k = 0
    while (k <= 16) { // cap at b: phi - pi/2 .. phi + pi/2 (outward)
      val a = phi - math.Pi / 2 + k * math.Pi / 16
      xs(k) = bxv + r * math.cos(a); ys(k) = byv + r * math.sin(a)
      k += 1
    }
    while (k <= 33) { // cap at a: phi + pi/2 .. phi + 3pi/2
      val a = phi + math.Pi / 2 + (k - 17) * math.Pi / 16
      xs(k) = axv + r * math.cos(a); ys(k) = ayv + r * math.sin(a)
      k += 1
    }
    val _ = len
    (xs, ys)
  }

  /** Minkowski sum of a CONVEX polygon with the regular 32-gon of
    * circumradius r — the exact convex buffer under the engine's 32-gon
    * circle discretization. Sorted edge-vector merge, both rings CCW
    * rotated to start at their bottom-most vertex. */
  def minkowski32(xs0: Array[Double], ys0: Array[Double], r: Double)
      : (Array[Double], Array[Double]) = {
    val (xs, ys) = ccw(xs0, ys0)
    def rotateToBottom(px: Array[Double], py: Array[Double]): (Array[Double], Array[Double]) = {
      var b = 0
      var i = 1
      while (i < px.length) {
        if (py(i) < py(b) || (py(i) == py(b) && px(i) < px(b))) b = i
        i += 1
      }
      (px.drop(b) ++ px.take(b), py.drop(b) ++ py.take(b))
    }
    val (axr, ayr) = rotateToBottom(xs, ys)
    val kx = new Array[Double](32)
    val ky = new Array[Double](32)
    var k = 0
    while (k < 32) {
      kx(k) = r * math.cos(2 * math.Pi * k / 32)
      ky(k) = r * math.sin(2 * math.Pi * k / 32)
      k += 1
    }
    val (kxr, kyr) = rotateToBottom(kx, ky)
    def edgeAngle(px: Array[Double], py: Array[Double], i: Int): Double = {
      val j = (i + 1) % px.length
      val a = math.atan2(py(j) - py(i), px(j) - px(i))
      if (a < 0) a + 2 * math.Pi else a
    }
    val n = axr.length; val m = 32
    val outX = new Array[Double](n + m)
    val outY = new Array[Double](n + m)
    var cx = axr(0) + kxr(0)
    var cy = ayr(0) + kyr(0)
    var i = 0; var j = 0; var o = 0
    while (o < n + m) {
      outX(o) = cx; outY(o) = cy
      val takeA = j >= m ||
        (i < n && edgeAngle(axr, ayr, i) <= edgeAngle(kxr, kyr, j))
      if (takeA) {
        val i2 = (i + 1) % n
        cx += axr(i2) - axr(i); cy += ayr(i2) - ayr(i)
        i += 1
      } else {
        val j2 = (j + 1) % m
        cx += kxr(j2) - kxr(j); cy += kyr(j2) - kyr(j)
        j += 1
      }
      o += 1
    }
    (outX, outY)
  }

  def bufferRow(xs: ArrayData, ys: ArrayData, r: Double, line: Boolean): InternalRow = {
    val px = toArr(xs); val py = toArr(ys)
    val parts: Array[(Array[Double], Array[Double])] =
      if (!line) Array(minkowski32(px, py, r))
      else if (px.length < 2) Array(minkowski32(Array(px(0)), Array(py(0)), r))
      else (0 until px.length - 1).map(i =>
        capsule(px(i), py(i), px(i + 1), py(i + 1), r)).toArray
    new GenericInternalRow(Array[Any](
      new GenericArrayData(parts.map(p => new GenericArrayData(p._1): Any)),
      new GenericArrayData(parts.map(p => new GenericArrayData(p._2): Any))))
  }

  // ---- concave lift: convex decomposition (r8 verdict #4) ------------------
  // Simple concave polygons are decomposed into convex parts (ear-clipping
  // triangulation + Hertel–Mehlhorn diagonal removal) and the convex
  // kernels above run per part. Exactness discipline is preserved because
  // every derived set is kept as DISJOINT convex pieces:
  //   intersection — part×part convex clips (pieces of disjoint parts are
  //                  disjoint);
  //   union        — each part minus everything already covered (iterated
  //                  convex difference, each piece convex);
  //   buffer       — Minkowski distributes over union, so buffer(P) is the
  //                  union of the parts' exact convex Minkowski sums,
  //                  disjointified the same way.
  // Shoelace areas of the pieces therefore SUM to the true area — the
  // inclusion-exclusion identities geo_concave pins.
  //
  // Numeric contract (r9 ADVICE): classification and ear tests use a
  // tolerance RELATIVE to the ring's extent (crossTol — cross products
  // scale with extent²), so decomposition is magnitude-invariant from
  // micro-degrees to projected meters (GeoConcaveSpec pins 1e-4/1/1e6).
  // The clip kernels' linear-scale epsilons (vertex dedup, zero-length
  // edges) remain absolute at 1e-12: callers feeding coordinates with
  // |x|,|y| ≲ 1e7 (lon/lat, UTM meters) are within contract; beyond
  // that, translate to a local origin first.

  private val Eps = 1e-12

  /** Scale-relative tolerance for CROSS-PRODUCT (area-like) comparisons
    * (r9 ADVICE, refined r11): cross products grow with the square of the
    * ring's LINEAR SIZE (its diameter), so a fixed 1e-9/1e-12 threshold
    * misclassifies both directions — a genuinely reflex turn on a
    * micro-polygon slips under an absolute epsilon (silently convex →
    * wrong area from the convex kernels), and numerically-collinear turns
    * on projected-meter rings tower over it.
    *
    * Two terms, both floored at Eps:
    *  - size term: Eps · diam², where diam = max per-axis extent
    *    (xmax−xmin vs ymax−ymin). Using the ring's diameter — NOT the
    *    combined coordinate range — keeps a small ring far from the
    *    origin (a 5 m footprint at UTM x≈7e5/y≈4e6) from inheriting a
    *    tolerance that swamps its genuine ~25 m² cross products.
    *  - roundoff term: 2⁻⁴⁸ · maxAbs², covering the floating-point error
    *    of differencing coordinates with a large common offset (each
    *    product in the cross is ≲ maxAbs² with relative error ~2⁻⁵²; a
    *    16-ulp budget absorbs the handful of ops). At maxAbs = 1e6 this
    *    is ≈ 3.6e-3 — far below a meter-scale ring's real cross products
    *    but above the noise of catastrophic cancellation.
    *
    * Linear-scale comparisons (vertex dedup, zero-length edges) still use
    * the absolute Eps; their contract is coordinates of magnitude ≲ 1e7
    * (lon/lat, UTM meters), documented on the concave entry points. */
  private def crossTol(xs: Array[Double], ys: Array[Double]): Double = {
    var xLo = Double.MaxValue; var xHi = -Double.MaxValue
    var yLo = Double.MaxValue; var yHi = -Double.MaxValue
    var maxAbs = 0.0
    var i = 0
    while (i < xs.length) {
      if (xs(i) < xLo) xLo = xs(i); if (xs(i) > xHi) xHi = xs(i)
      if (ys(i) < yLo) yLo = ys(i); if (ys(i) > yHi) yHi = ys(i)
      val ax = math.abs(xs(i)); if (ax > maxAbs) maxAbs = ax
      val ay = math.abs(ys(i)); if (ay > maxAbs) maxAbs = ay
      i += 1
    }
    val diam = math.max(xHi - xLo, yHi - yLo)
    val roundoff = maxAbs * maxAbs / 281474976710656.0 // 2^-48 · maxAbs²
    math.max(Eps, math.max(Eps * diam * diam, roundoff))
  }

  /** All turns left-or-straight on a CCW ring → convex. */
  def isConvexRing(xs: Array[Double], ys: Array[Double]): Boolean = {
    val n = xs.length
    if (n < 4) return true
    // floor at the historical 1e-9 so near-collinear turns on unit-scale
    // rings keep classifying convex (the decompose path would reject them
    // as ear-less); the relative term takes over once extent² > 1e3
    val tol = math.max(1e-9, crossTol(xs, ys))
    var i = 0
    while (i < n) {
      val j = (i + 1) % n; val k = (i + 2) % n
      val cr = (xs(j) - xs(i)) * (ys(k) - ys(j)) - (ys(j) - ys(i)) * (xs(k) - xs(j))
      if (cr < -tol) return false
      i += 1
    }
    true
  }

  private def triArea2(ax: Double, ay: Double, bx: Double, by: Double,
      cx: Double, cy: Double): Double = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)

  /** CLOSED-triangle containment: a remaining vertex ON the candidate
    * ear's boundary must block the ear too — a reflex vertex exactly on
    * the ear diagonal (the L-shape whose notch corner lies on the
    * bbox diagonal) would otherwise admit a diagonal that exits the
    * polygon through the notch. Conservative: a touching-but-valid ear
    * is skipped and a later ear is clipped instead (two ears always
    * exist). */
  private def pointInTriClosed(px: Double, py: Double, ax: Double, ay: Double,
      bx: Double, by: Double, cx: Double, cy: Double, tol: Double): Boolean =
    triArea2(ax, ay, bx, by, px, py) >= -tol &&
      triArea2(bx, by, cx, cy, px, py) >= -tol &&
      triArea2(cx, cy, ax, ay, px, py) >= -tol

  /** Ear-clipping triangulation of a simple CCW ring → index triples.
    * O(n²), deterministic (first ear in ring order each round). */
  private def earClipIdx(xs: Array[Double], ys: Array[Double]): Array[Array[Int]] = {
    val n = xs.length
    val tol = crossTol(xs, ys)
    val idx = collection.mutable.ArrayBuffer.range(0, n)
    val tris = collection.mutable.ArrayBuffer[Array[Int]]()
    while (idx.length > 3) {
      var p = 0
      var clipped = false
      while (p < idx.length && !clipped) {
        val i0 = idx((p + idx.length - 1) % idx.length)
        val i1 = idx(p)
        val i2 = idx((p + 1) % idx.length)
        if (triArea2(xs(i0), ys(i0), xs(i1), ys(i1), xs(i2), ys(i2)) > tol) {
          var ok = true
          var q = 0
          while (q < idx.length && ok) {
            val iv = idx(q)
            if (iv != i0 && iv != i1 && iv != i2 &&
                pointInTriClosed(xs(iv), ys(iv),
                  xs(i0), ys(i0), xs(i1), ys(i1), xs(i2), ys(i2), tol)) ok = false
            q += 1
          }
          if (ok) { tris += Array(i0, i1, i2); idx.remove(p); clipped = true }
        }
        p += 1
      }
      if (!clipped) throw new IllegalStateException(
        "st_*: ear clipping found no ear (self-intersecting or degenerate ring)")
    }
    tris += Array(idx(0), idx(1), idx(2))
    tris.toArray
  }

  /** Decompose a simple polygon into convex parts: already-convex rings
    * pass through; otherwise ear-clip, then greedily remove inessential
    * diagonals (Hertel–Mehlhorn — at most 4× the optimal part count). */
  def decomposeConvex(xs0: Array[Double], ys0: Array[Double])
      : Array[(Array[Double], Array[Double])] = {
    val (xs, ys) = ccw(xs0, ys0)
    if (isConvexRing(xs, ys)) return Array((xs, ys))
    // drop zero-area triangles: collinear input vertices can leave a
    // degenerate final triple once the real area is covered; it covers
    // nothing, and a zero-length edge would corrupt later half-plane math
    val tol = crossTol(xs, ys)
    var parts: Vector[Vector[Int]] = earClipIdx(xs, ys).iterator
      .filter(t => math.abs(triArea2(xs(t(0)), ys(t(0)), xs(t(1)), ys(t(1)),
        xs(t(2)), ys(t(2)))) > tol)
      .map(_.toVector).toVector
    def convexRing(ring: Vector[Int]): Boolean =
      isConvexRing(ring.map(xs).toArray, ring.map(ys).toArray)
    def sharedEdge(p: Vector[Int], q: Vector[Int]): Option[(Int, Int)] = {
      val qEdges = q.indices.map(i => (q(i), q((i + 1) % q.size))).toSet
      p.indices.iterator.map(i => (p(i), p((i + 1) % p.size)))
        .find { case (u, v) => qEdges.contains((v, u)) }
    }
    def rotateTo(ring: Vector[Int], v: Int): Vector[Int] = {
      val k = ring.indexOf(v); ring.drop(k) ++ ring.take(k)
    }
    var merged = true
    while (merged) {
      merged = false
      val candidate = (for {
        pi <- parts.indices.iterator
        qi <- (pi + 1 until parts.size).iterator
        (u, v) <- sharedEdge(parts(pi), parts(qi)).iterator
        m = rotateTo(parts(pi), v) ++
          rotateTo(parts(qi), u).drop(1).dropRight(1)
        if convexRing(m)
      } yield (pi, qi, m)).nextOption()
      candidate.foreach { case (pi, qi, m) =>
        parts = parts.zipWithIndex
          .collect { case (r, i) if i != pi && i != qi => r } :+ m
        merged = true
      }
    }
    parts.map(r => (r.map(xs).toArray, r.map(ys).toArray)).toArray
  }

  /** Clip a convex CCW ring against ONE half-plane: keepLeft keeps the
    * side left of the directed line (x1,y1)→(x2,y2), else the right side.
    * Boundary points are kept on both sides (pieces may share edges —
    * zero-area overlap, exact for area arithmetic). */
  private def clipHalf(xs: Array[Double], ys: Array[Double], x1: Double,
      y1: Double, x2: Double, y2: Double, keepLeft: Boolean)
      : (Array[Double], Array[Double]) = {
    val n = xs.length
    val rx = collection.mutable.ArrayBuffer[Double]()
    val ry = collection.mutable.ArrayBuffer[Double]()
    def side(px: Double, py: Double): Double = {
      val s = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
      if (keepLeft) s else -s
    }
    var i = 0
    while (i < n) {
      val px = xs((i + n - 1) % n); val py = ys((i + n - 1) % n)
      val qx = xs(i); val qy = ys(i)
      val sp = side(px, py); val sq = side(qx, qy)
      def addInter(): Unit = {
        val t = sp / (sp - sq)
        rx += px + t * (qx - px); ry += py + t * (qy - py)
      }
      if (sq >= 0) {
        if (sp < 0) addInter()
        rx += qx; ry += qy
      } else if (sp > 0) addInter() // sp == 0: the crossing IS p, already emitted
      i += 1
    }
    dedupeRing(rx.toArray, ry.toArray)
  }

  /** Drop consecutive-duplicate vertices (and a last==first duplicate).
    * Duplicates are harmless for shoelace areas but create zero-length
    * edges, which a later half-plane clip would treat as "everything on
    * both sides" — the double-count this guards against. */
  private def dedupeRing(xs: Array[Double], ys: Array[Double])
      : (Array[Double], Array[Double]) = {
    val n = xs.length
    if (n == 0) return (xs, ys)
    val rx = collection.mutable.ArrayBuffer[Double]()
    val ry = collection.mutable.ArrayBuffer[Double]()
    var i = 0
    while (i < n) {
      val j = (i + n - 1) % n
      if (i == 0 || math.abs(xs(i) - xs(j)) > Eps || math.abs(ys(i) - ys(j)) > Eps) {
        rx += xs(i); ry += ys(i)
      }
      i += 1
    }
    // last == first wrap-around duplicate
    if (rx.length > 1 && math.abs(rx.last - rx.head) <= Eps &&
        math.abs(ry.last - ry.head) <= Eps) { rx.remove(rx.length - 1); ry.remove(ry.length - 1) }
    (rx.toArray, ry.toArray)
  }

  /** Subject \ clip (both convex) as DISJOINT convex pieces: walk the
    * clip's edges; at each, split the remaining region into the piece
    * outside the edge (emitted) and the piece inside (carried on). */
  def convexDiff(sx0: Array[Double], sy0: Array[Double],
      cx0: Array[Double], cy0: Array[Double]): Array[(Array[Double], Array[Double])] = {
    val (sx, sy) = ccw(sx0, sy0)
    val (cx, cy) = ccw(cx0, cy0)
    val out = collection.mutable.ArrayBuffer[(Array[Double], Array[Double])]()
    var remX = sx; var remY = sy
    var i = 0
    val m = cx.length
    while (i < m && remX.length >= 3) {
      val x1 = cx(i); val y1 = cy(i)
      val x2 = cx((i + 1) % m); val y2 = cy((i + 1) % m)
      if (math.abs(x2 - x1) <= Eps && math.abs(y2 - y1) <= Eps) {
        i += 1 // zero-length clip edge: no half-plane, skip
      } else {
      val (ox, oy) = clipHalf(remX, remY, x1, y1, x2, y2, keepLeft = false)
      if (ox.length >= 3 && math.abs(signedArea2(ox, oy)) > Eps) out += ((ox, oy))
      val (nx, ny) = clipHalf(remX, remY, x1, y1, x2, y2, keepLeft = true)
      remX = nx; remY = ny
      i += 1
      }
    }
    out.toArray
  }

  /** Union of convex parts as DISJOINT convex pieces: each part is
    * reduced by everything already emitted (iterated convex difference),
    * so piece areas sum to the true union area. */
  def unionDisjoint(parts: Array[(Array[Double], Array[Double])])
      : Array[(Array[Double], Array[Double])] = {
    val out = collection.mutable.ArrayBuffer[(Array[Double], Array[Double])]()
    for ((px, py) <- parts) {
      var frags = List((px, py))
      for ((qx, qy) <- out.toList)
        frags = frags.flatMap { case (fx, fy) => convexDiff(fx, fy, qx, qy).toList }
      out ++= frags.filter { case (fx, fy) =>
        fx.length >= 3 && math.abs(signedArea2(fx, fy)) > Eps }
    }
    out.toArray
  }

  /** N-ary union over a COLLECTION of rings (reference:
    * GeoFunctions.java:499 `ST_Union(geomCollection)`): decompose every
    * ring (concave accepted), fold into disjoint convex pieces. */
  def unionAllRow(pxs: ArrayData, pys: ArrayData): InternalRow = {
    val n = pxs.numElements()
    val rings = (0 until n).toArray.flatMap { i =>
      val xs = pxs.getArray(i).toDoubleArray()
      val ys = pys.getArray(i).toDoubleArray()
      if (xs.length >= 3) decomposeConvex(xs, ys) else Array.empty[(Array[Double], Array[Double])]
    }
    partsRow(unionDisjoint(rings))
  }

  private def partsRow(parts: Array[(Array[Double], Array[Double])]): InternalRow =
    new GenericInternalRow(Array[Any](
      new GenericArrayData(parts.map(p => new GenericArrayData(p._1): Any)),
      new GenericArrayData(parts.map(p => new GenericArrayData(p._2): Any))))

  /** Intersection accepting concave operands: decompose both, clip every
    * part pair (Sutherland–Hodgman — both sides convex), keep the
    * positive-area pieces. Pieces of disjoint parts are disjoint. */
  def concaveClipRow(ax: ArrayData, ay: ArrayData, bx: ArrayData, by: ArrayData): InternalRow = {
    val pa = decomposeConvex(toArr(ax), toArr(ay))
    val pb = decomposeConvex(toArr(bx), toArr(by))
    val parts = for {
      (sxp, syp) <- pa
      (cxp, cyp) <- pb
      (rx, ry) = clip(sxp, syp, cxp, cyp)
      if rx.length >= 3 && math.abs(signedArea2(rx, ry)) > Eps
    } yield (rx, ry)
    partsRow(parts)
  }

  /** Union accepting concave operands: decompose both and disjointify. */
  def concaveUnionRow(ax: ArrayData, ay: ArrayData, bx: ArrayData, by: ArrayData): InternalRow =
    partsRow(unionDisjoint(
      decomposeConvex(toArr(ax), toArr(ay)) ++ decomposeConvex(toArr(bx), toArr(by))))

  /** Buffer accepting concave polygons: Minkowski sums distribute over
    * union, so the buffer is the disjointified union of the parts' exact
    * convex Minkowski 32-gon sums. */
  def concaveBufferRow(xs: ArrayData, ys: ArrayData, r: Double): InternalRow =
    partsRow(unionDisjoint(
      decomposeConvex(toArr(xs), toArr(ys)).map { case (px, py) => minkowski32(px, py, r) }))

  /** Set difference A \ B accepting concave operands: decompose both,
    * subtract every convex part of B from every part of A (iterated
    * convex difference — pieces stay convex and disjoint). This is also
    * the HOLE primitive: a polygon with holes is exactly
    * difference(outer, hole₁) \ hole₂ \ …, and every derived set
    * (area, further clips, Minkowski buffers) runs over the resulting
    * disjoint parts unchanged. */
  def concaveDiffRow(ax: ArrayData, ay: ArrayData, bx: ArrayData, by: ArrayData): InternalRow = {
    val pb = decomposeConvex(toArr(bx), toArr(by))
    val parts = decomposeConvex(toArr(ax), toArr(ay)).toList.flatMap { p =>
      pb.foldLeft(List(p)) { (frags, h) =>
        frags.flatMap { case (fx, fy) => convexDiff(fx, fy, h._1, h._2).toList }
      }
    }.filter { case (fx, fy) => fx.length >= 3 && math.abs(signedArea2(fx, fy)) > Eps }
    partsRow(parts.toArray)
  }

  /** Polygon-with-holes → disjoint convex parts (the WKT
    * `POLYGON ((outer), (hole), …)` value form): decompose the outer
    * ring, then fold-subtract each hole ring (iterated convex
    * difference — exactly the [[concaveDiffRow]] composition, n-ary).
    * Ring orientation is normalized by decomposeConvex, so WKT's
    * CW-hole convention needs no special-casing. */
  def holesRow(ax: ArrayData, ay: ArrayData, hxs: ArrayData, hys: ArrayData): InternalRow = {
    var parts = decomposeConvex(toArr(ax), toArr(ay)).toList
    val n = hxs.numElements()
    var i = 0
    while (i < n) {
      val hx = hxs.getArray(i).toDoubleArray()
      val hy = hys.getArray(i).toDoubleArray()
      if (hx.length >= 3) {
        val ph = decomposeConvex(hx, hy)
        parts = parts.flatMap { p =>
          ph.foldLeft(List(p)) { (frags, h) =>
            frags.flatMap { case (fx, fy) => convexDiff(fx, fy, h._1, h._2).toList }
          }
        }
      }
      i += 1
    }
    partsRow(parts.filter { case (fx, fy) =>
      fx.length >= 3 && math.abs(signedArea2(fx, fy)) > Eps }.toArray)
  }

  // ---- column-level API ----------------------------------------------------

  import org.apache.spark.sql.GraftBridge

  val polySchema: StructType = StructType(Seq(
    StructField("xs", ArrayType(DoubleType, containsNull = false)),
    StructField("ys", ArrayType(DoubleType, containsNull = false))))
  val partsSchema: StructType = StructType(Seq(
    StructField("pxs", ArrayType(ArrayType(DoubleType, containsNull = false))),
    StructField("pys", ArrayType(ArrayType(DoubleType, containsNull = false)))))

  def st_intersection_rings(ax: Column, ay: Column, bx: Column, by: Column): Column =
    GraftBridge.column(ConvexClip(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(bx), GraftBridge.expression(by)))
  def st_union_rings(ax: Column, ay: Column, bx: Column, by: Column): Column =
    GraftBridge.column(PolyUnion(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(bx), GraftBridge.expression(by)))
  def st_buffer_ring(xs: Column, ys: Column, r: Column, line: Boolean): Column =
    GraftBridge.column(PolyBuffer(GraftBridge.expression(xs), GraftBridge.expression(ys),
      GraftBridge.expression(r), line))
  def st_intersection_parts(ax: Column, ay: Column, bx: Column, by: Column): Column =
    GraftBridge.column(ConcaveClip(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(bx), GraftBridge.expression(by)))
  def st_union_parts(ax: Column, ay: Column, bx: Column, by: Column): Column =
    GraftBridge.column(ConcaveUnion(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(bx), GraftBridge.expression(by)))
  def st_buffer_parts(xs: Column, ys: Column, r: Column): Column =
    GraftBridge.column(ConcaveBuffer(GraftBridge.expression(xs), GraftBridge.expression(ys),
      GraftBridge.expression(r)))
  def st_difference_parts(ax: Column, ay: Column, bx: Column, by: Column): Column =
    GraftBridge.column(ConcaveDifference(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(bx), GraftBridge.expression(by)))
  def st_union_all_parts(pxs: Column, pys: Column): Column =
    GraftBridge.column(PolyUnionAll(GraftBridge.expression(pxs), GraftBridge.expression(pys)))
  def st_polygon_holes_parts(ax: Column, ay: Column, hxs: Column, hys: Column): Column =
    GraftBridge.column(PolyWithHoles(GraftBridge.expression(ax), GraftBridge.expression(ay),
      GraftBridge.expression(hxs), GraftBridge.expression(hys)))
}

/** Sutherland–Hodgman intersection: (subject xs, ys, convex clip xs, ys) →
  * struct<xs, ys> (empty when disjoint). */
case class ConvexClip(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_intersection_rings expects four array<double>")
  override def dataType: DataType = PolyClip.polySchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_intersection_rings"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.clipRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.clipRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** Convex-convex union walk: → struct<pxs: array<array<double>>, pys: ...>
  * (one part when overlapping/contained, two when disjoint). */
case class PolyUnion(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union_rings expects four array<double>")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_union_rings"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.unionRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.unionRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** Concave-accepting intersection: decompose-and-clip → disjoint parts. */
case class ConcaveClip(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_intersection_parts expects four array<double>")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_intersection_parts"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.concaveClipRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.concaveClipRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** Concave-accepting union: decompose both sides, disjointify. */
case class ConcaveUnion(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union_parts expects four array<double>")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_union_parts"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.concaveUnionRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.concaveUnionRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** Concave-accepting set difference A \ B → disjoint convex parts. */
case class ConcaveDifference(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_difference_parts expects four array<double>")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_difference_parts"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.concaveDiffRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.concaveDiffRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** Polygon with holes (outer ring, hole-ring collection) → disjoint
  * convex parts; the value-level WKT `POLYGON ((outer), (hole), …)` form
  * (reference: runtime/GeoFunctions.java ESRI-backed multi-ring
  * polygons). */
case class PolyWithHoles(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "st_polygon_holes_parts expects (array<double> ×2, array<array<double>> ×2)")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_polygon_holes_parts"
  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    PolyClip.holesRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], d.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c, d) =>
      s"${ev.value} = graft.functions.PolyClip.holesRow($a, $b, $c, $d);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): Expression = copy(f, s, t, q)
}

/** N-ary collection union → disjoint convex parts (GeoFunctions.java:499). */
case class PolyUnionAll(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[ArrayType])) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure("st_union_all_parts expects two array<array<double>>")
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_union_all_parts"
  override def nullSafeEval(a: Any, b: Any): Any =
    PolyClip.unionAllRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PolyClip.unionAllRow($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** Concave-accepting polygon buffer: per-part Minkowski sums, disjointified. */
case class ConcaveBuffer(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: ArrayType, _: ArrayType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "st_buffer_parts expects (array<double>, array<double>, double)")
    }
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_buffer_parts"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PolyClip.concaveBufferRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.PolyClip.concaveBufferRow($a, $b, $c);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(f, s, t)
}

/** Buffer: line=true strokes segments into capsules; line=false is the
  * convex-polygon Minkowski sum with the regular 32-gon. */
case class PolyBuffer(first: Expression, second: Expression,
    third: Expression, line: Boolean) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: ArrayType, _: ArrayType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "st_buffer_ring expects (array<double>, array<double>, double)")
    }
  override def dataType: DataType = PolyClip.partsSchema
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "st_buffer_ring"
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    PolyClip.bufferRow(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      c.asInstanceOf[Double], line)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.PolyClip.bufferRow($a, $b, $c, $line);")
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(f, s, t)
}
