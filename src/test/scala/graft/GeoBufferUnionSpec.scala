package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ST_Union (point-set subset, exact) and ST_Buffer (point → regular
  * 32-gon, documented approximation) — the remaining reference surface
  * from runtime/GeoFunctions.java that does not require a clipping
  * kernel. */
class GeoBufferUnionSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Geo._

  private val one = spark.range(1).toDF()
  private def head(c: Column) = one.select(c).head()

  test("ST_Union of point sets is the deduplicated MULTIPOINT") {
    val a = stMPointFromText(lit("MULTIPOINT (1 2, 3 4)"))
    val b = stMPointFromText(lit("MULTIPOINT (3 4, 5 6)"))
    val u = stUnionPoints(a, b)
    assert(head(stGeometryType(u)).getString(0) == "MULTIPOINT")
    assert(head(stNumPoints(u)).getInt(0) == 3)
    assert(head(stAsText(u)).getString(0) == "MULTIPOINT (1.0 2.0, 3.0 4.0, 5.0 6.0)")
    // point + point composes too
    val pp = stUnionPoints(stPoint(lit(0.0), lit(0.0)), stPoint(lit(0.0), lit(0.0)))
    assert(head(stNumPoints(pp)).getInt(0) == 1)
  }

  test("ST_Union(polygon, polygon): walk traces the exact union boundary") {
    // corner overlap: A=[0,4]², B=[2,6]×[1,3] → the known octagon
    val u = graft.functions.PolyClip.union(
      Array(0.0, 4, 4, 0), Array(0.0, 0, 4, 4),
      Array(2.0, 6, 6, 2), Array(1.0, 1, 3, 3))
    assert(u.length == 1)
    val ring = u(0)._1.zip(u(0)._2).toSet
    assert(ring == Set((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (6.0, 1.0),
      (6.0, 3.0), (4.0, 3.0), (4.0, 4.0), (0.0, 4.0)))
    // disjoint → two parts; containment → the container
    assert(graft.functions.PolyClip.union(
      Array(0.0, 1, 1, 0), Array(0.0, 0, 1, 1),
      Array(5.0, 6, 6, 5), Array(5.0, 5, 6, 6)).length == 2)
    val contained = graft.functions.PolyClip.union(
      Array(1.0, 2, 2, 1), Array(1.0, 1, 2, 2),
      Array(0.0, 9, 9, 0), Array(0.0, 0, 9, 9))
    assert(contained.length == 1 && contained(0)._1.toSet == Set(0.0, 9.0))
    // CW input normalizes: same result either winding
    val cw = graft.functions.PolyClip.union(
      Array(0.0, 0, 4, 4), Array(0.0, 4, 4, 0), // A reversed (CW)
      Array(2.0, 6, 6, 2), Array(1.0, 1, 3, 3))
    assert(cw(0)._1.zip(cw(0)._2).toSet == ring)
  }

  test("union/intersection satisfy inclusion-exclusion on rotated convex polygons") {
    // non-axis-aligned pair: a diamond and a triangle (generic position)
    def shoelace(xs: Array[Double], ys: Array[Double]): Double = {
      val n = xs.length
      math.abs((0 until n).map(i => xs(i) * ys((i + 1) % n) - xs((i + 1) % n) * ys(i)).sum) / 2
    }
    val (ax, ay) = (Array(3.0, 6, 3, 0), Array(0.0, 3, 6, 3)) // diamond, area 18
    val (bx, by) = (Array(4.25, 9.25, 4.25), Array(1.5, 1.5, 5.5)) // right triangle, area 10
    val (ix, iy) = graft.functions.PolyClip.clip(ax, ay, bx, by)
    val interArea = shoelace(ix, iy)
    assert(interArea > 0 && interArea < 10)
    val u = graft.functions.PolyClip.union(ax, ay, bx, by)
    assert(u.length == 1)
    val unionArea = shoelace(u(0)._1, u(0)._2)
    assert(math.abs(unionArea - (18.0 + 10.0 - interArea)) < 1e-9,
      s"inclusion-exclusion violated: union=$unionArea inter=$interArea")
  }

  test("polygon buffer is the Minkowski sum: vertex count, area identity, containment") {
    // triangle ⊕ 32-gon → 3 + 32 vertices; area = A + P·r + 16r²sin(π/16)
    val (xs, ys) = (Array(0.0, 4, 0), Array(0.0, 0, 3)) // 3-4-5 right triangle
    val r = 0.5
    val (bx, by) = graft.functions.PolyClip.minkowski32(xs, ys, r)
    assert(bx.length == 35)
    def shoelace(px: Array[Double], py: Array[Double]): Double = {
      val n = px.length
      math.abs((0 until n).map(i => px(i) * py((i + 1) % n) - px((i + 1) % n) * py(i)).sum) / 2
    }
    // exact Minkowski area = A + Σ_e len_e·h_K(n_e) + area(K), where the
    // 32-gon's support in the edge-normal direction is r·cos(δ_e), δ_e the
    // angle from the normal to the nearest 32-gon vertex (δ=0 only when a
    // vertex aligns, e.g. axis-aligned edges — the oracle query's case)
    val step = 2 * math.Pi / 32
    def support(nAngle: Double): Double = {
      val d = math.abs(nAngle / step - math.round(nAngle / step)) * step
      r * math.cos(d)
    }
    val n = xs.length
    val mixed = (0 until n).map { i =>
      val j = (i + 1) % n
      val ex = xs(j) - xs(i); val ey = ys(j) - ys(i)
      val len = math.hypot(ex, ey)
      len * support(math.atan2(-ex, ey)) // outward normal (ey,-ex) of a CCW edge
    }.sum
    val want = 6.0 + mixed + 16 * r * r * math.sin(math.Pi / 16)
    assert(math.abs(shoelace(bx, by) - want) < 1e-9)
    // contains every original vertex strictly
    assert(xs.zip(ys).forall { case (px, py) =>
      graft.functions.PolyClip.pointIn(bx, by, px, py) })
  }

  test("clipping expressions: codegen == interpreted") {
    val a = stPolygon(Seq(0.0, 4, 4, 0), Seq(0.0, 0, 4, 4))
    val b = stPolygon(Seq(2.25, 6.25, 6.25, 2.25), Seq(1.5, 1.5, 3.5, 3.5))
    val df = one.select(
      round(stAreaMulti(stUnionPoly(a, b)), 9).as("ua"),
      round(stArea(stIntersectionPoly(a, b)), 9).as("ia"),
      stNumPoints(stBufferPolygon(a, lit(0.5))).as("nb"))
    val cg = df.head()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp = df.head()
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    assert(cg == interp)
    assert(cg.getDouble(0) == 16.0 + 8.0 - 3.5 && cg.getDouble(1) == 3.5)
    assert(cg.getInt(2) == 36)
  }

  test("ST_Buffer(point, r): convex 32-gon containing the center, inside the r-envelope") {
    val buf = stBufferPoint(stPoint(lit(10.0), lit(20.0)), lit(2.0))
    assert(head(stGeometryType(buf)).getString(0) == "POLYGON")
    assert(head(stNumPoints(buf)).getInt(0) == 32)
    // contains its center, excludes points beyond the radius
    assert(head(stContains(buf, stPoint(lit(10.0), lit(20.0)))).getBoolean(0))
    assert(!head(stIntersects(buf, stPoint(lit(13.0), lit(20.0)))).getBoolean(0))
    // all vertices exactly at distance r (within fp tolerance)
    val maxDev = head(array_max(zip_with(
      buf.getField("xs"), buf.getField("ys"),
      (x, y) => abs(sqrt((x - 10.0) * (x - 10.0) + (y - 20.0) * (y - 20.0)) - 2.0)))).getDouble(0)
    assert(maxDev < 1e-12)
    // envelope is the r-box around the center
    val env = head(stEnvelope(buf)).getStruct(0)
    assert(env.getAs[Double]("xmin") >= 8.0 - 1e-12 && env.getAs[Double]("xmax") <= 12.0 + 1e-12)
    // buffers intersect when circles clearly overlap, not when clearly apart
    val near = stBufferPoint(stPoint(lit(13.0), lit(20.0)), lit(2.0)) // centers 3 apart, radii sum 4
    assert(head(stIntersects(buf, near)).getBoolean(0))
    val far = stBufferPoint(stPoint(lit(15.0), lit(20.0)), lit(2.0)) // centers 5 apart
    assert(!head(stIntersects(buf, far)).getBoolean(0))
  }
}
