package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exactness of polygon×polygon ST_Intersects on CONCAVE shapes — the case
  * an envelope-overlap fallback gets wrong (reference: the ESRI-backed
  * ST_Intersects in core/.../runtime/GeoFunctions.java is exact for all
  * kind pairs). The L-shaped hexagon's envelope is [2,22]² but its notch
  * (x>14, y>10) is outside the polygon, so a square in the notch overlaps
  * the envelope without intersecting the shape. */
class GeoExactnessSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.operators.Geo._

  private val one = spark.range(1).toDF()
  private def b(c: Column): Boolean = one.select(c).head().getBoolean(0)

  // L = ([2,22]×[2,10]) ∪ ([2,14]×[2,22])
  private val lShape = stPolygon(Seq(2.0, 22.0, 22.0, 14.0, 14.0, 2.0),
    Seq(2.0, 2.0, 10.0, 10.0, 22.0, 22.0))
  private def square(cx: Double, cy: Double, h: Double) =
    stPolygon(Seq(cx - h, cx + h, cx + h, cx - h), Seq(cy - h, cy - h, cy + h, cy + h))

  test("square in the notch: envelopes overlap, shapes do NOT intersect") {
    val notch = square(18.5, 16.25, 1.0)
    assert(b(stEnvelopesIntersect(lShape, notch)))
    assert(!b(stIntersects(lShape, notch)))
    assert(b(stDisjoint(lShape, notch)))
  }

  test("square crossing an L edge intersects (both argument orders)") {
    val crossing = square(14.5, 9.75, 1.0) // straddles the x=14 inner edge
    assert(b(stIntersects(lShape, crossing)))
    assert(b(stIntersects(crossing, lShape)))
  }

  test("containment without edge crossing intersects, both directions") {
    val inside = square(6.5, 6.25, 1.0) // fully inside the L
    assert(b(stIntersects(lShape, inside)))
    assert(b(stIntersects(inside, lShape)))
    val giant = square(12.0, 12.0, 30.0) // fully contains the L
    assert(b(stIntersects(lShape, giant)))
    assert(b(stIntersects(giant, lShape)))
  }

  test("disjoint with disjoint envelopes stays false") {
    assert(!b(stIntersects(lShape, square(40.0, 40.0, 1.0))))
  }

  test("geo_relations fixture contains discriminating notch rows") {
    // the oracle-verified registry query must actually exercise the case:
    // rows where env_concave = TRUE but int_concave = FALSE
    val df = SparkEntry.queries("geo_relations")(spark, sfDir)
    val n = df.where(col("env_concave") && !col("int_concave")).count()
    assert(n > 0, "no envelope-overlap-but-disjoint rows in fixture")
  }
}
