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
