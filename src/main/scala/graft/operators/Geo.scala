package graft.operators

import graft.{QDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Spatial function surface — the reference's geo pack
  * (reference: core/src/main/java/org/apache/calcite/runtime/GeoFunctions.java —
  * ST_Point/ST_MakeLine/ST_AsText/ST_GeomFromText, ST_X/ST_Y, ST_Distance,
  * ST_DWithin, ST_Contains/ST_Within, ST_Envelope/ST_EnvelopesIntersect,
  * ST_GeometryType; registered through SqlGeoFunctions).
  *
  * Spark-first design: a geometry is a plain struct column
  * `(kind string, xs array<double>, ys array<double>)` — POINT is a
  * 1-element ring, LINESTRING/POLYGON carry their vertex arrays. Every
  * accessor/predicate below composes Spark built-ins (codegen'd), except
  * polygon containment, which is the native [[graft.functions.RayCastContains]]
  * expression. No geometry library, no UDF — the whole surface stays inside
  * WholeStageCodegen and scales like any other projection. Multi-part
  * geometries (MULTILINESTRING/MULTIPOLYGON) use a collection struct
  * `(kind, parts array<struct<xs, ys>>)` bridged by ST_NumGeometries /
  * ST_GeometryN. ST_Buffer is implemented for POINT (32-gon) and
  * ST_Transform as the reference's SRID relabel; general line/polygon
  * buffering needs a geodesy kernel by nature.
  */
object Geo {
  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables.t(s, dir, n)

  // ---- constructors ------------------------------------------------------
  def stPoint(x: Column, y: Column): Column =
    struct(lit("POINT").as("kind"), array(x.cast("double")).as("xs"),
      array(y.cast("double")).as("ys"))

  def stMakeLine(points: Column*): Column =
    struct(lit("LINESTRING").as("kind"),
      concat(points.map(_.getField("xs")): _*).as("xs"),
      concat(points.map(_.getField("ys")): _*).as("ys"))

  def stPolygon(xs: Seq[Double], ys: Seq[Double]): Column =
    struct(lit("POLYGON").as("kind"),
      array(xs.map(lit(_)): _*).as("xs"), array(ys.map(lit(_)): _*).as("ys"))

  /** WKT POINT parser (reference ST_PointFromText). Accepts both
    * `POINT (x y)` and the space-free `POINT(x y)` the reference's
    * spatial.iq goldens use. Line/polygon/multipoint parsing below;
    * [[stGeomFromText]] dispatches on the tag. */
  def stPointFromText(wkt: Column): Column = {
    val re = """POINT ?\(([-0-9.]+) ([-0-9.]+)\)"""
    stPoint(regexp_extract(wkt, re, 1).cast("double"),
      regexp_extract(wkt, re, 2).cast("double"))
  }

  /** WKT body "x y, x y, ..." → coordinate arrays (axis 0 = x, 1 = y).
    * Pure Spark built-ins (split/transform/cast), fully codegen'd. */
  private def wktAxis(body: Column, axis: Int): Column =
    transform(split(body, ","),
      p => element_at(split(trim(p), " +"), axis + 1).cast("double"))

  /** ST_LineFromText (reference GeoFunctions ST_LineFromText):
    * `LINESTRING (x y, x y, ...)`. */
  def stLineFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """LINESTRING ?\(([^)]*)\)""", 1)
    struct(lit("LINESTRING").as("kind"),
      wktAxis(body, 0).as("xs"), wktAxis(body, 1).as("ys"))
  }

  /** ST_PolyFromText (reference ST_PolyFromText): single-ring
    * `POLYGON ((x y, ...))` — the struct model is single-ring by
    * construction (holes need a geometry kernel by nature). */
  def stPolyFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """POLYGON ?\(\(([^)]*)\)\)""", 1)
    struct(lit("POLYGON").as("kind"),
      wktAxis(body, 0).as("xs"), wktAxis(body, 1).as("ys"))
  }

  /** ST_MPointFromText (reference ST_MPointFromText):
    * `MULTIPOINT (x y, x y, ...)`. */
  def stMPointFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """MULTIPOINT ?\(([^)]*)\)""", 1)
    struct(lit("MULTIPOINT").as("kind"),
      wktAxis(body, 0).as("xs"), wktAxis(body, 1).as("ys"))
  }

  /** WKT polygon WITH HOLES (r10 VERDICT #5): `POLYGON ((outer), (hole),
    * …)` parsed as ONE value — the first ring is the shell, the rest are
    * holes, lowered onto the difference-composition (PolyClip.holesRow:
    * decompose outer, fold-subtract each hole) so the result is the
    * standard disjoint-convex-parts MULTIPOLYGON struct every other op
    * (area, contains, clip, union, buffer) consumes unchanged. Ring
    * orientation is normalized inside the kernel, so both OGC's CW-hole
    * convention and CCW holes parse identically.
    * Reference surface: runtime/GeoFunctions.java ESRI-backed multi-ring
    * polygons. */
  def stPolygonHolesFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """POLYGON ?\((.*)\)""", 1)
    val rings = transform(split(body, """\), ?\("""),
      p => regexp_replace(p, """[()]""", ""))
    val outer = element_at(rings, 1)
    val holes = slice(rings, lit(2), greatest(size(rings) - 1, lit(0)))
    val r = graft.functions.PolyClip.st_polygon_holes_parts(
      wktAxis(outer, 0), wktAxis(outer, 1),
      transform(holes, h => wktAxis(h, 0)),
      transform(holes, h => wktAxis(h, 1)))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** Point containment over a disjoint-parts geometry (a point is inside
    * a polygon-with-holes iff it is inside one of the disjoint pieces —
    * holes are REMOVED regions, not flags). */
  def stContainsMulti(g: Column, px: Column, py: Column): Column =
    exists(g.getField("parts"), p =>
      graft.functions.RayCastContains.st_contains_ring(
        p.getField("xs"), p.getField("ys"), px, py))

  /** General ST_GeomFromText: dispatch on the WKT tag (reference
    * GeoFunctions ST_GeomFromText accepts any kind). */
  def stGeomFromText(wkt: Column): Column =
    when(wkt.startsWith("POINT"), stPointFromText(wkt))
      .when(wkt.startsWith("LINESTRING"), stLineFromText(wkt))
      .when(wkt.startsWith("POLYGON"), stPolyFromText(wkt))
      .when(wkt.startsWith("MULTIPOINT"), stMPointFromText(wkt))

  // ---- multi-part geometries (reference ST_MLineFromText:158,
  // ST_MPolyFromText:169). A collection is a separate struct shape —
  // `(kind string, parts array<struct<xs array<double>, ys array<double>>>)`
  // — because a multi-geometry IS a list of single geometries; the OGC
  // accessors ST_NumGeometries / ST_GeometryN bridge back to the scalar
  // model. Parsing/rendering is split/transform/regexp built-ins — fully
  // codegen'd, no UDF. -----------------------------------------------------
  /** One delimited WKT part "x y, x y, ..." (parens stripped) → (xs, ys). */
  private def partStruct(body: Column): Column =
    struct(wktAxis(body, 0).as("xs"), wktAxis(body, 1).as("ys"))

  /** Split a multi-geometry body on the `), (`-style separator, strip
    * residual parens from the outermost parts, parse each part. */
  private def wktParts(body: Column, sep: String): Column =
    transform(split(body, sep),
      p => partStruct(regexp_replace(p, """[()]""", "")))

  /** ST_MLineFromText (reference GeoFunctions.java:158):
    * `MULTILINESTRING ((x y, ...), (x y, ...))`. */
  def stMLineFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """MULTILINESTRING ?\((.*)\)""", 1)
    struct(lit("MULTILINESTRING").as("kind"),
      wktParts(body, """\), ?\(""").as("parts"))
  }

  /** ST_MPolyFromText (reference GeoFunctions.java:169): single-ring
    * polygons `MULTIPOLYGON (((x y, ...)), ((x y, ...)))`. */
  def stMPolyFromText(wkt: Column): Column = {
    val body = regexp_extract(wkt, """MULTIPOLYGON ?\((.*)\)""", 1)
    struct(lit("MULTIPOLYGON").as("kind"),
      wktParts(body, """\)\), ?\(\(""").as("parts"))
  }

  /** OGC ST_NumGeometries over a collection struct. */
  def stNumGeometries(g: Column): Column = size(g.getField("parts"))

  /** OGC ST_GeometryN (1-based): part n of a collection as a scalar
    * geometry struct — MULTILINESTRING parts are LINESTRINGs,
    * MULTIPOLYGON parts are POLYGONs. */
  def stGeometryN(g: Column, n: Column): Column = {
    val part = element_at(g.getField("parts"), n)
    struct(
      when(g.getField("kind") === "MULTIPOLYGON", "POLYGON")
        .otherwise("LINESTRING").as("kind"),
      part.getField("xs").as("xs"), part.getField("ys").as("ys"))
  }

  /** WKT writer for collection structs (multi-part ST_AsText). */
  def stAsTextMulti(g: Column): Column = {
    val inner = transform(g.getField("parts"), p =>
      array_join(zip_with(p.getField("xs"), p.getField("ys"),
        (x, y) => concat(x.cast("string"), lit(" "), y.cast("string"))), ", "))
    when(g.getField("kind") === "MULTIPOLYGON",
      concat(lit("MULTIPOLYGON ((("),
        array_join(inner, ")), (("), lit(")))")))
      .otherwise(concat(lit("MULTILINESTRING (("),
        array_join(inner, "), ("), lit("))")))
  }

  // ---- accessors ---------------------------------------------------------
  def stX(g: Column): Column = g.getField("xs").getItem(0)
  def stY(g: Column): Column = g.getField("ys").getItem(0)
  def stGeometryType(g: Column): Column = g.getField("kind")
  def stNumPoints(g: Column): Column = size(g.getField("xs"))

  /** WKT writer (ST_AsText / ST_AsWKT): POINT (x y) / LINESTRING (x y, ...) /
    * POLYGON ((x y, ...)). */
  def stAsText(g: Column): Column = {
    val coords = array_join(zip_with(g.getField("xs"), g.getField("ys"),
      (x, y) => concat(x.cast("string"), lit(" "), y.cast("string"))), ", ")
    when(g.getField("kind") === "POINT", concat(lit("POINT ("), coords, lit(")")))
      .when(g.getField("kind") === "POLYGON", concat(lit("POLYGON (("), coords, lit("))")))
      .when(g.getField("kind") === "MULTIPOINT", concat(lit("MULTIPOINT ("), coords, lit(")")))
      .when(g.getField("kind") === "EMPTY", lit("GEOMETRYCOLLECTION EMPTY"))
      .otherwise(concat(lit("LINESTRING ("), coords, lit(")")))
  }

  /** ST_AsWKT — the reference's alias for ST_AsText
    * (GeoFunctions.java:96 `ST_AsText` delegates to `ST_AsWKT`). */
  def stAsWKT(g: Column): Column = stAsText(g)

  // ---- measures / predicates --------------------------------------------
  /** Euclidean point-point distance (planar, like the reference's default
    * non-geodesic path). */
  def stDistance(a: Column, b: Column): Column = {
    val dx = stX(a) - stX(b); val dy = stY(a) - stY(b)
    sqrt(dx * dx + dy * dy)
  }

  def stDWithin(a: Column, b: Column, d: Column): Column = stDistance(a, b) <= d

  /** Geodesic (sphere) distance in km between two lon/lat points —
    * haversine over the mean Earth radius. The reference treats geographic
    * distance as a separate code path from planar (GeoFunctions.java
    * ST_Distance notes); transcendental results are rounded at comparison
    * sites per the oracle discipline (JVM Math vs libm differ in the last
    * ulp). */
  def stDistanceSphere(a: Column, b: Column): Column = {
    val R = 6371.0
    val toRad = math.Pi / 180.0
    val lat1 = stY(a) * toRad; val lat2 = stY(b) * toRad
    val dLat = (stY(b) - stY(a)) * toRad
    val dLon = (stX(b) - stX(a)) * toRad
    val h = sin(dLat / 2) * sin(dLat / 2) +
      cos(lat1) * cos(lat2) * sin(dLon / 2) * sin(dLon / 2)
    lit(2 * R) * asin(sqrt(h))
  }

  /** Axis-aligned bounding box as (xmin, ymin, xmax, ymax). */
  def stEnvelope(g: Column): Column =
    struct(array_min(g.getField("xs")).as("xmin"), array_min(g.getField("ys")).as("ymin"),
      array_max(g.getField("xs")).as("xmax"), array_max(g.getField("ys")).as("ymax"))

  def stEnvelopesIntersect(a: Column, b: Column): Column = {
    val ea = stEnvelope(a); val eb = stEnvelope(b)
    ea.getField("xmin") <= eb.getField("xmax") && eb.getField("xmin") <= ea.getField("xmax") &&
      ea.getField("ymin") <= eb.getField("ymax") && eb.getField("ymin") <= ea.getField("ymax")
  }

  /** Containment by container kind: a POINT contains only a coincident
    * POINT (spatial.iq:632-641); a POLYGON contains a point via the native
    * ray-casting expression. */
  def stContains(container: Column, point: Column): Column =
    when(container.getField("kind") === "POINT",
      point.getField("kind") === "POINT" &&
        stX(container) === stX(point) && stY(container) === stY(point))
      .otherwise(graft.functions.RayCastContains.st_contains_ring(
        container.getField("xs"), container.getField("ys"), stX(point), stY(point)))

  def stWithin(point: Column, poly: Column): Column = stContains(poly, point)

  // ---- relation predicates (GeoFunctions.java ST_Equals/Disjoint/
  // Intersects/OrderingEquals, ST_GeometryTypeCode, ST_Boundary) ----------
  /** Vertex-sequence equality. In this struct model a geometry IS its
    * vertex arrays, so ST_Equals and ST_OrderingEquals coincide (the
    * reference distinguishes topological equality, which needs a geometry
    * kernel by nature). */
  def stEquals(a: Column, b: Column): Column =
    a.getField("kind") === b.getField("kind") &&
      a.getField("xs") === b.getField("xs") && a.getField("ys") === b.getField("ys")

  def stOrderingEquals(a: Column, b: Column): Column = stEquals(a, b)

  /** A geometry's ring closed for edge iteration: the first vertex
    * appended, so segment k..k+1 enumeration covers the closing edge. For
    * a POINT the same concat yields the degenerate 2-vertex segment
    * `[x,x]` the segment kernel treats as a point (collinear/on-segment
    * branch). */
  private def closedXs(g: Column): Column =
    concat(g.getField("xs"), slice(g.getField("xs"), 1, 1))
  private def closedYs(g: Column): Column =
    concat(g.getField("ys"), slice(g.getField("ys"), 1, 1))

  /** Point lies on any edge of the polyline/ring (exact orientation test;
    * the point travels as a degenerate segment). */
  private def pointOnEdges(xs: Column, ys: Column, p: Column): Column =
    graft.functions.SegmentsIntersect.segments_intersect(
      xs, ys, closedXs(p), closedYs(p))

  /** Line meets polygon: an edge of the line intersects the closed
    * boundary ring, or the line lies entirely inside (tested by its first
    * vertex — if no edge crosses the ring, all vertices are on one side). */
  private def lineMeetsPolygon(line: Column, poly: Column): Column =
    graft.functions.SegmentsIntersect.segments_intersect(
      line.getField("xs"), line.getField("ys"), closedXs(poly), closedYs(poly)) ||
      graft.functions.RayCastContains.st_contains_ring(
        poly.getField("xs"), poly.getField("ys"), stX(line), stY(line))

  /** Intersection test, exact per kind pair via the native kernels
    * (ADVICE r3): point/point coordinate equality; point×line the
    * degenerate-segment on-edge test; point×polygon ray-cast interior OR
    * boundary contact; line×line the segment-intersection kernel;
    * line×polygon edge×ring OR containment; polygon×polygon ring×ring OR
    * either-contains-the-other (first-vertex test — exact for simple
    * polygons, which is all this struct model constructs). Only synthetic
    * kinds with no interior semantics (MULTIPOINT boundaries, EMPTY) fall
    * back to envelope overlap — the conservative first-stage filter of any
    * spatial join at scale. */
  def stIntersects(a: Column, b: Column): Column = {
    val ka = a.getField("kind"); val kb = b.getField("kind")
    def ptPoly(pt: Column, poly: Column): Column =
      stContains(poly, pt) ||
        pointOnEdges(closedXs(poly), closedYs(poly), pt)
    when(ka === "POINT" && kb === "POINT",
        stX(a) === stX(b) && stY(a) === stY(b))
      .when(ka === "POLYGON" && kb === "POINT", ptPoly(b, a))
      .when(ka === "POINT" && kb === "POLYGON", ptPoly(a, b))
      .when(ka === "POINT" && kb === "LINESTRING",
        pointOnEdges(b.getField("xs"), b.getField("ys"), a))
      .when(ka === "LINESTRING" && kb === "POINT",
        pointOnEdges(a.getField("xs"), a.getField("ys"), b))
      .when(ka === "LINESTRING" && kb === "LINESTRING",
        graft.functions.SegmentsIntersect.segments_intersect(
          a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys")))
      .when(ka === "LINESTRING" && kb === "POLYGON", lineMeetsPolygon(a, b))
      .when(ka === "POLYGON" && kb === "LINESTRING", lineMeetsPolygon(b, a))
      .when(ka === "POLYGON" && kb === "POLYGON",
        graft.functions.SegmentsIntersect.segments_intersect(
          closedXs(a), closedYs(a), closedXs(b), closedYs(b)) ||
          graft.functions.RayCastContains.st_contains_ring(
            a.getField("xs"), a.getField("ys"), stX(b), stY(b)) ||
          graft.functions.RayCastContains.st_contains_ring(
            b.getField("xs"), b.getField("ys"), stX(a), stY(a)))
      .otherwise(stEnvelopesIntersect(a, b))
  }

  def stDisjoint(a: Column, b: Column): Column = !stIntersects(a, b)

  /** Transversal line crossing (spatial.iq:661-666): a strict-orientation
    * segment intersection — equal to DE-9IM CROSSES for 1D×1D geometries
    * without collinear overlap. */
  def stCrosses(a: Column, b: Column): Column =
    graft.functions.SegmentsIntersect.segments_cross_proper(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))

  /** Boundary-only contact for lines: they intersect but never cross
    * transversally (endpoint/collinear contact only). Collinear INTERIOR
    * overlap — DE-9IM OVERLAPS, not TOUCHES — is reported as touches by
    * this 1D model; full DE-9IM needs a geometry kernel by nature. */
  def stTouches(a: Column, b: Column): Column =
    stIntersects(a, b) && !stCrosses(a, b)

  /** Point interior-or-boundary test against a polygon. */
  private def ptCoveredBy(pt: Column, poly: Column): Column =
    stContains(poly, pt) || pointOnEdges(closedXs(poly), closedYs(poly), pt)

  /** ST_Covers (reference GeoFunctions.java ST_Covers): geometry `a`
    * covers `b` when no point of `b` lies outside `a` — boundary contact
    * allowed (unlike ST_Contains' interior requirement). POINT argument:
    * interior-or-boundary; vertex geometries: every vertex of `b` is
    * covered AND the boundaries never properly cross. Exact for the
    * simple convex shapes this struct model constructs; general DE-9IM
    * coverage needs a geometry kernel by nature. */
  def stCovers(a: Column, b: Column): Column =
    when(b.getField("kind") === "POINT", ptCoveredBy(b, a))
      .otherwise(
        forall(zip_with(b.getField("xs"), b.getField("ys"),
          (x, y) => struct(x.as("x"), y.as("y"))), v =>
          graft.functions.RayCastContains.st_contains_ring(
            a.getField("xs"), a.getField("ys"), v.getField("x"), v.getField("y")) ||
            graft.functions.SegmentsIntersect.segments_intersect(
              closedXs(a), closedYs(a),
              array(v.getField("x"), v.getField("x")),
              array(v.getField("y"), v.getField("y")))) &&
          !graft.functions.SegmentsIntersect.segments_cross_proper(
            closedXs(a), closedYs(a), closedXs(b), closedYs(b)))

  /** ST_ContainsProperly: interior containment with NO boundary contact
    * (reference ST_ContainsProperly). */
  def stContainsProperly(a: Column, pt: Column): Column =
    graft.functions.RayCastContains.st_contains_ring(
      a.getField("xs"), a.getField("ys"), stX(pt), stY(pt)) &&
      !pointOnEdges(closedXs(a), closedYs(a), pt)

  /** ST_Overlaps: same dimension, interiors intersect, neither covers the
    * other (DE-9IM OVERLAPS for the model's simple shapes). */
  def stOverlaps(a: Column, b: Column): Column =
    a.getField("kind") === b.getField("kind") &&
      stIntersects(a, b) && !stCovers(a, b) && !stCovers(b, a)

  /** ST_MakePoint — alias constructor (reference :ST_MakePoint). */
  def stMakePoint(x: Column, y: Column): Column = stPoint(x, y)

  /** 2D model: ST_Z is NULL, ST_Is3D is false (reference returns null/z
    * presence from the ESRI point; this model is planar by construction). */
  def stZ(g: Column): Column = lit(null).cast("double")
  def stIs3D(g: Column): Column = lit(false)

  /** SRID plumbing. The reference's ST_SetSRID AND ST_Transform both call
    * `geom.transform(srid)` — an SRID RELABEL with no coordinate math
    * (reference: runtime/GeoFunctions.java:510-517) — so both are exact
    * here: the geometry struct gains/changes its srid field, coordinates
    * untouched. */
  def stSetSrid(g: Column, srid: Column): Column =
    struct(g.getField("kind").as("kind"), g.getField("xs").as("xs"),
      g.getField("ys").as("ys"), srid.cast("int").as("srid"))
  def stTransform(g: Column, srid: Column): Column = stSetSrid(g, srid)
  def stSrid(g: Column): Column = g.getField("srid")

  /** ST_Union for POINT/MULTIPOINT arguments — the exactly-implementable
    * subset: the union of two point sets is their deduplicated MULTIPOINT
    * (reference GeoFunctions ST_Union delegates to the ESRI union; for
    * point inputs that IS set union). Polygon/line union needs a clipping
    * kernel by nature and stays out of scope, like ST_Buffer's general
    * case. */
  def stUnionPoints(a: Column, b: Column): Column = {
    val pairs = array_distinct(concat(
      zip_with(a.getField("xs"), a.getField("ys"), (x, y) => struct(x.as("x"), y.as("y"))),
      zip_with(b.getField("xs"), b.getField("ys"), (x, y) => struct(x.as("x"), y.as("y")))))
    struct(lit("MULTIPOINT").as("kind"),
      transform(pairs, p => p.getField("x")).as("xs"),
      transform(pairs, p => p.getField("y")).as("ys"))
  }

  /** ST_Buffer of a POINT: a regular 32-gon of radius r — a DOCUMENTED
    * deterministic approximation of the reference's ESRI circle buffer
    * (reference GeoFunctions ST_Buffer; ESRI itself approximates the
    * circle with a segment count). Composes with the exact predicates:
    * the polygon is convex, contains the center, and lies within the
    * r-envelope (GeoBufferUnionSpec). */
  def stBufferPoint(p: Column, r: Column): Column = {
    val ks = sequence(lit(0), lit(31))
    struct(lit("POLYGON").as("kind"),
      transform(ks, k => stX(p) + r * cos(k.cast("double") * (2 * math.Pi / 32))).as("xs"),
      transform(ks, k => stY(p) + r * sin(k.cast("double") * (2 * math.Pi / 32))).as("ys"))
  }

  // ---- clipping kernels: area / intersection / union / buffer ------------
  // (reference GeoFunctions ST_Intersection/ST_Union/ST_Buffer via ESRI;
  // here native kernels over the struct geometry — functions/PolyClip.)

  /** Shoelace area of a {xs, ys} ring (closing edge implied). */
  def stArea(g: Column): Column = {
    val xs = g.getField("xs"); val ys = g.getField("ys")
    val n = size(xs)
    when(n < 3, lit(0.0)).otherwise(
      abs(aggregate(sequence(lit(1), n), lit(0.0), (acc, i) => {
        val j = when(i === n, lit(1)).otherwise(i + 1)
        acc + element_at(xs, i) * element_at(ys, j) -
          element_at(xs, j) * element_at(ys, i)
      })) / 2)
  }

  /** Total area of a multi-part geometry (parts representation). */
  def stAreaMulti(g: Column): Column =
    aggregate(transform(g.getField("parts"), p => stArea(p)), lit(0.0), _ + _)

  /** ST_Intersection of a polygon with a CONVEX polygon — exact
    * Sutherland–Hodgman clipping (empty ring when disjoint). */
  def stIntersectionPoly(a: Column, b: Column): Column = {
    val r = graft.functions.PolyClip.st_intersection_rings(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    struct(lit("POLYGON").as("kind"),
      r.getField("xs").as("xs"), r.getField("ys").as("ys"))
  }

  /** ST_Union of two CONVEX polygons (generic position): overlapping →
    * the traced union boundary (one part, possibly non-convex);
    * containment → the container; disjoint → two parts. */
  def stUnionPoly(a: Column, b: Column): Column = {
    val r = graft.functions.PolyClip.st_union_rings(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_Buffer of a LINESTRING: one 34-gon capsule per segment
    * (rectangle + two half-32-gon caps — the same 32-gon circle
    * discretization as the point buffer). */
  def stBufferLine(line: Column, r: Column): Column = {
    val b = graft.functions.PolyClip.st_buffer_ring(
      line.getField("xs"), line.getField("ys"), r.cast("double"), line = true)
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(b.getField("pxs"), b.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_Buffer of a CONVEX polygon: the exact Minkowski sum with the
    * regular 32-gon of circumradius r (n + 32 vertices). */
  def stBufferPolygon(poly: Column, r: Column): Column = {
    val b = graft.functions.PolyClip.st_buffer_ring(
      poly.getField("xs"), poly.getField("ys"), r.cast("double"), line = false)
    struct(lit("POLYGON").as("kind"),
      element_at(b.getField("pxs"), 1).as("xs"),
      element_at(b.getField("pys"), 1).as("ys"))
  }

  /** ST_Intersection accepting SIMPLE CONCAVE polygons (either side):
    * ear-clip + Hertel–Mehlhorn convex decomposition, Sutherland–Hodgman
    * per part pair; the result's parts are DISJOINT, so [[stAreaMulti]]
    * is the exact intersection area. */
  def stIntersectionConcave(a: Column, b: Column): Column = {
    val r = graft.functions.PolyClip.st_intersection_parts(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_Union accepting SIMPLE CONCAVE polygons: both sides decomposed,
    * then disjointified by iterated convex difference — part areas sum
    * to the exact union area (no inclusion-exclusion residue). */
  def stUnionConcave(a: Column, b: Column): Column = {
    val r = graft.functions.PolyClip.st_union_parts(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_Buffer accepting a SIMPLE CONCAVE polygon: Minkowski sums
    * distribute over union, so the buffer is the disjointified union of
    * each convex part's exact 32-gon Minkowski sum. */
  def stBufferConcave(poly: Column, r: Column): Column = {
    val b = graft.functions.PolyClip.st_buffer_parts(
      poly.getField("xs"), poly.getField("ys"), r.cast("double"))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(b.getField("pxs"), b.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_Difference A \ B (completes the clipping algebra — the
    * reference's 1.21 GeoFunctions stops at Union/Intersection/Buffer but
    * its ESRI backend carries OperatorDifference; PostGIS-standard op).
    * Accepts SIMPLE CONCAVE operands; result parts are DISJOINT, so
    * [[stAreaMulti]] is exact. Also the HOLE primitive: a polygon with
    * holes is difference(outer, hole…), and every other op then runs
    * over the resulting parts unchanged. */
  def stDifferenceConcave(a: Column, b: Column): Column = {
    val r = graft.functions.PolyClip.st_difference_parts(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** ST_SymDifference = (A \ B) ∪ (B \ A) — the two one-sided
    * differences are disjoint by construction, so their parts concatenate
    * without a union fold. */
  def stSymDifferenceConcave(a: Column, b: Column): Column = {
    val ab = graft.functions.PolyClip.st_difference_parts(
      a.getField("xs"), a.getField("ys"), b.getField("xs"), b.getField("ys"))
    val ba = graft.functions.PolyClip.st_difference_parts(
      b.getField("xs"), b.getField("ys"), a.getField("xs"), a.getField("ys"))
    struct(lit("MULTIPOLYGON").as("kind"),
      concat(
        zip_with(ab.getField("pxs"), ab.getField("pys"),
          (x, y) => struct(x.as("xs"), y.as("ys"))),
        zip_with(ba.getField("pxs"), ba.getField("pys"),
          (x, y) => struct(x.as("xs"), y.as("ys")))).as("parts"))
  }

  /** ST_Union over a COLLECTION of polygons (reference:
    * GeoFunctions.java:499 `ST_Union(geomCollection)` — the @SemiStrict
    * n-ary form): every ring decomposed (concave accepted), folded into
    * DISJOINT convex parts, so [[stAreaMulti]] is the exact union area.
    * The aggregate idiom is `collect_list(geom)` → this. */
  def stUnionCollection(gs: Column): Column = {
    val r = graft.functions.PolyClip.st_union_all_parts(
      transform(gs, g => g.getField("xs")),
      transform(gs, g => g.getField("ys")))
    struct(lit("MULTIPOLYGON").as("kind"),
      zip_with(r.getField("pxs"), r.getField("pys"),
        (x, y) => struct(x.as("xs"), y.as("ys"))).as("parts"))
  }

  /** OGC SFS type code (reference: GeoFunctions.Type enum). */
  def stGeometryTypeCode(g: Column): Column =
    when(g.getField("kind") === "POINT", 1)
      .when(g.getField("kind") === "LINESTRING", 2)
      .when(g.getField("kind") === "POLYGON", 3)
      .otherwise(0)

  /** Boundary: a polygon's boundary is its closed ring as a LINESTRING
    * (first vertex appended); a linestring's boundary is its endpoints
    * (MULTIPOINT); a point has an empty boundary. */
  def stBoundary(g: Column): Column =
    when(g.getField("kind") === "POLYGON",
      struct(lit("LINESTRING").as("kind"),
        concat(g.getField("xs"), slice(g.getField("xs"), 1, 1)).as("xs"),
        concat(g.getField("ys"), slice(g.getField("ys"), 1, 1)).as("ys")))
      .when(g.getField("kind") === "LINESTRING",
        struct(lit("MULTIPOINT").as("kind"),
          array(element_at(g.getField("xs"), 1),
            element_at(g.getField("xs"), -1)).as("xs"),
          array(element_at(g.getField("ys"), 1),
            element_at(g.getField("ys"), -1)).as("ys")))
      .otherwise(struct(lit("EMPTY").as("kind"),
        array().cast("array<double>").as("xs"),
        array().cast("array<double>").as("ys")))

  // ---- registry queries --------------------------------------------------
  val defs: Seq[QDef] = Seq(

    // Scalar geo surface over synthetic customer points. The polygon is a
    // DIAMOND, so the oracle can pin the general ray-casting implementation
    // with an L1-ball inequality; y-offset 0.25 keeps every test point off
    // the polygon edges (|dx|+|dy| is never exactly 8). All doubles are
    // exact binary fractions, so WKT text and sqrt distances agree
    // bit-for-bit across engines.
    QDef.sql("geo_functions",
      """SELECT c_custkey,
        |  px, py,
        |  concat('POINT (', CAST(px AS VARCHAR), ' ', CAST(py AS VARCHAR), ')') AS wkt,
        |  sqrt((px - 12.5) * (px - 12.5) + (py - 10.25) * (py - 10.25)) AS dist_center,
        |  sqrt((px - 12.5) * (px - 12.5) + (py - 10.25) * (py - 10.25)) <= 6.0 AS near_center,
        |  abs(px - 12.0) + abs(py - 10.0) < 8.0 AS in_diamond,
        |  'POINT' AS gtype
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 25 AS DOUBLE) + 0.5 AS px,
        |    CAST(c_nationkey AS DOUBLE) + 0.25 AS py
        |  FROM customer)""") { (s, dir) =>
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 25).cast("double") + 0.5).as("px"),
        (col("c_nationkey").cast("double") + 0.25).as("py"))
      val p = stPoint(col("px"), col("py"))
      val center = stPoint(lit(12.5), lit(10.25))
      val diamond = stPolygon(Seq(4.0, 12.0, 20.0, 12.0), Seq(10.0, 2.0, 10.0, 18.0))
      pts.select(col("c_custkey"), col("px"), col("py"),
        stAsText(p).as("wkt"),
        stDistance(p, center).as("dist_center"),
        stDWithin(p, center, lit(6.0)).as("near_center"),
        stContains(diamond, p).as("in_diamond"),
        stGeometryType(p).as("gtype"))
    },

    // Geodesic distances: nation "capitals" as lon/lat points, pairwise
    // haversine km to a fixed reference point. Rounded to 6 decimals —
    // sin/cos/asin differ between JVM Math and libm in the last ulp.
    QDef.sql("geo_haversine",
      """SELECT n_nationkey,
        |  round(2 * 6371.0 * asin(sqrt(
        |    sin((lat - 48.5) * pi() / 180.0 / 2) * sin((lat - 48.5) * pi() / 180.0 / 2)
        |    + cos(48.5 * pi() / 180.0) * cos(lat * pi() / 180.0)
        |      * sin((lon - 2.25) * pi() / 180.0 / 2) * sin((lon - 2.25) * pi() / 180.0 / 2)
        |  )), 6) AS dist_km
        |FROM (
        |  SELECT n_nationkey,
        |    CAST(n_nationkey * 13 % 360 - 180 AS DOUBLE) + 0.25 AS lon,
        |    CAST(n_nationkey * 7 % 140 - 70 AS DOUBLE) + 0.5 AS lat
        |  FROM nation)
        |ORDER BY n_nationkey""") { (s, dir) =>
      val pts = t(s, dir, "nation").select(col("n_nationkey"),
        ((col("n_nationkey") * 13 % 360 - 180).cast("double") + 0.25).as("lon"),
        ((col("n_nationkey") * 7 % 140 - 70).cast("double") + 0.5).as("lat"))
      val p = stPoint(col("lon"), col("lat"))
      val ref = stPoint(lit(2.25), lit(48.5))
      pts.select(col("n_nationkey"),
          round(stDistanceSphere(p, ref), 6).as("dist_km"))
        .orderBy(col("n_nationkey"))
    },

    // Relation predicates: equality, intersects/disjoint by kind, OGC
    // type codes, and boundaries (polygon ring closure / line endpoints).
    // The per-row line from each customer point to a fixed reference pins
    // ST_Boundary + the MULTIPOINT WKT writer; every coordinate is an
    // exact binary fraction so the text compares bit-for-bit.
    //
    // int_concave/env_concave pin EXACT polygon×polygon intersection on a
    // CONCAVE pair: a fixed L-shaped hexagon vs a per-customer 2×2 square.
    // The L is the union of two axis-aligned rectangles, so the oracle is
    // closed-form rectangle arithmetic; the engine runs the general
    // segments-cross-OR-either-contains-a-vertex kernels. Customers whose
    // square sits in the L's notch (x>14, y>10) have env_concave = TRUE but
    // int_concave = FALSE — the case an envelope-overlap fallback gets
    // wrong (GeoExactnessSpec asserts such rows exist). L edges lie on
    // integers while square edges sit at .5/.25 offsets, so no boundary
    // ever touches and strict-vs-inclusive contact is never ambiguous.
    QDef.sql("geo_relations",
      """SELECT c_custkey,
        |  (px = 2.5 AND py = 3.25) AS eq_ref,
        |  abs(px - 12.0) + abs(py - 10.0) < 8.0 AS int_diamond,
        |  NOT (abs(px - 12.0) + abs(py - 10.0) < 8.0) AS disj_diamond,
        |  (px + 1 > 2 AND px - 1 < 22 AND py + 1 > 2 AND py - 1 < 10)
        |    OR (px + 1 > 2 AND px - 1 < 14 AND py + 1 > 2 AND py - 1 < 22)
        |    AS int_concave,
        |  (px + 1 > 2 AND px - 1 < 22 AND py + 1 > 2 AND py - 1 < 22)
        |    AS env_concave,
        |  1 AS code_pt, 3 AS code_poly, 2 AS line_pts,
        |  'MULTIPOINT (' || CAST(px AS VARCHAR) || ' ' || CAST(py AS VARCHAR)
        |    || ', 2.5 3.25)' AS line_boundary,
        |  'GEOMETRYCOLLECTION EMPTY' AS point_boundary
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 25 AS DOUBLE) + 0.5 AS px,
        |    CAST(c_nationkey AS DOUBLE) + 0.25 AS py
        |  FROM customer)""") { (s, dir) =>
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 25).cast("double") + 0.5).as("px"),
        (col("c_nationkey").cast("double") + 0.25).as("py"))
      val p = stPoint(col("px"), col("py"))
      val ref = stPoint(lit(2.5), lit(3.25))
      val diamond = stPolygon(Seq(4.0, 12.0, 20.0, 12.0), Seq(10.0, 2.0, 10.0, 18.0))
      // L-shape = ([2,22]×[2,10]) ∪ ([2,14]×[2,22]); its envelope is
      // [2,22]² but the notch (14,22]×(10,22] is OUTSIDE the polygon.
      val lShape = stPolygon(Seq(2.0, 22.0, 22.0, 14.0, 14.0, 2.0),
        Seq(2.0, 2.0, 10.0, 10.0, 22.0, 22.0))
      val square = struct(lit("POLYGON").as("kind"),
        array(col("px") - 1, col("px") + 1, col("px") + 1, col("px") - 1).as("xs"),
        array(col("py") - 1, col("py") - 1, col("py") + 1, col("py") + 1).as("ys"))
      val line = stMakeLine(p, ref)
      pts.select(col("c_custkey"),
        stEquals(p, ref).as("eq_ref"),
        stIntersects(p, diamond).as("int_diamond"),
        stDisjoint(p, diamond).as("disj_diamond"),
        stIntersects(lShape, square).as("int_concave"),
        stEnvelopesIntersect(lShape, square).as("env_concave"),
        stGeometryTypeCode(p).as("code_pt"),
        stGeometryTypeCode(diamond).as("code_poly"),
        stNumPoints(line).as("line_pts"),
        stAsText(stBoundary(line)).as("line_boundary"),
        stAsText(stBoundary(p)).as("point_boundary"))
    },

    // ST_Covers / ST_ContainsProperly / ST_Overlaps + Z/SRID plumbing —
    // the reference's remaining exactly-implementable relation surface.
    // The fixture's half-integer coordinates sit strictly off the test
    // square's integer borders, so inclusive-vs-strict boundary behavior
    // is never ambiguous in the oracle arithmetic.
    QDef.sql("geo_coverage",
      """SELECT c_custkey,
        |  px BETWEEN 8 AND 16 AND py BETWEEN 6 AND 14 AS covers_pt,
        |  px > 8 AND px < 16 AND py > 6 AND py < 14 AS containsp_pt,
        |  px - 3 >= 8 AND px + 3 <= 16 AND py - 3 >= 6 AND py + 3 <= 14 AS covers_sq,
        |  (px + 3 >= 8 AND px - 3 <= 16 AND py + 3 >= 6 AND py - 3 <= 14)
        |    AND NOT (px - 3 >= 8 AND px + 3 <= 16 AND py - 3 >= 6 AND py + 3 <= 14)
        |    AND NOT (px - 3 <= 8 AND px + 3 >= 16 AND py - 3 <= 6 AND py + 3 >= 14)
        |    AS overlaps_sq,
        |  TRUE AS z_is_null, FALSE AS is3d, 3857 AS srid_out
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 25 AS DOUBLE) + 0.5 AS px,
        |    CAST(c_nationkey AS DOUBLE) + 0.25 AS py
        |  FROM customer)""") { (s, dir) =>
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 25).cast("double") + 0.5).as("px"),
        (col("c_nationkey").cast("double") + 0.25).as("py"))
      val p = stPoint(col("px"), col("py"))
      val sqA = stPolygon(Seq(8.0, 16.0, 16.0, 8.0), Seq(6.0, 6.0, 14.0, 14.0))
      val psq = struct(lit("POLYGON").as("kind"),
        array(col("px") - 3, col("px") + 3, col("px") + 3, col("px") - 3).as("xs"),
        array(col("py") - 3, col("py") - 3, col("py") + 3, col("py") + 3).as("ys"))
      pts.select(col("c_custkey"),
        stCovers(sqA, p).as("covers_pt"),
        stContainsProperly(sqA, p).as("containsp_pt"),
        stCovers(sqA, psq).as("covers_sq"),
        stOverlaps(sqA, psq).as("overlaps_sq"),
        stZ(p).isNull.as("z_is_null"),
        stIs3D(p).as("is3d"),
        stSrid(stTransform(stSetSrid(p, lit(4326)), lit(3857))).as("srid_out"))
    },

    // WKT constructor family (reference ST_LineFromText / ST_PolyFromText /
    // ST_MPointFromText / general ST_GeomFromText): WKT text is BUILT from
    // fixture columns, PARSED by the constructors, and the parsed
    // geometries are interrogated — coordinates echo the source columns,
    // kinds dispatch correctly, the WKT writer round-trips the text, and a
    // containment test runs on the parsed polygon. All coordinates are
    // exact binary fractions; the probe point (2.75, 3.375) never lands on
    // a parsed square's edge (px±1 are .5 offsets, py±1 are .25/.75
    // offsets), so strict interior containment is unambiguous.
    QDef.sql("geo_wkt",
      """SELECT c_custkey,
        |  'LINESTRING' AS lkind, 2 AS ln, px AS lx1, 3.25 AS ly2,
        |  'POLYGON' AS pkind, 4 AS pn, TRUE AS poly_rt,
        |  (px - 1 < 2.75 AND 2.75 < px + 1 AND py - 1 < 3.375 AND 3.375 < py + 1)
        |    AS contains_probe,
        |  'MULTIPOINT' AS mkind, 2 AS mn, 0.5 AS m_last_x
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 25 AS DOUBLE) + 0.5 AS px,
        |    CAST(c_nationkey AS DOUBLE) + 0.25 AS py
        |  FROM customer)""") { (s, dir) =>
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 25).cast("double") + 0.5).as("px"),
        (col("c_nationkey").cast("double") + 0.25).as("py"))
      def str(c: Column): Column = c.cast("string")
      val wktLine = concat(lit("LINESTRING ("), str(col("px")), lit(" "),
        str(col("py")), lit(", 2.5 3.25)"))
      val wktPoly = concat(lit("POLYGON (("),
        str(col("px") - 1), lit(" "), str(col("py") - 1), lit(", "),
        str(col("px") + 1), lit(" "), str(col("py") - 1), lit(", "),
        str(col("px") + 1), lit(" "), str(col("py") + 1), lit(", "),
        str(col("px") - 1), lit(" "), str(col("py") + 1), lit("))"))
      val wktMp = concat(lit("MULTIPOINT ("), str(col("px")), lit(" "),
        str(col("py")), lit(", 0.5 0.25)"))
      val line = stGeomFromText(wktLine)
      val poly = stGeomFromText(wktPoly)
      val mp = stGeomFromText(wktMp)
      pts.select(col("c_custkey"),
        stGeometryType(line).as("lkind"),
        stNumPoints(line).as("ln"),
        stX(line).as("lx1"),
        element_at(line.getField("ys"), -1).as("ly2"),
        stGeometryType(poly).as("pkind"),
        stNumPoints(poly).as("pn"),
        (stAsText(poly) === wktPoly).as("poly_rt"),
        stContains(poly, stPoint(lit(2.75), lit(3.375))).as("contains_probe"),
        stGeometryType(mp).as("mkind"),
        stNumPoints(mp).as("mn"),
        element_at(mp.getField("xs"), -1).as("m_last_x"))
    },

    // Multi-part constructor family (reference ST_MLineFromText /
    // ST_MPolyFromText, GeoFunctions.java:158,169): WKT built from fixture
    // columns, parsed into collection structs, interrogated through the
    // OGC accessors (NumGeometries / GeometryN), round-tripped through the
    // multi writer, and a part extracted by GeometryN is run through the
    // scalar predicates (point-in-extracted-polygon). All coordinates are
    // exact binary fractions; the probe (2.75, 3.375) sits strictly off
    // every parsed edge (.5/.25 offsets), so containment is unambiguous.
    QDef.sql("geo_multi",
      """SELECT c_custkey,
        |  'MULTILINESTRING' AS mlkind, 2 AS ml_n, 2 AS ml_p1_n,
        |  px AS ml_p1_x1, 3.25 AS ml_p2_y2, TRUE AS ml_rt,
        |  'MULTIPOLYGON' AS mpkind, 2 AS mp_n, 'POLYGON' AS mp_p2_kind,
        |  (px - 1 < 2.75 AND 2.75 < px + 1 AND py - 1 < 3.375 AND 3.375 < py + 1)
        |    AS probe_in_p1,
        |  TRUE AS mp_rt
        |FROM (
        |  SELECT c_custkey,
        |    CAST(c_custkey % 25 AS DOUBLE) + 0.5 AS px,
        |    CAST(c_nationkey AS DOUBLE) + 0.25 AS py
        |  FROM customer)""") { (s, dir) =>
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") % 25).cast("double") + 0.5).as("px"),
        (col("c_nationkey").cast("double") + 0.25).as("py"))
      def str(c: Column): Column = c.cast("string")
      val wktMl = concat(lit("MULTILINESTRING (("), str(col("px")), lit(" "),
        str(col("py")), lit(", 2.5 3.25), (0.5 0.25, "), str(col("px")),
        lit(" 3.25))"))
      val wktMp = concat(lit("MULTIPOLYGON ((("),
        str(col("px") - 1), lit(" "), str(col("py") - 1), lit(", "),
        str(col("px") + 1), lit(" "), str(col("py") - 1), lit(", "),
        str(col("px") + 1), lit(" "), str(col("py") + 1), lit(", "),
        str(col("px") - 1), lit(" "), str(col("py") + 1),
        lit(")), ((20.5 20.25, 22.5 20.25, 22.5 22.25, 20.5 22.25)))"))
      val ml = stMLineFromText(wktMl)
      val mp = stMPolyFromText(wktMp)
      val p1 = stGeometryN(mp, lit(1))
      pts.select(col("c_custkey"),
        stGeometryType(ml).as("mlkind"),
        stNumGeometries(ml).as("ml_n"),
        stNumPoints(stGeometryN(ml, lit(1))).as("ml_p1_n"),
        stX(stGeometryN(ml, lit(1))).as("ml_p1_x1"),
        element_at(stGeometryN(ml, lit(2)).getField("ys"), -1).as("ml_p2_y2"),
        (stAsTextMulti(ml) === wktMl).as("ml_rt"),
        stGeometryType(mp).as("mpkind"),
        stNumGeometries(mp).as("mp_n"),
        stGeometryType(stGeometryN(mp, lit(2))).as("mp_p2_kind"),
        stContains(p1, stPoint(lit(2.75), lit(3.375))).as("probe_in_p1"),
        (stAsTextMulti(mp) === wktMp).as("mp_rt"))
    },

    // Spatial theta-join: customers within radius 4 of each nation's
    // synthetic centroid — the ST_DWithin join shape (pair generation by
    // distance predicate), counted per nation.
    QDef.sql("geo_dwithin_join",
      """SELECT n_nationkey, count(*) AS n_near
        |FROM nation, customer
        |WHERE sqrt((CAST(c_custkey % 25 AS DOUBLE) + 0.5 - (CAST(n_nationkey AS DOUBLE) + 0.5))
        |         * (CAST(c_custkey % 25 AS DOUBLE) + 0.5 - (CAST(n_nationkey AS DOUBLE) + 0.5))
        |         + (CAST(c_nationkey AS DOUBLE) + 0.25 - (CAST(n_nationkey AS DOUBLE) + 0.25))
        |         * (CAST(c_nationkey AS DOUBLE) + 0.25 - (CAST(n_nationkey AS DOUBLE) + 0.25)))
        |      <= 4.0
        |GROUP BY n_nationkey ORDER BY n_nationkey""") { (s, dir) =>
      val cpt = t(s, dir, "customer").select(
        stPoint((col("c_custkey") % 25).cast("double") + 0.5,
          col("c_nationkey").cast("double") + 0.25).as("cp"))
      val npt = t(s, dir, "nation").select(col("n_nationkey"),
        stPoint(col("n_nationkey").cast("double") + 0.5,
          col("n_nationkey").cast("double") + 0.25).as("np"))
      npt.join(cpt, stDWithin(col("np"), col("cp"), lit(4.0)))
        .groupBy(col("n_nationkey")).agg(count(lit(1)).as("n_near"))
        .orderBy(col("n_nationkey"))
    },

    // ST_Union of convex polygons via the boundary-walk kernel, plus the
    // Sutherland–Hodgman intersection. Fixtures: per-nation axis-aligned
    // rectangles — A = [0,aw]×[0,12] with integer edges, B a 5×5 square at
    // .25-fraction offsets, so no edge coordinate is ever shared (generic
    // position) while the ORACLE is closed-form inclusion-exclusion
    // arithmetic. The engine runs the GENERAL convex kernels; the rectangle
    // choice only makes the expected values expressible. Offsets sweep
    // overlap, containment (B inside A → 1 part, union = A) and disjoint
    // (→ 2 parts). round(…,6) absorbs the parametric-intersection ulps;
    // true values are quarter-integers, far from any rounding boundary.
    QDef.sql("geo_union_poly",
      """SELECT n_nationkey,
        |  round(aw * 12.0 + 25.0 - ov, 6) AS union_area,
        |  round(ov, 6) AS inter_area,
        |  CASE WHEN ov = 0 THEN 2 ELSE 1 END AS n_parts
        |FROM (
        |  SELECT n_nationkey, aw, bx0, by0,
        |    greatest(least(aw, bx0 + 5) - greatest(0.0, bx0), 0)
        |      * greatest(least(12.0, by0 + 5) - greatest(0.0, by0), 0) AS ov
        |  FROM (
        |    SELECT n_nationkey,
        |      CAST(12 + n_nationkey % 3 AS DOUBLE) AS aw,
        |      CAST(n_nationkey * 3 % 23 - 4 AS DOUBLE) + 0.25 AS bx0,
        |      CAST(n_nationkey * 7 % 11 - 2 AS DOUBLE) + 0.25 AS by0
        |    FROM nation))
        |ORDER BY n_nationkey""") { (s, dir) =>
      val base = t(s, dir, "nation").select(col("n_nationkey"),
        (col("n_nationkey") % 3 + 12).cast("double").as("aw"),
        ((col("n_nationkey") * 3 % 23 - 4).cast("double") + 0.25).as("bx0"),
        ((col("n_nationkey") * 7 % 11 - 2).cast("double") + 0.25).as("by0"))
      val zero = lit(0.0)
      val rectA = struct(lit("POLYGON").as("kind"),
        array(zero, col("aw"), col("aw"), zero).as("xs"),
        array(zero, zero, lit(12.0), lit(12.0)).as("ys"))
      val rectB = struct(lit("POLYGON").as("kind"),
        array(col("bx0"), col("bx0") + 5, col("bx0") + 5, col("bx0")).as("xs"),
        array(col("by0"), col("by0"), col("by0") + 5, col("by0") + 5).as("ys"))
      val u = stUnionPoly(rectA, rectB)
      base.select(col("n_nationkey"),
        round(stAreaMulti(u), 6).as("union_area"),
        round(stArea(stIntersectionPoly(rectA, rectB)), 6).as("inter_area"),
        stNumGeometries(u).as("n_parts"))
        .orderBy(col("n_nationkey"))
    },

    // ST_Buffer of a LINESTRING: per-segment 34-gon capsule. The engine
    // computes real trigonometry (non-axis-aligned segments) and validates
    // its own shoelace area against the closed form 2·r·len + 16·r²·sin(π/16)
    // — pinned as a boolean (trig ulps differ across libm builds, so the
    // cross-engine contract is the predicate, not the float). Containment
    // probes sit far from the boundary, so their booleans are exact.
    QDef.sql("geo_buffer_line",
      """SELECT n_nationkey, 34 AS nv, 1 AS n_parts,
        |  TRUE AS area_ok, TRUE AS contains_start, FALSE AS intersects_far
        |FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val base = t(s, dir, "nation").select(col("n_nationkey"),
        ((col("n_nationkey") % 5).cast("double") + 0.25).as("ax"),
        ((col("n_nationkey") % 7).cast("double") + 0.5).as("ay"))
        .withColumn("bx", col("ax") + (col("n_nationkey") % 3).cast("double") + 3.0)
        .withColumn("by", col("ay") + (col("n_nationkey") % 2).cast("double") * 3.0 - 1.5)
      val line = stMakeLine(stPoint(col("ax"), col("ay")), stPoint(col("bx"), col("by")))
      val r = 1.25
      val len = sqrt((col("bx") - col("ax")) * (col("bx") - col("ax"))
        + (col("by") - col("ay")) * (col("by") - col("ay")))
      val closed = lit(2.0 * r) * len + lit(16.0 * r * r * math.sin(math.Pi / 16))
      // The buffer kernel is aliased ONCE and referenced by attribute: an
      // inline `cap` repeated per measure would clone the kernel subtree
      // into every output column — 6× the optimizer/codegen work for the
      // same rows (CollapseProject refuses to inline the expensive alias,
      // keeping the plan two stacked projections).
      base.withColumn("buf", stBufferLine(line, lit(r)))
        .withColumn("cap", stGeometryN(col("buf"), lit(1)))
        .select(col("n_nationkey"),
          stNumPoints(col("cap")).as("nv"),
          stNumGeometries(col("buf")).as("n_parts"),
          (abs(stArea(col("cap")) - closed) < 1e-9).as("area_ok"),
          stContains(col("cap"), stPoint(col("ax"), col("ay"))).as("contains_start"),
          stIntersects(col("cap"), stPoint(col("ax") + 100, col("ay"))).as("intersects_far"))
        .orderBy(col("n_nationkey"))
    },

    // ST_Buffer of a CONVEX polygon: exact Minkowski sum with the regular
    // 32-gon (4 + 32 vertices for a rectangle). Same contract style: the
    // engine's shoelace must equal w·h + 2r(w+h) + 16·r²·sin(π/16) to 1e-9
    // (strip offsets use cos(π/2)≈6e-17, so the identity holds to ~1e-14).
    QDef.sql("geo_buffer_poly",
      """SELECT n_nationkey, 36 AS nv,
        |  TRUE AS area_ok, TRUE AS contains_corner, FALSE AS intersects_far
        |FROM nation ORDER BY n_nationkey""") { (s, dir) =>
      val base = t(s, dir, "nation").select(col("n_nationkey"),
        ((col("n_nationkey") % 3).cast("double") + 2.0).as("w"))
      val zero = lit(0.0)
      val rect = struct(lit("POLYGON").as("kind"),
        array(zero, col("w"), col("w"), zero).as("xs"),
        array(zero, zero, lit(2.5), lit(2.5)).as("ys"))
      val r = 0.75
      val buf = stBufferPolygon(rect, lit(r))
      val closed = col("w") * 2.5 + lit(2.0 * r) * (col("w") + 2.5) +
        lit(16.0 * r * r * math.sin(math.Pi / 16))
      base.select(col("n_nationkey"),
        stNumPoints(buf).as("nv"),
        (abs(stArea(buf) - closed) < 1e-9).as("area_ok"),
        stContains(buf, stPoint(lit(0.0), lit(0.0))).as("contains_corner"),
        stIntersects(buf, stPoint(col("w") + 2, lit(-2.0))).as("intersects_far"))
        .orderBy(col("n_nationkey"))
    },

    // Concave lift (r8 verdict #4): an L-shaped (reflex-corner) operand
    // through ST_Intersection / ST_Union / ST_Buffer. The engine
    // ear-clips + Hertel–Mehlhorn-merges the L into convex parts and runs
    // the convex kernels per part, keeping every result as DISJOINT
    // pieces — so part areas SUM exactly, and the oracle is pure
    // inclusion-exclusion arithmetic over axis-aligned rectangles:
    //   inter  = overlap(B, bbox) − overlap(B, notch)   (closed form)
    //   union  = area(L) + area(B) − inter              (closed form)
    //   buffer = |buf(L)| vs |buf(R1)|+|buf(R2)|−|buf(R1)∩buf(R2)|
    //            (Minkowski distributes over union; the two convex buffer
    //            areas are closed-form, the overlap runs through the
    //            already-oracled convex clip kernel) — pinned as a 1e-9
    //            boolean, the geo_buffer_poly contract style.
    // notch_parts = 0 is the concavity witness: the probe rectangle sits
    // inside L's envelope but wholly in the notch — a convex-hull
    // approximation would return a nonempty intersection.
    QDef.sql("geo_concave",
      """SELECT n_nationkey,
        |  round(ia, 6) AS inter_area,
        |  round(w * cy + cx * (h - cy) + 9.0 - ia, 6) AS union_area,
        |  0 AS notch_parts, TRUE AS buf_ie_ok
        |FROM (
        |  SELECT n_nationkey, w, h, cx, cy,
        |    greatest(least(w, bx0 + 3) - greatest(0.0, bx0), 0)
        |      * greatest(least(h, by0 + 3) - greatest(0.0, by0), 0)
        |    - greatest(least(w, bx0 + 3) - greatest(cx, bx0), 0)
        |      * greatest(least(h, by0 + 3) - greatest(cy, by0), 0) AS ia
        |  FROM (
        |    SELECT n_nationkey,
        |      CAST(4 + n_nationkey % 3 AS DOUBLE) AS w,
        |      CAST(4 + n_nationkey % 2 AS DOUBLE) AS h,
        |      CAST(1 + n_nationkey % 2 AS DOUBLE) AS cx,
        |      CAST(1 + (n_nationkey * 2) % 3 AS DOUBLE) AS cy,
        |      CAST(n_nationkey * 5 % 7 AS DOUBLE) / 2 - 0.75 AS bx0,
        |      CAST(n_nationkey * 3 % 5 AS DOUBLE) / 2 - 0.75 AS by0
        |    FROM nation))
        |ORDER BY n_nationkey""") { (s, dir) =>
      val key = col("n_nationkey")
      val base = t(s, dir, "nation").select(key,
        (key % 3 + 4).cast("double").as("w"),
        (key % 2 + 4).cast("double").as("h"),
        (key % 2 + 1).cast("double").as("cx"),
        ((key * 2) % 3 + 1).cast("double").as("cy"),
        ((key * 5 % 7).cast("double") / 2 - 0.75).as("bx0"),
        ((key * 3 % 5).cast("double") / 2 - 0.75).as("by0"))
      val zero = lit(0.0)
      def rect(x0: Column, y0: Column, x1: Column, y1: Column): Column =
        struct(lit("POLYGON").as("kind"),
          array(x0, x1, x1, x0).as("xs"), array(y0, y0, y1, y1).as("ys"))
      // CCW L-shape: [0,w]×[0,h] minus the top-right notch [cx,w]×[cy,h]
      val L = struct(lit("POLYGON").as("kind"),
        array(zero, col("w"), col("w"), col("cx"), col("cx"), zero).as("xs"),
        array(zero, zero, col("cy"), col("cy"), col("h"), col("h")).as("ys"))
      val B = rect(col("bx0"), col("by0"), col("bx0") + 3, col("by0") + 3)
      val probe = rect(col("cx") + 0.25, col("cy") + 0.25,
        col("w") - 0.25, col("h") - 0.25)
      val r = 0.5
      val ring = lit(16.0 * r * r * math.sin(math.Pi / 16))
      val a1c = col("w") * col("cy") + lit(2 * r) * (col("w") + col("cy")) + ring
      val a2c = col("cx") * (col("h") - col("cy")) +
        lit(2 * r) * (col("cx") + col("h") - col("cy")) + ring
      val bufOverlap = stArea(stIntersectionPoly(
        stBufferPolygon(rect(zero, zero, col("w"), col("cy")), lit(r)),
        stBufferPolygon(rect(zero, col("cy"), col("cx"), col("h")), lit(r))))
      base
        .withColumn("buf_area", stAreaMulti(stBufferConcave(L, lit(r))))
        .select(key,
          round(stAreaMulti(stIntersectionConcave(L, B)), 6).as("inter_area"),
          round(stAreaMulti(stUnionConcave(L, B)), 6).as("union_area"),
          stNumGeometries(stIntersectionConcave(L, probe)).as("notch_parts"),
          (abs(col("buf_area") - (a1c + a2c - bufOverlap)) < 1e-9).as("buf_ie_ok"))
        .orderBy(key)
    },

    // ST_Difference / ST_SymDifference (the clipping algebra's closure;
    // reference 1.21 GeoFunctions stops at Union/Intersection/Buffer, the
    // ESRI backend it delegates to carries OperatorDifference). Same
    // L-shape fixture as geo_concave, so the oracle is the same
    // inclusion-exclusion arithmetic: |L\B| = |L| − |L∩B|,
    // |LΔB| = |L| + |B| − 2|L∩B|; the DONUT row subtracts a strictly
    // interior hole — |outer \ hole| = w·h − (w−2)(h−2) — the
    // polygon-with-holes primitive (holed results stay disjoint parts,
    // every other op runs over them unchanged).
    QDef.sql("geo_difference",
      """SELECT n_nationkey,
        |  round(w * cy + cx * (h - cy) - ia, 6) AS diff_area,
        |  round(w * cy + cx * (h - cy) + 9.0 - 2 * ia, 6) AS symdiff_area,
        |  round(w * h - (w - 2) * (h - 2), 6) AS donut_area
        |FROM (
        |  SELECT n_nationkey, w, h, cx, cy,
        |    greatest(least(w, bx0 + 3) - greatest(0.0, bx0), 0)
        |      * greatest(least(h, by0 + 3) - greatest(0.0, by0), 0)
        |    - greatest(least(w, bx0 + 3) - greatest(cx, bx0), 0)
        |      * greatest(least(h, by0 + 3) - greatest(cy, by0), 0) AS ia
        |  FROM (
        |    SELECT n_nationkey,
        |      CAST(4 + n_nationkey % 3 AS DOUBLE) AS w,
        |      CAST(4 + n_nationkey % 2 AS DOUBLE) AS h,
        |      CAST(1 + n_nationkey % 2 AS DOUBLE) AS cx,
        |      CAST(1 + (n_nationkey * 2) % 3 AS DOUBLE) AS cy,
        |      CAST(n_nationkey * 5 % 7 AS DOUBLE) / 2 - 0.75 AS bx0,
        |      CAST(n_nationkey * 3 % 5 AS DOUBLE) / 2 - 0.75 AS by0
        |    FROM nation))
        |ORDER BY n_nationkey""") { (s, dir) =>
      val key = col("n_nationkey")
      val base = t(s, dir, "nation").select(key,
        (key % 3 + 4).cast("double").as("w"),
        (key % 2 + 4).cast("double").as("h"),
        (key % 2 + 1).cast("double").as("cx"),
        ((key * 2) % 3 + 1).cast("double").as("cy"),
        ((key * 5 % 7).cast("double") / 2 - 0.75).as("bx0"),
        ((key * 3 % 5).cast("double") / 2 - 0.75).as("by0"))
      val zero = lit(0.0)
      def rect(x0: Column, y0: Column, x1: Column, y1: Column): Column =
        struct(lit("POLYGON").as("kind"),
          array(x0, x1, x1, x0).as("xs"), array(y0, y0, y1, y1).as("ys"))
      val L = struct(lit("POLYGON").as("kind"),
        array(zero, col("w"), col("w"), col("cx"), col("cx"), zero).as("xs"),
        array(zero, zero, col("cy"), col("cy"), col("h"), col("h")).as("ys"))
      val B = rect(col("bx0"), col("by0"), col("bx0") + 3, col("by0") + 3)
      val outer = rect(zero, zero, col("w"), col("h"))
      val hole = rect(lit(1.0), lit(1.0), col("w") - 1, col("h") - 1)
      base.select(key,
        round(stAreaMulti(stDifferenceConcave(L, B)), 6).as("diff_area"),
        round(stAreaMulti(stSymDifferenceConcave(L, B)), 6).as("symdiff_area"),
        round(stAreaMulti(stDifferenceConcave(outer, hole)), 6).as("donut_area"))
        .orderBy(key)
    },

    // Polygons with holes as DIRECT WKT operands (r10 VERDICT #5):
    // `POLYGON ((outer), (hole1), (hole2))` is parsed as one value by
    // [[stPolygonHolesFromText]] and lowered onto the hole primitive
    // (fold-subtract, disjoint parts). Fixture per nation: outer
    // [0,w]×[0,h] (w = 4+n%3, h = 4+n%2), hole₁ = [1,2]² (unit square),
    // hole₂ = [3,w−½]×[3,h−½] — strictly interior, mutually disjoint, so
    // every checked quantity is closed-form inclusion-exclusion:
    //   area   = w·h − 1 − (w−3.5)(h−3.5)
    //   B = [½,3.5]²: B⊆outer, hole₁⊆B, B∩hole₂ = ¼ → inter = 9−1−¼
    //   U = [−1,1.5]²: U∩donut = |U∩outer|−|U∩hole₁| = 2.25−0.25 = 2
    //     → union = area + |U| − 2 = area + 4.25
    //   containment: (0.5,0.5) in the ring, (1.5,1.5) in hole₁ (OUT),
    //     (2.5,2.5) on the bridge between holes (IN).
    QDef.sql("geo_holes",
      """SELECT n_nationkey,
        |  round(w * h - 1.0 - (w - 3.5) * (h - 3.5), 6) AS donut_area,
        |  TRUE AS contains_ring_pt,
        |  FALSE AS contains_hole_pt,
        |  TRUE AS contains_bridge_pt,
        |  CAST(7.75 AS DOUBLE) AS inter_area,
        |  round(w * h - 1.0 - (w - 3.5) * (h - 3.5) + 4.25, 6) AS union_area
        |FROM (
        |  SELECT n_nationkey,
        |    CAST(4 + n_nationkey % 3 AS DOUBLE) AS w,
        |    CAST(4 + n_nationkey % 2 AS DOUBLE) AS h
        |  FROM nation)
        |ORDER BY n_nationkey""") { (s, dir) =>
      val key = col("n_nationkey")
      val base = t(s, dir, "nation").select(key,
        (key % 3 + 4).cast("double").as("w"),
        (key % 2 + 4).cast("double").as("h"))
      // the WKT VALUE under test: shell + two holes in one literal
      // (holes written CW per OGC; the parser normalizes orientation)
      val wkt = format_string(
        "POLYGON ((0 0, %s 0, %s %s, 0 %s), " +
          "(1 1, 1 2, 2 2, 2 1), " +
          "(3 3, 3 %s, %s %s, %s 3))",
        col("w"), col("w"), col("h"), col("h"),
        col("h") - 0.5, col("w") - 0.5, col("h") - 0.5, col("w") - 0.5)
      val donut = stPolygonHolesFromText(wkt)
      def rectRing(x0: Column, y0: Column, x1: Column, y1: Column) =
        (array(x0, x1, x1, x0), array(y0, y0, y1, y1))
      val (bx, by) = rectRing(lit(0.5), lit(0.5), lit(3.5), lit(3.5))
      val (ux, uy) = rectRing(lit(-1.0), lit(-1.0), lit(1.5), lit(1.5))
      // intersection with a convex probe: clip each disjoint part, SUM
      val interArea = aggregate(
        transform(donut.getField("parts"), p => stArea(
          graft.functions.PolyClip.st_intersection_rings(
            p.getField("xs"), p.getField("ys"), bx, by))),
        lit(0.0), _ + _)
      // union with a rect: n-ary disjointifying fold over parts + rect
      val u = graft.functions.PolyClip.st_union_all_parts(
        concat(transform(donut.getField("parts"), p => p.getField("xs")), array(ux)),
        concat(transform(donut.getField("parts"), p => p.getField("ys")), array(uy)))
      val unionArea = aggregate(
        zip_with(u.getField("pxs"), u.getField("pys"),
          (x, y) => stArea(struct(x.as("xs"), y.as("ys")))),
        lit(0.0), _ + _)
      base.select(key,
        round(stAreaMulti(donut), 6).as("donut_area"),
        stContainsMulti(donut, lit(0.5), lit(0.5)).as("contains_ring_pt"),
        stContainsMulti(donut, lit(1.5), lit(1.5)).as("contains_hole_pt"),
        stContainsMulti(donut, lit(2.5), lit(2.5)).as("contains_bridge_pt"),
        round(interArea, 6).as("inter_area"),
        round(unionArea, 6).as("union_area"))
        .orderBy(key)
    },

    // N-ary ST_Union over a geometry collection (GeoFunctions.java:499):
    // three overlapping 4×4 squares per nation folded into disjoint
    // parts; the oracle is the full 3-way inclusion-exclusion in closed
    // form (pairwise axis-overlap products and the triple core). Quarter
    // offsets keep R2/R3 off R1's integer edges; R2–R3 edge contact is
    // fine (the difference fold is boundary-inclusive, not the walk).
    QDef.sql("geo_union_collection",
      """SELECT n_nationkey,
        |  round(48.0
        |    - greatest(4 - abs(0.0 - bx), 0) * greatest(4 - abs(0.0 - by), 0)
        |    - greatest(4 - abs(0.0 - cx2), 0) * greatest(4 - abs(0.0 - cy2), 0)
        |    - greatest(4 - abs(bx - cx2), 0) * greatest(4 - abs(by - cy2), 0)
        |    + greatest(least(0.0, bx, cx2) + 4 - greatest(0.0, bx, cx2), 0)
        |      * greatest(least(0.0, by, cy2) + 4 - greatest(0.0, by, cy2), 0), 6)
        |    AS union_area
        |FROM (
        |  SELECT n_nationkey,
        |    CAST(n_nationkey * 3 % 5 AS DOUBLE) / 2 - 0.25 AS bx,
        |    CAST(n_nationkey * 7 % 5 AS DOUBLE) / 2 - 0.25 AS by,
        |    CAST(n_nationkey * 2 % 7 AS DOUBLE) / 2 + 0.25 AS cx2,
        |    CAST(n_nationkey * 5 % 7 AS DOUBLE) / 2 + 0.25 AS cy2
        |  FROM nation)
        |ORDER BY n_nationkey""") { (s, dir) =>
      val key = col("n_nationkey")
      val base = t(s, dir, "nation").select(key,
        ((key * 3 % 5).cast("double") / 2 - 0.25).as("bx"),
        ((key * 7 % 5).cast("double") / 2 - 0.25).as("by"),
        ((key * 2 % 7).cast("double") / 2 + 0.25).as("cx2"),
        ((key * 5 % 7).cast("double") / 2 + 0.25).as("cy2"))
      val zero = lit(0.0)
      def sq(x0: Column, y0: Column): Column =
        struct(lit("POLYGON").as("kind"),
          array(x0, x0 + 4, x0 + 4, x0).as("xs"),
          array(y0, y0, y0 + 4, y0 + 4).as("ys"))
      base.select(key,
        round(stAreaMulti(stUnionCollection(array(
          sq(zero, zero), sq(col("bx"), col("by")),
          sq(col("cx2"), col("cy2"))))), 6).as("union_area"))
        .orderBy(key)
    }
  )
}
