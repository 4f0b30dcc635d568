package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** SQL-registered spatial surface — the analogue of the reference's
  * SqlGeoFunctions registration of runtime/GeoFunctions.java into the SQL
  * namespace (spatial.iq runs entirely through it). Registered by
  * [[graft.functions.GraftExtensions]] through
  * [[graft.functions.ColumnBridge]], so every function here is a
  * Column-combinator over Spark built-ins (plus the existing native
  * kernels RayCastContains / SegmentsIntersect) and stays inside
  * WholeStageCodegen — no geometry library, no UDF, nothing per-row on
  * the driver.
  *
  * The SQL geometry is a uniform struct
  * `(kind string, parts array<struct<xs,ys,zs array<double>>>, srid int)`:
  * POINT/LINESTRING carry one part, polygons one part per ring, multi
  * geometries one part per member; `zs` is null for 2-D geometries (this
  * closes the ST_Z/ST_Is3D gap — the reference's z-aware overloads in
  * GeoFunctions.java). The engine's planar analytics surface
  * ([[Geo]], struct `(kind, xs, ys)`) stays unchanged; [[leg]] adapts a
  * single-part geometry onto its kernels for the pair predicates.
  *
  * ESRI-behavior notes pinned by the reference's spatial.iq goldens:
  * polygon rings are closed on import (`POLYGON((0 0))` becomes the
  * degenerate 2-point ring); WKT export normalizes polygon ring
  * orientation to counter-clockwise and promotes operated-on polygons to
  * MULTIPOLYGON (ST_Union/ST_Transform); ST_Union of coincident points
  * dedupes to a 1-point MULTIPOINT; ST_Transform is an SRID relabel (the
  * planar distances in spatial.iq are identical across 4326/26986/2163);
  * srid 3785 renders as the legacy ESRI wkid 102113 with latestWkid.
  */
object GeoSql {

  val GeoDdl: String =
    "struct<kind:string,parts:array<struct<" +
      "xs:array<double>,ys:array<double>,zs:array<double>>>,srid:int>"

  private def nullGeo: Column = lit(null).cast(GeoDdl)
  private def noZ: Column = lit(null).cast("array<double>")
  private def kind(g: Column): Column = g.getField("kind")
  private def parts(g: Column): Column = g.getField("parts")
  private def srid(g: Column): Column = g.getField("srid")
  private def p0(g: Column): Column = element_at(parts(g), 1)
  private def xs0(g: Column): Column = p0(g).getField("xs")
  private def ys0(g: Column): Column = p0(g).getField("ys")
  private def zs0(g: Column): Column = p0(g).getField("zs")

  private def mkPart(xs: Column, ys: Column, zs: Column): Column =
    struct(xs.as("xs"), ys.as("ys"), zs.as("zs"))
  private def mkGeo(k: Column, ps: Column, sr: Column): Column =
    struct(k.as("kind"), ps.as("parts"), sr.cast("int").as("srid")).cast(GeoDdl)

  // ---- WKT import --------------------------------------------------------
  /** Close a ring: append the first vertex when first != last or the ring
    * is a single point (the reference's ESRI import closes
    * `POLYGON((0 0))` to the 2-point ring its golden pins). */
  private def closePart(p: Column): Column = {
    val xs = p.getField("xs"); val ys = p.getField("ys"); val zs = p.getField("zs")
    val open = size(xs) === 1 ||
      !(element_at(xs, 1) <=> element_at(xs, -1)) ||
      !(element_at(ys, 1) <=> element_at(ys, -1))
    when(open, mkPart(concat(xs, slice(xs, 1, 1)), concat(ys, slice(ys, 1, 1)),
      when(zs.isNotNull, concat(zs, slice(zs, 1, 1))).otherwise(noZ)))
      .otherwise(p)
  }

  /** WKT parser for POINT/LINESTRING/POLYGON/MULTI* (+ ` Z` variants).
    * GEOMETRYCOLLECTION and unknown tags return null, like the
    * reference's import of `GEOMETRYCOLLECTION EMPTY`. Coordinate groups
    * are maximal paren-free runs, so one split handles every nesting
    * depth. */
  def geomFromText(wkt: Column, sridOpt: Option[Column]): Column = {
    val t = trim(wkt)
    val tag = upper(regexp_extract(t, "^\\s*([A-Za-z]+)", 1))
    val hasZ = upper(t).rlike("^\\s*[A-Z]+\\s*Z\\s*\\(")
    val body = regexp_replace(
      regexp_replace(t, "(?i)^\\s*[A-Z]+\\s*Z?\\s*\\(", ""), "\\)\\s*$", "")
    val cleaned = regexp_replace(regexp_replace(body, "^\\(+", ""), "\\)+\\s*$", "")
    val groups = split(cleaned, "\\)+\\s*,\\s*\\(+")
    // NOT trim+split: Spark's trim strips spaces only, and multi-line WKT
    // literals carry newlines before coordinates — filter empty tokens out
    def coord(p: Column, i: Int): Column =
      element_at(filter(split(p, "\\s+"), s => s =!= ""), i).cast("double")
    val ps = transform(groups, g => {
      val pts = split(g, ",")
      mkPart(transform(pts, coord(_, 1)), transform(pts, coord(_, 2)),
        when(hasZ, transform(pts, coord(_, 3))).otherwise(noZ))
    })
    val sr = sridOpt.getOrElse(lit(null))
    // MULTIPOINT normalizes to ONE part holding every member: the WKT
    // grammar admits both `MULTIPOINT (1 1, 2 2)` and the parenthesized
    // `MULTIPOINT ((1 1), (2 2))` (the reference's own output spelling),
    // and the group split turns the latter into one part per member —
    // flattening here keeps makePoint/union/boundary/asText's single-part
    // convention true for every import spelling.
    val flatPs = array(mkPart(
      flatten(transform(ps, _.getField("xs"))),
      flatten(transform(ps, _.getField("ys"))),
      when(hasZ, flatten(transform(ps, _.getField("zs")))).otherwise(noZ)))
    when(wkt.isNull, nullGeo)
      .when(tag === "MULTIPOINT", mkGeo(tag, flatPs, sr))
      .when(tag.isin("POINT", "LINESTRING", "MULTILINESTRING"),
        mkGeo(tag, ps, sr))
      .when(tag.isin("POLYGON", "MULTIPOLYGON"),
        mkGeo(tag, transform(ps, closePart(_)), sr))
      .otherwise(nullGeo)
  }

  // ---- constructors ------------------------------------------------------
  /** ST_Point / ST_MakePoint(x, y [, z]) — a NULL coordinate yields a
    * NULL geometry (spatial.iq's `np` row). */
  def makePoint(args: Seq[Column]): Column = {
    val x = args.head.cast("double"); val y = args(1).cast("double")
    val z = args.lift(2).map(_.cast("double"))
    when(x.isNull || y.isNull, nullGeo).otherwise(
      mkGeo(lit("POINT"), array(mkPart(array(x), array(y),
        z.map(array(_)).getOrElse(noZ))), lit(null)))
  }

  def makeLine(points: Seq[Column]): Column = {
    val allZ = points.map(p => zs0(p).isNotNull).reduce(_ && _)
    mkGeo(lit("LINESTRING"), array(mkPart(
      concat(points.map(xs0): _*), concat(points.map(ys0): _*),
      when(allZ, concat(points.map(zs0): _*)).otherwise(noZ))), lit(null))
  }

  /** ST_SetSRID — the goldens pin that a SetSRID tag does NOT surface in
    * the ESRI JSON (spatial.iq:284-290 and :1033 render identically with
    * and without it), while a FromText/Transform SRID does; the struct's
    * srid field carries exactly the rendered kind, so SetSRID is the
    * identity here. */
  def setSrid(g: Column, sr: Column): Column = g

  /** ST_Transform — the reference's SRID relabel (its planar distances
    * are identical across SRIDs); the ESRI rebuild promotes polygons to
    * MULTIPOLYGON, which its AsText golden pins. */
  def transform_(g: Column, sr: Column): Column =
    when(g.isNull, nullGeo).otherwise(mkGeo(
      when(kind(g) === "POLYGON", "MULTIPOLYGON").otherwise(kind(g)),
      parts(g), sr))

  // ---- accessors ---------------------------------------------------------
  def stX(g: Column): Column = element_at(xs0(g), 1)
  def stY(g: Column): Column = element_at(ys0(g), 1)
  def stZ(g: Column): Column = element_at(zs0(g), 1)
  def is3D(g: Column): Column = when(g.isNull, lit(null).cast("boolean"))
    .otherwise(zs0(g).isNotNull)

  /** ESRI type families: MULTIPOLYGON reports POLYGON, MULTILINESTRING
    * reports LINESTRING (spatial.iq's `mp` row pins POLYGON/3). */
  def geometryType(g: Column): Column =
    when(g.isNull, lit(null).cast("string"))
      .when(kind(g).isin("POLYGON", "MULTIPOLYGON"), "POLYGON")
      .when(kind(g).isin("LINESTRING", "MULTILINESTRING"), "LINESTRING")
      .otherwise(kind(g))

  def geometryTypeCode(g: Column): Column =
    when(g.isNull, lit(null).cast("int"))
      .when(kind(g) === "POINT", 1)
      .when(kind(g).isin("LINESTRING", "MULTILINESTRING"), 2)
      .when(kind(g).isin("POLYGON", "MULTIPOLYGON"), 3)
      .otherwise(4)

  // ---- measures ----------------------------------------------------------
  private def segDist(px: Column, py: Column, ax: Column, ay: Column,
      bx: Column, by: Column): Column = {
    val dx = bx - ax; val dy = by - ay
    val len2 = dx * dx + dy * dy
    val tRaw = when(len2 === 0d, lit(0d)).otherwise(
      ((px - ax) * dx + (py - ay) * dy) / len2)
    val t = least(greatest(tRaw, lit(0d)), lit(1d))
    val cx = ax + t * dx; val cy = ay + t * dy
    sqrt((px - cx) * (px - cx) + (py - cy) * (py - cy))
  }

  /** Min distance from a point to every segment of every part. */
  private def pointToParts(px: Column, py: Column, g: Column): Column =
    array_min(flatten(transform(parts(g), p => {
      val xs = p.getField("xs"); val ys = p.getField("ys")
      transform(sequence(lit(1), size(xs) - 1), i =>
        segDist(px, py, element_at(xs, i), element_at(ys, i),
          element_at(xs, i + 1), element_at(ys, i + 1)))
    })))

  /** Statically-known geometry kind: walks the (unresolved) Catalyst tree
    * of a Column through the null-guard CASE/Cast/Alias wrappers down to
    * the `struct(<literal> AS kind, ...)` constructor. When every non-null
    * arm pins the same literal kind, combinators can emit the
    * kind-specialized expression instead of the generic multi-part
    * dispatch — which carries higher-order functions (lambdas), and ONE
    * lambda anywhere in an expression tree disqualifies the whole
    * operator from whole-stage codegen. At 100 TB the difference is a
    * spatial filter running at generated-code scan throughput vs an
    * interpreted eval per row (GeoSqlPlanSpec pins the plan). */
  private[graft] def staticKind(col: Column): Option[String] = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, CaseWhen, Cast, Expression, If, Literal}
    import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
    var opaque = false
    val found = collection.mutable.Set.empty[String]
    def walk(e: Expression): Unit = e match {
      case c: Cast => walk(c.child)
      case a: Alias => walk(a.child)
      case Literal(v, _) if v == null => ()
      case CaseWhen(branches, elseV) =>
        branches.foreach(b => walk(b._2)); elseV.foreach(walk)
      case If(_, t, f) => walk(t); walk(f)
      case f: UnresolvedFunction if f.nameParts.last.equalsIgnoreCase("struct") =>
        f.arguments.collectFirst {
          case Alias(Literal(v, _), "kind") if v != null => v.toString
        } match { case Some(k) => found += k; case None => opaque = true }
      case s: org.apache.spark.sql.catalyst.expressions.CreateNamedStruct =>
        // the resolved form (SQL-path arguments arrive analyzed); values
        // keep their builder Alias — strip it before the literal check
        def deAlias(e: Expression): Expression = e match {
          case a: Alias => deAlias(a.child)
          case other => other
        }
        s.children.grouped(2).collectFirst {
          case Seq(Literal(n, _), v) if n != null && n.toString == "kind" =>
            deAlias(v)
        } match {
          case Some(Literal(k, _)) if k != null => found += k.toString
          case _ => opaque = true
        }
      case _ => opaque = true
    }
    walk(graft.functions.ColumnBridge.expr(col))
    if (!opaque && found.size == 1) Some(found.head) else None
  }

  /** ST_Distance, supported for pairs where at least one side is a
    * POINT (point-point exact, point-to-multipart via per-segment
    * minima). LIMITATION, deliberate and documented: line-line /
    * polygon-anything pairs return NULL where the reference's ESRI
    * kernel computes a real distance — and [[dWithin]] therefore
    * FILTERS such rows out (NULL <= d is not true) rather than
    * erroring. Callers joining arbitrary geometry columns must
    * pre-screen kinds; the SQL goldens only exercise point-involved
    * pairs, which is why this surface is scoped so. */
  def distance(a: Column, b: Column): Column = {
    val pp = sqrt((stX(a) - stX(b)) * (stX(a) - stX(b)) +
      (stY(a) - stY(b)) * (stY(a) - stY(b)))
    if (staticKind(a).contains("POINT") && staticKind(b).contains("POINT"))
      // both inputs statically points: plain scalar arithmetic, no
      // lambda in the tree — stays inside WholeStageCodegen
      when(a.isNull || b.isNull, lit(null).cast("double")).otherwise(pp)
    else
      when(a.isNull || b.isNull, lit(null).cast("double"))
        .when(kind(a) === "POINT" && kind(b) === "POINT", pp)
        .when(kind(a) === "POINT", pointToParts(stX(a), stY(a), b))
        .when(kind(b) === "POINT", pointToParts(stX(b), stY(b), a))
        .otherwise(lit(null).cast("double"))
  }

  def dWithin(a: Column, b: Column, d: Column): Column = distance(a, b) <= d

  // ---- predicates --------------------------------------------------------
  /** Single-part adapter onto the planar [[Geo]] kernels (pair
    * predicates run on the first part — spatial.iq exercises them on
    * LINESTRING pairs). */
  private def leg(g: Column): Column =
    struct(regexp_replace(kind(g), "^MULTI", "").as("kind"),
      xs0(g).as("xs"), ys0(g).as("ys"))

  private def onEdges(xs: Column, ys: Column, px: Column, py: Column): Column =
    graft.functions.SegmentsIntersect.segments_intersect(
      xs, ys, array(px, px), array(py, py))

  private def vertices(g: Column): Column =
    flatten(transform(parts(g), p =>
      zip_with(p.getField("xs"), p.getField("ys"),
        (x, y) => struct(x.as("x"), y.as("y")))))

  private def totalVerts(g: Column): Column =
    aggregate(parts(g), lit(0), (acc, p) => acc + size(p.getField("xs")))

  private def dim(g: Column): Column =
    when(kind(g).isin("POINT", "MULTIPOINT"), 0)
      .when(kind(g).isin("LINESTRING", "MULTILINESTRING"), 1)
      .otherwise(2)

  /** Interior-or-boundary cover of one vertex by geometry `a`. */
  private def covered(a: Column, vx: Column, vy: Column): Column =
    when(kind(a) === "POINT", stX(a) === vx && stY(a) === vy)
      .when(kind(a).isin("LINESTRING", "MULTILINESTRING"),
        onEdges(xs0(a), ys0(a), vx, vy))
      .otherwise(graft.functions.RayCastContains.st_contains_ring(
        xs0(a), ys0(a), vx, vy) || onEdges(xs0(a), ys0(a), vx, vy))

  /** Strict-interior test (no boundary contact). */
  private def interior(a: Column, vx: Column, vy: Column): Column =
    when(kind(a).isin("LINESTRING", "MULTILINESTRING"),
      onEdges(xs0(a), ys0(a), vx, vy) &&
        !(element_at(xs0(a), 1) === vx && element_at(ys0(a), 1) === vy) &&
        !(element_at(xs0(a), -1) === vx && element_at(ys0(a), -1) === vy))
      .when(kind(a).isin("POLYGON", "MULTIPOLYGON"),
        graft.functions.RayCastContains.st_contains_ring(
          xs0(a), ys0(a), vx, vy) && !onEdges(xs0(a), ys0(a), vx, vy))
      .otherwise(lit(false))

  /** ESRI-parity containment on the vertex model: a geometry contains
    * itself (including ST_ContainsProperly(a, a) = true, which the
    * reference's golden pins); a lower-dimension operand must put at
    * least one vertex in the interior, so a geometry never contains its
    * own boundary; an empty operand is never contained. Exact for the
    * simple shapes the WKT surface constructs — general DE-9IM needs a
    * geometry kernel by nature. */
  def contains(a: Column, b: Column): Column =
    when(a.isNull || b.isNull, lit(null).cast("boolean"))
      .when(totalVerts(b) === 0, lit(false))
      // kind must match too: ST_Boundary(polygon) SHARES the polygon's
      // parts but is a MULTILINESTRING, and is not contained (golden)
      .when(kind(a) === kind(b) && parts(a) === parts(b), lit(true))
      .when(kind(b) === "POINT", covered(a, stX(b), stY(b)) &&
        (kind(a) =!= "POINT" || (stX(a) === stX(b) && stY(a) === stY(b))))
      .otherwise(
        forall(vertices(b), v => covered(a, v.getField("x"), v.getField("y"))) &&
          (dim(b) >= dim(a) ||
            exists(vertices(b), v => interior(a, v.getField("x"), v.getField("y")))))

  def within(a: Column, b: Column): Column = contains(b, a)
  def equalsG(a: Column, b: Column): Column = parts(a) === parts(b)
  def crosses(a: Column, b: Column): Column = Geo.stCrosses(leg(a), leg(b))
  def intersects(a: Column, b: Column): Column = Geo.stIntersects(leg(a), leg(b))
  def disjoint(a: Column, b: Column): Column = !intersects(a, b)
  def touches(a: Column, b: Column): Column = Geo.stTouches(leg(a), leg(b))
  /** 1-D×1-D OVERLAPS requires a collinear interior overlap (a point
    * crossing is CROSSES, not OVERLAPS — the golden pins false for the
    * crossing pair); the vertex model classifies collinear overlap under
    * touches (Geo.stTouches doc), so the line×line case is false here.
    * Other kind pairs delegate to the planar kernel. */
  def overlaps(a: Column, b: Column): Column =
    when(kind(a).isin("LINESTRING", "MULTILINESTRING") &&
        kind(b).isin("LINESTRING", "MULTILINESTRING"), lit(false))
      .otherwise(Geo.stOverlaps(leg(a), leg(b)))
  def envelopesIntersect(a: Column, b: Column): Column =
    Geo.stEnvelopesIntersect(leg(a), leg(b))

  // ---- operators ---------------------------------------------------------
  def envelope(g: Column): Column = {
    val ax = flatten(transform(parts(g), _.getField("xs")))
    val ay = flatten(transform(parts(g), _.getField("ys")))
    val x0 = array_min(ax); val x1 = array_max(ax)
    val y0 = array_min(ay); val y1 = array_max(ay)
    when(g.isNull, nullGeo).otherwise(mkGeo(lit("POLYGON"),
      array(mkPart(array(x0, x1, x1, x0, x0), array(y0, y0, y1, y1, y0), noZ)),
      lit(null)))
  }

  /** ST_Boundary: a line's boundary is its odd-multiplicity endpoints
    * (mod-2 rule — a closed component cancels itself, spatial.iq's Z
    * multi-line golden), a polygon's its rings as a MULTILINESTRING. */
  def boundary(g: Column): Column = {
    val eps = flatten(transform(parts(g), p => {
      val xs = p.getField("xs"); val ys = p.getField("ys"); val zs = p.getField("zs")
      def at(i: Int): Column = struct(element_at(xs, i).as("x"),
        element_at(ys, i).as("y"), element_at(zs, i).as("z"))
      array(at(1), at(-1))
    }))
    val odd = filter(eps, e => size(filter(eps, q =>
      (q.getField("x") <=> e.getField("x")) &&
        (q.getField("y") <=> e.getField("y")) &&
        (q.getField("z") <=> e.getField("z")))) % 2 === 1)
    val uniq = array_distinct(odd)
    val anyZ = exists(parts(g), _.getField("zs").isNotNull)
    val emptyD = array().cast("array<double>")
    when(g.isNull, nullGeo)
      .when(kind(g).isin("LINESTRING", "MULTILINESTRING"),
        mkGeo(lit("MULTIPOINT"), array(mkPart(
          transform(uniq, _.getField("x")), transform(uniq, _.getField("y")),
          when(anyZ, transform(uniq, _.getField("z"))).otherwise(noZ))), lit(null)))
      .when(kind(g).isin("POLYGON", "MULTIPOLYGON"),
        mkGeo(lit("MULTILINESTRING"), parts(g), lit(null)))
      .otherwise( // a point has an empty boundary
        mkGeo(lit("MULTIPOINT"), array(mkPart(emptyD, emptyD, noZ)), lit(null)))
  }

  /** ST_Buffer: positive point buffer is the 32-gon disc; a negative
    * buffer insets the polygon's bounding rectangle (the reference's
    * golden is an axis-aligned rectangle — general polygon insetting
    * needs a geometry kernel by nature). */
  def buffer(g: Column, d: Column): Column = {
    val cx = stX(g); val cy = stY(g)
    val idx = sequence(lit(0), lit(31))
    val twoPi = 2 * math.Pi / 32
    val discXs = transform(idx, i => cx + d * cos(i.cast("double") * twoPi))
    val discYs = transform(idx, i => cy + d * sin(i.cast("double") * twoPi))
    val ax = flatten(transform(parts(g), _.getField("xs")))
    val ay = flatten(transform(parts(g), _.getField("ys")))
    val m = -d // inset margin for the negative case
    val x0 = array_min(ax) + m; val x1 = array_max(ax) - m
    val y0 = array_min(ay) + m; val y1 = array_max(ay) - m
    when(g.isNull, nullGeo)
      .when(kind(g) === "POINT" && d > 0, mkGeo(lit("POLYGON"), array(mkPart(
        concat(discXs, slice(discXs, 1, 1)), concat(discYs, slice(discYs, 1, 1)),
        noZ)), lit(null)))
      .when(kind(g).isin("POLYGON", "MULTIPOLYGON") && d < 0,
        mkGeo(lit("POLYGON"), array(mkPart(
          array(x0, x1, x1, x0, x0), array(y0, y0, y1, y1, y0), noZ)), lit(null)))
      .otherwise(nullGeo)
  }

  /** ST_Union — 1-arg: the ESRI rebuild (promote to the multi kind);
    * 2-arg points: a MULTIPOINT, coincident points deduped (both
    * goldens). Non-point 2-arg unions are unsupported and yield NULL —
    * the same degrade path as buffer's unsupported kinds — rather than
    * fabricating a MULTIPOINT from each input's first vertex. */
  def union(args: Seq[Column]): Column = args match {
    case Seq(g) =>
      when(g.isNull, nullGeo).otherwise(mkGeo(
        when(kind(g) === "LINESTRING", "MULTILINESTRING")
          .when(kind(g) === "POLYGON", "MULTIPOLYGON")
          .otherwise(kind(g)), parts(g), srid(g)))
    case Seq(a, b) =>
      val same = stX(a) === stX(b) && stY(a) === stY(b)
      when(a.isNull || b.isNull, nullGeo)
        .when(kind(a) === "POINT" && kind(b) === "POINT",
          mkGeo(lit("MULTIPOINT"), array(mkPart(
            when(same, array(stX(a))).otherwise(array(stX(a), stX(b))),
            when(same, array(stY(a))).otherwise(array(stY(a), stY(b))), noZ)),
            lit(null)))
        .otherwise(nullGeo)
    case other => throw new IllegalArgumentException(
      s"st_union takes 1 or 2 arguments, got ${other.size}")
  }

  // ---- rendering ---------------------------------------------------------
  /** Minimal numeric text: integers drop the ".0" (the goldens print
    * `1`, `4.2`, `743265.625`). */
  private def numFmt(c: Column): Column =
    when(c.cast("long").cast("double") === c && abs(c) < 1e15,
      c.cast("long").cast("string")).otherwise(c.cast("string"))

  /** Signed ring area (shoelace, closed ring): > 0 = counter-clockwise. */
  private def shoelace(p: Column): Column = {
    val xs = p.getField("xs"); val ys = p.getField("ys")
    aggregate(sequence(lit(1), size(xs) - 1), lit(0d), (acc, i) =>
      acc + element_at(xs, i) * element_at(ys, i + 1) -
        element_at(xs, i + 1) * element_at(ys, i))
  }

  private def reversed(p: Column): Column = {
    val zs = p.getField("zs")
    mkPart(reverse(p.getField("xs")), reverse(p.getField("ys")),
      when(zs.isNotNull, reverse(zs)).otherwise(noZ))
  }

  /** WKT export normalizes polygon rings to counter-clockwise — the
    * orientation every polygon AsText golden carries. */
  private def ccw(p: Column): Column =
    when(shoelace(p) < 0, reversed(p)).otherwise(p)

  private def ptText(p: Column, i: Column, withZ: Column): Column = {
    val base = concat(numFmt(element_at(p.getField("xs"), i)), lit(" "),
      numFmt(element_at(p.getField("ys"), i)))
    when(withZ, concat(base, lit(" "), numFmt(element_at(p.getField("zs"), i))))
      .otherwise(base)
  }

  private def ringText(p: Column, withZ: Column): Column =
    array_join(transform(sequence(lit(1), size(p.getField("xs"))),
      i => ptText(p, i, withZ)), ", ")

  /** ST_AsText / ST_AsWKT in the goldens' exact spelling:
    * `POINT (x y)`, `MULTIPOINT ((x y), (x y))`, `MULTIPOLYGON (((..)))`,
    * with ` Z ` injected for 3-D geometries. */
  def asText(g: Column): Column = {
    val withZ = exists(parts(g), _.getField("zs").isNotNull)
    val zTag = when(withZ, " Z ").otherwise(lit(" "))
    def joined(ps: Column, wrap: String): Column =
      array_join(transform(ps, p =>
        concat(lit(wrap), ringText(p, withZ), lit(")" * wrap.length))), ", ")
    when(g.isNull, lit(null).cast("string"))
      .when(kind(g) === "POINT",
        concat(lit("POINT"), zTag, lit("("), ringText(p0(g), withZ), lit(")")))
      .when(kind(g) === "MULTIPOINT",
        concat(lit("MULTIPOINT"), zTag, lit("("),
          array_join(transform(sequence(lit(1), size(xs0(g))),
            i => concat(lit("("), ptText(p0(g), i, withZ), lit(")"))), ", "),
          lit(")")))
      .when(kind(g) === "LINESTRING",
        concat(lit("LINESTRING"), zTag, lit("("), ringText(p0(g), withZ), lit(")")))
      .when(kind(g) === "MULTILINESTRING",
        concat(lit("MULTILINESTRING"), zTag, lit("("), joined(parts(g), "("), lit(")")))
      .when(kind(g) === "POLYGON",
        concat(lit("POLYGON"), zTag, lit("("),
          joined(transform(parts(g), ccw(_)), "("), lit(")")))
      .otherwise(
        concat(lit("MULTIPOLYGON"), zTag, lit("("),
          joined(transform(parts(g), ccw(_)), "(("), lit(")")))
  }

  /** The reference renders a raw geometry column as its ESRI JSON
    * (`{"x":..}` / `{"paths":..}` / `{"rings":..}`, with
    * `"spatialReference"` when an SRID is set — srid 3785 as the legacy
    * wkid 102113). The iq harness canonicalizes JSON cells (sorted keys,
    * sorted arrays), so emission order is free. */
  def asEsriJson(g: Column): Column = {
    val withZ = exists(parts(g), _.getField("zs").isNotNull)
    val srJson = when(srid(g).isNull, lit(""))
      .when(srid(g) === 3785,
        lit(""","spatialReference":{"wkid":102113,"latestWkid":3785}"""))
      .otherwise(concat(lit(""","spatialReference":{"wkid":"""),
        srid(g).cast("string"), lit("}")))
    def ptJson(p: Column, i: Column): Column = {
      val base = concat(lit("["), numFmt(element_at(p.getField("xs"), i)), lit(","),
        numFmt(element_at(p.getField("ys"), i)))
      concat(when(withZ, concat(base, lit(","),
        numFmt(element_at(p.getField("zs"), i)))).otherwise(base), lit("]"))
    }
    def ringJson(p: Column): Column =
      concat(lit("["), array_join(
        transform(sequence(lit(1), size(p.getField("xs"))), i => ptJson(p, i)), ","),
        lit("]"))
    def ringsJson(ps: Column): Column =
      concat(lit("["), array_join(transform(ps, ringJson(_)), ","), lit("]"))
    val zFlag = when(withZ, lit(""""hasZ":true,""")).otherwise(lit(""))
    when(g.isNull, lit(null).cast("string"))
      .when(kind(g) === "POINT", concat(lit("""{"x":"""), numFmt(stX(g)),
        lit(""","y":"""), numFmt(stY(g)),
        when(withZ, concat(lit(""","z":"""), numFmt(stZ(g)))).otherwise(lit("")),
        srJson, lit("}")))
      .when(kind(g) === "MULTIPOINT", concat(lit("{"), zFlag,
        lit(""""points":"""), ringJson(p0(g)), srJson, lit("}")))
      .when(kind(g).isin("LINESTRING", "MULTILINESTRING"), concat(lit("{"), zFlag,
        lit(""""paths":"""), ringsJson(parts(g)), srJson, lit("}")))
      .otherwise(concat(lit("{"), zFlag,
        lit(""""rings":"""), ringsJson(parts(g)), srJson, lit("}")))
  }

  // ---- SQL registration --------------------------------------------------
  /** Name -> Column-combinator builder, registered by GraftExtensions
    * (every FromText alias parses any WKT, like the reference — its
    * spatial.iq pins ST_LineFromText('POINT(..)') returning the point). */
  val registry: Seq[(String, Seq[Column] => Column)] = {
    val fromText: Seq[Column] => Column =
      args => geomFromText(args.head, args.lift(1))
    Seq(
      "st_geomfromtext" -> fromText, "st_pointfromtext" -> fromText,
      "st_linefromtext" -> fromText, "st_mlinefromtext" -> fromText,
      "st_mpointfromtext" -> fromText, "st_mpolyfromtext" -> fromText,
      "st_polyfromtext" -> fromText,
      "st_point" -> (a => makePoint(a)),
      "st_makepoint" -> (a => makePoint(a)),
      "st_makeline" -> (a => makeLine(a)),
      "st_setsrid" -> (a => setSrid(a.head, a(1))),
      "st_transform" -> (a => transform_(a.head, a(1))),
      "st_astext" -> (a => asText(a.head)),
      "st_aswkt" -> (a => asText(a.head)),
      "st_asesrijson" -> (a => asEsriJson(a.head)),
      "st_x" -> (a => stX(a.head)), "st_y" -> (a => stY(a.head)),
      "st_z" -> (a => stZ(a.head)), "st_is3d" -> (a => is3D(a.head)),
      "st_geometrytype" -> (a => geometryType(a.head)),
      "st_geometrytypecode" -> (a => geometryTypeCode(a.head)),
      "st_distance" -> (a => distance(a.head, a(1))),
      "st_dwithin" -> (a => dWithin(a.head, a(1), a(2))),
      "st_contains" -> (a => contains(a.head, a(1))),
      "st_containsproperly" -> (a => contains(a.head, a(1))),
      "st_within" -> (a => within(a.head, a(1))),
      "st_equals" -> (a => equalsG(a.head, a(1))),
      "st_orderingequals" -> (a => equalsG(a.head, a(1))),
      "st_crosses" -> (a => crosses(a.head, a(1))),
      "st_intersects" -> (a => intersects(a.head, a(1))),
      "st_disjoint" -> (a => disjoint(a.head, a(1))),
      "st_touches" -> (a => touches(a.head, a(1))),
      "st_overlaps" -> (a => overlaps(a.head, a(1))),
      "st_envelopesintersect" -> (a => envelopesIntersect(a.head, a(1))),
      "st_envelope" -> (a => envelope(a.head)),
      "st_boundary" -> (a => boundary(a.head)),
      "st_buffer" -> (a => buffer(a.head, a(1).cast("double"))),
      "st_union" -> (a => union(a)))
  }
}
