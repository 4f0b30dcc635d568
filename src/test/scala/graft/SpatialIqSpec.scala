package graft

import graft.iq.{Iq, IqSuite}
import graft.operators.GeoSql
import org.apache.spark.sql.types.StructType

/** Exhaustive port of spatial.iq — the reference's full SQL spatial
  * surface (reference: core/src/test/resources/sql/spatial.iq; the
  * functions are runtime/GeoFunctions.java registered via
  * SqlGeoFunctions; our SQL registration is [[graft.operators.GeoSql]]
  * through GraftExtensions). 86 blocks: 8 !if-disabled by the reference,
  * 75 ported, 3 skipped. Truncated goldens ("... (N characters)") are
  * matched by exact prefix + exact total length (Iq.assertMatches) —
  * that upgrade covers the two big WKT-import blocks; only the three
  * ST_Buffer blocks stay skipped (their unprinted arc interiors depend
  * on the ESRI OperatorBuffer recurrence — see `skips`).
  *
  * Raw geometry columns render as the reference's ESRI JSON toString
  * (st_asesrijson; the harness canonicalizes JSON cells, so key/array
  * order is free); ST_AsText cells compare as exact strings, which pins
  * the goldens' WKT spelling, Z tags, and CCW ring normalization.
  * Rewrites are dialect-level only: VALUES-with-function-calls become
  * UNION ALL selects (Spark inline tables require foldable literals),
  * CAST(NULL AS GEOMETRY/VARCHAR) get Spark spellings, and the
  * latitude DESC order adds NULLS FIRST (the reference's nulls-high
  * collation, pinned by sort.iq). */
class SpatialIqSpec extends IqSuite {
  val iqFile = "spatial.iq"
  val expectedTotal = 86

  val rewrites: Map[Int, String => String] = Map(
    61 -> (_ => "SELECT ST_AsWKT(ST_GeomFromText(CAST(NULL AS STRING)))"),
    219 -> (_ => "SELECT ST_PolyFromText(CAST(NULL AS STRING))"),
    323 -> (_.replace("ORDER BY `latitude` DESC",
      "ORDER BY `latitude` DESC NULLS FIRST")),
    502 -> (_ => """SELECT id, ST_GeometryType(g), ST_GeometryTypeCode(g) FROM (
      SELECT 'ls' AS id, ST_GeomFromText('LINESTRING(77.29 29.07,77.42 29.26,77.27 29.31,77.29 29.07)') AS g
      UNION ALL SELECT 'p', ST_Point(0.0, 0.0)
      UNION ALL SELECT 'np', ST_Point(0.0, CAST(NULL AS DECIMAL))
      UNION ALL SELECT 'mp', ST_GeomFromText('MULTIPOLYGON(((1 1, 2 2, 5 3, 1 1)),
                                              ((0 0, 2 2, 5 3, 0 0)))')) AS t"""),
    655 -> (_ => """SELECT ST_GeometryType(geomA) As geomtype,
        ST_Contains(geomA,geomA) AS acontainsa,
        ST_ContainsProperly(geomA, geomA) AS acontainspropa,
        ST_Contains(geomA, ST_Boundary(geomA)) As acontainsba,
        ST_ContainsProperly(geomA, ST_Boundary(geomA)) As acontainspropba
      FROM (SELECT ST_Buffer(ST_Point(1.0,1.0), 5) AS geomA
            UNION ALL SELECT ST_MakeLine(ST_Point(1.0,1.0), ST_Point(-1.0,-1.0))
            UNION ALL SELECT ST_Point(1.0,1.0)) As foo""")
  )

  val skips: Map[Int, String] = Map(
    // The three ST_Buffer goldens are truncated AND their unprinted tails
    // depend on the ESRI OperatorBuffer's internal arc recurrence: the
    // printed prefix is a clockwise 96-gon from absolute angle 0 (our
    // closed-form model reproduces the visible vertices digit-for-digit)
    // but the total-length gate misses by ~10 chars — low-order digits of
    // the arc interior differ under any reconstruction we can check
    // blind. The buffer kernel is oracled by the geo_buffer_line /
    // geo_buffer_poly registry queries with closed-form area checks.
    779 -> "truncated ESRI buffer golden — unprinted arc digits unassertable",
    786 -> "truncated ESRI buffer golden — unprinted arc digits unassertable",
    794 -> "truncated ESRI buffer golden — unprinted arc digits unassertable")

  /** spatial.iq's GEO schema qualifier on top of the shared dialect. */
  private def geoDialect(sql: String): String =
    dialect(sql).replace("GEO.", "")

  override protected def runBlock(b: Iq.Block): Unit = {
    register(b.dataset)
    val sql = rewrites.get(b.line).fold(geoDialect(b.sql))(f => f(geoDialect(b.sql)))
    val raw = spark.sql(sql)
    // a raw geometry column prints as its ESRI JSON, like the reference.
    // Generated column names embed the whole expression text, which
    // df.col() cannot re-resolve — go through positional safe names and
    // alias the originals back.
    val safe = raw.toDF(raw.columns.indices.map(i => s"__c$i"): _*)
    val cols = raw.schema.fields.zipWithIndex.map { case (f, i) =>
      val c = safe.col(s"__c$i")
      (f.dataType match {
        case s: StructType if s.fieldNames.sameElements(
            Array("kind", "parts", "srid")) => GeoSql.asEsriJson(c)
        case _ => c
      }).as(f.name)
    }
    Iq.assertMatches(s"$iqFile:${b.line}", safe.select(cols.toIndexedSeq: _*), b.expected)
  }

  generateTests()
}
