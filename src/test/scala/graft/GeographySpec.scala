package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Geography, Geometry}
import graft.functions.Geometry._

/** GEOGRAPHY tier: constructor validation, the SRID-4326 dispatch on
  * the shared st_* measure names, and spherical measures against
  * closed-form values (quarter meridians, octant areas) that do not
  * reuse the implementation's own formulas.
  */
class GeographySpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-geography-test")

  private val R = Geography.EarthRadiusM

  test("constructors validate ranges and SRID") {
    val g = Geometry.fromWkb(Geography.fromText("POINT(2.35 48.85)"))
    assert(g.srid == 4326)
    assert(g.shape == GPoint(Pt(2.35, 48.85)))
    intercept[IllegalArgumentException](Geography.fromText("POINT(181 0)"))
    intercept[IllegalArgumentException](Geography.fromText("POINT(0 91)"))
    intercept[IllegalArgumentException](Geography.fromText("SRID=3857;POINT(1 2)"))
    // EWKT with srid 4326 accepted; plain WKT gets tagged 4326
    assert(Geometry.fromWkb(Geography.fromText("SRID=4326;POINT(1 2)")).srid == 4326)
    // wkb round trip keeps the tag
    val viaBin = Geography.fromBinary(Geography.fromText("POINT(10 20)"))
    assert(Geometry.fromWkb(viaBin).srid == 4326)
  }

  test("haversine distance matches closed forms (radius 6371008.8)") {
    def d(a: String, b: String): Double =
      Geography.distanceM(Geometry.fromWkt(a).shape, Geometry.fromWkt(b).shape)
    val quarter = math.Pi / 2 * R
    assert(math.abs(d("POINT(0 0)", "POINT(0 90)") - quarter) < 1e-3)
    assert(math.abs(d("POINT(0 0)", "POINT(90 0)") - quarter) < 1e-3)
    assert(math.abs(d("POINT(0 0)", "POINT(180 0)") - math.Pi * R) < 1e-3)
    // one degree of meridian
    assert(math.abs(d("POINT(10 0)", "POINT(10 1)") - math.Pi * R / 180) < 1e-3)
    assert(d("POINT(5 5)", "POINT(5 5)") == 0.0)
  }

  test("point-to-arc closest point (not just vertices)") {
    // point 1 degree north of the midpoint of an equatorial arc: the
    // closest point is the projection (0,0), not an endpoint
    val line = Geometry.fromWkt("LINESTRING(-10 0, 10 0)").shape
    val p = Geometry.fromWkt("POINT(0 1)").shape
    val oneDeg = math.Pi * R / 180
    assert(math.abs(Geography.distanceM(p, line) - oneDeg) < 1.0)
    // far off the arc: nearest endpoint wins
    val q = Geometry.fromWkt("POINT(20 0)").shape
    assert(math.abs(Geography.distanceM(q, line) - 10 * oneDeg) < 1.0)
  }

  test("spherical length and area closed forms") {
    val tenDeg = Geometry.fromWkt("LINESTRING(0 0, 10 0)").shape
    assert(math.abs(Geography.lengthM(tenDeg) - math.Pi * R * 10 / 180) < 1e-3)
    // octant of the sphere: area = 4*pi*R^2 / 8
    val octant = Geometry.fromWkt("POLYGON((0 0, 90 0, 0 90, 0 0))").shape
    val expected = math.Pi * R * R / 2
    assert(math.abs(Geography.areaM2(octant) - expected) / expected < 1e-12)
    // area is unsigned regardless of ring orientation
    val cw = Geometry.fromWkt("POLYGON((0 0, 0 90, 90 0, 0 0))").shape
    assert(math.abs(Geography.areaM2(cw) - expected) / expected < 1e-12)
  }

  test("SQL surface: srid tag selects meters; planar stays planar") {
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  st_distance(st_geographyfromwkt('POINT(0 0)'), st_geographyfromwkt('POINT(0 90)')) AS geodesic,
        |  st_distance(st_geomfromwkt('POINT(0 0)'), st_geomfromwkt('POINT(0 90)')) AS planar,
        |  st_srid(st_geographyfromwkt('POINT(1 2)')) AS srid,
        |  st_dwithin(st_geographyfromwkt('POINT(0 0)'), st_geographyfromwkt('POINT(0 1)'), 120000.0) AS nearby,
        |  st_length(st_geographyfromwkt('LINESTRING(0 0, 10 0)')) AS len_m,
        |  st_area(st_geographyfromwkt('POLYGON((0 0, 90 0, 0 90, 0 0))')) AS area_m2,
        |  try_to_geography('POINT(200 0)') AS bad,
        |  st_aswkt(st_geogpointfromgeohash('u09t')) AS gh
        |""".stripMargin).collect()(0)
    assert(math.abs(row.getDouble(0) - math.Pi / 2 * R) < 1e-3)
    assert(row.getDouble(1) == 90.0) // planar degrees
    assert(row.getInt(2) == 4326)
    assert(row.getBoolean(3))
    assert(math.abs(row.getDouble(4) - math.Pi * R * 10 / 180) < 1e-3)
    assert(math.abs(row.getDouble(5) - math.Pi * R * R / 2) < 1.0)
    assert(row.isNullAt(6))
    assert(row.getString(7).startsWith("POINT("))
    // alias surface resolves
    for (n <- Seq("st_geogfromwkt", "st_geographyfromewkt", "st_geographyfromtext",
                  "st_geogfromtext", "st_geogfromwkb", "st_geogetryfromwkb",
                  "st_geogfromewkb", "st_geogfromgeohash", "to_geography"))
      assert(spark.sql(s"SELECT $n(NULL) IS NULL").collect()(0).getBoolean(0), n)
  }
}
