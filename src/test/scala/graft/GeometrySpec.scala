package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geometry
import graft.functions.Geometry._

/** Golden tests for the pure geometry engine plus SQL-level checks of
  * the st_* registrations. WKB goldens are the standard OGC encodings
  * (e.g. POINT(1 2) little-endian = 0101000000...F03F...40); EWKB SRID
  * goldens match the PostGIS extended format the reference emits.
  */
class GeometrySpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-geometry-test")

  private def one(expr: String): Any = {
    graft.functions.GraftFunctions.register(spark)
    spark.sql(s"SELECT $expr AS v").head().get(0)
  }

  private def hex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // ------------------------------------------------------------- codecs

  test("WKB golden: POINT(1 2) little-endian") {
    val g = fromWkt("POINT(1 2)")
    assert(hex(toWkb(g, withSrid = false)) ==
      "0101000000000000000000f03f0000000000000040")
    assert(toWkt(fromWkb(toWkb(g, withSrid = false))) == "POINT(1 2)")
  }

  test("EWKB golden: SRID=4326 flag and payload") {
    val g = fromWkt("SRID=4326;POINT(1 2)")
    assert(g.srid == 4326)
    // 0x20000000 flag set, srid e6100000 (4326 LE)
    assert(hex(toWkb(g, withSrid = true)) ==
      "0101000020e6100000000000000000f03f0000000000000040")
    val back = fromWkb(toWkb(g, withSrid = true))
    assert(back.srid == 4326 && back.shape == GPoint(Pt(1, 2)))
  }

  test("WKT round-trips all seven shapes") {
    val wkts = Seq(
      "POINT(1.5 -2.25)",
      "MULTIPOINT(1 2,3 4)",
      "LINESTRING(0 0,1 1,2 0)",
      "MULTILINESTRING((0 0,1 1),(2 2,3 3))",
      "POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))",
      "MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0)),((5 5,6 5,6 6,5 6,5 5)))",
      "GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    for (w <- wkts) assert(toWkt(fromWkt(w)) == w, s"roundtrip of $w")
    // alternate MULTIPOINT spelling with per-point parens
    assert(toWkt(fromWkt("MULTIPOINT((1 2),(3 4))")) == "MULTIPOINT(1 2,3 4)")
  }

  test("WKB round-trips nested multi shapes") {
    val g = fromWkt("MULTIPOLYGON(((0 0,1 0,1 1,0 1,0 0),(0.2 0.2,0.4 0.2,0.4 0.4,0.2 0.4,0.2 0.2)))")
    assert(fromWkb(toWkb(g, withSrid = false)).shape == g.shape)
    val c = fromWkt("GEOMETRYCOLLECTION(POINT(1 2),POLYGON((0 0,1 0,1 1,0 1,0 0)))")
    assert(fromWkb(toWkb(c, withSrid = false)).shape == c.shape)
  }

  test("GeoJSON round-trip and golden output") {
    val g = fromWkt("POINT(1.5 2.5)")
    assert(toGeoJson(g) == """{"type":"Point","coordinates":[1.5,2.5]}""")
    val poly = fromWkt("POLYGON((0 0,1 0,1 1,0 1,0 0))")
    assert(fromGeoJson(toGeoJson(poly)).shape == poly.shape)
    val coll = fromWkt("GEOMETRYCOLLECTION(POINT(1 2),LINESTRING(0 0,1 1))")
    assert(fromGeoJson(toGeoJson(coll)).shape == coll.shape)
  }

  test("fromAny sniffs WKT, EWKT, hex WKB, GeoJSON") {
    assert(fromAny("POINT(1 2)").shape == GPoint(Pt(1, 2)))
    assert(fromAny("SRID=3857;POINT(1 2)").srid == 3857)
    assert(fromAny("0101000000000000000000f03f0000000000000040").shape == GPoint(Pt(1, 2)))
    assert(fromAny("""{"type":"Point","coordinates":[1,2]}""").shape == GPoint(Pt(1, 2)))
  }

  // ----------------------------------------------------------- measures

  test("area with holes; perimeter; length") {
    val poly = fromWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))").shape
    assert(area(poly) == 96.0)
    assert(perimeter(poly) == 48.0)
    assert(length(poly) == 0.0) // polygons have no line length
    val line = fromWkt("LINESTRING(0 0,3 4,3 8)").shape
    assert(length(line) == 9.0)
  }

  test("distance: point/segment/polygon cases") {
    val p = fromWkt("POINT(0 10)").shape
    val seg = fromWkt("LINESTRING(-5 0,5 0)").shape
    assert(distance(p, seg) == 10.0)
    val sq = fromWkt("POLYGON((0 0,4 0,4 4,0 4,0 0))").shape
    assert(distance(fromWkt("POINT(2 2)").shape, sq) == 0.0) // inside
    assert(distance(fromWkt("POINT(8 2)").shape, sq) == 4.0)
    assert(distance(fromWkt("POINT(7 7)").shape, sq) == math.sqrt(18.0))
    // two parallel segments
    assert(distance(fromWkt("LINESTRING(0 0,10 0)").shape,
      fromWkt("LINESTRING(0 3,10 3)").shape) == 3.0)
  }

  test("hausdorff distance is symmetric max-min") {
    val a = fromWkt("LINESTRING(0 0,10 0)").shape
    val b = fromWkt("LINESTRING(0 2,10 5)").shape
    assert(hausdorff(a, b) == 5.0)
    assert(hausdorff(b, a) == 5.0)
  }

  test("azimuth follows the north-clockwise convention") {
    assert(azimuth(Pt(0, 0), Pt(0, 1)).get == 0.0)
    assert(azimuth(Pt(0, 0), Pt(1, 0)).get == math.Pi / 2)
    assert(math.abs(azimuth(Pt(0, 0), Pt(1, 1)).get - math.Pi / 4) < 1e-12)
    assert(azimuth(Pt(0, 0), Pt(0, -1)).get == math.Pi)
    assert(azimuth(Pt(2, 3), Pt(2, 3)).isEmpty)
  }

  // --------------------------------------------------------- predicates

  test("intersects / disjoint across dimension combos") {
    val sq = fromWkt("POLYGON((0 0,4 0,4 4,0 4,0 0))").shape
    assert(intersects(sq, fromWkt("POINT(2 2)").shape))
    assert(intersects(sq, fromWkt("POINT(0 0)").shape)) // boundary touches
    assert(disjoint(sq, fromWkt("POINT(9 9)").shape))
    assert(intersects(sq, fromWkt("LINESTRING(-1 2,5 2)").shape)) // crosses
    assert(intersects(sq, fromWkt("POLYGON((3 3,7 3,7 7,3 7,3 3))").shape)) // overlap
    assert(intersects(sq, fromWkt("POLYGON((1 1,2 1,2 2,1 2,1 1))").shape)) // nested
    assert(disjoint(sq, fromWkt("POLYGON((10 10,12 10,12 12,10 12,10 10))").shape))
    assert(intersects(fromWkt("LINESTRING(0 0,4 4)").shape,
      fromWkt("LINESTRING(0 4,4 0)").shape)) // X crossing
  }

  test("contains vs covers: boundary semantics") {
    val sq = fromWkt("POLYGON((0 0,4 0,4 4,0 4,0 0))").shape
    val boundaryPt = fromWkt("POINT(0 2)").shape
    val innerPt = fromWkt("POINT(2 2)").shape
    assert(contains(sq, innerPt) && covers(sq, innerPt))
    assert(!contains(sq, boundaryPt) && covers(sq, boundaryPt))
    // hole: point in hole is outside
    val holed = fromWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(2 2,4 2,4 4,2 4,2 2))").shape
    assert(!contains(holed, fromWkt("POINT(3 3)").shape))
    assert(contains(holed, fromWkt("POINT(6 6)").shape))
    // line inside / crossing
    assert(contains(sq, fromWkt("LINESTRING(1 1,3 3)").shape))
    assert(!contains(sq, fromWkt("LINESTRING(2 2,9 2)").shape))
    // polygon in polygon
    assert(contains(sq, fromWkt("POLYGON((1 1,2 1,2 2,1 2,1 1))").shape))
    assert(within(fromWkt("POLYGON((1 1,2 1,2 2,1 2,1 1))").shape, sq))
    // line contains point; endpoints are boundary
    val line = fromWkt("LINESTRING(0 0,10 0)").shape
    assert(contains(line, fromWkt("POINT(5 0)").shape))
    assert(!contains(line, fromWkt("POINT(0 0)").shape))
    assert(covers(line, fromWkt("POINT(0 0)").shape))
  }

  test("reference slt block: contains on triangle fixtures (02_0060_function_geometry)") {
    val poly = fromWkt("POLYGON((-2 0, 0 2, 2 0, -2 0))").shape
    val polyInside = fromWkt("POLYGON((-1 0, 0 1, 1 0, -1 0))").shape
    val lineOnBoundary = fromWkt("LINESTRING(-1 1, 0 2, 1 1)").shape
    val lineInside = fromWkt("LINESTRING(-2 0, 0 0, 0 1)").shape
    assert(contains(poly, polyInside))
    assert(contains(poly, poly)) // self-containment
    assert(!contains(poly, lineOnBoundary))
    assert(contains(poly, lineInside))
    // dwithin thresholds from the same slt file
    assert(dwithin(fromWkt("POINT(0 0)").shape, fromWkt("POINT(1 1)").shape, 1.5))
    assert(!dwithin(fromWkt("POINT(0 0)").shape, fromWkt("POINT(1 1)").shape, 1.414))
    assert(dwithin(fromWkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))").shape,
      fromWkt("POLYGON((4 0, 6 0, 6 2, 4 2, 4 0))").shape, 2.0))
    assert(!dwithin(fromWkt("POLYGON((0 0, 2 0, 2 2, 0 2, 0 0))").shape,
      fromWkt("POLYGON((4 0, 6 0, 6 2, 4 2, 4 0))").shape, 1.9))
    // makeline keeps the srid; wkt trims trailing zeros (slt goldens)
    assert(toEwkt(Geom(GLineString(Vector(Pt(33.0, 44.2), Pt(224.5, 41.5))), 32633)) ==
      "SRID=32633;LINESTRING(33 44.2,224.5 41.5)")
    assert(toWkt(fromWkt("POINT(4.500212 52.161170)")) == "POINT(4.500212 52.16117)")
  }

  test("equals normalizes direction, rotation, and part order") {
    assert(equalsShape(fromWkt("LINESTRING(0 0,1 1)").shape,
      fromWkt("LINESTRING(1 1,0 0)").shape))
    assert(equalsShape(
      fromWkt("POLYGON((0 0,4 0,4 4,0 4,0 0))").shape,
      fromWkt("POLYGON((4 4,0 4,0 0,4 0,4 4))").shape)) // rotated + same orientation
    assert(equalsShape(
      fromWkt("POLYGON((0 0,4 0,4 4,0 4,0 0))").shape,
      fromWkt("POLYGON((0 0,0 4,4 4,4 0,0 0))").shape)) // reversed orientation
    assert(equalsShape(
      fromWkt("MULTIPOINT(1 2,3 4)").shape,
      fromWkt("MULTIPOINT(3 4,1 2)").shape))
    assert(!equalsShape(fromWkt("POINT(1 2)").shape, fromWkt("POINT(2 1)").shape))
  }

  // --------------------------------------------------------- operations

  test("centroid: square, holed square, line, points") {
    val sq = fromWkt("POLYGON((0 0,10 0,10 10,0 10,0 0))").shape
    assert(centroid(sq).get == Pt(5, 5))
    val holed = fromWkt("POLYGON((0 0,10 0,10 10,0 10,0 0),(0 0,4 0,4 4,0 4,0 0))").shape
    // 100-weight at (5,5) minus 16 at (2,2): ((500-32)/84, same) = (5.571428..., 5.571428...)
    val c = centroid(holed).get
    assert(math.abs(c.x - 468.0 / 84.0) < 1e-12 && math.abs(c.y - 468.0 / 84.0) < 1e-12)
    assert(centroid(fromWkt("LINESTRING(0 0,10 0)").shape).get == Pt(5, 0))
    assert(centroid(fromWkt("MULTIPOINT(0 0,2 0,2 2,0 2)").shape).get == Pt(1, 1))
  }

  test("envelope degenerates to point/line for flat boxes") {
    assert(toWkt(Geom(envelope(fromWkt("LINESTRING(1 1,5 3)").shape), 0)) ==
      "POLYGON((1 1,5 1,5 3,1 3,1 1))")
    assert(envelope(fromWkt("POINT(2 3)").shape) == GPoint(Pt(2, 3)))
    assert(envelope(fromWkt("LINESTRING(0 5,9 5)").shape) ==
      GLineString(Vector(Pt(0, 5), Pt(9, 5))))
  }

  test("convex hull of a point cloud") {
    val cloud = fromWkt("MULTIPOINT(0 0,4 0,4 4,0 4,2 2,1 1,3 1)").shape
    assert(toWkt(Geom(convexHull(cloud), 0)) == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(convexHull(fromWkt("MULTIPOINT(1 1,5 5,3 3)").shape) ==
      GLineString(Vector(Pt(1, 1), Pt(5, 5)))) // collinear
    assert(convexHull(fromWkt("POINT(7 8)").shape) == GPoint(Pt(7, 8)))
  }

  test("simplify drops within-tolerance vertices, keeps rings closed") {
    val line = fromWkt("LINESTRING(0 0,1 0.1,2 -0.1,3 5,4 6,5 7,6 8.1,7 9,8 9,9 9)").shape
    val s = simplify(line, 1.0).asInstanceOf[GLineString]
    assert(s.pts.head == Pt(0, 0) && s.pts.last == Pt(9, 9))
    assert(s.pts.length < 10)
    val ring = fromWkt("POLYGON((0 0,5 0.01,10 0,10 10,0 10,0 0))").shape
    val sp = simplify(ring, 0.1).asInstanceOf[GPolygon]
    assert(sp.rings.head.length == 5 && sp.rings.head.head == sp.rings.head.last)
  }

  test("transform 4326 <-> 3857 web mercator") {
    def pt(s: Shape): Pt = s match { case GPoint(p) => p; case o => fail(s"not a point: $o") }
    val m = transform(fromWkt("SRID=4326;POINT(180 0)"), 4326, 3857)
    assert(math.abs(pt(m.shape).x - 20037508.342789) < 1e-5) // known world-edge constant
    assert(pt(m.shape).y == 0.0)
    assert(m.srid == 3857)
    val paris = transform(fromWkt("SRID=4326;POINT(2.352222 48.856614)"), 4326, 3857)
    assert(math.abs(pt(paris.shape).x - 261848.155273) < 1e-2) // lon * R*pi/180
    val back = transform(paris, 3857, 4326)
    assert(math.abs(pt(back.shape).x - 2.352222) < 1e-5 &&
      math.abs(pt(back.shape).y - 48.856614) < 1e-5)
  }

  test("isValid structural checks") {
    assert(isValid(fromWkt("POLYGON((0 0,1 0,1 1,0 1,0 0))").shape))
    assert(!isValid(GPolygon(Vector(Vector(Pt(0, 0), Pt(1, 0), Pt(0, 0)))))) // 3 pts
    assert(!isValid(GLineString(Vector(Pt(0, 0))))) // 1 pt
    assert(!isValid(GPoint(Pt(Double.NaN, 0))))
  }

  // ------------------------------------------------------------- SQL api

  test("SQL: constructors, accessors, text round-trip") {
    assert(one("st_astext(st_makepoint(1.5, 2.5))") == "POINT(1.5 2.5)")
    assert(one("st_x(st_makepoint(1.5, 2.5))") == 1.5)
    assert(one("st_y(st_geomfromtext('POINT(3 4)'))") == 4.0)
    assert(one("st_srid(st_setsrid(st_makepoint(1, 2), 4326))") == 4326)
    assert(one("st_srid(st_makepoint(1, 2))") == 0)
    assert(one("st_asewkt(st_geomfromtext('POINT(1 2)', 4326))") == "SRID=4326;POINT(1 2)")
    assert(one("st_astext(st_geomfromwkb('0101000000000000000000f03f0000000000000040'))")
      == "POINT(1 2)")
    assert(one("st_astext(st_geomfromwkb(st_aswkb(st_makepoint(9, 9))))") == "POINT(9 9)")
    assert(one("try_to_geometry('nonsense')") == null)
    assert(one("st_astext(to_geometry('{\"type\":\"Point\",\"coordinates\":[1,2]}'))")
      == "POINT(1 2)")
  }

  test("SQL: measures and predicates") {
    assert(one("st_area(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))'))") == 100.0)
    assert(one("st_length(st_makeline(st_makepoint(0,0), st_makepoint(3,4)))") == 5.0)
    assert(one("st_distance(st_makepoint(0,0), st_makepoint(3,4))") == 5.0)
    assert(one("st_contains(st_geomfromtext('POLYGON((0 0,4 0,4 4,0 4,0 0))'), st_makepoint(2,2))")
      == true)
    assert(one("st_dwithin(st_makepoint(0,0), st_makepoint(3,4), 5.0)") == true)
    assert(one("st_npoints(st_geomfromtext('LINESTRING(0 0,1 1,2 2)'))") == 3)
    assert(one("st_dimension(st_geomfromtext('POLYGON((0 0,1 0,1 1,0 1,0 0))'))") == 2)
  }

  test("SQL: pointn / startpoint / endpoint / geohash family") {
    assert(one("st_astext(st_pointn(st_geomfromtext('LINESTRING(0 0,1 1,2 2)'), 2))")
      == "POINT(1 1)")
    assert(one("st_astext(st_pointn(st_geomfromtext('LINESTRING(0 0,1 1,2 2)'), -1))")
      == "POINT(2 2)")
    assert(one("st_astext(st_startpoint(st_geomfromtext('LINESTRING(7 8,9 9)')))")
      == "POINT(7 8)")
    assert(one("st_geohash(st_makepoint(-5.60302734375, 42.60498046875), 5)") == "ezs42")
    assert(one("st_astext(st_geompointfromgeohash('ezs42'))")
      == "POINT(-5.60302734375 42.60498046875)")
    assert(one("st_intersects(st_geomfromgeohash('ezs42'), st_makepoint(-5.6, 42.6))") == true)
  }

  test("SQL: st_collect / st_envelope_agg aggregates") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.sql("""
      |SELECT st_npoints(st_collect(p)) AS n,
      |       st_astext(st_envelope_agg(p)) AS env,
      |       st_astext(st_convexhull(st_collect(p))) AS hull
      |FROM (SELECT st_makepoint(x, y) AS p
      |      FROM VALUES (0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (2.0, 2.0) t(x, y))
      |""".stripMargin).head()
    assert(df.getAs[Int]("n") == 5)
    assert(df.getAs[String]("env") == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(df.getAs[String]("hull") == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    // heterogeneous input falls back to GEOMETRYCOLLECTION
    val mixed = spark.sql("""
      |SELECT st_astext(st_collect(g)) AS t FROM (
      |  SELECT st_makepoint(1, 2) AS g
      |  UNION ALL SELECT st_makeline(st_makepoint(0, 0), st_makepoint(1, 1)))
      |""".stripMargin).head().getString(0)
    assert(mixed.startsWith("GEOMETRYCOLLECTION("))
  }

  test("SQL: transform, hilbert, centroid, envelope, hull, simplify, geojson") {
    assert(one("st_y(st_transform(st_makepoint(10, 0), 4326, 3857))") == 0.0)
    val h1 = one("st_hilbert(st_makepoint(1, 2))").asInstanceOf[Long]
    val h2 = one("st_hilbert(st_makepoint(1, 2))").asInstanceOf[Long]
    assert(h1 == h2 && h1 >= 0)
    assert(one("st_hilbert(st_makepoint(0, 0), array(-10D, -10D, 10D, 10D))")
      .asInstanceOf[Long] >= 0)
    assert(one("st_astext(st_centroid(st_geomfromtext('POLYGON((0 0,10 0,10 10,0 10,0 0))')))")
      == "POINT(5 5)")
    assert(one("st_astext(st_envelope(st_geomfromtext('LINESTRING(1 1,5 3)')))")
      == "POLYGON((1 1,5 1,5 3,1 3,1 1))")
    assert(one("st_astext(st_convexhull(st_geomfromtext('MULTIPOINT(0 0,4 0,4 4,0 4,2 2)')))")
      == "POLYGON((0 0,4 0,4 4,0 4,0 0))")
    assert(one("st_npoints(st_simplify(st_geomfromtext('LINESTRING(0 0,1 0.01,2 0,3 0.01,4 0)'), 0.5))")
      == 2)
    assert(one("st_asgeojson(st_makepoint(1, 2))") == """{"type":"Point","coordinates":[1.0,2.0]}""")
  }
}
