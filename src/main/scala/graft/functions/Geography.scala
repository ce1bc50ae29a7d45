package graft.functions

import org.apache.spark.sql.SparkSession

import Geometry._

/** GEOGRAPHY tier (reference: src/query/expression/src/types/geography.rs,
  * src/query/functions/src/scalars/geographic/src/geography.rs:71-538,
  * src/common/io/src/geography.rs).
  *
  * Model: a geography value is EWKB whose SRID is 4326 — constructors
  * validate lon in [-180,180] / lat in [-90,90] and reject any other
  * SRID (reference check_point/check_srid, geography.rs:104-117). The
  * shared st_* measure names dispatch on that tag: SRID 4326 operands
  * measure on the sphere in METERS (PostGIS-geography-like), anything
  * else keeps the planar engine. The reference separates the two as
  * column types; a tag-in-the-value is the idiomatic single-namespace
  * equivalent and matches its semantics for values built via
  * st_geographyfrom*.
  *
  * Distance is the reference's exact algorithm (haversine closest-point,
  * io/geography.rs:119-167: min over point-to-geometry great-circle
  * projections, rounded to 9 decimals, sphere radius 6371008.8 m — the
  * geo crate's mean earth radius). Length/area use great-circle segment
  * lengths and l'Huillier spherical excess on the same sphere; the
  * reference uses Karney's ellipsoidal geodesics there, so lengths/areas
  * differ from it by the sphere-vs-WGS84 flattening (< ~0.6%) —
  * documented deviation, gated by tolerance in GeographySpec.
  */
object Geography {

  val Srid = 4326
  /** geo crate MEAN_EARTH_RADIUS (meters) — the haversine radius */
  val EarthRadiusM = 6371008.8

  private def round9(d: Double): Double = math.rint(d * 1e9) / 1e9

  def check(g: Geom): Geom = {
    require(g.srid == 0 || g.srid == Srid,
      s"SRIDs other than 4326 are not supported. Got SRID: ${g.srid}")
    allPoints(g.shape).foreach { p =>
      require(p.x >= -180.0 && p.x <= 180.0, "longitude is out of range")
      require(p.y >= -90.0 && p.y <= 90.0, "latitude is out of range")
    }
    Geom(g.shape, Srid)
  }

  def fromText(s: String): Array[Byte] = toWkb(check(Geometry.fromAny(s)), withSrid = true)
  def fromBinary(b: Array[Byte]): Array[Byte] = toWkb(check(fromWkbOrHex(b)), withSrid = true)

  def isGeography(g: Geom): Boolean = g.srid == Srid

  // ---- spherical measures ---------------------------------------------

  private def rad(d: Double): Double = math.toRadians(d)

  def haversineM(a: Pt, b: Pt): Double = {
    val dLat = rad(b.y - a.y); val dLon = rad(b.x - a.x)
    val h = math.pow(math.sin(dLat / 2), 2) +
      math.cos(rad(a.y)) * math.cos(rad(b.y)) * math.pow(math.sin(dLon / 2), 2)
    2.0 * EarthRadiusM * math.asin(math.min(1.0, math.sqrt(h)))
  }

  private def toUnitVec(p: Pt): (Double, Double, Double) = {
    val lat = rad(p.y); val lon = rad(p.x)
    (math.cos(lat) * math.cos(lon), math.cos(lat) * math.sin(lon), math.sin(lat))
  }

  private def cross(a: (Double, Double, Double), b: (Double, Double, Double)) =
    (a._2 * b._3 - a._3 * b._2, a._3 * b._1 - a._1 * b._3, a._1 * b._2 - a._2 * b._1)
  private def dot(a: (Double, Double, Double), b: (Double, Double, Double)) =
    a._1 * b._1 + a._2 * b._2 + a._3 * b._3
  private def norm(a: (Double, Double, Double)) = math.sqrt(dot(a, a))

  /** great-circle distance (meters) from point p to the arc a-b: the
    * projection of p onto the arc's great circle when it falls within
    * the arc, else the nearer endpoint — the spherical analogue of the
    * geo crate's HaversineClosestPoint used by the reference
    */
  def pointToArcM(p: Pt, a: Pt, b: Pt): Double = {
    if (a == b) return haversineM(p, a)
    val (va, vb, vp) = (toUnitVec(a), toUnitVec(b), toUnitVec(p))
    val n = cross(va, vb)
    val nLen = norm(n)
    if (nLen < 1e-15) return haversineM(p, a) // antipodal/degenerate arc
    // angle from p to the great circle plane
    val sinDist = math.abs(dot(vp, n)) / nLen
    // projection of p onto the plane, check it lies within the arc:
    // within iff it is on the same side as the arc for both endpoints
    val proj = {
      val d = dot(vp, n) / (nLen * nLen)
      (vp._1 - d * n._1, vp._2 - d * n._2, vp._3 - d * n._3)
    }
    val withinArc =
      dot(cross(va, proj), n) >= -1e-15 && dot(cross(proj, vb), n) >= -1e-15
    if (withinArc) EarthRadiusM * math.asin(math.min(1.0, sinDist))
    else math.min(haversineM(p, a), haversineM(p, b))
  }

  private def pointToShapeM(p: Pt, s: Shape): Double = {
    val segs = segments(s)
    if (segs.nonEmpty) segs.map { case (a, b) => pointToArcM(p, a, b) }.min
    else allPoints(s).map(haversineM(p, _)).min
  }

  /** reference haversine_distance_between_geometries (io/geography.rs:132)
    * — min over every vertex of one side projected onto the other
    */
  def distanceM(a: Shape, b: Shape): Double = round9 {
    (a, b) match {
      case (GPoint(p), _) => pointToShapeM(p, b)
      case (_, GPoint(q)) => pointToShapeM(q, a)
      case _ =>
        val left = allPoints(a).map(pointToShapeM(_, b))
        val right = allPoints(b).map(pointToShapeM(_, a))
        (left ++ right).min
    }
  }

  /** great-circle length of linear parts, meters */
  def lengthM(s: Shape): Double = round9 {
    def lineLen(pts: Vector[Pt]): Double =
      pts.sliding(2).collect { case Vector(a, b) => haversineM(a, b) }.sum
    def walk(sh: Shape): Double = sh match {
      case GLineString(pts)        => lineLen(pts)
      case GMultiLineString(lines) => lines.map(lineLen).sum
      case GCollection(shapes)     => shapes.map(walk).sum
      case _                       => 0.0
    }
    walk(s)
  }

  /** unsigned spherical area (m^2) of polygonal parts by l'Huillier
    * spherical excess per vertex triangle fan (exact on the sphere)
    */
  def areaM2(s: Shape): Double = round9 {
    def ringArea(ring: Vector[Pt]): Double = {
      // spherical excess via the generalized shoelace on the sphere:
      // sum of angles between successive vertex vectors around a fan
      if (ring.length < 4) return 0.0
      var sum = 0.0
      val vs = ring.map(toUnitVec)
      for (i <- 1 until vs.length - 2) {
        sum += triangleExcess(vs(0), vs(i), vs(i + 1))
      }
      math.abs(sum) * EarthRadiusM * EarthRadiusM
    }
    def triangleExcess(a: (Double, Double, Double), b: (Double, Double, Double),
        c: (Double, Double, Double)): Double = {
      // signed excess via the tangent half formula (Oosterom & Strackee)
      val num = dot(a, cross(b, c))
      val den = 1.0 + dot(a, b) + dot(b, c) + dot(c, a)
      2.0 * math.atan2(num, den)
    }
    def polyArea(rings: Vector[Vector[Pt]]): Double = rings match {
      case outer +: holes => ringArea(outer) - holes.map(ringArea).sum
      case _              => 0.0
    }
    def walk(sh: Shape): Double = sh match {
      case GPolygon(rings)      => polyArea(rings)
      case GMultiPolygon(polys) => polys.map(polyArea).sum
      case GCollection(shapes)  => shapes.map(walk).sum
      case _                    => 0.0
    }
    walk(s)
  }

  // ---- registration ---------------------------------------------------

  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    val r = spark.udf
    val fromTextUdf = udf((s: String) => Option(s).map(fromText))
    for (n <- Seq("st_geographyfromwkt", "st_geogfromwkt", "st_geographyfromewkt",
                  "st_geographyfromtext", "st_geogfromtext"))
      r.register(n, fromTextUdf)
    // binary variant; a hex STRING cast to binary is ASCII hex and is
    // detected + decoded (fromWkbOrHex), matching the reference's
    // string overload of st_geographyfromwkb
    val fromBinUdf = udf((b: Array[Byte]) => Option(b).map(fromBinary))
    for (n <- Seq("st_geographyfromwkb", "st_geogfromwkb", "st_geogetryfromwkb",
                  "st_geogfromewkb"))
      r.register(n, fromBinUdf)
    r.register("to_geography", fromTextUdf)
    r.register("try_to_geography", udf((s: String) =>
      try Option(s).map(fromText) catch { case _: Exception => None }))
    // geohash cell -> geography (reference geography.rs:257-279)
    r.register("st_geogfromgeohash", udf((h: String) => Option(h).map { hash =>
      val (w, s, e, n) = Geo.geohashBounds(hash)
      fromText(s"POLYGON(($w $s,$w $n,$e $n,$e $s,$w $s))")
    }))
    r.register("st_geogpointfromgeohash", udf((h: String) => Option(h).map { hash =>
      val (lon, lat) = Geo.geohashDecodeImpl(hash)
      fromText(s"POINT($lon $lat)")
    }))
  }
}
