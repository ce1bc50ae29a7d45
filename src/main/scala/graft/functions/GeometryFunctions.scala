package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{BinaryType, IntegerType}

import Geometry._

/** The `st_*` SQL surface over the pure engine in Geometry.scala
  * (reference registry: geographic/src/geometry.rs — 67 names; the 5
  * polygon-clipping names st_buffer/st_union/st_intersection/
  * st_difference/st_symdifference need a clipping engine and stay out
  * of scope, recorded in COVERAGE.md).
  *
  * Geometry columns are EWKB bytes, like the reference's GeometryType.
  * Everything registers as small scalar UDFs — geometry is not a scan
  * hot path, and each call is parse → O(vertices) math → serialize.
  * Multi-arity names (optional SRID / precision / bounds args) resolve
  * through `rewrites`, which fills defaults at bind time and calls the
  * single registered `*_impl` UDF.
  */
object GeometryFunctions {

  // ------------------------------------------------------------ helpers

  private def geom(b: Array[Byte]): Geom = fromWkb(b)
  private def ser(g: Geom): Array[Byte] = toWkb(g, withSrid = true)
  private def serShape(s: Shape, srid: Int): Array[Byte] = ser(Geom(s, srid))

  // null-safe wrappers: Array[Byte] params need explicit guards; scalar
  // results return Option so SQL nulls propagate through the encoder
  private def g1[R](f: Geom => R): Array[Byte] => R =
    (b: Array[Byte]) => if (b == null) null.asInstanceOf[R] else f(geom(b))
  private def g2[R](f: (Geom, Geom) => R): (Array[Byte], Array[Byte]) => R =
    (a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null.asInstanceOf[R] else f(geom(a), geom(b))


  // -------------------------------------------------- bind-time rewrites

  private def f(name: String, as: Expression*): Expression =
    UnresolvedFunction(name, as.toSeq, isDistinct = false)

  /** names that dispatch on arity (optional srid / precision / bounds) —
    * injected like MoreAliases2.rewrites; all geometry names are
    * UDF-backed so none go through the config-only extensions path
    */
  val rewrites: Map[String, Seq[Expression] => Expression] = {
    val fromText: Seq[Expression] => Expression = a =>
      f("st_geomtext_impl", a.head,
        if (a.length > 1) Cast(a(1), IntegerType) else Literal(-1))
    val fromBin: Seq[Expression] => Expression = a =>
      f("st_geombin_impl", Cast(a.head, BinaryType),
        if (a.length > 1) Cast(a(1), IntegerType) else Literal(-1))
    Map(
      "st_geometryfromwkt" -> fromText, "st_geomfromwkt" -> fromText,
      "st_geometryfromtext" -> fromText, "st_geomfromtext" -> fromText,
      "st_geometryfromewkt" -> fromText, "st_geomfromewkt" -> fromText,
      "to_geometry" -> fromText, "try_to_geometry" -> (a =>
        f("st_trygeomtext_impl", a.head,
          if (a.length > 1) Cast(a(1), IntegerType) else Literal(-1))),
      "st_geometryfromwkb" -> fromBin, "st_geomfromwkb" -> fromBin,
      "st_geometryfromewkb" -> fromBin, "st_geomfromewkb" -> fromBin,
      "st_geohash" -> (a => f("st_geohash_impl", a.head,
        if (a.length > 1) Cast(a(1), IntegerType) else Literal(12))),
      "st_transform" -> (a =>
        if (a.length >= 3)
          f("st_transform3_impl", a.head, Cast(a(1), IntegerType), Cast(a(2), IntegerType))
        else f("st_transform2_impl", a.head, Cast(a(1), IntegerType))),
      "st_hilbert" -> (a =>
        if (a.length >= 2) f("st_hilbert2_impl", a.head, a(1))
        else f("st_hilbert1_impl", a.head)))
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.udf

    // ------------------------------------------------------ constructors
    val mkPoint = udf((x: Double, y: Double) => serShape(GPoint(Pt(x, y)), 0))
    // st_point is the reference's geography-tier alias of st_makepoint
    // (geographic/src/geography.rs:73); same lon/lat doubles here
    Seq("st_makepoint", "st_makegeompoint", "st_geom_point", "st_point")
      .foreach(r.register(_, mkPoint))

    r.register("st_geomtext_impl", udf((s: String, srid: Int) =>
      if (s == null) null else {
        val g = fromAny(s)
        ser(if (srid >= 0) g.copy(srid = srid) else g)
      }))
    r.register("st_trygeomtext_impl", udf((s: String, srid: Int) =>
      if (s == null) null
      else
        try { val g = fromAny(s); ser(if (srid >= 0) g.copy(srid = srid) else g) }
        catch { case _: Exception => null }))
    r.register("st_geombin_impl", udf((b: Array[Byte], srid: Int) =>
      if (b == null) null else {
        val g = fromWkbOrHex(b)
        ser(if (srid >= 0) g.copy(srid = srid) else g)
      }))

    val mkLine = udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) null
      else {
        // concat the coordinate sequences of point/multipoint/linestring
        // args (reference st_makeline, geometry.rs:226)
        val ga = geom(a); val gb = geom(b)
        def pts(s: Shape): Vector[Pt] = s match {
          case GPoint(p) => Vector(p)
          case GMultiPoint(ps) => ps
          case GLineString(ps) => ps
          case o => sys.error(s"st_makeline: unsupported input ${o.getClass.getSimpleName}")
        }
        serShape(GLineString(pts(ga.shape) ++ pts(gb.shape)), ga.srid)
      })
    Seq("st_makeline", "st_make_line").foreach(r.register(_, mkLine))

    val mkPoly = udf(g1 { g =>
      g.shape match {
        case GLineString(pts) if pts.length >= 4 && pts.head == pts.last =>
          serShape(GPolygon(Vector(pts)), g.srid)
        case _ => sys.error("st_makepolygon: input must be a closed linestring with >= 4 points")
      }
    })
    Seq("st_makepolygon", "st_polygon").foreach(r.register(_, mkPoly))
    // oriented variant forces a CCW exterior ring
    r.register("st_makepolygonoriented", udf(g1 { g =>
      g.shape match {
        case GLineString(pts) if pts.length >= 4 && pts.head == pts.last =>
          val ring = if (signedArea(pts) < 0) pts.reverse else pts
          serShape(GPolygon(Vector(ring)), g.srid)
        case _ => sys.error("st_makepolygonoriented: input must be a closed linestring")
      }
    }))

    // geohash cell -> bbox polygon / center point
    r.register("st_geomfromgeohash", udf((h: String) =>
      if (h == null) null else {
        // ring order matches the reference's slt golden (CCW from the
        // bottom-right corner, 02_0060_function_geometry)
        val (latLo, latHi, lonLo, lonHi) = Geo.geohashBounds(h)
        serShape(GPolygon(Vector(Vector(
          Pt(lonHi, latLo), Pt(lonHi, latHi), Pt(lonLo, latHi),
          Pt(lonLo, latLo), Pt(lonHi, latLo)))), 0)
      }))
    r.register("st_geompointfromgeohash", udf((h: String) =>
      if (h == null) null else {
        val (latLo, latHi, lonLo, lonHi) = Geo.geohashBounds(h)
        serShape(GPoint(Pt((lonLo + lonHi) / 2, (latLo + latHi) / 2)), 0)
      }))

    // ----------------------------------------------------------- outputs
    val asText = udf(g1(g => toWkt(g)))
    Seq("st_astext", "st_aswkt").foreach(r.register(_, asText))
    r.register("st_asewkt", udf(g1(g => toEwkt(g))))
    val asBin = udf(g1(g => toWkb(g, withSrid = false)))
    Seq("st_asbinary", "st_aswkb").foreach(r.register(_, asBin))
    r.register("st_asewkb", udf(g1(g => toWkb(g, withSrid = true))))
    r.register("st_asgeojson", udf(g1(g => toGeoJson(g))))

    // --------------------------------------------------------- accessors
    r.register("st_x", udf((b: Array[Byte]) => Option(b).flatMap(x => geom(x).shape match {
      case GPoint(p) => Some(p.x); case _ => None
    })))
    r.register("st_y", udf((b: Array[Byte]) => Option(b).flatMap(x => geom(x).shape match {
      case GPoint(p) => Some(p.y); case _ => None
    })))
    r.register("st_xmin", udf((b: Array[Byte]) => Option(b).map(x => bbox(geom(x).shape)._1)))
    r.register("st_ymin", udf((b: Array[Byte]) => Option(b).map(x => bbox(geom(x).shape)._2)))
    r.register("st_xmax", udf((b: Array[Byte]) => Option(b).map(x => bbox(geom(x).shape)._3)))
    r.register("st_ymax", udf((b: Array[Byte]) => Option(b).map(x => bbox(geom(x).shape)._4)))
    r.register("st_srid", udf((b: Array[Byte]) => Option(b).map(x => geom(x).srid)))
    r.register("st_setsrid", udf((b: Array[Byte], srid: Int) =>
      if (b == null) null else ser(geom(b).copy(srid = srid))))
    val nPts = udf((b: Array[Byte]) => Option(b).map(x => npoints(geom(x).shape)))
    Seq("st_npoints", "st_numpoints").foreach(r.register(_, nPts))
    r.register("st_dimension", udf((b: Array[Byte]) => Option(b).map(x => dimension(geom(x).shape))))
    r.register("st_startpoint", udf(g1 { g =>
      g.shape match {
        case GLineString(pts) => serShape(GPoint(pts.head), g.srid)
        case _ => null
      }
    }))
    r.register("st_endpoint", udf(g1 { g =>
      g.shape match {
        case GLineString(pts) => serShape(GPoint(pts.last), g.srid)
        case _ => null
      }
    }))
    // 1-based; negative counts from the end (reference st_pointn)
    r.register("st_pointn", udf((b: Array[Byte], n: Int) =>
      if (b == null) null
      else geom(b) match {
        case Geom(GLineString(pts), srid) =>
          val i = if (n < 0) pts.length + n else n - 1
          if (i < 0 || i >= pts.length) null else serShape(GPoint(pts(i)), srid)
        case _ => null
      }))
    r.register("st_geohash_impl", udf((b: Array[Byte], precision: Int) =>
      if (b == null) null
      else geom(b).shape match {
        case GPoint(p) => Geo.geohashEncodeImpl(p.x, p.y, precision)
        case _ => sys.error("st_geohash expects a point")
      }))

    // ---------------------------------------------------------- measures
    // GEOGRAPHY dispatch (reference keeps a separate GeographyType;
    // here the SRID-4326 tag in the EWKB selects spherical meters —
    // graft.functions.Geography scaladoc)
    r.register("st_area", udf((b: Array[Byte]) => Option(b).map { x =>
      val g = geom(x)
      if (Geography.isGeography(g)) Geography.areaM2(g.shape) else area(g.shape)
    }))
    r.register("st_length", udf((b: Array[Byte]) => Option(b).map { x =>
      val g = geom(x)
      if (Geography.isGeography(g)) Geography.lengthM(g.shape) else length(g.shape)
    }))
    r.register("st_perimeter", udf((b: Array[Byte]) => Option(b).map(x => perimeter(geom(x).shape))))
    r.register("st_distance", udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) None
      else {
        val (ga, gb) = (geom(a), geom(b))
        if (Geography.isGeography(ga) && Geography.isGeography(gb))
          Some(Geography.distanceM(ga.shape, gb.shape))
        else Some(distance(ga.shape, gb.shape))
      }))
    r.register("st_dwithin", udf((a: Array[Byte], b: Array[Byte], d: Double) =>
      if (a == null || b == null) None
      else {
        val (ga, gb) = (geom(a), geom(b))
        if (Geography.isGeography(ga) && Geography.isGeography(gb))
          Some(Geography.distanceM(ga.shape, gb.shape) <= d)
        else Some(dwithin(ga.shape, gb.shape, d))
      }))
    r.register("st_hausdorffdistance", udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) None
      else Some(hausdorff(geom(a).shape, geom(b).shape))))
    r.register("st_azimuth", udf((a: Array[Byte], b: Array[Byte]) =>
      if (a == null || b == null) None
      else (geom(a).shape, geom(b).shape) match {
        case (GPoint(p), GPoint(q)) => azimuth(p, q)
        case _ => None
      }))

    // -------------------------------------------------------- predicates
    def pred(name: String, f: (Shape, Shape) => Boolean): Unit =
      r.register(name, udf((a: Array[Byte], b: Array[Byte]) =>
        if (a == null || b == null) None else {
          val (ga, gb) = (geom(a), geom(b))
          // reference geometry.rs: binary predicates refuse mixed
          // SRIDs (1090) rather than comparing across systems
          require(ga.srid == 0 || gb.srid == 0 || ga.srid == gb.srid,
            s"1090: Incompatible SRID: ${ga.srid} vs ${gb.srid}")
          // EMPTY geometries relate to nothing (OGC: every predicate
          // over an empty operand is false)
          if (Geometry.isEmptyShape(ga.shape) || Geometry.isEmptyShape(gb.shape)) Some(false)
          else Some(f(ga.shape, gb.shape))
        }))
    pred("st_contains", contains)
    pred("st_within", within)
    pred("st_covers", covers)
    pred("st_coveredby", coveredBy)
    pred("st_intersects", intersects)
    pred("st_disjoint", disjoint)
    pred("st_equals", equalsShape)
    r.register("st_isvalid", udf((b: Array[Byte]) => Option(b).map(x => isValid(geom(x).shape))))

    // -------------------------------------------------------- operations
    r.register("st_centroid", udf(g1(g =>
      centroid(g.shape).map(p => serShape(GPoint(p), g.srid)).orNull)))
    r.register("st_envelope", udf(g1(g => serShape(envelope(g.shape), g.srid))))
    r.register("st_convexhull", udf(g1(g => serShape(convexHull(g.shape), g.srid))))
    r.register("st_simplify", udf((b: Array[Byte], tol: Double) =>
      if (b == null) null else {
        val g = geom(b)
        ser(g.copy(shape = simplify(g.shape, tol)))
      }))
    r.register("st_transform2_impl", udf((b: Array[Byte], to: Int) =>
      if (b == null) null else {
        val g = geom(b)
        require(g.srid != 0, "st_transform: input geometry has no SRID; pass the from-SRID")
        ser(transform(g, g.srid, to))
      }))
    r.register("st_transform3_impl", udf((b: Array[Byte], from: Int, to: Int) =>
      if (b == null) null else ser(transform(geom(b), from, to))))

    // --------------------------------------- set operations (clipping)
    // reference geometry.rs:680-703; engine: Clip (Martinez–Rueda) via
    // GeometryOps. Empty results are NULL like the reference's None.
    def setOp(name: String, f: (Shape, Shape) => Option[Shape]): Unit =
      r.register(name, udf((a: Array[Byte], b: Array[Byte]) =>
        if (a == null || b == null) null
        else {
          val ga = geom(a); val gb = geom(b)
          require(ga.srid == gb.srid || ga.srid == 0 || gb.srid == 0,
            s"Incompatible SRID: ${ga.srid} and ${gb.srid}")
          val srid = if (ga.srid != 0) ga.srid else gb.srid
          f(ga.shape, gb.shape).map(s => serShape(s, srid)).orNull
        }))
    setOp("st_union", GeometryOps.union)
    setOp("st_intersection", GeometryOps.intersection)
    setOp("st_difference", GeometryOps.difference)
    setOp("st_symdifference", GeometryOps.symDifference)
    r.register("st_buffer", udf((b: Array[Byte], d: Double) =>
      if (b == null) null
      else {
        val g = geom(b)
        GeometryOps.buffer(g.shape, d).map(s => serShape(s, g.srid)).orNull
      }))

    // hilbert index of the bbox center on a 16-bit grid (reference
    // st_hilbert, hilbert/spatial.rs; the curve itself reuses
    // GraftTable.hilbertIndex — same operator the recluster path uses)
    def hilbertOf(x: Double, y: Double, xmin: Double, ymin: Double,
        xmax: Double, ymax: Double): Long = {
      require(xmax > xmin && ymax > ymin, "st_hilbert bounds must be increasing")
      val max16 = 65535.0
      val hx = math.min(max16, math.max(0.0, (x - xmin) / (xmax - xmin) * max16)).toLong
      val hy = math.min(max16, math.max(0.0, (y - ymin) / (ymax - ymin) * max16)).toLong
      graft.sources.GraftTable.hilbertIndex(16, hx, hy)
    }
    r.register("st_hilbert1_impl", udf((b: Array[Byte]) => Option(b).map { x =>
      val (xmin, ymin, xmax, ymax) = bbox(geom(x).shape)
      // default global bounds: the lon/lat world box — the common case
      // (the reference's no-bounds form maps raw f32 bit patterns)
      hilbertOf((xmin + xmax) / 2, (ymin + ymax) / 2, -180.0, -90.0, 180.0, 90.0)
    }))
    r.register("st_hilbert2_impl", udf((b: Array[Byte], bounds: Seq[Double]) =>
      if (b == null || bounds == null) None
      else {
        require(bounds.length == 4, "st_hilbert bounds must have 4 elements")
        val (xmin, ymin, xmax, ymax) = bbox(geom(b).shape)
        Some(hilbertOf((xmin + xmax) / 2, (ymin + ymax) / 2,
          bounds(0), bounds(1), bounds(2), bounds(3)))
      }))

    // arity-dispatching names (fromtext/frombinary/geohash/transform/
    // hilbert) — session-level registration; GraftExtensions skips
    // these (UDF-backed)
    val reg = spark.sessionState.functionRegistry
    for ((name, builder) <- rewrites)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
