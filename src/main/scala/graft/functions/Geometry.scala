package graft.functions

import java.io.ByteArrayOutputStream
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** Pure planar geometry engine backing the `st_*` SQL surface
  * (reference: src/query/functions/src/scalars/geographic/src/geometry.rs,
  * which delegates to the Rust `geo`/`geozero` crates; this is an
  * independent Scala implementation of the same OGC semantics).
  *
  * Internal column representation is EWKB bytes (like the reference's
  * GeometryType, src/common/io/src/geometry.rs) — SRID 0 means "unset"
  * (UNKNOWN_SRID, geometry.rs:42). All math is planar/Euclidean,
  * matching the reference's `Euclidean` metric choices (st_distance
  * geometry.rs:640, st_length :547, st_area via geo::Area).
  *
  * Supported: points, linestrings, polygons (with holes), the three
  * multi types, and geometry collections; WKT/EWKT, WKB/EWKB (both
  * byte orders read, little-endian written), and GeoJSON in/out.
  * Not supported (documented in COVERAGE.md): EMPTY geometries, Z/M
  * coordinates, and the polygon-clipping family (st_buffer/union/
  * intersection/difference) which needs a full clipping engine.
  */
object Geometry {

  final case class Pt(x: Double, y: Double)

  sealed trait Shape
  final case class GPoint(p: Pt) extends Shape
  final case class GMultiPoint(pts: Vector[Pt]) extends Shape
  final case class GLineString(pts: Vector[Pt]) extends Shape
  final case class GMultiLineString(lines: Vector[Vector[Pt]]) extends Shape
  final case class GPolygon(rings: Vector[Vector[Pt]]) extends Shape
  final case class GMultiPolygon(polys: Vector[Vector[Vector[Pt]]]) extends Shape
  final case class GCollection(shapes: Vector[Shape]) extends Shape

  /** srid 0 = unknown/unset */
  final case class Geom(shape: Shape, srid: Int = 0)

  // ---------------------------------------------------------------- WKB

  private val SridFlag = 0x20000000

  def toWkb(g: Geom, withSrid: Boolean): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    writeShape(out, g.shape, if (withSrid && g.srid != 0) g.srid else 0)
    out.toByteArray
  }

  private def wLe32(o: ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }
  private def wLe64(o: ByteArrayOutputStream, v: Long): Unit = {
    var i = 0
    while (i < 8) { o.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def wPt(o: ByteArrayOutputStream, p: Pt): Unit = {
    wLe64(o, java.lang.Double.doubleToLongBits(p.x))
    wLe64(o, java.lang.Double.doubleToLongBits(p.y))
  }
  private def wRing(o: ByteArrayOutputStream, r: Vector[Pt]): Unit = {
    wLe32(o, r.length); r.foreach(wPt(o, _))
  }

  private def typeCode(s: Shape): Int = s match {
    case _: GPoint => 1
    case _: GLineString => 2
    case _: GPolygon => 3
    case _: GMultiPoint => 4
    case _: GMultiLineString => 5
    case _: GMultiPolygon => 6
    case _: GCollection => 7
  }

  private def writeShape(o: ByteArrayOutputStream, s: Shape, srid: Int): Unit = {
    o.write(1) // little endian
    wLe32(o, typeCode(s) | (if (srid != 0) SridFlag else 0))
    if (srid != 0) wLe32(o, srid)
    s match {
      case GPoint(p) => wPt(o, p)
      case GLineString(pts) => wRing(o, pts)
      case GPolygon(rings) => wLe32(o, rings.length); rings.foreach(wRing(o, _))
      case GMultiPoint(pts) =>
        wLe32(o, pts.length); pts.foreach(p => writeShape(o, GPoint(p), 0))
      case GMultiLineString(ls) =>
        wLe32(o, ls.length); ls.foreach(l => writeShape(o, GLineString(l), 0))
      case GMultiPolygon(ps) =>
        wLe32(o, ps.length); ps.foreach(p => writeShape(o, GPolygon(p), 0))
      case GCollection(gs) =>
        wLe32(o, gs.length); gs.foreach(g => writeShape(o, g, 0))
    }
  }

  private final class Rd(val b: Array[Byte]) {
    var pos = 0
    var little = true
    def u8(): Int = { val v = b(pos) & 0xff; pos += 1; v }
    def i32(): Int = {
      val v =
        if (little) (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
          ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
        else (b(pos + 3) & 0xff) | ((b(pos + 2) & 0xff) << 8) |
          ((b(pos + 1) & 0xff) << 16) | ((b(pos) & 0xff) << 24)
      pos += 4; v
    }
    def f64(): Double = {
      var v = 0L
      if (little) { var i = 7; while (i >= 0) { v = (v << 8) | (b(pos + i) & 0xffL); i -= 1 } }
      else { var i = 0; while (i < 8) { v = (v << 8) | (b(pos + i) & 0xffL); i += 1 } }
      pos += 8
      java.lang.Double.longBitsToDouble(v)
    }
  }

  def fromWkb(bytes: Array[Byte]): Geom = {
    val rd = new Rd(bytes)
    var srid = 0
    def shape(): Shape = {
      rd.little = rd.u8() == 1
      var t = rd.i32()
      if ((t & SridFlag) != 0) { t &= ~SridFlag; val s = rd.i32(); if (srid == 0) srid = s }
      def pt() = Pt(rd.f64(), rd.f64())
      def ring() = Vector.fill(rd.i32())(pt())
      t match {
        case 1 => GPoint(pt())
        case 2 => GLineString(ring())
        case 3 => GPolygon(Vector.fill(rd.i32())(ring()))
        case 4 => GMultiPoint(Vector.fill(rd.i32()) {
          shape() match { case GPoint(p) => p; case o => sys.error(s"bad multipoint member $o") }
        })
        case 5 => GMultiLineString(Vector.fill(rd.i32()) {
          shape() match { case GLineString(l) => l; case o => sys.error(s"bad multilinestring member $o") }
        })
        case 6 => GMultiPolygon(Vector.fill(rd.i32()) {
          shape() match { case GPolygon(r) => r; case o => sys.error(s"bad multipolygon member $o") }
        })
        case 7 => GCollection(Vector.fill(rd.i32())(shape()))
        case o => sys.error(s"unsupported wkb type $o")
      }
    }
    val s = shape()
    Geom(s, srid)
  }

  // ---------------------------------------------------------------- WKT

  /** shortest-roundtrip style formatting: integral doubles print
    * without a decimal point (matching the reference's geozero WKT
    * output, where Rust's `{}` prints `1` for 1.0_f64)
    */
  def fmt(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15 && !d.isInfinite) d.toLong.toString
    else d.toString

  def toWkt(g: Geom): String = shapeWkt(g.shape)
  def toEwkt(g: Geom): String =
    if (g.srid != 0) s"SRID=${g.srid};${shapeWkt(g.shape)}" else shapeWkt(g.shape)

  private def ptWkt(p: Pt) = s"${fmt(p.x)} ${fmt(p.y)}"
  private def ringWkt(r: Vector[Pt]) = r.map(ptWkt).mkString("(", ",", ")")

  /** OGC empty geometry: a NaN point or an element-less composite */
  def isEmptyShape(s: Shape): Boolean = s match {
    case GPoint(p) => p.x.isNaN && p.y.isNaN
    case GLineString(v) => v.isEmpty
    case GPolygon(r) => r.isEmpty
    case GMultiPoint(v) => v.isEmpty
    case GMultiLineString(v) => v.isEmpty
    case GMultiPolygon(v) => v.isEmpty
    case GCollection(v) => v.isEmpty
  }

  private def shapeWkt(s: Shape): String = if (isEmptyShape(s)) (s match {
    case _: GPoint => "POINT EMPTY"
    case _: GLineString => "LINESTRING EMPTY"
    case _: GPolygon => "POLYGON EMPTY"
    case _: GMultiPoint => "MULTIPOINT EMPTY"
    case _: GMultiLineString => "MULTILINESTRING EMPTY"
    case _: GMultiPolygon => "MULTIPOLYGON EMPTY"
    case _: GCollection => "GEOMETRYCOLLECTION EMPTY"
  }) else s match {
    case GPoint(p) => s"POINT(${ptWkt(p)})"
    case GMultiPoint(pts) => s"MULTIPOINT(${pts.map(ptWkt).mkString(",")})"
    case GLineString(pts) => s"LINESTRING${ringWkt(pts)}"
    case GMultiLineString(ls) => s"MULTILINESTRING(${ls.map(ringWkt).mkString(",")})"
    case GPolygon(rings) => s"POLYGON(${rings.map(ringWkt).mkString(",")})"
    case GMultiPolygon(ps) =>
      s"MULTIPOLYGON(${ps.map(rs => rs.map(ringWkt).mkString("(", ",", ")")).mkString(",")})"
    case GCollection(gs) => s"GEOMETRYCOLLECTION(${gs.map(shapeWkt).mkString(",")})"
  }

  def fromWkt(text: String): Geom = {
    var s = text.trim
    var srid = 0
    if (s.regionMatches(true, 0, "SRID=", 0, 5)) {
      val semi = s.indexOf(';')
      require(semi > 0, s"bad EWKT: $text")
      srid = s.substring(5, semi).trim.toInt
      s = s.substring(semi + 1).trim
    }
    val p = new WktParser(s)
    val g = p.shape()
    p.skipWs()
    require(p.eof, s"trailing characters in WKT: $text")
    Geom(g, srid)
  }

  private final class WktParser(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(i < s.length && s.charAt(i) == c, s"expected '$c' at $i in: $s")
      i += 1
    }
    private def peek(): Char = { skipWs(); if (i < s.length) s.charAt(i) else '\u0000' }
    private def word(): String = {
      skipWs()
      val start = i
      while (i < s.length && s.charAt(i).isLetter) i += 1
      s.substring(start, i).toUpperCase
    }
    private def num(): Double = {
      skipWs()
      val start = i
      while (i < s.length && "+-.0123456789eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(start, i).toDouble
    }
    private def pt(): Pt = { val x = num(); val y = num(); Pt(x, y) }
    private def ring(): Vector[Pt] = {
      expect('(')
      val b = Vector.newBuilder[Pt]
      b += pt()
      while (peek() == ',') { i += 1; b += pt() }
      expect(')')
      b.result()
    }
    private def rings(): Vector[Vector[Pt]] = {
      expect('(')
      val b = Vector.newBuilder[Vector[Pt]]
      b += ring()
      while (peek() == ',') { i += 1; b += ring() }
      expect(')')
      b.result()
    }
    /** `<TYPE> EMPTY` (OGC empty geometries): a POINT EMPTY carries
      * NaN coordinates (the WKB convention); the other types carry
      * empty element vectors
      */
    private def emptyTail(): Boolean = {
      skipWs()
      if (s.regionMatches(true, i, "EMPTY", 0, 5)) { i += 5; true } else false
    }
    def shape(): Shape = {
      val w = word()
      if (emptyTail()) return w match {
        case "POINT" => GPoint(Pt(Double.NaN, Double.NaN))
        case "LINESTRING" => GLineString(Vector.empty)
        case "POLYGON" => GPolygon(Vector.empty)
        case "MULTIPOINT" => GMultiPoint(Vector.empty)
        case "MULTILINESTRING" => GMultiLineString(Vector.empty)
        case "MULTIPOLYGON" => GMultiPolygon(Vector.empty)
        case "GEOMETRYCOLLECTION" => GCollection(Vector.empty)
        case other => throw new IllegalArgumentException(s"bad WKT type: $other")
      }
      shapeBody(w)
    }
    private def shapeBody(w: String): Shape = w match {
      case "POINT" => expect('('); val p = pt(); expect(')'); GPoint(p)
      case "LINESTRING" => GLineString(ring())
      case "POLYGON" => GPolygon(rings())
      case "MULTIPOINT" =>
        // both MULTIPOINT(1 2,3 4) and MULTIPOINT((1 2),(3 4))
        expect('(')
        val b = Vector.newBuilder[Pt]
        def one(): Unit =
          if (peek() == '(') { i += 1; b += pt(); expect(')') } else b += pt()
        one()
        while (peek() == ',') { i += 1; one() }
        expect(')')
        GMultiPoint(b.result())
      case "MULTILINESTRING" => GMultiLineString(rings())
      case "MULTIPOLYGON" =>
        expect('(')
        val b = Vector.newBuilder[Vector[Vector[Pt]]]
        b += rings()
        while (peek() == ',') { i += 1; b += rings() }
        expect(')')
        GMultiPolygon(b.result())
      case "GEOMETRYCOLLECTION" =>
        expect('(')
        val b = Vector.newBuilder[Shape]
        b += shape()
        while (peek() == ',') { i += 1; b += shape() }
        expect(')')
        GCollection(b.result())
      case w => sys.error(s"unsupported WKT type '$w'")
    }
  }

  // ------------------------------------------------------------- GeoJSON

  private val mapper = new ObjectMapper()

  def toGeoJson(g: Geom): String = mapper.writeValueAsString(shapeJson(g.shape))

  private def coordArr(p: Pt): ArrayNode = {
    val a = mapper.createArrayNode(); a.add(p.x); a.add(p.y); a
  }
  private def ringArr(r: Vector[Pt]): ArrayNode = {
    val a = mapper.createArrayNode(); r.foreach(p => a.add(coordArr(p))); a
  }
  private def shapeJson(s: Shape): ObjectNode = {
    val o = mapper.createObjectNode()
    s match {
      case GPoint(p) => o.put("type", "Point"); o.set[JsonNode]("coordinates", coordArr(p))
      case GMultiPoint(pts) =>
        o.put("type", "MultiPoint"); o.set[JsonNode]("coordinates", ringArr(pts))
      case GLineString(pts) =>
        o.put("type", "LineString"); o.set[JsonNode]("coordinates", ringArr(pts))
      case GMultiLineString(ls) =>
        val a = mapper.createArrayNode(); ls.foreach(l => a.add(ringArr(l)))
        o.put("type", "MultiLineString"); o.set[JsonNode]("coordinates", a)
      case GPolygon(rings) =>
        val a = mapper.createArrayNode(); rings.foreach(r => a.add(ringArr(r)))
        o.put("type", "Polygon"); o.set[JsonNode]("coordinates", a)
      case GMultiPolygon(ps) =>
        val a = mapper.createArrayNode()
        ps.foreach { rs =>
          val pa = mapper.createArrayNode(); rs.foreach(r => pa.add(ringArr(r))); a.add(pa)
        }
        o.put("type", "MultiPolygon"); o.set[JsonNode]("coordinates", a)
      case GCollection(gs) =>
        val a = mapper.createArrayNode(); gs.foreach(g => a.add(shapeJson(g)))
        o.put("type", "GeometryCollection"); o.set[JsonNode]("geometries", a)
    }
    o
  }

  def fromGeoJson(json: String): Geom = Geom(jsonShape(mapper.readTree(json)), 0)

  private def jsonPt(n: JsonNode): Pt = Pt(n.get(0).asDouble(), n.get(1).asDouble())
  private def jsonRing(n: JsonNode): Vector[Pt] = {
    val b = Vector.newBuilder[Pt]
    n.forEach(e => b += jsonPt(e))
    b.result()
  }
  private def jsonShape(n: JsonNode): Shape = n.get("type").asText() match {
    case "Point" => GPoint(jsonPt(n.get("coordinates")))
    case "MultiPoint" => GMultiPoint(jsonRing(n.get("coordinates")))
    case "LineString" => GLineString(jsonRing(n.get("coordinates")))
    case "MultiLineString" =>
      val b = Vector.newBuilder[Vector[Pt]]
      n.get("coordinates").forEach(e => b += jsonRing(e))
      GMultiLineString(b.result())
    case "Polygon" =>
      val b = Vector.newBuilder[Vector[Pt]]
      n.get("coordinates").forEach(e => b += jsonRing(e))
      GPolygon(b.result())
    case "MultiPolygon" =>
      val b = Vector.newBuilder[Vector[Vector[Pt]]]
      n.get("coordinates").forEach { pn =>
        val rb = Vector.newBuilder[Vector[Pt]]
        pn.forEach(e => rb += jsonRing(e))
        b += rb.result()
      }
      GMultiPolygon(b.result())
    case "GeometryCollection" =>
      val b = Vector.newBuilder[Shape]
      n.get("geometries").forEach(e => b += jsonShape(e))
      GCollection(b.result())
    case t => sys.error(s"unsupported GeoJSON type '$t'")
  }

  // ------------------------------------------------- universal reader

  private def isHex(s: String): Boolean =
    s.nonEmpty && (s.length & 1) == 0 && s.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))

  private def hexToBytes(s: String): Array[Byte] = {
    val out = new Array[Byte](s.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = Integer.parseInt(s.substring(2 * i, 2 * i + 2), 16).toByte
      i += 1
    }
    out
  }

  /** Parse any of WKT / EWKT / hex (E)WKB / GeoJSON (reference
    * geometry_from_str accepts all, geometry.rs:1111-1117).
    */
  def fromAny(text: String): Geom = {
    val t = text.trim
    if (t.startsWith("{")) fromGeoJson(t)
    else if (isHex(t) && (t.startsWith("00") || t.startsWith("01")))
      fromWkb(hexToBytes(t))
    else fromWkt(t)
  }

  /** Binary input that may actually be hex TEXT bytes (the reference
    * registers st_geomfromwkb for both string-hex and raw binary).
    * Raw WKB always starts with byte-order 0x00/0x01, never an ASCII
    * hex digit, so the sniff is unambiguous.
    */
  def fromWkbOrHex(b: Array[Byte]): Geom =
    if (b.nonEmpty && (b(0) == 0x00 || b(0) == 0x01)) fromWkb(b)
    else fromWkb(hexToBytes(new String(b, java.nio.charset.StandardCharsets.US_ASCII).trim))

  // ---------------------------------------------------------- accessors

  def allPoints(s: Shape): Vector[Pt] = s match {
    case GPoint(p) => Vector(p)
    case GMultiPoint(pts) => pts
    case GLineString(pts) => pts
    case GMultiLineString(ls) => ls.flatten
    case GPolygon(rings) => rings.flatten
    case GMultiPolygon(ps) => ps.flatten.flatten
    case GCollection(gs) => gs.flatMap(allPoints)
  }

  /** line segments: linestring legs + polygon ring legs */
  def segments(s: Shape): Vector[(Pt, Pt)] = s match {
    case _: GPoint | _: GMultiPoint => Vector.empty
    case GLineString(pts) => pts.zip(pts.drop(1))
    case GMultiLineString(ls) => ls.flatMap(l => l.zip(l.drop(1)))
    case GPolygon(rings) => rings.flatMap(r => r.zip(r.drop(1)))
    case GMultiPolygon(ps) => ps.flatMap(rs => rs.flatMap(r => r.zip(r.drop(1))))
    case GCollection(gs) => gs.flatMap(segments)
  }

  /** polygons as ring lists (outer first) */
  def polygonsOf(s: Shape): Vector[Vector[Vector[Pt]]] = s match {
    case GPolygon(rings) => Vector(rings)
    case GMultiPolygon(ps) => ps
    case GCollection(gs) => gs.flatMap(polygonsOf)
    case _ => Vector.empty
  }

  def bbox(s: Shape): (Double, Double, Double, Double) = {
    val pts = allPoints(s)
    (pts.map(_.x).min, pts.map(_.y).min, pts.map(_.x).max, pts.map(_.y).max)
  }

  def dimension(s: Shape): Int = s match {
    case _: GPoint | _: GMultiPoint => 0
    case _: GLineString | _: GMultiLineString => 1
    case _: GPolygon | _: GMultiPolygon => 2
    case GCollection(gs) => if (gs.isEmpty) 0 else gs.map(dimension).max
  }

  def npoints(s: Shape): Int = allPoints(s).length

  // ----------------------------------------------------------- measures

  /** signed shoelace area (positive = CCW) */
  def signedArea(ring: Vector[Pt]): Double = {
    var a = 0.0
    var i = 0
    while (i < ring.length - 1) {
      a += ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
      i += 1
    }
    a / 2.0
  }

  /** unsigned area: |outer| - sum |holes| per polygon */
  def area(s: Shape): Double =
    polygonsOf(s).map { rings =>
      math.abs(signedArea(rings.head)) - rings.tail.map(r => math.abs(signedArea(r))).sum
    }.sum

  private def segLen(a: Pt, b: Pt): Double = math.hypot(b.x - a.x, b.y - a.y)

  /** sum of LINE lengths only (reference st_length skips polygons,
    * geometry.rs:540-565)
    */
  def length(s: Shape): Double = s match {
    case GLineString(pts) => pts.zip(pts.drop(1)).map { case (a, b) => segLen(a, b) }.sum
    case GMultiLineString(ls) => ls.map(l => length(GLineString(l))).sum
    case GCollection(gs) => gs.map(length).sum
    case _ => 0.0
  }

  /** sum of polygon ring lengths (reference st_perimeter, geometry.rs:905-925) */
  def perimeter(s: Shape): Double =
    polygonsOf(s).flatten.map(r => r.zip(r.drop(1)).map { case (a, b) => segLen(a, b) }.sum).sum

  // -------------------------------------------------- predicate helpers

  private val Eps = 0.0

  private def cross(o: Pt, a: Pt, b: Pt): Double =
    (a.x - o.x) * (b.y - o.y) - (a.y - o.y) * (b.x - o.x)

  private def onSegment(p: Pt, a: Pt, b: Pt): Boolean =
    math.abs(cross(a, b, p)) <= Eps &&
      p.x >= math.min(a.x, b.x) && p.x <= math.max(a.x, b.x) &&
      p.y >= math.min(a.y, b.y) && p.y <= math.max(a.y, b.y)

  /** segment intersection incl. touching/collinear overlap */
  def segIntersects(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Boolean = {
    val d1 = cross(q1, q2, p1); val d2 = cross(q1, q2, p2)
    val d3 = cross(p1, p2, q1); val d4 = cross(p1, p2, q2)
    if (((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
        ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))) true
    else onSegment(p1, q1, q2) || onSegment(p2, q1, q2) ||
      onSegment(q1, p1, p2) || onSegment(q2, p1, p2)
  }

  /** proper crossing: interiors cross at one point (no touch/collinear) */
  private def segCrossesProper(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Boolean = {
    val d1 = cross(q1, q2, p1); val d2 = cross(q1, q2, p2)
    val d3 = cross(p1, p2, q1); val d4 = cross(p1, p2, q2)
    ((d1 > 0 && d2 < 0) || (d1 < 0 && d2 > 0)) &&
      ((d3 > 0 && d4 < 0) || (d3 < 0 && d4 > 0))
  }

  /** 0 = outside, 1 = on boundary, 2 = inside (ray cast) */
  def pointInRing(p: Pt, ring: Vector[Pt]): Int = {
    var inside = false
    var i = 0
    while (i < ring.length - 1) {
      val a = ring(i); val b = ring(i + 1)
      if (onSegment(p, a, b)) return 1
      if ((a.y > p.y) != (b.y > p.y)) {
        val xint = a.x + (p.y - a.y) * (b.x - a.x) / (b.y - a.y)
        if (xint > p.x) inside = !inside
      }
      i += 1
    }
    if (inside) 2 else 0
  }

  /** 0/1/2 against a polygon with holes */
  def pointInPolygon(p: Pt, rings: Vector[Vector[Pt]]): Int = {
    val outer = pointInRing(p, rings.head)
    if (outer != 2) outer
    else {
      var i = 1
      while (i < rings.length) {
        pointInRing(p, rings(i)) match {
          case 2 => return 0 // inside a hole
          case 1 => return 1 // on a hole boundary
          case _ =>
        }
        i += 1
      }
      2
    }
  }

  /** 0/1/2 against any geometry's 2-D parts */
  private def pointInAnyPolygon(p: Pt, s: Shape): Int = {
    var best = 0
    polygonsOf(s).foreach { rings =>
      val r = pointInPolygon(p, rings)
      if (r == 2) return 2
      if (r == 1) best = 1
    }
    best
  }

  def intersects(a: Shape, b: Shape): Boolean = {
    val (pa, sa) = (allPoints(a), segments(a))
    val (pb, sb) = (allPoints(b), segments(b))
    // vertex containment in 2-D parts (either direction)
    if (pa.exists(p => pointInAnyPolygon(p, b) > 0)) return true
    if (pb.exists(p => pointInAnyPolygon(p, a) > 0)) return true
    // segment-segment
    if (sa.exists { case (p1, p2) => sb.exists { case (q1, q2) => segIntersects(p1, p2, q1, q2) } })
      return true
    // point-on-segment / point-point
    if (pa.exists(p => sb.exists { case (q1, q2) => onSegment(p, q1, q2) })) return true
    if (pb.exists(p => sa.exists { case (q1, q2) => onSegment(p, q1, q2) })) return true
    if (sa.isEmpty && sb.isEmpty && pa.exists(p => pb.exists(q => q == p))) return true
    false
  }

  def disjoint(a: Shape, b: Shape): Boolean = !intersects(a, b)

  /** containment core shared by contains (strict interior required at
    * boundary=false) and covers (boundary counts). Supports the combos
    * the spec exercises: (point|line|polygon|multi*) over
    * (point|line|polygon); DE-9IM-complete relate is out of scope.
    */
  private def containsImpl(a: Shape, b: Shape, boundaryOk: Boolean): Boolean = (a, b) match {
    case (GPoint(p), _) => allPoints(b).forall(_ == p)
    case (GMultiPoint(pts), _) => allPoints(b).forall(pts.contains)
    case (GLineString(_) | GMultiLineString(_), GPoint(q)) =>
      val onSeg = segments(a).exists { case (s1, s2) => onSegment(q, s1, s2) }
      if (boundaryOk) onSeg
      else {
        // line endpoints are its boundary
        val ends = a match {
          case GLineString(pts) => Vector(pts.head, pts.last)
          case GMultiLineString(ls) => ls.flatMap(l => Vector(l.head, l.last))
          case _ => Vector.empty
        }
        onSeg && !ends.contains(q)
      }
    case _ if polygonsOf(a).nonEmpty =>
      val polys = polygonsOf(a)
      val verts = allPoints(b)
      if (verts.isEmpty) false
      else {
        // DE-9IM containment for the common cases: every vertex of b in
        // the closure of a, no edge of b properly crossing a ring edge
        // of a, and (for contains) some interior intersection. A 2-D b
        // inside the closure always shares interior (positive area);
        // a 1-D b with all vertices on the boundary still counts when a
        // segment midpoint is interior (chord) — matching the
        // reference's slt: contains(poly, poly)=1,
        // contains(poly, line_on_boundary)=0 (02_0060_function_geometry)
        val status = verts.map(p => polys.map(rings => pointInPolygon(p, rings)).max)
        val ringSegs = polys.flatMap(rs => rs.flatMap(r => r.zip(r.drop(1))))
        val noCross = !segments(b).exists { case (p1, p2) =>
          ringSegs.exists { case (q1, q2) => segCrossesProper(p1, p2, q1, q2) }
        }
        def interiorContact =
          status.contains(2) || dimension(b) == 2 ||
            segments(b).exists { case (p1, p2) =>
              val mid = Pt((p1.x + p2.x) / 2, (p1.y + p2.y) / 2)
              polys.exists(rings => pointInPolygon(mid, rings) == 2)
            }
        status.forall(_ >= 1) && noCross && (boundaryOk || interiorContact)
      }
    case _ => false
  }

  def contains(a: Shape, b: Shape): Boolean = (a, b) match {
    // point containment in a polygon must be interior (geo::Contains)
    case (GPolygon(_) | GMultiPolygon(_), GPoint(p)) => pointInAnyPolygon(p, a) == 2
    case _ => containsImpl(a, b, boundaryOk = false)
  }

  def covers(a: Shape, b: Shape): Boolean = (a, b) match {
    case (GPolygon(_) | GMultiPolygon(_), GPoint(p)) => pointInAnyPolygon(p, a) >= 1
    case _ => containsImpl(a, b, boundaryOk = true)
  }

  def within(a: Shape, b: Shape): Boolean = contains(b, a)
  def coveredBy(a: Shape, b: Shape): Boolean = covers(b, a)

  /** structural equality after normalization: line direction, ring
    * rotation/orientation, multi-part order
    */
  def equalsShape(a: Shape, b: Shape): Boolean = normalize(a) == normalize(b)

  private def normRing(r0: Vector[Pt]): Vector[Pt] = {
    var r = if (r0.head == r0.last) r0.dropRight(1) else r0
    if (signedArea(r :+ r.head) < 0) r = r.reverse
    val minIdx = r.indices.minBy(i => (r(i).x, r(i).y))
    val rot = r.drop(minIdx) ++ r.take(minIdx)
    rot :+ rot.head
  }
  private def lexLe(a: Vector[Pt], b: Vector[Pt]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      var c = java.lang.Double.compare(a(i).x, b(i).x)
      if (c == 0) c = java.lang.Double.compare(a(i).y, b(i).y)
      if (c != 0) return c < 0
      i += 1
    }
    a.length <= b.length
  }
  private def normLine(l: Vector[Pt]): Vector[Pt] =
    if (lexLe(l, l.reverse)) l else l.reverse
  private def normalize(s: Shape): Shape = s match {
    case p: GPoint => p
    case GMultiPoint(pts) => GMultiPoint(pts.sortBy(p => (p.x, p.y)))
    case GLineString(pts) => GLineString(normLine(pts))
    case GMultiLineString(ls) =>
      GMultiLineString(ls.map(normLine).sortBy(l => (l.head.x, l.head.y)))
    case GPolygon(rings) =>
      val normed = rings.map(normRing)
      GPolygon(normed.head +: normed.tail.sortBy(r => (r.head.x, r.head.y)))
    case GMultiPolygon(ps) =>
      GMultiPolygon(ps.map(rs => {
        val normed = rs.map(normRing)
        normed.head +: normed.tail.sortBy(r => (r.head.x, r.head.y))
      }).sortBy(rs => (rs.head.head.x, rs.head.head.y)))
    case GCollection(gs) => GCollection(gs.map(normalize).sortBy(_.toString))
  }

  // ----------------------------------------------------------- distance

  def ptDist(a: Pt, b: Pt): Double = math.hypot(b.x - a.x, b.y - a.y)

  def ptSegDist(p: Pt, a: Pt, b: Pt): Double = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val l2 = dx * dx + dy * dy
    if (l2 == 0) ptDist(p, a)
    else {
      val t = math.max(0.0, math.min(1.0, ((p.x - a.x) * dx + (p.y - a.y) * dy) / l2))
      ptDist(p, Pt(a.x + t * dx, a.y + t * dy))
    }
  }

  private def segSegDist(p1: Pt, p2: Pt, q1: Pt, q2: Pt): Double =
    if (segIntersects(p1, p2, q1, q2)) 0.0
    else math.min(
      math.min(ptSegDist(p1, q1, q2), ptSegDist(p2, q1, q2)),
      math.min(ptSegDist(q1, p1, p2), ptSegDist(q2, p1, p2)))

  /** min Euclidean distance; 0 when the geometries intersect (incl.
    * polygon interiors — reference st_distance geometry.rs:640 via
    * geo::Euclidean)
    */
  def distance(a: Shape, b: Shape): Double = {
    if (intersects(a, b)) return 0.0
    val (pa, sa) = (allPoints(a), segments(a))
    val (pb, sb) = (allPoints(b), segments(b))
    // all candidate pairs — vertices lie on their geometry, so each
    // candidate is a true inter-geometry distance; the minimum over
    // pt-pt, pt-seg, and seg-seg is the exact Euclidean distance
    var best = Double.MaxValue
    pa.foreach(p => pb.foreach(q => best = math.min(best, ptDist(p, q))))
    pa.foreach(p => sb.foreach { case (q1, q2) => best = math.min(best, ptSegDist(p, q1, q2)) })
    pb.foreach(q => sa.foreach { case (p1, p2) => best = math.min(best, ptSegDist(q, p1, p2)) })
    sa.foreach { case (p1, p2) =>
      sb.foreach { case (q1, q2) => best = math.min(best, segSegDist(p1, p2, q1, q2)) }
    }
    best
  }

  def dwithin(a: Shape, b: Shape, d: Double): Boolean = distance(a, b) <= d

  /** discrete Hausdorff distance: max over vertices of min distance to
    * the other geometry (both directions) — the vertex-sampled bound
    * the geo crate's HausdorffDistance computes
    */
  def hausdorff(a: Shape, b: Shape): Double = {
    def oneWay(from: Shape, to: Shape): Double =
      allPoints(from).map(p => distance(GPoint(p), to)).foldLeft(0.0)(math.max)
    math.max(oneWay(a, b), oneWay(b, a))
  }

  /** PostGIS-convention azimuth: radians clockwise from north,
    * None for identical points
    */
  def azimuth(a: Pt, b: Pt): Option[Double] =
    if (a == b) None
    else {
      val az = math.atan2(b.x - a.x, b.y - a.y)
      Some(if (az < 0) az + 2 * math.Pi else az)
    }

  // --------------------------------------------------------- operations

  def centroid(s: Shape): Option[Pt] = {
    val polys = polygonsOf(s)
    if (polys.nonEmpty) {
      // area-weighted, holes subtract (rings reoriented: outer CCW, holes CW)
      var aSum = 0.0; var cx = 0.0; var cy = 0.0
      polys.foreach { rings =>
        rings.zipWithIndex.foreach { case (ring0, idx) =>
          val sgn = signedArea(ring0)
          val wantCcw = idx == 0
          val ring = if ((sgn >= 0) == wantCcw) ring0 else ring0.reverse
          val a = signedArea(ring)
          var i = 0
          while (i < ring.length - 1) {
            val f = ring(i).x * ring(i + 1).y - ring(i + 1).x * ring(i).y
            cx += (ring(i).x + ring(i + 1).x) * f
            cy += (ring(i).y + ring(i + 1).y) * f
            i += 1
          }
          aSum += a
        }
      }
      if (aSum == 0) centroid(GMultiPoint(allPoints(s)))
      else Some(Pt(cx / (6 * aSum), cy / (6 * aSum)))
    } else {
      val segs = segments(s)
      if (segs.nonEmpty) {
        var w = 0.0; var cx = 0.0; var cy = 0.0
        segs.foreach { case (a, b) =>
          val l = segLen(a, b)
          cx += l * (a.x + b.x) / 2; cy += l * (a.y + b.y) / 2; w += l
        }
        if (w == 0) centroid(GMultiPoint(allPoints(s)))
        else Some(Pt(cx / w, cy / w))
      } else {
        val pts = allPoints(s)
        if (pts.isEmpty) None
        else Some(Pt(pts.map(_.x).sum / pts.length, pts.map(_.y).sum / pts.length))
      }
    }
  }

  /** bbox as geometry: degenerate boxes collapse to point/line
    * (PostGIS ST_Envelope behavior)
    */
  def envelope(s: Shape): Shape = {
    val (xmin, ymin, xmax, ymax) = bbox(s)
    if (xmin == xmax && ymin == ymax) GPoint(Pt(xmin, ymin))
    else if (xmin == xmax || ymin == ymax)
      GLineString(Vector(Pt(xmin, ymin), Pt(xmax, ymax)))
    else GPolygon(Vector(Vector(
      Pt(xmin, ymin), Pt(xmax, ymin), Pt(xmax, ymax), Pt(xmin, ymax), Pt(xmin, ymin))))
  }

  /** Andrew's monotone chain; degenerate inputs give point/linestring */
  def convexHull(s: Shape): Shape = {
    val pts = allPoints(s).distinct.sortBy(p => (p.x, p.y))
    if (pts.length == 1) GPoint(pts.head)
    else if (pts.length == 2) GLineString(pts)
    else {
      def half(ps: Vector[Pt]): Vector[Pt] = {
        var st = Vector.empty[Pt]
        ps.foreach { p =>
          while (st.length >= 2 && cross(st(st.length - 2), st(st.length - 1), p) <= 0)
            st = st.dropRight(1)
          st = st :+ p
        }
        st
      }
      val lower = half(pts)
      val upper = half(pts.reverse)
      val hull = lower.dropRight(1) ++ upper.dropRight(1)
      if (hull.length < 3) GLineString(Vector(pts.head, pts.last))
      else GPolygon(Vector(hull :+ hull.head))
    }
  }

  /** Douglas-Peucker */
  private def dp(pts: Vector[Pt], tol: Double): Vector[Pt] = {
    if (pts.length < 3) pts
    else {
      var maxD = -1.0; var idx = -1
      var i = 1
      while (i < pts.length - 1) {
        val d = ptSegDist(pts(i), pts.head, pts.last)
        if (d > maxD) { maxD = d; idx = i }
        i += 1
      }
      if (maxD <= tol) Vector(pts.head, pts.last)
      else dp(pts.take(idx + 1), tol).dropRight(1) ++ dp(pts.drop(idx), tol)
    }
  }

  def simplify(s: Shape, tol: Double): Shape = s match {
    case p: GPoint => p
    case p: GMultiPoint => p
    case GLineString(pts) => GLineString(dp(pts, tol))
    case GMultiLineString(ls) => GMultiLineString(ls.map(dp(_, tol)))
    case GPolygon(rings) => GPolygon(rings.map(r => simplifyRing(r, tol)))
    case GMultiPolygon(ps) => GMultiPolygon(ps.map(rs => rs.map(r => simplifyRing(r, tol))))
    case GCollection(gs) => GCollection(gs.map(simplify(_, tol)))
  }
  private def simplifyRing(r: Vector[Pt], tol: Double): Vector[Pt] = {
    val out = dp(r, tol)
    if (out.length >= 4) out else r
  }

  /** only the web-mercator pair is built in (the reference links proj4;
    * a full projection database is out of scope): EPSG 4326 <-> 3857.
    * Output coords round to 6 decimals like the reference
    * (round_geometry_coordinates, geometry.rs:1132).
    */
  private val MercR = 6378137.0

  def transform(g: Geom, fromSrid: Int, toSrid: Int): Geom = {
    def r6(v: Double) = math.rint(v * 1e6) / 1e6
    def tx(f: Pt => Pt)(s: Shape): Shape = s match {
      case GPoint(p) => GPoint(f(p))
      case GMultiPoint(pts) => GMultiPoint(pts.map(f))
      case GLineString(pts) => GLineString(pts.map(f))
      case GMultiLineString(ls) => GMultiLineString(ls.map(_.map(f)))
      case GPolygon(rings) => GPolygon(rings.map(_.map(f)))
      case GMultiPolygon(ps) => GMultiPolygon(ps.map(_.map(_.map(f))))
      case GCollection(gs) => GCollection(gs.map(tx(f)))
    }
    val f: Pt => Pt = (fromSrid, toSrid) match {
      case (a, b) if a == b => identity
      case (4326, 3857) => p =>
        Pt(r6(p.x * MercR * math.Pi / 180.0),
           r6(MercR * math.log(math.tan(math.Pi / 4.0 + math.toRadians(p.y) / 2.0))))
      case (3857, 4326) => p =>
        Pt(r6(p.x / (MercR * math.Pi / 180.0)),
           r6(math.toDegrees(2.0 * math.atan(math.exp(p.y / MercR)) - math.Pi / 2.0)))
      case (a, b) => sys.error(s"st_transform: unsupported SRID pair $a -> $b " +
        "(built-in projections: 4326 <-> 3857)")
    }
    Geom(tx(f)(g.shape), toSrid)
  }

  /** structural validity: finite coords, linestrings >= 2 points,
    * rings closed with >= 4 points (self-intersection not checked)
    */
  def isValid(s: Shape): Boolean = {
    def finite(p: Pt) = java.lang.Double.isFinite(p.x) && java.lang.Double.isFinite(p.y)
    s match {
      case GPoint(p) => finite(p)
      case GMultiPoint(pts) => pts.nonEmpty && pts.forall(finite)
      case GLineString(pts) => pts.length >= 2 && pts.forall(finite)
      case GMultiLineString(ls) => ls.nonEmpty && ls.forall(l => isValid(GLineString(l)))
      case GPolygon(rings) =>
        rings.nonEmpty && rings.forall(r =>
          r.length >= 4 && r.head == r.last && r.forall(finite))
      case GMultiPolygon(ps) => ps.nonEmpty && ps.forall(rs => isValid(GPolygon(rs)))
      case GCollection(gs) => gs.forall(isValid)
    }
  }
}
