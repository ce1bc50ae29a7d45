package graft.functions

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import Geometry._

/** Set operations (union / intersection / difference / symdifference)
  * and buffer over the mixed-dimension geometry model, mirroring the
  * reference's GeometryOverlay (expression/src/geographic/overlay.rs):
  * operands decompose into (points, lines, polygons) parts, each
  * dimension pair gets its own boolean rule (polygons through the
  * Martinez–Rueda engine in [[Clip]], lines through exact segment
  * splitting, points through membership), and assembly applies
  * dimensional dominance — points covered by lines or polygons and
  * line parts covered by polygons are dropped. Empty results return
  * None (SQL NULL), single-element parts unwrap to the scalar type,
  * mixed dimensions yield a GEOMETRYCOLLECTION — all per the
  * reference's assemble_result.
  */
object GeometryOps {

  private val Eps = 1e-9

  // ------------------------------------------------------ decomposition

  final case class Parts(
      points: Vector[Pt],
      lines: Vector[Vector[Pt]],
      polys: Vector[Vector[Vector[Pt]]])

  private def collect(s: Shape, pts: ArrayBuffer[Pt], lns: ArrayBuffer[Vector[Pt]],
      pls: ArrayBuffer[Vector[Vector[Pt]]]): Unit = s match {
    case GPoint(p) => pts += p
    case GMultiPoint(ps) => pts ++= ps
    case GLineString(l) => if (l.length >= 2) lns += l
    case GMultiLineString(ls) => ls.foreach(l => if (l.length >= 2) lns += l)
    case GPolygon(rings) => if (rings.nonEmpty && rings.head.length >= 4) pls += rings
    case GMultiPolygon(ps) => ps.foreach(r => if (r.nonEmpty && r.head.length >= 4) pls += r)
    case GCollection(gs) => gs.foreach(collect(_, pts, lns, pls))
  }

  def partsOf(s: Shape): Parts = {
    val pts = ArrayBuffer.empty[Pt]; val lns = ArrayBuffer.empty[Vector[Pt]]
    val pls = ArrayBuffer.empty[Vector[Vector[Pt]]]
    collect(s, pts, lns, pls)
    Parts(pts.toVector, lns.toVector, pls.toVector)
  }

  // --------------------------------------------------- point primitives

  private def ptEq(a: Pt, b: Pt): Boolean =
    math.abs(a.x - b.x) <= Eps && math.abs(a.y - b.y) <= Eps

  private def dedupPoints(ps: Vector[Pt]): Vector[Pt] = {
    val out = ArrayBuffer.empty[Pt]
    ps.foreach(p => if (!out.exists(ptEq(_, p))) out += p)
    out.toVector
  }

  private def onAnyLine(p: Pt, lines: Vector[Vector[Pt]]): Boolean =
    lines.exists(l => l.zip(l.drop(1)).exists { case (a, b) => ptSegDist(p, a, b) <= Eps })

  private def inAnyPoly(p: Pt, polys: Vector[Vector[Vector[Pt]]]): Boolean =
    polys.exists(rings => pointInPolygon(p, rings) != 0)

  // ---------------------------------------------------- line primitives

  /** atomic segments: every line leg split at every crossing / overlap
    * endpoint with the cutter set (and with the polygons' ring legs)
    */
  private def splitSegments(lines: Vector[Vector[Pt]],
      cutters: Vector[(Pt, Pt)]): Vector[(Pt, Pt)] = {
    val out = ArrayBuffer.empty[(Pt, Pt)]
    for (l <- lines; (a, b) <- l.zip(l.drop(1)) if !ptEq(a, b)) {
      val dx = b.x - a.x; val dy = b.y - a.y
      val len2 = dx * dx + dy * dy
      val ts = mutable.SortedSet[Double](0.0, 1.0)
      for ((c, d) <- cutters) {
        // project every intersection/overlap endpoint onto [a,b]
        segInterPoints(a, b, c, d).foreach { p =>
          val t = ((p.x - a.x) * dx + (p.y - a.y) * dy) / len2
          if (t > Eps && t < 1 - Eps) ts += t
        }
      }
      val cuts = ts.toVector.map(t => if (t == 0) a else if (t == 1) b else Pt(a.x + t * dx, a.y + t * dy))
      cuts.zip(cuts.drop(1)).foreach { case (p, q) => if (!ptEq(p, q)) out += ((p, q)) }
    }
    out.toVector
  }

  /** 0/1/2 points: crossing point or collinear overlap interval ends */
  private def segInterPoints(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Seq[Pt] = {
    val vax = a2.x - a1.x; val vay = a2.y - a1.y
    val vbx = b2.x - b1.x; val vby = b2.y - b1.y
    val ex = b1.x - a1.x; val ey = b1.y - a1.y
    val kross = vax * vby - vay * vbx
    if (kross != 0) {
      val s = (ex * vby - ey * vbx) / kross
      val t = (ex * vay - ey * vax) / kross
      if (s < -Eps || s > 1 + Eps || t < -Eps || t > 1 + Eps) Nil
      else Seq(Pt(a1.x + s * vax, a1.y + s * vay))
    } else if (ex * vay - ey * vax != 0) Nil
    else {
      val len2 = vax * vax + vay * vay
      if (len2 == 0) Nil
      else {
        val sa = (vax * ex + vay * ey) / len2
        val sb = sa + (vax * vbx + vay * vby) / len2
        val lo = math.max(math.min(sa, sb), 0.0); val hi = math.min(math.max(sa, sb), 1.0)
        if (lo > hi) Nil
        else Seq(Pt(a1.x + lo * vax, a1.y + lo * vay), Pt(a1.x + hi * vax, a1.y + hi * vay))
      }
    }
  }

  private def segOnLines(p: Pt, q: Pt, lines: Vector[Vector[Pt]]): Boolean = {
    val mid = Pt((p.x + q.x) / 2, (p.y + q.y) / 2)
    lines.exists(l => l.zip(l.drop(1)).exists { case (a, b) =>
      ptSegDist(p, a, b) <= Eps && ptSegDist(q, a, b) <= Eps && ptSegDist(mid, a, b) <= Eps
    })
  }

  private def allSegs(lines: Vector[Vector[Pt]]): Vector[(Pt, Pt)] =
    lines.flatMap(l => l.zip(l.drop(1))).filterNot { case (a, b) => ptEq(a, b) }

  private def ringSegs(polys: Vector[Vector[Vector[Pt]]]): Vector[(Pt, Pt)] =
    polys.flatMap(_.flatMap(r => r.zip(r.drop(1))))

  /** stitch atomic segments back into polylines (chain while exactly
    * one continuation exists); output order is deterministic
    */
  private def stitch(segs: Vector[(Pt, Pt)]): Vector[Vector[Pt]] = {
    // dedup by canonical endpoint order
    val uniq = ArrayBuffer.empty[(Pt, Pt)]
    segs.foreach { case (a, b) =>
      val c = if (a.x < b.x || (a.x == b.x && a.y <= b.y)) (a, b) else (b, a)
      if (!uniq.exists(u => ptEq(u._1, c._1) && ptEq(u._2, c._2))) uniq += c
    }
    val used = new Array[Boolean](uniq.length)
    val out = Vector.newBuilder[Vector[Pt]]
    def nextFrom(p: Pt): Int = {
      var found = -1; var count = 0
      var i = 0
      while (i < uniq.length) {
        if (!used(i) && (ptEq(uniq(i)._1, p) || ptEq(uniq(i)._2, p))) { found = i; count += 1 }
        i += 1
      }
      if (count == 1) found else -1
    }
    var i = 0
    while (i < uniq.length) {
      if (!used(i)) {
        used(i) = true
        val chain = ArrayBuffer(uniq(i)._1, uniq(i)._2)
        // extend forward
        var cont = nextFrom(chain.last)
        while (cont >= 0) {
          used(cont) = true
          chain += (if (ptEq(uniq(cont)._1, chain.last)) uniq(cont)._2 else uniq(cont)._1)
          cont = nextFrom(chain.last)
        }
        // extend backward
        cont = nextFrom(chain.head)
        while (cont >= 0) {
          used(cont) = true
          chain.insert(0, if (ptEq(uniq(cont)._1, chain.head)) uniq(cont)._2 else uniq(cont)._1)
          cont = nextFrom(chain.head)
        }
        out += chain.toVector
      }
      i += 1
    }
    out.result()
  }

  private def segsInsidePoly(segs: Vector[(Pt, Pt)], polys: Vector[Vector[Vector[Pt]]],
      keepInside: Boolean): Vector[(Pt, Pt)] = {
    val cutters = ringSegs(polys)
    val atomic = splitSegments(stitch(segs), cutters)
    atomic.filter { case (a, b) =>
      val mid = Pt((a.x + b.x) / 2, (a.y + b.y) / 2)
      val in = inAnyPoly(mid, polys)
      if (keepInside) in else !in
    }
  }

  // --------------------------------------------------------- poly tier

  private def polyOp(a: Vector[Vector[Vector[Pt]]], b: Vector[Vector[Vector[Pt]]],
      op: Clip.Op): Vector[Vector[Vector[Pt]]] =
    Clip.booleanOp(a, b, op)

  // ----------------------------------------------------------- assembly

  /** the reference's assemble_result: polygons dominate lines dominate
    * points; singletons unwrap; empty -> None (SQL NULL)
    */
  def assemble(polysIn: Vector[Vector[Vector[Pt]]], linesIn: Vector[Vector[Pt]],
      pointsIn: Vector[Pt]): Option[Shape] = {
    // normalize overlapping members (the reference unary-unions polygon
    // parts before assembly); Clip outputs are already disjoint, so this
    // only costs on raw multi-part inputs
    val polys = if (polysIn.length > 1) unionAll(polysIn) else polysIn
    var lineSegs = stitch(allSegs(linesIn))
    if (polys.nonEmpty && lineSegs.nonEmpty)
      lineSegs = stitch(segsInsidePoly(allSegs(lineSegs), polys, keepInside = false))
    var points = dedupPoints(pointsIn)
    if (polys.nonEmpty) points = points.filterNot(inAnyPoly(_, polys))
    if (lineSegs.nonEmpty) points = points.filterNot(onAnyLine(_, lineSegs))

    val out = ArrayBuffer.empty[Shape]
    polys.length match {
      case 0 =>
      case 1 => out += GPolygon(polys.head)
      case _ => out += GMultiPolygon(polys)
    }
    lineSegs.length match {
      case 0 =>
      case 1 => out += GLineString(lineSegs.head)
      case _ => out += GMultiLineString(lineSegs)
    }
    points.length match {
      case 0 =>
      case 1 => out += GPoint(points.head)
      case _ => out += GMultiPoint(points)
    }
    out.length match {
      case 0 => None
      case 1 => Some(out.head)
      case _ => Some(GCollection(out.toVector))
    }
  }

  // ------------------------------------------------------- the four ops

  def union(a: Shape, b: Shape): Option[Shape] = {
    val pa = partsOf(a); val pb = partsOf(b)
    val polys =
      if (pa.polys.isEmpty) pb.polys
      else if (pb.polys.isEmpty) pa.polys
      else polyOp(pa.polys, pb.polys, Clip.Union)
    assemble(polys, pa.lines ++ pb.lines, pa.points ++ pb.points)
  }

  def intersection(a: Shape, b: Shape): Option[Shape] = {
    val pa = partsOf(a); val pb = partsOf(b)
    val polys = if (pa.polys.isEmpty || pb.polys.isEmpty) Vector.empty
      else polyOp(pa.polys, pb.polys, Clip.Intersection)

    val lines = ArrayBuffer.empty[(Pt, Pt)]
    if (pa.lines.nonEmpty && pb.polys.nonEmpty)
      lines ++= segsInsidePoly(allSegs(pa.lines), pb.polys, keepInside = true)
    if (pb.lines.nonEmpty && pa.polys.nonEmpty)
      lines ++= segsInsidePoly(allSegs(pb.lines), pa.polys, keepInside = true)
    // line x line: shared collinear parts + crossing points
    val points = ArrayBuffer.empty[Pt]
    if (pa.lines.nonEmpty && pb.lines.nonEmpty) {
      val atomic = splitSegments(pa.lines, allSegs(pb.lines))
      atomic.foreach { case (p, q) => if (segOnLines(p, q, pb.lines)) lines += ((p, q)) }
      for (la <- allSegs(pa.lines); lb <- allSegs(pb.lines))
        segInterPoints(la._1, la._2, lb._1, lb._2) match {
          case Seq(p) => points += p
          case _ => () // overlaps already collected as segments
        }
    }
    points ++= pa.points.filter(p => inAnyPoly(p, pb.polys) || onAnyLine(p, pb.lines) ||
      pb.points.exists(ptEq(_, p)))
    points ++= pb.points.filter(p => inAnyPoly(p, pa.polys) || onAnyLine(p, pa.lines))
    assemble(polys, stitch(lines.toVector), points.toVector)
  }

  def difference(a: Shape, b: Shape): Option[Shape] = {
    val pa = partsOf(a); val pb = partsOf(b)
    val polys = if (pa.polys.isEmpty) Vector.empty
      else if (pb.polys.isEmpty) pa.polys
      else polyOp(pa.polys, pb.polys, Clip.Difference)

    var lineSegs = allSegs(pa.lines)
    if (lineSegs.nonEmpty && pb.polys.nonEmpty)
      lineSegs = segsInsidePoly(lineSegs, pb.polys, keepInside = false)
    if (lineSegs.nonEmpty && pb.lines.nonEmpty) {
      val atomic = splitSegments(stitch(lineSegs), allSegs(pb.lines))
      lineSegs = atomic.filterNot { case (p, q) => segOnLines(p, q, pb.lines) }
    }
    var points = pa.points
    if (pb.polys.nonEmpty) points = points.filterNot(inAnyPoly(_, pb.polys))
    if (pb.lines.nonEmpty) points = points.filterNot(onAnyLine(_, pb.lines))
    points = points.filterNot(p => pb.points.exists(ptEq(_, p)))
    assemble(polys, stitch(lineSegs), points)
  }

  def symDifference(a: Shape, b: Shape): Option[Shape] = {
    val pa = partsOf(a); val pb = partsOf(b)
    val polys =
      if (pa.polys.isEmpty) pb.polys
      else if (pb.polys.isEmpty) pa.polys
      else polyOp(pa.polys, pb.polys, Clip.Xor)
    // line / point tiers: (a \ b) u (b \ a)
    val abL = difference(GCollection(Vector(GMultiLineString(pa.lines),
      if (pa.points.isEmpty) GMultiPoint(Vector.empty) else GMultiPoint(pa.points))), b)
    val baL = difference(GCollection(Vector(GMultiLineString(pb.lines),
      if (pb.points.isEmpty) GMultiPoint(Vector.empty) else GMultiPoint(pb.points))), a)
    val extra = Vector(abL, baL).flatten
    val lns = extra.flatMap(s => partsOf(s).lines)
    val pts = extra.flatMap(s => partsOf(s).points)
    assemble(polys, lns, pts)
  }

  // -------------------------------------------------------------- buffer

  /** number of segments per quarter circle (PostGIS quad_segs default) */
  val QuadSegs = 8

  private def arc(center: Pt, r: Double, a0: Double, a1: Double): Vector[Pt] = {
    val sweep = a1 - a0
    val steps = math.max(1, math.ceil(math.abs(sweep) / (math.Pi / 2) * QuadSegs).toInt)
    (0 to steps).toVector.map { i =>
      val a = a0 + sweep * i / steps
      Pt(center.x + r * math.cos(a), center.y + r * math.sin(a))
    }
  }

  /** full-circle polygon, 4*QuadSegs vertices */
  def circlePoly(c: Pt, r: Double): Vector[Vector[Pt]] = {
    val n = 4 * QuadSegs
    val ring = (0 until n).toVector.map { i =>
      val a = 2 * math.Pi * i / n
      Pt(c.x + r * math.cos(a), c.y + r * math.sin(a))
    }
    Vector(ring :+ ring.head)
  }

  /** capsule around segment [a,b]: offset rectangle + half-disc caps */
  private def capsule(a: Pt, b: Pt, r: Double): Vector[Vector[Pt]] = {
    val dx = b.x - a.x; val dy = b.y - a.y
    val len = math.hypot(dx, dy)
    if (len == 0) return circlePoly(a, r)
    val nx = -dy / len * r; val ny = dx / len * r
    val theta = math.atan2(dy, dx)
    val ring = (Vector(Pt(a.x + nx, a.y + ny), Pt(b.x + nx, b.y + ny)) ++
      arc(b, r, theta + math.Pi / 2, theta - math.Pi / 2) ++
      Vector(Pt(b.x - nx, b.y - ny), Pt(a.x - nx, a.y - ny)) ++
      arc(a, r, theta - math.Pi / 2, theta - 3 * math.Pi / 2))
    val closed = ring :+ ring.head
    Vector(closed)
  }

  /** cascade-union a list of polygons (pairwise tree merge, so n pieces
    * cost O(n log n) clips instead of O(n^2) accumulated-size clips)
    */
  def unionAll(polys: Vector[Vector[Vector[Pt]]]): Vector[Vector[Vector[Pt]]] = {
    if (polys.isEmpty) return Vector.empty
    var layer = polys.map(p => Vector(p))
    while (layer.length > 1) {
      layer = layer.grouped(2).map { g =>
        if (g.length == 2) Clip.booleanOp(g(0), g(1), Clip.Union) else g.head
      }.toVector
    }
    layer.head
  }

  /** positive d: dilate (union of the shape with boundary capsules);
    * negative d: erode (subtract boundary capsules); d == 0: identity
    * for polygons, empty for lower dimensions (PostGIS semantics).
    * GeometryCollection input is rejected like the reference
    * (geometry.rs st_buffer: "not supported for GeometryCollection").
    */
  def buffer(s: Shape, d: Double): Option[Shape] = s match {
    case _: GCollection =>
      throw new IllegalArgumentException("ST_BUFFER is not supported for GeometryCollection")
    case _ if d == 0 =>
      if (dimension(s) == 2) Some(s) else None
    case _ if d < 0 =>
      val polys = polygonsOf(s)
      if (polys.isEmpty) None
      else {
        val caps = ringSegs(polys).flatMap(seg => Vector(capsule(seg._1, seg._2, -d)))
        val eroded = Clip.booleanOp(polys, unionAll(caps), Clip.Difference)
        if (eroded.isEmpty) None else assemble(eroded, Vector.empty, Vector.empty)
      }
    case GPoint(p) => assemble(Vector(circlePoly(p, d)), Vector.empty, Vector.empty)
    case GMultiPoint(ps) =>
      if (ps.isEmpty) None
      else assemble(unionAll(ps.map(circlePoly(_, d))), Vector.empty, Vector.empty)
    case _ =>
      val pieces = ArrayBuffer.empty[Vector[Vector[Pt]]]
      pieces ++= polygonsOf(s)
      segments(s).foreach { case (a, b) => pieces += capsule(a, b, d) }
      if (pieces.isEmpty) None
      else assemble(unionAll(pieces.toVector), Vector.empty, Vector.empty)
  }
}
