package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Clip, Geometry, GeometryOps}
import Geometry._

/** The Martinez–Rueda clipping engine and the mixed-dimension set ops
  * built on it. Axis-aligned cases check exact closed-form areas;
  * rotated/random cases check the boolean-algebra identities
  * area(A inter B) + area(A \ B) = area(A) and
  * area(A union B) = area(A) + area(B) - area(A inter B).
  */
class ClipSpec extends AnyFunSuite {

  private def rect(x0: Double, y0: Double, x1: Double, y1: Double): Vector[Vector[Pt]] =
    Vector(Vector(Pt(x0, y0), Pt(x1, y0), Pt(x1, y1), Pt(x0, y1), Pt(x0, y0)))

  private def mpArea(mp: Clip.MultiPoly): Double =
    mp.map { poly =>
      math.abs(Geometry.signedArea(poly.head)) -
        poly.tail.map(h => math.abs(Geometry.signedArea(h))).sum
    }.sum

  private def op(a: Clip.MultiPoly, b: Clip.MultiPoly, o: Clip.Op) = Clip.booleanOp(a, b, o)

  test("overlapping squares: all four ops, exact areas") {
    val a = Vector(rect(0, 0, 2, 2)); val b = Vector(rect(1, 1, 3, 3))
    assert(math.abs(mpArea(op(a, b, Clip.Intersection)) - 1.0) < 1e-12)
    assert(math.abs(mpArea(op(a, b, Clip.Union)) - 7.0) < 1e-12)
    assert(math.abs(mpArea(op(a, b, Clip.Difference)) - 3.0) < 1e-12)
    assert(math.abs(mpArea(op(a, b, Clip.Xor)) - 6.0) < 1e-12)
    // intersection is exactly the unit square (1,1)-(2,2)
    val inter = op(a, b, Clip.Intersection)
    assert(inter.length == 1 && inter.head.length == 1)
    val ring = inter.head.head
    assert(ring.toSet == Set(Pt(1, 1), Pt(2, 1), Pt(2, 2), Pt(1, 2)))
  }

  test("shared-edge squares union to one rectangle, intersection empty") {
    val a = Vector(rect(0, 0, 1, 1)); val b = Vector(rect(1, 0, 2, 1))
    val u = op(a, b, Clip.Union)
    assert(u.length == 1)
    assert(math.abs(mpArea(u) - 2.0) < 1e-12)
    assert(mpArea(op(a, b, Clip.Intersection)) == 0.0)
    assert(math.abs(mpArea(op(a, b, Clip.Difference)) - 1.0) < 1e-12)
    assert(math.abs(mpArea(op(a, b, Clip.Xor)) - 2.0) < 1e-12)
  }

  test("contained square produces a hole under difference and xor") {
    val a = Vector(rect(0, 0, 4, 4)); val b = Vector(rect(1, 1, 3, 3))
    assert(math.abs(mpArea(op(a, b, Clip.Intersection)) - 4.0) < 1e-12)
    assert(math.abs(mpArea(op(a, b, Clip.Union)) - 16.0) < 1e-12)
    val d = op(a, b, Clip.Difference)
    assert(math.abs(mpArea(d) - 12.0) < 1e-12)
    assert(d.length == 1 && d.head.length == 2) // shell + hole
    val x = op(a, b, Clip.Xor)
    assert(math.abs(mpArea(x) - 12.0) < 1e-12)
  }

  test("triangle x square diagonal cut") {
    val tri = Vector(Vector(Vector(Pt(0, 0), Pt(4, 0), Pt(0, 4), Pt(0, 0))))
    val sq = Vector(rect(1, 1, 3, 3))
    assert(math.abs(mpArea(op(tri, sq, Clip.Intersection)) - 2.0) < 1e-12)
    assert(math.abs(mpArea(op(tri, sq, Clip.Union)) - (8.0 + 4.0 - 2.0)) < 1e-12)
  }

  test("disjoint bboxes take the trivial path") {
    val a = Vector(rect(0, 0, 1, 1)); val b = Vector(rect(5, 5, 6, 6))
    assert(op(a, b, Clip.Intersection).isEmpty)
    assert(mpArea(op(a, b, Clip.Union)) == 2.0)
    assert(op(a, b, Clip.Difference) == a)
  }

  test("hole in subject, island in clipping: nesting depth 2") {
    val a = Vector(Vector( // 4x4 shell with 2x2 hole
      Vector(Pt(0, 0), Pt(4, 0), Pt(4, 4), Pt(0, 4), Pt(0, 0)),
      Vector(Pt(1, 1), Pt(3, 1), Pt(3, 3), Pt(1, 3), Pt(1, 1))))
    val b = Vector(rect(1.5, 1.5, 2.5, 2.5)) // island inside the hole
    val u = op(a, b, Clip.Union)
    assert(math.abs(mpArea(u) - 13.0) < 1e-12)
    assert(u.length == 2) // ring + island as separate polygons
    assert(mpArea(op(a, b, Clip.Intersection)) == 0.0)
    assert(math.abs(mpArea(op(a, b, Clip.Difference)) - 12.0) < 1e-12)
  }

  test("chain of edge-adjacent unit squares unions to one rectangle") {
    val tiles = (0 until 8).toVector.map(i => rect(i, 0, i + 1, 1))
    val u = GeometryOps.unionAll(tiles)
    assert(u.length == 1)
    assert(math.abs(mpArea(u) - 8.0) < 1e-12)
  }

  test("cascaded union of random rect piles matches brute-force cell counts") {
    val rnd = new scala.util.Random(11)
    for (round <- 1 to 30) {
      val n = 3 + rnd.nextInt(12)
      val rects = Vector.fill(n) {
        val x0 = rnd.nextInt(12); val y0 = rnd.nextInt(12)
        (x0, y0, x0 + 1 + rnd.nextInt(5), y0 + 1 + rnd.nextInt(5))
      }
      val u = GeometryOps.unionAll(rects.map { case (a, b, c, d) => rect(a, b, c, d) })
      // unit-cell brute force on the integer grid
      var cells = 0
      for (cx <- 0 until 17; cy <- 0 until 17)
        if (rects.exists { case (a, b, c, d) => cx >= a && cx < c && cy >= b && cy < d })
          cells += 1
      assert(math.abs(mpArea(u) - cells) < 1e-9,
        s"round $round: union area ${mpArea(u)} != $cells cells for $rects")
      // every result shell/hole vertex is on the integer grid
      assert(u.flatten.flatten.forall(p => p.x == math.rint(p.x) && p.y == math.rint(p.y)))
    }
  }

  test("random axis-aligned rect pairs match closed-form areas") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val ax0 = rnd.nextInt(10); val ay0 = rnd.nextInt(10)
      val ax1 = ax0 + 1 + rnd.nextInt(8); val ay1 = ay0 + 1 + rnd.nextInt(8)
      val bx0 = rnd.nextInt(10); val by0 = rnd.nextInt(10)
      val bx1 = bx0 + 1 + rnd.nextInt(8); val by1 = by0 + 1 + rnd.nextInt(8)
      val a = Vector(rect(ax0, ay0, ax1, ay1)); val b = Vector(rect(bx0, by0, bx1, by1))
      val aA = (ax1 - ax0).toDouble * (ay1 - ay0)
      val aB = (bx1 - bx0).toDouble * (by1 - by0)
      val iw = math.max(0, math.min(ax1, bx1) - math.max(ax0, bx0))
      val ih = math.max(0, math.min(ay1, by1) - math.max(ay0, by0))
      val aI = iw.toDouble * ih
      val ctx = s"A=($ax0,$ay0,$ax1,$ay1) B=($bx0,$by0,$bx1,$by1)"
      assert(math.abs(mpArea(op(a, b, Clip.Intersection)) - aI) < 1e-9, s"inter $ctx")
      assert(math.abs(mpArea(op(a, b, Clip.Union)) - (aA + aB - aI)) < 1e-9, s"union $ctx")
      assert(math.abs(mpArea(op(a, b, Clip.Difference)) - (aA - aI)) < 1e-9, s"diff $ctx")
      assert(math.abs(mpArea(op(a, b, Clip.Xor)) - (aA + aB - 2 * aI)) < 1e-9, s"xor $ctx")
    }
  }

  test("random holed-polygon pairs satisfy the boolean-area identities") {
    val rnd = new scala.util.Random(23)
    for (k <- 1 to 60) {
      // shell with a centered hole, random placement/sizes
      def holed(): Clip.MultiPoly = {
        val x0 = rnd.nextInt(6); val y0 = rnd.nextInt(6)
        val w = 4 + rnd.nextInt(6); val h = 4 + rnd.nextInt(6)
        val hx = x0 + 1 + rnd.nextInt(w - 2); val hy = y0 + 1 + rnd.nextInt(h - 2)
        val hw = 1 + rnd.nextInt(x0 + w - hx - 1 max 1); val hh = 1 + rnd.nextInt(y0 + h - hy - 1 max 1)
        Vector(Vector(
          rect(x0, y0, x0 + w, y0 + h).head,
          rect(hx, hy, math.min(hx + hw, x0 + w - 1), math.min(hy + hh, y0 + h - 1)).head))
      }
      val a = holed(); val b = holed()
      val aA = mpArea(a); val aB = mpArea(b)
      val aI = mpArea(op(a, b, Clip.Intersection))
      val aU = mpArea(op(a, b, Clip.Union))
      val aD = mpArea(op(a, b, Clip.Difference))
      val aX = mpArea(op(a, b, Clip.Xor))
      assert(math.abs(aI + aD - aA) < 1e-9, s"inter+diff, case $k: a=$a b=$b")
      assert(math.abs(aU - (aA + aB - aI)) < 1e-9, s"inclusion-exclusion, case $k")
      assert(math.abs(aX - (aA + aB - 2 * aI)) < 1e-9, s"xor, case $k")
    }
  }

  test("rotated rect pairs satisfy the boolean-area identities") {
    val rnd = new scala.util.Random(7)
    def rot(p: Pt, ang: Double) =
      Pt(p.x * math.cos(ang) - p.y * math.sin(ang), p.x * math.sin(ang) + p.y * math.cos(ang))
    for (k <- 1 to 100) {
      val ang = rnd.nextDouble() * math.Pi / 2
      val a0 = rect(rnd.nextInt(6), rnd.nextInt(6), 6 + rnd.nextInt(6), 6 + rnd.nextInt(6))
      val b0 = rect(rnd.nextInt(6), rnd.nextInt(6), 6 + rnd.nextInt(6), 6 + rnd.nextInt(6))
      val a = Vector(a0.map(_.map(rot(_, ang))))
      val b = Vector(b0) // one rotated, one axis-aligned: vertex-on-edge rich
      val aA = mpArea(a); val aB = mpArea(b)
      val aI = mpArea(op(a, b, Clip.Intersection))
      val aU = mpArea(op(a, b, Clip.Union))
      val aD = mpArea(op(a, b, Clip.Difference))
      val aX = mpArea(op(a, b, Clip.Xor))
      assert(math.abs(aI + aD - aA) < 1e-7, s"inter+diff=subject, case $k")
      assert(math.abs(aU - (aA + aB - aI)) < 1e-7, s"inclusion-exclusion, case $k")
      assert(math.abs(aX - (aA + aB - 2 * aI)) < 1e-7, s"xor, case $k")
    }
  }

  // ------------------------------------------------- mixed-dimension ops

  private def poly(x0: Double, y0: Double, x1: Double, y1: Double): Shape =
    GPolygon(rect(x0, y0, x1, y1).head +: Vector.empty)

  test("line clipped by polygon: intersection and difference") {
    val line = GLineString(Vector(Pt(-1, 1), Pt(5, 1))) // crosses the 4x4 box
    val box = poly(0, 0, 4, 4)
    val inter = GeometryOps.intersection(line, box).get
    assert(Geometry.length(inter) == 4.0)
    val diff = GeometryOps.difference(line, box).get
    assert(math.abs(Geometry.length(diff) - 2.0) < 1e-12)
    // polygon minus line is the polygon unchanged
    val pd = GeometryOps.difference(box, line).get
    assert(math.abs(Geometry.area(pd) - 16.0) < 1e-12)
  }

  test("point set ops against polygon and line") {
    val pts = GMultiPoint(Vector(Pt(1, 1), Pt(9, 9), Pt(2, 0)))
    val box = poly(0, 0, 4, 4)
    val inter = GeometryOps.intersection(pts, box).get
    assert(Geometry.npoints(inter) == 2) // (1,1) inside, (2,0) on boundary
    val diff = GeometryOps.difference(pts, box).get
    assert(diff == GPoint(Pt(9, 9)))
    val un = GeometryOps.union(pts, box).get
    un match {
      case GCollection(gs) => assert(gs.exists(_.isInstanceOf[GPolygon]))
      case other => fail(s"expected collection, got $other")
    }
  }

  test("line x line: crossing point and collinear overlap") {
    val h = GLineString(Vector(Pt(0, 0), Pt(4, 0)))
    val v = GLineString(Vector(Pt(2, -1), Pt(2, 1)))
    assert(GeometryOps.intersection(h, v).get == GPoint(Pt(2, 0)))
    val h2 = GLineString(Vector(Pt(2, 0), Pt(6, 0)))
    val ov = GeometryOps.intersection(h, h2).get
    assert(math.abs(Geometry.length(ov) - 2.0) < 1e-12)
    val d = GeometryOps.difference(h, h2).get
    assert(math.abs(Geometry.length(d) - 2.0) < 1e-12)
  }

  test("symdifference of polygons equals xor") {
    val a = poly(0, 0, 2, 2); val b = poly(1, 1, 3, 3)
    val x = GeometryOps.symDifference(a, b).get
    assert(math.abs(Geometry.area(x) - 6.0) < 1e-12)
  }

  test("empty results are None (SQL NULL)") {
    assert(GeometryOps.intersection(poly(0, 0, 1, 1), poly(5, 5, 6, 6)).isEmpty)
    assert(GeometryOps.difference(GPoint(Pt(1, 1)), poly(0, 0, 2, 2)).isEmpty)
  }

  // --------------------------------------------------------------- buffer

  test("point buffer is the inscribed 32-gon") {
    val r = 2.5
    val b = GeometryOps.buffer(GPoint(Pt(1, 1)), r).get
    val expected = 0.5 * 32 * r * r * math.sin(2 * math.Pi / 32)
    assert(math.abs(Geometry.area(b) - expected) < 1e-9)
    assert(Geometry.npoints(b) == 33) // closed ring
  }

  test("segment buffer is a capsule: 2rL + inscribed-circle caps") {
    val r = 1.0; val L = 5.0
    val b = GeometryOps.buffer(GLineString(Vector(Pt(0, 0), Pt(L, 0))), r).get
    val expected = 2 * r * L + 0.5 * 32 * r * r * math.sin(2 * math.Pi / 32)
    assert(math.abs(Geometry.area(b) - expected) < 1e-9)
  }

  test("negative buffer erodes a rectangle to the exact inset") {
    val b = GeometryOps.buffer(poly(0, 0, 4, 4), -1.0).get
    assert(math.abs(Geometry.area(b) - 4.0) < 1e-9)
    val (x0, y0, x1, y1) = Geometry.bbox(b match { case s => s })
    assert(math.abs(x0 - 1) < 1e-9 && math.abs(y0 - 1) < 1e-9 &&
      math.abs(x1 - 3) < 1e-9 && math.abs(y1 - 3) < 1e-9)
    // eroding past the inradius leaves nothing
    assert(GeometryOps.buffer(poly(0, 0, 4, 4), -2.5).isEmpty)
  }

  test("zero buffer: identity for polygons, empty for lines/points") {
    val p = poly(0, 0, 2, 2)
    assert(GeometryOps.buffer(p, 0).contains(p))
    assert(GeometryOps.buffer(GPoint(Pt(1, 1)), 0).isEmpty)
  }

  test("buffer rejects GeometryCollection like the reference") {
    intercept[IllegalArgumentException] {
      GeometryOps.buffer(GCollection(Vector(GPoint(Pt(0, 0)))), 1.0)
    }
  }

  test("polygon buffer grows a rectangle by bands plus rounded corners") {
    val r = 1.0
    val b = GeometryOps.buffer(poly(0, 0, 3, 2), r).get
    // area = rect + perimeter band + inscribed-circle corners
    val expected = 6.0 + 10.0 * r + 0.5 * 32 * r * r * math.sin(2 * math.Pi / 32)
    assert(math.abs(Geometry.area(b) - expected) < 1e-6)
  }
}
