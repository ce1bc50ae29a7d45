package graft.functions

import scala.collection.mutable.ArrayBuffer

import Geometry.Pt

/** Boolean operations (intersection / union / difference / xor) on
  * polygons and multipolygons with holes — the clipping engine behind
  * `st_union`/`st_intersection`/`st_difference`/`st_symdifference`/
  * `st_buffer` and the `st_union_agg`/`st_intersection_agg` aggregates
  * (reference: geographic/src/geometry.rs:680-703 delegates to geo's
  * BooleanOps; aggregate_geographic_agg.rs st_union_agg).
  *
  * Algorithm: Martinez–Rueda–Feito plane-sweep boolean clipping
  * (F. Martinez et al., "A simple algorithm for Boolean operations on
  * polygons", 2013) — a single Bentley–Ottmann-style sweep subdivides
  * all edges at intersection points while annotating each edge with
  * in/out transition flags for both polygons; a per-operation predicate
  * selects result edges, which are then connected into contours.
  * Unlike Greiner–Hormann it handles the degenerate cases that matter
  * here: shared/overlapping collinear edges (adjacent tiles under
  * union_agg), vertex-on-edge contact, and holes.
  *
  * Coordinates are doubles; predicates are cross-product sign tests.
  * Inputs follow the engine convention: a polygon is a Vector of closed
  * rings (first shell, rest holes), ring orientation free.
  *
  * Robustness contract: exact on rational coordinates of moderate
  * precision (integers, decimals — everything the oracle suite and
  * realistic geo data produce; 300+ randomized cases in ClipSpec).
  * Like every raw-double Martinez implementation — including the geo
  * crate the reference delegates to — adversarial inputs whose
  * vertices are irrational (products of arbitrary rotations) can hit
  * ~0.1% near-degeneracy misorderings; a snap-rounding pass would be
  * the v2 fix.
  */
object Clip {

  sealed trait Op
  case object Intersection extends Op
  case object Union extends Op
  case object Difference extends Op
  case object Xor extends Op

  type Ring = Vector[Pt]
  type Poly = Vector[Ring]
  type MultiPoly = Vector[Poly]

  // edge annotation for overlapping-segment degeneracies
  private final val NORMAL = 0
  private final val NON_CONTRIBUTING = 1
  private final val SAME_TRANSITION = 2
  private final val DIFFERENT_TRANSITION = 3

  private def signedArea(p0: Pt, p1: Pt, p2: Pt): Double =
    (p0.x - p2.x) * (p1.y - p2.y) - (p1.x - p2.x) * (p0.y - p2.y)

  private final class SweepEvent(
      var point: Pt,
      var left: Boolean,
      var otherEvent: SweepEvent,
      val isSubject: Boolean) {
    var edgeType: Int = NORMAL
    var inOut = false // rings of OWN polygon below→above transition at this edge
    var otherInOut = false // same for the OTHER polygon's closest edge below
    var prevInResult: SweepEvent = null
    var inResult = false
    var pos = 0 // index into resultEvents after ordering
    var contourId = 0 // input ring id (collinear tie-break)

    def isBelow(p: Pt): Boolean =
      if (left) signedArea(point, otherEvent.point, p) > 0
      else signedArea(otherEvent.point, point, p) > 0
    def isAbove(p: Pt): Boolean = !isBelow(p)
    def isVertical: Boolean = point.x == otherEvent.point.x
  }

  /** queue order: smaller x first, then smaller y, right endpoints
    * before left (shrink the sweep structure before growing it), then
    * bottom edge first.
    */
  private def compareEvents(e1: SweepEvent, e2: SweepEvent): Int = {
    if (e1.point.x > e2.point.x) 1
    else if (e1.point.x < e2.point.x) -1
    else if (e1.point.y != e2.point.y) { if (e1.point.y > e2.point.y) 1 else -1 }
    else if (e1.left != e2.left) { if (e1.left) 1 else -1 }
    else if (signedArea(e1.point, e1.otherEvent.point, e2.otherEvent.point) != 0) {
      if (e1.isBelow(e2.otherEvent.point)) -1 else 1
    } else if (!e1.isSubject && e2.isSubject) 1
    else -1
  }

  /** sweep-status order: segment below the other at the shared sweep
    * position sorts first
    */
  private def compareSegments(le1: SweepEvent, le2: SweepEvent): Int = {
    if (le1 eq le2) return 0
    if (signedArea(le1.point, le1.otherEvent.point, le2.point) != 0 ||
        signedArea(le1.point, le1.otherEvent.point, le2.otherEvent.point) != 0) {
      if (le1.point == le2.point) return if (le1.isBelow(le2.otherEvent.point)) -1 else 1
      if (le1.point.x == le2.point.x) return if (le1.point.y < le2.point.y) -1 else 1
      if (compareEvents(le1, le2) == 1) return if (le2.isAbove(le1.point)) -1 else 1
      return if (le1.isBelow(le2.point)) -1 else 1
    }
    // collinear segments
    if (le1.isSubject == le2.isSubject) {
      if (le1.point == le2.point) {
        if (le1.otherEvent.point == le2.otherEvent.point) 0
        else if (le1.contourId > le2.contourId) 1
        else -1
      } else if (compareEvents(le1, le2) > 0) 1
      else -1
    } else if (le1.isSubject) -1
    else 1
  }

  // ---------------------------------------------- segment intersection

  /** 0, 1 or 2 intersection points of two closed segments; 2 points =
    * collinear overlap interval. Endpoint results snap exactly to the
    * input endpoints.
    */
  private def segmentIntersection(a1: Pt, a2: Pt, b1: Pt, b2: Pt): Array[Pt] = {
    val vax = a2.x - a1.x; val vay = a2.y - a1.y
    val vbx = b2.x - b1.x; val vby = b2.y - b1.y
    val ex = b1.x - a1.x; val ey = b1.y - a1.y
    val kross = vax * vby - vay * vbx
    def onA(s: Double): Pt =
      if (s == 0) a1 else if (s == 1) a2 else Pt(a1.x + s * vax, a1.y + s * vay)
    def onB(t: Double): Pt =
      if (t == 0) b1 else if (t == 1) b2 else Pt(b1.x + t * vbx, b1.y + t * vby)
    if (kross != 0) {
      // snap parameters within rounding distance of an endpoint TO the
      // endpoint: a crossing computed epsilon-inside a segment end
      // otherwise creates a sliver event whose ordering disagrees with
      // the shared-vertex events (the classic raw-double Martinez
      // failure under rotated near-degeneracies)
      val snap = 1e-12
      var s = (ex * vby - ey * vbx) / kross
      if (math.abs(s) < snap) s = 0 else if (math.abs(s - 1) < snap) s = 1
      if (s < 0 || s > 1) return Array.empty
      var t = (ex * vay - ey * vax) / kross
      if (math.abs(t) < snap) t = 0 else if (math.abs(t - 1) < snap) t = 1
      if (t < 0 || t > 1) return Array.empty
      if (s == 0 || s == 1) return Array(onA(s))
      if (t == 0 || t == 1) return Array(onB(t))
      return Array(onA(s))
    }
    if (ex * vay - ey * vax != 0) return Array.empty // parallel, apart
    // collinear: overlap interval in a's parameter space
    val sqrLenA = vax * vax + vay * vay
    if (sqrLenA == 0) return Array.empty
    val sa = (vax * ex + vay * ey) / sqrLenA
    val sb = sa + (vax * vbx + vay * vby) / sqrLenA
    val smin = math.min(sa, sb); val smax = math.max(sa, sb)
    if (smin > 1 || smax < 0) return Array.empty
    val lo = math.max(smin, 0); val hi = math.min(smax, 1)
    if (lo == hi) Array(onA(lo)) else Array(onA(lo), onA(hi))
  }

  // ---------------------------------------------------------- the sweep

  private type Queue = java.util.PriorityQueue[SweepEvent]

  private def divideSegment(se: SweepEvent, p: Pt, q: Queue): Unit = {
    val r = new SweepEvent(p, false, se, se.isSubject)
    val l = new SweepEvent(p, true, se.otherEvent, se.isSubject)
    r.contourId = se.contourId; l.contourId = se.contourId
    if (compareEvents(l, se.otherEvent) > 0) { // rounding produced a zero-advance split
      se.otherEvent.left = true
      l.left = false
    }
    se.otherEvent.otherEvent = l
    se.otherEvent = r
    q.add(l); q.add(r)
  }

  /** subdivides crossing segments; returns 2 when the segments overlap
    * collinearly and share the left endpoint (fields must be recomputed)
    */
  private def possibleIntersection(se1: SweepEvent, se2: SweepEvent, q: Queue): Int = {
    val inter = segmentIntersection(se1.point, se1.otherEvent.point, se2.point, se2.otherEvent.point)
    if (inter.isEmpty) return 0
    if (inter.length == 1 &&
        (se1.point == se2.point || se1.otherEvent.point == se2.otherEvent.point)) return 0
    if (inter.length == 2 && se1.isSubject == se2.isSubject) return 0 // self-overlap: invalid input, ignore
    if (inter.length == 1) {
      val p = inter(0)
      if (se1.point != p && se1.otherEvent.point != p) divideSegment(se1, p, q)
      if (se2.point != p && se2.otherEvent.point != p) divideSegment(se2, p, q)
      return 1
    }
    // collinear overlap between subject and clipping
    val events = ArrayBuffer.empty[SweepEvent]
    var leftCoincide = false; var rightCoincide = false
    if (se1.point == se2.point) leftCoincide = true
    else if (compareEvents(se1, se2) == 1) { events += se2; events += se1 }
    else { events += se1; events += se2 }
    if (se1.otherEvent.point == se2.otherEvent.point) rightCoincide = true
    else if (compareEvents(se1.otherEvent, se2.otherEvent) == 1) {
      events += se2.otherEvent; events += se1.otherEvent
    } else { events += se1.otherEvent; events += se2.otherEvent }

    if (leftCoincide) {
      // equal segments, or sharing the left endpoint: the lower edge
      // carries the combined transition, the upper contributes nothing
      se2.edgeType = NON_CONTRIBUTING
      se1.edgeType = if (se2.inOut == se1.inOut) SAME_TRANSITION else DIFFERENT_TRANSITION
      if (!rightCoincide) divideSegment(events(1).otherEvent, events(0).point, q)
      return 2
    }
    if (rightCoincide) {
      divideSegment(events(0), events(1).point, q)
      return 3
    }
    if (events(0) ne events(3).otherEvent) { // partial overlap
      divideSegment(events(0), events(1).point, q)
      divideSegment(events(1), events(2).point, q)
      return 3
    }
    // one segment contains the other
    divideSegment(events(0), events(1).point, q)
    divideSegment(events(3).otherEvent, events(2).point, q)
    3
  }

  private def inResultOf(e: SweepEvent, op: Op): Boolean = e.edgeType match {
    case NORMAL =>
      op match {
        case Intersection => !e.otherInOut
        case Union => e.otherInOut
        case Difference => (e.isSubject && e.otherInOut) || (!e.isSubject && !e.otherInOut)
        case Xor => true
      }
    case SAME_TRANSITION => op == Intersection || op == Union
    case DIFFERENT_TRANSITION => op == Difference
    case _ => false
  }

  private def computeFields(e: SweepEvent, prev: SweepEvent, op: Op): Unit = {
    if (prev == null) {
      e.inOut = false
      e.otherInOut = true
    } else if (e.isSubject == prev.isSubject) {
      e.inOut = !prev.inOut
      e.otherInOut = prev.otherInOut
    } else {
      e.inOut = !prev.otherInOut
      e.otherInOut = if (prev.isVertical) !prev.inOut else prev.inOut
    }
    if (prev != null)
      e.prevInResult = if (!inResultOf(prev, op) || prev.isVertical) prev.prevInResult else prev
    e.inResult = inResultOf(e, op)
  }

  private def addRing(ring: Ring, isSubject: Boolean, contourId: Int, q: Queue): Unit = {
    val n = ring.length
    var i = 0
    while (i < n - 1) {
      val p1 = ring(i); val p2 = ring(i + 1)
      if (p1 != p2) {
        val e1 = new SweepEvent(p1, false, null, isSubject)
        val e2 = new SweepEvent(p2, false, e1, isSubject)
        e1.otherEvent = e2
        e1.contourId = contourId; e2.contourId = contourId
        if (compareEvents(e1, e2) < 0) e1.left = true else e2.left = true
        q.add(e1); q.add(e2)
      }
      i += 1
    }
  }

  private def bboxOf(mp: MultiPoly): (Double, Double, Double, Double) = {
    var x0 = Double.PositiveInfinity; var y0 = Double.PositiveInfinity
    var x1 = Double.NegativeInfinity; var y1 = Double.NegativeInfinity
    for (p <- mp; r <- p; pt <- r) {
      if (pt.x < x0) x0 = pt.x; if (pt.y < y0) y0 = pt.y
      if (pt.x > x1) x1 = pt.x; if (pt.y > y1) y1 = pt.y
    }
    (x0, y0, x1, y1)
  }

  // ------------------------------------------------- contour rebuilding

  /** continuation at a junction: among the unprocessed events at the
    * same point, take the sharpest LEFT turn relative to the incoming
    * edge direction. This is planar-arrangement face tracing — it keeps
    * every traced ring simple and consistently oriented where the
    * martinez "first unprocessed at this point" rule would merge two
    * touching lobes into one figure-8 contour whose shoelace areas
    * cancel (xor of partially overlapping boxes, corner-touching
    * unions).
    */
  private def nextPos(pos: Int, evs: ArrayBuffer[SweepEvent], processed: Array[Boolean],
      orig: Int, prevPt: Pt): Int = {
    val p = evs(pos).point
    var lo = pos; while (lo - 1 >= 0 && evs(lo - 1).point == p) lo -= 1
    var hi = pos; while (hi + 1 < evs.length && evs(hi + 1).point == p) hi += 1
    val vx = p.x - prevPt.x; val vy = p.y - prevPt.y
    var best = -1; var bestAng = Double.NegativeInfinity
    var j = lo
    while (j <= hi) {
      if (!processed(j)) {
        val o = evs(j).otherEvent.point
        val cx = o.x - p.x; val cy = o.y - p.y
        val ang = math.atan2(vx * cy - vy * cx, vx * cx + vy * cy)
        if (ang > bestAng) { bestAng = ang; best = j }
      }
      j += 1
    }
    if (best >= 0) best
    else {
      var np = pos - 1
      while (np > orig && processed(np)) np -= 1
      np
    }
  }

  private def connectEdges(sortedEvents: ArrayBuffer[SweepEvent]): Vector[Ring] = {
    val resultEvents = sortedEvents.filter(e =>
      (e.left && e.inResult) || (!e.left && e.otherEvent.inResult))
    // divisions during the sweep can leave the list slightly out of order
    var sorted = false
    while (!sorted) {
      sorted = true
      var i = 0
      while (i + 1 < resultEvents.length) {
        if (compareEvents(resultEvents(i), resultEvents(i + 1)) == 1) {
          val t = resultEvents(i); resultEvents(i) = resultEvents(i + 1); resultEvents(i + 1) = t
          sorted = false
        }
        i += 1
      }
    }
    var i = 0
    while (i < resultEvents.length) { resultEvents(i).pos = i; i += 1 }
    i = 0
    while (i < resultEvents.length) {
      val e = resultEvents(i)
      if (!e.left) { val t = e.pos; e.pos = e.otherEvent.pos; e.otherEvent.pos = t }
      i += 1
    }

    val processed = new Array[Boolean](resultEvents.length)
    val contours = Vector.newBuilder[Ring]
    i = 0
    while (i < resultEvents.length) {
      if (!processed(i)) {
        val contour = ArrayBuffer.empty[Pt]
        val initial = resultEvents(i).point
        contour += initial
        var pos = i
        var open = true
        while (open) {
          processed(pos) = true
          val from = resultEvents(pos).point
          pos = resultEvents(pos).pos // jump to the partner endpoint
          processed(pos) = true
          contour += resultEvents(pos).point
          if (resultEvents(pos).point == initial) open = false // ring closed
          else {
            pos = nextPos(pos, resultEvents, processed, i, from)
            if (pos <= i) open = false
          }
        }
        // drop an unclosed fragment (shouldn't happen on valid input)
        val ring = contour.toVector
        if (ring.length >= 4 && ring.head == ring.last) contours += ring
        else if (ring.length >= 3 && ring.head != ring.last) contours += (ring :+ ring.head)
      }
      i += 1
    }
    contours.result().filter(r => math.abs(Geometry.signedArea(r)) > 0)
  }

  /** nest the edge-disjoint output contours: even containment depth =
    * shell, odd = hole of its smallest containing ring. Containment is
    * tested with the midpoint of a contour's first edge — result
    * contours never share edges, so the midpoint is never on another
    * contour's boundary except in collinear slivers already filtered by
    * the zero-area check.
    */
  private def assemble(rings: Vector[Ring]): MultiPoly = {
    if (rings.isEmpty) return Vector.empty
    val reps = rings.map { r => Pt((r(0).x + r(1).x) / 2, (r(0).y + r(1).y) / 2) }
    val areas = rings.map(r => math.abs(Geometry.signedArea(r)))
    val n = rings.length
    val parent = Array.fill(n)(-1)
    val depth = Array.fill(n)(0)
    var i = 0
    while (i < n) {
      var best = -1
      var j = 0
      while (j < n) {
        if (j != i && areas(j) > areas(i) && Geometry.pointInRing(reps(i), rings(j)) == 2) {
          depth(i) += 1
          if (best == -1 || areas(j) < areas(best)) best = j
        }
        j += 1
      }
      if (best != -1) parent(i) = best
      i += 1
    }
    val shells = (0 until n).filter(depth(_) % 2 == 0)
    shells.toVector.map { s =>
      val shell =
        if (Geometry.signedArea(rings(s)) < 0) rings(s).reverse else rings(s)
      val holes = (0 until n).collect {
        case h if depth(h) % 2 == 1 && parent(h) == s =>
          if (Geometry.signedArea(rings(h)) > 0) rings(h).reverse else rings(h)
      }
      shell +: holes.toVector
    }
  }

  // ------------------------------------------------------------- entry

  def booleanOp(subject: MultiPoly, clipping: MultiPoly, op: Op): MultiPoly = {
    val subjEmpty = subject.forall(_.forall(_.length < 4))
    val clipEmpty = clipping.forall(_.forall(_.length < 4))
    if (subjEmpty || clipEmpty) {
      return op match {
        case Intersection => Vector.empty
        case Difference => if (subjEmpty) Vector.empty else subject
        case _ => if (subjEmpty) clipping else subject
      }
    }
    val sb = bboxOf(subject); val cb = bboxOf(clipping)
    if (sb._3 < cb._1 || cb._3 < sb._1 || sb._4 < cb._2 || cb._4 < sb._2) {
      return op match {
        case Intersection => Vector.empty
        case Difference => subject
        case _ => subject ++ clipping
      }
    }

    val q: Queue = new java.util.PriorityQueue[SweepEvent](64, compareEvents(_, _))
    var cid = 0
    subject.foreach(_.foreach { r => addRing(r, isSubject = true, cid, q); cid += 1 })
    clipping.foreach(_.foreach { r => addRing(r, isSubject = false, cid, q); cid += 1 })

    val sweepLine = new java.util.TreeSet[SweepEvent](compareSegments(_, _))
    val sortedEvents = ArrayBuffer.empty[SweepEvent]
    val rightbound = math.min(sb._3, cb._3)
    var done = false
    while (!done && !q.isEmpty) {
      val event = q.poll()
      sortedEvents += event
      if ((op == Intersection && event.point.x > rightbound) ||
          (op == Difference && event.point.x > sb._3)) {
        done = true // nothing further right can contribute
      } else if (event.left) {
        sweepLine.add(event)
        val prev = sweepLine.lower(event)
        val next = sweepLine.higher(event)
        computeFields(event, prev, op)
        if (next != null && possibleIntersection(event, next, q) == 2) {
          computeFields(event, prev, op)
          computeFields(next, event, op)
        }
        if (prev != null && possibleIntersection(prev, event, q) == 2) {
          val prevprev = sweepLine.lower(prev)
          computeFields(prev, prevprev, op)
          computeFields(event, prev, op)
        }
      } else {
        val left = event.otherEvent
        if (sweepLine.contains(left)) {
          val prev = sweepLine.lower(left)
          val next = sweepLine.higher(left)
          sweepLine.remove(left)
          if (prev != null && next != null) possibleIntersection(prev, next, q)
        }
      }
    }
    assemble(connectEdges(sortedEvents))
  }
}
