package graft.functions

import org.apache.spark.sql.SparkSession

/** H3 index math (reference: src/query/functions/src/scalars/geographic/
  * src/geo_h3.rs:1-732, which binds the h3o crate; cell layout per the
  * public Uber H3 spec).
  *
  * Scope: the 27 functions that operate purely on the 64-bit index
  * structure and the aperture-7 local-IJK grid — validation,
  * resolution/base-cell accessors, parent/children/center-child
  * hierarchy, string round-trip, pentagon and class-III predicates,
  * the per-resolution average edge-length/area constants, directed
  * edges (validity/origin/destination/pair/construction/enumeration),
  * and the traversals k_ring/hex_ring/line/distance/neighbors (exact
  * within one base cell; cross-base or pentagon-seam traversals
  * return NULL rather than wrong — the cross-base unfold needs the
  * 122-entry icosahedron base-cell neighbor tables, which are not
  * reconstructible offline). The remaining gnomonic projection tier
  * (geo<->cell, boundaries, exact areas/lengths, faces) needs the
  * same tables plus the face-center gnomonic constants — those names
  * stay unregistered rather than wrong.
  *
  * Cell layout (H3 spec): bit 63 reserved=0; bits 59-62 mode (1=cell,
  * 2=directed edge); bits 56-58 reserved for cells / edge direction for
  * edges; bits 52-55 resolution; bits 45-51 base cell (0..121); then 15
  * 3-bit digits, res r at bits (45-3r)..(47-3r), unused digits = 7.
  *
  * Error semantics: the reference raises a query error on invalid
  * input; the Spark surface returns NULL (idiomatic for scalar SQL
  * functions) — documented divergence.
  *
  * Constants: resolutions 0, 1 and 15 of every table are pinned
  * bit-exact by the reference goldens
  * (tests/it/scalars/testdata/geo_h3.txt); intermediate resolutions
  * carry the published H3 v4.1 table values.
  */
object H3 {

  /** the 12 pentagon base cells (H3 spec) */
  val PentagonBases: Set[Int] = Set(4, 14, 24, 38, 49, 58, 63, 72, 83, 97, 107, 117)

  private val ModeCell = 1L
  private val ModeEdge = 2L

  def resolution(h: Long): Int = ((h >>> 52) & 0xFL).toInt
  def baseCell(h: Long): Int = ((h >>> 45) & 0x7FL).toInt
  private def digit(h: Long, r: Int): Int = ((h >>> (45 - 3 * r)) & 7L).toInt
  private def setDigit(h: Long, r: Int, d: Int): Long =
    (h & ~(7L << (45 - 3 * r))) | (d.toLong << (45 - 3 * r))
  private def setRes(h: Long, res: Int): Long =
    (h & ~(0xFL << 52)) | (res.toLong << 52)

  def isValidCell(h: Long): Boolean = {
    if (h < 0) return false                       // bit 63
    if (((h >>> 59) & 0xFL) != ModeCell) return false
    if (((h >>> 56) & 0x7L) != 0) return false    // reserved
    val bc = baseCell(h)
    if (bc >= 122) return false
    val res = resolution(h)
    var foundNonZero = false
    var r = 1
    while (r <= res) {
      val d = digit(h, r)
      if (d == 7) return false
      if (!foundNonZero && d != 0) {
        foundNonZero = true
        // K-axis first digit under a pentagon = deleted subsequence
        if (d == 1 && PentagonBases(bc)) return false
      }
      r += 1
    }
    while (r <= 15) { if (digit(h, r) != 7) return false; r += 1 }
    true
  }

  def isPentagon(h: Long): Boolean =
    isValidCell(h) && PentagonBases(baseCell(h)) &&
      (1 to resolution(h)).forall(digit(h, _) == 0)

  def isResClassIII(h: Long): Boolean = resolution(h) % 2 == 1

  def toParent(h: Long, parentRes: Int): Option[Long] = {
    if (!isValidCell(h)) return None
    val res = resolution(h)
    if (parentRes < 0 || parentRes > res) return None
    var out = setRes(h, parentRes)
    var r = parentRes + 1
    while (r <= 15) { out = setDigit(out, r, 7); r += 1 }
    Some(out)
  }

  def toChildren(h: Long, childRes: Int): Option[Seq[Long]] = {
    if (!isValidCell(h)) return None
    val res = resolution(h)
    if (childRes < res || childRes > 15) return None
    var acc = Vector(h)
    for (r <- res + 1 to childRes) {
      acc = acc.flatMap { c =>
        val pent = isPentagon(c)
        val stepped = setRes(c, r)
        (0 to 6).collect {
          // a pentagon deletes its K-axis (digit 1) child
          case d if !(pent && d == 1) => setDigit(stepped, r, d)
        }
      }
    }
    Some(acc)
  }

  def toCenterChild(h: Long, childRes: Int): Option[Long] = {
    if (!isValidCell(h)) return None
    val res = resolution(h)
    if (childRes < res || childRes > 15) return None
    var out = setRes(h, childRes)
    var r = res + 1
    while (r <= childRes) { out = setDigit(out, r, 0); r += 1 }
    Some(out)
  }

  def toHexString(h: Long): String = java.lang.Long.toHexString(h)

  def fromHexString(s: String): Option[Long] =
    try {
      val v = java.lang.Long.parseUnsignedLong(s.trim.stripPrefix("0x"), 16)
      if (isValidCell(v)) Some(v) else None
    } catch { case _: NumberFormatException => None }

  /** total cells at a resolution: 110 hexagons + 12 pentagons at res 0,
    * x7 per refinement = 2 + 120 * 7^res
    */
  def numHexagons(res: Int): Option[Long] =
    if (res < 0 || res > 15) None
    else Some(2L + 120L * math.pow(7, res).toLong)

  // per-resolution AVERAGE constants (H3 v4.1 tables). Resolutions
  // 0-4 and 15 are pinned bit-exact by the reference goldens
  // (geo_h3.txt:306-346,370-410 + 02_0060_function_geo_h3.test:86-162
  // shortest-roundtrip reprs); 5-14 carry the published v4.1 values.
  private val EdgeLenM: Array[Double] = Array(
    1281256.010741364, 483056.8390711111, 182512.95648916735, 68979.22178775584,
    26071.75968017739, 9854.090990, 3724.532667, 1406.475763,
    531.4140101, 200.7861476, 75.86378287, 28.66389748,
    10.83018784, 4.092010473, 1.546100657, 0.5841686296)

  private val HexAreaKm2: Array[Double] = Array(
    4357449.416078383, 609788.4417941332, 86801.7803989972, 12393.43465508816,
    1770.347654491307, 252.903858182, 36.129062164, 5.161293360,
    0.737327598, 0.105332513, 0.015047502, 0.002149643,
    3.07092e-4, 4.3870e-5, 6.267e-6, 8.953115907e-7)

  private val HexAreaM2: Array[Double] = Array(
    4357449416078.39, 609788441794.1339, 86801780398.99731, 12393434655.08818,
    1770347654.491309, 252903858.182, 36129062.164, 5161293.360,
    737327.598, 105332.513, 15047.502, 2149.643,
    307.092, 43.870, 6.267, 0.8953115907)

  private def resTable(res: Int, t: Array[Double]): Option[Double] =
    if (res < 0 || res > 15) None else Some(t(res))

  def edgeLengthM(res: Int): Option[Double] = resTable(res, EdgeLenM)
  def edgeLengthKm(res: Int): Option[Double] = resTable(res, EdgeLenM).map(_ / 1000.0)
  def hexAreaM2(res: Int): Option[Double] = resTable(res, HexAreaM2)
  def hexAreaKm2(res: Int): Option[Double] = resTable(res, HexAreaKm2)

  /** 180/pi/earth-radius-m, the h3 sources' constant (reference
    * geo_h3.rs:721-726 — same constant, via ClickHouse h3EdgeAngle)
    */
  def edgeAngle(res: Int): Option[Double] =
    edgeLengthM(res).map(8.99320592271288e-6 * _)

  // ---- local IJK grid math (same-base-cell tier) ----------------------

  private def ijkNormalize(v: (Int, Int, Int)): (Int, Int, Int) = {
    // axial redundancy: subtract the minimum so components are
    // non-negative with at least one zero (H3 _ijkNormalize)
    val m = math.min(v._1, math.min(v._2, v._3))
    (v._1 - m, v._2 - m, v._3 - m)
  }

  private def digitIjk(d: Int): (Int, Int, Int) = d match {
    case 0 => (0, 0, 0)
    case 1 => (0, 0, 1) // K
    case 2 => (0, 1, 0) // J
    case 3 => (0, 1, 1) // JK
    case 4 => (1, 0, 0) // I
    case 5 => (1, 0, 1) // IK
    case 6 => (1, 1, 0) // IJ
    case _ => throw new IllegalArgumentException(s"digit $d")
  }

  /** IJK coordinates relative to the cell's own base cell center
    * (the per-resolution walk of H3's h3ToFaceIjk: aperture-7
    * down-sample — reversed orientation on class-III resolutions —
    * then step to the digit's sub-cell). Under a pentagon base cell
    * the walk is still the plain aperture-7 one for the cells that
    * exist (the K-axis wedge is deleted, not warped), so coordinates
    * are usable as long as results are re-validated with
    * [[isValidCell]]; traversals that would cross the deleted wedge
    * or the base-cell boundary surface as None downstream.
    */
  private[graft] def localIjk(h: Long): Option[(Int, Int, Int)] = {
    if (!isValidCell(h)) return None
    var i = 0; var j = 0; var k = 0
    for (r <- 1 to resolution(h)) {
      val (ni, nj, nk) =
        if (r % 2 == 1) // class III rotates ccw (_downAp7)
          (3 * i + 1 * j, 3 * j + 1 * k, 1 * i + 3 * k)
        else            // class II rotates cw (_downAp7r)
          (3 * i + 1 * k, 1 * i + 3 * j, 1 * j + 3 * k)
      val d = digitIjk(digit(h, r))
      val n = ijkNormalize((ni + d._1, nj + d._2, nk + d._3))
      i = n._1; j = n._2; k = n._3
    }
    Some((i, j, k))
  }

  /** grid distance in cell steps — exact for two cells of equal
    * resolution under the SAME hexagonal base cell (where local IJK
    * needs no cross-face unfolding); None otherwise rather than wrong
    */
  def gridDistance(a: Long, b: Long): Option[Int] = {
    if (!isValidCell(a) || !isValidCell(b)) return None
    if (resolution(a) != resolution(b) || baseCell(a) != baseCell(b)) return None
    val plain = for (pa <- localIjk(a); pb <- localIjk(b)) yield {
      val d = ijkNormalize((pa._1 - pb._1, pa._2 - pb._2, pa._3 - pb._3))
      math.max(math.abs(d._1), math.max(math.abs(d._2), math.abs(d._3)))
    }
    // pentagon patches: the deleted wedge folds the metric (cells
    // plain-walk-2 apart can be seam-adjacent, e.g. the JK and IK
    // children across the collapsed K wedge), so only the provably
    // sound cases survive — equality and direct unit adjacency
    if (PentagonBases(baseCell(a))) plain.filter(_ <= 1) else plain
  }

  def areNeighbors(a: Long, b: Long): Option[Boolean] =
    gridDistance(a, b).map(_ == 1)

  // ---- local IJK inverse + traversals ---------------------------------

  private def ijkAdd(a: (Int, Int, Int), b: (Int, Int, Int)): (Int, Int, Int) =
    ijkNormalize((a._1 + b._1, a._2 + b._2, a._3 + b._3))

  private def ijkSub(a: (Int, Int, Int), b: (Int, Int, Int)): (Int, Int, Int) =
    ijkNormalize((a._1 - b._1, a._2 - b._2, a._3 - b._3))

  private val UnitDigit: Map[(Int, Int, Int), Int] =
    (1 to 6).map(d => digitIjk(d) -> d).toMap

  /** inverse aperture-7 step: the parent (at res r-1) of a cell whose
    * center sits at `v` in res-r coordinates (H3 _upAp7 / _upAp7r for
    * class III / class II r). Exactly invertible because cell centers
    * land on the aperture lattice; /7 never produces a .5 so the
    * rounding mode is immaterial.
    */
  private def upAp7(v: (Int, Int, Int), r: Int): (Int, Int, Int) = {
    val i = v._1 - v._3
    val j = v._2 - v._3
    val (a, b) =
      if (r % 2 == 1) (math.round((3.0 * i - j) / 7.0).toInt,
                       math.round((i + 2.0 * j) / 7.0).toInt)
      else            (math.round((2.0 * i + j) / 7.0).toInt,
                       math.round((3.0 * j - i) / 7.0).toInt)
    ijkNormalize((a, b, 0))
  }

  private def downAp7(v: (Int, Int, Int), r: Int): (Int, Int, Int) =
    if (r % 2 == 1) (3 * v._1 + v._2, 3 * v._2 + v._3, v._1 + 3 * v._3)
    else            (3 * v._1 + v._3, v._1 + 3 * v._2, v._2 + 3 * v._3)

  /** rebuild a cell index from local IJK coordinates (inverse of
    * [[localIjk]], digit recovery top-down via the aperture inverse).
    * None when the coordinates leave `sample`'s base cell or land on a
    * pentagon's deleted K-axis subsequence — the traversal genuinely
    * needs the cross-base face tables there, so callers surface NULL
    * rather than a wrong cell.
    */
  private[graft] def ijkToCell(sample: Long, ijk: (Int, Int, Int)): Option[Long] = {
    var h = sample
    var v = ijk
    var r = resolution(sample)
    while (r >= 1) {
      val parent = upAp7(v, r)
      val center = ijkNormalize(downAp7(parent, r))
      val diff = ijkSub(v, center)
      val d = if (diff == (0, 0, 0)) 0 else UnitDigit.getOrElse(diff, -1)
      if (d < 0) return None
      h = setDigit(h, r, d)
      v = parent
      r -= 1
    }
    if (v != (0, 0, 0) || !isValidCell(h)) None else Some(h)
  }

  /** ring-walk direction cycle (digits J, JK, K, IK, I, IJ), derived
    * from and validated against the reference's own h3o golden vectors
    * (02_0060_function_geo_h3.test: the res-15 18-cell hex_ring and
    * all four k_ring spirals)
    */
  private val RingWalk = Array(2, 3, 1, 5, 4, 6)

  /** the hollow ring at exactly distance k — h3o ordering: start at
    * the k*I corner, walk k steps in each cycle direction. None if
    * any cell leaves the base cell (needs face tables).
    */
  def hexRing(h: Long, k: Int): Option[Seq[Long]] = {
    if (!isValidCell(h) || k < 0) return None
    if (k == 0) return Some(Seq(h))
    localIjk(h).flatMap { o =>
      var cur = ijkNormalize((o._1 + k, o._2, o._3)) // corner at k*I
      val out = Vector.newBuilder[Long]
      var ok = true
      var di = 0
      while (ok && di < 6) {
        var s = 0
        while (ok && s < k) {
          ijkToCell(h, cur) match {
            case Some(c) => out += c
            case None    => ok = false
          }
          cur = ijkAdd(cur, digitIjk(RingWalk(di)))
          s += 1
        }
        di += 1
      }
      if (ok) Some(out.result()) else None
    }
  }

  /** filled disk out to distance k — h3o ordering: origin, then each
    * ring's cycle rotated left by one (validated against the golden
    * spirals). None if the disk spills out of the base cell.
    */
  def kRing(h: Long, k: Int): Option[Seq[Long]] = {
    if (!isValidCell(h) || k < 0) return None
    var out = Vector(h)
    var kk = 1
    while (kk <= k) {
      hexRing(h, kk) match {
        case Some(ring) => out = out ++ ring.drop(1) :+ ring.head
        case None       => return None
      }
      kk += 1
    }
    Some(out)
  }

  // cube coordinates for the line lerp (H3 ijkToCube/cubeToIjk)
  private def ijkToCube(v: (Int, Int, Int)): (Int, Int) =
    (-v._1 + v._3, v._2 - v._3)

  private def cubeToIjk(ci: Int, cj: Int): (Int, Int, Int) =
    ijkNormalize((-ci, cj, 0))

  /** the cell path from a to b (H3 gridPathCells: cube-coordinate
    * linear interpolation with cube rounding). Same restrictions as
    * [[gridDistance]]: same-resolution, same hexagonal base cell.
    */
  def gridLine(a: Long, b: Long): Option[Seq[Long]] =
    gridDistance(a, b).flatMap { dist =>
      if (dist == 0) Some(Seq(a))
      else {
        val (sa, sb) = (localIjk(a).get, localIjk(b).get)
        val (ai, aj) = ijkToCube(sa)
        val (bi, bj) = ijkToCube(sb)
        val out = Vector.newBuilder[Long]
        var ok = true
        var s = 0
        while (ok && s <= dist) {
          val t = s.toDouble / dist
          val fi = ai + (bi - ai) * t
          val fj = aj + (bj - aj) * t
          val fk = -fi - fj
          // cube rounding: fix the axis with the largest error
          var ri = math.round(fi).toInt
          var rj = math.round(fj).toInt
          var rk = math.round(fk).toInt
          val (ei, ej, ek) =
            (math.abs(ri - fi), math.abs(rj - fj), math.abs(rk - fk))
          if (ei > ej && ei > ek) ri = -rj - rk
          else if (ej > ek) rj = -ri - rk
          else rk = -ri - rj
          ijkToCell(a, cubeToIjk(ri, rj)) match {
            case Some(c) => out += c
            case None    => ok = false
          }
          s += 1
        }
        if (ok) Some(out.result()) else None
      }
    }

  // ---- directed (unidirectional) edges --------------------------------

  private def edgeDirection(e: Long): Int = ((e >>> 56) & 0x7L).toInt

  def edgeOrigin(e: Long): Option[Long] =
    if (!edgeIsValid(e)) None
    else Some((e & 0x00FFFFFFFFFFFFFFL) | (ModeCell << 59))

  def edgeIsValid(e: Long): Boolean = {
    if (e < 0) return false
    if (((e >>> 59) & 0xFL) != ModeEdge) return false
    val d = edgeDirection(e)
    if (d < 1 || d > 6) return false
    val origin = (e & 0x00FFFFFFFFFFFFFFL) | (ModeCell << 59)
    if (!isValidCell(origin)) return false
    !(isPentagon(origin) && d == 1) // pentagons have no K-axis edge
  }

  /** the 6 (5 for pentagons) outgoing directed edges of a cell */
  def edgesFromCell(h: Long): Option[Seq[Long]] =
    if (!isValidCell(h)) None
    else {
      val dirs = if (isPentagon(h)) 2 to 6 else 1 to 6
      val base = (h & 0x00FFFFFFFFFFFFFFL) | (ModeEdge << 59)
      Some(dirs.map(d => base | (d.toLong << 56)))
    }

  /** the directed edge from origin to an adjacent destination: the
    * origin's index with edge mode and the IJK unit-digit of
    * (destination - origin) as the direction (validated against both
    * reference edge goldens, incl. the pentagon-base pair). None when
    * the cells aren't plain-walk-adjacent in the same base cell —
    * seam adjacencies need the face tables.
    */
  def edgeBetween(origin: Long, dest: Long): Option[Long] = {
    if (!isValidCell(origin) || !isValidCell(dest)) return None
    if (resolution(origin) != resolution(dest) ||
        baseCell(origin) != baseCell(dest)) return None
    for {
      po <- localIjk(origin)
      pd <- localIjk(dest)
      d <- UnitDigit.get(ijkSub(pd, po))
    } yield (origin & 0x00FFFFFFFFFFFFFFL) | (ModeEdge << 59) | (d.toLong << 56)
  }

  /** the destination cell of a directed edge: one unit step from the
    * origin in the edge direction. None when the step leaves the base
    * cell or lands on a pentagon's deleted wedge.
    */
  def edgeDestination(e: Long): Option[Long] =
    for {
      o <- edgeOrigin(e)
      po <- localIjk(o)
      dst <- ijkToCell(o, ijkAdd(po, digitIjk(edgeDirection(e))))
    } yield dst

  // ---- registration ---------------------------------------------------

  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.functions.udf
    val r = spark.udf
    r.register("h3_is_valid", udf((h: Long) => isValidCell(h)))
    r.register("h3_get_resolution", udf((h: Long) =>
      if (isValidCell(h)) Some(resolution(h)) else None))
    r.register("h3_get_base_cell", udf((h: Long) =>
      if (isValidCell(h)) Some(baseCell(h)) else None))
    r.register("h3_to_parent", udf((h: Long, res: Int) => toParent(h, res)))
    r.register("h3_to_children", udf((h: Long, res: Int) => toChildren(h, res)))
    r.register("h3_to_center_child", udf((h: Long, res: Int) => toCenterChild(h, res)))
    r.register("h3_to_string", udf((h: Long) =>
      if (isValidCell(h)) Some(toHexString(h)) else None))
    r.register("string_to_h3", udf((s: String) =>
      if (s == null) None else fromHexString(s)))
    r.register("h3_is_res_class_iii", udf((h: Long) => isResClassIII(h)))
    r.register("h3_is_pentagon", udf((h: Long) => isPentagon(h)))
    r.register("h3_num_hexagons", udf((res: Int) => numHexagons(res)))
    r.register("h3_edge_length_m", udf((res: Int) => edgeLengthM(res)))
    r.register("h3_edge_length_km", udf((res: Int) => edgeLengthKm(res)))
    r.register("h3_hex_area_m2", udf((res: Int) => hexAreaM2(res)))
    r.register("h3_hex_area_km2", udf((res: Int) => hexAreaKm2(res)))
    r.register("h3_edge_angle", udf((res: Int) => edgeAngle(res)))
    r.register("h3_distance", udf((a: Long, b: Long) => gridDistance(a, b)))
    r.register("h3_indexes_are_neighbors", udf((a: Long, b: Long) => areNeighbors(a, b)))
    r.register("h3_unidirectional_edge_is_valid", udf((e: Long) => edgeIsValid(e)))
    r.register("h3_get_origin_index_from_unidirectional_edge",
      udf((e: Long) => edgeOrigin(e)))
    r.register("h3_get_unidirectional_edges_from_hexagon",
      udf((h: Long) => edgesFromCell(h)))
    r.register("h3_k_ring", udf((h: Long, k: Int) => kRing(h, k)))
    r.register("h3_hex_ring", udf((h: Long, k: Int) => hexRing(h, k)))
    r.register("h3_line", udf((a: Long, b: Long) => gridLine(a, b)))
    r.register("h3_get_unidirectional_edge",
      udf((o: Long, d: Long) => edgeBetween(o, d)))
    r.register("h3_get_destination_index_from_unidirectional_edge",
      udf((e: Long) => edgeDestination(e)))
    // reference output is the (origin, destination) pair
    r.register("h3_get_indexes_from_unidirectional_edge",
      udf((e: Long) =>
        for (o <- edgeOrigin(e); d <- edgeDestination(e)) yield (o, d)))
  }
}
