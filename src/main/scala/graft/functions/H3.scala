package graft.functions

import org.apache.spark.sql.SparkSession

/** H3 index math (reference: src/query/functions/src/scalars/geographic/
  * src/geo_h3.rs:1-732, which binds the h3o crate; cell layout per the
  * public Uber H3 spec).
  *
  * Scope: the 19 functions that operate purely on the 64-bit index
  * structure — validation, resolution/base-cell accessors, parent/
  * children/center-child hierarchy, string round-trip, pentagon and
  * class-III predicates, the per-resolution average edge-length/area
  * constants, and directed-edge origin/validity/enumeration. The
  * gnomonic projection tier (geo<->cell, k_ring, boundaries, distance)
  * needs the icosahedron face/base-cell tables, which are not
  * reconstructible offline — those names stay unregistered rather than
  * wrong.
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
    * then step to the digit's sub-cell). Defined only for cells whose
    * base cell is a hexagon: pentagon axes warp and need the
    * face tables.
    */
  private[graft] def localIjk(h: Long): Option[(Int, Int, Int)] = {
    if (!isValidCell(h) || PentagonBases(baseCell(h))) return None
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
    for (pa <- localIjk(a); pb <- localIjk(b)) yield {
      val d = ijkNormalize((pa._1 - pb._1, pa._2 - pb._2, pa._3 - pb._3))
      math.max(math.abs(d._1), math.max(math.abs(d._2), math.abs(d._3)))
    }
  }

  def areNeighbors(a: Long, b: Long): Option[Boolean] =
    gridDistance(a, b).map(_ == 1)

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
  }
}
