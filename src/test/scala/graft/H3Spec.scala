package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.H3

/** H3 index math vs the reference's own golden outputs
  * (reference: src/query/functions/tests/it/scalars/testdata/geo_h3.txt
  * — produced by h3o, which follows the Uber H3 spec bit-exactly).
  * Every literal below is copied from that golden file.
  */
class H3Spec extends AnyFunSuite {

  // golden cells: geo_h3.txt h3_to_geo/h3_to_parent/h3_is_pentagon blocks
  private val res15Cell = 644325524701193974L // 0x8f11aa6a38826f6
  private val res13Cell = 635318325446452991L // 0x8d11aa6a38826ff
  private val pentagon = 599119489002373119L  // res-5 center child of base cell 4

  test("h3_is_valid golden vectors") {
    assert(!H3.isValidCell(0L))
    assert(!H3.isValidCell(1L))
    assert(!H3.isValidCell(-1L))
    assert(H3.isValidCell(res15Cell))
    assert(H3.isValidCell(res13Cell))
    assert(H3.isValidCell(pentagon))
    // mode-2 edge is not a cell
    assert(!H3.isValidCell(1248204388774707199L))
    // unused digit not 7 (res13 cell claiming res 12)
    assert(!H3.isValidCell((res13Cell & ~(0xFL << 52)) | (12L << 52)))
    // base cell >= 122
    assert(!H3.isValidCell(res15Cell | (127L << 45)))
  }

  test("resolution / base cell accessors (golden)") {
    assert(H3.resolution(res15Cell) == 15) // geo_h3.txt h3_get_resolution
    assert(H3.baseCell(res15Cell) == 8)    // geo_h3.txt h3_get_base_cell
    assert(H3.resolution(res13Cell) == 13)
    assert(H3.resolution(pentagon) == 5)
    assert(H3.baseCell(pentagon) == 4)
  }

  test("h3_to_parent golden: res 12 parent; finer-than-self rejected") {
    assert(H3.toParent(res13Cell, 12).contains(630814725819082751L))
    assert(H3.toParent(res13Cell, 14).isEmpty) // reference errors here
    assert(H3.toParent(res13Cell, 13).contains(res13Cell))
    // parent round-trips through children
    val p = H3.toParent(res15Cell, 14).get
    assert(H3.toChildren(p, 15).get.contains(res15Cell))
  }

  test("h3_to_children: self at equal res; 7 hexagon / 6 pentagon children") {
    assert(H3.toChildren(644325524701193897L, 15).contains(Seq(644325524701193897L)))
    val hexChildren = H3.toChildren(res13Cell, 14).get
    assert(hexChildren.length == 7)
    assert(hexChildren.forall(H3.isValidCell))
    assert(hexChildren.forall(c => H3.toParent(c, 13).contains(res13Cell)))
    val pentChildren = H3.toChildren(pentagon, 6).get
    assert(pentChildren.length == 6, "pentagon deletes its K-axis child")
    assert(pentChildren.count(H3.isPentagon) == 1)
    // two levels: pentagon -> 6 + 7x6 = 48? no: 6 children, one pentagon
    // (6 children) + five hexagons (7 each) = 41
    assert(H3.toChildren(pentagon, 7).get.length == 41)
  }

  test("h3_to_center_child golden (pentagon at res 15)") {
    assert(H3.toCenterChild(pentagon, 15).contains(644155484202336256L))
    assert(H3.toCenterChild(res13Cell, 13).contains(res13Cell))
    assert(H3.toCenterChild(res13Cell, 12).isEmpty)
  }

  test("h3_to_string / string_to_h3 golden round-trip") {
    assert(H3.toHexString(res13Cell) == "8d11aa6a38826ff")
    assert(H3.fromHexString("8d11aa6a38826ff").contains(res13Cell))
    assert(H3.fromHexString("zzz").isEmpty)
    assert(H3.fromHexString("ffffffffffffffff").isEmpty) // not a cell
  }

  test("class III / pentagon predicates (golden)") {
    assert(H3.isResClassIII(res13Cell)) // res 13 odd
    assert(H3.isResClassIII(pentagon))  // res 5 odd
    assert(!H3.isResClassIII(H3.toParent(pentagon, 4).get))
    assert(H3.isPentagon(pentagon))
    assert(!H3.isPentagon(res15Cell))
    // a non-center descendant of a pentagon base cell is NOT a pentagon
    val offCenter = H3.toChildren(pentagon, 6).get.filterNot(H3.isPentagon)
    assert(offCenter.nonEmpty && offCenter.forall(c => !H3.isPentagon(c)))
  }

  test("h3_num_hexagons golden") {
    assert(H3.numHexagons(0).contains(122L))
    assert(H3.numHexagons(10).contains(33897029882L))
    assert(H3.numHexagons(16).isEmpty)
  }

  test("edge length / hex area / edge angle constants (golden res 0/1/15)") {
    def close(a: Double, b: Double, rel: Double = 1e-9): Boolean =
      math.abs(a - b) <= rel * math.max(math.abs(a), math.abs(b))
    assert(close(H3.edgeLengthM(0).get, 1281256.010741364))
    assert(close(H3.edgeLengthM(1).get, 483056.839071111))
    assert(close(H3.edgeLengthM(15).get, 0.5841686296))
    assert(close(H3.edgeLengthKm(0).get, 1281.2560107413, 1e-10))
    assert(close(H3.edgeLengthKm(15).get, 0.0005841686296))
    assert(close(H3.hexAreaM2(0).get, 4357449416078.39, 1e-10))
    assert(close(H3.hexAreaM2(1).get, 609788441794.134, 1e-10))
    assert(close(H3.hexAreaM2(15).get, 0.8953115907, 1e-9))
    assert(close(H3.hexAreaKm2(0).get, 4357449.416078383, 1e-12))
    assert(close(H3.hexAreaKm2(15).get, 8.953115907e-7, 1e-9))
    assert(close(H3.edgeAngle(0).get, 11.5225991443, 1e-9))
    assert(close(H3.edgeAngle(10).get, 0.0006822586, 1e-6))
    // tables decrease by ~sqrt(7) per res (sanity for non-golden rows)
    for (r <- 0 to 14) {
      val ratio = H3.edgeLengthM(r).get / H3.edgeLengthM(r + 1).get
      assert(ratio > 2.2 && ratio < 3.2, s"res $r ratio $ratio")
      val aRatio = H3.hexAreaKm2(r).get / H3.hexAreaKm2(r + 1).get
      assert(aRatio > 6.5 && aRatio < 7.5, s"res $r area ratio $aRatio")
    }
  }

  test("grid distance matches the k_ring goldens (37 cells, rings 0-3)") {
    // geo_h3.txt h3_k_ring blocks: ring k of 644325524701193974 = the
    // cells at grid distance exactly k. All share hexagonal base cell
    // 8, the tier gridDistance is defined on.
    val center = 644325524701193974L
    val ring1 = Seq(644325524701193899L, 644325524701193869L, 644325524701193970L,
      644325524701193968L, 644325524701193972L, 644325524701193897L)
    val ring2 = Seq(644325524701193896L, 644325524701193898L, 644325524701193868L,
      644325524701193864L, 644325524701193865L, 644325524701193940L,
      644325524701193971L, 644325524701193969L, 644325524701193973L,
      644325524701193755L, 644325524701193754L, 644325524701193901L)
    val ring3 = Seq(644325524701193900L, 644325524701193902L, 644325524701193861L,
      644325524701193857L, 644325524701193870L, 644325524701193866L,
      644325524701193867L, 644325524701193942L, 644325524701193936L,
      644325524701193941L, 644325524701193926L, 644325524701193924L,
      644325524701193954L, 644325524701193958L, 644325524701193753L,
      644325524701193752L, 644325524701193758L, 644325524701193747L)
    assert(H3.gridDistance(center, center).contains(0))
    for (c <- ring1) assert(H3.gridDistance(center, c).contains(1), s"ring1 $c")
    for (c <- ring2) assert(H3.gridDistance(center, c).contains(2), s"ring2 $c")
    for (c <- ring3) assert(H3.gridDistance(center, c).contains(3), s"ring3 $c")
    // neighbors golden (geo_h3.txt h3_indexes_are_neighbors)
    assert(H3.areNeighbors(644325524701193974L, 644325524701193897L).contains(true))
    assert(H3.areNeighbors(644325524701193974L, 644325529094369568L).contains(false))
    // symmetric
    for (c <- ring1) assert(H3.gridDistance(c, center).contains(1))
    // pentagon bases: only equality and unit adjacency are metrically
    // sound (the deleted wedge folds longer paths) -> 0/1 pass, >=2 None
    assert(H3.gridDistance(pentagon, pentagon).contains(0))
    assert(H3.gridDistance(res15Cell, H3.toCenterChild(pentagon, 15).get).isEmpty)
    assert(H3.gridDistance(res15Cell, res13Cell).isEmpty) // mixed res
  }

  test("k_ring / hex_ring / line traversals (golden spirals)") {
    // h3_k_ring goldens (02_0060_function_geo_h3.test:12,67)
    assert(H3.kRing(644325524701193974L, 1).get == Seq(644325524701193974L,
      644325524701193899L, 644325524701193869L, 644325524701193970L,
      644325524701193968L, 644325524701193972L, 644325524701193897L))
    // the res-5 18-cell hex_ring and the res-15 one (test:324,388)
    assert(H3.hexRing(599686042433355775L, 2).get == Seq(
      599686018811035647L, 599686034917163007L, 599686029548453887L,
      599686032769679359L, 599686198125920255L, 599686040285872127L,
      599686041359613951L, 599686039212130303L, 599686023106002943L,
      599686027400970239L, 599686013442326527L, 599686012368584703L))
    assert(H3.hexRing(644325524701193897L, 3).get == Seq(
      644325524701193744L, 644325524701193746L, 644325524701193889L,
      644325524701193891L, 644325524701193861L, 644325524701193857L,
      644325524701193870L, 644325524701193864L, 644325524701193865L,
      644325524701193940L, 644325524701193971L, 644325524701193969L,
      644325524701193954L, 644325524701193958L, 644325524701193753L,
      644325524701193757L, 644325524701193756L, 644325524701193745L))
    // k_ring = origin ++ each ring's cycle rotated left by one
    val disk3 = H3.kRing(644325524701193897L, 3).get
    assert(disk3.length == 1 + 6 + 12 + 18)
    assert(disk3.distinct.length == disk3.length)
    assert(disk3.head == 644325524701193897L)
    assert(disk3.drop(19).toSet == H3.hexRing(644325524701193897L, 3).get.toSet)
    // every disk cell is at the grid distance its ring claims
    for ((c, idx) <- disk3.zipWithIndex) {
      val expected = if (idx == 0) 0 else if (idx <= 6) 1 else if (idx <= 18) 2 else 3
      assert(H3.gridDistance(644325524701193897L, c).contains(expected), s"disk $c")
    }
    // h3_line goldens (test:313,376) — pentagon-base unit-adjacent pairs
    assert(H3.gridLine(599119489002373119L, 599119491149856767L).get ==
      Seq(599119489002373119L, 599119491149856767L))
    assert(H3.gridLine(599119489002373119L, 599119492223598591L).get ==
      Seq(599119489002373119L, 599119492223598591L))
    // a longer line: consecutive cells are neighbors, endpoints pinned
    val line = H3.gridLine(644325524701193897L, 644325524701193745L).get
    assert(line.head == 644325524701193897L && line.last == 644325524701193745L)
    assert(line.length == H3.gridDistance(644325524701193897L, 644325524701193745L).get + 1)
    for (Seq(a, b) <- line.sliding(2)) assert(H3.areNeighbors(a, b).contains(true))
    // k=0 ring is the cell itself
    assert(H3.kRing(res15Cell, 0).get == Seq(res15Cell))
    assert(H3.hexRing(res15Cell, 0).get == Seq(res15Cell))
  }

  test("directed edge construction / destination / indexes (golden)") {
    // h3_get_unidirectional_edge goldens (test:329,394)
    assert(H3.edgeBetween(644325524701193897L, 644325524701193754L)
      .contains(1581074247194257065L))
    assert(H3.edgeBetween(644325524701193897L, 644325524701193901L)
      .contains(1509016653156329129L))
    // non-adjacent pair -> None
    assert(H3.edgeBetween(644325524701193897L, 644325524701193745L).isEmpty)
    // destination goldens (test:410,460) — incl. the pentagon-base edge
    assert(H3.edgeDestination(1248204388774707199L).contains(599686043507097599L))
    assert(H3.edgeDestination(1319695429381652479L).contains(599119491149856767L))
    // edgeBetween and edgeDestination are inverses over a whole ring
    val center = 644325524701193974L
    for (c <- H3.hexRing(center, 1).get) {
      val e = H3.edgeBetween(center, c).get
      assert(H3.edgeOrigin(e).contains(center))
      assert(H3.edgeDestination(e).contains(c))
    }
  }

  test("directed edge validity / origin / enumeration (golden)") {
    val edge = 1248204388774707199L
    assert(!H3.edgeIsValid(0L))
    assert(H3.edgeIsValid(edge))
    assert(H3.edgeOrigin(edge).contains(599686042433355775L))
    // a cell is not an edge
    assert(!H3.edgeIsValid(res15Cell))
    // golden: the six outgoing edges of 644325524701193754
    val edges = H3.edgesFromCell(644325524701193754L).get
    assert(edges == Seq(1292843871042545178L, 1364901465080473114L,
      1436959059118401050L, 1509016653156328986L, 1581074247194256922L,
      1653131841232184858L))
    assert(edges.forall(H3.edgeIsValid))
    assert(edges.forall(e => H3.edgeOrigin(e).contains(644325524701193754L)))
    // golden: h3_get_unidirectional_edge(644325524701193897, 644325524701193754)
    // => 1581074247194257065 — direction 5 edge of the origin cell
    assert(H3.edgesFromCell(644325524701193897L).get.contains(1581074247194257065L))
    // pentagons have 5 edges (no K axis)
    assert(H3.edgesFromCell(pentagon).get.length == 5)
  }
}
