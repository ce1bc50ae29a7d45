package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Registry-coverage audit against the reference's own function list
  * (function_list.txt: 120 aliases + the overload dump, 669 distinct
  * names). Every name must resolve in a registered session except the
  * documented h3 gnomonic-projection tier, which needs the icosahedron
  * face/base-cell tables that cannot be reconstructed offline
  * (COVERAGE.md §2.9). A new reference name or a dropped registration
  * fails this gate.
  */
class NameAuditSpec extends AnyFunSuite {

  private val FnList =
    "/root/reference/src/query/functions/tests/it/scalars/testdata/function_list.txt"

  /** the documented out-of-scope set: h3 geo<->cell projection */
  private val KnownGaps = Set(
    "geo_to_h3", "h3_to_geo", "h3_to_geo_boundary", "h3_get_faces",
    "h3_cell_area_m2", "h3_cell_area_rads2",
    "h3_exact_edge_length_m", "h3_exact_edge_length_km",
    "h3_exact_edge_length_rads", "h3_get_unidirectional_edge_boundary")

  test("every reference function name resolves (except the documented h3 projection tier)") {
    assume(new java.io.File(FnList).exists(), "reference checkout not present")
    val spark = GraftSession(cpus = 4, appName = "graft-name-audit")
    graft.functions.GraftFunctions.register(spark)
    val lines = Source.fromFile(FnList).getLines().toSeq
    val names = scala.collection.mutable.LinkedHashSet.empty[String]
    var overloads = false
    for (l <- lines) {
      val t = l.trim
      if (t.startsWith("Functions overloads")) overloads = true
      else if (!overloads && t.contains(" -> ")) names += t.split(" -> ")(0).trim
      else if (overloads) {
        val m = "^\\d+ ([a-z0-9_]+)[ (]".r.findFirstMatchIn(t)
        m.foreach(g => names += g.group(1))
      }
    }
    assert(names.size > 600, s"parse drift: only ${names.size} names extracted")
    val missing = names.toSeq.filter { n =>
      !(try spark.catalog.functionExists(n) catch { case _: Exception => false })
    }.toSet
    assert(missing == KnownGaps,
      s"unexpected registry drift; missing-but-not-documented: ${(missing -- KnownGaps).toSeq.sorted.mkString(",")}; " +
        s"documented-but-now-present: ${(KnownGaps -- missing).toSeq.sorted.mkString(",")}")
  }
}
