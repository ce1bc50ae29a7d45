package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Gate-shrink guard (round-7 verdict ask #2): the driver's correctness
  * gate is exactly `SparkEntry.queries` ∩ oracles, so a loader
  * regression that throws inside one module could silently remove
  * dozens of entries. The checked-in manifest pins the known-good
  * surface; this spec fails the build if any name disappears or the
  * total ever shrinks below the round-7 declared surface (316).
  */
class QuerySurfaceManifestSpec extends AnyFunSuite {

  private lazy val manifest: Seq[String] = {
    val src = Source.fromResource("query_manifest.txt")
    try src.getLines().map(_.trim).filter(_.nonEmpty).toList
    finally src.close()
  }

  test("query surface never shrinks below the declared floor") {
    assert(SparkEntry.queries.size >= 316,
      s"only ${SparkEntry.queries.size} queries registered")
  }

  test("every manifest query name is present") {
    val have = SparkEntry.queries.keySet
    val missing = manifest.filterNot(have)
    assert(missing.isEmpty, s"gate queries missing: ${missing.mkString(", ")}")
  }

  test("manifest is current: no unlisted queries (regenerate on add)") {
    val listed = manifest.toSet
    val extra = SparkEntry.queries.keySet.diff(listed)
    assert(extra.isEmpty,
      s"new queries not in src/test/resources/query_manifest.txt: ${extra.mkString(", ")}")
  }

  test("events table loads with a TIMESTAMP ts under every shipped encoding") {
    // the round-7 incident: a testdata re-encode of events.ts broke the
    // loader at analysis time and silently darkened 60 gate queries
    val spark = GraftSession(cpus = 2, appName = "graft-manifest-test")
    val ev = Tables(spark, "/root/testdata/sf0.001").events
    assert(ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType)
    assert(ev.limit(1).count() == 1L)
  }
}
