package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every registered query runs end-to-end on sf0.001.
  * Value-level correctness is the DuckDB oracle gate (scripts/check.py /
  * the driver's CORRECTNESS_r{N}.json); this suite catches plan-time and
  * runtime regressions fast.
  */
class SmokeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-test")
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, q) <- SparkEntry.all.toSeq.sortBy(_._1)) {
    test(s"query $name runs") {
      val df = q.fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.write.format("noop").mode("overwrite").save()
    }
  }
}
