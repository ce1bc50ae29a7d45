package graft

import graft.functions.{GraftFunctions, TDigest}
import org.scalatest.funsuite.AnyFunSuite

/** t-digest accuracy and mergeability gates. */
class TDigestSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = GraftSession(cpus = 8, appName = "graft-tdigest-test")
    GraftFunctions.register(s)
    s
  }

  test("unit: digest quantiles approximate exact quantiles") {
    val rnd = new scala.util.Random(42)
    val values = Array.fill(50000)(rnd.nextGaussian() * 10 + 100)
    val d = TDigest.addAll(TDigest.empty, values)
    // the greedy k1-ish bound keeps singleton centroids at the tails:
    // O(Compression) total, well under the 50k inputs
    assert(d.means.length <= 6 * TDigest.Compression, s"${d.means.length} centroids")
    val sorted = values.sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val exact = sorted(((values.length - 1) * q).toInt)
      val approx = TDigest.quantile(d, q)
      assert(math.abs(approx - exact) < 1.0,
        s"q=$q exact=$exact approx=$approx")
    }
  }

  test("unit: merge of split digests == digest of the union") {
    val rnd = new scala.util.Random(7)
    val a = Array.fill(20000)(rnd.nextDouble() * 1000)
    val b = Array.fill(20000)(rnd.nextDouble() * 1000)
    val merged = TDigest.compress(TDigest.merge(
      TDigest.addAll(TDigest.empty, a), TDigest.addAll(TDigest.empty, b)))
    val whole = TDigest.addAll(TDigest.empty, a ++ b)
    for (q <- Seq(0.1, 0.5, 0.9)) {
      assert(math.abs(TDigest.quantile(merged, q) - TDigest.quantile(whole, q)) < 10.0)
    }
    assert(merged.n == 40000)
  }

  test("sql: tdigest_agg distributed == percentile within tolerance") {
    Tables(spark, "/root/testdata/sf0.01").registerAll()
    val r = spark.sql(
      """SELECT
        |  tdigest_quantile(tdigest_agg(l_extendedprice), 0.5) AS td_p50,
        |  percentile(l_extendedprice, 0.5) AS ex_p50,
        |  tdigest_quantile(tdigest_agg(l_extendedprice), 0.9) AS td_p90,
        |  percentile(l_extendedprice, 0.9) AS ex_p90
        |FROM lineitem""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1) < 0.02,
      s"p50: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - r.getDouble(3)) / r.getDouble(3) < 0.02,
      s"p90: ${r.getDouble(2)} vs ${r.getDouble(3)}")
  }

  test("sql: _state combinator shape — per-group states re-merge") {
    Tables(spark, "/root/testdata/sf0.01").registerAll()
    val r = spark.sql(
      """WITH daily AS (
        |  SELECT l_linestatus, tdigest_agg(l_extendedprice) AS state
        |  FROM lineitem GROUP BY l_linestatus)
        |SELECT tdigest_quantile(tdigest_merge_agg(state), 0.5) AS p50_merged,
        |  (SELECT percentile(l_extendedprice, 0.5) FROM lineitem) AS p50_exact
        |FROM daily""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) / r.getDouble(1) < 0.03,
      s"merged ${r.getDouble(0)} vs exact ${r.getDouble(1)}")
  }
}
