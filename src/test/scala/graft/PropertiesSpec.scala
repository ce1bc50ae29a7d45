package graft

import graft.functions.{Geo, TDigest}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property tests (SURVEY §5 test plan: expression
  * properties). Pure-JVM kernels get many cases; Spark-backed
  * properties get a few (each case is a distributed job).
  */
class PropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, cases: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  // ---- geohash: encode/decode round-trip stays inside the cell -------
  test("geohash decode(encode(p)) is within cell resolution") {
    val gen = for {
      lon <- Gen.chooseNum(-179.99, 179.99)
      lat <- Gen.chooseNum(-89.99, 89.99)
    } yield (lon, lat)
    check(Prop.forAll(gen) { case (lon, lat) =>
      val (lo, la) = Geo.geohashDecodeImpl(Geo.geohashEncodeImpl(lon, lat, 9))
      // precision 9 cell: ~4.8e-5 deg lon, ~2.4e-5 deg lat
      math.abs(lo - lon) < 1e-3 && math.abs(la - lat) < 1e-3
    })
  }

  // ---- t-digest: quantiles within rank tolerance of exact ------------
  test("tdigest quantile error bounded on random data") {
    val gen = for {
      n <- Gen.chooseNum(100, 3000)
      seed <- Gen.chooseNum(0L, 1000L)
    } yield (n, seed)
    check(Prop.forAll(gen) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val xs = Array.fill(n)(rnd.nextDouble() * 1000)
      val d = TDigest.addAll(TDigest.empty, xs)
      val sorted = xs.sorted
      Seq(0.1, 0.5, 0.9).forall { q =>
        val est = TDigest.quantile(d, q)
        // rank of the estimate must be within 5% of target rank
        val rank = sorted.count(_ <= est).toDouble / n
        math.abs(rank - q) < 0.05
      }
    }, cases = 30)
  }

  // ---- t-digest: merge == bulk (same data, any split) ----------------
  test("tdigest merge of splits approximates bulk digest") {
    val gen = for {
      n <- Gen.chooseNum(200, 2000)
      cut <- Gen.chooseNum(1, 99)
      seed <- Gen.chooseNum(0L, 500L)
    } yield (n, cut, seed)
    check(Prop.forAll(gen) { case (n, cut, seed) =>
      val rnd = new scala.util.Random(seed)
      val xs = Array.fill(n)(rnd.nextDouble() * 100)
      val k = math.max(1, n * cut / 100)
      val (a, b) = xs.splitAt(k)
      val merged = TDigest.compress(TDigest.merge(
        TDigest.addAll(TDigest.empty, a), TDigest.addAll(TDigest.empty, b)))
      val bulk = TDigest.addAll(TDigest.empty, xs)
      Seq(0.25, 0.5, 0.75).forall { q =>
        val d1 = TDigest.quantile(merged, q)
        val d2 = TDigest.quantile(bulk, q)
        math.abs(d1 - d2) <= 10.0 // both within coarse agreement band
      }
    }, cases = 30)
  }

  // ---- haversine: symmetry, identity, positivity ---------------------
  test("great-circle distance is symmetric, zero on identity, bounded") {
    val spark = GraftSession(cpus = 4, appName = "graft-props-test")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val pts = (1 to 200).map(_ =>
      (rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90,
        rnd.nextDouble() * 360 - 180, rnd.nextDouble() * 180 - 90))
    val df = pts.toDF("lon1", "lat1", "lon2", "lat2")
      .select(
        Geo.greatCircleDistance(col("lon1"), col("lat1"), col("lon2"), col("lat2")).as("ab"),
        Geo.greatCircleDistance(col("lon2"), col("lat2"), col("lon1"), col("lat1")).as("ba"),
        Geo.greatCircleDistance(col("lon1"), col("lat1"), col("lon1"), col("lat1")).as("aa"))
    val rows = df.collect()
    val halfCirc = math.Pi * Geo.EarthRadius
    assert(rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
    assert(rows.forall(_.getDouble(2) == 0.0))
    assert(rows.forall(r => r.getDouble(0) >= 0 && r.getDouble(0) <= halfCirc + 1))
  }

  // ---- deterministic sampling: invariant under repartitioning --------
  test("hashSample membership is independent of partitioning") {
    val spark = GraftSession(cpus = 4, appName = "graft-props-test")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 5000).toDF("k")
    def ids(parts: Int) = graft.operators.Sampling
      .hashSample(df.repartition(parts), col("k"), 0.3)
      .select("k").collect().map(_.getInt(0)).toSet
    val a = ids(2)
    assert(a == ids(13))
    // fraction lands in a loose band around 30%
    assert(a.size > 1000 && a.size < 2000, s"got ${a.size}")
  }
}
