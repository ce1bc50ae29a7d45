package graft

import graft.functions.Geo
import graft.operators.GeoJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Geo functions + grid-cell spatial radius join (SURVEY §2.4 spatial
  * join, §2.9 geo family).
  */
class GeoSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-geo-test")

  test("geohash round-trips well-known values") {
    // canonical example: Jutland lighthouse
    assert(Geo.geohashEncodeImpl(10.40744, 57.64911, 11) == "u4pruydqqvj")
    assert(Geo.geohashEncodeImpl(-5.6, 42.6, 5) == "ezs42")
    val (lo, la) = Geo.geohashDecodeImpl("u4pruydqqvj")
    assert(math.abs(lo - 10.40744) < 1e-4 && math.abs(la - 57.64911) < 1e-4)
  }

  test("great_circle_distance matches a known distance") {
    import spark.implicits._
    // Paris -> Berlin ~ 878 km (sphere model)
    val d = Seq((1)).toDF("x")
      .select(Geo.greatCircleDistance(lit(2.35), lit(48.85), lit(13.40), lit(52.52)).as("d"))
      .collect()(0).getDouble(0)
    assert(math.abs(d / 1000.0 - 878) < 5, s"got ${d / 1000.0} km")
  }

  test("SQL names registered: great_circle_distance / geohash_encode") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT round(great_circle_distance(2.35, 48.85, 13.40, 52.52) / 1000, 0) AS km,
        |  geohash_encode(10.40744, 57.64911) AS gh,
        |  round(great_circle_angle(0.0, 0.0, 0.0, 90.0), 3) AS a""".stripMargin)
      .collect()(0)
    assert(math.abs(r.getDouble(0) - 878.0) <= 2)
    assert(r.getString(1).startsWith("u4pruyd"))
    assert(math.abs(r.getDouble(2) - 90.0) < 0.001)
  }

  test("grid radius join == brute-force cross join, at varied latitudes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // clusters at low, mid, and high (80°) latitude to stress the
    // per-row longitude-reach expansion
    def pts(n: Int, baseLat: Double) = (1 to n).map { i =>
      (i.toLong, baseLat + rnd.nextDouble() * 8 - 4, rnd.nextDouble() * 340 - 170)
    }
    val left = (pts(120, 0) ++ pts(120, 45).map(p => (p._1 + 1000, p._2, p._3)) ++
      pts(120, 80).map(p => (p._1 + 2000, p._2, p._3))).toDF("id", "lat", "lon")
    val right = (pts(40, 0).map(p => (p._1 + 5000, p._2, p._3)) ++
      pts(40, 46).map(p => (p._1 + 6000, p._2, p._3)) ++
      pts(40, 81).map(p => (p._1 + 7000, p._2, p._3))).toDF("id2", "lat2", "lon2")

    val radius = 400000.0
    val grid = GeoJoin.radiusJoin(left, col("lon"), col("lat"),
        right, col("lon2"), col("lat2"), radius)
      .select(col("id"), col("id2")).as[(Long, Long)].collect().toSet

    val brute = left.crossJoin(right)
      .withColumn("d", Geo.greatCircleDistance(col("lon"), col("lat"), col("lon2"), col("lat2")))
      .filter(col("d") <= radius)
      .select(col("id"), col("id2")).as[(Long, Long)].collect().toSet

    assert(grid == brute,
      s"missing=${(brute -- grid).take(5)} extra=${(grid -- brute).take(5)}")
    assert(brute.nonEmpty) // the test actually exercised matches
  }

  test("radius join plan has no cartesian/nested-loop join") {
    import spark.implicits._
    val a = Seq((1L, 10.0, 10.0)).toDF("id", "lat", "lon")
    val b = Seq((2L, 10.1, 10.1)).toDF("id2", "lat2", "lon2")
    val plan = GeoJoin.radiusJoin(a, col("lon"), col("lat"),
      b, col("lon2"), col("lat2"), 50000.0).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}
