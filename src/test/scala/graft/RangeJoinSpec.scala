package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Band range join: equals the brute-force result, plans as a hash
  * join (not a nested loop) even with broadcast disabled.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-rangejoin-test")

  test("bucketed band join == brute force, and hash-joins at scale") {
    import spark.implicits._
    val points = (0 until 2000).map(i => (i.toLong, (i * 7919 % 1000).toDouble))
      .toDF("pid", "v")
    val bands = Seq((1L, 0.0, 99.0), (2L, 50.0, 149.0), (3L, 900.0, 999.0),
      (4L, 400.0, 400.0), (5L, 995.0, 1200.0))
      .toDF("band_id", "lo", "hi")

    val got = RangeJoin.bands(points, bands,
        col("v"), col("lo"), col("hi"), bucketWidth = 100.0)
      .select("pid", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val expected = points.crossJoin(bands)
      .filter(col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "band_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == expected)
    assert(got.nonEmpty)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.bands(points, bands,
          col("v"), col("lo"), col("hi"), bucketWidth = 100.0)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"),
        s"band join must hash-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
