package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ASOF join family semantics: backward/forward, tolerance, inner. */
class AsofSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-asof-test")

  private def fixtures = {
    import spark.implicits._
    // left probes at t = 5, 10, 20 for key A; one keyless-match probe B
    val left = Seq(("A", 5L), ("A", 10L), ("A", 20L), ("B", 10L))
      .toDF("k", "t")
    // right quotes for A at t = 4, 10, 30
    val right = Seq(("A", 4L, "q4"), ("A", 10L, "q10"), ("A", 30L, "q30"))
      .toDF("rk", "rt", "quote")
    (left, right)
  }

  private def run(direction: String, tolerance: Option[Double]) = {
    val (left, right) = fixtures
    AsofJoin.leftAsof(left, right,
        leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightPayload = Seq(col("quote") -> "quote"),
        direction = direction, tolerance = tolerance)
      .select("k", "t", "quote").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).orNull)).toSet
  }

  test("backward: greatest right time <= left time; equal time matches") {
    assert(run("backward", None) == Set(
      ("A", 5L, "q4"), ("A", 10L, "q10"), ("A", 20L, "q10"), ("B", 10L, null)))
  }

  test("forward: smallest right time >= left time; equal time matches") {
    assert(run("forward", None) == Set(
      ("A", 5L, "q10"), ("A", 10L, "q10"), ("A", 20L, "q30"), ("B", 10L, null)))
  }

  test("tolerance nulls matches beyond the bound") {
    // backward with tolerance 2: probe 20 -> q10 is 10 away -> null
    assert(run("backward", Some(2.0)) == Set(
      ("A", 5L, "q4"), ("A", 10L, "q10"), ("A", 20L, null), ("B", 10L, null)))
  }

  test("inner asof keeps only matched rows") {
    val (left, right) = fixtures
    val out = AsofJoin.innerAsof(left, right,
        leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightPayload = Seq(col("quote") -> "quote"))
      .select("k", "t", "quote").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(out == Set(("A", 5L, "q4"), ("A", 10L, "q10"), ("A", 20L, "q10")))
  }
}
