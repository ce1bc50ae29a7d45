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

  private def runBucketed(direction: String, tolerance: Option[Double],
      width: Double) = {
    val (left, right) = fixtures
    AsofJoin.leftAsofBucketed(left, right,
        leftKey = col("k"), rightKey = col("rk"),
        leftTime = col("t"), rightTime = col("rt"),
        rightPayload = Seq(col("quote") -> "quote"),
        bucketWidth = width, direction = direction, tolerance = tolerance)
      .select("k", "t", "quote").collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).orNull)).toSet
  }

  test("bucketed matches plain on the fixture for several widths") {
    for (w <- Seq(1.0, 3.0, 7.0, 1000.0);
         d <- Seq("backward", "forward");
         tol <- Seq(None, Some(2.0))) {
      assert(runBucketed(d, tol, w) == run(d, tol),
        s"direction=$d tolerance=$tol width=$w")
    }
  }

  test("bucketed matches plain on a hot-key dataset") {
    import spark.implicits._
    // one hot key with 500 probes + 100 quotes, plus a cold key —
    // the shape the bucketed variant exists for
    def h(s: String, i: Int, m: Int) = math.floorMod(s.hashCode * 31 + i * 2654435761L, m).toInt
    val left = ((0 until 500).map(i => ("HOT", h("lt", i, 10000).toLong)) ++
      (0 until 20).map(i => ("cold", h("lc", i, 10000).toLong))).toDF("k", "t")
    val right = ((0 until 100).map(i => ("HOT", h("rt", i, 10000).toLong, s"q$i")) ++
      (0 until 5).map(i => ("cold", h("rc", i, 10000).toLong, s"c$i")))
      .distinct.toDF("rk", "rt", "quote")
    // unique right (key, time): drop hash collisions
    val rightU = right.groupBy("rk", "rt").agg(max("quote").as("quote"))
    def both(d: String, tol: Option[Double]) = {
      val plain = AsofJoin.leftAsof(left, rightU, col("k"), col("rk"),
        col("t"), col("rt"), Seq(col("quote") -> "quote"), d, tol)
        .select("k", "t", "quote").collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).orNull))
        .groupBy(identity).view.mapValues(_.size).toMap
      val bucketed = AsofJoin.leftAsofBucketed(left, rightU, col("k"), col("rk"),
        col("t"), col("rt"), Seq(col("quote") -> "quote"), 500.0, d, tol)
        .select("k", "t", "quote").collect()
        .map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)).orNull))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(bucketed == plain, s"direction=$d tolerance=$tol")
    }
    both("backward", None)
    both("forward", None)
    both("backward", Some(750.0))
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
