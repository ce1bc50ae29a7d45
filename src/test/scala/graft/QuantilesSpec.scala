package graft

import graft.operators.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact interpolated quantiles (operators.Quantiles) vs a reference
  * in-memory percentile_cont implementation — including duplicate-heavy
  * columns (which the operator compresses to weights), empty-q edges,
  * nulls, and the global (no-group) form.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-quantiles-test")

  /** reference percentile_cont (linear interpolation, 0-indexed ranks) */
  private def ref(sorted: Array[Double], q: Double): Double = {
    val p = (sorted.length - 1) * q
    val lo = math.floor(p).toInt
    val hi = math.ceil(p).toInt
    sorted(lo) + (sorted(hi) - sorted(lo)) * (p - lo)
  }

  test("grouped quantiles match reference on duplicate-heavy data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      val g = i % 3
      // group 0: heavy duplicates; others: near-distinct
      val v = if (g == 0) (rnd.nextInt(10)).toDouble else rnd.nextDouble() * 1000
      (s"g$g", v)
    }
    val df = rows.toDF("grp", "v").repartition(8)
    val qs = Seq(0.25, 0.5, 0.9, 0.99)
    val got = Quantiles.cont(df, Seq("grp"), "v", qs, qs.map(q => s"q$q"))
      .collect()
      .map(r => r.getString(0) -> qs.indices.map(i => r.getDouble(i + 1)).toArray)
      .toMap
    val byGroup = rows.groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted.toArray }
    for ((g, sorted) <- byGroup; (q, i) <- qs.zipWithIndex) {
      assert(math.abs(got(g)(i) - ref(sorted, q)) < 1e-9, s"group $g q=$q")
    }
  }

  test("global quantile (no groups), nulls skipped, q=0 and q=1 exact") {
    import spark.implicits._
    val df = Seq[java.lang.Double](5.0, null, 1.0, 3.0, null, 9.0, 7.0)
      .toDF("v")
    val out = Quantiles.cont(df, Nil, "v", Seq(0.0, 0.5, 1.0), Seq("mn", "med", "mx"))
      .collect()(0)
    assert(out.getDouble(0) == 1.0)
    assert(out.getDouble(1) == 5.0)
    assert(out.getDouble(2) == 9.0)
  }

  test("hot group spreads across range partitions (no single-task sort)") {
    import spark.implicits._
    // 1 group x 1e6 distinct values: the old per-group window sort put
    // all of this in ONE task; the range-partitioned two-pass must not
    val df = spark.range(1000000)
      .select(lit("hot").as("grp"), (col("id") * 7 % 1000003).cast("double").as("v"))
    val out = Quantiles.cont(df, Seq("grp"), "v", Seq(0.5), Seq("med"))
    // plan proof: the running-sum window is keyed by (__pid, grp), so a
    // single group's sort is spread over the range partitions
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"), "expected partition-local cumulative pass in plan")
    // value proof against the closed form: v = (id*7) % 1000003 over
    // id < 1e6 hits 1e6 distinct values; median = interpolated middle
    val sorted = (0L until 1000000L).map(i => (i * 7 % 1000003).toDouble).sorted.toArray
    val got = out.collect()(0).getDouble(1)
    assert(math.abs(got - ref(sorted, 0.5)) < 1e-9, s"got $got")
  }

  test("single-value group: all quantiles equal that value") {
    import spark.implicits._
    val df = Seq(("a", 42.0)).toDF("grp", "v")
    val out = Quantiles.cont(df, Seq("grp"), "v", Seq(0.1, 0.9), Seq("a1", "a9")).collect()(0)
    assert(out.getDouble(1) == 42.0 && out.getDouble(2) == 42.0)
  }
}
