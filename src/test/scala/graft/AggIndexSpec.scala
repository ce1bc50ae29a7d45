package graft

import graft.plans.{AggIndex, AggIndexRule}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Aggregating-index rewrite: a matching aggregate is answered from the
  * pre-materialized summary (plan no longer scans the base relation),
  * and the rewritten results are identical to the unrewritten ones.
  */
class AggIndexSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-aggindex-test")
  private val sf = "/root/testdata/sf0.01"

  test("aggregate over indexed relation is rewritten to the summary") {
    val base = java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target", "tmp"))
    val summaryPath = java.nio.file.Files.createTempDirectory(base, "aggidx").toString
    val src = s"$sf/lineitem.parquet"

    // materialize the index: keys + re-aggregable partials
    spark.read.parquet(src)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_l_quantity"),
        min(col("l_quantity")).as("min_l_quantity"),
        max(col("l_quantity")).as("max_l_quantity"),
        count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(summaryPath)

    val expected = spark.read.parquet(src)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
      .orderBy(col("l_returnflag")).collect()

    AggIndex.register(src, Seq("l_returnflag", "l_linestatus"), summaryPath)
    val rule = new AggIndexRule(spark)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try {
      val q = spark.read.parquet(src)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
          min(col("l_quantity")).as("mn"), max(col("l_quantity")).as("mx"))
        .orderBy(col("l_returnflag"))

      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("sum_l_quantity"),
        s"expected summary scan, got:\n$optimized")
      assert(q.collect().sameElements(expected), "rewritten results must match")

      // a non-matching aggregate (key outside the index) is untouched
      val other = spark.read.parquet(src)
        .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("s"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("sum_l_quantity"))
      // avg is not re-aggregable from these partials: untouched
      val avgQ = spark.read.parquet(src)
        .groupBy(col("l_returnflag")).agg(avg(col("l_quantity")).as("a"))
      assert(!avgQ.queryExecution.optimizedPlan.toString.contains("sum_l_quantity"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      AggIndex.clear()
    }
  }
}
