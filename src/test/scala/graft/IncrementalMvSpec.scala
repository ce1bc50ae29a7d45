package graft

import graft.plans.{AggIndex, AggIndexRule}
import graft.sources.{GraftStream, GraftTable}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** End-to-end incremental materialized view: STREAM cursor feeds a
  * summary refresh, the aggregating-index rule serves queries from the
  * summary — the reference's TASK + aggregating-index pipeline
  * (CREATE TASK ... WHEN stream_has_data + agg_index rewrite) composed
  * from this engine's parts. The refresh only ever aggregates the
  * DELTA (the stream's pending changes), which is what makes the MV
  * maintainable at 100 TB.
  */
class IncrementalMvSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-incmv-test")

  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    // absolute: AggIndex path matching compares against the scan's
    // absolute rootPaths
    Files.createTempDirectory(base, "incmv").toAbsolutePath.toString
  }

  test("stream-driven summary refresh keeps the agg-index rewrite fresh") {
    import spark.implicits._
    val basePath = tmp()
    val summaryPath = tmp()

    val table = GraftTable.create(spark, basePath,
      Seq(("a", 10L), ("a", 5L), ("b", 7L)).toDF("k", "v"))
    val feed = GraftStream.create(table, "mv_feed", GraftStream.AppendOnly)

    // initial full materialization
    def partialsOf(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k")).agg(sum(col("v")).as("sum_v"), count(lit(1)).as("cnt"))
    partialsOf(table.read()).write.mode("overwrite").parquet(summaryPath)
    // the summary covers exactly this snapshot's files
    def reindex(): Unit = AggIndex.registerFiles(basePath, Seq("k"), summaryPath,
      table.snapshot(table.currentVersion).files.map(f => s"$basePath/$f"))
    reindex()

    val rule = new AggIndexRule(spark)
    spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ rule
    try {
      def query() = table.read().groupBy(col("k"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .orderBy(col("k"))
      def asTuples(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

      assert(query().queryExecution.optimizedPlan.toString.contains("sum_v"))
      assert(asTuples(query().collect()) == Seq(("a", 15L, 2L), ("b", 7L, 1L)))

      // new data lands; MV is stale until the task runs. The base scan
      // now has a different file set, so queries fall back to the base
      // (fresh truth, no rewrite) instead of serving stale summaries.
      table.append(Seq(("a", 1L), ("c", 100L)).toDF("k", "v"))
      assert(feed.hasData)
      assert(!query().queryExecution.optimizedPlan.toString.contains("sum_v"))
      assert(asTuples(query().collect()) ==
        Seq(("a", 16L, 3L), ("b", 7L, 1L), ("c", 100L, 1L)))

      // the refresh task: aggregate ONLY the delta, merge partials
      feed.consume { delta =>
        val deltaPartials = partialsOf(delta.select(col("k"), col("v")))
        val merged = spark.read.parquet(summaryPath).union(deltaPartials)
          .groupBy(col("k"))
          .agg(sum(col("sum_v")).as("sum_v"), sum(col("cnt")).as("cnt"))
        val tmpOut = tmp()
        merged.write.mode("overwrite").parquet(tmpOut)
        spark.read.parquet(tmpOut).write.mode("overwrite").parquet(summaryPath)
      }
      assert(!feed.hasData) // cursor advanced — exactly-once refresh
      reindex()             // summary now covers the new snapshot

      // queries rewrite to the summary again AND see the new data
      assert(query().queryExecution.optimizedPlan.toString.contains("sum_v"))
      assert(asTuples(query().collect()) ==
        Seq(("a", 16L, 3L), ("b", 7L, 1L), ("c", 100L, 1L)))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq rule)
      AggIndex.clear()
    }
  }
}
