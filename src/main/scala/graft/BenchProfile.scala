package graft

/** Plan-vs-execute profiler for headline queries: isolates driver-side
  * cost (DataFrame construction + analysis + optimization + physical
  * planning) from cluster execution, so a regression can be attributed
  * to the right layer. Usage:
  *   sbt "runMain graft.BenchProfile tpch_q2 agg_basic ..."
  * (no args = a representative sample). SPARK_GRAFT_SF_DIR selects the
  * dataset (default sf0.1, matching Bench).
  */
object BenchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession(32, "graft-bench-profile")
    graft.sources.Tpcds.ensure(spark, sfDir)
    graft.sources.ClickBench.ensure(spark, sfDir)
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("tpch_q2", "tpch_q11", "tpch_q6", "agg_basic", "tpch_q9",
        "tpcds_q23", "txt_dedup_exact", "evt_window_funnel")
    def clearCaches(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      for (i <- 1 to 3) {
        clearCaches()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // analysis + optimize + planning
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        println(f"PROFILE $name%-20s run$i build=${(t1 - t0) / 1e9}%7.3f " +
          f"plan=${(t2 - t1) / 1e9}%7.3f exec=${(t3 - t2) / 1e9}%7.3f " +
          f"total=${(t3 - t0) / 1e9}%7.3f")
      }
      System.gc()
    }
    spark.stop()
  }
}
