package graft

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{...}}. Each query runs
  * once cold then three warm; the minimum (parquet footers & JIT hot)
  * time is reported. Single-sample timings at sf0.1 are dominated by
  * scheduler noise (observed ±2x run-to-run on identical code), so
  * min-of-3 is the smallest sample that makes a real 2x regression
  * distinguishable from jitter.
  *
  * Cross-query hygiene: running ~74 queries x 4 samples in one JVM
  * accumulates cached plans (Dataset.persist registers in the shared
  * cacheManager), broadcast blocks, and heap pressure, which in round 5
  * inflated late-running queries up to 16x vs a clean JVM (tpcds_q75
  * recorded 16.95s vs 1.08s isolated). So:
  *   - before EVERY sample: clear the cacheManager, so a query that
  *     persists an intermediate (the TPC-DS yoy CTEs) pays its real cost
  *     on each sample instead of reusing the previous sample's cache;
  *   - between queries: drop leftover persistent RDDs and run a full GC
  *     so the ContextCleaner can reclaim dead broadcast/shuffle blocks
  *     before the next query's samples start.
  * scripts/bench_spotcheck.sh re-runs the slowest queries in fresh JVMs
  * to verify the in-run numbers are within 30% of isolated truth.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val warmRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession(cpus, "graft-bench")

    // pre-materialize the generated datasets (TPC-DS / ClickBench
    // parquet) so no query's cold sample pays one-time generation —
    // min-of-warm already excludes it, but the driver may run with
    // fewer samples (SPARK_GRAFT_BENCH_RUNS)
    graft.sources.Tpcds.ensure(spark, sfDir)
    graft.sources.ClickBench.ensure(spark, sfDir)

    def clearCaches(): Unit = {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      catch { case _: Throwable => () }
    }

    def fullHygiene(): Unit = {
      clearCaches()
      System.gc() // lets ContextCleaner enqueue dead broadcasts/shuffles
    }

    def time(name: String): Double = {
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        clearCaches()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      if (cold < 0) return -1.0
      val warm = Seq.fill(warmRuns)(once())
      if (warm.exists(_ < 0)) return -1.0
      (cold +: warm).min
    }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val picked = only.fold(SparkEntry.headline)(s => SparkEntry.headline.filter(s))
    val results = picked.map { n => val t = time(n); fullHygiene(); n -> t }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
