package graft

/** Scratch probe (not part of the library surface): time one SparkEntry
  * query N times in a single JVM and dump its formatted plan.
  */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("txt_minhash_lsh")
    val n = if (args.length > 1) args(1).toInt else 4
    val spark = GraftSession(32, "graft-probe2")
    val fn = SparkEntry.queries(name)
    for (i <- 0 until n) {
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false)) catch { case _: Throwable => () }
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.queryExecution.executedPlan // force analysis + planning
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROBE2 $name run$i plan=${(t1 - t0) / 1e9}%.3f s exec=${(t2 - t1) / 1e9}%.3f s")
    }
    if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    if (sys.env.contains("SPARK_GRAFT_PROBE_RULES")) {
      val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
      println(dump.split("\n").take(40).mkString("\n"))
    }
    spark.stop()
  }
}
