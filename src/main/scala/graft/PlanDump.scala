package graft

/** Dumps `.explain("formatted")` for named headline queries to
  * plans/<tag>/<query>_<suffix>.txt so plan-shape claims in the
  * optimization notes are checkable without running Spark.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump before tpch_q2 agg_quantiles ..."
  * writes plans/r13/tpch_q2_before.txt etc. SPARK_GRAFT_SF_DIR selects
  * the dataset (default sf0.1, matching Bench).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <suffix> <query> [query...]")
    val suffix = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = new java.io.File(sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r13"))
    outDir.mkdirs()
    val spark = GraftSession(32, "graft-plandump")
    graft.sources.Tpcds.ensure(spark, sfDir)
    graft.sources.ClickBench.ensure(spark, sfDir)
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        // SPARK_GRAFT_PLAN_EXEC=1: execute first (noop sink) and dump
        // the FINALIZED AQE plan — runtime join-strategy decisions
        // (BHJ picked from actual sizes without hints) are invisible
        // in the static dump (round-14)
        val txt = if (sys.env.get("SPARK_GRAFT_PLAN_EXEC").contains("1")) {
          df.collect()
          df.queryExecution.executedPlan.toString
        } else df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.File(outDir, s"${name}_$suffix.txt")
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(txt) finally w.close()
        println(s"plandump: wrote $f")
      } catch { case e: Throwable =>
        System.err.println(s"plandump: $name failed: $e")
      }
    }
    spark.stop()
  }
}
