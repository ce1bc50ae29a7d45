package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Scratch probe: scan counts + timing for the persisted-CTE TPC-DS
  * yoy family (not part of the library surface).
  */
object ProbeCte {

  /** Count parquet file scans that actually execute: descends adaptive
    * wrappers/stages, does NOT descend into InMemoryTableScan (the
    * cached plan ran once when the cache was built — counted once via
    * the first-seen cache) or ReusedExchange.
    */
  def executedScans(plan: SparkPlan, seenCaches: java.util.IdentityHashMap[AnyRef, AnyRef]): Int =
    plan match {
      case a: AdaptiveSparkPlanExec => executedScans(a.executedPlan, seenCaches)
      case s: QueryStageExec        => executedScans(s.plan, seenCaches)
      case _: ReusedExchangeExec    => 0
      case m: InMemoryTableScanExec =>
        val rel = m.relation
        if (seenCaches.containsKey(rel.cacheBuilder)) 0
        else {
          seenCaches.put(rel.cacheBuilder, rel.cacheBuilder)
          executedScans(rel.cachedPlan, seenCaches)
        }
      case p =>
        val self = if (p.nodeName.contains("Scan") && p.toString.contains("parquet")) 1 else 0
        self + p.children.map(executedScans(_, seenCaches)).sum
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession(32, "graft-probe-cte")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("tpcds_q75", "tpcds_q4", "tpcds_q11", "tpcds_q74",
               "tpcds_q23", "tpcds_q24", "tpcds_q64")
    for (n <- names) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val rows = df.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val scans = executedScans(df.queryExecution.executedPlan,
        new java.util.IdentityHashMap[AnyRef, AnyRef]())
      println(f"PROBE $n rows=$rows executed_scans=$scans $secs%.2f s")
    }
    spark.stop()
  }
}
