package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the properties that decide whether these
  * queries survive a 100x scale-up — filter/column pushdown into the
  * parquet scans, broadcast of small dimensions, fused top-n, and
  * window-group-limit pushdown. Catching a plan regression here is
  * cheaper than catching it in the benchmark.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-plan-test")
  private val sf = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.all(name).fn(spark, sf).queryExecution.executedPlan.toString

  test("tpch_q6 pushes filters and prunes columns at the parquet scan") {
    val plan = planOf("tpch_q6")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    assert(plan.contains("l_shipdate"), "shipdate filter should reach the scan")
    // projection pruning: the scan must not read l_returnflag etc.
    assert(!plan.contains("l_returnflag"), "scan should prune unused columns")
  }

  test("txt_minhash_lsh: signatures materialized once, no HOF filter in the scan") {
    // round-8 regression gates: (a) InferFiltersFromGenerate must not
    // push the interpreted shingle expression into the parquet scan;
    // (b) the banded signature frame is checkpointed, so the join plan
    // reads ExistingRDD scans — the shingle/minhash pipeline cannot be
    // replayed per join side
    val df = SparkEntry.all("txt_minhash_lsh").fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("DataFilters: [(size(array_distinct"),
      "interpreted shingle filter pushed into the scan")
    assert(!plan.contains("FileScan"),
      "join must read the checkpointed signature frame, not re-scan documents")
    assert(plan.contains("ExistingRDD"), s"expected checkpoint scans:\n${plan.take(800)}")
  }

  test("hive-style partitioned dirs prune partitions at the scan") {
    // external hive-layout tables are Spark-native partition discovery;
    // the property that matters at 100 TB is that a partition predicate
    // becomes a PartitionFilter (dirs skipped), not a post-scan Filter
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val base = Paths.get("target", "plan_spec")
    Files.createDirectories(base)
    val dir = Files.createTempDirectory(base, "hive").toString
    try {
      Seq((1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (3L, "2024-01-03", 3.0))
        .toDF("id", "ds", "v").write.mode("overwrite").partitionBy("ds").parquet(dir)
      val df = spark.read.parquet(dir).filter(col("ds") === "2024-01-02")
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: ["), s"no partition filters:\n$plan")
      assert(plan.contains("ds"), s"ds should be a partition filter:\n$plan")
      assert(df.collect().map(_.getLong(0)).toSeq == Seq(2L))
    } finally {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(dir)).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    }
  }

  test("tpch_q5 broadcasts the small dimensions") {
    val plan = planOf("tpch_q5")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"region/nation should broadcast:\n$plan")
  }

  test("tpch_q3 top-n is fused (TakeOrderedAndProject)") {
    val plan = planOf("tpch_q3")
    assert(plan.contains("TakeOrderedAndProject"), s"expected fused top-n:\n$plan")
  }

  test("win_topn_per_group uses WindowGroupLimit pushdown") {
    val plan = planOf("win_topn_per_group")
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
  }

  test("join_asof plans a single shuffle, not a nested-loop join") {
    val plan = planOf("join_asof")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof must not fall back to nested-loop:\n$plan")
    assert(plan.contains("Window"), "asof rewrite should use a running window")
  }

  test("agg queries keep whole-stage codegen in the hot path") {
    val df = SparkEntry.all("tpch_q1").fn(spark, sf)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"), s"expected codegen spans:\n$plan")
  }

  test("semi/anti subqueries become hash joins") {
    val plan = planOf("join_semi")
    assert(plan.contains("LeftSemi"), s"expected semi join:\n$plan")
    val plan2 = planOf("join_anti")
    assert(plan2.contains("LeftAnti"), s"expected anti join:\n$plan2")
  }

  test("tpch_q2 min-per-part is a window, not an aggregate self-join") {
    val plan = planOf("tpch_q2")
    assert(plan.contains("Window"), s"expected window min:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    // one shuffle for the derived partsupp agg; the min-per-part must
    // not add an agg + re-join of the same subtree
    assert(!plan.contains("SortMergeJoin") ||
      plan.split("SortMergeJoin").length <= 2,
      s"min-per-part should not self-join:\n$plan")
  }

  test("tpch_q20 semi joins pick hash strategies under AQE, no forced broadcast") {
    // round-14: the r13 forced broadcast() hints on the SF-scaling
    // widget-parts and excess sides are gone (a hard hint bypasses the
    // size check and OOMs at large SF). The property that must hold
    // instead: AQE's runtime size check still picks hash joins — the
    // FINAL plan may not fall back to a sort-merge of supplier vs the
    // tiny excess set. Execute first: the no-hint strategy decision is
    // made at runtime, so only the finalized plan is meaningful.
    val df = SparkEntry.all("tpch_q20").fn(spark, sf)
    df.collect() // finalize AQE on df's own queryExecution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), s"AQE plan not finalized:\n${plan.take(300)}")
    // the dump appends the pre-AQE "== Initial Plan ==" (where SMJ is
    // expected without hints) — assert on the Final Plan section only
    val finalSection = plan.split("== Initial Plan ==").head
    assert(!finalSection.contains("SortMergeJoin"),
      s"q20 semi joins degraded to sort-merge:\n$finalSection")
  }

  test("tpch_q11 threshold is a broadcast, not a shuffled join") {
    val plan = planOf("tpch_q11")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"scalar threshold should broadcast:\n$plan")
  }

  test("hits_first_last keeps min_by/max_by in one aggregate") {
    val plan = planOf("hits_first_last")
    // one partial + one final hash aggregate pair, no join, no window
    assert(!plan.contains("Join") && !plan.contains("Window"),
      s"argmin/argmax must be a plain aggregate:\n$plan")
  }

  test("events scans prune to the referenced columns only") {
    val plan = planOf("hits_top_users")
    assert(!plan.contains("props"), s"props must be pruned:\n$plan")
    assert(!plan.contains("event_type"), s"event_type must be pruned:\n$plan")
  }

  test("hits_latest_rows raw fetch is a fused top-n, not a global sort") {
    val plan = planOf("hits_latest_rows")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("hits_pagination offset+limit stays fused with the ordering") {
    val plan = planOf("hits_pagination")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("agg_quantiles avoids the single-reducer percentile value map") {
    // the sort-based operator plans window sorts, never the built-in
    // `percentile` aggregate whose map merge concentrates on one task
    val plan = planOf("agg_quantiles")
    assert(!plan.contains("percentile"), plan)
    assert(plan.contains("Window"), plan)
    // round-13: the slice-offsets join must stay a broadcast — a
    // sort-merge fallback would re-shuffle the full distinct-value
    // frame on (__pid, group)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // round-13: ONE tagged quantile pass — a single stack() generator
    // feeds both measures, so lineitem is scanned once, not per-column
    assert(plan.contains("Generate stack"), plan)
  }

  test("geo_radius_join is an equi-join on grid cells, no NLJ") {
    val plan = planOf("geo_radius_join")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("ClickBench point-filter queries push predicates into the scan") {
    // cb_q36: CounterID/EventDate/flag equality filters must reach the
    // parquet reader — at 100 TB this is the difference between a
    // row-group-pruned scan and a full-table read
    val plan = planOf("cb_q36")
    assert(plan.contains("PushedFilters: ["), s"no pushed filters:\n$plan")
    assert(plan.contains("CounterID"), "CounterID filter should reach the scan")
    val top = planOf("cb_q12")
    assert(top.contains("TakeOrderedAndProject"), s"top-n should fuse:\n$top")
  }

  test("TPC-DS star joins broadcast the dimension side") {
    // q3: date_dim + item are small dims over the store_sales fact
    val plan = planOf("tpcds_q3")
    assert(plan.contains("BroadcastHashJoin"), s"dims should broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("hits_top_props reads the virtual column, never parses props") {
    // the ingested events table declares $.k as a virtual column: the
    // optimizer must rewrite get_json_object to the stored column and
    // prune the fat JSON string from the scan entirely
    val df = SparkEntry.all("hits_top_props").fn(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(!opt.contains("get_json_object"), s"JSON parsed in the plan:\n$opt")
    assert(opt.contains("__virt_props_"), s"virtual column not used:\n$opt")
    val executed = df.queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]+".r.findFirstIn(executed).getOrElse("")
    assert(!readSchema.contains("props,") && !readSchema.contains("props:"),
      s"props still scanned: $readSchema")
  }

  test("TPC-DS yoy self-joined CTEs are persisted, not recomputed") {
    // the year-over-year family references its WITH CTE 2-6x; Catalyst
    // inlines WITH, so without the qPersist cache q75's executed plan
    // had 24 parquet scans and q4 had 18 (round-5 audit). With the CTE
    // persisted each base-table is scanned once: q75 <= 12, q4 <= 6.
    // At 100 TB every extra reference is a full re-read of three sales
    // channels, so this shape IS the scale property.
    def scansOf(name: String): Int = {
      spark.catalog.clearCache()
      val df = SparkEntry.all(name).fn(spark, sf)
      df.count() // finalize AQE so cache substitution is in the plan
      ProbeCte.executedScans(df.queryExecution.executedPlan,
        new java.util.IdentityHashMap[AnyRef, AnyRef]())
    }
    val q75 = scansOf("tpcds_q75")
    assert(q75 <= 12, s"tpcds_q75 executed $q75 parquet scans (want <= 12)")
    val q4 = scansOf("tpcds_q4")
    assert(q4 <= 6, s"tpcds_q4 executed $q4 parquet scans (want <= 6)")
    val q74 = scansOf("tpcds_q74")
    assert(q74 <= 5, s"tpcds_q74 executed $q74 parquet scans (want <= 5)")
    spark.catalog.clearCache()
  }
}
