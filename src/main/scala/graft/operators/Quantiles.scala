package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles (SQL `percentile_cont` semantics —
  * reference: quantile_cont, src/query/functions/src/aggregates/
  * aggregate_quantile_cont.rs) as a distributed sort, not a per-group
  * value map.
  *
  * Spark's built-in `percentile` collects an OpenHashMap of
  * value→count per group and merges those maps single-threaded on the
  * final reducer — for a high-cardinality double column that map IS the
  * column, so the merge cost dwarfs the scan. This operator instead:
  *
  *  1. `groupBy(keys :+ value).count()` — shuffle with map-side
  *     combine; duplicate values compress to (value, weight).
  *  2. range-partition the distinct (group, value) rows, compute a
  *     partition-local running weight per (partition, group) slice, and
  *     add per-slice prefix offsets from a tiny (partition, group)
  *     totals table — a classic two-pass distributed cumulative sum.
  *     No task ever sorts more than one RANGE SLICE of a group, so a
  *     hot group (even one group = the whole table) spreads across all
  *     shuffle partitions instead of landing in one task.
  *  3. filter to ≤ 2·|qs| bracketing rows per group, then a tiny final
  *     aggregate applies linear interpolation.
  *
  * The only wide state is the sorted distinct column — the same floor
  * any exact-quantile algorithm pays — and it is range-spread. For
  * columns too hot even for that the approximate path is
  * `functions.TDigest` — mergeable, bounded state.
  */
object Quantiles {

  /** Per-group exact interpolated quantiles.
    *
    * @param df        input
    * @param groupCols grouping keys (may be empty for a global quantile)
    * @param valueCol  numeric column (nulls skipped, like percentile_cont)
    * @param qs        quantile fractions in [0,1]
    * @param outNames  one output column name per q
    * @param smallGroupDomain caller-asserted bound on the group-key
    *   cardinality: when true (default) the slice-offsets side
    *   (≤ #partitions + #groups rows) is broadcast-hinted so a missing
    *   size estimate can never demote the join to a sort-merge that
    *   re-shuffles the wide side (round-13, guide §3.1). A HARD hint
    *   bypasses autoBroadcastJoinThreshold, so with an UNBOUNDED group
    *   domain (millions of groups) it can OOM the driver — pass false
    *   there and let AQE pick the strategy from the runtime size
    *   (round-13 advisory).
    */
  def cont(df: DataFrame, groupCols: Seq[String], valueCol: String,
           qs: Seq[Double], outNames: Seq[String],
           smallGroupDomain: Boolean = true): DataFrame = {
    require(qs.nonEmpty && qs.length == outNames.length)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")

    val weighted = df.filter(col(valueCol).isNotNull)
      .groupBy((g :+ v.as(valueCol)): _*)
      .agg(count(lit(1)).as("__w"))

    // -- two-pass distributed cumulative weight --------------------------
    // Range partitioning on (group, value) keeps each group's values
    // globally ordered across partitions while spreading a hot group
    // over many partitions (equal keys always co-locate, and `weighted`
    // rows are distinct per (group, value), so ranges cut cleanly).
    val parts = math.max(df.sparkSession.sessionState.conf.numShufflePartitions, 2)
    val ranged = weighted
      .repartitionByRange(parts, (g :+ col(valueCol)): _*)
      .withColumn("__pid", spark_partition_id())

    // pass 1: running weight within each (partition, group) slice —
    // parallelism is the number of range partitions, not groups
    val pidG: Seq[Column] = col("__pid") +: g
    val sliceW = Window.partitionBy(pidG: _*).orderBy(col(valueCol))
    val local = ranged.withColumn("__lcum", sum(col("__w")).over(sliceW))

    // pass 2: per-slice totals (≤ #groups + #partitions rows) give each
    // slice its prefix offset and each group its total weight
    val totals = ranged.groupBy(pidG: _*).agg(sum(col("__w")).as("__pt"))
    val offW =
      (if (groupCols.isEmpty) Window.orderBy(col("__pid"))
       else Window.partitionBy(g: _*).orderBy(col("__pid")))
        .rowsBetween(Window.unboundedPreceding, -1)
    val totW =
      (if (groupCols.isEmpty) Window.partitionBy()
       else Window.partitionBy(g: _*))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = totals
      .withColumn("__off", coalesce(sum(col("__pt")).over(offW), lit(0L)))
      .withColumn("__n", sum(col("__pt")).over(totW))
      .drop("__pt")

    // row covers 0-indexed positions [cum - w, cum - 1]. offsets is
    // slice-count-sized (≤ #partitions + #groups rows), never
    // data-sized: broadcast it explicitly (when the caller bounds the
    // group domain) so a missing size estimate can never demote this to
    // a sort-merge join that would re-shuffle the wide side (round-13,
    // guide §3.1; hint gated per the round-13 advisory — see scaladoc)
    val offsetsSide = if (smallGroupDomain) broadcast(offsets) else offsets
    val ranked = local
      .join(offsetsSide, "__pid" +: groupCols)
      .withColumn("__cum", col("__lcum") + col("__off"))

    def pos(q: Double): Column = (col("__n") - 1) * q
    def covers(target: Column): Column =
      target >= col("__cum") - col("__w") && target < col("__cum")

    val keep = qs.map(q => covers(floor(pos(q))) || covers(ceil(pos(q)))).reduce(_ || _)

    val aggs = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        min(when(covers(floor(pos(q))), col(valueCol))).as(s"__lo_$i"),
        min(when(covers(ceil(pos(q))), col(valueCol))).as(s"__hi_$i"),
        max(pos(q) - floor(pos(q))).as(s"__frac_$i"))
    }
    val brackets =
      if (groupCols.isEmpty) ranked.filter(keep).agg(aggs.head, aggs.tail: _*)
      else ranked.filter(keep).groupBy(g: _*).agg(aggs.head, aggs.tail: _*)

    val outs = qs.indices.map { i =>
      (col(s"__lo_$i") * (lit(1.0) - col(s"__frac_$i")) +
        col(s"__hi_$i") * col(s"__frac_$i")).as(outNames(i))
    }
    brackets.select(g ++ outs: _*)
  }
}
