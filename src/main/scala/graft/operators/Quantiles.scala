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
  *  2. one window sort per group over DISTINCT values — cumulative
  *     weight locates the two rows bracketing each target rank.
  *  3. filter to ≤ 2·|qs| bracketing rows per group, then a tiny final
  *     aggregate applies linear interpolation.
  *
  * Nothing ever concentrates more than one group's distinct values in
  * one task, and the only wide state is the sorted distinct column —
  * the same floor any exact-quantile algorithm pays. For groups too hot
  * even for that (one group = most of 100 TB), the approximate path is
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
    */
  def cont(df: DataFrame, groupCols: Seq[String], valueCol: String,
           qs: Seq[Double], outNames: Seq[String]): DataFrame = {
    require(qs.nonEmpty && qs.length == outNames.length)
    val g = groupCols.map(col)
    val v = col(valueCol).cast("double")

    val weighted = df.filter(col(valueCol).isNotNull)
      .groupBy((g :+ v.as(valueCol)): _*)
      .agg(count(lit(1)).as("__w"))

    val sortW =
      if (groupCols.isEmpty) Window.orderBy(col(valueCol))
      else Window.partitionBy(g: _*).orderBy(col(valueCol))
    val allW =
      (if (groupCols.isEmpty) Window.partitionBy()
       else Window.partitionBy(g: _*))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    // row covers 0-indexed positions [cum - w, cum - 1]
    val ranked = weighted
      .withColumn("__cum", sum(col("__w")).over(sortW))
      .withColumn("__n", sum(col("__w")).over(allW))

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
