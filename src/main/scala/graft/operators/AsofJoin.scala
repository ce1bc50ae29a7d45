package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASOF join: for each left row, attach the single right row with the
  * greatest right-time <= left-time among rows sharing the join key.
  *
  * Reference semantics: databend JoinType::{Asof,LeftAsof}
  * (src/query/sql/src/planner/plans/join.rs:71-75), lowered there via
  * range-join machinery. A Spark-first design does NOT need a
  * nested-loop range join: we union both sides, hash-partition by key,
  * sort by time within partitions, and carry the last-seen right
  * payload forward with a running `last(ignoreNulls)` window.
  *
  * Scale: exactly one shuffle (by key) + one sort — same cost shape as
  * a sort-merge join, no row explosion, no broadcast requirement, and
  * skewed keys are handled by AQE like any other window shuffle. This
  * is the plan you want at 100 TB, vs. the O(|L|*|R|) fallback Spark
  * would pick for the equivalent inequality join.
  *
  * Ties: a right row at exactly left-time is eligible (<=). Right rows
  * should be unique per (key, time) — pre-dedup if not, or the match
  * among equal timestamps is unspecified.
  */
object AsofJoin {

  /** @param rightPayload columns of `right` to carry to matched left rows
    *                     (renamed as given in the map).
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[(Column, String)]): DataFrame = {

    val payloadStruct = struct(rightPayload.map { case (c, n) => c.as(n) }: _*)
    val r = right.select(
      rightKey.as("__asof_k"),
      rightTime.as("__asof_t"),
      payloadStruct.as("__asof_payload"),
      lit(0).as("__asof_side"))

    val leftCols = left.columns.map(col).toSeq
    val l = left.select(
      leftCols :+ leftKey.as("__asof_k") :+ leftTime.as("__asof_t") :+
        lit(null).cast(r.schema("__asof_payload").dataType).as("__asof_payload") :+
        lit(1).as("__asof_side"): _*)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time => <= semantics
    val w = Window
      .partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(w))
      .filter(col("__asof_side") === 1)

    val payloadCols = rightPayload.map { case (_, n) => col(s"__asof_match.$n").as(n) }
    matched.select(left.columns.map(col).toSeq ++ payloadCols: _*)
  }
}
