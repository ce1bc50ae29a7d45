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
    * @param direction "backward" (greatest right-time <= left-time, the
    *                  default) or "forward" (smallest right-time >=
    *                  left-time) — the reference's Asof/LeftAsof pair
    *                  over both inequality directions.
    * @param tolerance optional max |leftTime - rightTime|, in the units
    *                  of the time columns' numeric interpretation
    *                  (seconds for timestamps); matches farther than
    *                  this become NULL (ASOF ... TOLERANCE).
    */
  def leftAsof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[(Column, String)],
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {

    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val payloadStruct = struct(
      (rightPayload.map { case (c, n) => c.as(n) } :+ rightTime.as("__t")): _*)
    // at equal times the right row must be eligible: it sorts before
    // left for backward (last over preceding), after left for forward
    // (first over following)
    val rightOrd = if (direction == "backward") 0 else 1
    val r = right.select(
      rightKey.as("__asof_k"),
      rightTime.as("__asof_t"),
      payloadStruct.as("__asof_payload"),
      lit(rightOrd).as("__asof_side"))

    val leftCols = left.columns.map(col).toSeq
    val l = left.select(
      leftCols :+ leftKey.as("__asof_k") :+ leftTime.as("__asof_t") :+
        lit(null).cast(r.schema("__asof_payload").dataType).as("__asof_payload") :+
        lit(1 - rightOrd).as("__asof_side"): _*)

    val unioned = l.unionByName(r, allowMissingColumns = true)
    val base = Window
      .partitionBy(col("__asof_k"))
      .orderBy(col("__asof_t"), col("__asof_side"))
    val matchExpr =
      if (direction == "backward")
        last(col("__asof_payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      else
        first(col("__asof_payload"), ignoreNulls = true)
          .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))

    val matched = unioned
      .withColumn("__asof_match", matchExpr)
      .filter(col("__asof_side") === (1 - rightOrd))
      .withColumn("__asof_match", tolerance match {
        case None => col("__asof_match")
        case Some(tol) => when(
          abs(col("__asof_t").cast("double") -
            col("__asof_match.__t").cast("double")) <= tol,
          col("__asof_match"))
      })

    val payloadCols = rightPayload.map { case (_, n) => col(s"__asof_match.$n").as(n) }
    matched.select(left.columns.map(col).toSeq ++ payloadCols :+
      col("__asof_match").isNotNull.as("__asof_matched"): _*)
      .withColumnRenamed("__asof_matched", "asof_matched")
  }

  /** Inner ASOF: only left rows that found a match (JoinType::Asof). */
  def innerAsof(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[(Column, String)],
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame =
    leftAsof(left, right, leftKey, rightKey, leftTime, rightTime,
      rightPayload, direction, tolerance)
      .filter(col("asof_matched"))
      .drop("asof_matched")
}
