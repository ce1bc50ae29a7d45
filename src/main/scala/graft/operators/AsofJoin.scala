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
  * a sort-merge join, no row explosion, no broadcast requirement. This
  * is the plan you want at 100 TB, vs. the O(|L|*|R|) fallback Spark
  * would pick for the equivalent inequality join.
  *
  * Skew caveat: the running window partitions by key ALONE, and AQE
  * does not split skewed window partitions (it only splits joins) — a
  * key holding 1% of 100 TB serializes ~1 TB through one task. For
  * hot-keyed data use `leftAsofBucketed`, which bounds every window
  * partition to one (key, time-bucket) at the cost of one extra
  * shuffle.
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

  /** ASOF join with time-bucketed windows — the hot-key scale path.
    *
    * `leftAsof` partitions its running window by join key alone, and
    * AQE does NOT split skewed window partitions (only joins): one hot
    * key means one straggler task, however large the cluster. This
    * variant partitions by (key, floor(time / bucketWidth)) so a hot
    * key's rows spread over time buckets, and carries the latest
    * right-side payload across bucket boundaries with a small
    * per-(key, bucket) aggregate joined back in — the same
    * decomposition `RangeJoin.bucketed` uses for interval joins.
    *
    * Cost: two shuffles over the full data (bucket aggregate + bucket
    * window) instead of one, plus one tiny carry window over
    * (key, bucket) rows. Use when keys are skewed enough that a
    * straggler outweighs an extra shuffle; semantics are identical to
    * `leftAsof` (asserted by `AsofSpec`).
    *
    * Times must be numeric or castable to double (timestamps become
    * epoch seconds); `bucketWidth` is in those units.
    */
  def leftAsofBucketed(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      leftTime: Column,
      rightTime: Column,
      rightPayload: Seq[(Column, String)],
      bucketWidth: Double,
      direction: String = "backward",
      tolerance: Option[Double] = None): DataFrame = {

    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    // forward = backward on negated time; payload keeps the RAW right
    // time (__t) so the tolerance check is direction-agnostic
    val sign = if (direction == "backward") 1.0 else -1.0
    def eff(t: Column): Column = t.cast("double") * sign
    def bucketOf(t: Column): Column = floor(eff(t) / bucketWidth)

    val payloadStruct = struct(
      (rightPayload.map { case (c, n) => c.as(n) } :+ rightTime.as("__t")): _*)
    val r = right.select(
      rightKey.as("__asof_k"),
      eff(rightTime).as("__asof_t"),
      bucketOf(rightTime).as("__asof_b"),
      payloadStruct.as("__asof_payload"),
      lit(0).as("__asof_side"),   // rights sort before lefts at equal time
      lit(1).as("__asof_prio"))   // real right beats carried-in synthetic

    val leftCols = left.columns.map(col).toSeq
    val l = left.select(
      leftCols :+ leftKey.as("__asof_k") :+ eff(leftTime).as("__asof_t") :+
        bucketOf(leftTime).as("__asof_b") :+
        lit(null).cast(r.schema("__asof_payload").dataType).as("__asof_payload") :+
        lit(1).as("__asof_side") :+ lit(2).as("__asof_prio"): _*)

    // carry-in: for every bucket that CONTAINS LEFT ROWS, the latest
    // right payload from any strictly earlier bucket. Computed over
    // per-bucket aggregates — |keys| x |buckets| rows, so a hot key
    // costs #buckets here, not #rows.
    val rBucketLatest = r.groupBy(col("__asof_k"), col("__asof_b"))
      .agg(max_by(col("__asof_payload"), col("__asof_t")).as("__asof_payload"))
      .withColumn("__asof_side", lit(1)) // after left buckets: strict <
    val lBuckets = l.select(col("__asof_k"), col("__asof_b")).distinct()
      .withColumn("__asof_payload",
        lit(null).cast(r.schema("__asof_payload").dataType))
      .withColumn("__asof_side", lit(0))
    val carryWin = Window.partitionBy(col("__asof_k"))
      .orderBy(col("__asof_b"), col("__asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = lBuckets.unionByName(rBucketLatest)
      .withColumn("__asof_carry", last(col("__asof_payload"), ignoreNulls = true).over(carryWin))
      .filter(col("__asof_side") === 0 && col("__asof_carry").isNotNull)
      .select(
        col("__asof_k"), col("__asof_b"),
        // bucket start sorts <= every row in the bucket
        (col("__asof_b") * bucketWidth).as("__asof_t"),
        col("__asof_carry").as("__asof_payload"),
        lit(0).as("__asof_side"), lit(0).as("__asof_prio"))

    val unioned = l
      .unionByName(r, allowMissingColumns = true)
      .unionByName(carry, allowMissingColumns = true)
    val win = Window.partitionBy(col("__asof_k"), col("__asof_b"))
      .orderBy(col("__asof_t"), col("__asof_side"), col("__asof_prio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = unioned
      .withColumn("__asof_match", last(col("__asof_payload"), ignoreNulls = true).over(win))
      .filter(col("__asof_side") === 1)
      .withColumn("__asof_match", tolerance match {
        case None => col("__asof_match")
        case Some(tol) => when(
          abs(col("__asof_t") * sign -
            col("__asof_match.__t").cast("double")) <= tol,
          col("__asof_match"))
      })

    val payloadCols = rightPayload.map { case (_, n) => col(s"__asof_match.$n").as(n) }
    matched.select(left.columns.map(col).toSeq ++ payloadCols :+
      col("__asof_match").isNotNull.as("asof_matched"): _*)
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
