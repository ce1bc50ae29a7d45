package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Band range join for two LARGE sides (reference: IEJoin,
  * src/query/service/src/physical_plans/physical_range_join.rs +
  * transforms/range_join/ie_join_state.rs). Spark's own plan for
  * `l.value BETWEEN r.lo AND r.hi` with no equi-key is a broadcast
  * nested loop — fine when one side broadcasts, quadratic when not.
  *
  * The scale path decomposes the band predicate into an equi join:
  * quantize the left value to a bucket of width `bucketWidth`;
  * replicate each right interval to every bucket it overlaps; hash-join
  * on (bucket [, extra equi keys]); re-apply the exact predicate.
  * Each (left-row, interval) pair meets in exactly one bucket — the
  * left row's — so no distinct pass is needed. Replication factor =
  * avg interval span / bucketWidth: pick bucketWidth near the typical
  * interval width.
  */
object RangeJoin {

  /** Inner join of `left` and `right` on
    * `left(valueCol) BETWEEN right(loCol) AND right(hiCol)`
    * (plus optional equi `keys`: (leftKey, rightKey) pairs).
    */
  def bands(
      left: DataFrame,
      right: DataFrame,
      valueCol: Column,
      loCol: Column,
      hiCol: Column,
      bucketWidth: Double,
      keys: Seq[(Column, Column)] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__rj_bucket",
      floor(valueCol.cast("double") / bucketWidth))
    // one row per bucket the interval [lo, hi] overlaps
    val r = right.withColumn("__rj_bucket",
      explode(sequence(
        floor(loCol.cast("double") / bucketWidth),
        floor(hiCol.cast("double") / bucketWidth))))
    val joinCond = keys.foldLeft(l("__rj_bucket") === r("__rj_bucket")) {
      case (acc, (lk, rk)) => acc && lk === rk
    }
    l.join(r, joinCond && valueCol >= loCol && valueCol <= hiCol)
      .drop("__rj_bucket")
  }
}
