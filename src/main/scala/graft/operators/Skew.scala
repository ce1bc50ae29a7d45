package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (the classic fix when one hot key
  * would pin a whole aggregation or join on a single reducer —
  * complements AQE's skew-join splitting, which only covers joins).
  *
  * Two-stage aggregation: stage 1 groups by (key, salt) so the hot
  * key's rows spread over `salts` reducers; stage 2 re-aggregates the
  * partials by key. Correct for any re-aggregable measure
  * (sum/count/min/max — the same algebra the agg-index rewrite uses).
  */
object Skew {

  /** saltedAgg(df, keys, salts)(partials)(finals)
    *
    * @param partials stage-1 aggregates over (keys ++ salt); their
    *                 output names feed `finals`
    * @param finals   stage-2 re-aggregation over `keys`
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], salts: Int)(
      partials: Seq[Column])(finals: Seq[Column]): DataFrame = {
    require(salts > 1, "salts must exceed 1")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val stage1 = salted.groupBy(keys :+ col("__salt"): _*).agg(partials.head, partials.tail: _*)
    stage1.groupBy(keys: _*).agg(finals.head, finals.tail: _*)
  }

  /** Convenience: salted sum/count per key. */
  def saltedSumCount(df: DataFrame, key: Column, valueCol: Column,
      salts: Int = 16): DataFrame =
    saltedAgg(df, Seq(key), salts)(
      Seq(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt")))(
      Seq(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count")))

  /** Salted join for a hot-keyed big side against a modest dim side:
    * big rows scatter over `salts` sub-keys, the dim side replicates
    * once per salt, and the join runs on (key, salt) — the hot key's
    * probe work spreads across `salts` reducers instead of pinning
    * one. The salt values themselves don't affect the result, only
    * the spread, so output equals the unsalted join. Supports inner
    * and left_outer (unmatched big rows survive with their salt).
    */
  def saltedJoin(big: DataFrame, dim: DataFrame, bigKey: Column, dimKey: Column,
      salts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must exceed 1")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType")
    val b = big.withColumn("__salt_b",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)).cast("int"))
    val d = dim.withColumn("__salt_d", explode(sequence(lit(0), lit(salts - 1))))
    b.join(d, bigKey === dimKey && col("__salt_b") === col("__salt_d"), joinType)
      .drop("__salt_b", "__salt_d")
  }
}
