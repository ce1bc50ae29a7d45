package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for corpus pipelines.
  *
  * Training-data work needs samples that are (a) reproducible run-to-run
  * and cluster-size-independent, (b) cheap — a map-side filter, never a
  * shuffle, and (c) auditable by other engines. Keyed md5-hash sampling
  * gives all three (md5 hex is identical everywhere), unlike
  * `df.sample()` whose outcome depends on partitioning and seed plumbing.
  * TABLESAMPLE in the reference is block-random (fuse_table sampling);
  * this is the keyed/deterministic variant a pipeline actually wants —
  * the same document keeps or loses membership no matter where or when
  * the job runs.
  */
object Sampling {

  /** Threshold on the first 8 md5 hex chars ~ uniform in [0, 2^32). */
  private def threshold(fraction: Double): String = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    f"${math.min((fraction * 4294967296.0).toLong, 4294967295L)}%08x"
  }

  /** Keep ~`fraction` of rows, decided by md5 of the key — a pure
    * map-side filter (codegen'd, pushdown-friendly), stable across
    * engines, partitionings, and reruns.
    */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(substring(md5(key.cast("string")), 1, 8) < lit(threshold(fraction)))

  /** Per-stratum budget: keep at most `n` rows per stratum, chosen by
    * md5 rank (deterministic "reservoir"). One shuffle on the strata —
    * the minimum any exact per-group budget needs.
    */
  def stratifiedBudget(df: DataFrame, strata: Seq[Column], key: Column, n: Int): DataFrame = {
    val w = Window.partitionBy(strata: _*)
      .orderBy(md5(key.cast("string")), key)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }
}
