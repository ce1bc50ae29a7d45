package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * One place for every config that affects correctness or scale:
  *  - UTC session timezone (oracle parity with DuckDB).
  *  - shuffle partitions sized for the local harness (32 threads); on a
  *    real cluster this is overridden by AQE coalescing anyway.
  *  - AQE on: runtime re-planning (skew joins, dynamic coalesce) is our
  *    substitute for the reference's cascades/cost-based re-optimization
  *    (reference: src/query/sql/src/planner/optimizer/optimizer.rs).
  *  - nanosAsLong: the events table is parquet TIMESTAMP(NANOS), which
  *    Spark's reader otherwise rejects; Tables re-derives a proper
  *    timestamp column.
  */
object GraftSession {
  def apply(cpus: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      // reference datetime coercion semantics (int<->date/timestamp
      // casts, date-date INT days, ts-ts BIGINT micros) must run at
      // resolution time — no post-hoc injection point exists for
      // resolution rules, so wire them at build time
      .withExtensions(e => e.injectResolutionRule(
        s => new graft.functions.DatetimeCoercionRule(s)))
      // numeric<->boolean coercion, variant get()/subscripts/ORDER BY
      .withExtensions(e => e.injectResolutionRule(
        s => new graft.functions.GraftCoercionRule(s)))
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // ${...} in SQL text is regexp replacement / script syntax here,
      // never Spark's config substitution
      .config("spark.sql.variable.substitute", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reference map semantics (map.rs map_cat/map_insert): a
      // duplicated key keeps the LAST value, never errors
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.ui.enabled", "false")
      // managed-table fall-throughs must never land in the launch CWD
      // (a crashed run's leftover spark-warehouse/ dir breaks the next
      // run's CTAS with LOCATION_ALREADY_EXISTS)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // always-on rewrites (extensions-config path covers external
    // sessions; this covers sessions built here). Idempotent under
    // getOrCreate reuse.
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[graft.plans.VirtualColumnRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new graft.plans.VirtualColumnRule(spark)
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[graft.plans.PyUdfBatchRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new graft.plans.PyUdfBatchRule(spark)
    // the full scalar/aggregate function surface is part of the session
    // contract, not a per-caller opt-in: a query module that spells
    // xxh64_long (or any other graft name) must resolve it regardless of
    // which entry point (Bench/Verify/Sql/tests) built the session.
    // Idempotent (createOrReplaceTempFunction) and one-time per session
    // under getOrCreate reuse.
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** Defensive: make an externally-created session able to read the
    * nanos-timestamped events table. Safe to call repeatedly.
    */
  def tune(spark: SparkSession): SparkSession = {
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }
    try spark.conf.set("spark.sql.session.timeZone", "UTC")
    catch { case _: Throwable => () }
    spark
  }
}
