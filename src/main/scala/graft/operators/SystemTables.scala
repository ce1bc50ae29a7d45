package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `system.tables` / `system.columns` / `system.functions` analogs
  * (reference: src/query/storages/system/src/{tables_table, columns_table,
  * functions_table}.rs). The reference materializes catalog metadata as
  * queryable tables; here the same metadata comes from `spark.catalog`
  * and is exposed as temp views so it composes with any query. These are
  * driver-side metadata enumerations (small by construction), the same
  * shape as the reference's system-table reads.
  */
object SystemTables {

  /** One row per table/view visible in the current catalog:
    * (database, name, table_type, is_temporary).
    */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq.map { t =>
      (Option(t.database).getOrElse(""), t.name, t.tableType, t.isTemporary)
    }.toDF("database", "name", "table_type", "is_temporary")
  }

  /** One row per column of every visible table:
    * (table_name, column_name, data_type, nullable, is_partition).
    */
  def columns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = spark.catalog.listTables().collect().toSeq.flatMap { t =>
      try {
        spark.catalog.listColumns(t.name).collect().toSeq.map { c =>
          (t.name, c.name, c.dataType, c.nullable, c.isPartition)
        }
      } catch { case _: Exception => Seq.empty } // dropped concurrently
    }
    rows.toDF("table_name", "column_name", "data_type", "nullable", "is_partition")
  }

  /** One row per registered SQL function: (name, class_name, is_temporary).
    * Covers built-ins plus everything GraftExtensions/GraftFunctions
    * registered — the surface a user probes with SHOW FUNCTIONS.
    */
  def functions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect().toSeq.map { f =>
      (f.name, Option(f.className).getOrElse(""), f.isTemporary)
    }.toDF("name", "class_name", "is_temporary")
  }

  /** One row per database (reference databases_table.rs). */
  def databases(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listDatabases().collect().toSeq.map { d =>
      (d.name, Option(d.catalog).getOrElse(""), Option(d.locationUri).getOrElse(""))
    }.toDF("name", "catalog", "location")
  }

  /** One row per non-default Spark SQL setting (reference
    * settings_table.rs / configs_table.rs role: the effective session
    * configuration as a queryable relation).
    */
  def settings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq.sorted.toDF("name", "value")
  }

  /** The table engines this build supports (reference engines_table.rs). */
  def engines(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("FUSE", "snapshot/segment storage with time travel (GraftTable)"),
      ("MEMORY", "session temp views"),
      ("RANDOM", "seed-deterministic generated data (RandomTable)"),
      ("STREAM", "append-log change tracking (GraftStream)"),
      ("VIEW", "named query"),
      ("NULL", "discards writes, returns empty"))
      .toDF("engine", "description")
  }

  /** The reference's system.one: a single row, used as a scan seed. */
  def one(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(1)).toDF("dummy")
  }

  /** Active jobs/stages from the status tracker (reference
    * processes_table.rs role: what is this engine running right now).
    */
  def processes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val t = spark.sparkContext.statusTracker
    t.getActiveJobIds().toSeq.flatMap { jid =>
      t.getJobInfo(jid).toSeq.map { j =>
        (jid, j.status().toString, j.stageIds().length)
      }
    }.toDF("job_id", "status", "n_stages")
  }

  /** One row per executor (reference clusters_table.rs: node host/port
    * inventory; local mode shows the single driver-executor).
    */
  def clusters(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.statusTracker.getExecutorInfos.toSeq.map { e =>
      (e.host(), e.port(), e.numRunningTasks())
    }.toDF("host", "port", "running_tasks")
  }

  /** JVM memory + GC counters (reference metrics_table.rs /
    * malloc_stats_table.rs role).
    */
  def metrics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rt = Runtime.getRuntime
    val mem = java.lang.management.ManagementFactory.getMemoryMXBean
    val gcs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
    (Seq(
      ("jvm_heap_used_bytes", mem.getHeapMemoryUsage.getUsed),
      ("jvm_heap_max_bytes", mem.getHeapMemoryUsage.getMax),
      ("jvm_nonheap_used_bytes", mem.getNonHeapMemoryUsage.getUsed),
      ("jvm_total_bytes", rt.totalMemory()),
      ("jvm_free_bytes", rt.freeMemory()),
      ("available_processors", rt.availableProcessors().toLong)) ++
      gcs.flatMap(g => Seq(
        (s"gc_${g.getName.replace(' ', '_').toLowerCase}_count", g.getCollectionCount),
        (s"gc_${g.getName.replace(' ', '_').toLowerCase}_time_ms", g.getCollectionTime))))
      .toDF("metric", "value")
  }

  /** Build/version facts (reference build_options_table.rs). */
  def buildOptions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("spark_version", spark.version),
      ("scala_version", scala.util.Properties.versionNumberString),
      ("java_version", System.getProperty("java.version")),
      ("os", System.getProperty("os.name") + " " + System.getProperty("os.arch")))
      .toDF("option", "value")
  }

  /** Registered aggregating indexes (reference indexes_table.rs). */
  def indexes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.plans.AggIndex.list.map { e =>
      ("AGGREGATING", e.sourcePath, e.keys.toSeq.sorted.mkString(","), e.summaryPath,
        e.coveredFiles.map(_.size).getOrElse(-1))
    }.toDF("index_type", "source", "keys", "summary", "pinned_files")
  }

  /** Stored procedures (reference procedures_table.rs). */
  def procedures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    SqlScript.listProcedures.map { p =>
      (p.name, p.argNames.mkString(","), p.body.length)
    }.toDF("name", "args", "body_chars")
  }

  /** Spark-cached relations (reference caches_table.rs role). */
  def caches(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect().toSeq.flatMap { t =>
      val cached = try spark.catalog.isCached(t.name) catch { case _: Exception => false }
      if (cached) Seq((t.name, "relation")) else Nil
    }.toDF("name", "kind")
  }

  /** Register all as `system_*` temp views (snapshot semantics:
    * re-register to refresh, matching QueryLog.refreshView).
    */
  def register(spark: SparkSession): Unit = {
    tables(spark).createOrReplaceTempView("system_tables")
    columns(spark).createOrReplaceTempView("system_columns")
    functions(spark).createOrReplaceTempView("system_functions")
    databases(spark).createOrReplaceTempView("system_databases")
    settings(spark).createOrReplaceTempView("system_settings")
    engines(spark).createOrReplaceTempView("system_engines")
    one(spark).createOrReplaceTempView("system_one")
    processes(spark).createOrReplaceTempView("system_processes")
    clusters(spark).createOrReplaceTempView("system_clusters")
    metrics(spark).createOrReplaceTempView("system_metrics")
    buildOptions(spark).createOrReplaceTempView("system_build_options")
    indexes(spark).createOrReplaceTempView("system_indexes")
    procedures(spark).createOrReplaceTempView("system_procedures")
    caches(spark).createOrReplaceTempView("system_caches")
  }
}
