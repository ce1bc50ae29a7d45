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
      (Option(t.database).getOrElse(""), t.name, t.tableType, t.isTemporary,
        Option(t.description).getOrElse(""))
    }.toDF("database", "name", "table_type", "is_temporary", "comment")
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
    // the reference's engine descriptor set (each storages/<e>/table.rs
    // registers "<NAME> Storage Engine"); FUSE here is GraftTable,
    // DELTA/ICEBERG/PAIMON the lake readers, RANDOM RandomTable,
    // STREAM GraftStream, MEMORY temp views
    (Seq("DELTA", "FUSE", "ICEBERG", "MEMORY", "NULL", "PAIMON", "PROXY",
      "RANDOM", "STREAM")
      .map(e => (e, s"$e Storage Engine")) ++ Seq(
      // the reference's two special descriptors (show_engines golden)
      ("MATERIALIZED_VIEW", "Materialized View (Fuse-backed)"),
      ("VIEW", "VIEW Storage (LOGICAL VIEW)")))
      .sortBy(_._1)
      .toDF("Engine", "Comment")
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

  // ---- round-6 breadth -------------------------------------------------

  /** In-session query history (reference query_log_table.rs /
    * query_execution_table.rs): a QueryExecutionListener records every
    * completed action — name, rough plan digest, duration, status.
    * Ring-buffered at 1000 entries.
    */
  object QueryHistory {
    final case class Entry(id: Long, action: String, plan: String,
                           status: String, error: String, durationMs: Double, tsMs: Long)
    private val buf = new java.util.concurrent.ConcurrentLinkedDeque[Entry]()
    private val ids = new java.util.concurrent.atomic.AtomicLong(0L)
    private val installedIn =
      java.util.Collections.synchronizedSet(new java.util.HashSet[String]())

    private def add(e: Entry): Unit = {
      buf.addLast(e)
      while (buf.size() > 1000) buf.pollFirst()
    }

    def install(spark: SparkSession): Unit = {
      val key = System.identityHashCode(spark).toString
      if (installedIn.add(key)) {
        spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
          private def digest(qe: org.apache.spark.sql.execution.QueryExecution): String = {
            val s = try qe.logical.toString.linesIterator.take(1).mkString
                    catch { case _: Throwable => "" }
            s.take(200)
          }
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
            add(Entry(ids.incrementAndGet(), funcName, digest(qe), "Finished", "",
              durationNs / 1e6, System.currentTimeMillis()))
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution, error: Exception): Unit =
            add(Entry(ids.incrementAndGet(), funcName, digest(qe), "Failed",
              String.valueOf(error.getMessage).take(200), 0.0, System.currentTimeMillis()))
        })
      }
    }

    def entries: Seq[Entry] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
  }

  def queryHistory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    QueryHistory.entries
      .map(e => (e.id, e.action, e.plan, e.status, e.error, e.durationMs, e.tsMs))
      .toDF("query_id", "action", "plan", "status", "error", "duration_ms", "event_time_ms")
  }

  /** Named external stages (reference stages_table.rs; CREATE STAGE).
    * A stage is a named location + default format for COPY-style IO.
    */
  object Stages {
    final case class Stage(name: String, url: String, format: String, createdMs: Long)
    private val reg = new java.util.concurrent.ConcurrentHashMap[String, Stage]()
    def create(name: String, url: String, format: String = "PARQUET"): Unit =
      reg.put(name, Stage(name, url, format, System.currentTimeMillis()))
    def drop(name: String): Unit = reg.remove(name)
    def list: Seq[Stage] = {
      import scala.jdk.CollectionConverters._
      reg.values.asScala.toSeq.sortBy(_.name)
    }
  }

  def stages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Stages.list.map(s => (s.name, s.url, s.format, s.createdMs))
      .toDF("name", "url", "format", "created_ms")
  }

  /** Stream cursors discovered from the session's opened tables
    * (reference streams_table.rs) — cursor files are the on-disk truth,
    * so streams created in other sessions on the same tables appear too.
    */
  def streams(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val rows = graft.sources.GraftTable.openedPaths.flatMap { p =>
      val dir = Paths.get(p)
      if (!Files.isDirectory(dir)) Nil
      else graft.Fs.list(dir).iterator
        .filter(_.getFileName.toString.startsWith("_graft_stream_"))
        .map { f =>
          val name = f.getFileName.toString
            .stripPrefix("_graft_stream_").stripSuffix(".json")
          val offset = "-?\\d+".r.findFirstIn(Files.readString(f)).map(_.toLong).getOrElse(-1L)
          val t = graft.sources.GraftTable.open(spark, p)
          (name, p, offset, t.currentVersion, t.currentVersion > offset)
        }.toSeq
    }
    rows.toDF("name", "table_path", "offset", "table_version", "has_data")
  }

  /** Declared virtual columns of the session's opened tables
    * (reference virtual_columns_table.rs).
    */
  def virtualColumns(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = graft.sources.GraftTable.openedPaths.flatMap { p =>
      val t = graft.sources.GraftTable.open(spark, p)
      t.virtualColumns.toSeq.flatMap { case (src, paths) =>
        paths.map(jp => (p, src, jp, graft.sources.GraftTable.virtName(src, jp)))
      }
    }
    rows.toDF("table_path", "source_column", "json_path", "stored_column")
  }

  /** Catalogs visible to the session (reference catalogs_table.rs). */
  def catalogs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listCatalogs().collect().toSeq.map(c => Tuple1(c.name)).toDF("name")
  }

  /** Single-user harness (reference users_table.rs / roles_table.rs). */
  def users(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((sys.props.getOrElse("user.name", "root"), "no_password", "account_admin"))
      .toDF("name", "auth_type", "default_role")
  }

  def roles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("account_admin", 1L), ("public", 1L)).toDF("name", "inherited_roles")
  }

  /** Plan-keyed result cache entries (reference query_cache_table.rs). */
  def queryCache(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(ResultCache.size)).toDF("num_cached_plans")
  }

  /** system.zero: zero rows, one column (reference zero_table.rs). */
  def zero(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Tuple1[Int]].toDF("dummy")
  }

  // ---- round-6 second breadth pass ------------------------------------

  /** Node-level Spark conf (reference configs_table.rs — process
    * configuration, distinct from session `settings`).
    */
  def configs(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.sparkContext.getConf.getAll.toSeq.sorted.toDF("name", "value")
  }

  /** Per opened graft table: snapshot version, file count, and the
    * ANALYZE row count when present (reference statistics_table.rs).
    */
  def statistics(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sources.GraftTable.openedPaths.map { p =>
      val t = graft.sources.GraftTable.open(spark, p)
      val v = t.currentVersion
      val nFiles = if (v < 0) 0 else t.snapshot(v).files.length
      val st = t.stats()
      (p, v, nFiles, st.map(_.rowCount).getOrElse(-1L), st.map(_.cols.size).getOrElse(0))
    }.toDF("table_path", "version", "num_files", "analyzed_rows", "analyzed_columns")
  }

  /** The table-valued functions this build ships (reference
    * table_functions_table.rs).
    */
  def tableFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("numbers", "0..n-1, distributed"),
      ("generate_series", "inclusive range with step (numeric/date/timestamp)"),
      ("list_stage", "files of a stage directory"),
      ("infer_schema", "column shape of a parquet/csv/json stage path"),
      ("fuse_snapshot", "snapshot log of a graft table"),
      ("fuse_block", "per-file parquet footprint of a graft table"),
      ("clustering_information", "cluster-key overlap depth histogram"),
      ("flatten", "lateral VARIANT flatten (6-column shape)"))
      .toDF("name", "description")
  }

  /** Functions registered on top of Spark's builtin registry — i.e. the
    * graft surface itself (reference user_functions_table.rs).
    */
  def userFunctions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val builtin = org.apache.spark.sql.catalyst.analysis.FunctionRegistry
      .builtin.listFunction.map(_.funcName.toLowerCase).toSet
    spark.catalog.listFunctions().collect().toSeq
      .filter(f => !builtin.contains(f.name.toLowerCase))
      .map(f => (f.name, Option(f.className).getOrElse(""), f.isTemporary))
      .sortBy(_._1)
      .toDF("name", "class_name", "is_temporary")
  }

  /** Shuffle/spill scratch files under the node's Spark local dirs
    * (reference temp_files_table.rs). Capped enumeration — this is a
    * diagnostic view, not a filesystem walk.
    */
  def tempFiles(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val localDir = spark.sparkContext.getConf
      .get("spark.local.dir", System.getProperty("java.io.tmpdir"))
    val root = Paths.get(localDir)
    val rows =
      if (!Files.isDirectory(root)) Seq.empty
      else graft.Fs.list(root).iterator
        .filter { d =>
          val n = d.getFileName.toString
          n.startsWith("blockmgr-") || n.startsWith("spark-")
        }
        .flatMap { d =>
          graft.Fs.walk(d).iterator.filter(Files.isRegularFile(_))
            .map(f => (f.toString, try Files.size(f) catch { case _: Exception => 0L }))
        }
        .take(10000).toSeq
    rows.toDF("path", "size_bytes")
  }

  /** Live thread stacks (reference backtrace_table.rs). */
  def backtrace(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    Thread.getAllStackTraces.asScala.toSeq.map { case (t, frames) =>
      (t.getId, t.getName, t.getState.toString,
        frames.take(8).map(_.toString).mkString("\n"))
    }.sortBy(_._1).toDF("thread_id", "name", "state", "stack")
  }

  /** JVM memory-pool detail (reference malloc_stats_table.rs /
    * malloc_stats_totals_table.rs role — allocator arenas become the
    * JVM's named pools).
    */
  def mallocStats(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala.toSeq.map { p =>
      val u = p.getUsage
      (p.getName, p.getType.toString, u.getUsed, u.getCommitted, u.getMax)
    }.toDF("pool", "type", "used_bytes", "committed_bytes", "max_bytes")
  }

  /** One row per completed/failed query event, reference
    * query_log_table.rs shape (log_type 2 = Finish, -2 = Error; Start
    * events are not observable from a QueryExecutionListener).
    */
  def queryLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    QueryHistory.entries.map { e =>
      (if (e.status == "Finished") 2 else -2, e.id, e.action, e.plan,
        e.tsMs, e.durationMs, e.error)
    }.toDF("log_type", "query_id", "query_kind", "query_text",
      "event_time_ms", "query_duration_ms", "exception_text")
  }

  /** RECLUSTER commits from the opened tables' snapshot logs (reference
    * clustering_history_table.rs) — the log is the on-disk truth, so
    * reclusters from other sessions appear too.
    */
  def clusteringHistory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val rows = graft.sources.GraftTable.openedPaths.flatMap { p =>
      val t = graft.sources.GraftTable.open(spark, p)
      t.versions.map(t.snapshot).filter(_.operation.startsWith("RECLUSTER"))
        .map(s => (p, s.version, s.timestampMs, s.operation))
    }
    rows.toDF("table_path", "version", "timestamp_ms", "operation")
  }

  /** Named dictionaries for dict_get (reference dictionaries_table.rs;
    * CREATE DICTIONARY metadata — the lookup itself is
    * `AsyncFns.dictGet`'s broadcast join).
    */
  object Dictionaries {
    final case class Dict(name: String, source: String, keyCol: String,
                          valueCol: String, createdMs: Long)
    private val reg = new java.util.concurrent.ConcurrentHashMap[String, Dict]()
    def create(name: String, source: String, keyCol: String, valueCol: String): Unit =
      reg.put(name, Dict(name, source, keyCol, valueCol, System.currentTimeMillis()))
    def drop(name: String): Unit = reg.remove(name)
    def list: Seq[Dict] = {
      import scala.jdk.CollectionConverters._
      reg.values.asScala.toSeq.sortBy(_.name)
    }
  }

  def dictionaries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Dictionaries.list.map(d => (d.name, d.source, d.keyCol, d.valueCol, d.createdMs))
      .toDF("name", "source", "key_column", "value_column", "created_ms")
  }

  /** Driver-side locks currently registered (reference locks_table.rs —
    * table/sequence-level DML locks).
    */
  def locks(spark: SparkSession): DataFrame = {
    import spark.implicits._
    AsyncFns.lockKeys.map(k => (k, "DRIVER")).toDF("key", "scope")
  }

  /** Single-user offline harness: these reference tables exist and are
    * queryable but hold no rows (tags_table.rs, notifications_table.rs,
    * notification_history_table.rs, password_policies_table.rs).
    */
  def tags(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, String)].toDF("tag_name", "object", "value")
  }

  def notifications(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String, Boolean)].toDF("name", "type", "enabled")
  }

  def notificationHistory(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, String)].toDF("name", "event_time_ms", "status")
  }

  def passwordPolicies(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Int, Int)].toDF("name", "min_length", "max_age_days")
  }

  /** Repo authorship (reference contributors_table.rs / credits_table.rs
    * role, scoped to this build).
    */
  def contributors(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(sys.props.getOrElse("user.name", "root"))).toDF("name")
  }

  def credits(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("apache-spark", spark.version, "execution engine"),
      ("scala", scala.util.Properties.versionNumberString, "language"),
      ("openjdk", System.getProperty("java.version"), "runtime"))
      .toDF("component", "version", "role")
  }

  /** table constraints (reference constraints_table.rs): Spark temp
    * views carry no declared PK/FK/CHECK constraints, so the only
    * materializable rows are NOT NULL constraints derived from the
    * catalog's column nullability — same shape, honest content.
    */
  def constraints(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.{col, concat_ws, lit}
    columns(spark).filter(!col("nullable"))
      .select(lit("default").as("database"), col("table_name").as("table"),
        concat_ws("_", lit("nn"), col("table_name"), col("column_name")).as("name"),
        lit("NOT NULL").as("constraint_type"), col("column_name").as("expr"))
  }

  /** allocator totals (reference malloc_stats_totals_table.rs — jemalloc
    * totals; here the JVM's pool totals, one row per memory pool)
    */
  def mallocStatsTotals(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala.toSeq
      .map { p =>
        val u = p.getUsage
        (p.getName, u.getUsed, u.getCommitted, math.max(u.getMax, -1L))
      }.toDF("name", "used_bytes", "committed_bytes", "max_bytes")
  }

  /** per-query execution stats (reference query_execution_table.rs:
    * time-series of cpu/memory per running query; here the completed
    * queries the in-process history captured, one row per execution)
    */
  def queryExecution(spark: SparkSession): DataFrame = {
    import spark.implicits._
    QueryHistory.entries
      .map(e => (e.id, e.plan, e.status, e.durationMs, e.tsMs,
        Runtime.getRuntime.availableProcessors()))
      .toDF("query_id", "plan", "status", "duration_ms", "event_time_ms", "cpus")
  }

  /** Register all as `system_*` temp views, plus the ANSI
    * `information_schema` mapping (reference
    * src/query/storages/information_schema/: schemata/tables/columns/
    * views/keywords re-expressed over the same catalog metadata; Spark
    * temp-view names cannot contain '.', so the views are prefixed
    * `information_schema_` — snapshot semantics, re-register to
    * refresh).
    */
  def register(spark: SparkSession): Unit = {
    QueryHistory.install(spark)
    tables(spark).createOrReplaceTempView("system_tables")
    // task registry views (reference system/src/{task,task_history});
    // live rows are published by GraftSql.refreshTaskViews — seed empty
    // relations only when no head has registered yet
    if (!spark.catalog.tableExists("system_tasks"))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "name string, state string, warehouse string, schedule string, " +
          "definition string, condition_text string, after string, " +
          "suspend_task_after_num_failures bigint, error_integration string, " +
          "comment string, session_parameters string"))
        .createOrReplaceTempView("system_tasks")
    if (!spark.catalog.tableExists("system_task_history"))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(
          "name string, state string, warehouse string, schedule string, " +
          "definition string, run_id bigint, exception_text string"))
        .createOrReplaceTempView("system_task_history")
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
    queryHistory(spark).createOrReplaceTempView("system_query_history")
    stages(spark).createOrReplaceTempView("system_stages")
    streams(spark).createOrReplaceTempView("system_streams")
    virtualColumns(spark).createOrReplaceTempView("system_virtual_columns")
    catalogs(spark).createOrReplaceTempView("system_catalogs")
    users(spark).createOrReplaceTempView("system_users")
    roles(spark).createOrReplaceTempView("system_roles")
    queryCache(spark).createOrReplaceTempView("system_query_cache")
    zero(spark).createOrReplaceTempView("system_zero")
    configs(spark).createOrReplaceTempView("system_configs")
    statistics(spark).createOrReplaceTempView("system_statistics")
    tableFunctions(spark).createOrReplaceTempView("system_table_functions")
    userFunctions(spark).createOrReplaceTempView("system_user_functions")
    tempFiles(spark).createOrReplaceTempView("system_temp_files")
    backtrace(spark).createOrReplaceTempView("system_backtrace")
    mallocStats(spark).createOrReplaceTempView("system_malloc_stats")
    queryLog(spark).createOrReplaceTempView("system_query_log")
    clusteringHistory(spark).createOrReplaceTempView("system_clustering_history")
    dictionaries(spark).createOrReplaceTempView("system_dictionaries")
    locks(spark).createOrReplaceTempView("system_locks")
    tags(spark).createOrReplaceTempView("system_tags")
    notifications(spark).createOrReplaceTempView("system_notifications")
    notificationHistory(spark).createOrReplaceTempView("system_notification_history")
    passwordPolicies(spark).createOrReplaceTempView("system_password_policies")
    contributors(spark).createOrReplaceTempView("system_contributors")
    credits(spark).createOrReplaceTempView("system_credits")
    constraints(spark).createOrReplaceTempView("system_constraints")
    mallocStatsTotals(spark).createOrReplaceTempView("system_malloc_stats_totals")
    queryExecution(spark).createOrReplaceTempView("system_query_execution")

    // information_schema (ANSI shapes over the same metadata)
    import org.apache.spark.sql.functions.{col, lit, when}
    databases(spark)
      .select(col("catalog").as("catalog_name"), col("name").as("schema_name"),
        lit("default").as("schema_owner"))
      .createOrReplaceTempView("information_schema_schemata")
    tables(spark)
      .select(col("database").as("table_schema"), col("name").as("table_name"),
        when(col("table_type") === "VIEW", "VIEW").otherwise("BASE TABLE").as("table_type"),
        col("is_temporary"))
      .createOrReplaceTempView("information_schema_tables")
    columns(spark)
      .select(col("table_name"), col("column_name"),
        col("data_type"),
        when(col("nullable"), "YES").otherwise("NO").as("is_nullable"))
      .createOrReplaceTempView("information_schema_columns")
    tables(spark).filter(col("table_type") === "VIEW")
      .select(col("database").as("table_schema"), col("name").as("table_name"))
      .createOrReplaceTempView("information_schema_views")
    keywords(spark).createOrReplaceTempView("information_schema_keywords")
  }

  /** reserved-word inventory (reference information_schema
    * keywords_table.rs); 1 = reserved
    */
  def keywords(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq("SELECT", "FROM", "WHERE", "GROUP", "BY", "ORDER", "HAVING", "LIMIT",
      "OFFSET", "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ON", "USING",
      "UNION", "INTERSECT", "EXCEPT", "ALL", "DISTINCT", "AS", "AND", "OR", "NOT",
      "NULL", "TRUE", "FALSE", "CASE", "WHEN", "THEN", "ELSE", "END", "CAST",
      "CREATE", "TABLE", "VIEW", "INSERT", "INTO", "VALUES", "UPDATE", "SET",
      "DELETE", "MERGE", "WITH", "RECURSIVE", "OVER", "PARTITION", "WINDOW",
      "EXISTS", "IN", "BETWEEN", "LIKE", "IS", "ASC", "DESC")
      .map((_, 1)).toDF("keyword", "reserved")
  }
}
