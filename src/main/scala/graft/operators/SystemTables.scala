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
  }
}
