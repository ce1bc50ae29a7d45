package graft

import graft.operators.TableFunctions
import graft.sources.GraftTable
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Introspection TVFs: list_stage, infer_schema, fuse_snapshot analog
  * (SURVEY §2.2 table functions).
  */
class TableFunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-tvf-test")

  private def tmp(): String = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    Files.createTempDirectory(base, "tvf").toString
  }

  test("list_stage lists files with sizes") {
    val dir = tmp()
    Files.writeString(Paths.get(dir, "a.csv"), "x,y\n1,2\n")
    Files.createDirectories(Paths.get(dir, "sub"))
    Files.writeString(Paths.get(dir, "sub", "b.json"), """{"k":1}""")
    val rows = TableFunctions.listStage(spark, dir).collect()
    assert(rows.map(_.getString(0)).toSet == Set("a.csv", s"sub${java.io.File.separator}b.json"))
    assert(rows.forall(_.getLong(1) > 0))
    // empty / missing dir -> empty resultset, no error
    assert(TableFunctions.listStage(spark, dir + "_nope").count() == 0)
  }

  test("infer_schema reports columns in order for csv and parquet") {
    import spark.implicits._
    val dir = tmp()
    Files.writeString(Paths.get(dir, "f.csv"), "name,n\nalpha,1\nbeta,2\n")
    val csv = TableFunctions.inferSchema(spark, s"$dir/f.csv", "csv").collect()
    assert(csv.map(r => (r.getString(0), r.getInt(3))).toSeq == Seq(("name", 0), ("n", 1)))
    assert(csv(1).getString(1) == "int")

    val pq = tmp()
    Seq((1L, "x")).toDF("id", "s").write.mode("overwrite").parquet(pq)
    val cols = TableFunctions.inferSchema(spark, pq).collect()
    assert(cols.map(_.getString(0)).toSeq == Seq("id", "s"))
    assert(cols(0).getString(1) == "bigint")
  }

  test("system tables/columns/functions views reflect the catalog") {
    import spark.implicits._
    import graft.operators.SystemTables
    Seq((1, "a")).toDF("k", "v").createOrReplaceTempView("systbl_probe")
    SystemTables.register(spark)
    val t = spark.sql("SELECT * FROM system_tables WHERE name = 'systbl_probe'").collect()
    assert(t.length == 1 && t(0).getAs[Boolean]("is_temporary"))
    val c = spark.sql(
      "SELECT column_name, data_type FROM system_columns WHERE table_name = 'systbl_probe' ORDER BY column_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(c == Seq(("k", "int"), ("v", "string")))
    // built-ins and graft registrations both visible
    val f = spark.sql("SELECT count(*) FROM system_functions").head().getLong(0)
    assert(f > 300, s"only $f functions listed")
    assert(spark.sql("SELECT * FROM system_functions WHERE name = 'abs'").count() == 1)
    // round-4 additions: databases/settings/engines/one
    assert(spark.sql("SELECT * FROM system_databases WHERE name = 'default'").count() == 1)
    assert(spark.sql(
      "SELECT value FROM system_settings WHERE name = 'spark.sql.shuffle.partitions'")
      .head().getString(0).toInt > 0)
    assert(spark.sql("SELECT * FROM system_engines WHERE engine = 'FUSE'").count() == 1)
    assert(spark.sql("SELECT dummy FROM system_one").head().getInt(0) == 1)
    // round-5 additions: clusters/metrics/build_options/indexes/
    // procedures/caches/processes
    assert(spark.sql("SELECT * FROM system_clusters").count() >= 1)
    assert(spark.sql(
      "SELECT value FROM system_metrics WHERE metric = 'jvm_heap_used_bytes'")
      .head().getLong(0) > 0)
    assert(spark.sql(
      "SELECT value FROM system_build_options WHERE option = 'spark_version'")
      .head().getString(0).startsWith("4."))
    graft.operators.SqlScript.createProcedure("sysproc_probe", Seq("x"),
      "BEGIN RETURN :x; END;")
    graft.plans.AggIndex.register("/tmp/systbl_src", Seq("k"), "/tmp/systbl_sum")
    SystemTables.register(spark) // refresh snapshot views
    assert(spark.sql(
      "SELECT args FROM system_procedures WHERE name = 'sysproc_probe'")
      .head().getString(0) == "x")
    assert(spark.sql(
      "SELECT keys FROM system_indexes WHERE source = '/tmp/systbl_src'")
      .head().getString(0) == "k")
    assert(spark.sql("SELECT * FROM system_processes").count() >= 0) // idle: empty
    assert(spark.sql("SELECT * FROM system_caches").count() >= 0)
    graft.operators.SqlScript.dropProcedure("sysproc_probe")
    graft.plans.AggIndex.clear()
  }

  test("round-6 system breadth: query_history, stages, streams, virtual_columns, information_schema") {
    import spark.implicits._
    import graft.operators.SystemTables
    import graft.sources.{GraftStream, GraftTable}
    val dir = tmp()
    // a table with virtual columns + a stream cursor
    val t = GraftTable.open(spark, dir)
    t.setVirtualColumns("props", Seq("$.k", "$.v"))
    t.append(Seq((1L, """{"k":1,"v":"a"}""")).toDF("id", "props"))
    GraftStream.create(t, "s6probe")
    t.append(Seq((2L, """{"k":2,"v":"b"}""")).toDF("id", "props"))
    SystemTables.Stages.create("probe_stage", s"file://$dir", "PARQUET")
    // run a query before register so history has an entry
    spark.sql("SELECT 1").collect()
    SystemTables.register(spark)

    val vc = spark.sql(
      s"SELECT stored_column FROM system_virtual_columns WHERE table_path like '%${new java.io.File(dir).getName}%' ORDER BY json_path")
      .collect().map(_.getString(0))
    assert(vc.length == 2 && vc.forall(_.startsWith("__virt_props_")))

    val st = spark.sql(
      s"SELECT offset, table_version, has_data FROM system_streams WHERE name = 's6probe'").collect()
    assert(st.length == 1)
    assert(st(0).getLong(0) == 0 && st(0).getLong(1) == 1 && st(0).getBoolean(2))

    assert(spark.sql(
      "SELECT url FROM system_stages WHERE name = 'probe_stage'").count() == 1)
    SystemTables.Stages.drop("probe_stage")

    // query history captured the collect() above (listener events drain
    // asynchronously — allow a short settle)
    Thread.sleep(500)
    SystemTables.register(spark)
    assert(spark.sql(
      "SELECT * FROM system_query_history WHERE status = 'Finished'").count() >= 1)

    // misc new views
    assert(spark.sql("SELECT * FROM system_catalogs").count() >= 1)
    assert(spark.sql("SELECT * FROM system_users").count() == 1)
    assert(spark.sql("SELECT * FROM system_roles").count() == 2)
    assert(spark.sql("SELECT * FROM system_zero").count() == 0)
    assert(spark.sql("SELECT num_cached_plans FROM system_query_cache").count() == 1)

    // information_schema mapping
    Seq((9, "z")).toDF("a", "b").createOrReplaceTempView("infoschema_probe")
    SystemTables.register(spark)
    assert(spark.sql(
      "SELECT table_type FROM information_schema_tables WHERE table_name = 'infoschema_probe'")
      .head().getString(0) == "BASE TABLE")
    val cols = spark.sql(
      "SELECT column_name, is_nullable FROM information_schema_columns WHERE table_name = 'infoschema_probe' ORDER BY column_name")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cols == Seq(("a", "NO"), ("b", "YES"))) // Int col is non-nullable
    assert(spark.sql(
      "SELECT * FROM information_schema_schemata WHERE schema_name = 'default'").count() == 1)
    assert(spark.sql(
      "SELECT * FROM information_schema_keywords WHERE keyword = 'SELECT' AND reserved = 1").count() == 1)
  }

  test("round-6 second breadth: configs/statistics/table_functions/user_functions/query_log/backtrace/locks/dictionaries/clustering_history and empty-shaped views") {
    import spark.implicits._
    import graft.operators.SystemTables
    import graft.sources.GraftTable
    val dir = tmp()
    val t = GraftTable.open(spark, dir)
    t.append((1 to 100).map(i => (i.toLong, i % 5)).toDF("k", "g"))
    t.analyze()
    t.recluster(Seq("k"), numFiles = 2)
    SystemTables.Dictionaries.create("color_names", s"file://$dir", "k", "g")
    val seqProbe = graft.operators.AsyncFns.createSequence(dir, "sysseq_probe")
    seqProbe.nextval(Seq(1).toDF("x"), "id").collect() // takes the driver lock
    spark.sql("SELECT 2").collect()
    Thread.sleep(500)
    graft.functions.GraftFunctions.register(spark) // user_functions source
    SystemTables.register(spark)

    // node conf vs session settings are distinct views
    assert(spark.sql(
      "SELECT value FROM system_configs WHERE name = 'spark.app.name'").count() == 1)
    // statistics picked up the analyzed row count + post-recluster files
    val st = spark.sql(
      s"SELECT num_files, analyzed_rows FROM system_statistics WHERE table_path like '%${new java.io.File(dir).getName}%'")
      .head()
    assert(st.getInt(0) == 2 && st.getLong(1) == 100L)
    // the TVF inventory names the fuse introspection functions
    assert(spark.sql(
      "SELECT * FROM system_table_functions WHERE name = 'fuse_block'").count() == 1)
    // user_functions = registered-on-top-of-builtin only
    val uf = spark.sql("SELECT count(*) FROM system_user_functions").head().getLong(0)
    assert(uf > 200, s"only $uf user functions")
    assert(spark.sql(
      "SELECT * FROM system_user_functions WHERE name = 'bitmap_and'").count() == 1)
    assert(spark.sql(
      "SELECT * FROM system_user_functions WHERE name = 'abs'").count() == 0)
    // query_log: reference log_type shape over the same listener ring
    assert(spark.sql(
      "SELECT * FROM system_query_log WHERE log_type = 2").count() >= 1)
    // backtrace sees this very thread
    assert(spark.sql(
      "SELECT * FROM system_backtrace WHERE state = 'RUNNABLE'").count() >= 1)
    assert(spark.sql(
      "SELECT used_bytes FROM system_malloc_stats").count() >= 2)
    // locks: the sequence file lock registered above
    assert(spark.sql(
      "SELECT * FROM system_locks WHERE key like '%sysseq_probe%'").count() == 1)
    assert(spark.sql(
      "SELECT key_column FROM system_dictionaries WHERE name = 'color_names'")
      .head().getString(0) == "k")
    SystemTables.Dictionaries.drop("color_names")
    // clustering_history shows the RECLUSTER commit from the log
    assert(spark.sql(
      s"SELECT operation FROM system_clustering_history WHERE table_path like '%${new java.io.File(dir).getName}%'")
      .head().getString(0).startsWith("RECLUSTER-linear"))
    // temp_files is enumerable (may be empty on an idle local FS layout)
    assert(spark.sql("SELECT * FROM system_temp_files").count() >= 0)
    // empty-shaped single-user views: defined columns, zero rows
    for (v <- Seq("system_tags", "system_notifications",
        "system_notification_history", "system_password_policies"))
      assert(spark.sql(s"SELECT * FROM $v").count() == 0, v)
    assert(spark.sql("SELECT * FROM system_contributors").count() == 1)
    assert(spark.sql(
      "SELECT version FROM system_credits WHERE component = 'apache-spark'")
      .head().getString(0).startsWith("4."))
    // round-8 completions: constraints / malloc_stats_totals / query_execution
    assert(spark.sql("SELECT * FROM system_constraints").columns.toSeq ==
      Seq("database", "table", "name", "constraint_type", "expr"))
    assert(spark.sql(
      "SELECT used_bytes FROM system_malloc_stats_totals WHERE used_bytes > 0").count() >= 1)
    assert(spark.sql("SELECT * FROM system_query_execution").count() >= 1)
  }

  test("blocks and clustering_information introspect the data files") {
    import spark.implicits._
    import graft.operators.TableFunctions
    import graft.sources.GraftTable
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), "fuseblk").toString
    val df = (1 to 1000).map(i => (i.toLong, i % 7)).toDF("k", "g")
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val blk = TableFunctions.blocks(spark, t).collect()
    assert(blk.length == t.snapshot(t.currentVersion).files.length)
    assert(blk.map(_.getLong(2)).sum == 1000L) // footer row counts
    assert(blk.forall(_.getLong(1) > 0))

    // random layout: ranges overlap; after linear recluster they don't
    val before = TableFunctions.clusteringInformation(spark, t, "k").head()
    t.recluster(Seq("k"), numFiles = 4)
    val after = TableFunctions.clusteringInformation(spark, t, "k").head()
    assert(before.getDouble(3) > 0.0, s"expected overlaps before: $before")
    assert(after.getDouble(3) == 0.0, s"expected none after: $after")
    assert(after.getDouble(4) == 1.0) // depth 1 = perfectly clustered
    assert(after.getLong(1) == 4L)
  }

  test("snapshots exposes the table's version chain") {
    import spark.implicits._
    val t = GraftTable.create(spark, tmp(), Seq((1, "a")).toDF("k", "v"))
    t.append(Seq((2, "b")).toDF("k", "v"))
    t.delete(org.apache.spark.sql.functions.col("k") === 1)
    val snaps = TableFunctions.snapshots(spark, t).collect()
    assert(snaps.length == t.versions.length)
    assert(snaps.map(_.getLong(0)).toSeq == t.versions)
    assert(snaps.map(_.getString(1)).contains("DELETE") ||
      snaps.map(_.getString(1)).exists(_.nonEmpty))
  }
}
