package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.GraftTable

/** Introspection table functions (reference:
  * src/query/service/src/table_functions/ — `list_stage`,
  * `infer_schema`, `fuse_snapshot`/`fuse_block` fuse introspection).
  * Each returns a DataFrame so results compose with any query.
  */
object TableFunctions {

  /** LIST @stage — one row per file under a stage directory
    * (name, size, last_modified). Reference: list_stage TVF.
    */
  def listStage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = java.nio.file.Paths.get(dir)
    val files =
      if (!java.nio.file.Files.isDirectory(base)) Seq.empty
      else {
        val s = java.nio.file.Files.walk(base)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala
            .filter(java.nio.file.Files.isRegularFile(_))
            .map { p =>
              (base.relativize(p).toString,
                java.nio.file.Files.size(p),
                new java.sql.Timestamp(
                  java.nio.file.Files.getLastModifiedTime(p).toMillis))
            }.toVector.sortBy(_._1)
        } finally s.close()
      }
    files.toDF("name", "size", "last_modified")
  }

  /** INFER_SCHEMA — one row per column of a stage file
    * (column_name, type, nullable, order_id). Reference: infer_schema
    * TVF over stage files.
    */
  def inferSchema(spark: SparkSession, path: String, format: String = "parquet")
      : DataFrame = {
    import spark.implicits._
    val reader = format.toLowerCase match {
      case "csv" => spark.read.option("header", "true").option("inferSchema", "true").csv(path)
      case "json" | "ndjson" => spark.read.json(path)
      case _ => spark.read.parquet(path)
    }
    reader.schema.fields.zipWithIndex.map { case (f, i) =>
      (f.name, f.dataType.simpleString, f.nullable, i)
    }.toSeq.toDF("column_name", "type", "nullable", "order_id")
  }

  /** FUSE_SNAPSHOT — one row per snapshot of a graft table
    * (version, operation, file_count, timestamp). Reference:
    * fuse_snapshot introspection of the snapshot chain.
    */
  def snapshots(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    table.versions.map { v =>
      val s = table.snapshot(v)
      (v, s.operation, s.files.length.toLong, new java.sql.Timestamp(s.timestampMs))
    }.toDF("version", "operation", "file_count", "committed_at")
  }

  /** parquet footer (rowCount, byteSize, per-column chunks) for a
    * table file, driver-side metadata read only
    */
  private def footer(spark: SparkSession, table: GraftTable, f: String)
      : org.apache.parquet.hadoop.metadata.ParquetMetadata = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(s"${table.path}/$f")
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try reader.getFooter finally reader.close()
  }

  private def fileRows(spark: SparkSession, table: GraftTable, f: String): Long = {
    import scala.jdk.CollectionConverters._
    footer(spark, table, f).getBlocks.asScala.map(_.getRowCount).sum
  }

  /** FUSE_SNAPSHOT with the reference's column names
    * (fuse_snapshot.rs): latest snapshot first; the 1-file-per-segment
    * storage model makes segment_count == block_count == file count.
    * Row counts come from parquet footers (driver-side metadata only,
    * cached per file across the version chain).
    */
  def fuseSnapshot(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    val rowCache = scala.collection.mutable.HashMap[String, Long]()
    val sizeCache = scala.collection.mutable.HashMap[String, Long]()
    table.versions.sorted.reverse.map { v =>
      val s = table.snapshot(v)
      val rows = s.files.map(f =>
        rowCache.getOrElseUpdate(f, fileRows(spark, table, f))).sum
      val bytes = s.files.map(f => sizeCache.getOrElseUpdate(f,
        java.nio.file.Files.size(java.nio.file.Paths.get(table.path, f)))).sum
      (v.toString, s"${table.path}/_graft_log/$v.json", 1,
        if (v > 0) (v - 1).toString else null,
        s.files.length.toLong, s.files.length.toLong, rows, bytes,
        new java.sql.Timestamp(s.timestampMs), s.operation)
    }.toDF("snapshot_id", "snapshot_location", "format_version",
      "previous_snapshot_id", "segment_count", "block_count", "row_count",
      "bytes_compressed", "timestamp", "operation")
  }

  /** FUSE_SEGMENT (fuse_segment.rs): one row per segment of the
    * current snapshot — 1:1 with data files here.
    */
  def fuseSegment(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    val v = table.currentVersion
    val s = table.snapshot(v)
    s.files.map { f =>
      (v.toString, f, 1, 1L,
        fileRows(spark, table, f),
        java.nio.file.Files.size(java.nio.file.Paths.get(table.path, f)))
    }.toDF("snapshot_id", "segment_location", "format_version",
      "block_count", "row_count", "bytes_compressed")
  }

  /** FUSE_COLUMN (fuse_column.rs): per-block per-column chunk stats
    * from parquet footers.
    */
  def fuseColumn(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val v = table.currentVersion
    val s = table.snapshot(v)
    val schema = table.read().schema
    s.files.flatMap { f =>
      val ft = footer(spark, table, f)
      val rows = ft.getBlocks.asScala.map(_.getRowCount).sum
      val size = java.nio.file.Files.size(java.nio.file.Paths.get(table.path, f))
      ft.getBlocks.asScala.flatMap { b =>
        b.getColumns.asScala.map { c =>
          val name = c.getPath.toDotString
          val sparkType = schema.fields.find(_.name == name)
            .map(_.dataType.simpleString).getOrElse(c.getPrimitiveType.toString)
          (v.toString, f, size, rows, name, sparkType,
            c.getStartingPos, c.getTotalSize, c.getValueCount)
        }
      }
    }.toDF("snapshot_id", "block_location", "file_size", "row_count",
      "column_name", "column_type", "block_offset", "bytes_compressed",
      "column_row_count")
  }

  /** FUSE_STATISTIC (fuse_statistic.rs): ANALYZE-computed per-column
    * NDV; empty until ANALYZE TABLE runs (same as the reference).
    */
  def fuseStatistic(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    table.stats().toSeq.flatMap { st =>
      st.cols.toSeq.map { case (name, c) =>
        (name, c.ndv, c.nullCount, c.min, c.max)
      }
    }.toDF("column_name", "distinct_count", "null_count", "min", "max")
  }

  /** fuse_block analog: one row per data file of the current snapshot,
    * from parquet footers only — no data scan (reference
    * storages/fuse/src/table_functions/fuse_block.rs).
    */
  def blocks(spark: SparkSession, table: GraftTable): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val snap = table.snapshot(table.currentVersion)
    snap.files.map { f =>
      val p = new org.apache.hadoop.fs.Path(s"${table.path}/$f")
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val groups = reader.getFooter.getBlocks.asScala
        (f, java.nio.file.Files.size(java.nio.file.Paths.get(table.path, f)),
          groups.map(_.getRowCount).sum, groups.size)
      } finally reader.close()
    }.toDF("file_name", "size_bytes", "row_count", "row_groups")
  }

  /** clustering_information analog (reference
    * table_functions/clustering_information): per-file [min,max] of the
    * cluster key, then
    *   constant_block_count = files whose range is a single value,
    *   average_overlaps     = mean count of OTHER files intersecting a
    *                          file's range,
    *   average_depth        = mean number of files covering a file's
    *                          range start (1.0 = perfectly clustered).
    * The per-file extremes come from one scan of the key column only
    * (column pruning keeps it narrow); the overlap math is driver-side
    * over file-count-sized metadata.
    */
  /** clustering_statistics('db','t'): per-block cluster-key extremes
    * (reference fuse clustering_statistics TVF — min/max as the
    * cluster-key value array, level 0 in this flat-LSM-free model)
    */
  def clusteringStatistics(spark: SparkSession, table: GraftTable,
      keys: Seq[String]): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val aggs = keys.flatMap(k =>
      Seq(min(col(k)).as(s"mn_$k"), max(col(k)).as(s"mx_$k")))
    val rows = table.read().withColumn("__f", input_file_name())
      .groupBy(col("__f")).agg(aggs.head, aggs.tail: _*).collect()
    def arr(r: org.apache.spark.sql.Row, pre: String): String =
      keys.map(k => String.valueOf(r.getAs[Any](s"$pre$k")))
        .mkString("[", ",", "]")
    // deterministic block order (min ascending) — the reference lists
    // segments in commit order; UUID file names carry no order here
    rows.toSeq.map(r => (arr(r, "mn_"), arr(r, "mx_"), 0))
      .sortBy(_._1)
      .toDF("min", "max", "level")
  }

  def clusteringInformation(spark: SparkSession, table: GraftTable, key: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val perFile = table.read()
      .withColumn("__f", input_file_name())
      .groupBy(col("__f"))
      .agg(min(col(key).cast("double")).as("mn"), max(col(key).cast("double")).as("mx"))
      .collect()
      // a file whose key column is entirely NULL has null min/max:
      // it occupies no range, so it is excluded from the overlap math
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => (r.getDouble(1), r.getDouble(2)))
    val n = perFile.length
    val constant = perFile.count { case (a, b) => a == b }
    val avgOverlap = if (n == 0) 0.0 else {
      var total = 0L
      for (i <- perFile.indices; j <- perFile.indices if i != j) {
        val (a, b) = perFile(i); val (c, d) = perFile(j)
        if (c <= b && a <= d) total += 1
      }
      total.toDouble / n
    }
    val avgDepth = if (n == 0) 0.0 else {
      perFile.map { case (a, _) =>
        perFile.count { case (c, d) => c <= a && a <= d }
      }.sum.toDouble / n
    }
    Seq((key, n.toLong, constant.toLong,
      math.rint(avgOverlap * 10000) / 10000, math.rint(avgDepth * 10000) / 10000))
      .toDF("cluster_key", "total_block_count", "constant_block_count",
        "average_overlaps", "average_depth")
  }
}
