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
