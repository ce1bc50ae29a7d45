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
}
