package graft.sources

import java.io.File
import java.nio.file.{Files, Path, Paths}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Apache Paimon external-table reader (reference:
  * src/query/storages/paimon/ — table.rs/source.rs delegate to the
  * paimon-rust crate; this is a protocol-level re-implementation of the
  * public table format, like DeltaLake/IcebergLake):
  *
  *   snapshot/LATEST -> snapshot/snapshot-<id>          (JSON)
  *     -> baseManifestList + deltaManifestList          (avro, in manifest/)
  *       -> _FILE_NAME per ManifestFileMeta             (avro manifest)
  *         -> ManifestEntry {_KIND ADD|DELETE, _BUCKET, _FILE}
  *   schema/schema-<schemaId>                           (JSON field list)
  *
  * State = replay of base+delta entries: ADD inserts a data file,
  * DELETE (compactions, overwrites) removes it, keyed by the
  * UUID-unique file name. Paimon data files carry ALL table fields —
  * including partition columns (unlike hive-layout lakes) — so reads
  * are correct without decoding the BinaryRow `_PARTITION` key; the
  * partition bytes are only a pruning index, and this reader locates
  * files by a one-time directory walk instead (per-query driver-side
  * listing — at cluster scale a BinaryRow decoder would avoid the
  * walk; recorded as the v1 gap).
  *
  * Scope guards (loud, like the Iceberg reader): append-only tables
  * only (primaryKeys must be empty — PK tables need merge-on-read LSM
  * semantics), parquet/orc data files.
  */
object PaimonLake {

  private val mapper = new ObjectMapper()

  final case class State(snapshotId: Long, schema: StructType, files: Seq[String])

  // ---- schema ---------------------------------------------------------

  /** paimon SQL-style type string -> Spark type */
  private[graft] def paimonTypeToSpark(t0: String): (DataType, Boolean) = {
    var t = t0.trim.toUpperCase
    val nullable = !t.endsWith(" NOT NULL")
    if (!nullable) t = t.dropRight(" NOT NULL".length).trim
    val dec = "DECIMAL\\((\\d+)\\s*,\\s*(\\d+)\\)".r
    val dt = t match {
      case "INT" | "INTEGER" => IntegerType
      case "BIGINT" => LongType
      case "SMALLINT" => ShortType
      case "TINYINT" => ByteType
      case "STRING" => StringType
      case s if s.startsWith("VARCHAR") || s.startsWith("CHAR") => StringType
      case "DOUBLE" => DoubleType
      case "FLOAT" => FloatType
      case "BOOLEAN" => BooleanType
      case "DATE" => DateType
      // paimon TIMESTAMP is zone-less; WITH LOCAL TIME ZONE is the
      // instant type
      case s if s.startsWith("TIMESTAMP") && s.contains("LOCAL TIME ZONE") => TimestampType
      case s if s.startsWith("TIMESTAMP") => TimestampNTZType
      case dec(p, s) => DecimalType(p.toInt, s.toInt)
      case "BYTES" => BinaryType
      case s if s.startsWith("VARBINARY") || s.startsWith("BINARY") => BinaryType
      case other => throw new IllegalArgumentException(s"paimon type $other unsupported")
    }
    (dt, nullable)
  }

  private def sparkTypeToPaimon(t: DataType): String = t match {
    case IntegerType => "INT"
    case LongType => "BIGINT"
    case ShortType => "SMALLINT"
    case ByteType => "TINYINT"
    case StringType => "STRING"
    case DoubleType => "DOUBLE"
    case FloatType => "FLOAT"
    case BooleanType => "BOOLEAN"
    case DateType => "DATE"
    case TimestampType => "TIMESTAMP(6) WITH LOCAL TIME ZONE"
    case TimestampNTZType => "TIMESTAMP(6)"
    case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
    case BinaryType => "BYTES"
    case other => throw new IllegalArgumentException(s"paimon write: $other unsupported")
  }

  private def readSchema(table: String, schemaId: Long): (StructType, Seq[String], Seq[String]) = {
    val f = Paths.get(table, "schema", s"schema-$schemaId")
    require(Files.exists(f), s"paimon schema-$schemaId missing at $table")
    val node = mapper.readTree(new String(Files.readAllBytes(f), "UTF-8"))
    val fields = node.get("fields").elements().asScala.toSeq.map { fn =>
      val (dt, nullable) = paimonTypeToSpark(fn.get("type").asText)
      StructField(fn.get("name").asText, dt, nullable)
    }
    val partitionKeys =
      if (node.has("partitionKeys")) node.get("partitionKeys").elements().asScala.map(_.asText).toSeq
      else Nil
    val primaryKeys =
      if (node.has("primaryKeys")) node.get("primaryKeys").elements().asScala.map(_.asText).toSeq
      else Nil
    (StructType(fields), partitionKeys, primaryKeys)
  }

  // ---- snapshot chain -------------------------------------------------

  private def latestSnapshotId(table: String): Long = {
    val hint = Paths.get(table, "snapshot", "LATEST")
    if (Files.exists(hint)) new String(Files.readAllBytes(hint), "UTF-8").trim.toLong
    else {
      val snaps = Files.list(Paths.get(table, "snapshot")).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith("snapshot-")).toSeq
      require(snaps.nonEmpty, s"no paimon snapshots at $table")
      snaps.map(_.stripPrefix("snapshot-").toLong).max
    }
  }

  private def avroRecords(file: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](new File(file), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toSeq
    finally reader.close()
  }

  private def fieldLong(r: GenericRecord, name: String, dflt: Long): Long =
    if (r.getSchema.getField(name) == null || r.get(name) == null) dflt
    else r.get(name).asInstanceOf[Number].longValue

  /** manifest file names from one manifest-list avro (names are
    * relative to <table>/manifest/)
    */
  private def manifestNames(table: String, listName: String): Seq[String] = {
    if (listName == null || listName.isEmpty) return Nil
    val p = Paths.get(table, "manifest", listName)
    require(Files.exists(p), s"paimon manifest list $listName missing at $table")
    avroRecords(p.toString).map(_.get("_FILE_NAME").toString)
  }

  def state(table: String, snapshotId: Option[Long] = None): State = {
    val sid = snapshotId.getOrElse(latestSnapshotId(table))
    val sf = Paths.get(table, "snapshot", s"snapshot-$sid")
    require(Files.exists(sf), s"paimon snapshot $sid not found at $table")
    val snap = mapper.readTree(new String(Files.readAllBytes(sf), "UTF-8"))
    val (schema, _, primaryKeys) = readSchema(table, snap.get("schemaId").asLong)
    require(primaryKeys.isEmpty,
      s"paimon primary-key table unsupported (merge-on-read LSM semantics): keys=${primaryKeys.mkString(",")}")

    val lists =
      Option(snap.get("baseManifestList")).filterNot(_.isNull).map(_.asText).toSeq ++
        Option(snap.get("deltaManifestList")).filterNot(_.isNull).map(_.asText).toSeq
    // replay ADD/DELETE; file names are uuid-unique across the table
    val live = mutable.LinkedHashMap.empty[String, Unit]
    for (list <- lists; mf <- manifestNames(table, list);
         entry <- avroRecords(Paths.get(table, "manifest", mf).toString)) {
      val kind = fieldLong(entry, "_KIND", 0L).toInt
      val file = entry.get("_FILE").asInstanceOf[GenericRecord]
      val name = file.get("_FILE_NAME").toString
      if (kind == 0) live.put(name, ())
      else live.remove(name) // 1 = DELETE
    }

    // locate data files: one walk of the table dir (partition dirs +
    // bucket-<n>/); avoids decoding the BinaryRow partition key
    val wanted = live.keySet
    val found = mutable.Map.empty[String, String]
    if (wanted.nonEmpty) {
      val walk = Files.walk(Paths.get(table))
      try walk.iterator().asScala.foreach { p =>
        val n = p.getFileName.toString
        if (wanted.contains(n)) found(n) = p.toString
      } finally walk.close()
    }
    val missing = wanted.diff(found.keySet)
    require(missing.isEmpty, s"paimon data files missing on disk: ${missing.take(5).mkString(",")}")
    val bad = found.values.filterNot(f => f.endsWith(".parquet") || f.endsWith(".orc"))
    require(bad.isEmpty, s"paimon non-parquet/orc data files unsupported: ${bad.take(3).mkString(",")}")
    State(sid, schema, live.keysIterator.map(found).toSeq)
  }

  /** read the table at `snapshotId` (default: LATEST) */
  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    val st = state(table, snapshotId)
    if (st.files.isEmpty)
      spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    else {
      val (orc, parquet) = st.files.partition(_.endsWith(".orc"))
      val parts = Seq(
        if (parquet.nonEmpty) Some(spark.read.schema(st.schema).parquet(parquet: _*)) else None,
        if (orc.nonEmpty) Some(spark.read.schema(st.schema).orc(orc: _*)) else None).flatten
      parts.reduce(_ unionByName _)
    }
  }

  // ---- minimal writer (metadata-only; data files via Spark) -----------
  // Enough protocol surface to build real layouts for the gate query
  // and the spec's round-trips; an unpartitioned append-only bucket-0
  // table, matching what the reader supports.

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"record","namespace":"org.apache.paimon.avro.generated","fields":[
      |{"name":"_VERSION","type":"int"},
      |{"name":"_KIND","type":"int"},
      |{"name":"_PARTITION","type":"bytes"},
      |{"name":"_BUCKET","type":"int"},
      |{"name":"_TOTAL_BUCKETS","type":"int"},
      |{"name":"_FILE","type":{"type":"record","name":"file","fields":[
      |  {"name":"_FILE_NAME","type":"string"},
      |  {"name":"_FILE_SIZE","type":"long"},
      |  {"name":"_ROW_COUNT","type":"long"},
      |  {"name":"_MIN_SEQUENCE_NUMBER","type":"long"},
      |  {"name":"_MAX_SEQUENCE_NUMBER","type":"long"},
      |  {"name":"_SCHEMA_ID","type":"long"},
      |  {"name":"_LEVEL","type":"int"},
      |  {"name":"_CREATION_TIME","type":"long"}]}}]}""".stripMargin)

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"record","namespace":"org.apache.paimon.avro.generated","fields":[
      |{"name":"_VERSION","type":"int"},
      |{"name":"_FILE_NAME","type":"string"},
      |{"name":"_FILE_SIZE","type":"long"},
      |{"name":"_NUM_ADDED_FILES","type":"long"},
      |{"name":"_NUM_DELETED_FILES","type":"long"},
      |{"name":"_SCHEMA_ID","type":"long"}]}""".stripMargin)

  private def writeAvro(file: Path, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file.toFile)
    try records.foreach(w.append)
    finally w.close()
  }

  private[sources] def manifestEntry(kind: Int, name: String, size: Long, rows: Long,
      schemaId: Long): GenericRecord = {
    val file = new GenericData.Record(manifestEntrySchema.getField("_FILE").schema())
    file.put("_FILE_NAME", name)
    file.put("_FILE_SIZE", size)
    file.put("_ROW_COUNT", rows)
    file.put("_MIN_SEQUENCE_NUMBER", 0L)
    file.put("_MAX_SEQUENCE_NUMBER", rows)
    file.put("_SCHEMA_ID", schemaId)
    file.put("_LEVEL", 0)
    file.put("_CREATION_TIME", 0L)
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("_VERSION", 2)
    e.put("_KIND", kind)
    e.put("_PARTITION", java.nio.ByteBuffer.wrap(Array.emptyByteArray))
    e.put("_BUCKET", 0)
    e.put("_TOTAL_BUCKETS", 1)
    e.put("_FILE", file)
    e
  }

  private[sources] def manifestListEntry(name: String, added: Long, deleted: Long,
      schemaId: Long): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("_VERSION", 2)
    r.put("_FILE_NAME", name)
    r.put("_FILE_SIZE", 0L)
    r.put("_NUM_ADDED_FILES", added)
    r.put("_NUM_DELETED_FILES", deleted)
    r.put("_SCHEMA_ID", schemaId)
    r
  }

  /** append `df` as a new snapshot; returns the snapshot id */
  def write(spark: SparkSession, table: String, df: DataFrame): Long = {
    val root = Paths.get(table)
    Files.createDirectories(root.resolve("schema"))
    Files.createDirectories(root.resolve("snapshot"))
    Files.createDirectories(root.resolve("manifest"))
    Files.createDirectories(root.resolve("bucket-0"))

    val schemaFile = root.resolve("schema").resolve("schema-0")
    if (!Files.exists(schemaFile)) {
      val node = mapper.createObjectNode()
      node.put("version", 3)
      node.put("id", 0L)
      val fields = node.putArray("fields")
      df.schema.fields.zipWithIndex.foreach { case (f, i) =>
        val fn: ObjectNode = fields.addObject()
        fn.put("id", i)
        fn.put("name", f.name)
        fn.put("type", sparkTypeToPaimon(f.dataType) + (if (f.nullable) "" else " NOT NULL"))
      }
      node.put("highestFieldId", df.schema.length - 1)
      node.putArray("partitionKeys")
      node.putArray("primaryKeys")
      node.putObject("options")
      Files.write(schemaFile, mapper.writeValueAsBytes(node))
    }

    val prevId =
      if (Files.exists(root.resolve("snapshot").resolve("LATEST"))) latestSnapshotId(table) else 0L
    val snapId = prevId + 1

    // data: spark-write to scratch, move parts under bucket-0
    val scratch = Files.createTempDirectory(root, ".stage")
    df.coalesce(1).write.mode("overwrite").parquet(scratch.resolve("out").toString)
    val parts = Files.list(scratch.resolve("out")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val uuid = java.util.UUID.randomUUID().toString
    val dataFiles = parts.zipWithIndex.map { case (p, i) =>
      val name = s"data-$uuid-$i.parquet"
      Files.move(p, root.resolve("bucket-0").resolve(name))
      (name, Files.size(root.resolve("bucket-0").resolve(name)))
    }
    Files.walk(scratch).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    val rowCount = df.count()

    // delta manifest with the ADDs
    val manifestName = s"manifest-$uuid-0.avro"
    writeAvro(root.resolve("manifest").resolve(manifestName), manifestEntrySchema,
      dataFiles.map { case (n, sz) => manifestEntry(0, n, sz, rowCount, 0L) })

    // base list = all manifests of the previous snapshot's state
    val baseManifests: Seq[String] =
      if (prevId == 0) Nil
      else {
        val prev = mapper.readTree(new String(
          Files.readAllBytes(root.resolve("snapshot").resolve(s"snapshot-$prevId")), "UTF-8"))
        Seq(prev.get("baseManifestList").asText, prev.get("deltaManifestList").asText)
          .flatMap(manifestNames(table, _))
      }
    val baseList = s"manifest-list-$uuid-0.avro"
    val deltaList = s"manifest-list-$uuid-1.avro"
    writeAvro(root.resolve("manifest").resolve(baseList), manifestListSchema,
      baseManifests.map(manifestListEntry(_, 0L, 0L, 0L)))
    writeAvro(root.resolve("manifest").resolve(deltaList), manifestListSchema,
      Seq(manifestListEntry(manifestName, dataFiles.length.toLong, 0L, 0L)))

    val snap = mapper.createObjectNode()
    snap.put("version", 3)
    snap.put("id", snapId)
    snap.put("schemaId", 0L)
    snap.put("baseManifestList", baseList)
    snap.put("deltaManifestList", deltaList)
    snap.putNull("changelogManifestList")
    snap.put("commitUser", "graft")
    snap.put("commitIdentifier", snapId)
    snap.put("commitKind", "APPEND")
    snap.put("timeMillis", 0L)
    snap.put("totalRecordCount", 0L)
    snap.put("deltaRecordCount", rowCount)
    Files.write(root.resolve("snapshot").resolve(s"snapshot-$snapId"),
      mapper.writeValueAsBytes(snap))
    Files.write(root.resolve("snapshot").resolve("LATEST"),
      snapId.toString.getBytes("UTF-8"))
    snapId
  }
}
