package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Apache Iceberg table reader (+ a minimal writer for tests/gate
  * queries) on the PUBLIC Iceberg table spec — the role of the
  * reference's iceberg storage (src/query/storages/iceberg/src/
  * table.rs), re-expressed as driver-side metadata replay in front of
  * ONE Spark parquet scan.
  *
  * Metadata chain (iceberg spec):
  *   metadata/v<N>.metadata.json  (or version-hint.text)
  *     -> current-snapshot-id -> snapshot.manifest-list   (avro)
  *       -> manifest_path per manifest                    (avro)
  *         -> entries {status, data_file{file_path, ...}}
  *
  * Unlike Delta, Iceberg data files physically contain every column
  * (identity partition values included), so the read is just the
  * reconstructed file list handed to one `spark.read.parquet` — no
  * partition re-attach join. Manifests/manifest-lists are read with
  * avro-core generic records by field NAME, so files written by real
  * Iceberg writers (which carry richer schemas) parse the same as the
  * minimal ones the test writer emits.
  *
  * v2 positional deletes are applied: delete manifests (content=1)
  * contribute position-delete parquet files — rows of (file_path, pos)
  * per the spec — and the read anti-joins them against the data scan's
  * per-file row ordinals (`_metadata.row_index`, so no synthetic id
  * shuffle; the join side is delete-set-sized and broadcasts under
  * AQE's size rule). Equality deletes (data_file.content=2) are still
  * rejected loudly — reading past them would silently resurrect
  * deleted rows.
  */
object IcebergLake {
  private val mapper = new ObjectMapper()

  final case class State(snapshotId: Long, schema: StructType, files: Seq[String],
                         posDeletes: Seq[String] = Seq.empty)

  // ---- schema translation (iceberg JSON <-> Spark) --------------------

  private def icebergTypeToSpark(t: JsonNode): DataType =
    if (t.isTextual) t.asText match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "timestamp" => TimestampNTZType // iceberg timestamp = no zone
      case "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")").split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case s if s.startsWith("fixed[") => BinaryType
      case other => throw new IllegalArgumentException(s"iceberg type $other unsupported")
    } else t.get("type").asText match {
      case "struct" => StructType(t.get("fields").elements().asScala.map { f =>
        StructField(f.get("name").asText, icebergTypeToSpark(f.get("type")),
          nullable = !f.get("required").asBoolean)
      }.toSeq)
      case "list" => ArrayType(icebergTypeToSpark(t.get("element")),
        containsNull = !t.get("element-required").asBoolean)
      case "map" => MapType(icebergTypeToSpark(t.get("key")),
        icebergTypeToSpark(t.get("value")),
        valueContainsNull = !t.get("value-required").asBoolean)
      case other => throw new IllegalArgumentException(s"iceberg type $other unsupported")
    }

  private def sparkTypeToIceberg(t: DataType, nextId: () => Int): Object = t match {
    case BooleanType => "boolean"
    case IntegerType | ShortType | ByteType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case DateType => "date"
    case TimestampNTZType => "timestamp"
    case TimestampType => "timestamptz"
    case StringType => "string"
    case BinaryType => "binary"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case s: StructType =>
      val n = mapper.createObjectNode()
      n.put("type", "struct")
      val fs = n.putArray("fields")
      s.fields.foreach { f =>
        val fn = fs.addObject()
        fn.put("id", nextId())
        fn.put("name", f.name)
        fn.put("required", !f.nullable)
        fn.putPOJO("type", sparkTypeToIceberg(f.dataType, nextId))
      }
      n
    case other => throw new IllegalArgumentException(s"iceberg write: $other unsupported")
  }

  // ---- metadata chain ------------------------------------------------

  private def metadataDir(table: String): Path = Paths.get(table, "metadata")

  private def currentMetadataFile(table: String): Path = {
    val hint = metadataDir(table).resolve("version-hint.text")
    if (Files.exists(hint)) {
      val v = new String(Files.readAllBytes(hint), "UTF-8").trim
      metadataDir(table).resolve(s"v$v.metadata.json")
    } else {
      val cands = Files.list(metadataDir(table)).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".metadata.json")).toSeq
      require(cands.nonEmpty, s"no iceberg metadata at $table")
      cands.maxBy(_.getFileName.toString)
    }
  }

  /** resolve a spec path (absolute file: URI or table-relative) */
  private def resolve(table: String, p: String): String = {
    val stripped =
      if (p.startsWith("file:")) p.replaceFirst("^file:/+", "/")
      else p
    if (stripped.startsWith("/")) stripped
    else Paths.get(table).toAbsolutePath.resolve(stripped).normalize.toString
  }

  private def avroRecords(file: String): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](new File(file), new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toSeq
    finally reader.close()
  }

  private def fieldLong(r: GenericRecord, name: String, dflt: Long): Long =
    if (r.getSchema.getField(name) == null || r.get(name) == null) dflt
    else r.get(name).asInstanceOf[Number].longValue

  def state(table: String, snapshotId: Option[Long] = None): State = {
    val md = mapper.readTree(new String(Files.readAllBytes(currentMetadataFile(table)), "UTF-8"))
    val formatVersion = md.get("format-version").asInt
    require(formatVersion <= 2, s"iceberg format-version $formatVersion unsupported")

    val targetSnap = snapshotId.getOrElse {
      require(md.has("current-snapshot-id") && md.get("current-snapshot-id").asLong != -1,
        s"iceberg table at $table has no current snapshot")
      md.get("current-snapshot-id").asLong
    }
    val snaps = md.get("snapshots").elements().asScala.toSeq
    val snap = snaps.find(_.get("snapshot-id").asLong == targetSnap)
      .getOrElse(throw new IllegalArgumentException(s"iceberg snapshot $targetSnap not found at $table"))

    // schema: v2 `schemas` + current-schema-id (snapshot may pin its own), v1 `schema`
    val schemaNode =
      if (md.has("schemas")) {
        val sid =
          if (snap.has("schema-id")) snap.get("schema-id").asInt
          else md.get("current-schema-id").asInt
        md.get("schemas").elements().asScala
          .find(_.get("schema-id").asInt == sid)
          .getOrElse(throw new IllegalArgumentException(s"iceberg schema-id $sid not found"))
      } else md.get("schema")
    val schema = icebergTypeToSpark(schemaNode).asInstanceOf[StructType]

    // manifests: v2 manifest-list avro; v1 may inline `manifests`
    val manifestPaths: Seq[(String, Int)] =
      if (snap.has("manifest-list")) {
        avroRecords(resolve(table, snap.get("manifest-list").asText)).map { r =>
          val content = fieldLong(r, "content", 0L).toInt
          (resolve(table, r.get("manifest_path").toString), content)
        }
      } else {
        snap.get("manifests").elements().asScala.toSeq
          .map(p => (resolve(table, p.asText), 0))
      }
    val out = mutable.ArrayBuffer.empty[String]
    val posDeletes = mutable.ArrayBuffer.empty[String]
    for ((mp, manifestContent) <- manifestPaths; entry <- avroRecords(mp)) {
      val status = fieldLong(entry, "status", 0L).toInt
      if (status != 2) { // 2 = DELETED
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val content = fieldLong(df, "content", 0L).toInt
        val fmt = Option(df.get("file_format")).map(_.toString.toUpperCase).getOrElse("PARQUET")
        require(fmt == "PARQUET", s"iceberg $fmt data files unsupported")
        (manifestContent, content) match {
          case (0, 0) => out += resolve(table, df.get("file_path").toString)
          case (_, 1) => posDeletes += resolve(table, df.get("file_path").toString)
          case (_, 2) => throw new IllegalArgumentException(
            s"iceberg equality deletes unsupported: ${df.get("file_path")}")
          case (mc, c) => throw new IllegalArgumentException(
            s"iceberg manifest content=$mc data_file content=$c unsupported")
        }
      }
    }
    State(targetSnap, schema, out.toSeq, posDeletes.toSeq)
  }

  private def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(c, "^file:/+", "/")

  /** read the table at `snapshotId` (default: current snapshot),
    * applying positional deletes
    */
  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val st = state(table, snapshotId)
    if (st.files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    val data = spark.read.schema(st.schema).parquet(st.files: _*)
    if (st.posDeletes.isEmpty) data
    else {
      // spec: position delete files carry (file_path, pos = row ordinal
      // within that file); `_metadata.row_index` is the scan-side
      // ordinal, so the apply is one anti-join keyed on normalized
      // path + position — delete-set-sized right side, no data shuffle
      val dels = spark.read.parquet(st.posDeletes: _*)
        .select(normPath(col("file_path")).as("__del_path"), col("pos").as("__del_pos"))
      val tagged = data
        .withColumn("__path", normPath(col("_metadata.file_path")))
        .withColumn("__pos", col("_metadata.row_index"))
      tagged.join(dels,
          tagged("__path") === dels("__del_path") && tagged("__pos") === dels("__del_pos"),
          "left_anti")
        .drop("__path", "__pos")
    }
  }

  // ---- minimal writer (metadata-only; data files via Spark) -----------

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
      |  {"name":"content","type":"int"},
      |  {"name":"file_path","type":"string"},
      |  {"name":"file_format","type":"string"},
      |  {"name":"record_count","type":"long"},
      |  {"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"content","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private def writeAvro(file: Path, schema: Schema, records: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, file.toFile)
    try records.foreach(w.append) finally w.close()
  }

  /** commit a positional-delete snapshot: `deletes` rows of
    * (file_path STRING, pos LONG) become a position-delete parquet +
    * a content=1 manifest chained onto the current snapshot's
    * manifests (v2 spec: delete files ride their own manifests)
    */
  def writePositionalDeletes(spark: SparkSession, table: String, deletes: DataFrame): Long = {
    import org.apache.spark.sql.functions.col
    val mdir = metadataDir(table)
    val hint = mdir.resolve("version-hint.text")
    require(Files.exists(hint), s"no iceberg table at $table")
    val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
    val md = mapper.readTree(new String(Files.readAllBytes(mdir.resolve(s"v$v.metadata.json")), "UTF-8"))
    val cur = md.get("current-snapshot-id").asLong
    val snap = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == cur).get
    val prevManifests = avroRecords(resolve(table, snap.get("manifest-list").asText))
      .map(r => (resolve(table, r.get("manifest_path").toString), fieldLong(r, "content", 0L).toInt))
    val snapId = cur + 1

    val delDir = Paths.get(table, "data", s"deletes-$snapId")
    deletes.select(col("file_path").cast("string"), col("pos").cast("long"))
      .coalesce(1).write.parquet(delDir.toString)
    val delFiles = Files.walk(delDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)

    val entries = delFiles.map { p =>
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      val d = new GenericData.Record(manifestEntrySchema.getField("data_file").schema())
      d.put("content", 1) // POSITION_DELETES
      d.put("file_path", p.toAbsolutePath.toString)
      d.put("file_format", "PARQUET")
      d.put("record_count", 0L)
      d.put("file_size_in_bytes", Files.size(p))
      e.put("data_file", d)
      e
    }
    val manifestPath = mdir.resolve(s"manifest-$snapId-deletes.avro")
    writeAvro(manifestPath, manifestEntrySchema, entries)

    val mlRecords = (prevManifests :+ (manifestPath.toAbsolutePath.toString, 1)).map { case (p, c) =>
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", Files.size(Paths.get(p)))
      r.put("content", c)
      r.put("added_snapshot_id", snapId)
      r
    }
    val mlPath = mdir.resolve(s"snap-$snapId-manifest-list.avro")
    writeAvro(mlPath, manifestListSchema, mlRecords)

    val nmd = md.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
    nmd.put("current-snapshot-id", snapId)
    val sn = nmd.withArray[com.fasterxml.jackson.databind.node.ArrayNode]("snapshots").addObject()
    sn.put("snapshot-id", snapId)
    sn.put("schema-id", nmd.get("current-schema-id").asInt)
    sn.put("timestamp-ms", System.currentTimeMillis())
    sn.put("manifest-list", mlPath.toAbsolutePath.toString)
    val newVersion = v + 1
    Files.write(mdir.resolve(s"v$newVersion.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(nmd))
    Files.write(hint, newVersion.toString.getBytes("UTF-8"))
    snapId
  }

  /** DELETE WHERE as positional deletes: scan once for the matching
    * (file, ordinal) pairs, commit them as a delete snapshot
    */
  def deleteWhere(spark: SparkSession, table: String,
                  cond: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    val st = state(table)
    require(st.files.nonEmpty, "deleteWhere on an empty table")
    val rows = spark.read.schema(st.schema).parquet(st.files: _*)
      .filter(cond)
      .select(normPath(col("_metadata.file_path")).as("file_path"),
        col("_metadata.row_index").as("pos"))
    writePositionalDeletes(spark, table, rows)
  }

  /** create (snapshot 1) or append (next snapshot) `df` as data files +
    * a new manifest, manifest list, and metadata version
    */
  def write(spark: SparkSession, table: String, df: DataFrame): Long = {
    val mdir = metadataDir(table)
    Files.createDirectories(mdir)
    val hint = mdir.resolve("version-hint.text")
    val (prevVersion, prevManifests, prevSnapshots, snapId) =
      if (Files.exists(hint)) {
        val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
        val md = mapper.readTree(new String(Files.readAllBytes(mdir.resolve(s"v$v.metadata.json")), "UTF-8"))
        val cur = md.get("current-snapshot-id").asLong
        val snap = md.get("snapshots").elements().asScala
          .find(_.get("snapshot-id").asLong == cur).get
        val mls = avroRecords(resolve(table, snap.get("manifest-list").asText))
          .map(r => (resolve(table, r.get("manifest_path").toString), fieldLong(r, "content", 0L).toInt))
        val olds = md.get("snapshots").elements().asScala.toSeq
        (v, mls, olds, cur + 1)
      } else (0, Seq.empty[(String, Int)], Seq.empty[JsonNode], 1L)

    // data files
    val dataDir = Paths.get(table, "data", s"snap-$snapId")
    df.write.parquet(dataDir.toString)
    val dataFiles = Files.walk(dataDir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)

    // new manifest for this snapshot's files
    val entries = dataFiles.map { p =>
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      val d = new GenericData.Record(manifestEntrySchema.getField("data_file").schema())
      d.put("content", 0)
      d.put("file_path", p.toAbsolutePath.toString)
      d.put("file_format", "PARQUET")
      d.put("record_count", 0L)
      d.put("file_size_in_bytes", Files.size(p))
      e.put("data_file", d)
      e
    }
    val manifestPath = mdir.resolve(s"manifest-$snapId.avro")
    writeAvro(manifestPath, manifestEntrySchema, entries)

    // manifest list = previous manifests + the new one
    val mlRecords = (prevManifests :+ (manifestPath.toAbsolutePath.toString, 0)).map { case (p, c) =>
      val r = new GenericData.Record(manifestListSchema)
      r.put("manifest_path", p)
      r.put("manifest_length", Files.size(Paths.get(p)))
      r.put("content", c)
      r.put("added_snapshot_id", snapId)
      r
    }
    val mlPath = mdir.resolve(s"snap-$snapId-manifest-list.avro")
    writeAvro(mlPath, manifestListSchema, mlRecords)

    // metadata json (v2 shape)
    val ids = new java.util.concurrent.atomic.AtomicInteger(0)
    val schemaNode = sparkTypeToIceberg(df.schema, () => ids.incrementAndGet())
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    schemaNode.put("schema-id", 0)
    val md = mapper.createObjectNode()
    md.put("format-version", 2)
    md.put("table-uuid", java.util.UUID.randomUUID().toString)
    md.put("location", Paths.get(table).toAbsolutePath.toString)
    md.put("current-schema-id", 0)
    md.set[JsonNode]("schemas", mapper.createArrayNode().add(schemaNode))
    md.put("current-snapshot-id", snapId)
    val snaps = md.putArray("snapshots")
    prevSnapshots.foreach(snaps.add)
    val sn = snaps.addObject()
    sn.put("snapshot-id", snapId)
    sn.put("schema-id", 0)
    sn.put("timestamp-ms", System.currentTimeMillis())
    sn.put("manifest-list", mlPath.toAbsolutePath.toString)
    val newVersion = prevVersion + 1
    Files.write(mdir.resolve(s"v$newVersion.metadata.json"),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(md))
    Files.write(hint, newVersion.toString.getBytes("UTF-8"))
    snapId
  }
}
