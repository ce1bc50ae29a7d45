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
  * v2 merge-on-read deletes are applied with sequence-number scoping:
  *  - positional (data_file.content=1): rows of (file_path, pos) per
  *    the spec, anti-joined against the data scan's per-file row
  *    ordinals (`_metadata.row_index` — no synthetic id shuffle) for
  *    data files with sequence number <= the delete's;
  *  - equality (data_file.content=2): null-safe match on the delete
  *    file's equality_ids columns, applied to data files with a
  *    STRICTLY smaller sequence number, so re-inserts of a deleted
  *    key in later commits survive.
  * All delete sides are delete-set-sized and broadcast; the data scan
  * stays one parquet read.
  */
object IcebergLake {
  private val mapper = new ObjectMapper()

  /** one equality-delete file: path, its data sequence number, and the
    * top-level column names its equality_ids resolve to
    */
  final case class EqDelete(path: String, seq: Long, cols: Seq[String])

  final case class State(snapshotId: Long, schema: StructType, files: Seq[String],
                         posDeletes: Seq[String] = Seq.empty,
                         fileSeqs: Map[String, Long] = Map.empty,
                         posDeleteSeqs: Map[String, Long] = Map.empty,
                         eqDeletes: Seq[EqDelete] = Seq.empty)

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
        // carry the iceberg field id so the parquet scan can resolve
        // columns BY ID (the iceberg contract — names are mutable,
        // ids are not; spec "Column Projection"). Spark honors
        // `parquet.field.id` metadata when
        // spark.sql.parquet.fieldId.read.enabled is set; files
        // without embedded ids fall back to name matching.
        val md = new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", f.get("id").asLong).build()
        StructField(f.get("name").asText, icebergTypeToSpark(f.get("type")),
          nullable = !f.get("required").asBoolean, metadata = md)
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
      val cands = graft.Fs.list(metadataDir(table)).iterator
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

    // top-level field id -> column name, for equality_ids resolution
    val idToName: Map[Int, String] = schemaNode.get("fields").elements().asScala
      .map(f => f.get("id").asInt -> f.get("name").asText).toMap

    // manifests: v2 manifest-list avro; v1 may inline `manifests`.
    // Each manifest carries its data sequence number (v2 inheritance:
    // entries without an explicit sequence_number inherit it).
    val manifestPaths: Seq[(String, Int, Long)] =
      if (snap.has("manifest-list")) {
        avroRecords(resolve(table, snap.get("manifest-list").asText)).map { r =>
          val content = fieldLong(r, "content", 0L).toInt
          val seq = fieldLong(r, "sequence_number", 0L)
          (resolve(table, r.get("manifest_path").toString), content, seq)
        }
      } else {
        snap.get("manifests").elements().asScala.toSeq
          .map(p => (resolve(table, p.asText), 0, 0L))
      }
    val out = mutable.ArrayBuffer.empty[(String, Long)]
    val posDeletes = mutable.ArrayBuffer.empty[(String, Long)]
    val eqDeletes = mutable.ArrayBuffer.empty[EqDelete]
    for ((mp, manifestContent, manifestSeq) <- manifestPaths; entry <- avroRecords(mp)) {
      val status = fieldLong(entry, "status", 0L).toInt
      if (status != 2) { // 2 = DELETED
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val content = fieldLong(df, "content", 0L).toInt
        val fmt = Option(df.get("file_format")).map(_.toString.toUpperCase).getOrElse("PARQUET")
        require(fmt == "PARQUET", s"iceberg $fmt data files unsupported")
        val entrySeq = fieldLong(entry, "sequence_number", manifestSeq)
        (manifestContent, content) match {
          case (0, 0) => out += ((resolve(table, df.get("file_path").toString), entrySeq))
          case (_, 1) => posDeletes += ((resolve(table, df.get("file_path").toString), entrySeq))
          case (_, 2) =>
            val eqIdsField = df.getSchema.getField("equality_ids")
            require(eqIdsField != null && df.get("equality_ids") != null,
              s"iceberg equality delete without equality_ids: ${df.get("file_path")}")
            val ids = df.get("equality_ids").asInstanceOf[java.util.List[_]]
              .asScala.map(_.asInstanceOf[Number].intValue).toSeq
            val cols = ids.map(id => idToName.getOrElse(id,
              throw new IllegalArgumentException(
                s"iceberg equality_id $id is not a top-level column (nested equality deletes unsupported)")))
            eqDeletes += EqDelete(resolve(table, df.get("file_path").toString), entrySeq, cols)
          case (mc, c) => throw new IllegalArgumentException(
            s"iceberg manifest content=$mc data_file content=$c unsupported")
        }
      }
    }
    State(targetSnap, schema, out.map(_._1).toSeq, posDeletes.map(_._1).toSeq,
      out.toMap, posDeletes.toMap, eqDeletes.toSeq)
  }

  private def normPath(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.regexp_replace(c, "^file:/+", "/")

  /** read the table at `snapshotId` (default: current snapshot),
    * applying positional deletes
    */
  /** does this parquet file's footer carry field ids on any column? */
  private def filesEmbedFieldIds(spark: SparkSession, file: String): Boolean = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), spark.sessionState.newHadoopConf())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try r.getFileMetaData.getSchema.getFields.asScala.exists(_.getId != null)
    finally r.close()
  }

  private def stripFieldIds(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val dt = f.dataType match {
        case st: StructType => stripFieldIds(st)
        case other => other
      }
      StructField(f.name, dt, f.nullable)
    })

  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions._
    val st = state(table, snapshotId)
    if (st.files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    // iceberg resolves columns by FIELD ID, not name (spec "Column
    // Projection") — renamed columns keep their id. Real iceberg
    // writers always embed parquet field ids; probe the first file's
    // footer and resolve by id when they are there (the requested
    // schema carries parquet.field.id metadata), by name otherwise
    // (Spark's ignoreMissing mode would return silent NULLs, never use
    // it). Mixed id/no-id file sets don't occur in spec tables.
    val useIds = filesEmbedFieldIds(spark, st.files.head)
    val readSchema = if (useIds) st.schema else stripFieldIds(st.schema)
    if (useIds) spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val data = spark.read.schema(readSchema).parquet(st.files: _*)
    if (st.posDeletes.isEmpty && st.eqDeletes.isEmpty) return data

    def normKey(p: String) = p.replaceFirst("^file:/+", "/")
    // data rows tagged with their file's data sequence number (v2
    // scoping): the path->seq map is driver-known and tiny, attached
    // with one broadcast join — no data shuffle
    val seqDf = broadcast(
      spark.createDataFrame(st.fileSeqs.toSeq.map { case (p, s) => (normKey(p), s) })
        .toDF("__sp", "__seq"))
    var cur = data
      .withColumn("__path", normPath(col("_metadata.file_path")))
      .withColumn("__pos", col("_metadata.row_index"))
      .join(seqDf, col("__path") === col("__sp"), "left").drop("__sp")

    if (st.posDeletes.nonEmpty) {
      // spec: position delete files carry (file_path, pos = row ordinal
      // within that file) and apply to data files with data sequence
      // number <= the delete's; `_metadata.row_index` is the scan-side
      // ordinal, so the apply is one anti-join keyed on normalized
      // path + position — delete-set-sized right side, no data shuffle
      val delSeqDf = broadcast(
        spark.createDataFrame(st.posDeleteSeqs.toSeq.map { case (p, s) => (normKey(p), s) })
          .toDF("__dsp", "__dseq"))
      val dels = spark.read.parquet(st.posDeletes: _*)
        .withColumn("__dfile", normPath(col("_metadata.file_path")))
        .join(delSeqDf, col("__dfile") === col("__dsp"))
        .select(normPath(col("file_path")).as("__del_path"),
          col("pos").as("__del_pos"), col("__dseq"))
      cur = cur.join(broadcast(dels),
        cur("__path") === dels("__del_path") && cur("__pos") === dels("__del_pos") &&
          cur("__seq") <= dels("__dseq"),
        "left_anti")
    }

    // equality deletes (content=2): a row is deleted when an equality
    // delete row null-safe-matches it on the delete file's equality_ids
    // columns AND the delete's sequence number is strictly greater than
    // the data file's (spec: rows written in the same or a later commit
    // are not affected — re-inserts survive). One broadcast anti-join
    // per distinct equality column set.
    for ((cols, group) <- st.eqDeletes.groupBy(_.cols)) {
      val delSeqDf = broadcast(
        spark.createDataFrame(group.map(d => (normKey(d.path), d.seq)))
          .toDF("__dsp", "__dseq"))
      val dels = spark.read.parquet(group.map(_.path): _*)
        .withColumn("__dfile", normPath(col("_metadata.file_path")))
        .join(delSeqDf, col("__dfile") === col("__dsp"))
        .select(cols.map(c => col(c).as(s"__eq_$c")) :+ col("__dseq"): _*)
      val cond = cols.map(c => cur(c) <=> dels(s"__eq_$c")).reduce(_ && _) &&
        cur("__seq") < dels("__dseq")
      cur = cur.join(broadcast(dels), cond, "left_anti")
    }
    cur.drop("__path", "__pos", "__seq")
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
      |  {"name":"file_size_in_bytes","type":"long"},
      |  {"name":"equality_ids","type":["null",{"type":"array","items":"int"}],"default":null}]}}]}""".stripMargin)

  private val manifestListSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"content","type":"int"},
      |{"name":"sequence_number","type":"long","default":0},
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
      .map(r => (resolve(table, r.get("manifest_path").toString),
        fieldLong(r, "content", 0L).toInt, fieldLong(r, "sequence_number", 0L)))
    val snapId = cur + 1

    val delDir = Paths.get(table, "data", s"deletes-$snapId")
    deletes.select(col("file_path").cast("string"), col("pos").cast("long"))
      .coalesce(1).write.parquet(delDir.toString)
    val delFiles = graft.Fs.walk(delDir).iterator
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

    val mlRecords = (prevManifests :+ ((manifestPath.toAbsolutePath.toString, 1, snapId)))
      .map { case (p, c, sq) =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", p)
        r.put("manifest_length", Files.size(Paths.get(p)))
        r.put("content", c)
        r.put("sequence_number", sq)
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

  /** commit an equality-delete snapshot: `deletes` must contain exactly
    * the `eqCols` columns; a content=2 manifest with the columns'
    * schema field ids as equality_ids rides the new snapshot. Rows
    * matching any delete row on the equality columns are dropped for
    * data files with a strictly smaller sequence number (v2 spec —
    * later re-inserts of the same key survive).
    */
  def writeEqualityDeletes(spark: SparkSession, table: String,
                           deletes: DataFrame, eqCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    require(eqCols.nonEmpty, "equality delete needs at least one column")
    val mdir = metadataDir(table)
    val hint = mdir.resolve("version-hint.text")
    require(Files.exists(hint), s"no iceberg table at $table")
    val v = new String(Files.readAllBytes(hint), "UTF-8").trim.toInt
    val md = mapper.readTree(new String(Files.readAllBytes(mdir.resolve(s"v$v.metadata.json")), "UTF-8"))
    val cur = md.get("current-snapshot-id").asLong
    val snap = md.get("snapshots").elements().asScala
      .find(_.get("snapshot-id").asLong == cur).get
    val prevManifests = avroRecords(resolve(table, snap.get("manifest-list").asText))
      .map(r => (resolve(table, r.get("manifest_path").toString),
        fieldLong(r, "content", 0L).toInt, fieldLong(r, "sequence_number", 0L)))
    val snapId = cur + 1

    // resolve the equality column names to schema field ids
    val schemaNode = md.get("schemas").elements().asScala
      .find(_.get("schema-id").asInt == md.get("current-schema-id").asInt).get
    val nameToId = schemaNode.get("fields").elements().asScala
      .map(f => f.get("name").asText -> f.get("id").asInt).toMap
    val eqIds = eqCols.map(c => nameToId.getOrElse(c,
      throw new IllegalArgumentException(s"equality column $c not in table schema")))

    val delDir = Paths.get(table, "data", s"eq-deletes-$snapId")
    deletes.select(eqCols.map(col): _*)
      .coalesce(1).write.parquet(delDir.toString)
    val delFiles = graft.Fs.walk(delDir).iterator
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)

    val entries = delFiles.map { p =>
      val e = new GenericData.Record(manifestEntrySchema)
      e.put("status", 1) // ADDED
      val d = new GenericData.Record(manifestEntrySchema.getField("data_file").schema())
      d.put("content", 2) // EQUALITY_DELETES
      d.put("file_path", p.toAbsolutePath.toString)
      d.put("file_format", "PARQUET")
      d.put("record_count", 0L)
      d.put("file_size_in_bytes", Files.size(p))
      d.put("equality_ids", eqIds.map(Int.box).asJava)
      e.put("data_file", d)
      e
    }
    val manifestPath = mdir.resolve(s"manifest-$snapId-eq-deletes.avro")
    writeAvro(manifestPath, manifestEntrySchema, entries)

    val mlRecords = (prevManifests :+ ((manifestPath.toAbsolutePath.toString, 1, snapId)))
      .map { case (p, c, sq) =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", p)
        r.put("manifest_length", Files.size(Paths.get(p)))
        r.put("content", c)
        r.put("sequence_number", sq)
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
    // same id-vs-name resolution rule as read(): Spark 4 enables
    // parquet.field.id matching by default, and an id-annotated request
    // schema over id-less files is a hard error
    val delSchema =
      if (filesEmbedFieldIds(spark, st.files.head)) st.schema
      else stripFieldIds(st.schema)
    val rows = spark.read.schema(delSchema).parquet(st.files: _*)
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
          .map(r => (resolve(table, r.get("manifest_path").toString),
            fieldLong(r, "content", 0L).toInt, fieldLong(r, "sequence_number", 0L)))
        val olds = md.get("snapshots").elements().asScala.toSeq
        (v, mls, olds, cur + 1)
      } else (0, Seq.empty[(String, Int, Long)], Seq.empty[JsonNode], 1L)

    // data files
    val dataDir = Paths.get(table, "data", s"snap-$snapId")
    df.write.parquet(dataDir.toString)
    val dataFiles = graft.Fs.walk(dataDir).iterator
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

    // manifest list = previous manifests (keeping their sequence
    // numbers) + the new one at this snapshot's sequence
    val mlRecords = (prevManifests :+ ((manifestPath.toAbsolutePath.toString, 0, snapId)))
      .map { case (p, c, sq) =>
        val r = new GenericData.Record(manifestListSchema)
        r.put("manifest_path", p)
        r.put("manifest_length", Files.size(Paths.get(p)))
        r.put("content", c)
        r.put("sequence_number", sq)
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
