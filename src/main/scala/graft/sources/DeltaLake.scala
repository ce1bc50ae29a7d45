package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Delta Lake table reader (+ a minimal writer used by tests and the
  * correctness gate) implemented directly on the PUBLIC Delta
  * transaction-log protocol — the role of the reference's delta
  * storage (src/query/storages/delta/src/table.rs), re-expressed as a
  * log replay in front of ONE Spark parquet scan.
  *
  * Log anatomy (delta-io PROTOCOL.md):
  *  - `_delta_log/<20-digit version>.json` — newline-delimited actions
  *    (`protocol`, `metaData`, `add`, `remove`, `commitInfo`, `txn`)
  *  - `_delta_log/<v>.checkpoint.parquet` — compacted state at v,
  *    advertised by `_delta_log/_last_checkpoint`
  *  - `metaData.schemaString` IS Spark StructType JSON, so schema
  *    handling is `DataType.fromJson` — no translation layer
  *
  * Replay: start from the newest usable checkpoint (adds only —
  * checkpoint `remove` rows are vacuum tombstones, not state), then
  * apply JSON commits in version order; last action per file path
  * wins. Partition columns are NOT stored in delta data files, so the
  * read attaches them from `add.partitionValues` via a broadcast join
  * on `input_file_name()` — the whole table is still a single parquet
  * scan (pushdown/pruning intact), and the joined side is one tiny row
  * per data file. At 100 TB that is ~1e5-1e6 metadata rows — the same
  * driver-side state every Delta reader reconstructs.
  *
  * Reader guards: protocol minReaderVersion <= 2 semantics only —
  * tables using column mapping or deletion vectors are rejected
  * loudly rather than read wrongly.
  */
object DeltaLake {
  private val mapper = new ObjectMapper()

  final case class AddFile(path: String, partitionValues: Map[String, String])

  // checkpoint parquet row shapes (protocol checkpoint schema subset);
  // not `private` so Catalyst codegen can call the accessors directly
  final case class CpAdd(path: String, partitionValues: Map[String, String], dataChange: Boolean)
  final case class CpMeta(id: String, schemaString: String, partitionColumns: Seq[String],
      configuration: Map[String, String])
  final case class CpProto(minReaderVersion: Int, minWriterVersion: Int)
  final case class CpRow(add: Option[CpAdd], metaData: Option[CpMeta], protocol: Option[CpProto])
  final case class State(
      version: Long,
      schema: StructType,
      partitionColumns: Seq[String],
      files: Seq[AddFile])

  private def logDir(table: String): Path = Paths.get(table, "_delta_log")
  private def commitPath(table: String, v: Long): Path =
    logDir(table).resolve(f"$v%020d.json")

  /** percent-decode an `add.path` (protocol: relative paths are
    * RFC 2396 encoded; '+' is a literal character, not a space)
    */
  private def decodePath(p: String): String =
    java.net.URLDecoder.decode(p.replace("+", "%2B"), "UTF-8")

  private def commitVersions(table: String): Seq[Long] = {
    val d = logDir(table)
    if (!Files.isDirectory(d)) Seq.empty
    else Files.list(d).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && n.stripSuffix(".json").forall(_.isDigit))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  private def lastCheckpoint(table: String): Option[(Long, Int)] = {
    val p = logDir(table).resolve("_last_checkpoint")
    if (!Files.exists(p)) None
    else {
      val n = mapper.readTree(new String(Files.readAllBytes(p), "UTF-8"))
      val parts = if (n.has("parts")) n.get("parts").asInt else 1
      Some((n.get("version").asLong, parts))
    }
  }

  private def checkpointFiles(table: String, v: Long, parts: Int): Seq[String] =
    if (parts <= 1) Seq(logDir(table).resolve(f"$v%020d.checkpoint.parquet").toString)
    else (1 to parts).map(i =>
      logDir(table).resolve(f"$v%020d.checkpoint.$i%010d.$parts%010d.parquet").toString)

  private def rejectUnsupported(readerVersion: Int, readerFeatures: Seq[String],
      configuration: Map[String, String]): Unit = {
    val unsupported = readerFeatures.filterNot(Set("timestampNtz", "v2Checkpoint"))
    require(readerVersion <= 2 || unsupported.isEmpty,
      s"delta reader: unsupported readerFeatures ${unsupported.mkString(",")}")
    val cm = configuration.getOrElse("delta.columnMapping.mode", "none")
    require(cm == "none", s"delta reader: columnMapping.mode=$cm unsupported")
  }

  /** reconstruct table state at `versionAsOf` (default: latest) */
  def state(table: String, spark: SparkSession, versionAsOf: Option[Long] = None): State = {
    val versions = commitVersions(table)
    require(versions.nonEmpty || lastCheckpoint(table).isDefined,
      s"no _delta_log at $table")
    val target = versionAsOf.getOrElse(
      math.max(versions.lastOption.getOrElse(-1L), lastCheckpoint(table).map(_._1).getOrElse(-1L)))

    val active = mutable.LinkedHashMap.empty[String, AddFile]
    var schema: StructType = null
    var partCols: Seq[String] = Nil
    var readerVersion = 1
    var readerFeatures: Seq[String] = Nil
    var configuration: Map[String, String] = Map.empty

    // newest checkpoint at or below the target version
    val cp = lastCheckpoint(table).filter(_._1 <= target)
    cp.foreach { case (cv, parts) =>
      val rows = spark.read.parquet(checkpointFiles(table, cv, parts): _*)
      val cols = rows.columns.toSet
      val picked = rows.select(
        (if (cols("add")) col("add") else lit(null)).as("add"),
        (if (cols("metaData")) col("metaData") else lit(null)).as("metaData"),
        (if (cols("protocol")) col("protocol") else lit(null)).as("protocol"))
        .collect()
      picked.foreach { r =>
        val add = r.getStruct(0)
        if (add != null && add.getAs[String]("path") != null) {
          val pv = Option(add.getAs[scala.collection.Map[String, String]]("partitionValues"))
            .map(_.toMap).getOrElse(Map.empty[String, String])
          val p = decodePath(add.getAs[String]("path"))
          active(p) = AddFile(p, pv)
        }
        val md = r.getStruct(1)
        if (md != null && md.getAs[String]("schemaString") != null) {
          schema = DataType.fromJson(md.getAs[String]("schemaString")).asInstanceOf[StructType]
          partCols = Option(md.getAs[scala.collection.Seq[String]]("partitionColumns"))
            .map(_.toSeq).getOrElse(Nil)
          configuration = Option(md.getAs[scala.collection.Map[String, String]]("configuration"))
            .map(_.toMap).getOrElse(Map.empty[String, String])
        }
        val proto = r.getStruct(2)
        if (proto != null && !proto.isNullAt(proto.fieldIndex("minReaderVersion"))) {
          readerVersion = proto.getAs[Int]("minReaderVersion")
          if (proto.schema.fieldNames.contains("readerFeatures"))
            readerFeatures = Option(proto.getAs[scala.collection.Seq[String]]("readerFeatures"))
              .map(_.toSeq).getOrElse(Nil)
        }
      }
    }

    // JSON commits after the checkpoint, up to the target
    val maxV = math.max(versions.lastOption.getOrElse(-1L), lastCheckpoint(table).map(_._1).getOrElse(-1L))
    require(target <= maxV, s"delta version $target > latest $maxV at $table")
    require(cp.isDefined || versions.headOption.contains(0L),
      s"delta version $target not reconstructable at $table (earliest commits vacuumed, no usable checkpoint)")
    val start = cp.map(_._1 + 1).getOrElse(0L)
    val replay = versions.filter(v => v >= start && v <= target)
    for (v <- replay) {
      val lines = Files.readAllLines(commitPath(table, v)).asScala
      for (line <- lines if line.trim.nonEmpty) {
        val action = mapper.readTree(line)
        if (action.has("add")) {
          val a = action.get("add")
          val p = decodePath(a.get("path").asText)
          val pv = Option(a.get("partitionValues")).filter(!_.isNull).map { m =>
            m.properties().asScala
              .map(e => e.getKey -> (if (e.getValue.isNull) null else e.getValue.asText))
              .toMap
          }.getOrElse(Map.empty[String, String])
          active(p) = AddFile(p, pv)
        } else if (action.has("remove")) {
          active.remove(decodePath(action.get("remove").get("path").asText))
        } else if (action.has("metaData")) {
          val md = action.get("metaData")
          schema = DataType.fromJson(md.get("schemaString").asText).asInstanceOf[StructType]
          partCols = Option(md.get("partitionColumns")).map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
          configuration = Option(md.get("configuration")).filter(!_.isNull)
            .map(_.properties().asScala.map(e => e.getKey -> e.getValue.asText).toMap)
            .getOrElse(Map.empty)
        } else if (action.has("protocol")) {
          val proto = action.get("protocol")
          readerVersion = proto.get("minReaderVersion").asInt
          readerFeatures = Option(proto.get("readerFeatures"))
            .map(_.elements().asScala.map(_.asText).toSeq).getOrElse(Nil)
        }
      }
    }
    require(schema != null, s"delta log at $table has no metaData action")
    rejectUnsupported(readerVersion, readerFeatures, configuration)
    State(target, schema, partCols, active.values.toSeq)
  }

  /** read the table as of `versionAsOf` (default latest): one parquet
    * scan over the active files; partition columns re-attached from
    * the log via a broadcast file->values join
    */
  def read(spark: SparkSession, table: String, versionAsOf: Option[Long] = None): DataFrame = {
    val st = state(table, spark, versionAsOf)
    val partSet = st.partitionColumns.toSet
    val dataSchema = StructType(st.schema.fields.filterNot(f => partSet(f.name)))
    val ordered = st.schema.fields.map(f => col(f.name))
    if (st.files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    val abs = st.files.map(f => Paths.get(table).toAbsolutePath.resolve(f.path).normalize.toString)
    val base = spark.read.schema(dataSchema).parquet(abs: _*)
    if (st.partitionColumns.isEmpty) base.select(ordered.toSeq: _*)
    else {
      val rows = abs.zip(st.files).map { case (p, f) =>
        Row.fromSeq(p +: st.partitionColumns.map(c => f.partitionValues.getOrElse(c, null)))
      }
      val joinSchema = StructType(
        StructField("_graft_file", StringType) +:
          st.partitionColumns.map(c => StructField(c, StringType)))
      val typed = st.schema.fields.filter(f => partSet(f.name))
        .map(f => col(f.name).cast(f.dataType).as(f.name))
      val partDf = spark.createDataFrame(rows.asJava, joinSchema)
        .select(col("_graft_file") +: typed.toSeq: _*)
      base
        .withColumn("_graft_file",
          regexp_replace(input_file_name(), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"))
        .join(broadcast(partDf), "_graft_file")
        .select(ordered.toSeq: _*)
    }
  }

  // ---- minimal writer (tests + gate queries build their inputs with
  // this; the JSON it emits is the protocol's, so the reader is also
  // exercised by hand-written logs in DeltaLakeSpec) ------------------

  private def writeCommit(table: String, v: Long, actions: Seq[ObjectNode]): Unit = {
    Files.createDirectories(logDir(table))
    val body = actions.map(mapper.writeValueAsString).mkString("", "\n", "\n")
    Files.write(commitPath(table, v), body.getBytes("UTF-8"))
  }

  private def addActionsFor(table: String, df: DataFrame,
      partitionColumns: Seq[String], subdir: String): Seq[ObjectNode] = {
    val dest = Paths.get(table, subdir)
    if (partitionColumns.isEmpty) df.write.parquet(dest.toString)
    else df.write.partitionBy(partitionColumns: _*).parquet(dest.toString)
    val files = Files.walk(dest).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.toString)
    files.map { p =>
      val rel = Paths.get(table).relativize(p).toString
      // hive-style dirs carry the partition values: k=v/k2=v2/part.parquet
      val pv = rel.split('/').dropRight(1).filter(_.contains('='))
        .map { seg =>
          val Array(k, v) = seg.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
      val a = mapper.createObjectNode()
      val add = a.putObject("add")
      add.put("path", rel)
      val pvn = add.putObject("partitionValues")
      pv.foreach { case (k, v) =>
        if (v == "__HIVE_DEFAULT_PARTITION__") pvn.putNull(k) else pvn.put(k, v)
      }
      add.put("size", Files.size(p))
      add.put("modificationTime", System.currentTimeMillis())
      add.put("dataChange", true)
      a
    }
  }

  private def metaActions(df: DataFrame, partitionColumns: Seq[String]): Seq[ObjectNode] = {
    val proto = mapper.createObjectNode()
    val pn = proto.putObject("protocol")
    pn.put("minReaderVersion", 1)
    pn.put("minWriterVersion", 2)
    val meta = mapper.createObjectNode()
    val mn = meta.putObject("metaData")
    mn.put("id", java.util.UUID.randomUUID().toString)
    val fmt = mn.putObject("format")
    fmt.put("provider", "parquet")
    fmt.putObject("options")
    mn.put("schemaString", df.schema.json)
    val pc = mn.putArray("partitionColumns")
    partitionColumns.foreach(pc.add)
    mn.putObject("configuration")
    mn.put("createdTime", System.currentTimeMillis())
    Seq(proto, meta)
  }

  /** create a new delta table at version 0 */
  def create(spark: SparkSession, table: String, df: DataFrame,
      partitionColumns: Seq[String] = Nil): Unit = {
    require(!Files.exists(commitPath(table, 0L)), s"delta table exists at $table")
    val adds = addActionsFor(table, df, partitionColumns, "v0")
    writeCommit(table, 0L, metaActions(df, partitionColumns) ++ adds)
  }

  /** append rows as the next version */
  def append(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val st = state(table, spark)
    val v = st.version + 1
    val adds = addActionsFor(table, df, st.partitionColumns, s"v$v")
    writeCommit(table, v, adds)
  }

  /** remove all files of partitions matching `pred` (file-granular
    * delete, the delta idiom for partition deletes) as the next version
    */
  def deleteWhere(spark: SparkSession, table: String,
      pred: Map[String, String] => Boolean): Unit = {
    val st = state(table, spark)
    val v = st.version + 1
    val doomed = st.files.filter(f => pred(f.partitionValues))
    val actions = doomed.map { f =>
      val a = mapper.createObjectNode()
      val rm = a.putObject("remove")
      rm.put("path", f.path)
      rm.put("deletionTimestamp", System.currentTimeMillis())
      rm.put("dataChange", true)
      a
    }
    writeCommit(table, v, actions)
  }

  /** compact the state at the current version into a checkpoint
    * parquet + `_last_checkpoint`, per the protocol's checkpoint spec
    */
  def checkpoint(spark: SparkSession, table: String): Unit = {
    val st = state(table, spark)
    import spark.implicits._
    val rows =
      CpRow(None, None, Some(CpProto(1, 2))) +:
      CpRow(None, Some(CpMeta(java.util.UUID.randomUUID().toString,
        st.schema.json, st.partitionColumns, Map.empty)), None) +:
      st.files.map(f => CpRow(Some(CpAdd(f.path, f.partitionValues, dataChange = false)), None, None))
    val tmp = Paths.get(table, "_delta_log", "_cp_tmp").toString
    rows.toDF().coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, logDir(table).resolve(f"${st.version}%020d.checkpoint.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse.foreach(Files.delete)
    val lc = mapper.createObjectNode()
    lc.put("version", st.version)
    lc.put("size", rows.size.toLong)
    Files.write(logDir(table).resolve("_last_checkpoint"),
      mapper.writeValueAsString(lc).getBytes("UTF-8"))
  }
}
