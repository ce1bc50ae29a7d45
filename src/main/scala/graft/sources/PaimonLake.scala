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
  * are correct from the file contents alone. The BinaryRow
  * `_PARTITION` key is DECODED (round 6; `BinaryRow` codec below) to
  * resolve each file's <k=v...>/bucket-<n>/ path straight from the
  * manifest — no directory listing — and to drive manifest-level
  * partition pruning (`read(partition = ...)` never opens pruned
  * files). A walk survives only as a fallback for foreign
  * path-escaping conventions or undecodable partition bytes.
  *
  * Scope guards (loud, like the Iceberg reader): append-only tables
  * only (primaryKeys must be empty — PK tables need merge-on-read LSM
  * semantics), parquet/orc data files.
  */
object PaimonLake {

  private val mapper = new ObjectMapper()

  /** one live data file: absolute path + its decoded partition values */
  final case class PFile(name: String, path: String,
                         partition: Map[String, String], bucket: Int)

  final case class State(snapshotId: Long, schema: StructType, files: Seq[String],
                         entries: Seq[PFile] = Seq.empty,
                         primaryKeys: Seq[String] = Seq.empty,
                         mergeEngine: String = "deduplicate",
                         fieldAggs: Map[String, String] = Map.empty)

  /** RowKind bytes as paimon/flink serialize them in `_VALUE_KIND` */
  private val KindInsert: Byte = 0
  private val KindUpdateBefore: Byte = 1
  private val KindUpdateAfter: Byte = 2
  private val KindDelete: Byte = 3

  /** Paimon/Flink BinaryRow codec for the `_PARTITION` key (public
    * format: fixed-width null-bitset header — 8 reserved bits + one
    * bit per field, rounded to 8-byte words — then an 8-byte slot per
    * field; strings <= 7 bytes pack inline behind a high-bit marker,
    * longer ones store (offset << 32 | length) into the row's
    * variable-length tail; little-endian throughout).
    */
  private[graft] object BinaryRow {
    import java.nio.{ByteBuffer, ByteOrder}

    def bitsetBytes(arity: Int): Int = ((arity + 63 + 8) / 64) * 8

    def decode(bytes: Array[Byte], types: Seq[DataType]): Seq[Any] = {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val bw = bitsetBytes(types.length)
      types.zipWithIndex.map { case (t, i) =>
        val nullBit = i + 8
        val isNull = (bytes(nullBit >>> 3) & (1 << (nullBit & 7))) != 0
        if (isNull) null
        else {
          val off = bw + i * 8
          t match {
            case IntegerType | DateType => bb.getInt(off)
            case LongType               => bb.getLong(off)
            case ShortType              => bb.getShort(off)
            case ByteType               => bytes(off)
            case BooleanType            => bytes(off) != 0
            case FloatType              => bb.getFloat(off)
            case DoubleType             => bb.getDouble(off)
            case StringType =>
              val l = bb.getLong(off)
              if ((l & 0x8000000000000000L) != 0) { // compact inline
                val len = ((l >>> 56) & 0x7F).toInt
                val arr = new Array[Byte](len)
                var j = 0
                while (j < len) { arr(j) = ((l >>> (8 * j)) & 0xFF).toByte; j += 1 }
                new String(arr, "UTF-8")
              } else {
                val vOff = (l >>> 32).toInt
                val len = l.toInt
                new String(bytes, vOff, len, "UTF-8")
              }
            case other =>
              throw new IllegalArgumentException(s"paimon partition type $other unsupported")
          }
        }
      }
    }

    def encode(values: Seq[Any], types: Seq[DataType]): Array[Byte] = {
      require(values.length == types.length)
      val bw = bitsetBytes(types.length)
      val fixed = bw + 8 * types.length
      val tail = new java.io.ByteArrayOutputStream()
      val bb = ByteBuffer.allocate(fixed).order(ByteOrder.LITTLE_ENDIAN)
      var cursor = fixed
      for (((v, t), i) <- values.zip(types).zipWithIndex) {
        val off = bw + i * 8
        if (v == null) {
          val nullBit = i + 8
          bb.put(nullBit >>> 3, (bb.get(nullBit >>> 3) | (1 << (nullBit & 7))).toByte)
        } else t match {
          case IntegerType | DateType => bb.putInt(off, v.asInstanceOf[Int])
          case LongType               => bb.putLong(off, v.asInstanceOf[Long])
          case ShortType              => bb.putShort(off, v.asInstanceOf[Short])
          case ByteType               => bb.put(off, v.asInstanceOf[Byte])
          case BooleanType            => bb.put(off, if (v.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
          case FloatType              => bb.putFloat(off, v.asInstanceOf[Float])
          case DoubleType             => bb.putDouble(off, v.asInstanceOf[Double])
          case StringType =>
            val sb = v.asInstanceOf[String].getBytes("UTF-8")
            if (sb.length <= 7) {
              var l = (0x80L | sb.length) << 56
              var j = 0
              while (j < sb.length) { l |= (0xFFL & sb(j)) << (8 * j); j += 1 }
              bb.putLong(off, l)
            } else {
              val padded = (sb.length + 7) / 8 * 8
              bb.putLong(off, (cursor.toLong << 32) | sb.length.toLong)
              tail.write(sb)
              tail.write(new Array[Byte](padded - sb.length))
              cursor += padded
            }
          case other =>
            throw new IllegalArgumentException(s"paimon partition type $other unsupported")
        }
      }
      bb.array() ++ tail.toByteArray
    }
  }

  /** partition value as it appears in the directory path */
  private[graft] def partPathValue(v: Any, t: DataType): String = v match {
    case null => "__DEFAULT_NAME__" // paimon partition.default-name default
    case d: Int if t == DateType => java.time.LocalDate.ofEpochDay(d.toLong).toString
    case other => other.toString
  }

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
      val snaps = graft.Fs.list(Paths.get(table, "snapshot")).iterator
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
    val (schema, partitionKeys, primaryKeys) = readSchema(table, snap.get("schemaId").asLong)
    // all four documented merge engines read (deduplicate,
    // partial-update, aggregation, first-row); anything else refuses
    // rather than merging wrongly
    var mergeEngine = "deduplicate"
    var fieldAggs = Map.empty[String, String]
    if (primaryKeys.nonEmpty) {
      val f = Paths.get(table, "schema", s"schema-${snap.get("schemaId").asLong}")
      val opts = mapper.readTree(new String(Files.readAllBytes(f), "UTF-8")).get("options")
      mergeEngine = Option(opts).filterNot(_.isNull)
        .flatMap(o => Option(o.get("merge-engine"))).map(_.asText).getOrElse("deduplicate")
      require(Set("deduplicate", "partial-update", "aggregation", "first-row")(mergeEngine),
        s"paimon merge-engine '$mergeEngine' unsupported")
      // aggregation engine: per-field functions from
      // `fields.<name>.aggregate-function` options
      fieldAggs = Option(opts).filterNot(_.isNull).map(_.properties().asScala
        .filter(e => e.getKey.startsWith("fields.") && e.getKey.endsWith(".aggregate-function"))
        .map(e => e.getKey.stripPrefix("fields.").stripSuffix(".aggregate-function")
          -> e.getValue.asText)
        .toMap).getOrElse(Map.empty)
    }

    val lists =
      Option(snap.get("baseManifestList")).filterNot(_.isNull).map(_.asText).toSeq ++
        Option(snap.get("deltaManifestList")).filterNot(_.isNull).map(_.asText).toSeq
    // replay ADD/DELETE; file names are uuid-unique across the table
    val partTypes = partitionKeys.map(k => schema.apply(k).dataType)
    val live = mutable.LinkedHashMap.empty[String, (Seq[Any], Int)]
    for (list <- lists; mf <- manifestNames(table, list);
         entry <- avroRecords(Paths.get(table, "manifest", mf).toString)) {
      val kind = fieldLong(entry, "_KIND", 0L).toInt
      val file = entry.get("_FILE").asInstanceOf[GenericRecord]
      val name = file.get("_FILE_NAME").toString
      if (kind == 0) {
        val pbytes = Option(entry.get("_PARTITION")).map { b =>
          val buf = b.asInstanceOf[java.nio.ByteBuffer]
          val arr = new Array[Byte](buf.remaining()); buf.duplicate().get(arr); arr
        }.getOrElse(Array.emptyByteArray)
        // undecodable partition bytes (foreign serializer variants,
        // truncated placeholders) degrade to the walk fallback below
        // instead of failing the read
        val pvals =
          if (partitionKeys.isEmpty || pbytes.isEmpty) Seq.empty[Any]
          else scala.util.Try(BinaryRow.decode(pbytes, partTypes)).getOrElse(Seq.empty[Any])
        live.put(name, (pvals, fieldLong(entry, "_BUCKET", 0L).toInt))
      } else live.remove(name) // 1 = DELETE
    }

    // locate data files by DECODING the BinaryRow partition key into
    // the spec's directory layout <table>/<k=v...>/bucket-<n>/<name> —
    // no directory walk, the manifest IS the listing (the round-5 walk
    // was a driver hotspot at cluster scale and lost pruning). A walk
    // remains only as a fallback for foreign path-escaping conventions.
    val entries = live.toSeq.map { case (name, (pvals, bucket)) =>
      val decoded = pvals.length == partitionKeys.length
      val partMap =
        if (!decoded) Map.empty[String, String]
        else partitionKeys.zip(pvals.zip(partTypes).map {
          case (v, t) => partPathValue(v, t)
        }).toMap
      val dir =
        if (!decoded) "" else partitionKeys.map(k => s"$k=${partMap(k)}").mkString("/")
      val path =
        if (dir.isEmpty) Paths.get(table, s"bucket-$bucket", name)
        else Paths.get(table, dir, s"bucket-$bucket", name)
      PFile(name, path.toString, partMap, bucket)
    }
    val missing = entries.filterNot(e => Files.exists(Paths.get(e.path)))
    val located =
      if (missing.isEmpty) entries
      else {
        // fallback: one walk to find files whose escaped path differs
        val wanted = missing.map(_.name).toSet
        val found = mutable.Map.empty[String, String]
        val walk = Files.walk(Paths.get(table))
        try walk.iterator().asScala.foreach { p =>
          val n = p.getFileName.toString
          if (wanted.contains(n)) found(n) = p.toString
        } finally walk.close()
        val gone = wanted.diff(found.keySet)
        require(gone.isEmpty, s"paimon data files missing on disk: ${gone.take(5).mkString(",")}")
        entries.map(e => if (found.contains(e.name)) e.copy(path = found(e.name)) else e)
      }
    val bad = located.map(_.path).filterNot(f => f.endsWith(".parquet") || f.endsWith(".orc"))
    require(bad.isEmpty, s"paimon non-parquet/orc data files unsupported: ${bad.take(3).mkString(",")}")
    State(sid, schema, located.map(_.path), located, primaryKeys, mergeEngine, fieldAggs)
  }

  /** physical schema of a primary-key table's data files (paimon KeyValue
    * layout): `_KEY_<pk>` columns, `_SEQUENCE_NUMBER`, `_VALUE_KIND`,
    * then every table field as the value row
    */
  private def pkFileSchema(schema: StructType, primaryKeys: Seq[String]): StructType =
    StructType(
      primaryKeys.map(k => StructField(s"_KEY_$k", schema.apply(k).dataType, nullable = false)) ++
        Seq(StructField("_SEQUENCE_NUMBER", LongType, nullable = false),
          StructField("_VALUE_KIND", ByteType, nullable = false)) ++
        schema.fields)

  /** read the table at `snapshotId` (default: LATEST); `partition`
    * prunes to the files whose decoded partition values match every
    * given key — manifest-level pruning, the pruned files are never
    * opened (reference: paimon partition predicate pushdown)
    */
  def read(spark: SparkSession, table: String, snapshotId: Option[Long] = None,
           partition: Map[String, String] = Map.empty): DataFrame = {
    val st = state(table, snapshotId)
    val picked =
      if (partition.isEmpty) st.entries
      else st.entries.filter(e => partition.forall { case (k, v) => e.partition.get(k).contains(v) })
    if (picked.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), st.schema)
    val physical =
      if (st.primaryKeys.isEmpty) st.schema else pkFileSchema(st.schema, st.primaryKeys)
    def readPaths(paths: Seq[String]): DataFrame = {
      val (orc, parquet) = paths.partition(_.endsWith(".orc"))
      Seq(
        if (parquet.nonEmpty) Some(spark.read.schema(physical).parquet(parquet: _*)) else None,
        if (orc.nonEmpty) Some(spark.read.schema(physical).orc(orc: _*)) else None)
        .flatten.reduce(_ unionByName _)
    }
    if (st.primaryKeys.isEmpty) readPaths(picked.map(_.path))
    else {
      // paimon hash-buckets a key into exactly one (partition, bucket)
      // LSM tree, so merge-on-read is bucket-LOCAL: each file group
      // merges independently — coalesce(1) + sortWithinPartitions +
      // one streaming pass over the sorted runs, NO exchange anywhere
      // (the reference reads one merge task per bucket the same way).
      // At 100 TB the union has one single-task branch per bucket —
      // the table's own read-parallelism unit. Past maxLocalGroups the
      // per-group plan branches would bloat the plan, so the merge
      // switches to ONE tagged scan: every row is labeled with its
      // file group (a driver-side file->group map over
      // input_file_name), repartitioned on the GROUP id (not the key —
      // groups move whole, the exchange hashes a single int), sorted
      // within partitions by (group, key, seq) and run-merged with the
      // group as a leading key. The keyed window remains only for
      // unknown bucketing (bucket < 0).
      val groups = picked.groupBy(e => (e.partition, e.bucket))
      if (picked.forall(_.bucket >= 0) && groups.size <= maxLocalGroups)
        mergedBucketLocal(spark, groups.values.toSeq.sortBy(_.head.path), st, readPaths)
      else if (picked.forall(_.bucket >= 0))
        mergedGroupTagged(spark, groups.values.toSeq, st, readPaths)
      else mergedByKeyWindow(readPaths(picked.map(_.path)), st)
    }
  }

  /** Per-group union-branch cap for [[mergedBucketLocal]]; beyond it
    * the tagged single-scan path takes over. Overridable for tests.
    */
  private[graft] var maxLocalGroups: Int = 512

  /** Group-tagged LSM merge for tables with MORE file groups than the
    * union-of-branches plan can carry: one scan over every file, each
    * row labeled with its (partition, bucket) group id, ONE exchange
    * hash-partitioned on that id (never on the primary key), then the
    * same sorted-run merge with the group id as a leading key. A
    * thousand-bucket 100 TB table reads as a single scan + a single
    * int-keyed shuffle whose partitions hold whole buckets.
    */
  private def mergedGroupTagged(spark: SparkSession, groups: Seq[Seq[PFile]],
                                st: State,
                                readPaths: Seq[String] => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val fileToGrp: Map[String, Int] = groups.zipWithIndex.flatMap {
      case (files, gid) => files.map(f => f.name -> gid)
    }.toMap
    val bcast = spark.sparkContext.broadcast(fileToGrp)
    val grpOf = udf((p: String) => {
      val name = p.substring(p.lastIndexOf('/') + 1)
      bcast.value.getOrElse(name,
        throw new IllegalStateException(s"paimon file not in manifest map: $name"))
    })
    val keyNames = st.primaryKeys.map(k => s"_KEY_$k")
    val raw = readPaths(groups.flatten.map(_.path))
    val tagged = raw
      .withColumn("__grp", grpOf(input_file_name()))
      .select((col("__grp") +: raw.columns.toSeq.map(col)): _*)
    val outEnc = org.apache.spark.sql.Encoders.row(st.schema)
    tagged
      .repartition(col("__grp"))
      .sortWithinPartitions(
        (col("__grp") +: (keyNames.map(col) :+ col("_SEQUENCE_NUMBER"))): _*)
      .mapPartitions(rows =>
        // group id participates as an extra leading key column: runs
        // never span groups, so per-group semantics are preserved even
        // when several groups share a shuffle partition
        mergeSortedRuns(rows, keyNames.length + 1, st.schema, st.mergeEngine,
          st.fieldAggs, st.primaryKeys.toSet))(outEnc)
  }

  /** Bucket-local LSM merge: one task per (partition, bucket) file
    * group, shuffle-free (see [[read]]).
    */
  private def mergedBucketLocal(spark: SparkSession, groups: Seq[Seq[PFile]],
                                st: State,
                                readPaths: Seq[String] => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val keyNames = st.primaryKeys.map(k => s"_KEY_$k")
    val nKeys = keyNames.length
    val outEnc = org.apache.spark.sql.Encoders.row(st.schema)
    val schema = st.schema
    val engine = st.mergeEngine
    val fieldAggs = st.fieldAggs
    val pks = st.primaryKeys.toSet
    groups.map { files =>
      val sorted = readPaths(files.map(_.path))
        .coalesce(1)
        .sortWithinPartitions(
          (keyNames.map(col) :+ col("_SEQUENCE_NUMBER")).toSeq: _*)
      sorted.mapPartitions(rows =>
        mergeSortedRuns(rows, nKeys, schema, engine, fieldAggs, pks))(outEnc)
    }.reduce(_ unionByName _)
  }

  /** Single-pass merge of key-sorted runs (rows sorted by key asc,
    * sequence asc; key cols 0..nKeys-1, then _SEQUENCE_NUMBER,
    * _VALUE_KIND, then every table field). Implements the same engine
    * semantics as [[mergedByKeyWindow]].
    */
  private def mergeSortedRuns(rows: Iterator[Row], nKeys: Int, schema: StructType,
                              engine: String, fieldAggs: Map[String, String],
                              pks: Set[String]): Iterator[Row] = {
    val valueOffset = nKeys + 2
    val nVals = schema.fields.length
    val in = rows.buffered

    def sameKey(a: Row, b: Row): Boolean = {
      var i = 0
      while (i < nKeys) {
        val x = a.get(i); val y = b.get(i)
        if (if (x == null) y != null else x != y) return false
        i += 1
      }
      true
    }

    def kindOf(r: Row): Byte = r.getByte(nKeys + 1)

    def cmp(a: Any, b: Any): Int = a.asInstanceOf[Comparable[Any]].compareTo(b)

    /** fold one column over a key's rows (seq asc) per its agg fn */
    def fold(fn: String, dt: DataType, vals: Seq[Any]): Any = fn match {
      case "last_non_null_value" => vals.reverse.find(_ != null).orNull
      case "last_value"          => if (vals.isEmpty) null else vals.last
      case "first_non_null_value" => vals.find(_ != null).orNull
      case "first_value"         => if (vals.isEmpty) null else vals.head
      case "max" | "bool_or"     =>
        val nn = vals.filter(_ != null); if (nn.isEmpty) null else nn.reduce((x, y) => if (cmp(x, y) >= 0) x else y)
      case "min" | "bool_and"    =>
        val nn = vals.filter(_ != null); if (nn.isEmpty) null else nn.reduce((x, y) => if (cmp(x, y) <= 0) x else y)
      case "count"               => castIntegral(vals.count(_ != null).toLong, dt)
      case "listagg"             =>
        val nn = vals.filter(_ != null).map(_.toString); if (nn.isEmpty) null else nn.mkString(",")
      case "sum"                 => sumFold(vals, dt)
      case other => throw new IllegalArgumentException(
        s"paimon aggregate-function '$other' unsupported")
    }

    def emit(run: Seq[Row]): Option[Row] = engine match {
      case "deduplicate" =>
        val r = run.last // highest sequence
        val k = kindOf(r)
        if (k == KindInsert || k == KindUpdateAfter)
          Some(Row.fromSeq((0 until nVals).map(i => r.get(valueOffset + i))))
        else None
      case "first-row" =>
        val r = run.head // lowest sequence
        val k = kindOf(r)
        if (k == KindInsert || k == KindUpdateAfter)
          Some(Row.fromSeq((0 until nVals).map(i => r.get(valueOffset + i))))
        else None
      case "partial-update" | "aggregation" =>
        run.find(r => kindOf(r) == KindDelete || kindOf(r) == KindUpdateBefore)
          .foreach(_ => throw new IllegalArgumentException(
            s"paimon merge-engine '$engine' does not accept DELETE/retract records"))
        Some(Row.fromSeq(schema.fields.zipWithIndex.map { case (f, i) =>
          val vals = run.map(_.get(valueOffset + i))
          if (pks.contains(f.name)) vals.find(_ != null).orNull
          else {
            val fn = if (engine == "partial-update") "last_non_null_value"
                     else fieldAggs.getOrElse(f.name, "last_non_null_value")
            fold(fn, f.dataType, vals)
          }
        }.toSeq))
      case other => throw new IllegalArgumentException(
        s"paimon merge-engine '$other' unsupported")
    }

    new Iterator[Row] {
      private var nextRow: Row = null
      private def advance(): Unit = {
        while (nextRow == null && in.hasNext) {
          val run = mutable.ArrayBuffer(in.next())
          while (in.hasNext && sameKey(in.head, run.head))
            run += in.next()
          emit(run.toSeq).foreach(nextRow = _)
        }
      }
      override def hasNext: Boolean = { advance(); nextRow != null }
      override def next(): Row = {
        advance()
        val r = nextRow; nextRow = null; r
      }
    }
  }

  private def castIntegral(v: Long, dt: DataType): Any = dt match {
    case LongType    => v
    case IntegerType => v.toInt
    case ShortType   => v.toShort
    case ByteType    => v.toByte
    case DoubleType  => v.toDouble
    case FloatType   => v.toFloat
    case _: DecimalType => new java.math.BigDecimal(v)
    case _           => v
  }

  private def sumFold(vals: Seq[Any], dt: DataType): Any = {
    val nn = vals.filter(_ != null)
    if (nn.isEmpty) return null
    dt match {
      case DoubleType | FloatType =>
        val s = nn.map {
          case d: java.lang.Double => d.doubleValue(); case f: java.lang.Float => f.doubleValue()
          case n: Number => n.doubleValue()
        }.sum
        if (dt == FloatType) s.toFloat else s
      case _: DecimalType =>
        nn.map {
          case d: java.math.BigDecimal => d
          case d: BigDecimal => d.bigDecimal
          case n: Number => new java.math.BigDecimal(n.toString)
        }.reduce(_ add _)
      case _ => castIntegral(nn.map(_.asInstanceOf[Number].longValue()).sum, dt)
    }
  }

  /** Keyed-window merge fallback (pre-round-8 path): correct for any
    * bucketing but pays one full key shuffle.
    */
  private def mergedByKeyWindow(raw: DataFrame, st: State): DataFrame = {
    {
      // merge-on-read: one key-partitioned window shuffle — the
      // distributed form of the LSM merge, no driver state, same
      // result as level-by-level merging because sequence numbers are
      // globally ordered across levels.
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val keyCols = st.primaryKeys.map(k => col(s"_KEY_$k"))
      st.mergeEngine match {
        case "deduplicate" | "first-row" =>
          // deduplicate: highest sequence wins per key, DELETE winners
          // drop the key; first-row: LOWEST sequence wins (paimon's
          // first-value-forever engine)
          val ord = if (st.mergeEngine == "first-row")
            col("_SEQUENCE_NUMBER").asc else col("_SEQUENCE_NUMBER").desc
          val w = Window.partitionBy(keyCols: _*).orderBy(ord)
          raw.withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .filter(col("_VALUE_KIND") === KindInsert || col("_VALUE_KIND") === KindUpdateAfter)
            .select(st.schema.fields.map(f => col(f.name)).toSeq: _*)
        case engine @ ("partial-update" | "aggregation") =>
          // paimon raises on DELETE/retract records for these engines
          // (unless ignore-delete etc. is configured) — match that,
          // loudly, with one pushed-filter LIMIT 1 probe
          require(raw.filter(col("_VALUE_KIND") === KindDelete ||
              col("_VALUE_KIND") === KindUpdateBefore).limit(1).isEmpty,
            s"paimon merge-engine '$engine' does not accept DELETE/retract records")
          // full-frame window in sequence order: partial-update takes
          // the latest non-null per column; aggregation applies each
          // field's declared aggregate-function
          val wAsc = Window.partitionBy(keyCols: _*)
            .orderBy(col("_SEQUENCE_NUMBER").asc)
            .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
          def mergeExpr(f: org.apache.spark.sql.types.StructField) = {
            val c = col(f.name)
            val fn = if (engine == "partial-update") "last_non_null_value"
              else st.fieldAggs.getOrElse(f.name, "last_non_null_value")
            val m = fn match {
              case "last_non_null_value" => last(c, ignoreNulls = true).over(wAsc)
              case "last_value" => last(c, ignoreNulls = false).over(wAsc)
              case "first_non_null_value" => first(c, ignoreNulls = true).over(wAsc)
              case "first_value" => first(c, ignoreNulls = false).over(wAsc)
              case "sum" => sum(c).over(wAsc)
              case "max" => max(c).over(wAsc)
              case "min" => min(c).over(wAsc)
              case "bool_and" => min(c).over(wAsc) // false < true
              case "bool_or" => max(c).over(wAsc)
              case "count" => count(c).over(wAsc)
              case "listagg" => array_join(collect_list(c).over(wAsc), ",")
              case other => throw new IllegalArgumentException(
                s"paimon aggregate-function '$other' on ${f.name} unsupported")
            }
            m.cast(f.dataType).as(f.name)
          }
          val rn = row_number().over(
            Window.partitionBy(keyCols: _*).orderBy(col("_SEQUENCE_NUMBER").desc))
          raw.select(st.schema.fields.map { f =>
              if (st.primaryKeys.contains(f.name)) col(f.name) else mergeExpr(f)
            }.toSeq :+ rn.as("__rn"): _*)
            .filter(col("__rn") === 1).drop("__rn")
        case other => throw new IllegalArgumentException(
          s"paimon merge-engine '$other' unsupported")
      }
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
      schemaId: Long, partitionBytes: Array[Byte] = Array.emptyByteArray,
      bucket: Int = 0): GenericRecord = {
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
    e.put("_PARTITION", java.nio.ByteBuffer.wrap(partitionBytes))
    e.put("_BUCKET", bucket)
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

  /** append `df` as a new snapshot; returns the snapshot id.
    * `partitionKeys` (first write only) lays data out as
    * <k=v...>/bucket-0/ dirs with BinaryRow `_PARTITION` manifest keys
    * — the layout the decoding reader resolves without any listing.
    */
  def write(spark: SparkSession, table: String, df: DataFrame,
            partitionKeys: Seq[String] = Nil): Long = {
    val root = Paths.get(table)
    Files.createDirectories(root.resolve("schema"))
    Files.createDirectories(root.resolve("snapshot"))
    Files.createDirectories(root.resolve("manifest"))

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
      val pk = node.putArray("partitionKeys")
      partitionKeys.foreach(pk.add)
      node.putArray("primaryKeys")
      node.putObject("options")
      Files.write(schemaFile, mapper.writeValueAsBytes(node))
    }
    val declaredKeys = readSchema(table, 0L)._2
    require(declaredKeys == partitionKeys || partitionKeys.isEmpty,
      s"partitionKeys ${partitionKeys.mkString(",")} != declared ${declaredKeys.mkString(",")}")
    val keys = declaredKeys
    val keyTypes = keys.map(k => df.schema.apply(k).dataType)

    val prevId =
      if (Files.exists(root.resolve("snapshot").resolve("LATEST"))) latestSnapshotId(table) else 0L
    val snapId = prevId + 1
    val uuid = java.util.UUID.randomUUID().toString

    // data: per partition, spark-write to scratch and move the parts
    // under <k=v...>/bucket-0 with the BinaryRow partition key
    import org.apache.spark.sql.functions.col
    val partitionRows: Seq[Seq[Any]] =
      if (keys.isEmpty) Seq(Seq.empty[Any])
      else df.select(keys.map(col): _*).distinct().collect()
        .map(r => Seq.tabulate(r.length)(r.get)).toSeq
    val scratch = Files.createTempDirectory(root, ".stage")
    var fileNo = 0
    val dataFiles = partitionRows.flatMap { pvals =>
      val slice =
        if (keys.isEmpty) df
        else keys.zip(pvals).foldLeft(df) { case (d, (k, v)) => d.filter(col(k) <=> v) }
      val dir =
        if (keys.isEmpty) root.resolve("bucket-0")
        else root.resolve(keys.zip(pvals.zip(keyTypes).map {
          case (v, t) => partPathValue(v, t)
        }).map { case (k, v) => s"$k=$v" }.mkString("/")).resolve("bucket-0")
      Files.createDirectories(dir)
      val out = scratch.resolve(s"out-$fileNo")
      slice.coalesce(1).write.mode("overwrite").parquet(out.toString)
      val parts = graft.Fs.list(out).iterator
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      val pbytes =
        if (keys.isEmpty) Array.emptyByteArray
        else BinaryRow.encode(pvals, keyTypes)
      parts.map { p =>
        val name = s"data-$uuid-$fileNo.parquet"
        fileNo += 1
        Files.move(p, dir.resolve(name))
        (name, Files.size(dir.resolve(name)), slice.count(), pbytes)
      }
    }
    graft.Fs.walk(scratch).iterator.toSeq.reverse.foreach(Files.delete)
    val rowCount = df.count()

    // delta manifest with the ADDs
    val manifestName = s"manifest-$uuid-0.avro"
    writeAvro(root.resolve("manifest").resolve(manifestName), manifestEntrySchema,
      dataFiles.map { case (n, sz, rows, pb) => manifestEntry(0, n, sz, rows, 0L, pb) })

    commitSnapshot(table, root, uuid, manifestName, dataFiles.length.toLong, rowCount,
      prevId, snapId)
  }

  /** shared snapshot-commit tail: base list = previous state's
    * manifests, delta list = this commit's manifest, snapshot JSON +
    * LATEST pointer
    */
  private def commitSnapshot(table: String, root: Path, uuid: String,
      manifestName: String, nAdded: Long, rowCount: Long,
      prevId: Long, snapId: Long): Long = {
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
      Seq(manifestListEntry(manifestName, nAdded, 0L, 0L)))

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

  /** Upsert/delete batch into a PRIMARY-KEY table (paimon KeyValue
    * layout, deduplicate merge engine). `df` carries the table fields
    * plus optionally `kindCol` with "+I"/"+U"/"-D" row kinds (default
    * all INSERT). Sequence numbers are (snapshot << 20 | row#), so
    * later commits win the merge. Unpartitioned bucket-0 fixture
    * writer — enough protocol surface to exercise the merge-on-read
    * path on real chains.
    */
  def writePk(spark: SparkSession, table: String, df0: DataFrame,
              primaryKeys: Seq[String], kindCol: Option[String] = None,
              options: Map[String, String] = Map.empty,
              numBuckets: Int = 1): Long = {
    import org.apache.spark.sql.functions._
    require(primaryKeys.nonEmpty, "writePk needs primary keys")
    val root = Paths.get(table)
    Seq("schema", "snapshot", "manifest", "bucket-0")
      .foreach(d => Files.createDirectories(root.resolve(d)))
    val valueDf = kindCol.map(df0.drop(_)).getOrElse(df0)

    val schemaFile = root.resolve("schema").resolve("schema-0")
    if (!Files.exists(schemaFile)) {
      val node = mapper.createObjectNode()
      node.put("version", 3)
      node.put("id", 0L)
      val fields = node.putArray("fields")
      valueDf.schema.fields.zipWithIndex.foreach { case (f, i) =>
        val fn: ObjectNode = fields.addObject()
        fn.put("id", i)
        fn.put("name", f.name)
        fn.put("type", sparkTypeToPaimon(f.dataType) + (if (f.nullable) "" else " NOT NULL"))
      }
      node.put("highestFieldId", valueDf.schema.length - 1)
      node.putArray("partitionKeys")
      val pk = node.putArray("primaryKeys")
      primaryKeys.foreach(pk.add)
      val opts = node.putObject("options")
      options.foreach { case (k, v) => opts.put(k, v) }
      Files.write(schemaFile, mapper.writeValueAsBytes(node))
    }

    val prevId =
      if (Files.exists(root.resolve("snapshot").resolve("LATEST"))) latestSnapshotId(table) else 0L
    val snapId = prevId + 1
    val uuid = java.util.UUID.randomUUID().toString

    val kindExpr = kindCol.map { c =>
      when(col(c) === "-D", lit(KindDelete))
        .when(col(c) === "+U", lit(KindUpdateAfter))
        .when(col(c) === "-U", lit(KindUpdateBefore))
        .otherwise(lit(KindInsert)).cast("byte")
    }.getOrElse(lit(KindInsert).cast("byte"))
    val physical = df0
      .withColumn("_SEQUENCE_NUMBER",
        lit(snapId << 20) + row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(primaryKeys.map(col): _*)).cast("long"))
      .withColumn("_VALUE_KIND", kindExpr)
      .select(
        primaryKeys.map(k => col(k).as(s"_KEY_$k")) ++
          Seq(col("_SEQUENCE_NUMBER"), col("_VALUE_KIND")) ++
          valueDf.columns.map(col): _*)

    val scratch = Files.createTempDirectory(root, ".stage")
    // numBuckets > 1: hash-assign each key to its LSM bucket (paimon's
    // fixed-bucket layout — every key lives in exactly one bucket, so
    // the bucket-local merge path holds) and land one file per bucket
    // from a single partitioned write job
    val bucketDataFiles: Seq[(Int, String, Long)] =
      if (numBuckets <= 1) {
        physical.coalesce(1).write.mode("overwrite")
          .parquet(scratch.resolve("out").toString)
        val parts = graft.Fs.list(scratch.resolve("out")).iterator
          .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
        parts.zipWithIndex.map { case (p, i) =>
          val name = s"data-$uuid-$i.parquet"
          Files.move(p, root.resolve("bucket-0").resolve(name))
          (0, name, Files.size(root.resolve("bucket-0").resolve(name)))
        }
      } else {
        physical
          .withColumn("__bucket",
            pmod(hash(primaryKeys.map(k => col(s"_KEY_$k")): _*), lit(numBuckets)))
          .repartition(col("__bucket"))
          .write.partitionBy("__bucket").mode("overwrite")
          .parquet(scratch.resolve("out").toString)
        (0 until numBuckets).flatMap { b =>
          val dir = scratch.resolve("out").resolve(s"__bucket=$b")
          if (!Files.exists(dir)) Nil
          else {
            Files.createDirectories(root.resolve(s"bucket-$b"))
            graft.Fs.list(dir).iterator
              .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
              .zipWithIndex.map { case (p, i) =>
                val name = s"data-$uuid-$b-$i.parquet"
                Files.move(p, root.resolve(s"bucket-$b").resolve(name))
                (b, name, Files.size(root.resolve(s"bucket-$b").resolve(name)))
              }
          }
        }
      }
    graft.Fs.walk(scratch).iterator.toSeq.reverse.foreach(Files.delete)
    val rowCount = df0.count()

    val manifestName = s"manifest-$uuid-0.avro"
    writeAvro(root.resolve("manifest").resolve(manifestName), manifestEntrySchema,
      bucketDataFiles.map { case (b, n, sz) =>
        manifestEntry(0, n, sz, rowCount, 0L, bucket = b) })
    commitSnapshot(table, root, uuid, manifestName, bucketDataFiles.length.toLong,
      rowCount, prevId, snapId)
  }
}
