package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Snapshot-versioned parquet table: the storage semantics of the
  * reference's FUSE engine re-expressed on plain parquet + a JSON log.
  *
  * Reference anatomy (what is being modeled, not copied):
  *  - snapshot -> segments -> parquet blocks
  *    (src/query/storages/common/table_meta/src/meta/v2/snapshot.rs:34-60)
  *  - time travel AT (SNAPSHOT | TIMESTAMP)
  *    (src/query/storages/fuse/src/fuse_table.rs:1418-1432)
  *  - CHANGES / STREAM cdc via snapshot diff
  *    (src/query/storages/fuse/src/operations/changes.rs:131-168)
  *  - COPY INTO dedup by file identity
  *    (physical_copy_into_table.rs; binder copy_into_table.rs)
  *
  * Layout: `<path>/_graft_log/<version>.json` lists the ACTIVE data
  * files of that version plus the COPY ledger; data files are immutable
  * parquet parts. Readers prune to a snapshot's file list — O(1)
  * metadata, no scan of dead files. Writers are copy-on-write at FILE
  * granularity: DML rewrites only files that contain matching rows,
  * which is what keeps 100 TB updates proportional to touched data.
  *
  * Concurrency: single-writer (the harness). A real deployment would
  * CAS the log entry (Delta-style optimistic commit); out of scope.
  */
final class GraftTable(val spark: SparkSession, val path: String) {
  import GraftTable._

  private def logDir: Path = Paths.get(path, "_graft_log")

  def versions: Seq[Long] =
    if (!Files.isDirectory(logDir)) Seq.empty
    else graft.Fs.list(logDir).iterator
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).toSeq.sorted

  def currentVersion: Long = versions.lastOption.getOrElse(-1L)

  def snapshot(version: Long): Snapshot = {
    val p = logDir.resolve(f"$version%08d.json")
    require(Files.exists(p), s"no snapshot version $version at $path")
    Snapshot.fromJson(new String(Files.readAllBytes(p), "UTF-8"))
  }

  private def commit(files: Seq[String], ledger: Seq[String], op: String): Long = {
    Files.createDirectories(logDir)
    val v = currentVersion + 1
    val snap = Snapshot(v, System.currentTimeMillis(), files, ledger, op)
    Files.write(logDir.resolve(f"$v%08d.json"), snap.toJson.getBytes("UTF-8"))
    v
  }

  // ---- bloom index (reference: bloom_index.rs in the fuse pruning
  // stack) — parquet bloom filters on declared point-lookup columns;
  // parquet-mr consults them during row-group filtering, so an
  // equality probe skips row groups whose filter excludes the value.
  private def bloomFile = Paths.get(path, "_graft_bloom.json")

  /** Declare bloom-indexed columns; applies to every subsequent write. */
  def setBloomColumns(cols: Seq[String]): Unit =
    Files.write(bloomFile,
      cols.mkString("[\"", "\",\"", "\"]").getBytes("UTF-8"))

  def bloomColumns: Seq[String] =
    if (!Files.exists(bloomFile)) Seq.empty
    else "\"([^\"]+)\"".r.findAllMatchIn(new String(Files.readAllBytes(bloomFile), "UTF-8"))
      .map(_.group(1)).toSeq

  // ---- virtual columns (reference fuse virtual_column_builder.rs /
  // virtual_column_reader_parquet.rs: declared JSON paths materialize
  // as real columns in every data file, so path reads become plain
  // column scans with parquet stats pruning instead of per-row JSON
  // parsing; plans/VirtualColumnRule rewrites get_json_object to them)
  private def virtualFile = Paths.get(path, "_graft_virtual.json")

  /** Declare virtual paths for a JSON string column. Must happen before
    * the first write (like cluster keys) so EVERY data file carries the
    * columns — the read-side rewrite is only sound when no file misses
    * them.
    */
  def setVirtualColumns(srcCol: String, paths: Seq[String]): Unit = {
    require(currentVersion < 0,
      "declare virtual columns before the first write (the rewrite needs every file to carry them)")
    val cur = virtualColumns
    val next = cur + (srcCol -> paths)
    val json = next.map { case (c, ps) =>
      "\"" + c + "\":" + ps.mkString("[\"", "\",\"", "\"]")
    }.mkString("{", ",", "}")
    Files.write(virtualFile, json.getBytes("UTF-8"))
  }

  def virtualColumns: Map[String, Seq[String]] =
    if (!Files.exists(virtualFile)) Map.empty
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(virtualFile), "UTF-8"))
      import scala.jdk.CollectionConverters._
      node.properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText).toSeq
      }.toMap
    }

  /** recompute declared virtual columns from their source (drop stale
    * ones first — UPDATE may have changed the JSON column)
    */
  private def materializeVirtual(df: DataFrame): DataFrame = {
    val decl = virtualColumns
    if (decl.isEmpty) df
    else {
      val dropped = df.drop(df.columns.filter(_.startsWith("__virt_")).toSeq: _*)
      decl.foldLeft(dropped) { case (acc, (c, paths)) =>
        if (!acc.columns.contains(c)) acc
        else paths.foldLeft(acc)((a, p) =>
          a.withColumn(GraftTable.virtName(c, p), get_json_object(col(c), p)))
      }
    }
  }

  /** rows written by the most recent writeParts on this instance —
    * summed from parquet footers (no data scan); lets INSERT report
    * the reference's affected-row count without re-running its source
    */
  @volatile var lastWrittenRows: Long = 0L

  private def writeParts(df0: DataFrame): Seq[String] = {
    val df = materializeVirtual(df0)
    val stage = Paths.get(path, s".stage-${java.util.UUID.randomUUID().toString.take(8)}")
    val writer = bloomColumns.foldLeft(df.write.mode(SaveMode.Overwrite)) {
      (w, c) => w.option(s"parquet.bloom.filter.enabled#$c", "true")
    }
    writer.parquet(stage.toString)
    val parts = graft.Fs.list(stage).iterator
      .filter(f => f.getFileName.toString.endsWith(".parquet")).toSeq
    val named = parts.map { f =>
      val name = s"part-${java.util.UUID.randomUUID().toString.take(12)}.parquet"
      Files.move(f, Paths.get(path, name))
      name
    }
    graft.Fs.list(stage).iterator.foreach(Files.delete)
    Files.delete(stage)
    lastWrittenRows = named.map { n =>
      try {
        val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(Paths.get(path, n).toString),
          spark.sessionState.newHadoopConf())
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getRecordCount finally r.close()
      } catch { case _: Exception => 0L }
    }.sum
    named
  }

  // ---- schema evolution (reference: fuse ALTER TABLE ADD/DROP COLUMN
  // is a metadata-only TableSchema change — data files are never
  // rewritten; old files read the added column as its default).
  // `_graft_schema.ddl` pins the declared user schema once the table
  // has been altered; `_graft_alters.json` records, per added column,
  // the files that predate it (those read the column filled with its
  // default/NULL). DROP is pure metadata: the explicit read schema
  // simply omits the column. RENAME rewrites (no field ids in parquet
  // to resolve old names through), then clears the alter log.
  private def schemaFile = Paths.get(path, "_graft_schema.ddl")
  private def altersFile = Paths.get(path, "_graft_alters.json")

  private final case class AlterAdd(col: String, typeDdl: String,
                                    default: Option[String], files: Set[String])

  private def declaredSchema: Option[StructType] =
    if (!Files.exists(schemaFile)) None
    else Some(StructType.fromDDL(new String(Files.readAllBytes(schemaFile), "UTF-8")))

  private def alterAdds: Seq[AlterAdd] =
    if (!Files.exists(altersFile)) Seq.empty
    else {
      val node = new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(new String(Files.readAllBytes(altersFile), "UTF-8"))
      node.elements().asScala.map { e =>
        AlterAdd(e.get("col").asText, e.get("type").asText,
          Option(e.get("default")).filterNot(_.isNull).map(_.asText),
          e.get("files").elements().asScala.map(_.asText).toSet)
      }.toSeq
    }

  private def writeAlters(adds: Seq[AlterAdd]): Unit = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json = adds.map { a =>
      s"""{"col":${q(a.col)},"type":${q(a.typeDdl)},""" +
        s""""default":${a.default.map(q).getOrElse("null")},""" +
        s""""files":${a.files.toSeq.sorted.map(q).mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")
    Files.write(altersFile, json.getBytes("UTF-8"))
  }

  private def pinSchema(st: StructType): Unit =
    Files.write(schemaFile, st.toDDL.getBytes("UTF-8"))

  /** user-visible schema (declared if pinned, else the files') */
  def schema: StructType =
    declaredSchema.getOrElse(
      StructType(readWithVirtual().schema.filterNot(_.name.startsWith("__virt_"))))

  /** ALTER TABLE ADD COLUMN — metadata-only; existing files read the
    * column as `default` (NULL when none). Reference errors when the
    * column exists (1108): so do we.
    */
  def addColumn(name: String, typeDdl: String, default: Option[String] = None): Long = {
    val cur = schema
    require(!cur.fieldNames.exists(_.equalsIgnoreCase(name)),
      s"column $name already exists")
    val dt = StructType.fromDDL(s"x $typeDdl").head.dataType
    pinSchema(StructType(cur.fields :+ org.apache.spark.sql.types.StructField(name, dt)))
    val prev = snapshot(currentVersion)
    writeAlters(alterAdds :+ AlterAdd(name, typeDdl, default, prev.files.toSet))
    commit(prev.files, prev.ledger, s"ALTER-ADD-$name")
  }

  /** ALTER TABLE DROP COLUMN — metadata-only. Reference errors when the
    * column is absent or it is the last one (1109): so do we.
    */
  def dropColumn(name: String): Long = {
    val cur = schema
    require(cur.fieldNames.exists(_.equalsIgnoreCase(name)), s"no column $name")
    require(cur.fields.length > 1, s"cannot drop the only column $name")
    pinSchema(StructType(cur.fields.filterNot(_.name.equalsIgnoreCase(name))))
    writeAlters(alterAdds.filterNot(_.col.equalsIgnoreCase(name)))
    val prev = snapshot(currentVersion)
    commit(prev.files, prev.ledger, s"ALTER-DROP-$name")
  }

  /** ALTER TABLE RENAME COLUMN — copy-on-write (parquet files carry no
    * field ids to resolve old names through), then the alter log is
    * clear because every live file matches the declared schema.
    */
  def renameColumn(from: String, to: String): Long = {
    val cur = schema
    require(cur.fieldNames.exists(_.equalsIgnoreCase(from)), s"no column $from")
    require(!cur.fieldNames.exists(_.equalsIgnoreCase(to)), s"column $to already exists")
    val prev = snapshot(currentVersion)
    val rewritten = writeParts(readFiles(prev.files)
      .drop(readFiles(prev.files).columns.filter(_.startsWith("__virt_")).toIndexedSeq: _*)
      .withColumnRenamed(from, to))
    pinSchema(StructType(cur.fields.map(f =>
      if (f.name.equalsIgnoreCase(from)) f.copy(name = to) else f)))
    writeAlters(Seq.empty)
    commit(rewritten, prev.ledger, s"ALTER-RENAME-$from-$to")
  }

  private def readFiles(files: Seq[String]): DataFrame =
    if (files.isEmpty) {
      declaredSchema match {
        case Some(st) => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
        case None => spark.emptyDataFrame
      }
    } else declaredSchema match {
      case None => spark.read.parquet(files.map(f => s"$path/$f"): _*)
      case Some(user) =>
        // full stored schema = declared user columns + materialized
        // virtual columns (always strings)
        val virtFields = virtualColumns.toSeq.flatMap { case (c, ps) =>
          ps.map(p => org.apache.spark.sql.types.StructField(
            GraftTable.virtName(c, p), org.apache.spark.sql.types.StringType))
        }
        val full = StructType(user.fields ++ virtFields)
        val adds = alterAdds
        // group files by WHICH added columns they predate
        val groups = files.groupBy(f => adds.filter(_.files.contains(f)).map(_.col).toSet)
        groups.map { case (missing, fs) =>
          val readSchema = StructType(full.fields.filterNot(x => missing.contains(x.name)))
          val df = spark.read.schema(readSchema).parquet(fs.map(f => s"$path/$f"): _*)
          adds.filter(a => missing.contains(a.col)).foldLeft(df) { (acc, a) =>
            val dt = full(a.col).dataType
            acc.withColumn(a.col,
              a.default.map(d => expr(d).cast(dt)).getOrElse(lit(null).cast(dt)))
          }.select(full.fieldNames.map(col).toIndexedSeq: _*)
        }.reduce(_ unionByName _)
    }

  // ---- reads ----------------------------------------------------------

  /** Materialized `__virt_*` columns are internal to the read path
    * (reference: fuse virtual columns never appear in SELECT *): the
    * user-visible schema hides them, and `VirtualColumnRule` resolves
    * get_json_object over the declared paths back to the stored
    * columns through this projection.
    */
  private def dropVirtual(df: DataFrame): DataFrame = {
    val virt = df.columns.filter(_.startsWith("__virt_"))
    if (virt.isEmpty) df else df.drop(virt.toSeq: _*)
  }

  def read(): DataFrame = readAt(currentVersion)

  /** The stored schema including materialized `__virt_*` columns, for
    * callers that want the internals (introspection, tests).
    */
  def readWithVirtual(): DataFrame = readFiles(snapshot(currentVersion).files)

  /** time travel: AT (SNAPSHOT => <version>) */
  def readAt(version: Long): DataFrame = dropVirtual(readFiles(snapshot(version).files))

  /** time travel: AT (TIMESTAMP => <ts>) — latest snapshot at-or-before */
  def readAsOf(timestampMs: Long): DataFrame = {
    val v = versions.map(snapshot).filter(_.timestampMs <= timestampMs)
      .map(_.version).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at or before $timestampMs"))
    readAt(v)
  }

  // ---- writes ---------------------------------------------------------

  def append(df: DataFrame): Long = {
    val prev = if (currentVersion >= 0) snapshot(currentVersion) else Snapshot.empty
    commit(prev.files ++ writeParts(df), prev.ledger, "APPEND")
  }

  def overwrite(df: DataFrame): Long = {
    val prev = if (currentVersion >= 0) snapshot(currentVersion) else Snapshot.empty
    commit(writeParts(df), prev.ledger, "OVERWRITE")
  }

  /** DELETE WHERE cond — rewrites only files containing matching rows. */
  def delete(cond: Column): Long = {
    val prev = snapshot(currentVersion)
    val touched = touchedFiles(prev, cond)
    if (touched.isEmpty) return commit(prev.files, prev.ledger, "DELETE-NOOP")
    // keep rows where the predicate is not TRUE: a bare !cond drops
    // NULL-evaluating rows too (DELETE WHERE c = 1 must keep c IS NULL)
    val kept = readFiles(touched).filter(!coalesce(cond, lit(false)))
    val newParts = if (kept.isEmpty) Seq.empty else writeParts(kept)
    commit(prev.files.diff(touched) ++ newParts, prev.ledger, "DELETE")
  }

  /** UPDATE SET assignments WHERE cond — file-granular copy-on-write. */
  def update(cond: Column, assignments: Map[String, Column]): Long = {
    val prev = snapshot(currentVersion)
    val touched = touchedFiles(prev, cond)
    if (touched.isEmpty) return commit(prev.files, prev.ledger, "UPDATE-NOOP")
    val df = readFiles(touched)
    // ONE atomic projection: every assignment (and the condition) must
    // read the PRE-update row — a sequential withColumn fold re-reads
    // the condition over already-assigned columns, so
    // `SET a='x', c='y' WHERE a='old'` silently skipped the c
    // assignment once a was rewritten
    val updated = df.select(df.columns.toSeq.map { c =>
      assignments.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, e)) => when(cond, e).otherwise(col(s"`$c`")).as(c)
        case None         => col(s"`$c`")
      }
    }: _*)
    commit(prev.files.diff(touched) ++ writeParts(updated), prev.ledger, "UPDATE")
  }

  /** MERGE INTO: upsert by key — matched rows take source values,
    * unmatched source rows are inserted. (Whole-table rewrite; a
    * file-granular variant would prune to files whose key ranges
    * intersect the source — zone-map territory, round 2.)
    */
  def mergeByKey(source: DataFrame, key: String): Long = {
    val prev = snapshot(currentVersion)
    val target = readFiles(prev.files)
    // user columns only: writeParts recomputes the virtual ones
    val cols = target.columns.filterNot(_.startsWith("__virt_"))
    val merged = target.join(source.select(col(key).as("__mk")), col(key) === col("__mk"), "left_anti")
      .select(cols.map(col).toSeq: _*)
      .union(source.select(cols.map(col).toSeq: _*))
    commit(writeParts(merged), prev.ledger, "MERGE")
  }

  /** Full MERGE INTO clause set (reference grammar:
    * src/query/ast/src/ast/statements/merge_into.rs:52-95 —
    * MatchOperation Update/Delete, MatchedClause/UnmatchedClause with
    * optional AND selections, evaluated in order, first match wins).
    *
    * File-granular copy-on-write like delete/update: only target files
    * that contain at least one matched row are rewritten; inserted rows
    * become new parts. Like the reference, a target row matched by more
    * than one source row raises an ambiguous-merge error (databend's
    * unmatched-multiple-rows path in its merge-into pipeline) instead of
    * silently transforming the row once per match.
    */
  def mergeInto(source: DataFrame, targetAlias: String, sourceAlias: String,
                onCond: String,
                matched: Seq[GraftTable.MatchedClause],
                notMatched: Seq[GraftTable.NotMatchedClause]): GraftTable.MergeResult = {
    val prev = snapshot(currentVersion)
    val tgtAll = readFiles(prev.files)
    val userCols = tgtAll.columns.filterNot(_.startsWith("__virt_")).toSeq
    val tgtSchema = tgtAll.schema
    def fieldType(c: String) =
      tgtSchema.fields.find(_.name.equalsIgnoreCase(c)).get.dataType
    val src = source.withColumn("__sm", lit(true)).alias(sourceAlias)
    val on = expr(onCond)

    // which files hold at least one row hit by a matched clause
    val touched: Seq[String] = if (matched.isEmpty || prev.files.isEmpty) Seq.empty else {
      val tgtF = tgtAll.withColumn("__f", input_file_name()).alias(targetAlias)
      val joined = tgtF.join(src, on, "inner")
      val anyClause = matched.map(_.cond.map(expr).getOrElse(lit(true)))
        .reduce(_ || _)
      joined.filter(anyClause).select(col("__f")).distinct().collect()
        .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath).getFileName.toString)
        .toSeq
    }

    // rewrite touched files: matched rows take the first applicable
    // clause (update columns / delete), untouched rows pass through
    var updatedCount = 0L
    var deletedCount = 0L
    val kept: Option[DataFrame] = if (touched.isEmpty) None else {
      val rawT = readFiles(touched)
      val tgtT = rawT.drop(
        rawT.columns.filter(_.startsWith("__virt_")).toIndexedSeq: _*)
        .withColumn("__tid", monotonically_increasing_id()).alias(targetAlias)
      val joined = tgtT.join(src, on, "left_outer")
      val ambiguous = joined.filter(col("__sm").isNotNull)
        .groupBy(col("__tid")).count().filter(col("count") > 1).limit(1).count()
      if (ambiguous > 0)
        throw new IllegalStateException(
          "MERGE INTO: a target row matches multiple source rows " +
          "(ambiguous merge) — dedup the source on the join keys")
      val isM = col("__sm").isNotNull
      val clauseIdx = matched.zipWithIndex.foldLeft(when(lit(false), lit(-1))) {
        case (acc, (c, i)) =>
          acc.when(isM && c.cond.map(expr).getOrElse(lit(true)), lit(i))
      }.otherwise(lit(-1))
      val withIdx = joined.withColumn("__ci", clauseIdx)
      val deleteIdx = matched.zipWithIndex.collect {
        case (GraftTable.MatchedClause(_, None), i) => i
      }
      val outCols = userCols.map { c =>
        val base: Column = col(s"$targetAlias.$c")
        matched.zipWithIndex.foldLeft(when(lit(false), base)) {
          case (acc, (GraftTable.MatchedClause(_, Some(set)), i)) =>
            val e = if (set.isEmpty) col(s"$sourceAlias.$c").cast(fieldType(c))
                    else set.collectFirst { case (k, v) if k.equalsIgnoreCase(c) => expr(v).cast(fieldType(c)) }
                           .getOrElse(base)
            acc.when(col("__ci") === i, e)
          case (acc, _) => acc
        }.otherwise(base).as(c)
      }
      // clause-hit tallies for the reference's affected-counts result —
      // one aggregation over the (touched-files-only) joined frame
      val tallies = withIdx.groupBy(col("__ci")).count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      deletedCount = deleteIdx.map(i => tallies.getOrElse(i, 0L)).sum
      updatedCount = tallies.filterNot { case (i, _) =>
        i < 0 || deleteIdx.contains(i) }.values.sum
      val survivors =
        if (deleteIdx.isEmpty) withIdx
        else withIdx.filter(!col("__ci").isin(deleteIdx.map(Integer.valueOf): _*))
      Some(survivors.select(outCols: _*))
    }

    // unmatched source rows: first applicable NOT MATCHED clause inserts
    val inserted: Option[DataFrame] = if (notMatched.isEmpty) None else {
      val anti = src.join(tgtAll.alias(targetAlias), on, "left_anti")
      val isApplicable = notMatched.zipWithIndex.foldLeft(when(lit(false), lit(-1))) {
        case (acc, (c, i)) => acc.when(c.cond.map(expr).getOrElse(lit(true)), lit(i))
      }.otherwise(lit(-1))
      val withIdx = anti.withColumn("__ni", isApplicable).filter(col("__ni") >= 0)
      val outCols = userCols.map { c =>
        val chain = notMatched.zipWithIndex.foldLeft(
          when(lit(false), lit(null).cast(fieldType(c)))) { case (acc, (cl, i)) =>
          val e = cl.values match {
            case None => col(s"$sourceAlias.$c") // INSERT *
            case Some((cols0, vals)) =>
              cols0.indexWhere(_.equalsIgnoreCase(c)) match {
                case -1 => lit(null)
                case j  => expr(vals(j))
              }
          }
          acc.when(col("__ni") === i, e.cast(fieldType(c)))
        }.otherwise(lit(null).cast(fieldType(c)))
        chain.as(c)
      }
      Some(withIdx.select(outCols: _*))
    }

    val insertedCount = inserted.map(_.count()).getOrElse(0L)
    val newRows = (kept, inserted) match {
      case (Some(k), Some(i)) => Some(k.unionByName(i))
      case (k, i)             => k.orElse(i)
    }
    if (newRows.isEmpty && touched.isEmpty) {
      val v = commit(prev.files, prev.ledger, "MERGE-NOOP")
      return GraftTable.MergeResult(v, 0L, 0L, 0L)
    }
    val newParts = newRows.map(writeParts).getOrElse(Seq.empty)
    val v = commit(prev.files.diff(touched) ++ newParts, prev.ledger, "MERGE")
    GraftTable.MergeResult(v, insertedCount, updatedCount, deletedCount)
  }

  private def touchedFiles(prev: Snapshot, cond: Column): Seq[String] = {
    if (prev.files.isEmpty) return Seq.empty
    val withFile = readFiles(prev.files).withColumn("__f", input_file_name())
    withFile.filter(cond).select("__f").distinct().collect()
      .map(r => Paths.get(new java.net.URI(r.getString(0)).getPath).getFileName.toString)
      .toSeq
  }

  // ---- CDC / STREAM ---------------------------------------------------

  /** Snapshot-diff change feed between two versions, with the
    * reference's change$action column. Append-only fast path: if the
    * old file set is a subset of the new, changes are exactly the rows
    * of the added files — file-level pruning, no row diff shuffle.
    */
  def changes(fromVersion: Long, toVersion: Long): DataFrame = {
    val from = snapshot(fromVersion)
    val to = snapshot(toVersion)
    if (from.files.forall(to.files.contains)) {
      val added = to.files.diff(from.files)
      val base =
        if (added.nonEmpty) dropVirtual(readFiles(added))
        else { // schema-preserving empty feed
          val full = dropVirtual(read())
          full.sparkSession.createDataFrame(
            full.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            full.schema)
        }
      base.withColumn("change$action", lit("INSERT"))
    } else {
      val oldDf = dropVirtual(readFiles(from.files))
      val newDf = dropVirtual(readFiles(to.files))
      val inserted = newDf.exceptAll(oldDf).withColumn("change$action", lit("INSERT"))
      val deleted = oldDf.exceptAll(newDf).withColumn("change$action", lit("DELETE"))
      inserted.unionByName(deleted)
    }
  }

  /** latest version committed at-or-before `timestampMs` (the version
    * resolution step of AT (TIMESTAMP => ...), fuse_table.rs:1418-1432)
    */
  def versionAsOf(timestampMs: Long): Long =
    versions.map(snapshot).filter(_.timestampMs <= timestampMs)
      .map(_.version).lastOption
      .getOrElse(throw new IllegalArgumentException(s"no snapshot at or before $timestampMs"))

  /** CHANGES AT (TIMESTAMP => ts): everything that changed since the
    * snapshot current at `timestampMs` (reference
    * fuse_table.rs:1418-1432 — the timestamp-addressed change interval
    * resolves to a version pair, then diffs like the version form).
    */
  def changesAsOf(timestampMs: Long): DataFrame =
    changes(versionAsOf(timestampMs), currentVersion)

  /** CHANGES AT (OFFSET => -seconds): offset relative to now; an
    * offset older than the table clamps to its first snapshot (the
    * whole history).
    */
  def changesOffset(offsetSeconds: Long): DataFrame = {
    val ts = System.currentTimeMillis() - math.abs(offsetSeconds) * 1000L
    val first = versions.map(snapshot).head
    changesAsOf(math.max(ts, first.timestampMs))
  }

  /** changes() plus the reference's change$is_update pairing
    * (src/query/expression/src/schema.rs:78-80): an INSERT and a DELETE
    * of the same key inside one interval are the two halves of an
    * UPDATE, and both carry change$is_update = true. `key` plays the
    * role of the reference's row-lineage id (stream_table.rs:36-38).
    */
  def changesByKey(fromVersion: Long, toVersion: Long, key: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(org.apache.spark.sql.functions.col(key))
    import org.apache.spark.sql.functions._
    changes(fromVersion, toVersion)
      .withColumn("change$is_update",
        max(when(col("change$action") === "INSERT", 1).otherwise(0)).over(w) === 1 &&
          max(when(col("change$action") === "DELETE", 1).otherwise(0)).over(w) === 1)
  }

  /** CLUSTER BY-style rewrite (reference: benchmark/tpch/create.sql
    * CLUSTER BY keys + hilbert recluster, src/query/expression/src/
    * hilbert/): repartition by range on the cluster keys and sort
    * within partitions before writing, so every data file covers a
    * narrow key range and parquet min/max (zone-map) pruning can skip
    * whole files for selective key predicates.
    */
  def recluster(keys: Seq[String], numFiles: Int = 8,
                curve: String = "linear"): Long = {
    import org.apache.spark.sql.functions._
    val prev = snapshot(currentVersion)
    val df = readFiles(prev.files)
    val clustered = curve match {
      case "linear" =>
        df.repartitionByRange(numFiles, keys.map(col): _*)
          .sortWithinPartitions(keys.map(col): _*)
      case "hilbert" | "zorder" =>
        // space-filling-curve recluster for multi-key pruning
        // (reference: src/query/expression/src/hilbert/,
        // physical_recluster.rs): normalize every key to a 16-bit rank
        // by min/max, map to the curve key (byte array — n keys x 16
        // bits, so 2..n keys work; the reference's ClickBench table
        // clusters on 5), range-partition + sort on it. Every file then
        // covers a narrow range in EVERY key, so zone maps prune on any
        // clustered column, not just the first.
        require(keys.length >= 2, s"$curve recluster takes at least 2 keys")
        val aggs = keys.flatMap(k =>
          Seq(min(col(k)).cast("double"), max(col(k)).cast("double")))
        val bounds = df.agg(aggs.head, aggs.tail: _*).collect()(0)
        def rank(i: Int) = {
          val (lo, hi) = (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
          val span = if (hi > lo) hi - lo else 1.0
          // NULL keys rank lowest (coalesce keeps the curve UDF total)
          coalesce(least(lit(65535), greatest(lit(0),
            ((col(keys(i)).cast("double") - lit(lo)) / lit(span) * lit(65535.0))
              .cast("long"))), lit(0L))
        }
        val curveFn = if (curve == "hilbert")
          udf((xs: Seq[Long]) => GraftTable.hilbertBytes(16, xs.toArray))
        else
          udf((xs: Seq[Long]) => GraftTable.zorderBytes(16, xs.toArray))
        val withIdx = df.withColumn("__curve",
          curveFn(array(keys.indices.map(rank): _*)))
        withIdx.repartitionByRange(numFiles, col("__curve"))
          .sortWithinPartitions(col("__curve"))
          .drop("__curve")
      case other => throw new IllegalArgumentException(s"unknown curve $other")
    }
    commit(writeParts(clustered), prev.ledger, s"RECLUSTER-$curve-${keys.mkString(",")}")
  }

  /** ANALYZE TABLE (reference: per-column NDV/stats snapshots,
    * src/query/storages/common/table_meta/src/meta/v1/
    * table_snapshot_statistics.rs:26-34, consumed by the optimizer's
    * cardinality estimation): one aggregation pass computes row count
    * and per-column ndv / null_count / min / max, persisted next to
    * the snapshot it describes.
    */
  def analyze(): GraftTable.TableStats = {
    import org.apache.spark.sql.functions._
    val v = currentVersion
    val df = read()
    val aggs = Seq(count(lit(1)).as("__rows")) ++ df.columns.flatMap { c =>
      Seq(
        approx_count_distinct(col(c)).as(s"ndv__$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls__$c"),
        min(col(c)).cast("string").as(s"min__$c"),
        max(col(c)).cast("string").as(s"max__$c"))
    }
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val cols = df.columns.map { c =>
      c -> GraftTable.ColStats(
        ndv = r.getAs[Long](s"ndv__$c"),
        nullCount = r.getAs[Long](s"nulls__$c"),
        min = String.valueOf(r.getAs[Any](s"min__$c")),
        max = String.valueOf(r.getAs[Any](s"max__$c")))
    }.toMap
    val stats = GraftTable.TableStats(v, r.getAs[Long]("__rows"), cols)
    Files.createDirectories(Paths.get(path, "_graft_stats"))
    Files.writeString(Paths.get(path, "_graft_stats", f"$v%08d.json"), stats.toJson)
    stats
  }

  /** Most recent persisted stats at or before the current version. */
  def stats(): Option[GraftTable.TableStats] = {
    val dir = Paths.get(path, "_graft_stats")
    if (!Files.isDirectory(dir)) return None
    val latest = graft.Fs.list(dir).iterator
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).filter(_ <= currentVersion)
      .maxOption
    latest.map(v => GraftTable.TableStats.fromJson(
      Files.readString(Paths.get(path, "_graft_stats", f"$v%08d.json"))))
  }

  /** count(*) from metadata when stats are current (reference:
    * FoldCountAggregate over snapshot row counts).
    */
  def fastCount(): Option[Long] =
    stats().filter(_.version == currentVersion).map(_.rowCount)

  /** Small-file compaction (reference: CompactBlock mutation,
    * physical_compact_block / OPTIMIZE TABLE ... COMPACT): rewrite the
    * current file set into ~`targetFiles` larger files. History is
    * preserved — compaction is just another snapshot.
    */
  /** COMPACT: rewrite small files into `targetFiles` outputs. With
    * `limit`, only the first `limit` files (snapshot order) merge into
    * one output and later files carry over untouched — the reference's
    * `OPTIMIZE TABLE .. COMPACT LIMIT n` bounded pass
    * (fuse/operations/compact.rs segment-limit semantics).
    */
  def compact(targetFiles: Int = 0, limit: Option[Int] = None): Long = {
    val prev = snapshot(currentVersion)
    limit match {
      case Some(n) if n < prev.files.length =>
        val (head, tail) = prev.files.splitAt(n)
        val merged = writeParts(readFiles(head).coalesce(1))
        commit(merged ++ tail, prev.ledger, s"COMPACT-LIMIT-$n")
      case _ =>
        // size the output count from the live bytes (128 MB target) so
        // a 100 TB table never funnels through one writer task
        val target =
          if (targetFiles > 0) targetFiles
          else {
            val bytes = prev.files.map(f =>
              Files.size(Paths.get(path, f))).sum
            math.max(1, math.ceil(bytes / (128.0 * 1024 * 1024)).toInt)
          }
        val compacted = readFiles(prev.files).coalesce(target)
        commit(writeParts(compacted), prev.ledger, s"COMPACT-$target")
    }
  }

  /** VACUUM (reference: VACUUM TABLE — drop data files no snapshot in
    * the retained history references, and truncate the log). Keeps the
    * most recent `keepVersions` snapshots; time travel earlier than
    * that is gone afterwards. Returns the deleted file names.
    */
  def vacuum(keepVersions: Int = 1): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val all = versions
    val keep = all.takeRight(keepVersions)
    val referenced = keep.flatMap(v => snapshot(v).files).toSet
    val live = graft.Fs.list(Paths.get(path)).iterator
      .filter(Files.isRegularFile(_))
      .map(_.getFileName.toString)
      .filter(f => f.endsWith(".parquet") && !referenced.contains(f)).toSeq
    live.foreach(f => Files.deleteIfExists(Paths.get(path, f)))
    all.dropRight(keepVersions).foreach { v =>
      Files.deleteIfExists(logDir.resolve(f"$v%08d.json"))
    }
    live
  }

  // ---- COPY INTO ------------------------------------------------------

  /** COPY INTO with per-file idempotence: files already in the ledger
    * are skipped (reference dedups by stage file etag). Returns
    * (loaded, skipped) file names.
    */
  def copyInto(stageDir: String, format: String = "parquet",
               options: Map[String, String] = Map.empty): (Seq[String], Seq[String]) = {
    val prev = if (currentVersion >= 0) snapshot(currentVersion) else Snapshot.empty
    val stageFiles = graft.Fs.list(Paths.get(stageDir)).iterator
      .filter(Files.isRegularFile(_))
      .map(_.getFileName.toString)
      .filter(f => !f.startsWith(".") && !f.startsWith("_")).toSeq.sorted
    val (skip, load) = stageFiles.partition(prev.ledger.contains)
    if (load.isEmpty) return (Seq.empty, skip)
    val df = spark.read.options(options).format(format)
      .load(load.map(f => s"$stageDir/$f"): _*)
    commit(prev.files ++ writeParts(df), prev.ledger ++ load, s"COPY-$format")
    (load, skip)
  }
}

object GraftTable {

  /** WHEN MATCHED [AND cond] THEN UPDATE SET k=expr,... / UPDATE * /
    * DELETE. `set == None` is DELETE; `Some(Map.empty)` is UPDATE *
    * (every target column takes the same-named source column).
    */
  final case class MatchedClause(cond: Option[String],
                                 set: Option[Map[String, String]])

  /** WHEN NOT MATCHED [AND cond] THEN INSERT [(cols) VALUES (exprs)].
    * `values == None` is INSERT * (positional same-named source cols).
    */
  final case class NotMatchedClause(cond: Option[String],
                                    values: Option[(Seq[String], Seq[String])])

  /** MERGE outcome: committed version + the reference's affected-row
    * counts (interpreter_merge_into.rs result columns).
    */
  final case class MergeResult(version: Long, inserted: Long,
                               updated: Long, deleted: Long)

  /** deterministic materialized-column name for (json column, path);
    * the short hash disambiguates paths that sanitize identically
    */
  def virtName(col: String, path: String): String = {
    val san = path.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_|_$", "")
    f"__virt_${col}_${san}_${path.hashCode & 0xffff}%04x"
  }

  final case class ColStats(ndv: Long, nullCount: Long, min: String, max: String)

  final case class TableStats(version: Long, rowCount: Long, cols: Map[String, ColStats]) {
    def toJson: String = {
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val colsJson = cols.toSeq.sortBy(_._1).map { case (n, c) =>
        s""""${esc(n)}": {"ndv": ${c.ndv}, "nulls": ${c.nullCount}, "min": "${esc(c.min)}", "max": "${esc(c.max)}"}"""
      }.mkString(",")
      s"""{"version": $version, "rows": $rowCount, "cols": {$colsJson}}"""
    }
  }

  object TableStats {
    def fromJson(s: String): TableStats = {
      def longField(name: String): Long =
        ("\"" + name + "\"\\s*:\\s*(-?\\d+)").r.findFirstMatchIn(s).get.group(1).toLong
      val colRe =
        """"([^"]+)": \{"ndv": (-?\d+), "nulls": (-?\d+), "min": "((?:[^"\\]|\\.)*)", "max": "((?:[^"\\]|\\.)*)"\}""".r
      val cols = colRe.findAllMatchIn(s).map { m =>
        m.group(1) -> ColStats(m.group(2).toLong, m.group(3).toLong, m.group(4), m.group(5))
      }.toMap
      TableStats(longField("version"), longField("rows"), cols)
    }
  }

  /** 2-D Hilbert curve index (order = bits per dimension), the classic
    * iterative xy→d mapping. Locality: consecutive d are adjacent
    * cells, so range-partitioning on d keeps both dimensions tight.
    */
  def hilbertIndex(order: Int, x0: Long, y0: Long): Long = {
    var x = x0; var y = y0; var d = 0L
    var s: Long = 1L << (order - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) { // rotate quadrant
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** n-dimensional Hilbert sort key as a fixed-width byte array
    * (n*order bits, MSB first — BinaryType's unsigned lexicographic
    * ordering equals curve order). Skilling's AxesToTranspose (public:
    * J. Skilling, "Programming the Hilbert curve", AIP Conf. Proc. 707,
    * 2004) converts the n order-bit coordinates to the transposed code;
    * the key is its bit-interleave. This is what lets CLUSTER BY take
    * 3..n keys (the reference's ClickBench table clusters on 5).
    */
  def hilbertBytes(order: Int, coords: Array[Long]): Array[Byte] = {
    val n = coords.length
    val X = coords.clone()
    val M = 1L << (order - 1)
    var Q = M // inverse undo excess work
    while (Q > 1) {
      val P = Q - 1
      var i = 0
      while (i < n) {
        if ((X(i) & Q) != 0L) X(0) ^= P
        else { val t = (X(0) ^ X(i)) & P; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      Q >>= 1
    }
    var i = 1 // Gray encode
    while (i < n) { X(i) ^= X(i - 1); i += 1 }
    var t = 0L
    Q = M
    while (Q > 1) { if ((X(n - 1) & Q) != 0L) t ^= Q - 1; Q >>= 1 }
    i = 0
    while (i < n) { X(i) ^= t; i += 1 }
    interleaveBits(order, X)
  }

  /** n-dimensional Morton key: plain bit-interleave, MSB first. */
  def zorderBytes(order: Int, coords: Array[Long]): Array[Byte] =
    interleaveBits(order, coords)

  private def interleaveBits(order: Int, words: Array[Long]): Array[Byte] = {
    val n = words.length
    val out = new Array[Byte]((order * n + 7) / 8)
    var bitPos = 0
    var bit = order - 1
    while (bit >= 0) {
      var w = 0
      while (w < n) {
        if (((words(w) >>> bit) & 1L) != 0L)
          out(bitPos / 8) = (out(bitPos / 8) | (0x80 >>> (bitPos % 8))).toByte
        bitPos += 1
        w += 1
      }
      bit -= 1
    }
    out
  }

  /** Z-order (Morton) index: interleave the low 16 bits of x and y. */
  def zorderIndex(x: Long, y: Long): Long = {
    var r = 0L
    var i = 0
    while (i < 16) {
      r |= ((x >> i) & 1L) << (2 * i)
      r |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  final case class Snapshot(version: Long, timestampMs: Long,
      files: Seq[String], ledger: Seq[String], operation: String) {
    def toJson: String = {
      def arr(xs: Seq[String]) = xs.map(s => "\"" + s + "\"").mkString("[", ",", "]")
      s"""{"version":$version,"timestampMs":$timestampMs,"operation":"$operation",""" +
        s""""files":${arr(files)},"ledger":${arr(ledger)}}"""
    }
  }

  object Snapshot {
    val empty: Snapshot = Snapshot(-1, 0, Seq.empty, Seq.empty, "NONE")
    // minimal parser for the fixed shape written above (no external deps)
    def fromJson(s: String): Snapshot = {
      def longField(name: String): Long =
        s.split("\"" + name + "\":")(1).takeWhile(c => c.isDigit || c == '-').toLong
      def strField(name: String): String =
        s.split("\"" + name + "\":\"")(1).takeWhile(_ != '"')
      def arrField(name: String): Seq[String] = {
        val body = s.split("\"" + name + "\":\\[")(1).takeWhile(_ != ']')
        if (body.trim.isEmpty) Seq.empty
        else body.split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSeq
      }
      Snapshot(longField("version"), longField("timestampMs"),
        arrField("files"), arrField("ledger"), strField("operation"))
    }
  }

  def create(spark: SparkSession, path: String, df: DataFrame): GraftTable = {
    Files.createDirectories(Paths.get(path))
    val t = new GraftTable(spark, path)
    t.append(df)
    t
  }

  def open(spark: SparkSession, path: String): GraftTable = {
    opened.put(Paths.get(path).toAbsolutePath.toString, ())
    new GraftTable(spark, path)
  }

  // session-visible table registry: powers system.virtual_columns /
  // system.streams introspection (paths only, instances are not held)
  private val opened = new java.util.concurrent.ConcurrentHashMap[String, Unit]()
  def openedPaths: Seq[String] = {
    import scala.jdk.CollectionConverters._
    opened.keySet.asScala.toSeq.sorted
  }
}
