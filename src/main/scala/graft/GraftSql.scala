package graft

import graft.sources.{GraftStream, GraftTable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** SQL-text statement surface: the reference's user-facing DML/DDL
  * grammar routed onto the engine's existing operations, so that the
  * whole lifecycle — CREATE / INSERT / UPDATE / DELETE / MERGE INTO /
  * COPY INTO / STREAM / time travel — is drivable with SQL text, not
  * just the Scala API.
  *
  * Reference grammar being modeled (not copied — these are the Rust AST
  * nodes the statements below correspond to):
  *  - statement dispatch: src/query/ast/src/ast/statements/statement.rs:49
  *  - MERGE INTO clauses: ast/statements/merge_into.rs:52-95
  *  - UPDATE/DELETE:      ast/statements/{update.rs:34, delete.rs:31}
  *  - COPY INTO:          ast/statements/copy.rs
  *  - STREAM DDL:         ast/statements/stream.rs:31-130
  *  - time travel AT / CHANGES: ast/query.rs:568-601 (TimeTravelPoint
  *    Snapshot | Timestamp | Offset | Stream)
  *  - multi-table INSERT: ast/statements/insert_multi_table.rs
  *
  * Design: this is a THIN head. Queries (SELECT/WITH/VALUES/EXPLAIN) go
  * to `spark.sql` after a textual rewrite that resolves `t AT (...)` and
  * `t CHANGES (...)` references to temp views built from the table's
  * snapshot log — Catalyst sees a plain plan and optimizes as usual.
  * Mutations parse only down to statement structure (clauses, names,
  * expression TEXT) and hand the expression strings to `expr(...)`, so
  * there is no hand-written expression grammar to drift from Spark's.
  */
final class GraftSql(val spark: SparkSession, val warehouse: String) {
  import GraftSql._

  private val tables  = mutable.LinkedHashMap[String, GraftTable]()
  private val streams = mutable.LinkedHashMap[String, GraftStream]()
  private val stages  = mutable.LinkedHashMap[String, String]()
  private val clusterKeys = mutable.LinkedHashMap[String, Seq[String]]()
  private var viewSeq = 0

  def table(name: String): GraftTable =
    tables.getOrElse(norm(name),
      throw new IllegalArgumentException(s"unknown table $name"))

  /** attach an existing GraftTable under a name (and as a temp view) */
  def register(name: String, t: GraftTable): GraftTable = {
    tables(norm(name)) = t
    refreshView(norm(name))
    t
  }

  def stream(name: String): GraftStream =
    streams.getOrElse(norm(name),
      throw new IllegalArgumentException(s"unknown stream $name"))

  private def refreshView(name: String): Unit =
    tables(name).read().createOrReplaceTempView(name)

  private def freshView(df: DataFrame): String = {
    viewSeq += 1
    val v = s"__graft_tt_$viewSeq"
    df.createOrReplaceTempView(v)
    v
  }

  private def status(kv: (String, Any)*): DataFrame = {
    val cols = kv.map { case (k, v) => lit(v.toString).as(k) }
    spark.range(1).select(cols: _*)
  }

  // ---- entry ----------------------------------------------------------

  def execute(sql: String): DataFrame = {
    val s = sql.trim.stripSuffix(";").trim
    val up = s.toUpperCase
    def is(kw: String) = up.startsWith(kw)
    if (is("SELECT") || is("WITH") || is("VALUES") || is("EXPLAIN") ||
        is("TABLE ") || is("(")) query(s)
    else if (is("CREATE") && up.contains("STREAM") &&
             CreateStreamRe.findFirstIn(s).isDefined) createStream(s)
    else if (is("CREATE") && CreateStageRe.findFirstIn(s).isDefined) createStage(s)
    else if (is("CREATE") && CreatePyFnRe.findFirstIn(s).isDefined) createPyFunction(s)
    else if (is("DROP FUNCTION") && DropFnRe.findFirstIn(s).isDefined) dropFunction(s)
    else if (is("CREATE")) createTable(s)
    else if (is("DROP STREAM")) dropStream(s)
    else if (is("DROP TABLE")) dropTable(s)
    else if (is("TRUNCATE")) truncateTable(s)
    else if (is("INSERT FIRST") || is("INSERT ALL")) insertMulti(s)
    else if (is("REPLACE INTO") && ReplaceRe.findFirstIn(s).isDefined) replaceInto(s)
    else if (is("INSERT") || is("REPLACE INTO")) insert(s)
    else if (is("UPDATE")) update(s)
    else if (is("DELETE")) delete(s)
    else if (is("MERGE")) merge(s)
    else if (is("COPY")) copy(s)
    else if (is("ALTER TABLE")) alterTable(s)
    else if (is("OPTIMIZE")) optimize(s)
    else if (is("VACUUM")) vacuum(s)
    else if (is("ANALYZE")) analyzeTable(s)
    else if (is("SHOW STREAMS")) showStreams()
    else if (is("SHOW TABLES")) showTables()
    else if (is("SHOW STAGES")) showStages()
    else if (is("BEGIN") || is("EXECUTE IMMEDIATE") || s.startsWith("$$"))
      graft.operators.SqlScript.executeImmediate(spark,
        s.replaceAll("(?i)^EXECUTE\\s+IMMEDIATE\\s*", ""))
    else query(s) // let Spark handle anything else (CREATE VIEW, SET, ...)
  }

  // ---- queries (with time-travel / changes / stream rewrite) ----------

  /** Streams referenced by the LAST query() call — consumed by DML that
    * selects from a stream (the reference advances stream cursors when
    * a DML consumes them: stream_table.rs).
    */
  private var lastStreamRefs: Seq[String] = Seq.empty

  private def query(s: String): DataFrame = spark.sql(rewriteReads(s))

  /** resolve `t AT (POINT => v)` / `t CHANGES (...) AT (...) [END (...)]`
    * / stream references into temp views over the snapshot log
    */
  private def rewriteReads(sql0: String): String = {
    tables.keys.foreach(refreshView)
    var sql = sql0
    // CHANGES first (its text contains an AT clause)
    sql = ChangesRe.replaceAllIn(sql, m => {
      val t = norm(m.group(1))
      if (!tables.contains(t)) m.matched
      else {
        val tab = tables(t)
        val info = m.group(2).toUpperCase
        val fromV = resolvePoint(tab, m.group(3), m.group(4))
        val toV = Option(m.group(5))
          .map(k => resolvePoint(tab, k, m.group(6)))
          .getOrElse(tab.currentVersion)
        val df0 = tab.changes(fromV, toV)
        val df = if (info == "APPEND_ONLY") df0.filter(col("change$action") === "INSERT") else df0
        scala.util.matching.Regex.quoteReplacement(freshView(df))
      }
    })
    sql = AtRe.replaceAllIn(sql, m => {
      val t = norm(m.group(1))
      if (!tables.contains(t)) m.matched
      else {
        val tab = tables(t)
        val df = tab.readAt(resolvePoint(tab, m.group(2), m.group(3)))
        scala.util.matching.Regex.quoteReplacement(freshView(df))
      }
    })
    // numbers(N)/numbers_mt(N) table functions (reference numbers TVF):
    // an unsigned 0..N-1 sequence named `number`
    sql = NumbersRe.replaceAllIn(sql, m =>
      s"(SELECT id AS number FROM range(${m.group(1)}))")
    // stream references: register each stream mentioned as a view
    val refs = streams.keys.filter(n => wordRe(n).findFirstIn(sql).isDefined).toSeq
    refs.foreach(n => streams(n).read().createOrReplaceTempView(n))
    lastStreamRefs = refs
    sql
  }

  private val NumbersRe = """(?i)\bnumbers(?:_mt|_local)?\s*\(\s*(\d+)\s*\)""".r

  private def resolvePoint(t: GraftTable, kind: String, value: String): Long = {
    val v = value.trim.stripPrefix("'").stripSuffix("'")
    kind.toUpperCase match {
      case "SNAPSHOT" => v.toLong
      case "TIMESTAMP" =>
        val ms = spark.sql(
          s"SELECT unix_millis(CAST(${value.trim} AS TIMESTAMP))").head.getLong(0)
        t.versionAsOf(ms)
      case "OFFSET" => // seconds relative to now (negative = past)
        t.versionAsOf(System.currentTimeMillis() + v.toLong * 1000L)
      case "STREAM" => stream(v).offset
      case other => throw new IllegalArgumentException(s"AT ($other => ...) unsupported")
    }
  }

  // ---- DDL ------------------------------------------------------------

  private def tablePath(name: String): String =
    Paths.get(warehouse, norm(name)).toString

  private def createTable(s: String): DataFrame = s match {
    case CreateTableAsRe(orReplace, name, select) =>
      val n = norm(name)
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) rmrf(tablePath(n))
      val df = spark.sql(rewriteReads(select))
      register(n, GraftTable.create(spark, tablePath(n), df))
      status("table" -> n, "op" -> "create-as")
    case CreateTableDdlClusterRe(orReplace, ifNotExists, name, ddl, cluster) =>
      val n = norm(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) rmrf(tablePath(n))
      val schema = StructType.fromDDL(stripConstraints(ddl))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      register(n, GraftTable.create(spark, tablePath(n), empty))
      // inline CLUSTER BY (reference create_table.rs) = the declared
      // recluster key set, same as ALTER TABLE ... CLUSTER BY
      Option(cluster).foreach(k => clusterKeys(n) = splitTopLevel(k, ',').map(norm))
      status("table" -> n, "op" -> "create")
    case CreateTableDdlRe(orReplace, ifNotExists, name, ddl) =>
      val n = norm(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) rmrf(tablePath(n))
      val schema = StructType.fromDDL(stripConstraints(ddl))
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      register(n, GraftTable.create(spark, tablePath(n), empty))
      status("table" -> n, "op" -> "create")
    case _ => query(s) // CREATE VIEW / FUNCTION / ... -> Spark
  }

  private def dropTable(s: String): DataFrame = {
    // databend allows a trailing ALL (purge history too; COW tables
    // drop their whole directory anyway)
    val name = norm(s.replaceAll("(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?", "")
      .replaceAll("(?is)\\s+ALL\\s*$", "").trim)
    tables.remove(name).foreach { t =>
      spark.catalog.dropTempView(name)
      rmrf(t.path)
    }
    status("table" -> name, "op" -> "drop")
  }

  private def truncateTable(s: String): DataFrame = {
    val name = norm(s.replaceAll("(?is)^TRUNCATE\\s+(TABLE\\s+)?", "").trim)
    val t = table(name)
    t.overwrite(t.read().limit(0).repartition(1))
    refreshView(name)
    status("table" -> name, "op" -> "truncate")
  }

  // ---- INSERT / REPLACE INTO ------------------------------------------

  /** REPLACE INTO t ON [CONFLICT](keys) <source> — the reference's
    * upsert (ast/statements/replace.rs): source rows REPLACE target
    * rows sharing the conflict key, others append; duplicated conflict
    * keys WITHIN the source are an error (databend 4000). Routed onto
    * the file-granular mergeInto (UPDATE * / INSERT *).
    */
  private def replaceInto(s: String): DataFrame = s match {
    case ReplaceRe(name, colList, keys, body) =>
      val n = norm(name)
      val t = table(n)
      val df = alignToTarget(t, colList, body)
      val keyCols = splitTopLevel(keys, ',').map(norm)
      require(keyCols.nonEmpty, "REPLACE INTO needs at least one conflict key")
      val dup = df.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalArgumentException(
        s"REPLACE INTO: duplicated on-conflict keys (${keyCols.mkString(",")}) in source")
      val src = df.alias("__src")
      val on = keyCols.map(k => s"$n.$k = __src.$k").mkString(" AND ")
      t.mergeInto(src, n, "__src", on,
        matched = Seq(GraftTable.MatchedClause(None, Some(Map.empty))),
        notMatched = Seq(GraftTable.NotMatchedClause(None, None)))
      refreshView(n)
      status("table" -> n, "op" -> "replace-into", "keys" -> keyCols.mkString(","))
    case _ => throw new IllegalArgumentException(s"cannot parse REPLACE INTO: $s")
  }

  /** align a statement's source rows (col list + body) to `t`'s schema */
  private def alignToTarget(t: GraftTable, colList: String, body: String): DataFrame = {
    val tgtSchema = t.read().schema
    val tgtCols = tgtSchema.fieldNames.toSeq
    val df0 = spark.sql(rewriteReads(body.trim))
    Option(colList).map(splitTopLevel(_, ',').map(c => norm(c))) match {
      case Some(cols) =>
        require(cols.length == df0.columns.length,
          s"column list has ${cols.length} names, query produces ${df0.columns.length}")
        val renamed = df0.toDF(cols: _*)
        val out = tgtCols.map { c =>
          if (cols.exists(_.equalsIgnoreCase(c))) col(c).cast(tgtSchema(c).dataType).as(c)
          else lit(null).cast(tgtSchema(c).dataType).as(c)
        }
        renamed.select(out: _*)
      case None =>
        require(df0.columns.length == tgtCols.length,
          s"query produces ${df0.columns.length} columns, table has ${tgtCols.length}")
        df0.toDF(tgtCols: _*)
          .select(tgtCols.map(c => col(c).cast(tgtSchema(c).dataType).as(c)): _*)
    }
  }

  private def insert(s: String): DataFrame = s match {
    case InsertRe(verb, name, colList, body) =>
      val n = norm(name)
      val t = table(n)
      val tgtSchema = t.read().schema
      val tgtCols = tgtSchema.fieldNames.toSeq
      val df0 = spark.sql(rewriteReads(body.trim))
      val explicit = Option(colList).map(splitTopLevel(_, ',').map(c => norm(c)))
      val df = explicit match {
        case Some(cols) =>
          require(cols.length == df0.columns.length,
            s"INSERT column list has ${cols.length} names, query produces ${df0.columns.length}")
          val renamed = df0.toDF(cols: _*)
          // missing target columns fill with NULL of the right type
          val out = tgtCols.map { c =>
            if (cols.exists(_.equalsIgnoreCase(c))) col(c).cast(tgtSchema(c).dataType).as(c)
            else lit(null).cast(tgtSchema(c).dataType).as(c)
          }
          renamed.select(out: _*)
        case None =>
          require(df0.columns.length == tgtCols.length,
            s"INSERT query produces ${df0.columns.length} columns, table has ${tgtCols.length}")
          df0.toDF(tgtCols: _*)
            .select(tgtCols.map(c => col(c).cast(tgtSchema(c).dataType).as(c)): _*)
      }
      val overwrite = (verb != null && verb.equalsIgnoreCase("OVERWRITE")) ||
        s.trim.toUpperCase.startsWith("REPLACE")
      if (overwrite) t.overwrite(df) else t.append(df)
      // reading a STREAM in a DML consumes it (advances the cursor)
      lastStreamRefs.foreach(n0 => streams(n0).consume(_ => ()))
      refreshView(n)
      status("table" -> n, "op" -> (if (overwrite) "overwrite" else "insert"))
    case _ => throw new IllegalArgumentException(s"cannot parse INSERT: $s")
  }

  /** INSERT FIRST|ALL [WHEN cond THEN INTO t...] [ELSE INTO t] INTO t... SELECT ... */
  private def insertMulti(s: String): DataFrame = {
    val first = s.toUpperCase.startsWith("INSERT FIRST")
    val rest = s.replaceAll("(?is)^INSERT\\s+(FIRST|ALL)\\s+", "")
    // the driving SELECT starts at the first top-level SELECT/WITH
    val sel = Seq(indexOfKeyword(rest, "SELECT"), indexOfKeyword(rest, "WITH"))
      .filter(_ >= 0)
    require(sel.nonEmpty, "multi-table INSERT needs a SELECT")
    val (clausePart, selectPart) = rest.splitAt(sel.min)
    val src = spark.sql(rewriteReads(selectPart))
    val branches = mutable.Buffer[(Column, GraftTable)]()
    var txt = clausePart.trim
    while (txt.nonEmpty) {
      txt match {
        case WhenBranchRe(cond, name, tail) =>
          branches += ((expr(cond.trim), table(name))); txt = tail.trim
        case ElseBranchRe(name, tail) =>
          branches += ((lit(true), table(name))); txt = tail.trim
        case IntoBranchRe(name, tail) =>
          branches += ((lit(true), table(name))); txt = tail.trim
        case _ => throw new IllegalArgumentException(s"cannot parse INSERT branches at: $txt")
      }
    }
    // MultiInsert semantics (sources/GraftStream.scala MultiInsert), with
    // each branch positionally aligned to its target's column names
    val cached = src.cache()
    try {
      if (first) {
        var notPrior: Column = lit(true)
        branches.foreach { case (c, t) =>
          val m = c <=> lit(true)
          t.append(cached.filter(notPrior && m).toDF(t.read().columns.toIndexedSeq: _*))
          notPrior = notPrior && !m
        }
      } else branches.foreach { case (c, t) =>
        t.append(cached.filter(c).toDF(t.read().columns.toIndexedSeq: _*))
      }
    } finally cached.unpersist()
    tables.keys.foreach(refreshView)
    status("op" -> (if (first) "insert-first" else "insert-all"),
      "branches" -> branches.size)
  }

  // ---- UPDATE / DELETE / MERGE ---------------------------------------

  private def update(s: String): DataFrame = s match {
    case UpdateRe(name, setPart, wherePart) =>
      val n = norm(name)
      val t = table(n)
      val pairs = splitTopLevel(setPart, ',').map { a =>
        val eq = indexOfTopLevel(a, '=')
        require(eq > 0, s"bad assignment: $a")
        norm(a.take(eq)).split('.').last -> expr(a.drop(eq + 1).trim)
      }
      // reference errors (1006) on duplicated assignments and on
      // assignments to columns the table does not have — both would
      // otherwise be silent wrong answers (last-wins / new column)
      val dups = pairs.groupBy(_._1).filter(_._2.length > 1).keys
      require(dups.isEmpty, s"UPDATE sets column(s) more than once: ${dups.mkString(",")}")
      val have = t.read().columns.map(_.toLowerCase).toSet
      val unknown = pairs.map(_._1).filterNot(c => have(c.toLowerCase))
      require(unknown.isEmpty,
        s"table $n does not have a column with name ${unknown.mkString(",")}")
      val assigns = pairs.toMap
      val cond = Option(wherePart).map(w => expr(w.trim)).getOrElse(lit(true))
      t.update(cond, assigns)
      refreshView(n)
      status("table" -> n, "op" -> "update")
    case _ => throw new IllegalArgumentException(s"cannot parse UPDATE: $s")
  }

  private def delete(s: String): DataFrame = s match {
    case DeleteRe(name, wherePart) =>
      val n = norm(name)
      val t = table(n)
      Option(wherePart) match {
        case Some(w) => t.delete(expr(w.trim))
        case None    => t.overwrite(t.read().limit(0).repartition(1))
      }
      refreshView(n)
      status("table" -> n, "op" -> "delete")
    case _ => throw new IllegalArgumentException(s"cannot parse DELETE: $s")
  }

  private def merge(s: String): DataFrame = {
    // MERGE INTO <t> [AS a] USING <src> [AS a] ON <cond> WHEN ...
    val m = MergeHeadRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse MERGE: $s"))
    val n = norm(m.group(1))
    val targetAlias = Option(m.group(2)).map(norm).getOrElse(n)
    val t = table(n)
    var rest = s.substring(m.end).trim

    // source: (subquery) or table name, optional alias
    val (srcDf, sourceAlias0, rest2) =
      if (rest.startsWith("(")) {
        val close = matchParen(rest, 0)
        val sub = rest.substring(1, close)
        (spark.sql(rewriteReads(sub)), None, rest.substring(close + 1).trim)
      } else {
        val id = rest.takeWhile(c => c.isLetterOrDigit || c == '_')
        tables.keys.foreach(refreshView)
        (spark.sql(rewriteReads(s"SELECT * FROM $id")), Some(norm(id)),
          rest.substring(id.length).trim)
      }
    val aliasM = AliasRe.findPrefixMatchOf(rest2)
      .filter(am => !am.group(1).equalsIgnoreCase("ON"))
    val sourceAlias = aliasM.map(am => norm(am.group(1)))
      .orElse(sourceAlias0).getOrElse("src")
    rest = aliasM.map(am => rest2.substring(am.end).trim).getOrElse(rest2)

    require(rest.toUpperCase.startsWith("ON"), s"MERGE needs ON, got: $rest")
    rest = rest.drop(2).trim
    val firstWhen = indexOfKeyword(rest, "WHEN")
    require(firstWhen > 0, "MERGE needs at least one WHEN clause")
    val onCond = rest.take(firstWhen).trim
    val clauseText = rest.substring(firstWhen)

    val matched = mutable.Buffer[GraftTable.MatchedClause]()
    val notMatched = mutable.Buffer[GraftTable.NotMatchedClause]()
    splitClauses(clauseText).foreach { c =>
      val body = c.replaceAll("(?is)^WHEN\\s+", "").trim
      val isNot = body.toUpperCase.startsWith("NOT")
      val afterKw = body.replaceAll("(?is)^(NOT\\s+)?MATCHED\\s*", "")
      val thenIdx = indexOfKeyword(afterKw, "THEN")
      require(thenIdx >= 0, s"WHEN clause needs THEN: $c")
      val pre = afterKw.take(thenIdx).trim
      val cond = if (pre.isEmpty) None
        else Some(pre.replaceAll("(?is)^AND\\s+", "").trim)
      val action = afterKw.substring(thenIdx + 4).trim
      val actUp = action.toUpperCase
      if (isNot) {
        require(actUp.startsWith("INSERT"), s"NOT MATCHED supports INSERT only: $action")
        val after = action.substring(6).trim
        if (after.isEmpty || after == "*")
          notMatched += GraftTable.NotMatchedClause(cond, None)
        else {
          val im = InsertValuesRe.findFirstMatchIn(after)
            .getOrElse(throw new IllegalArgumentException(s"cannot parse INSERT clause: $action"))
          val cols = splitTopLevel(im.group(1), ',').map(norm)
          val vals = splitTopLevel(im.group(2), ',').map(_.trim)
          notMatched += GraftTable.NotMatchedClause(cond, Some((cols, vals)))
        }
      } else if (actUp.startsWith("DELETE"))
        matched += GraftTable.MatchedClause(cond, None)
      else if (actUp.startsWith("UPDATE")) {
        val after = action.substring(6).trim
        if (after == "*") matched += GraftTable.MatchedClause(cond, Some(Map.empty))
        else {
          val setTxt = after.replaceAll("(?is)^SET\\s+", "")
          val set = splitTopLevel(setTxt, ',').map { a =>
            val eq = indexOfTopLevel(a, '=')
            // target-side SET columns may be alias-qualified (t.c = ...)
            // — the reference's grammar allows it; match on the column
            val rawKey = norm(a.take(eq))
            val key = rawKey.split('.').last
            key -> a.drop(eq + 1).trim
          }.toMap
          matched += GraftTable.MatchedClause(cond, Some(set))
        }
      } else throw new IllegalArgumentException(s"unknown MERGE action: $action")
    }

    t.mergeInto(srcDf, targetAlias, sourceAlias, onCond,
      matched.toSeq, notMatched.toSeq)
    refreshView(n)
    status("table" -> n, "op" -> "merge",
      "matched_clauses" -> matched.size, "not_matched_clauses" -> notMatched.size)
  }

  // ---- COPY INTO / stages --------------------------------------------

  /** CREATE FUNCTION ... LANGUAGE python: register a scalar python UDF
    * into Spark's registry (persistent worker pool; see PyScalarUdf).
    */
  private def createPyFunction(s: String): DataFrame = s match {
    case CreatePyFnRe(name, argList, retDdl, handler, body) =>
      val args = argList.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        .map(t => StructType.fromDDL(s"x $t").head.dataType)
      val ret = StructType.fromDDL(s"x ${retDdl.trim}").head.dataType
      graft.functions.PyScalarUdf.register(spark,
        graft.functions.PyScalarUdf.PyFn(norm(name), args, ret, handler, body))
      status("function" -> norm(name), "op" -> "create-function", "language" -> "python")
    case _ => throw new IllegalArgumentException(s"cannot parse CREATE FUNCTION: $s")
  }

  private def dropFunction(s: String): DataFrame = s match {
    case DropFnRe(name) =>
      graft.functions.PyScalarUdf.drop(spark, norm(name))
      status("function" -> norm(name), "op" -> "drop-function")
    case _ => throw new IllegalArgumentException(s"cannot parse DROP FUNCTION: $s")
  }

  private def createStage(s: String): DataFrame = s match {
    case CreateStageRe(name, url) =>
      stages(norm(name)) = url
      status("stage" -> norm(name), "url" -> url)
  }

  private def copy(s: String): DataFrame = s match {
    case CopyRe(name, src, rest0) =>
      val n = norm(name)
      val t = table(n)
      val dir = resolveStagePath(src.trim)
      val rest = Option(rest0).getOrElse("")
      val (fmt, opts) = FileFormatRe.findFirstMatchIn(rest) match {
        case None => ("parquet", Map.empty[String, String])
        case Some(fm) =>
          val kvs = splitTopLevel(fm.group(1), ',').flatMap { kv =>
            val eq = indexOfTopLevel(kv, '=')
            if (eq < 0) None
            else Some(norm(kv.take(eq)) -> kv.drop(eq + 1).trim.stripPrefix("'").stripSuffix("'"))
          }.toMap
          val tpe = kvs.getOrElse("type", "parquet").toLowerCase
          val sparkFmt = tpe match {
            case "csv" | "tsv" => "csv"
            case "ndjson" | "json" => "json"
            case other => other
          }
          val o = mutable.LinkedHashMap[String, String]()
          if (tpe == "tsv") o("sep") = "\t"
          kvs.get("field_delimiter").foreach(o("sep") = _)
          kvs.get("skip_header").foreach(h => o("header") = (h.toInt > 0).toString)
          if (sparkFmt == "csv") o("inferSchema") = "true"
          (sparkFmt, o.toMap)
      }
      val (loaded, skipped) = t.copyInto(dir, fmt, opts)
      refreshView(n)
      status("table" -> n, "op" -> "copy",
        "files_loaded" -> loaded.size, "files_skipped" -> skipped.size)
    case _ => throw new IllegalArgumentException(s"cannot parse COPY: $s")
  }

  private def resolveStagePath(src: String): String = {
    val v = src.stripPrefix("'").stripSuffix("'")
    if (v.startsWith("@")) {
      val (stage, sub) = v.stripPrefix("@").span(_ != '/')
      val base = stages.getOrElse(norm(stage),
        throw new IllegalArgumentException(s"unknown stage @$stage"))
      if (sub.isEmpty) base else base.stripSuffix("/") + sub
    } else v.stripPrefix("fs://")
  }

  // ---- STREAM ---------------------------------------------------------

  private def createStream(s: String): DataFrame = s match {
    case CreateStreamRe(ifNotExists, name, tbl, appendOnly) =>
      val n = norm(name)
      if (streams.contains(n) && ifNotExists != null)
        return status("stream" -> n, "op" -> "exists")
      val mode = if (appendOnly != null && appendOnly.equalsIgnoreCase("true"))
        GraftStream.AppendOnly else GraftStream.Standard
      streams(n) = GraftStream.create(table(tbl), n, mode)
      status("stream" -> n, "on" -> norm(tbl), "op" -> "create")
  }

  private def dropStream(s: String): DataFrame = {
    val name = norm(s.replaceAll("(?is)^DROP\\s+STREAM\\s+(IF\\s+EXISTS\\s+)?", "").trim)
    streams.remove(name)
    status("stream" -> name, "op" -> "drop")
  }

  private def showStreams(): DataFrame = {
    val rows = streams.toSeq.map { case (n, st) =>
      (n, Paths.get(st.table.path).getFileName.toString, st.mode.toString, st.offset)
    }
    import spark.implicits._
    rows.toDF("name", "table", "mode", "offset")
  }

  private def showTables(): DataFrame = {
    val rows = tables.toSeq.map { case (n, t) => (n, t.path, t.currentVersion) }
    import spark.implicits._
    rows.toDF("name", "path", "version")
  }

  private def showStages(): DataFrame = {
    import spark.implicits._
    stages.toSeq.toDF("name", "url")
  }

  // ---- maintenance ----------------------------------------------------

  private def alterTable(s: String): DataFrame = s match {
    case AlterClusterRe(name, keys) =>
      val n = norm(name)
      clusterKeys(n) = splitTopLevel(keys, ',').map(norm)
      status("table" -> n, "op" -> "cluster-by",
        "keys" -> clusterKeys(n).mkString(","))
    case AlterReclusterRe(name) =>
      val n = norm(name)
      val keys = clusterKeys.getOrElse(n,
        throw new IllegalArgumentException(s"no CLUSTER BY declared for $n"))
      val curve = if (keys.length >= 2) "hilbert" else "linear"
      table(n).recluster(keys, curve = curve)
      refreshView(n)
      status("table" -> n, "op" -> "recluster", "curve" -> curve)
    case AlterAddColRe(name, colName, typeDdl, dflt) =>
      val n = norm(name)
      table(n).addColumn(norm(colName),
        typeDdl.trim.replaceAll("(?i)\\s+NOT\\s+NULL", "").replaceAll("(?i)\\s+NULL$", ""),
        Option(dflt).map(_.trim))
      refreshView(n)
      status("table" -> n, "op" -> "add-column", "column" -> norm(colName))
    case AlterDropColRe(name, colName) =>
      val n = norm(name)
      table(n).dropColumn(norm(colName))
      refreshView(n)
      status("table" -> n, "op" -> "drop-column", "column" -> norm(colName))
    case AlterRenameColRe(name, from, to) =>
      val n = norm(name)
      table(n).renameColumn(norm(from), norm(to))
      refreshView(n)
      status("table" -> n, "op" -> "rename-column")
    case _ => throw new IllegalArgumentException(s"cannot parse ALTER TABLE: $s")
  }

  private def optimize(s: String): DataFrame = s match {
    case OptimizeRe(name, action) =>
      val n = norm(name)
      action.toUpperCase match {
        case "COMPACT" => table(n).compact(); refreshView(n)
        case "PURGE"   => table(n).vacuum()
        case other     => throw new IllegalArgumentException(s"OPTIMIZE $other unsupported")
      }
      status("table" -> n, "op" -> s"optimize-${action.toLowerCase}")
    case _ => throw new IllegalArgumentException(s"cannot parse OPTIMIZE: $s")
  }

  private def vacuum(s: String): DataFrame = {
    val name = norm(s.replaceAll("(?is)^VACUUM\\s+TABLE\\s+", "").trim)
    val removed = table(name).vacuum()
    status("table" -> name, "op" -> "vacuum", "removed" -> removed.size)
  }

  private def analyzeTable(s: String): DataFrame = {
    val name = norm(s.replaceAll("(?is)^ANALYZE\\s+TABLE\\s+", "").trim)
    val st = table(name).analyze()
    status("table" -> name, "op" -> "analyze", "row_count" -> st.rowCount)
  }
}

object GraftSql {

  def apply(spark: SparkSession, warehouse: String): GraftSql = {
    Files.createDirectories(Paths.get(warehouse))
    new GraftSql(spark, warehouse)
  }

  private[graft] def norm(s: String): String =
    s.trim.stripPrefix("`").stripSuffix("`").toLowerCase

  private def rmrf(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private def wordRe(w: String) = ("(?i)\\b" + java.util.regex.Pattern.quote(w) + "\\b").r

  // DDL constraints Spark's fromDDL doesn't know: strip NOT NULL / DEFAULT
  private def stripConstraints(ddl: String): String =
    splitTopLevel(ddl, ',').map { c =>
      c.replaceAll("(?i)\\s+NOT\\s+NULL", "")
        .replaceAll("(?i)\\s+DEFAULT\\s+.*$", "")
        .replaceAll("(?i)\\s+NULL$", "")
        // databend type spellings Spark's DDL parser lacks: length-less
        // varchar, and the sized int family (unsigned types widen so
        // the whole unsigned range fits — Types.scala's widening rule)
        .replaceAll("(?i)\\bvarchar$", "string")
        .replaceAll("(?i)\\buint64$", "decimal(20,0)")
        .replaceAll("(?i)\\b(int64|uint32)$", "bigint")
        .replaceAll("(?i)\\b(int32|uint16)$", "int")
        .replaceAll("(?i)\\b(int16|uint8)$", "smallint")
        .replaceAll("(?i)\\bint8$", "tinyint")
    }.mkString(", ")

  // ---- statement shapes ----------------------------------------------

  private val CreateTableAsRe =
    """(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(\w+)\s+AS\s+(.*)""".r
  private val CreateTableDdlRe =
    """(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s*\((.*)\)\s*""".r
  private val CreateTableDdlClusterRe =
    """(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s*\((.*)\)\s*CLUSTER\s+BY\s*\((.*)\)\s*""".r
  private val InsertRe =
    """(?is)\s*(?:INSERT\s+(INTO|OVERWRITE)|REPLACE\s+INTO)\s+(?:TABLE\s+)?(\w+)\s*(?:\(([\w\s,`]+)\))?\s*(SELECT.*|WITH.*|VALUES.*|TABLE\s.*)""".r
  private val ReplaceRe =
    """(?is)\s*REPLACE\s+INTO\s+(?:TABLE\s+)?(\w+)\s*(?:\(([\w\s,`]+)\))?\s*ON\s*(?:CONFLICT\s*)?\(([^)]*)\)\s*(SELECT.*|WITH.*|VALUES.*|TABLE\s.*)""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?\s*""".r
  private val MergeHeadRe =
    """(?is)\s*MERGE\s+INTO\s+(\w+)(?:\s+AS\s+(\w+))?\s+USING\s+""".r
  private val AliasRe = """(?is)(?:AS\s+)?(\w+)\s""".r
  private val InsertValuesRe =
    """(?is)\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$""".r
  private val CopyRe =
    """(?is)\s*COPY\s+INTO\s+(\w+)\s+FROM\s+('(?:[^']*)'|@[\w./-]+)(.*)""".r
  private val FileFormatRe =
    """(?is)FILE_FORMAT\s*=\s*\((.*?)\)""".r
  private val CreateStageRe =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?STAGE\s+(\w+)\s+URL\s*=\s*'([^']*)'\s*""".r
  /** reference UDF DDL (src/query/ast/src/ast/statements/udf.rs):
    * CREATE [OR REPLACE] FUNCTION f (t1, t2) RETURNS t LANGUAGE python
    * HANDLER = 'h' AS $$ body $$
    */
  private val CreatePyFnRe =
    ("""(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(\w+)\s*\(([^)]*)\)\s*""" +
     """RETURNS\s+([\w<>,() ]+?)\s+LANGUAGE\s+python\s+HANDLER\s*=\s*'(\w+)'\s*""" +
     """AS\s+\$\$(.*)\$\$\s*""").r
  private val DropFnRe =
    """(?is)\s*DROP\s+FUNCTION\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val CreateStreamRe =
    """(?is)\s*CREATE\s+STREAM\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s+ON\s+TABLE\s+(\w+)(?:\s+APPEND_ONLY\s*=\s*(\w+))?\s*""".r
  private val AlterClusterRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+CLUSTER\s+BY\s*\((.*)\)\s*""".r
  private val AlterReclusterRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RECLUSTER(?:\s+FINAL)?\s*""".r
  private val AlterAddColRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+COLUMN\s+(\w+)\s+([\w()<>, ]+?)(?:\s+DEFAULT\s+(.+?))?\s*""".r
  private val AlterDropColRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+COLUMN\s+(\w+)\s*""".r
  private val AlterRenameColRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*""".r
  private val OptimizeRe =
    """(?is)\s*OPTIMIZE\s+TABLE\s+(\w+)\s+(\w+)\s*""".r
  private val WhenBranchRe =
    """(?is)\s*WHEN\s+(.*?)\s+THEN\s+INTO\s+(\w+)\s*(.*)""".r
  private val ElseBranchRe = """(?is)\s*ELSE\s+INTO\s+(\w+)\s*(.*)""".r
  private val IntoBranchRe = """(?is)\s*INTO\s+(\w+)\s*(.*)""".r
  private val ChangesRe =
    ("""(?is)(\w+)\s+CHANGES\s*\(\s*INFORMATION\s*=>\s*(DEFAULT|APPEND_ONLY)\s*\)""" +
     """\s*AT\s*\(\s*(\w+)\s*=>\s*([^()]*)\)(?:\s*END\s*\(\s*(\w+)\s*=>\s*([^()]*)\))?""").r
  private val AtRe =
    """(?is)(\w+)\s+AT\s*\(\s*(SNAPSHOT|TIMESTAMP|OFFSET|STREAM)\s*=>\s*([^()]*)\)""".r

  // ---- tiny text scanner (quotes + parens aware) ---------------------

  /** split on `sep` at paren depth 0, outside quoted strings */
  private[graft] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0; var q: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { cur += c; if (c == q) q = 0 }
      else c match {
        case '\'' | '"' | '`' => q = c; cur += c
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case `sep` if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** index of first top-level occurrence of `ch` */
  private[graft] def indexOfTopLevel(s: String, ch: Char): Int = {
    var depth = 0; var q: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' | '`' => q = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ if c == ch && depth == 0 => return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** index of first top-level, word-boundary, case-insensitive keyword */
  private[graft] def indexOfKeyword(s: String, kw: String, from: Int = 0): Int = {
    val upper = s.toUpperCase
    val k = kw.toUpperCase
    var depth = 0; var q: Char = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' | '`' => q = c
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case _ =>
          if (depth == 0 && i >= from && upper.startsWith(k, i) &&
              (i == 0 || !upper.charAt(i - 1).isLetterOrDigit) &&
              (i + k.length >= s.length || !upper.charAt(i + k.length).isLetterOrDigit))
            return i
      }
      i += 1
    }
    -1
  }

  /** index of the `)` matching the `(` at `open` */
  private[graft] def matchParen(s: String, open: Int): Int = {
    var depth = 0; var q: Char = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else c match {
        case '\'' | '"' | '`' => q = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  /** split `WHEN ... WHEN ...` clause text into individual clauses */
  private[graft] def splitClauses(s: String): Seq[String] = {
    val starts = mutable.Buffer[Int]()
    var i = 0
    while (i >= 0 && i < s.length) {
      val at = indexOfKeyword(s, "WHEN", i)
      if (at < 0) i = -1
      else { starts += at; i = at + 4 }
    }
    starts.zipAll(starts.drop(1), 0, s.length).map { case (a, b) =>
      s.substring(a, b).trim
    }.toSeq
  }
}
