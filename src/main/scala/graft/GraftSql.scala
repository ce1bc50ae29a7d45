package graft

import graft.sources.{GraftStream, GraftTable}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.util.chaining._

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
  // ALTER TABLE SET OPTIONS(...) key-values (reference table meta
  // options: change_tracking, approx_distinct_columns, ...). Change
  // tracking is snapshot-log-based here and always available, so the
  // flag is recorded for SHOW/meta parity rather than gating CDC.
  private val tableOptions = mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, String]]()
  // declared NOT NULL columns per table — parquet storage is nullable,
  // so DESCRIBE/SHOW COLUMNS report the declared constraint from here
  // (the reference keeps it in table meta)
  private val notNullCols = mutable.LinkedHashMap[String, Set[String]]()
  // NOT NULL and no DEFAULT: must appear in every INSERT column list
  private val requiredCols = mutable.LinkedHashMap[String, Set[String]]()
  private val databases = mutable.LinkedHashSet[String]("default")
  private var currentDb = "default"
  private var viewSeq = 0

  // ---- security policies (reference ee/05_ee_ddl: CREATE MASKING /
  // ROW ACCESS POLICY, data_mask/row_access handlers) -----------------
  /** one shared namespace for both policy kinds (the reference rejects
    * a masking policy named like an existing row access policy, 2321/4)
    */
  private val secPolicies = mutable.LinkedHashMap[String, SecPolicy]()
  /** tableKey -> (policyName, ON columns, in USING order) — at most one
    * row access policy per table (reference: second ADD errors 1132)
    */
  private val rowPolicyAttach = mutable.LinkedHashMap[String, (String, Seq[String])]()
  /** tableKey -> maskedColumn -> (policyName, arg columns AFTER the
    * value column — empty for the 1-arg no-USING form)
    */
  private val maskAttach =
    mutable.LinkedHashMap[String, mutable.LinkedHashMap[String, (String, Seq[String])]]()
  // ---- computed columns (reference ee computed_column suites:
  // `col type AS (expr) STORED|VIRTUAL`) -------------------------------
  /** per table, in declared order: (name, type, NORMALIZED spark-SQL
    * expr, stored?). STORED columns exist physically and recompute on
    * every write; VIRTUAL columns evaluate at read.
    */
  private val computedCols = mutable.LinkedHashMap[String,
    Seq[(String, org.apache.spark.sql.types.DataType, String, Boolean)]]()
  /** declared column order including VIRTUAL computed columns */
  private val declaredOrder = mutable.LinkedHashMap[String, Seq[String]]()
  /** DEFAULT expression text per column (INSERT fills omitted
    * columns with these — reference fills declared defaults, not NULL)
    */
  private val colDefaults = mutable.LinkedHashMap[String, Map[String, String]]()
  private val bitmapCols = mutable.LinkedHashMap[String, Set[String]]()

  /** databend settings this instance SET into the shared SparkSession */
  private val sessionSetKeys = mutable.Set[String]()

  /** unset every databend setting this instance SET — harnesses that
    * drive many logical sessions over one SparkSession call this
    * between suites (the reference's runner gets a fresh session each
    * suite, so suites never reset knobs like max_result_rows)
    */
  def resetSessionSettings(): Unit = {
    sessionSetKeys.foreach { k =>
      try spark.conf.unset(k) catch { case _: Exception => () }
    }
    sessionSetKeys.clear()
  }

  // ---- table indexes (reference query/index suites: INVERTED /
  // NGRAM / VECTOR / SPATIAL index DDL + AGGREGATING INDEX) ------------
  private case class IndexDef(name: String, family: String,
      cols: Seq[String], opts: mutable.LinkedHashMap[String, String],
      sync: Boolean)
  private val tableIndexes = mutable.LinkedHashMap[String, mutable.Buffer[IndexDef]]()
  /** aggregating indexes: name -> (tableKey, index SELECT, sync) */
  private val aggIndexes = mutable.LinkedHashMap[String, (String, String, Boolean)]()

  private val roles = mutable.LinkedHashSet[String]("account_admin", "public")
  private var currentRole: String = "account_admin"
  /** active secondary roles: None = ALL granted roles, Some(list) =
    * that list (SET SECONDARY ROLES NONE == Some(empty))
    */
  private var secondaryRoles: Option[Seq[String]] = None

  private def isRoleInSession(r: String): Boolean = {
    val n = r.toLowerCase
    n == currentRole || (secondaryRoles match {
      case None       => roles.exists(_.equalsIgnoreCase(n))
      case Some(list) => list.exists(_.equalsIgnoreCase(n))
    })
  }

  /** resolve the session-role builtins to literals: current_role()
    * and IS_ROLE_IN_SESSION('r') bind at statement time
    */
  private def substituteRoleFns(sql: String): String = {
    var out = sql
    if ("""(?i)\bcurrent_role\s*\(""".r.findFirstIn(out).isDefined)
      out = out.replaceAll("(?i)\\bcurrent_role\\s*\\(\\s*\\)",
        "'" + currentRole.replace("'", "''") + "'")
    if ("""(?i)\bis_role_in_session\s*\(""".r.findFirstIn(out).isDefined)
      out = """(?i)\bis_role_in_session\s*\(\s*'([^']*)'\s*\)""".r
        .replaceAllIn(out, m => if (isRoleInSession(m.group(1))) "TRUE" else "FALSE")
    out
  }
  /** DROP TABLE retains the table directory (moved aside) and its
    * policy attachments so UNDROP TABLE can restore both — reference
    * fuse drop/undrop retention. A new CREATE at the same name starts
    * clean (attachments live in the stash, not on the name).
    */
  private case class DroppedTable(t: GraftTable,
      rowPolicy: Option[(String, Seq[String])],
      masks: Seq[(String, (String, Seq[String]))])
  private val droppedTables = mutable.LinkedHashMap[String, DroppedTable]()
  private var droppedSeq = 0

  /** Spark temp views are session-global, but a GraftSql instance is a
    * private catalog over its own warehouse dir (the reference scopes
    * tables per-database in its meta service). Namespacing every view
    * this instance registers keeps concurrent instances on one
    * SparkSession from clobbering each other's `t`/`t1`/... views.
    */
  private val viewPrefix = s"graft${GraftSql.nextInstanceId()}_"

  /** resolve a (possibly unqualified) name against the current database
    * FIRST (the reference's rule): `t` under `USE db` is `db.t` when it
    * exists, the bare registration otherwise — the round-8 bare-first
    * order silently read the default db's same-named table (duckdb
    * grouping_sets suite caught it)
    */
  private def resolveKey(n0: String): String = {
    val n = norm(n0)
    if (n.contains(".")) n
    else if (tables.contains(s"$currentDb.$n")) s"$currentDb.$n"
    else n
  }

  /** key for a NEW object: qualified under the current database */
  private def qualifyNew(n0: String): String = {
    val n = norm(n0)
    if (n.contains(".") || currentDb == "default") n else s"$currentDb.$n"
  }

  def table(name: String): GraftTable =
    tables.getOrElse(resolveKey(name),
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

  /** flattened, instance-namespaced temp-view name for a table key */
  private def viewName(key: String): String =
    viewPrefix + key.replaceAll("[^A-Za-z0-9_]", "_")

  private def refreshView(name: String): Unit =
    policyRead(name).createOrReplaceTempView(viewName(name))

  /** the table's rows as queries see them: row-access-policy filter
    * plus masking-policy column rewrites, both evaluated over RAW
    * column values (filter-then-select keeps mask expressions reading
    * pre-mask inputs, matching the reference's one-pass bind)
    */
  private[graft] def policyRead(name: String): DataFrame = {
    var df = tables(name).read()
    // VIRTUAL computed columns evaluate at read, at their declared
    // positions (exprs were normalized to plain Spark SQL at DDL time,
    // so spark.sql here cannot re-enter the rewrite pipeline)
    val virt = computedCols.getOrElse(name, Seq.empty).filterNot(_._4)
    if (virt.nonEmpty) {
      val v = freshView(df)
      val order = declaredOrder.getOrElse(name, df.columns.toSeq)
      val proj = order.map { c =>
        virt.find(_._1.equalsIgnoreCase(c)) match {
          case Some((nm, _, ex, _)) => s"$ex AS `$nm`"
          case None => s"`$c`"
        }
      }
      df = spark.sql(s"SELECT ${proj.mkString(", ")} FROM $v")
    }
    rowPolicyPredicate(name).foreach(p => df = df.filter(expr(p)))
    val masks = maskAttach.getOrElse(name, mutable.LinkedHashMap.empty)
    if (masks.nonEmpty)
      df = df.select(df.columns.toSeq.map { c =>
        masks.get(c.toLowerCase) match {
          case Some((pn, argCols)) =>
            expr(policyBodySql(secPolicies(pn), c +: argCols, None)).as(c)
          case None => col(s"`$c`")
        }
      }: _*)
    df
  }

  /** SQL text of the table's row-access predicate, column refs
    * optionally qualified with `qual` (for MERGE ON conditions)
    */
  private def rowPolicyPredicate(name: String,
      qual: Option[String] = None): Option[String] =
    rowPolicyAttach.get(name).map { case (pn, cols) =>
      policyBodySql(secPolicies(pn), cols, qual)
    }

  // ---- computed-column helpers ---------------------------------------

  /** identifiers referenced by an expression text (function-call names
    * and string-literal contents excluded) — used for the reference's
    * 1065/1117 computed-column dependency checks
    */
  private def exprIdents(text: String): Set[String] = {
    val out = mutable.LinkedHashSet[String]()
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      if (ch == '\'') { val j = text.indexOf('\'', i + 1); i = if (j < 0) text.length else j + 1 }
      else if (ch.isLetter || ch == '_') {
        var j = i
        while (j < text.length && (text.charAt(j).isLetterOrDigit || text.charAt(j) == '_')) j += 1
        var k = j
        while (k < text.length && text.charAt(k).isWhitespace) k += 1
        if (!(k < text.length && text.charAt(k) == '('))
          out += text.substring(i, j).toLowerCase
        i = j
      } else i += 1
    }
    out.toSet
  }

  /** one column spec's computed/default metadata:
    * (physicalSpec or None-for-virtual, name, Option(dataType, rawExpr,
    * stored), Option(defaultExpr))
    */
  private case class ColSpec(name: String, physical: Option[String],
      computed: Option[(String, String, Boolean)], // (typeDdl, expr, stored)
      default: Option[String])

  /** split a CREATE TABLE column list into per-column metadata,
    * peeling `[GENERATED ALWAYS] AS (expr) STORED|VIRTUAL` and
    * `DEFAULT expr` clauses (reference ast/statements/table.rs
    * ColumnDefinition)
    */
  private def parseColSpecs(ddl: String): Seq[ColSpec] =
    splitTopLevel(ddl, ',').map { c0 =>
      val c = c0.trim
      val nm = """^\s*([`"\w]+)""".r.findFirstMatchIn(c).map(m => norm(m.group(1)))
        .getOrElse(throw new IllegalArgumentException(s"bad column spec: $c"))
      val asM = """(?is)\b(?:GENERATED\s+ALWAYS\s+)?AS\s*\(""".r.findFirstMatchIn(c)
      asM match {
        case Some(am) =>
          val open = am.end - 1
          val close = matchParen(c, open)
          val ex = c.substring(open + 1, close)
          val tail = c.substring(close + 1).trim
          val stored = tail.toUpperCase.startsWith("STORED")
          require(stored || tail.toUpperCase.startsWith("VIRTUAL"),
            s"computed column $nm needs STORED or VIRTUAL: $c")
          val typeDdl = c.substring(0, am.start)
            .replaceFirst("^\\s*[`\"\\w]+\\s+", "").trim
          val phys = if (stored) Some(s"$nm ${typeDdl}") else None
          ColSpec(nm, phys, Some((typeDdl, ex, stored)), None)
        case None =>
          // the corpus spells both `DEFAULT 1` and `DEFAULT(1)`; the
          // keyword needs whitespace OR an open paren after it so a
          // column NAMED default_value doesn't grow a bogus default
          val dM = """(?is)\bDEFAULT(?:\s+|\s*(?=\())(.+?)(?:\s+COMMENT\s+'[^']*')?\s*$""".r
            .findFirstMatchIn(c)
          ColSpec(nm, Some(c), None, dM.map(_.group(1).trim))
      }
    }

  /** run a computed-column expression once through the full
    * databend->spark rewrite pipeline against the table's physical
    * view, and keep the resulting plain-Spark text (so read-time
    * evaluation cannot re-enter the pipeline)
    */
  private def normalizeComputedExpr(n: String, ex: String,
      dt: org.apache.spark.sql.types.DataType): String = {
    val probe = rewriteReads(s"SELECT CAST(($ex) AS ${dt.sql}) AS __c FROM ${viewName(n)}")
    """(?is)^\s*SELECT\s+(.*)\s+AS\s+__c\s+FROM\s+\S+\s*$""".r
      .findFirstMatchIn(probe).map(_.group(1))
      .getOrElse(s"CAST(($ex) AS ${dt.sql})")
  }

  /** register computed/default metadata for a freshly created table
    * (the table's physical view must already exist); validates that
    * computed expressions reference no other computed column (1065)
    */
  private def registerColumnMeta(n: String, specs: Seq[ColSpec]): Unit = {
    computedCols.remove(n); declaredOrder.remove(n); colDefaults.remove(n)
    // declared-BITMAP columns store as BINARY; remember them so string
    // INSERT cells parse via to_bitmap ('5, 6' -> roaring), matching
    // the reference's string->bitmap cast
    bitmapCols.remove(n)
    val bms = specs.collect {
      case ColSpec(nm, Some(spec), None, _)
          if """(?i)^\s*[`"\w]+\s+bitmap\b""".r.findFirstIn(spec).isDefined =>
        nm.toLowerCase
    }
    if (bms.nonEmpty) bitmapCols(n) = bms.toSet
    val compNames = specs.filter(_.computed.isDefined).map(_.name.toLowerCase).toSet
    val comp = specs.flatMap { sp =>
      sp.computed.map { case (typeDdl, ex, stored) =>
        val refs = exprIdents(ex)
        val bad = refs.intersect(compNames - sp.name.toLowerCase)
        require(bad.isEmpty,
          s"1065: computed column ${sp.name} references computed column(s) ${bad.mkString(",")}")
        val dt = StructType.fromDDL(stripConstraints(s"x ${typeDdl}")).head.dataType
        (sp.name, dt, normalizeComputedExpr(n, ex, dt), stored)
      }
    }
    if (comp.nonEmpty) {
      computedCols(n) = comp
      declaredOrder(n) = specs.map(_.name)
    }
    // reference semantics (ast/statements/table.rs + crdb corpus): a
    // LITERAL DEFAULT that cannot cast to the column type errors at
    // CREATE time (1006), not lazily at first INSERT. Only literals
    // validate eagerly — expression defaults (nextval, now()) may have
    // evaluation side effects and resolve per-row.
    for (sp <- specs; d <- sp.default; spec <- sp.physical) {
      val lit = d.trim.stripPrefix("(").stripSuffix(")").trim
      val isLiteral = """(?is)^('([^']|'')*'|-?\d+(\.\d+)?([eE]-?\d+)?|TRUE|FALSE|(DATE|TIMESTAMP|TIME|INTERVAL)\s+'[^']*')$"""
        .r.matches(lit)
      if (isLiteral && !lit.equalsIgnoreCase("NULL")) {
        val dt = try Some(StructType.fromDDL(stripConstraints(spec)).head.dataType)
                 catch { case _: Exception => None }
        dt.foreach { t =>
          import org.apache.spark.sql.types._
          // integral literals range-check in Scala — a non-ANSI cast
          // would silently WRAP an out-of-range default instead of
          // raising the reference's CREATE-time 1006
          val intRange: Option[(BigDecimal, BigDecimal)] = t match {
            case ByteType => Some((BigDecimal(Byte.MinValue), BigDecimal(Byte.MaxValue)))
            case ShortType => Some((BigDecimal(Short.MinValue), BigDecimal(Short.MaxValue)))
            case IntegerType => Some((BigDecimal(Int.MinValue), BigDecimal(Int.MaxValue)))
            case LongType => Some((BigDecimal(Long.MinValue), BigDecimal(Long.MaxValue)))
            case _ => None
          }
          val numLit = scala.util.Try(BigDecimal(lit)).toOption
          val ok = (intRange, numLit) match {
            case (Some((lo, hi)), Some(v)) => v >= lo && v <= hi
            case _ =>
              try !spark.sql(s"SELECT CAST(($lit) AS ${t.sql}) IS NULL").head.getBoolean(0)
              catch { case _: Exception => false }
          }
          if (!ok) throw new IllegalArgumentException(
            s"1006: invalid DEFAULT value $lit for column ${sp.name} of type ${t.sql}")
        }
      }
    }
    val dflts = specs.collect { case ColSpec(nm, _, None, Some(d)) => nm.toLowerCase -> d }
    if (dflts.nonEmpty) colDefaults(n) = dflts.toMap
  }

  // ---- stored procedures (SQL surface over operators/SqlScript) ------

  /** declared arg/return type text per procedure key (DESC rendering
    * uses the reference's internal type spellings)
    */
  private val procMeta =
    mutable.LinkedHashMap[String, (Seq[String], Seq[String], String, String)]()

  private def dbInternalType(t0: String): String = {
    val t = t0.trim
    val low = t.toLowerCase
    low match {
      case "int" | "integer" | "int32" => "Int32"
      case "bigint" | "int64" => "Int64"
      case "smallint" | "int16" => "Int16"
      case "tinyint" | "int8" => "Int8"
      case "uint8" => "UInt8"
      case "uint16" => "UInt16"
      case "uint32" => "UInt32"
      case "uint64" => "UInt64"
      case "string" | "varchar" | "text" => "String"
      case "boolean" | "bool" => "Boolean"
      case "float" | "float32" => "Float32"
      case "double" | "float64" => "Float64"
      case "date" => "Date"
      case "timestamp" | "datetime" => "Timestamp"
      case _ if low.startsWith("decimal") =>
        """(?i)decimal\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)""".r.findFirstMatchIn(t)
          .map(m => s"Decimal(${m.group(1)}, ${m.group(2)})").getOrElse(t)
      case _ => t
    }
  }

  private val CreateProcRe =
    ("""(?is)^CREATE\s+(OR\s+REPLACE\s+)?PROCEDURE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([\w$]+)\s*\(([^)]*)\)\s*""" +
     """(?:RETURNS\s+(.+?))?\s*LANGUAGE\s+SQL\s*(?:COMMENT\s*=\s*'[^']*')?\s*AS\s*(.*)$""").r

  private def createProcedureStmt(s: String): DataFrame = s match {
    case CreateProcRe(orReplace, ifNotExists, name0, argList, returns, body) =>
      require(orReplace == null || ifNotExists == null,
        "1005: CREATE OR REPLACE ... IF NOT EXISTS is not allowed")
      val name = name0.toLowerCase
      val args = splitTopLevel(argList, ',').map(_.trim).filter(_.nonEmpty)
      val argNames = args.map(_.split("\\s+")(0).toLowerCase)
      val argTypes = args.map(a => dbInternalType(a.split("\\s+", 2).lift(1).getOrElse("")))
      if (graft.operators.SqlScript.hasProcedure(name, argNames.length)) {
        if (ifNotExists != null) return status("procedure" -> name, "op" -> "exists")
        require(orReplace != null,
          s"2801: procedure $name(${argTypes.mkString(",")}) already exists")
      }
      graft.operators.SqlScript.createProcedure(name, argNames, body.trim)
      procMeta(s"$name/${argNames.length}") = (argNames, argTypes,
        Option(returns).map(_.trim).getOrElse(""), body.trim)
      status("procedure" -> name, "op" -> "create-procedure")
    case _ => throw new IllegalArgumentException(s"cannot parse CREATE PROCEDURE: $s")
  }

  private def dropProcedureStmt(s: String): DataFrame = {
    val m = """(?is)^DROP\s+PROCEDURE\s+(?:(IF\s+EXISTS)\s+)?([\w$]+)\s*(?:\(([^)]*)\))?\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DROP PROCEDURE: $s"))
    val name = m.group(2).toLowerCase
    val arity = Option(m.group(3))
      .map(a => splitTopLevel(a, ',').map(_.trim).count(_.nonEmpty))
    arity match {
      case Some(k) =>
        val known = graft.operators.SqlScript.hasProcedure(name, k)
        require(known || m.group(1) != null,
          s"3130: unknown procedure $name with $k argument(s)")
        graft.operators.SqlScript.dropProcedure(name, k)
        procMeta.remove(s"$name/$k")
      case None =>
        graft.operators.SqlScript.dropProcedure(name)
        procMeta.keys.filter(_.startsWith(name + "/")).toSeq.foreach(procMeta.remove)
    }
    status("procedure" -> name, "op" -> "drop-procedure")
  }

  private def callProcedure(s: String): DataFrame = {
    val m = """(?is)^CALL\s+(?:PROCEDURE\s+)?(?:IDENTIFIER\s*\(\s*'([^']*)'\s*\)|([\w$]+))\s*\((.*)\)\s*;?\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse CALL: $s"))
    val name = Option(m.group(1)).getOrElse(m.group(2)).toLowerCase
    val argVals = splitTopLevel(m.group(3), ',').map(_.trim).filter(_.nonEmpty)
      .map(a => spark.sql(s"SELECT ${substituteVariables(a)}").head.get(0))
    graft.operators.SqlScript.call(spark, name, argVals, execute)
  }

  private def descProcedure(s: String): DataFrame = {
    val m = """(?is)^DESC(?:RIBE)?\s+PROCEDURE\s+([\w$]+)\s*(?:\(([^)]*)\))?\s*;?\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DESC PROCEDURE: $s"))
    val name = m.group(1).toLowerCase
    val arity = Option(m.group(2))
      .map(a => splitTopLevel(a, ',').map(_.trim).count(_.nonEmpty)).getOrElse(0)
    val (argNames, _, returns, body) = procMeta.getOrElse(s"$name/$arity",
      throw new IllegalArgumentException(s"3130: unknown procedure $name"))
    val flatBody = body.stripPrefix("$$").stripSuffix("$$").trim
      .replaceAll("\\s+", " ")
    import spark.implicits._
    Seq(
      ("signature", s"(${argNames.mkString(", ")})"),
      ("returns", s"(${dbInternalType(returns.replaceAll("(?i)\\s+NOT\\s+NULL", "").trim)})"),
      ("language", "SQL"),
      ("body", flatBody))
      .toDF("property", "value")
  }

  // ---- full-text match()/query()/score() -----------------------------

  /** rewrite `... FROM t WHERE [pre AND] match(target, 'q'[, 'opts'])
    * ...` (and the `query('field:syntax')` form) into a scored
    * subquery: corpus stats (N, avgdl, per-term dfs) are computed with
    * distributed aggregations at bind time — the synced-index probe
    * shape; operators/InvertedIndex is the persisted scale path — and
    * each row scores through one scalar UDF. score() references the
    * computed column.
    */
  private def rewriteFullText(sql: String): String = {
    import graft.functions.FullText
    if (!sql.trim.toUpperCase.startsWith("SELECT")) return sql
    val mRe = """(?i)\b(match|query)\s*\(""".r
    val m = mRe.findFirstMatchIn(sql).getOrElse(return sql)
    val kind = m.group(1).toLowerCase
    val tM = """(?is)\bFROM\s+([\w.]+)""".r.findFirstMatchIn(sql).getOrElse(return sql)
    val tbl = resolveKey(tM.group(1))
    if (!tables.contains(tbl)) return sql
    val invDefs = tableIndexes.getOrElse(tbl, mutable.Buffer.empty)
      .filter(_.family == "INVERTED")
    if (invDefs.isEmpty) {
      if (kind == "query") return sql // not a full-text call
      throw new IllegalArgumentException(s"1903: match() needs an INVERTED INDEX on $tbl")
    }
    val idx = invDefs.head
    val filters = idx.opts.get("filters")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet).getOrElse(Set.empty[String])
    val open = m.end - 1
    val close = matchParen(sql, open)
    val args = splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim)
    def unq(s: String) = s.stripPrefix("'").stripSuffix("'")

    // fields + boosts
    val fields: Seq[(String, Double)] =
      if (kind == "query") idx.cols.map(_ -> 1.0)
      else {
        val t = args(0)
        if (t.startsWith("'")) unq(t).split(",").toSeq.map(_.trim).filter(_.nonEmpty).map { f =>
          val p = f.split("\\^")
          (norm(p(0)), if (p.length > 1) p(1).toDouble else 1.0)
        }
        else Seq(norm(t) -> 1.0)
      }
    // options ('fuzziness=N;operator=AND;lenient=true')
    val optStr = (kind, args.length) match {
      case ("match", 3) => unq(args(2))
      case ("query", 2) => unq(args(1))
      case _ => ""
    }
    val optMap = optStr.split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val Array(k, v) = kv.split("=", 2); k.toLowerCase -> v }.toMap
    val lenient = optMap.get("lenient").exists(_.equalsIgnoreCase("true"))
    val fuzzy = optMap.get("fuzziness").map(_.toInt).getOrElse(0)
    val opAnd = optMap.get("operator").exists(_.equalsIgnoreCase("AND"))

    val clauses: Seq[FullText.Q] =
      try {
        if (kind == "match") {
          val q = unq(args(1))
          if (q.exists(c => c == '(' || c == ')'))
            throw FullText.ParseError("parens are query() syntax, not match() terms")
          q.trim.split("\\s+").toSeq.filter(_.nonEmpty).map(FullText.Term(None, _))
        } else FullText.parseQuery(unq(args(0)))
      } catch {
        case e: FullText.ParseError => if (lenient) Seq.empty else throw e
      }
    // index_record='basic' drops positions: phrase (and boosted-group)
    // queries refuse like the reference (1105)
    if (idx.opts.get("index_record").exists(_.equalsIgnoreCase("basic"))) {
      def hasPhrase(q: FullText.Q): Boolean = q match {
        case _: FullText.Phrase => true
        case FullText.And(l, r) => hasPhrase(l) || hasPhrase(r)
        case FullText.Or(l, r) => hasPhrase(l) || hasPhrase(r)
        case FullText.Must(x) => hasPhrase(x)
        case FullText.MustNot(x) => hasPhrase(x)
        case FullText.Group(qs, _) => qs.exists(hasPhrase)
        case _ => false
      }
      require(!clauses.exists(hasPhrase) &&
              !(kind == "query" && unq(args(0)).contains("^")),
        "1105: index_record='basic' stores no positions; phrase queries need index_record='position'")
    }
    // multi-char CJK runs match as adjacent unigram phrases (jieba
    // segmentation approximation — FullText.cjkPhrases scaladoc)
    val clausesFinal =
      if (fuzzy > 0) clauses else clauses.map(graft.functions.FullText.cjkPhrases)

    // needed terms (analyzed) for df lookups
    def termTexts(q: FullText.Q): Seq[String] = q match {
      case FullText.Term(_, t, _) => Seq(t)
      case FullText.Phrase(_, ts) => ts
      case FullText.And(l, r) => termTexts(l) ++ termTexts(r)
      case FullText.Or(l, r) => termTexts(l) ++ termTexts(r)
      case FullText.Must(x) => termTexts(x)
      case FullText.MustNot(x) => termTexts(x)
      case FullText.Group(qs, _) => qs.flatMap(termTexts)
    }
    val rawTerms = clausesFinal.flatMap(termTexts)
    val neededTerms = rawTerms.flatMap(t => FullText.analyze(t, filters)).distinct

    // per-field stats: distributed aggregations over the live view
    // (variant/json columns index PATH-TAGGED tokens, tantivy-style)
    val tblSchema = tables(tbl).read().schema
    def fieldIsJson(cn: String): Boolean =
      tblSchema.fields.find(_.name.equalsIgnoreCase(cn))
        .exists(_.dataType == org.apache.spark.sql.types.VariantType)
    val termPart = udf((t: String) => FullText.tagOf(t)._2)
    val stats = fields.map { case (cn, boost) =>
      val isJson = fieldIsJson(cn)
      val tokUdf =
        if (isJson) udf((s: String) => FullText.analyzeJson(if (s == null) "" else s, filters))
        else udf((s: String) => FullText.analyze(if (s == null) "" else s, filters))
      val base = spark.table(viewName(tbl))
        .select(tokUdf(col(s"`$cn`").cast("string")).as("__t"))
      val agg = base.agg(count(lit(1)), avg(size(col("__t")))).collect()(0)
      val n = agg.getLong(0)
      val avgdl = Option(agg.get(1)).map(_.toString.toDouble).getOrElse(0.0)
      val dfs: Map[String, Long] =
        if (neededTerms.isEmpty) Map.empty
        else base.select(explode(array_distinct(col("__t"))).as("__term"))
          .filter(termPart(col("__term")).isin(neededTerms: _*))
          .groupBy("__term").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
      FullText.FieldStats(cn, boost, n, avgdl, dfs, filters, isJson)
    }
    val spec = FullText.Spec(clausesFinal, stats, opAnd, fuzzy)
    val jsonFlags = fields.map(f => fieldIsJson(f._1))
    val fn = s"${viewPrefix}ft_score"
    spark.udf.register(fn, udf((arr: Seq[String]) => {
      if (spec.clauses.isEmpty) None
      else {
        val fieldToks = arr.zip(jsonFlags).map { case (s, j) =>
          if (j) FullText.analyzeJson(if (s == null) "" else s, filters)
          else FullText.analyze(if (s == null) "" else s, filters)
        }
        FullText.scoreDoc(fieldToks, spec).map(_.toFloat)
      }
    }))

    // surgery back-to-front: the match call sits after FROM
    val callRepl = "__ft_score IS NOT NULL"
    var out = sql.substring(0, m.start) + callRepl + sql.substring(close + 1)
    val innerCols = fields.map(f => s"CAST(`${f._1}` AS STRING)").mkString(", ")
    val inner = s"(SELECT *, $fn(array($innerCols)) AS __ft_score FROM ${tM.group(1)}) __ft"
    out = out.substring(0, tM.start) + "FROM " + inner + out.substring(tM.end)
    out.replaceAll("(?i)\\bscore\\s*\\(\\s*\\)", "__ft_score")
  }

  // ---- standalone index DDL ------------------------------------------

  /** CREATE [ASYNC|SYNC] (INVERTED|NGRAM|VECTOR|SPATIAL) INDEX name
    * ON t(cols) [k = v ...] (reference query/index suites)
    */
  private def createTableIndex(s: String): DataFrame = {
    val m = CreateIndexRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse CREATE INDEX: $s"))
    val n = resolveKey(m.group(4))
    require(tables.contains(n), s"1025: unknown table $n")
    val d = IndexDef(norm(m.group(3)), m.group(2).toUpperCase,
      splitTopLevel(m.group(5), ',').map(norm), {
        val o = mutable.LinkedHashMap[String, String]()
        """(?i)(\w+)\s*=\s*('[^']*'|\S+)""".r.findAllMatchIn(m.group(6)).foreach { km =>
          o(km.group(1).toLowerCase) = km.group(2).stripPrefix("'").stripSuffix("'")
        }
        o
      }, m.group(1) == null || !m.group(1).trim.equalsIgnoreCase("ASYNC"))
    // OR REPLACE / IF NOT EXISTS forms
    val buf0 = tableIndexes.getOrElse(n, mutable.Buffer.empty)
    if ("""(?is)^CREATE\s+OR\s+REPLACE\b""".r.findPrefixMatchOf(s).isDefined)
      buf0.find(_.name == d.name).foreach(buf0 -= _)
    else if ("""(?is)\bIF\s+NOT\s+EXISTS\b""".r.findFirstIn(s).isDefined &&
             buf0.exists(_.name == d.name))
      return status("index" -> d.name, "op" -> "exists")
    addTableIndex(n, d)
    status("index" -> d.name, "op" -> "create-index", "family" -> d.family)
  }

  private def dropTableIndex(s: String): DataFrame = {
    val m = DropIndexRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DROP INDEX: $s"))
    val family = m.group(1).toUpperCase
    val ifExists = m.group(2) != null
    val name = norm(m.group(3))
    val n = resolveKey(m.group(4))
    val buf = tableIndexes.getOrElse(n, mutable.Buffer.empty)
    buf.find(_.name == name) match {
      case None => require(ifExists, s"2601: no index $name on $n")
      case Some(d) =>
        require(d.family == family,
          s"2601: index $name on $n is a ${d.family} index, not $family")
        // the vector index backing a vector cluster key cannot drop
        // (reference vector_index_base)
        if (family == "VECTOR")
          clusterKeys.get(n).foreach { keys =>
            val hit = keys.exists(k => d.cols.exists(_.equalsIgnoreCase(k)))
            require(!hit,
              s"1601: index $name backs the vector cluster key; drop the cluster key first")
          }
        buf -= d
    }
    status("index" -> name, "op" -> "drop-index")
  }

  // ---- aggregating indexes -------------------------------------------

  /** the reference's strict shape check (1601): one table, optional
    * WHERE, optional flat GROUP BY + aggregates — no CTE/subquery/
    * join/order/limit/having/window/filter/non-determinism
    */
  private def validateAggIndexSelect(sel0: String): String = {
    val sel = sel0.trim
    def bad(what: String) = throw new IllegalArgumentException(
      s"1601: unsupported aggregating index query ($what)")
    if (!sel.toUpperCase.startsWith("SELECT")) bad("must be a plain SELECT")
    if ("""(?is)\(\s*select\b""".r.findFirstIn(sel).isDefined) bad("subquery")
    for (kw <- Seq("JOIN", "ORDER", "LIMIT", "HAVING", "WINDOW", "OVER",
        "FILTER", "GROUPING", "UNION", "EXCEPT", "INTERSECT"))
      if (indexOfKeyword(sel, kw) >= 0) bad(kw.toLowerCase)
    if ("""(?i)\b(now|rand|random|uuid|today|current_timestamp|current_date)\s*\(""".r
          .findFirstIn(sel).isDefined) bad("non-deterministic function")
    val fromIdx = indexOfKeyword(sel, "FROM")
    if (fromIdx < 0) bad("needs FROM")
    val tail = sel.substring(fromIdx + 4).trim
    val tm = """^([\w.]+)\s*(.*)$""".r.findFirstMatchIn(tail)
      .getOrElse(bad("single table"))
    val rest = tm.group(2).trim.toUpperCase
    if (rest.nonEmpty && !rest.startsWith("WHERE") && !rest.startsWith("GROUP"))
      bad("only WHERE / GROUP BY allowed")
    val hasAgg =
      """(?i)\b(sum|count|min|max|avg|approx_count_distinct|uniq|stddev\w*|var\w*)\s*\(""".r
        .findFirstIn(sel).isDefined
    val hasWhere = indexOfKeyword(sel, "WHERE") >= 0
    if (!hasAgg && !hasWhere) bad("a bare projection indexes nothing")
    tm.group(1)
  }

  private def createAggIndex(s: String): DataFrame = {
    val m = CreateAggIdxRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse CREATE AGGREGATING INDEX: $s"))
    val orReplace = m.group(1) != null
    val sync = m.group(2) != null && m.group(2).trim.equalsIgnoreCase("SYNC")
    val ifNotExists = m.group(3) != null
    require(!(orReplace && ifNotExists),
      "1005: CREATE OR REPLACE ... IF NOT EXISTS is not allowed")
    val name = norm(m.group(4))
    val sel = m.group(5).trim
    if (aggIndexes.contains(name)) {
      if (ifNotExists) return status("index" -> name, "op" -> "exists")
      require(orReplace, s"2601: aggregating index $name already exists")
    }
    val tbl = resolveKey(validateAggIndexSelect(sel))
    require(tables.contains(tbl), s"1025: unknown table $tbl")
    aggIndexes(name) = (tbl, sel, sync)
    status("index" -> name, "op" -> "create-agg-index")
  }

  private def dropAggIndex(s: String): DataFrame = {
    val m = """(?is)^DROP\s+AGGREGATING\s+INDEX\s+(?:(IF\s+EXISTS)\s+)?("[^"]+"|[`\w.]+)\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DROP AGGREGATING INDEX: $s"))
    val name = norm(m.group(2))
    val known = aggIndexes.remove(name)
    require(known.isDefined || m.group(1) != null,
      s"2601: unknown aggregating index $name")
    known.foreach { case (tbl, _, _) =>
      tables.get(tbl).foreach(t => graft.plans.AggIndex.deregister(t.path))
    }
    status("index" -> name, "op" -> "drop-agg-index")
  }

  /** REFRESH AGGREGATING INDEX name [LIMIT n]: when the index query is
    * the flat `aggs GROUP BY keys` shape with no WHERE, materialize a
    * convention-named summary and pin it to the CURRENT snapshot's
    * file set via AggIndex.registerFiles — stale versions never match,
    * so answers stay correct without sync maintenance. Other shapes
    * refresh as a no-op (the gate is answer correctness, not rewrite
    * coverage).
    */
  private def refreshAggIndexStmt(s: String): DataFrame = {
    val m = """(?is)^REFRESH\s+AGGREGATING\s+INDEX\s+("[^"]+"|[`\w.]+)(?:\s+LIMIT\s+\d+)?\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse REFRESH AGGREGATING INDEX: $s"))
    val name = norm(m.group(1))
    val (tbl, sel, _) = aggIndexes.getOrElse(name,
      throw new IllegalArgumentException(s"2601: unknown aggregating index $name"))
    val sm = """(?is)^SELECT\s+(.*?)\s+FROM\s+[\w.]+\s+GROUP\s+BY\s+(.*)$""".r
      .findFirstMatchIn(sel)
    sm.foreach { mm =>
      val keys = splitTopLevel(mm.group(2), ',').map(_.trim)
      val items = splitTopLevel(mm.group(1), ',').map(_.trim)
      val simpleKeys = keys.forall(_.matches("(?i)[\\w]+"))
      val AggItem = """(?i)(sum|min|max)\s*\(\s*(\w+)\s*\)(?:\s+as\s+\w+)?""".r
      val CntItem = """(?i)count\s*\(\s*\*?\s*\)(?:\s+as\s+\w+)?""".r
      val conv = items.map {
        case AggItem(fn, c) => Some(s"${fn.toLowerCase}(`$c`) AS ${fn.toLowerCase}_$c")
        case CntItem()      => Some("count(*) AS cnt")
        case it if keys.exists(_.equalsIgnoreCase(it)) => Some(s"`$it`")
        case _ => None
      }
      if (simpleKeys && conv.forall(_.isDefined)) {
        val t = tables(tbl)
        val sumDir = Paths.get(warehouse, ".aggidx", name).toString
        val v = freshView(t.read())
        spark.sql(s"SELECT ${(keys.map(k => s"`$k`") ++ conv.flatten.filterNot(c =>
            keys.exists(k => c == s"`$k`"))).distinct.mkString(", ")} FROM $v GROUP BY ${keys.map(k => s"`$k`").mkString(", ")}")
          .write.mode("overwrite").parquet(sumDir)
        val files = t.snapshot(t.currentVersion).files.map(f => s"${t.path}/$f")
        graft.plans.AggIndex.registerFiles(t.path, keys, sumDir, files)
      }
    }
    status("index" -> name, "op" -> "refresh-agg-index")
  }

  // ---- table-index helpers -------------------------------------------

  /** `[SYNC|ASYNC] FAMILY INDEX name (cols) [k = v ...]` from a
    * CREATE TABLE spec or the tail of a standalone CREATE ... INDEX
    */
  private def parseIndexSpec(m: scala.util.matching.Regex.Match): IndexDef = {
    val sync = m.group(1) == null || !m.group(1).trim.equalsIgnoreCase("ASYNC")
    val family = m.group(2).toUpperCase
    val name = norm(m.group(3))
    val cols = splitTopLevel(m.group(4), ',').map(norm)
    val opts = mutable.LinkedHashMap[String, String]()
    """(?i)(\w+)\s*=\s*('[^']*'|\S+)""".r.findAllMatchIn(m.group(5)).foreach { km =>
      opts(km.group(1).toLowerCase) = km.group(2).stripPrefix("'").stripSuffix("'")
    }
    IndexDef(name, family, cols, opts, sync)
  }

  /** family/option validation against the physical schema (reference
    * per-family index checkers)
    */
  private def validateIndexDef(schema: StructType, d: IndexDef): Unit = {
    import org.apache.spark.sql.types._
    d.cols.foreach { c =>
      val f = schema.fields.find(_.name.equalsIgnoreCase(c))
        .getOrElse(throw new IllegalArgumentException(
          s"1065: unknown column $c for ${d.family} index ${d.name}"))
      d.family match {
        case "INVERTED" =>
          require(f.dataType.isInstanceOf[StringType] || f.dataType == VariantType,
            s"1601: INVERTED index needs a string or variant column, $c is ${f.dataType.sql}")
        case "NGRAM" =>
          require(f.dataType.isInstanceOf[StringType],
            s"1601: NGRAM index needs a string column, $c is ${f.dataType.sql}")
        case "VECTOR" =>
          require(f.dataType == ArrayType(FloatType, true) ||
                  f.dataType == ArrayType(FloatType, false),
            s"1601: VECTOR index needs a vector column, $c is ${f.dataType.sql}")
        case "SPATIAL" =>
          require(f.dataType == BinaryType,
            s"1601: SPATIAL index needs a geometry column, $c is ${f.dataType.sql}")
        case other =>
          throw new IllegalArgumentException(s"unknown index family $other")
      }
    }
    d.family match {
      case "NGRAM" =>
        d.opts.get("gram_size").foreach(v => require(v.toLong > 0,
          s"1601: gram_size must be positive"))
        d.opts.get("bloom_size").foreach(v => require(
          v.toLong >= 512 && v.toLong <= 10485760,
          s"1601: bloom_size must be in [512, 10485760]"))
      case "VECTOR" =>
        val dist = d.opts.getOrElse("distance",
          throw new IllegalArgumentException(
            s"1601: VECTOR index ${d.name} requires the distance option"))
        dist.split(",").map(_.trim).foreach(x =>
          require(Set("cosine", "l1", "l2")(x.toLowerCase),
            s"1601: unknown vector distance $x"))
        d.opts.get("m").foreach(v => require(v.toLong > 0,
          "1601: m must be positive"))
        d.opts.get("ef_construct").foreach(v => require(v.toLong > 0,
          "1601: ef_construct must be positive"))
      case _ =>
    }
  }

  private def addTableIndex(n: String, d: IndexDef): Unit = {
    validateIndexDef(tables(n).read().schema, d)
    val buf = tableIndexes.getOrElseUpdate(n, mutable.Buffer.empty)
    require(!buf.exists(_.name == d.name),
      s"1601: index ${d.name} already exists on $n")
    buf += d
  }

  /** shared CREATE TABLE (name (ddl)) path: peels table-level index
    * specs and computed/default column clauses, creates the physical
    * table, registers all metadata, and applies an inline CLUSTER BY
    */
  private def createPlainTable(n: String, ddl: String,
      cluster: Option[String]): Unit = {
    val (idxSpecs, colParts) = splitTopLevel(ddl, ',')
      .partition(c => TableIndexSpecRe.findFirstMatchIn(c.trim).isDefined)
    val specs = parseColSpecs(colParts.mkString(", "))
    // physical DDL: computed VIRTUAL columns are read-time only;
    // computed STORED columns keep their declared slot
    val physDdl = specs.flatMap(_.physical).mkString(", ")
    val schema = StructType.fromDDL(stripConstraints(physDdl))
    validateDeclaredSchema(schema)
    notNullCols(n) = declaredNotNull(physDdl)
    requiredCols(n) = declaredNotNull(physDdl, withDefault = false)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    register(n, GraftTable.create(spark, tablePath(n), empty))
    try {
    registerColumnMeta(n, specs)
    tableIndexes.remove(n)
    idxSpecs.foreach { sp =>
      val m = TableIndexSpecRe.findFirstMatchIn(sp.trim).get
      addTableIndex(n, parseIndexSpec(m))
    }
    // inline CLUSTER BY (reference create_table.rs) = the declared
    // recluster key set, same as ALTER TABLE ... CLUSTER BY
    cluster.foreach { k =>
      val keys = splitTopLevel(k, ',').map(norm)
      // a vector-typed cluster key needs a single-distance vector
      // index on that column (reference vector_index_base)
      keys.foreach { key =>
        val isVector = schema.fields.exists(f => f.name.equalsIgnoreCase(key) &&
          f.dataType == org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, true))
        if (isVector) {
          val vidx = tableIndexes.getOrElse(n, mutable.Buffer.empty)
            .filter(d => d.family == "VECTOR" && d.cols.exists(_.equalsIgnoreCase(key)))
          require(vidx.nonEmpty,
            s"Vector cluster key `$key` requires a vector index with distance option")
          val distances = vidx.flatMap(_.opts.get("distance"))
            .flatMap(_.split(",")).map(_.trim).distinct
          require(distances.length == 1,
            s"Vector cluster key `$key` has multiple vector index distance types")
        }
      }
      clusterKeys(n) = keys
    }
    } catch { case e: Throwable =>
      // reject the CREATE wholesale: no half-made table survives a
      // failed index/cluster validation (the reference validates
      // before creating)
      tables.remove(n).foreach { t =>
        spark.catalog.dropTempView(viewName(n)); rmrf(t.path) }
      computedCols.remove(n); declaredOrder.remove(n); colDefaults.remove(n); bitmapCols.remove(n)
      tableIndexes.remove(n)
      throw e
    }
    refreshView(n)
  }

  /** bloom_index_columns must name physical bloom-indexable columns
    * (reference 1301: no variant/json, no VIRTUAL computed columns)
    */
  private def validateBloomColumns(n: String, listStr: String): Unit = {
    import org.apache.spark.sql.types._
    val fields = tables(n).read().schema.fields
      .map(f => f.name.toLowerCase -> f.dataType).toMap
    listStr.split(",").map(c => norm(c.trim)).filter(_.nonEmpty).foreach { c =>
      val dt = fields.getOrElse(c.toLowerCase,
        throw new IllegalArgumentException(
          s"1301: bloom index column $c is not a physical column"))
      val ok = dt match {
        case _: StringType | _: DecimalType => true
        case IntegerType | LongType | ShortType | ByteType | FloatType |
             DoubleType | BooleanType | DateType | TimestampType | BinaryType => true
        case _ => false
      }
      require(ok, s"1301: bloom index does not support column $c of type ${dt.sql}")
    }
  }

  /** recompute every STORED computed column over the current rows (a
    * COW overwrite; used after UPDATE/MERGE/MODIFY which may change
    * inputs — the write paths that only ADD rows compute in-frame)
    */
  private def recomputeStored(n: String): Unit = {
    val comp = computedCols.getOrElse(n, Seq.empty).filter(_._4)
    if (comp.isEmpty) return
    val t = tables(n)
    val cur = t.read()
    if (cur.isEmpty) return
    val v = freshView(cur)
    val proj = cur.columns.toSeq.map { c =>
      comp.find(_._1.equalsIgnoreCase(c)) match {
        case Some((nm, _, ex, _)) => s"$ex AS `$nm`"
        case None => s"`$c`"
      }
    }
    t.overwrite(spark.sql(s"SELECT ${proj.mkString(", ")} FROM $v").localCheckpoint(true))
    refreshView(n)
  }

  private def freshView(df: DataFrame): String = {
    viewSeq += 1
    val v = s"${viewPrefix}tt_$viewSeq"
    df.createOrReplaceTempView(v)
    v
  }

  private def status(kv: (String, Any)*): DataFrame = {
    val cols = kv.map { case (k, v) => lit(v.toString).as(k) }
    spark.range(1).select(cols: _*)
  }

  // ---- entry ----------------------------------------------------------

  /** databend's lexer keeps unknown escape sequences in string
    * literals intact ('\d' stays backslash-d — regex vectors rely on
    * it); Spark's parser silently drops the backslash. Double the
    * backslash for escapes Spark doesn't know so its unescape restores
    * the reference bytes. Known escapes (\n \t \r \b \f \0 \\ \' \"
    * \xNN \uNNNN) pass through.
    */
  private def preserveUnknownEscapes(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0; var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (!inStr) {
        if (c == '\'') inStr = true
        sb.append(c); i += 1
      } else if (c == '\'') { inStr = false; sb.append(c); i += 1 }
      else if (c == '\\' && i + 1 < sql.length) {
        val n = sql.charAt(i + 1)
        if ("ntrbf0\\'\"xuU%_".indexOf(n) >= 0) { sb.append(c).append(n); i += 2 }
        else { sb.append('\\').append('\\').append(n); i += 2 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** strip slash-star block comments, quote-aware (databend treats
    * optimizer-hint comments as plain comments too)
    */
  private def stripBlockComments(sql: String): String = {
    if (!sql.contains("/*")) return sql
    val sb = new StringBuilder(sql.length)
    var i = 0; var inStr = false
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; sb.append(c); i += 1 }
      else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        val end = sql.indexOf("*/", i + 2)
        if (end < 0) { sb.append(sql.substring(i)); i = sql.length }
        else { sb.append(' '); i = end + 2 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** databend operator spellings with no Spark equivalent, rewritten
    * at the text level (quote-aware where it matters):
    *   `a // b`        integer division  -> `a div b`
    *   `x SOUNDS LIKE y`                 -> `soundex(x) = soundex(y)`
    *   `cast(e, T)`    2-arg cast        -> `cast(e as T)`
    *   `v -> k` / `v ->> k` (k literal)  -> variant get / get-as-text
    *   `v #> '{a,b}'` / `#>>`           -> variant path get
    *   `database()`/`currentdatabase()` -> the instance's current db
    *   `expr.1`        tuple access      -> `expr._1` (struct field)
    */
  private def dialectOps(sql0: String): String = {
    var s = sql0
    if (s.contains("//"))
      s = mapOutsideQuotes(s, _.replaceAll("//", " div "))
    if (s.toLowerCase.contains("sounds"))
      s = s.replaceAll("(?is)\\b(\\w+|'[^']*')\\s+SOUNDS\\s+LIKE\\s+(\\w+|'[^']*')",
        "soundex($1) = soundex($2)")
    if (s.toLowerCase.contains("cast"))
      s = rewriteTwoArgCast(s)
    if (s.contains("->") || s.contains("#>"))
      s = rewriteArrowOps(s)
    if (s.contains("@") || s.contains("?") || s.contains("#-"))
      s = rewriteJsonbPredOps(s)
    if (s.contains("^") || s.contains("#") || s.contains("|/") ||
        s.contains("!") || s.contains("@"))
      s = rewritePgMathOps(s)
    if (s.toLowerCase.contains("database") || s.toLowerCase.contains("schema"))
      s = s.replaceAll("(?i)\\b(currentdatabase|current_database|database|schema)\\s*\\(\\s*\\)",
        s"'$currentDb'")
    // tuple field access expr.1 -> expr._1 (digit right after the dot,
    // non-digit before it so decimal literals stay; iterate for chains)
    if ("""[\w`\)\]]\.\d""".r.findFirstIn(s).isDefined)
      s = mapOutsideQuotes(s, seg => {
        var t = seg
        var prev = ""
        while (prev != t) {
          prev = t
          t = t.replaceAll("""([A-Za-z_]\w*|[\)\]])\.(\d+)\b(?!\s*\()""", "$1._$2")
        }
        t
      })
    s
  }

  /** PostgreSQL-style math operators the reference parses
    * (ast/expr.rs to_func_name): `a ^ b` -> pow (Spark's ^ is xor),
    * `a # b` -> bitxor (Spark's ^), prefix `|/` sqrt, `||/` cbrt,
    * `@` abs, postfix `!` factorial. Operand extent = the adjacent
    * primary expression, which matches the reference's precedence 40
    * (mul-level, left-to-right with `*`); `^` rewrites rightmost-first
    * for its right associativity. Quote-aware via primary scanning.
    */
  private def rewritePgMathOps(s0: String): String = {
    def isWord(c: Char) = c.isLetterOrDigit || c == '_' || c == '.' || c == '`'
    def inQuote(s: String, pos: Int): Boolean = {
      var q: Char = 0; var i = 0
      while (i < pos) {
        val c = s.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '\'' || c == '`' || c == '"') q = c
        i += 1
      }
      q != 0
    }
    // [start, end) of the primary ending just before `pos` (exclusive)
    def leftPrimary(s: String, pos0: Int): Option[(Int, Int)] = {
      var j = pos0
      while (j > 0 && s.charAt(j - 1).isWhitespace) j -= 1
      if (j == 0) return None
      val end = j
      val c = s.charAt(j - 1)
      if (c == ')' || c == ']') {
        val open = lastOpen(s, j - 1); if (open < 0) return None
        var k = open
        while (k > 0 && isWord(s.charAt(k - 1))) k -= 1 // fn name
        Some((k, end))
      } else if (isWord(c) || c == '\'') {
        if (c == '\'') {
          var k = j - 2
          while (k >= 0 && s.charAt(k) != '\'') k -= 1
          if (k < 0) None else Some((k, end))
        } else {
          var k = j
          while (k > 0 && isWord(s.charAt(k - 1))) k -= 1
          Some((k, end))
        }
      } else None
    }
    def lastOpen(s: String, closeIdx: Int): Int = {
      val close = s.charAt(closeIdx); val open = if (close == ')') '(' else '['
      var depth = 0; var k = closeIdx
      while (k >= 0) {
        val c = s.charAt(k)
        if (c == close) depth += 1
        else if (c == open) { depth -= 1; if (depth == 0) return k }
        k -= 1
      }
      -1
    }
    def rightPrimary(s: String, pos0: Int): Option[(Int, Int)] = {
      var j = pos0
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j >= s.length) return None
      val start = j
      var c = s.charAt(j)
      if (c == '-' || c == '+') { j += 1
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        if (j >= s.length) return None
        c = s.charAt(j) }
      if (c == '(') {
        val close = matchParen(s, j); if (close < 0) return None
        Some((start, close + 1))
      } else if (c == '\'') {
        var k = j + 1
        while (k < s.length && s.charAt(k) != '\'') k += 1
        if (k >= s.length) None else Some((start, k + 1))
      } else if (isWord(c)) {
        var k = j
        while (k < s.length && isWord(s.charAt(k))) k += 1
        var e = k
        while (e < s.length && s.charAt(e).isWhitespace) e += 1
        if (e < s.length && s.charAt(e) == '(') { // function call
          val close = matchParen(s, e); if (close < 0) return None
          Some((start, close + 1))
        } else Some((start, k))
      } else None
    }
    var s = s0
    // binary ^ -> pow (rightmost-first: right-associative); real xor
    // arrives as `#` and becomes Spark's ^ afterwards
    var go = true
    while (go) {
      go = false
      var i = s.length - 1
      while (i >= 0 && !go) {
        if (s.charAt(i) == '^' && !inQuote(s, i)) {
          (leftPrimary(s, i), rightPrimary(s, i + 1)) match {
            case (Some((ls, le)), Some((rs, re))) =>
              s = s.substring(0, ls) + "power(" + s.substring(ls, le) + ", " +
                s.substring(rs, re) + ")" + s.substring(re)
              go = true
            case _ =>
          }
        }
        i -= 1
      }
    }
    // binary # -> Spark xor ^ (skip #> handled earlier)
    s = mapOutsideQuotes(s, seg => seg.replaceAll("#(?![>])", " ^ "))
    // prefix ||/ (cbrt), |/ (sqrt), @ (abs; not @> <@ @@)
    def prefixOp(sym: String, fn: String): Unit = {
      var idx = s.indexOf(sym)
      while (idx >= 0) {
        if (!inQuote(s, idx) &&
            (sym != "@" || (idx + 1 >= s.length || s.charAt(idx + 1) != '>')) &&
            // a word char before @ is crdb's table@index hint or an
            // email-ish token, not prefix-abs
            (sym != "@" || idx == 0 ||
              (s.charAt(idx - 1) != '<' && s.charAt(idx - 1) != '@' &&
               !isWord(s.charAt(idx - 1)))) &&
            // `FROM @stage` / `JOIN @stage` is a stage read, not abs
            (sym != "@" || {
              val before = s.substring(0, idx)
              !"""(?is).*\b(FROM|JOIN)\s*$""".r.matches(before)
            })) {
          rightPrimary(s, idx + sym.length) match {
            case Some((rs, re)) =>
              s = s.substring(0, idx) + fn + "(" + s.substring(rs, re) + ")" +
                s.substring(re)
            case None =>
          }
        }
        idx = s.indexOf(sym, idx + 1)
      }
    }
    prefixOp("||/", "cbrt")
    prefixOp("|/", "sqrt")
    if (s.contains("@")) prefixOp("@", "abs")
    // postfix ! (factorial): a value token then !, not != / !~, and a
    // following boundary (operator, comma, paren close, end)
    var idx = s.indexOf('!')
    while (idx >= 0) {
      val nxt = if (idx + 1 < s.length) s.charAt(idx + 1) else ' '
      if (!inQuote(s, idx) && nxt != '=' && nxt != '~') {
        leftPrimary(s, idx) match {
          case Some((ls, le)) if le > ls &&
              (s.charAt(le - 1).isLetterOrDigit || s.charAt(le - 1) == ')') &&
              // a keyword before `!` means prefix NOT (`SELECT !x`),
              // not a postfix factorial operand
              !Set("select", "where", "and", "or", "not", "when", "then",
                "else", "on", "by", "from", "case", "as", "in", "is",
                "having", "set", "values", "between")(
                s.substring(ls, le).toLowerCase) &&
              // prefix NOT (`!x`) has no preceding value token
              !s.substring(0, ls).trim.endsWith("!") =>
            s = s.substring(0, ls) + "factorial(" + s.substring(ls, le) + ")" +
              s.substring(idx + 1)
          case _ =>
        }
      }
      idx = s.indexOf('!', idx + 1)
    }
    s
  }

  /** apply `f` to the segments of `s` outside single-quoted /
    * backquoted literals
    */
  private def mapOutsideQuotes(s: String, f: String => String): String = {
    val sb = new StringBuilder(s.length)
    val seg = new StringBuilder
    var i = 0; var q: Char = 0
    def flush(): Unit = { sb.append(f(seg.toString)); seg.clear() }
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0 }
      else if (c == '\'' || c == '`') { flush(); q = c; sb += c }
      else seg += c
      i += 1
    }
    flush()
    sb.toString
  }

  /** `cast(expr, TYPE)` (databend 2-arg spelling, expr.rs) ->
    * `cast(expr as TYPE)`; TRY_CAST likewise
    */
  private def rewriteTwoArgCast(s: String): String = {
    val re = """(?i)\b(try_)?cast\s*\(""".r
    var out = s
    var changed = true
    while (changed) {
      changed = false
      for (m <- re.findAllMatchIn(out).toSeq.reverse if !changed) {
        val open = m.end - 1
        val close = matchParen(out, open)
        if (close > open) {
          val inner = out.substring(open + 1, close)
          // only the 2-arg comma form (no AS at top level)
          if (indexOfKeyword(inner, "AS") < 0) {
            val comma = indexOfTopLevel(inner, ',')
            if (comma > 0) {
              val tpe = inner.substring(comma + 1).trim
              if ("""^[A-Za-z_][\w ]*(\([\w\s(),]*\))?$""".r
                    .findFirstIn(tpe).isDefined) {
                out = out.substring(0, open + 1) + inner.take(comma).trim +
                  " as " + tpe + out.substring(close)
                changed = true
              }
            }
          }
        }
      }
    }
    out
  }

  /** `->`/`->>` (one-step variant navigation, literal keys) and
    * `#>`/`#>>` (path-array navigation) -> the VariantGetDyn /
    * VariantGetPath expressions (functions/VariantGetFns.scala).
    * A `->` whose RHS is not a literal is left alone (lambda syntax).
    */
  private def rewriteArrowOps(sql: String): String = {
    var s = sql
    var guard = 0
    var changed = true
    while (changed && guard < 200) {
      changed = false; guard += 1
      var i = 0; var q: Char = 0
      while (i < s.length - 1 && !changed) {
        val c = s.charAt(i)
        if (q != 0) { if (c == q) q = 0; i += 1 }
        else if (c == '\'' || c == '`') { q = c; i += 1 }
        else if ((c == '-' || c == '#') && s.charAt(i + 1) == '>') {
          val text = i + 2 < s.length && s.charAt(i + 2) == '>'
          val opEnd = if (text) i + 3 else i + 2
          // RHS: literal number / string / NULL only
          val rhsM = """\s*('[^']*'|-?\d+|(?i:NULL)\b)""".r
            .findPrefixMatchOf(s.substring(opEnd))
          // LHS: walk back over a primary expression
          val lhsStart = arrowLhsStart(s, i)
          if (rhsM.isDefined && lhsStart >= 0 && lhsStart < i) {
            val lhs = s.substring(lhsStart, i).trim
            val rhs = rhsM.get.group(1)
            val fn =
              if (c == '#') if (text) "variant_path_text" else "variant_path"
              else if (text) "variant_get_text" else "variant_get_dyn"
            s = s.substring(0, lhsStart) + s"$fn($lhs, $rhs)" +
              s.substring(opEnd + rhsM.get.end)
            changed = true
          } else i = opEnd
        } else i += 1
      }
    }
    s
  }

  /** `FROM json_each(x)` -> derived table (key, value); `FROM
    * json_array_elements(x)` -> (value). Only FROM/JOIN-position calls
    * rewrite; select-position stays the tuple-returning SRF.
    */
  /** quote-aware `$$...$$` -> '...' (a `$$` inside a '...'/`...`/"..."
    * literal is untouched)
    */
  private def rewriteDollarQuotes(s0: String): String = {
    val sb = new StringBuilder(s0.length)
    var i = 0; var q = 0.toChar
    while (i < s0.length) {
      val c = s0.charAt(i)
      if (q != 0) { sb.append(c); if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`' || c == '"') { q = c; sb.append(c); i += 1 }
      else if (c == '$' && i + 1 < s0.length && s0.charAt(i + 1) == '$') {
        val close = s0.indexOf("$$", i + 2)
        if (close < 0) { sb.append(c); i += 1 }
        else {
          sb.append('\'')
            .append(s0.substring(i + 2, close).replace("'", "''"))
            .append('\'')
          i = close + 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def rewriteJsonSrfTvfs(sql0: String): String = {
    var sql = sql0
    // dollar-quoted literals in expression position ($$...$$, the
    // reference's jq-program spelling) -> standard quoted strings.
    // Gated on a jq( call being present: an unrelated statement whose
    // quoted literals happen to contain $$ must not be mangled.
    if (sql.contains("$$") && """(?is)\bjq\s*\(""".r.findFirstIn(sql).isDefined)
      sql = rewriteDollarQuotes(sql)
    // FROM jq(prog, json): one row per jq output (reference jq TVF)
    val jqRe = """(?is)\b(from|join)\s+jq\s*\(""".r
    var jm = jqRe.findFirstMatchIn(sql)
    var jqGuard = 0
    while (jm.isDefined && jqGuard < 50) {
      jqGuard += 1
      val m = jm.get
      val open = m.end - 1
      val close = matchParen(sql, open)
      val args = splitTopLevel(sql.substring(open + 1, close), ',')
      val jqArgs = args.head + ", graft_json_text(" + args.tail.mkString(",") + ")"
      sql = sql.substring(0, m.start) +
        s"${m.group(1)} (SELECT parse_json(jq) AS jq FROM " +
        s"(SELECT explode(jq_impl($jqArgs)) AS jq))" +
        sql.substring(close + 1)
      jm = jqRe.findFirstMatchIn(sql)
    }
    val re = """(?is)\b(from|join)\s+(json_each|json_array_elements)\s*\(""".r
    var m0 = re.findFirstMatchIn(sql)
    var guard = 0
    while (m0.isDefined && guard < 50) {
      guard += 1
      val m = m0.get
      val open = m.end - 1
      val close = matchParen(sql, open)
      val arg = sql.substring(open + 1, close)
      val derived = m.group(2).toLowerCase match {
        case "json_each" =>
          s"(SELECT explode(map_entries(from_json(CAST(($arg) AS STRING), " +
            s"'map<string,variant>'))) AS kv__) __je_raw" // named below
        case _ =>
          s"(SELECT explode(from_json(CAST(($arg) AS STRING), " +
            s"'array<variant>')) AS value)"
      }
      val repl = m.group(2).toLowerCase match {
        case "json_each" =>
          s"${m.group(1)} (SELECT kv__.key AS key, kv__.value AS value FROM $derived)"
        case _ => s"${m.group(1)} $derived"
      }
      sql = sql.substring(0, m.start) + repl + sql.substring(close + 1)
      m0 = re.findFirstMatchIn(sql)
    }
    sql
  }

  /** jsonb predicate operators (reference ast/expr.rs jsonb ops):
    *   a @? 'path'  -> json_path_exists     a @@ 'pred' -> json_path_match
    *   a @> b       -> json contains b      a <@ b      -> b contains a
    *   a ? 'k'      -> key/element exists   a ?| [..] / a ?& [..]
    * Quote-aware; `?` inside path strings stays untouched.
    */
  private def rewriteJsonbPredOps(sql: String): String = {
    var s = sql
    var guard = 0
    var changed = true
    val ops = Seq("@?" -> "json_path_exists", "@@" -> "json_path_match",
      "#-" -> "delete_by_keypath",
      "@>" -> "json_contains_in_right", "<@" -> "json_contains_in_left_sw",
      "?|" -> "json_has_any_keys_or_elems", "?&" -> "json_has_all_keys_or_elems",
      "?" -> "json_has_key_or_elem")
    while (changed && guard < 200) {
      changed = false; guard += 1
      var i = 0; var q: Char = 0
      while (i < s.length - 1 && !changed) {
        val c = s.charAt(i)
        if (q != 0) { if (c == q) q = 0; i += 1 }
        else if (c == '\'' || c == '`') { q = c; i += 1 }
        else ops.find { case (op, _) => s.startsWith(op, i) } match {
          case Some((op, fn0)) =>
            val opEnd = i + op.length
            val rhsM = """\s*('[^']*'|(?i:NULL)\b|\[[^\]]*\]|[A-Za-z_][\w.]*(\([^()]*\))?)""".r
              .findPrefixMatchOf(s.substring(opEnd))
            val lhsStart = arrowLhsStart(s, i)
            if (rhsM.isDefined && lhsStart >= 0 && lhsStart < i &&
                s.substring(lhsStart, i).trim.nonEmpty) {
              val lhs = s.substring(lhsStart, i).trim
              val rhs = rhsM.get.group(1)
              val call =
                if (fn0 == "json_contains_in_left_sw")
                  s"json_contains_in_right($rhs, $lhs)"
                else s"$fn0($lhs, $rhs)"
              s = s.substring(0, lhsStart) + call + s.substring(opEnd + rhsM.get.end)
              changed = true
            } else i = opEnd
          case None => i += 1
        }
      }
    }
    s
  }

  /** start index of the primary expression ending just before `op`
    * (identifier chain, quoted ident, or call/paren/subscript group)
    */
  /** Multiple `unnest(...)` items in ONE select list iterate in
    * LOCKSTEP in the reference (PostgreSQL multi-SRF semantics:
    * `SELECT unnest(a) AS x, unnest(b) AS y` zips positionally,
    * padding the shorter with NULL) — independent explodes would make
    * a cross product. Lowered onto one explode over an index-zipped
    * struct array; WHERE stays pre-explode, ORDER/LIMIT post.
    */
  private def rewriteZipUnnest(sql0: String): String = {
    if ("""(?i)\bunnest\s*\(""".r.findAllIn(sql0).length < 2) return sql0
    val selM = """(?is)^\s*SELECT\s+""".r.findPrefixMatchOf(sql0).getOrElse(return sql0)
    val listStart = selM.end
    val listEnd = clauseEnd(sql0, listStart, Set("FROM"))
    if (listEnd >= sql0.length) return sql0
    val items = splitTopLevel(sql0.substring(listStart, listEnd), ',')
    val uRe = """(?is)^unnest\s*\((.*)\)\s*(?:(?:AS\s+)?(\w+))?\s*$""".r
    case class U(idx: Int, expr: String, alias: Option[String])
    val us = items.zipWithIndex.flatMap { case (it, i) =>
      uRe.findFirstMatchIn(it.trim).map(m =>
        U(i, m.group(1), Option(m.group(2))))
    }
    if (us.length < 2) return sql0
    val rest = sql0.substring(listEnd)
    if (Seq("GROUP", "HAVING", "QUALIFY", "WINDOW")
        .exists(k => indexOfKeyword(rest, k) >= 0)) return sql0
    val outerCut = Seq("ORDER", "LIMIT", "OFFSET")
      .map(k => indexOfKeyword(rest, k)).filter(_ >= 0)
      .reduceOption(_ min _).getOrElse(rest.length)
    val inner = rest.substring(0, outerCut).trim.stripSuffix(";")
    val outerTail = rest.substring(outerCut)
    val sizes = us.map(u => s"size(${u.expr})").mkString(", ")
    val fields = us.zipWithIndex.map { case (u, k) =>
      s"try_element_at(${u.expr}, __zi) AS __zc$k" }.mkString(", ")
    // slice truncates the probe row when every array is empty/null
    val zipped = s"slice(transform(sequence(1, greatest($sizes, 1)), " +
      s"__zi -> struct($fields)), 1, greatest($sizes, 0))"
    val newItems = items.zipWithIndex.map { case (it0, i) =>
      val it = it0.trim
      us.find(_.idx == i) match {
        case Some(u) =>
          val k = us.indexWhere(_.idx == i)
          s"__zr.__zc$k AS ${u.alias.getOrElse("unnest")}"
        case None if it == "*" => "* EXCEPT (__zr)"
        case None if """(?is)^\*\s+(EXCLUDE|EXCEPT)\s*\(.*\)$""".r.matches(it) =>
          it.patch(it.lastIndexOf(')'), ", __zr", 0)
        case None => it
      }
    }
    s"SELECT ${newItems.mkString(", ")} FROM (SELECT *, " +
      s"explode($zipped) AS __zr $inner) __zq $outerTail"
  }

  /** Infix operator keywords Spark's parser lacks or resolves with the
    * wrong semantics, lowered onto registered functions:
    *   `a XOR b`            -> xor(a, b)
    *   `a [NOT] REGEXP p`   -> [NOT] regexp_like(a, p)   (MySQL
    *   `a [NOT] RLIKE p`    -> [NOT] regexp_like(a, p)    case-insensitive
    *                                                      default)
    * XOR binds looser than comparison (MySQL: AND > XOR > OR), so its
    * operands extend one comparison/arithmetic level around the
    * primaries (`a = 1 XOR b = 2` -> `xor(a = 1, b = 2)`); REGEXP sits
    * AT comparison level, so its operands stay primary/arithmetic.
    * Shapes the capture cannot confidently bound (an adjacent AND for
    * XOR, multi-operator chains) are left untouched — Spark's parser
    * then rejects the keyword loudly instead of us rewriting partial
    * operands into a silently different grouping.
    */
  private def rewriteInfixXor(sql0: String): String = {
    var sql = rewriteInfixKw(sql0, "XOR", cmpLevel = true,
      (l, r, _) => s"xor($l, $r)")
    for (kw <- Seq("REGEXP", "RLIKE"))
      sql = rewriteInfixKw(sql, kw, cmpLevel = false, (l, r, neg) =>
        if (neg) s"(NOT regexp_like($l, $r))" else s"regexp_like($l, $r)")
    sql
  }

  /** word tokens that safely BOUND an infix operand (clause keywords
    * and looser-binding operators) */
  private val InfixBoundaryKw: Set[String] = Set(
    "SELECT", "FROM", "WHERE", "GROUP", "ORDER", "HAVING", "LIMIT",
    "OFFSET", "UNION", "EXCEPT", "INTERSECT", "JOIN", "ON", "USING",
    "WHEN", "THEN", "ELSE", "END", "CASE", "AS", "BY", "ASC", "DESC",
    "NULLS", "OR", "SETTINGS", "WINDOW", "QUALIFY", "DISTINCT", "ALL",
    "VALUES", "SET", "RETURNING", "OVER", "PARTITION", "INTERVAL")

  /** forward-scan one primary expression (literal / ident chain /
    * call / balanced paren group / backtick ident, with `::type` and
    * trailing subscript chains) starting at or after `i0`; returns
    * (start, end) or null if none */
  private def primSpanAt(s: String, i0: Int): (Int, Int) = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    if (i >= s.length) return null
    val start = i
    var e = -1
    s.charAt(i) match {
      case '\'' =>
        var k = i + 1
        while (e < 0 && k < s.length) {
          if (s.charAt(k) == '\'') {
            if (k + 1 < s.length && s.charAt(k + 1) == '\'') k += 2
            else e = k + 1
          } else k += 1
        }
      case '(' =>
        try e = matchParen(s, i) + 1
        catch { case _: IllegalArgumentException => return null }
      case '`' =>
        val k = s.indexOf('`', i + 1)
        if (k >= 0) e = k + 1
      case c if c.isLetterOrDigit || c == '_' || c == '.' || c == '$' =>
        var k = i
        while (k < s.length && (s.charAt(k).isLetterOrDigit ||
          "._$".contains(s.charAt(k)))) k += 1
        var k2 = k
        while (k2 < s.length && s.charAt(k2).isWhitespace) k2 += 1
        if (k2 < s.length && s.charAt(k2) == '(' &&
            !InfixBoundaryKw(s.substring(i, k).toUpperCase)) {
          try e = matchParen(s, k2) + 1
          catch { case _: IllegalArgumentException => return null }
        } else e = k
      case _ => return null
    }
    if (e < 0) return null
    // absorb `::type` casts and `[...]` subscripts
    var more = true
    while (more && e < s.length) {
      more = false
      if (e + 1 < s.length && s.charAt(e) == ':' && s.charAt(e + 1) == ':') {
        var k = e + 2
        while (k < s.length && (s.charAt(k).isLetterOrDigit ||
          "._$".contains(s.charAt(k)))) k += 1
        if (k > e + 2) { e = k; more = true }
      } else if (s.charAt(e) == '[') {
        var depth = 0; var k = e; var done = -1
        while (done < 0 && k < s.length) {
          s.charAt(k) match {
            case '[' => depth += 1
            case ']' => depth -= 1; if (depth == 0) done = k + 1
            case _ =>
          }
          k += 1
        }
        if (done > 0) { e = done; more = true }
      }
    }
    (start, e)
  }

  /** is the [start,end) slice a bare SQL keyword (not a real operand)? */
  private def isBoundaryWord(s: String, start: Int, end: Int): Boolean =
    InfixBoundaryKw(s.substring(start, end).trim.toUpperCase)

  /** the maximal operator-char run ending at j (inclusive), or null */
  private def opRunBefore(s: String, j0: Int): (Int, Int) = {
    val opChars = "=<>!+-*/%|&^"
    var j = j0
    while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
    if (j < 0 || !opChars.contains(s.charAt(j))) return null
    val end = j + 1
    while (j >= 0 && opChars.contains(s.charAt(j))) j -= 1
    (j + 1, end)
  }

  private val CmpOps = Set("=", "==", "<", ">", "<=", ">=", "<>", "!=", "<=>")
  private val ArithOps = Set("+", "-", "*", "/", "%", "||")

  /** start of the infix-LHS operand ending at `end0` (exclusive), or
    * -1 when there is no confidently-boundable operand (caller then
    * treats the keyword occurrence as a call form / leaves the SQL
    * unchanged). `cmpLevel` = the operator binds LOOSER than
    * comparison (XOR), so one comparison step and NOT prefixes are
    * absorbed into the operand. */
  private def infixLhsStartChecked(s: String, end0: Int,
      cmpLevel: Boolean): Int = {
    var end = end0
    while (end > 0 && s.charAt(end - 1).isWhitespace) end -= 1
    if (end <= 0) return -1
    var start = arrowLhsStart(s, end)
    if (start < 0 || start >= end || isBoundaryWord(s, start, end)) return -1
    var absorbedCmp = false
    var guard = 0
    while (guard < 20) {
      guard += 1
      var j = start - 1
      while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
      if (j < 0) return start
      val c = s.charAt(j)
      if (c == '(' || c == ',' || c == ';') return start
      if (c.isLetterOrDigit || c == '_') {
        var k = j
        while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_')) k -= 1
        val word = s.substring(k + 1, j + 1).toUpperCase
        if (word == "NOT") {
          // NOT binds tighter than XOR -> part of the operand; for a
          // comparison-level keyword it bounds the operand instead
          if (cmpLevel) { start = k + 1 } else return start
        } else if (InfixBoundaryKw(word)) return start
        // a tighter-binding word operator (AND/IS/LIKE/IN/BETWEEN/
        // DIV/MOD...) makes this a partial operand: bail
        else return -1
      } else opRunBefore(s, j) match {
        case null => return start
        case (os, oe) =>
          val op = s.substring(os, oe)
          val tighter = ArithOps(op) || (cmpLevel && CmpOps(op))
          if (!tighter || (CmpOps(op) && absorbedCmp)) return -1
          val p = arrowLhsStart(s, os)
          if (p >= 0 && p < os && !isBoundaryWord(s, p, os)) {
            if (CmpOps(op)) absorbedCmp = true
            start = p
          } else if ((op == "-" || op == "+") && {
            // unary sign: nothing usable before the run
            var q = os - 1
            while (q >= 0 && s.charAt(q).isWhitespace) q -= 1
            q < 0 || "(,;".contains(s.charAt(q)) || {
              var k = q
              while (k >= 0 && (s.charAt(k).isLetterOrDigit ||
                s.charAt(k) == '_')) k -= 1
              k < q && InfixBoundaryKw(s.substring(k + 1, q + 1).toUpperCase)
            }
          }) return os
          else return -1
      }
    }
    start
  }

  /** end of the infix-RHS operand starting at or after `from`, or -1
    * when no confidently-bounded operand parses there */
  private def infixRhsEndChecked(s: String, from: Int,
      cmpLevel: Boolean): Int = {
    var i = from
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    // NOT prefix folds into a looser-than-comparison operand
    if (cmpLevel && s.regionMatches(true, i, "NOT", 0, 3) &&
        (i + 3 >= s.length || !s.charAt(i + 3).isLetterOrDigit &&
          s.charAt(i + 3) != '_')) {
      val e = infixRhsEndChecked(s, i + 3, cmpLevel)
      return e
    }
    // leading sign
    if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
    val p = primSpanAt(s, i)
    if (p == null || isBoundaryWord(s, p._1, p._2)) return -1
    var e = p._2
    var absorbedCmp = false
    var guard = 0
    while (guard < 20) {
      guard += 1
      var j = e
      while (j < s.length && s.charAt(j).isWhitespace) j += 1
      if (j >= s.length) return e
      val c = s.charAt(j)
      if (c == ')' || c == ',' || c == ';' || c == ']') return e
      if (c.isLetterOrDigit || c == '_') {
        var k = j
        while (k < s.length && (s.charAt(k).isLetterOrDigit ||
          s.charAt(k) == '_')) k += 1
        val word = s.substring(j, k).toUpperCase
        // another occurrence of a loose operator, a clause keyword, or
        // (for cmpLevel) an alias: the operand ends here. A
        // tighter-binding word (AND, IS, LIKE, IN, BETWEEN, DIV, MOD)
        // would make it partial: bail for those we know bind tighter.
        if (Set("AND", "IS", "LIKE", "ILIKE", "IN", "BETWEEN", "DIV",
            "MOD", "SOUNDS", "MEMBER", "COLLATE")(word))
          return if (cmpLevel) -1 else e
        return e
      }
      val opChars = "=<>!+-*/%|&^"
      if (!opChars.contains(c)) return e
      var k = j
      while (k < s.length && opChars.contains(s.charAt(k))) k += 1
      val op = s.substring(j, k)
      val tighter = ArithOps(op) || (cmpLevel && CmpOps(op))
      if (!tighter || (CmpOps(op) && absorbedCmp))
        return if (CmpOps(op) && !cmpLevel) e else -1
      val p2 = primSpanAt(s, k)
      if (p2 == null || isBoundaryWord(s, p2._1, p2._2)) return -1
      if (CmpOps(op)) absorbedCmp = true
      e = p2._2
    }
    e
  }

  private def rewriteInfixKw(sql0: String, kw: String, cmpLevel: Boolean,
      mk: (String, String, Boolean) => String): String = {
    var sql = sql0
    var guard = 0
    while (guard < 100) {
      guard += 1
      var at = -1
      var lhsStartF = -1
      var lhsEndF = -1
      var negF = false
      var from = 0
      // a keyword occurrence only rewrites as infix when a real LHS
      // operand precedes it — `xor(a, b)` / `SELECT xor (a, b)` are
      // call forms, but `a XOR (b = 1)` is infix with a paren RHS
      while (at < 0 && from < sql.length) {
        val cand = indexOfKeywordAnyDepth(sql, kw, from)
        if (cand < 0) from = sql.length
        else {
          // a preceding NOT belongs to the operator (`a NOT REGEXP p`)
          val notM = """(?is)^(.*?)\bNOT\s*$""".r
            .findFirstMatchIn(sql.substring(0, cand))
          val neg = !cmpLevel && notM.isDefined
          val lhsEnd = if (neg) notM.get.group(1).length else cand
          val lhsStart = infixLhsStartChecked(sql, lhsEnd, cmpLevel)
          if (lhsStart < 0) from = cand + kw.length
          else { at = cand; lhsStartF = lhsStart; lhsEndF = lhsEnd; negF = neg }
        }
      }
      if (at < 0) return sql
      val rhsEnd = infixRhsEndChecked(sql, at + kw.length, cmpLevel)
      if (rhsEnd < 0) return sql
      val lhs = sql.substring(lhsStartF, lhsEndF).trim
      val rhs = sql.substring(at + kw.length, rhsEnd).trim
      sql = sql.substring(0, lhsStartF) + mk(lhs, rhs, negF) +
        sql.substring(rhsEnd)
    }
    sql
  }

  /** databend's lexer takes bare unicode identifiers (`SELECT 1 AS
    * 中文`, tables/columns named in CJK — alias/unicode_ident suite);
    * Spark's unquoted-identifier grammar is ASCII — backtick-quote
    * every identifier run containing a non-ASCII letter (outside
    * string/backtick literals).
    */
  private def quoteUnicodeIdents(sql: String): String = {
    if (!sql.exists(_ > 127.toChar)) return sql
    val sb = new StringBuilder(sql.length + 8)
    var i = 0; var q: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) {
        // honor backslash escapes inside single/double quotes so an
        // escaped quote (\') doesn't end the literal early
        if (c == '\\' && q != '`' && i + 1 < sql.length) {
          sb.append(c).append(sql.charAt(i + 1)); i += 2
        } else { sb.append(c); if (c == q) q = 0; i += 1 }
      }
      else if (c == '\'' || c == '"' || c == '`') { q = c; sb.append(c); i += 1 }
      else if (Character.isLetter(c) || c == '_') {
        val start = i
        while (i < sql.length && (Character.isLetterOrDigit(sql.charAt(i)) ||
          sql.charAt(i) == '_')) i += 1
        val word = sql.substring(start, i)
        if (word.exists(_ > 127.toChar)) sb.append('`').append(word).append('`')
        else sb.append(word)
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def arrowLhsStart(s: String, op: Int): Int = {
    var j = op - 1
    while (j >= 0 && s.charAt(j).isWhitespace) j -= 1
    if (j < 0) return -1
    var start = -1
    var done = false
    while (!done && j >= 0) {
      s.charAt(j) match {
        case ')' | ']' =>
          var depth = 0
          var k = j
          var inQ = false
          while (k >= 0 && (depth != 0 || k == j)) {
            val ch = s.charAt(k)
            if (inQ) { if (ch == '\'') inQ = false }
            else ch match {
              case ')' | ']' => depth += 1
              case '(' | '[' => depth -= 1
              case '\'' => inQ = true
              case _ =>
            }
            k -= 1
          }
          start = k + 1; j = k
        case ch if ch.isLetterOrDigit || ch == '_' || ch == '.' || ch == '$' =>
          var k = j
          while (k >= 0 && (s.charAt(k).isLetterOrDigit ||
            "._$".contains(s.charAt(k)))) k -= 1
          start = k + 1; j = k
        case '`' =>
          var k = j - 1
          while (k >= 0 && s.charAt(k) != '`') k -= 1
          start = k; j = k - 1
        case '\'' =>
          var k = j - 1
          while (k >= 0 && s.charAt(k) != '\'') k -= 1
          start = k; j = k - 1
        case _ => done = true
      }
      // absorb a `::type` cast prefix ('...'::json->k) and preceding
      // identifier/call chains (f(x)->, t.v->)
      if (!done && j >= 1 && s.charAt(j) == ':' && s.charAt(j - 1) == ':')
        j -= 2
      else if (!done && j >= 0 && !(s.charAt(j).isLetterOrDigit ||
            "._$`')]".contains(s.charAt(j)))) done = true
    }
    start
  }

  /** strip `-- ...` line comments, quote-aware (databend lexer) */
  private def stripLineComments(sql: String): String = {
    if (!sql.contains("--")) return sql
    sql.linesIterator.map { line =>
      var i = 0; var inStr = false; var cut = -1
      while (i < line.length && cut < 0) {
        val c = line.charAt(i)
        if (inStr) { if (c == '\'') inStr = false }
        else if (c == '\'') inStr = true
        else if (c == '-' && i + 1 < line.length && line.charAt(i + 1) == '-') cut = i
        i += 1
      }
      if (cut >= 0) line.substring(0, cut) else line
    }.mkString("\n")
  }

  def execute(sql: String): DataFrame = {
    var s = sql.trim.stripSuffix(";").trim
    s = stripBlockComments(s).trim.stripSuffix(";").trim
    s = stripLineComments(s).trim.stripSuffix(";").trim
    s = preserveUnknownEscapes(s)
    s = quoteUnicodeIdents(s)
    // $name / getvariable('name') -> stored literals (except inside a
    // SET VARIABLE statement itself, whose RHS must evaluate fresh,
    // and CREATE POLICY bodies, which re-bind GETVARIABLE at every
    // statement — reference row_policy_result_cache)
    if (!s.regionMatches(true, 0, "SET VARIABLE", 0, 12) &&
        !"""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(MASKING|ROW\s+ACCESS)\s+POLICY\b""".r
          .findPrefixMatchOf(s).isDefined)
      s = substituteVariables(s)
    // show_variables() TVF form of SHOW VARIABLES
    if (s.toLowerCase.contains("show_variables"))
      s = """(?i)\bshow_variables\s*\(\s*\)""".r
        .replaceAllIn(s, java.util.regex.Matcher.quoteReplacement(freshView(variablesDf())))
    // trailing IGNORE_RESULT (databend statement suffix: run, discard
    // rows — tests/sqllogictests suites use it on large results)
    s = s.replaceAll("(?is)\\s+IGNORE_RESULT\\s*$", "")
    // databend's lexer keeps `\"` VERBATIM inside single-quoted
    // strings (only \' \\ etc. unescape — insert_into_values /
    // insert_into_variant vectors); Spark's lexer unescapes it, so
    // double the backslash. $$-bodied statements (python UDFs) skip.
    if (s.contains("\\\"") && !s.contains("$$"))
      s = databendDquoteEscapes(s)
    // dialect-level operator spellings (skip CREATE FUNCTION / CREATE
    // POLICY so script and policy bodies — which use `->` as the body
    // arrow — pass through untouched)
    // ... and COPY INTO, whose @stage references the pg prefix-abs
    // rewrite would mangle into abs(stage)
    if (!"""(?is)^\s*(COPY\b|CREATE\s+(OR\s+REPLACE\s+)?(FUNCTION\b|(MASKING|ROW\s+ACCESS)\s+POLICY\b))""".r
          .findPrefixMatchOf(s).isDefined &&
        // a CTE-prologued COPY (`WITH s AS (...) COPY INTO @x`) and
        // REMOVE @stage must keep their @stage out of the pg
        // prefix-abs rewrite too
        !"""(?is)\bCOPY\s+INTO\s+@""".r.findFirstIn(s).isDefined &&
        !"""(?is)^\s*REMOVE\s+@""".r.findPrefixMatchOf(s).isDefined)
      s = dialectOps(s)
    // `SETTINGS (k = v, ...) <stmt>` per-statement settings prefix
    // (ast/statements/statement.rs StatementWithSettings). Most knobs
    // are engine-internal (spill/topn/shuffle modes) with no Spark
    // analog that changes results — strip and run the statement.
    // enable_group_by_column_first flips GROUP BY name resolution.
    val settingsM = """(?is)^SETTINGS\s*\(""".r.findPrefixMatchOf(s)
    if (settingsM.isDefined) {
      val open = settingsM.get.end - 1
      val close = matchParen(s, open)
      val knobs = s.substring(open + 1, close)
      val colFirst = """(?i)enable_group_by_column_first\s*=\s*1""".r
        .findFirstIn(knobs).isDefined
      // per-statement timezone: semantics use the session zone for
      // the statement's plans; the RESULT's timestamp columns are
      // shifted to render identically under the harness's UTC render
      // (the reference renders per-session-tz server-side)
      val tzKnob = """(?i)timezone\s*=\s*'([^']*)'""".r
        .findFirstMatchIn(knobs).map(_.group(1))
      // datetime parser-mode settings change PLAN semantics
      // (DatetimeCoercionRule reads them at analysis time): apply for
      // the statement, restore after
      val dtKnobs = Seq("enable_strict_datetime_parser",
        "enable_auto_detect_datetime_format").flatMap { k =>
        ("(?i)" + k + """\s*=\s*(\d+)""").r.findFirstMatchIn(knobs)
          .map(m => k -> m.group(1))
      } ++ tzKnob.map("spark.sql.session.timeZone" -> _)
      val saved = dtKnobs.map { case (k, _) =>
        k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
      }
      dtKnobs.foreach { case (k, v) => spark.conf.set(k, v) }
      if (dtKnobs.nonEmpty) graft.functions.TimestampTz.register(spark)
      try {
        def run(): DataFrame = {
          val inner = execute(s.substring(close + 1))
          tzKnob match {
            case Some(tz) if tz.toUpperCase != "UTC" =>
              // harness renders in UTC; shift timestamp columns so the
              // text matches the reference's session-tz rendering
              inner.schema.fields.foldLeft(inner) { (df, f) =>
                if (f.dataType == org.apache.spark.sql.types.TimestampType)
                  df.withColumn(f.name,
                    org.apache.spark.sql.functions.from_utc_timestamp(
                      col(s"`${f.name}`"), tz))
                else df
              }
            case _ => inner
          }
        }
        if (colFirst) {
          columnFirstGroupBy = true
          try return run()
          finally columnFirstGroupBy = false
        }
        return run()
      } finally {
        saved.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => try spark.conf.unset(k) catch { case _: Exception => () }
        }
        if (dtKnobs.nonEmpty) graft.functions.TimestampTz.register(spark)
      }
    }
    val up = s.toUpperCase
    def is(kw: String) = up.startsWith(kw)
    if (is("FROM ") || is("FROM(")) {
      // databend FROM-first queries (ast/query.rs): a bare `FROM t`
      // means `SELECT * FROM t`; `FROM t SELECT ...` is Hive-style and
      // Spark parses it natively
      return query(if (indexOfKeyword(s, "SELECT") >= 0) s else "SELECT * " + s)
    }
    if (is("WITH")) {
      if ("""(?is)^WITH\s+RECURSIVE\b""".r.findPrefixMatchOf(s).isDefined)
        // run the fixpoint ourselves: Spark's native recursion allows
        // only one self-reference per recursive term; the reference
        // permits several (r_cte multi-ref, sudoku) — basic_r_cte.test
        executeRecursiveWith(s)
      else withDmlSplit(s) match {
        // databend allows a CTE prologue on DML (query/cte/
        // {insert,delete,update}_cte.test): expose each CTE as a temp
        // view for the statement, then run the DML itself
        case Some((ctes, dml)) => executeWithCtes(ctes, dml)
        case None => query(s)
      }
    }
    else if (is("SELECT") || is("VALUES") || is("EXPLAIN") ||
        is("TABLE ") || is("(")) query(s)
    else if (up.matches("(?s)^CREATE\\s+(OR\\s+REPLACE\\s+)?TASK\\b.*")) createTask(s)
    else if (is("ALTER TASK")) alterTask(s)
    else if (is("DROP TASK")) dropTask(s)
    else if (is("EXECUTE TASK")) executeTask(s)
    else if (is("SHOW TASKS")) showTasks(s.substring("SHOW TASKS".length))
    else if (is("CREATE") && up.contains("STREAM") &&
             CreateStreamRe.findFirstIn(s).isDefined) createStream(s)
    else if (is("CREATE") && (CreateStageRe.findFirstIn(s).isDefined ||
             CreateBareStageRe.pattern.matcher(s).matches())) createStage(s)
    else if (is("DROP STAGE")) dropStage(s)
    else if (is("REMOVE ") || is("REMOVE\t") || is("REMOVE @")) removeStage(s)
    else if (is("CREATE") && CreateLambdaFnRe.pattern.matcher(s).matches())
      createLambdaFunction(s)
    else if (is("CREATE") && CreatePyFnRe.findFirstIn(s).isDefined) createPyFunction(s)
    else if (is("DROP FUNCTION") && DropFnRe.findFirstIn(s).isDefined) dropFunction(s)
    else if (up.matches("(?s)CREATE\\s+(OR\\s+REPLACE\\s+)?(DATABASE|SCHEMA)\\b.*"))
      createDatabase(s)
    else if (is("DROP DATABASE") || is("DROP SCHEMA")) dropDatabase(s)
    else if (up.matches("(?s)^CREATE\\s+(OR\\s+REPLACE\\s+)?(MASKING|ROW\\s+ACCESS)\\s+POLICY\\b.*"))
      createPolicy(s)
    else if (up.matches("(?s)^DROP\\s+(MASKING|ROW\\s+ACCESS)\\s+POLICY\\b.*"))
      dropPolicy(s)
    else if (is("SET SECONDARY ROLES")) {
      val arg = s.substring("SET SECONDARY ROLES".length).trim
      secondaryRoles =
        if (arg.equalsIgnoreCase("ALL")) None
        else if (arg.equalsIgnoreCase("NONE")) Some(Seq.empty)
        else Some(arg.split(",").map(a => norm(a.trim)).toSeq)
      status("op" -> "set-secondary-roles", "roles" -> arg)
    }
    else if (is("CREATE ROLE") || is("DROP ROLE") || is("SET ROLE")) roleDdl(s)
    else if (is("UNDROP TABLE")) undropTable(s)
    else if (up.matches("(?s)^CREATE\\s+(OR\\s+REPLACE\\s+)?PROCEDURE\\b.*"))
      createProcedureStmt(s)
    else if (is("DROP PROCEDURE")) dropProcedureStmt(s)
    else if (is("CALL ")) callProcedure(s)
    else if ((is("DESC ") || is("DESCRIBE ")) &&
             """(?is)^DESC(RIBE)?\s+PROCEDURE\b""".r.findPrefixMatchOf(s).isDefined)
      descProcedure(s)
    else if (up.matches("(?s)^CREATE\\s+(OR\\s+REPLACE\\s+)?(ASYNC\\s+|SYNC\\s+)?AGGREGATING\\s+INDEX\\b.*"))
      createAggIndex(s)
    else if (up.matches("(?s)^DROP\\s+AGGREGATING\\s+INDEX\\b.*")) dropAggIndex(s)
    else if (up.matches("(?s)^REFRESH\\s+AGGREGATING\\s+INDEX\\b.*")) refreshAggIndexStmt(s)
    else if (up.matches("(?s)^CREATE\\s+(OR\\s+REPLACE\\s+)?(SYNC\\s+|ASYNC\\s+)?(INVERTED|NGRAM|VECTOR|SPATIAL)\\s+INDEX\\b.*"))
      createTableIndex(s)
    else if (up.matches("(?s)^DROP\\s+(INVERTED|NGRAM|VECTOR|SPATIAL)\\s+INDEX\\b.*"))
      dropTableIndex(s)
    else if (up.matches("(?s)^REFRESH\\s+(INVERTED|NGRAM|VECTOR|SPATIAL)\\s+INDEX\\b.*"))
      status("op" -> "refresh-index")
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
    else if (is("COPY") &&
             """(?is)^\s*COPY\s+INTO\s+(@|')""".r.findPrefixMatchOf(s).isDefined)
      copyExport(s)
    else if (is("COPY")) copy(s)
    else if (is("ALTER TABLE")) alterTable(s)
    else if (is("ALTER DATABASE") &&
             """(?is)REFRESH\s+CACHE\s*$""".r.findFirstIn(s).isDefined)
      status("op" -> "refresh-cache")
    else if (is("OPTIMIZE")) optimize(s)
    else if (is("VACUUM")) vacuum(s)
    else if (is("ANALYZE")) analyzeTable(s)
    else if (is("SET VARIABLE")) setVariable(s.substring("SET VARIABLE".length))
    else if (is("UNSET VARIABLE")) {
      s.substring("UNSET VARIABLE".length).split(",").map(_.trim.toLowerCase)
        .filter(_.nonEmpty).foreach(variables.remove)
      status("op" -> "unset-variable")
    }
    else if (is("SHOW VARIABLES"))
      showVariables(s.substring("SHOW VARIABLES".length))
    else if (is("SET ") && """(?is)^SET\s+(GLOBAL\s+|SESSION\s+)?timezone\s*=\s*'([^']*)'\s*$""".r
               .findPrefixMatchOf(s).isDefined) {
      // databend `SET timezone = 'Asia/Shanghai'` IS the session zone
      // (Spark's key spark.sql.session.timeZone); keep the databend
      // key too so SHOW SETTINGS round-trips
      val tz = """(?is)^SET\s+(?:GLOBAL\s+|SESSION\s+)?timezone\s*=\s*'([^']*)'\s*$""".r
        .findPrefixMatchOf(s).get.group(1)
      spark.conf.set("spark.sql.session.timeZone", tz)
      spark.conf.set("timezone", tz)
      // TimestampTz captures the session zone at registration
      graft.functions.TimestampTz.register(spark)
      status("op" -> "set", "setting" -> "timezone", "value" -> tz)
    }
    else if (is("SET ") &&
             """(?is)^SET\s+(GLOBAL\s+|SESSION\s+)?\w+\s*=.*""".r
               .pattern.matcher(s.trim.stripSuffix(";")).matches()) {
      // databend SET [GLOBAL|SESSION] <setting> = v. The key is
      // recorded so a harness driving many logical sessions over one
      // SparkSession can reset between them (resetSessionSettings) —
      // the reference's harness gets a fresh session per suite, so
      // its suites never UNSET result-shaping knobs like
      // max_result_rows.
      """(?is)^SET\s+(?:GLOBAL\s+|SESSION\s+)?(\w+)\s*=.*""".r
        .findFirstMatchIn(s).foreach(m =>
          sessionSetKeys += m.group(1).toLowerCase)
      spark.sql("SET " + s.trim.stripSuffix(";")
        .replaceAll("(?is)^SET\\s+(GLOBAL\\s+|SESSION\\s+)?", ""))
    }
    else if (is("UNSET ") &&
             s.substring(6).trim.stripSuffix(";").equalsIgnoreCase("timezone")) {
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      try spark.conf.unset("timezone") catch { case _: Exception => () }
      status("op" -> "unset", "setting" -> "timezone")
    }
    else if (is("UNSET ")) // databend UNSET <setting> = Spark RESET
      spark.sql("RESET " + s.substring(6).trim.stripSuffix(";"))
    else if (is("USE ")) {
      currentDb = norm(s.substring(4).trim)
      status("database" -> currentDb, "op" -> "use")
    }
    else if (is("SHOW STREAMS")) showStreams(s.substring("SHOW STREAMS".length))
    else if (is("SHOW TABLES")) showTables()
    else if (is("SHOW STAGES")) showStages()
    else if (is("SHOW CREATE TABLE"))
      showCreateTable(s.substring("SHOW CREATE TABLE".length).trim)
    else if ((is("DESC ") || is("DESCRIBE ")) &&
             """(?is)^DESC(RIBE)?\s+(MASKING|ROW\s+ACCESS)\s+POLICY\b""".r
               .findPrefixMatchOf(s).isDefined) descPolicy(s)
    else if (is("SHOW ") || is("DESC ") || is("DESCRIBE ")) showDescribe(s)
    else if (is("BEGIN") || is("EXECUTE IMMEDIATE") || s.startsWith("$$")) {
      var body = s.replaceAll("(?i)^EXECUTE\\s+IMMEDIATE\\s*", "")
      // quoted script text: EXECUTE IMMEDIATE 'select 42' (and the
      // $variable form, already substituted above)
      if (body.startsWith("'") && body.endsWith("'") && body.length >= 2)
        body = body.substring(1, body.length - 1).replace("''", "'")
      graft.operators.SqlScript.executeImmediate(spark, body, execute)
    }
    else query(s) // let Spark handle anything else (CREATE VIEW, SET, ...)
  }

  /** split `WITH name [(cols)] AS (...), ... <DML>` into the CTE list
    * and the trailing DML statement; None when the tail is a plain
    * query (handled natively) or the prologue is RECURSIVE
    */
  private def withDmlSplit(
      s: String): Option[(Seq[(String, String, String)], String)] = {
    var i = "WITH".length
    if ("""(?is)^\s*RECURSIVE\b""".r.findPrefixMatchOf(s.substring(i)).isDefined)
      return None
    val ctes = mutable.Buffer[(String, String, String)]()
    while (true) {
      val hm = """(?is)^\s*(\w+)\s*(\(([^)]*)\))?\s*AS\s*\(""".r
        .findPrefixMatchOf(s.substring(i))
      hm match {
        case None => return None
        case Some(h) =>
          val open = i + h.end - 1
          val close = matchParen(s, open)
          ctes += ((h.group(1), h.group(3), s.substring(open + 1, close)))
          val after = s.substring(close + 1)
          val cm = """(?is)^\s*,""".r.findPrefixMatchOf(after)
          if (cm.isDefined) i = close + 1 + cm.get.end
          else {
            val rest = after.trim
            val up = rest.toUpperCase
            if (up.startsWith("INSERT") || up.startsWith("DELETE") ||
                up.startsWith("UPDATE") || up.startsWith("MERGE") ||
                up.startsWith("REPLACE") || up.startsWith("COPY"))
              return Some((ctes.toSeq, rest))
            return None
          }
      }
    }
    None
  }

  /** `WITH RECURSIVE c1 AS (...), c2 AS (...) <main>` — each
    * self-referencing CTE runs through the driver-side fixpoint
    * (operators/RecursiveCte, the RecursiveCteScan analog): the step
    * query sees the CTE name as the PREVIOUS frontier (standard
    * UNION ALL working-table semantics), so multiple self-references
    * and references to earlier CTEs both work. Non-recursive members
    * become plain views.
    */
  private def executeRecursiveWith(s: String): DataFrame = {
    var i = indexOfKeyword(s, "RECURSIVE") + "RECURSIVE".length
    val created = mutable.Buffer[String]()
    var main: String = null
    while (main == null) {
      val hm = """(?is)^\s*(\w+)\s*(\(([^)]*)\))?\s*AS\s*\(""".r
        .findPrefixMatchOf(s.substring(i))
      require(hm.isDefined,
        s"cannot parse recursive WITH at: ${s.substring(i).take(80)}")
      val h = hm.get
      val name = h.group(1)
      val cols = Option(h.group(3)).map(splitTopLevel(_, ',').map(norm))
      val open = i + h.end - 1
      val close = matchParen(s, open)
      val body = s.substring(open + 1, close)
      val selfRef = wordRe(name).findFirstIn(body).isDefined
      val df =
        if (!selfRef) {
          var d = spark.sql(rewriteReads(body))
          cols.foreach(c => d = d.toDF(c: _*))
          d
        } else {
          val u = indexOfKeyword(body, "UNION")
          require(u >= 0, s"recursive CTE $name needs UNION ALL")
          val allM = """(?is)^UNION\s+ALL\s+""".r.findPrefixMatchOf(body.substring(u))
          require(allM.isDefined, s"recursive CTE $name: only UNION ALL recursion")
          val baseText = body.substring(0, u)
          val stepText = body.substring(u + allM.get.end)
          var baseDf = spark.sql(rewriteReads(baseText))
          cols.foreach(c => baseDf = baseDf.toDF(c: _*))
          val schema = baseDf.schema
          graft.operators.RecursiveCte.run(baseDf, maxIter = 1000, step = fr => {
            fr.createOrReplaceTempView(name)
            if (!created.contains(name)) created += name
            // recursive term aligns by position and casts to the base
            // term's types (the reference's binder does the same)
            val sd = spark.sql(rewriteReads(stepText))
              .toDF(schema.fieldNames.toSeq: _*)
            sd.select(schema.fields.map(f =>
              col(s"`${f.name}`").cast(f.dataType).as(f.name)).toSeq: _*)
          })
        }
      df.createOrReplaceTempView(name)
      if (!created.contains(name)) created += name
      val after = s.substring(close + 1)
      val cm = """(?is)^\s*,""".r.findPrefixMatchOf(after)
      if (cm.isDefined) i = close + 1 + cm.get.end
      else main = after.trim
    }
    try query(main)
    finally created.foreach(n => spark.catalog.dropTempView(n))
  }

  private def executeWithCtes(ctes: Seq[(String, String, String)],
                              dml: String): DataFrame = {
    val created = mutable.Buffer[String]()
    try {
      for ((name, cols, body) <- ctes) {
        var df = spark.sql(rewriteReads(body))
        if (cols != null && cols.trim.nonEmpty)
          df = df.toDF(splitTopLevel(cols, ',').map(norm): _*)
        df.createOrReplaceTempView(name)
        created += name
      }
      execute(dml)
    } finally created.foreach(spark.catalog.dropTempView(_))
  }

  // ---- queries (with time-travel / changes / stream rewrite) ----------

  /** Streams referenced by the LAST query() call — consumed by DML that
    * selects from a stream (the reference advances stream cursors when
    * a DML consumes them: stream_table.rs).
    */
  private var lastStreamRefs: Seq[String] = Seq.empty

  /** reading a STREAM inside a DML consumes it — advance every cursor
    * the statement's source referenced (reference stream
    * with_consume transactional semantics)
    */
  private def consumeReferencedStreams(): Unit =
    lastStreamRefs.foreach(n0 => streams(n0).consume(_ => ()))

  private def query(s: String): DataFrame = {
    val df = query0(s)
    // databend's max_result_rows setting truncates oversized results
    val cap = try spark.conf.get("max_result_rows").toLong
              catch { case _: Exception => 0L }
    if (cap > 0) df.limit(cap.toInt) else df
  }

  /** reference ORDER BY strictness (crdb corpus order_by.test):
    *  - 1005: `((SELECT ... ORDER BY x)) ORDER BY y` — a parenthesized
    *    query that already carries ORDER BY takes no second one;
    *  - 1065: `ORDER BY <alias>` where the alias is declared more than
    *    once with DIFFERENT expressions is ambiguous (identical
    *    expressions, e.g. `a AS foo, (a) AS foo`, stay legal).
    */
  private def checkOrderByConflicts(s: String): Unit = {
    val t = s.trim.stripSuffix(";").trim
    if (t.startsWith("(")) {
      val close = try matchParen(t, 0) catch { case _: Exception => -1 }
      if (close > 0 && """(?is)^\s*ORDER\s+BY\b.*""".r.matches(t.substring(close + 1))) {
        var inner = t.substring(1, close).trim
        while (inner.startsWith("(") && matchParen(inner, 0) == inner.length - 1)
          inner = inner.substring(1, inner.length - 1).trim
        if (indexOfKeyword(inner, "ORDER") >= 0)
          throw new IllegalArgumentException(
            "1005: multiple ORDER BY clauses not allowed on a parenthesized query")
      }
    }
    if ("""(?is)^\s*SELECT\b.*""".r.matches(t)) {
      val ob = indexOfKeyword(t, "ORDER")
      if (ob >= 0) {
        val listStart = indexOfKeyword(t, "SELECT") + "SELECT".length
        val listEnd = clauseEnd(t, listStart, Set("FROM", "WHERE", "GROUP",
          "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION", "EXCEPT",
          "INTERSECT", "WINDOW", "QUALIFY"))
        // EXPLICIT `AS alias` forms only — implicit trailing aliases
        // are not reliably distinguishable from expressions by text
        val aliasRe = """(?is)^(.*\S)\s+AS\s+`?([A-Za-z_]\w*)`?\s*$""".r
        // normalized expression text compares case-INsensitively:
        // `upper(a) AS foo, UPPER(a) AS foo` is the same declaration
        val pairs = splitTopLevel(t.substring(listStart, listEnd), ',').flatMap {
          case aliasRe(e, a) =>
            Some(a.toLowerCase -> e.replaceAll("[\\s()]+", "").toLowerCase)
          case _ => None
        }
        val obEnd = clauseEnd(t, ob + "ORDER".length,
          Set("LIMIT", "OFFSET", "FETCH", "SETTINGS"))
        // an ORDER BY item only REFERENCES an alias when the whole item
        // (minus ASC/DESC/NULLS FIRST|LAST) is a lone identifier —
        // `foo + 1` is an expression over the underlying column, not an
        // ambiguous alias use
        val obNames = splitTopLevel(
          t.substring(ob + "ORDER".length, obEnd)
            .replaceAll("(?is)^\\s*BY\\b", ""), ',')
          .map(_.trim
            .replaceAll("(?is)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "")
            .replaceAll("(?is)\\s+(ASC|DESC)\\s*$", "")
            .trim.toLowerCase)
          .filter(_.matches("[a-z_]\\w*"))
        for (n <- obNames) {
          val es = pairs.filter(_._1 == n).map(_._2).distinct
          if (es.size > 1) throw new IllegalArgumentException(
            s"""1065: ORDER BY "$n" is ambiguous: the alias is declared with different expressions""")
        }
      }
    }
  }

  /** reference 1065: the same alias on both sides of a NATURAL/USING
    * join (any nesting depth) — `(select 42) tbl(a) natural join
    * (select 42) tbl(a)` — is rejected at bind time.
    */
  private def checkDuplicateJoinAliases(s: String): Unit = {
    val re = ("""(?is)\)\s*(?:AS\s+)?([A-Za-z_]\w*)\s*(?:\([^()]*\))?\s+NATURAL\s+""" +
      """(?:INNER\s+|LEFT\s+(?:OUTER\s+)?|RIGHT\s+(?:OUTER\s+)?|FULL\s+(?:OUTER\s+)?)?""" +
      """JOIN\s*\([^()]*\)\s*(?:AS\s+)?([A-Za-z_]\w*)""").r
    for (m <- re.findAllMatchIn(s))
      if (m.group(1).equalsIgnoreCase(m.group(2)))
        throw new IllegalArgumentException(
          s"1065: duplicate table alias '${m.group(1)}' on both sides of a join")
  }

  private def query0(s: String): DataFrame = {
    checkOrderByConflicts(s)
    checkDuplicateJoinAliases(s)
    var cur = rewriteReads(rewriteUsingStar(s))
    var tries = 0
    while (tries < 5) {
      try return spark.sql(cur)
      catch {
        // databend (like DuckDB) lets WHERE reference a select-list
        // alias as sugar for its expression (query/aggregate.test
        // total_user_income); Spark resolves only real columns. When
        // the unresolved name is a declared alias, substitute the
        // aliased expression and retry — columns always win because
        // this path only runs after Spark failed to resolve the name.
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null &&
               e.getCondition.startsWith("UNRESOLVED_COLUMN") =>
          val name = Option(e.getMessageParameters.get("objectName"))
            .map(_.stripPrefix("`").stripSuffix("`"))
          val fixed = name.map(substituteAlias(cur, _)).getOrElse(cur)
          if (fixed == cur) throw e
          cur = fixed; tries += 1
        // databend evaluates a scalar subquery correlated on the group
        // key directly in a grouped select list; Spark wants it inside
        // an aggregate — first() over the group is value-identical
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null && e.getCondition.startsWith(
              "SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_FUNCTION") =>
          val fixed = wrapGroupedScalarSubqueries(cur)
          if (fixed == cur) throw e
          cur = fixed; tries += 1
        // databend lets a window spec reference a select-list alias;
        // Spark rejects the lateral alias — substitute the expression
        // lateral alias consumed by a GENERATOR (select j config,
        // json_each(config)): Spark's LCA resolution leaves a
        // LateralColumnAliasReference inside Generate and dies with an
        // INTERNAL_ERROR — substitute the aliased expression textually
        case e: org.apache.spark.SparkException
            if String.valueOf(e.getMessage)
              .contains("LateralColumnAliasReference") =>
          val name = """lateralAliasReference\((\w+)\)""".r
            .findFirstMatchIn(String.valueOf(e.getMessage)).map(_.group(1))
          val fixed = name.map(substituteAlias(cur, _)).getOrElse(cur)
          if (fixed == cur) throw e
          cur = fixed; tries += 1
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null &&
               e.getCondition.endsWith("LATERAL_COLUMN_ALIAS_IN_WINDOW") =>
          val name = Option(e.getMessageParameters.get("lca"))
            .map(_.stripPrefix("`").stripSuffix("`"))
            .orElse("`(\\w+)`".r.findFirstMatchIn(
              String.valueOf(e.getMessage)).map(_.group(1)))
          val fixed = name.map(substituteAlias(cur, _)).getOrElse(cur)
          if (fixed == cur) throw e
          cur = fixed; tries += 1
      }
    }
    spark.sql(cur)
  }

  /** first occurrence of `kw` outside quotes, at ANY paren depth */
  private def indexOfKeywordAnyDepth(s: String, kw: String, from: Int): Int = {
    val upper = s.toUpperCase; val k = kw.toUpperCase
    var i = from; var q: Char = 0
    def wc(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) { if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; i += 1 }
      else if (upper.startsWith(k, i) && (i == 0 || !wc(s.charAt(i - 1))) &&
               (i + k.length >= s.length || !wc(s.charAt(i + k.length))))
        return i
      else i += 1
    }
    -1
  }

  /** end of the clause starting at `start`: the first same-depth ender
    * keyword, the `)` closing the enclosing scope, or end of input
    */
  private def clauseEnd(sql: String, start: Int, enders: Set[String]): Int = {
    var i = start; var depth = 0; var q: Char = 0
    def wc(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; i += 1 }
      else if (c == '(' || c == '[') { depth += 1; i += 1 }
      else if (c == ')' || c == ']') {
        if (depth == 0) return i else { depth -= 1; i += 1 }
      } else if (depth == 0 && c.isLetter && (i == 0 || !wc(sql.charAt(i - 1)))) {
        var j = i; while (j < sql.length && wc(sql.charAt(j))) j += 1
        if (enders.contains(sql.substring(i, j).toUpperCase)) return i
        i = j
      } else i += 1
    }
    sql.length
  }

  /** wrap bare scalar-subquery select items of GROUPed blocks in
    * first(...) — used on analysis retry only
    */
  private def wrapGroupedScalarSubqueries(sql0: String): String = {
    var sql = sql0; var pos = 0
    while (true) {
      val sel = indexOfKeywordAnyDepth(sql, "SELECT", pos)
      if (sel < 0) return sql
      val listStart = sel + "SELECT".length
      val listEnd = clauseEnd(sql, listStart, Set("FROM"))
      val blockEnd = clauseEnd(sql, listEnd,
        Set("GROUP", "UNION", "EXCEPT", "INTERSECT", "ORDER", "LIMIT"))
      val grouped = blockEnd < sql.length &&
        sql.regionMatches(true, blockEnd, "GROUP", 0, 5)
      if (grouped) {
        val items = splitTopLevel(sql.substring(listStart, listEnd), ',')
        var changed = false
        val rebuilt = items.map { it =>
          val t = it.trim
          val m = """(?is)^\((\s*SELECT\b.*)\)(\s*(?:AS\s+)?\w+)?$""".r
            .findFirstMatchIn(t)
          m match {
            case Some(mm) =>
              changed = true
              s"first((${mm.group(1)}))" + Option(mm.group(2)).getOrElse("")
            case None => it
          }
        }.mkString(", ")
        if (changed)
          return sql.substring(0, listStart) + " " + rebuilt + " " +
            sql.substring(listEnd)
      }
      pos = sel + "SELECT".length
    }
    sql
  }

  /** replace standalone references to select-list alias `name` with its
    * parenthesized expression (the defining `AS name` is left alone)
    */
  private def substituteAlias(sql: String, name: String): String = {
    var from = 0
    while (from >= 0 && from < sql.length) {
      val sel = indexOfKeywordAnyDepth(sql, "SELECT", from)
      if (sel < 0) return sql
      val listStart = sel + "SELECT".length
      val listEnd = clauseEnd(sql, listStart,
        Set("FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
            "UNION", "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY"))
      // explicit `expr AS name` or implicit `expr name` trailing alias
      val asSuffix = ("(?is)^(.*?)\\s+(?:AS\\s+)?`?" + java.util.regex.Pattern.quote(name) + "`?\\s*$").r
      val item = splitTopLevel(sql.substring(listStart, listEnd), ',')
        .collectFirst { case asSuffix(e) => e.trim }
      item match {
        case Some(exprTxt) =>
          val nameRe = ("(?i)(?<![\\w`])" + java.util.regex.Pattern.quote(name) + "(?![\\w`])").r
          val sb = new StringBuilder
          var last = 0
          for (mm <- nameRe.findAllMatchIn(sql)) {
            val before = sql.substring(0, mm.start)
            val afterAs = """(?is).*\bAS\s*$""".r.matches(before)
            // the DEFINING occurrence: a trailing alias token of a
            // select-list item (followed only by whitespace then a
            // comma or the end of the list) — keep it
            // ... and at the select list's own paren depth: a name
            // followed by ',' INSIDE a call (f(config, ...)) is a use,
            // not a definition
            val depths = parenDepths(sql)
            val defining = mm.start >= listStart && mm.end <= listEnd &&
              depths(mm.start) == depths(listStart) && {
              var j = mm.end
              while (j < listEnd && sql.charAt(j).isWhitespace) j += 1
              j >= listEnd || sql.charAt(j) == ','
            }
            sb.append(sql.substring(last, mm.start))
            if (afterAs || defining) sb.append(mm.matched)
            else sb.append(s"($exprTxt)")
            last = mm.end
          }
          sb.append(sql.substring(last))
          return sb.toString
        case None => from = listStart
      }
    }
    sql
  }

  /** resolve `t AT (POINT => v)` / `t CHANGES (...) AT (...) [END (...)]`
    * / stream references into temp views over the snapshot log
    */
  private def rewriteReads(sql0: String): String = {
    tables.keys.foreach(refreshView)
    // databend quotes identifiers with double quotes (ast/quote.rs);
    // Spark uses backticks — convert outside string literals first so
    // every later pass sees one identifier spelling
    var sql = identQuotes(sql0)
    // lambda UDFs (CREATE FUNCTION f AS (a,b) -> body) inline at call
    // sites so the body flows through every later dialect rewrite
    sql = expandLambdaFns(sql)
    // `FROM @stage` table factors read the stage's data files
    // (reference: SELECT from stage)
    if (sql.contains("@")) sql = rewriteStageReads(sql)
    // a bare VALUES query (e.g. a CTAS body `... AS VALUES (1),(2)`)
    // names its columns col0.. 0-based in the reference (Spark: col1..)
    if ("""(?is)^\s*(EXPLAIN\s+)?VALUES\s*\(.*""".r.matches(sql)) {
      splitTopLevel(
        sql.trim.stripSuffix(";")
          .replaceAll("(?is)^\\s*(EXPLAIN\\s+)?VALUES\\s*", ""), ',')
        .foreach(checkNoAggInValuesRow)
    }
    if ("""(?is)^\s*VALUES\s*\(.*""".r.matches(sql)) {
      val body = sql.trim.stripSuffix(";")
      val rowsTxt = body.replaceAll("(?is)^\\s*VALUES\\s*", "")
      val arity = splitTopLevel(rowsTxt, ',').headOption.map(_.trim) match {
        case Some(r) if r.startsWith("(") && matchParen(r, 0) == r.length - 1 =>
          splitTopLevel(r.substring(1, r.length - 1), ',').length
        case _ => -1
      }
      if (arity > 0) {
        val cols = (0 until arity).map(i => s"col$i").mkString(", ")
        sql = s"SELECT * FROM ($body) __vals($cols)"
      }
    }
    // databend's default null ordering is NULLS LAST in BOTH sort
    // directions; Spark's ASC default is NULLS FIRST — make it explicit
    sql = rewriteOrderNulls(sql)
    // GROUP BY binds select-list ALIASES before source columns
    // (03_0003_select_group_by.test: `number % 3 AS number ... GROUP
    // BY number` groups on the alias; Spark prefers the column) —
    // substitute the aliased expression for shadowing names. Runs
    // before any generated-subquery expansion so alias maps come from
    // user text only.
    if (!columnFirstGroupBy) sql = rewriteGroupByAliasFirst(sql)
    // lateral column aliases, databend bind order (see the scaladoc)
    sql = rewriteSelectAliasRefs(sql)
    // HAVING names bind select aliases before input columns
    sql = rewriteHavingAliasFirst(sql)
    // ORDER BY an expression duplicating a select item -> its ordinal
    sql = rewriteOrderByMatchingItem(sql)
    // CHANGES first (its text contains an AT clause)
    sql = ChangesRe.replaceAllIn(sql, m => {
      val t = resolveKey(m.group(1))
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
      val t = resolveKey(m.group(1))
      if (!tables.contains(t)) m.matched
      else {
        val tab = tables(t)
        val df = tab.readAt(resolvePoint(tab, m.group(2), m.group(3)))
        scala.util.matching.Regex.quoteReplacement(freshView(df))
      }
    })
    // system.tasks / system.task_history (reference system tables for
    // the task registry) -> this instance's refreshed views
    if ("""(?i)\bsystem\s*\.\s*task""".r.findFirstIn(sql).isDefined) {
      refreshTaskViews()
      sql = sql
        .replaceAll("(?i)\\bsystem\\s*\\.\\s*task_history\\b", "system_task_history")
        .replaceAll("(?i)\\bsystem\\s*\\.\\s*tasks\\b", "system_tasks")
    }
    // system.tables scoped to THIS instance's registry (the global
    // system_tables view would leak the namespaced temp-view names)
    if ("""(?i)\bsystem\s*\.\s*tables\b""".r.findFirstIn(sql).isDefined) {
      import spark.implicits._
      val df = tables.keys.toSeq.map { k =>
        val (db, n) = if (k.contains(".")) (k.split("\\.")(0), k.split("\\.")(1))
                      else ("default", k)
        (db, n, "BASE TABLE", false, "")
      }.toDF("database", "name", "table_type", "is_temporary", "comment")
      sql = sql.replaceAll("(?i)\\bsystem\\s*\\.\\s*tables\\b",
        java.util.regex.Matcher.quoteReplacement(freshView(df)))
    }
    // system.databases likewise: this instance's CREATE DATABASE
    // registry plus the reference's built-in schemas
    if ("""(?i)\bsystem\s*\.\s*databases\b""".r.findFirstIn(sql).isDefined) {
      import spark.implicits._
      val names = (databases.toSeq ++ Seq("system", "information_schema"))
        .distinct.sorted
      val df = names.map(n => (n, "default"))
        .toDF("name", "catalog")
      sql = sql.replaceAll("(?i)\\bsystem\\s*\\.\\s*databases\\b",
        java.util.regex.Matcher.quoteReplacement(freshView(df)))
    }
    // system.indexes scoped to THIS instance's index registries
    // (reference storages/system/indexes_table.rs shape)
    if ("""(?i)\bsystem\s*\.\s*indexes\b""".r.findFirstIn(sql).isDefined) {
      import spark.implicits._
      def dbOf(t: String): (String, String) =
        if (t.contains(".")) (t.split("\\.")(0), t.split("\\.")(1)) else ("default", t)
      val rows = (for ((t, defs) <- tableIndexes.toSeq; d <- defs.toSeq) yield {
        val (db, tn) = dbOf(t)
        val optsTxt = d.opts.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k='$v'" }.mkString(" ")
        (d.name, d.family, db, "", s"$tn(${d.cols.mkString(", ")})$optsTxt")
      }) ++ aggIndexes.toSeq.map { case (nm, (t, sel, _)) =>
        val (db, tn) = dbOf(t)
        (nm, "AGGREGATING", db, sel, sel)
      }
      val df = rows.toDF("name", "type", "database", "original", "definition")
      sql = sql.replaceAll("(?i)\\bsystem\\s*\\.\\s*indexes\\b",
        java.util.regex.Matcher.quoteReplacement(freshView(df)))
    }
    // system.procedures scoped to THIS instance's registry (reference
    // procedures_table shape: `p1(Int32) RETURN (Int32)` arguments)
    if ("""(?i)\bsystem\s*\.\s*procedures\b""".r.findFirstIn(sql).isDefined &&
        procMeta.nonEmpty) {
      import spark.implicits._
      val rows = procMeta.toSeq.map { case (k, (_, argTypes, ret, _)) =>
        val nm = k.split('/')(0)
        val r = dbInternalType(ret.replaceAll("(?i)\\s+NOT\\s+NULL", "").trim)
        (nm, s"$nm(${argTypes.mkString(",")}) RETURN ($r)")
      }
      val df = rows.toDF("name", "arguments")
      sql = sql.replaceAll("(?i)\\bsystem\\s*\\.\\s*procedures\\b",
        java.util.regex.Matcher.quoteReplacement(freshView(df)))
    }
    // any other system.<name> relation reference -> the registered
    // system_<name> view (operators/SystemTables registers all 43,
    // lazily on first touch)
    if ("""(?i)\bsystem\s*\.\s*[a-z_0-9]""".r.findFirstIn(sql).isDefined) {
      ensureSystemTables()
      sql = sql.replaceAll(
        "(?i)\\b(from|join)(\\s+)system\\s*\\.\\s*([a-z_0-9]+)", "$1$2system_$3")
    }
    // full-text search: match()/query()/score() over inverted-indexed
    // columns (reference query/index/04_inverted_index)
    if ("""(?i)\b(match|query)\s*\(""".r.findFirstIn(sql).isDefined)
      sql = rewriteFullText(sql)
    // databend's hidden internal columns (_row_id/_block_name/
    // _segment_name, fuse internal_columns): spliced as generated
    // expressions — the block name IS the scanned file here
    if ("""(?i)\b_(row_id|block_name|segment_name)\b""".r.findFirstIn(sql).isDefined)
      sql = substituteIdentsOutsideStrings(sql, Map(
        "_row_id" -> "monotonically_increasing_id()",
        "_block_name" -> "input_file_name()",
        "_segment_name" -> "input_file_name()"))
    // stream metadata columns change$action/change$is_update/
    // change$row_id: bare $-identifiers (databend lexer) need backticks
    // for Spark's parser
    sql = sql.replaceAll("(?i)(?<!`)\\bchange\\$(\\w+)", "`change\\$$1`")
    // range(a,b[,step]) TVF: the reference's column is named `range`
    // (Spark's is `id`); end-exclusive semantics already agree. Runs
    // BEFORE the numbers() expansion so the range() that expansion
    // emits is not re-wrapped. Paren-matched: arguments may nest
    // (range((select 3)::int, ...)).
    sql = {
      var s2 = sql
      val re = """(?i)\b(FROM|JOIN)(\s+)range\s*\(""".r
      var from = 0
      var go = true
      while (go) {
        re.findFirstMatchIn(s2.substring(from)) match {
          case Some(m) =>
            val open = from + m.end - 1
            val close = matchParen(s2, open)
            if (close < 0) go = false
            else {
              val args = s2.substring(open + 1, close)
              // Spark's range TVF wants FOLDABLE args; non-literal
              // ones (scalar subqueries, casts) take the sequence path
              val parts = splitTopLevel(args, ',').map(_.trim)
              val foldable = parts.forall(_.matches("""(?i)-?\d+[lL]?"""))
              if (parts.length < 1 || parts.length > 3 ||
                  parts.exists(_.isEmpty))
                throw new IllegalArgumentException(
                  s"1028: range() takes (end) or (start, end[, step]), got: range($args)")
              val rep =
                if (foldable)
                  s"${m.group(1)}${m.group(2)}(SELECT id AS `range` FROM range($args))"
                else if (parts.length == 1)
                  s"${m.group(1)}${m.group(2)}(SELECT explode(CASE " +
                    s"WHEN CAST((${parts(0)}) AS BIGINT) > 0 THEN " +
                    s"sequence(0L, CAST((${parts(0)}) AS BIGINT) - 1L) " +
                    s"ELSE CAST(array() AS ARRAY<BIGINT>) END) AS `range`)"
                else {
                  val step = if (parts.length >= 3) parts(2) else "1"
                  val b = s"CAST((${parts(0)}) AS BIGINT)"
                  val e = s"CAST((${parts(1)}) AS BIGINT)"
                  val st = s"CAST(($step) AS BIGINT)"
                  // empty (not sequence()'s boundary error) when the
                  // step doesn't move start toward the END-EXCLUSIVE
                  // bound — incl. start == end
                  s"${m.group(1)}${m.group(2)}(SELECT explode(CASE " +
                    s"WHEN sign($e - $b) = sign($st) THEN " +
                    s"sequence($b, $e - CAST(sign($st) AS BIGINT), $st) " +
                    s"ELSE CAST(array() AS ARRAY<BIGINT>) END) AS `range`)"
                }
              s2 = s2.substring(0, from + m.start) + rep + s2.substring(close + 1)
              from = from + m.start + rep.length
            }
          case None => go = false
        }
      }
      s2
    }
    // numbers(N)/numbers_mt(N) table functions (reference numbers TVF):
    // an unsigned 0..N-1 sequence named `number`
    sql = NumbersRe.replaceAllIn(sql, m =>
      s"(SELECT id AS number FROM range(${m.group(1)}))")
    // fuse introspection TVFs (reference table_functions/fuse_*):
    // materialize the metadata DataFrame and splice a view reference
    if (FuseTvfRe.findFirstIn(sql).isDefined) sql = rewriteFuseTvfs(sql)
    // FROM json_each(x) / json_array_elements(x) table-factor forms
    // (reference variant SRFs as TVFs): two columns (key, value) /
    // one column (value)
    sql = rewriteJsonSrfTvfs(sql)
    // current_role() / is_role_in_session('r') -> session-role
    // literals (policies resolve them at view refresh; ad-hoc
    // SELECTs here)
    sql = substituteRoleFns(sql)
    // policy_references(...) TVF (reference table_functions)
    sql = """(?i)\bpolicy_references\s*\(([^)]*)\)""".r.replaceAllIn(sql, m =>
      scala.util.matching.Regex.quoteReplacement(
        freshView(policyReferencesDf(m.group(1)))))
    // DATE_ADD(unit, n, d) / DATE_SUB(unit, n, d) — databend's
    // unit-keyword-first spelling (datetime.rs) -> the registered
    // add_/subtract_<unit>s pair (date-preserving for date inputs)
    sql = rewriteUnitDateAdd(sql)
    // EXTRACT(EPOCH FROM x) — Spark's extract has no epoch field;
    // the reference's epoch keeps fractional seconds
    sql = sql.replaceAll("(?i)\\bextract\\s*\\(\\s*epoch\\s+from\\b",
      "graft_epoch(")
    // DATEDIFF/DATE_DIFF(unit, a, b): Spark's parser binds these to
    // TimestampDiff (full-elapsed) before the registry sees them;
    // databend counts unit-boundary crossings
    sql = sql.replaceAll(
      "(?i)\\b(?:datediff|date_diff)\\s*\\(\\s*'?(year|isoyear|quarter|month|week|yearweek|day|dow|doy|isodow|hour|minute|second|epoch|millisecond|microsecond|millennium|century|decade)'?\\s*,",
      "graft_date_diff('$1',")
    // other extract fields Spark lacks -> the registered functions
    // (reference ast IntervalKind tier)
    for ((field, fn) <- Seq("yearweek" -> "yearweek",
        "millennium" -> "millennium", "century" -> "century",
        "decade" -> "decade", "isodow" -> "to_day_of_week",
        "isoyear" -> "to_iso_year", "dow" -> "graft_dow"))
      sql = sql.replaceAll(s"(?i)\\bextract\\s*\\(\\s*$field\\s+from\\b",
        fn + "(")
    // parameterized aggregate calls `quantile[_cont|_disc](p)(x)`
    // (databend's two-stage call form) -> flat (x, p) spellings
    sql = rewriteParamAggCall(sql)
    // multi-argument GROUPING(a, b, ...) is the reference's bitmask
    // form == Spark's grouping_id (grouping_sets suite vectors agree
    // bit-for-bit)
    sql = {
      // expanded to a sum of single-column groupings (NOT grouping_id:
      // Spark requires grouping_id's argument order to equal the
      // grouping column order; the reference's bitmask takes any order)
      var s2 = sql; var p = 0
      val re = """(?i)\bgrouping\s*\(""".r
      var cont = true
      while (cont) {
        re.findAllMatchIn(s2).find(_.start >= p) match {
          case None => cont = false
          case Some(m) =>
            val open = m.end - 1
            val close = matchParen(s2, open)
            val args = splitTopLevel(s2.substring(open + 1, close), ',').map(_.trim)
            if (args.length > 1) {
              val expanded = args.zipWithIndex.map { case (a, i) =>
                val w = 1L << (args.length - 1 - i)
                if (w == 1L) s"grouping($a)" else s"grouping($a) * $w"
              }.mkString("(", " + ", ")")
              s2 = s2.substring(0, m.start) + expanded + s2.substring(close + 1)
              p = m.start + expanded.length
            } else p = m.start + 9
        }
      }
      s2
    }
    // json_array_agg/json_object_agg used as WINDOW functions: the
    // registered forms are to_json over an aggregate, and Spark would
    // attach OVER to the outer (non-aggregate) to_json — push the
    // window onto the aggregate itself
    sql = rewriteWindowedJsonAgg(sql)
    // generate_series(a, b[, step]) as a FROM/JOIN/LATERAL table
    // factor (reference table function, inclusive end) ->
    // explode(sequence) in a (lateral) subquery
    sql = rewriteGenSeriesTvf(sql)
    // unnest(arr) as a FROM-clause table factor: the scalar registry's
    // unnest->explode alias doesn't cover TVF position
    sql = sql.replaceAll("(?i)\\b(FROM|JOIN)(\\s+)unnest\\s*\\(", "$1$2explode(")
    // parenthesized form `FROM (unnest(expr))` -> derived-table explode
    sql = {
      var s2 = sql
      var changed = true
      while (changed) {
        changed = false
        """(?i)\(\s*unnest\s*\(""".r.findAllMatchIn(s2).toSeq.reverseIterator
          .foreach { m =>
            if (!changed) {
              val outer = m.start
              val inner = m.end - 1
              val innerClose = matchParen(s2, inner)
              val outerClose = matchParen(s2, outer)
              if (innerClose > 0 && outerClose > innerClose &&
                  s2.substring(innerClose + 1, outerClose).trim.isEmpty) {
                val arg = s2.substring(inner + 1, innerClose)
                s2 = s2.substring(0, outer) +
                  s"(SELECT explode($arg) AS unnest)" +
                  s2.substring(outerClose + 1)
                changed = true
              }
            }
          }
      }
      s2
    }
    // databend [..] array literals -> array(..) (subscripts untouched)
    sql = arrayLiterals(sql)
    // databend {k:v, ...} map literals -> map(k, v, ...)
    sql = mapLiterals(sql)
    // multiple select-position unnest() items zip in lockstep
    sql = rewriteZipUnnest(sql)
    // MySQL/databend infix XOR (ast expr.rs BinaryOperator::Xor) —
    // Spark's parser has no XOR keyword; lower `a XOR b` onto the
    // registered xor() function (quote/paren-aware primary operands)
    sql = rewriteInfixXor(sql)
    // `a SOUNDS LIKE b` (MySQL): soundex equality
    sql = """(?is)\bSOUNDS\s+LIKE\b""".r.replaceAllIn(sql, "SOUNDS_LIKE")
    sql = rewriteInfixKw(sql, "SOUNDS_LIKE", cmpLevel = false,
      (l, r, _) => s"(soundex($l) = soundex($r))")
    // postgres interval '... ago' suffix: negated interval
    sql = """(?i)\bINTERVAL\s+'([^']*?)\s+ago'""".r.replaceAllIn(sql,
      m => scala.util.matching.Regex.quoteReplacement(
        s"(- INTERVAL '${m.group(1)}')"))
    // `WITH x AS MATERIALIZED (...)`: accept and inline (Catalyst CSE
    // + the cache layer stand in for the reference's materialization)
    sql = sql.replaceAll("(?is)\\bAS\\s+MATERIALIZED\\s*\\(", "AS (")
    // databend split() takes a LITERAL separator (string.rs) — route
    // the SQL spelling onto split_literal; Spark's regex split stays
    // for the DataFrame API. Quote-aware keyword scan.
    if (sql.toLowerCase.contains("split")) {
      var from = 0
      while (from < sql.length) {
        val at = indexOfKeywordAnyDepth(sql, "SPLIT", from)
        if (at < 0) from = sql.length
        else {
          var k = at + "SPLIT".length
          while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
          if (k < sql.length && sql.charAt(k) == '(') {
            sql = sql.substring(0, at) + "split_literal" + sql.substring(at + 5)
            from = at + "split_literal".length
          } else from = at + 5
        }
      }
    }
    // databend COLUMNS() select items (ast: ColumnsExpr) — star-exclude,
    // name-regex and name-lambda forms. BEFORE the bare star-exclude
    // rewrites, which would otherwise rewrite inside COLUMNS(...)
    sql = rewriteColumnsFn(sql)
    // databend `SELECT * EXCLUDE (c1, ...)` -> Spark's `* EXCEPT (...)`
    sql = sql.replaceAll("(?i)\\*\\s+EXCLUDE\\s*\\(", "* EXCEPT (")
    // paren-less single-column form: `* EXCLUDE c1`
    sql = sql.replaceAll("(?i)\\*\\s+EXCLUDE\\s+(`[^`]+`|\\w+)", "* EXCEPT ($1)")
    // databend's zero-arg count() (aggregator.rs) -> count(*)
    sql = sql.replaceAll("(?i)\\bcount\\s*\\(\\s*\\)", "count(*)")
    // length-less VARCHAR casts (databend treats VARCHAR as unbounded)
    sql = sql.replaceAll("(?i)\\b(as\\s+)varchar\\b(?!\\s*\\()", "$1string")
      .replaceAll("(?i)::varchar\\b(?!\\s*\\()", "::string")
    // MySQL-style `<int type> UNSIGNED` cast spellings in query
    // position widen like the uintN family (SURVEY §1.2)
    for ((from, to) <- Seq("bigint" -> "decimal(20,0)", "int" -> "bigint",
        "integer" -> "bigint", "smallint" -> "int", "tinyint" -> "smallint")) {
      sql = sql.replaceAll(s"(?i)::$from\\s+unsigned\\b", s"::$to")
        .replaceAll(s"(?i)\\b(as\\s+)$from\\s+unsigned\\b", s"$$1$to")
    }
    // `expr::TIMESTAMP_TZ` — no native Spark type; route through the
    // to_timestamp_tz parser (variant operands unquote via ::string)
    if (sql.toLowerCase.contains("::timestamp_tz")) {
      var changed = true
      while (changed) {
        changed = false
        val m = """(?i)::\s*timestamp_tz\b""".r.findFirstMatchIn(sql)
        m.foreach { mm =>
          val lhsStart = arrowLhsStart(sql, mm.start)
          if (lhsStart >= 0 && lhsStart < mm.start) {
            val lhs = sql.substring(lhsStart, mm.start).trim
            sql = sql.substring(0, lhsStart) +
              s"""to_timestamp_tz(trim(both '"' from cast($lhs as string)))""" +
              sql.substring(mm.end)
            changed = true
          }
        }
      }
    }
    // `Nullable(T)` in cast position is just T (databend nullability
    // wrapper; every Spark type is nullable)
    if (sql.toLowerCase.contains("nullable")) {
      var n = sql
      var go = true
      while (go) { // innermost-first for Nullable(Array(Int32))
        val n2 = n.replaceAll(
          "(?i)\\b(as\\s+|::\\s*)nullable\\s*\\(\\s*([^()]*?)\\s*\\)", "$1$2")
        go = n2 != n; n = n2
      }
      sql = n
    }
    // databend sized-int / float cast spellings in query position
    // (src/query/ast types; unsigned widens per SURVEY §1.2). `::` may
    // carry whitespace before the type name (`x :: Int16`).
    for ((from, to) <- CastSpellings)
      sql = sql.replaceAll(s"(?i)::(\\s*)$from\\b", s"::$$1$to")
        .replaceAll(s"(?i)\\b(as\\s+)$from\\b", s"$$1$to")
    // MySQL CAST(x AS SIGNED|UNSIGNED [INTEGER]) — cast context only
    sql = rewriteSignedCasts(sql)
    // `CAST(x AS <type> [NOT] NULL)` — databend nullability markers on
    // the cast target type; Spark's grammar has no slot for them
    sql = sql.replaceAll(
      "(?i)\\b(AS\\s+\\w+(\\s*\\(\\s*\\d+(\\s*,\\s*\\d+)?\\s*\\))?)\\s+(NOT\\s+)?NULL\\s*\\)",
      "$1)")
    // `LIKE p ESCAPE ''` — an empty escape string means NO escape
    // char (the reference accepts it); Spark rejects at parse time
    sql = sql.replaceAll("(?i)\\s+ESCAPE\\s+''", "")
    // `x LIKE ANY|SOME|ALL (SELECT ...)` — pattern SUBQUERY form
    // (issues/issue_19562): EXISTS over the correlated LIKE
    sql = {
      var s2 = sql
      val re = """(?i)\bLIKE\s+(ANY|SOME|ALL)\s*\(\s*SELECT\b""".r
      var guard = 0
      var m0 = re.findFirstMatchIn(s2)
      while (m0.isDefined && guard < 20) {
        guard += 1
        val m = m0.get
        val open = s2.indexOf('(', m.start)
        val close = matchParen(s2, open)
        val lhsStart = arrowLhsStart(s2, m.start)
        if (lhsStart < 0 || lhsStart >= m.start) m0 = None
        else {
          val lhs = s2.substring(lhsStart, m.start).trim
          val sub = s2.substring(open + 1, close)
          val all = m.group(1).equalsIgnoreCase("ALL")
          val rep =
            if (all) s"NOT EXISTS (SELECT 1 FROM ($sub) __lp(__p) WHERE NOT ($lhs LIKE __p))"
            else s"EXISTS (SELECT 1 FROM ($sub) __lp(__p) WHERE $lhs LIKE __p)"
          s2 = s2.substring(0, lhsStart) + rep + s2.substring(close + 1)
          m0 = re.findFirstMatchIn(s2)
        }
      }
      s2
    }
    // ::vector(N) — fixed-dim f32 embedding cast (vector_index suite)
    sql = sql.replaceAll("(?i)::\\s*vector\\s*\\(\\s*\\d+\\s*\\)", "::array<float>")
    // HAVING without GROUP BY filters like WHERE when it references no
    // aggregate (databend/MySQL extension; query/having.test:1)
    sql = rewriteBareHaving(sql)
    // DATE_TRUNC(unit, x) with a bare unit keyword (databend grammar;
    // Spark takes a string literal)
    sql = sql.replaceAll(
      "(?i)\\bdate_trunc\\s*\\(\\s*(year|quarter|month|week|day|hour|minute|second)\\s*,",
      "date_trunc('$1',")
    // TRUNC(x, unit) with a bare unit keyword (same grammar; the unit
    // is the LAST argument, so quote it in place)
    sql = rewriteTruncBareUnit(sql)
    // CURRENT_TIME: Spark 4.1 parses it as its native TIME type before
    // the registry is consulted; the reference renders VARCHAR
    // (types.rs has no TIME) — reroute to the graft builder
    sql = sql.replaceAll("(?i)\\bcurrent_time\\s*\\(", "graft_current_time(")
      .replaceAll("(?i)\\bcurrent_time\\b", "graft_current_time()")
    // ASOF [LEFT] JOIN as SQL text (reference JoinType::Asof/LeftAsof,
    // plans/join.rs:71-75) -> correlated LATERAL nearest-match
    sql = rewriteAsofJoin(sql)
    // JOIN binds tighter than the comma-join in databend/MySQL
    // (`FROM a, b RIGHT JOIN c` = a x (b JOIN c)); Spark folds
    // left-associatively — wrap comma segments containing a JOIN
    sql = rewriteCommaJoinPrecedence(sql)
    // IN (subquery) used as a VALUE (select list) loses its ternary
    // NULL in Spark's existence join; reroute through the quantified
    // forms (IN ≡ = ANY, NOT IN ≡ != ALL) expanded below
    sql = rewriteProjInSubquery(sql)
    // quantified comparisons `x <op> ALL|ANY|SOME (subquery)` (databend
    // subquery.rs mark-join lowering; Spark lacks the syntax)
    sql = rewriteQuantified(sql)
    // subqueries inside JOIN ... ON conditions (databend decorrelates
    // them; Spark rejects them outright)
    sql = rewriteJoinOnSubquery(sql)
    // MySQL `LIMIT offset, count` spelling (databend grammar
    // ast/query.rs limit; crdb/limit.test) -> LIMIT count OFFSET offset
    sql = sql.replaceAll("(?i)\\bLIMIT\\s+(\\d+)\\s*,\\s*(\\d+)\\b",
      "LIMIT $2 OFFSET $1")
    // crdb index-hint `table@index` (databend parses and ignores it —
    // crdb/select.test xyzw@foo); quote-aware strip
    if (sql.indexOf('@') >= 0) sql = stripIndexHints(sql)
    // duplicate names in a USING list collapse (reference binder
    // dedups; crdb/join.test USING(x, x)); Spark would join twice
    sql = """(?i)\bUSING\s*\(([^()]*)\)""".r.replaceAllIn(sql, m => {
      val cols = splitTopLevel(m.group(1), ',').map(_.trim)
      val dedup = cols.foldLeft(Vector.empty[String])((acc, c) =>
        if (acc.exists(_.equalsIgnoreCase(c))) acc else acc :+ c)
      scala.util.matching.Regex.quoteReplacement(
        s"USING (${dedup.mkString(", ")})")
    })
    // `x = NOT TRUE/FALSE` (databend parses NOT as a tight unary on a
    // boolean literal; Spark's parser rejects it — monetdb boolean_not)
    sql = sql.replaceAll("(?i)(=|<>|!=)\\s*NOT\\s+(TRUE|FALSE)\\b", "$1 (NOT $2)")
    // bare NULL in boolean positions (databend accepts; Spark rejects
    // VOID filters/conditions — crdb/select.test)
    sql = sql.replaceAll("(?i)\\bWHERE\\s+NULL\\b(?!\\s*[=<>!+\\-*/|])",
      "WHERE CAST(NULL AS BOOLEAN)")
    sql = sql.replaceAll("(?i)\\bWHEN\\s+NULL\\s+THEN\\b",
      "WHEN CAST(NULL AS BOOLEAN) THEN")
    // LIMIT literals beyond Int.MaxValue (databend accepts u64; same
    // visible result — everything is returned)
    sql = """(?i)\bLIMIT\s+(\d{10,})""".r.replaceAllIn(sql, m =>
      if (BigInt(m.group(1)) > Int.MaxValue) "LIMIT 2147483647" else m.matched)
    // OFFSET literals beyond Int.MaxValue (databend accepts u64; the
    // observable result is identical — everything is skipped)
    sql = BigOffsetRe.replaceAllIn(sql, m =>
      if (BigInt(m.group(1)) > Int.MaxValue) "OFFSET 2147483646"
      else m.matched)
    // correlated `LATERAL (VALUES ...)` -> correlated UNION ALL
    // lateral subquery (Spark can't evaluate outer refs in inline
    // tables, but handles them fine in lateral subqueries)
    sql = rewriteLateralValues(sql)
    // a (VALUES ...) derived table without an explicit column list:
    // the reference names the columns col0, col1, ... (0-based);
    // Spark names them col1, col2, ...
    sql = rewriteValuesColNames(sql)
    // FROM-clause `LATERAL FLATTEN(...)`/`LATERAL unnest(...)` table
    // factors -> LATERAL VIEW over the variant generators
    sql = rewriteStandaloneFlatten(sql)
    sql = rewriteLateralTvf(sql)
    // RIGHT SEMI/ANTI spellings (databend join types; Spark only has
    // the LEFT forms) -> flip the two factors
    sql = rewriteRightSemiAnti(sql)
    // NATURAL SEMI/ANTI JOIN (Spark rejects natural for semi/anti) ->
    // explicit USING over the common columns (duckdb semianti suite)
    sql = rewriteNaturalSemiAnti(sql)
    // databend variant colon paths (x:a.b[0]) -> try_variant_get
    sql = rewriteColonPaths(sql)
    // MySQL-style integer truthiness in filters (`WHERE c1`,
    // `WHERE NOT c1` on an int column — databend coerces; Spark
    // rejects a non-boolean filter): rewrite the bare-column form
    sql = rewriteIntFilter(sql)
    // subscripts: databend arrays are 1-BASED (array.rs get; index 0
    // is NULL) and map[k] looks keys up — both are try_element_at in
    // Spark, whose native [] is 0-based on arrays. Variant columns
    // keep jsonb's 0-based path access.
    sql = rewriteSubscripts(sql)
    // WITHIN GROUP ordered-set aggregates (listagg & friends) — Spark
    // lacks the syntax, expand to sorted-collect expression trees
    sql = rewriteWithinGroup(sql)
    // named windows: inline + normalize (inheritance, forward refs,
    // rank frames, window refs in ORDER BY)
    sql = rewriteWindows(sql)
    // QUALIFY (window-predicate filter, databend/Snowflake grammar)
    sql = rewriteQualify(sql)
    // window functions directly in ORDER BY (databend allows, Spark
    // rejects) — hoist them into the select list of a wrapper
    sql = rewriteWindowInOrderBy(sql)
    // dynamic PIVOT (IN (subquery) / IN (ANY ...)) -> literal IN list
    sql = rewritePivotDynamic(sql)
    // UNPIVOT string-literal aliases + databend lowercase bare names
    sql = rewriteUnpivotAliases(sql)
    // stream references: register each stream mentioned as a view
    val refs = streams.keys.filter(n => wordRe(n).findFirstIn(sql).isDefined).toSeq
    refs.foreach(n => streams(n).read().createOrReplaceTempView(viewPrefix + n))
    lastStreamRefs = refs
    // names defined by CTE (or WINDOW) clauses in this statement
    // shadow same-named tables for bare references — do not rewrite
    // them onto table views (query/cte/name_conflict.test)
    val cteDefined = CteDefRe.findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet
    prefixRefs(qualifiedRefs(sql), refs.toSet, cteDefined)
  }

  private val CteDefRe =
    ("(?i)" + "\\b" + """(\w+)\s*(?:\(\s*[\w`",\s]*\))?\s+AS\s*\(""").r

  private val UnitDateAddRe =
    """(?i)\b(date_add|date_sub|dateadd|datesub)\s*\(\s*'?(year|quarter|month|week|day|hour|minute|second)'?\s*,""".r

  private def rewriteUnitDateAdd(sql: String): String = {
    val m0 = UnitDateAddRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = sql.indexOf('(', m.start)
    val close = matchParen(sql, open)
    val args = splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim)
    if (args.length != 3) // 2-arg date_add (a column named like a unit)
      return sql.substring(0, m.end) + rewriteUnitDateAdd(sql.substring(m.end))
    val sub = m.group(1).toLowerCase.contains("sub")
    val fn = if (sub) "subtract" else "add"
    val unit = m.group(2).toLowerCase
    // DATEADD(month, ...) does NOT end-of-month-snap (only the
    // add_months/subtract_months spellings do — datetime.rs flags)
    val target =
      if (unit == "month") { if (sub) "date_subtract_months" else "date_add_months" }
      else s"${fn}_${unit}s"
    sql.substring(0, m.start) +
      s"$target(${rewriteUnitDateAdd(args(2))}, ${rewriteUnitDateAdd(args(1))})" +
      rewriteUnitDateAdd(sql.substring(close + 1))
  }

  private val BigOffsetRe = """(?i)\bOFFSET\s+(\d{10,})""".r

  private val QuantifiedRe =
    """(<=|>=|!=|<>|<|>|=)\s*(?i:(ALL|ANY|SOME))\s*\(""".r

  /** `x <op> ALL (q)` / `x <op> ANY|SOME (q)` -> EXISTS forms with the
    * reference's mark-join truth table as observed in WHERE context
    * (UNKNOWN filters like FALSE): ALL holds when no row makes the
    * comparison false-or-unknown; ANY holds when some row makes it
    * true. The subquery's single output column is resolved by analysis.
    */
  private def rewriteQuantified(sql: String): String = {
    val m0 = QuantifiedRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = m.end - 1
    val inner = sql.substring(open + 1, matchParen(sql, open))
    if (!inner.trim.toUpperCase.startsWith("SELECT") &&
        !inner.trim.toUpperCase.startsWith("WITH"))
      return sql // ANY(...) the aggregate, or an IN-list — leave alone
    val close = matchParen(sql, open)
    // walk back over the left operand: an identifier path or a
    // parenthesized/call/literal primary ending just before the operator
    def scanPrimaryBack(e: Int): Int = {
      var s0 = e
      if (e >= 0 && sql.charAt(e) == '\'') {
        // string-literal operand: scan back to its opening quote
        s0 = e - 1
        while (s0 >= 0 && sql.charAt(s0) != '\'') s0 -= 1
        s0 -= 1
      } else if (e >= 0 && (sql.charAt(e) == ')' || sql.charAt(e) == '`')) {
        val openCh = if (sql.charAt(e) == ')') '(' else '`'
        var depth = 0
        while (s0 >= 0 && { val c = sql.charAt(s0)
          if (c == sql.charAt(e)) depth += 1 else if (c == openCh) depth -= 1
          depth != 0 }) s0 -= 1
        s0 -= 1
        // a call: include the function name / qualifier
        while (s0 >= 0 && (sql.charAt(s0).isLetterOrDigit ||
               "_.$".contains(sql.charAt(s0)))) s0 -= 1
      } else
        while (s0 >= 0 && (sql.charAt(s0).isLetterOrDigit ||
               "_.$".contains(sql.charAt(s0)))) s0 -= 1
      s0
    }
    val lhsStops = Set("WHERE", "AND", "OR", "NOT", "WHEN", "THEN", "ELSE",
      "CASE", "SELECT", "ON", "HAVING", "SET", "BY", "IN", "LIKE", "BETWEEN",
      "DISTINCT", "ALL", "AS", "JOIN", "FROM", "RETURN", "END", "IS")
    var e = m.start - 1
    while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
    val lhsEnd = e + 1
    var s0 = scanPrimaryBack(e)
    // extend across binary operators so a compound lhs like
    // `a + 1 > ANY (...)` captures `a + 1`, not just `1`
    var extending = true
    while (extending) {
      var p = s0
      while (p >= 0 && sql.charAt(p).isWhitespace) p -= 1
      val isConcat = p >= 1 && sql.charAt(p) == '|' && sql.charAt(p - 1) == '|'
      val isBinOp = p >= 0 && "+-*/%".contains(sql.charAt(p))
      if (isConcat || isBinOp) {
        var q = (if (isConcat) p - 2 else p - 1)
        while (q >= 0 && sql.charAt(q).isWhitespace) q -= 1
        val s1 = scanPrimaryBack(q)
        val tok = sql.substring(s1 + 1, q + 1).trim.toUpperCase
        if (q < 0 || "(,".contains(sql.charAt(q)) || lhsStops.contains(tok)) {
          // nothing usable before the operator: it's a unary sign
          // (include it for +/-) or a clause boundary — stop here
          if (isBinOp && (sql.charAt(p) == '-' || sql.charAt(p) == '+')) s0 = p - 1
          extending = false
        } else s0 = s1
      } else extending = false
    }
    val lhs = sql.substring(s0 + 1, lhsEnd)
    require(lhs.nonEmpty, s"cannot locate left operand of quantified comparison")
    // normalize the subquery's single output column to a known name
    // textually — the subquery may be correlated, so it can't be
    // analyzed standalone
    val selIdx = indexOfKeyword(inner, "SELECT")
    require(selIdx >= 0, s"quantified subquery has no SELECT: $inner")
    val listStart = selIdx + "SELECT".length
    val listEnd = clauseEnd(inner, listStart,
      Set("FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
          "UNION", "EXCEPT", "INTERSECT"))
    val items = splitTopLevel(inner.substring(listStart, listEnd), ',')
    require(items.length == 1,
      s"1065: quantified subquery must return one column, got ${items.length}")
    var item = items.head.trim
    val distinct = item.toUpperCase.startsWith("DISTINCT ")
    if (distinct) item = item.substring("DISTINCT ".length).trim
    item = item.replaceAll("(?is)\\s+AS\\s+[`\\w]+$", "")
    val inner2 = inner.substring(0, listStart) +
      (if (distinct) " DISTINCT" else "") + s" ($item) AS __qv " +
      inner.substring(listEnd)
    val op = m.group(1)
    val quant = m.group(2).toUpperCase
    val cmpTxt = s"(($lhs) $op __qq.__qv)"
    // full three-valued truth table (the reference's mark join yields
    // TRUE/FALSE/NULL and suites observe it with IS NULL —
    // query/subquery.test): ANY = TRUE if any true, NULL if none true
    // but some unknown, else FALSE; ALL dually; empty set -> FALSE/TRUE
    val repl =
      if (quant == "ALL")
        s"(CASE WHEN EXISTS (SELECT 1 FROM ($inner2) __qq WHERE NOT $cmpTxt) THEN FALSE " +
        s"WHEN EXISTS (SELECT 1 FROM ($inner2) __qq WHERE ($cmpTxt) IS NULL) THEN CAST(NULL AS BOOLEAN) " +
        s"ELSE TRUE END)"
      else
        s"(CASE WHEN EXISTS (SELECT 1 FROM ($inner2) __qq WHERE $cmpTxt) THEN TRUE " +
        s"WHEN EXISTS (SELECT 1 FROM ($inner2) __qq WHERE ($cmpTxt) IS NULL) THEN CAST(NULL AS BOOLEAN) " +
        s"ELSE FALSE END)"
    sql.substring(0, s0 + 1) + repl + rewriteQuantified(sql.substring(close + 1))
  }

  private val FromEnders = Set(
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION",
    "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "SETTINGS", "SELECT")

  private val AsofJoinRe = """(?is)\bASOF\s+(LEFT\s+|RIGHT\s+|FULL\s+)?JOIN\b""".r

  /** `l ASOF [LEFT] JOIN r [alias] ON conds` (reference
    * JoinType::Asof/LeftAsof, plans/join.rs:71-75; duckdb asof suite)
    * — the single inequality term picks, per left row, the NEAREST
    * right row (predecessor for >=/>, successor for <=/<) among those
    * satisfying the equality terms. Rewritten to a correlated LATERAL
    * `ORDER BY <range key> LIMIT 1` subquery: Catalyst decorrelates it
    * to a window-ranked join, the same plan family the reference's
    * asof lowering produces. RIGHT/FULL ASOF stay library-level
    * (operators/AsofJoin) — the text form raises the reference's
    * unsupported error.
    */
  private def rewriteAsofJoin(sql0: String): String = {
    val m0 = AsofJoinRe.findFirstMatchIn(sql0)
    if (m0.isEmpty) return sql0
    val sql = sql0
    val m = m0.get
    val kind = Option(m.group(1)).map(_.trim.toUpperCase).getOrElse("INNER")
    require(kind == "INNER" || kind == "LEFT",
      s"1065: ASOF $kind JOIN is not supported through SQL — use graft.operators.AsofJoin")
    def skipWs(k0: Int): Int = {
      var k = k0; while (k < sql.length && sql.charAt(k).isWhitespace) k += 1; k
    }
    // right factor: (subquery) or dotted name, optional range-style
    // call args, optional [AS] alias, optional alias column list
    var i = skipWs(m.end)
    val rStart = i
    if (sql.charAt(i) == '(') i = matchParen(sql, i) + 1
    else {
      while (i < sql.length && (sql.charAt(i).isLetterOrDigit ||
             "_.$".contains(sql.charAt(i)))) i += 1
      val k = skipWs(i)
      if (k < sql.length && sql.charAt(k) == '(') i = matchParen(sql, k) + 1 // TVF args
    }
    val rFactor = sql.substring(rStart, i)
    var j = skipWs(i)
    var alias = ""
    """(?is)^(?:AS\s+)?([A-Za-z_]\w*)""".r.findPrefixMatchOf(sql.substring(j))
      .foreach { am =>
        if (!Set("ON", "USING").contains(am.group(1).toUpperCase)) {
          alias = am.group(1); j += am.end
        }
      }
    var aliasCols = ""
    val j2 = skipWs(j)
    if (alias.nonEmpty && j2 < sql.length && sql.charAt(j2) == '(') {
      val c2 = matchParen(sql, j2); aliasCols = sql.substring(j2, c2 + 1); j = c2 + 1
    }
    j = skipWs(j)
    // `USING (k..., range)` (duckdb spelling the reference also runs):
    // the last column is the range key (nearest predecessor), the rest
    // are equalities — convert to the ON form against the left factor's
    // alias (the word just before ASOF)
    var usingCond: Option[String] = None
    if (sql.regionMatches(true, j, "USING", 0, 5)) {
      val open = skipWs(j + 5)
      require(open < sql.length && sql.charAt(open) == '(',
        "1065: ASOF JOIN USING needs a column list")
      val close = matchParen(sql, open)
      val cols = splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim)
      require(cols.nonEmpty, "1065: empty ASOF USING list")
      var e = m.start - 1
      while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
      var s0 = e
      while (s0 >= 0 && (sql.charAt(s0).isLetterOrDigit || sql.charAt(s0) == '_')) s0 -= 1
      val leftQual = sql.substring(s0 + 1, e + 1)
      require(leftQual.nonEmpty, "1065: ASOF USING needs a named left factor")
      val rq = if (alias.nonEmpty) alias else rFactor.split('.').last
      val equis = cols.dropRight(1).map(c => s"$leftQual.$c = $rq.$c")
      val range = s"$leftQual.${cols.last} >= $rq.${cols.last}"
      usingCond = Some((equis :+ range).mkString(" AND "))
      j = close + 1
      j = skipWs(j)
    }
    val (cond, condEnd) = usingCond match {
      case Some(c) => (c, j)
      case None =>
        require(sql.regionMatches(true, j, "ON", 0, 2),
          s"1065: ASOF JOIN requires an ON condition")
        val condStart = j + 2
        val ce = clauseEnd(sql, condStart, FromEnders ++ Set(
          "JOIN", "LEFT", "RIGHT", "INNER", "FULL", "CROSS", "NATURAL", "ASOF"))
        (sql.substring(condStart, ce).trim, ce)
    }
    // classify the AND terms: exactly one inequality (the range key)
    val terms = splitTopLevelKeyword(cond, "AND")
    val ineqRe = """(?s)^(.*?)(>=|<=|(?<![<>=!])>(?!=)|(?<![<>=!])<(?!=))(.*)$""".r
    val ineqs = terms.flatMap(t => ineqRe.findFirstMatchIn(t).map(t -> _))
    require(ineqs.length == 1,
      s"1065: ASOF JOIN needs exactly one inequality condition, got ${ineqs.length}")
    val (ineqTerm, im) = ineqs.head
    val rName = if (alias.nonEmpty) alias
                else rFactor.split('.').last.takeWhile(c => c.isLetterOrDigit || c == '_')
    def refsRight(e: String): Boolean =
      ("(?i)\\b" + java.util.regex.Pattern.quote(rName) + "\\s*\\.").r
        .findFirstIn(e).isDefined
    val (lhs, op, rhs) = (im.group(1).trim, im.group(2), im.group(3).trim)
    val (rightExpr, effOp) =
      if (refsRight(rhs) && !refsRight(lhs)) (rhs, op)
      else if (refsRight(lhs) && !refsRight(rhs))
        (lhs, op match { case ">=" => "<="; case "<=" => ">="; case ">" => "<"; case "<" => ">" })
      else throw new IllegalArgumentException(
        s"1065: cannot orient ASOF inequality `$ineqTerm` against `$rName`")
    // nearest match via a correlated max_by/min_by aggregate — NOT a
    // correlated ORDER BY ... LIMIT 1: Spark's decorrelation of a
    // lateral limit drops equality-correlated columns from the window
    // partition when the outer key is a computed expression (observed:
    // duckdb asof_join_miss "missing right side bin" returns a third
    // of the rows), while the scalar-aggregate path decorrelates
    // correctly
    val pick = if (effOp == ">=" || effOp == ">") "max_by" else "min_by"
    val innerAlias = if (alias.nonEmpty) s"$alias$aliasCols" else rName
    val lateral =
      s"(SELECT __best.* FROM (SELECT $pick(struct($rName.*), $rightExpr) AS __best " +
        s"FROM $rFactor $innerAlias WHERE $cond) WHERE __best IS NOT NULL) " +
        (if (alias.nonEmpty) alias else rName)
    val joined =
      if (kind == "LEFT") s" LEFT JOIN LATERAL $lateral ON TRUE "
      else s" JOIN LATERAL $lateral ON TRUE "
    rewriteAsofJoin(sql.substring(0, m.start) + joined + sql.substring(condEnd))
  }

  /** split on a top-level keyword (paren/quote aware) */
  private def splitTopLevelKeyword(s: String, kw: String): Seq[String] = {
    val parts = mutable.Buffer[String]()
    var start = 0
    var idx = indexOfKeyword(s, kw)
    while (idx >= 0) {
      parts += s.substring(start, idx)
      start = idx + kw.length
      idx = indexOfKeyword(s, kw, start)
    }
    parts += s.substring(start)
    parts.toSeq
  }

  private val NaturalSemiAntiRe =
    """(?is)\b([A-Za-z_]\w*)\s+NATURAL\s+(?:LEFT\s+)?(SEMI|ANTI)\s+JOIN\s*""".r

  /** `a NATURAL [LEFT] SEMI|ANTI JOIN b` -> `a LEFT SEMI|ANTI JOIN b
    * USING (<common columns>)` (Spark's NATURAL doesn't cover
    * semi/anti; the reference binds them like any natural join). The
    * right factor may be a named table or a parenthesized subquery
    * with an alias.
    */
  private def rewriteNaturalSemiAnti(sql: String): String = {
    val m0 = NaturalSemiAntiRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val (l, kind) = (m.group(1), m.group(2).toUpperCase)
    try {
      val lc = schemaOf(l).fieldNames.map(_.toLowerCase)
      var i = m.end
      val (rText, rCols) =
        if (sql.charAt(i) == '(') {
          val close = matchParen(sql, i)
          val sub = sql.substring(i + 1, close)
          var j = close + 1
          while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
          val am = """(?is)^(?:AS\s+)?([A-Za-z_]\w*)""".r
            .findPrefixMatchOf(sql.substring(j))
            .getOrElse(throw new IllegalArgumentException("no alias"))
          val alias = am.group(1)
          i = j + am.end
          (s"(${sub}) $alias",
            spark.sql(rewriteReads(sub)).columns.map(_.toLowerCase).toSet)
        } else {
          val s0 = i
          while (i < sql.length && (sql.charAt(i).isLetterOrDigit ||
                 "_.$".contains(sql.charAt(i)))) i += 1
          val name = sql.substring(s0, i)
          (name, schemaOf(name).fieldNames.map(_.toLowerCase).toSet)
        }
      val common = lc.filter(rCols)
      if (common.isEmpty) return sql
      rewriteNaturalSemiAnti(
        sql.substring(0, m.start) +
          s" $l LEFT $kind JOIN $rText USING (${common.mkString(", ")}) " +
          sql.substring(i))
    } catch { case _: Exception => sql }
  }

  private def rewriteCommaJoinPrecedence(sql0: String): String = {
    var sql = sql0; var pos = 0
    while (true) {
      val f = indexOfKeywordAnyDepth(sql, "FROM", pos)
      if (f < 0) return sql
      val start = f + "FROM".length
      val end = clauseEnd(sql, start, FromEnders)
      val clause = sql.substring(start, end)
      if (indexOfTopLevel(clause, ',') >= 0 &&
          indexOfKeyword(clause, "JOIN") >= 0) {
        val segs = splitTopLevel(clause, ',')
        val rebuilt = segs.zipWithIndex.map { case (seg, k) =>
          if (k > 0 && indexOfKeyword(seg, "JOIN") >= 0 &&
              !seg.toUpperCase.startsWith("LATERAL")) s"($seg)"
          else seg
        }.mkString(", ")
        sql = sql.substring(0, start) + " " + rebuilt + " " + sql.substring(end)
        pos = start + rebuilt.length + 1
      } else pos = end
    }
    sql
  }

  /** replace top-of-select-list `[NOT] IN (subquery)` with the
    * quantified spellings so they expand to the three-valued forms
    */
  private def rewriteProjInSubquery(sql0: String): String = {
    var sql = sql0; var pos = 0
    while (true) {
      val sel = indexOfKeywordAnyDepth(sql, "SELECT", pos)
      if (sel < 0) return sql
      val listStart = sel + "SELECT".length
      val listEnd = clauseEnd(sql, listStart, FromEnders - "SELECT" + "FROM")
      var list = sql.substring(listStart, listEnd)
      var i = 0
      var changed = false
      while (i >= 0 && i < list.length) {
        val in = indexOfKeyword(list, "IN", i)
        if (in < 0) i = -1
        else {
          val after = list.substring(in + 2)
          val isSub = """(?is)^\s*\(\s*(SELECT|WITH)\b""".r
            .findPrefixMatchOf(after).isDefined
          if (!isSub) i = in + 2
          else {
            val notM = """(?is)\bNOT\s*$""".r
              .findFirstMatchIn(list.substring(0, in))
            if (notM.isDefined) {
              list = list.substring(0, notM.get.start) + " != ALL " +
                after
            } else {
              list = list.substring(0, in) + "= ANY " + after
            }
            changed = true
            i = 0 // rescan (indices shifted)
          }
        }
      }
      if (changed)
        sql = sql.substring(0, listStart) + list + sql.substring(listEnd)
      pos = sel + "SELECT".length
    }
    sql
  }

  /** clause keywords that terminate a JOIN ... ON condition */
  private val OnCondEnders = Set(
    "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET", "UNION",
    "EXCEPT", "INTERSECT", "WINDOW", "QUALIFY", "SETTINGS", "JOIN",
    "LEFT", "RIGHT", "FULL", "INNER", "CROSS", "LATERAL")

  /** Subqueries in JOIN ON conditions: the reference decorrelates them
    * (binder/join.rs); Spark rejects correlated subqueries in join
    * predicates. Two lowering paths, mirroring what the reference's
    * own planner effectively produces:
    *   - inner joins: ON moves to WHERE over a cross join (filters
    *     support arbitrary subqueries);
    *   - outer joins: a subquery referencing exactly one side becomes
    *     a computed column on that side's factor (`(SELECT ...)` ->
    *     `side.__jxN`), leaving a plain outer-join condition.
    */
  private def rewriteJoinOnSubquery(sql0: String): String = {
    var sql = sql0
    var guard = 0
    while (guard < 8) {
      guard += 1
      rewriteOneJoinOn(sql) match {
        case Some(next) => sql = next
        case None => return sql
      }
    }
    sql
  }

  private val SubqueryOpenRe = """(?i)\(\s*SELECT\b""".r

  private def rewriteOneJoinOn(sql: String): Option[String] = {
    var from = 0
    while (from < sql.length) {
      val j = indexOfKeyword(sql, "JOIN", from)
      if (j < 0) return None
      val onIdx = indexOfKeyword(sql, "ON", j + 4)
      if (onIdx < 0) return None
      val condStart = onIdx + 2
      val condEnd = {
        var e = clauseEnd(sql, condStart, OnCondEnders)
        // a top-level comma also ends the ON condition (comma-join
        // relation separator, e.g. `ON TRUE, LATERAL (...)`)
        val comma = indexOfTopLevel(sql.substring(condStart, e), ',')
        if (comma >= 0) condStart + comma else e
      }
      val cond = sql.substring(condStart, condEnd)
      if (SubqueryOpenRe.findFirstIn(cond).isEmpty) { from = onIdx + 2 }
      else {
        // join type + left/right factor spans
        var jt = j
        var joinType = "INNER"
        def prevWord(endPos: Int): (String, Int) = {
          var e = endPos - 1
          while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
          var s = e
          while (s >= 0 && (sql.charAt(s).isLetterOrDigit || sql.charAt(s) == '_')) s -= 1
          (sql.substring(s + 1, e + 1), s + 1)
        }
        val (w1, w1s) = prevWord(j)
        val up1 = w1.toUpperCase
        if (Set("LEFT", "RIGHT", "FULL", "INNER", "CROSS").contains(up1)) {
          joinType = up1; jt = w1s
        } else if (up1 == "OUTER") {
          val (w2, w2s) = prevWord(w1s)
          joinType = w2.toUpperCase; jt = w2s
        }
        val rightFactor = sql.substring(j + 4, onIdx).trim
        // left factor: tokens back from the join-type start until a
        // FROM / comma / ON / JOIN boundary
        var lfEnd = jt
        while (lfEnd > 0 && sql.charAt(lfEnd - 1).isWhitespace) lfEnd -= 1
        var lfStart = lfEnd
        var done = false
        while (!done) {
          var e = lfStart - 1
          while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
          if (e < 0) done = true
          else if (sql.charAt(e) == ')') {
            var depth = 0; var s = e
            while (s >= 0 && { val c = sql.charAt(s)
              if (c == ')') depth += 1 else if (c == '(') depth -= 1
              depth != 0 }) s -= 1
            lfStart = s
          } else if (sql.charAt(e) == ',') done = true
          else {
            val (w, ws) = prevWord(e + 1)
            if (w.isEmpty ||
                Set("FROM", "ON", "JOIN", "WHERE", "SELECT").contains(w.toUpperCase))
              done = true
            else lfStart = ws
          }
        }
        val leftFactor = sql.substring(lfStart, lfEnd).trim
        def aliasOf(factor: String): String = {
          val m = """(?is)^.*?(?:\)|\S)\s+(?:AS\s+)?(\w+)\s*$""".r
            .findFirstMatchIn(factor)
          m.map(_.group(1)).getOrElse(factor.replaceAll("^`|`$", ""))
        }
        val lAlias = aliasOf(leftFactor)
        val rAlias = aliasOf(rightFactor)
        if (joinType == "INNER" || joinType == "CROSS") {
          // ON -> WHERE over a cross join
          val afterCond = sql.substring(condEnd)
          val whereM = """(?is)^\s*WHERE\s+""".r.findPrefixMatchOf(afterCond)
          val rebuilt = sql.substring(0, jt) + s"CROSS JOIN $rightFactor" +
            (whereM match {
              case Some(wm) =>
                s" WHERE ($cond) AND " + afterCond.substring(wm.end)
              case None => s" WHERE $cond" + afterCond
            })
          return Some(rebuilt)
        }
        // outer join: attach each single-side subquery as a computed
        // column on its side
        var newCond = cond
        var newLeft = leftFactor
        var newRight = rightFactor
        var idx = 0
        var any = false
        var m = SubqueryOpenRe.findFirstMatchIn(newCond)
        while (m.isDefined) {
          val open = m.get.start
          val close = matchParen(newCond, open)
          val sq = newCond.substring(open, close + 1)
          val refsL = (s"(?i)\\b" + java.util.regex.Pattern.quote(lAlias) + "\\s*\\.").r
            .findFirstIn(sq).isDefined
          val refsR = (s"(?i)\\b" + java.util.regex.Pattern.quote(rAlias) + "\\s*\\.").r
            .findFirstIn(sq).isDefined
          if (refsL == refsR) {
            // both or neither: leave for Spark (it may be uncorrelated)
            val rest = SubqueryOpenRe.findAllMatchIn(newCond).filter(_.start > open)
            m = if (rest.hasNext) Some(rest.next()) else None
          } else {
            val col = s"__jx$idx"; idx += 1
            val (alias, factor) = if (refsR) (rAlias, newRight) else (lAlias, newLeft)
            val bare = {
              // factor minus its trailing alias (if it has one)
              val am = ("""(?is)^(.*?)\s+(?:AS\s+)?""" +
                java.util.regex.Pattern.quote(alias) + """\s*$""").r
                .findFirstMatchIn(factor)
              am.map(_.group(1).trim).getOrElse(factor)
            }
            val sqInner = sq.replaceAll(
              "(?i)\\b" + java.util.regex.Pattern.quote(alias) + "\\s*\\.", "__sqr.")
            val derived = s"(SELECT __sqr.*, $sqInner AS $col FROM $bare __sqr) $alias"
            if (refsR) newRight = derived else newLeft = derived
            newCond = newCond.substring(0, open) + s"$alias.$col" +
              newCond.substring(close + 1)
            any = true
            m = SubqueryOpenRe.findFirstMatchIn(newCond)
          }
        }
        if (!any) { from = condEnd; }
        else {
          val joinWord = sql.substring(jt, j + 4)
          var rebuilt = sql.substring(0, lfStart) + newLeft + " " + joinWord + " " +
            newRight + " ON " + newCond + sql.substring(condEnd)
          // hide the helper columns from a bare `SELECT *` projection
          if (idx > 0) {
            val selIdx = {
              var last = -1; var p = indexOfKeywordAnyDepth(rebuilt, "SELECT", 0)
              while (p >= 0 && p < lfStart) {
                last = p; p = indexOfKeywordAnyDepth(rebuilt, "SELECT", p + 6)
              }
              last
            }
            if (selIdx >= 0) {
              val listStart = selIdx + "SELECT".length
              val listEnd = clauseEnd(rebuilt, listStart, Set("FROM"))
              if (rebuilt.substring(listStart, listEnd).trim == "*") {
                val cols = (0 until idx).map(k => s"__jx$k").mkString(", ")
                rebuilt = rebuilt.substring(0, listStart) +
                  s" * EXCEPT ($cols) " + rebuilt.substring(listEnd)
              }
            }
          }
          return Some(rebuilt)
        }
      }
    }
    None
  }

  private val WindowedJsonAggRe =
    """(?i)\b(json_array_agg|json_agg|json_object_agg)\s*\(""".r

  private def rewriteWindowedJsonAgg(sql: String): String = {
    val m0 = WindowedJsonAggRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = m.end - 1
    val close = matchParen(sql, open)
    val overM = """(?is)^\s*OVER\s*\(""".r.findPrefixMatchOf(sql.substring(close + 1))
    if (overM.isEmpty)
      return sql.substring(0, close + 1) +
        rewriteWindowedJsonAgg(sql.substring(close + 1))
    val oOpen = close + 1 + overM.get.end - 1
    val oClose = matchParen(sql, oOpen)
    val args = sql.substring(open + 1, close)
    val spec = sql.substring(oOpen + 1, oClose)
    val fn = m.group(1).toLowerCase
    val repl =
      if (fn == "json_object_agg") {
        val parts = splitTopLevel(args, ',')
        s"to_json(map_from_entries(collect_list(struct(${parts(0)}, ${parts(1)})) OVER ($spec)))"
      } else
        s"to_json(collect_list($args) OVER ($spec))"
    sql.substring(0, m.start) + repl +
      rewriteWindowedJsonAgg(sql.substring(oClose + 1))
  }

  private val ParamAggRe =
    // longer spellings first: plain `quantile` must not shadow the
    // tdigest forms. intersect_count('a','b')(bm, tag) and
    // histogram(n)(x) are the reference's other two-stage aggregates
    // (aggregate_bitmap.rs / aggregate_histogram.rs)
    """(?i)\b(quantile_tdigest_weighted|quantile_tdigest|quantile_cont|quantile_disc|quantile|median_tdigest|intersect_count|histogram|window_funnel|retention|approx_count_distinct|uniq|to_decimal|try_to_decimal)\s*\(""".r

  private def rewriteParamAggCall(sql: String): String = {
    val m0 = ParamAggRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open1 = m.end - 1
    val close1 = matchParen(sql, open1)
    val after = sql.substring(close1 + 1)
    val second = """^\s*\(""".r.findPrefixMatchOf(after)
    if (second.isEmpty)
      return sql.substring(0, close1 + 1) +
        rewriteParamAggCall(sql.substring(close1 + 1))
    val open2 = close1 + 1 + second.get.end - 1
    val close2 = matchParen(sql, open2)
    val params = sql.substring(open1 + 1, close1)
    // parenthesize each argument: a bare `event = 1000` condition
    // would read as Spark named-argument syntax
    val argsTxt = splitTopLevel(sql.substring(open2 + 1, close2), ',')
      .map(a => s"(${a.trim})").mkString(", ")
    // window_funnel's flat spelling takes the window FIRST
    val flat =
      if (m.group(1).equalsIgnoreCase("window_funnel"))
        s"${m.group(1)}($params, $argsTxt)"
      else s"${m.group(1)}($argsTxt, $params)"
    sql.substring(0, m.start) + flat +
      rewriteParamAggCall(sql.substring(close2 + 1))
  }

  private val CastSpellings = Seq(
    "int8" -> "tinyint", "int16" -> "smallint", "uint8" -> "smallint",
    "int32" -> "int", "uint16" -> "int", "int64" -> "bigint",
    "uint32" -> "bigint", "uint64" -> "decimal(20,0)",
    "float32" -> "float", "float64" -> "double",
    "text" -> "string", "json" -> "variant",
    "bool" -> "boolean",
    "datetime" -> "timestamp")

  /** MySQL-lineage CAST(x AS SIGNED|UNSIGNED [INTEGER]) and
    * ::signed/::unsigned (reference ast type_name.rs: Int64/UInt64),
    * handled in CAST context only — a generic `as signed` substitution
    * would rewrite select-list aliases named signed/unsigned and break
    * the two-word `AS UNSIGNED INTEGER` form.
    */
  private def rewriteSignedCasts(sql0: String): String = {
    var sql = sql0
      .replaceAll("(?i)::\\s*unsigned(\\s+integer)?\\b", "::decimal(20,0)")
      .replaceAll("(?i)::\\s*signed(\\s+integer)?\\b", "::bigint")
    if ("""(?i)\bas\s+(un)?signed\b""".r.findFirstIn(sql).isEmpty) return sql
    val castRe = """(?i)\b(try_)?cast\s*\(""".r
    // greedy .* anchors on the LAST top-level AS — the type position
    // of THIS cast (nested casts get their own castRe match)
    val tailRe = """(?is)^(.*)\b(AS\s+)(SIGNED|UNSIGNED)(\s+INTEGER)?(\s*)$""".r
    var changed = true
    var guard = 0
    while (changed && guard < 200) {
      changed = false; guard += 1
      val it = castRe.findAllMatchIn(sql).toSeq.iterator
      while (it.hasNext && !changed) {
        val m = it.next()
        val open = m.end - 1
        val close = matchParen(sql, open)
        if (close > open) {
          tailRe.findFirstMatchIn(sql.substring(open + 1, close)).foreach { t =>
            val isTry = m.group(1) != null
            val unsigned = t.group(3).equalsIgnoreCase("unsigned")
            if (isTry && unsigned) {
              // try_cast to UNSIGNED of a NEGATIVE value is NULL in
              // the reference; decimal(20,0) would happily hold it
              val e = t.group(1).trim
              sql = sql.substring(0, m.start) +
                s"(CASE WHEN try_cast(($e) AS decimal(20,0)) < 0 THEN NULL " +
                s"ELSE try_cast(($e) AS decimal(20,0)) END)" +
                sql.substring(close + 1)
            } else {
              val mapped = if (unsigned) "decimal(20,0)" else "bigint"
              sql = sql.substring(0, open + 1) + t.group(1) + t.group(2) +
                mapped + t.group(5) + sql.substring(close)
            }
            changed = true
          }
        }
      }
    }
    sql
  }

  /** quote-aware paren depth at every character position */
  private def parenDepths(sql: String): Array[Int] = {
    val out = new Array[Int](sql.length)
    var d = 0; var q: Char = 0
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { if (c == q) q = 0 }
      else if (c == '\'' || c == '`') q = c
      else if (c == '(') d += 1
      else if (c == ')') d -= 1
      out(i) = d
      i += 1
    }
    out
  }

  private var columnFirstGroupBy = false

  /** substitute select-list alias expressions for bare GROUP BY items
    * that name an alias (databend's default binding order)
    */
  /** quote-aware whole-word replace (never inside '…'/"…"/`…`, never
    * qualified `x.word`, never a call `word(`)
    */
  private def replaceWordOutsideQuotes(text: String, word: String,
                                       repl: String): String = {
    val sb = new StringBuilder
    var i = 0; var q: Char = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '"' || c == '`') { q = c; sb += c; i += 1 }
      else if ((Character.isLetter(c) || c == '_')) {
        val start = i
        while (i < text.length && (Character.isLetterOrDigit(text.charAt(i)) ||
               text.charAt(i) == '_' || text.charAt(i) == '$')) i += 1
        val w = text.substring(start, i)
        val prev = if (start == 0) ' ' else text.charAt(start - 1)
        var j = i
        while (j < text.length && Character.isWhitespace(text.charAt(j))) j += 1
        val isCallOrQual = (j < text.length && text.charAt(j) == '(') ||
          prev == '.' || prev == ':' ||
          (j < text.length && text.charAt(j) == '.')
        if (w.equalsIgnoreCase(word) && !isCallOrQual) sb.append(repl)
        else sb.append(w)
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** word replace like [[replaceWordOutsideQuotes]], but references
    * inside an aggregate call's argument list are left alone (there,
    * names bind the input column)
    */
  private def substituteOutsideAggArgs(text: String, word: String,
                                       repl: String): String = {
    val sb = new StringBuilder
    var i = 0; var q: Char = 0
    var aggDepth = 0
    var stack = List.empty[Boolean] // per '(': was it an agg call?
    var prevWord = ""
    while (i < text.length) {
      val c = text.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '"' || c == '`') { q = c; sb += c; prevWord = ""; i += 1 }
      else if (Character.isLetter(c) || c == '_') {
        val start = i
        while (i < text.length && (Character.isLetterOrDigit(text.charAt(i)) ||
               text.charAt(i) == '_' || text.charAt(i) == '$')) i += 1
        val w = text.substring(start, i)
        val prev = if (start == 0) ' ' else text.charAt(start - 1)
        var j = i
        while (j < text.length && Character.isWhitespace(text.charAt(j))) j += 1
        val isCallOrQual = (j < text.length && text.charAt(j) == '(') ||
          prev == '.' || prev == ':' || (j < text.length && text.charAt(j) == '.')
        if (w.equalsIgnoreCase(word) && !isCallOrQual && aggDepth == 0)
          sb.append(repl)
        else sb.append(w)
        prevWord = w.toUpperCase
      } else {
        if (c == '(') {
          val isAgg = prevWord.nonEmpty &&
            AggLikeRe.findPrefixMatchOf(prevWord.toLowerCase + "(").isDefined
          stack = isAgg :: stack
          if (isAgg) aggDepth += 1
          prevWord = ""
        } else if (c == ')') {
          stack match {
            case h :: t => if (h) aggDepth -= 1; stack = t
            case Nil =>
          }
          prevWord = ""
        } else if (!Character.isWhitespace(c) && c != ',') prevWord = ""
        sb += c
        i += 1
      }
    }
    sb.toString
  }

  /** Lateral column aliases, databend bind order: a select-list item
    * may reference an EARLIER item's alias (`select n % 3 as b,
    * b::string`, `select i % 2 as k, sum(k)`). Spark's native LCA
    * refuses aggregate arguments and breaks under grouping sets, so
    * the reference's semantics are restored by substituting the
    * aliased expression textually — but ONLY when the name is not a
    * column of any mentioned table (Spark resolves base columns first,
    * and so does the reference).
    */
  /** Column names of this select's FROM clause, IF every factor is
    * fully known: registered tables, numbers()/generate_series/range
    * TVFs (with optional alias column lists). A derived table, CTE or
    * unknown name returns None — alias substitution then stands down
    * (Spark's own LCA covers those shapes; substituting blind could
    * shadow a derived column, crdb group_by `1 AS i, SUM(i)`).
    */
  private def fromFactorCols(sql: String, fromIdx: Int): Option[Set[String]] = {
    if (fromIdx < 0) return None
    val start = fromIdx + "FROM".length
    val end = clauseEnd(sql, start, FromEnders)
    val clause = sql.substring(start, end)
    if (indexOfKeyword(clause, "JOIN") >= 0 ||
        indexOfKeyword(clause, "LATERAL") >= 0) return None
    val out = scala.collection.mutable.Set.empty[String]
    for (seg0 <- splitTopLevel(clause, ',')) {
      val seg = seg0.trim
      val TvfRe = """(?is)^(numbers(?:_mt|_local)?|generate_series|range)\s*\(""".r
      val NameRe = """(?is)^([\w.`"]+)(?:\s+(?:AS\s+)?(\w+))?\s*$""".r
      TvfRe.findPrefixMatchOf(seg) match {
        case Some(m) =>
          val close = matchParen(seg, m.end - 1)
          val rest = seg.substring(close + 1).trim
          val colList = """(?is)^(?:AS\s+)?\w*\s*\(([^)]*)\)\s*$""".r
            .findFirstMatchIn(rest).map(_.group(1))
          colList match {
            case Some(cl) => splitTopLevel(cl, ',').foreach(c => out += c.trim.toLowerCase)
            case None if rest.matches("(?is)^(AS\\s+)?\\w*\\s*$") =>
              out += (m.group(1).toLowerCase match {
                case "generate_series" => "generate_series"
                case "range" => "id"
                case _ => "number"
              })
            case _ => return None
          }
        case None => seg match {
          case NameRe(name, _) =>
            val key = resolveKey(name.replaceAll("[`\"]", ""))
            if (!tables.contains(key)) return None
            out ++= tables(key).read().schema.fieldNames.map(_.toLowerCase)
          case _ => return None
        }
      }
    }
    Some(out.toSet)
  }

  private def rewriteSelectAliasRefs(sql0: String): String = {
    var sql = sql0; var searchFrom = 0
    while (true) {
      val sel = indexOfKeywordAnyDepth(sql, "SELECT", searchFrom)
      if (sel < 0) return sql
      val selStart = sel + "SELECT".length
      val selEnd = clauseEnd(sql, selStart, FromEnders - "SELECT" + "FROM")
      val fromHere =
        if (selEnd < sql.length &&
            sql.regionMatches(true, selEnd, "FROM", 0, 4)) selEnd else -1
      val knownCols =
        if (sql.substring(selStart, selEnd).contains("--")) None // SQL comments: don't rebuild the list
        else fromFactorCols(sql, fromHere)
      if (knownCols.isEmpty) { searchFrom = selEnd }
      else {
      val cols = knownCols.get
      val ExplicitAs = """(?is)^(.*\S)\s+AS\s+`?(\w+)`?$""".r
      val Implicit = """(?is)^(.*\S)\s+`?(\w+)`?$""".r
      val items = splitTopLevel(sql.substring(selStart, selEnd), ',')
      var aliasMap = Vector.empty[(String, String)]
      var changed = false
      val out = items.map { it =>
        // split off this item's own alias tail first: the alias token
        // itself must never be substituted (`(a) AS foo` with an
        // earlier alias foo)
        val (head0, aliasTail) = it.trim match {
          case ExplicitAs(e, n) => (e, " AS " + n)
          case _ => (it, "")
        }
        var head = head0
        for ((n, e) <- aliasMap
             if !cols.contains(n) &&
               ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
                 .findFirstIn(head).isDefined) {
          val t2 = replaceWordOutsideQuotes(head, n, "(" + e + ")")
          if (t2 != head) { head = t2; changed = true }
        }
        val t = head + aliasTail
        t.trim.replaceAll("(?is)^(DISTINCT|ALL)\\s+", "") match {
          case ExplicitAs(e, n) if !n.matches("\\d+") =>
            aliasMap :+= (n.toLowerCase -> e.trim)
          case Implicit(e, n)
              // in a select list a trailing bare word IS a column alias
              // (table aliases never appear here); exclude only
              // operator-tailed heads (`a + 8` must not alias "8") and
              // DISTINCT/ALL markers
              if !n.matches("\\d+") &&
                !e.trim.matches("(?is).*[-+*/%<>=|&^]") &&
                !e.trim.matches("(?i)(DISTINCT|ALL)") &&
                !e.trim.toUpperCase.endsWith(" DISTINCT") &&
                !FactorKws.contains(n.toUpperCase) &&
                !ImplicitAliasStop.contains(n.toUpperCase) =>
            aliasMap :+= (n.toLowerCase -> e.trim)
          case _ =>
        }
        t
      }
      if (changed) {
        val rebuilt = " " + out.mkString(", ") + " "
        sql = sql.substring(0, selStart) + rebuilt + sql.substring(selEnd)
        searchFrom = selStart + rebuilt.length
      } else searchFrom = selEnd
      }
    }
    sql
  }

  /** ORDER BY an expression that (textually) duplicates a select item
    * refers to that item by ORDINAL: after aggregation Spark can only
    * sort on output columns, so `ORDER BY grouping(a)+grouping(b)` or
    * `ORDER BY c + 1` over `GROUP BY CUBE (c + 1)` fails to resolve
    * the base columns — the reference binds them to the output
    * (grouping_sets suite). Simple identifiers/ordinals are untouched.
    */
  private def rewriteOrderByMatchingItem(sql0: String): String = {
    def norm(e: String): String =
      e.toLowerCase.replaceAll("\\s+", " ").trim
    var sql = sql0; var pos = 0
    while (true) {
      val ob = indexOfKeywordAnyDepth(sql, "ORDER", pos)
      if (ob < 0) return sql
      val bm = """(?is)^ORDER\s+BY\s+""".r.findPrefixMatchOf(sql.substring(ob))
      if (bm.isEmpty) { pos = ob + 5 }
      else {
        val listStart = ob + bm.get.end
        val listEnd = clauseEnd(sql, listStart,
          Set("LIMIT", "OFFSET", "UNION", "EXCEPT", "INTERSECT", "SETTINGS",
              "WINDOW", "FOR"))
        val sel = {
          val depths = parenDepths(sql)
          var last = -1; var p = indexOfKeywordAnyDepth(sql, "SELECT", 0)
          while (p >= 0 && p < ob) {
            if (depths(p) == depths(ob)) last = p
            p = indexOfKeywordAnyDepth(sql, "SELECT", p + 6)
          }
          last
        }
        if (sel < 0) { pos = listEnd }
        else {
          val selStart = sel + "SELECT".length
          val selEnd = clauseEnd(sql, selStart, FromEnders - "SELECT" + "FROM")
          val itemExprs = splitTopLevel(sql.substring(selStart, selEnd), ',')
            .map(_.trim.replaceAll("(?is)^DISTINCT\\s+", ""))
            .map(_.replaceAll("(?is)\\s+AS\\s+`?\\w+`?$", ""))
            .map(norm)
          val items = splitTopLevel(sql.substring(listStart, listEnd), ',')
          var changed = false
          val rebuilt = items.map { it =>
            val sufM = """(?is)\s+(ASC|DESC)?\s*(NULLS\s+(FIRST|LAST))?\s*$""".r
              .findFirstMatchIn(it)
            val suffix = sufM.map(_.matched).getOrElse("")
            val head = if (suffix.isEmpty) it else it.substring(0, it.length - suffix.length)
            val h = norm(head)
            val idx = itemExprs.indexOf(h)
            if (idx >= 0 && !h.matches("[\\w.`]+") && !h.matches("\\d+")) {
              changed = true; s"${idx + 1}$suffix"
            } else it
          }.mkString(", ")
          if (changed)
            sql = sql.substring(0, listStart) + " " + rebuilt + " " + sql.substring(listEnd)
          pos = listStart + rebuilt.length
        }
      }
    }
    sql
  }

  private val AggLikeRe =
    ("""(?i)\b(grouping|grouping_id|sum|count|avg|min|max|min_by|max_by""" +
     """|stddev\w*|var\w*|first|last|any_value|array_agg|collect_\w+""" +
     """|listagg|string_agg|group_concat|median|mode|percentile\w*""" +
     """|approx_\w+|bool_and|bool_or)\s*\(""").r

  /** HAVING alias prebinding (reference binder: HAVING names bind to
    * select-list aliases before input columns — grouping_sets suite
    * `having k is not null` filters on `if(grouping(k)=1,0,k) AS k`,
    * not the base column). Spark resolves base columns first, so
    * substitute the aliased expression textually.
    */
  private def rewriteHavingAliasFirst(sql0: String): String = {
    var sql = sql0; var pos = 0
    while (true) {
      val h = indexOfKeywordAnyDepth(sql, "HAVING", pos)
      if (h < 0) return sql
      val listStart = h + "HAVING".length
      val listEnd = clauseEnd(sql, listStart,
        Set("ORDER", "LIMIT", "OFFSET", "UNION", "EXCEPT", "INTERSECT",
            "WINDOW", "QUALIFY", "SETTINGS"))
      val sel = {
        val depths = parenDepths(sql)
        var last = -1; var p = indexOfKeywordAnyDepth(sql, "SELECT", 0)
        while (p >= 0 && p < h) {
          if (depths(p) == depths(h)) last = p
          p = indexOfKeywordAnyDepth(sql, "SELECT", p + 6)
        }
        last
      }
      if (sel < 0) { pos = listEnd }
      else {
        val selStart = sel + "SELECT".length
        val selEnd = clauseEnd(sql, selStart, FromEnders - "SELECT" + "FROM")
        val ExplicitAs = """(?is)^(.*\S)\s+AS\s+`?(\w+)`?$""".r
        val aliasMap = splitTopLevel(sql.substring(selStart, selEnd), ',')
          .flatMap(it => it.trim match {
            case ExplicitAs(e, n) if !n.matches("\\d+") =>
              Some(n.toLowerCase -> e.trim)
            case _ => None
          }).toMap
        var clause = sql.substring(listStart, listEnd)
        var changed = false
        for ((n, e) <- aliasMap
             if ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\b").r
               .findFirstIn(clause).isDefined) {
          // inside an AGGREGATE call's arguments, plain names bind the
          // input column (having.test `HAVING sum(cost)` sums the
          // COLUMN even though cost aliases sum(cost)); only
          // references OUTSIDE aggregate args prebind to the alias
          val c2 = substituteOutsideAggArgs(clause, n, "(" + e + ")")
          if (c2 != clause) { clause = c2; changed = true }
        }
        if (changed)
          sql = sql.substring(0, listStart) + clause + sql.substring(listEnd)
        pos = listStart + clause.length
      }
    }
    sql
  }

  private def rewriteGroupByAliasFirst(sql0: String): String = {
    var sql = sql0; var pos = 0
    while (true) {
      val g = indexOfKeywordAnyDepth(sql, "GROUP", pos)
      if (g < 0) return sql
      val bm = """(?is)^GROUP\s+BY\s+""".r.findPrefixMatchOf(sql.substring(g))
      if (bm.isEmpty) { pos = g + 5 }
      else {
        val listStart = g + bm.get.end
        val listEnd = clauseEnd(sql, listStart,
          Set("HAVING", "ORDER", "LIMIT", "OFFSET", "UNION", "EXCEPT",
              "INTERSECT", "WINDOW", "QUALIFY", "SETTINGS"))
        // the owning block's select list: nearest preceding SELECT at
        // the SAME paren depth (subqueries in FROM are deeper)
        val sel = {
          val depths = parenDepths(sql)
          var last = -1; var p = indexOfKeywordAnyDepth(sql, "SELECT", 0)
          while (p >= 0 && p < g) {
            if (depths(p) == depths(g)) last = p
            p = indexOfKeywordAnyDepth(sql, "SELECT", p + 6)
          }
          last
        }
        if (sel < 0) { pos = listEnd }
        else {
          val selStart = sel + "SELECT".length
          val selEnd = clauseEnd(sql, selStart, FromEnders - "SELECT" + "FROM")
          val ExplicitAs = """(?is)^(.*\S)\s+AS\s+`?(\w+)`?$""".r
          val Implicit = """(?is)^(.*\S)\s+`?(\w+)`?$""".r
          val aliasMap = splitTopLevel(sql.substring(selStart, selEnd), ',')
            .flatMap { it =>
              it.trim.replaceAll("(?is)^(DISTINCT|ALL)\\s+", "") match {
                case ExplicitAs(e, n) if !n.matches("\\d+") =>
                  Some(n.toLowerCase -> e.trim)
                case Implicit(e, n)
                    // implicit alias: in a select list a trailing bare
                    // word aliases the head (incl. `number a`); exclude
                    // only numeric tails of operator expressions
                    if !n.matches("\\d+") &&
                      !e.trim.matches("(?is).*[-+*/%<>=|&^]") &&
                      !e.trim.matches("(?i)(DISTINCT|ALL)") =>
                  Some(n.toLowerCase -> e.trim)
                case _ => None
              }
            }.toMap
            // a GROUP BY name never binds to an alias whose expression
            // aggregates (`if(grouping(k)=1,0,k) AS k ... GROUP BY k`
            // groups the COLUMN k — the reference falls back the same
            // way, since grouping by an aggregate is circular)
            .filterNot { case (_, e) => AggLikeRe.findFirstIn(e).isDefined }
            // ...nor to an alias of an SRF item when the name shadows a
            // source column: the reference groups the COLUMN first and
            // expands the SRF per group (group_by unnest vectors)
            .filterNot { case (_, e) =>
              """(?i)\b(unnest|explode|posexplode|explode_outer|flatten)\s*\(""".r
                .findFirstIn(e).isDefined }
          if (aliasMap.isEmpty) { pos = listEnd }
          else {
            val items = splitTopLevel(sql.substring(listStart, listEnd), ',')
            var changed = false
            val GroupingForm = """(?is)^(GROUPING\s+SETS|ROLLUP|CUBE)\s*\(""".r
            def subBare(t: String): Option[String] =
              if (t.matches("(?i)\\w+") && aliasMap.contains(t.toLowerCase) &&
                  !t.matches("\\d+")) Some("(" + aliasMap(t.toLowerCase) + ")")
              else None
            val rebuilt = items.map { it =>
              val t = it.trim
              subBare(t) match {
                case Some(r) => changed = true; r
                case None => GroupingForm.findPrefixMatchOf(t) match {
                  case Some(gm) =>
                    // substitute aliases inside rollup/cube/grouping
                    // sets argument lists (incl. nested tuples)
                    val open = gm.end - 1
                    val close = matchParen(t, open)
                    val inner = splitTopLevel(t.substring(open + 1, close), ',')
                      .map { e0 =>
                        val e = e0.trim
                        subBare(e).orElse {
                          if (e.startsWith("(") && e.endsWith(")"))
                            Some("(" + splitTopLevel(e.substring(1, e.length - 1), ',')
                              .map(x => subBare(x.trim).getOrElse(x.trim))
                              .mkString(", ") + ")")
                          else None
                        } match {
                          case Some(r) => changed = true; r
                          case None => e
                        }
                      }.mkString(", ")
                    t.substring(0, open + 1) + inner + t.substring(close)
                  case None => it
                }
              }
            }.mkString(", ")
            if (changed)
              // trailing space: listEnd sits AT the next clause keyword
              // and the rebuilt list is trimmed
              sql = sql.substring(0, listStart) + rebuilt + " " +
                sql.substring(listEnd)
            pos = listStart + rebuilt.length
          }
        }
      }
    }
    sql
  }

  private val AggCallRe =
    ("""(?i)\b(sum|count|avg|min|max|any|stddev\w*|var\w*|median|mode|""" +
     """array_agg|string_agg|listagg|group_concat|bool_and|bool_or|""" +
     """approx_\w+|uniq|arg_min|arg_max|min_by|max_by|quantile\w*|""" +
     """percentile\w*|covar\w*|corr|skewness|kurtosis|bitmap_\w+|""" +
     """histogram\w*|retention|window_funnel|\w+_if|\w+_distinct)\s*\(""").r

  /** `SELECT ... HAVING p` with no GROUP BY and no aggregate in `p` is
    * a plain filter in databend (MySQL extension; query/having.test).
    * Spark would bind it as an empty-grouping aggregate and fail.
    */
  private var systemTablesRegistered = false
  private def ensureSystemTables(): Unit = if (!systemTablesRegistered) {
    graft.operators.SystemTables.register(spark)
    systemTablesRegistered = true
  }

  private val TruncUnits = Set("year", "yyyy", "yy", "quarter", "q",
    "month", "mon", "mm", "week", "iw", "isoweek", "day", "dd", "dy",
    "hour", "hh24", "hh", "minute", "mi", "second", "ss")

  /** TRUNC(x, unit) with a bare-identifier unit (databend/Oracle
    * grammar, ast trunc parsing): quote the trailing unit word so it
    * reaches the function builder as a literal instead of an
    * unresolvable column
    */
  private def rewriteTruncBareUnit(sql: String): String = {
    val m = """(?i)\btrunc\s*\(""".r.findFirstMatchIn(sql)
    if (m.isEmpty) return sql
    val open = m.get.end - 1
    val close = matchParen(sql, open)
    if (close < 0) return sql
    val inner = sql.substring(open + 1, close)
    val lastComma = {
      val depths = parenDepths(inner)
      (inner.length - 1 to 0 by -1).find(i => inner(i) == ',' && depths(i) == 0)
    }
    val rewrittenInner = lastComma match {
      case Some(i) =>
        val unit = inner.substring(i + 1).trim
        if (unit.matches("(?i)[a-z0-9_]+") && TruncUnits(unit.toLowerCase))
          inner.substring(0, i + 1) + s" '$unit'"
        else inner
      case None => inner
    }
    sql.substring(0, open + 1) + rewriteTruncBareUnit2(rewrittenInner) +
      ")" + rewriteTruncBareUnit(sql.substring(close + 1))
  }
  // nested trunc calls inside the first call's argument list
  private def rewriteTruncBareUnit2(inner: String): String =
    rewriteTruncBareUnit(inner)

  private def rewriteBareHaving(sql: String): String = {
    val h = indexOfKeyword(sql, "HAVING")
    if (h < 0 || indexOfKeyword(sql, "GROUP") >= 0) return sql
    if (AggCallRe.findFirstIn(sql.substring(h)).isDefined) return sql
    val kw = if (indexOfKeyword(sql, "WHERE") >= 0) "AND" else "WHERE"
    sql.substring(0, h) + kw + sql.substring(h + "HAVING".length)
  }

  /** databend sorts NULLS LAST by default in both ASC and DESC
    * (settings_getter_setter.rs:844 `get_nulls_first`; default setting
    * `default_order_by_null` = "nulls_last"), while Spark's ASC default
    * is NULLS FIRST. Append an explicit NULLS LAST to every ORDER BY
    * item — at any depth (query, subquery, OVER clause) — that doesn't
    * already carry a NULLS qualifier, so the SQL surface sorts like the
    * reference (vectors: query/order.test).
    */
  private def rewriteOrderNulls(sql: String): String = {
    val upper = sql.toUpperCase
    val out = new StringBuilder(sql.length + 32)
    var i = 0; var q: Char = 0; var last = 0
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; i += 1 }
      else if (upper.startsWith("ORDER", i) &&
               (i == 0 || !wordChar(sql.charAt(i - 1))) &&
               (i + 5 >= sql.length || !wordChar(sql.charAt(i + 5)))) {
        """(?is)^ORDER\s+BY\s+""".r.findPrefixMatchOf(sql.substring(i)) match {
          case Some(pm) =>
            val listStart = i + pm.end
            out.append(sql.substring(last, listStart))
            val (txt, end) = rewriteSortList(sql, listStart)
            out.append(txt)
            last = end; i = end
          case None => i += 5
        }
      } else i += 1
    }
    out.append(sql.substring(last))
    out.toString
  }

  /** keywords that terminate an ORDER BY sort-item list at its own
    * paren depth (clause keywords after ORDER BY in a query block, set
    * operators, and window-frame heads inside an OVER clause)
    */
  private val SortListEnders = Set(
    "LIMIT", "OFFSET", "FETCH", "SETTINGS", "UNION", "INTERSECT",
    "EXCEPT", "MINUS", "ROWS", "RANGE", "GROUPS", "WINDOW", "INTO",
    "IGNORE_RESULT", "FORMAT")

  /** rewrite the sort items starting at `start`; returns (rewritten
    * text, index just past the list). The list ends at a `)`/`]`
    * closing the enclosing scope, a terminator keyword at the same
    * depth, or end of input.
    */
  private def rewriteSortList(sql: String, start: Int): (String, Int) = {
    val upper = sql.toUpperCase
    var i = start; var depth = 0; var q: Char = 0
    var end = sql.length
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    var done = false
    while (i < sql.length && !done) {
      val c = sql.charAt(i)
      if (q != 0) { if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; i += 1 }
      else if (c == '(' || c == '[') { depth += 1; i += 1 }
      else if (c == ')' || c == ']') {
        if (depth == 0) { end = i; done = true } else { depth -= 1; i += 1 }
      } else if (depth == 0 && c.isLetter &&
                 (i == 0 || !wordChar(sql.charAt(i - 1)))) {
        val kwEnd = {
          var j = i; while (j < sql.length && wordChar(sql.charAt(j))) j += 1; j
        }
        if (SortListEnders.contains(upper.substring(i, kwEnd))) {
          end = i; done = true
        } else i = kwEnd
      } else i += 1
    }
    val list = sql.substring(start, end)
    val items = splitTopLevel(list, ',').map { item0 =>
      // recurse into subquery sort clauses nested inside the item
      val item = rewriteOrderNulls(item0)
      if ("""(?is).*\bNULLS\s+(FIRST|LAST)\s*$""".r.matches(item)) item
      else item + " NULLS LAST"
    }
    (items.mkString(", ") + (if (end < sql.length) " " else ""), end)
  }

  /** databend double-quoted identifiers -> Spark backticks, skipping
    * single-quoted string literals and existing backtick spans.
    */
  private def identQuotes(sql: String): String = {
    val sb = new StringBuilder(sql.length)
    var i = 0; var q: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; sb += c; i += 1 }
      else if (c == '"') {
        val close = sql.indexOf('"', i + 1)
        if (close < 0) { sb += c; i += 1 }
        else { sb += '`'; sb.append(sql.substring(i + 1, close)); sb += '`'; i = close + 1 }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** `[e1, e2, ...]` literal -> `array(e1, e2, ...)` (the reference's
    * array literal syntax, expr.rs). A `[` directly following an
    * identifier/`)`/`]` is a subscript and is left alone.
    */
  private val PreArrayKeywords = Set(
    "AND", "OR", "NOT", "ON", "WHERE", "SELECT", "WHEN", "THEN", "ELSE",
    "IN", "BY", "ALL", "ANY", "SOME", "BETWEEN", "LIKE", "IS", "CASE",
    "UNION", "EXCEPT", "INTERSECT", "VALUES", "FROM", "HAVING", "SET",
    "RETURN", "RETURNS", "AS", "DISTINCT", "END")

  private def arrayLiterals(sql: String): String = {
    val sb = new StringBuilder(sql.length + 16)
    // stack of flags: for each currently-open bracket, whether we
    // rewrote it to array(
    val open = mutable.Stack[Boolean]()
    var i = 0; var q: Char = 0; var prevNonSpace: Char = 0
    def isSubscriptAnchor(c: Char) =
      Character.isLetterOrDigit(c) || c == '_' || c == ')' || c == ']' || c == '`'
    // a `[` after a KEYWORD (`and [1,2]`) is a literal even though the
    // preceding char is a letter — check the word the char terminates
    def prevIsKeyword(): Boolean = {
      var e = sb.length
      while (e > 0 && sb.charAt(e - 1).isWhitespace) e -= 1
      var s = e
      while (s > 0 && (sb.charAt(s - 1).isLetterOrDigit || sb.charAt(s - 1) == '_')) s -= 1
      s < e && PreArrayKeywords.contains(sb.substring(s, e).toUpperCase)
    }
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else c match {
        case '\'' | '`' => q = c; sb += c; prevNonSpace = c; i += 1
        case '[' =>
          val literal = !isSubscriptAnchor(prevNonSpace) || prevIsKeyword()
          if (literal) sb.append("array(") else sb += '['
          open.push(literal); prevNonSpace = '('; i += 1
        case ']' =>
          val literal = open.nonEmpty && open.pop()
          if (literal) sb += ')' else sb += ']'
          prevNonSpace = ']'; i += 1
        case _ =>
          sb += c
          if (!Character.isWhitespace(c)) prevNonSpace = c
          i += 1
      }
    }
    sb.toString
  }

  /** `{k:v, ...}` map literals (the reference's map syntax,
    * ast/expr.rs Map) -> map(k, v, ...); `{}` -> map()
    */
  private def mapLiterals(sql: String): String = {
    val open = {
      var i = 0; var q: Char = 0; var found = -1
      while (i < sql.length && found < 0) {
        val c = sql.charAt(i)
        if (q != 0) { if (c == q) q = 0 }
        else if (c == '\'' || c == '`') q = c
        else if (c == '{') found = i
        i += 1
      }
      found
    }
    if (open < 0) return sql
    // matching close brace (quote-aware)
    var depth = 0; var j = open; var q: Char = 0
    while (j < sql.length && {
      val cj = sql.charAt(j)
      if (q != 0) { if (cj == q) q = 0 }
      else if (cj == '\'' || cj == '`') q = cj
      else if (cj == '{') depth += 1
      else if (cj == '}') depth -= 1
      depth != 0 || sql.charAt(j) != '}'
    }) j += 1
    val inner = sql.substring(open + 1, j)
    val keyTexts = splitTopLevel(inner, ',').map { kv =>
      val colon = indexOfTopLevel(kv, ':')
      require(colon > 0, s"bad map entry: $kv")
      kv.take(colon).trim
    }
    // a duplicated literal key in a map literal is error 1006 in the
    // reference ({100:'k1',100:'k2'}), not last-wins
    val dupKey = keyTexts.groupBy(identity).collectFirst {
      case (k, vs) if vs.length > 1 &&
        k.matches("""(?s)-?\d+(\.\d+)?|'(?:[^']|'')*'""") => k
    }
    require(dupKey.isEmpty,
      s"1006: duplicate map key ${dupKey.getOrElse("")}")
    val entries = splitTopLevel(inner, ',').map { kv =>
      val colon = indexOfTopLevel(kv, ':')
      s"${kv.take(colon).trim}, ${mapLiterals(kv.drop(colon + 1).trim)}"
    }
    sql.substring(0, open) + s"map(${entries.mkString(", ")})" +
      mapLiterals(sql.substring(j + 1))
  }

  /** `ORDER BY <window expr>` — the reference evaluates window
    * functions in the sort clause; Spark doesn't, so hoist each such
    * item into the select list of a wrapping subquery.
    */
  private def rewriteWindowInOrderBy(sql: String): String = {
    val oIdx = lastIndexOfKeyword(sql, "ORDER")
    if (oIdx < 0) return sql
    val byM = """(?is)^ORDER\s+BY\s+""".r.findPrefixMatchOf(sql.substring(oIdx))
    if (byM.isEmpty) return sql
    val itemsStart = oIdx + byM.get.end
    val after = sql.substring(itemsStart)
    val stops = Seq("LIMIT", "OFFSET", "SETTINGS")
      .map(k => indexOfKeyword(after, k)).filter(_ >= 0)
    val itemsEnd = if (stops.isEmpty) after.length else stops.min
    val itemsTxt = after.substring(0, itemsEnd)
    val tail = after.substring(itemsEnd)
    val items = splitTopLevel(itemsTxt, ',').map(_.trim).filter(_.nonEmpty)
    if (!items.exists(it => indexOfKeyword(it, "OVER") >= 0)) return sql
    val head = sql.substring(0, oIdx)
    val selIdx = indexOfKeyword(head, "SELECT")
    val fromIdx = indexOfKeyword(head, "FROM", selIdx)
    if (selIdx < 0 || fromIdx < selIdx) return sql
    val hoisted = mutable.Buffer[String]()
    val newItems = items.map { it =>
      if (indexOfKeyword(it, "OVER") < 0) it
      else {
        val dm = """(?is)^(.*?)(\s+(?:ASC|DESC))?(\s+NULLS\s+(?:FIRST|LAST))?\s*$""".r
          .findFirstMatchIn(it).get
        val alias = s"__ord${hoisted.size}__"
        hoisted += s"(${dm.group(1).trim}) AS $alias"
        alias + Option(dm.group(2)).getOrElse("") + Option(dm.group(3)).getOrElse("")
      }
    }
    val inner = head.substring(0, fromIdx) + ", " + hoisted.mkString(", ") +
      " " + head.substring(fromIdx)
    val drop = hoisted.indices.map(i => s"__ord${i}__").mkString(", ")
    s"SELECT * EXCEPT ($drop) FROM ($inner) __ord_q ORDER BY ${newItems.mkString(", ")} $tail"
  }

  private final class StarBail extends RuntimeException(null, null, false, false)

  /** output columns of a FROM-position relation (named table or
    * parenthesized derived table text), via a LIMIT-0 analyze
    */
  private def relationColumns(fromText: String): Option[Seq[String]] =
    try Some(spark.sql(rewriteReads(s"SELECT * FROM $fromText LIMIT 0")).columns.toSeq)
    catch { case _: Exception => None }

  /** Reference star-expansion order over USING/NATURAL joins
    * (duckdb/crdb corpus; reference binder keeps the merged column at
    * the PRESERVED side's declared position — left-table layout for
    * INNER/LEFT, right-table layout for RIGHT — while Spark hoists the
    * coalesced join columns to the front). Rewrites a top-level bare
    * `SELECT * FROM <named-table join chain>` into the explicit
    * qualified column list; also raises the reference's 1065 errors
    * for a USING column missing from one side and for an unaliased
    * relation repeated in a USING/NATURAL chain. Any shape the parser
    * doesn't fully understand is left untouched for Spark.
    */
  private def rewriteUsingStar(sql0: String): String =
    try rewriteUsingStar0(sql0)
    catch {
      case _: StarBail => sql0
      case e: IllegalArgumentException
          if String.valueOf(e.getMessage).startsWith("1065") => throw e
      case _: Exception => sql0
    }

  private def rewriteUsingStar0(sql0: String): String = {
    def bail(): Nothing = throw new StarBail
    val mSel = """(?is)^\s*SELECT\s+\*\s+FROM\b""".r
      .findFirstMatchIn(sql0).getOrElse(bail())
    val rest = sql0.substring(mSel.end)
    if ("""(?i)\b(USING|NATURAL)\b""".r.findFirstIn(rest).isEmpty) bail()
    val stops = Seq("WHERE", "GROUP", "HAVING", "QUALIFY", "WINDOW", "ORDER",
      "LIMIT", "OFFSET", "UNION", "INTERSECT", "EXCEPT", "SETTINGS", "FETCH")
    val cut = stops.map(k => indexOfKeyword(rest, k)).filter(_ >= 0)
      .reduceOption(_ min _).getOrElse(rest.length)
    val segText = rest.substring(0, cut)
    val tail = rest.substring(cut)
    var seg = segText.trim.stripSuffix(";").trim
    // unwrap covering paren groups: FROM (a JOIN b USING(x))
    while (seg.startsWith("(") && matchParen(seg, 0) == seg.length - 1)
      seg = seg.substring(1, seg.length - 1).trim
    if (indexOfKeyword(seg, "USING") < 0 && indexOfKeyword(seg, "NATURAL") < 0)
      bail()

    val joinKw = Set("JOIN", "NATURAL", "INNER", "LEFT", "RIGHT", "FULL",
      "CROSS", "OUTER", "SEMI", "ANTI", "ASOF", "ANY", "ON", "USING")
    var i = 0
    def ws(): Unit = while (i < seg.length && seg.charAt(i).isWhitespace) i += 1
    def peekWord(): Option[String] = {
      ws(); """^[A-Za-z_]\w*""".r.findPrefixOf(seg.substring(i))
    }
    def takeWord(): String = {
      val w = peekWord().getOrElse(bail()); i += w.length; w
    }

    case class Rel(alias: String, cols: Seq[String])
    def parseRel(): Rel = {
      ws()
      if (i >= seg.length) bail()
      if (seg.charAt(i) == '(') {
        // derived table: ( <subquery> ) [AS] alias [(col, ...)]
        val close = matchParen(seg, i)
        val body = seg.substring(i + 1, close)
        i = close + 1
        var alias: String = null
        peekWord() match {
          case Some(w) if w.equalsIgnoreCase("AS") =>
            i += w.length; alias = takeWord()
          case Some(w) if !joinKw(w.toUpperCase) => i += w.length; alias = w
          case _ => bail()
        }
        ws()
        val cols: Seq[String] =
          if (i < seg.length && seg.charAt(i) == '(') {
            val c2 = matchParen(seg, i)
            val lst = splitTopLevel(seg.substring(i + 1, c2), ',')
              .map(_.trim.stripPrefix("`").stripSuffix("`"))
            i = c2 + 1
            lst
          } else relationColumns(s"($body) __sq__").getOrElse(bail())
        Rel(alias, cols)
      } else {
        val name = takeWord()
        if (joinKw(name.toUpperCase)) bail()
        var alias = name
        peekWord() match {
          case Some(w) if w.equalsIgnoreCase("AS") =>
            i += w.length; alias = takeWord()
          case Some(w) if !joinKw(w.toUpperCase) => i += w.length; alias = w
          case _ =>
        }
        Rel(alias, relationColumns(name).getOrElse(bail()))
      }
    }

    def consumeOn(): Unit = {
      val boundary = Set("JOIN", "NATURAL", "INNER", "LEFT", "RIGHT", "FULL",
        "CROSS", "SEMI", "ANTI", "ASOF")
      while (i < seg.length) {
        val c = seg.charAt(i)
        if (c == '(') i = matchParen(seg, i) + 1
        else if (c == '\'' || c == '"' || c == '`') {
          val q = c; i += 1
          while (i < seg.length && seg.charAt(i) != q) i += 1
          i += 1
        } else if (c == ',') return
        else if (c.isLetter || c == '_') {
          val w = """^[A-Za-z_]\w*""".r.findPrefixOf(seg.substring(i)).get
          if (boundary(w.toUpperCase)) return
          i += w.length
        } else i += 1
      }
    }

    def appended(left: Vector[(String, String)], r: Rel) =
      left ++ r.cols.map(c => (s"${r.alias}.`$c`", c))

    def mergeUsing(left: Vector[(String, String)], right: Rel,
        ucols: Seq[String], jt: String): Vector[(String, String)] = {
      if (jt != "INNER" && jt != "LEFT" && jt != "RIGHT") bail()
      val uset = ucols.map(_.toLowerCase).toSet
      for (u <- ucols) {
        val inL = left.count(_._2.equalsIgnoreCase(u))
        val inR = right.cols.count(_.equalsIgnoreCase(u))
        if (inL == 0 || inR == 0) throw new IllegalArgumentException(
          s"1065: column $u specified in USING clause does not exist in " +
            (if (inL == 0) "left" else "right") + " table")
        if (inL > 1 || inR > 1) bail()
      }
      if (jt == "RIGHT")
        left.filterNot(c => uset(c._2.toLowerCase)) ++
          right.cols.map(c => (s"${right.alias}.`$c`", c))
      else
        left ++ right.cols.filterNot(c => uset(c.toLowerCase))
          .map(c => (s"${right.alias}.`$c`", c))
    }

    val first = parseRel()
    var out: Vector[(String, String)] =
      first.cols.map(c => (s"${first.alias}.`$c`", c)).toVector
    val seen = mutable.Buffer[String](first.alias.toLowerCase)
    var sawUsing = false
    var rewriteNeeded = false

    while ({ ws(); i < seg.length }) {
      if (seg.charAt(i) == ',') { i += 1; val r = parseRel(); seen += r.alias.toLowerCase; out = appended(out, r) }
      else {
        var natural = false
        var jt = "INNER"
        var w = takeWord().toUpperCase
        if (w == "NATURAL") { natural = true; w = takeWord().toUpperCase }
        w match {
          case "INNER" | "CROSS" => jt = w; w = takeWord().toUpperCase
          case "LEFT" | "RIGHT" | "FULL" =>
            jt = w; w = takeWord().toUpperCase
            if (w == "OUTER") w = takeWord().toUpperCase
          case _ =>
        }
        if (w != "JOIN") bail()
        val r = parseRel()
        seen += r.alias.toLowerCase
        val clause = peekWord().map(_.toUpperCase)
        if (natural) {
          if (clause.contains("ON") || clause.contains("USING")) bail()
          val rightSet = r.cols.map(_.toLowerCase).toSet
          val common = out.map(_._2).filter(n => rightSet(n.toLowerCase)).distinct
          if (common.isEmpty) bail()
          sawUsing = true
          out = mergeUsing(out, r, common, jt)
          rewriteNeeded = true
        } else clause match {
          case Some("USING") =>
            i += "USING".length; ws()
            if (i >= seg.length || seg.charAt(i) != '(') bail()
            val close = matchParen(seg, i)
            val ucols = splitTopLevel(seg.substring(i + 1, close), ',')
              .map(_.trim.stripPrefix("`").stripSuffix("`"))
            i = close + 1
            sawUsing = true
            out = mergeUsing(out, r, ucols, jt)
            rewriteNeeded = true
          case Some("ON") =>
            i += 2; consumeOn(); out = appended(out, r)
          case _ if jt == "CROSS" => out = appended(out, r)
          case _ => bail()
        }
      }
    }
    if (sawUsing && seen.distinct.size != seen.size) {
      val dup = seen.diff(seen.distinct).head
      throw new IllegalArgumentException(
        s"1065: table name '$dup' specified more than once")
    }
    if (!rewriteNeeded) bail()
    val sel = out.map { case (e, n) => s"$e AS `$n`" }.mkString(", ")
    s"SELECT $sel FROM $segText$tail"
  }

  /** `FROM (VALUES (..),(..))` with no explicit column list — the
    * reference's inline-table columns are col0..colN-1 (0-based),
    * Spark's col1..colN. Append the 0-based list (keeping any bare
    * table alias); explicit `t(a,b)` lists pass through untouched.
    */
  private def rewriteValuesColNames(sql0: String): String = {
    var sql = sql0
    val re = """(?i)\(\s*VALUES\s*\(""".r
    var searchFrom = 0
    var guard = 0
    while (guard < 50) {
      guard += 1
      val m0 = re.findFirstMatchIn(sql.substring(searchFrom))
      if (m0.isEmpty) return sql
      val m = m0.get
      val open = searchFrom + m.start
      // LATERAL (VALUES ...) is handled by rewriteLateralValues; a
      // CTE body `name(cols) AS (VALUES ...)` already names its
      // columns through the WITH list — aliasing it would splice
      // `__vals(...)` into the WITH clause and corrupt the statement
      val before = sql.substring(0, open).trim.toUpperCase
      val close = matchParen(sql, open)
      if (close < 0) return sql
      if (before.endsWith("LATERAL") || """(?s).*\bAS$""".r.matches(before))
        searchFrom = close
      else {
        val after = sql.substring(close + 1)
        val aliasCols = """(?is)^\s*(?:AS\s+)?\w+\s*\(""".r.findPrefixMatchOf(after)
        val bareAlias = """(?is)^\s*(?:AS\s+)?([A-Za-z_]\w*)""".r.findPrefixMatchOf(after)
          .filterNot(a => Set("WHERE", "GROUP", "ORDER", "LIMIT", "HAVING",
            "UNION", "EXCEPT", "INTERSECT", "JOIN", "ON", "LEFT", "RIGHT",
            "FULL", "INNER", "CROSS", "AS", "QUALIFY", "WINDOW", "SETTINGS",
            "SELECT", "NATURAL", "USING", "SEMI", "ANTI", "LATERAL")(
            a.group(1).toUpperCase))
        if (aliasCols.isDefined) searchFrom = close
        else {
          val body = sql.substring(open + 1, close).trim
            .replaceAll("(?is)^VALUES\\s*", "")
          val firstRow = splitTopLevel(body, ',').headOption.map(_.trim)
          val arity = firstRow match {
            case Some(r) if r.startsWith("(") && matchParen(r, 0) == r.length - 1 =>
              splitTopLevel(r.substring(1, r.length - 1), ',').length
            case _ => -1
          }
          if (arity <= 0) searchFrom = close
          else {
            val cols = (0 until arity).map(i => s"col$i").mkString(", ")
            val (aliasTxt, tailStart) = bareAlias match {
              case Some(a) => (s" ${a.group(1)}($cols)", close + 1 + a.end)
              case None => (s" __vals($cols)", close + 1)
            }
            sql = sql.substring(0, close + 1) + aliasTxt + sql.substring(tailStart)
            searchFrom = close + aliasTxt.length
          }
        }
      }
    }
    sql
  }

  private val LateralValuesRe = """(?i)\bLATERAL\s*\(\s*VALUES\b""".r

  private def rewriteLateralValues(sql: String): String = {
    val m0 = LateralValuesRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = sql.indexOf('(', m.start)
    val close = matchParen(sql, open)
    val body = sql.substring(open + 1, close).trim
    val rowsTxt = body.replaceAll("(?is)^VALUES\\s*", "")
    val rows = splitTopLevel(rowsTxt, ',').map(_.trim).filter(_.nonEmpty)
    val selects = rows.map { r =>
      require(r.startsWith("(") && r.endsWith(")"), s"bad VALUES row: $r")
      "SELECT " + r.substring(1, r.length - 1)
    }
    sql.substring(0, open) + "(" + selects.mkString(" UNION ALL ") + ")" +
      rewriteLateralValues(sql.substring(close + 1))
  }

  /** standalone `FROM flatten(input => x [, path => 'p']
    * [, outer => true])` (reference flatten TVF, 02_0068) — the
    * six-column (seq, key, path, index, value, this) table form;
    * `outer => true` keeps a NULL row for empty input like the
    * reference (LATERAL VIEW OUTER).
    */
  private def rewriteStandaloneFlatten(sql: String): String = {
    val re = """(?i)\b(FROM|JOIN)(\s+)FLATTEN\s*\(""".r
    val m0 = re.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = m.end - 1
    val close = matchParen(sql, open)
    if (close < 0) return sql
    var input: String = null; var path: String = null; var outer = false
    var recursive = "false"; var mode = "both"
    splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim).foreach { a =>
      """(?is)^(\w+)\s*=>\s*(.*)$""".r.findFirstMatchIn(a) match {
        case Some(x) if x.group(1).equalsIgnoreCase("input") => input = x.group(2).trim
        case Some(x) if x.group(1).equalsIgnoreCase("path") => path = x.group(2).trim
        case Some(x) if x.group(1).equalsIgnoreCase("outer") =>
          outer = x.group(2).trim.equalsIgnoreCase("true")
        case Some(x) if x.group(1).equalsIgnoreCase("recursive") =>
          recursive = x.group(2).trim.toLowerCase
        case Some(x) if x.group(1).equalsIgnoreCase("mode") =>
          mode = x.group(2).trim.stripPrefix("'").stripSuffix("'").toLowerCase
        case _ => if (input == null) input = a
      }
    }
    if (input == null) return sql
    val in = Option(path)
      .map(p => s"try_variant_get($input, '$$.' || $p)").getOrElse(input)
    val pfx = Option(path).getOrElse("''")
    val ov = if (outer) "OUTER " else ""
    val sub = s"(SELECT 1 AS seq, f.key, f.path, f.index, f.value, f.this " +
      s"FROM (SELECT 1 AS __seed) LATERAL VIEW ${ov}flatten_variant($in, $pfx, " +
      s"'$recursive', '$mode') f AS key, path, index, value, this)"
    sql.substring(0, m.start) + m.group(1) + m.group(2) + sub +
      rewriteStandaloneFlatten(sql.substring(close + 1))
  }

  private val LateralTvfRe = """(?i),?\s*\bLATERAL\s+(FLATTEN|UNNEST)\s*\(""".r

  /** `FROM t, LATERAL FLATTEN(input => x [, path => 'p']) f` and
    * `, LATERAL unnest(x) f` (the reference's variant table factors,
    * lateral.test) — Spark has no lateral table functions by that
    * name, but the same join is exactly a LATERAL VIEW over a
    * generator: FLATTEN -> the VariantFlatten generator (key, path,
    * index, value, this), unnest -> variant_explode (pos, key, value).
    */
  private def rewriteLateralTvf(sql: String): String = {
    val m0 = LateralTvfRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val open = m.end - 1
    val close = matchParen(sql, open)
    val args = splitTopLevel(sql.substring(open + 1, close), ',').map(_.trim)
    // named (input =>, path =>) or positional arguments
    var input: String = null; var path: String = null
    args.foreach { a =>
      val nm = """(?is)^(\w+)\s*=>\s*(.*)$""".r.findFirstMatchIn(a)
      nm match {
        case Some(x) if x.group(1).equalsIgnoreCase("input") => input = x.group(2).trim
        case Some(x) if x.group(1).equalsIgnoreCase("path") => path = x.group(2).trim
        case _ => if (input == null) input = a else if (path == null) path = a
      }
    }
    require(input != null, s"LATERAL ${m.group(1)} needs an input argument")
    // alias after the closing paren
    val am = """(?is)^\s*(?:AS\s+)?(\w+)""".r.findPrefixMatchOf(sql.substring(close + 1))
    val alias = am.map(_.group(1)).getOrElse("f")
    val tailStart = close + 1 + am.map(_.end).getOrElse(0)
    val gen =
      if (m.group(1).equalsIgnoreCase("FLATTEN")) {
        val in = Option(path)
          .map(p => s"try_variant_get($input, '$$.' || $p)")
          .getOrElse(input)
        val pfx = Option(path).getOrElse("''")
        s"LATERAL VIEW flatten_variant($in, $pfx) $alias AS key, path, index, value, this"
      } else // unnest: same generator, array elements carry NULL keys
        s"LATERAL VIEW flatten_variant($input, '') $alias AS key, path, index, value, this"
    sql.substring(0, m.start) + " " + gen +
      rewriteLateralTvf(sql.substring(tailStart))
  }

  /** databend's variant path accessor `x:a.b[0]` / `x:a:b`
    * (ast/expr.rs MapAccessor colon form) -> Spark's native
    * try_variant_get with a JSON path. `::` casts are left alone.
    */
  private def rewriteColonPaths(sql: String): String = {
    val ColonRe =
      ("""(?<![:\w`'"])([A-Za-z_]\w*(?:\.[A-Za-z_]\w*)*)\s*(?<!:):(?!:)""" +
       """((?:`[^`]+`|[A-Za-z_]\w*)(?:\.(?:`[^`]+`|[A-Za-z_]\w*)|\[\d+\]|:(?:`[^`]+`|[A-Za-z_]\w*))*)""").r
    lazy val colTypes = mentionedColumnTypes(sql)
    // quote-aware: apply only outside string literals
    val sb = new StringBuilder(sql.length)
    var i = 0; var q: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; sb += c; i += 1 }
      else ColonRe.findPrefixMatchOf(sql.substring(i)) match {
        case Some(mm) =>
          val base = mm.group(1)
          val leafType = colTypes.get(base.toLowerCase.split('.').last)
          if (KeywordsBeforeColon(base.toUpperCase)) { sb += c; i += 1 }
          else if (leafType.exists(_.isInstanceOf[org.apache.spark.sql.types.StructType])) {
            // tuple column: the same colon syntax is field access
            // (insert_into_tuple.test) — emit plain struct navigation
            val segs = splitPathSegs(mm.group(2))
            sb.append(base + segs.map {
              case s if s.startsWith("[") => s
              case s if s.startsWith("`") => "." + s
              case s => ".`" + s + "`"
            }.mkString)
            i += mm.end
          } else if (leafType.exists(_.isInstanceOf[org.apache.spark.sql.types.MapType])) {
            // map column: colon looks the key up (insert_into_map.test)
            val segs = splitPathSegs(mm.group(2))
            val key = segs.head.stripPrefix("`").stripSuffix("`")
            sb.append(s"try_element_at($base, '$key')" + segs.tail.map {
              case s if s.startsWith("[") => s
              case s => "." + s
            }.mkString)
            i += mm.end
          } else {
            val segs = splitPathSegs(mm.group(2))
            val jp = segs.map {
              case s if s.startsWith("[") => s
              case s => "." + s.stripPrefix("`").stripSuffix("`")
            }.mkString
            // Spark can't compare VARIANT values; databend compares a
            // variant against a literal as jsonb (string literal ->
            // jsonb string, number -> numeric compare). When the path
            // is directly compared to a literal, emit the typed form.
            val rest = sql.substring(i + mm.end)
            val inM = """(?is)^\s*(NOT\s+)?IN\s*\(""".r.findPrefixMatchOf(rest)
            val cmp = """(?s)^\s*(=|!=|<>)\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)"""
              .r.findPrefixMatchOf(rest)
            if (inM.isDefined) {
              // `path IN (...)`: string-literal lists compare as jsonb
              // strings (text form); numeric lists and subqueries via a
              // typed numeric get — the reference's jsonb coercions
              val open = inM.get.end - 1
              val close = matchParen(rest, open)
              val inner = rest.substring(open + 1, close)
              val not = if (inM.get.group(1) != null) "NOT " else ""
              val items = splitTopLevel(inner, ',').map(_.trim)
              val allStrings = items.nonEmpty && items.forall(s =>
                s.startsWith("'") && s.endsWith("'"))
              val isSubquery = inner.trim.toUpperCase.startsWith("SELECT") ||
                inner.trim.toUpperCase.startsWith("WITH")
              if (isSubquery) {
                // IN (subquery): compare numerically on both sides —
                // the subquery may itself produce variants (colon
                // paths), which cast to DOUBLE like the probe side
                sb.append(s"try_variant_get($base, '$$$jp', 'double') ${not}IN " +
                  s"(SELECT CAST(__v AS DOUBLE) FROM (${rewriteColonPaths(inner)}) __vq(__v))")
              } else if (allStrings) {
                val jsonLits = items.map { it =>
                  val v = it.stripPrefix("'").stripSuffix("'").replace("''", "'")
                  val j = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
                  "'" + j.replace("'", "''") + "'"
                }
                sb.append(s"to_json(try_variant_get($base, '$$$jp')) ${not}IN (${jsonLits.mkString(", ")})")
              } else
                sb.append(s"try_variant_get($base, '$$$jp', 'double') ${not}IN (${rewriteColonPaths(inner)})")
              i += mm.end + close + 1
            } else cmp match {
              case Some(cm) if cm.group(2).startsWith("'") =>
                val inner = cm.group(2).stripPrefix("'").stripSuffix("'")
                  .replace("''", "'")
                val jsonLit = "\"" + inner.replace("\\", "\\\\")
                  .replace("\"", "\\\"") + "\""
                val sqlLit = "'" + jsonLit.replace("'", "''") + "'"
                sb.append(s"to_json(try_variant_get($base, '$$$jp')) ${cm.group(1)} $sqlLit")
                i += mm.end + cm.end
              case Some(cm) =>
                sb.append(
                  s"try_variant_get($base, '$$$jp', 'double') ${cm.group(1)} ${cm.group(2)}")
                i += mm.end + cm.end
              case None =>
                sb.append(s"try_variant_get($base, '$$$jp')")
                i += mm.end
            }
          }
        case None => sb += c; i += 1
      }
    }
    sb.toString
  }

  private val KeywordsBeforeColon = Set[String]() // reserved for future guards

  /** columns (lowercased leaf name -> type) of every table this
    * statement mentions — used to dispatch subscript/colon accessors
    * by column type
    */
  private def mentionedColumnTypes(
      sql: String): Map[String, org.apache.spark.sql.types.DataType] =
    tables.iterator.filter { case (k, _) =>
      wordRe(k.split('.').last).findFirstIn(sql).isDefined
    }.flatMap { case (_, t) =>
      t.read().schema.fields.map(f => f.name.toLowerCase -> f.dataType)
    }.toMap

  /** `WHERE <int column>` / `WHERE [NOT] <int column>`: databend
    * (MySQL dialect) treats a numeric filter as `<> 0`; Spark rejects
    * non-boolean filters. Only the bare-[NOT-]column clause form is
    * rewritten, using the mentioned tables' schemas.
    */
  private def rewriteIntFilter(sql0: String): String = {
    if (indexOfKeywordAnyDepth(sql0, "WHERE", 0) < 0) return sql0
    lazy val colTypes = mentionedColumnTypes(sql0)
    val intTypes: Set[org.apache.spark.sql.types.DataType] = {
      import org.apache.spark.sql.types._
      Set(ByteType, ShortType, IntegerType, LongType)
    }
    val BareRe = """(?s)^\s*(\(\s*)?(NOT\s+)?([A-Za-z_]\w*(?:\.\w+)?)\s*(\)\s*)?$""".r
    var sql = sql0; var pos = 0
    while (true) {
      val w = indexOfKeywordAnyDepth(sql, "WHERE", pos)
      if (w < 0) return sql
      val start = w + "WHERE".length
      val end = clauseEnd(sql, start, FromEnders ++ Set("HAVING"))
      val clause = sql.substring(start, end)
      BareRe.findFirstMatchIn(clause) match {
        case Some(m) if m.group(3) != null &&
            colTypes.get(m.group(3).toLowerCase.split('.').last)
              .exists(intTypes.contains) =>
          val not = if (m.group(2) != null) "NOT " else ""
          val repl = s" $not(${m.group(3)} <> 0) "
          sql = sql.substring(0, start) + repl + sql.substring(end)
          pos = start + repl.length
        case _ => pos = end
      }
    }
    sql
  }

  /** rewrite `X[e]` subscripts (identifier / call / chained bases) to
    * try_element_at (1-based arrays with NULL at 0, map lookups);
    * integer subscripts on VARIANT columns become jsonb paths (0-based)
    */
  private def rewriteSubscripts(sql: String): String = {
    if (sql.indexOf('[') < 0) return sql
    lazy val colTypes = mentionedColumnTypes(sql)
    val sb = new StringBuilder(sql.length + 16)
    var i = 0; var q: Char = 0
    def baseChar(c: Char) = c.isLetterOrDigit || "_.$`".contains(c)
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '`') { q = c; sb += c; i += 1 }
      else if (c == '[') {
        var e = sb.length - 1
        while (e >= 0 && sb.charAt(e).isWhitespace) e -= 1
        val anchor = if (e >= 0) sb.charAt(e) else ' '
        if (!(anchor.isLetterOrDigit || anchor == '_' || anchor == ')' ||
              anchor == '`')) { sb += c; i += 1 }
        else {
          // find the matching ]
          var depth = 0; var j = i; var q2: Char = 0
          while (j < sql.length && {
            val cj = sql.charAt(j)
            if (q2 != 0) { if (cj == q2) q2 = 0 }
            else if (cj == '\'' || cj == '`') q2 = cj
            else if (cj == '[') depth += 1
            else if (cj == ']') depth -= 1
            depth != 0 || sql.charAt(j) != ']'
          }) j += 1
          val close = j
          val subExpr = rewriteSubscripts(sql.substring(i + 1, close))
          // base span in sb
          var s0 = e
          if (sb.charAt(e) == ')') {
            var d = 0
            while (s0 >= 0 && { val cc = sb.charAt(s0)
              if (cc == ')') d += 1 else if (cc == '(') d -= 1
              d != 0 }) s0 -= 1
            s0 -= 1
            while (s0 >= 0 && baseChar(sb.charAt(s0))) s0 -= 1
          } else {
            while (s0 >= 0 && baseChar(sb.charAt(s0))) s0 -= 1
          }
          // absorb a `::type` cast base ('...'::json[k]): the cast's
          // operand is part of the subscripted primary
          while (s0 >= 1 && sb.charAt(s0) == ':' && sb.charAt(s0 - 1) == ':') {
            s0 -= 2
            if (s0 >= 0 && sb.charAt(s0) == '\'') {
              s0 -= 1
              while (s0 >= 0 && sb.charAt(s0) != '\'') s0 -= 1
              s0 -= 1
            } else if (s0 >= 0 && sb.charAt(s0) == ')') {
              var d = 0
              while (s0 >= 0 && { val cc = sb.charAt(s0)
                if (cc == ')') d += 1 else if (cc == '(') d -= 1
                d != 0 }) s0 -= 1
              s0 -= 1
              while (s0 >= 0 && baseChar(sb.charAt(s0))) s0 -= 1
            } else {
              while (s0 >= 0 && baseChar(sb.charAt(s0))) s0 -= 1
            }
          }
          val base = sb.substring(s0 + 1, e + 1)
          val leaf = base.toLowerCase.split('.').last.replace("`", "")
          val isVariant =
            colTypes.get(leaf).contains(org.apache.spark.sql.types.VariantType)
          val isArrayCol = colTypes.get(leaf)
            .exists(_.isInstanceOf[org.apache.spark.sql.types.ArrayType])
          val isMapCol = colTypes.get(leaf)
            .exists(_.isInstanceOf[org.apache.spark.sql.types.MapType])
          sb.setLength(s0 + 1)
          if (isVariant && subExpr.trim.matches("-?\\d+"))
            sb.append(s"try_variant_get($base, '$$[${subExpr.trim}]')")
          else if (isMapCol)
            // map lookup: keys pass through verbatim (0/negative int
            // keys are legitimate map keys)
            sb.append(s"try_element_at($base, $subExpr)")
          else if (isArrayCol && subExpr.trim.matches("-?\\d+"))
            sb.append(
              // 1-based array subscript: index < 1 yields NULL (the
              // reference's UInt64 index neither hits 0 nor goes
              // negative) rather than Spark's error / from-the-end read
              if (subExpr.trim.toLong < 1) s"try_element_at($base, CAST(NULL AS INT))"
              else s"try_element_at($base, $subExpr)")
          else if (isArrayCol)
            // non-literal index on a known array column: guard runtime
            // zero/negative values the same way (Spark would throw
            // SQL_ARRAY_INDEX_START_AT_ONE on 0, read backwards on <0)
            sb.append(s"try_element_at($base, CASE WHEN ($subExpr) < 1 " +
              s"THEN CAST(NULL AS INT) ELSE ($subExpr) END)")
          else
            // unknown base type (call results, aliases): `get` is the
            // type-dispatched marker — VARIANT navigates 0-based,
            // arrays keep the 1-based NULL-below-1 guard
            // (GraftCoercionRule.GetMarker)
            sb.append(s"get($base, $subExpr)")
          i = close + 1
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** split `a.b[0]:c` accessor text into segments (idents, [n]) */
  private def splitPathSegs(p: String): Seq[String] = {
    val out = mutable.Buffer[String]()
    var i = 0
    while (i < p.length) {
      p.charAt(i) match {
        case '.' | ':' => i += 1
        case '[' =>
          val e = p.indexOf(']', i)
          out += p.substring(i, e + 1); i = e + 1
        case '`' =>
          val e = p.indexOf('`', i + 1)
          out += p.substring(i, e + 1); i = e + 1
        case _ =>
          val start = i
          while (i < p.length && (p.charAt(i).isLetterOrDigit || p.charAt(i) == '_')) i += 1
          out += p.substring(start, i)
      }
    }
    out.toSeq
  }

  private val WithinGroupRe = """(?i)\bWITHIN\s+GROUP\s*\(""".r

  /** `listagg/string_agg/array_agg(x[, d]) WITHIN GROUP (ORDER BY k
    * [DESC])` — the reference's ordered-set aggregate syntax
    * (aggregator.rs listagg) — expanded onto Spark primitives:
    * collect the (key, value) pairs (as an aggregate OR a window,
    * whichever the original was), sort by key with a comparator that
    * keeps NULL keys last in both directions (the reference's
    * behavior), then project values and join. NULL values are skipped
    * like the reference by collecting a NULL element for them.
    */
  private def rewriteWithinGroup(sql: String): String = {
    val m0 = WithinGroupRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    // the aggregate call directly precedes WITHIN GROUP
    var e = m.start - 1
    while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
    require(e >= 0 && sql.charAt(e) == ')', s"WITHIN GROUP without aggregate: $sql")
    // scan back to the matching '('
    var depth = 0; var i = e
    while (i >= 0 && { val c = sql.charAt(i)
      if (c == ')') depth += 1 else if (c == '(') depth -= 1; depth != 0 }) i -= 1
    val argsOpen = i
    var f = argsOpen - 1
    while (f >= 0 && sql.charAt(f).isWhitespace) f -= 1
    val fnEnd = f + 1
    while (f >= 0 && (sql.charAt(f).isLetterOrDigit || sql.charAt(f) == '_')) f -= 1
    val fnStart = f + 1
    val fn = sql.substring(fnStart, fnEnd).toLowerCase
    val args = splitTopLevel(sql.substring(argsOpen + 1, e), ',').map(_.trim)
    // ORDER BY inside WITHIN GROUP (...)
    val wgOpen = m.end - 1
    val wgClose = matchParen(sql, wgOpen)
    val ob = sql.substring(wgOpen + 1, wgClose).trim
    val obm =
      """(?is)^ORDER\s+BY\s+(.+?)(\s+ASC|\s+DESC)?(\s+NULLS\s+(?:FIRST|LAST))?\s*$""".r
        .findFirstMatchIn(ob)
        .getOrElse(throw new IllegalArgumentException(s"WITHIN GROUP needs ORDER BY: $ob"))
    val key = obm.group(1).trim
    val desc = Option(obm.group(2)).exists(_.trim.equalsIgnoreCase("DESC"))
    // reference default: NULL keys sort last in either direction
    val nullsFirst = Option(obm.group(3)).exists(_.trim.toUpperCase.endsWith("FIRST"))
    // optional OVER (...) / OVER name after WITHIN GROUP
    var tailStart = wgClose + 1
    var over = ""
    val overM = """(?is)^\s*OVER\s*(\(|\w+)""".r.findPrefixMatchOf(sql.substring(tailStart))
    overM.foreach { om =>
      if (om.group(1) == "(") {
        val oOpen = tailStart + om.end - 1
        val oClose = matchParen(sql, oOpen)
        over = " OVER (" + sql.substring(oOpen + 1, oClose) + ")"
        tailStart = oClose + 1
      } else {
        over = " OVER " + om.group(1)
        tailStart = tailStart + om.end
      }
    }
    val (lt, gt) = if (desc) ("1", "-1") else ("-1", "1")
    val (nl, nr) = if (nullsFirst) ("-1", "1") else ("1", "-1")
    val cmp = s"(l, r) -> CASE WHEN l.k IS NULL AND r.k IS NULL THEN 0 " +
      s"WHEN l.k IS NULL THEN $nl WHEN r.k IS NULL THEN $nr " +
      s"WHEN l.k < r.k THEN $lt WHEN l.k > r.k THEN $gt ELSE 0 END"
    val value = args.headOption.getOrElse(
      throw new IllegalArgumentException(s"$fn WITHIN GROUP needs arguments"))
    val pairs = s"CASE WHEN ($value) IS NOT NULL THEN struct(($key) AS k, ($value) AS v) END"
    val sorted = s"array_sort(collect_list($pairs)$over, $cmp)"
    val values = s"transform($sorted, s -> s.v)"
    val replacement = fn match {
      case "listagg" | "string_agg" | "group_concat" =>
        val delim = if (args.length > 1) args(1) else "''"
        s"array_join($values, $delim)"
      case "array_agg" | "collect_list" => values
      case other =>
        throw new IllegalArgumentException(s"WITHIN GROUP unsupported for $other")
    }
    sql.substring(0, fnStart) + replacement +
      rewriteWithinGroup(sql.substring(tailStart))
  }

  /** Named-window handling: resolve a top-level WINDOW clause — with
    * databend's forward references and PostgreSQL-style inheritance
    * (`w2 AS (w1 ORDER BY s)`) — then INLINE every `OVER name` and drop
    * the clause. Inlining sidesteps every Spark named-window
    * restriction at once (no refinement, no forward refs, no window
    * refs in ORDER BY). Also normalizes rank-family windows the way
    * the reference binds them: explicit frames are ignored, and an
    * unordered ranking window means "everything ties".
    */
  private def rewriteWindows(sql0: String): String = {
    var sql = sql0
    val wIdx = indexOfKeyword(sql, "WINDOW")
    if (wIdx >= 0) {
      val defs = mutable.LinkedHashMap[String, String]()
      var i = wIdx + "WINDOW".length
      var endIdx = -1
      var more = true
      val DefHead = """(?is)^\s*(\w+)\s+AS\s*\(""".r
      while (more) {
        DefHead.findPrefixMatchOf(sql.substring(i)) match {
          case None => more = false
          case Some(mm) =>
            val name = mm.group(1).toLowerCase
            val open = i + mm.end - 1
            val close = matchParen(sql, open)
            if (defs.contains(name)) throw new IllegalArgumentException(
              s"1065: Duplicate window name: $name")
            defs(name) = sql.substring(open + 1, close).trim
            var j = close + 1
            while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
            endIdx = close + 1
            if (j < sql.length && sql.charAt(j) == ',') i = j + 1
            else more = false
        }
      }
      if (defs.nonEmpty) {
        // inheritance / references to fixpoint (forward refs allowed)
        var changed = true; var rounds = 0
        while (changed && rounds < 10) {
          changed = false; rounds += 1
          for (n <- defs.keys.toSeq) {
            """(?s)^(\w+)\b(.*)""".r.findFirstMatchIn(defs(n)).foreach { lm =>
              val ref = lm.group(1).toLowerCase
              if (ref != n && defs.contains(ref)) {
                defs(n) = (defs(ref) + " " + lm.group(2).trim).trim
                changed = true
              }
            }
          }
        }
        sql = sql.substring(0, wIdx) + sql.substring(endIdx)
        for ((n, spec) <- defs)
          sql = ("(?i)\\bOVER\\s+" + n + "\\b").r.replaceAllIn(sql,
            scala.util.matching.Regex.quoteReplacement(s"OVER ($spec)"))
      }
    }
    fixRankWindows(sql)
  }

  private val RankOverRe =
    ("""(?i)\b(rank|dense_rank|percent_rank|row_number|cume_dist|ntile""" +
     """|lag|lead|nth_value)\s*\(((?:[^()]|\([^()]*\))*)\)\s*OVER\s*\(""").r

  /** rank-family OVER specs: the reference ignores explicit frames and
    * permits unordered ranking windows (all rows tie); Spark rejects
    * both, so strip the frame and order by a constant when absent.
    * `nth_value` is the exception: it is frame-SENSITIVE (PostgreSQL,
    * DuckDB and the reference agree — e.g. `nth_value(x, 2) OVER (...
    * ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)` returns the
    * NEXT row, not the partition's 2nd), and Spark accepts frames on
    * it — so its explicit frame passes through untouched and only a
    * missing ORDER BY is defaulted.
    */
  private def fixRankWindows(sql: String): String = {
    val m = RankOverRe.findFirstMatchIn(sql)
    if (m.isEmpty) return sql
    val fn = m.get.group(1).toLowerCase
    val open = m.get.end - 1
    val close = matchParen(sql, open)
    val spec = sql.substring(open + 1, close)
    var s2 =
      if (fn == "nth_value") spec.trim
      else spec.replaceAll("(?is)\\b(ROWS|RANGE|GROUPS)\\b.*$", "").trim
    if (indexOfKeyword(s2, "ORDER") < 0) {
      // keep any frame clause after the injected ORDER BY
      val frameAt = Seq("ROWS", "RANGE", "GROUPS")
        .map(k => indexOfKeyword(s2, k)).filter(_ >= 0)
      if (frameAt.isEmpty) s2 = (s2 + " ORDER BY 1").trim
      else {
        val f = frameAt.min
        s2 = (s2.substring(0, f).trim + " ORDER BY 1 " + s2.substring(f)).trim
      }
    }
    sql.substring(0, open) + "(" + s2 + ")" +
      fixRankWindows(sql.substring(close + 1))
  }

  /** QUALIFY <pred>: filter on a window predicate after windows are
    * computed (databend ast/query.rs SelectStmt qualify; Snowflake
    * grammar). Spark has no QUALIFY — rewrite to a wrapping subquery:
    * the predicate becomes a computed boolean column (windows are legal
    * in a select list) and the outer query filters on it and drops it.
    */
  private def rewriteQualify(sql: String): String = {
    val qIdx = indexOfKeyword(sql, "QUALIFY")
    if (qIdx < 0) return sql
    val head = sql.substring(0, qIdx)
    val after = sql.substring(qIdx + "QUALIFY".length)
    val stops = Seq("ORDER", "LIMIT", "OFFSET", "SETTINGS")
      .map(k => indexOfKeyword(after, k)).filter(_ >= 0)
    val predEnd = if (stops.isEmpty) after.length else stops.min
    val pred = after.substring(0, predEnd).trim
    val tail = after.substring(predEnd)
    val selIdx = indexOfKeyword(head, "SELECT")
    val fromIdx = indexOfKeyword(head, "FROM", selIdx)
    require(selIdx >= 0 && fromIdx > selIdx, s"QUALIFY without SELECT ... FROM: $sql")
    val inner = head.substring(0, fromIdx) +
      s", ($pred) AS __qualify__ " + head.substring(fromIdx)
    rewriteQualify(
      s"SELECT * EXCEPT (__qualify__) FROM ($inner) __qualify_q WHERE __qualify__ $tail")
  }

  /** Dynamic PIVOT: the reference resolves `PIVOT(agg FOR c IN (ANY
    * [ORDER BY e [ASC|DESC]]))` and `IN (<subquery>)` at bind time by
    * evaluating the value set (databend pivot binder). Spark's parser
    * only takes literal IN lists, so evaluate here and substitute.
    */
  private def rewritePivotDynamic(sql: String): String = {
    val head = PivotHeadRe.findFirstMatchIn(sql)
    if (head.isEmpty) return sql
    val m = head.get
    val openIdx = m.end - 1
    val closeIdx = matchParen(sql, openIdx)
    val inner = sql.substring(openIdx + 1, closeIdx)
    val pm = PivotInnerRe.findFirstMatchIn(inner)
    if (pm.isEmpty) return sql
    val (aggPart, pivotCol, inArg) = (pm.get.group(1), pm.get.group(2), pm.get.group(3).trim)
    val upIn = inArg.toUpperCase
    val replaced: Option[String] =
      if (upIn.startsWith("SELECT") || upIn.startsWith("WITH")) {
        val df = spark.sql(rewriteReads(inArg))
        if (df.columns.length != 1) throw new IllegalArgumentException(
          s"1065: the subquery of `pivot in` must return one column, got ${df.columns.length}")
        Some(df.distinct().orderBy(col(df.columns(0)).asc_nulls_last)
          .collect().map(r => sqlLiteral(r.get(0))).mkString(", "))
      } else PivotAnyRe.findFirstMatchIn(inArg).map { am =>
        // source relation = the FROM item this PIVOT attaches to
        val before = sql.substring(0, m.start)
        val fromIdx = lastIndexOfKeyword(before, "FROM")
        require(fromIdx >= 0, "PIVOT (ANY) needs a FROM source")
        val src = before.substring(fromIdx + 4).trim
        // rewriteOrderNulls may have made the default null ordering
        // explicit — drop it here; the .orderBy below already sorts
        // nulls last in both directions (the reference's default)
        val orderTxt = Option(am.group(1)).map(
          _.trim.replaceAll("(?i)\\s+NULLS\\s+(FIRST|LAST)\\s*$", "").trim)
        val desc = orderTxt.exists(_.toUpperCase.endsWith(" DESC"))
        val orderExpr = orderTxt.map(_.replaceAll("(?i)\\s+(ASC|DESC)\\s*$", ""))
          .getOrElse(pivotCol)
        val df0 = spark.sql(rewriteReads(s"SELECT DISTINCT $pivotCol FROM $src"))
        val ord = if (desc) expr(orderExpr).desc_nulls_last else expr(orderExpr).asc_nulls_last
        df0.orderBy(ord).collect().map(r => sqlLiteral(r.get(0))).mkString(", ")
      }
    replaced match {
      case None =>
        // literal IN list: untouched, but later PIVOTs may be dynamic
        sql.substring(0, closeIdx + 1) +
          rewritePivotDynamic(sql.substring(closeIdx + 1))
      case Some(lits) =>
        val rebuilt = s"($aggPart FOR $pivotCol IN ($lits))"
        // the reference matches pivot values with `=` semantics, so a
        // NULL pivot value yields an all-NULL column; Spark's pivot is
        // null-safe (<=>). Drop NULL-keyed rows from the source so both
        // agree (non-NULL columns are unaffected).
        val hasNull = splitTopLevel(lits, ',').exists(_.trim == "NULL")
        val prefix = {
          val before = sql.substring(0, m.start)
          val fromIdx = if (hasNull) lastIndexOfKeyword(before, "FROM") else -1
          if (hasNull && fromIdx >= 0) {
            val src = before.substring(fromIdx + 4).trim
            before.substring(0, fromIdx) +
              s"FROM (SELECT * FROM $src WHERE $pivotCol IS NOT NULL) PIVOT "
          } else sql.substring(0, openIdx)
        }
        prefix + rebuilt + rewritePivotDynamic(sql.substring(closeIdx + 1))
    }
  }

  private def sqlLiteral(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case d: java.time.LocalDate => s"DATE '$d'"
    case t: java.sql.Timestamp =>
      s"TIMESTAMP '${t.toString}'"
    case t: java.time.Instant =>
      s"TIMESTAMP '${java.sql.Timestamp.from(t)}'"
    case d: java.math.BigDecimal => d.toPlainString
    case d: BigDecimal => d.bigDecimal.toPlainString
    case b: java.lang.Boolean => b.toString
    case x => x.toString
  }

  /** UNPIVOT IN-list: the reference takes string-literal aliases
    * (`jan AS 'Jan'`, `feb 'FEB'`) and lowercases bare identifiers;
    * Spark wants identifier aliases. Rewrite both.
    */
  private def rewriteUnpivotAliases(sql: String): String = {
    val head = UnpivotHeadRe.findFirstMatchIn(sql)
    if (head.isEmpty) return sql
    val m = head.get
    val openIdx = m.end - 1
    val closeIdx = matchParen(sql, openIdx)
    val inner = sql.substring(openIdx + 1, closeIdx)
    val um = UnpivotInnerRe.findFirstMatchIn(inner)
    if (um.isEmpty) return sql
    val (valueCol, nameCol, inList) = (um.get.group(1), um.get.group(2), um.get.group(3))
    val items = splitTopLevel(inList, ',').map { it0 =>
      val it = it0.trim
      it match {
        case UnpivotAliasRe(colName, alias) =>
          s"$colName AS `${alias.replace("'", "")}`"
        case _ if it.matches("[A-Za-z_][A-Za-z0-9_]*") =>
          s"$it AS `${it.toLowerCase}`"
        case _ => it
      }
    }
    val rebuilt = s"($valueCol FOR $nameCol IN (${items.mkString(", ")}))"
    sql.substring(0, openIdx) + rebuilt +
      rewriteUnpivotAliases(sql.substring(closeIdx + 1))
  }

  /** Rewrite db-qualified table references (`db.t`, backtick-quoted
    * parts) onto their flattened instance views.
    */
  /** words that may follow a table factor without being its alias */
  private val NotAnAliasKw = Set(
    "WHERE", "ON", "GROUP", "ORDER", "HAVING", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "JOIN", "LEFT", "RIGHT", "INNER",
    "OUTER", "CROSS", "FULL", "NATURAL", "SEMI", "ANTI", "ASOF",
    "USING", "SET", "WHEN", "QUALIFY", "WINDOW", "SETTINGS", "AT",
    "CHANGES", "VALUES", "SAMPLE", "TABLESAMPLE", "PIVOT", "UNPIVOT",
    "LATERAL", "RETURNING", "FOR", "MATCHED", "SELECT", "FETCH")

  private def qualifiedRefs(sql: String): String = {
    val dotted = tables.keys.filter(_.contains(".")).toSeq.sortBy(-_.length)
    val afterDotted = dotted.foldLeft(sql) { (acc, key) =>
      val parts = key.split('.')
      val base = parts.last
      val pat = parts.map(p =>
        "(?:`" + java.util.regex.Pattern.quote(p) + "`|" +
          java.util.regex.Pattern.quote(p) + ")")
        .mkString("\\s*\\.\\s*")
      // in FROM/JOIN position with no explicit alias and no further
      // `.member`, alias the flattened view back to the TABLE name so
      // `t.col` / `db.t.col` qualified references keep resolving (the
      // reference resolves `select t.id2 from db.t order by t.id2`).
      // Skipped when the bare name ALSO resolves here (current db owns
      // it): prefixRefs then renames every bare `t` token to the same
      // view, and an alias would orphan those rewritten qualifiers.
      val re = ("(?i)(\\b(?:FROM|JOIN)\\s+)?" + pat).r
      val bareResolvesHere =
        scala.util.Try(resolveKey(base) == key).getOrElse(false)
      val v = viewName(key)
      def factorInfo(mm: scala.util.matching.Regex.Match): (Boolean, Boolean) = {
        val intro = Option(mm.group(1)).getOrElse("")
        val afterTrim = mm.after.toString.dropWhile(_.isWhitespace)
        val isQualifier = afterTrim.startsWith(".")
        val hasAlias = {
          val m2 = """^(?i)(?:AS\s+)?([A-Za-z_]\w*|`[^`]+`)""".r
            .findFirstMatchIn(afterTrim)
          m2.exists(g => !NotAnAliasKw(g.group(1).toUpperCase))
        }
        (intro.nonEmpty && !isQualifier, hasAlias)
      }
      // one aliasing decision per key per statement: if ANY table
      // factor for it takes the implicit base-name alias, qualifier
      // uses (`db.t.col`, `db.t.*`) must rewrite to `base.` too
      val aliased = !bareResolvesHere && !base.equalsIgnoreCase(v) &&
        re.findAllMatchIn(acc).exists { mm =>
          val (factor, hasAlias) = factorInfo(mm); factor && !hasAlias
        }
      re.replaceAllIn(acc, mm => {
        val intro = Option(mm.group(1)).getOrElse("")
        val afterTrim = mm.after.toString.dropWhile(_.isWhitespace)
        val isQualifier = afterTrim.startsWith(".")
        val (factor, hasAlias) = factorInfo(mm)
        scala.util.matching.Regex.quoteReplacement(
          if (aliased && factor && !hasAlias) s"$intro$v AS `$base`"
          else if (aliased && isQualifier) s"$intro`$base`"
          else s"$intro$v")
      })
    }
    // backtick-quoted single-part refs in table position
    // (`FROM "rates"`) — the word scanner in prefixRefs skips quoted
    // spans, so resolve them here; restricted to FROM/JOIN so quoted
    // COLUMNS sharing a table's name are never touched
    if (!afterDotted.contains("`")) return afterDotted
    tables.keys.foldLeft(afterDotted) { (acc, key) =>
      val base = key.split('.').last
      if (resolveKey(base) != key) acc
      else ("(?i)\\b(FROM|JOIN)\\s+`" + java.util.regex.Pattern.quote(base) + "`").r
        .replaceAllIn(acc,
          mm => mm.group(1) + " " + viewName(key))
    }
  }

  /** Rewrite bare references to this instance's tables/streams onto the
    * instance-namespaced temp views. Quote-aware (never rewrites inside
    * '...'/"..."/`...`), and skips `.name` members so `alias.t` column
    * access is left alone while `t.col` qualification still follows the
    * rename consistently (every bare `t` word maps to the same view).
    */
  /** keywords that put the scanner in "a table factor may follow
    * directly" position
    */
  private val TableIntroducers = Set(
    "FROM", "JOIN", "INTO", "UPDATE", "TABLE", "USING")

  /** clause keywords that END a FROM list (comma after them is not a
    * table-factor separator)
    */
  private val FromEnderKws = Set(
    "SELECT", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "UNION", "EXCEPT", "INTERSECT", "SET", "VALUES", "WINDOW", "QUALIFY",
    "ON", "WHEN", "RETURNING", "SETTINGS")

  /** the subset that ends the FROM list for good at its depth — ON/WHEN
    * only interrupt it (`... JOIN t2 ON c, t3` resumes factors after
    * the comma)
    */
  private val HardFromEnders = FromEnderKws - "ON" - "WHEN"

  /** join/factor keywords that are never table aliases */
  /** trailing words that END an expression rather than alias it:
    * `CASE ... END`, `x IS NOT NULL`, `INTERVAL 1 DAY` — treating
    * these as implicit aliases would substitute the keyword away in
    * later select items (round-10 fix: CASE in a multi-item list lost
    * its END to the first item's expression)
    */
  private val ImplicitAliasStop = Set(
    "END", "NULL", "TRUE", "FALSE", "UNKNOWN",
    "DAY", "DAYS", "MONTH", "MONTHS", "YEAR", "YEARS", "HOUR", "HOURS",
    "MINUTE", "MINUTES", "SECOND", "SECONDS", "WEEK", "WEEKS",
    "QUARTER", "QUARTERS", "MICROSECOND", "MICROSECONDS",
    "MILLISECOND", "MILLISECONDS")

  private val FactorKws = Set(
    "JOIN", "LEFT", "RIGHT", "FULL", "INNER", "OUTER", "CROSS", "NATURAL",
    "SEMI", "ANTI", "ASOF", "LATERAL", "USING", "ON", "AS", "PIVOT",
    "UNPIVOT", "AT", "CHANGES", "SAMPLE", "TABLESAMPLE", "ONLY", "GLOBAL")

  /** Rewrite references to this instance's tables/streams onto their
    * namespaced temp views — but ONLY where the word is actually a
    * table reference: a table-factor position (directly after
    * FROM/JOIN/INTO/UPDATE/TABLE/USING, after a comma inside a FROM
    * list, or opening a parenthesized join factor) or a qualifier
    * (`t.col`) that is not shadowed by a table ALIAS defined in the
    * statement. A COLUMN that happens to share a table's name (crdb
    * natural_join: table `l` with column `l`) and an alias-qualified
    * `a.b` where `a` is also a table (crdb join: `onecolumn AS a(b)`)
    * are both left alone — the round-8 context-free scanner renamed
    * them and broke resolution.
    */
  private def prefixRefs(sql: String, streamRefs: Set[String],
                         skip: Set[String] = Set.empty): String = {
    if (tables.isEmpty && streamRefs.isEmpty) return sql
    // pass 1 collects table aliases, pass 2 rewrites
    val aliases = scala.collection.mutable.Set.empty[String]
    val sb = new StringBuilder(sql.length + 32)
    for (pass <- 1 to 2) {
      var i = 0; var q: Char = 0; var prevNonSpace: Char = 0
      var prevWord = ""            // last identifier/keyword seen (upper)
      var inFrom = false           // current depth is inside a FROM list
      var fromSeen = false         // FROM seen at this depth, not hard-ended
      var afterCloseParen = false  // directly after `)` (through AS)
      var stack = List.empty[(Boolean, Boolean)]
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (q != 0) { if (pass == 2) sb += c; if (c == q) q = 0; i += 1 }
        else if (c == '`' && sql.indexOf('`', i + 1) > i) {
          // backtick-quoted identifier: same table/alias logic, quoted
          // emit when untouched (`"E"."intCol"` after identQuotes)
          val close = sql.indexOf('`', i + 1)
          val w = sql.substring(i + 1, close)
          val lw = w.toLowerCase
          val uw = w.toUpperCase
          i = close + 1
          if (pass == 1) {
            if (inFrom && !FactorKws.contains(uw) && !FromEnderKws.contains(uw) &&
                uw != "FROM" &&
                (prevWord == "AS" || prevNonSpace == ')'))
              aliases += lw
          } else {
            var j = i
            while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
            val qualifier = j < sql.length && sql.charAt(j) == '.' &&
              !aliases.contains(lw)
            val directlyAfterKw = prevWord.nonEmpty &&
              TableIntroducers.contains(prevWord)
            val afterFromComma = prevNonSpace == ',' && inFrom
            val afterFactorParen = prevNonSpace == '(' && inFrom
            // derived-table alias shadowing a table: rename the alias
            // DEFINITION (uses rename via the qualifier rule, since
            // pass 1 excluded it from `aliases`)
            val shadowAliasDef = afterCloseParen && inFrom &&
              !aliases.contains(lw)
            val tablePos = qualifier || directlyAfterKw || afterFromComma ||
              afterFactorParen || shadowAliasDef
            if (prevNonSpace != '.' && prevNonSpace != ':' && !skip(lw) && tablePos &&
                (tables.contains(resolveKey(lw)) || streamRefs.contains(lw)))
              sb.append(if (streamRefs.contains(lw)) viewName(lw)
                        else viewName(resolveKey(lw)))
            else sb.append('`').append(w).append('`')
          }
          prevNonSpace = '`'
          prevWord = uw
          if (prevWord != "AS") afterCloseParen = false
          if (prevWord == "FROM") { inFrom = true; fromSeen = true }
          else if (FromEnderKws.contains(prevWord)) {
            inFrom = false
            if (HardFromEnders.contains(prevWord)) fromSeen = false
          }
          else if (prevWord == "JOIN" && fromSeen) inFrom = true
        }
        else if (c == '\'' || c == '"' || c == '`') {
          q = c; if (pass == 2) sb += c; prevNonSpace = c; prevWord = ""; i += 1
        }
        else if (Character.isLetter(c) || c == '_') {
          val start = i
          while (i < sql.length && (Character.isLetterOrDigit(sql.charAt(i)) ||
                 sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
          val w = sql.substring(start, i)
          val lw = w.toLowerCase
          val uw = w.toUpperCase
          if (pass == 1) {
            // a table alias: `AS x`, or a bare word following a factor
            // (identifier or closing paren) inside a FROM list
            // a DERIVED-table alias (after `)`) that shadows a
            // registered table is NOT an alias here — pass 2 renames
            // its definition and every qualifier use uniformly onto
            // the view name (alias-shadowing a relation trips a Spark
            // decorrelation INTERNAL_ERROR under correlated EXISTS)
            val shadows = tables.contains(resolveKey(lw))
            if (inFrom && !FactorKws.contains(uw) && !FromEnderKws.contains(uw) &&
                uw != "FROM" &&
                (prevWord == "AS" ||
                 ((prevNonSpace == ')' || prevNonSpace.isLetterOrDigit ||
                   prevNonSpace == '_' || prevNonSpace == '`') &&
                  prevNonSpace != ',' && prevWord != "" &&
                  !TableIntroducers.contains(prevWord) &&
                  !FactorKws.contains(prevWord))) &&
                !(afterCloseParen && shadows))
              aliases += lw
            if (prevNonSpace == ')' && !FactorKws.contains(uw) &&
                !FromEnderKws.contains(uw) && uw != "FROM" && inFrom &&
                !shadows)
              aliases += lw
          } else {
            // is the next significant char a '.', i.e. qualifier use?
            var j = i
            while (j < sql.length && Character.isWhitespace(sql.charAt(j))) j += 1
            val qualifier = j < sql.length && sql.charAt(j) == '.' &&
              !aliases.contains(lw)
            val directlyAfterKw = prevWord.nonEmpty &&
              TableIntroducers.contains(prevWord) &&
              (prevNonSpace == 0 || prevNonSpace.isLetter || prevNonSpace == '_')
            val afterFromComma = prevNonSpace == ',' && inFrom
            // `FROM (a JOIN b ...)`: first word of a parenthesized join
            // factor is a table reference too
            val afterFactorParen = prevNonSpace == '(' && inFrom
            // derived-table alias shadowing a table: rename the alias
            // DEFINITION (uses rename via the qualifier rule, since
            // pass 1 excluded it from `aliases`)
            val shadowAliasDef = afterCloseParen && inFrom &&
              !aliases.contains(lw)
            val tablePos = qualifier || directlyAfterKw || afterFromComma ||
              afterFactorParen || shadowAliasDef
            if (prevNonSpace != '.' && prevNonSpace != ':' && !skip(lw) && tablePos &&
                (tables.contains(resolveKey(lw)) || streamRefs.contains(lw)))
              sb.append(if (streamRefs.contains(lw)) viewName(lw)
                        else viewName(resolveKey(lw)))
            else sb.append(w)
          }
          prevNonSpace = w.last
          prevWord = uw
          if (prevWord != "AS") afterCloseParen = false
          if (prevWord == "FROM") { inFrom = true; fromSeen = true }
          else if (FromEnderKws.contains(prevWord)) {
            inFrom = false
            if (HardFromEnders.contains(prevWord)) fromSeen = false
          }
          else if (prevWord == "JOIN" && fromSeen) inFrom = true
        } else {
          if (c == '(') {
            // a '(' directly after FROM/JOIN (or a FROM-list comma)
            // opens a parenthesized table factor — stay in from-list
            // context; any other '(' (function call, IN-list, USING
            // column list, subexpression) does not
            val factorParen = prevWord == "FROM" || prevWord == "JOIN" ||
              (inFrom && prevNonSpace == ',')
            stack = (inFrom, fromSeen) :: stack
            inFrom = factorParen
            fromSeen = factorParen
            prevWord = ""
            afterCloseParen = false
          }
          else if (c == ')') {
            val top = stack.headOption.getOrElse((false, false))
            inFrom = top._1; fromSeen = top._2
            stack = if (stack.isEmpty) stack else stack.tail
            prevWord = ""
            afterCloseParen = true
          }
          else if (c == ',' && fromSeen && !inFrom)
            inFrom = true // `JOIN t ON cond, next_factor` resumes factors
          if (pass == 2) sb += c
          if (!Character.isWhitespace(c)) {
            prevNonSpace = c
            if (c != ',') prevWord = ""
            if (c != '(' && c != ')') afterCloseParen = false
          }
          i += 1
        }
      }
    }
    sb.toString
  }

  private val NumbersRe = """(?i)\bnumbers(?:_mt|_local)?\s*\(\s*([\d\s*+\-/]+)\s*\)""".r
  private val FuseTvfRe =
    """(?i)\b(fuse_snapshot|fuse_block|fuse_segment|fuse_column|fuse_statistic|clustering_information|clustering_statistics)\s*\(\s*'([^']*)'\s*,\s*'([^']*)'\s*\)""".r
  /** generate_series as a table factor anywhere in a FROM clause —
    * leading, comma-separated, JOINed, or LATERAL — becomes an
    * explode(sequence(...)) subquery. Scoped to FROM clauses so the
    * scalar generate_series registered for select-list position is
    * untouched.
    */
  private def rewriteGenSeriesTvf(sql0: String): String = {
    def expand(args0: String) = {
      // integer steps over temporal series: the reference normalizes
      // by magnitude (srfs/range.rs:72-78 — |step|<1000 means seconds,
      // <1e6 milliseconds, else microseconds); DATE series step counts
      // days. Spark's sequence needs an interval either way.
      val parts = splitTopLevel(args0, ',').map(_.trim)
      val isTs = parts.take(2).exists(a =>
        """(?i)timestamp|to_datetime|now\(""".r.findFirstIn(a).isDefined)
      val isDate = !isTs && parts.take(2).exists(a =>
        """(?i)::\s*date|to_date|\bdate\b""".r.findFirstIn(a).isDefined)
      val args =
        if (parts.length == 3 && isTs &&
            """(?i)interval|make_""".r.findFirstIn(parts(2)).isEmpty) {
          // bare int literals get the L suffix so a literal product
          // (12 * 3600 * 1000000) computes in BIGINT — the outer 1.0*
          // floats only the top-level multiply, not the inner chain
          val s = "(" + parts(2).replaceAll(
            "(?<![\\w.])(\\d+)(?![\\w.Ll])", "$1L") + ")"
          (parts.take(2) :+ ("make_dt_interval(0, 0, 0, CASE " +
            s"WHEN abs(1.0 * $s) < 1000 THEN 1.0 * $s " +
            s"WHEN abs(1.0 * $s) < 1000000 THEN (1.0 * $s) / 1e3 " +
            s"ELSE (1.0 * $s) / 1e6 END)")).mkString(", ")
        } else if (isDate &&
            """(?i)interval|make_""".r.findFirstIn(
              parts.drop(2).headOption.getOrElse("")).isEmpty) {
          val s = if (parts.length >= 3) parts(2) else "1"
          (parts.take(2) :+ s"make_interval(0, 0, 0, $s)").mkString(", ")
        } else args0
      if (!isTs && !isDate && parts.length >= 2 && parts.length <= 3) {
        // numeric series: empty result (not sequence()'s boundary
        // error) when the step points away from the INCLUSIVE end
        val step = if (parts.length >= 3) parts(2) else "1"
        val b = s"CAST((${parts(0)}) AS BIGINT)"
        val e = s"CAST((${parts(1)}) AS BIGINT)"
        s"(SELECT explode(CASE WHEN sign($e - $b) * sign(CAST(($step) " +
          s"AS BIGINT)) >= 0 THEN sequence($args) " +
          s"ELSE CAST(array() AS ARRAY<BIGINT>) END) AS generate_series)"
      } else
        s"(SELECT explode(sequence($args)) AS generate_series)"
    }
    var sql = sql0; var pos = 0
    while (true) {
      val f = indexOfKeywordAnyDepth(sql, "FROM", pos)
      if (f < 0) return sql
      val start = f + "FROM".length
      val end = clauseEnd(sql, start, FromEnders)
      val clause = sql.substring(start, end)
      if ("""(?i)\bgenerate_series\s*\(""".r.findFirstIn(clause).isEmpty) pos = end
      else {
        val segs = splitTopLevel(clause, ',').map { seg0 =>
          val seg = seg0.trim
          """(?i)^(LATERAL\s+)?generate_series\s*\(""".r
            .findPrefixMatchOf(seg) match {
            case Some(mm) =>
              val open = mm.end - 1
              val close = matchParen(seg, open)
              Option(mm.group(1)).getOrElse("") +
                expand(seg.substring(open + 1, close)) + seg.substring(close + 1)
            case None =>
              """(?i)\b(JOIN\s+|LATERAL\s+)generate_series\s*\(""".r
                .findFirstMatchIn(seg) match {
                case Some(jm) =>
                  val open = jm.end - 1
                  val close = matchParen(seg, open)
                  seg.substring(0, jm.start) + jm.group(1) +
                    expand(seg.substring(open + 1, close)) + seg.substring(close + 1)
                case None => seg
              }
          }
        }
        val rebuilt = segs.mkString(", ")
        sql = sql.substring(0, start) + " " + rebuilt + " " + sql.substring(end)
        pos = start + rebuilt.length
      }
    }
    sql
  }
  private val RightSemiAntiKwRe = """(?is)\bRIGHT\s+(ANTI|SEMI)\s+JOIN\b""".r

  /** start index of the table factor that ends just before `endPos`
    * (identifier chain, optionally parenthesized subquery, optional
    * alias) — stops at FROM / comma / JOIN / ON boundaries
    */
  private def factorStart(sql: String, endPos: Int): Int = {
    var lfEnd = endPos
    while (lfEnd > 0 && sql.charAt(lfEnd - 1).isWhitespace) lfEnd -= 1
    var lfStart = lfEnd
    var done = false
    def prevWord(p: Int): (String, Int) = {
      var e = p - 1
      while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
      var s = e
      while (s >= 0 && (sql.charAt(s).isLetterOrDigit || sql.charAt(s) == '_' ||
             sql.charAt(s) == '.' || sql.charAt(s) == '`')) s -= 1
      (sql.substring(s + 1, e + 1), s + 1)
    }
    while (!done) {
      var e = lfStart - 1
      while (e >= 0 && sql.charAt(e).isWhitespace) e -= 1
      if (e < 0) done = true
      else if (sql.charAt(e) == ')') {
        var depth = 0; var s = e
        while (s >= 0 && { val c = sql.charAt(s)
          if (c == ')') depth += 1 else if (c == '(') depth -= 1
          depth != 0 }) s -= 1
        lfStart = s
      } else if (sql.charAt(e) == ',') done = true
      else {
        val (w, ws) = prevWord(e + 1)
        if (w.isEmpty ||
            Set("FROM", "ON", "JOIN", "WHERE", "SELECT").contains(w.toUpperCase))
          done = true
        else lfStart = ws
      }
    }
    lfStart
  }

  private def rewriteRightSemiAnti(sql: String): String = {
    val m0 = RightSemiAntiKwRe.findFirstMatchIn(sql)
    if (m0.isEmpty) return sql
    val m = m0.get
    val onIdx = indexOfKeyword(sql, "ON", m.end)
    if (onIdx < 0) return sql
    val rightFactor = sql.substring(m.end, onIdx).trim
    val lfStart = factorStart(sql, m.start)
    val leftFactor = sql.substring(lfStart, m.start).trim
    val condStart = onIdx + 2
    val condEnd = {
      val e = clauseEnd(sql, condStart, OnCondEnders)
      val comma = indexOfTopLevel(sql.substring(condStart, e), ',')
      if (comma >= 0) condStart + comma else e
    }
    sql.substring(0, lfStart) + rightFactor +
      s" LEFT ${m.group(1).toUpperCase} JOIN " + leftFactor + " ON " +
      sql.substring(condStart, condEnd) +
      rewriteRightSemiAnti(sql.substring(condEnd))
  }

  private def resolvePoint(t: GraftTable, kind: String, value: String): Long = {
    val v = value.trim.stripPrefix("'").stripSuffix("'")
    kind.toUpperCase match {
      case "SNAPSHOT" => v.toLong
      case "TIMESTAMP" =>
        val ms = spark.sql(
          s"SELECT unix_millis(CAST(${value.trim} AS TIMESTAMP))").head.getLong(0)
        t.versionAsOf(ms)
      case "OFFSET" => // seconds relative to now (negative = past)
        val off = try v.toLong catch { case _: Exception =>
          // arithmetic offsets (`-30 * 60`) evaluate as SQL
          spark.sql(s"SELECT CAST(($v) AS BIGINT)").head.getLong(0)
        }
        t.versionAsOf(System.currentTimeMillis() + off * 1000L)
      case "STREAM" => stream(v).offset
      case other => throw new IllegalArgumentException(s"AT ($other => ...) unsupported")
    }
  }

  // ---- DDL ------------------------------------------------------------

  private def tablePath(name: String): String =
    Paths.get(warehouse, norm(name)).toString

  private def createTable(s0: String): DataFrame = {
    // strip trailing fuse-engine table options (row_per_block=N,
    // change_tracking=true, compression='zstd', ... —
    // ast/statements/table.rs table_options); they tune block layout
    // in the reference and have no bearing on COW-parquet semantics
    // `) Engine = Fuse CLUSTER BY(...)`: lift the CLUSTER BY clause
    // over the engine/options tail so the cluster-head regex matches
    val s1 = """(?is)^(.*\))((?:\s+\w+\s*=\s*(?:'[^']*'|[\w.]+))*)\s+(CLUSTER\s+BY\s*\(.*\))\s*$""".r
      .replaceFirstIn(s0, "$1 $3")
    val s =
      if (CreateTableAsRe.findFirstIn(s1).isDefined) s1
      else TrailingOptsRe.replaceAllIn(s1, "$1")
    val res = createTableDispatch(s)
    // bloom_index_columns table option: validate against the created
    // physical schema (reference 1301 rejects variant + virtual cols)
    if (CreateTableAsRe.findFirstIn(s0).isEmpty)
      for (bm <- """(?i)bloom_index_columns\s*=\s*'([^']*)'""".r.findFirstMatchIn(s0);
           nm <- """(?is)^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?([`"\w.]+)""".r
             .findFirstMatchIn(s0)) {
        val n = qualifyNew(nm.group(1))
        if (tables.contains(n))
          try validateBloomColumns(n, bm.group(1))
          catch { case e: Throwable =>
            tables.remove(n).foreach { t =>
              spark.catalog.dropTempView(viewName(n)); rmrf(t.path) }
            computedCols.remove(n); declaredOrder.remove(n); colDefaults.remove(n); bitmapCols.remove(n)
            throw e
          }
      }
    res
  }

  /** the reference rejects non-scalar map KEY types (1006,
    * types/map.rs: keys must be scalar) — Spark would accept them
    */
  private def validateDeclaredSchema(schema: StructType): Unit = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType): Unit = dt match {
      case m: MapType =>
        m.keyType match {
          case _: ArrayType | _: MapType | _: StructType | VariantType =>
            throw new IllegalArgumentException(
              "1006: map key type must be a scalar type, got " + m.keyType.sql)
          case _ =>
        }
        walk(m.valueType)
      case a: ArrayType => walk(a.elementType)
      case st: StructType => st.fields.foreach(f => walk(f.dataType))
      case _ =>
    }
    schema.fields.foreach(f => walk(f.dataType))
  }

  private val TrailingOptsRe =
    """(?is)^(.*\))\s*((?:\w+\s*=\s*(?:'[^']*'|[\w.]+)\s*)+)$""".r

  private def createTableDispatch(s: String): DataFrame = s match {
    case CreateTableLikeRe(orReplace, ifNotExists, name, src, engine) =>
      val n = qualifyNew(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) { tables.remove(n); rmrf(tablePath(n)) }
      val schema = table(resolveKey(src)).read().schema
      // LIKE ... ENGINE=RANDOM: seed the copy with generated rows (the
      // reference's RANDOM engine produces rows on every read; a fixed
      // deterministic fill keeps the COW-parquet model)
      val seedDf =
        if (engine != null && engine.equalsIgnoreCase("random"))
          graft.sources.RandomTable.generate(spark, schema, 1000L)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      register(n, GraftTable.create(spark, tablePath(n), seedDf))
      registerColumnMeta(n, Seq.empty)
      status("table" -> n, "op" -> "create-like")
    case CreateTableDdlAsRe(orReplace, ifNotExists, name, ddl, select) =>
      // typed CTAS (reference create_table.rs: explicit schema + AS
      // query): source columns align by position and cast to the
      // declared types
      val n = qualifyNew(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      val schema = StructType.fromDDL(stripConstraints(ddl))
      validateDeclaredSchema(schema)
      notNullCols(n) = declaredNotNull(ddl)
      requiredCols(n) = declaredNotNull(ddl, withDefault = false)
      val df0 = spark.sql(rewriteReads(select))
      require(df0.columns.length == schema.length,
        s"query produces ${df0.columns.length} columns, declared ${schema.length}")
      val df1 = df0.toDF(schema.fieldNames.toSeq: _*)
      var df = df1.select(schema.fields.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)).toSeq: _*)
      if (tables.contains(n)) { df = df.localCheckpoint(true); tables.remove(n); rmrf(tablePath(n)) }
      register(n, GraftTable.create(spark, tablePath(n), df))
      registerColumnMeta(n, Seq.empty)
      status("table" -> n, "op" -> "create-as")
    case CreateTableAsRe(orReplace, ifNotExists, name, select) =>
      val n = qualifyNew(name)
      if (ifNotExists != null && tables.contains(n))
        return status("table" -> n, "op" -> "create-as-noop")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      // evaluate the SELECT before dropping the old generation: OR
      // REPLACE may read the table being replaced (and rewriteReads
      // refreshes every registered view, so the old files must still
      // exist while the source frame is materialized)
      var df0 = spark.sql(rewriteReads(select))
      // bare NULL literals type as NullType, which parquet can't store;
      // databend's CTAS accepts them — land them as nullable strings
      if (df0.schema.exists(_.dataType == org.apache.spark.sql.types.NullType))
        df0 = df0.select(df0.schema.fields.map { f =>
          if (f.dataType == org.apache.spark.sql.types.NullType)
            col(s"`${f.name}`").cast("string").as(f.name)
          else col(s"`${f.name}`")
        }.toSeq: _*)
      val df = if (tables.contains(n)) df0.localCheckpoint(true) else df0
      if (tables.contains(n)) { tables.remove(n); rmrf(tablePath(n)) }
      register(n, GraftTable.create(spark, tablePath(n), df))
      registerColumnMeta(n, Seq.empty)
      status("table" -> n, "op" -> "create-as")
    case CreateTableDdlClusterRe(orReplace, ifNotExists, name, ddl, cluster) =>
      val n = qualifyNew(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) rmrf(tablePath(n))
      createPlainTable(n, ddl, Option(cluster))
      status("table" -> n, "op" -> "create")
    case CreateTableDdlRe(orReplace, ifNotExists, name, ddl) =>
      val n = qualifyNew(name)
      if (tables.contains(n) && ifNotExists != null)
        return status("table" -> n, "op" -> "exists")
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      if (tables.contains(n)) rmrf(tablePath(n))
      createPlainTable(n, ddl, None)
      status("table" -> n, "op" -> "create")
    case CreateViewRecRe(name, body) =>
      // a view over WITH RECURSIVE: evaluate through the fixpoint and
      // register the resulting (lazy) plan as the view
      val df = execute(body.trim)
      df.createOrReplaceTempView(norm(name))
      status("view" -> norm(name), "op" -> "create-view")
    case _ =>
      // CREATE [OR REPLACE] VIEW -> temp view: the instance's tables
      // are session temp views, which a permanent Spark view may not
      // reference (window_basic.test vwpush)
      query(s.replaceAll(
        "(?is)^(\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?)(VIEW\\b)",
        "$1TEMPORARY $2"))
  }

  private lazy val CreateViewRecRe =
    ("""(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?VIEW\s+(""" + NamePat +
     """)\s+AS\s*\(\s*(WITH\s+RECURSIVE\b.*)\)\s*""").r

  /** Databases are a namespace over the instance's table registry (the
    * reference scopes tables per-database in its meta service;
    * ast/statements/database.rs). Purely registry-level here.
    */
  private def createDatabase(s: String): DataFrame = {
    val name = norm(s.replaceAll(
      "(?is)^CREATE\\s+(OR\\s+REPLACE\\s+)?(DATABASE|SCHEMA)\\s+(IF\\s+NOT\\s+EXISTS\\s+)?", "").trim)
    databases += name
    status("database" -> name, "op" -> "create-database")
  }

  private def dropDatabase(s: String): DataFrame = {
    val name = norm(s.replaceAll(
      "(?is)^DROP\\s+(DATABASE|SCHEMA)\\s+(IF\\s+EXISTS\\s+)?", "").trim)
    databases -= name
    tables.keys.filter(_.startsWith(name + ".")).toSeq.foreach { k =>
      tables.remove(k).foreach { t =>
        spark.catalog.dropTempView(viewName(k)); rmrf(t.path)
      }
    }
    status("database" -> name, "op" -> "drop-database")
  }

  private def dropTable(s: String): DataFrame = {
    // trailing ALL purges history too; a plain DROP moves the table
    // directory aside so UNDROP TABLE can restore it (reference fuse
    // drop retention). Retention is bounded: beyond 8 retained drops
    // the oldest is purged for real.
    val purge = """(?is)\s+ALL\s*$""".r.findFirstIn(s).isDefined
    val ifExists = """(?is)^DROP\s+TABLE\s+IF\s+EXISTS\b""".r.findPrefixMatchOf(s).isDefined
    val name = resolveKey(s.replaceAll("(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?", "")
      .replaceAll("(?is)\\s+ALL\\s*$", "").trim)
    if (!ifExists && !tables.contains(name)) {
      // reference: DROP TABLE over a view is 1302, over nothing 1025
      if (spark.catalog.tableExists(name.split('.').last))
        throw new IllegalArgumentException(
          s"1302: $name is a view; use DROP VIEW")
      throw new IllegalArgumentException(s"1025: unknown table $name")
    }
    tables.remove(name).foreach { t =>
      spark.catalog.dropTempView(viewName(name))
      computedCols.remove(name); declaredOrder.remove(name); colDefaults.remove(name); bitmapCols.remove(name)
      if (purge) rmrf(t.path)
      else {
        droppedSeq += 1
        val dst = Paths.get(warehouse, ".dropped", s"${name.replace('.', '_')}_$droppedSeq")
        Files.createDirectories(dst.getParent)
        Files.move(Paths.get(t.path), dst)
        droppedTables.remove(name).foreach(old => rmrf(old.t.path))
        droppedTables(name) = DroppedTable(GraftTable.open(spark, dst.toString),
          rowPolicyAttach.remove(name),
          maskAttach.remove(name).map(_.toSeq).getOrElse(Seq.empty))
        while (droppedTables.size > 8) {
          val (oldest, ot) = droppedTables.head
          droppedTables.remove(oldest)
          rmrf(ot.t.path)
        }
      }
    }
    status("table" -> name, "op" -> "drop")
  }

  private def truncateTable(s: String): DataFrame = {
    val name = resolveKey(s.replaceAll("(?is)^TRUNCATE\\s+(TABLE\\s+)?", "").trim)
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
      val n = resolveKey(name)
      val t = table(n)
      val df = alignToTarget(t, colList, body)
      val keyCols = splitTopLevel(keys, ',').map(norm)
      require(keyCols.nonEmpty, "REPLACE INTO needs at least one conflict key")
      val dup = df.groupBy(keyCols.map(col): _*).count()
        .filter(col("count") > 1).limit(1).count()
      if (dup > 0) throw new IllegalArgumentException(
        s"REPLACE INTO: duplicated on-conflict keys (${keyCols.mkString(",")}) in source")
      val src = df.alias("__src")
      // target alias must be dot-free (a db-qualified key would parse
      // as db.table.column in the ON text)
      val on = keyCols.map(k => s"__tgt.$k = __src.$k").mkString(" AND ")
      t.mergeInto(src, "__tgt", "__src", on,
        matched = Seq(GraftTable.MatchedClause(None, Some(Map.empty))),
        notMatched = Seq(GraftTable.NotMatchedClause(None, None)))
      consumeReferencedStreams()
      refreshView(n)
      status("table" -> n, "op" -> "replace-into", "keys" -> keyCols.mkString(","))
    case _ => throw new IllegalArgumentException(s"cannot parse REPLACE INTO: $s")
  }

  /** cast a source column to the target type; JSON text inserted into
    * a VARIANT column is PARSED like the reference's INSERT binder
    * (a plain Spark cast would wrap the text as a variant string)
    */
  private def alignCast(df: DataFrame, name: String,
                        tgt: org.apache.spark.sql.types.DataType): Column = {
    val srcType = df.schema.fields
      .find(_.name.equalsIgnoreCase(name)).map(_.dataType)
    (srcType, tgt) match {
      case (Some(org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.VariantType) =>
        expr(s"parse_json(`$name`)").as(name)
      // backtick-quote: CTAS can mint literal-text column names ("3.4")
      // that a bare col() would parse as nested-field access
      case _ => col(s"`$name`").cast(tgt).as(name)
    }
  }

  /** VALUES rows: cast every cell to its target column type BEFORE
    * Spark's inline-table type unification — rows like map(100,'a')
    * vs map('300',123) only share a type via the table's schema
    * (insert_into_map.test). Non-VALUES bodies pass through.
    */
  private def castValuesBody(body: String, colList: Option[String],
      tgtSchema: StructType,
      dflts: Map[String, String] = Map.empty,
      bitmapSet: Set[String] = Set.empty): String = {
    // braces first: splitTopLevel does not track {..} nesting
    val bt = mapLiterals(body.trim)
    if (!bt.toUpperCase.startsWith("VALUES")) return bt
    val colNames: Seq[String] = colList match {
      case Some(cl) => splitTopLevel(cl, ',').map(c => norm(c))
      case None => tgtSchema.fieldNames.toSeq
    }
    val types: Seq[org.apache.spark.sql.types.DataType] = colNames.map { n =>
      tgtSchema.fields.find(_.name.equalsIgnoreCase(n))
        .getOrElse(throw new IllegalArgumentException(
          s"unknown column $n")).dataType
    }
    val rows = splitTopLevel(bt.substring("VALUES".length), ',')
    val ok = rows.nonEmpty && rows.forall { r0 =>
      val r = r0.trim
      r.startsWith("(") && matchParen(r, 0) == r.length - 1 &&
        splitTopLevel(r.substring(1, r.length - 1), ',').length == types.length
    }
    if (!ok) return bt
    rows.foreach(checkNoAggInValuesRow)
    rows.map { r0 =>
      val r = r0.trim
      val cells = splitTopLevel(r.substring(1, r.length - 1), ',')
      "SELECT " + cells.lazyZip(types).lazyZip(colNames).map { (c0, ty, cn) =>
        // a bare DEFAULT cell takes the column's declared default
        // (NULL without one) — reference insert_default semantics
        val c =
          if (c0.trim.equalsIgnoreCase("default"))
            dflts.getOrElse(cn.toLowerCase, "NULL")
          else c0
        ty match {
          case org.apache.spark.sql.types.VariantType =>
            // graft_json_text, NOT a string cast: casting an
            // already-variant cell (parse_json('"abcd"')) to string
            // UNQUOTES json strings, so the re-parse saw `abcd` and
            // raised 1006 on a value the reference accepts
            s"parse_json(graft_json_text(($c)))"
          case org.apache.spark.sql.types.BinaryType
              if bitmapSet(cn.toLowerCase) && c.trim.startsWith("'") =>
            // string literal into a declared-BITMAP column parses as a
            // value list, not utf8 bytes
            s"to_bitmap(${c.trim})"
          case st: StructType
              if st.fieldNames.sameElements(Array("us", "offset_minutes")) &&
                c.trim.startsWith("'") =>
            // TIMESTAMP WITH TIME ZONE column: parse the literal
            // offset-preserving
            s"to_timestamp_tz(${c.trim})"
          case _ => s"CAST(($c) AS ${ty.sql})"
        }
      }.mkString(", ")
    }.mkString(" UNION ALL ")
  }

  private val ValuesAggRe =
    ("""(?i)\b(count|sum|avg|min|max|array_agg|string_agg|group_concat|""" +
     """listagg|stddev|stddev_pop|stddev_samp|var_samp|var_pop|variance|""" +
     """median|quantile|approx_count_distinct|approx_percentile|arg_min|""" +
     """arg_max|covar_pop|covar_samp|corr|uniq|retention|window_funnel)""" +
     """\s*\(""").r

  /** reference 1065: a VALUES row cannot contain aggregate/window
    * calls (Spark would quietly evaluate them over a one-row frame)
    */
  private def checkNoAggInValuesRow(row: String): Unit = {
    // strip string literals so 'max(...)' text never false-positives;
    // an aggregate inside a (SELECT ...) scalar subquery is legal
    val bare = row.replaceAll("'(?:[^']|'')*'", "''")
    if ("""(?i)\bSELECT\b""".r.findFirstIn(bare).isDefined) return
    if (ValuesAggRe.findFirstIn(bare).isDefined ||
        """(?i)\bOVER\s*\(""".r.findFirstIn(bare).isDefined)
      throw new IllegalArgumentException(
        "1065: aggregate or window functions are not allowed in VALUES")
  }

  /** the reference's per-type zero value (table.rs default_expr absent
    * on a NOT NULL column): 0 / '' / false / epoch
    */
  private def typeZeroLiteral(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
           _: FloatType | _: DoubleType | _: DecimalType => "0"
      case _: StringType => "''"
      case _: BooleanType => "false"
      case _: DateType => "DATE'1970-01-01'"
      case _: TimestampType => "TIMESTAMP'1970-01-01 00:00:00'"
      case _: BinaryType => "X''"
      case _: ArrayType => "array()"
      case _ => "NULL"
    }
  }

  /** align a statement's source rows (col list + body) to `t`'s schema */
  private def alignToTarget(t: GraftTable, colList: String, body: String): DataFrame = {
    val tgtSchema = t.read().schema
    val tgtCols = tgtSchema.fieldNames.toSeq
    val body1 = castValuesBody(body, Option(colList), tgtSchema)
    val df0 = spark.sql(rewriteReads(body1))
    Option(colList).map(splitTopLevel(_, ',').map(c => norm(c))) match {
      case Some(cols) =>
        require(cols.length == df0.columns.length,
          s"column list has ${cols.length} names, query produces ${df0.columns.length}")
        val renamed = df0.toDF(cols: _*)
        val out = tgtCols.map { c =>
          if (cols.exists(_.equalsIgnoreCase(c))) alignCast(renamed, c, tgtSchema(c).dataType)
          else lit(null).cast(tgtSchema(c).dataType).as(c)
        }
        renamed.select(out: _*)
      case None =>
        require(df0.columns.length == tgtCols.length,
          s"query produces ${df0.columns.length} columns, table has ${tgtCols.length}")
        val renamed = df0.toDF(tgtCols: _*)
        renamed.select(tgtCols.map(c => alignCast(renamed, c, tgtSchema(c).dataType)): _*)
    }
  }

  private def insert(s: String): DataFrame = s match {
    case InsertRe(verb, name, colList, body) =>
      val n = resolveKey(name)
      val t = table(n)
      val physSchema = t.read().schema
      val compAll = computedCols.getOrElse(n, Seq.empty)
      val storedComp = compAll.filter(_._4)
      val compNames = compAll.map(_._1.toLowerCase).toSet
      // computed columns are never insertable: STORED compute below,
      // VIRTUAL at read (reference 1006/1303)
      val tgtSchema = StructType(physSchema.fields
        .filterNot(f => storedComp.exists(_._1.equalsIgnoreCase(f.name))))
      val tgtCols = tgtSchema.fieldNames.toSeq
      // a DEFAULT cell on a NOT NULL column without a declared default
      // takes the TYPE's zero value in the reference (insert_default:
      // `c float not null` -> 0.0), not NULL
      val dflts = colDefaults.getOrElse(n, Map.empty) ++
        notNullCols.getOrElse(n, Set.empty)
          .filterNot(colDefaults.getOrElse(n, Map.empty).contains)
          .flatMap { c =>
            tgtSchema.fields.find(_.name.equalsIgnoreCase(c))
              .map(f => c.toLowerCase -> typeZeroLiteral(f.dataType))
          }
      val df0 = spark.sql(rewriteReads(
        castValuesBody(body, Option(colList), tgtSchema, dflts,
          bitmapCols.getOrElse(n, Set.empty))))
      val explicit = Option(colList).map(splitTopLevel(_, ',').map(c => norm(c)))
      val df1 = explicit match {
        case Some(cols) =>
          cols.foreach(c => require(!compNames(c.toLowerCase),
            s"1006: cannot insert into computed column $c"))
          require(cols.length == df0.columns.length,
            s"INSERT column list has ${cols.length} names, query produces ${df0.columns.length}")
          // reference semantics (1006): a declared NOT NULL column with
          // no default cannot be omitted — it would silently null-fill
          val omittedNotNull = requiredCols.getOrElse(n, Set.empty)
            .filterNot(c => cols.exists(_.equalsIgnoreCase(c)))
            .filter(c => tgtCols.exists(_.equalsIgnoreCase(c)))
          require(omittedNotNull.isEmpty,
            s"1006: INSERT omits NOT NULL column(s) without default: ${omittedNotNull.mkString(",")}")
          val renamed = df0.toDF(cols: _*)
          // missing target columns fill with their declared DEFAULT,
          // NULL otherwise (reference fills defaults)
          val out = tgtCols.map { c =>
            if (cols.exists(_.equalsIgnoreCase(c))) alignCast(renamed, c, tgtSchema(c).dataType)
            else dflts.get(c.toLowerCase)
              .map(d => expr(d).cast(tgtSchema(c).dataType).as(c))
              .getOrElse(lit(null).cast(tgtSchema(c).dataType).as(c))
          }
          renamed.select(out: _*)
        case None =>
          require(df0.columns.length == tgtCols.length,
            s"1303: INSERT query produces ${df0.columns.length} columns, table expects ${tgtCols.length}")
          val renamed = df0.toDF(tgtCols: _*)
          renamed.select(tgtCols.map(c => alignCast(renamed, c, tgtSchema(c).dataType)): _*)
      }
      // STORED computed columns evaluate over the incoming frame, at
      // their declared slots
      val df = if (storedComp.isEmpty) df1 else {
        val v = freshView(df1)
        val proj = physSchema.fields.toSeq.map { f =>
          storedComp.find(_._1.equalsIgnoreCase(f.name)) match {
            case Some((nm, _, ex, _)) => s"$ex AS `$nm`"
            case None => s"`${f.name}`"
          }
        }
        spark.sql(s"SELECT ${proj.mkString(", ")} FROM $v")
      }
      // reference semantics (1006): NULL values cannot land in a
      // declared NOT NULL column
      val nnCheck = notNullCols.getOrElse(n, Set.empty)
        .filter(c => tgtCols.exists(_.equalsIgnoreCase(c)))
      if (nnCheck.nonEmpty) {
        val anyNull = nnCheck.map(c => col(s"`$c`").isNull).reduce(_ || _)
        require(df.filter(anyNull).isEmpty,
          s"1006: NULL value in NOT NULL column(s) of $n")
      }
      val overwrite = (verb != null && verb.equalsIgnoreCase("OVERWRITE")) ||
        s.trim.toUpperCase.startsWith("REPLACE")
      // a literal VALUES insert is one small block (reference fuse
      // writes one block per small insert); without this the row set
      // fans out over default parallelism into one tiny file per row
      // and scan order (size-sorted) scrambles insertion order, which
      // order-sensitive aggregates like any() observe
      val dfW =
        if (body.trim.toUpperCase.startsWith("VALUES")) df.coalesce(1) else df
      if (overwrite) t.overwrite(dfW) else t.append(dfW)
      // reading a STREAM in a DML consumes it (advances the cursor)
      lastStreamRefs.foreach(n0 => streams(n0).consume(_ => ()))
      refreshView(n)
      // the reference returns the affected-row count as INSERT's
      // result set (issue_17581); footer-summed, no source re-run
      import spark.implicits._
      Seq(t.lastWrittenRows).toDF("number of rows inserted")
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

  private def update(s: String): DataFrame = {
    // `UPDATE t [AS a] SET ... FROM <source> WHERE cond` (the
    // postgres-style joined update databend accepts) lowers onto the
    // MERGE machinery: matched rows take the SET values
    if (indexOfKeyword(s, "FROM") > 0) return updateFrom(s)
    updatePlain(s)
  }

  private def updateFrom(s: String): DataFrame = {
    val m = """(?is)^\s*UPDATE\s+([\w.]+)(?:\s+(?:AS\s+)?((?!SET\b)\w+))?\s+SET\s+""".r
      .findPrefixMatchOf(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse UPDATE: $s"))
    val n = resolveKey(m.group(1))
    val alias = Option(m.group(2)).map(norm).getOrElse(n.split('.').last)
    val rest = s.substring(m.end)
    val fromIdx = indexOfKeyword(rest, "FROM")
    require(fromIdx > 0, s"cannot parse UPDATE ... FROM: $s")
    val setTxt = rest.take(fromIdx).trim
    val tail = rest.substring(fromIdx + 4).trim
    val (srcDf, srcAlias, afterSrc) =
      if (tail.startsWith("(")) {
        val close = matchParen(tail, 0)
        val am = """(?is)^\s*(?:AS\s+)?(\w+)""".r
          .findPrefixMatchOf(tail.substring(close + 1))
        (spark.sql(rewriteReads(tail.substring(1, close))),
          am.map(x => norm(x.group(1))).getOrElse("src"),
          tail.substring(close + 1 + am.map(_.end).getOrElse(0)))
      } else {
        val id = tail.takeWhile(c => c.isLetterOrDigit || c == '_' || c == '.')
        val after = tail.substring(id.length)
        val am = """(?is)^\s+(?:AS\s+)?((?!WHERE\b)\w+)""".r.findPrefixMatchOf(after)
        (spark.sql(rewriteReads(s"SELECT * FROM $id")),
          am.map(x => norm(x.group(1))).getOrElse(norm(id).split('.').last),
          am.map(x => after.substring(x.end)).getOrElse(after))
      }
    val wIdx = indexOfKeyword(afterSrc, "WHERE")
    require(wIdx >= 0, "UPDATE ... FROM needs a WHERE join condition")
    val cond = afterSrc.substring(wIdx + 5).trim
    val setPairs = splitTopLevel(setTxt, ',').map { a =>
      val eq = indexOfTopLevel(a, '=')
      require(eq > 0, s"bad assignment: $a")
      norm(a.take(eq)).split('.').last -> a.drop(eq + 1).trim
    }
    val t = table(n)
    val res = t.mergeInto(srcDf, alias, srcAlias, cond,
      Seq(GraftTable.MatchedClause(None, Some(setPairs.toMap))), Nil)
    recomputeStored(n)
    refreshView(n)
    status("table" -> n, "op" -> "update-from", "updated" -> res.updated)
  }

  private def updatePlain(s: String): DataFrame = s match {
    case UpdateRe(name, setPart, wherePart) =>
      val n = resolveKey(name)
      val t = table(n)
      val tgtSchema = t.read().schema
      val pairs = splitTopLevel(setPart, ',').map { a =>
        val eq = indexOfTopLevel(a, '=')
        require(eq > 0, s"bad assignment: $a")
        val col = norm(a.take(eq)).split('.').last
        // value expressions may embed subqueries over other tables —
        // route them through the same read rewrite as standalone
        // queries. A VARIANT target PARSES a string value like the
        // reference's UPDATE binder (a plain cast would wrap the text
        // as a variant string scalar — alignCast's rule)
        val rhs = rewriteReads(a.drop(eq + 1).trim)
        val isVariantTgt = tgtSchema.fields.exists(f =>
          f.name.equalsIgnoreCase(col) &&
            f.dataType == org.apache.spark.sql.types.VariantType)
        // graft_json_text, not a plain string cast: a variant RHS
        // renders canonically (cast would unquote string scalars)
        col -> (if (isVariantTgt) expr(s"parse_json(graft_json_text(($rhs)))")
                else expr(rhs))
      }
      // reference errors (1006) on duplicated assignments and on
      // assignments to columns the table does not have — both would
      // otherwise be silent wrong answers (last-wins / new column)
      val dups = pairs.groupBy(_._1).filter(_._2.length > 1).keys
      require(dups.isEmpty, s"UPDATE sets column(s) more than once: ${dups.mkString(",")}")
      val compNames = computedCols.getOrElse(n, Seq.empty).map(_._1.toLowerCase).toSet
      pairs.foreach { case (c, _) => require(!compNames(c.toLowerCase),
        s"1006: cannot update computed column $c") }
      val have = t.read().columns.map(_.toLowerCase).toSet
      val unknown = pairs.map(_._1).filterNot(c => have(c.toLowerCase))
      require(unknown.isEmpty,
        s"table $n does not have a column with name ${unknown.mkString(",")}")
      val assigns = pairs.toMap
      val cond0 = Option(wherePart)
        .map(w => expr(rewriteReads(
          substituteVirtualRefs(n, stripSelfQualifier(w.trim, name)))))
        .getOrElse(lit(true))
      // a row access policy scopes DML to policy-visible rows
      // (reference row_policy_dml_coverage)
      val cond = rowPolicyPredicate(n).map(p => expr(p) && cond0).getOrElse(cond0)
      t.update(cond, assigns)
      recomputeStored(n)
      refreshView(n)
      status("table" -> n, "op" -> "update")
    case _ => throw new IllegalArgumentException(s"cannot parse UPDATE: $s")
  }

  private def delete(s: String): DataFrame = s match {
    case DeleteRe(name, wherePart) =>
      val n = resolveKey(name)
      val t = table(n)
      val pol = rowPolicyPredicate(n).map(expr)
      Option(wherePart) match {
        case Some(w) =>
          val c = expr(rewriteReads(
            substituteVirtualRefs(n, stripSelfQualifier(w.trim, name))))
          t.delete(pol.map(_ && c).getOrElse(c))
        case None => pol match {
          // DELETE without WHERE must not truncate policy-invisible
          // rows (reference row_policy_dml_coverage)
          case Some(p) => t.delete(p)
          case None    => t.overwrite(t.read().limit(0).repartition(1))
        }
      }
      refreshView(n)
      status("table" -> n, "op" -> "delete")
    case _ => throw new IllegalArgumentException(s"cannot parse DELETE: $s")
  }

  private def merge(s: String): DataFrame = {
    // MERGE INTO <t> [AS a] USING <src> [AS a] ON <cond> WHEN ...
    val m = MergeHeadRe.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse MERGE: $s"))
    val n = resolveKey(m.group(1))
    // default alias: the unqualified spelling (a db-qualified key would
    // read as db.table.column in clause expressions)
    val targetAlias = Option(m.group(2)).map(norm).getOrElse(n.split('.').last)
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
          val setPairs = splitTopLevel(setTxt, ',').map { a =>
            val eq = indexOfTopLevel(a, '=')
            // target-side SET columns may be alias-qualified (t.c = ...)
            // — the reference's grammar allows it; match on the column
            val rawKey = norm(a.take(eq))
            val key = rawKey.split('.').last
            key -> a.drop(eq + 1).trim
          }
          // reference error 1006: the same column twice in one SET
          val dupCols = setPairs.groupBy(_._1).filter(_._2.size > 1).keys
          if (dupCols.nonEmpty) throw new IllegalArgumentException(
            s"1006: duplicate SET column ${dupCols.mkString(",")} in MERGE UPDATE")
          matched += GraftTable.MatchedClause(cond, Some(setPairs.toMap))
        }
      } else throw new IllegalArgumentException(s"unknown MERGE action: $action")
    }

    // computed columns are not merge-assignable (reference 1006); the
    // STORED family recomputes after the merge lands
    val mergeComp = computedCols.getOrElse(n, Seq.empty).map(_._1.toLowerCase).toSet
    if (mergeComp.nonEmpty) {
      matched.flatMap(_.set).flatMap(_.keys).foreach(c =>
        require(!mergeComp(c.toLowerCase), s"1006: cannot update computed column $c"))
      notMatched.flatMap(_.values).flatMap(_._1).foreach(c =>
        require(!mergeComp(c.toLowerCase), s"1006: cannot insert into computed column $c"))
    }
    // a row access policy scopes the merge to policy-visible target
    // rows: invisible rows can't match (reference row_policy_dml_coverage)
    val onCondScoped = rowPolicyPredicate(n, Some(targetAlias))
      .map(p => s"($onCond) AND $p").getOrElse(onCond)
    val res = t.mergeInto(srcDf, targetAlias, sourceAlias, onCondScoped,
      matched.toSeq, notMatched.toSeq)
    recomputeStored(n)
    consumeReferencedStreams()
    refreshView(n)
    // the reference's MERGE result: one count column per clause KIND
    // present, ordered insert / update / delete
    // (interpreter_merge_into.rs merge_into_mutations)
    val cols = Seq(
      (notMatched.nonEmpty, "number of rows inserted", res.inserted),
      (matched.exists(_.set.isDefined), "number of rows updated", res.updated),
      (matched.exists(_.set.isEmpty), "number of rows deleted", res.deleted)
    ).collect { case (true, name, v) => name -> v }
    import spark.implicits._
    cols.map(_._2) match {
      case Seq(a) => Seq(a).toDF(cols.map(_._1): _*)
      case Seq(a, b) => Seq((a, b)).toDF(cols.map(_._1): _*)
      case Seq(a, b, c) => Seq((a, b, c)).toDF(cols.map(_._1): _*)
      case _ => status("table" -> n, "op" -> "merge")
    }
  }

  /** strip crdb-style `@index` hints after identifiers, outside string
    * literals (the reference's parser consumes and ignores them)
    */
  private def stripIndexHints(sql: String): String = {
    val sb = new StringBuilder
    var i = 0; var q: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '"' || c == '`') { q = c; sb += c; i += 1 }
      else if (c == '@' && i > 0 &&
               (sql.charAt(i - 1).isLetterOrDigit || sql.charAt(i - 1) == '_') &&
               i + 1 < sql.length && (sql.charAt(i + 1).isLetter || sql.charAt(i + 1) == '_')) {
        i += 1
        while (i < sql.length && (sql.charAt(i).isLetterOrDigit || sql.charAt(i) == '_')) i += 1
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** drop `<table>.` qualifiers from a DML predicate: the filter runs
    * against the table's own DataFrame, where the raw name no longer
    * resolves as a qualifier (delete_cte/update_cte suites). Quote-aware:
    * occurrences inside '...'/"..."/`...` literals are left untouched so
    * e.g. `WHERE note = 't1.x'` on table t1 doesn't become `'x'`.
    */
  private def stripSelfQualifier(cond: String, table: String): String = {
    val name = norm(table)
    val sb = new StringBuilder
    var i = 0; var q: Char = 0
    while (i < cond.length) {
      val c = cond.charAt(i)
      if (q != 0) { sb.append(c); if (c == q) q = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => q = c; sb.append(c); i += 1
        case _ =>
          val wordBoundary = i == 0 || {
            val p = cond.charAt(i - 1); !p.isLetterOrDigit && p != '_' && p != '.'
          }
          if (wordBoundary && cond.regionMatches(true, i, name, 0, name.length)) {
            var j = i + name.length
            val ws = { var k = j; while (k < cond.length && cond.charAt(k).isWhitespace) k += 1; k }
            if (ws < cond.length && cond.charAt(ws) == '.') i = ws + 1
            else { sb.append(cond.substring(i, j)); i = j }
          } else { sb.append(c); i += 1 }
      }
    }
    sb.toString
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
      lambdaFns.remove(norm(name).toLowerCase)
      graft.functions.PyScalarUdf.drop(spark, norm(name))
      status("function" -> norm(name), "op" -> "drop-function")
    case _ => throw new IllegalArgumentException(s"cannot parse DROP FUNCTION: $s")
  }

  /** reference scalar lambda UDFs (ast/statements/udf.rs UDFDefinition
    * ::LambdaUDF: `CREATE FUNCTION f AS (a, b) -> <expr>`): kept as
    * SQL text and inlined at call sites — the body is databend-dialect
    * SQL and must run through the same rewrite pipeline as the query.
    */
  private val lambdaFns =
    mutable.LinkedHashMap[String, (Seq[String], String)]()

  private def createLambdaFunction(s: String): DataFrame = s match {
    case CreateLambdaFnRe(orReplace, ifNotExists, name, params, body) =>
      val key = norm(name).toLowerCase
      if (lambdaFns.contains(key) && orReplace == null && ifNotExists == null)
        throw new IllegalArgumentException(
          s"2603: UDF $key already exists")
      if (!(lambdaFns.contains(key) && ifNotExists != null))
        lambdaFns(key) = (
          splitTopLevel(params, ',').map(_.trim).filter(_.nonEmpty),
          body.trim)
      status("function" -> key, "op" -> "create-function",
        "language" -> "sql")
    case _ => throw new IllegalArgumentException(s"cannot parse CREATE FUNCTION: $s")
  }

  /** inline every registered lambda-UDF call; iterates so UDFs may
    * reference other UDFs (cycles stop at the guard and surface as an
    * unresolved function downstream)
    */
  private def expandLambdaFns(sql0: String): String = {
    if (lambdaFns.isEmpty) return sql0
    var sql = sql0
    var changed = true
    var guard = 0
    while (changed && guard < 20) {
      changed = false
      guard += 1
      for ((name, (params, body)) <- lambdaFns) {
        var from = 0
        while (from < sql.length) {
          val at = indexOfKeywordAnyDepth(sql, name, from)
          if (at < 0) from = sql.length
          else {
            var k = at + name.length
            while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
            if (k < sql.length && sql.charAt(k) == '(') {
              val close = matchParen(sql, k)
              val args = splitTopLevel(sql.substring(k + 1, close), ',')
                .map(_.trim)
              if (args.length == params.length ||
                  (params.isEmpty && args == Seq(""))) {
                // two-phase substitution: an ARGUMENT may spell
                // another parameter's name (cal(b, 5) with params
                // (a, b)) — placeholders keep it from being
                // re-substituted
                var b = body
                for ((p, i) <- params.zipWithIndex)
                  b = substituteIdentsOutsideStrings(b,
                    Map(p.toLowerCase -> s"__lfn_arg${i}__"))
                for ((a, i) <- args.zipWithIndex)
                  b = b.replace(s"__lfn_arg${i}__", s"($a)")
                sql = sql.substring(0, at) + s"($b)" + sql.substring(close + 1)
                changed = true
                from = at + 1
              } else from = close + 1
            } else from = at + name.length
          }
        }
      }
    }
    sql
  }

  private def createStage(s: String): DataFrame = s match {
    case CreateStageRe(name, url) =>
      stages(norm(name)) = url
      status("stage" -> norm(name), "url" -> url)
    case CreateBareStageRe(name) =>
      // URL-less internal stage: a managed dir under the warehouse
      val dir = s"$warehouse/stages/${norm(name)}"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
      stages(norm(name)) = dir
      status("stage" -> norm(name), "url" -> dir)
    case _ => throw new IllegalArgumentException(s"cannot parse CREATE STAGE: $s")
  }

  private def dropStage(s: String): DataFrame = s match {
    case DropStageRe(name) =>
      val n = norm(name)
      if (!stages.contains(n) &&
          !"""(?is)IF\s+EXISTS""".r.findFirstIn(s).isDefined)
        throw new IllegalArgumentException(s"2501: unknown stage $n")
      stages.remove(n).foreach { dir =>
        if (dir.startsWith(s"$warehouse/stages/")) rmrf(dir)
      }
      status("stage" -> n, "op" -> "drop")
    case _ => throw new IllegalArgumentException(s"cannot parse DROP STAGE: $s")
  }

  private def removeStage(s: String): DataFrame = s match {
    case RemoveStageRe(tgt) =>
      val dir = resolveStagePath(tgt.trim)
      val p = java.nio.file.Paths.get(dir)
      var n = 0
      if (java.nio.file.Files.isDirectory(p)) {
        java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .filter(q => q != p)
          .forEach { q => java.nio.file.Files.deleteIfExists(q); n += 1 }
      }
      status("op" -> "remove", "location" -> dir, "files_removed" -> n)
    case _ => throw new IllegalArgumentException(s"cannot parse REMOVE: $s")
  }

  /** databend COLUMNS() select items (ast/expr.rs ColumnsExpr):
    *   COLUMNS(* EXCLUDE x)   -> * EXCEPT (x)
    *   COLUMNS('regex')       -> the FROM table's matching columns
    *   COLUMNS(a -> pred(a))  -> columns whose NAME satisfies pred
    * The name forms resolve against the statement's (single) FROM
    * table; the predicate evaluates once over an inline VALUES list of
    * the column names.
    */
  private def rewriteColumnsFn(sql0: String): String = {
    if (!sql0.toLowerCase.contains("columns")) return sql0
    var sql = sql0
    var guard = 0
    while (guard < 30) {
      guard += 1
      // quote-aware scan: `columns` inside a string literal never fires
      var at = -1
      var from = 0
      var open = -1
      while (at < 0 && from < sql.length) {
        val cand = indexOfKeywordAnyDepth(sql, "COLUMNS", from)
        if (cand < 0) from = sql.length
        else {
          var k = cand + "COLUMNS".length
          while (k < sql.length && sql.charAt(k).isWhitespace) k += 1
          if (k < sql.length && sql.charAt(k) == '(') { at = cand; open = k }
          else from = cand + "COLUMNS".length
        }
      }
      if (at < 0) return sql
      val mStart = at
      val close = matchParen(sql, open)
      val inner = sql.substring(open + 1, close).trim
      val repl: String =
        if (inner.startsWith("*")) {
          val ex = inner.substring(1).trim
          val exList = """(?is)^EXCLUDE\s*\(?\s*(.*?)\s*\)?$""".r
            .findFirstMatchIn(ex).map(_.group(1)).getOrElse("")
          if (exList.nonEmpty) s"* EXCEPT ($exList)" else "*"
        } else {
          // resolve the owning FROM table's column names
          val fromM = """(?i)\bFROM\s+(`[^`]+`|[\w.]+)""".r
            .findFirstMatchIn(sql.substring(close))
          val cols: Seq[String] = fromM.flatMap { fm =>
            val t = norm(fm.group(1))
            scala.util.Try(
              spark.table(viewName(resolveKey(t))).columns.toSeq).toOption
          }.getOrElse(throw new IllegalArgumentException(
            "1065: COLUMNS() needs a resolvable FROM table"))
          val matched: Seq[String] = inner match {
            case re if re.startsWith("'") && re.endsWith("'") =>
              val pat = re.substring(1, re.length - 1)
              cols.filter(c => java.util.regex.Pattern.compile(pat)
                .matcher(c).find())
            case lam if """(?s)^\w+\s*->.*""".r.matches(lam) =>
              val arrow = lam.indexOf("->")
              val v = lam.take(arrow).trim
              val pred = lam.substring(arrow + 2).trim
              val valuesList = cols.map(c =>
                "('" + c.replace("'", "''") + "')").mkString(", ")
              spark.sql(
                s"SELECT `$v` FROM (VALUES $valuesList) AS __cn(`$v`) " +
                s"WHERE $pred").collect().map(_.getString(0)).toSeq
            case other => splitTopLevel(other, ',').map(c => norm(c))
                .filter(c => cols.exists(_.equalsIgnoreCase(c)))
          }
          if (matched.isEmpty)
            throw new IllegalArgumentException(
              s"1065: COLUMNS($inner) matches no column")
          matched.map(c => s"`$c`").mkString(", ")
        }
      sql = sql.substring(0, mStart) + repl + sql.substring(close + 1)
    }
    sql
  }

  /** shared FILE_FORMAT=(...) parse: (sparkFormat, reader/writer opts) */
  private def parseFileFormat(rest: String): (String, Map[String, String]) =
    FileFormatRe.findFirstMatchIn(rest) match {
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
        (sparkFmt, o.toMap)
    }

  /** COPY INTO @stage FROM <table|(query)>: unload as data files */
  private def copyExport(s: String): DataFrame = s match {
    case CopyExportRe(tgt, src0, rest0) =>
      val dir = resolveStagePath(tgt.trim)
      val src = src0.trim
      val df =
        if (src.startsWith("("))
          spark.sql(rewriteReads(src.substring(1, matchParen(src, 0))))
        else spark.table(viewName(resolveKey(src)))
      val (fmt, opts0) = parseFileFormat(Option(rest0).getOrElse(""))
      val opts = if (fmt == "csv") opts0 else opts0 - "sep" - "header"
      df.write.format(fmt).options(opts).mode("append").save(dir)
      status("op" -> "copy-unload", "location" -> dir,
        "rows_unloaded" -> df.count())
    case _ => throw new IllegalArgumentException(s"cannot parse COPY INTO <location>: $s")
  }

  private def copy(s: String): DataFrame = s match {
    case CopyRe(name, src, rest0) =>
      val n = resolveKey(name)
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

  /** inside '...' literals, `\"` stays a literal backslash+quote in
    * the reference's lexer — spell it `\\"` for Spark's
    */
  private def databendDquoteEscapes(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0; var q = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!q) { if (c == '\'') q = true; sb.append(c); i += 1 }
      else c match {
        case '\\' if i + 1 < s.length =>
          val n = s.charAt(i + 1)
          if (n == '"') { sb.append("\\\\\""); i += 2 }
          else { sb.append(c).append(n); i += 2 }
        case '\'' => q = false; sb.append(c); i += 1
        case _ => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** `FROM @stage[/sub]` reads the stage directory's data files;
    * format detected from file extensions (parquet default)
    */
  private def rewriteStageReads(sql: String): String =
    """(?i)\b(FROM|JOIN)\s+@([\w./-]+)""".r.replaceAllIn(sql, m => {
      val dir = resolveStagePath("@" + m.group(2))
      val p = java.nio.file.Paths.get(dir)
      val exts =
        if (java.nio.file.Files.isDirectory(p))
          graft.Fs.list(p).iterator.map(_.getFileName.toString)
            .filter(!_.startsWith(".")).flatMap(n =>
              n.split('.').lastOption).toSet
        else Set.empty[String]
      val df =
        if (exts.contains("csv"))
          spark.read.option("inferSchema", "true").csv(dir)
        else if (exts.contains("json") || exts.contains("ndjson"))
          spark.read.json(dir)
        else spark.read.parquet(dir)
      scala.util.matching.Regex.quoteReplacement(
        m.group(1) + " " + freshView(df))
    })

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
    case CreateStreamRe(ifNotExists, name, tbl, atStream, appendOnly) =>
      val n = resolveKey(name)
      if (streams.contains(n) && ifNotExists != null)
        return status("stream" -> n, "op" -> "exists")
      val mode = if (appendOnly != null && appendOnly.equalsIgnoreCase("true"))
        GraftStream.AppendOnly else GraftStream.Standard
      val st = GraftStream.create(table(tbl), n, mode)
      // AT (STREAM => other): start from the other stream's cursor so
      // both see the same pending window (reference stream.rs AT)
      if (atStream != null) st.setOffset(stream(norm(atStream)).offset)
      streams(n) = st
      status("stream" -> n, "on" -> norm(tbl), "op" -> "create")
  }

  private def dropStream(s: String): DataFrame = {
    val name = norm(s.replaceAll("(?is)^DROP\\s+STREAM\\s+(IF\\s+EXISTS\\s+)?", "").trim)
    streams.remove(name)
    status("stream" -> name, "op" -> "drop")
  }

  // ---- tasks (reference ast/statements/task.rs; semantics from
  // tests/sqllogictests/suites/task/*.test). The reference's scheduler
  // daemon is a cloud-control service; here scheduling is manual-tick
  // (`EXECUTE TASK`) with the full DDL/registry/DAG/WHEN surface — a
  // real deployment drives ticks with Structured Streaming triggers
  // (streaming/GraftStreams), which subsumes the cron daemon. ----------

  private final class TaskDef(
      val name: String,
      var warehouse: Option[String],
      var schedule: Option[String],
      var after: Vector[String],
      var when: Option[String],
      var suspendAfter: Option[Long],
      var errorIntegration: Option[String],
      var comment: Option[String],
      var sessionParams: Map[String, String],
      var definition: String,
      var state: String = "Suspended",
      var failures: Long = 0L)

  private val tasks = mutable.LinkedHashMap[String, TaskDef]()
  private val taskHistory =
    mutable.Buffer[(String, String, String, String, String, Long, String)]()
  private var taskRunSeq = 0L

  /** databend's observable schedule spelling (system.tasks.schedule) */
  private def scheduleDisplay(n: Long, unit: String): String =
    unit.toUpperCase.stripSuffix("S") match {
      case "MINUTE" => s"INTERVAL ${n * 60} SECOND"
      case "SECOND" => s"INTERVAL $n SECOND"
      case "MILLISECOND" => s"INTERVAL ${n / 1000} SECOND ${n % 1000} MILLISECOND"
      case other => throw new IllegalArgumentException(s"1005: bad schedule unit $other")
    }

  /** settings accepted as task session parameters (reference validates
    * against its settings registry — unknown keys are error 2801)
    */
  private val TaskSessionSettings = Set(
    "timezone", "query_tag", "max_threads", "max_memory_usage",
    "enable_query_result_cache", "sql_dialect", "date_format_style")

  private val CreateTaskRe =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?TASK\s+(IF\s+NOT\s+EXISTS\s+)?([`\w.]+)\s+(.*)$""".r

  /** parse the option region of CREATE/ALTER TASK into a mutator */
  private def applyTaskOpts(td: TaskDef, opts0: String): Unit = {
    var t = opts0.trim
    while (t.nonEmpty) {
      if (t.startsWith(",")) { t = t.substring(1).trim }
      else {
        val up = t.toUpperCase
        var matched = true
        if (up.startsWith("WHEN")) { // condition: the remainder of opts
          td.when = Some(t.substring(4).trim)
          t = ""
        } else {
          val res: Option[(Int, TaskDef => Unit)] =
            """(?is)^WAREHOUSE\s*=\s*'([^']*)'""".r.findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) => d.warehouse = Some(m.group(1))))
            .orElse("""(?is)^SCHEDULE\s*=\s*USING\s+CRON\s+'([^']*)'(?:\s+'([^']*)')?""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) => d.schedule = Some(s"CRON ${m.group(1)}"))))
            .orElse("""(?is)^SCHEDULE\s*=\s*(\d+)\s+(MINUTE|SECOND|MILLISECOND)S?\b""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) =>
                d.schedule = Some(scheduleDisplay(m.group(1).toLong, m.group(2))))))
            .orElse("""(?is)^AFTER\s+((?:'[^']*'|[\w.]+)(?:\s*,\s*(?:'[^']*'|[\w.]+))*)""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) =>
                d.after = splitTopLevel(m.group(1), ',')
                  .map(_.trim.stripPrefix("'").stripSuffix("'")).toVector)))
            .orElse("""(?is)^SUSPEND_TASK_AFTER_NUM_FAILURES\s*=\s*(\d+)""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) => d.suspendAfter = Some(m.group(1).toLong))))
            .orElse("""(?is)^ERROR_INTEGRATION\s*=\s*'([^']*)'""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) => d.errorIntegration = Some(m.group(1)))))
            .orElse("""(?is)^COMMENTS?\s*=\s*'([^']*)'""".r
              .findPrefixMatchOf(t)
              .map(m => (m.end, (d: TaskDef) => d.comment = Some(m.group(1)))))
            .orElse("""(?is)^(\w+)\s*=\s*('[^']*'|[\w.]+)""".r
              .findPrefixMatchOf(t)
              .map { m =>
                val k = m.group(1).toLowerCase
                if (!TaskSessionSettings.contains(k))
                  throw new IllegalArgumentException(
                    s"2801: Unknown setting $k for task ${td.name}")
                (m.end, (d: TaskDef) => d.sessionParams = d.sessionParams +
                  (k -> m.group(2).stripPrefix("'").stripSuffix("'")))
              })
          res match {
            case Some((end, f)) => f(td); t = t.substring(end).trim
            case None => matched = false
          }
        }
        require(matched, s"1005: cannot parse task option at: ${t.take(60)}")
      }
    }
  }

  private def createTask(s: String): DataFrame = s match {
    case CreateTaskRe(orRepl, ifNot, name0, rest0) =>
      val name = name0.replace("`", "")
      val asIdx = indexOfKeyword(rest0, "AS")
      require(asIdx >= 0, s"1005: CREATE TASK without AS: $s")
      val td = new TaskDef(name, None, None, Vector.empty, None, None, None,
        None, Map.empty, rest0.substring(asIdx + 2).trim.stripSuffix(";"))
      applyTaskOpts(td, rest0.substring(0, asIdx))
      require(td.after.isEmpty || td.schedule.isEmpty,
        s"1005: task $name: AFTER and SCHEDULE are mutually exclusive")
      if (tasks.contains(name) && ifNot != null)
        return status("task" -> name, "op" -> "create-task", "skipped" -> true)
      require(!tasks.contains(name) || orRepl != null,
        s"2302: task $name already exists")
      tasks(name) = td
      refreshTaskViews()
      status("task" -> name, "op" -> "create-task")
    case _ => throw new IllegalArgumentException(s"1005: cannot parse: $s")
  }

  private def taskOf(name0: String, ifExists: Boolean): Option[TaskDef] = {
    val name = name0.replace("`", "")
    tasks.get(name).orElse {
      if (ifExists) None
      else throw new IllegalArgumentException(s"2303: unknown task $name")
    }
  }

  private def alterTask(s: String): DataFrame = {
    val m = """(?is)^ALTER\s+TASK\s+(IF\s+EXISTS\s+)?([`\w.]+)\s+(.*)$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"1005: cannot parse: $s"))
    val tdOpt = taskOf(m.group(2), m.group(1) != null)
    if (tdOpt.isEmpty)
      return status("task" -> m.group(2), "op" -> "alter-task", "skipped" -> true)
    val td = tdOpt.get
    val action = m.group(3).trim.stripSuffix(";")
    val up = action.toUpperCase
    if (up == "RESUME") td.state = "Started"
    else if (up == "SUSPEND") td.state = "Suspended"
    else if (up.startsWith("MODIFY AS")) td.definition = action.substring(9).trim
    else if (up.startsWith("MODIFY WHEN")) td.when = Some(action.substring(11).trim)
    else if (up.startsWith("REMOVE AFTER")) {
      val name = action.substring(12).trim.stripPrefix("'").stripSuffix("'")
      td.after = td.after.filterNot(_ == name)
      // observed reference quirk (task_dag_test): an AFTER-less,
      // schedule-less task reports the default INTERVAL 0 SECOND
      if (td.after.isEmpty && td.schedule.isEmpty)
        td.schedule = Some("INTERVAL 0 SECOND")
    } else if (up.startsWith("ADD AFTER")) {
      val name = action.substring(9).trim.stripPrefix("'").stripSuffix("'")
      if (!td.after.contains(name)) td.after = td.after :+ name
      if (td.schedule.contains("INTERVAL 0 SECOND")) td.schedule = None
    } else if (up.startsWith("SET")) applyTaskOpts(td, action.substring(3))
    else throw new IllegalArgumentException(s"1005: cannot parse ALTER TASK: $action")
    refreshTaskViews()
    status("task" -> td.name, "op" -> "alter-task")
  }

  private def dropTask(s: String): DataFrame = {
    val m = """(?is)^DROP\s+TASK\s+(IF\s+EXISTS\s+)?([`\w.]+)\s*$""".r
      .findFirstMatchIn(s.stripSuffix(";"))
      .getOrElse(throw new IllegalArgumentException(s"1005: cannot parse: $s"))
    taskOf(m.group(2), m.group(1) != null).foreach(td => tasks.remove(td.name))
    refreshTaskViews()
    status("task" -> m.group(2), "op" -> "drop-task")
  }

  /** `WHEN` gate: SYSTEM$STREAM_HAS_DATA('s') resolves against the
    * stream registry (changes.rs stream_has_data — rows past the
    * cursor), everything else evaluates as a scalar boolean
    */
  private def taskWhenPasses(td: TaskDef): Boolean = td.when match {
    case None => true
    case Some(cond0) =>
      val cond = """(?i)SYSTEM\$STREAM_HAS_DATA\s*\(\s*'([^']*)'\s*\)""".r
        .replaceAllIn(cond0, w => {
          val sName = norm(w.group(1))
          val has = streams.contains(sName) &&
            (try !streams(sName).read().isEmpty catch { case _: Exception => false })
          has.toString
        })
      try query(s"SELECT ($cond) AS c").head().getBoolean(0)
      catch { case _: Exception => false }
  }

  /** run a task now (manual tick), then cascade to AFTER-dependents
    * that are Started and whose WHEN passes (the reference's DAG run)
    */
  private def runTask(td: TaskDef, manual: Boolean,
      visited: mutable.Set[String]): Unit = {
    if (!visited.add(td.name)) return
    if (!manual && (td.state != "Started" || !taskWhenPasses(td))) return
    taskRunSeq += 1
    val runId = taskRunSeq
    try {
      execute(td.definition)
      td.failures = 0
      taskHistory += ((td.name, "SUCCEEDED", td.warehouse.orNull,
        td.schedule.orNull, td.definition, runId, null))
    } catch {
      case e: Exception =>
        td.failures += 1
        if (td.suspendAfter.exists(td.failures >= _)) td.state = "Suspended"
        taskHistory += ((td.name, "FAILED", td.warehouse.orNull,
          td.schedule.orNull, td.definition, runId, e.getMessage))
        refreshTaskViews()
        if (manual) throw e else return
    }
    tasks.values.toSeq.filter(_.after.contains(td.name))
      .foreach(ch => runTask(ch, manual = false, visited))
    refreshTaskViews()
  }

  private def executeTask(s: String): DataFrame = {
    val name = s.substring("EXECUTE TASK".length).trim.stripSuffix(";")
    val td = taskOf(name, ifExists = false).get
    runTask(td, manual = true, mutable.Set.empty)
    status("task" -> td.name, "op" -> "execute-task")
  }

  private def showTasks(tail: String): DataFrame = {
    refreshTaskViews()
    showTail(spark.table("system_tasks"), "name", tail)
  }

  /** publish system.tasks / system.task_history (reference
    * system/src/task*.rs shapes)
    */
  private def refreshTaskViews(): Unit = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val taskSchema = StructType(Seq(
      StructField("name", StringType), StructField("state", StringType),
      StructField("warehouse", StringType), StructField("schedule", StringType),
      StructField("definition", StringType),
      StructField("condition_text", StringType),
      StructField("after", StringType),
      StructField("suspend_task_after_num_failures", LongType),
      StructField("error_integration", StringType),
      StructField("comment", StringType),
      StructField("session_parameters", StringType)))
    val taskRows = tasks.values.toSeq.map { t =>
      org.apache.spark.sql.Row(t.name, t.state, t.warehouse.orNull,
        t.schedule.orNull, t.definition, t.when.orNull,
        t.after.mkString(","),
        t.suspendAfter.map(java.lang.Long.valueOf).orNull,
        t.errorIntegration.orNull, t.comment.orNull,
        t.sessionParams.map { case (k, v) => s""""$k":"$v"""" }
          .mkString("{", ",", "}"))
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(taskRows).asJava), taskSchema)
      .createOrReplaceTempView("system_tasks")
    val histSchema = StructType(Seq(
      StructField("name", StringType), StructField("state", StringType),
      StructField("warehouse", StringType), StructField("schedule", StringType),
      StructField("definition", StringType), StructField("run_id", LongType),
      StructField("exception_text", StringType)))
    val histRows = taskHistory.toSeq.map { case (n, st, w, sc, d, r, e) =>
      org.apache.spark.sql.Row(n, st, w, sc, d, r, e)
    }
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(histRows).asJava), histSchema)
      .createOrReplaceTempView("system_task_history")
  }

  // ---- SHOW / DESCRIBE (reference ast/statements/show.rs; output
  // shapes from tests/sqllogictests/suites/base/06_show/) -------------

  /** databend type spelling for a Spark type (DESCRIBE/SHOW COLUMNS) */
  private def dbTypeName(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case ByteType => "TINYINT"
      case StringType => "VARCHAR"
      case DoubleType => "DOUBLE"
      case FloatType => "FLOAT"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BINARY"
      case VariantType => "VARIANT"
      case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
      case a: ArrayType => s"ARRAY(${dbTypeName(a.elementType)})"
      case m: MapType => s"MAP(${dbTypeName(m.keyType)}, ${dbTypeName(m.valueType)})"
      case s: StructType =>
        s.fields.map(f => dbTypeName(f.dataType)).mkString("TUPLE(", ", ", ")")
      case other => other.sql
    }
  }

  /** schema of a (graft or Spark-native) table/view by name */
  private def schemaOf(name: String): org.apache.spark.sql.types.StructType = {
    val key = resolveKey(name)
    if (tables.contains(key)) tables(key).read().schema
    else spark.table(norm(name).split('.').last).schema
  }

  /** apply a `[LIKE 'pat'] [WHERE cond] [LIMIT n]` SHOW tail to `df`,
    * with LIKE matching `nameCol`
    */
  private def showTail(df: DataFrame, nameCol: String, tail0: String): DataFrame = {
    var d = df
    var t = tail0.trim
    """(?is)^LIKE\s+('(?:[^']|'')*')""".r.findPrefixMatchOf(t).foreach { m =>
      d = d.where(s"$nameCol LIKE ${m.group(1)}")
      t = t.substring(m.end).trim
    }
    if (t.toUpperCase.startsWith("WHERE")) {
      val rest = t.substring(5)
      val lim = indexOfKeyword(rest, "LIMIT")
      val cond = if (lim < 0) rest else rest.substring(0, lim)
      // identQuotes: a databend "Engine" identifier would parse as a
      // STRING literal in Spark's where()
      d = d.where(identQuotes(cond.trim))
      t = if (lim < 0) "" else rest.substring(lim).trim
    }
    """(?is)^LIMIT\s+(\d+)""".r.findPrefixMatchOf(t).foreach { m =>
      d = d.limit(m.group(1).toInt)
      t = t.substring(m.end).trim
    }
    require(t.isEmpty, s"1005: cannot parse SHOW tail: $t")
    d
  }

  /** per-column description rows (DESCRIBE / SHOW FIELDS / SHOW COLUMNS) */
  private def columnRows(tableName: String): Seq[(String, String, String, String, String, String)] = {
    val nn = notNullCols.getOrElse(resolveKey(tableName), Set.empty)
    schemaOf(tableName).fields.toSeq.map { f =>
      val nullable = f.nullable && !nn.contains(f.name.toLowerCase)
      (f.name, dbTypeName(f.dataType), if (nullable) "YES" else "NO",
        "NULL", "", "")
    }
  }

  /** DESC[RIBE] [TABLE|VIEW] name — five columns like the reference's
    * (Field, Type, Null, Default, Extra)
    */
  private def describeTable(name: String): DataFrame = {
    import spark.implicits._
    columnRows(name).map { case (n, t, nl, d, e, _) => (n, t, nl, d, e) }
      .toDF("field", "type", "null", "default", "extra")
  }

  /** SHOW [FULL] COLUMNS {FROM|IN} t [{FROM|IN} db] [LIKE|WHERE ...] */
  private def showColumns(s: String): DataFrame = {
    import spark.implicits._
    val m = """(?is)^SHOW\s+(FULL\s+)?COLUMNS\s+(?:FROM|IN)\s+([`\w.]+)(?:\s+(?:FROM|IN)\s+([`\w.]+))?(.*)$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"1005: cannot parse: $s"))
    val full = m.group(1) != null
    val tbl0 = norm(m.group(2)).split('.').last
    val tbl = Option(m.group(3)).map(db => s"${norm(db)}.$tbl0").getOrElse(tbl0)
    val base =
      if (full)
        columnRows(tbl).map { case (n, t, nl, d, k, _) =>
          (n, t, nl, d, k, null: String, null: String, null: String, "")
        }.toDF("column_name", "data_type", "is_nullable", "default", "key",
               "extra", "collation", "privileges", "comment")
      else
        columnRows(tbl).map { case (n, t, nl, d, k, e) => (n, t, nl, d, k, e) }
          .toDF("column_name", "data_type", "is_nullable", "default", "key", "extra")
    showTail(base, "column_name", m.group(4)).orderBy("column_name")
  }

  /** SHOW FUNCTIONS [LIKE|WHERE ...] — (name, is_aggregate, description) */
  private def showFunctions(tail: String): DataFrame = {
    import spark.implicits._
    val aggNames = graft.functions.GraftFunctions.aggregateNames
    val rows = spark.catalog.listFunctions().collect().toSeq
      .map(f => (f.name.toLowerCase, if (aggNames.contains(f.name.toLowerCase)) 1 else 0, ""))
      .distinct.sortBy(_._1)
    showTail(rows.toDF("name", "is_aggregate", "description"), "name", tail)
  }

  /** SHOW SETTINGS [LIKE|WHERE ...] — session configuration as a
    * relation (reference settings_table.rs)
    */
  private def showSettings(tail: String): DataFrame = {
    import spark.implicits._
    val rows = spark.conf.getAll.toSeq.sorted
      .map { case (k, v) => (k, v, v, "SESSION", "") }
    showTail(
      rows.toDF("name", "value", "default", "level", "description"), "name", tail)
  }

  private def showDatabases(tail: String): DataFrame = {
    import spark.implicits._
    showTail(databases.toSeq.sorted.toDF("name"), "name", tail)
  }

  /** SHOW CREATE TABLE t — (table, create_table), DDL regenerated from
    * the live schema (the reference rebuilds it from table meta too)
    */
  private def showCreateTable(name: String): DataFrame = {
    import spark.implicits._
    val cols = schemaOf(name).fields.map { f =>
      s"  ${f.name} ${dbTypeName(f.dataType)}" + (if (f.nullable) " NULL" else " NOT NULL")
    }.mkString(",\n")
    val key = resolveKey(name)
    val cluster = clusterKeys.get(key)
      .map(ks => s" CLUSTER BY (${ks.mkString(", ")})").getOrElse("")
    // table-level index specs render after the columns, options sorted
    // by name (reference show_create_table formatting)
    val idxLines = tableIndexes.getOrElse(key, mutable.Buffer.empty).map { d =>
      val opts = d.opts.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k = '$v'" }.mkString(", ")
      s"  ${if (d.sync) "SYNC" else "ASYNC"} ${d.family} INDEX ${d.name} (${d.cols.mkString(", ")})" +
        (if (opts.nonEmpty) s" $opts" else "")
    }
    val body = (Seq(cols) ++ idxLines).filter(_.nonEmpty).mkString(",\n")
    val tname = norm(name).split('.').last
    Seq((tname, s"CREATE TABLE $tname (\n$body\n) ENGINE=FUSE$cluster"))
      .toDF("table", "create_table")
  }

  /** generic `SHOW <thing>` onto the system relations (reference maps
    * SHOW onto system.<table> rewrites in ast/statements/show.rs)
    */
  private val showSystem: Map[String, SparkSession => DataFrame] = {
    import graft.operators.SystemTables
    Map(
      "ENGINES" -> SystemTables.engines,
      "USERS" -> SystemTables.users,
      "ROLES" -> SystemTables.roles,
      "METRICS" -> SystemTables.metrics,
      "PROCESSLIST" -> SystemTables.processes,
      "INDEXES" -> SystemTables.indexes,
      "LOCKS" -> SystemTables.locks,
      "CATALOGS" -> SystemTables.catalogs,
      "TABLE_FUNCTIONS" -> SystemTables.tableFunctions,
      "PROCEDURES" -> SystemTables.procedures,
      "DICTIONARIES" -> SystemTables.dictionaries,
      "STATISTICS" -> SystemTables.statistics)
  }

  /** SHOW / DESC dispatch beyond the dedicated forms */
  private def showDescribe(s: String): DataFrame = {
    val up = s.toUpperCase
    if (up.startsWith("DESC")) {
      val rest = s.replaceAll("(?is)^DESC(RIBE)?\\s+(TABLE\\s+|VIEW\\s+)?", "").trim
      if (rest.toUpperCase.startsWith("FUNCTION") ||
          rest.toUpperCase.startsWith("QUERY")) return query(s)
      return describeTable(rest)
    }
    val m = """(?is)^SHOW\s+(FULL\s+)?(\w+)(.*)$""".r.findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"1005: cannot parse: $s"))
    val word = m.group(2).toUpperCase
    val tail = m.group(3)
    word match {
      case "COLUMNS" => showColumns(s)
      case "FIELDS" =>
        val t = """(?is)^\s*(?:FROM|IN)\s+([`\w.]+)""".r.findFirstMatchIn(tail)
          .getOrElse(throw new IllegalArgumentException(s"1005: cannot parse: $s"))
        describeTable(t.group(1))
      case "FUNCTIONS" => showFunctions(tail)
      case "SETTINGS" => showSettings(tail)
      case "DATABASES" | "SCHEMAS" => showDatabases(tail)
      case w if showSystem.contains(w) =>
        showTail(showSystem(w)(spark), showSystem(w)(spark).columns.head, tail)
      case _ => query(s) // SHOW VIEWS etc.: Spark-native
    }
  }

  /** SHOW STREAMS [LIKE '...'] — (name, table_on, mode) with the
    * reference's db.table qualification and append_only/standard mode
    * spellings (show.rs stream listing)
    */
  private def showStreams(tail: String): DataFrame = {
    val rows = streams.toSeq.map { case (n, st) =>
      val tblKey = tables.find(_._2 eq st.table).map(_._1)
        .getOrElse(Paths.get(st.table.path).getFileName.toString)
      val qualified = if (tblKey.contains(".")) tblKey else s"$currentDb.$tblKey"
      val mode = st.mode match {
        case GraftStream.AppendOnly => "append_only"
        case _ => "standard"
      }
      (n, qualified, mode)
    }
    import spark.implicits._
    val df = rows.toDF("name", "table_on", "mode")
    val v = freshView(df)
    val cond = tail.trim match {
      case "" => ""
      case l if l.toUpperCase.startsWith("LIKE") => " WHERE name " + l
      case w if w.toUpperCase.startsWith("WHERE") => " " + w
      case other => " WHERE " + other
    }
    spark.sql(s"SELECT * FROM $v$cond ORDER BY name")
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

  // ---- session variables (reference ast/statements/set.rs
  // SET VARIABLE, scalars getvariable(), SHOW VARIABLES) --------------

  /** name -> (spark value, databend-spelled type). Values substitute
    * into later statements as literals ($name / getvariable('name')).
    */
  private val variables = mutable.LinkedHashMap[String, (Any, String)]()

  /** databend types literals by VALUE (a 3 is UInt8); mirror that for
    * the SHOW VARIABLES type column
    */
  private def dbdTypeOf(v: Any): String = v match {
    case null => "NULL"
    case _: Boolean | _: java.lang.Boolean => "Boolean"
    case _: String => "String"
    case _: java.lang.Double => "Float64"
    case _: java.lang.Float => "Float32"
    case d: java.math.BigDecimal => s"Decimal(${d.precision}, ${d.scale})"
    case _: java.sql.Timestamp => "Timestamp"
    case _: java.sql.Date => "Date"
    case n: Number =>
      val l = n.longValue
      if (l >= 0) {
        if (l <= 255) "UInt8" else if (l <= 65535) "UInt16"
        else if (l <= 4294967295L) "UInt32" else "UInt64"
      } else {
        if (l >= -128) "Int8" else if (l >= -32768) "Int16"
        else if (l >= Int.MinValue) "Int32" else "Int64"
      }
    case _ => "String"
  }

  private def literalSql(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case d: java.sql.Date => s"DATE '$d'"
    case other => other.toString
  }

  /** SET VARIABLE a = expr | SET VARIABLE (a, b) = (SELECT ...) */
  private def setVariable(rest0: String): DataFrame = {
    val rest = rest0.trim
    val eq = {
      val depths = parenDepths(rest)
      rest.indices.find(i => rest(i) == '=' && depths(i) == 0)
        .getOrElse(throw new IllegalArgumentException(s"SET VARIABLE needs '=': $rest"))
    }
    val lhs = rest.substring(0, eq).trim
    val rhs = rest.substring(eq + 1).trim
    val names =
      if (lhs.startsWith("(")) lhs.stripPrefix("(").stripSuffix(")")
        .split(",").map(_.trim.toLowerCase).toSeq
      else Seq(lhs.toLowerCase)
    val inner = if (rhs.startsWith("(")) rhs.substring(1, matchParen(rhs, 0)) else rhs
    val df =
      if ("""(?is)^\s*(select|with|values)\b""".r.findFirstIn(inner).isDefined)
        query(inner)
      else query("SELECT " + inner)
    require(df.schema.length == names.length,
      s"Expect ${names.length} column in set query result, but got ${df.schema.length} columns")
    val row = df.limit(2).collect().headOption
    names.zipWithIndex.foreach { case (n, i) =>
      val v = row.map(_.get(i)).orNull
      variables(n) = (v, dbdTypeOf(v))
    }
    status("op" -> "set-variable", "names" -> names.mkString(","))
  }

  private def variablesDf(): DataFrame = {
    import spark.implicits._
    variables.toSeq.map { case (n, (v, t)) =>
      val shown = v match {
        case s: String => "'" + s + "'"
        case null => "NULL"
        case other => other.toString
      }
      (n, shown, t)
    }.toDF("name", "value", "type")
  }

  private def showVariables(tail: String): DataFrame = {
    val v = freshView(variablesDf())
    val cond = tail.trim match {
      case "" => ""
      case w if w.toUpperCase.startsWith("WHERE") => " " + w
      case l if l.toUpperCase.startsWith("LIKE") => " WHERE name " + l
      case other => " WHERE " + other
    }
    spark.sql(s"SELECT name, value, type FROM $v$cond")
  }

  /** replace $name and getvariable('name') with the stored literal;
    * quote-aware, `$$` (script blocks) untouched
    */
  private def substituteVariables(sql: String): String = {
    var s = sql
    if (s.toLowerCase.contains("getvariable")) {
      s = """(?i)\bgetvariable\s*\(\s*'([^']*)'\s*\)""".r.replaceAllIn(s, m =>
        java.util.regex.Matcher.quoteReplacement(
          variables.get(m.group(1).toLowerCase).map(v => literalSql(v._1)).getOrElse("NULL")))
    }
    if (!s.contains("$") || variables.isEmpty) return s
    val sb = new StringBuilder(s.length)
    var i = 0; var inStr = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inStr) { if (c == '\'') inStr = false; sb.append(c); i += 1 }
      else if (c == '\'') { inStr = true; sb.append(c); i += 1 }
      else if (c == '$' && i + 1 < s.length &&
               (s.charAt(i + 1).isLetter || s.charAt(i + 1) == '_')) {
        var j = i + 1
        while (j < s.length && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')) j += 1
        val name = s.substring(i + 1, j).toLowerCase
        variables.get(name) match {
          case Some((v, _)) => sb.append(literalSql(v)); i = j
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ---- maintenance ----------------------------------------------------

  /** `fuse_snapshot('db','t')` & friends in FROM position -> a fresh
    * temp view over the metadata DataFrame (reference
    * service/table_functions/fuse_*; our 1-file-per-segment model makes
    * segment and block counts coincide).
    */
  private def rewriteFuseTvfs(sql: String): String =
    FuseTvfRe.replaceAllIn(sql, m => {
      val fn = m.group(1).toLowerCase
      val db = m.group(2); val tn = m.group(3)
      val key = resolveKey(if (db.isEmpty || db == "default") tn else s"$db.$tn")
      val t = table(key)
      val df = fn match {
        case "fuse_snapshot" => graft.operators.TableFunctions.fuseSnapshot(spark, t)
        case "fuse_block" =>
          graft.operators.TableFunctions.blocks(spark, t)
            .withColumnRenamed("file_name", "block_location")
            .withColumnRenamed("size_bytes", "file_size")
        case "fuse_segment" => graft.operators.TableFunctions.fuseSegment(spark, t)
        case "fuse_column" => graft.operators.TableFunctions.fuseColumn(spark, t)
        case "fuse_statistic" => graft.operators.TableFunctions.fuseStatistic(spark, t)
        case "clustering_information" =>
          val keys = clusterKeys.getOrElse(key,
            throw new IllegalArgumentException(s"no CLUSTER BY declared for $key"))
          graft.operators.TableFunctions.clusteringInformation(spark, t, keys.head)
        case "clustering_statistics" =>
          val keys = clusterKeys.getOrElse(key,
            throw new IllegalArgumentException(s"no CLUSTER BY declared for $key"))
          graft.operators.TableFunctions.clusteringStatistics(spark, t, keys)
      }
      java.util.regex.Matcher.quoteReplacement(freshView(df))
    })

  // ---- security policies ---------------------------------------------

  /** substitute the policy's declared arg names with actual column
    * references (USING order, not schema order — reference
    * row_policy_column_order suite) and current_role() with the
    * session role, outside string literals; an identifier immediately
    * followed by '(' is a function name and is left alone
    */
  private def policyBodySql(p: SecPolicy, cols: Seq[String],
      qual: Option[String]): String = {
    require(cols.length == p.args.length,
      s"1114: policy ${p.name} expects ${p.args.length} argument(s), got ${cols.length}")
    val repl: Map[String, String] = p.args.map(_._1).zip(cols).map {
      case (a, c) =>
        a.toLowerCase -> (qual.map(q => s"`$q`.").getOrElse("") + s"`$c`")
    }.toMap
    // session-role builtins and GETVARIABLE both bind at statement
    // time (reference row_policy_result_cache: a changed variable
    // value must re-evaluate the policy, never serve a stale cache)
    val body = substituteVariables(substituteRoleFns(p.body))
    "(" + substituteIdentsOutsideStrings(body, repl) + ")"
  }

  /** replace bare identifiers per `repl` (keys lowercase), skipping
    * string literals and function-call names
    */
  private def substituteIdentsOutsideStrings(body: String,
      repl: Map[String, String]): String = {
    val sb = new StringBuilder(body.length)
    var i = 0
    while (i < body.length) {
      val ch = body.charAt(i)
      if (ch == '\'') {
        val j = body.indexOf('\'', i + 1)
        val end = if (j < 0) body.length else j + 1
        sb.append(body.substring(i, end)); i = end
      } else if (ch.isLetter || ch == '_') {
        var j = i
        while (j < body.length &&
               (body.charAt(j).isLetterOrDigit || body.charAt(j) == '_')) j += 1
        val word = body.substring(i, j)
        var k = j
        while (k < body.length && body.charAt(k).isWhitespace) k += 1
        val isCall = k < body.length && body.charAt(k) == '('
        if (!isCall && repl.contains(word.toLowerCase))
          sb.append(repl(word.toLowerCase))
        else sb.append(word)
        i = j
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** VIRTUAL computed columns referenced in DML predicates/values
    * evaluate over the physical frame — splice their expressions in
    */
  private def substituteVirtualRefs(n: String, text: String): String = {
    val virt = computedCols.getOrElse(n, Seq.empty).filterNot(_._4)
    if (virt.isEmpty) text
    else substituteIdentsOutsideStrings(text,
      virt.map(v => v._1.toLowerCase -> s"(${v._3})").toMap)
  }

  /** columns of `tableKey` carrying a masking policy (the USING
    * argument columns are NOT attached — the reference lets several
    * policies share an argument column like `role`)
    */
  private def maskedCols(tableKey: String): Set[String] =
    maskAttach.getOrElse(tableKey, mutable.LinkedHashMap.empty).keySet.toSet

  /** every column referenced by any attached policy (masked columns,
    * masking USING arguments, row-access ON columns) — these refuse
    * MODIFY/DROP COLUMN (reference 1132)
    */
  private def policyAttachedCols(tableKey: String): Set[String] = {
    val masked = maskAttach.getOrElse(tableKey, mutable.LinkedHashMap.empty)
      .flatMap { case (c, (_, args)) => c +: args.map(_.toLowerCase) }
    val rowCols = rowPolicyAttach.get(tableKey).toSeq
      .flatMap(_._2.map(_.toLowerCase))
    (masked ++ rowCols).toSet
  }

  private def policyType(ddl0: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    val ddl = ddl0.trim.replaceAll("(?is)\\s+(NOT\\s+)?NULL\\s*$", "").trim
    ddl.toLowerCase match {
      case "varchar" | "text" | "string" => StringType
      case "int" | "integer" | "int32"   => IntegerType
      case "bigint" | "int64"            => LongType
      case "boolean" | "bool"            => BooleanType
      case "float" | "float32"           => FloatType
      case "double" | "float64"          => DoubleType
      case other =>
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parseDataType(other)
    }
  }

  private def sameTypeFamily(a: org.apache.spark.sql.types.DataType,
      b: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def fam(t: DataType): String = t match {
      case _: StringType => "string"
      case ByteType | ShortType | IntegerType | LongType => "int"
      case FloatType | DoubleType | _: DecimalType => "float"
      case other => other.typeName
    }
    fam(a) == fam(b)
  }

  private val CreatePolicyRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?(MASKING|ROW\s+ACCESS)\s+POLICY\s+(?:(IF\s+NOT\s+EXISTS)\s+)?([`"\w]+)\s+AS\s*\(([^)]*)\)\s*""" +
     """RETURNS\s+([\w() ]+?)\s*->(.*?)(?:\s+COMMENT\s*=\s*'([^']*)')?\s*$""").r

  private def createPolicy(s: String): DataFrame = s match {
    case CreatePolicyRe(orReplace, kindWord, ifNotExists, name0, argList,
        retDdl, body, comment) =>
      require(orReplace == null || ifNotExists == null,
        "1005: CREATE OR REPLACE ... IF NOT EXISTS is not allowed")
      val name = norm(name0)
      val kind =
        if (kindWord.toUpperCase.startsWith("MASKING")) "MASKING POLICY"
        else "ROW ACCESS POLICY"
      secPolicies.get(name).foreach { p =>
        if (p.kind != kind)
          throw new IllegalArgumentException(
            s"2321: policy $name already exists as a ${p.kind}")
        if (orReplace == null && ifNotExists == null)
          throw new IllegalArgumentException(s"2321: policy $name already exists")
      }
      if (secPolicies.contains(name) && ifNotExists != null)
        return status("policy" -> name, "op" -> "exists")
      val args = splitTopLevel(argList, ',').map { a =>
        val t = a.trim
        val sp = t.indexWhere(_.isWhitespace)
        require(sp > 0, s"1005: policy argument needs a type: $t")
        norm(t.take(sp)) -> policyType(t.drop(sp))
      }
      require(args.nonEmpty, "1005: policy needs at least one argument")
      val ret = policyType(retDdl)
      if (kind == "MASKING POLICY")
        require(sameTypeFamily(ret, args.head._2),
          s"1121: return type ${ret.sql} must match the value argument type ${args.head._2.sql}")
      else {
        require(ret == org.apache.spark.sql.types.BooleanType,
          "1005: row access policy must return BOOLEAN")
        require(!"""(?is)\(\s*select\b""".r.findFirstIn(body).isDefined,
          "1005: subqueries are not allowed in a row access policy body")
      }
      secPolicies(name) = SecPolicy(name, kind, args, ret, body.trim,
        Option(comment).getOrElse(""))
      status("policy" -> name, "op" -> "create-policy", "kind" -> kind)
    case _ => throw new IllegalArgumentException(s"cannot parse CREATE POLICY: $s")
  }

  private def dropPolicy(s: String): DataFrame = {
    val m = """(?is)^\s*DROP\s+(MASKING|ROW\s+ACCESS)\s+POLICY\s+(?:(IF\s+EXISTS)\s+)?([`"\w]+)\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DROP POLICY: $s"))
    val kind = if (m.group(1).toUpperCase.startsWith("MASKING")) "MASKING POLICY"
               else "ROW ACCESS POLICY"
    val ifExists = m.group(2) != null
    val name = norm(m.group(3))
    secPolicies.get(name) match {
      case None =>
        require(ifExists, s"2322: unknown $kind $name")
      case Some(p) if p.kind != kind =>
        require(ifExists, s"2322: $name is a ${p.kind}, not a $kind")
      case Some(_) =>
        // attachments on LIVE tables block the drop (1133); stale
        // attachments on dropped tables are swept instead — the
        // reference lets the policy go and an UNDROP then restores
        // the table without it
        val liveRow = rowPolicyAttach.exists { case (t, (pn, _)) =>
          pn == name && tables.contains(t) }
        val liveMask = maskAttach.exists { case (t, m2) =>
          tables.contains(t) && m2.values.exists(_._1 == name) }
        require(!liveRow && !liveMask,
          s"1133: policy $name is attached to a table; detach it first")
        rowPolicyAttach.filterInPlace { case (_, (pn, _)) => pn != name }
        maskAttach.values.foreach(_.filterInPlace { case (_, (pn, _)) => pn != name })
        secPolicies.remove(name)
    }
    status("policy" -> name, "op" -> "drop-policy")
  }

  private def descPolicy(s: String): DataFrame = {
    val m = """(?is)^\s*DESC(?:RIBE)?\s+(MASKING|ROW\s+ACCESS)\s+POLICY\s+([`"\w]+)\s*$""".r
      .findFirstMatchIn(s)
      .getOrElse(throw new IllegalArgumentException(s"cannot parse DESC POLICY: $s"))
    val name = norm(m.group(2))
    val p = secPolicies.getOrElse(name,
      throw new IllegalArgumentException(s"2322: unknown policy $name"))
    import spark.implicits._
    Seq((p.name,
      p.args.map { case (a, t) => s"$a ${t.sql}" }.mkString("(", ", ", ")"),
      p.retType.sql, p.body, p.comment))
      .toDF("name", "signature", "return_type", "body", "comment")
  }

  /** policy_references(POLICY_NAME => '..') /
    * (REF_ENTITY_NAME => '..', REF_ENTITY_DOMAIN => 'TABLE') TVF —
    * reference table_functions/policy_references; only live tables are
    * listed
    */
  private def policyReferencesDf(args: String): DataFrame = {
    val kvs = splitTopLevel(args, ',').map { a =>
      val m = """(?is)^\s*(\w+)\s*=>\s*'([^']*)'\s*$""".r.findFirstMatchIn(a)
        .getOrElse(throw new IllegalArgumentException(
          s"1006: bad policy_references argument: $a"))
      m.group(1).toUpperCase -> m.group(2)
    }.toMap
    val polName = kvs.get("POLICY_NAME")
    val refName = kvs.get("REF_ENTITY_NAME")
    val refDomain = kvs.get("REF_ENTITY_DOMAIN")
    val ok = (polName.isDefined && refName.isEmpty && refDomain.isEmpty) ||
      (polName.isEmpty && refName.isDefined &&
       refDomain.exists(_.equalsIgnoreCase("TABLE")))
    require(ok, "1006: policy_references expects POLICY_NAME alone, or " +
      "REF_ENTITY_NAME with REF_ENTITY_DOMAIN => 'TABLE'")
    def split(k: String): (String, String) =
      if (k.contains(".")) (k.split("\\.")(0), k.split("\\.")(1))
      else ("default", k)
    val rows = mutable.Buffer[(String, String, String, String, String, String, String, String)]()
    for ((t, (pn, cols)) <- rowPolicyAttach if tables.contains(t)) {
      val (db, tn) = split(t)
      rows += ((pn, "ROW ACCESS POLICY", db, tn, "TABLE", "NULL",
        cols.mkString(", "), "ACTIVE"))
    }
    for ((t, m2) <- maskAttach if tables.contains(t); (c, (pn, argCols)) <- m2) {
      val (db, tn) = split(t)
      rows += ((pn, "MASKING POLICY", db, tn, "TABLE", c,
        if (argCols.isEmpty) "NULL" else argCols.mkString(", "), "ACTIVE"))
    }
    val picked = rows.filter { r =>
      polName.forall(_.toLowerCase == r._1) &&
      refName.forall { rn =>
        val (db, tn) = split(norm(rn)); db == r._3 && tn == r._4 }
    }.sortBy(r => (r._1, r._4))
    import spark.implicits._
    picked.toSeq.toDF("policy_name", "policy_kind", "ref_database",
      "ref_entity_name", "ref_entity_domain", "ref_column_name",
      "ref_arg_columns", "status")
  }

  private def roleDdl(s: String): DataFrame = {
    val up = s.toUpperCase
    if (up.startsWith("CREATE ROLE")) {
      val n = norm(s.replaceAll("(?is)^CREATE\\s+ROLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?", "")
        .stripPrefix("'").stripSuffix("'").trim)
      roles += n
      status("role" -> n, "op" -> "create-role")
    } else if (up.startsWith("DROP ROLE")) {
      val n = norm(s.replaceAll("(?is)^DROP\\s+ROLE\\s+(IF\\s+EXISTS\\s+)?", "")
        .stripPrefix("'").stripSuffix("'").trim)
      roles -= n
      status("role" -> n, "op" -> "drop-role")
    } else { // SET ROLE
      val n = norm(s.replaceAll("(?is)^SET\\s+ROLE\\s+", "")
        .stripPrefix("'").stripSuffix("'").trim)
      require(roles.exists(_.equalsIgnoreCase(n)),
        s"2206: unknown role $n")
      currentRole = n
      status("role" -> n, "op" -> "set-role")
    }
  }

  private def undropTable(s: String): DataFrame = {
    val name = resolveKey(s.replaceAll("(?is)^UNDROP\\s+TABLE\\s+", "").trim)
    require(!tables.contains(name), s"2308: table $name already exists")
    val d = droppedTables.remove(name)
      .getOrElse(throw new IllegalArgumentException(s"1025: no dropped table $name"))
    // restore attachments whose policy still exists (a policy dropped
    // while the table was dropped is gone for good)
    d.rowPolicy.filter(rp => secPolicies.contains(rp._1))
      .foreach(rowPolicyAttach(name) = _)
    val liveMasks = d.masks.filter(m => secPolicies.contains(m._2._1))
    if (liveMasks.nonEmpty)
      maskAttach(name) = mutable.LinkedHashMap(liveMasks: _*)
    register(name, d.t)
    status("table" -> name, "op" -> "undrop")
  }

  private def alterTable(s: String): DataFrame = s match {
    case AlterAddRowPolicyRe(name, pol, cols) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val pn = norm(pol)
      val p = secPolicies.getOrElse(pn,
        throw new IllegalArgumentException(s"1131: unknown row access policy $pn"))
      require(p.kind == "ROW ACCESS POLICY", s"1131: $pn is not a row access policy")
      val onCols = splitTopLevel(cols, ',').map(norm)
      val schema = tables(n).read().schema
      val fields = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
      require(onCols.length == p.args.length,
        s"1114: policy $pn expects ${p.args.length} column(s), got ${onCols.length}")
      onCols.zip(p.args).foreach { case (c, (_, at)) =>
        val ct = fields.getOrElse(c.toLowerCase,
          throw new IllegalArgumentException(s"1114: unknown column $c"))
        require(sameTypeFamily(ct, at),
          s"1114: column $c type ${ct.sql} does not match policy argument type ${at.sql}")
      }
      require(!rowPolicyAttach.contains(n),
        s"1132: table $n already has a row access policy")
      val masked = maskedCols(n)
      onCols.foreach(c => require(!masked(c.toLowerCase),
        s"1132: column $c is already attached to a security policy"))
      rowPolicyAttach(n) = (pn, onCols)
      refreshView(n)
      status("table" -> n, "op" -> "add-row-policy", "policy" -> pn)
    case AlterDropRowPolicyRe(name, pol) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val pn = norm(pol)
      require(secPolicies.get(pn).exists(_.kind == "ROW ACCESS POLICY"),
        s"1131: unknown row access policy $pn")
      require(rowPolicyAttach.get(n).exists(_._1 == pn),
        s"1132: policy $pn is not attached to table $n")
      rowPolicyAttach.remove(n)
      refreshView(n)
      status("table" -> n, "op" -> "drop-row-policy", "policy" -> pn)
    case AlterDropAllRowPoliciesRe(name) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      rowPolicyAttach.remove(n)
      refreshView(n)
      status("table" -> n, "op" -> "drop-all-row-policies")
    case AlterSetMaskRe(name, colName, pol, usingCols) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val c = norm(colName)
      val pn = norm(pol)
      val p = secPolicies.getOrElse(pn,
        throw new IllegalArgumentException(s"2322: unknown masking policy $pn"))
      require(p.kind == "MASKING POLICY", s"2322: $pn is not a masking policy")
      val schema = tables(n).read().schema
      val fields = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
      require(fields.contains(c.toLowerCase), s"1065: unknown column $c")
      val argCols: Seq[String] = Option(usingCols) match {
        case Some(u) =>
          val us = splitTopLevel(u, ',').map(norm)
          require(us.length >= 2,
            s"2004: USING needs the masked column plus at least one argument column")
          require(us.head.toLowerCase == c.toLowerCase,
            s"2004: first USING column must be the masked column $c")
          us.tail
        case None => Seq.empty
      }
      require(1 + argCols.length == p.args.length,
        s"1114: policy $pn expects ${p.args.length} column(s), got ${1 + argCols.length}")
      (c +: argCols).zip(p.args).foreach { case (cc, (_, at)) =>
        val ct = fields.getOrElse(cc.toLowerCase,
          throw new IllegalArgumentException(s"1114: unknown column $cc"))
        require(sameTypeFamily(ct, at),
          s"1114: column $cc type ${ct.sql} does not match policy argument type ${at.sql}")
      }
      val attached = maskedCols(n) ++
        rowPolicyAttach.get(n).toSeq.flatMap(_._2.map(_.toLowerCase))
      (c +: argCols).foreach(cc => require(!attached(cc.toLowerCase),
        s"1132: column $cc is already attached to a security policy"))
      maskAttach.getOrElseUpdate(n, mutable.LinkedHashMap())(c.toLowerCase) = (pn, argCols)
      refreshView(n)
      status("table" -> n, "op" -> "set-masking-policy", "column" -> c)
    case AlterUnsetMaskRe(name, colName) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      maskAttach.get(n).foreach(_.remove(norm(colName).toLowerCase))
      refreshView(n)
      status("table" -> n, "op" -> "unset-masking-policy", "column" -> norm(colName))
    case AlterAddCompColRe(name, colName, typeDdl, ex, kind) =>
      // ADD COLUMN ... AS (expr) STORED|VIRTUAL (reference ee
      // 05_0003): STORED backfills existing rows in one COW pass
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val c = norm(colName)
      val stored = kind.equalsIgnoreCase("STORED")
      val existing = computedCols.getOrElse(n, Seq.empty)
      val badRefs = exprIdents(ex).intersect(existing.map(_._1.toLowerCase).toSet)
      require(badRefs.isEmpty,
        s"1065: computed column $c references computed column(s) ${badRefs.mkString(",")}")
      val dt = StructType.fromDDL(stripConstraints(s"x ${typeDdl}")).head.dataType
      val nex = normalizeComputedExpr(n, ex, dt)
      val baseOrder = declaredOrder.getOrElse(n, tables(n).read().columns.toSeq)
      if (stored) {
        val t = table(n)
        val v = freshView(t.read())
        t.overwrite(spark.sql(s"SELECT *, $nex AS `$c` FROM $v").localCheckpoint(true))
      }
      computedCols(n) = existing :+ ((c, dt, nex, stored))
      declaredOrder(n) = baseOrder :+ c
      refreshView(n)
      status("table" -> n, "op" -> "add-computed-column", "column" -> c)
    case AlterDropStoredRe(name, colName) =>
      // MODIFY COLUMN c DROP STORED: the stored computed column keeps
      // its data and becomes a plain column; VIRTUAL refuses (1058)
      val n = resolveKey(name)
      val c = norm(colName)
      val comp = computedCols.getOrElse(n, Seq.empty)
      val hit = comp.find(_._1.equalsIgnoreCase(c))
        .getOrElse(throw new IllegalArgumentException(s"1058: column $c is not a computed column"))
      require(hit._4, s"1058: cannot DROP STORED on a VIRTUAL computed column")
      computedCols(n) = comp.filterNot(_._1.equalsIgnoreCase(c))
      if (computedCols(n).isEmpty) computedCols.remove(n)
      refreshView(n)
      status("table" -> n, "op" -> "drop-stored", "column" -> c)
    case AlterModifyColTypeRe(name, colName, typeDdl, nullness) =>
      // MODIFY COLUMN c <type> — COW cast-rewrite; a policy-attached
      // column refuses (reference 1132: detach the policy first)
      val n = resolveKey(name)
      val c = norm(colName)
      require(tables.contains(n), s"1025: unknown table $n")
      require(!policyAttachedCols(n)(c.toLowerCase),
        s"1132: column $c is attached to a security policy")
      require(!computedCols.getOrElse(n, Seq.empty).exists(_._1.equalsIgnoreCase(c)),
        s"1058: cannot modify computed column $c")
      val t = table(n)
      val cur = t.read()
      require(cur.columns.exists(_.equalsIgnoreCase(c)), s"1065: unknown column $c")
      val target = policyType(typeDdl)
      t.overwrite(cur.select(cur.columns.toSeq.map { cc =>
        if (cc.equalsIgnoreCase(c)) col(s"`$cc`").cast(target).as(cc)
        else col(s"`$cc`")
      }: _*))
      if (nullness != null && nullness.trim.equalsIgnoreCase("NOT NULL"))
        notNullCols(n) = notNullCols.getOrElse(n, Set.empty) + c.toLowerCase
      else if (nullness != null)
        notNullCols(n) = notNullCols.getOrElse(n, Set.empty) - c.toLowerCase
      recomputeStored(n)
      refreshView(n)
      status("table" -> n, "op" -> "modify-column", "column" -> c)
    case AlterClusterRe(name, keys) =>
      val n = resolveKey(name)
      clusterKeys(n) = splitTopLevel(keys, ',').map(norm)
      status("table" -> n, "op" -> "cluster-by",
        "keys" -> clusterKeys(n).mkString(","))
    case AlterReclusterRe(name) =>
      val n = resolveKey(name)
      val keys = clusterKeys.getOrElse(n,
        throw new IllegalArgumentException(s"no CLUSTER BY declared for $n"))
      val curve = if (keys.length >= 2) "hilbert" else "linear"
      table(n).recluster(keys, curve = curve)
      refreshView(n)
      status("table" -> n, "op" -> "recluster", "curve" -> curve)
    case AlterAddColRe(name, colName, typeDdl, dflt) =>
      val n = resolveKey(name)
      table(n).addColumn(norm(colName),
        typeDdl.trim.replaceAll("(?i)\\s+NOT\\s+NULL", "").replaceAll("(?i)\\s+NULL$", ""),
        Option(dflt).map(_.trim))
      declaredOrder.get(n).foreach(o => declaredOrder(n) = o :+ norm(colName))
      refreshView(n)
      status("table" -> n, "op" -> "add-column", "column" -> norm(colName))
    case AlterDropColRe(name, colName) =>
      val n = resolveKey(name)
      val c = norm(colName)
      require(!policyAttachedCols(n)(c.toLowerCase),
        s"1132: column $c is attached to a security policy")
      // a column carried by a table index refuses DROP (reference 1111)
      val idxHit = tableIndexes.getOrElse(n, mutable.Buffer.empty)
        .filter(_.cols.exists(_.equalsIgnoreCase(c))).map(_.name)
      require(idxHit.isEmpty,
        s"1111: column $c is indexed by ${idxHit.mkString(",")}; drop the index first")
      val comp = computedCols.getOrElse(n, Seq.empty)
      comp.find(_._1.equalsIgnoreCase(c)) match {
        case Some((_, _, _, stored)) =>
          computedCols(n) = comp.filterNot(_._1.equalsIgnoreCase(c))
          if (computedCols(n).isEmpty) computedCols.remove(n)
          declaredOrder.get(n).foreach(o =>
            declaredOrder(n) = o.filterNot(_.equalsIgnoreCase(c)))
          if (stored) table(n).dropColumn(c)
        case None =>
          // a column a computed column reads cannot be dropped (1117)
          val dependents = comp.filter(cc => exprIdents(cc._3)(c.toLowerCase)).map(_._1)
          require(dependents.isEmpty,
            s"1117: column $c is used by computed column(s) ${dependents.mkString(",")}")
          declaredOrder.get(n).foreach(o =>
            declaredOrder(n) = o.filterNot(_.equalsIgnoreCase(c)))
          table(n).dropColumn(c)
      }
      refreshView(n)
      status("table" -> n, "op" -> "drop-column", "column" -> c)
    case AlterRenameTableRe(ifExists, from, to) =>
      val n = resolveKey(from)
      val target = qualifyNew(to)
      if (!tables.contains(n)) {
        if (ifExists != null) status("table" -> n, "op" -> "rename-skipped")
        else throw new IllegalArgumentException(s"1025: unknown table $n")
      } else {
        require(!tables.contains(target), s"1005: table $target already exists")
        val t = tables.remove(n).get
        tables(target) = t
        clusterKeys.remove(n).foreach(clusterKeys(target) = _)
        notNullCols.remove(n).foreach(notNullCols(target) = _)
        requiredCols.remove(n).foreach(requiredCols(target) = _)
        tableOptions.remove(n).foreach(tableOptions(target) = _)
        spark.catalog.dropTempView(viewName(n))
        refreshView(target)
        status("table" -> target, "op" -> "rename-table", "from" -> n)
      }
    case AlterRenameColRe(name, from, to) =>
      val n = resolveKey(name)
      val comp = computedCols.getOrElse(n, Seq.empty)
      val dependents = comp.filter(cc => exprIdents(cc._3)(norm(from).toLowerCase)).map(_._1)
      require(dependents.isEmpty,
        s"1117: column ${norm(from)} is used by computed column(s) ${dependents.mkString(",")}")
      table(n).renameColumn(norm(from), norm(to))
      declaredOrder.get(n).foreach(o => declaredOrder(n) =
        o.map(c => if (c.equalsIgnoreCase(norm(from))) norm(to) else c))
      refreshView(n)
      status("table" -> n, "op" -> "rename-column")
    case AlterSetOptionsRe(name, opts) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val m = tableOptions.getOrElseUpdate(n, mutable.LinkedHashMap())
      splitTopLevel(opts, ',').foreach { kv =>
        val Array(k, v) = kv.split("=", 2).map(_.trim)
        val vv = v.stripPrefix("'").stripSuffix("'")
        if (k.equalsIgnoreCase("bloom_index_columns"))
          validateBloomColumns(n, vv)
        m(k.toLowerCase) = vv
      }
      status("table" -> n, "op" -> "set-options")
    case AlterUnsetOptionsRe(name, opts) =>
      val n = resolveKey(name)
      require(tables.contains(n), s"1025: unknown table $n")
      val m = tableOptions.getOrElseUpdate(n, mutable.LinkedHashMap())
      opts.split(",").map(_.trim.stripPrefix("'").stripSuffix("'").toLowerCase)
        .filter(_.nonEmpty).foreach(m.remove)
      status("table" -> n, "op" -> "unset-options")
    case RefreshCacheRe(name) =>
      // reference ALTER TABLE ... REFRESH CACHE: table-meta cache
      // invalidation; reads here always see the latest snapshot
      refreshView(resolveKey(name))
      status("table" -> resolveKey(name), "op" -> "refresh-cache")
    case _ => throw new IllegalArgumentException(s"cannot parse ALTER TABLE: $s")
  }

  /** OPTIMIZE TABLE t COMPACT [SEGMENT] [LIMIT n] / PURGE / ALL
    * (reference ast/statements/optimize.rs). The 1-file-per-segment
    * model makes SEGMENT-only compaction the same small-file rewrite;
    * LIMIT bounds how many snapshots' worth of small files merge per
    * call in the reference — here one compact() already folds all
    * current small files, so LIMIT is accepted and recorded only.
    */
  private def optimize(s: String): DataFrame = s match {
    case OptimizeRe(name, action, segment, limit) =>
      val n = resolveKey(name)
      val lim = Option(limit).map(_.toInt)
      action.toUpperCase match {
        // COMPACT SEGMENT merges segment METADATA, never data blocks
        // (reference compact_segment.rs); the 1-file-per-block model
        // has no segment objects to merge, so blocks stay untouched —
        // issue_19682 relies on block extents surviving it
        case "COMPACT" if segment != null => ()
        case "COMPACT" => table(n).compact(limit = lim); refreshView(n)
        case "PURGE"   => table(n).vacuum()
        case "ALL"     => table(n).compact(limit = lim); table(n).vacuum(); refreshView(n)
      }
      status("table" -> n, "op" -> s"optimize-${action.toLowerCase}")
    case _ => throw new IllegalArgumentException(s"cannot parse OPTIMIZE: $s")
  }

  private def vacuum(s: String): DataFrame = {
    val name = resolveKey(s.replaceAll("(?is)^VACUUM\\s+TABLE\\s+", "").trim)
    val removed = table(name).vacuum()
    status("table" -> name, "op" -> "vacuum", "removed" -> removed.size)
  }

  private def analyzeTable(s: String): DataFrame = {
    val name = resolveKey(s.replaceAll("(?is)^ANALYZE\\s+TABLE\\s+", "").trim)
    val st = table(name).analyze()
    status("table" -> name, "op" -> "analyze", "row_count" -> st.rowCount)
  }
}

object GraftSql {

  def apply(spark: SparkSession, warehouse: String): GraftSql = {
    Files.createDirectories(Paths.get(warehouse))
    new GraftSql(spark, warehouse)
  }

  private val instanceSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def nextInstanceId(): Int = instanceSeq.incrementAndGet()

  private[graft] def norm(s: String): String =
    splitTopLevel(s.trim, '.').map { p0 =>
      val p = p0.trim
      if ((p.startsWith("`") && p.endsWith("`") && p.length > 1) ||
          (p.startsWith("\"") && p.endsWith("\"") && p.length > 1))
        p.substring(1, p.length - 1).toLowerCase
      else p.toLowerCase
    }.mkString(".")

  private def rmrf(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      graft.Fs.walk(p).iterator.toSeq.reverse.foreach(Files.delete)
  }

  private def wordRe(w: String) = ("(?i)\\b" + java.util.regex.Pattern.quote(w) + "\\b").r

  // DDL constraints Spark's fromDDL doesn't know: strip NOT NULL / DEFAULT
  /** column names declared NOT NULL in a CREATE TABLE column list;
    * `withDefault = false` excludes columns carrying a DEFAULT (those
    * may be omitted on INSERT)
    */
  private def declaredNotNull(ddl: String, withDefault: Boolean = true): Set[String] =
    splitTopLevel(ddl, ',').flatMap { c =>
      if ("""(?is).*\bNOT\s+NULL\b.*""".r.matches(c) &&
          (withDefault || !"""(?is).*\bDEFAULT\b.*""".r.matches(c)))
        """^\s*[`"]?(\w+)[`"]?""".r.findFirstMatchIn(c).map(_.group(1).toLowerCase)
      else None
    }.toSet

  private def stripConstraints(ddl: String): String =
    splitTopLevel(ddl, ',').map { c =>
      c.replaceAll("\"([^\"]+)\"", "`$1`") // databend ident quotes -> backticks
        // databend composite-type spellings: ARRAY(T)/MAP(K,V) -> Spark
        // DDL, innermost-first so nesting (Array(Array(T))) converts
        .pipe(compositeTypes)
        .replaceAll("(?i)\\s+NOT\\s+NULL", "")
        .replaceAll("(?i)\\s+DEFAULT\\b.*$", "")
        .replaceAll("(?i)\\s+NULL$", "")
        .replaceAll("(?i)\\bbool$", "boolean")
        // TIMESTAMP WITH TIME ZONE columns store as the TzTs struct
        // (functions/TimestampTz — us + offset_minutes); string cells
        // parse via to_timestamp_tz in castValuesBody
        .replaceAll("(?i)\\btimestamp\\s+with\\s+time\\s+zone$",
          "struct<us: bigint, offset_minutes: int>")
        .replaceAll("(?i)\\btimestamp_tz$",
          "struct<us: bigint, offset_minutes: int>")
        .replaceAll("(?i)\\bdatetime$", "timestamp")
        // sized datetime/timestamp spellings (databend DATETIME(6));
        // parquet timestamps are fixed micro precision here
        .replaceAll("(?i)\\b(datetime|timestamp)\\s*\\(\\s*\\d+\\s*\\)", "timestamp")
        .replaceAll("(?i)\\bjson$", "variant")
        // BITMAP columns: roaring-serialized bytes (functions/BitmapAggs)
        .replaceAll("(?i)\\bbitmap$", "binary")
        .replaceAll("(?i)\\bfloat64$", "double")
        .replaceAll("(?i)\\bfloat32$", "float")
        // databend type spellings Spark's DDL parser lacks: length-less
        // varchar, and the sized int family (unsigned types widen so
        // the whole unsigned range fits — Types.scala's widening rule)
        // MySQL-style UNSIGNED postfix: widen like the uintN family
        .replaceAll("(?i)\\bbigint\\s+unsigned\\b", "decimal(20,0)")
        .replaceAll("(?i)\\b(int|integer)\\s+unsigned\\b", "bigint")
        .replaceAll("(?i)\\bsmallint\\s+unsigned\\b", "int")
        .replaceAll("(?i)\\btinyint\\s+unsigned\\b", "smallint")
        .replaceAll("(?i)\\bvarchar\\s*\\(\\s*\\d+\\s*\\)", "string")
        .replaceAll("(?i)\\bchar\\s*\\(\\s*\\d+\\s*\\)", "string")
        .replaceAll("(?i)\\b(varchar|text|char)$", "string")
        .replaceAll("(?i)\\buint64$", "decimal(20,0)")
        .replaceAll("(?i)\\b(int64|uint32)$", "bigint")
        .replaceAll("(?i)\\b(int32|uint16)$", "int")
        .replaceAll("(?i)\\b(int16|uint8)$", "smallint")
        .replaceAll("(?i)\\bint8$", "tinyint")
        // geometry/geography columns are WKB bytes (Types.scala rule)
        .replaceAll("(?i)\\b(geometry|geography)$", "binary")
    }.map { c =>
      // the $-anchored spellings above only cover scalar columns;
      // composite types (array<UInt8>, map<Int64,String>) carry the
      // sized spellings INSIDE the angle brackets
      if (!c.contains("<")) c
      else c
        .replaceAll("(?i)\\s+(not\\s+)?null\\s*>", ">")
        .replaceAll("(?i)\\s+(not\\s+)?null\\s*,", ",")
        .replaceAll("(?i)\\bvarchar\\b(?!\\s*\\()", "string")
        .replaceAll("(?i)\\btext\\b", "string")
        .replaceAll("(?i)\\bbool\\b", "boolean")
        .replaceAll("(?i)\\bjson\\b", "variant")
        .replaceAll("(?i)\\bdatetime\\b", "timestamp")
        .replaceAll("(?i)\\bbitmap\\b", "binary")
        .replaceAll("(?i)\\buint64\\b", "decimal(20,0)")
        .replaceAll("(?i)\\b(int64|uint32)\\b", "bigint")
        .replaceAll("(?i)\\b(int32|uint16)\\b", "int")
        .replaceAll("(?i)\\b(int16|uint8)\\b", "smallint")
        .replaceAll("(?i)\\bint8\\b", "tinyint")
        .replaceAll("(?i)\\bfloat64\\b", "double")
        .replaceAll("(?i)\\bfloat32\\b", "float")
    }.mkString(", ")

  /** ARRAY(T) / MAP(K,V) -> array<T> / map<K,V>, innermost first */
  private def compositeTypes(c0: String): String = {
    var c = c0
    var changed = true
    while (changed) {
      val n = c
        .replaceAll("(?i)\\bnullable\\s*\\(\\s*([^()]*?)\\s*\\)", "$1")
        .replaceAll("(?i)\\barray\\s*\\(\\s*([^()]*?)\\s*\\)", "array<$1>")
        .replaceAll("(?i)\\bmap\\s*\\(\\s*([^(),]*?)\\s*,\\s*([^()]*?)\\s*\\)", "map<$1,$2>")
        // vector(N): fixed-dim embedding column -> float array
        .replaceAll("(?i)\\bvector\\s*\\(\\s*\\d+\\s*\\)", "array<float>")
        // tuple(int, int) / tuple(a int, b string) -> struct DDL;
        // unnamed fields take the reference's 1-based spellings
        .pipe(t => """(?i)\btuple\s*\(([^()]*)\)""".r.replaceAllIn(t, m => {
          // angle-aware comma split (inner tuples are already
          // struct<...> by the innermost-first loop)
          val fields = mutable.Buffer[String]()
          var depth = 0; val cur = new StringBuilder
          m.group(1).foreach {
            case '<' => depth += 1; cur += '<'
            case '>' => depth -= 1; cur += '>'
            case ',' if depth == 0 => fields += cur.toString; cur.clear()
            case ch => cur += ch
          }
          if (cur.nonEmpty) fields += cur.toString
          val typeWords = Set("int", "integer", "bigint", "smallint",
            "tinyint", "uint8", "uint16", "uint32", "uint64", "int8",
            "int16", "int32", "int64", "float", "double", "varchar",
            "string", "char", "text", "date", "datetime", "timestamp",
            "boolean", "bool", "decimal", "variant", "json", "binary",
            "array", "map", "struct", "nullable", "vector", "bitmap",
            "float32", "float64", "numeric", "real")
          val rendered = fields.map(_.trim).filter(_.nonEmpty).zipWithIndex.map {
            case (f, i) =>
              val sp = f.indexWhere(_.isWhitespace)
              val named = sp > 0 && (f.indexOf('<') < 0 || f.indexOf('<') > sp) &&
                !typeWords(f.take(sp).toLowerCase)
              if (named) s"${f.take(sp)}: ${f.drop(sp).trim}"
              else s"_${i + 1}: $f"
          }
          java.util.regex.Matcher.quoteReplacement(
            s"struct<${rendered.mkString(", ")}>")
        }))
      changed = n != c
      c = n
    }
    c
  }

  // ---- statement shapes ----------------------------------------------

  /** object name: bare / backtick / double-quoted, optionally
    * db-qualified (databend ast: Identifier + database qualifier)
    */
  private val NamePat =
    """(?:`[^`]+`|"[^"]+"|\w+)(?:\s*\.\s*(?:`[^`]+`|"[^"]+"|\w+))?"""

  private val CreateTableAsRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + NamePat + """)\s+AS\s+(.*)""").r
  private val CreateTableDdlAsRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + NamePat + """)\s*\((.*)\)\s+AS\s+(SELECT.*|WITH.*|VALUES.*)""").r
  private val CreateTableLikeRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + NamePat + """)\s+LIKE\s+(""" + NamePat + """)(?:\s+ENGINE\s*=\s*(\w+))?\s*""").r
  private val CreateTableDdlRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + NamePat + """)\s*\((.*)\)\s*""").r
  private val CreateTableDdlClusterRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(""" + NamePat + """)\s*\((.*)\)\s*CLUSTER\s+BY\s*\((.*)\)\s*""").r
  private val InsertRe =
    ("""(?is)\s*(?:INSERT\s+(INTO|OVERWRITE)|REPLACE\s+INTO)\s+(?:TABLE\s+)?(""" + NamePat + """)\s*(?:\(([\w\s,`]+)\))?\s*(SELECT.*|WITH.*|VALUES.*|TABLE\s.*)""").r
  private val ReplaceRe =
    """(?is)\s*REPLACE\s+INTO\s+(?:TABLE\s+)?(\w+)\s*(?:\(([\w\s,`]+)\))?\s*ON\s*(?:CONFLICT\s*)?\(([^)]*)\)\s*(SELECT.*|WITH.*|VALUES.*|TABLE\s.*)""".r
  private val UpdateRe =
    """(?is)\s*UPDATE\s+(\w+)\s+SET\s+(.*?)(?:\s+WHERE\s+(.*))?\s*""".r
  private val DeleteRe =
    """(?is)\s*DELETE\s+FROM\s+(\w+)(?:\s+WHERE\s+(.*))?\s*""".r
  private val MergeHeadRe =
    """(?is)\s*MERGE\s+INTO\s+(\w+)(?:\s+(?:AS\s+)?((?!USING\b)\w+))?\s+USING\s+""".r
  private val AliasRe = """(?is)(?:AS\s+)?(\w+)\s""".r
  private val InsertValuesRe =
    """(?is)\(([^)]*)\)\s*VALUES\s*\((.*)\)\s*$""".r
  private val CopyRe =
    """(?is)\s*COPY\s+INTO\s+(\w+)\s+FROM\s+('(?:[^']*)'|@[\w./-]+)(.*)""".r
  /** COPY INTO @stage FROM <table | (query)> — the UNLOAD direction
    * (reference copy.rs CopyIntoLocation) */
  private val CopyExportRe =
    """(?is)\s*COPY\s+INTO\s+(@[\w./-]+|'[^']+')\s+FROM\s+(.+?)((?:\s+FILE_FORMAT|\s+SINGLE|\s+MAX_FILE_SIZE|\s+DETAILED_OUTPUT|\s+INCLUDE_QUERY_ID|\s+OVERWRITE)\s*=.*)?\s*""".r
  private val CreateBareStageRe =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?STAGE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s*(?:FILE_FORMAT\s*=.*|COMMENT\s*=.*)?""".r
  private val DropStageRe =
    """(?is)\s*DROP\s+STAGE\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r
  private val RemoveStageRe =
    """(?is)\s*REMOVE\s+(@[\w./-]+)\s*(?:PATTERN\s*=\s*'[^']*')?\s*""".r
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
  /** scalar lambda UDF DDL (udf.rs UDFDefinition::LambdaUDF):
    * CREATE [OR REPLACE] FUNCTION f AS (a, b) -> expr [DESC = '...']
    */
  private val CreateLambdaFnRe =
    ("""(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?FUNCTION\s+""" +
     """(?:(IF\s+NOT\s+EXISTS)\s+)?(\w+)\s+AS\s*\(([\w\s,]*)\)\s*->\s*""" +
     """(.+?)(?:\s+DESC\s*=\s*'[^']*')?\s*""").r
  private val CreateStreamRe =
    ("""(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?STREAM\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(`[^`]+`|[\w.]+)\s+ON\s+TABLE\s+(`[^`]+`|[\w.]+)""" +
     """(?:\s+AT\s*\(\s*STREAM\s*=>\s*(`[^`]+`|[\w.]+)\s*\))?""" +
     """(?:\s+APPEND_ONLY\s*=\s*(\w+))?(?:\s+COMMENT\s*=\s*'[^']*')?\s*""").r
  /** a security policy: one namespace for masking + row-access kinds
    * (reference data_mask meta; ee/05_ee_ddl suites)
    */
  private[graft] case class SecPolicy(name: String, kind: String,
      args: Seq[(String, org.apache.spark.sql.types.DataType)],
      retType: org.apache.spark.sql.types.DataType,
      body: String, comment: String)

  /** table name in ALTER/OPTIMIZE heads: word, `quoted`, or db.name */
  private val TblPat = """((?:[\w]+|`[^`]+`|"[^"]+")(?:\s*\.\s*(?:[\w]+|`[^`]+`|"[^"]+"))?)"""
  private val AlterAddRowPolicyRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+ADD\s+ROW\s+ACCESS\s+POLICY\s+([`"\w]+)\s+ON\s*\(([^)]*)\)\s*""").r
  private val AlterDropRowPolicyRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+DROP\s+ROW\s+ACCESS\s+POLICY\s+([`"\w]+)\s*""").r
  private val AlterDropAllRowPoliciesRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+DROP\s+ALL\s+ROW\s+ACCESS\s+POLICIES\s*""").r
  private val AlterSetMaskRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+MODIFY\s+(?:COLUMN\s+)?([`"\w]+)\s+SET\s+MASKING\s+POLICY\s+([`"\w]+)""" +
     """(?:\s+USING\s*\(([^)]*)\))?\s*""").r
  private val AlterUnsetMaskRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+MODIFY\s+(?:COLUMN\s+)?([`"\w]+)\s+UNSET\s+MASKING\s+POLICY\s*""").r
  /** table-level index spec inside a CREATE TABLE column list */
  private val TableIndexSpecRe =
    """(?is)^(SYNC\s+|ASYNC\s+)?(INVERTED|NGRAM|VECTOR|SPATIAL)\s+INDEX\s+([`"\w]+)\s*\(([^)]*)\)\s*(.*)$""".r
  private val CreateIndexRe =
    """(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?(SYNC\s+|ASYNC\s+)?(INVERTED|NGRAM|VECTOR|SPATIAL)\s+INDEX\s+(?:IF\s+NOT\s+EXISTS\s+)?([`"\w]+)\s+ON\s+([`"\w.]+)\s*\(([^)]*)\)\s*(.*?);?\s*$""".r
  private val DropIndexRe =
    """(?is)^DROP\s+(INVERTED|NGRAM|VECTOR|SPATIAL)\s+INDEX\s+(?:(IF\s+EXISTS)\s+)?([`"\w]+)\s+ON\s+([`"\w.]+)\s*$""".r
  private val CreateAggIdxRe =
    """(?is)^CREATE\s+(OR\s+REPLACE\s+)?(ASYNC\s+|SYNC\s+)?AGGREGATING\s+INDEX\s+(?:(IF\s+NOT\s+EXISTS)\s+)?("[^"]+"|[`\w.]+)\s+AS\s+(.*)$""".r
  private val AlterAddCompColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+ADD\s+COLUMN\s+([`"\w]+)\s+([\w()<>, ]+?)\s+(?:GENERATED\s+ALWAYS\s+)?AS\s*\((.*)\)\s+(STORED|VIRTUAL)\s*""").r
  private val AlterDropStoredRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+MODIFY\s+(?:COLUMN\s+)?([`"\w]+)\s+DROP\s+STORED\s*""").r
  private val AlterModifyColTypeRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat +
     """\s+MODIFY\s+(?:COLUMN\s+)?([`"\w]+)\s+((?!SET\b|UNSET\b|COMMENT\b)[\w()<>, ]+?)""" +
     """(\s+NOT\s+NULL|\s+NULL)?(?:\s+DEFAULT\s+.+?)?\s*""").r
  private val AlterClusterRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+CLUSTER\s+BY\s*\((.*)\)\s*""").r
  private val AlterReclusterRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+RECLUSTER(?:\s+FINAL)?\s*""").r
  private val AlterAddColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+ADD\s+COLUMN\s+(?:IF\s+NOT\s+EXISTS\s+)?([`"\w]+)\s+([\w()<>, ]+?)(?:\s+DEFAULT\s+(.+?))?(?:\s+(?:FIRST|AFTER\s+[`"\w]+))?\s*""").r
  private val AlterDropColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+DROP\s+COLUMN\s+(?:IF\s+EXISTS\s+)?([`"\w]+)\s*""").r
  private val AlterRenameColRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+RENAME\s+(?:COLUMN\s+)?((?!TO\b)[`"\w]+)\s+TO\s+([`"\w]+)\s*""").r
  private val AlterRenameTableRe =
    ("""(?is)\s*ALTER\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?""" + TblPat + """\s+RENAME\s+(?:TO|AS)\s+""" + TblPat + """\s*""").r
  private val AlterSetOptionsRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+SET\s+OPTIONS\s*\((.*)\)\s*""").r
  private val AlterUnsetOptionsRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+UNSET\s+OPTIONS\s*\(([^)]*)\)\s*""").r
  private val RefreshCacheRe =
    ("""(?is)\s*ALTER\s+TABLE\s+""" + TblPat + """\s+REFRESH\s+CACHE\s*""").r
  private val OptimizeRe =
    ("""(?is)\s*OPTIMIZE\s+TABLE\s+""" + TblPat + """\s+(COMPACT|PURGE|ALL)(\s+SEGMENT)?(?:\s+LIMIT\s+(\d+))?\s*""").r
  private val WhenBranchRe =
    """(?is)\s*WHEN\s+(.*?)\s+THEN\s+INTO\s+(\w+)\s*(.*)""".r
  private val ElseBranchRe = """(?is)\s*ELSE\s+INTO\s+(\w+)\s*(.*)""".r
  private val IntoBranchRe = """(?is)\s*INTO\s+(\w+)\s*(.*)""".r
  private val ChangesRe =
    ("""(?is)(\w+)\s+CHANGES\s*\(\s*INFORMATION\s*=>\s*(DEFAULT|APPEND_ONLY)\s*\)""" +
     """\s*AT\s*\(\s*(\w+)\s*=>\s*([^()]*)\)(?:\s*END\s*\(\s*(\w+)\s*=>\s*([^()]*)\))?""").r
  private val AtRe =
    """(?is)(\w+)\s+AT\s*\(\s*(SNAPSHOT|TIMESTAMP|OFFSET|STREAM)\s*=>\s*([^()]*)\)""".r
  private val PivotHeadRe = """(?i)\bPIVOT\s*\(""".r
  private val PivotInnerRe =
    """(?is)^(.*)\bFOR\b\s*(`[^`]+`|[\w.]+)\s+IN\s*\((.*)\)\s*$""".r
  private val PivotAnyRe = """(?is)^ANY(?:\s+ORDER\s+BY\s+(.+))?$""".r
  private val UnpivotHeadRe = """(?i)\bUNPIVOT\s*\(""".r
  private val UnpivotInnerRe =
    """(?is)^\s*(\w+)\s+FOR\s+(\w+)\s+IN\s*\((.*)\)\s*$""".r
  private val UnpivotAliasRe = """(?is)^([\w`]+)\s+(?:AS\s+)?'([^']*)'$""".r

  /** index of the LAST top-level occurrence of `kw` in `s` */
  private[graft] def lastIndexOfKeyword(s: String, kw: String): Int = {
    var last = -1
    var i = indexOfKeyword(s, kw)
    while (i >= 0) {
      last = i
      i = indexOfKeyword(s, kw, i + kw.length)
    }
    last
  }

  // ---- tiny text scanner (quotes + parens aware) ---------------------

  /** split on `sep` at paren depth 0, outside quoted strings */
  private[graft] def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = mutable.Buffer[String]()
    val cur = new StringBuilder
    var depth = 0; var q: Char = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (q != 0) {
        // a backslash escape inside '...' must not end the literal
        // ('a\'b' — databend/Spark both accept it)
        if (q == '\'' && c == '\\' && i + 1 < s.length) {
          cur += c; cur += s.charAt(i + 1); i += 1
        } else { cur += c; if (c == q) q = 0 }
      }
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
              (i == 0 || { val p = upper.charAt(i - 1); !p.isLetterOrDigit && p != '_' }) &&
              (i + k.length >= s.length ||
                { val nx = upper.charAt(i + k.length); !nx.isLetterOrDigit && nx != '_' }))
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
      if (q != 0) {
        // skip backslash escapes inside '...' ('a\'b' stays one literal)
        if (q == '\'' && c == '\\' && i + 1 < s.length) i += 1
        else if (c == q) q = 0
      }
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
