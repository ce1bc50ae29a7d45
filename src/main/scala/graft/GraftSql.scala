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
  private val databases = mutable.LinkedHashSet[String]("default")
  private var currentDb = "default"
  private var viewSeq = 0

  /** Spark temp views are session-global, but a GraftSql instance is a
    * private catalog over its own warehouse dir (the reference scopes
    * tables per-database in its meta service). Namespacing every view
    * this instance registers keeps concurrent instances on one
    * SparkSession from clobbering each other's `t`/`t1`/... views.
    */
  private val viewPrefix = s"graft${GraftSql.nextInstanceId()}_"

  /** resolve a (possibly unqualified) name against the current database:
    * `qt` under `USE db` finds `db.qt`; bare registrations win.
    */
  private def resolveKey(n0: String): String = {
    val n = norm(n0)
    if (tables.contains(n) || n.contains(".")) n
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
    tables(name).read().createOrReplaceTempView(viewName(name))

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
    else if (is("CREATE DATABASE") || is("CREATE SCHEMA")) createDatabase(s)
    else if (is("DROP DATABASE") || is("DROP SCHEMA")) dropDatabase(s)
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
    else if (is("UNSET ")) // databend UNSET <setting> = Spark RESET
      spark.sql("RESET " + s.substring(6).trim.stripSuffix(";"))
    else if (is("USE ")) {
      currentDb = norm(s.substring(4).trim)
      status("database" -> currentDb, "op" -> "use")
    }
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
    // databend quotes identifiers with double quotes (ast/quote.rs);
    // Spark uses backticks — convert outside string literals first so
    // every later pass sees one identifier spelling
    var sql = identQuotes(sql0)
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
    // databend [..] array literals -> array(..) (subscripts untouched)
    sql = arrayLiterals(sql)
    // databend `SELECT * EXCLUDE (c1, ...)` -> Spark's `* EXCEPT (...)`
    sql = sql.replaceAll("(?i)\\*\\s+EXCLUDE\\s*\\(", "* EXCEPT (")
    // databend's zero-arg count() (aggregator.rs) -> count(*)
    sql = sql.replaceAll("(?i)\\bcount\\s*\\(\\s*\\)", "count(*)")
    // length-less VARCHAR casts (databend treats VARCHAR as unbounded)
    sql = sql.replaceAll("(?i)\\b(as\\s+)varchar\\b(?!\\s*\\()", "$1string")
      .replaceAll("(?i)::varchar\\b(?!\\s*\\()", "::string")
    // correlated `LATERAL (VALUES ...)` -> correlated UNION ALL
    // lateral subquery (Spark can't evaluate outer refs in inline
    // tables, but handles them fine in lateral subqueries)
    sql = rewriteLateralValues(sql)
    // FROM-clause `LATERAL FLATTEN(...)`/`LATERAL unnest(...)` table
    // factors -> LATERAL VIEW over the variant generators
    sql = rewriteLateralTvf(sql)
    // databend variant colon paths (x:a.b[0]) -> try_variant_get
    sql = rewriteColonPaths(sql)
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
    prefixRefs(qualifiedRefs(sql), refs.toSet)
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
  private def arrayLiterals(sql: String): String = {
    val sb = new StringBuilder(sql.length + 16)
    // stack of flags: for each currently-open bracket, whether we
    // rewrote it to array(
    val open = mutable.Stack[Boolean]()
    var i = 0; var q: Char = 0; var prevNonSpace: Char = 0
    def isSubscriptAnchor(c: Char) =
      Character.isLetterOrDigit(c) || c == '_' || c == ')' || c == ']' || c == '`'
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else c match {
        case '\'' | '`' => q = c; sb += c; prevNonSpace = c; i += 1
        case '[' =>
          val literal = !isSubscriptAnchor(prevNonSpace)
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
          if (KeywordsBeforeColon(base.toUpperCase)) { sb += c; i += 1 }
          else {
            val segs = splitPathSegs(mm.group(2))
            val jp = segs.map {
              case s if s.startsWith("[") => s
              case s => "." + s.stripPrefix("`").stripSuffix("`")
            }.mkString
            sb.append(s"try_variant_get($base, '$$$jp')")
            i += mm.end
          }
        case None => sb += c; i += 1
      }
    }
    sb.toString
  }

  private val KeywordsBeforeColon = Set[String]() // reserved for future guards

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
    """(?i)\b(rank|dense_rank|percent_rank|row_number|cume_dist|ntile)\s*\(([^()]*)\)\s*OVER\s*\(""".r

  /** rank-family OVER specs: the reference ignores explicit frames and
    * permits unordered ranking windows (all rows tie); Spark rejects
    * both, so strip the frame and order by a constant when absent.
    */
  private def fixRankWindows(sql: String): String = {
    val m = RankOverRe.findFirstMatchIn(sql)
    if (m.isEmpty) return sql
    val open = m.get.end - 1
    val close = matchParen(sql, open)
    val spec = sql.substring(open + 1, close)
    var s2 = spec.replaceAll("(?is)\\b(ROWS|RANGE|GROUPS)\\b.*$", "").trim
    if (indexOfKeyword(s2, "ORDER") < 0) s2 = (s2 + " ORDER BY 1").trim
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
        val orderTxt = Option(am.group(1)).map(_.trim)
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
  private def qualifiedRefs(sql: String): String = {
    val dotted = tables.keys.filter(_.contains(".")).toSeq.sortBy(-_.length)
    val afterDotted = dotted.foldLeft(sql) { (acc, key) =>
      val parts = key.split('.')
      val pat = parts.map(p =>
        "(?:`" + java.util.regex.Pattern.quote(p) + "`|" +
          java.util.regex.Pattern.quote(p) + ")")
        .mkString("\\s*\\.\\s*")
      ("(?i)" + pat).r.replaceAllIn(acc,
        scala.util.matching.Regex.quoteReplacement(viewName(key)))
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
  private def prefixRefs(sql: String, streamRefs: Set[String]): String = {
    if (tables.isEmpty && streamRefs.isEmpty) return sql
    val sb = new StringBuilder(sql.length + 32)
    var i = 0; var q: Char = 0; var prevNonSpace: Char = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (q != 0) { sb += c; if (c == q) q = 0; i += 1 }
      else if (c == '\'' || c == '"' || c == '`') { q = c; sb += c; prevNonSpace = c; i += 1 }
      else if (Character.isLetter(c) || c == '_') {
        val start = i
        while (i < sql.length && (Character.isLetterOrDigit(sql.charAt(i)) ||
               sql.charAt(i) == '_' || sql.charAt(i) == '$')) i += 1
        val w = sql.substring(start, i)
        val lw = w.toLowerCase
        if (prevNonSpace != '.' && prevNonSpace != ':' &&
            (tables.contains(resolveKey(lw)) || streamRefs.contains(lw)))
          sb.append(if (streamRefs.contains(lw)) viewName(lw)
                    else viewName(resolveKey(lw)))
        else sb.append(w)
        prevNonSpace = w.last
      } else {
        sb += c
        if (!Character.isWhitespace(c)) prevNonSpace = c
        i += 1
      }
    }
    sb.toString
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
      val n = qualifyNew(name)
      require(orReplace != null || !tables.contains(n), s"table $n exists")
      // evaluate the SELECT before dropping the old generation: OR
      // REPLACE may read the table being replaced (and rewriteReads
      // refreshes every registered view, so the old files must still
      // exist while the source frame is materialized)
      val df0 = spark.sql(rewriteReads(select))
      val df = if (tables.contains(n)) df0.localCheckpoint(true) else df0
      if (tables.contains(n)) { tables.remove(n); rmrf(tablePath(n)) }
      register(n, GraftTable.create(spark, tablePath(n), df))
      status("table" -> n, "op" -> "create-as")
    case CreateTableDdlClusterRe(orReplace, ifNotExists, name, ddl, cluster) =>
      val n = qualifyNew(name)
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
      val n = qualifyNew(name)
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

  /** Databases are a namespace over the instance's table registry (the
    * reference scopes tables per-database in its meta service;
    * ast/statements/database.rs). Purely registry-level here.
    */
  private def createDatabase(s: String): DataFrame = {
    val name = norm(s.replaceAll(
      "(?is)^CREATE\\s+(DATABASE|SCHEMA)\\s+(IF\\s+NOT\\s+EXISTS\\s+)?", "").trim)
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
    // databend allows a trailing ALL (purge history too; COW tables
    // drop their whole directory anyway)
    val name = resolveKey(s.replaceAll("(?is)^DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?", "")
      .replaceAll("(?is)\\s+ALL\\s*$", "").trim)
    tables.remove(name).foreach { t =>
      spark.catalog.dropTempView(viewName(name))
      rmrf(t.path)
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
      val on = keyCols.map(k => s"$n.$k = __src.$k").mkString(" AND ")
      t.mergeInto(src, n, "__src", on,
        matched = Seq(GraftTable.MatchedClause(None, Some(Map.empty))),
        notMatched = Seq(GraftTable.NotMatchedClause(None, None)))
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
      case _ => col(name).cast(tgt).as(name)
    }
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
            if (cols.exists(_.equalsIgnoreCase(c))) alignCast(renamed, c, tgtSchema(c).dataType)
            else lit(null).cast(tgtSchema(c).dataType).as(c)
          }
          renamed.select(out: _*)
        case None =>
          require(df0.columns.length == tgtCols.length,
            s"INSERT query produces ${df0.columns.length} columns, table has ${tgtCols.length}")
          val renamed = df0.toDF(tgtCols: _*)
          renamed.select(tgtCols.map(c => alignCast(renamed, c, tgtSchema(c).dataType)): _*)
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
      val n = resolveKey(name)
      val t = table(n)
      val pairs = splitTopLevel(setPart, ',').map { a =>
        val eq = indexOfTopLevel(a, '=')
        require(eq > 0, s"bad assignment: $a")
        // value expressions may embed subqueries over other tables —
        // route them through the same read rewrite as standalone queries
        norm(a.take(eq)).split('.').last -> expr(rewriteReads(a.drop(eq + 1).trim))
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
      val cond = Option(wherePart).map(w => expr(rewriteReads(w.trim))).getOrElse(lit(true))
      t.update(cond, assigns)
      refreshView(n)
      status("table" -> n, "op" -> "update")
    case _ => throw new IllegalArgumentException(s"cannot parse UPDATE: $s")
  }

  private def delete(s: String): DataFrame = s match {
    case DeleteRe(name, wherePart) =>
      val n = resolveKey(name)
      val t = table(n)
      Option(wherePart) match {
        case Some(w) => t.delete(expr(rewriteReads(w.trim)))
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
    val n = resolveKey(m.group(1))
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
      val n = resolveKey(name)
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
      refreshView(n)
      status("table" -> n, "op" -> "add-column", "column" -> norm(colName))
    case AlterDropColRe(name, colName) =>
      val n = resolveKey(name)
      table(n).dropColumn(norm(colName))
      refreshView(n)
      status("table" -> n, "op" -> "drop-column", "column" -> norm(colName))
    case AlterRenameColRe(name, from, to) =>
      val n = resolveKey(name)
      table(n).renameColumn(norm(from), norm(to))
      refreshView(n)
      status("table" -> n, "op" -> "rename-column")
    case _ => throw new IllegalArgumentException(s"cannot parse ALTER TABLE: $s")
  }

  private def optimize(s: String): DataFrame = s match {
    case OptimizeRe(name, action) =>
      val n = resolveKey(name)
      action.toUpperCase match {
        case "COMPACT" => table(n).compact(); refreshView(n)
        case "PURGE"   => table(n).vacuum()
        case other     => throw new IllegalArgumentException(s"OPTIMIZE $other unsupported")
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
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)
  }

  private def wordRe(w: String) = ("(?i)\\b" + java.util.regex.Pattern.quote(w) + "\\b").r

  // DDL constraints Spark's fromDDL doesn't know: strip NOT NULL / DEFAULT
  private def stripConstraints(ddl: String): String =
    splitTopLevel(ddl, ',').map { c =>
      c.replaceAll("\"([^\"]+)\"", "`$1`") // databend ident quotes -> backticks
        // databend composite-type spellings: ARRAY(T)/MAP(K,V) -> Spark DDL
        .replaceAll("(?i)\\barray\\s*\\(\\s*([\\w() ,<>]+?)\\s*\\)", "array<$1>")
        .replaceAll("(?i)\\bmap\\s*\\(\\s*([\\w() ]+?)\\s*,\\s*([\\w() ,<>]+?)\\s*\\)", "map<$1,$2>")
        .replaceAll("(?i)\\s+NOT\\s+NULL", "")
        .replaceAll("(?i)\\s+DEFAULT\\s+.*$", "")
        .replaceAll("(?i)\\s+NULL$", "")
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
    }.mkString(", ")

  // ---- statement shapes ----------------------------------------------

  /** object name: bare / backtick / double-quoted, optionally
    * db-qualified (databend ast: Identifier + database qualifier)
    */
  private val NamePat =
    """(?:`[^`]+`|"[^"]+"|\w+)(?:\s*\.\s*(?:`[^`]+`|"[^"]+"|\w+))?"""

  private val CreateTableAsRe =
    ("""(?is)\s*CREATE\s+(?:(OR\s+REPLACE)\s+)?(?:TRANSIENT\s+)?TABLE\s+(""" + NamePat + """)\s+AS\s+(.*)""").r
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
