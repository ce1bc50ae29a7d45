package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL scripting / EXECUTE IMMEDIATE (reference:
  * src/query/script/src/{compiler,executor,ir}.rs; test surface
  * tests/sqllogictests/suites/base/15_procedure/15_0001_execute_immediate
  * .test). The reference interprets scripts on a single coordinator and
  * issues statements to the engine — same shape here: the interpreter
  * is driver-side, every statement/expression runs through `spark.sql`,
  * so the data-parallel work stays distributed.
  *
  * Supported subset:
  *   BEGIN ... END;                 LET v := <expr>;
  *   LET r RESULTSET := <query>;    v := <expr>;
  *   FOR v IN <a> TO <b> DO ... END FOR;
  *   FOR row IN <query|resultset> DO ... END FOR;   (row.col refs)
  *   WHILE <cond> DO ... END WHILE;
  *   IF <cond> THEN ... [ELSE ...] END IF;
  *   BREAK; CONTINUE; RETURN [<expr> | TABLE(<query>)];
  *   any other statement → spark.sql (with :var binders substituted)
  *
  * FOR-over-resultset iterates collected rows on the driver — the
  * reference's cursor loops are coordinator-side too; loop bodies that
  * touch tables still execute distributed.
  */
object SqlScript {

  private sealed trait V
  private final case class Scalar(lit: String) extends V // SQL literal text
  private final case class Rs(df: DataFrame) extends V
  /** an opened cursor: buffered rows + advance position */
  private final class Cur(val df: DataFrame, val rows: Array[org.apache.spark.sql.Row],
      val cols: Seq[String]) extends V { var pos: Int = 0 }

  /** render a JVM value as SQL literal text */
  private def litOf(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case d: java.sql.Date => s"DATE '$d'"
    case t: java.sql.Timestamp => s"TIMESTAMP '$t'"
    case other => other.toString
  }

  private class Ctl(val kind: String) extends RuntimeException // break/continue
  private class Ret(val df: DataFrame) extends RuntimeException

  /** Run `EXECUTE IMMEDIATE`-style text: unwraps $$..$$ and BEGIN..END.
    * `exec` runs each STATEMENT (pass GraftSql.execute so script bodies
    * reach the versioned table layer); expressions evaluate through it
    * too, so view refreshes happen per statement.
    */
  def executeImmediate(spark: SparkSession, text: String,
      exec: String => DataFrame = null): DataFrame =
    execute(spark, text, exec)

  // ---- stored procedures (reference: CREATE PROCEDURE / CALL,
  // tests/sqllogictests/suites/base/15_procedure/15_0009_procedure_call
  // .test; procedures are named scripts with positional args) ----------
  final case class Procedure(name: String, argNames: Seq[String], body: String)

  private val procedures =
    new java.util.concurrent.ConcurrentHashMap[String, Procedure]()

  private def key(name: String, arity: Int) = s"${name.toLowerCase}/$arity"

  def createProcedure(name: String, argNames: Seq[String], body: String): Unit =
    procedures.put(key(name, argNames.length), Procedure(name, argNames, body))

  def hasProcedure(name: String, arity: Int): Boolean =
    procedures.containsKey(key(name, arity))

  def dropProcedure(name: String): Unit = {
    import scala.jdk.CollectionConverters._
    procedures.keySet.asScala.filter(_.startsWith(name.toLowerCase + "/"))
      .toSeq.foreach(procedures.remove)
  }

  def dropProcedure(name: String, arity: Int): Unit =
    procedures.remove(key(name, arity))

  def getProcedure(name: String, arity: Int): Option[Procedure] =
    Option(procedures.get(key(name, arity)))

  /** registered procedures, for system_procedures introspection */
  def listProcedures: Seq[Procedure] = {
    import scala.jdk.CollectionConverters._
    procedures.values.asScala.toSeq.sortBy(_.name)
  }

  /** CALL name(args...): binds positional args as a LET prelude. */
  def call(spark: SparkSession, name: String, args: Seq[Any] = Nil,
      exec: String => DataFrame = null): DataFrame = {
    val p = Option(procedures.get(key(name, args.length)))
      .getOrElse(throw new IllegalArgumentException(
        s"2802: unknown procedure $name with ${args.length} argument(s)"))
    val prelude = p.argNames.zip(args)
      .map { case (n, v) => s"LET $n := ${litOf(v)};" }.mkString(" ")
    val inner = p.body.trim.stripPrefix("$$").stripSuffix("$$").trim
    val stripped = "(?is)^BEGIN\\b(.*)\\bEND\\s*;?\\s*$".r
      .findFirstMatchIn(inner).map(_.group(1)).getOrElse(inner)
    execute(spark, s"BEGIN $prelude $stripped END;", exec)
  }

  def execute(spark: SparkSession, text: String,
      exec0: String => DataFrame = null): DataFrame = {
    val exec: String => DataFrame = if (exec0 == null) spark.sql else exec0
    var body = text.trim.stripPrefix("$$").stripSuffix("$$").trim
    val beginRe = "(?is)^BEGIN\\b(.*)\\bEND\\s*;?\\s*$".r
    body = beginRe.findFirstMatchIn(body).map(_.group(1)).getOrElse(body).trim

    val vars = scala.collection.mutable.LinkedHashMap[String, V]()

    def subst(sql: String): String = {
      var out = sql
      // :name binders and bare variable names; longest names first so
      // `summary` is never clobbered by `sum`
      for ((name, v) <- vars.toSeq.sortBy(-_._1.length)) v match {
        case Scalar(l) =>
          out = out.replaceAll("(?i):" + java.util.regex.Pattern.quote(name) + "\\b", l)
          out = out.replaceAll("(?i)(?<![.:\\w])" + java.util.regex.Pattern.quote(name) + "\\b(?!\\s*\\.)", l)
        case _ => ()
      }
      out
    }

    def evalScalar(expr: String): String = {
      val row = exec(s"SELECT ${subst(expr)}").head()
      litOf(row.get(0))
    }

    def evalBool(expr: String): Boolean = {
      val r = exec(s"SELECT (${subst(expr)})").head()
      !r.isNullAt(0) && r.getBoolean(0)
    }

    // databend's script_max_steps: bound total executed statements
    val maxSteps = spark.conf.getOption("script_max_steps")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(0)
    var steps = 0
    def run(stmts: Seq[Stmt]): Unit = stmts.foreach { st0 =>
      steps += 1
      if (maxSteps > 0 && steps > maxSteps)
        throw new IllegalStateException(
          s"script execution exceeded the limit of $maxSteps steps")
      (st0: Stmt) match {
      // variable names are case-insensitive (normalized to lowercase;
      // subst patterns match case-insensitively anyway)
      case LetVar(n, e, true) => vars(n.toLowerCase) = Rs(exec(subst(e)))
      case LetVar(n, e, false) => vars(n.toLowerCase) = Scalar(evalScalar(e))
      case Assign(n, e) =>
        require(vars.contains(n.toLowerCase), s"assignment to undeclared variable $n")
        vars(n.toLowerCase) = Scalar(evalScalar(e))
      case ForRange(v0, a, b, body) =>
        val v = v0.toLowerCase
        val lo = evalScalar(a).toLong
        val hi = evalScalar(b).toLong
        require(lo <= hi,
          "start must be less than or equal to end when step is positive")
        var i = lo
        var break = false
        while (i <= hi && !break) {
          vars(v) = Scalar(i.toString)
          try run(body)
          catch {
            case c: Ctl if c.kind == "break" => break = true
            case c: Ctl if c.kind == "continue" => ()
          }
          i += 1
        }
      case ForRows(v0, src, body) =>
        val v = v0.toLowerCase
        val df = vars.get(src.trim.toLowerCase) match {
          case Some(Rs(d)) => d
          case Some(c: Cur) => c.df
          case _ => exec(subst(src))
        }
        val cols = df.columns
        // Cursor loops run on the coordinator (as in the reference's
        // script executor), so an unbounded result set would OOM the
        // driver. Cap like the reference's result-set paging: error past
        // the limit rather than silently truncate.
        val cap = spark.conf.getOption("graft.script.forRowsLimit")
          .map(_.toInt).getOrElse(10000)
        val rows = df.take(cap + 1)
        if (rows.length > cap)
          throw new IllegalStateException(
            s"FOR-loop result set exceeds graft.script.forRowsLimit=$cap rows; " +
              "raise the limit or aggregate in SQL instead of looping")
        var break = false
        for (row <- rows if !break) {
          // bind v.col occurrences as literals
          val saved = vars.toMap
          cols.zipWithIndex.foreach { case (c, i) =>
            vars(s"$v.$c") = Scalar(litOf(row.get(i)))
          }
          val rowSubst = (sql: String) => {
            var out = sql
            cols.foreach { c =>
              out = out.replaceAll(
                "(?i)\\b" + java.util.regex.Pattern.quote(v) + "\\." +
                  java.util.regex.Pattern.quote(c) + "\\b",
                vars(s"$v.$c").asInstanceOf[Scalar].lit)
            }
            out
          }
          try run(body.map(_.mapSql(rowSubst)))
          catch {
            case c: Ctl if c.kind == "break" => break = true
            case c: Ctl if c.kind == "continue" => ()
          }
          cols.foreach(c => vars.remove(s"$v.$c"))
          saved.keys.foreach(k => if (!vars.contains(k)) vars(k) = saved(k))
        }
      case While(cond, body) =>
        var break = false
        while (!break && evalBool(cond)) {
          try run(body)
          catch {
            case c: Ctl if c.kind == "break" => break = true
            case c: Ctl if c.kind == "continue" => ()
          }
        }
      case If(cond, thenB, elseB) =>
        if (evalBool(cond)) run(thenB) else run(elseB)
      case Break => throw new Ctl("break")
      case Continue => throw new Ctl("continue")
      case Return(None) =>
        throw new Ret(spark.sql("SELECT NULL AS result"))
      case Return(Some(e)) =>
        val table = "(?is)^TABLE\\s*\\((.*)\\)\\s*$".r
        val df = e.trim match {
          case table(q) => exec(subst(q))
          case expr => exec(s"SELECT ${subst(expr)} AS result")
        }
        throw new Ret(df)
      case LetCursor(n, src) =>
        val df = vars.get(src.trim.toLowerCase) match {
          case Some(rs: Rs) => rs.df
          case Some(c: Cur) => c.df
          case _ => exec(subst(src))
        }
        val cap = spark.conf.getOption("graft.script.forRowsLimit")
          .map(_.toInt).getOrElse(10000)
        val rows = df.take(cap + 1)
        if (rows.length > cap)
          throw new IllegalStateException(
            s"cursor result set exceeds graft.script.forRowsLimit=$cap rows")
        vars(n.toLowerCase) = new Cur(df, rows, df.columns.toSeq)
      case OpenCur(n) =>
        vars.get(n.toLowerCase) match {
          case Some(c: Cur) => c.pos = 0
          case _ => throw new IllegalArgumentException(s"unknown cursor $n")
        }
      case FetchCur(n, into) =>
        vars.get(n.toLowerCase) match {
          case Some(c: Cur) =>
            require(c.pos < c.rows.length, s"cursor $n is exhausted")
            vars(into.toLowerCase) = Scalar(litOf(c.rows(c.pos).get(0)))
            c.pos += 1
          case _ => throw new IllegalArgumentException(s"unknown cursor $n")
        }
      case CloseCur(n) => ()
      case Raw(sql) =>
        // exec (GraftSql.execute / spark.sql) runs DDL/DML eagerly;
        // bare SELECTs stay lazy
        exec(subst(sql))
        ()
      }
    }

    try {
      run(parse(body))
      spark.sql("SELECT NULL AS result")
    } catch { case r: Ret => r.df }
  }

  // ---- statement model -------------------------------------------------
  private sealed trait Stmt {
    def mapSql(f: String => String): Stmt = this match {
      case LetVar(n, e, rs) => LetVar(n, f(e), rs)
      case Assign(n, e) => Assign(n, f(e))
      case ForRange(v, a, b, body) => ForRange(v, f(a), f(b), body.map(_.mapSql(f)))
      case ForRows(v, s, body) => ForRows(v, f(s), body.map(_.mapSql(f)))
      case While(c, body) => While(f(c), body.map(_.mapSql(f)))
      case If(c, t, e) => If(f(c), t.map(_.mapSql(f)), e.map(_.mapSql(f)))
      case Return(e) => Return(e.map(f))
      case Raw(s) => Raw(f(s))
      case LetCursor(n, s) => LetCursor(n, f(s))
      case other => other
    }
  }
  private case class LetVar(name: String, expr: String, resultset: Boolean) extends Stmt
  private case class Assign(name: String, expr: String) extends Stmt
  private case class ForRange(v: String, from: String, to: String, body: Seq[Stmt]) extends Stmt
  private case class ForRows(v: String, source: String, body: Seq[Stmt]) extends Stmt
  private case class While(cond: String, body: Seq[Stmt]) extends Stmt
  private case class If(cond: String, thenB: Seq[Stmt], elseB: Seq[Stmt]) extends Stmt
  private case object Break extends Stmt
  private case object Continue extends Stmt
  private case class Return(expr: Option[String]) extends Stmt
  private case class LetCursor(name: String, source: String) extends Stmt
  private case class OpenCur(name: String) extends Stmt
  private case class FetchCur(name: String, into: String) extends Stmt
  private case class CloseCur(name: String) extends Stmt
  private case class Raw(sql: String) extends Stmt

  /** Make DO / THEN / ELSE statement boundaries outside quotes, so
    * `FOR x IN q DO stmt1;` splits into header and body pieces.
    */
  private def preprocess(text: String): String = {
    val sb = new StringBuilder
    var inS = false; var inD = false
    var i = 0
    def wordAt(w: String): Boolean = {
      val end = i + w.length
      end <= text.length &&
        text.regionMatches(true, i, w, 0, w.length) &&
        (i == 0 || !Character.isLetterOrDigit(text(i - 1)) && text(i - 1) != '_') &&
        (end == text.length || !Character.isLetterOrDigit(text(end)) && text(end) != '_')
    }
    while (i < text.length) {
      val ch = text(i)
      if (ch == '\'' && !inD) { inS = !inS; sb.append(ch); i += 1 }
      else if (ch == '"' && !inS) { inD = !inD; sb.append(ch); i += 1 }
      else if (!inS && !inD && wordAt("DO")) { sb.append("DO;"); i += 2 }
      else if (!inS && !inD && wordAt("THEN")) { sb.append("THEN;"); i += 4 }
      else if (!inS && !inD && wordAt("ELSE")) { sb.append(";ELSE;"); i += 4 }
      else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Split on top-level ';' honoring quotes and block keywords, then
    * shape each piece.
    */
  private def parse(text: String): Seq[Stmt] = {
    val pieces = splitTop(preprocess(text))
    val out = Vector.newBuilder[Stmt]
    var i = 0
    def collectBlock(endKw: Regexes.E): (Seq[Stmt], Int) = {
      val body = Vector.newBuilder[String]
      var depth = 1
      var j = i + 1
      while (j < pieces.length && depth > 0) {
        val p = pieces(j)
        if (Regexes.opensBlock(p)) depth += 1
        if (endKw.re.matches(p.trim) || Regexes.anyEnd.matches(p.trim)) depth -= 1
        if (depth > 0) body += p
        j += 1
      }
      (parse(body.result().mkString(";")), j)
    }
    while (i < pieces.length) {
      val p = pieces(i).trim
      if (p.isEmpty) { i += 1 }
      else p match {
        case Regexes.letRs(n, q) => out += LetVar(n, q, resultset = true); i += 1
        case Regexes.letCursor(n, src) => out += LetCursor(n, src); i += 1
        case Regexes.openCur(n) => out += OpenCur(n); i += 1
        case Regexes.fetchCur(n, v) => out += FetchCur(n, v); i += 1
        case Regexes.closeCur(n) => out += CloseCur(n); i += 1
        case Regexes.let(n, e) => out += LetVar(n, e, resultset = false); i += 1
        case Regexes.forRange(v, a, b) =>
          val (body, j) = collectBlock(Regexes.endFor); out += ForRange(v, a, b, body); i = j
        case Regexes.forRows(v, src) =>
          val (body, j) = collectBlock(Regexes.endFor); out += ForRows(v, src, body); i = j
        case Regexes.whileRe(c) =>
          val (body, j) = collectBlock(Regexes.endWhile); out += While(c, body); i = j
        case Regexes.ifRe(c) =>
          val (body, j) = collectBlock(Regexes.endIf)
          val (thenB, elseB) = splitElse(body)
          out += If(c, thenB, elseB); i = j
        case Regexes.breakRe() => out += Break; i += 1
        case Regexes.continueRe() => out += Continue; i += 1
        case Regexes.returnBare() => out += Return(None); i += 1
        case Regexes.returnRe(e) => out += Return(Some(e)); i += 1
        case Regexes.assign(n, e) => out += Assign(n, e); i += 1
        case other => out += Raw(other); i += 1
      }
    }
    out.result()
  }

  private def splitElse(body: Seq[Stmt]): (Seq[Stmt], Seq[Stmt]) = {
    val idx = body.indexWhere {
      case Raw(s) => s.trim.equalsIgnoreCase("ELSE")
      case _ => false
    }
    if (idx < 0) (body, Seq.empty)
    else (body.take(idx), body.drop(idx + 1))
  }

  private object Regexes {
    final case class E(re: scala.util.matching.Regex)
    val letRs = "(?is)^LET\\s+(\\w+)\\s+RESULTSET\\s*:=\\s*(.+)$".r
    val letCursor = "(?is)^LET\\s+(\\w+)\\s+CURSOR\\s+FOR\\s+(.+)$".r
    val openCur = "(?is)^OPEN\\s+(\\w+)$".r
    val fetchCur = "(?is)^FETCH\\s+(\\w+)\\s+INTO\\s+(\\w+)$".r
    val closeCur = "(?is)^CLOSE\\s+(\\w+)$".r
    val let = "(?is)^LET\\s+(\\w+)\\s*:=\\s*(.+)$".r
    val forRange = "(?is)^FOR\\s+(\\w+)\\s+IN\\s+(.+?)\\s+TO\\s+(.+?)\\s+DO$".r
    val forRows = "(?is)^FOR\\s+(\\w+)\\s+IN\\s+(.+?)\\s+DO$".r
    val whileRe = "(?is)^WHILE\\s+(.+?)\\s+DO$".r
    val ifRe = "(?is)^IF\\s+(.+?)\\s+THEN$".r
    val breakRe = "(?is)^BREAK$".r
    val continueRe = "(?is)^CONTINUE$".r
    val returnBare = "(?is)^RETURN$".r
    val returnRe = "(?is)^RETURN\\s+(.+)$".r
    val assign = "(?is)^(\\w+)\\s*:=\\s*(.+)$".r
    val endFor = E("(?is)^END\\s+FOR$".r)
    val endWhile = E("(?is)^END\\s+WHILE$".r)
    val endIf = E("(?is)^END\\s+IF$".r)
    val anyEnd = "(?is)^END\\s+(FOR|WHILE|IF)$".r
    def opensBlock(p: String): Boolean = {
      val t = p.trim
      forRange.matches(t) || forRows.matches(t) || whileRe.matches(t) || ifRe.matches(t)
    }
  }

  /** split on ';' outside quotes */
  private def splitTop(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inS = false; var inD = false
    for (ch <- text) ch match {
      case '\'' if !inD => inS = !inS; sb.append(ch)
      case '"' if !inS => inD = !inD; sb.append(ch)
      case ';' if !inS && !inD => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString
    out.result()
  }
}
