package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.collection.mutable.ArrayBuffer

/** SQL/JSON path evaluator for the reference's `json_path_query` /
  * `json_path_query_array` surface (variant.rs; jsonpath dialect as
  * exercised by tests/sqllogictests/suites/query/functions/
  * 02_0051_function_semi_structureds_get.test and the variant.txt
  * goldens).
  *
  * Supported subset — everything the reference's own test corpus uses:
  *   - member access `.name` / `."quoted name"`, wildcard `.*`
  *   - subscripts `[n]`, `[*]`, index lists `[0, 2 to last, 4]` with
  *     `last` arithmetic (`last - 1`)
  *   - filters `?(<pred>)` with `&&` / `||`, comparisons
  *     (== != < <= > >=) of `@` / `@.path` against number, string,
  *     boolean or null literals, and `starts with "prefix"`
  *
  * Matches are returned as minified JSON texts (one per result row for
  * the SRF form; the caller wraps them for the `_array` form). A
  * malformed path throws IllegalArgumentException, mirroring the
  * reference's error on `json_path_query(obj, '--')`.
  */
object JsonPath {
  private val mapper = new ObjectMapper()

  def eval(json: String, path: String): Seq[String] = {
    val root = mapper.readTree(json)
    query(root, path).map(mapper.writeValueAsString)
  }

  /** `json_path_exists`: true when the path selects at least one node
    * (full dialect, including filters — 02_0051 slt).
    */
  def exists(json: String, path: String): Boolean = {
    val root = mapper.readTree(json)
    query(root, path).nonEmpty
  }

  /** `json_path_match` / `@@`: predicate paths `$.a.b[i] op lit`, with
    * top-level `||`/`&&` chains (reference variant.txt:4864-4903;
    * `$.b[1 to last] == 2 || $.b[1 to last] == 3`). Three-valued like
    * PostgreSQL's jsonb_path_match: an undefined comparison (container
    * operand, cross-type) yields NULL; a path that selects nothing is
    * plain false; any satisfied item is true.
    */
  def pathMatch(json: String, pred: String): Option[Boolean] = {
    val root = mapper.readTree(json)
    val p = new Parser(pred)

    def one(): Option[Boolean] = {
      p.skipWs()
      p.expect('$')
      val steps = ArrayBuffer.empty[Step]
      var stepping = true
      while (stepping) {
        p.skipWs()
        if (p.atEnd) stepping = false
        else if (p.peek == '.') { p.next(); steps += parseMember(p) }
        else if (p.peek == '[') steps += parseSubscript(p)
        else if (p.peek == '?') steps += parseFilter(p)
        else stepping = false
      }
      var cur: Seq[JsonNode] = Seq(root)
      for (step <- steps) cur = cur.flatMap(step)
      p.skipWs()
      if (p.atEnd || p.peek == '|' || p.peek == '&')
        // bare path (`$.ok`): truthiness of the matched value
        Some(cur.exists(n => n.isBoolean && n.booleanValue))
      else {
        val (op, lit) = parseOpLit(p)
        val results = cur.map(n => cmpOpt(n, op, lit))
        if (results.contains(Some(true))) Some(true)
        else if (results.contains(None)) None
        else Some(false)
      }
    }
    def and3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true)) => Some(true)
      case _ => None
    }
    def or3(a: Option[Boolean], b: Option[Boolean]): Option[Boolean] = (a, b) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false)) => Some(false)
      case _ => None
    }
    def andChain(): Option[Boolean] = {
      var acc = one(); p.skipWs()
      while (p.lookahead("&&")) { val r = one(); acc = and3(acc, r); p.skipWs() }
      acc
    }
    var acc = andChain(); p.skipWs()
    while (p.lookahead("||")) { val r = andChain(); acc = or3(acc, r); p.skipWs() }
    p.skipWs()
    if (!p.atEnd) p.fail("trailing input after predicate")
    acc
  }

  /** three-valued comparison: None when undefined (container operand,
    * cross-type ordering/equality)
    */
  private def cmpOpt(cur: JsonNode, op: String, lit: JsonNode): Option[Boolean] = op match {
    case "startswith" =>
      if (cur.isTextual && lit.isTextual) Some(cur.textValue.startsWith(lit.textValue))
      else None
    case "==" | "!=" =>
      if (cur.isContainerNode || lit.isContainerNode) None
      else if (cur.isNumber && lit.isNumber) {
        val eq = cur.decimalValue.compareTo(lit.decimalValue) == 0
        Some(if (op == "==") eq else !eq)
      } else if (cur.isNull || lit.isNull) {
        val eq = cur.isNull && lit.isNull
        Some(if (op == "==") eq else !eq)
      } else if ((cur.isTextual && lit.isTextual) || (cur.isBoolean && lit.isBoolean)) {
        val eq = cur == lit
        Some(if (op == "==") eq else !eq)
      } else None
    case _ =>
      val c: Option[Int] =
        if (cur.isNumber && lit.isNumber) Some(cur.decimalValue.compareTo(lit.decimalValue))
        else if (cur.isTextual && lit.isTextual) Some(cur.textValue.compareTo(lit.textValue))
        else None
      c.map { v =>
        op match {
          case "<" => v < 0
          case "<=" => v <= 0
          case ">" => v > 0
          case ">=" => v >= 0
        }
      }
  }

  def query(root: JsonNode, path: String): Seq[JsonNode] = {
    val steps = parse(path)
    var cur: Seq[JsonNode] = Seq(root)
    for (step <- steps) cur = cur.flatMap(step)
    cur
  }

  private type Step = JsonNode => Seq[JsonNode]

  private def parse(path: String): Seq[Step] = {
    val p = new Parser(path)
    p.expect('$')
    val steps = ArrayBuffer.empty[Step]
    while (!p.atEnd) {
      p.skipWs()
      if (p.atEnd) {} // trailing whitespace
      else if (p.peek == '.') { p.next(); steps += parseMember(p) }
      else if (p.peek == '[') steps += parseSubscript(p)
      else if (p.peek == '?') steps += parseFilter(p)
      else p.fail(s"unexpected '${p.peek}'")
    }
    steps.toSeq
  }

  private def parseMember(p: Parser): Step = {
    if (!p.atEnd && p.peek == '*') {
      p.next()
      node => if (node.isObject) {
        val out = ArrayBuffer.empty[JsonNode]
        val it = node.elements()
        while (it.hasNext) out += it.next()
        out.toSeq
      } else Seq.empty
    } else {
      val name =
        if (!p.atEnd && p.peek == '"') p.quotedString()
        else p.ident()
      node => if (node.isObject && node.has(name)) Seq(node.get(name)) else Seq.empty
    }
  }

  private def parseSubscript(p: Parser): Step = {
    p.expect('[')
    p.skipWs()
    if (p.peek == '*') {
      p.next(); p.skipWs(); p.expect(']')
      // lax mode (pg jsonpath, the reference's default): `[*]` over a
      // non-array wraps the value — objects iterate their values, a
      // scalar yields itself (so `$[*] == "b"` over `true` is an
      // UNDEFINED comparison -> NULL, not an empty match -> false)
      node =>
        if (node.isArray || node.isObject) elems(node) else Seq(node)
    } else {
      // index list: item (, item)* where item = expr | expr to expr
      sealed trait Idx
      case class One(e: IdxExpr) extends Idx
      case class Range(a: IdxExpr, b: IdxExpr) extends Idx
      val items = ArrayBuffer.empty[Idx]
      var done = false
      while (!done) {
        p.skipWs()
        val a = p.idxExpr()
        p.skipWs()
        if (p.lookaheadWord("to")) {
          p.skipWs()
          val b = p.idxExpr()
          items += Range(a, b)
        } else items += One(a)
        p.skipWs()
        if (p.peek == ',') p.next()
        else { p.expect(']'); done = true }
      }
      node => if (!node.isArray) Seq.empty
      else {
        val n = node.size()
        val out = ArrayBuffer.empty[JsonNode]
        for (it <- items) it match {
          case One(e) =>
            val i = e.resolve(n)
            if (i >= 0 && i < n) out += node.get(i)
          case Range(a, b) =>
            var i = a.resolve(n)
            val j = b.resolve(n)
            while (i <= j) { if (i >= 0 && i < n) out += node.get(i); i += 1 }
        }
        out.toSeq
      }
    }
  }

  private case class IdxExpr(base: Int, fromLast: Boolean) {
    def resolve(n: Int): Int = if (fromLast) n - 1 + base else base
  }

  // ---- filter predicates -------------------------------------------------

  private sealed trait Pred { def test(node: JsonNode): Boolean }
  private case class OrPred(l: Pred, r: Pred) extends Pred {
    def test(n: JsonNode) = l.test(n) || r.test(n)
  }
  private case class AndPred(l: Pred, r: Pred) extends Pred {
    def test(n: JsonNode) = l.test(n) && r.test(n)
  }
  private case class Cmp(path: Seq[String], op: String, lit: JsonNode) extends Pred {
    def test(node: JsonNode): Boolean = {
      var cur = node
      for (name <- path) {
        if (cur == null || !cur.isObject || !cur.has(name)) return false
        cur = cur.get(name)
      }
      op match {
        case "startswith" =>
          cur.isTextual && lit.isTextual && cur.textValue.startsWith(lit.textValue)
        case "==" | "!=" =>
          val eq =
            if (cur.isNumber && lit.isNumber) cur.decimalValue.compareTo(lit.decimalValue) == 0
            else cur == lit
          if (op == "==") eq else !eq
        case _ =>
          val c: Option[Int] =
            if (cur.isNumber && lit.isNumber) Some(cur.decimalValue.compareTo(lit.decimalValue))
            else if (cur.isTextual && lit.isTextual) Some(cur.textValue.compareTo(lit.textValue))
            else None
          c.exists { v =>
            op match {
              case "<" => v < 0
              case "<=" => v <= 0
              case ">" => v > 0
              case ">=" => v >= 0
            }
          }
      }
    }
  }

  private def parseFilter(p: Parser): Step = {
    p.expect('?')
    p.skipWs()
    p.expect('(')
    val pred = parseOr(p)
    p.skipWs()
    p.expect(')')
    node => if (pred.test(node)) Seq(node) else Seq.empty
  }

  private def parseOr(p: Parser): Pred = {
    var l = parseAnd(p)
    p.skipWs()
    while (p.lookahead("||")) { val r = parseAnd(p); l = OrPred(l, r); p.skipWs() }
    l
  }
  private def parseAnd(p: Parser): Pred = {
    var l = parseCmp(p)
    p.skipWs()
    while (p.lookahead("&&")) { val r = parseCmp(p); l = AndPred(l, r); p.skipWs() }
    l
  }
  private def parseCmp(p: Parser): Pred = {
    p.skipWs()
    p.expect('@')
    val path = ArrayBuffer.empty[String]
    while (!p.atEnd && p.peek == '.') {
      p.next()
      path += (if (p.peek == '"') p.quotedString() else p.ident())
    }
    val (op, lit) = parseOpLit(p)
    Cmp(path.toSeq, op, lit)
  }

  private def parseOpLit(p: Parser): (String, JsonNode) = {
    p.skipWs()
    val op =
      if (p.lookaheadWord("starts")) {
        p.skipWs()
        if (!p.lookaheadWord("with")) p.fail("expected 'with' after 'starts'")
        "startswith"
      } else if (p.lookahead("==")) "=="
      else if (p.lookahead("!=")) "!="
      else if (p.lookahead("<>")) "!="
      else if (p.lookahead("<=")) "<="
      else if (p.lookahead(">=")) ">="
      else if (p.lookahead("<")) "<"
      else if (p.lookahead(">")) ">"
      else p.fail("expected comparison operator")
    p.skipWs()
    val lit: JsonNode =
      if (p.peek == '"') mapper.getNodeFactory.textNode(p.quotedString())
      else if (p.lookaheadWord("true")) mapper.getNodeFactory.booleanNode(true)
      else if (p.lookaheadWord("false")) mapper.getNodeFactory.booleanNode(false)
      else if (p.lookaheadWord("null")) mapper.getNodeFactory.nullNode()
      else {
        val s = p.number()
        if (s.contains('.') || s.contains('e') || s.contains('E'))
          mapper.getNodeFactory.numberNode(new java.math.BigDecimal(s))
        else mapper.getNodeFactory.numberNode(java.lang.Long.parseLong(s))
      }
    (op, lit)
  }

  private def elems(node: JsonNode): Seq[JsonNode] = {
    val out = ArrayBuffer.empty[JsonNode]
    val it = node.elements()
    while (it.hasNext) out += it.next()
    out.toSeq
  }

  // ---- tiny cursor-based lexer -------------------------------------------

  private final class Parser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def peek: Char = if (atEnd) '\u0000' else s.charAt(i)
    def next(): Char = { val c = peek; i += 1; c }
    def skipWs(): Unit = while (!atEnd && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit =
      if (atEnd || s.charAt(i) != c) fail(s"expected '$c'") else i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"bad json path '$s' at $i: $msg")

    /** consume `tok` if it is next (no word-boundary check — for operators) */
    def lookahead(tok: String): Boolean = {
      skipWs()
      if (s.startsWith(tok, i)) { i += tok.length; true } else false
    }
    /** consume word `w` only when followed by a non-identifier char */
    def lookaheadWord(w: String): Boolean = {
      skipWs()
      if (s.startsWith(w, i) &&
        (i + w.length >= s.length || !isIdentChar(s.charAt(i + w.length)))) {
        i += w.length; true
      } else false
    }
    private def isIdentChar(c: Char): Boolean =
      c.isLetterOrDigit || c == '_' || c == '$'

    def ident(): String = {
      val start = i
      while (!atEnd && isIdentChar(s.charAt(i))) i += 1
      if (i == start) fail("expected identifier")
      s.substring(start, i)
    }
    def quotedString(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && peek != '"') {
        val c = next()
        if (c == '\\' && !atEnd) sb.append(next()) else sb.append(c)
      }
      expect('"')
      sb.toString
    }
    def number(): String = {
      val start = i
      if (!atEnd && (peek == '-' || peek == '+')) i += 1
      while (!atEnd && (s.charAt(i).isDigit || "+-.eE".contains(s.charAt(i)))) i += 1
      if (i == start) fail("expected number")
      s.substring(start, i)
    }
    /** `last`, `last - k`, or a plain integer */
    def idxExpr(): IdxExpr = {
      skipWs()
      if (lookaheadWord("last")) {
        skipWs()
        if (!atEnd && peek == '-') {
          next(); skipWs()
          IdxExpr(-number().toInt, fromLast = true)
        } else IdxExpr(0, fromLast = true)
      } else IdxExpr(number().toInt, fromLast = false)
    }
  }
}
