package graft.functions

/** Full-text search evaluator backing the SQL `match()` / `query()` /
  * `score()` surface (reference: inverted-index search,
  * src/query/storages/fuse/src/io/read/inverted_index/ and the
  * tantivy-based query semantics exercised by
  * tests/sqllogictests/suites/query/index/04_inverted_index/).
  *
  * The statement head computes per-field corpus statistics (N, avgdl,
  * per-term document frequencies) with distributed aggregations at
  * bind time, serializes them into a spec, and scores each row with
  * one scalar UDF call — the same shape as probing a synced index.
  * For the persisted, probe-only scale path see
  * operators/InvertedIndex (BM25 over stored postings).
  *
  * DOCUMENTED DIVERGENCES from the reference's tantivy engine:
  *  - the 'chinese' tokenizer falls back to CJK unigrams (tantivy
  *    embeds the jieba dictionary, not reconstructible offline), so
  *    Chinese term segmentation — and therefore Chinese match sets
  *    and scores — can differ;
  *  - BM25 uses exact document lengths (tantivy quantizes fieldnorms
  *    to a byte table), so scores differ in low digits.
  * Both are noted in the adapted slt goldens.
  */
object FullText {

  // -------------------------------------------------------- analyzer

  /** tantivy's default english stopword set */
  private val EnglishStop: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
    "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
    "such", "that", "the", "their", "then", "there", "these", "they",
    "this", "to", "was", "will", "with")

  /** a minimal chinese stopword set (particles + punctuation ride the
    * tokenizer, which drops non-letter CJK punctuation already)
    */
  private val ChineseStop: Set[String] = Set("的", "了", "和", "是", "就",
    "都", "而", "及", "与", "着", "或", "一个", "没有", "我们", "你们",
    "他们", "她们", "是否")

  def isCjk(c: Char): Boolean = {
    val b = Character.UnicodeBlock.of(c)
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS ||
    b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS_EXTENSION_A ||
    b == Character.UnicodeBlock.CJK_COMPATIBILITY_IDEOGRAPHS
  }

  /** raw token stream: ASCII/latin word runs lowercased; CJK runs as
    * unigrams (jieba fallback, see scaladoc)
    */
  def tokenize(text: String): Seq[String] = {
    if (text == null) return Seq.empty
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    def flush(): Unit = { if (sb.nonEmpty) { out += sb.toString; sb.clear() } }
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (Character.isLetterOrDigit(c)) {
        if (isCjk(c)) { flush(); out += c.toString.toLowerCase }
        else sb.append(Character.toLowerCase(c))
      } else flush()
      i += 1
    }
    flush()
    out.result()
  }

  /** Porter stemming algorithm (M.F. Porter, 1980 — public domain
    * algorithm), as used by tantivy's english_stemmer filter.
    */
  def porterStem(w0: String): String = {
    if (w0.length <= 2) return w0
    var w = w0
    def isVowelAt(s: String, i: Int): Boolean = {
      val c = s.charAt(i)
      c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' ||
      (c == 'y' && i > 0 && !isVowelAt(s, i - 1))
    }
    def measure(s: String): Int = {
      var m = 0; var i = 0; val n = s.length
      while (i < n && !isVowelAt(s, i)) i += 1
      while (i < n) {
        while (i < n && isVowelAt(s, i)) i += 1
        if (i < n) { m += 1; while (i < n && !isVowelAt(s, i)) i += 1 }
      }
      m
    }
    def hasVowel(s: String): Boolean = (0 until s.length).exists(isVowelAt(s, _))
    def endsDoubleC(s: String): Boolean =
      s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
        !isVowelAt(s, s.length - 1)
    def cvc(s: String): Boolean = {
      if (s.length < 3) return false
      val n = s.length
      if (isVowelAt(s, n - 1) || !isVowelAt(s, n - 2) || isVowelAt(s, n - 3)) return false
      val c = s.charAt(n - 1)
      c != 'w' && c != 'x' && c != 'y'
    }
    def repl(s: String, suf: String, to: String, cond: String => Boolean): Option[String] =
      if (s.endsWith(suf)) {
        val stem = s.substring(0, s.length - suf.length)
        if (cond(stem)) Some(stem + to) else Some(s)
      } else None

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)
    // step 1b
    var extra = false
    if (w.endsWith("eed")) { if (measure(w.dropRight(3)) > 0) w = w.dropRight(1) }
    else if (w.endsWith("ed") && hasVowel(w.dropRight(2))) { w = w.dropRight(2); extra = true }
    else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) { w = w.dropRight(3); extra = true }
    if (extra) {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (endsDoubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
      else if (measure(w) == 1 && cvc(w)) w += "e"
    }
    // step 1c (Porter2/Snowball form, as tantivy stems: y -> i when
    // preceded by a NON-vowel that is not the word's first letter —
    // 'fly' stems to 'fli', matching 'flies')
    if (w.length > 2 && w.endsWith("y") && !isVowelAt(w, w.length - 2))
      w = w.dropRight(1) + "i"
    // step 2
    val step2 = Seq("ational" -> "ate", "tional" -> "tion", "enci" -> "ence",
      "anci" -> "ance", "izer" -> "ize", "abli" -> "able", "alli" -> "al",
      "entli" -> "ent", "eli" -> "e", "ousli" -> "ous", "ization" -> "ize",
      "ation" -> "ate", "ator" -> "ate", "alism" -> "al", "iveness" -> "ive",
      "fulness" -> "ful", "ousness" -> "ous", "aliti" -> "al",
      "iviti" -> "ive", "biliti" -> "ble")
    step2.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, to) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + to
    }
    // step 3
    val step3 = Seq("icate" -> "ic", "ative" -> "", "alize" -> "al",
      "iciti" -> "ic", "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.find { case (suf, _) => w.endsWith(suf) }.foreach { case (suf, to) =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 0) w = stem + to
    }
    // step 4
    val step4 = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
      "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.find(w.endsWith).foreach { suf =>
      val stem = w.dropRight(suf.length)
      if (measure(stem) > 1) w = stem
      else if (suf == "ion" && stem.nonEmpty &&
               (stem.last == 's' || stem.last == 't') && measure(stem) > 1) w = stem
    }
    if (w.endsWith("ion")) {
      val stem = w.dropRight(3)
      if (stem.nonEmpty && (stem.last == 's' || stem.last == 't') && measure(stem) > 1)
        w = stem
    }
    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      if (measure(stem) > 1 || (measure(stem) == 1 && !cvc(stem))) w = stem
    }
    // step 5b
    if (endsDoubleC(w) && w.last == 'l' && measure(w) > 1) w = w.dropRight(1)
    val _ = repl _ // silence unused warn path
    w
  }

  /** full analyzer: tokenizer + the index's declared filter chain */
  def analyze(text: String, filters: Set[String]): Seq[String] = {
    var toks = tokenize(text)
    if (filters("english_stop")) toks = toks.filterNot(EnglishStop)
    if (filters("chinese_stop")) toks = toks.filterNot(ChineseStop)
    if (filters("english_stemmer"))
      toks = toks.map(t => if (t.headOption.exists(c => c >= 'a' && c <= 'z')) porterStem(t) else t)
    toks
  }

  /** separator between the json path tag and the token (tantivy json
    * fields store terms per path)
    */
  val PathSep = '\u0000'

  /** analyze a VARIANT/json document into path-tagged tokens
    * (`a.b<sep>tok`); string/number/bool leaves tokenize, arrays keep
    * their element path
    */
  def analyzeJson(json: String, filters: Set[String]): Seq[String] = {
    if (json == null || json.trim.isEmpty) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = try mapper.readTree(json) catch { case _: Exception => return analyze(json, filters) }
    val out = Vector.newBuilder[String]
    def walk(node: com.fasterxml.jackson.databind.JsonNode, path: String): Unit = {
      if (node.isObject) {
        val it = node.fields()
        while (it.hasNext) {
          val e = it.next()
          walk(e.getValue, if (path.isEmpty) e.getKey else s"$path.${e.getKey}")
        }
      } else if (node.isArray) {
        val it = node.elements()
        while (it.hasNext) walk(it.next(), path)
      } else {
        analyze(node.asText(), filters).foreach(t => out += s"$path$PathSep$t")
      }
    }
    walk(root, "")
    out.result()
  }

  // -------------------------------------------------------- BM25

  private val K1 = 1.2
  private val B = 0.75

  /** tantivy-style idf */
  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def bm25(tf: Int, dl: Int, avgdl: Double, n: Long, df: Long): Double =
    if (tf == 0 || df == 0) 0.0
    else idf(n, df) * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dl / math.max(avgdl, 1e-9)))

  // -------------------------------------------------------- query AST

  sealed trait Q
  final case class Term(field: Option[String], text: String,
                        fuzzy: Int = 0) extends Q
  final case class Phrase(field: Option[String], terms: Seq[String]) extends Q
  final case class And(l: Q, r: Q) extends Q
  final case class Or(l: Q, r: Q) extends Q
  final case class Must(q: Q) extends Q
  final case class MustNot(q: Q) extends Q
  final case class Group(qs: Seq[Q], field: Option[String]) extends Q

  final case class ParseError(msg: String) extends RuntimeException(
    s"1903: invalid full-text query syntax: $msg")

  /** tantivy query-syntax subset: `field:term`, quoted phrases,
    * AND/OR, `+must`/`-mustnot`, parenthesized groups that distribute
    * the field prefix (`title:(+python -rust)`)
    */
  def parseQuery(q: String): Seq[Q] = {
    var i = 0
    def ws(): Unit = while (i < q.length && q.charAt(i).isWhitespace) i += 1
    def atom(field: Option[String]): Q = {
      ws()
      if (i >= q.length) throw ParseError("empty clause")
      q.charAt(i) match {
        case '+' => i += 1; Must(atom(field))
        case '-' => i += 1; MustNot(atom(field))
        case '"' =>
          val end = q.indexOf('"', i + 1)
          if (end < 0) throw ParseError("unterminated phrase")
          val ph = q.substring(i + 1, end); i = end + 1
          Phrase(field, tokenize(ph))
        case '(' =>
          i += 1
          val inner = Vector.newBuilder[Q]
          ws()
          while (i < q.length && q.charAt(i) != ')') { inner += clause(field); ws() }
          if (i >= q.length) throw ParseError("unbalanced parens")
          i += 1
          val qs = inner.result()
          if (qs.isEmpty) throw ParseError("empty group")
          Group(qs, field)
        case ')' => throw ParseError("unbalanced parens")
        case _ =>
          val start = i
          while (i < q.length && !q.charAt(i).isWhitespace &&
                 !"():\"".contains(q.charAt(i))) i += 1
          if (i == start) throw ParseError(s"unexpected char '${q.charAt(i)}'")
          val word = q.substring(start, i)
          if (i < q.length && q.charAt(i) == ':') {
            i += 1
            atom(Some(word.toLowerCase))
          } else Term(field, word)
      }
    }
    def clause(field: Option[String]): Q = {
      var left = atom(field)
      ws()
      while (i < q.length) {
        val save = i
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace) i += 1
        val word = q.substring(start, i)
        if (word.equalsIgnoreCase("AND")) { left = And(left, atom(field)); ws() }
        else if (word.equalsIgnoreCase("OR")) { left = Or(left, atom(field)); ws() }
        else { i = save; return left }
      }
      left
    }
    val out = Vector.newBuilder[Q]
    ws()
    while (i < q.length) { out += clause(None); ws() }
    val res = out.result()
    if (res.isEmpty) throw ParseError("empty query")
    res
  }

  // -------------------------------------------------------- evaluation

  /** per-field corpus statistics + analyzer config; `isJson` fields
    * carry PATH-TAGGED tokens (analyzeJson) and df keys are the full
    * tagged entries
    */
  final case class FieldStats(name: String, boost: Double, n: Long,
      avgdl: Double, dfs: Map[String, Long], filters: Set[String],
      isJson: Boolean = false)

  /** one searchable spec: the parsed clauses + per-field stats in
    * column order
    */
  final case class Spec(clauses: Seq[Q], fields: Seq[FieldStats],
      operatorAnd: Boolean, defaultFuzzy: Int)

  /** a multi-char CJK run in a query becomes a PHRASE of unigrams:
    * adjacency approximates jieba's dictionary segmentation, so
    * `北京大学` only matches documents containing that exact run (the
    * tantivy+jieba reference segments it as one token)
    */
  def cjkPhrases(q: Q): Q = q match {
    case Term(f, t, 0) =>
      val toks = tokenize(t)
      if (toks.length > 1 && toks.forall(x => x.length == 1 && isCjk(x.head)))
        Phrase(f, toks)
      else q
    case And(l, r) => And(cjkPhrases(l), cjkPhrases(r))
    case Or(l, r) => Or(cjkPhrases(l), cjkPhrases(r))
    case Must(x) => Must(cjkPhrases(x))
    case MustNot(x) => MustNot(cjkPhrases(x))
    case Group(qs, f) => Group(qs.map(cjkPhrases), f)
    case other => other
  }

  /** split a (possibly path-tagged) token into (path, term) */
  def tagOf(tok: String): (String, String) = {
    val i = tok.indexOf('\u0000')
    if (i < 0) ("", tok) else (tok.substring(0, i), tok.substring(i + 1))
  }

  private def pathOk(p: String, prefix: Option[String]): Boolean = prefix match {
    case None => true
    case Some(pp) => p == pp || p.startsWith(pp + ".")
  }

  private def editDistanceLe(a: String, b: String, k: Int): Boolean = {
    if (math.abs(a.length - b.length) > k) return false
    val n = a.length; val m = b.length
    var prev = (0 to m).toArray
    var i = 1
    while (i <= n) {
      val cur = new Array[Int](m + 1)
      cur(0) = i
      var j = 1
      var rowMin = cur(0)
      while (j <= m) {
        val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1), prev(j - 1) + cost)
        if (cur(j) < rowMin) rowMin = cur(j)
        j += 1
      }
      if (rowMin > k) return false
      prev = cur
      i += 1
    }
    prev(m) <= k
  }

  /** score one document (analyzed tokens per field; json fields carry
    * path-tagged tokens). Returns None for no match. Fuzzy-matched
    * terms contribute a CONSTANT 1.0 (tantivy fuzzy scoring, per the
    * reference's own goldens); exact terms contribute BM25 * boost.
    */
  def scoreDoc(fieldTokens: Seq[Seq[String]], spec: Spec): Option[Double] = {
    if (spec.clauses.isEmpty) return None
    val byName = spec.fields.map(_.name).zipWithIndex.toMap

    /** resolve `field` / `field.json.path` to (fieldIdx, pathPrefix) */
    def fieldsFor(f: Option[String]): Seq[(Int, Option[String])] = f match {
      case Some(n) =>
        byName.get(n) match {
          case Some(i) => Seq(i -> None)
          case None =>
            val head = n.takeWhile(_ != '.')
            byName.get(head).map(i => i -> Some(n.drop(head.length + 1))).toSeq
        }
      case None => spec.fields.indices.map(_ -> Option.empty[String])
    }

    def analyzeTerm(fi: Int, t: String): Seq[String] =
      analyze(t, spec.fields(fi).filters)

    def termIn(fi: Int, path: Option[String], raw: String,
        fuzzy: Int): (Boolean, Double) = {
      val toks = fieldTokens(fi)
      val fs = spec.fields(fi)
      val dl = toks.length
      val analyzed = analyzeTerm(fi, raw)
      if (analyzed.isEmpty) return (false, 0.0)
      var all = true; var score = 0.0
      analyzed.foreach { term =>
        // fuzzy within-k matching on a term no longer than k matches
        // everything — fall back to exact for those (CJK unigrams)
        val fz = if (term.length <= fuzzy) 0 else fuzzy
        if (fz > 0) {
          val hit = toks.exists { tk =>
            val (p, dt) = tagOf(tk); pathOk(p, path) && editDistanceLe(dt, term, fz)
          }
          if (hit) score += 1.0 * fs.boost else all = false
        } else {
          val matches = toks.filter { tk =>
            val (p, dt) = tagOf(tk); pathOk(p, path) && dt == term
          }
          if (matches.nonEmpty)
            matches.groupBy(identity).foreach { case (tag, occ) =>
              score += bm25(occ.size, dl, fs.avgdl, fs.n,
                fs.dfs.getOrElse(tag, 1L)) * fs.boost
            }
          else all = false
        }
      }
      (all, score)
    }

    def phraseIn(fi: Int, path: Option[String],
        terms0: Seq[String]): (Boolean, Double) = {
      val fs = spec.fields(fi)
      val terms = terms0.flatMap(t => analyzeTerm(fi, t))
      if (terms.isEmpty) return (false, 0.0)
      val tagged = fieldTokens(fi).map(tagOf).filter(pt => pathOk(pt._1, path))
      val seq = tagged.map(_._2)
      val hit = seq.sliding(terms.length).exists(_ == terms)
      if (!hit) (false, 0.0)
      else {
        val dl = fieldTokens(fi).length
        val s = terms.map { t =>
          val tags = tagged.filter(_._2 == t)
          val dfKey = tags.headOption.map { case (p, tt) =>
            if (p.isEmpty && !spec.fields(fi).isJson) tt else p + "\u0000" + tt
          }.getOrElse(t)
          bm25(tags.size, dl, fs.avgdl, fs.n, fs.dfs.getOrElse(dfKey, 1L))
        }.sum * fs.boost
        (true, s)
      }
    }

    // evaluate a clause: (matched, score)
    def eval(qq: Q): (Boolean, Double) = qq match {
      case Term(f, t, fz) =>
        val fuzzy = if (fz > 0) fz else spec.defaultFuzzy
        val rs = fieldsFor(f).map { case (fi, p) => termIn(fi, p, t, fuzzy) }
        val hits = rs.filter(_._1)
        if (hits.nonEmpty) (true, hits.map(_._2).max)
        else {
          // partial (per-analyzed-term) matches still score in OR mode
          val partial = rs.map(_._2).sum
          (partial > 0, partial)
        }
      case Phrase(f, ts) =>
        val rs = fieldsFor(f).map { case (fi, p) => phraseIn(fi, p, ts) }
        val hits = rs.filter(_._1)
        (hits.nonEmpty, if (hits.nonEmpty) hits.map(_._2).max else 0.0)
      case And(l, r) =>
        val (ml, sl) = eval(l); val (mr, sr) = eval(r)
        (ml && mr, if (ml && mr) sl + sr else 0.0)
      case Or(l, r) =>
        val (ml, sl) = eval(l); val (mr, sr) = eval(r)
        (ml || mr, sl + sr)
      case Must(x) => eval(x)
      case MustNot(x) => val (m, _) = eval(x); (!m, 0.0)
      case Group(qs, _) =>
        val musts = qs.collect { case m @ Must(_) => m }
        val nots = qs.collect { case m @ MustNot(_) => m }
        val shoulds = qs.filterNot(q2 => musts.contains(q2) || nots.contains(q2))
        val mr = musts.map(eval)
        val nr = nots.map(eval)
        val sr = shoulds.map(eval)
        val ok = mr.forall(_._1) && nr.forall(_._1) &&
          (musts.nonEmpty || shoulds.isEmpty || sr.exists(_._1))
        if (!ok) (false, 0.0)
        else (true, mr.map(_._2).sum + sr.filter(_._1).map(_._2).sum)
    }

    // top level: clauses combine per Group semantics; operator=AND
    // upgrades bare terms to musts
    val top: Q = Group(
      if (spec.operatorAnd) spec.clauses.map {
        case t: Term => Must(t)
        case p: Phrase => Must(p)
        case other => other
      } else spec.clauses, None)
    val (matched, s) = eval(top)
    if (matched && s >= 0) Some(s) else None
  }
}
