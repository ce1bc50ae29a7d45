package graft.functions

import java.util.regex.{Matcher, Pattern}

/** MySQL-shaped regexp functions with the reference's full argument
  * lists (src/query/functions/src/scalars/string.rs regexp family):
  *
  *   regexp_like(s, pat [, match_type])
  *   regexp_instr(s, pat [, pos [, occurrence [, return_option [, match_type]]]])
  *   regexp_substr(s, pat [, pos [, occurrence [, match_type]]])
  *   regexp_replace(s, pat, repl [, pos [, occurrence [, match_type]]])
  *
  * Semantics matched to the reference:
  *   - default match is case-INSENSITIVE (MySQL's default collation);
  *     match_type 'c' restores sensitivity, 'i'/'m'/'n'/'u' as MySQL
  *   - positions and returned indexes are 1-based CHARACTER (code
  *     point) offsets, not UTF-16 units
  *   - POSIX classes ([[:alnum:]] etc.) translate to Java \p{...}
  *   - replacement text supports $N / $name / ${name} group refs
  *     (Rust regex-crate expansion; $$ is a literal dollar)
  *   - occurrence 0 in regexp_replace means "replace all"
  */
object RegexpMysql {

  private def flags(matchType: String): Int = {
    // MySQL's default collation makes the regexp family
    // case-INSENSITIVE unless the match_type has 'c'
    var f = Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
    if (matchType != null) matchType.foreach {
      case 'i' => f |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
      case 'c' => f &= ~(Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE)
      case 'm' => f |= Pattern.MULTILINE
      case 'n' => f |= Pattern.DOTALL
      case 'u' => f |= Pattern.UNIX_LINES
      case other => throw new IllegalArgumentException(
        s"Incorrect arguments to regexp match_type: $other")
    }
    f
  }

  private val PosixClasses = Map(
    "alnum" -> "\\p{Alnum}", "alpha" -> "\\p{Alpha}", "blank" -> "\\p{Blank}",
    "cntrl" -> "\\p{Cntrl}", "digit" -> "\\p{Digit}", "graph" -> "\\p{Graph}",
    "lower" -> "\\p{Lower}", "print" -> "\\p{Print}", "punct" -> "\\p{Punct}",
    "space" -> "\\p{Space}", "upper" -> "\\p{Upper}", "xdigit" -> "\\p{XDigit}")

  private def toJava(pat: String): String =
    """\[:(\w+):\]""".r.replaceAllIn(pat, m =>
      Matcher.quoteReplacement(PosixClasses.getOrElse(m.group(1), m.matched)))

  private def compile(pat: String, mt: String): Pattern =
    Pattern.compile(toJava(pat), flags(mt))

  /** UTF-16 offset of the 1-based char (code point) position `pos` */
  private def charToUnit(s: String, pos: Int): Int = {
    val cp = pos - 1
    if (cp >= s.codePointCount(0, s.length)) s.length
    else s.offsetByCodePoints(0, cp)
  }

  private def unitToChar(s: String, unit: Int): Int =
    s.codePointCount(0, unit) + 1

  private def matcherAt(s: String, pat: String, pos: Int, mt: String): Matcher = {
    if (pos < 1) throw new IllegalArgumentException(
      s"Incorrect regexp position argument: $pos")
    val m = compile(pat, mt).matcher(s)
    m.region(math.min(charToUnit(s, pos), s.length), s.length)
    m
  }

  def like(s: String, pat: String, mt: String): java.lang.Boolean =
    if (s == null || pat == null || mt == null) null
    else compile(pat, mt).matcher(s).find()

  /** 1-based char index of the occurrence-th match; 0 when absent.
    * returnOption 0 = match start, 1 = one past match end (MySQL).
    */
  def instr(s: String, pat: String, pos: Int, occurrence: Int,
            returnOption: Int, mt: String): java.lang.Long = {
    if (s == null || pat == null || mt == null) return null
    if (occurrence < 1) throw new IllegalArgumentException(
      s"Incorrect regexp occurrence argument: $occurrence")
    if (returnOption != 0 && returnOption != 1)
      throw new IllegalArgumentException(
        s"Incorrect regexp return_option argument: $returnOption")
    val m = matcherAt(s, pat, pos, mt)
    var n = 0
    while (m.find()) {
      n += 1
      if (n == occurrence)
        return unitToChar(s, if (returnOption == 0) m.start else m.end).toLong
    }
    0L
  }

  def substr(s: String, pat: String, pos: Int, occurrence: Int,
             mt: String): String = {
    if (s == null || pat == null || mt == null) return null
    if (occurrence < 1) throw new IllegalArgumentException(
      s"Incorrect regexp occurrence argument: $occurrence")
    val m = matcherAt(s, pat, pos, mt)
    var n = 0
    while (m.find()) {
      n += 1
      if (n == occurrence) return m.group()
    }
    null
  }

  /** Rust-regex replacement expansion -> Java: `$name` needs braces,
    * `$$` is a literal `$`, `$1` passes through.
    */
  private def javaReplacement(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '$' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n == '$') { sb.append("\\$"); i += 2 }
        else if (n == '{') { // ${name} passes through
          sb.append('$'); i += 1
        } else if (n.isDigit) { sb.append('$'); i += 1 }
        else if (n.isLetter || n == '_') {
          var j = i + 1
          while (j < r.length && (r.charAt(j).isLetterOrDigit || r.charAt(j) == '_')) j += 1
          sb.append("${").append(r.substring(i + 1, j)).append('}')
          i = j
        } else { sb.append("\\$"); i += 1 }
      } else if (c == '\\') { sb.append("\\\\"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  def replace(s: String, pat: String, repl: String, pos: Int,
              occurrence: Int, mt: String): String = {
    if (s == null || pat == null || repl == null || mt == null) return null
    if (occurrence < 0) throw new IllegalArgumentException(
      s"Incorrect regexp occurrence argument: $occurrence")
    val m = matcherAt(s, pat, pos, mt)
    val jrepl = javaReplacement(repl)
    val sb = new StringBuffer
    var n = 0
    while (m.find()) {
      n += 1
      if (occurrence == 0 || n == occurrence) {
        m.appendReplacement(sb, jrepl)
        if (occurrence != 0) {
          m.appendTail(sb)
          return sb.toString
        }
      }
    }
    m.appendTail(sb)
    sb.toString
  }
}
