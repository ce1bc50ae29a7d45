package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL-rule regexp split (reference srfs/string.rs
  * regexp_split_to_array/_to_table follow PG): non-zero-length matches
  * separate fields (empty fields kept: ',a,,b,' by ',' gives
  * ["","a","","b",""]); a zero-length match splits between characters
  * but is IGNORED at the string start, at the string end, and
  * immediately after a previous match — so '\s*' over 'the quick'
  * yields single letters with the spaces consumed and no empties.
  * Flags: i (case-insensitive), c (case-sensitive, default),
  * m/n (multiline), s (dotall), x (comments).
  */
case class PgRegexpSplit(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType)
  override def nullable: Boolean = true
  override def nullSafeEval(in: Any, pat: Any, fl: Any): Any = {
    val s = in.asInstanceOf[UTF8String].toString
    val p = pat.asInstanceOf[UTF8String].toString
    val flags = fl.asInstanceOf[UTF8String].toString
    var f = 0
    flags.foreach {
      case 'i' => f |= java.util.regex.Pattern.CASE_INSENSITIVE
      case 'c' => f &= ~java.util.regex.Pattern.CASE_INSENSITIVE
      case 'm' | 'n' => f |= java.util.regex.Pattern.MULTILINE
      case 's' => f |= java.util.regex.Pattern.DOTALL
      case 'x' => f |= java.util.regex.Pattern.COMMENTS
      case c => throw new IllegalArgumentException(
        s"1006: invalid regexp flag: $c")
    }
    val m = java.util.regex.Pattern.compile(p, f).matcher(s)
    val out = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    var fieldStart = 0
    var search = 0
    var lastMatchEnd = -1
    var done = false
    while (!done && search <= s.length && m.find(search)) {
      val ms = m.start; val me = m.end
      if (me == ms) {
        if (ms == 0 || ms == s.length || ms == lastMatchEnd) search = ms + 1
        else {
          out += UTF8String.fromString(s.substring(fieldStart, ms))
          fieldStart = ms; lastMatchEnd = ms; search = ms + 1
        }
      } else {
        out += UTF8String.fromString(s.substring(fieldStart, ms))
        fieldStart = me; lastMatchEnd = me
        search = me
      }
      if (search > s.length) done = true
    }
    out += UTF8String.fromString(s.substring(fieldStart))
    new GenericArrayData(out.toArray[Any])
  }
  override protected def withNewChildrenInternal(f1: Expression,
      f2: Expression, f3: Expression): PgRegexpSplit =
    copy(first = f1, second = f2, third = f3)
}
