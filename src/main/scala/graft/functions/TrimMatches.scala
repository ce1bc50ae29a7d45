package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's trim_both/trim_leading/trim_trailing with an
  * explicit pattern strip the exact SUBSTRING repeatedly while it
  * prefixes/suffixes (string.rs `while res.starts_with(trim_str)`),
  * unlike 2-arg `trim(val, set)` which trims a character set —
  * `trim_both('aaabbaaa','aa')` is `abba`, not `bb`. An empty pattern
  * leaves the input unchanged.
  */
case class TrimMatches(left: Expression, right: Expression,
    leading: Boolean, trailing: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(in: Any, pat: Any): Any = {
    var s = in.asInstanceOf[UTF8String].toString
    val p = pat.asInstanceOf[UTF8String].toString
    if (p.isEmpty) return UTF8String.fromString(s)
    if (leading) while (s.startsWith(p)) s = s.substring(p.length)
    if (trailing) while (s.endsWith(p)) s = s.substring(0, s.length - p.length)
    UTF8String.fromString(s)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrimMatches =
    copy(left = newLeft, right = newRight)
}
