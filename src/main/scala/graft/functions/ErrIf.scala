package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.DataType

/** Reference error discipline for inputs Spark would null-absorb or
  * silently accept: evaluates `cond`; a TRUE raises the reference's
  * numbered error (1006-style), anything else passes `result`
  * through. Used by the unhex/space/char strict guards.
  */
case class ErrIf(left: Expression, right: Expression, msg: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = right.dataType
  override def nullable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val c = left.eval(input)
    if (c == true) throw new IllegalArgumentException(msg)
    right.eval(input)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ErrIf =
    copy(left = newLeft, right = newRight)
}

/** chr/char on a real unicode codepoint (reference 02_0043:
  * chr(8364) = '€', char(23232223) errors 1006); Spark's Chr wraps
  * modulo 256 instead.
  */
case class ChrCodepoint(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val n = input.asInstanceOf[Long]
    if (n < 0 || n > 0x10FFFF || (n >= 0xD800 && n <= 0xDFFF))
      throw new IllegalArgumentException(s"1006: invalid codepoint $n for char")
    org.apache.spark.unsafe.types.UTF8String.fromString(
      new String(Character.toChars(n.toInt)))
  }
  override protected def withNewChildInternal(newChild: Expression): ChrCodepoint =
    copy(child = newChild)
}

/** to_string over a value whose display depends on the RESOLVED type:
  * the engine stores BITMAP as BinaryType, and the reference renders
  * bitmaps as "1,3,5" while every other type is its cast-to-string
  * form. A registry builder sees unresolved children, so the dispatch
  * happens here, post-resolution, via RuntimeReplaceable.
  */
case class ToStringDispatch(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.BinaryType =>
      org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
        BitmapAggs.getClass,
        org.apache.spark.sql.types.StringType,
        "bytesToDisplay",
        Seq(child),
        Seq(org.apache.spark.sql.types.BinaryType))
    case _ =>
      // timezone set eagerly: ResolveTimeZone never revisits a
      // RuntimeReplaceable's lazily-built replacement, so a bare
      // timestamp->string cast here would stay unresolved
      // (to_string(now()) INTERNAL_ERROR)
      org.apache.spark.sql.catalyst.expressions.Cast(
        child, org.apache.spark.sql.types.StringType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }
  override protected def withNewChildInternal(newChild: Expression): ToStringDispatch =
    copy(child = newChild)
}

/** JSON text of a value for the json_* function family: VARIANT
  * renders via to_json (json-null stays the text "null" — a plain
  * string cast of a variant null returns SQL NULL and silently
  * null-absorbs json_strip_nulls/json_typeof & friends); strings pass
  * through; everything else casts.
  */
case class JsonTextDispatch(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.VariantType =>
      // timezone set eagerly: the analyzer's ResolveTimeZone never
      // revisits a RuntimeReplaceable's lazily-built replacement
      org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map.empty[String, String], child,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
    case org.apache.spark.sql.types.StringType => child
    case _ =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        child, org.apache.spark.sql.types.StringType,
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }
  override protected def withNewChildInternal(newChild: Expression): JsonTextDispatch =
    copy(child = newChild)
}
