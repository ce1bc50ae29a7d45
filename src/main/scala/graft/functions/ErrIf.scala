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

/** databend's 1-arg to_binary (binary.rs): a STRING is its UTF-8
  * bytes (Spark's to_binary defaults to HEX decoding), a VARIANT is
  * its canonical JSON text's bytes, BINARY passes through. The 2-arg
  * format form keeps Spark's builtin (hex/base64/utf-8 agree).
  */
case class ToBinaryDispatch(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.BinaryType => child
    case org.apache.spark.sql.types.StringType =>
      org.apache.spark.sql.catalyst.expressions.Encode(
        child, org.apache.spark.sql.catalyst.expressions.Literal("UTF-8"))
    case org.apache.spark.sql.types.VariantType =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        JsonTextDispatch(child), org.apache.spark.sql.types.BinaryType)
    case _ =>
      org.apache.spark.sql.catalyst.expressions.Cast(
        org.apache.spark.sql.catalyst.expressions.Cast(
          child, org.apache.spark.sql.types.StringType,
          Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)),
        org.apache.spark.sql.types.BinaryType)
  }
  override protected def withNewChildInternal(newChild: Expression): ToBinaryDispatch =
    copy(child = newChild)
}

/** JSON text of a value wrapped in a one-element ARRAY, for
  * to_variant's lowering (`variant_get(parse_json(this), '$[0]')`):
  * BINARY dispatches through [[graft.functions.BitmapAggs
  * .bytesToVariantJson]] so a roaring-bitmap payload becomes its
  * value array (the reference's bitmap->variant cast) instead of a
  * base64 string; everything else renders via to_json.
  */
case class ToVariantJsonText(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case org.apache.spark.sql.types.BinaryType =>
      org.apache.spark.sql.catalyst.expressions.Concat(Seq(
        org.apache.spark.sql.catalyst.expressions.Literal("["),
        org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
          graft.functions.BitmapAggs.getClass,
          org.apache.spark.sql.types.StringType,
          "bytesToVariantJson",
          Seq(child),
          Seq(org.apache.spark.sql.types.BinaryType)),
        org.apache.spark.sql.catalyst.expressions.Literal("]")))
    case _ =>
      org.apache.spark.sql.catalyst.expressions.StructsToJson(
        Map.empty[String, String],
        org.apache.spark.sql.catalyst.expressions.CreateArray(Seq(child)),
        Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
  }
  override protected def withNewChildInternal(newChild: Expression): ToVariantJsonText =
    copy(child = newChild)
}
