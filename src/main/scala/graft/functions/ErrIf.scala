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
