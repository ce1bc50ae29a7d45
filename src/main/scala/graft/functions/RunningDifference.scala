package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Nondeterministic, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** running_difference(x): per-partition difference with the previous
  * row; the first row of each partition yields 0.
  *
  * Reference: scalars/other.rs:330-380 (`register_run_diff`) — the
  * ClickHouse-style block-local running difference (first value of
  * each block is 0, then `x[i] - x[i-1]`). Spark's unit of local
  * evaluation order is the partition, so "block" maps to partition
  * here, the same order-of-arrival contract the reference documents.
  * Output types follow the reference: Date -> Int32 (days),
  * Timestamp -> Int64 (microseconds), integers -> Int64,
  * floats/decimals -> Float64.
  *
  * Stateful, so declared [[Nondeterministic]] — Catalyst then refuses
  * to push it past exchanges or dedup it, which is exactly the safety
  * contract a row-order-dependent scalar needs.
  */
case class RunningDifference(child: Expression)
    extends UnaryExpression with Nondeterministic with CodegenFallback {

  override def dataType: DataType = child.dataType match {
    case DateType => IntegerType
    case TimestampType | TimestampNTZType => LongType
    case ByteType | ShortType | IntegerType | LongType => LongType
    case _ => DoubleType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DateType | TimestampType | TimestampNTZType | ByteType | ShortType |
        IntegerType | LongType | FloatType | DoubleType | _: DecimalType =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"running_difference expects a numeric/date/timestamp column, got $other")
  }

  override def nullable: Boolean = child.nullable

  @transient private var prev: Any = _
  @transient private var seen: Boolean = _

  override protected def initializeInternal(partitionIndex: Int): Unit = {
    prev = null
    seen = false
  }

  private def toLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  private def toDouble(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
    case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
    case other => toLong(other).toDouble
  }

  override protected def evalInternal(input: InternalRow): Any = {
    val cur = child.eval(input)
    if (cur == null) return null
    val out: Any =
      if (!seen) dataType match {
        case IntegerType => 0
        case LongType => 0L
        case _ => 0.0
      }
      else dataType match {
        case IntegerType => cur.asInstanceOf[Int] - prev.asInstanceOf[Int]
        case LongType => toLong(cur) - toLong(prev)
        case _ => toDouble(cur) - toDouble(prev)
      }
    prev = cur
    seen = true
    out
  }

  override protected def withNewChildInternal(newChild: Expression): RunningDifference =
    copy(child = newChild)
}
