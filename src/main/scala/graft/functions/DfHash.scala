package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte encoding the reference feeds its hash family (siphash64 /
  * xxhash64 / city64withseed): the value's native little-endian
  * representation, no length prefix (hash.rs `DFHash`: strings hash
  * their UTF-8 bytes via `Hash::hash_slice`, integers their
  * fixed-width LE bytes, floats their IEEE bit pattern). Integer
  * literal WIDTH follows the reference's literal typing (smallest
  * fitting type, so `siphash64(1)` hashes one byte) — handled at
  * rewrite time in MoreAliases2, since Spark types every int literal
  * INT.
  */
case class DfHashEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = DfHash.encode(input, child.dataType)
  override protected def withNewChildInternal(newChild: Expression): DfHashEncode =
    copy(child = newChild)
}

object DfHash {
  private def le(v: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = ((v >>> (8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  private[graft] def encode(input: Any, dt: DataType): Array[Byte] = dt match {
    case StringType => input.asInstanceOf[UTF8String].getBytes
    case BinaryType => input.asInstanceOf[Array[Byte]]
    case ByteType => le(input.asInstanceOf[Byte].toLong, 1)
    case ShortType => le(input.asInstanceOf[Short].toLong, 2)
    case IntegerType => le(input.asInstanceOf[Int].toLong, 4)
    case DateType => le(input.asInstanceOf[Int].toLong, 4) // days i32
    case LongType => le(input.asInstanceOf[Long], 8)
    case TimestampType | TimestampNTZType => le(input.asInstanceOf[Long], 8)
    case BooleanType => Array[Byte](if (input.asInstanceOf[Boolean]) 1 else 0)
    case FloatType =>
      le(java.lang.Float.floatToIntBits(input.asInstanceOf[Float]).toLong, 4)
    case DoubleType =>
      le(java.lang.Double.doubleToLongBits(input.asInstanceOf[Double]), 8)
    case d: DecimalType =>
      // reference decimal/src/hash.rs decimal_hash_typed: the scale
      // (one u8) then the unscaled i128, 16 bytes LE (Decimal128 —
      // Spark decimals cap at precision 38)
      val bi = input.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.unscaledValue
      val out = new Array[Byte](17)
      out(0) = d.scale.toByte
      if (bi.signum < 0) java.util.Arrays.fill(out, 1, 17, 0xff.toByte)
      val be = bi.toByteArray // big-endian two's complement
      var i = 0
      while (i < be.length && i < 16) {
        out(1 + i) = be(be.length - 1 - i); i += 1
      }
      out
    case _ =>
      // arrays/maps/structs: the reference registers no DFHash for
      // nested values and hashes an empty payload (its own suite
      // pins siphash64([1,2,3]) == siphash64([1,3,null]))
      Array.emptyByteArray
  }

  /** XXH64 seed 0 over the DFHash bytes (reference hash.rs xxhash64,
    * twox-hash XxHash64::default()).
    */
  private[graft] def xxh64(data: Array[Byte]): Long =
    net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()
      .hash64().hash(data, 0, data.length, 0L)

  private[graft] def unsigned(v: Long): String =
    java.lang.Long.toUnsignedString(v)
}
