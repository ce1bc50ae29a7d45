package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** feistel_obfuscate — the reference's numeric obfuscator
  * (scalars/obfuscator.rs:235-367): a 4-round Feistel network over the
  * value's significant bits, keyed by seed, preserving the log2 class
  * (and sign) so obfuscated data keeps its distribution shape. 0/±1
  * are fixed points; 2..3 / -3..-2 permute pairwise by seed parity.
  *
  * The round function is Rust's std DefaultHasher — SipHash-1-3 with a
  * zero key — over little-endian (right_half, seed, round). Output is
  * bit-exact with the reference's golden vectors
  * (tests/it/scalars/testdata/obfuscator.txt), see ObfuscatorSpec.
  *
  * Floats obfuscate the mantissa bits of the raw IEEE encoding
  * (52 for f64, 23 for f32), keeping sign and exponent.
  *
  * markov_generate (the text half of the obfuscator) needs a trained
  * n-gram model table and stays out of scope (SURVEY call).
  */
object Obfuscator {

  /** SipHash-1-3, the variant inside Rust's DefaultHasher (keys 0,0) */
  private[graft] def sipHash13(k0: Long, k1: Long, data: Array[Byte]): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1
    @inline def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))
    @inline def round(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }
    val n = data.length
    val end = n - (n % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m; round(); v0 ^= m
      i += 8
    }
    var b = n.toLong << 56
    i = end
    while (i < n) { b |= (data(i) & 0xffL) << (8 * (i - end)); i += 1 }
    v3 ^= b; round(); v0 ^= b
    v2 ^= 0xff
    round(); round(); round()
    v0 ^ v1 ^ v2 ^ v3
  }

  private def mask(numBits: Int): Long =
    if (numBits >= 64) -1L else (1L << numBits) - 1L

  private def roundHash(rightHalf: Long, seed: Long, round: Int): Long = {
    // DefaultHasher sees write_u64(right) ++ write_u64(seed) ++
    // write_usize(round), all little-endian
    val buf = java.nio.ByteBuffer.allocate(24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(rightHalf).putLong(seed).putLong(round.toLong)
    sipHash13(0L, 0L, buf.array)
  }

  /** 4-round Feistel on the low `numBits` of x; higher bits pass through */
  private[graft] def feistelNetwork(x: Long, numBits: Int, seed: Long, rounds: Int): Long = {
    var bits = x & mask(numBits)
    var r = 0
    while (r < rounds) {
      val leftBits = numBits / 2
      val rightBits = numBits - leftBits
      val lh = (bits >>> rightBits) & mask(leftBits)
      val rh = bits & mask(rightBits)
      bits = (rh << leftBits) ^ (lh ^ (roundHash(rh, seed, r) & mask(leftBits)))
      r += 1
    }
    bits ^ (x & ~mask(numBits))
  }

  /** log2-class-preserving permutation (works for every signed width:
    * the significant-bit count of a positive value is width-independent)
    */
  private[graft] def transformLong(x: Long, seed: Long): Long =
    if (x >= -1L && x <= 1L) x
    else if (x >= 2L && x <= 3L) x ^ (seed & 1L)
    else if (x >= -3L && x <= -2L) -((-x) ^ (seed & 1L))
    else if (x >= 4L) {
      val numBits = 63 - java.lang.Long.numberOfLeadingZeros(x)
      feistelNetwork(x, numBits, seed, 4)
    } else if (x == Long.MinValue) x
    else {
      val xa = -x
      val numBits = 63 - java.lang.Long.numberOfLeadingZeros(xa)
      -feistelNetwork(xa, numBits, seed, 4)
    }

  private[graft] def transformDouble(x: Double, seed: Long): Double =
    java.lang.Double.longBitsToDouble(
      feistelNetwork(java.lang.Double.doubleToRawLongBits(x), 52, seed, 4))

  private[graft] def transformFloat(x: Float, seed: Long): Float =
    java.lang.Float.intBitsToFloat(
      feistelNetwork(java.lang.Float.floatToRawIntBits(x) & 0xffffffffL, 23, seed, 4).toInt)

  val rewrites: Map[String, Seq[Expression] => Expression] = Map(
    "feistel_obfuscate" -> (a =>
      FeistelObfuscate(a.head, Cast(a(1), LongType))))
}

/** type-dispatching expression: output type = input type */
case class FeistelObfuscate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  import Obfuscator._

  override def dataType: DataType = left.dataType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = left.dataType match {
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"feistel_obfuscate does not support ${t.sql}")
  }

  override protected def nullSafeEval(x: Any, s: Any): Any = {
    val seed = s.asInstanceOf[Long]
    left.dataType match {
      case LongType => transformLong(x.asInstanceOf[Long], seed)
      // each width's MIN is a fixed point in the reference (the Feistel
      // negation path would overflow the narrower type otherwise)
      case IntegerType =>
        val v = x.asInstanceOf[Int]
        if (v == Int.MinValue) v else transformLong(v.toLong, seed).toInt
      case ShortType =>
        val v = x.asInstanceOf[Short]
        if (v == Short.MinValue) v else transformLong(v.toLong, seed).toShort
      case ByteType =>
        val v = x.asInstanceOf[Byte]
        if (v == Byte.MinValue) v else transformLong(v.toLong, seed).toByte
      case DoubleType => transformDouble(x.asInstanceOf[Double], seed)
      case FloatType => transformFloat(x.asInstanceOf[Float], seed)
      case t => throw new IllegalStateException(s"feistel_obfuscate: $t")
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FeistelObfuscate =
    copy(left = newLeft, right = newRight)
}
