package graft

import graft.functions.Types
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §1.2 type mapping: unsigned widening + Decimal256 narrowing
  * (reference types.rs:115-142, types/number.rs, types/decimal.rs).
  */
class TypesSpec extends AnyFunSuite {

  test("unsigned widening: each uN maps to the smallest signed holder") {
    assert(Types.toSpark("UInt8") == ShortType)
    assert(Types.toSpark("UInt16") == IntegerType)
    assert(Types.toSpark("UInt32") == LongType)
    assert(Types.toSpark("UInt64") == DecimalType(20, 0))
    // signed passthrough
    assert(Types.toSpark("Int8") == ByteType)
    assert(Types.toSpark("Int64") == LongType)
  }

  test("decimal256 narrowing keeps integral digits, truncates scale") {
    assert(Types.narrowDecimal(38, 10) == DecimalType(38, 10)) // no-op
    assert(Types.narrowDecimal(50, 12) == DecimalType(38, 0))  // integral 38 -> no room for scale
    assert(Types.narrowDecimal(40, 4) == DecimalType(38, 2))   // integral 36 -> keep 2 of 4
    assert(Types.narrowDecimal(76, 40) == DecimalType(38, 2))  // max 256-bit precision
    // integral digits beyond 38 must refuse, not silently corrupt
    intercept[IllegalArgumentException](Types.narrowDecimal(50, 2))
    assert(!Types.fitsInSpark(50, 2) && Types.fitsInSpark(50, 12))
  }

  test("wrappers: Nullable unwraps, Array/Map/Tuple nest, names parse") {
    assert(Types.toSpark("Nullable(UInt64)") == DecimalType(20, 0))
    assert(Types.toSpark("Array(UInt8)") == ArrayType(ShortType))
    assert(Types.toSpark("Map(String, UInt32)") == MapType(StringType, LongType))
    assert(Types.toSpark("Tuple(String, Decimal(40, 4))") ==
      StructType(Seq(
        StructField("_1", StringType),
        StructField("_2", DecimalType(38, 2)))))
    assert(Types.toSpark("Timestamp") == TimestampNTZType)
    assert(Types.toSpark("Variant") == VariantType)
    intercept[IllegalArgumentException](Types.toSpark("NotAType"))
  }
}
