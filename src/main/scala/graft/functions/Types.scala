package graft.functions

import org.apache.spark.sql.types._

/** Reference type-system mapping (SURVEY §1.2; reference
  * src/query/expression/src/types.rs:115-142 DataType enum,
  * types/number.rs NumberDataType, types/decimal.rs DecimalSize).
  *
  * The two rules Spark doesn't have natively, made explicit and
  * testable here:
  *
  *  1. **Unsigned widening** — Spark has no unsigned integers, so each
  *     uN maps to the next signed type that holds its full range:
  *     u8→Short (0..255), u16→Int (0..65535), u32→Long
  *     (0..4294967295), u64→Decimal(20,0) (0..2^64-1 = 20 digits).
  *     The same rule the Spark parquet reader applies to parquet
  *     UINT_64 logical types, so data written by the reference engine
  *     reads consistently.
  *
  *  2. **Decimal256 narrowing** — the reference supports 256-bit
  *     decimals up to precision 76; Spark caps at 38. Integral digits
  *     are load-bearing, fractional digits degrade gracefully, so the
  *     documented narrowing keeps the integral part and truncates
  *     scale: scale' = min(s, max(0, 38 - (p - s))), precision' = 38.
  *     A value whose integral digits exceed 38 cannot be represented —
  *     callers get the full-precision p-s preserved check via
  *     `fitsInSpark`.
  */
object Types {

  /** databend unsigned number type -> widened Spark type */
  val unsignedWidening: Map[String, DataType] = Map(
    "uint8" -> ShortType,
    "uint16" -> IntegerType,
    "uint32" -> LongType,
    "uint64" -> DecimalType(20, 0))

  /** 256-bit decimal narrowing rule (p > 38): keep integral digits,
    * truncate fractional. Throws if the integral part alone exceeds 38
    * digits — that data cannot round-trip and must not be silently
    * corrupted.
    */
  def narrowDecimal(precision: Int, scale: Int): DecimalType = {
    require(precision >= scale && scale >= 0, s"bad decimal($precision,$scale)")
    if (precision <= 38) DecimalType(precision, scale)
    else {
      val integral = precision - scale
      require(integral <= 38,
        s"decimal($precision,$scale) has $integral integral digits; " +
          "exceeds Spark's 38-digit maximum and cannot be narrowed losslessly")
      DecimalType(38, math.min(scale, 38 - integral))
    }
  }

  def fitsInSpark(precision: Int, scale: Int): Boolean =
    precision - scale <= 38

  /** Parse a databend type name to the mapped Spark type. Handles the
    * scalar names from types.rs plus Nullable(...)/Array(...)/Map(...)
    * wrappers (nullability is a wrapper in the reference; in Spark it
    * is a field property, so Nullable just unwraps).
    */
  def toSpark(name: String): DataType = {
    val t = name.trim
    val lower = t.toLowerCase
    def inner(prefix: String): String =
      t.substring(prefix.length + 1, t.length - 1)
    lower match {
      case s if s.startsWith("nullable(") => toSpark(inner("nullable"))
      case s if s.startsWith("array(") => ArrayType(toSpark(inner("array")))
      case s if s.startsWith("map(") =>
        val parts = splitTop(inner("map"))
        require(parts.length == 2, s"map needs 2 type args: $t")
        MapType(toSpark(parts.head), toSpark(parts(1)))
      case s if s.startsWith("tuple(") =>
        StructType(splitTop(inner("tuple")).zipWithIndex.map {
          case (ft, i) => StructField(s"_${i + 1}", toSpark(ft))
        })
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = inner("decimal").split(',').map(_.trim.toInt)
        narrowDecimal(p, sc)
      case "null" => NullType
      case "boolean" => BooleanType
      case "int8" => ByteType
      case "int16" => ShortType
      case "int32" => IntegerType
      case "int64" => LongType
      case "uint8" | "uint16" | "uint32" | "uint64" => unsignedWidening(lower)
      case "float32" => FloatType
      case "float64" => DoubleType
      case "string" => StringType
      case "binary" => BinaryType
      case "date" => DateType
      case "timestamp" => TimestampNTZType
      case "timestamptz" | "timestamp_tz" => TimestampType
      case "interval" => DayTimeIntervalType()
      case "variant" => VariantType
      case "bitmap" => BinaryType // roaring bitmap bytes + BitmapAggs ops
      case "geometry" | "geography" => BinaryType // WKB bytes
      case "vector" => ArrayType(FloatType)
      case other => throw new IllegalArgumentException(s"unknown databend type: $other")
    }
  }

  /** split "K, V" / "A, B, C" at top-level commas (nested parens safe) */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    for (ch <- s) ch match {
      case '(' => depth += 1; sb.append(ch)
      case ')' => depth -= 1; sb.append(ch)
      case ',' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb.append(c)
    }
    if (sb.nonEmpty) out += sb.toString
    out.result().map(_.trim)
  }
}
