package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Reference datetime/number coercion semantics that differ from
  * Spark's (reference src/query/functions/src/scalars/timestamp/src/
  * datetime.rs and src/query/expression/src/utils/auto_detect_datetime
  * .rs):
  *
  *  - `int::DATE` / `to_date(int)` — days since epoch
  *    (datetime.rs number→date tier).
  *  - `int::TIMESTAMP` / `to_timestamp(int)` — magnitude-detected
  *    unit: |n| < 31536000000 (≈1000 years) seconds, < 31536000000000
  *    milliseconds, else microseconds (auto_detect_datetime.rs:68-77
  *    `int64_to_timestamp`).
  *  - `timestamp::BIGINT` — microseconds since epoch (the reference's
  *    timestamp representation IS i64 micros); `date::INT` — days.
  *  - `date - date` → INT days; `timestamp - timestamp` → BIGINT
  *    micros (datetime.rs:1729-1760 "minus").
  *  - `timestamp ± int` → timestamp shifted by raw MICROSECONDS
  *    (datetime.rs:2628-2700 register_timestamp_add_sub).
  *  - `date_add/date_sub(date, bigint)` — the reference's Int64 delta;
  *    Spark wants INT, so narrow the literal/expression.
  *
  * Implemented as a resolution rule so the rewrites run before
  * checkAnalysis (Spark would otherwise reject the casts/operand
  * types outright).
  */
class DatetimeCoercionRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isIntegral(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** reference auto_detect_datetime.rs:68 int64_to_timestamp (micros
    * clamp to the 0001..9999 range per types/timestamp.rs
    * clamp_timestamp)
    */
  private def magnitudeTimestamp(n0: Expression): Expression = {
    val n = asLong(n0)
    val secBound = Literal(31536000000L)
    val msBound = Literal(31536000000000L)
    def within(b: Literal) =
      And(GreaterThan(n, UnaryMinus(b)), LessThan(n, b))
    val clamped = Greatest(Seq(Least(Seq(n, Literal(253402300799999999L))),
      Literal(-62135596800000000L)))
    CaseWhen(
      Seq(within(secBound) -> SecondsToTimestamp(n),
          within(msBound) -> MillisToTimestamp(n)),
      Some(MicrosToTimestamp(clamped)))
  }

  /** reference types/date.rs clamp_date: days clamp to
    * 0001-01-01..9999-12-31
    */
  private def clampedDays(e: Expression): Expression =
    Cast(Greatest(Seq(Least(Seq(asLong(e), Literal(2932896L))),
      Literal(-719162L))), IntegerType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        // to_date/to_timestamp markers: dispatch on the (now resolved)
        // argument type — the function builder can't see types
        case ToDateMarker(c, tryMode) if c.resolved => c.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            DateFromUnixDate(clampedDays(c))
          case StringType => DatabendStringToDate(c, failOnError = !tryMode)
          case _ => Cast(c, DateType)
        }
        case ToTimestampMarker(c, tryMode) if c.resolved => c.dataType match {
          case ByteType | ShortType | IntegerType | LongType => magnitudeTimestamp(c)
          case StringType => DatabendStringToTimestamp(c, failOnError = !tryMode)
          case _ => Cast(c, TimestampType)
        }
        // int -> DATE: days since epoch
        case c @ Cast(child, DateType, _, _) if isIntegral(child) =>
          DateFromUnixDate(clampedDays(child))
        // int -> TIMESTAMP: magnitude-based unit detection
        case c @ Cast(child, TimestampType, _, _) if isIntegral(child) =>
          magnitudeTimestamp(child)
        // timestamp -> integer: microseconds since epoch (Spark casts
        // to SECONDS; the reference type is i64 micros)
        case Cast(child, LongType, _, _)
            if child.resolved && child.dataType == TimestampType =>
          UnixMicros(child)
        // date -> integer: days since epoch (Spark rejects this cast)
        case Cast(child, t @ (LongType | IntegerType), _, _)
            if child.resolved && child.dataType == DateType =>
          if (t == IntegerType) UnixDate(child) else Cast(UnixDate(child), LongType)
        // date - date -> INT days (Spark: INTERVAL DAY)
        case SubtractDates(l, r, _) => DateDiff(l, r)
        // ts - ts -> BIGINT micros; ts - int -> ts shifted by micros
        case s @ SubtractTimestamps(l, r, _, _) if s.childrenResolved =>
          if (isIntegral(r)) MicrosToTimestamp(Subtract(UnixMicros(l), asLong(r)))
          else if (isIntegral(l)) MicrosToTimestamp(Subtract(asLong(l), UnixMicros(r)))
          else Subtract(UnixMicros(l), UnixMicros(r))
        // ts + int (either side) -> ts shifted by micros
        case a @ Add(l, r, _) if a.childrenResolved &&
            l.dataType == TimestampType && isIntegral(r) =>
          MicrosToTimestamp(Add(UnixMicros(l), asLong(r)))
        case a @ Add(l, r, _) if a.childrenResolved &&
            r.dataType == TimestampType && isIntegral(l) =>
          MicrosToTimestamp(Add(asLong(l), UnixMicros(r)))
        // date_trunc(day-or-coarser, <string>) renders as DATE in the
        // reference (the string binds to the date overload); over
        // typed timestamp columns the TIMESTAMP result stands
        case TruncTimestamp(fl @ Literal(fmt, StringType), c, _)
            if fmt != null && c.resolved && (c match {
              // string input binds to the date overload; DATE input
              // keeps its DATE rendering on day-or-coarser units
              case Cast(s, TimestampType, _, _) =>
                s.dataType == StringType || s.dataType == DateType
              case _ => false
            }) && Set("day", "dd", "week", "month", "mon", "mm",
                      "quarter", "year", "yyyy", "yy")(fmt.toString.toLowerCase) =>
          val inner = c.asInstanceOf[Cast].child
          if (Set("day", "dd")(fmt.toString.toLowerCase)) Cast(inner, DateType)
          else TruncDate(Cast(inner, DateType), fl)
        // date_add/date_sub with a BIGINT delta (reference: Int64)
        case DateAdd(d, delta) if delta.resolved && delta.dataType == LongType =>
          DateAdd(d, Cast(delta, IntegerType))
        case DateSub(d, delta) if delta.resolved && delta.dataType == LongType =>
          DateSub(d, Cast(delta, IntegerType))
      }
    }
}

/** Unresolved placeholder for 1-arg to_date/try_to_date: the
  * DatetimeCoercionRule replaces it once the child's type is known.
  */
case class ToDateMarker(child: Expression, tryMode: Boolean)
    extends UnaryExpression with Unevaluable {
  override def dataType: DataType = DateType
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): ToDateMarker =
    copy(child = newChild)
}

/** Unresolved placeholder for 1-arg to_timestamp/to_datetime. */
case class ToTimestampMarker(child: Expression, tryMode: Boolean)
    extends UnaryExpression with Unevaluable {
  override def dataType: DataType = TimestampType
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): ToTimestampMarker =
    copy(child = newChild)
}

/** The reference's permissive string→timestamp parse
  * (src/query/expression/src/types/timestamp.rs string_to_timestamp,
  * via jiff): ISO dates with 'T' or ' ' separators, missing trailing
  * components defaulting to zero (`'2021-03-05 22:'`), optional
  * fractional seconds, optional UTC offset (`+HH:MM`/`Z`). Spark's
  * CAST rejects the partial forms, so this is a small dedicated
  * evaluator (scalar tier, not a hot path — bulk columns arrive typed).
  */
case class DatabendStringToTimestamp(child: Expression, failOnError: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.trim
    DatetimeSemantics.parseTimestampMicros(s) match {
      case Some(micros) => micros
      case None =>
        if (failOnError)
          throw new IllegalArgumentException(
            s"cannot parse to type TIMESTAMP: '$s'")
        else null
    }
  }
  override protected def withNewChildInternal(newChild: Expression): DatabendStringToTimestamp =
    copy(child = newChild)
}

/** String→date with the reference's bounds (0001-01-01..9999-12-31;
  * types/date.rs DATE_MIN/DATE_MAX — five-digit years are error 1006,
  * where Spark's CAST would accept them) and the same permissive
  * component handling as DatabendStringToTimestamp (a trailing time
  * part truncates away).
  */
case class DatabendStringToDate(child: Expression, failOnError: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any = {
    val s = input.toString.trim
    DatetimeSemantics.parseTimestampMicros(s) match {
      case Some(micros) =>
        java.lang.Math.floorDiv(micros, 86400000000L).toInt
      case None =>
        if (failOnError)
          throw new IllegalArgumentException(s"cannot parse to type DATE: '$s'")
        else null
    }
  }
  override protected def withNewChildInternal(newChild: Expression): DatabendStringToDate =
    copy(child = newChild)
}

/** `typeof(x)` with the reference's type spellings
  * (src/query/expression/src/types.rs:431 `sql_name`): TINYINT/
  * SMALLINT/INT/BIGINT/FLOAT/DOUBLE/VARCHAR/..., nested types through
  * the Display form uppercased, nullable as a ` NULL` suffix.
  */
case class TypeOfDatabend(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = true
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    UTF8String.fromString(DatetimeSemantics.sqlName(child.dataType, child.nullable))
  override def nullSafeEval(input: Any): Any = eval(null)
  override protected def withNewChildInternal(newChild: Expression): TypeOfDatabend =
    copy(child = newChild)
}

object DatetimeSemantics {

  /** reference types.rs sql_name(): top-level spellings */
  def sqlName(dt: DataType, nullable: Boolean): String = {
    val base = dt match {
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case StringType => "VARCHAR"
      case d: DecimalType => s"DECIMAL(${d.precision}, ${d.scale})"
      case _ => displayName(dt).toUpperCase
    }
    if (nullable) base + " NULL" else base
  }

  /** reference utils/display.rs Display for DataType (nested
    * positions keep the Int32-style names; sql_name uppercases the
    * whole rendering)
    */
  private def displayName(dt: DataType): String = dt match {
    case BooleanType => "Boolean"
    case BinaryType => "Binary"
    case StringType => "String"
    case ByteType => "Int8"
    case ShortType => "Int16"
    case IntegerType => "Int32"
    case LongType => "Int64"
    case FloatType => "Float32"
    case DoubleType => "Float64"
    case d: DecimalType => s"Decimal(${d.precision}, ${d.scale})"
    case TimestampType => "Timestamp"
    case DateType => "Date"
    case NullType => "NULL"
    case ArrayType(e, n) => s"Array(${nested(e, n)})"
    case MapType(k, v, n) => s"Map(${nested(k, nullable = false)}, ${nested(v, n)})"
    case s: StructType =>
      s.fields.map(f => nested(f.dataType, f.nullable)).mkString("Tuple(", ", ", ")")
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "Interval"
    case other => other.simpleString
  }

  private def nested(dt: DataType, nullable: Boolean): String = {
    val s = displayName(dt)
    if (nullable) s + " NULL" else s
  }

  private val TsRe = ("""^(\d{1,4})-(\d{1,2})-(\d{1,2})""" +
    """(?:[ T](\d{1,2})?(?::(\d{1,2})?(?::(\d{1,2})?(?:\.(\d{1,9}))?)?)?)?""" +
    """(Z|[+-]\d{2}:?\d{2})?$""").r

  /** permissive ISO-ish parse to epoch micros (see
    * DatabendStringToTimestamp); returns None on no-match or
    * out-of-range fields
    */
  def parseTimestampMicros(s: String): Option[Long] = s match {
    case TsRe(y, mo, d, h, mi, se, frac, off) =>
      try {
        def i(x: String, dflt: Int = 0) = if (x == null) dflt else x.toInt
        val micros =
          if (frac == null) 0
          else (frac.padTo(6, '0').take(6)).toInt
        val zone = off match {
          case null | "Z" => java.time.ZoneOffset.UTC
          case o =>
            val norm = if (o.contains(":")) o else o.take(3) + ":" + o.drop(3)
            java.time.ZoneOffset.of(norm)
        }
        val ldt = java.time.LocalDateTime.of(
          i(y), i(mo), i(d), i(h), i(mi), i(se), micros * 1000)
        Some(ldt.toInstant(zone).getEpochSecond * 1000000L +
          ldt.getNano / 1000L)
      } catch { case _: Exception => None }
    case _ => None
  }

  private def parseToDate2(a: Seq[Expression]): Expression =
    new ParseToDate(a.head, a(1))
  private def parseToTs2(a: Seq[Expression]): Expression =
    new ParseToTimestamp(a.head, a(1))

  /** Oracle/databend TRUNC(x, unit): unit spellings from the
    * reference's datetime.rs trunc tier (IW = ISO week, HH24 = hour,
    * MI = minute...); day-or-coarser units yield DATE, finer yield
    * TIMESTAMP. A bare-identifier unit (`trunc(x, week)`) is databend
    * grammar — accept it as the unit name.
    */
  private def truncBuilder(a: Seq[Expression]): Expression = {
    val unitStr = a(1) match {
      case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(parts) =>
        Some(parts.last)
      case Literal(v, StringType) if v != null => Some(v.toString)
      case _ => None
    }
    unitStr.map(_.toLowerCase) match {
      case Some(u @ ("year" | "yyyy" | "yy" | "quarter" | "q" | "month" |
                     "mon" | "mm" | "week" | "iw" | "isoweek")) =>
        val fmt = u match {
          case "q" => "quarter"
          case "iw" | "isoweek" => "week"
          case other => other
        }
        TruncDate(Cast(a.head, DateType), Literal(fmt))
      case Some("day" | "dd" | "dy") => Cast(a.head, DateType)
      case Some(u) =>
        val fmt = u match {
          case "hh24" | "hh" => "hour"
          case "mi" => "minute"
          case "ss" => "second"
          case other => other
        }
        TruncTimestamp(Literal(fmt), Cast(a.head, TimestampType))
      case None => TruncDate(Cast(a.head, DateType), a(1))
    }
  }

  /** CURRENT_TIME([p]) — the reference renders a VARCHAR time-of-day
    * (types.rs has no TIME type; ast maps it to a string render)
    */
  private def currentTimeBuilder(a: Seq[Expression]): Expression = {
    val digits = a.headOption.collect {
      case Literal(v, _) if v != null => v.toString.toInt
    }.getOrElse(6)
    val pattern = if (digits <= 0) "HH:mm:ss" else "HH:mm:ss." + ("S" * digits)
    DateFormatClass(CurrentTimestamp(), Literal(pattern))
  }

  /** expression-tier registrations for this module */
  val rewrites: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "typeof" -> (a => TypeOfDatabend(a.head)),
    "trunc" -> (a => if (a.length == 2) truncBuilder(a)
                     else TruncDate(Cast(a.head, DateType), Literal("mm"))),
    "current_time" -> currentTimeBuilder,
    "graft_current_time" -> currentTimeBuilder,
    // 1-arg to_date/to_timestamp carry the reference's numeric and
    // permissive-string semantics; 2-arg keeps Spark's format parse
    "to_date" -> (a =>
      if (a.length == 1) ToDateMarker(a.head, tryMode = false) else parseToDate2(a)),
    "try_to_date" -> (a =>
      if (a.length == 1) ToDateMarker(a.head, tryMode = true)
      else TryEval(parseToDate2(a))),
    "to_timestamp" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = false) else parseToTs2(a)),
    "to_datetime" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = false) else parseToTs2(a)),
    "try_to_timestamp" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = true)
      else TryEval(parseToTs2(a))),
    "try_to_datetime" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = true)
      else TryEval(parseToTs2(a)))
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((name, builder) <- rewrites)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    // the coercion rule needs the analyzer; sessions built by
    // GraftSession get it via withExtensions — this path covers
    // externally-created sessions where only function registration ran
    if (!spark.sessionState.analyzer.extendedResolutionRules
          .exists(_.isInstanceOf[DatetimeCoercionRule])) {
      // no public post-hoc injection point for resolution rules;
      // GraftSession.apply wires it at build time instead
      ()
    }
  }
}
