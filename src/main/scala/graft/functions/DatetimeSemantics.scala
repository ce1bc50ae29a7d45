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

  // reference parser-mode settings (settings_default.rs:1233-1246),
  // read at analysis time under the databend setting names — a plain
  // `SET enable_...=0` lands in SQLConf via spark.sql, and GraftSql's
  // per-statement SETTINGS(...) prefix sets/restores the same keys
  private def strictParser: Boolean =
    spark.conf.get("enable_strict_datetime_parser", "1").trim != "0"
  private def autoDetect: Boolean =
    spark.conf.get("enable_auto_detect_datetime_format", "0").trim == "1"
  private def sessionZone: String =
    spark.conf.get("spark.sql.session.timeZone", "UTC")

  private def isIntegral(e: Expression): Boolean = e.resolved && (e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  })

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** reference auto_detect_datetime.rs:68 int64_to_timestamp; an
    * out-of-range micros value becomes TIMESTAMP_MIN (types/
    * timestamp.rs clamp_timestamp: "If timestamp is invalid convert
    * to TIMESTAMP_MIN")
    */
  private def magnitudeTimestamp(n0: Expression): Expression = {
    val n = asLong(n0)
    val secBound = Literal(31536000000L)
    val msBound = Literal(31536000000000L)
    def within(b: Literal) =
      And(GreaterThan(n, UnaryMinus(b)), LessThan(n, b))
    val inRange = And(GreaterThanOrEqual(n, Literal(-62135596800000000L)),
      LessThanOrEqual(n, Literal(253402300799999999L)))
    val clamped = CaseWhen(Seq(inRange -> n),
      Some(Literal(-62135596800000000L)))
    CaseWhen(
      Seq(within(secBound) -> SecondsToTimestamp(n),
          within(msBound) -> MillisToTimestamp(n)),
      Some(MicrosToTimestamp(clamped)))
  }

  /** reference types/date.rs clamp_date: an out-of-range day count
    * becomes DATE_MIN (0001-01-01) — in BOTH directions, not a
    * saturating clamp
    */
  private def clampedDays(e: Expression): Expression = {
    val d = asLong(e)
    val inRange = And(GreaterThanOrEqual(d, Literal(-719162L)),
      LessThanOrEqual(d, Literal(2932896L)))
    Cast(CaseWhen(Seq(inRange -> d), Some(Literal(-719162L))), IntegerType)
  }

  /** clamp_timestamp: an out-of-range micros value becomes
    * TIMESTAMP_MIN (types/timestamp.rs:54-58)
    */
  private def clampTsMin(e: Expression): Expression = {
    val inRange = And(GreaterThanOrEqual(e, Literal(-62135596800000000L)),
      LessThanOrEqual(e, Literal(253402300799999999L)))
    CaseWhen(Seq(inRange -> e), Some(Literal(-62135596800000000L)))
  }

  /** saturating day clamp (jiff civil-date arithmetic bounds) for the
    * add_/subtract_ family — unlike clamp_date, overshoot lands on
    * the NEAR bound (add_days('9999-12-30', 5) saturates at
    * 9999-12-31, not DATE_MIN)
    */
  private def satDays(e: Expression): Expression =
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
          case StringType => DatabendStringToDate(c, failOnError = !tryMode,
            strict = strictParser, auto = autoDetect)
          case _ => Cast(c, DateType)
        }
        case ToTimestampMarker(c, tryMode) if c.resolved => c.dataType match {
          case ByteType | ShortType | IntegerType | LongType => magnitudeTimestamp(c)
          case StringType => DatabendStringToTimestamp(c, failOnError = !tryMode,
            strict = strictParser, auto = autoDetect, zoneId = sessionZone)
          case _ => Cast(c, TimestampType)
        }
        case ToTimestampScaleMarker(c, scale) if c.resolved => c.dataType match {
          case ByteType | ShortType | IntegerType | LongType =>
            val factor = math.pow(10, 6 - scale).toLong
            val n = asLong(c)
            val inRange = And(
              GreaterThanOrEqual(n, Literal(-62135596800000000L / factor)),
              LessThanOrEqual(n, Literal(253402300799999999L / factor)))
            MicrosToTimestamp(CaseWhen(
              Seq(inRange -> Multiply(n, Literal(factor))),
              Some(Literal(-62135596800000000L))))
          case _ =>
            new ParseToTimestamp(c, Literal(scale.toString))
        }
        // VARIANT -> DATE/TIMESTAMP under auto-detect routes through
        // the mode-aware parser (settings desc: auto_detect "works
        // across functions, COPY, and VARIANT cast"); default stays
        // Spark's native variant cast
        case Cast(child, DateType, _, _)
            if child.resolved && child.dataType == VariantType && autoDetect =>
          DatabendStringToDate(
            StringTrim(Cast(child, StringType), Literal("\"")),
            failOnError = true, strict = strictParser, auto = true)
        case Cast(child, TimestampType, _, _)
            if child.resolved && child.dataType == VariantType && autoDetect =>
          DatabendStringToTimestamp(
            StringTrim(Cast(child, StringType), Literal("\"")),
            failOnError = true, strict = strictParser, auto = true,
            zoneId = sessionZone)
        // add_/subtract_<unit> family (DtAddMarker scaladoc): result
        // type follows input type; month tier snaps end-of-month;
        // everything clamps to the reference's domain bounds
        case m @ DtAddMarker(x, delta, unit, snap) if x.resolved && delta.resolved =>
          val isTs = x.dataType == TimestampType
          def clampTs(e: Expression): Expression =
            Greatest(Seq(Least(Seq(e, Literal(253402207200000000L))),
              Literal(-62135596800000000L)))
          def dayMicros(days: Expression): Expression =
            Multiply(Cast(days, LongType), Literal(86400000000L))
          // pre-clamp the delta so the unit multiply can't overflow
          // Long under ANSI (the result saturates at the domain bound
          // either way — jiff saturating_add semantics)
          def boundedDelta(bound: Long): Expression =
            Greatest(Seq(Least(Seq(delta, Literal(bound))), Literal(-bound)))
          // a delta beyond the jiff Span unit limit fails Span
          // construction in the reference, and the error path clamps
          // to the MINIMUM (clamp_timestamp/clamp_date) — unlike
          // in-range overshoot, which saturates at the NEAR bound
          def spanGuard(limit: Long, minResult: Expression,
                        computed: Expression): Expression =
            CaseWhen(
              Seq((GreaterThan(Abs(delta), Literal(limit)), minResult)),
              Some(computed))
          val minTs = MicrosToTimestamp(Literal(-62135596800000000L))
          val minDate = DateFromUnixDate(Literal(-719162))
          unit match {
            case "month" =>
              def snapAdd(d: Expression): Expression = {
                val mInt = Cast(boundedDelta(240000L), IntegerType)
                if (!snap) AddMonths(d, mInt)
                else CaseWhen(
                  Seq((EqualTo(DayOfMonth(d), DayOfMonth(LastDay(d))),
                    LastDay(AddMonths(d, mInt)))),
                  Some(AddMonths(d, mInt)))
              }
              if (isTs) {
                val dpart = Cast(x, DateType)
                val tod = Subtract(UnixMicros(x), dayMicros(UnixDate(dpart)))
                spanGuard(239976L, minTs, MicrosToTimestamp(clampTs(
                  Add(dayMicros(UnixDate(snapAdd(dpart))), tod))))
              } else
                spanGuard(239976L, minDate,
                  DateFromUnixDate(satDays(UnixDate(snapAdd(Cast(x, DateType))))))
            case "day" =>
              if (isTs)
                spanGuard(7304484L, minTs, MicrosToTimestamp(clampTs(
                  Add(UnixMicros(x),
                    Multiply(boundedDelta(40000000L), Literal(86400000000L))))))
              else
                spanGuard(7304484L, minDate, DateFromUnixDate(satDays(
                  Add(Cast(UnixDate(Cast(x, DateType)), LongType), delta))))
            case _ => // "second": always a timestamp result
              val base = if (isTs) x else Cast(Cast(x, DateType), TimestampType)
              spanGuard(631107417600L, minTs, MicrosToTimestamp(clampTs(
                Add(UnixMicros(base),
                  Multiply(boundedDelta(3200000000000L), Literal(1000000L))))))
          }
        // Strptime gets the session zone at resolution time
        case st: Strptime if st.zoneId == null =>
          st.copy(zoneId = sessionZone)
        // string -> TIMESTAMP/DATE casts carry the reference's parse
        // semantics (permissive components, jiff domain errors,
        // parser-mode settings). Both expressions fold when the child
        // does, so literal comparisons still reach PushedFilters.
        case Cast(child, TimestampType, _, mode)
            if child.resolved && child.dataType == StringType =>
          DatabendStringToTimestamp(child,
            failOnError = mode != EvalMode.TRY,
            strict = strictParser, auto = autoDetect, zoneId = sessionZone)
        case Cast(child, DateType, _, mode)
            if child.resolved && child.dataType == StringType =>
          DatabendStringToDate(child, failOnError = mode != EvalMode.TRY,
            strict = strictParser, auto = autoDetect)
        // array<string> -> array<DATE/TIMESTAMP>: element-wise through
        // the reference parser (Spark's native cast would accept
        // 5-digit years the reference rejects with 1006)
        case Cast(child, ArrayType(DateType, _), _, mode)
            if child.resolved && (child.dataType match {
              case ArrayType(StringType, _) => true
              case _ => false
            }) =>
          val v = UnresolvedNamedLambdaVariable(Seq("__dtc"))
          ArrayTransform(child, LambdaFunction(
            DatabendStringToDate(v, failOnError = mode != EvalMode.TRY,
              strict = strictParser, auto = autoDetect), Seq(v)))
        case Cast(child, ArrayType(TimestampType, _), _, mode)
            if child.resolved && (child.dataType match {
              case ArrayType(StringType, _) => true
              case _ => false
            }) =>
          val v = UnresolvedNamedLambdaVariable(Seq("__dtc"))
          ArrayTransform(child, LambdaFunction(
            DatabendStringToTimestamp(v, failOnError = mode != EvalMode.TRY,
              strict = strictParser, auto = autoDetect,
              zoneId = sessionZone), Seq(v)))
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
        // (shift results clamp_timestamp: invalid -> TIMESTAMP_MIN)
        case s @ SubtractTimestamps(l, r, _, _) if s.childrenResolved =>
          if (isIntegral(r))
            MicrosToTimestamp(clampTsMin(Subtract(UnixMicros(l), asLong(r))))
          else if (isIntegral(l))
            MicrosToTimestamp(clampTsMin(Subtract(asLong(l), UnixMicros(r))))
          else Subtract(UnixMicros(l), UnixMicros(r))
        // ts + int (either side) -> ts shifted by micros
        case a @ Add(l, r, _) if a.childrenResolved &&
            l.dataType == TimestampType && isIntegral(r) =>
          MicrosToTimestamp(clampTsMin(Add(UnixMicros(l), asLong(r))))
        case a @ Add(l, r, _) if a.childrenResolved &&
            r.dataType == TimestampType && isIntegral(l) =>
          MicrosToTimestamp(clampTsMin(Add(asLong(l), UnixMicros(r))))
        // date_trunc(day-or-coarser, <string>) renders as DATE in the
        // reference (the string binds to the date overload); over
        // typed timestamp columns the TIMESTAMP result stands
        case TruncTimestamp(fl @ Literal(fmt, StringType), c, _)
            if fmt != null && c.resolved && (c match {
              // string input binds to the date overload; DATE input
              // keeps its DATE rendering on day-or-coarser units.
              // (The string case may already have been rewritten to
              // the DatabendStringToTimestamp parse.)
              case Cast(s, TimestampType, _, _) =>
                s.dataType == StringType || s.dataType == DateType
              case d: DatabendStringToTimestamp => true
              case _ => false
            }) && Set("day", "dd", "week", "month", "mon", "mm",
                      "quarter", "year", "yyyy", "yy")(fmt.toString.toLowerCase) =>
          val inner = c match {
            case cc: Cast => cc.child
            case other => other
          }
          if (Set("day", "dd")(fmt.toString.toLowerCase)) Cast(inner, DateType)
          else TruncDate(Cast(inner, DateType), fl)
        // date ± BIG literal int lands on clamp_date (types/date.rs:
        // out-of-range day counts become DATE_MIN). Small/unknown
        // deltas keep the native operators (the engine's own
        // rounders like to_start_of_week may legitimately step just
        // below DATE_MIN — the reference renders 0000-12-31 there);
        // Int64 deltas narrow to the INT Spark's builtins require.
        case DateAdd(d, delta @ Literal(v: Number, _))
            if d.resolved && math.abs(v.longValue) > 5865846L =>
          val dl = Greatest(Seq(Least(Seq(asLong(delta),
            Literal(4000000000L))), Literal(-4000000000L)))
          DateFromUnixDate(clampedDays(Add(Cast(UnixDate(d), LongType), dl)))
        case DateSub(d, delta @ Literal(v: Number, _))
            if d.resolved && math.abs(v.longValue) > 5865846L =>
          val dl = Greatest(Seq(Least(Seq(asLong(delta),
            Literal(4000000000L))), Literal(-4000000000L)))
          DateFromUnixDate(clampedDays(Subtract(Cast(UnixDate(d), LongType), dl)))
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

/** to_timestamp(n, scale) with a numeric first argument: n counts
  * 10^-scale-second ticks (scale 0 = seconds ... 6 = micros). A
  * STRING first argument falls back to the format-parse form.
  */
case class ToTimestampScaleMarker(child: Expression, scale: Int)
    extends UnaryExpression with Unevaluable {
  override def dataType: DataType = TimestampType
  override lazy val resolved: Boolean = false
  override protected def withNewChildInternal(newChild: Expression): ToTimestampScaleMarker =
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
case class DatabendStringToTimestamp(child: Expression, failOnError: Boolean,
    strict: Boolean = true, auto: Boolean = false, zoneId: String = "UTC")
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  @transient private lazy val zone = java.time.ZoneId.of(zoneId)
  override def nullSafeEval(input: Any): Any = {
    val s0 = input.toString.trim
    // MySQL-lineage zero date maps to the epoch (insert_into_values
    // golden: '0000-00-00 00:00:00' -> 1970-01-01 00:00:00)
    val s = if (s0.startsWith("0000-00-00")) "1970-01-01" + s0.drop(10) else s0
    DatetimeSemantics.parseTimestampMicrosTs(s, strict, auto, zone) match {
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
case class DatabendStringToDate(child: Expression, failOnError: Boolean,
    strict: Boolean = true, auto: Boolean = false, zoneId: String = "UTC")
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  @transient private lazy val zone = java.time.ZoneId.of(zoneId)
  override def nullSafeEval(input: Any): Any = {
    val s1 = input.toString.trim
    // MySQL-lineage zero date maps to the epoch
    val s = if (s1.startsWith("0000-00-00")) "1970-01-01" + s1.drop(10) else s1
    // a purely numeric string under auto-detect follows to_date(int):
    // DAYS since epoch with the MIN-on-invalid clamp
    if (auto && s.matches("[+-]?\\d+")) {
      val days = try s.toLong catch { case _: Exception => Long.MaxValue }
      return (if (days >= -719162L && days <= 2932896L) days.toInt
              else -719162).asInstanceOf[Any]
    }
    DatetimeSemantics.parseTimestampMicrosMode(s, strict, auto, zone)
      .map(us => java.lang.Math.floorDiv(us, 86400000000L))
      .filter(d => d >= -719162L && d <= 2932896L) match {
      case Some(days) => days.toInt
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
    """(?:[ T](\d{1,2})?(?::(\d{1,2})?(?::(\d{1,2})?(?:\.(\d{1,9})\d*)?)?)?)?""" +
    """\s*(Z|[+-]\d{2}(?::?\d{2})?)?$""").r

  /** permissive ISO-ish parse to epoch micros (see
    * DatabendStringToTimestamp); returns None on no-match or
    * out-of-range fields
    */
  def parseTimestampMicros(s: String): Option[Long] =
    parseTimestampMicrosMode(s, strict = false, auto = false)

  private def zoneOf(off: String): java.time.ZoneOffset = off match {
    case null | "Z" => java.time.ZoneOffset.UTC
    case o =>
      // accept +HH (hour-only), +HHMM and +HH:MM
      val norm =
        if (o.contains(":")) o
        else if (o.length == 3) o + ":00"
        else o.take(3) + ":" + o.drop(3)
      java.time.ZoneOffset.of(norm)
  }

  private def toMicros(y: Int, mo: Int, d: Int, h: Int, mi: Int, se: Int,
      fracStr: String, off: String,
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Option[Long] =
    toMicrosOffset(y, mo, d, h, mi, se, fracStr, off, zone).map(_._1)

  /** (utc micros, offset minutes at that instant); a missing explicit
    * offset resolves through `zone` (the session timezone)
    */
  private def toMicrosOffset(y: Int, mo: Int, d: Int, h: Int, mi: Int, se: Int,
      fracStr: String, off: String, zone: java.time.ZoneId)
      : Option[(Long, Int)] =
    try {
      val micros =
        if (fracStr == null) 0 else fracStr.padTo(6, '0').take(6).toInt
      val ldt = java.time.LocalDateTime.of(y, mo, d, h, mi, se, micros * 1000)
      val zdt =
        if (off == null) ldt.atZone(zone)
        else ldt.atZone(zoneOf(off))
      val inst = zdt.toInstant
      Some((inst.getEpochSecond * 1000000L + inst.getNano / 1000L,
        zdt.getOffset.getTotalSeconds / 60))
    } catch { case _: Exception => None }

  private val MonthNum: Map[String, Int] = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)

  // auto-detect formats (reference auto_detect_datetime.rs; suite
  // 02_0012_function_datetimes_auto_detect.test)
  private val TimeTail =
    """(?:[ T](\d{1,2}):(\d{1,2})(?::(\d{1,2})(?:\.(\d{1,9})\d*)?)?\s*(Z|[+-]\d{2}:?\d{2})?)?"""
  private val MonDashRe = ("""^(\d{1,2})-([A-Za-z]{3})-(\d{4})""" + TimeTail + "$").r
  private val SlashRe = ("""^(\d{1,2})/(\d{1,2})/(\d{4})""" + TimeTail + "$").r
  private val YSlashRe = ("""^(\d{4})/(\d{1,2})/(\d{1,2})""" + TimeTail + "$").r
  private val Rfc2822Re = ("""^(?:[A-Za-z]{3},\s+)?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{4})""" +
    """\s+(\d{1,2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9})\d*)?)?""" +
    """(?:\s+([AaPp][Mm]))?(?:\s+(Z|[+-]\d{2}:?\d{2}|[+-]\d{4}))?$""").r
  private val UnixDateRe = ("""^[A-Za-z]{3}\s+([A-Za-z]{3})\s+(\d{1,2})""" +
    """\s+(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,9})\d*)?""" +
    """\s+(Z|[+-]\d{2}:?\d{2}|[+-]\d{4})\s+(\d{4})$""").r

  private def norm4(off: String): String =
    if (off != null && off.matches("[+-]\\d{4}")) off.take(3) + ":" + off.drop(3)
    else off

  private def i(x: String, dflt: Int = 0): Int =
    if (x == null) dflt else x.toInt

  private def applyAmPm(h: Int, ampm: String): Int =
    if (ampm == null) h
    else if (ampm.toLowerCase == "pm") { if (h == 12) 12 else h + 12 }
    else { if (h == 12) 0 else h }

  private val MonCommaRe = ("""^([A-Za-z]{3})\s+(\d{1,2}),\s*(\d{4})""" +
    TimeTail + "$").r

  private def parseAutoFormats(s: String,
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Option[Long] =
    parseAutoOffset(s, zone).map(_._1)

  /** auto-format parse yielding (utc micros, effective offset
    * minutes) — the TIMESTAMP_TZ tier keeps the offset
    */
  def parseAutoOffset(s: String, zone: java.time.ZoneId): Option[(Long, Int)] =
    s match {
      case MonDashRe(d, mon, y, h, mi, se, frac, off) =>
        MonthNum.get(mon.toLowerCase).flatMap(m =>
          toMicrosOffset(y.toInt, m, d.toInt, i(h), i(mi), i(se), frac, off, zone))
      case YSlashRe(y, m, d, h, mi, se, frac, off) if m.toInt <= 12 =>
        toMicrosOffset(y.toInt, m.toInt, d.toInt, i(h), i(mi), i(se), frac, off, zone)
      case SlashRe(m, d, y, h, mi, se, frac, off) if m.toInt <= 12 =>
        toMicrosOffset(y.toInt, m.toInt, d.toInt, i(h), i(mi), i(se), frac, off, zone)
      // day-first disambiguation when the first field can't be a month
      // (reference auto_detect tries DD/MM when MM/DD is invalid)
      case SlashRe(d, m, y, h, mi, se, frac, off) if d.toInt > 12 && m.toInt <= 12 =>
        toMicrosOffset(y.toInt, m.toInt, d.toInt, i(h), i(mi), i(se), frac, off, zone)
      case MonCommaRe(mon, d, y, h, mi, se, frac, off) =>
        MonthNum.get(mon.toLowerCase).flatMap(m =>
          toMicrosOffset(y.toInt, m, d.toInt, i(h), i(mi), i(se), frac, off, zone))
      case Rfc2822Re(d, mon, y, h, mi, se, frac, ampm, off) =>
        MonthNum.get(mon.toLowerCase).flatMap(m =>
          toMicrosOffset(y.toInt, m, d.toInt, applyAmPm(h.toInt, ampm), mi.toInt,
            i(se), frac, norm4(off), zone))
      case UnixDateRe(mon, d, h, mi, se, frac, off, y) =>
        MonthNum.get(mon.toLowerCase).flatMap(m =>
          toMicrosOffset(y.toInt, m, d.toInt, h.toInt, mi.toInt, se.toInt, frac,
            norm4(off), zone))
      case _ => None
    }

  /** epoch-number detection for timestamp strings (Snowflake
    * semantics; reference int64_to_timestamp magnitude rules)
    */
  private def epochMicros(n: Long): Long = {
    val micros =
      if (n > -31536000000L && n < 31536000000L) n * 1000000L
      else if (n > -31536000000000L && n < 31536000000000L) n * 1000L
      else n
    if (micros >= -62135596800000000L && micros <= 253402300799999999L) micros
    else -62135596800000000L
  }

  /** mode-aware parse (reference settings enable_strict_datetime_parser
    * / enable_auto_detect_datetime_format): strict ISO requires
    * 2-digit month/day; auto (or non-strict) adds DD-MON-YYYY,
    * MM/DD/YYYY, Mon DD YYYY, RFC 2822, Unix-date; auto adds epoch
    * numbers and the non-strict dtparse tier reads compact
    * yyyymmdd[hhmmss] digit strings as civil datetimes
    */
  def parseTimestampMicrosMode(s: String, strict: Boolean, auto: Boolean,
      zone: java.time.ZoneId = java.time.ZoneOffset.UTC): Option[Long] = {
    if (auto && s.matches("[+-]?\\d{5,}"))
      return try Some(epochMicros(s.toLong)) catch { case _: Exception => None }
    if (!strict && !auto && s.matches("\\d{8}"))
      return toMicros(s.substring(0, 4).toInt, s.substring(4, 6).toInt,
        s.substring(6, 8).toInt, 0, 0, 0, null, null, zone)
    if (!strict && !auto && s.matches("\\d{14}"))
      return toMicros(s.substring(0, 4).toInt, s.substring(4, 6).toInt,
        s.substring(6, 8).toInt, s.substring(8, 10).toInt,
        s.substring(10, 12).toInt, s.substring(12, 14).toInt, null, null, zone)
    val iso = s match {
      case TsRe(y, mo, d, h, mi, se, frac, off) =>
        if (strict && !auto && (mo.length < 2 || d.length < 2)) None
        else toMicros(i(y), i(mo), i(d), i(h), i(mi), i(se), frac, off, zone)
      case _ => None
    }
    iso.orElse(if (auto || !strict) parseAutoFormats(s, zone) else None)
  }

  /** TIMESTAMP-domain parse: the jiff Timestamp range is narrower
    * than DATE's — values past 9999-12-30T22:00:00Z are a parse
    * ERROR (to_datetime('9999-12-31 ...') is error 1046), while
    * to_date('9999-12-31') is fine
    */
  def parseTimestampMicrosTs(s: String, strict: Boolean, auto: Boolean,
      zone: java.time.ZoneId): Option[Long] =
    parseTimestampMicrosMode(s, strict, auto, zone)
      .filter(us => us >= -62135596800000000L && us <= 253402207200000000L)

  private def parseToDate2(a: Seq[Expression]): Expression = a(1) match {
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
        if s != null =>
      Strptime(a.head, GraftFunctions.pgToStrftime(s.toString),
        forDate = true, zoneId = null)
    case _ => new ParseToDate(a.head, a(1))
  }
  private def parseToTs2(a: Seq[Expression]): Expression = a(1) match {
    // the reference yields NULL for an empty format string
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
        if s != null && s.toString.isEmpty =>
      Literal(null, TimestampType)
    case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType)
        if s != null =>
      Strptime(a.head, GraftFunctions.pgToStrftime(s.toString),
        forDate = false, zoneId = null)
    case _ => new ParseToTimestamp(a.head, a(1))
  }

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
      case Some(u @ ("year" | "yyyy" | "yy" | "y" | "quarter" | "q" | "month" |
                     "mon" | "mm" | "week" | "iw" | "isoweek")) =>
        val fmt = u match {
          case "q" => "quarter"
          case "y" => "year"
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
  // (TruncDispatch lives at file scope below)
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
    // TRUNC is overloaded in the reference: TRUNC(number[, digits])
    // truncates toward zero (math.rs truncate), TRUNC(date[, unit])
    // truncates the date. A numeric/absent second arg dispatches on
    // the first arg's RESOLVED type (TruncDispatch); a unit keyword
    // or string goes straight to the date tier.
    "trunc" -> (a =>
      if (a.length == 2 && (a(1) match {
        case org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(_) => true
        case Literal(v, StringType) if v != null => true
        case _ => false
      })) truncBuilder(a)
      else TruncDispatch(a.head,
        if (a.length > 1) Cast(a(1), IntegerType) else Literal(0))),
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
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = false)
      else a(1) match {
        // to_timestamp(n, scale): n expressed at 10^-scale seconds
        // (reference datetime.rs number->timestamp scaled tier)
        case Literal(s, t) if s != null &&
            Seq(ByteType, ShortType, IntegerType, LongType).contains(t) &&
            s.toString.toLong >= 0 && s.toString.toLong <= 9 =>
          ToTimestampScaleMarker(a.head, s.toString.toInt)
        case _ => parseToTs2(a)
      }),
    "to_datetime" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = false) else parseToTs2(a)),
    "try_to_timestamp" -> (a =>
      if (a.length == 1) ToTimestampMarker(a.head, tryMode = true)
      else a(1) match {
        case Literal(null, _) => Literal(null, TimestampType)
        case Literal(s, t) if s != null &&
            Seq(ByteType, ShortType, IntegerType, LongType).contains(t) &&
            s.toString.toLong >= 0 && s.toString.toLong <= 9 =>
          TryEval(ToTimestampScaleMarker(a.head, s.toString.toInt))
        case _ => TryEval(parseToTs2(a))
      }),
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

/** TRUNC(x[, d]) overload dispatch on the RESOLVED first-arg type:
  * numeric input truncates toward zero at scale d (reference math.rs
  * truncate — TRUNC(10.6) = 10, TRUNC(1.234, 2) = 1.23,
  * TRUNC(150.45, -2) = 100); anything else takes the date tier
  * (TRUNC(date) = month start, matching the registered 1-arg form).
  * Replacement is built from CONCRETE expressions only — the analyzer
  * never revisits a RuntimeReplaceable's lazily-built tree.
  */
case class TruncDispatch(x: Expression, d: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override def left: Expression = x
  override def right: Expression = d
  override lazy val replacement: Expression = x.dataType match {
    case _: NumericType =>
      val xd = Cast(x, DoubleType)
      val p = Pow(Literal(10.0), Cast(d, DoubleType))
      Multiply(
        new Signum(xd),
        Divide(Cast(Floor(Multiply(Abs(xd), p)), DoubleType), p))
    case _ => TruncDate(Cast(x, DateType), Literal("mm"))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TruncDispatch =
    copy(x = newLeft, d = newRight)
}

/** numeric time axis for window_funnel/sessionize tiers: DATE counts
  * DAYS, TIMESTAMP counts MICROSECONDS (the reference's own units for
  * the funnel window), everything else casts numerically. Concrete
  * replacement — the analyzer never revisits RuntimeReplaceable trees.
  */
case class NumifyTemporal(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    // UnixDate/UnixMicros, not casts: ANSI rejects date->int casts
    case DateType => Cast(UnixDate(child), DoubleType)
    case TimestampType => Cast(UnixMicros(child), DoubleType)
    case _ => Cast(child, DoubleType)
  }
  override protected def withNewChildInternal(newChild: Expression): NumifyTemporal =
    copy(child = newChild)
}
