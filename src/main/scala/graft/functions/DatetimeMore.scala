package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** The reference's generic unit-dispatched datetime tier (reference
  * src/query/functions/src/scalars/timestamp/src/datetime.rs and
  * src/query/ast interval kinds), exercised by the ported
  * query/functions/02_0012_function_datetimes* suites:
  *
  *  - `date_diff(unit, start, end)` — boundary-crossing count per
  *    unit (datetime.rs register_diff tier; ClickHouse-lineage
  *    semantics: truncate both operands to the unit grid, subtract).
  *    Lowered onto the diff_* family in [[MoreAliases]].
  *  - `date_between(unit, start, end)` — FULL elapsed units
  *    (anniversary semantics, EvalYearsImpl::eval_date_between):
  *    date_between('year', '2019-02-28 22:00:01', '2020-02-28
  *    22:00:00') = 0 — one second short of a full year. Exact via
  *    java.time ChronoUnit ([[DateBetween]], scalar tier).
  *  - `previous_day(d, monday)` / `next_day(d, friday)` — nearest
  *    strictly-before / strictly-after weekday (datetime.rs
  *    register_previous_next_day).
  *  - `last_day(d, week|month|quarter|year)` — end of the containing
  *    period (week ends Sunday: last_day('2024-10-22', week) =
  *    '2024-10-27').
  *  - `to_start_of_week(x[, mode])` — mode 0 (default) weeks start
  *    SUNDAY; any mode >= 1 starts Monday (its own slt vectors,
  *    02_0012 lines 600-645).
  *  - bare-identifier units (`date_trunc(week, x)`,
  *    `previous_day(d, monday)`): databend grammar treats the unit
  *    as a keyword; here it arrives as an UnresolvedAttribute and is
  *    literalized by the builder.
  *
  * Also hosts the lambda-HOF spellings (type_check/lambda.rs):
  * array_transform/array_apply/array_filter/array_reduce,
  * map_transform_keys/map_transform_values — direct lowerings onto
  * Spark's codegen'd higher-order functions — and the end-EXCLUSIVE
  * `range(start, end)` array constructor (srfs/range.rs).
  */
object DatetimeMore {

  private def f(name: String, args: Expression*): Expression =
    UnresolvedFunction(name, args.toSeq, isDistinct = false)
  private def cast(e: Expression, t: DataType): Expression = Cast(e, t)
  private def lambda(e: Expression): LambdaFunction = e match {
    case l: LambdaFunction => l
    case other => throw new IllegalArgumentException(
      s"expected a lambda argument, got ${other.sql}")
  }

  /** bare identifier or string literal -> lowercase unit name */
  private def unitName(e: Expression): Option[String] = e match {
    case UnresolvedAttribute(parts) if parts.length == 1 =>
      Some(parts.head.toLowerCase)
    case Literal(s, StringType) if s != null => Some(s.toString.toLowerCase)
    case _ => None
  }

  /** normalize unit spellings (plural, abbreviations) */
  private def canon(u: String): String = u match {
    case "years" | "yy" | "yyyy"            => "year"
    case "quarters" | "qq"                  => "quarter"
    case "months" | "mons" | "mon"          => "month"
    case "weeks" | "wk" | "ww"              => "week"
    case "yearweeks"                        => "yearweek"
    case "days" | "dd"                      => "day"
    case "hours" | "hh"                     => "hour"
    case "minutes" | "mi"                   => "minute"
    case "seconds" | "ss" | "sec"           => "second"
    case "milliseconds" | "ms"              => "millisecond"
    case "microseconds" | "us"              => "microsecond"
    case "millenniums" | "millennia"        => "millennium"
    case "centuries"                        => "century"
    case "decades"                          => "decade"
    case "isoyears"                         => "isoyear"
    case "isodows"                          => "isodow"
    case other                              => other
  }

  /** Sunday=1..Saturday=7, Spark dayofweek() numbering */
  private val weekdayNum = Map(
    "sunday" -> 1, "sun" -> 1, "monday" -> 2, "mon" -> 2,
    "tuesday" -> 3, "tue" -> 3, "wednesday" -> 4, "wed" -> 4,
    "thursday" -> 5, "thu" -> 5, "friday" -> 6, "fri" -> 6,
    "saturday" -> 7, "sat" -> 7)

  private def weekdayOf(e: Expression): Option[(String, Int)] =
    unitName(e).flatMap(n => weekdayNum.get(n).map(n -> _))

  /** date_diff unit -> the registered diff_* spelling (arg order is
    * (end, start) there; date_diff is (unit, start, end))
    */
  private val diffFn = Map(
    "year" -> "diff_years", "isoyear" -> "diff_isoyears",
    "quarter" -> "diff_quarters", "month" -> "diff_months",
    "week" -> "diff_weeks", "yearweek" -> "diff_yearweeks",
    "day" -> "diff_days", "dow" -> "diff_dows", "doy" -> "diff_doys",
    "isodow" -> "diff_isodows",
    "hour" -> "diff_hours", "minute" -> "diff_minutes",
    "second" -> "diff_seconds", "epoch" -> "diff_epochs",
    "millisecond" -> "diff_milliseconds",
    "microsecond" -> "diff_microseconds",
    "millennium" -> "diff_millenniums",
    "century" -> "diff_centuries", "decade" -> "diff_decades")

  private def badUnit(fn: String, e: Expression): Nothing =
    throw new IllegalArgumentException(
      s"$fn: unsupported unit ${unitName(e).getOrElse(e.sql)}")

  private def sundayStart(x: Expression): Expression =
    DateSub(cast(x, DateType),
      Pmod(Subtract(DayOfWeek(cast(x, DateType)), Literal(1)), Literal(7)))

  private def mondayStart(x: Expression): Expression =
    cast(f("date_trunc", Literal("week"), x), DateType)

  val rewrites: Map[String, Seq[Expression] => Expression] = Map(
    "date_diff" -> (a => {
      val u = unitName(a.head).map(canon).getOrElse(badUnit("date_diff", a.head))
      val target = diffFn.getOrElse(u, badUnit("date_diff", a.head))
      f(target, a(2), a(1))
    }),
    // DATEDIFF(unit, start, end) shares date_diff's boundary-counting
    // semantics (Spark's 3-arg datediff would be full-elapsed); the
    // 2-arg form stays Spark's day count
    "datediff" -> (a =>
      if (a.length == 3) {
        val u = unitName(a.head).map(canon).getOrElse(badUnit("datediff", a.head))
        val target = diffFn.getOrElse(u, badUnit("datediff", a.head))
        f(target, a(2), a(1))
      } else DateDiff(a.head, a(1))),
    "date_between" -> (a => {
      val u = unitName(a.head).map(canon).getOrElse(badUnit("date_between", a.head))
      DateBetween(u, cast(a(1), TimestampType), cast(a(2), TimestampType))
    }),
    "datebetween" -> (a => {
      val u = unitName(a.head).map(canon).getOrElse(badUnit("date_between", a.head))
      DateBetween(u, cast(a(1), TimestampType), cast(a(2), TimestampType))
    }),
    "previous_day" -> (a => weekdayOf(a(1)) match {
      case Some((_, wd)) =>
        DateSub(cast(a.head, DateType),
          Add(Pmod(Subtract(Add(DayOfWeek(cast(a.head, DateType)), Literal(6)),
            Literal(wd)), Literal(7)), Literal(1)))
      case None => badUnit("previous_day", a(1))
    }),
    "next_day" -> (a => weekdayOf(a(1)) match {
      case Some((name, _)) => NextDay(cast(a.head, DateType), Literal(name))
      case None => NextDay(cast(a.head, DateType), a(1))
    }),
    "last_day" -> (a =>
      if (a.length == 1) LastDay(cast(a.head, DateType))
      else unitName(a(1)).map(canon) match {
        case Some("week") =>
          DateAdd(mondayStart(a.head), Literal(6))
        case Some("month") | None => LastDay(cast(a.head, DateType))
        case Some("quarter") =>
          LastDay(f("add_months", f("date_trunc", Literal("quarter"), a.head),
            Literal(2)))
        case Some("year") =>
          f("make_date", f("year", a.head), Literal(12), Literal(31))
        case Some(_) => badUnit("last_day", a(1))
      }),
    "to_start_of_week" -> (a =>
      if (a.length == 1) sundayStart(a.head)
      else a(1) match {
        case Literal(v, _) if v != null && v.toString.toDouble == 0 =>
          sundayStart(a.head)
        case Literal(_, _) => mondayStart(a.head)
        case m => CaseWhen(
          Seq((EqualTo(cast(m, IntegerType), Literal(0)), sundayStart(a.head))),
          Some(mondayStart(a.head)))
      }),
    "date_trunc" -> (a => {
      // databend grammar allows a bare-keyword unit; literalize and
      // hand to Spark's builtin (the DatetimeCoercionRule renders
      // day-or-coarser truncation of DATE/string input as DATE)
      val u = unitName(a.head).map(canon).getOrElse(badUnit("date_trunc", a.head))
      TruncTimestamp(Literal(u), cast(a(1), TimestampType))
    }),
    // end-EXCLUSIVE integer range (reference srfs/range.rs; the SRF
    // form arrives here via unnest(range(..)))
    "range" -> (a => {
      val (start, end) = if (a.length == 1) (Literal(0L), a.head) else (a.head, a(1))
      val seq =
        if (a.length >= 3) f("sequence", start, Subtract(end, Literal(1)), a(2))
        else f("sequence", start, Subtract(end, Literal(1)))
      CaseWhen(Seq((LessThan(start, end), seq)),
        Some(Slice(f("sequence", start, start), Literal(1), Literal(0))))
    }),
    // lambda higher-order spellings (type_check/lambda.rs:186-330).
    // Built DIRECTLY (not via UnresolvedFunction): lambda arguments
    // only resolve once bound by a HigherOrderFunction, so an alias
    // indirection would never resolve.
    "array_transform" -> (a => ArrayTransform(a.head, lambda(a(1)))),
    "array_apply" -> (a => ArrayTransform(a.head, lambda(a(1)))),
    "array_filter" -> (a => ArrayFilter(a.head, lambda(a(1)))),
    // array_reduce folds left WITHOUT an init: seed = first element,
    // fold the rest (lambda.rs:330 return type = lambda result)
    "array_reduce" -> (a => ArrayAggregate(
      Slice(a.head, Literal(2), Greatest(Seq(
        Subtract(Size(a.head), Literal(1)), Literal(0)))),
      ElementAt(a.head, Literal(1)), lambda(a(1)),
      LambdaFunction.identity)),
    "map_transform_keys" -> (a => TransformKeys(a.head, lambda(a(1)))),
    "map_transform_values" -> (a => TransformValues(a.head, lambda(a(1)))),
    // DATEDIFF/DATE_DIFF with a unit keyword: Spark's parser lowers
    // these to TimestampDiff (full-elapsed) before the registry is
    // consulted — GraftSql reroutes the text onto this spelling
    "graft_date_diff" -> (a => {
      val u = unitName(a.head).map(canon).getOrElse(badUnit("date_diff", a.head))
      val target = diffFn.getOrElse(u, badUnit("date_diff", a.head))
      f(target, a(2), a(1))
    }),
    // to_unix_timestamp: reference accepts its permissive string tier
    // (offsets, partial components); Spark's builtin pattern-parses
    "to_unix_timestamp" -> (a =>
      if (a.length == 1)
        f("unix_seconds", ToTimestampMarker(a.head, tryMode = false))
      else f("unix_timestamp", a: _*)),
    // EXTRACT(EPOCH FROM x) and epoch(x): fractional seconds
    // (micros / 1e6 — the reference's epoch keeps sub-second parts)
    "graft_epoch" -> (a => Divide(
      Cast(f("unix_micros", Cast(a.head, TimestampType)), DoubleType),
      Literal(1000000.0))),
    "epoch" -> (a => Divide(
      Cast(f("unix_micros", Cast(a.head, TimestampType)), DoubleType),
      Literal(1000000.0))),
    // EXTRACT(DOW FROM x): Sunday=0..Saturday=6 (date_helper.rs
    // DayOfWeek; Spark's dayofweek is Sunday=1)
    "graft_dow" -> (a => Subtract(DayOfWeek(Cast(a.head, DateType)), Literal(1))),
    // months_between: DAY-granular fraction over 31-day months,
    // timestamps truncate to dates first (date_helper.rs
    // months_between/months_between_ts — Spark's builtin also weighs
    // the time-of-day, which the reference ignores)
    "months_between" -> (a =>
      MonthsBetweenDb(Cast(a.head, DateType), Cast(a(1), DateType)))
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((name, builder) <- rewrites)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}

/** Unresolved placeholder for the add_/subtract_<unit> family: the
  * result type follows the INPUT type (date in -> date out for
  * day-or-coarser units; sub-day units always produce timestamps),
  * which the function builder can't see — [[DatetimeCoercionRule]]
  * expands it once the child resolves.
  *
  * Reference semantics carried here (date_helper.rs):
  *  - eval_months_base: month-family adds SNAP an end-of-month input
  *    day to the end of the result month (2020-02-29 - 13 months =
  *    2019-01-31), otherwise clamp day to the result month's length;
  *  - results clamp to the DATE domain 0001-01-01..9999-12-31, and
  *    timestamp arithmetic SATURATES at the jiff Timestamp bounds the
  *    reference's own vectors encode (9999-12-30T22:00:00Z upper —
  *    jiff reserves a day of timezone slack below the civil max;
  *    add_days('9999-12-30 21:59:59', 1) = '9999-12-30 22:00:00').
  */
case class DtAddMarker(x: Expression, delta: Expression, unit: String,
    snap: Boolean = false)
    extends BinaryExpression with Unevaluable {
  override def left: Expression = x
  override def right: Expression = delta
  override def dataType: DataType = TimestampType
  override lazy val resolved: Boolean = false
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtAddMarker =
    copy(x = newLeft, delta = newRight)
}

/** databend months_between (date_helper.rs:763-793): whole-month diff
  * plus (day_a - day_b)/31, zero when days match or both dates are
  * month ends; time-of-day never participates.
  */
case class MonthsBetweenDb(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(a: Any, b: Any): Any = {
    val da = java.time.LocalDate.ofEpochDay(a.asInstanceOf[Int].toLong)
    val db = java.time.LocalDate.ofEpochDay(b.asInstanceOf[Int].toLong)
    val whole = (da.getYear - db.getYear) * 12L + (da.getMonthValue - db.getMonthValue)
    val sameDay = da.getDayOfMonth == db.getDayOfMonth
    val bothEom = da.getDayOfMonth == da.lengthOfMonth &&
      db.getDayOfMonth == db.lengthOfMonth
    val frac =
      if (sameDay || bothEom) 0.0
      else (da.getDayOfMonth - db.getDayOfMonth) / 31.0
    whole.toDouble + frac
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MonthsBetweenDb =
    copy(left = newLeft, right = newRight)
}

/** Exact full-elapsed-units interval count (reference
  * EvalYearsImpl/EvalMonthsImpl::eval_date_between, datetime.rs
  * :1820-2061): java.time ChronoUnit over micro-precision UTC
  * LocalDateTime. Scalar tier (CodegenFallback) — the unit is a
  * plan-time constant and the arithmetic is a few ns per row.
  */
case class DateBetween(unit: String, start: Expression, end: Expression)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = start
  override def right: Expression = end
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def ldt(micros: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)

  override def nullSafeEval(s: Any, e: Any): Any = {
    import java.time.temporal.ChronoUnit._
    val a = ldt(s.asInstanceOf[Long])
    val b = ldt(e.asInstanceOf[Long])
    unit match {
      case "year" | "isoyear" => YEARS.between(a, b)
      case "quarter"          => MONTHS.between(a, b) / 3
      case "month"            => MONTHS.between(a, b)
      case "week" | "yearweek" => WEEKS.between(a, b)
      case "day" | "dow" | "doy" | "isodow" => DAYS.between(a, b)
      case "hour"             => HOURS.between(a, b)
      case "minute"           => MINUTES.between(a, b)
      case "second" | "epoch" => SECONDS.between(a, b)
      case "millisecond"      => MILLIS.between(a, b)
      case "microsecond"      => MICROS.between(a, b)
      case "millennium"       => YEARS.between(a, b) / 1000
      case "century"          => YEARS.between(a, b) / 100
      case "decade"           => YEARS.between(a, b) / 10
      case other => throw new IllegalArgumentException(
        s"date_between: unsupported unit '$other'")
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DateBetween =
    copy(start = newLeft, end = newRight)
}
