package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.udf

/** Round-4 expansion of the databend-name surface (reference registry:
  * src/query/functions/tests/it/scalars/testdata/function_list.txt —
  * 486 origin names + 120 aliases). Everything here is a bind-time
  * rewrite onto Spark builtins (zero runtime cost, codegen'd) except a
  * handful of genuinely-new scalars (humanize_*, jaro_winkler, vector
  * distances) that are driver-registered UDFs, matching the
  * reference's own non-vectorized scalar tier.
  *
  * Intentionally NOT mapped (recorded in COVERAGE.md aliases section):
  * h3 family (needs an H3 library), st_ geometry/WKB family (geometry
  * engine out of scope v0), blake3 (hash port),
  * markov/feistel_obfuscate/sleep, tz-typed functions (no TIMESTAMP_TZ
  * parity). siphash/siphash64, city64withseed and time_slice were
  * later added in `MoreAliases2` (paper/golden-vector validated).
  */
object MoreAliases {

  private def f(name: String, as: Expression*): Expression =
    UnresolvedFunction(name, as.toSeq, isDistinct = false)
  /** Spark's BUILTIN function, resolved directly — required whenever a
    * registered rewrite's body calls the function name it is itself
    * registered under: an UnresolvedFunction of that name would resolve
    * back into this builder and the analyzer tree would grow without
    * converging (the ported unhex suite hung analysis this way).
    */
  private[functions] def builtinFn(name: String, as: Expression*): Expression =
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name))
      .getOrElse(sys.error(s"no builtin $name"))(as.toSeq)
  private def cast(e: Expression, t: DataType): Expression = Cast(e, t)
  private def tryCast(e: Expression, t: DataType): Expression =
    Cast(e, t, None, EvalMode.TRY)

  /** unsigned cast with range enforcement (functions.Types widening:
    * the widened signed type holds values the uN range excludes, so
    * out-of-range results become NULL — the reference's try_ behavior;
    * the non-try spelling shares it rather than erroring)
    */
  private def uintCast(t: DataType, max: Literal, tryMode: Boolean)
                      (a: Seq[Expression]): Expression = {
    val c = if (tryMode) tryCast(a.head, t) else cast(a.head, t)
    val zero = Cast(Literal(0), t)
    CaseWhen(Seq((And(GreaterThanOrEqual(c, zero), LessThanOrEqual(c, max)), c)), None)
  }

  /** plain 1:1 name aliases */
  val aliases: Seq[(String, String)] = Seq(
    "array_concat" -> "concat",
    "array_flatten" -> "flatten",
    "array_indexof" -> "array_position",
    "array_reverse" -> "reverse",
    "array_unique" -> "array_distinct",
    "array_to_string" -> "array_join",
    "json_array_except" -> "array_except",
    "json_array_insert" -> "array_insert",
    "json_array_intersection" -> "array_intersect",
    "json_array_overlap" -> "arrays_overlap",
    "map_cat" -> "map_concat",
    "map_size" -> "size",
    "unicode" -> "ascii",
    "to_last_of_month" -> "last_day",
    "bit_not" -> "bitwise_not",
    "bit_shift_left" -> "shiftleft",
    "bit_shift_right" -> "shiftright",
    "is_not_null" -> "isnotnull",
    "is_null" -> "isnull",
    "try_from_base64" -> "unbase64",
    // the bare names are strict (error on malformed); try_ stays NULL
    "try_inet_aton" -> "inet_aton_impl",
    "try_ipv4_string_to_num" -> "inet_aton_impl",
    "try_inet_ntoa" -> "inet_ntoa",
    "try_ipv4_num_to_string" -> "inet_ntoa",
    "strftime" -> "date_format")

  /** names needing argument/shape rewriting (bind-time, codegen'd) */
  val rewrites: Map[String, Seq[Expression] => Expression] = {

    // delta scaled to the DtAddMarker's base unit, as BIGINT; the
    // delta pre-clamps to ±1e15 so the scale multiply can't overflow
    // under ANSI (the marker saturates at the domain bounds anyway)
    def mulL(e: Expression, mult: Long): Expression = {
      val b = Literal(1000000000000000L)
      val clamped = f("greatest", f("least", cast(e, LongType), b), UnaryMinus(b))
      if (mult == 1L) clamped else Multiply(clamped, Literal(mult))
    }

    // ---- diff/between by unit: truncate each operand, then subtract
    // (reference date_helper.rs EvalTimesImpl) -------------------------
    def bySeconds(unit: Long)(args: Seq[Expression]): Expression = {
      def b(e: Expression) = cast(f("floor", Divide(
        f("unix_seconds", cast(e, TimestampType)), Literal(unit.toDouble))), LongType)
      Subtract(b(args.head), b(args(1)))
    }
    def byMicros(unit: Long)(args: Seq[Expression]): Expression = {
      def b(e: Expression) = cast(f("floor", Divide(
        f("unix_micros", cast(e, TimestampType)), Literal(unit.toDouble))), LongType)
      Subtract(b(args.head), b(args(1)))
    }
    def byYearsDiv(div: Int)(args: Seq[Expression]): Expression = {
      def b(e: Expression) = cast(f("floor", Divide(
        cast(f("year", e), DoubleType), Literal(div.toDouble))), LongType)
      Subtract(b(args.head), b(args(1)))
    }
    def byMonths(q: Int)(args: Seq[Expression]): Expression = {
      def ym(e: Expression) = Add(
        Multiply(f("year", e), Literal(12)), Subtract(f("month", e), Literal(1)))
      cast(Subtract(
        f("floor", Divide(cast(ym(args.head), DoubleType), Literal(q.toDouble))),
        f("floor", Divide(cast(ym(args(1)), DoubleType), Literal(q.toDouble)))), LongType)
    }
    def byWeeks(args: Seq[Expression]): Expression = {
      // week buckets aligned to the epoch Monday (1970-01-05 = day 4)
      def b(e: Expression) = cast(f("floor", Divide(
        cast(Subtract(f("datediff", e, Literal("1970-01-05")), Literal(0)), DoubleType),
        Literal(7.0))), LongType)
      Subtract(b(args.head), b(args(1)))
    }
    def byDays(args: Seq[Expression]): Expression =
      cast(f("datediff", args.head, args(1)), LongType)
    def byIsoYears(args: Seq[Expression]): Expression = {
      def b(e: Expression) = f("date_part", Literal("YEAROFWEEK"), e)
      cast(Subtract(b(args.head), b(args(1))), LongType)
    }

    // ---- interval constructors (reference to_days(n) = INTERVAL n DAY)
    def dtInterval(d: Expression = Literal(0), h: Expression = Literal(0),
                   m: Expression = Literal(0), s: Expression = Literal(0.0)): Expression =
      f("make_dt_interval", d, h, m, s)
    def ymInterval(y: Expression, m: Expression): Expression =
      f("make_ym_interval", y, m)

    def variantKind(args: Seq[Expression], kinds: Seq[String]): Expression = {
      val schema = f("schema_of_variant", args.head)
      kinds.map[Expression](k => f("startswith", schema, Literal(k))).reduce(Or(_, _))
    }
    def variantGet(t: String)(args: Seq[Expression]): Expression =
      f("try_variant_get", args.head, Literal("$"), Literal(t))


    Map[String, Seq[Expression] => Expression](
      // arithmetic comparison names (reference comparisons.rs)
      "eq" -> (a => EqualTo(a.head, a(1))),
      "noteq" -> (a => Not(EqualTo(a.head, a(1)))),
      "gt" -> (a => GreaterThan(a.head, a(1))),
      "gte" -> (a => GreaterThanOrEqual(a.head, a(1))),
      "lt" -> (a => LessThan(a.head, a(1))),
      "lte" -> (a => LessThanOrEqual(a.head, a(1))),
      "xor" -> (a => Not(EqualTo(cast(a.head, BooleanType), cast(a(1), BooleanType)))),
      // reference math.rs factorial: defined on 0..=20 (21! overflows
      // int64) and ERRORS outside — Spark's builtin returns NULL
      "factorial" -> (a => ErrIf(
        Or(LessThan(cast(a.head, LongType), Literal(0L)),
           GreaterThan(cast(a.head, LongType), Literal(20L))),
        Factorial(cast(a.head, IntegerType)),
        "1006: factorial is defined for 0..20 only")),
      // numeric truncate-toward-zero at scale d (reference math.rs
      // truncate; NOT Spark's date trunc)
      "truncate" -> (a => {
        val x = cast(a.head, DoubleType)
        val p = f("power", Literal(10.0), if (a.length > 1) a(1) else Literal(0))
        Multiply(f("sign", x),
          Divide(f("floor", Multiply(f("abs", x), p)), p))
      }),
      "div0" -> (a => CaseWhen(
        Seq((EqualTo(cast(a(1), DoubleType), Literal(0.0)), Literal(0.0))),
        Some(Divide(cast(a.head, DoubleType), cast(a(1), DoubleType))))),
      "divnull" -> (a =>
        Divide(cast(a.head, DoubleType), f("nullif", cast(a(1), DoubleType), Literal(0.0)))),
      "isinf" -> (a => Or(
        EqualTo(cast(a.head, DoubleType), Literal(Double.PositiveInfinity)),
        EqualTo(cast(a.head, DoubleType), Literal(Double.NegativeInfinity)))),
      // Spark's IsNaN returns false for NULL; the reference propagates
      "isnan" -> (a => If(IsNull(a.head),
        Literal(null, BooleanType), IsNaN(cast(a.head, DoubleType)))),
      // two's-complement octal (MySQL OCT; conv() saturates at
      // Long.MinValue) — string.rs oct
      "oct" -> (a => f("oct_impl", cast(a.head, LongType))),
      // 2-arg trims: databend order is (str, trimSet); Spark's SQL
      // spelling is (trimSet, str) — build the expression directly
      "ltrim" -> (a =>
        if (a.length == 1) StringTrimLeft(a.head)
        else StringTrimLeft(a.head, a(1))),
      "rtrim" -> (a =>
        if (a.length == 1) StringTrimRight(a.head)
        else StringTrimRight(a.head, a(1))),
      // CHAR(n1, n2, ...): concatenation of code points. The reference
      // errors on invalid codepoints (02_0043: char(23232223) is an
      // error) and renders real unicode (chr(8364) = '€'), where
      // Spark's Chr wraps modulo 256.
      "char" -> (a => {
        def one(x: Expression) = ChrCodepoint(cast(x, LongType))
        if (a.length == 1) one(a.head) else Concat(a.map(one))
      }),
      // object_keys works over VARIANT (and json text) in the
      // reference; Spark's json_object_keys wants the text form
      "object_keys" -> (a => builtinFn("json_object_keys", cast(a.head, StringType))),
      "json_object_keys" -> (a => builtinFn("json_object_keys", cast(a.head, StringType))),
      // reference error discipline: unhex rejects non-hex input
      // (error 1006) instead of null-absorbing; space is capped.
      // builtinFn, NOT f: these bodies call their own registered name.
      "unhex" -> (a => {
        val u = builtinFn("unhex", cast(a.head, StringType))
        ErrIf(And(IsNotNull(a.head), IsNull(u)), u,
          "1006: invalid hex string for unhex")
      }),
      "space" -> (a => {
        val n = cast(a.head, LongType)
        ErrIf(GreaterThan(n, Literal(1000000L)),
          builtinFn("space", cast(a.head, IntegerType)),
          "1006: space length exceeds the 1000000 cap")
      }),
      // LOCATE('', s [, pos]) = pos when pos lands inside s (MySQL);
      // Spark's locate returns 0 there
      "locate" -> (a => {
        val sub = a.head
        val str = a(1)
        val pos = if (a.length > 2) cast(a(2), IntegerType) else Literal(1)
        CaseWhen(Seq(
          (EqualTo(f("length", sub), Literal(0)),
            CaseWhen(Seq((LessThanOrEqual(pos, Add(f("length", str), Literal(1))), pos)),
              Some(Literal(0))))),
          Some(StringLocate(sub, str, pos)))
      }),
      "base64_decode_string" -> (a => cast(f("unbase64", a.head), StringType)),
      "strcmp" -> (a => CaseWhen(Seq(
        (Or(IsNull(a.head), IsNull(a(1))), cast(Literal(null), IntegerType)),
        (LessThan(a.head, a(1)), Literal(-1)),
        (GreaterThan(a.head, a(1)), Literal(1))), Some(Literal(0)))),
      "is_true" -> (a => EqualNullSafe(cast(a.head, BooleanType), Literal(true))),

      // integer/float cast names incl. the unsigned widening rules
      // (SURVEY §1.2: u8->Short u16->Int u32->Long u64->Decimal(20,0))
      "to_int8" -> (a => cast(a.head, ByteType)),
      "to_int16" -> (a => cast(a.head, ShortType)),
      "to_int32" -> (a => cast(a.head, IntegerType)),
      "to_int64" -> (a => cast(a.head, LongType)),
      "to_uint8" -> uintCast(ShortType, Literal(255.toShort, ShortType), tryMode = false) _,
      "to_uint16" -> uintCast(IntegerType, Literal(65535), tryMode = false) _,
      "to_uint32" -> uintCast(LongType, Literal(4294967295L), tryMode = false) _,
      "to_uint64" -> uintCast(DecimalType(20, 0),
        Literal(Decimal("18446744073709551615"), DecimalType(20, 0)), tryMode = false) _,
      "to_float32" -> (a => cast(a.head, FloatType)),
      "to_float64" -> (a => cast(a.head, DoubleType)),
      "to_boolean" -> (a => cast(a.head, BooleanType)),
      "to_numeric" -> (a => cast(a.head, DecimalType(38, 10))),
      "try_to_int8" -> (a => tryCast(a.head, ByteType)),
      "try_to_int16" -> (a => tryCast(a.head, ShortType)),
      "try_to_int32" -> (a => tryCast(a.head, IntegerType)),
      "try_to_int64" -> (a => tryCast(a.head, LongType)),
      "try_to_uint8" -> uintCast(ShortType, Literal(255.toShort, ShortType), tryMode = true) _,
      "try_to_uint16" -> uintCast(IntegerType, Literal(65535), tryMode = true) _,
      "try_to_uint32" -> uintCast(LongType, Literal(4294967295L), tryMode = true) _,
      "try_to_uint64" -> uintCast(DecimalType(20, 0),
        Literal(Decimal("18446744073709551615"), DecimalType(20, 0)), tryMode = true) _,
      "try_to_float32" -> (a => tryCast(a.head, FloatType)),
      "try_to_float64" -> (a => tryCast(a.head, DoubleType)),
      "try_to_boolean" -> (a => tryCast(a.head, BooleanType)),
      "try_to_numeric" -> (a => tryCast(a.head, DecimalType(38, 10))),
      "try_to_string" -> (a => tryCast(a.head, StringType)),
      "try_to_variant" -> (a => f("try_parse_json", cast(a.head, StringType))),

      // string trims: with a pattern these strip the exact substring
      // repeatedly (reference string.rs trim_both/leading/trailing;
      // char-SET semantics belong to 2-arg trim(), which Spark's
      // StringTrim already has)
      "trim_both" -> (a =>
        if (a.length == 1) StringTrim(a.head)
        else TrimMatches(a.head, a(1), leading = true, trailing = true)),
      "trim_leading" -> (a =>
        if (a.length == 1) StringTrimLeft(a.head)
        else TrimMatches(a.head, a(1), leading = true, trailing = false)),
      "trim_trailing" -> (a =>
        if (a.length == 1) StringTrimRight(a.head)
        else TrimMatches(a.head, a(1), leading = false, trailing = true)),
      // 2-arg trim is trim(val, set) in the reference; Spark's builtin
      // reads trim(set, val) — swap to StringTrim's (src, trim) order
      "trim" -> (a =>
        if (a.length == 2) StringTrim(a.head, a(1)) else StringTrim(a.head)),
      // PG-rule regexp split (empty fields kept for real separators,
      // zero-length matches split per character; PgRegexpSplit)
      "regexp_split_to_array" -> (a =>
        PgRegexpSplit(a.head, a(1),
          if (a.length >= 3) a(2) else Literal(""))),
      // MySQL semantics (reference 02_0027 slt): a position outside
      // [1, len] returns the string unchanged — overlay alone clamps
      "insert" -> (a => CaseWhen(Seq(
        (Or(LessThan(a(1), Literal(1)),
            GreaterThan(a(1), f("length", a.head))), a.head)),
        Some(f("overlay", a.head, a(3), a(1), a(2))))),

      // datetime add/subtract families — type-preserving markers with
      // the reference's end-of-month snap + saturating clamp (see
      // DtAddMarker scaladoc; expansion in DatetimeCoercionRule)
      "add_days" -> (a => DtAddMarker(a.head, mulL(a(1), 1), "day")),
      "add_weeks" -> (a => DtAddMarker(a.head, mulL(a(1), 7), "day")),
      "subtract_days" -> (a => DtAddMarker(a.head, mulL(a(1), -1), "day")),
      "subtract_weeks" -> (a => DtAddMarker(a.head, mulL(a(1), -7), "day")),
      "add_hours" -> (a => DtAddMarker(a.head, mulL(a(1), 3600), "second")),
      "add_minutes" -> (a => DtAddMarker(a.head, mulL(a(1), 60), "second")),
      "add_seconds" -> (a => DtAddMarker(a.head, mulL(a(1), 1), "second")),
      "subtract_hours" -> (a => DtAddMarker(a.head, mulL(a(1), -3600), "second")),
      "subtract_minutes" -> (a => DtAddMarker(a.head, mulL(a(1), -60), "second")),
      "subtract_seconds" -> (a => DtAddMarker(a.head, mulL(a(1), -1), "second")),
      // end-of-month snap applies to add_months/subtract_months ONLY
      // (datetime.rs register_add_functions: the boolean flag is true
      // just for those two; years/quarters/date_add_months clamp the
      // day without snapping)
      "add_years" -> (a => DtAddMarker(a.head, mulL(a(1), 12), "month")),
      "add_quarters" -> (a => DtAddMarker(a.head, mulL(a(1), 3), "month")),
      "add_months" -> (a => DtAddMarker(a.head, mulL(a(1), 1), "month", snap = true)),
      "date_add_months" -> (a => DtAddMarker(a.head, mulL(a(1), 1), "month")),
      "subtract_years" -> (a => DtAddMarker(a.head, mulL(a(1), -12), "month")),
      "subtract_quarters" -> (a => DtAddMarker(a.head, mulL(a(1), -3), "month")),
      "subtract_months" -> (a => DtAddMarker(a.head, mulL(a(1), -1), "month", snap = true)),
      "date_subtract_months" -> (a => DtAddMarker(a.head, mulL(a(1), -1), "month")),

      // diff/between unit families (between_* share diff_* semantics;
      // the reference aliases between_dows/doys/isodows -> between_days)
      "diff_quarters" -> byMonths(3) _,
      "diff_weeks" -> byWeeks _,
      "diff_yearweeks" -> byWeeks _,
      "diff_dows" -> byDays _,
      "diff_doys" -> byDays _,
      "diff_isodows" -> byDays _,
      "diff_isoyears" -> byIsoYears _,
      "diff_microseconds" -> byMicros(1L) _,
      "diff_milliseconds" -> byMicros(1000L) _,
      "diff_millenniums" -> byYearsDiv(1000) _,
      "diff_centuries" -> byYearsDiv(100) _,
      "diff_decades" -> byYearsDiv(10) _,
      "between_hours" -> bySeconds(3600L) _,
      "between_minutes" -> bySeconds(60L) _,
      "between_seconds" -> bySeconds(1L) _,
      "between_epochs" -> bySeconds(1L) _,
      "between_microseconds" -> byMicros(1L) _,
      "between_milliseconds" -> byMicros(1000L) _,
      "between_months" -> byMonths(1) _,
      "between_quarters" -> byMonths(3) _,
      "between_years" -> (a => byYearsDiv(1)(a)),
      "between_millenniums" -> byYearsDiv(1000) _,
      "between_weeks" -> byWeeks _,
      "between_yearweeks" -> byWeeks _,
      "between_dows" -> byDays _,
      "between_doys" -> byDays _,
      "between_isodows" -> byDays _,
      "between_isoyears" -> byIsoYears _,

      // calendar anchors
      "yesterday" -> (_ => f("date_sub", f("current_date"), Literal(1))),
      "tomorrow" -> (_ => f("date_add", f("current_date"), Literal(1))),
      "yearweek" -> (a => cast(Add(
        Multiply(f("date_part", Literal("YEAROFWEEK"), a.head), Literal(100)),
        f("weekofyear", a.head)), IntegerType)),
      "to_iso_year" -> (a => cast(f("date_part", Literal("YEAROFWEEK"), a.head), IntegerType)),
      "millennium" -> (a => cast(f("ceil",
        Divide(cast(f("year", a.head), DoubleType), Literal(1000.0))), IntegerType)),
      "century" -> (a => cast(f("ceil",
        Divide(cast(f("year", a.head), DoubleType), Literal(100.0))), IntegerType)),
      "decade" -> (a => cast(f("floor",
        Divide(cast(f("year", a.head), DoubleType), Literal(10.0))), IntegerType)),
      "to_last_of_year" -> (a => f("make_date", f("year", a.head), Literal(12), Literal(31))),
      "to_last_of_quarter" -> (a =>
        f("last_day", f("add_months", f("date_trunc", Literal("quarter"), a.head), Literal(2)))),
      "to_last_of_week" -> (a =>
        f("date_add", cast(f("date_trunc", Literal("week"), a.head), DateType), Literal(6))),
      "to_next_monday" -> (a => f("next_day", a.head, Literal("Monday"))),
      "to_next_tuesday" -> (a => f("next_day", a.head, Literal("Tuesday"))),
      "to_next_wednesday" -> (a => f("next_day", a.head, Literal("Wednesday"))),
      "to_next_thursday" -> (a => f("next_day", a.head, Literal("Thursday"))),
      "to_next_friday" -> (a => f("next_day", a.head, Literal("Friday"))),
      "to_next_saturday" -> (a => f("next_day", a.head, Literal("Saturday"))),
      "to_next_sunday" -> (a => f("next_day", a.head, Literal("Sunday"))),
      "to_previous_monday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Monday"))),
      "to_previous_tuesday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Tuesday"))),
      "to_previous_wednesday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Wednesday"))),
      "to_previous_thursday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Thursday"))),
      "to_previous_friday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Friday"))),
      "to_previous_saturday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Saturday"))),
      "to_previous_sunday" -> (a => f("next_day", f("date_sub", cast(a.head, DateType), Literal(8)), Literal("Sunday"))),
      // N-minute buckets on LOCAL wall time, not UTC epoch seconds —
      // the reference truncates the civil minute (the Kathmandu +5:45
      // vectors in 02_0012 expose UTC-epoch bucketing)
      "to_start_of_five_minutes" -> (a => minuteBucket(a.head, 5)),
      "to_start_of_ten_minutes" -> (a => minuteBucket(a.head, 10)),
      "to_start_of_fifteen_minutes" -> (a => minuteBucket(a.head, 15)),
      "time_slot" -> (a => minuteBucket(a.head, 30)),
      "to_start_of_iso_year" -> (a => cast(f("date_trunc", Literal("week"),
        f("make_date", f("date_part", Literal("YEAROFWEEK"), a.head), Literal(1), Literal(4))), DateType)),
      "to_microsecond" -> (a => cast(Pmod(f("unix_micros", cast(a.head, TimestampType)), Literal(1000000L)), IntegerType)),

      // interval constructors
      "to_days" -> (a => dtInterval(d = a.head)),
      "to_hours" -> (a => dtInterval(h = a.head)),
      "to_minutes" -> (a => dtInterval(m = a.head)),
      "to_seconds" -> (a => dtInterval(s = cast(a.head, DoubleType))),
      "to_milliseconds" -> (a => dtInterval(s = Divide(cast(a.head, DoubleType), Literal(1000.0)))),
      "to_microseconds" -> (a => dtInterval(s = Divide(cast(a.head, DoubleType), Literal(1000000.0)))),
      "to_weeks" -> (a => dtInterval(d = Multiply(a.head, Literal(7)))),
      "to_months" -> (a => ymInterval(Literal(0), a.head)),
      "to_years" -> (a => ymInterval(a.head, Literal(0))),
      "to_decades" -> (a => ymInterval(Multiply(a.head, Literal(10)), Literal(0))),
      "to_centuries" -> (a => ymInterval(Multiply(a.head, Literal(100)), Literal(0))),
      "to_millennia" -> (a => ymInterval(Multiply(a.head, Literal(1000)), Literal(0))),

      // variant accessors/predicates (Spark 4 native VARIANT)
      "as_string" -> variantGet("string") _,
      "get_string" -> variantGet("string") _,
      "as_integer" -> variantGet("bigint") _,
      "as_float" -> variantGet("double") _,
      "as_boolean" -> variantGet("boolean") _,
      "as_date" -> variantGet("date") _,
      "as_timestamp" -> variantGet("timestamp") _,
      "is_date" -> (a => variantKind(a, Seq("DATE"))),
      "is_timestamp" -> (a => variantKind(a, Seq("TIMESTAMP"))),
      "is_binary" -> (a => variantKind(a, Seq("BINARY"))),
      "is_decimal" -> (a => variantKind(a, Seq("DECIMAL"))),
      "json_typeof" -> (a => {
        val schema = f("schema_of_variant", a.head)
        CaseWhen(Seq(
          (f("startswith", schema, Literal("OBJECT")), Literal("object")),
          (f("startswith", schema, Literal("ARRAY")), Literal("array")),
          (f("startswith", schema, Literal("STRING")), Literal("string")),
          (f("startswith", schema, Literal("BOOLEAN")), Literal("boolean")),
          (f("startswith", schema, Literal("VOID")), Literal("null"))),
          Some(Literal("number")))
      }),
      "json_exists_key" -> (a =>
        f("array_contains", f("json_object_keys", cast(a.head, StringType)), a(1))),
      "json_exists_any_keys" -> (a =>
        f("arrays_overlap", f("json_object_keys", cast(a.head, StringType)),
          CreateArray(a.tail))),
      "json_exists_all_keys" -> (a =>
        EqualTo(Size(ArrayExcept(CreateArray(a.tail),
          f("json_object_keys", cast(a.head, StringType)))), Literal(0))),
      // jsonb `?`: key in an object OR string element in an array;
      // `?|`/`?&` take the key list as one array argument
      "json_has_key_or_elem" -> (a =>
        f("json_has_impl", JsonTextDispatch(a.head), cast(a(1), StringType))),
      "json_has_any_keys_or_elems" -> (a =>
        f("json_has_any_impl", JsonTextDispatch(a.head),
          cast(a(1), ArrayType(StringType)))),
      "json_has_all_keys_or_elems" -> (a =>
        f("json_has_all_impl", JsonTextDispatch(a.head),
          cast(a(1), ArrayType(StringType)))),
      // dotted/bracketed path navigation (variant.rs get_by_keypath);
      // VariantGetPath keeps VARIANT output and non-literal paths work
      "get_path" -> (a => VariantGetPath(a.head, a(1), asText = false, dotted = true)),
      "json_extract_path_text" -> (a =>
        VariantGetPath(a.head, a(1), asText = true, dotted = true)),
      "map_insert" -> (a => f("map_concat", a.head, f("map", a(1), a(2)))),

      // array edits/sorts (reference array.rs)
      "array_remove_first" -> (a => f("slice", a.head, Literal(2),
        f("greatest", Subtract(Size(a.head), Literal(1)), Literal(0)))),
      "array_remove_last" -> (a => f("slice", a.head, Literal(1),
        f("greatest", Subtract(Size(a.head), Literal(1)), Literal(0)))),
      "array_sort_asc_null_first" -> (a => f("sort_array", a.head, Literal(true))),
      "array_sort_asc_null_last" -> (a => f("array_sort", a.head)),
      "array_sort_desc_null_first" -> (a => f("reverse", f("array_sort", a.head))),
      "array_sort_desc_null_last" -> (a => f("reverse", f("sort_array", a.head, Literal(true)))),
      // DateFormatClass directly: registry date_format runs the
      // Oracle PG-token pass, which mangles this Java pattern
      "to_yyyymmddhh" -> (a => cast(
        DateFormatClass(a.head, Literal("yyyyMMddHH")), LongType)),
      "to_nullable" -> (a => a.head),
      "as_array" -> variantGet("array<variant>") _,
      "check_json" -> (a => CaseWhen(Seq(
        (And(IsNotNull(cast(a.head, StringType)),
          IsNull(f("try_parse_json", cast(a.head, StringType)))),
          Literal("invalid JSON"))), Some(Literal(null, StringType)))),

      // misc
      "bucket" -> (a => f("width_bucket", a: _*)),
      "age" -> (a => {
        val Seq(end, start) = a.take(2)
        dtInterval(d = f("datediff", cast(end, DateType), cast(start, DateType)))
      }),
      "timestamp_diff" -> bySeconds(1L) _)
  }

  // ---- UDF tier: genuinely-new scalars (driver-registered; not in
  // scan-critical paths — the codegen'd query-library variants cover
  // the hot paths) -----------------------------------------------------

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Jaro-Winkler similarity in [0,1], matching the reference's
    * byte-level algorithm exactly (other.rs jaro_winkler module):
    * operates on UTF-8 bytes with the longer string as s1, matches by
    * scanning the shorter string against a floor(max/2)-1 window,
    * counts transpositions over all but the last short-string byte
    * with a ceil(t/2) fold, and always applies the prefix bonus (no
    * 0.7 threshold).
    */
  private[functions] def jaroWinkler(a0: String, b0: String): Double = {
    val (left, right) = {
      val ab = a0.getBytes("UTF-8"); val bb = b0.getBytes("UTF-8")
      if (ab.length < bb.length) (bb, ab) else (ab, bb)
    }
    val s1Len = left.length; val s2Len = right.length
    if (s1Len == 0 && s2Len == 0) return 1.0
    if (s1Len == 0 || s2Len == 0) return 0.0
    if (java.util.Arrays.equals(left, right)) return 1.0
    val range = math.max((s1Len.max(s2Len) / 2.0).floor.toInt - 1, 0)
    val s1m = Array.fill(s1Len)(false)
    val s2m = Array.fill(s2Len)(false)
    var matching = 0.0
    var i = 0
    while (i < s2Len) {
      var j = math.max(i - range, 0)
      val l = math.min(i + range + 1, s1Len)
      var done = false
      while (j < l && !done) {
        if (right(i) == left(j) && !s1m(j)) {
          s1m(j) = true; s2m(i) = true; matching += 1.0; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matching == 0.0) return 0.0
    var transpositions = 0.0
    var lIdx = 0
    i = 0
    while (i < s2Len - 1) {
      if (s2m(i)) {
        var j = lIdx
        var found = -1
        while (j < s1Len && found < 0) {
          if (s1m(j)) { lIdx = j + 1; found = j }
          else j += 1
        }
        if (found >= 0 && right(i) != left(found)) transpositions += 1.0
      }
      i += 1
    }
    transpositions = math.ceil(transpositions / 2.0)
    val jaro = (matching / s1Len + matching / s2Len +
      (matching - transpositions) / matching) / 3.0
    var prefix = 0
    while (prefix < 4 && prefix < s2Len && left(prefix) == right(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private def humanNumber(v: Double): String = {
    val abs = math.abs(v)
    // tiers end at quadrillion (reference: 1e18 -> "1000 quadrillion")
    val (scaled, unit) =
      if (abs >= 1e15) (v / 1e15, " quadrillion")
      else if (abs >= 1e12) (v / 1e12, " trillion")
      else if (abs >= 1e9) (v / 1e9, " billion")
      else if (abs >= 1e6) (v / 1e6, " million")
      else if (abs >= 1e3) (v / 1e3, " thousand")
      else (v, "")
    val s = BigDecimal(scaled).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.stripTrailingZeros.toPlainString
    s + unit
  }

  private def humanSize(v: Double): String = {
    val units = Seq("B", "KiB", "MiB", "GiB", "TiB", "PiB", "EiB", "ZiB", "YiB")
    var x = v; var i = 0
    while (math.abs(x) >= 1024 && i < units.length - 1) { x /= 1024; i += 1 }
    // always two decimals (reference: 1.00 KiB) — unlike
    // humanize_number, which strips trailing zeros
    val s = BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      .bigDecimal.toPlainString
    s"$s ${units(i)}"
  }

  /** truncate the session-local civil minute to an N-minute boundary */
  private def minuteBucket(x: Expression, n: Int): Expression = {
    val ts = cast(x, TimestampType)
    f("make_timestamp", f("year", ts), f("month", ts), f("day", ts),
      f("hour", ts),
      Multiply(cast(Divide(cast(f("minute", ts), IntegerType),
        Literal(n)), IntegerType), Literal(n)),
      Literal(0.0))
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    for ((name, target) <- aliases if name != target) {
      reg.createOrReplaceTempFunction(name,
        args => UnresolvedFunction(target, args, isDistinct = false), "scala_udf")
    }
    for ((name, builder) <- rewrites) {
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // ord: MySQL multibyte semantics (string.rs ord) — the leading
    // character's UTF-8 bytes read as a big-endian number
    spark.udf.register("ord", udf((s: String) =>
      if (s == null) None
      else if (s.isEmpty) Some(0L)
      else {
        val first = s.codePointAt(0)
        val bytes = new String(Character.toChars(first)).getBytes("UTF-8")
        Some(bytes.foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)))
      }))
    // two's-complement octal (conv() clips at Long.MinValue)
    spark.udf.register("oct_impl", udf((n: java.lang.Long) =>
      if (n == null) None else Some(java.lang.Long.toOctalString(n))))
    // MySQL-shaped regexp family with full argument lists
    // (string.rs regexp_*; see functions/RegexpMysql.scala)
    spark.udf.register("regexp_like_impl",
      udf((s: String, p: String, mt: String) => Option(RegexpMysql.like(s, p, mt))))
    spark.udf.register("regexp_instr_impl",
      udf((s: String, p: String, pos: Int, occ: Int, ret: Int, mt: String) =>
        Option(RegexpMysql.instr(s, p, pos, occ, ret, mt))))
    spark.udf.register("regexp_substr_impl",
      udf((s: String, p: String, pos: Int, occ: Int, mt: String) =>
        Option(RegexpMysql.substr(s, p, pos, occ, mt))))
    spark.udf.register("regexp_replace_impl",
      udf((s: String, p: String, r: String, pos: Int, occ: Int, mt: String) =>
        Option(RegexpMysql.replace(s, p, r, pos, occ, mt))))
    def pad(a: Seq[Expression], n: Int, defaults: Seq[Expression]): Seq[Expression] =
      a ++ defaults.drop(a.length - (n - defaults.length))
    reg.createOrReplaceTempFunction("regexp_like",
      a => UnresolvedFunction("regexp_like_impl",
        pad(a, 3, Seq(Literal(""))), isDistinct = false), "scala_udf")
    reg.createOrReplaceTempFunction("regexp_instr",
      a => UnresolvedFunction("regexp_instr_impl",
        pad(a, 6, Seq(Literal(1), Literal(1), Literal(0), Literal(""))),
        isDistinct = false), "scala_udf")
    reg.createOrReplaceTempFunction("regexp_substr",
      a => UnresolvedFunction("regexp_substr_impl",
        pad(a, 5, Seq(Literal(1), Literal(1), Literal(""))),
        isDistinct = false), "scala_udf")
    reg.createOrReplaceTempFunction("regexp_replace",
      a => UnresolvedFunction("regexp_replace_impl",
        pad(a, 6, Seq(Literal(1), Literal(0), Literal(""))),
        isDistinct = false), "scala_udf")
    // instr(str, substr [, pos [, occurrence]]) — reverse-arg locate
    // with the reference's extended pos/occurrence args
    spark.udf.register("instr_impl",
      udf((s: String, sub: String, pos: Int, occ: Int) => {
        if (s == null || sub == null) None
        else if (sub.isEmpty) Some(if (math.abs(pos) <= s.length + 1) math.abs(pos).toLong else 0L)
        else if (pos >= 0) {
          var at = pos - 1
          var n = 0
          var res = 0L
          while (n < occ && at <= s.length) {
            val i = s.indexOf(sub, at)
            if (i < 0) { n = occ; res = 0L; at = s.length + 1 }
            else { n += 1; res = i + 1L; at = i + 1 }
          }
          Some(res)
        } else {
          // negative pos: search BACKWARD from the end (Oracle INSTR)
          var at = s.length + pos
          var n = 0
          var res = 0L
          while (n < occ && at >= 0) {
            val i = s.lastIndexOf(sub, at)
            if (i < 0) { n = occ; res = 0L; at = -1 }
            else { n += 1; res = i + 1L; at = i - 1 }
          }
          Some(res)
        }
      }))
    reg.createOrReplaceTempFunction("instr",
      a => if (a.length <= 2) StringInstr(a.head, a(1))
      else UnresolvedFunction("instr_impl",
        pad(a, 4, Seq(Literal(1), Literal(1))), isDistinct = false), "scala_udf")
    // vector distances (reference scalars/vector.rs:60-172; arrays of
    // float/double; the benched ANN paths use the codegen'd zip_with
    // forms — these names are the scalar-call surface)
    spark.udf.register("cosine_distance", udf((a: Seq[Double], b: Seq[Double]) =>
      if (a == null || b == null) None
      else {
        val d = dot(a, b)
        val n = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
        Some(if (n == 0) 1.0 else 1.0 - d / n)
      }))
    spark.udf.register("l2_distance", udf((a: Seq[Double], b: Seq[Double]) =>
      if (a == null || b == null) None
      else Some(math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum))))
    spark.udf.register("l1_distance", udf((a: Seq[Double], b: Seq[Double]) =>
      if (a == null || b == null) None
      else Some(a.zip(b).map { case (x, y) => math.abs(x - y) }.sum)))
    spark.udf.register("inner_product", udf((a: Seq[Double], b: Seq[Double]) =>
      if (a == null || b == null) None else Some(dot(a, b))))
    // MySQL conv(): negative to_base renders SIGNED; negative from_base
    // reads as |base|; unsigned 64-bit accumulation saturates at max
    // (string.rs conv semantics)
    spark.udf.register("conv_impl", udf((s0: String, from: Int, to: Int) => {
      if (s0 == null) None
      else {
        val fb = math.abs(from); val tb = math.abs(to)
        if (fb < 2 || fb > 36 || tb < 2 || tb > 36) None
        else {
          val s = s0.trim
          val neg = s.startsWith("-")
          val digits = (if (neg) s.substring(1) else s)
          val valid = digits.takeWhile(c => Character.digit(c, fb) >= 0)
          if (valid.isEmpty) Some("0")
          else {
            var v = 0L; var sat = false
            for (c <- valid) {
              val d = Character.digit(c, fb)
              val nv = v * fb + d
              if (!sat && java.lang.Long.compareUnsigned(nv, v) < 0) sat = true
              v = nv
            }
            if (sat) v = -1L
            if (neg) v = -v
            Some(
              if (to < 0) java.lang.Long.toString(v, tb).toUpperCase
              else java.lang.Long.toUnsignedString(v, tb).toUpperCase)
          }
        }
      }
    }))
    reg.createOrReplaceTempFunction("conv",
      a => UnresolvedFunction("conv_impl", Seq(cast(a.head, StringType),
        cast(a(1), IntegerType), cast(a(2), IntegerType)),
        isDistinct = false), "scala_udf")
    // haversine(lat1, lon1, lat2, lon2) in km (reference geo.rs)
    spark.udf.register("haversine", udf((lat1: Double, lon1: Double, lat2: Double, lon2: Double) => {
      val dLat = math.toRadians(lat2 - lat1) / 2
      val dLon = math.toRadians(lon2 - lon1) / 2
      val h = math.pow(math.sin(dLat), 2) +
        math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
          math.pow(math.sin(dLon), 2)
      2 * (Geo.EarthRadius / 1000.0) * math.asin(math.min(1.0, math.sqrt(h)))
    }))
    spark.udf.register("jaro_winkler", udf((a: String, b: String) =>
      if (a == null || b == null) None else Some(jaroWinkler(a, b))))
    spark.udf.register("humanize_number", udf((v: Double) => humanNumber(v)))
    spark.udf.register("humanize_size", udf((v: Double) => humanSize(v)))
    // databend split: LITERAL separator (string.rs), Spark's is a
    // regex — '127.0.0.1' split '.' is 4 parts, not empties. Trailing
    // empty fields drop; a fully-empty result is [""]
    def dbSplit(s: String, sep: String): Array[String] =
      if (s == null || sep == null) null
      else if (sep.isEmpty) Array(s)
      else {
        val parts = s.split(java.util.regex.Pattern.quote(sep), -1)
        val t = parts.reverse.dropWhile(_.isEmpty).reverse
        if (t.isEmpty) Array("") else t
      }
    // registered as split_literal, NOT split: Column.fn resolves
    // through the session registry in Spark 4, so overriding `split`
    // would hijack the engine's own regex splits (inverted-index
    // tokenization). GraftSql's statement head rewrites databend's
    // split( onto this name.
    spark.udf.register("split_literal", udf((s: String, sep: String) => dbSplit(s, sep)))
    // databend split_part: index 0 behaves like 1, negatives count
    // from the end, out of range is the EMPTY string (string.rs)
    spark.udf.register("split_part", udf((s: String, sep: String, n: Int) => {
      val parts = dbSplit(s, sep)
      if (parts == null) null
      else {
        val idx = if (n == 0) 1 else n
        val i = if (idx > 0) idx - 1 else parts.length + idx
        if (i >= 0 && i < parts.length) parts(i) else ""
      }
    }))
  }
}
