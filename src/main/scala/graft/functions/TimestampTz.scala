package graft.functions

import java.time._
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.{LongType, StringType}

/** TIMESTAMP_TZ tier (reference: scalars/timestamp/src/datetime.rs —
  * to_timestamp_tz :462, try_to_timestamp_tz :467,
  * timestamp_tz_from_parts :3137, tz<->timestamp/date casts :112-121).
  * The reference's timestamp_tz value is (utc instant, offset); Spark
  * has no offset-preserving temporal type, so the tier models it as
  * STRUCT<us: BIGINT, offset_minutes: INT> — `us` is UTC epoch
  * microseconds, the offset is preserved exactly for display and
  * local-date math. Strings without an explicit offset resolve in the
  * session time zone captured at registration (the reference uses
  * func_ctx.tz the same way).
  */
object TimestampTz {

  final case class TzTs(us: Long, offset_minutes: Int)

  // ---- parsing --------------------------------------------------------

  private val WithOffset =
    """(\d{4})-(\d{2})-(\d{2})[ T](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d{1,9}))?)?\s*(Z|UTC|[+-]\d{1,2}(?::?\d{2})?)?\s*""".r
  private val DateOnly = """(\d{4})-(\d{2})-(\d{2})\s*""".r

  private def parseOffsetMinutes(s: String): Int = s match {
    case null | "" => Int.MinValue // sentinel: absent
    case "Z" | "UTC" => 0
    case o =>
      val sign = if (o.charAt(0) == '-') -1 else 1
      val body = o.substring(1).replace(":", "")
      val (h, m) =
        if (body.length <= 2) (body.toInt, 0)
        else (body.dropRight(2).toInt, body.takeRight(2).toInt)
      sign * (h * 60 + m)
  }

  /** (utc micros, offset minutes); throws on malformed input */
  private[graft] def parse(s0: String, sessionZone: ZoneId,
      modes: (Boolean, Boolean) = (true, false)): TzTs = {
    val s = s0.trim
    s match {
      case WithOffset(y, mo, d, h, mi, sec, frac, off) =>
        val micros =
          if (frac == null) 0L
          else (frac.padTo(9, '0').take(9).toLong + 500) / 1000 // ns -> us, round
        val ldt = LocalDateTime.of(y.toInt, mo.toInt, d.toInt, h.toInt, mi.toInt,
          if (sec == null) 0 else sec.toInt).plusNanos(micros * 1000)
        val offMin = parseOffsetMinutes(off)
        if (offMin != Int.MinValue) {
          val inst = ldt.toInstant(ZoneOffset.ofTotalSeconds(offMin * 60))
          TzTs(inst.getEpochSecond * 1000000L + inst.getNano / 1000, offMin)
        } else {
          val zdt = ldt.atZone(sessionZone)
          val inst = zdt.toInstant
          TzTs(inst.getEpochSecond * 1000000L + inst.getNano / 1000,
            zdt.getOffset.getTotalSeconds / 60)
        }
      case DateOnly(y, mo, d) =>
        parse(s"$y-$mo-$d 00:00:00", sessionZone, modes)
      case other =>
        // auto-detect formats (reference auto_detect_datetime.rs; the
        // to_timestamp_tz tier honors the same settings). `modes` is
        // the (strict, auto) pair captured when the calling udf was
        // registered — eval happens after a SETTINGS(...) scope is
        // restored, so a live read would see the wrong values.
        (if (modes._2 || !modes._1)
           DatetimeSemantics.parseAutoOffset(other, sessionZone)
         else None) match {
          case Some((us, offMin)) => TzTs(us, offMin)
          case None => throw new IllegalArgumentException(
            s"cannot parse to type `TIMESTAMP_TZ`: '$other'")
        }
    }
  }

  // ---- formatting -----------------------------------------------------

  private val BaseFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private[graft] def format(t: TzTs): String = {
    val off = ZoneOffset.ofTotalSeconds(t.offset_minutes * 60)
    val odt = Instant.ofEpochSecond(Math.floorDiv(t.us, 1000000L),
      Math.floorMod(t.us, 1000000L) * 1000).atOffset(off)
    val base = odt.format(BaseFmt)
    val micro = odt.getNano / 1000
    val fracPart = if (micro == 0) "" else f".$micro%06d".reverse.dropWhile(_ == '0').reverse
    val sign = if (t.offset_minutes < 0) "-" else "+"
    val am = math.abs(t.offset_minutes)
    f"$base$fracPart$sign${am / 60}%02d:${am % 60}%02d"
  }

  /** the reference's result-set rendering of a TIMESTAMP_TZ value:
    * micro-precision civil time at the stored offset, then a space
    * and the colon-free offset (`2024-11-03 05:30:00.000000 -0500`) —
    * distinct from timestamp_tz_to_string's compact form
    */
  private[graft] def display(us: Long, offsetMinutes: Int): String = {
    val off = ZoneOffset.ofTotalSeconds(offsetMinutes * 60)
    val odt = Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000).atOffset(off)
    val micro = odt.getNano / 1000
    val sign = if (offsetMinutes < 0) "-" else "+"
    val am = math.abs(offsetMinutes)
    f"${odt.format(BaseFmt)}.$micro%06d $sign${am / 60}%02d${am % 60}%02d"
  }

  private def localDate(t: TzTs): java.time.LocalDate =
    Instant.ofEpochSecond(Math.floorDiv(t.us, 1000000L), Math.floorMod(t.us, 1000000L) * 1000)
      .atOffset(ZoneOffset.ofTotalSeconds(t.offset_minutes * 60)).toLocalDate

  private def ofRow(r: Row): TzTs = TzTs(r.getLong(0), r.getInt(1))

  // ---- registration ---------------------------------------------------

  private def f(name: String, as: Expression*): Expression =
    UnresolvedFunction(name, as.toSeq, isDistinct = false)

  /** arity dispatch for timestamp_tz_from_parts: 6 args, 7 with ns,
    * 7 with tz string, 8 with both (reference factory :3141-3179)
    */
  val rewrites: Map[String, Seq[Expression] => Expression] = {
    val fromParts: Seq[Expression] => Expression = a => {
      val sixty = a.take(6).map(Cast(_, LongType))
      // 7-arg ambiguity (ns vs tz, reference :3141-3179): expressions
      // whose type is already known dispatch here; an UNRESOLVED 7th
      // arg (e.g. a column reference at rewrite time) defers to the
      // runtime dispatcher, which tries a numeric parse — silently
      // assuming the ns reading would use the session zone instead of
      // the supplied tz with no error
      a.length match {
        case 6 => f("timestamp_tz_from_parts_impl",
          (sixty :+ Literal(0L) :+ Literal(null, StringType)): _*)
        case 7 => scala.util.Try(a(6).dataType) match {
          case scala.util.Success(StringType) => f("timestamp_tz_from_parts_impl",
            (sixty :+ Literal(0L) :+ a(6)): _*)
          case scala.util.Success(_) => f("timestamp_tz_from_parts_impl",
            (sixty :+ Cast(a(6), LongType) :+ Literal(null, StringType)): _*)
          case scala.util.Failure(_) => f("timestamp_tz_from_parts_dispatch7",
            (sixty :+ Cast(a(6), StringType)): _*)
        }
        case 8 => f("timestamp_tz_from_parts_impl",
          (sixty :+ Cast(a(6), LongType) :+ Cast(a(7), StringType)): _*)
        case n => throw new IllegalArgumentException(
          s"timestamp_tz_from_parts expects 6-8 args, got $n")
      }
    }
    val dateFromParts: Seq[Expression] => Expression = a =>
      f("date_from_parts_impl", a.take(3).map(Cast(_, LongType)): _*)
    val tsFromParts: Seq[Expression] => Expression = a => {
      val sixty = a.take(6).map(Cast(_, LongType))
      val ns = if (a.length >= 7) Cast(a(6), LongType) else Literal(0L)
      f("timestamp_from_parts_impl", (sixty :+ ns): _*)
    }
    Map("timestamp_tz_from_parts" -> fromParts, "timestamptzfromparts" -> fromParts,
      "date_from_parts" -> dateFromParts, "datefromparts" -> dateFromParts,
      "timestamp_from_parts" -> tsFromParts, "timestampfromparts" -> tsFromParts)
  }

  /** reference normalize_date_parts + duration_from_time_parts
    * (datetime.rs): the month rolls through years, the day is an
    * OFFSET from the 1st (0 and negatives roll back), time components
    * are one signed duration (hour 25 / second -3600 / ns 2e9 all
    * roll); the normalized civil result must land in year 1..9999
    */
  private[graft] def normalizedLdt(y: Long, mo: Long, d: Long, h: Long,
      mi: Long, sec: Long, ns: Long): LocalDateTime = {
    val totalMonths = y * 12 + (mo - 1)
    val ny = Math.floorDiv(totalMonths, 12)
    val nm = Math.floorMod(totalMonths, 12) + 1
    require(ny >= -9999 && ny <= 99999, s"year out of bounds: $ny")
    val base = java.time.LocalDate.of(ny.toInt, nm.toInt, 1).plusDays(d - 1)
    val ldt = base.atStartOfDay
      .plusHours(h).plusMinutes(mi).plusSeconds(sec).plusNanos(ns)
    require(ldt.getYear >= 1 && ldt.getYear <= 9999,
      s"1006: date/timestamp parts out of range")
    ldt
  }

  def register(spark: SparkSession): Unit = {
    val r = spark.udf
    val zone = ZoneId.of(spark.conf.get("spark.sql.session.timeZone", "UTC"))
    val modes = (
      spark.conf.get("enable_strict_datetime_parser", "1").trim != "0",
      spark.conf.get("enable_auto_detect_datetime_format", "0").trim == "1")

    r.register("to_timestamp_tz", udf((s: String) =>
      if (s == null) null else parse(s, zone, modes)))
    r.register("try_to_timestamp_tz", udf((s: String) =>
      if (s == null) null
      else try parse(s, zone, modes) catch { case _: Exception => null }))
    r.register("timestamp_to_timestamp_tz", udf((ts: java.sql.Timestamp) =>
      if (ts == null) null
      else {
        val inst = ts.toInstant
        val off = zone.getRules.getOffset(inst).getTotalSeconds / 60
        TzTs(inst.getEpochSecond * 1000000L + inst.getNano / 1000, off)
      }))
    r.register("timestamp_tz_from_parts_impl",
      udf((y: Long, mo: Long, d: Long, h: Long, mi: Long, sec: Long, ns: Long, tz: String) => {
        val ldt = normalizedLdt(y, mo, d, h, mi, sec, ns)
        val z = if (tz == null) zone else ZoneId.of(tz)
        val zdt = ldt.atZone(z)
        val inst = zdt.toInstant
        TzTs(inst.getEpochSecond * 1000000L + inst.getNano / 1000,
          zdt.getOffset.getTotalSeconds / 60)
      }))
    r.register("date_from_parts_impl",
      udf((y: Long, mo: Long, d: Long) =>
        normalizedLdt(y, mo, d, 0, 0, 0, 0).toLocalDate))
    r.register("timestamp_from_parts_impl",
      udf((y: Long, mo: Long, d: Long, h: Long, mi: Long, sec: Long, ns: Long) => {
        val inst = normalizedLdt(y, mo, d, h, mi, sec, ns).atZone(zone).toInstant
        java.sql.Timestamp.from(inst)
      }))
    // runtime ns-vs-tz dispatch for a 7th arg whose type was unknown
    // at rewrite time: numeric text = nanoseconds, otherwise timezone
    r.register("timestamp_tz_from_parts_dispatch7",
      udf((y: Long, mo: Long, d: Long, h: Long, mi: Long, sec: Long, seventh: String) => {
        val ns = if (seventh == null) Some(0L) else seventh.trim.toLongOption
        val ldt = normalizedLdt(y, mo, d, h, mi, sec, ns.getOrElse(0L))
        val z = if (ns.isDefined) zone else ZoneId.of(seventh)
        val zdt = ldt.atZone(z)
        val inst = zdt.toInstant
        TzTs(inst.getEpochSecond * 1000000L + inst.getNano / 1000,
          zdt.getOffset.getTotalSeconds / 60)
      }))
    r.register("timestamp_tz_to_timestamp", udf((t: Row) =>
      if (t == null) null
      else java.sql.Timestamp.from(Instant.ofEpochSecond(
        Math.floorDiv(ofRow(t).us, 1000000L), Math.floorMod(ofRow(t).us, 1000000L) * 1000))))
    r.register("timestamp_tz_to_date", udf((t: Row) =>
      if (t == null) null else java.sql.Date.valueOf(localDate(ofRow(t)))))
    r.register("timestamp_tz_to_string", udf((t: Row) =>
      if (t == null) null else format(ofRow(t))))
    r.register("timestamp_tz_offset", udf((t: Row) =>
      if (t == null) None else Some(ofRow(t).offset_minutes)))

    val reg = spark.sessionState.functionRegistry
    for ((name, builder) <- rewrites)
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
  }
}
