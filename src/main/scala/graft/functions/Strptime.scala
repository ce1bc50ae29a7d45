package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** chrono-style strptime (reference string->datetime parse with an
  * explicit %-format, datetime.rs register_string_to_timestamp
  * 2-arg tier; PG-token formats arrive here already translated by
  * GraftFunctions.pgToStrftime):
  *
  *  - numeric fields take 1..N digits (chrono is not fixed-width:
  *    '8时' parses %H时);
  *  - whitespace in the format matches ANY amount of input
  *    whitespace, including none ('MM month' matches '02month');
  *  - %z applies the written offset; otherwise the session zone;
  *  - the whole input must be consumed (trailing blanks aside);
  *  - an unsupported specifier is an error (the reference rejects
  *    MySQL's %i with error 1006).
  *
  * zoneId is filled in by [[DatetimeCoercionRule]] (null until then)
  * so offset-less parses land in the session timezone.
  */
case class Strptime(child: Expression, fmt: String, forDate: Boolean,
    zoneId: String) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = if (forDate) DateType else TimestampType
  override def nullable: Boolean = true
  override def foldable: Boolean = child.foldable
  override lazy val resolved: Boolean =
    zoneId != null && childrenResolved

  @transient private lazy val zone =
    java.time.ZoneId.of(if (zoneId == null) "UTC" else zoneId)

  override def nullSafeEval(input: Any): Any = {
    // a DATE result is the CIVIL date as written — parse at UTC so a
    // non-UTC session zone can't shift it across midnight
    // (to_date('9999/12/31','%Y/%m/%d') under Asia/Shanghai)
    if (forDate) {
      val micros = Strptime.parse(input.toString, fmt, java.time.ZoneOffset.UTC)
      java.lang.Math.floorDiv(micros, 86400000000L).toInt
    } else Strptime.parse(input.toString, fmt, zone)
  }
  override protected def withNewChildInternal(newChild: Expression): Strptime =
    copy(child = newChild)
}

object Strptime {

  private val MonthAbbrev = Map(
    "jan" -> 1, "feb" -> 2, "mar" -> 3, "apr" -> 4, "may" -> 5, "jun" -> 6,
    "jul" -> 7, "aug" -> 8, "sep" -> 9, "oct" -> 10, "nov" -> 11, "dec" -> 12)
  private val MonthFull = Map(
    "january" -> 1, "february" -> 2, "march" -> 3, "april" -> 4, "may" -> 5,
    "june" -> 6, "july" -> 7, "august" -> 8, "september" -> 9,
    "october" -> 10, "november" -> 11, "december" -> 12)

  /** parse `s` with strftime format `fmt`; returns UTC micros.
    * Throws IllegalArgumentException on mismatch.
    */
  def parse(s: String, fmt0: String, zone: java.time.ZoneId): Long = {
    // composite specifiers expand first
    val fmt = fmt0.replace("%T", "%H:%M:%S").replace("%F", "%Y-%m-%d")
      .replace("%D", "%m/%d/%y").replace("%R", "%H:%M")

    var y = 1970; var mo = 1; var d = 1
    var h = 0; var mi = 0; var se = 0; var micros = 0
    var off: java.time.ZoneOffset = null
    var pm: Option[Boolean] = None
    var epoch: Option[Long] = None
    var isoWeek = -1; var isoDow = -1
    var civil = false // any non-%s field parsed

    var i = 0 // format position
    var j = 0 // input position
    def err(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"1006: cannot parse '$s' with format '$fmt0': $msg")

    def digits(max: Int): Int = {
      val start = j
      while (j < s.length && j - start < max && s.charAt(j).isDigit) j += 1
      if (j == start) err(s"expected digits at position $start")
      s.substring(start, j).toInt
    }

    def name(): String = {
      val start = j
      while (j < s.length && s.charAt(j).isLetter) j += 1
      if (j == start) err(s"expected a name at position $start")
      s.substring(start, j).toLowerCase
    }

    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%' && i + 1 < fmt.length) {
        fmt.charAt(i + 1) match {
          case 'Y' | 'G' =>
            val neg = j < s.length && (s.charAt(j) == '-' || s.charAt(j) == '+')
            val sign = if (neg && s.charAt(j) == '-') -1 else 1
            if (neg) j += 1
            y = sign * digits(4); civil = true
          // ISO week / ISO weekday (with %G week-based year)
          case 'V' => isoWeek = digits(2); civil = true
          case 'u' => isoDow = digits(1); civil = true
          case 'y' =>
            val v = digits(2); y = if (v < 70) 2000 + v else 1900 + v
            civil = true
          case 'm' => mo = digits(2); civil = true
          case 'd' | 'e' => d = digits(2); civil = true
          case 'H' | 'k' => h = digits(2); civil = true
          case 'I' | 'l' => h = digits(2); civil = true
          case 'M' => mi = digits(2); civil = true
          case 'S' => se = digits(2); civil = true
          case 'f' =>
            val start = j
            while (j < s.length && s.charAt(j).isDigit) j += 1
            if (j == start) err("expected fraction digits")
            micros = s.substring(start, j).padTo(6, '0').take(6).toInt
          case 's' => epoch = Some({
            val start = j
            if (j < s.length && (s.charAt(j) == '-')) j += 1
            while (j < s.length && s.charAt(j).isDigit) j += 1
            s.substring(start, j).toLong
          })
          case 'b' | 'h' =>
            mo = MonthAbbrev.getOrElse(name().take(3),
              err("bad abbreviated month"))
          case 'B' =>
            mo = MonthFull.getOrElse(name(), err("bad month name"))
          case 'a' | 'A' => name() // weekday names carry no information
          case 'p' | 'P' =>
            val n = name()
            if (n == "pm") pm = Some(true)
            else if (n == "am") pm = Some(false)
            else err("expected AM/PM")
          case 'j' => // day of year
            val doy = digits(3)
            val ld = java.time.LocalDate.ofYearDay(y, doy)
            mo = ld.getMonthValue; d = ld.getDayOfMonth
          case 'z' =>
            if (j < s.length && (s.charAt(j) == 'Z')) { off = java.time.ZoneOffset.UTC; j += 1 }
            else {
              if (j >= s.length || (s.charAt(j) != '+' && s.charAt(j) != '-'))
                err("expected a UTC offset")
              val start = j
              j += 1
              while (j < s.length && (s.charAt(j).isDigit || s.charAt(j) == ':')) j += 1
              val o = s.substring(start, j)
              val norm = if (o.contains(":")) o else o.take(3) + ":" + o.drop(3)
              off = java.time.ZoneOffset.of(norm)
            }
          case '%' =>
            if (j >= s.length || s.charAt(j) != '%') err("expected %")
            j += 1
          case other => err(s"unsupported format specifier %$other")
        }
        i += 2
      } else if (c.isWhitespace) {
        // whitespace in the format matches zero or more in the input
        while (j < s.length && s.charAt(j).isWhitespace) j += 1
        i += 1
      } else {
        if (j >= s.length || s.charAt(j) != c) err(s"literal '$c' not found")
        j += 1; i += 1
      }
    }
    // format exhausted: TRAILING input is ignored (reference jiff
    // strptime — to_timestamp('...8时58分59秒', '%Y年%m月%d日，%H')
    // parses the hour and drops the rest)

    // %s (epoch seconds) combines with NO civil field (reference:
    // to_timestamp('200,2000', '%s,%Y') is error 1006)
    if (epoch.isDefined && civil)
      err("%s cannot combine with other datetime fields")
    epoch match {
      case Some(sec) => sec * 1000000L
      case None =>
        val hour = pm match {
          case Some(true) => if (h == 12) 12 else h + 12
          case Some(false) => if (h == 12) 0 else h
          case None => h
        }
        val ldt = try {
          val date =
            if (isoWeek >= 0)
              java.time.LocalDate.ofYearDay(y, 4) // week 1 always holds Jan 4
                .`with`(java.time.temporal.IsoFields.WEEK_OF_WEEK_BASED_YEAR,
                  isoWeek.toLong)
                .`with`(java.time.temporal.ChronoField.DAY_OF_WEEK,
                  (if (isoDow >= 1) isoDow else 1).toLong)
            else java.time.LocalDate.of(y, mo, d)
          java.time.LocalDateTime.of(date,
            java.time.LocalTime.of(hour, mi, se, micros * 1000))
        } catch { case e: Exception => err(e.getMessage) }
        val zdt = if (off != null) ldt.atOffset(off).toZonedDateTime else ldt.atZone(zone)
        val inst = zdt.toInstant
        val us = inst.getEpochSecond * 1000000L + inst.getNano / 1000L
        if (us < -62135596800000000L || us > 253402300799999999L)
          err("out of the timestamp domain")
        us
    }
  }
}
