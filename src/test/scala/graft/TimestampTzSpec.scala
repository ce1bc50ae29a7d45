package graft

import java.time.ZoneId

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TimestampTz
import graft.functions.TimestampTz.TzTs

/** TIMESTAMP_TZ parse/format unit coverage beyond the oracle query:
  * offset spellings, fraction rounding, session-zone fallback, DST
  * resolution, round-trip stability.
  */
class TimestampTzSpec extends AnyFunSuite {
  private val utc = ZoneId.of("UTC")

  test("offset spellings parse to the same instant") {
    val base = TimestampTz.parse("2024-03-10 12:00:00+00:00", utc)
    assert(TimestampTz.parse("2024-03-10 12:00:00Z", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10 12:00:00UTC", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10T12:00:00+0000", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10 17:30:00+05:30", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10 17:30:00+0530", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10 04:00:00-08:00", utc).us == base.us)
    assert(TimestampTz.parse("2024-03-10 04:00:00-8", utc).us == base.us)
    // offsets preserved, not normalized
    assert(TimestampTz.parse("2024-03-10 17:30:00+05:30", utc).offset_minutes == 330)
    assert(TimestampTz.parse("2024-03-10 04:00:00-08:00", utc).offset_minutes == -480)
  }

  test("fractions round to microseconds") {
    assert(TimestampTz.parse("2024-01-01 00:00:00.123456Z", utc).us % 1000000L == 123456L)
    assert(TimestampTz.parse("2024-01-01 00:00:00.1234567Z", utc).us % 1000000L == 123457L)
    assert(TimestampTz.parse("2024-01-01 00:00:00.5Z", utc).us % 1000000L == 500000L)
  }

  test("no offset resolves in the session zone, DST-aware") {
    val ny = ZoneId.of("America/New_York")
    val winter = TimestampTz.parse("2024-01-15 12:00:00", ny)
    val summer = TimestampTz.parse("2024-07-15 12:00:00", ny)
    assert(winter.offset_minutes == -300) // EST
    assert(summer.offset_minutes == -240) // EDT
    assert(TimestampTz.parse("2024-01-15", ny).offset_minutes == -300) // date-only
  }

  test("format round-trips and trims trailing fraction zeros") {
    val t = TzTs(1705314600000000L, 330)
    assert(TimestampTz.parse(TimestampTz.format(t), utc) == t)
    assert(TimestampTz.format(TzTs(0L, 0)) == "1970-01-01 00:00:00+00:00")
    assert(TimestampTz.format(TzTs(500000L, 0)) == "1970-01-01 00:00:00.5+00:00")
    assert(TimestampTz.format(TzTs(-3600000000L, -90)) endsWith "-01:30")
  }

  test("malformed input throws; local date respects the offset") {
    intercept[IllegalArgumentException](TimestampTz.parse("not a time", utc))
    // 23:30 at -02:00 is the NEXT day in UTC but the local date sticks
    val t = TimestampTz.parse("2024-05-31 23:30:00-02:00", utc)
    val spark = GraftSession(cpus = 2, appName = "graft-tz-test")
    graft.functions.TimestampTz.register(spark)
    val row = spark.sql(
      s"SELECT CAST(timestamp_tz_to_date(named_struct('us', ${t.us}L, 'offset_minutes', -120)) AS STRING)")
      .collect()(0)
    assert(row.getString(0) == "2024-05-31")
  }
}
