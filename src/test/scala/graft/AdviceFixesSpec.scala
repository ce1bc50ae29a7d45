package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Regression coverage for the round-11 advisor findings:
  *  1. variant ordering keys derive from canonical JSON text, not a
  *     plain string cast (which unquotes strings / nulls json null);
  *  2. a user-written CAST(v AS STRING) || 'x' stays string concat
  *     (only analyzer-inserted implicit casts unwrap to jsonb concat);
  *  3. multi-level quantile_disc over an empty group returns NULL
  *     instead of throwing ELEMENT_AT_BY_INDEX_ZERO;
  *  4. `$$` spans only rewrite when a jq( call is present, and never
  *     inside quoted literals;
  *  5. SIGNED/UNSIGNED map to Int64/UInt64 only in cast context —
  *     aliases named signed/unsigned survive, and the MySQL two-word
  *     CAST(x AS UNSIGNED INTEGER) form parses.
  */
class AdviceFixesSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-advicefix-test")

  private def sqlHead(): GraftSql = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    GraftSql(spark, Files.createTempDirectory(base, "advice").toString)
  }

  test("ORDER BY / min / max over all-string variants is lexicographic") {
    graft.functions.GraftFunctions.register(spark)
    val got = spark.sql(
      """SELECT CAST(v AS STRING) AS s FROM (
        |  SELECT parse_json('"banana"') AS v
        |  UNION ALL SELECT parse_json('"apple"')
        |  UNION ALL SELECT parse_json('"cherry"')
        |) ORDER BY v""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(got == Seq("apple", "banana", "cherry"))
    val mn = spark.sql(
      """SELECT CAST(min(v) AS STRING) AS lo, CAST(max(v) AS STRING) AS hi FROM (
        |  SELECT parse_json('"banana"') AS v
        |  UNION ALL SELECT parse_json('"apple"')
        |  UNION ALL SELECT parse_json('"cherry"')
        |)""".stripMargin).head()
    assert(mn.getString(0) == "apple" && mn.getString(1) == "cherry")
    // mixed types keep the jsonb type-rank order: numbers < strings < null
    val mixed = spark.sql(
      """SELECT to_json(v) AS s FROM (
        |  SELECT parse_json('"a"') AS v
        |  UNION ALL SELECT parse_json('2')
        |  UNION ALL SELECT parse_json('null')
        |  UNION ALL SELECT parse_json('10')
        |) ORDER BY v""".stripMargin).collect().map(_.getString(0)).toSeq
    assert(mixed == Seq("2", "10", "\"a\"", "null"))
  }

  test("explicit CAST(v AS STRING) || str is string concat, bare v || x is jsonb") {
    graft.functions.GraftFunctions.register(spark)
    val g = sqlHead()
    val s = g.execute(
      """SELECT CAST(parse_json('[1,2]') AS STRING) || '-x' AS c""").head.getString(0)
    assert(s == "[1,2]-x")
    // the un-cast spelling stays jsonb concatenation
    val j = g.execute(
      """SELECT CAST(parse_json('[1,2]') || parse_json('[3]') AS STRING) AS c""")
      .head.getString(0)
    assert(j == "[1,2,3]")
  }

  test("multi-level quantile_disc over an empty group returns NULLs") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT quantile_disc(x, 0.25, 0.75) AS qs
        |FROM (SELECT CAST(NULL AS DOUBLE) AS x) WHERE x IS NOT NULL""".stripMargin)
      .collect()
    assert(r.length == 1 && r.head.isNullAt(0) ||
      r.head.getSeq[Any](0).forall(_ == null))
    // all-NULL group: collect_list is empty but the group exists
    val r2 = spark.sql(
      """SELECT quantile_disc(x, 0.5, 0.9) AS qs
        |FROM (SELECT CAST(NULL AS DOUBLE) AS x)""".stripMargin).head()
    assert(r2.isNullAt(0) || r2.getSeq[Any](0).forall(_ == null))
    // non-empty still picks elements
    val r3 = spark.sql(
      """SELECT quantile_disc(x, 0.0, 1.0) AS qs FROM (
        |  SELECT explode(array(1.0D, 2.0D, 3.0D)) AS x)""".stripMargin)
      .head().getSeq[Double](0)
    assert(r3 == Seq(1.0, 3.0))
  }

  test("$$ inside quoted literals survives statements without jq()") {
    val g = sqlHead()
    val r = g.execute("SELECT 'a$$b' AS s, '$$' AS t, length('x$$y') AS n").head
    assert(r.getString(0) == "a$$b" && r.getString(1) == "$$" && r.getInt(2) == 4)
    // jq-position dollar quoting still rewrites
    val jq = g.execute(
      """SELECT CAST(jq AS STRING) AS v FROM jq($$.a$$, '{"a": 7}')""").head
    assert(jq.getString(0) == "7")
  }

  test("to_string over timestamp resolves (eager timezone in dispatch)") {
    // ToStringDispatch's fallback cast must carry the session timezone:
    // ResolveTimeZone never revisits a RuntimeReplaceable's lazily
    // built replacement, so to_string(now()) used to INTERNAL_ERROR
    graft.functions.GraftFunctions.register(spark)
    val g = sqlHead()
    assert(g.execute("select to_string(now())").head.getString(0).length >= 19)
    assert(g.execute("select to_string(today())=substr(to_string(now()),1,10) AS b")
      .head.getBoolean(0))
  }

  test("SIGNED/UNSIGNED only rewrite in cast context") {
    val g = sqlHead()
    val r = g.execute(
      """SELECT 1 AS signed, 2 AS unsigned,
        |  CAST('12' AS UNSIGNED INTEGER) AS u,
        |  CAST('-3' AS SIGNED) AS s,
        |  CAST('12' AS UNSIGNED) AS u2,
        |  '7'::unsigned AS u3, '-7'::signed AS s3""".stripMargin).head
    assert(r.getInt(0) == 1 && r.getInt(1) == 2)
    assert(r.getDecimal(2).longValue == 12L)
    assert(r.getLong(3) == -3L)
    assert(r.getDecimal(4).longValue == 12L)
    assert(r.getDecimal(5).longValue == 7L)
    assert(r.getLong(6) == -7L)
  }
}
