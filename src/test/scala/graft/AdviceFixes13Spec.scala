package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Regression coverage for the round-12 advisor findings:
  *  1. a column NAMED default_value must not grow a bogus DEFAULT
  *     (`DEFAULT\s*` matched the 'default' prefix of the name);
  *  2. lenient-JSON hex scalars above Long.MaxValue degrade to a
  *     double instead of throwing a NumberFormatException that
  *     escapes try_parse_json's null contract;
  *  3. infix XOR binds LOOSER than comparison (`a = 1 XOR b = 2` is
  *     `(a=1) XOR (b=2)`), and a parenthesized RHS (`a XOR (b = 1)`)
  *     is an infix use, not a call form; shapes the capture cannot
  *     bound (adjacent AND) are left for Spark to reject loudly;
  *  4. the 1065 alias-ambiguity check compares expression text
  *     case-insensitively and only reads an ORDER BY item as an alias
  *     reference when the whole item is a lone identifier;
  *  5. non-foldable range()/generate_series lowers onto a sequence()
  *     guarded to yield ZERO rows on empty ranges instead of Spark's
  *     boundary error, and a malformed arity raises a SQL error.
  */
class AdviceFixes13Spec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-advicefix13-test")

  private def sqlHead(): GraftSql = {
    val base = Paths.get("target", "tmp")
    Files.createDirectories(base)
    GraftSql(spark, Files.createTempDirectory(base, "advice13").toString)
  }

  test("a column named default_value takes no implicit DEFAULT") {
    val g = sqlHead()
    g.execute("CREATE TABLE adv13_d (k INT, default_value INT)")
    g.execute("INSERT INTO adv13_d (k) VALUES (1)")
    val r = g.execute("SELECT k, default_value FROM adv13_d").head
    assert(r.getInt(0) == 1 && r.isNullAt(1))
    // a REAL default still applies, in both spellings
    g.execute("CREATE TABLE adv13_d2 (k INT, v INT DEFAULT 7, w INT DEFAULT(8))")
    g.execute("INSERT INTO adv13_d2 (k) VALUES (1)")
    val r2 = g.execute("SELECT v, w FROM adv13_d2").head
    assert(r2.getInt(0) == 7 && r2.getInt(1) == 8)
  }

  test("oversized hex scalars parse leniently instead of throwing") {
    graft.functions.GraftFunctions.register(spark)
    // 2^64-1 does not fit a Long: must degrade to a double-ish value
    val v = spark.sql("SELECT to_json(parse_json('0xffffffffffffffff')) AS j")
      .head.getString(0)
    assert(v.toDouble > 1.8e19)
    // and try_parse_json keeps its null-on-garbage contract for
    // hex-looking text inside otherwise unparseable input
    val n = spark.sql("SELECT try_parse_json('0xffffffffffffffffffffffff') AS j").head
    assert(!n.isNullAt(0)) // lenient hex still parses (lossy)
  }

  test("infix XOR takes comparison-level operands") {
    val g = sqlHead()
    val r = g.execute("SELECT 1 = 1 XOR 2 = 3 AS a, 1 = 2 XOR 3 = 3 AS b, " +
      "1 = 1 XOR 2 = 2 AS c").head
    assert(r.getBoolean(0) && r.getBoolean(1) && !r.getBoolean(2))
    // parenthesized RHS is infix, not a call form
    val p = g.execute("SELECT true XOR (1 = 2) AS a").head
    assert(p.getBoolean(0))
    // plain literal forms from the reference's logic suite still work
    val l = g.execute("SELECT true XOR true AS a, null XOR true AS b").head
    assert(!l.getBoolean(0) && l.isNullAt(1))
    // genuine call form untouched
    val c = g.execute("SELECT xor(true, false) AS a").head
    assert(c.getBoolean(0))
    // NOT binds tighter than XOR: (NOT a) XOR b
    val n = g.execute("SELECT NOT true XOR false AS a").head
    assert(!n.getBoolean(0))
    // an adjacent AND cannot be confidently bounded: loud, not wrong
    intercept[Exception] { g.execute("SELECT true XOR true AND true") }
  }

  test("infix REGEXP stays at comparison level") {
    val g = sqlHead()
    val r = g.execute("SELECT 'abc' REGEXP 'B' AS a, 'abc' NOT REGEXP '^b' AS b, " +
      "'a' || 'bc' REGEXP 'bc$' AS c").head
    // MySQL REGEXP is case-insensitive by default
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("ORDER BY alias-ambiguity check is case-insensitive on expressions") {
    val g = sqlHead()
    // same expression in different case: NOT ambiguous
    val ok = g.execute(
      "SELECT upper(c) AS foo, UPPER(c) AS foo FROM (SELECT 'x' AS c) ORDER BY foo")
    assert(ok.count() == 1)
    // `foo + 1` orders by an expression, not the alias: no 1065
    val expr = g.execute(
      "SELECT k AS foo, k * 10 AS foo2 FROM (SELECT 2 AS k UNION ALL SELECT 1 AS k) " +
        "ORDER BY foo + 1")
    assert(expr.collect().map(_.getInt(0)).toSeq == Seq(1, 2))
    // ASC/DESC/NULLS LAST suffixes still read as alias references
    intercept[Exception] { g.execute(
      "SELECT k AS foo, k + 1 AS foo FROM (SELECT 1 AS k) ORDER BY foo DESC NULLS LAST") }
  }

  test("empty non-foldable ranges yield zero rows, not a boundary error") {
    val g = sqlHead()
    assert(g.execute(
      "SELECT * FROM range((SELECT 5)::int, (SELECT 1)::int)").count() == 0)
    assert(g.execute(
      "SELECT * FROM range((SELECT 1)::int, (SELECT 5)::int)").count() == 4)
    assert(g.execute(
      "SELECT * FROM range((SELECT 3)::int, (SELECT 3)::int)").count() == 0)
    // single non-foldable arg: 0..n-1; non-positive -> empty
    assert(g.execute("SELECT * FROM range((SELECT 3)::int)").count() == 3)
    assert(g.execute("SELECT * FROM range((SELECT -2)::int)").count() == 0)
    // generate_series is end-inclusive; empty when step points away
    assert(g.execute(
      "SELECT * FROM generate_series((SELECT 3)::int, (SELECT 3)::int)").count() == 1)
    assert(g.execute(
      "SELECT * FROM generate_series((SELECT 5)::int, (SELECT 1)::int)").count() == 0)
    assert(g.execute(
      "SELECT * FROM generate_series((SELECT 5)::int, (SELECT 1)::int, -2)").count() == 3)
    // malformed arity is a SQL error, not an IndexOutOfBounds crash
    val ex = intercept[Exception] { g.execute("SELECT * FROM range()") }
    assert(String.valueOf(ex.getMessage).contains("range"))
  }
}
