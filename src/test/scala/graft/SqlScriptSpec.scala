package graft

import graft.operators.SqlScript
import org.scalatest.funsuite.AnyFunSuite

/** SQL scripting / EXECUTE IMMEDIATE (SURVEY §2.11) — cases mirror the
  * reference's execute_immediate suite semantics (LET, RESULTSET
  * cursors, FOR ranges and row loops, WHILE, IF, RETURN).
  */
class SqlScriptSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 8, appName = "graft-script-test")

  private def run1(script: String): Any =
    SqlScript.executeImmediate(spark, script).head().get(0)

  test("RETURN NULL") {
    assert(run1("$$ BEGIN RETURN NULL; END; $$") == null)
  }

  test("LET + arithmetic + RETURN") {
    assert(run1(
      """$$
        |BEGIN
        |  LET x := 40;
        |  LET y := x + 2;
        |  RETURN y;
        |END;
        |$$""".stripMargin).toString.toInt == 42)
  }

  test("FOR range loop with bounds from variables") {
    // reference case: x=-1; for x in x to x+3 -> -1+0+1+2 = 2
    assert(run1(
      """$$
        |BEGIN
        |  LET x := -1;
        |  LET sum := 0;
        |  FOR x IN x TO x + 3 DO
        |    sum := sum + x;
        |  END FOR;
        |  RETURN sum;
        |END;
        |$$""".stripMargin).toString.toInt == 2)
  }

  test("FOR over inline SELECT accumulates row fields") {
    assert(run1(
      """$$
        |BEGIN
        |  LET sum := 0;
        |  FOR r IN SELECT id FROM range(10) DO
        |    sum := sum + r.id;
        |  END FOR;
        |  RETURN sum;
        |END;
        |$$""".stripMargin).toString.toInt == 45)
  }

  test("FOR loop errors past graft.script.forRowsLimit instead of collecting") {
    spark.conf.set("graft.script.forRowsLimit", "5")
    try {
      val e = intercept[IllegalStateException](run1(
        """$$
          |BEGIN
          |  LET n := 0;
          |  FOR r IN SELECT id FROM range(10) DO
          |    n := n + 1;
          |  END FOR;
          |  RETURN n;
          |END;
          |$$""".stripMargin))
      assert(e.getMessage.contains("forRowsLimit"))
      // under the cap still works
      assert(run1(
        """$$
          |BEGIN
          |  LET n := 0;
          |  FOR r IN SELECT id FROM range(4) DO
          |    n := n + 1;
          |  END FOR;
          |  RETURN n;
          |END;
          |$$""".stripMargin).toString.toInt == 4)
    } finally spark.conf.unset("graft.script.forRowsLimit")
  }

  test("LET RESULTSET cursor + FOR over it") {
    assert(run1(
      """$$
        |BEGIN
        |  LET res RESULTSET := SELECT id % 3 AS a, id % 4 AS b FROM range(10);
        |  LET sum := 0;
        |  FOR x IN res DO
        |    LET a := x.a;
        |    LET b := x.b;
        |    sum := sum + a;
        |    sum := sum + b;
        |  END FOR;
        |  RETURN sum;
        |END;
        |$$""".stripMargin).toString.toInt == 22)
  }

  test("WHILE with BREAK and IF/ELSE") {
    assert(run1(
      """$$
        |BEGIN
        |  LET n := 0;
        |  LET acc := 0;
        |  WHILE true DO
        |    n := n + 1;
        |    IF n > 5 THEN
        |      BREAK;
        |    ELSE
        |      acc := acc + n;
        |    END IF;
        |  END WHILE;
        |  RETURN acc;
        |END;
        |$$""".stripMargin).toString.toInt == 15)
  }

  test("RETURN TABLE(query) yields a DataFrame result") {
    val df = SqlScript.executeImmediate(spark,
      """$$
        |BEGIN
        |  LET k := 3;
        |  RETURN TABLE(SELECT id FROM range(10) WHERE id < :k ORDER BY id);
        |END;
        |$$""".stripMargin)
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("CREATE PROCEDURE / CALL with positional args") {
    SqlScript.createProcedure("add_n", Seq("a", "b"),
      """$$
        |BEGIN
        |  LET s := a + b;
        |  RETURN s;
        |END;
        |$$""".stripMargin)
    assert(SqlScript.call(spark, "add_n", Seq(19, 23)).head().get(0).toString.toInt == 42)
    assert(SqlScript.call(spark, "ADD_N", Seq(1, 1)).head().get(0).toString.toInt == 2)
    SqlScript.dropProcedure("add_n")
    intercept[IllegalArgumentException](SqlScript.call(spark, "add_n", Seq(1, 2)))
  }

  test("statements execute for effect (temp view visible to script)") {
    val out = run1(
      """$$
        |BEGIN
        |  CREATE OR REPLACE TEMPORARY VIEW script_v AS SELECT 7 AS v;
        |  LET x := (SELECT v FROM script_v);
        |  RETURN x * 6;
        |END;
        |$$""".stripMargin)
    assert(out.toString.toInt == 42)
  }
}
