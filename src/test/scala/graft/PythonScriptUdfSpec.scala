package graft

import graft.functions.PythonScriptUdf
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Embedded Python UDFScript engine: per-row handler over Arrow IPC to a
  * python3 worker per partition (reference
  * src/query/script_udf_support/src/transform_udf_script.rs:55-93).
  * Covers the happy path, nulls, the crash path (traceback surfaced),
  * and the timeout path (worker destroyed past its budget).
  */
class PythonScriptUdfSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-pyudf-test")

  private def docs = {
    import spark.implicits._
    Seq((1L, "hello world"), (2L, "a b c"), (3L, null.asInstanceOf[String]))
      .toDF("id", "text")
  }

  test("per-row python handler computes appended columns") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    val out = PythonScriptUdf.applyRows(
      docs,
      StructType(Seq(StructField("n", LongType), StructField("up", StringType))),
      handler = "f",
      source =
        """def f(i, t):
          |    if t is None:
          |        return (None, None)
          |    return (len(t.split()), t.upper())
          |""".stripMargin)
      .orderBy("id").collect()
    assert(out.toSeq == Seq(
      Row(1L, "hello world", 2L, "HELLO WORLD"),
      Row(2L, "a b c", 3L, "A B C"),
      Row(3L, null, null, null)))
  }

  test("crashing handler surfaces the python traceback") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    val ex = intercept[Exception] {
      PythonScriptUdf.applyRows(
        docs,
        StructType(Seq(StructField("n", LongType))),
        handler = "boom",
        source = "def boom(i, t):\n    raise ValueError('kaboom-marker')\n")
        .collect()
    }
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
    assert(chain(ex).contains("kaboom-marker"))
  }

  test("hung handler is killed past its timeout budget") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    val ex = intercept[Exception] {
      PythonScriptUdf.applyRows(
        docs.repartition(1),
        StructType(Seq(StructField("n", LongType))),
        handler = "slow",
        source = "import time\ndef slow(i, t):\n    time.sleep(600)\n    return 1\n",
        timeoutMs = 3000L)
        .collect()
    }
    def chain(e: Throwable): String =
      if (e == null) "" else e.getMessage + "|" + chain(e.getCause)
    assert(chain(ex).contains("budget") || chain(ex).contains("failed"))
  }
}
