package graft

import graft.functions.{PyScalarUdf, PythonScriptUdf}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** PyUdfBatchRule: SQL-declared python scalar UDFs must execute through
  * the Arrow batch engine (one worker round-trip per batch), not the
  * per-row JSON fallback — the reference hands whole DataBlocks to its
  * script runtimes (transform_udf_script.rs:55-93). The per-row counter
  * staying at zero IS the ≤1-call-per-batch assertion: the only other
  * execution path is applyRows, whose protocol is batch-wise by
  * construction.
  */
class PyUdfBatchSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-pybatch-test")

  private def register(): Unit = {
    PyScalarUdf.register(spark, PyScalarUdf.PyFn(
      "py_double_it", Seq(LongType), LongType,
      "dbl", "def dbl(x):\n    return None if x is None else 2 * x\n"))
    PyScalarUdf.register(spark, PyScalarUdf.PyFn(
      "py_shout", Seq(StringType), StringType,
      "up", "def up(s):\n    return None if s is None else s.upper()\n"))
  }

  test("SELECT-list python UDF lowers to one MapPartitions, zero per-row calls") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    register()
    // a Range leaf (not a LocalRelation — ConvertToLocalRelation would
    // evaluate the UDF at plan time and hide the lowering)
    spark.range(1, 4).toDF("id")
      .selectExpr("id",
        "CASE id WHEN 1 THEN 'ab' WHEN 2 THEN 'cd' ELSE NULL END AS s")
      .createOrReplaceTempView("pybatch_t")
    PyScalarUdf.rowCalls.set(0L)
    val df = spark.sql(
      "SELECT id, py_double_it(id + 10) AS d, py_shout(s) AS u FROM pybatch_t")
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collect {
      case m: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => m
    }.size == 2, s"expected two Arrow stages, got:\n$plan")
    assert(plan.expressions.flatMap(_.collect {
      case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF
          if u.udfName.exists(n => n.contains("py_")) => u
    }).isEmpty, "python ScalaUDF survived lowering")
    val rows = df.orderBy("id").collect().toSeq
    assert(rows == Seq(Row(1L, 22L, "AB"), Row(2L, 24L, "CD"), Row(3L, 26L, null)))
    assert(PyScalarUdf.rowCalls.get() == 0L,
      s"per-row fallback ran ${PyScalarUdf.rowCalls.get()} times")
  }

  test("WHERE-clause python UDF lowers and preserves output schema") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    register()
    spark.range(1, 4).toDF("id")
      .selectExpr("id", "CASE id WHEN 2 THEN 'cd' ELSE 'ab' END AS s")
      .createOrReplaceTempView("pybatch_f")
    PyScalarUdf.rowCalls.set(0L)
    val df = spark.sql(
      "SELECT id, s FROM pybatch_f WHERE py_shout(s) = 'AB' ORDER BY id")
    assert(df.queryExecution.optimizedPlan.collect {
      case m: org.apache.spark.sql.catalyst.plans.logical.MapPartitions => m
    }.nonEmpty, "filter python UDF not lowered")
    assert(df.collect().toSeq == Seq(Row(1L, "ab"), Row(3L, "ab")))
    assert(df.schema.fieldNames.toSeq == Seq("id", "s"))
    assert(PyScalarUdf.rowCalls.get() == 0L)
  }

  test("unsupported shapes keep the per-row fallback and stay correct") {
    assume(PythonScriptUdf.available, "python3+pyarrow not on this host")
    register()
    PyScalarUdf.register(spark, PyScalarUdf.PyFn(
      "py_arr_sum", Seq(ArrayType(LongType)), LongType,
      "asum", "def asum(xs):\n    return None if xs is None else sum(xs)\n"))
    PyScalarUdf.rowCalls.set(0L)
    val rows = spark.sql("SELECT py_arr_sum(array(1, 2, 3)) AS v").collect()
    assert(rows.toSeq == Seq(Row(6L)))
    assert(PyScalarUdf.rowCalls.get() > 0L, "array path should use the fallback")
  }
}
