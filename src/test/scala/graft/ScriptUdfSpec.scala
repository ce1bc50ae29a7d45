package graft

import graft.functions.ScriptUdf
import org.apache.arrow.vector.{BigIntVector, Float8Vector, VarCharVector}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Arrow-batch script UDF: marshal/handler/unmarshal round trip,
  * batching, nulls, and the unsupported-language contract. */
class ScriptUdfSpec extends AnyFunSuite {
  private lazy val spark = GraftSession(cpus = 4, appName = "graft-scriptudf-test")

  test("arrow handler output matches the expression equivalent") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"doc $i text"))
      .toDF("id", "text").repartition(3)
    // handler: out0 = id * 2, out1 = upper(text) — written against the
    // raw Arrow vectors, exactly what an arrow-udf script sees
    val out = ScriptUdf.applyBatches(df,
      StructType(Seq(StructField("id2", LongType), StructField("up", StringType))),
      batchSize = 128) { root =>
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val id2 = root.getVector("id2").asInstanceOf[BigIntVector]
      val txt = root.getVector("text").asInstanceOf[VarCharVector]
      val up = root.getVector("up").asInstanceOf[VarCharVector]
      for (i <- 0 until root.getRowCount) {
        id2.setSafe(i, id.get(i) * 2)
        up.setSafe(i, new String(txt.get(i), "UTF-8").toUpperCase.getBytes("UTF-8"))
      }
    }
    val expected = df.select(col("id"), col("text"),
      (col("id") * 2).as("id2"), upper(col("text")).as("up"))
    assert(out.except(expected).isEmpty && expected.except(out).isEmpty)
    assert(out.count() == 1000)
  }

  test("null inputs pass through; handler can emit nulls") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0)), (2L, None), (3L, Some(9.0)))
      .toDF("id", "x")
    val out = ScriptUdf.applyBatches(df,
      StructType(Seq(StructField("sqrt_x", DoubleType)))) { root =>
      val x = root.getVector("x").asInstanceOf[Float8Vector]
      val y = root.getVector("sqrt_x").asInstanceOf[Float8Vector]
      for (i <- 0 until root.getRowCount)
        if (x.isNull(i)) y.setNull(i) else y.setSafe(i, math.sqrt(x.get(i)))
    }
    val got = out.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.get(2)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq((1L, Some(math.sqrt(2.0))), (2L, None), (3L, Some(3.0))))
  }

  test("embedded-engine languages raise the documented error") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "text")
    val schema = StructType(Seq(StructField("y", LongType)))
    for (lang <- Seq("javascript", "python", "wasm"))
      assertThrows[UnsupportedOperationException] {
        ScriptUdf.applyBatches(df, schema, language = lang)(_ => ())
      }
    assertThrows[IllegalArgumentException] {
      ScriptUdf.applyBatches(df, schema, language = "cobol")(_ => ())
    }
  }
}
