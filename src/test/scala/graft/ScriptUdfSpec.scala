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

  test("date/timestamp/binary columns round-trip through Arrow") {
    import spark.implicits._
    import org.apache.arrow.vector.{DateDayVector, TimeStampMicroTZVector, VarBinaryVector}
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-03-07"),
        java.sql.Timestamp.valueOf("2024-03-07 10:47:12.123456"),
        Array[Byte](1, 2, 3)),
      (2L, java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"),
        Array.emptyByteArray))
      .toDF("id", "d", "ts", "payload")
    val out = ScriptUdf.applyBatches(df,
      StructType(Seq(StructField("d2", DateType),
        StructField("ts2", TimestampType),
        StructField("n", LongType)))) { root =>
      val d = root.getVector("d").asInstanceOf[DateDayVector]
      val d2 = root.getVector("d2").asInstanceOf[DateDayVector]
      val ts = root.getVector("ts").asInstanceOf[TimeStampMicroTZVector]
      val ts2 = root.getVector("ts2").asInstanceOf[TimeStampMicroTZVector]
      val p = root.getVector("payload").asInstanceOf[VarBinaryVector]
      val n = root.getVector("n").asInstanceOf[org.apache.arrow.vector.BigIntVector]
      for (i <- 0 until root.getRowCount) {
        d2.setSafe(i, d.get(i) + 1)          // next day
        ts2.setSafe(i, ts.get(i) + 1000000L) // +1 second
        n.setSafe(i, p.get(i).length.toLong)
      }
    }
    val got = out.orderBy("id").collect()
    assert(got(0).getAs[java.sql.Date]("d2") == java.sql.Date.valueOf("2024-03-08"))
    assert(got(0).getAs[java.sql.Timestamp]("ts2")
      == java.sql.Timestamp.valueOf("2024-03-07 10:47:13.123456"))
    assert(got(0).getAs[Long]("n") == 3L)
    assert(got(1).getAs[java.sql.Date]("d2") == java.sql.Date.valueOf("1970-01-01"))
    assert(got(1).getAs[java.sql.Timestamp]("ts2")
      == java.sql.Timestamp.valueOf("1970-01-01 00:00:00.5"))
    assert(got(1).getAs[Long]("n") == 0L)
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
