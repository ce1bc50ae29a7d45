package graft.functions

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.types.{FloatingPointPrecision, TimeUnit => ArrowTimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Script-UDF surface: user code applied per Arrow RecordBatch.
  *
  * Reference: databend's UDFScript runtime
  * (src/query/script_udf_support/src/transform_udf_script.rs) feeds each
  * input block to an embedded JS/Python/WASM runtime as an Arrow
  * RecordBatch and reads an Arrow array back. The Spark-first
  * re-expression keeps the exact batch contract — rows are marshalled
  * into a real Arrow `VectorSchemaRoot`, the handler transforms batch ->
  * batch, and results unmarshal back into the plan — executed inside
  * `mapPartitions`, so it distributes like any other narrow transform
  * and never touches the driver.
  *
  * Embedded script ENGINES: `language = "native"` takes a JVM batch
  * handler; Python scripts are executed by [[PythonScriptUdf]] (one
  * python3 worker per partition, Arrow IPC both ways — the same data
  * plane as the reference's embedded runtime pool); "javascript" |
  * "wasm" raise the same UNSUPPORTED error databend raises for an
  * unknown language, making them documented extension points rather
  * than silent stubs.
  *
  * Supported Arrow column types: Int32/Int64/Float32/Float64/Utf8/
  * Bool/Date32/Timestamp(us, UTC)/VarBinary — the scalar subset the
  * reference's arrow-udf examples use plus the temporal/binary types a
  * data pipeline needs.
  */
object ScriptUdf {

  type BatchHandler = VectorSchemaRoot => Unit

  /** Apply `handler` to the input as a sequence of Arrow batches.
    *
    * The handler receives a `VectorSchemaRoot` holding BOTH the input
    * columns (populated) and the output columns (allocated, to fill),
    * named by `outputs`. It must set every output position (null is
    * fine). Output columns are appended to the input row.
    *
    * @param language  "native" executes; "javascript"/"python"/"wasm"
    *                  raise UNSUPPORTED (no embedded engine offline).
    * @param batchSize rows per Arrow batch (the reference batches by
    *                  block size; 8192 mirrors its default max block).
    */
  def applyBatches(
      df: DataFrame,
      outputs: StructType,
      language: String = "native",
      batchSize: Int = 8192)(handler: BatchHandler): DataFrame = {
    language match {
      case "native" => // executable in-JVM
      case "python" =>
        throw new UnsupportedOperationException(
          "python UDFScripts use the per-row contract: call " +
            "PythonScriptUdf.applyRows (subprocess pool + Arrow IPC)")
      case "javascript" | "wasm" =>
        throw new UnsupportedOperationException(
          s"UDFScript language '$language' needs an embedded engine " +
            "(arrow-udf runtime) that is not available in this build; " +
            "use language='native' with a JVM handler or python")
      case other =>
        throw new IllegalArgumentException(s"unknown UDF language '$other'")
    }
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ outputs.fields)
    (inSchema.fields ++ outputs.fields).foreach(f => arrowType(f.dataType))
    val enc = Encoders.row(outSchema)

    df.mapPartitions { rows =>
      if (rows.isEmpty) Iterator.empty
      else {
        val allocator = new RootAllocator(Long.MaxValue)
        val arrowFields: Seq[Field] = (inSchema.fields ++ outputs.fields).map { f =>
          new Field(f.name,
            new FieldType(true, arrowType(f.dataType), null), null)
        }.toSeq
        val root = VectorSchemaRoot.create(
          new ArrowSchema(arrowFields.asJava), allocator)
        val nIn = inSchema.fields.length
        rows.grouped(batchSize).flatMap { batch =>
          root.allocateNew()
          // marshal input rows -> Arrow vectors
          batch.zipWithIndex.foreach { case (row, i) =>
            var c = 0
            while (c < nIn) {
              writeCell(root.getVector(c), i, if (row.isNullAt(c)) null else row.get(c))
              c += 1
            }
          }
          root.setRowCount(batch.size)
          handler(root)
          root.setRowCount(batch.size) // set value counts on output vectors too
          val out = (0 until batch.size).map { i =>
            Row.fromSeq((0 until root.getFieldVectors.size()).map { c =>
              readCell(root.getVector(c), i)
            })
          }
          root.clear()
          out
        } ++ { root.close(); allocator.close(); Iterator.empty }
      }
    }(enc)
  }

  private[graft] def arrowType(dt: DataType): ArrowType = dt match {
    case IntegerType => new ArrowType.Int(32, true)
    case LongType => new ArrowType.Int(64, true)
    case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
    case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
    case StringType => ArrowType.Utf8.INSTANCE
    case BooleanType => ArrowType.Bool.INSTANCE
    case DateType => new ArrowType.Date(org.apache.arrow.vector.types.DateUnit.DAY)
    case TimestampType => new ArrowType.Timestamp(ArrowTimeUnit.MICROSECOND, "UTC")
    case BinaryType => ArrowType.Binary.INSTANCE
    case other => throw new IllegalArgumentException(
      s"ScriptUdf supports int/long/float/double/string/boolean/date/" +
        s"timestamp/binary columns, got $other")
  }

  private[graft] def writeCell(v: FieldVector, i: Int, value: Any): Unit = (v, value) match {
    case (x: IntVector, null) => x.setNull(i)
    case (x: IntVector, a: Int) => x.setSafe(i, a)
    case (x: BigIntVector, null) => x.setNull(i)
    case (x: BigIntVector, a: Long) => x.setSafe(i, a)
    case (x: Float8Vector, null) => x.setNull(i)
    case (x: Float8Vector, a: Double) => x.setSafe(i, a)
    case (x: VarCharVector, null) => x.setNull(i)
    case (x: VarCharVector, a: String) => x.setSafe(i, a.getBytes("UTF-8"))
    case (x: BitVector, null) => x.setNull(i)
    case (x: BitVector, a: Boolean) => x.setSafe(i, if (a) 1 else 0)
    case (x: Float4Vector, null) => x.setNull(i)
    case (x: Float4Vector, a: Float) => x.setSafe(i, a)
    case (x: DateDayVector, null) => x.setNull(i)
    case (x: DateDayVector, a: java.sql.Date) => x.setSafe(i, a.toLocalDate.toEpochDay.toInt)
    case (x: DateDayVector, a: java.time.LocalDate) => x.setSafe(i, a.toEpochDay.toInt)
    case (x: TimeStampMicroTZVector, null) => x.setNull(i)
    case (x: TimeStampMicroTZVector, a: java.sql.Timestamp) =>
      x.setSafe(i, a.getTime * 1000L + (a.getNanos % 1000000) / 1000)
    case (x: TimeStampMicroTZVector, a: java.time.Instant) =>
      x.setSafe(i, a.getEpochSecond * 1000000L + a.getNano / 1000)
    case (x: VarBinaryVector, null) => x.setNull(i)
    case (x: VarBinaryVector, a: Array[Byte]) => x.setSafe(i, a)
    case (x, a) => throw new IllegalArgumentException(
      s"cannot write ${a.getClass} into ${x.getClass}")
  }

  private[graft] def readCell(v: FieldVector, i: Int): Any =
    if (v.isNull(i)) null
    else v match {
      case x: IntVector => x.get(i)
      case x: BigIntVector => x.get(i)
      case x: Float8Vector => x.get(i)
      case x: VarCharVector => new String(x.get(i), "UTF-8")
      case x: BitVector => x.get(i) == 1
      case x: Float4Vector => x.get(i)
      case x: DateDayVector => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(x.get(i).toLong))
      case x: TimeStampMicroTZVector =>
        val us = x.get(i)
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
        t
      case x: VarBinaryVector => x.get(i)
      case x => throw new IllegalArgumentException(s"unsupported vector ${x.getClass}")
    }
}
