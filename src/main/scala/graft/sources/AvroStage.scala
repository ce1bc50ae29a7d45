package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import scala.jdk.CollectionConverters._

/** Avro stage read/write (reference stage format Avro,
  * src/meta/app/src/principal/file_format.rs:67-76). The Spark
  * distribution here ships avro-core/avro-mapred but not the external
  * spark-avro datasource module, so this implements the container-file
  * round trip directly on the Avro core library: distributed write via
  * mapPartitions (one container file per partition), distributed read
  * via a parallelized file list. Paths are filesystem paths reachable
  * from every executor (stage dirs; on a cluster that means shared
  * storage, same assumption the reference's stages make).
  *
  * Type surface: the Avro primitives + timestamp-micros / date logical
  * types — the types stage files carry in practice.
  */
object AvroStage {

  private def avroSchema(schema: StructType): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case StringType => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType | TimestampNTZType =>
          val s = Schema.create(Schema.Type.LONG)
          org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
        case DateType =>
          val s = Schema.create(Schema.Type.INT)
          org.apache.avro.LogicalTypes.date().addToSchema(s)
        case other => throw new IllegalArgumentException(s"avro stage: unsupported $other")
      }
      val union = Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      new Schema.Field(f.name, union, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_stage", null, "graft", false, fields.toList.asJava)
  }

  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val schemaJson = avroSchema(schema).toString
    val dir = new File(path)
    if (dir.exists()) {
      dir.listFiles().foreach(_.delete())
    } else dir.mkdirs()
    df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val avro = new Schema.Parser().parse(schemaJson)
      val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avro))
      val f = new File(dir, f"part-$pid%05d.avro")
      writer.create(avro, f)
      var n = 0L
      rows.foreach { row =>
        val rec = new GenericData.Record(avro)
        schema.fields.zipWithIndex.foreach { case (field, i) =>
          val v = if (row.isNullAt(i)) null else field.dataType match {
            case TimestampType | TimestampNTZType =>
              // external type differs: TIMESTAMP -> java.sql.Timestamp,
              // TIMESTAMP_NTZ -> java.time.LocalDateTime
              val micros = row.get(i) match {
                case ts: java.sql.Timestamp =>
                  ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
                case ldt: java.time.LocalDateTime =>
                  val inst = ldt.toInstant(java.time.ZoneOffset.UTC)
                  inst.getEpochSecond * 1000000L + inst.getNano / 1000L
                case inst: java.time.Instant =>
                  inst.getEpochSecond * 1000000L + inst.getNano / 1000L
              }
              java.lang.Long.valueOf(micros)
            case DateType =>
              java.lang.Integer.valueOf(row.get(i) match {
                case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
                case d: java.time.LocalDate => d.toEpochDay.toInt
              })
            case StringType => row.get(i).toString
            case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case ShortType | ByteType => java.lang.Integer.valueOf(row.getAs[Number](i).intValue())
            case _ => row.get(i).asInstanceOf[AnyRef]
          }
          rec.put(field.name, v)
        }
        writer.append(rec)
        n += 1
      }
      writer.close()
      Iterator.single(n)
    }.count() // force the write
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro")).map(_.getAbsolutePath).sorted
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val reader = new DataFileReader[GenericRecord](
          new File(f), new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (reader.hasNext) {
          val rec = reader.next()
          out += Row.fromSeq(schema.fields.toIndexedSeq.map { field =>
            val v = rec.get(field.name)
            if (v == null) null else field.dataType match {
              case TimestampType =>
                new java.sql.Timestamp(v.asInstanceOf[Long] / 1000L)
              case TimestampNTZType =>
                val micros = v.asInstanceOf[Long]
                java.time.LocalDateTime.ofInstant(
                  java.time.Instant.ofEpochSecond(
                    Math.floorDiv(micros, 1000000L),
                    Math.floorMod(micros, 1000000L) * 1000L),
                  java.time.ZoneOffset.UTC)
              case DateType =>
                java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
              case StringType => v.toString
              case ShortType => v.asInstanceOf[Int].toShort
              case ByteType => v.asInstanceOf[Int].toByte
              case BinaryType =>
                val bb = v.asInstanceOf[java.nio.ByteBuffer]
                val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
              case _ => v
            }
          })
        }
        reader.close()
        out
      }
    spark.createDataFrame(rdd, schema)
  }
}
