package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BinaryType
  * payloads + typed metadata, processed per-partition.
  *
  * The decode step is a STUB (this container ships no image/audio
  * libs): `fakeDecode` derives deterministic "image" properties from
  * the raw bytes. Everything around it — schema, batch-shaped
  * mapPartitions, decoder-instance reuse per partition, column
  * contracts — is the real production shape: swap `fakeDecode` for a
  * JNI/javacv decoder and nothing else changes. At 100 TB the decode
  * cost dominates, so the per-partition loop (one decoder instance,
  * sequential batch) is the right execution shape, not a per-row UDF.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** STUB decoder: deterministic pseudo-properties from payload bytes.
    * A real implementation would decode the container header here.
    */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    val width = 32 + (n % 224)
    val height = 32 + ((n * 7) % 224)
    var sum = 0L
    var i = 0
    while (i < n) { sum += bytes(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    (width, height, mean)
  }

  /** "video" frame sampling stub: frames of `frameSize` bytes, keep
    * every `stride`-th — returns the sampled frame count.
    */
  def sampleFrames(nBytes: Int, frameSize: Int, stride: Int): Int = {
    val frames = (nBytes + frameSize - 1) / frameSize
    (frames + stride - 1) / stride
  }

  /** Batch feature extraction over (doc_id, payload) — one decoder
    * context per partition, rows streamed through it.
    */
  def extractFeatures(spark: SparkSession, binaryDocs: DataFrame,
      frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val rdd = binaryDocs.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // real impl: val decoder = Decoder.acquire() — reused across rows
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, mean) = fakeDecode(bytes)
          Row(id, w, h, bytes.length, mean, sampleFrames(bytes.length, frameSize, stride))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }
}
