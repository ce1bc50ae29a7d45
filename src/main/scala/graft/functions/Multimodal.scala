package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque BinaryType
  * payloads + typed metadata, processed per-partition.
  *
  * The HEADER decode is real (round 6): `decodeHeader` parses
  * dimensions + format from PNG (IHDR), JPEG (SOFn marker scan), GIF
  * (logical screen descriptor) and BMP (BITMAPINFOHEADER) magic —
  * pure-JVM byte inspection, the same job as the container probe in a
  * production ingest. PIXEL decode stays a stub (`fakeDecode`, this
  * container ships no codec libs): payloads without a recognized
  * image signature get deterministic pseudo-properties. Everything
  * around the decoders — schema, batch-shaped mapPartitions,
  * decoder-instance reuse per partition, column contracts — is the
  * production shape: swap `fakeDecode` for a JNI/javacv decoder and
  * nothing else changes. At 100 TB the decode cost dominates, so the
  * per-partition loop (one decoder instance, sequential batch) is the
  * right execution shape, not a per-row UDF.
  */
object Multimodal {

  // ---- real container-header parsing ---------------------------------

  private def beU16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def beI32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def leU16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leI32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** (format, width, height) from the container magic, or None when no
    * known signature matches (public formats: PNG sig+IHDR; JPEG
    * SOI + marker walk to SOF0-15 minus DHT/RST/DAC; GIF87a/89a
    * logical screen; BMP BITMAPINFOHEADER)
    */
  def decodeHeader(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length >= 24 &&
        (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a)
      Some(("png", beI32(b, 16), beI32(b, 20)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // marker stream desync
        val m = b(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          return Some(("jpeg", beU16(b, i + 7), beU16(b, i + 5)))
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7)) i += 2 // no-payload markers
        else i += 2 + beU16(b, i + 2)
      }
      None
    } else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
               (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", leU16(b, 6), leU16(b, 8)))
    else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M' && leI32(b, 14) >= 40)
      Some(("bmp", leI32(b, 18), math.abs(leI32(b, 22))))
    else None
  }

  // deterministic header builders (test fixtures + gate queries — the
  // parser above must round-trip them; CRCs are not validated)
  def pngBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    o.write(Array(0, 0, 0, 13).map(_.toByte)); o.write("IHDR".getBytes)
    for (v <- Seq(w, h)) { o.write(v >>> 24); o.write(v >>> 16); o.write(v >>> 8); o.write(v) }
    o.write(Array(8, 2, 0, 0, 0).map(_.toByte)) // bit depth, color, comp, filter, interlace
    o.write(new Array[Byte](4)) // crc (unvalidated)
    o.write(body); o.toByteArray
  }

  def jpegBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array(0xff, 0xd8).map(_.toByte))                   // SOI
    o.write(Array(0xff, 0xe0, 0, 16).map(_.toByte))            // APP0 len 16
    o.write("JFIF".getBytes); o.write(new Array[Byte](10))
    o.write(Array(0xff, 0xc0, 0, 11, 8).map(_.toByte))         // SOF0 len 11, precision
    o.write(h >>> 8); o.write(h); o.write(w >>> 8); o.write(w)
    o.write(Array(1, 1, 0x11, 0).map(_.toByte))                // 1 component
    o.write(body); o.toByteArray
  }

  def gifBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("GIF89a".getBytes)
    o.write(w & 0xff); o.write(w >>> 8); o.write(h & 0xff); o.write(h >>> 8)
    o.write(Array(0, 0, 0).map(_.toByte)) // packed, bg, aspect
    o.write(body); o.toByteArray
  }

  def bmpBytes(w: Int, h: Int, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("BM".getBytes); o.write(new Array[Byte](12)) // size+reserved+offset (unvalidated)
    o.write(Array(40, 0, 0, 0).map(_.toByte))            // BITMAPINFOHEADER size
    for (v <- Seq(w, h)) { o.write(v & 0xff); o.write((v >>> 8) & 0xff)
      o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff) }
    o.write(new Array[Byte](28)) // planes/bpp/compression/...
    o.write(body); o.toByteArray
  }

  /** fixed header sizes of the builders above, for oracles */
  val HeaderLen: Map[String, Int] = Map("png" -> 33, "jpeg" -> 33, "gif" -> 13, "bmp" -> 54)

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
    * context per partition, rows streamed through it. Payloads with a
    * recognized image signature get their REAL header dimensions;
    * anything else falls back to the pixel-stub properties.
    */
  def extractFeatures(spark: SparkSession, binaryDocs: DataFrame,
      frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val rdd = binaryDocs.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        // real impl: val decoder = Decoder.acquire() — reused across rows
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (w, h, mean) = decodeHeader(bytes) match {
            case Some((_, hw, hh)) => (hw, hh, fakeDecode(bytes)._3)
            case None              => fakeDecode(bytes)
          }
          Row(id, w, h, bytes.length, mean, sampleFrames(bytes.length, frameSize, stride))
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  val headerSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false)))

  /** header-only probe over (doc_id, payload): format + dimensions from
    * the container magic; unrecognized payloads report ("raw", 0, 0)
    */
  def probeHeaders(spark: SparkSession, binaryDocs: DataFrame): DataFrame = {
    val rdd = binaryDocs.select(col("doc_id").cast("long"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val (fmt, w, h) = decodeHeader(bytes).getOrElse(("raw", 0, 0))
          Row(id, fmt, w, h, bytes.length)
        }
      }
    spark.createDataFrame(rdd, headerSchema)
  }
}
