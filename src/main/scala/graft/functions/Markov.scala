package graft.functions

import java.util.zip.CRC32

import scala.collection.immutable.TreeMap
import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Encoder, Encoders, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{udaf, udf}

/** Markov-chain data masking: `markov_train` aggregate + the
  * `markov_generate` scalar (reference:
  * aggregates/aggregate_markov_tarin.rs, scalars/obfuscator.rs:126,
  * common/base/src/obfuscator.rs consume/generate) — the pair behind
  * the reference's `OBFUSCATE(t)` table function. Training folds every
  * string's code points into per-context histograms (context = crc32
  * of the last k code points, k < order, BEGIN-padded); generation
  * re-samples code points from the longest matching context, seeded by
  * a SipHash-1-3 (Rust DefaultHasher) over seed + a sliding window of
  * the original value — so equal inputs mask to equal outputs and the
  * result "looks like" the training corpus.
  *
  * Bit-exactness: crc32 over LE u32 code points (crc32fast == IEEE),
  * DefaultHasher byte stream `seed LE ++ window ++ overflow LE`, u32
  * truncating sampler (`random as u32 % range`, `random <= weight`
  * inclusive bound), train finalize that excludes count_end from
  * total — all validated against the reference's slt goldens
  * (02_0000_function_markov.test) in MarkovSpec. One deliberate
  * divergence: the reference sizes the utf8 write from the HIGH byte
  * of the packed code point (`code >> 24`), which emits broken utf8
  * for 2-3-byte chars; we size from the lead byte. ASCII behavior is
  * identical.
  *
  * Model SQL shape: ARRAY<STRUCT<hash, total, count_end BIGINT,
  * buckets MAP<BIGINT,BIGINT>>> — u32 values widened to BIGINT per the
  * SURVEY §1.2 unsigned mapping.
  */
object Markov {

  private final val Begin: Int = -1 // u32::MAX

  // RFC 3629 lead-byte widths (0 for continuation/invalid bytes)
  private val Utf8Width: Array[Int] = {
    val w = Array.fill(256)(0)
    (0x00 to 0x7f).foreach(w(_) = 1)
    (0xc2 to 0xdf).foreach(w(_) = 2)
    (0xe0 to 0xef).foreach(w(_) = 3)
    (0xf0 to 0xf4).foreach(w(_) = 4)
    w
  }

  /** (LE-packed code point, consumed bytes) */
  private def readCodePoint(data: Array[Byte], pos: Int): (Int, Int) = {
    val len = math.max(1, math.min(Utf8Width(data(pos) & 0xff), data.length - pos))
    var code = 0
    var i = 0
    while (i < len) { code |= (data(pos + i) & 0xff) << (8 * i); i += 1 }
    (code, len)
  }

  /** crc32 of the last `contextSize` elements of BEGIN*order ++ cps,
    * each fed as 4 LE bytes (reference hash_context)
    */
  private def hashContext(order: Int, contextSize: Int, cps: mutable.ArrayBuffer[Int]): Int = {
    val crc = new CRC32()
    val total = order + cps.length
    var i = total - contextSize
    while (i < total) {
      val code = if (i < order) Begin else cps(i - order)
      crc.update(code & 0xff); crc.update((code >>> 8) & 0xff)
      crc.update((code >>> 16) & 0xff); crc.update((code >>> 24) & 0xff)
      i += 1
    }
    crc.getValue.toInt
  }

  // -------------------------------------------------------------- train

  final case class Params(order: Int = 5, frequencyCutoff: Long = 0,
      numBucketsCutoff: Int = 0, frequencyAdd: Long = 0, frequencyDesaturate: Double = 0.0)

  /** histogram under construction; total is computed at finalize.
    * java collections keep the kryo buffer round-trip trivial
    */
  final class Hist extends Serializable {
    val buckets = new java.util.TreeMap[Long, Long]()
    var countEnd: Long = 0L
    def addCode(c: Long): Unit = buckets.merge(c, 1L, (a, b) => a + b)
  }

  type Model = java.util.HashMap[Int, Hist]

  private def consume(model: Model, order: Int, data: Array[Byte]): Unit = {
    val cps = mutable.ArrayBuffer.empty[Int]
    var pos = 0
    var done = false
    while (!done) {
      val next: Option[Int] =
        if (pos < data.length) {
          val (c, n) = readCodePoint(data, pos)
          pos += n
          Some(c)
        } else None
      var cs = 0
      while (cs < order) {
        val h = hashContext(order, cs, cps)
        val hist = model.computeIfAbsent(h, _ => new Hist)
        next match {
          case Some(c) => hist.addCode(c.toLong & 0xffffffffL)
          case None => hist.countEnd += 1
        }
        cs += 1
      }
      next match {
        case Some(c) => cps += c
        case None => done = true
      }
    }
  }

  /** one finalized model row; u32s widened to Long */
  final case class ModelRow(hash: Long, total: Long, count_end: Long, buckets: Map[Long, Long])

  /** the aggregate's finalize: cutoffs, then total = sum(buckets) —
    * count_end excluded; add/desaturate do NOT refresh total (matches
    * aggregate_markov_tarin.rs exactly, which differs from the base
    * MarkovModel here)
    */
  private def finalizeModel(model: Model, p: Params): Seq[ModelRow] = {
    import scala.jdk.CollectionConverters._
    model.asScala.toSeq.sortBy(_._1.toLong & 0xffffffffL).map { case (hash, h0) =>
      var buckets: TreeMap[Long, Long] = TreeMap.from(h0.buckets.asScala)
      var countEnd = h0.countEnd
      if (p.numBucketsCutoff > 0 && buckets.size < p.numBucketsCutoff)
        buckets = TreeMap.empty
      if (p.frequencyCutoff > 0)
        buckets = buckets.filter(_._2 >= p.frequencyCutoff)
      val total = (buckets.valuesIterator.sum) & 0xffffffffL
      if (p.frequencyAdd > 0 && total != 0) {
        countEnd += p.frequencyAdd
        buckets = buckets.map { case (k, v) => k -> (v + p.frequencyAdd) }
      }
      if (p.frequencyDesaturate > 0.0 && total != 0) {
        val average = (total.toDouble / buckets.size * p.frequencyDesaturate).toLong & 0xffffffffL
        buckets = buckets.map { case (k, v) =>
          k -> ((average + (v.toDouble * (1.0 - p.frequencyDesaturate)).toLong) & 0xffffffffL)
        }
      }
      ModelRow(hash.toLong & 0xffffffffL, total, countEnd & 0xffffffffL, buckets)
    }
  }

  class MarkovTrainAgg(p: Params) extends Aggregator[String, Model, Seq[ModelRow]] {
    override def zero: Model = new java.util.HashMap[Int, Hist]()
    override def reduce(b: Model, s: String): Model = {
      if (s != null) consume(b, p.order, s.getBytes("UTF-8"))
      b
    }
    override def merge(a: Model, b: Model): Model = {
      val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
      small.forEach { (h, hist) =>
        val o = big.get(h)
        if (o == null) big.put(h, hist)
        else {
          hist.buckets.forEach((k, v) => o.buckets.merge(k, v, (x, y) => x + y))
          o.countEnd += hist.countEnd
        }
      }
      big
    }
    override def finish(b: Model): Seq[ModelRow] = finalizeModel(b, p)
    override def bufferEncoder: Encoder[Model] = Encoders.kryo[Model]
    override def outputEncoder: Encoder[Seq[ModelRow]] = ExpressionEncoder()
  }

  // ----------------------------------------------------------- generate

  /** immutable sampled-lookup form of a model */
  final class Table(rows: Array[(Long, Long, Long, Array[Long], Array[Long])]) {
    private val hashes: Array[Long] = rows.map(_._1)
    def get(hash: Int): Option[(Long, Long, Array[Long], Array[Long])] = {
      val target = hash.toLong & 0xffffffffL
      val i = java.util.Arrays.binarySearch(hashes, target)
      if (i < 0) None
      else Some((rows(i)._2, rows(i)._3, rows(i)._4, rows(i)._5))
    }
  }

  def tableOf(rows: Seq[Row]): Table =
    new Table(rows.map { r =>
      val m = r.getMap[Long, Long](3)
      val codes = m.keys.toArray.sorted
      val weights = codes.map(m)
      (r.getLong(0), r.getLong(1), r.getLong(2), codes, weights)
    }.sortBy(_._1).toArray)

  /** The model column is near-always the same value on every row (a
    * trained model cross-joined against the data), but Spark hands the
    * UDF a fresh Seq[Row] per row — rebuilding the lookup would cost
    * O(model size) per masked row. A per-thread LRU (8 slots, so a
    * multi-column OBFUSCATE whose columns alternate on one task thread
    * still rebuilds once per partition, not once per row) keyed by a
    * strided content fingerprint: length + (hash,total,count_end) of
    * up to 32 evenly-spaced rows + the last row. Two DIFFERENT trained
    * models would have to agree on every sampled context hash to
    * collide — context hashes are crc32s of the training shingles, so
    * any differing row at a sampled position changes the key. O(32)
    * per masked row, which is what survives a 1B-row mask.
    */
  private val tableCache = new ThreadLocal[java.util.LinkedHashMap[java.lang.Long, Table]] {
    override def initialValue(): java.util.LinkedHashMap[java.lang.Long, Table] =
      new java.util.LinkedHashMap[java.lang.Long, Table](16, 0.75f, true) {
        override def removeEldestEntry(e: java.util.Map.Entry[java.lang.Long, Table]): Boolean =
          size > 8
      }
  }

  private def fingerprint(rows: Seq[Row]): Long = {
    val rs = rows.toIndexedSeq // Spark hands an ArraySeq: no copy
    val n = rs.length
    if (n == 0) return 0L
    var fp = 1000003L * n
    val step = math.max(1, n / 32)
    var i = 0
    while (i < n) {
      val r = rs(i)
      fp = fp * 1000003L + r.getLong(0)
      fp = fp * 1000003L + r.getLong(1)
      fp = fp * 1000003L + r.getLong(2)
      i += step
    }
    val l = rs(n - 1)
    fp = fp * 1000003L + l.getLong(0)
    fp * 1000003L + l.getLong(2)
  }

  private def cachedTableOf(rows: Seq[Row]): Table = {
    val fp = java.lang.Long.valueOf(fingerprint(rows))
    val cache = tableCache.get()
    val hit = cache.get(fp)
    if (hit != null) hit
    else {
      val t = tableOf(rows)
      cache.put(fp, t)
      t
    }
  }

  private def isAlphaNumericAscii(code: Int): Boolean =
    (code >= '0' && code <= '9') || (code >= 'A' && code <= 'Z') || (code >= 'a' && code <= 'z')

  /** reference ColumnHistogram::sample — u32-truncating, inclusive
    * bound, saturating f64->u32 cast, wrapping u32 add
    */
  private def sample(total: Long, countEnd: Long, codes: Array[Long], weights: Array[Long],
      random: Long, endMultiplier: Double): Option[Long] = {
    val extra = countEnd.toDouble * endMultiplier
    val extraU32 =
      if (extra.isNaN || extra <= 0) 0L
      else if (extra >= 4294967295.0) 4294967295L
      else extra.toLong
    val range = (total + extraU32) & 0xffffffffL
    if (range == 0) return None
    var r = (random & 0xffffffffL) % range
    var i = 0
    while (i < codes.length) {
      if (r <= weights(i)) return Some(codes(i))
      r -= weights(i)
      i += 1
    }
    None // landed in the count_end tail -> end of string
  }

  /** reference obfuscator.rs generate(); returns the masked bytes */
  def generate(table: Table, order: Int, seed: Long, maxSize: Int, desiredSize: Int,
      slidingWindowSize: Int, determinator: Array[Byte]): Option[Array[Byte]] = {
    val cps = mutable.ArrayBuffer.empty[Int]
    val out = new java.io.ByteArrayOutputStream()
    val dsize = determinator.length
    val sws = math.min(slidingWindowSize, dsize)
    var written = 0
    while (written < maxSize) {
      val reach = written >= desiredSize
      // longest matching context first; empty histograms only win when
      // no shorter context has data (try_rfold from order down to 1)
      var hit: (Long, Long, Array[Long], Array[Long]) = null
      var fallback: (Long, Long, Array[Long], Array[Long]) = null
      var size = order
      while (size >= 1 && hit == null) {
        table.get(hashContext(order, size, cps)) match {
          case Some(v) if !reach && v._1 == 0 && v._2 == 0 => fallback = v
          case Some(v) => hit = v
          case None => ()
        }
        size -= 1
      }
      val h = if (hit != null) hit else fallback
      if (h == null) return None // logical error in markov model

      val overflow = math.max(0, written + sws - dsize)
      val start = written - overflow
      val buf = java.nio.ByteBuffer.allocate(16 + sws)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.putLong(seed)
      buf.put(determinator, start, sws)
      buf.putLong(overflow.toLong)
      val det = Obfuscator.sipHash13(0L, 0L, buf.array)

      val endMult = if (reach) math.pow(1.25, (written - desiredSize).toDouble) else 0.0
      sample(h._1, h._2, h._3, h._4, det, endMult) match {
        case None => return Some(out.toByteArray)
        case Some(codeL) =>
          val code = codeL.toInt
          if (reach && (codeL & 0xffffffffL) < 128 && !isAlphaNumericAscii(code))
            return Some(out.toByteArray)
          val len = math.max(1, Utf8Width(code & 0xff))
          if (len > maxSize - written) return Some(out.toByteArray)
          var i = 0
          while (i < len) { out.write((code >>> (8 * i)) & 0xff); i += 1 }
          written += len
          cps += code
      }
    }
    Some(out.toByteArray)
  }

  // ------------------------------------------------------- registration

  private val mapper = new ObjectMapper()

  def register(spark: SparkSession): Unit = {
    spark.udf.register("markov_train", udaf(new MarkovTrainAgg(Params()), Encoders.STRING))

    spark.udf.register("markov_generate",
      udf((model: Seq[Row], params: String, seed: Long, determinator: String) => {
        if (model == null || params == null || determinator == null) null
        else {
          val node = mapper.readTree(params)
          val order = node.get("order").asInt
          val sws = node.get("sliding_window_size").asInt
          require(order > 0, "invalid order")
          require(sws > 0, "invalid sliding_window_size")
          val table = cachedTableOf(model)
          val bytes = determinator.getBytes("UTF-8")
          generate(table, order, seed, bytes.length * 2,
            determinator.codePointCount(0, determinator.length), sws, bytes) match {
            case Some(b) => new String(b, "UTF-8")
            case None => throw new IllegalStateException("logical error in markov model")
          }
        }
      }))
  }
}
