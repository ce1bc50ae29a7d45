package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable t-digest quantile sketch (reference:
  * quantile_tdigest / median_tdigest, aggregator.rs:106-119,
  * aggregates/aggregate_quantile_tdigest.rs). Centroid-based digest
  * with size-limited recompression; fully mergeable, so partial
  * aggregation and shuffle-combine work exactly like any Spark agg.
  *
  * Exposed `_state`-style (the reference's `_state` combinator,
  * aggregator.rs:196): `tdigest_agg(x)` returns the SERIALIZED sketch;
  * `tdigest_quantile(state, q)` extracts any quantile from it. This
  * composes: states can be stored, re-merged across days
  * (`tdigest_merge_agg`), then queried — the incremental-MV shape.
  */
object TDigest {

  val Compression = 100

  /** centroids as parallel (mean, weight) arrays, kept sorted by mean */
  final case class Digest(means: Array[Double], weights: Array[Long]) {
    def n: Long = weights.sum
  }

  val empty: Digest = Digest(Array.empty, Array.empty)

  def addAll(d: Digest, values: Array[Double]): Digest =
    if (values.isEmpty) d
    else compress(merge(d, Digest(values.sorted, Array.fill(values.length)(1L))))

  /** merge two sorted centroid lists (stays sorted) */
  def merge(a: Digest, b: Digest): Digest = {
    val m = new Array[Double](a.means.length + b.means.length)
    val w = new Array[Long](m.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.means.length && j < b.means.length) {
      if (a.means(i) <= b.means(j)) { m(k) = a.means(i); w(k) = a.weights(i); i += 1 }
      else { m(k) = b.means(j); w(k) = b.weights(j); j += 1 }
      k += 1
    }
    while (i < a.means.length) { m(k) = a.means(i); w(k) = a.weights(i); i += 1; k += 1 }
    while (j < b.means.length) { m(k) = b.means(j); w(k) = b.weights(j); j += 1; k += 1 }
    Digest(m, w)
  }

  /** size-bound recompression: greedily fuse adjacent centroids while
    * respecting the t-digest size bound (k-scale, tighter near the
    * tails so tail quantiles stay accurate).
    */
  def compress(d: Digest): Digest = {
    if (d.means.length <= Compression) return d
    val total = d.n.toDouble
    val outM = new scala.collection.mutable.ArrayBuffer[Double](Compression + 8)
    val outW = new scala.collection.mutable.ArrayBuffer[Long](Compression + 8)
    var accM = d.means(0) * d.weights(0)
    var accW = d.weights(0)
    var seen = 0.0
    var i = 1
    while (i < d.means.length) {
      val q = (seen + accW + d.weights(i) / 2.0) / total
      // max centroid weight at quantile q (scale fn k1-ish)
      val limit = math.max(1.0, 4.0 * total * q * (1 - q) / Compression)
      if (accW + d.weights(i) <= limit) {
        accM += d.means(i) * d.weights(i)
        accW += d.weights(i)
      } else {
        outM += accM / accW; outW += accW
        seen += accW
        accM = d.means(i) * d.weights(i)
        accW = d.weights(i)
      }
      i += 1
    }
    outM += accM / accW; outW += accW
    Digest(outM.toArray, outW.toArray)
  }

  /** interpolated quantile from the digest */
  def quantile(d: Digest, q: Double): Double = {
    if (d.means.isEmpty) return Double.NaN
    if (d.means.length == 1) return d.means(0)
    val total = d.n.toDouble
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < d.means.length) {
      val half = d.weights(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return d.means(0)
        val prevHalf = d.weights(i - 1) / 2.0
        val lo = cum - prevHalf
        val span = half + prevHalf
        val frac = if (span <= 0) 0.0 else (target - lo) / span
        return d.means(i - 1) + (d.means(i) - d.means(i - 1)) * math.max(0.0, math.min(1.0, frac))
      }
      cum += d.weights(i)
      i += 1
    }
    d.means.last
  }

  // ---- serialization (simple length-prefixed doubles/longs) -----------
  def ser(d: Digest): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + d.means.length * 16)
    bb.putInt(d.means.length)
    d.means.foreach(bb.putDouble)
    d.weights.foreach(bb.putLong)
    bb.array()
  }

  def deser(bytes: Array[Byte]): Digest = {
    if (bytes == null || bytes.isEmpty) return empty
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = Array.fill(n)(bb.getDouble)
    val w = Array.fill(n)(bb.getLong)
    Digest(m, w)
  }

  /** buffered Aggregator: batch raw values, fold into the digest.
    * `nPending` tracks the list size so the hot reduce path is O(1)
    * per row (List.length is an O(n) walk).
    */
  final case class Buf(digest: Digest, pending: List[Double], nPending: Int)

  private def flush(b: Buf): Digest = addAll(b.digest, b.pending.toArray)

  class TDigestAgg extends Aggregator[Double, Buf, Array[Byte]] {
    override def zero: Buf = Buf(TDigest.empty, Nil, 0)
    override def reduce(b: Buf, v: Double): Buf =
      if (b.nPending >= 512) Buf(flush(b), List(v), 1)
      else Buf(b.digest, v :: b.pending, b.nPending + 1)
    override def merge(a: Buf, b: Buf): Buf =
      Buf(compress(TDigest.merge(flush(a), flush(b))), Nil, 0)
    override def finish(b: Buf): Array[Byte] = ser(flush(b))
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** quantile_tdigest_weighted (reference aggregator.rs:110-113): each
    * value carries an integer weight — a (mean=v, weight=w) centroid
    * merged directly into the digest.
    */
  class TDigestWeightedAgg extends Aggregator[(Double, Long), Digest, Array[Byte]] {
    override def zero: Digest = TDigest.empty
    override def reduce(d: Digest, v: (Double, Long)): Digest =
      if (v._2 <= 0) d
      else compress(TDigest.merge(d, Digest(Array(v._1), Array(v._2))))
    override def merge(a: Digest, b: Digest): Digest = compress(TDigest.merge(a, b))
    override def finish(d: Digest): Array[Byte] = ser(d)
    override def bufferEncoder: Encoder[Digest] = Encoders.kryo[Digest]
    override def outputEncoder: Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** re-merge previously produced states (the `_state` combinator) */
  class TDigestMergeAgg extends Aggregator[Array[Byte], Digest, Array[Byte]] {
    override def zero: Digest = TDigest.empty
    override def reduce(d: Digest, v: Array[Byte]): Digest =
      compress(TDigest.merge(d, deser(v)))
    override def merge(a: Digest, b: Digest): Digest = compress(TDigest.merge(a, b))
    override def finish(d: Digest): Array[Byte] = ser(d)
    override def bufferEncoder: Encoder[Digest] = Encoders.kryo[Digest]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }
}
