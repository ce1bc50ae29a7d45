package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.roaringbitmap.RoaringBitmap

/** Roaring-bitmap aggregates (reference: bitmap type
  * src/query/expression/src/types/bitmap.rs and the bitmap_* aggregate
  * family, src/query/functions/src/aggregates/aggregator.rs:146-173).
  *
  * Spark-first shape: a typed Aggregator whose buffer IS the roaring
  * bitmap (kryo-encoded between partial and final aggregation), so
  * map-side combine happens exactly like the reference's partial
  * aggregation states. Output is the portable serialized bitmap
  * (BinaryType) — composable with the scalar helpers below, and small
  * enough to broadcast for bitmap-join-style acceleration.
  */
object BitmapAggs {

  private def ser(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val buf = java.nio.ByteBuffer.allocate(bm.serializedSizeInBytes())
    bm.serialize(buf)
    buf.array()
  }

  def deser(bytes: Array[Byte]): RoaringBitmap = {
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(bytes))
    bm
  }

  /** bitmap_construct_agg / group_bitmap: collect int keys into a bitmap */
  class BitmapAgg extends Aggregator[Int, RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, v: Int): RoaringBitmap = { b.add(v); b }
    override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = { a.or(b); a }
    override def finish(b: RoaringBitmap): Array[Byte] = ser(b)
    override def bufferEncoder: Encoder[RoaringBitmap] = Encoders.kryo[RoaringBitmap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bitmap_union over serialized bitmaps (re-aggregate partials) */
  class BitmapUnionAgg extends Aggregator[Array[Byte], RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, v: Array[Byte]): RoaringBitmap = { b.or(deser(v)); b }
    override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = { a.or(b); a }
    override def finish(b: RoaringBitmap): Array[Byte] = ser(b)
    override def bufferEncoder: Encoder[RoaringBitmap] = Encoders.kryo[RoaringBitmap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bitmap_intersect (AND) over serialized bitmaps */
  class BitmapIntersectAgg extends Aggregator[Array[Byte], Option[RoaringBitmap], Array[Byte]] {
    override def zero: Option[RoaringBitmap] = None
    override def reduce(b: Option[RoaringBitmap], v: Array[Byte]): Option[RoaringBitmap] =
      b match {
        case None => Some(deser(v))
        case Some(bm) => bm.and(deser(v)); Some(bm)
      }
    override def merge(a: Option[RoaringBitmap], b: Option[RoaringBitmap]): Option[RoaringBitmap] =
      (a, b) match {
        case (Some(x), Some(y)) => x.and(y); Some(x)
        case (x, None) => x
        case (None, y) => y
      }
    override def finish(b: Option[RoaringBitmap]): Array[Byte] =
      ser(b.getOrElse(new RoaringBitmap()))
    override def bufferEncoder: Encoder[Option[RoaringBitmap]] = Encoders.kryo[Option[RoaringBitmap]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bitmap_xor_agg (reference aggregate_bitmap.rs BitmapXorOp):
    * symmetric difference fold — associative and commutative, so the
    * distributed partial merge is order-free.
    */
  class BitmapXorAgg extends Aggregator[Array[Byte], RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, v: Array[Byte]): RoaringBitmap = { b.xor(deser(v)); b }
    override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = { a.xor(b); a }
    override def finish(b: RoaringBitmap): Array[Byte] = ser(b)
    override def bufferEncoder: Encoder[RoaringBitmap] = Encoders.kryo[RoaringBitmap]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** bitmap_not_count's fold (reference BitmapNotOp = sub_assign):
    * first-bitmap-minus-the-rest. Set subtraction is not commutative;
    * like the reference, the result depends on accumulation order, so
    * it is only deterministic over a sorted/single-partition input.
    */
  class BitmapAndNotAgg extends Aggregator[Array[Byte], Option[RoaringBitmap], Array[Byte]] {
    override def zero: Option[RoaringBitmap] = None
    override def reduce(b: Option[RoaringBitmap], v: Array[Byte]): Option[RoaringBitmap] =
      b match {
        case None => Some(deser(v))
        case Some(bm) => bm.andNot(deser(v)); Some(bm)
      }
    override def merge(a: Option[RoaringBitmap], b: Option[RoaringBitmap]): Option[RoaringBitmap] =
      (a, b) match {
        case (Some(x), Some(y)) => x.andNot(y); Some(x)
        case (x, None) => x
        case (None, y) => y
      }
    override def finish(b: Option[RoaringBitmap]): Array[Byte] =
      ser(b.getOrElse(new RoaringBitmap()))
    override def bufferEncoder: Encoder[Option[RoaringBitmap]] = Encoders.kryo[Option[RoaringBitmap]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** intersect_count (reference aggregate_bitmap.rs
    * AggregateBitmapIntersectCountFunction): for each tag in `tags`,
    * union the bitmaps of the rows carrying that tag, then count the
    * intersection of those per-tag unions. The reference's
    * `INTERSECT_COUNT('a','b')(bm, tag)` parameterized call syntax has
    * no Spark SQL equivalent, so this is the library form: one grouped
    * union per tag (map-side partial merge), then a driver-side AND of
    * `tags.length` bitmaps.
    */
  def intersectCount(df: org.apache.spark.sql.DataFrame, bitmapCol: String,
                     tagCol: String, tags: Seq[Any]): Long = {
    import org.apache.spark.sql.functions.{col, expr}
    val unions = df.filter(col(tagCol).isin(tags: _*))
      .groupBy(col(tagCol))
      .agg(expr(s"bitmap_union_agg($bitmapCol)").as("u"))
      .collect()
    // reference semantics (its own slt): a tag with no rows is SKIPPED,
    // not treated as an empty bitmap — the intersection runs over the
    // tags that are present; all-absent yields 0
    intersectNonEmpty(unions.map(_.getAs[Array[Byte]]("u")).toSeq)
  }

  /** AND together the non-empty bitmaps and count (intersect_count's
    * merge step; absent/empty per-tag unions are skipped per reference)
    */
  def intersectNonEmpty(blobs: Seq[Array[Byte]]): Long = {
    val bms = blobs.filter(_ != null).map(deser).filter(!_.isEmpty)
    if (bms.isEmpty) 0L
    else {
      val acc = bms.head
      bms.tail.foreach(acc.and)
      acc.getLongCardinality
    }
  }

  // ---- scalar bitmap ops (reference scalars/bitmap.rs name set) -------

  private def binop(a: Array[Byte], b: Array[Byte])(
      op: (RoaringBitmap, RoaringBitmap) => Unit): Array[Byte] = {
    val x = deser(a); op(x, deser(b)); ser(x)
  }

  def buildBitmap(xs: Seq[Int]): Array[Byte] = {
    val bm = new RoaringBitmap(); xs.foreach(bm.add); ser(bm)
  }
  /** to_bitmap('1,2,3') */
  def parseBitmap(s: String): Array[Byte] =
    buildBitmap(s.split(',').iterator.map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq)
  def and(a: Array[Byte], b: Array[Byte]): Array[Byte] = binop(a, b)(_ and _)
  def or(a: Array[Byte], b: Array[Byte]): Array[Byte] = binop(a, b)(_ or _)
  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] = binop(a, b)(_ xor _)
  /** bitmap_and_not / bitmap_not: values of a not in b */
  def andNot(a: Array[Byte], b: Array[Byte]): Array[Byte] = binop(a, b)(_ andNot _)
  def hasAny(a: Array[Byte], b: Array[Byte]): Boolean =
    RoaringBitmap.intersects(deser(a), deser(b))
  /** every value of b is in a */
  def hasAll(a: Array[Byte], b: Array[Byte]): Boolean =
    RoaringBitmap.andNot(deser(b), deser(a)).isEmpty
  def bmMin(a: Array[Byte]): Option[Long] = {
    val bm = deser(a); if (bm.isEmpty) None else Some(bm.first().toLong & 0xffffffffL)
  }
  def bmMax(a: Array[Byte]): Option[Long] = {
    val bm = deser(a); if (bm.isEmpty) None else Some(bm.last().toLong & 0xffffffffL)
  }
  def toArray(a: Array[Byte]): Seq[Int] = deser(a).toArray.toSeq
  def toStr(a: Array[Byte]): String = deser(a).toArray.mkString(",")
  /** to_string display for BinaryType values: a roaring payload (magic
    * cookie 12346/12347 little-endian in the first two bytes — raw
    * binary text starting ":0" is the giveaway the cast path got it
    * wrong) renders as the reference's bitmap display, anything else
    * as utf8 text. Called from ToStringDispatch via StaticInvoke.
    */
  def bytesToDisplay(a: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    if (a == null) return null
    val isRoaring = a.length >= 4 && {
      val cookie = (a(0) & 0xff) | ((a(1) & 0xff) << 8)
      cookie == 12346 || cookie == 12347
    }
    val s =
      if (isRoaring)
        try toStr(a)
        catch { case _: Exception => new String(a, java.nio.charset.StandardCharsets.UTF_8) }
      else new String(a, java.nio.charset.StandardCharsets.UTF_8)
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
  }
  /** JSON text for a BinaryType value entering VARIANT: a roaring
    * payload becomes its value ARRAY ([0,1] — the reference's
    * bitmap->variant cast), anything else the base64 STRING Spark's
    * to_json renders for binary. Called from ToVariantJsonText.
    */
  def bytesToVariantJson(a: Array[Byte]): org.apache.spark.unsafe.types.UTF8String = {
    if (a == null) return null
    val isRoaring = a.length >= 4 && {
      val cookie = (a(0) & 0xff) | ((a(1) & 0xff) << 8)
      cookie == 12346 || cookie == 12347
    }
    val s =
      if (isRoaring)
        try "[" + toStr(a) + "]"
        catch { case _: Exception =>
          "\"" + java.util.Base64.getEncoder.encodeToString(a) + "\"" }
      else "\"" + java.util.Base64.getEncoder.encodeToString(a) + "\""
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
  }
  /** sub_bitmap(b, offset, len): `len` values starting at position `offset` */
  def subBitmap(a: Array[Byte], offset: Int, len: Int): Array[Byte] =
    buildBitmap(deser(a).toArray.toSeq.slice(offset, offset + len))
  /** bitmap_subset_in_range(b, start, end): values in [start, end) */
  def subsetInRange(a: Array[Byte], start: Long, end: Long): Array[Byte] = {
    val bm = deser(a)
    val range = new RoaringBitmap(); range.add(start, end)
    bm.and(range); ser(bm)
  }
  /** bitmap_subset_limit(b, start, limit): first `limit` values >= start */
  def subsetLimit(a: Array[Byte], start: Long, limit: Int): Array[Byte] =
    buildBitmap(deser(a).toArray.toSeq.filter(v => (v.toLong & 0xffffffffL) >= start).take(limit))
}
