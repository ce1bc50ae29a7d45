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
}
