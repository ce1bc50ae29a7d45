package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

import Geometry._

/** Geometry aggregates over EWKB columns (reference:
  * aggregates/aggregate_geographic_agg.rs — st_collect :722,
  * st_envelope_agg :712, st_union_agg :692, st_intersection_agg :702).
  *
  * st_collect buffers raw EWKB values (O(1) per row, single combine at
  * finish); st_envelope_agg folds a 4-double bbox (constant state —
  * safe for any group size at scale). st_union_agg batches pending
  * geometries and cascade-unions through the Martinez engine in
  * [[Clip]] every `UnionBatch` rows, so per-row cost stays amortized
  * O(sweep of batch) instead of re-sweeping an ever-growing
  * accumulator; st_intersection_agg intersects row-by-row (the
  * accumulator only shrinks) and short-circuits to empty forever once
  * the running intersection empties.
  */
object GeoAggs {

  /** collect geometries into MULTIPOINT / MULTILINESTRING /
    * MULTIPOLYGON when homogeneous, GEOMETRYCOLLECTION otherwise
    */
  class StCollectAgg extends Aggregator[Array[Byte], ArrayBuffer[Array[Byte]], Array[Byte]] {
    override def zero: ArrayBuffer[Array[Byte]] = ArrayBuffer.empty
    override def reduce(b: ArrayBuffer[Array[Byte]], v: Array[Byte]): ArrayBuffer[Array[Byte]] = {
      if (v != null) b += v
      b
    }
    override def merge(a: ArrayBuffer[Array[Byte]], b: ArrayBuffer[Array[Byte]]): ArrayBuffer[Array[Byte]] =
      a ++= b
    override def finish(b: ArrayBuffer[Array[Byte]]): Array[Byte] = {
      if (b.isEmpty) return null
      val gs = b.map(fromWkb).toVector
      val srid = gs.head.srid
      val shapes = gs.map(_.shape)
      val combined =
        if (shapes.forall(_.isInstanceOf[GPoint]))
          GMultiPoint(shapes.collect { case GPoint(p) => p })
        else if (shapes.forall(_.isInstanceOf[GLineString]))
          GMultiLineString(shapes.collect { case GLineString(l) => l })
        else if (shapes.forall(_.isInstanceOf[GPolygon]))
          GMultiPolygon(shapes.collect { case GPolygon(r) => r })
        else GCollection(shapes)
      toWkb(Geom(combined, srid), withSrid = true)
    }
    override def bufferEncoder: Encoder[ArrayBuffer[Array[Byte]]] =
      Encoders.kryo[ArrayBuffer[Array[Byte]]]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** running bbox (constant-size state) */
  case class Env(found: Boolean, x0: Double, y0: Double, x1: Double, y1: Double, srid: Int)

  class StEnvelopeAgg extends Aggregator[Array[Byte], Env, Array[Byte]] {
    override def zero: Env = Env(found = false, 0, 0, 0, 0, 0)
    override def reduce(b: Env, v: Array[Byte]): Env = {
      if (v == null) b
      else {
        val g = fromWkb(v)
        val (x0, y0, x1, y1) = bbox(g.shape)
        if (!b.found) Env(found = true, x0, y0, x1, y1, g.srid)
        else Env(found = true, math.min(b.x0, x0), math.min(b.y0, y0),
          math.max(b.x1, x1), math.max(b.y1, y1), b.srid)
      }
    }
    override def merge(a: Env, b: Env): Env =
      if (!a.found) b
      else if (!b.found) a
      else Env(found = true, math.min(a.x0, b.x0), math.min(a.y0, b.y0),
        math.max(a.x1, b.x1), math.max(a.y1, b.y1), a.srid)
    override def finish(b: Env): Array[Byte] =
      if (!b.found) null
      else {
        val boxed = envelope(GMultiPoint(Vector(Pt(b.x0, b.y0), Pt(b.x1, b.y1))))
        toWkb(Geom(boxed, b.srid), withSrid = true)
      }
    override def bufferEncoder: Encoder[Env] = Encoders.product[Env]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  // ------------------------------------------------- clipping aggregates

  private val UnionBatch = 32

  /** state: unioned-so-far EWKB (null = none yet) + pending raw EWKBs */
  case class ClipState(acc: Array[Byte], pending: ArrayBuffer[Array[Byte]], empty: Boolean)

  private def sridOf(bs: Seq[Array[Byte]]): Int =
    bs.iterator.map(fromWkb(_).srid).find(_ != 0).getOrElse(0)

  private def flushUnion(s: ClipState): ClipState = {
    if (s.pending.isEmpty) return s
    val all = (Option(s.acc).toSeq ++ s.pending).toVector
    val srid = sridOf(all)
    val parts = all.map(b => GeometryOps.partsOf(fromWkb(b).shape))
    val polys = GeometryOps.unionAll(parts.flatMap(_.polys))
    val merged = GeometryOps.assemble(polys, parts.flatMap(_.lines), parts.flatMap(_.points))
    ClipState(merged.map(m => toWkb(Geom(m, srid), withSrid = true)).orNull,
      ArrayBuffer.empty, empty = false)
  }

  class StUnionAgg extends Aggregator[Array[Byte], ClipState, Array[Byte]] {
    override def zero: ClipState = ClipState(null, ArrayBuffer.empty, empty = false)
    override def reduce(b: ClipState, v: Array[Byte]): ClipState = {
      if (v == null) b
      else {
        b.pending += v
        if (b.pending.length >= UnionBatch) flushUnion(b) else b
      }
    }
    override def merge(a: ClipState, b: ClipState): ClipState = {
      val fa = flushUnion(a); val fb = flushUnion(b)
      if (fa.acc == null) fb
      else if (fb.acc == null) fa
      else flushUnion(ClipState(fa.acc, ArrayBuffer(fb.acc), empty = false))
    }
    override def finish(b: ClipState): Array[Byte] = flushUnion(b).acc
    override def bufferEncoder: Encoder[ClipState] = Encoders.kryo[ClipState]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  class StIntersectionAgg extends Aggregator[Array[Byte], ClipState, Array[Byte]] {
    override def zero: ClipState = ClipState(null, ArrayBuffer.empty, empty = false)
    override def reduce(b: ClipState, v: Array[Byte]): ClipState = {
      if (v == null || b.empty) b
      else if (b.acc == null && b.pending.isEmpty) ClipState(v, ArrayBuffer.empty, empty = false)
      else intersectInto(b, v)
    }
    private def intersectInto(b: ClipState, v: Array[Byte]): ClipState = {
      val srid = sridOf(Seq(b.acc, v))
      GeometryOps.intersection(fromWkb(b.acc).shape, fromWkb(v).shape) match {
        case Some(s) => ClipState(toWkb(Geom(s, srid), withSrid = true), ArrayBuffer.empty, empty = false)
        case None => ClipState(null, ArrayBuffer.empty, empty = true)
      }
    }
    override def merge(a: ClipState, b: ClipState): ClipState = {
      if (a.empty) a
      else if (b.empty) b
      else if (a.acc == null) b
      else if (b.acc == null) a
      else intersectInto(a, b.acc)
    }
    override def finish(b: ClipState): Array[Byte] = if (b.empty) null else b.acc
    override def bufferEncoder: Encoder[ClipState] = Encoders.kryo[ClipState]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_collect", udaf(new StCollectAgg, Encoders.BINARY))
    spark.udf.register("st_envelope_agg", udaf(new StEnvelopeAgg, Encoders.BINARY))
    spark.udf.register("st_union_agg", udaf(new StUnionAgg, Encoders.BINARY))
    spark.udf.register("st_intersection_agg", udaf(new StIntersectionAgg, Encoders.BINARY))
  }
}
