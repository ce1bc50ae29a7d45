package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

import Geometry._

/** Geometry aggregates over EWKB columns (reference:
  * aggregates/aggregate_geographic_agg.rs — st_collect :722,
  * st_envelope_agg :712; st_union_agg needs the polygon-clipping
  * engine and stays out of scope with st_union).
  *
  * st_collect buffers raw EWKB values (O(1) per row, single combine at
  * finish); st_envelope_agg folds a 4-double bbox (constant state —
  * safe for any group size at scale).
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

  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_collect", udaf(new StCollectAgg, Encoders.BINARY))
    spark.udf.register("st_envelope_agg", udaf(new StEnvelopeAgg, Encoders.BINARY))
  }
}
