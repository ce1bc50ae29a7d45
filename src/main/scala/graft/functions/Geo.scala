package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geo scalar surface (reference:
  * src/query/functions/src/scalars/geographic/src/geo.rs —
  * great_circle_distance/geo_distance :119-143, geohash_encode :145-180,
  * EARTH_RADIUS :69). Distances are pure built-in trig Columns (fully
  * codegen'd); geohash is a small Scala UDF (string builder, not a scan
  * hot path).
  *
  * Argument order follows the reference: (lon1, lat1, lon2, lat2).
  */
object Geo {

  /** reference geo.rs:69 (mean earth radius, meters) */
  val EarthRadius = 6371007.180918475

  /** Haversine great-circle distance in meters — sphere model, matching
    * the reference's GeoMethod::SphereMeters (geo.rs:727).
    */
  def greatCircleDistance(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2.0
    val dLon = radians(lon2 - lon1) / 2.0
    val a = pow(sin(dLat), 2.0) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2.0)
    lit(2.0 * EarthRadius) * asin(least(lit(1.0), sqrt(a)))
  }

  /** Great-circle central angle in degrees (reference
    * GeoMethod::SphereDegrees, geo.rs:128-134).
    */
  def greatCircleAngle(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column =
    degrees(greatCircleDistance(lon1, lat1, lon2, lat2) / EarthRadius)

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Standard geohash encoding (reference geo.rs:145-180; same bit
    * interleaving as the geohash crate — lon first on even bits).
    */
  def geohashEncodeImpl(lon: Double, lat: Double, precision: Int): String = {
    val p = math.max(1, math.min(12, precision))
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    val sb = new StringBuilder(p)
    var isLon = true
    var bits = 0
    var ch = 0
    while (sb.length < p) {
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { ch = (ch << 1) | 1; lonLo = mid }
        else { ch = ch << 1; lonHi = mid }
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { ch = (ch << 1) | 1; latLo = mid }
        else { ch = ch << 1; latHi = mid }
      }
      isLon = !isLon
      bits += 1
      if (bits == 5) { sb.append(Base32(ch)); bits = 0; ch = 0 }
    }
    sb.toString
  }

  /** Decode a geohash to its cell bounds (latLo, latHi, lonLo, lonHi). */
  def geohashBounds(hash: String): (Double, Double, Double, Double) = {
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var isLon = true
    for (c <- hash; i <- 4 to 0 by -1) {
      val bit = (Base32.indexOf(c.toLower) >> i) & 1
      if (isLon) {
        val mid = (lonLo + lonHi) / 2
        if (bit == 1) lonLo = mid else lonHi = mid
      } else {
        val mid = (latLo + latHi) / 2
        if (bit == 1) latLo = mid else latHi = mid
      }
      isLon = !isLon
    }
    (latLo, latHi, lonLo, lonHi)
  }

  /** Decode a geohash to the center of its cell (lon, lat). */
  def geohashDecodeImpl(hash: String): (Double, Double) = {
    val (latLo, latHi, lonLo, lonHi) = geohashBounds(hash)
    ((lonLo + lonHi) / 2, (latLo + latHi) / 2)
  }

  /** SQL-callable registrations (databend names). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geohash_encode",
      udf((lon: Double, lat: Double) => geohashEncodeImpl(lon, lat, 12)))
    spark.udf.register("geohash_encode_precision",
      udf((lon: Double, lat: Double, p: Int) => geohashEncodeImpl(lon, lat, p)))
    spark.udf.register("geohash_decode",
      udf((h: String) => geohashDecodeImpl(h)))
  }
}
