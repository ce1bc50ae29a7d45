package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Spatial radius join (reference: physical_spatial_join.rs /
  * transform_spatial_join.rs) as a grid-cell decomposition — the same
  * bucket-then-verify shape as the band range join: no nested-loop, no
  * cross join, only an equi-join on cell ids plus an exact
  * great-circle re-check.
  *
  * Left rows are assigned to their single containing cell; right rows
  * are expanded to every cell their radius-disc can touch (latitude
  * step is constant; longitude step widens with 1/cos(lat), computed
  * per row). Cell width is chosen = radius, so the expansion is a
  * small constant (~3×3 at low latitudes). At 100 TB both sides
  * shuffle once on (cellLat, cellLon) — the candidate pair count is
  * bounded by real spatial co-location, never |L|·|R|.
  *
  * Latitudes above ±85° are rejected (longitude cells degenerate at
  * the poles; a polar-cap pass would handle them separately).
  */
object GeoJoin {

  private val MetersPerDegLat = 111194.93 // EarthRadius * pi / 180

  /** Join rows of `left` to rows of `right` within `radiusMeters`
    * great-circle distance. Output: left.* , right.* , `distance_m`.
    */
  def radiusJoin(left: DataFrame, lLon: Column, lLat: Column,
                 right: DataFrame, rLon: Column, rLat: Column,
                 radiusMeters: Double): DataFrame = {
    require(radiusMeters > 0)
    val stepDeg = radiusMeters / MetersPerDegLat
    // longitude cells are modular so discs wrap across the antimeridian
    val nLon = math.max(1L, math.ceil(360.0 / stepDeg).toLong)

    val l = left
      .withColumn("__lon_l", lLon.cast("double"))
      .withColumn("__lat_l", lLat.cast("double"))
      .filter(abs(col("__lat_l")) <= 85.0)
      .withColumn("__cla", floor(col("__lat_l") / stepDeg))
      .withColumn("__clo",
        pmod(floor((col("__lon_l") + 180.0) / stepDeg).cast("long"), lit(nLon)))

    // Per-row longitude reach in cells, from inverting the haversine:
    // pairs within d have sin²(Δλ/2) ≤ sin²(d/2R)/(cosφ1·cosφ2), so
    // Δλmax = 2·asin(sin(r/2R)/cosφmin) with φmin the largest |lat| a
    // matching left row can have (right's lat band ± one cell). The
    // naive along-parallel bound r/(R·cosφ) underestimates Δλ at high
    // latitude, where great circles shortcut toward the pole.
    val r0 = right
      .withColumn("__lon_r", rLon.cast("double"))
      .withColumn("__lat_r", rLat.cast("double"))
      .filter(abs(col("__lat_r")) <= 85.0)
    val halfChord = math.sin(radiusMeters / (2.0 * Geo.EarthRadius))
    val cosMin = cos(radians(least(abs(col("__lat_r")), lit(85.0)) + lit(stepDeg)))
    val dLamDeg = degrees(lit(2.0) * asin(least(lit(1.0), lit(halfChord) / cosMin)))
    val lonReach = ceil(dLamDeg / stepDeg).cast("long")
    val rawLon = floor((col("__lon_r") + 180.0) / stepDeg).cast("long")
    val r = r0
      .withColumn("__cla", explode(sequence(
        floor(col("__lat_r") / stepDeg).cast("long") - 1L,
        floor(col("__lat_r") / stepDeg).cast("long") + 1L)))
      // distinct after the wrap: a reach spanning the whole circle must
      // not emit the same cell twice (duplicate join pairs)
      .withColumn("__clo", explode(array_distinct(
        transform(sequence(rawLon - lonReach, rawLon + lonReach),
          c => pmod(c, lit(nLon))))))

    l.join(r, Seq("__cla", "__clo"))
      .withColumn("distance_m",
        Geo.greatCircleDistance(col("__lon_l"), col("__lat_l"),
          col("__lon_r"), col("__lat_r")))
      .filter(col("distance_m") <= radiusMeters)
      .drop("__cla", "__clo", "__lon_l", "__lat_l", "__lon_r", "__lat_r")
  }
}
