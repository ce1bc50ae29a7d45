package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.operators.GeoJoin

/** Geo surface (reference geographic/geo.rs) + spatial radius join
  * (reference physical_spatial_join.rs). The testdata has no
  * coordinate columns, so both engines derive deterministic synthetic
  * lon/lat from integer keys with identical arithmetic — the oracle
  * replays the same formulas, so distances and join pairs are exact.
  */
object GeoQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // identical on both sides: lat in [-58, 58], lon in [-170, 170]
  private def lat(key: String) = (pmod(col(key) * 37, lit(116)) - 58) + lit(0.25)
  private def lon(key: String) = (pmod(col(key) * 91, lit(340)) - 170) + lit(0.5)
  private val latSql = (k: String) => s"(($k * 37) % 116 + 116) % 116 - 58 + 0.25"
  private val lonSql = (k: String) => s"(($k * 91) % 340 + 340) % 340 - 170 + 0.5"

  // haversine distances customer -> a fixed point + geohash cell id
  private val geoFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.filter(col("c_custkey") < 200)
        .select(col("c_custkey"),
          lon("c_custkey").as("lon"), lat("c_custkey").as("lat"))
        .select(col("c_custkey"), col("lon"), col("lat"),
          round(Geo.greatCircleDistance(col("lon"), col("lat"), lit(2.35), lit(48.85)) / 1000.0, 3)
            .as("km_to_paris"),
          round(Geo.greatCircleAngle(col("lon"), col("lat"), lit(0.0), lit(0.0)), 5)
            .as("angle_to_origin"))
        .orderBy(col("c_custkey"))
    },
    Some(s"""SELECT c_custkey,
      |  ${lonSql("c_custkey")} AS lon,
      |  ${latSql("c_custkey")} AS lat,
      |  round(2 * 6371007.180918475 *
      |    asin(least(1.0, sqrt(
      |      pow(sin(radians(48.85 - (${latSql("c_custkey")})) / 2), 2) +
      |      cos(radians(${latSql("c_custkey")})) * cos(radians(48.85)) *
      |      pow(sin(radians(2.35 - (${lonSql("c_custkey")})) / 2), 2)))) / 1000.0, 3)
      |    AS km_to_paris,
      |  round(degrees(2 *
      |    asin(least(1.0, sqrt(
      |      pow(sin(radians(0.0 - (${latSql("c_custkey")})) / 2), 2) +
      |      cos(radians(${latSql("c_custkey")})) * cos(radians(0.0)) *
      |      pow(sin(radians(0.0 - (${lonSql("c_custkey")})) / 2), 2))))), 5)
      |    AS angle_to_origin
      |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin))

  // spatial radius join: customers within 750 km of a supplier "hub"
  // (grid-cell decomposition — no cross join; oracle brute-forces the
  // same pairs at sf0.01 scale)
  private val radiusJoin = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val cust = x.customer
        .select(col("c_custkey"), lon("c_custkey").as("clon"), lat("c_custkey").as("clat"))
      val hubs = x.supplier.filter(col("s_suppkey") < 40)
        .select(col("s_suppkey"), lon("s_suppkey").as("slon"), lat("s_suppkey").as("slat"))
      GeoJoin.radiusJoin(cust, col("clon"), col("clat"),
          hubs, col("slon"), col("slat"), 750000.0)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("distance_m") / 1000.0, 3).as("km"))
        .orderBy(col("c_custkey"), col("s_suppkey"))
    },
    Some(s"""WITH cust AS (
      |  SELECT c_custkey, ${lonSql("c_custkey")} AS clon, ${latSql("c_custkey")} AS clat
      |  FROM customer),
      |hubs AS (
      |  SELECT s_suppkey, ${lonSql("s_suppkey")} AS slon, ${latSql("s_suppkey")} AS slat
      |  FROM supplier WHERE s_suppkey < 40),
      |pairs AS (
      |  SELECT c_custkey, s_suppkey,
      |    2 * 6371007.180918475 * asin(least(1.0, sqrt(
      |      pow(sin(radians(slat - clat) / 2), 2) +
      |      cos(radians(clat)) * cos(radians(slat)) *
      |      pow(sin(radians(slon - clon) / 2), 2)))) AS d
      |  FROM cust CROSS JOIN hubs)
      |SELECT c_custkey, s_suppkey, round(d / 1000.0, 3) AS km
      |FROM pairs WHERE d <= 750000.0
      |ORDER BY c_custkey, s_suppkey""".stripMargin))

  // geo aggregates on point columns (reference st_envelope_agg /
  // st_collect / st_centroid, aggregator.rs:182-185 — the WKB wrapper
  // is out of scope; the aggregation semantics are these min/max/mean
  // folds): per-region bounding box + centroid of customer points
  private val envelope = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer
        .select((col("c_nationkey") % 5).as("zone"),
          lon("c_custkey").as("lon"), lat("c_custkey").as("lat"))
        .groupBy(col("zone"))
        .agg(
          min(col("lon")).as("env_min_lon"), min(col("lat")).as("env_min_lat"),
          max(col("lon")).as("env_max_lon"), max(col("lat")).as("env_max_lat"),
          round(avg(col("lon")), 6).as("centroid_lon"),
          round(avg(col("lat")), 6).as("centroid_lat"),
          count(lit(1)).as("n_points"))
        .orderBy(col("zone"))
    },
    Some(s"""SELECT c_nationkey % 5 AS zone,
      |  min(${lonSql("c_custkey")}) AS env_min_lon,
      |  min(${latSql("c_custkey")}) AS env_min_lat,
      |  max(${lonSql("c_custkey")}) AS env_max_lon,
      |  max(${latSql("c_custkey")}) AS env_max_lat,
      |  round(avg(${lonSql("c_custkey")}), 6) AS centroid_lon,
      |  round(avg(${latSql("c_custkey")}), 6) AS centroid_lat,
      |  count(*) AS n_points
      |FROM customer GROUP BY zone ORDER BY zone""".stripMargin))

  // st_* geometry surface (functions/Geometry + GeometryFunctions —
  // reference geographic/geometry.rs): every output is either a string
  // the oracle rebuilds verbatim or arithmetic DuckDB replays; libm-
  // dependent values (mercator y, azimuth) round like geo_fns does.
  private val geometry = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql(s"""
        |WITH pts AS (
        |  SELECT c_custkey,
        |    CAST(${lonSql("c_custkey")} AS DOUBLE) AS lon,
        |    CAST(${latSql("c_custkey")} AS DOUBLE) AS lat
        |  FROM customer WHERE c_custkey < 60),
        |g AS (SELECT c_custkey, lon, lat, st_makepoint(lon, lat) AS p FROM pts)
        |SELECT c_custkey,
        |  st_astext(p) AS wkt,
        |  st_x(st_geomfromtext(st_astext(p))) AS px,
        |  st_y(st_geomfromwkb(st_aswkb(p))) AS py,
        |  round(st_distance(p, st_makepoint(0, 0)), 3) AS dist_o,
        |  round(st_length(st_makeline(p, st_makepoint(0, 0))), 3) AS line_len,
        |  st_contains(st_geomfromtext('POLYGON((-50 -30,50 -30,50 30,-50 30,-50 -30))'), p)
        |    AS in_box,
        |  st_dwithin(p, st_makepoint(0, 0), 100.0) AS near_o,
        |  round(st_x(st_transform(st_setsrid(p, 4326), 3857)), 3) AS merc_x,
        |  round(st_y(st_transform(st_setsrid(p, 4326), 3857)), 2) AS merc_y,
        |  round(st_azimuth(p, st_makepoint(0, 0)), 5) AS az,
        |  st_asewkt(st_setsrid(p, 4326)) AS ewkt,
        |  st_srid(st_setsrid(p, 3857)) AS srid,
        |  st_npoints(st_envelope(st_makeline(p, st_makepoint(0, 0)))) AS env_pts,
        |  round(st_area(st_envelope(st_makeline(p, st_makepoint(0, 0)))), 4) AS env_area
        |FROM g ORDER BY c_custkey""".stripMargin)
    },
    Some(s"""WITH pts AS (
      |  SELECT c_custkey,
      |    CAST(${lonSql("c_custkey")} AS DOUBLE) AS lon,
      |    CAST(${latSql("c_custkey")} AS DOUBLE) AS lat
      |  FROM customer WHERE c_custkey < 60)
      |SELECT c_custkey,
      |  'POINT(' || CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR) || ')' AS wkt,
      |  lon AS px,
      |  lat AS py,
      |  round(sqrt(lon * lon + lat * lat), 3) AS dist_o,
      |  round(sqrt(lon * lon + lat * lat), 3) AS line_len,
      |  (lon > -50 AND lon < 50 AND lat > -30 AND lat < 30) AS in_box,
      |  sqrt(lon * lon + lat * lat) <= 100.0 AS near_o,
      |  round(round(lon * 6378137.0 * pi() / 180.0, 6), 3) AS merc_x,
      |  round(round(6378137.0 * ln(tan(pi() / 4 + radians(lat) / 2)), 6), 2) AS merc_y,
      |  round(CASE WHEN atan2(-lon, -lat) < 0 THEN atan2(-lon, -lat) + 2 * pi()
      |        ELSE atan2(-lon, -lat) END, 5) AS az,
      |  'SRID=4326;POINT(' || CAST(lon AS VARCHAR) || ' ' || CAST(lat AS VARCHAR) || ')' AS ewkt,
      |  3857 AS srid,
      |  5 AS env_pts,
      |  round(abs(lon) * abs(lat), 4) AS env_area
      |FROM pts ORDER BY c_custkey""".stripMargin))

  // geometry aggregates on EWKB columns (functions/GeoAggs — reference
  // aggregate_geographic_agg.rs): per-zone envelope polygon as WKT (the
  // oracle rebuilds the exact string from min/max), its area, and the
  // st_collect cardinality
  private val geomAgg = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql(s"""
        |WITH pts AS (
        |  SELECT c_nationkey % 5 AS zone,
        |    st_makepoint(CAST(${lonSql("c_custkey")} AS DOUBLE),
        |                 CAST(${latSql("c_custkey")} AS DOUBLE)) AS p
        |  FROM customer)
        |SELECT zone,
        |  st_astext(st_envelope_agg(p)) AS env_wkt,
        |  round(st_area(st_envelope_agg(p)), 4) AS env_area,
        |  st_npoints(st_collect(p)) AS n_pts
        |FROM pts GROUP BY zone ORDER BY zone""".stripMargin)
    },
    Some(s"""WITH pts AS (
      |  SELECT c_nationkey % 5 AS zone,
      |    CAST(${lonSql("c_custkey")} AS DOUBLE) AS lon,
      |    CAST(${latSql("c_custkey")} AS DOUBLE) AS lat
      |  FROM customer),
      |ext AS (
      |  SELECT zone, min(lon) x0, min(lat) y0, max(lon) x1, max(lat) y1, count(*) n
      |  FROM pts GROUP BY zone)
      |SELECT zone,
      |  'POLYGON((' ||
      |    CAST(x0 AS VARCHAR) || ' ' || CAST(y0 AS VARCHAR) || ',' ||
      |    CAST(x1 AS VARCHAR) || ' ' || CAST(y0 AS VARCHAR) || ',' ||
      |    CAST(x1 AS VARCHAR) || ' ' || CAST(y1 AS VARCHAR) || ',' ||
      |    CAST(x0 AS VARCHAR) || ' ' || CAST(y1 AS VARCHAR) || ',' ||
      |    CAST(x0 AS VARCHAR) || ' ' || CAST(y0 AS VARCHAR) || '))' AS env_wkt,
      |  round((x1 - x0) * (y1 - y0), 4) AS env_area,
      |  CAST(n AS INT) AS n_pts
      |FROM ext ORDER BY zone""".stripMargin))

  // polygon clipping (functions/Clip Martinez–Rueda sweep via
  // GeometryOps — reference geometry.rs:680-703 st_union/
  // st_intersection/st_difference/st_symdifference, :992 st_buffer).
  // Integer-coordinate rectangle pairs make every set-op area an exact
  // closed form the oracle replays arithmetically — no spatial
  // extension needed; shared-edge/containment degeneracies occur
  // naturally in the key-derived grid. Buffer areas follow the
  // documented construction exactly: dilation = area + perimeter*r +
  // inscribed 32-gon, erosion of a rect = exact inset.
  private val clip = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql("""
        |WITH k AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS k,
        |    CAST(c_custkey % 7 AS INT) AS ax0, CAST((c_custkey * 3) % 5 AS INT) AS ay0,
        |    CAST(2 + c_custkey % 4 AS INT) AS aw, CAST(1 + c_custkey % 3 AS INT) AS ah,
        |    CAST((c_custkey * 5) % 8 AS INT) AS bx0, CAST((c_custkey * 7) % 6 AS INT) AS by0,
        |    CAST(1 + (c_custkey * 11) % 5 AS INT) AS bw, CAST(1 + (c_custkey * 13) % 4 AS INT) AS bh
        |  FROM customer WHERE c_custkey < 120),
        |g AS (
        |  SELECT k, ax0, ay0, aw, ah,
        |    st_geomfromtext(concat('POLYGON((', ax0, ' ', ay0, ',', ax0 + aw, ' ', ay0, ',',
        |      ax0 + aw, ' ', ay0 + ah, ',', ax0, ' ', ay0 + ah, ',', ax0, ' ', ay0, '))')) AS ra,
        |    st_geomfromtext(concat('POLYGON((', bx0, ' ', by0, ',', bx0 + bw, ' ', by0, ',',
        |      bx0 + bw, ' ', by0 + bh, ',', bx0, ' ', by0 + bh, ',', bx0, ' ', by0, '))')) AS rb
        |  FROM k)
        |SELECT k,
        |  CAST(round(coalesce(st_area(st_intersection(ra, rb)), 0)) AS BIGINT) AS inter_area,
        |  CAST(round(coalesce(st_area(st_union(ra, rb)), 0)) AS BIGINT) AS union_area,
        |  CAST(round(coalesce(st_area(st_difference(ra, rb)), 0)) AS BIGINT) AS diff_area,
        |  CAST(round(coalesce(st_area(st_symdifference(ra, rb)), 0)) AS BIGINT) AS sym_area,
        |  CAST(round(coalesce(st_area(st_buffer(ra, -0.5)), 0)) AS BIGINT) AS erode_area,
        |  round(st_area(st_buffer(st_makepoint(ax0, ay0), CAST(1 + k % 3 AS DOUBLE))), 4) AS buf_pt_area,
        |  round(st_area(st_buffer(ra, 0.5)), 4) AS buf_rect_area
        |FROM g ORDER BY k""".stripMargin)
    },
    Some("""WITH k AS (
      |  SELECT CAST(c_custkey AS BIGINT) AS k,
      |    CAST(c_custkey % 7 AS INT) AS ax0, CAST((c_custkey * 3) % 5 AS INT) AS ay0,
      |    CAST(2 + c_custkey % 4 AS INT) AS aw, CAST(1 + c_custkey % 3 AS INT) AS ah,
      |    CAST((c_custkey * 5) % 8 AS INT) AS bx0, CAST((c_custkey * 7) % 6 AS INT) AS by0,
      |    CAST(1 + (c_custkey * 11) % 5 AS INT) AS bw, CAST(1 + (c_custkey * 13) % 4 AS INT) AS bh
      |  FROM customer WHERE c_custkey < 120),
      |m AS (
      |  SELECT k, ax0, ay0, aw, ah,
      |    CAST(aw AS BIGINT) * ah AS a_area, CAST(bw AS BIGINT) * bh AS b_area,
      |    greatest(0, least(ax0 + aw, bx0 + bw) - greatest(ax0, bx0)) *
      |      greatest(0, least(ay0 + ah, by0 + bh) - greatest(ay0, by0)) AS i_area
      |  FROM k)
      |SELECT k,
      |  CAST(i_area AS BIGINT) AS inter_area,
      |  CAST(a_area + b_area - i_area AS BIGINT) AS union_area,
      |  CAST(a_area - i_area AS BIGINT) AS diff_area,
      |  CAST(a_area + b_area - 2 * i_area AS BIGINT) AS sym_area,
      |  CAST((aw - 1) * greatest(0, ah - 1) AS BIGINT) AS erode_area,
      |  round(0.5 * 32 * pow(CAST(1 + k % 3 AS DOUBLE), 2) * sin(2 * pi() / 32), 4) AS buf_pt_area,
      |  round(a_area + (2.0 * (aw + ah)) * 0.5 + 0.5 * 32 * 0.25 * sin(2 * pi() / 32), 4) AS buf_rect_area
      |FROM m ORDER BY k""".stripMargin))

  // clipping aggregates (functions/GeoAggs StUnionAgg /
  // StIntersectionAgg — reference aggregate_geographic_agg.rs:692,702):
  // unit-height intervals make union area = interval-union length (the
  // oracle computes it with a running-max window), and per-zone
  // intersection of rects sharing a common core has a group min/max
  // closed form
  private val clipAgg = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql("""
        |WITH iv AS (
        |  SELECT CAST(c_custkey % 6 AS INT) AS zone,
        |    CAST((c_custkey * 13) % 50 AS INT) AS s,
        |    CAST((c_custkey * 13) % 50 + 1 + c_custkey % 4 AS INT) AS e,
        |    CAST(c_custkey % 3 AS INT) AS cx0,
        |    CAST(8 + c_custkey % 5 AS INT) AS cx1
        |  FROM customer WHERE c_custkey < 400),
        |g AS (
        |  SELECT zone,
        |    st_geomfromtext(concat('POLYGON((', s, ' 0,', e, ' 0,', e, ' 1,', s, ' 1,', s, ' 0))')) AS r,
        |    st_geomfromtext(concat('POLYGON((', cx0, ' 0,', cx1, ' 0,', cx1, ' 3,', cx0, ' 3,', cx0, ' 0))')) AS c
        |  FROM iv)
        |SELECT zone,
        |  CAST(round(st_area(st_union_agg(r))) AS BIGINT) AS union_area,
        |  CAST(round(st_area(st_intersection_agg(c))) AS BIGINT) AS core_area,
        |  count(*) AS n
        |FROM g GROUP BY zone ORDER BY zone""".stripMargin)
    },
    Some("""WITH iv AS (
      |  SELECT CAST(c_custkey % 6 AS INT) AS zone,
      |    CAST((c_custkey * 13) % 50 AS INT) AS s,
      |    CAST((c_custkey * 13) % 50 + 1 + c_custkey % 4 AS INT) AS e,
      |    CAST(c_custkey % 3 AS INT) AS cx0,
      |    CAST(8 + c_custkey % 5 AS INT) AS cx1
      |  FROM customer WHERE c_custkey < 400),
      |o AS (
      |  SELECT zone, s, e,
      |    max(e) OVER (PARTITION BY zone ORDER BY s, e
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |  FROM iv)
      |SELECT o.zone,
      |  CAST(sum(greatest(0, e - greatest(coalesce(pmax, s), s))) AS BIGINT) AS union_area,
      |  CAST((SELECT (min(cx1) - max(cx0)) * 3 FROM iv i WHERE i.zone = o.zone) AS BIGINT) AS core_area,
      |  count(*) AS n
      |FROM o GROUP BY o.zone ORDER BY o.zone""".stripMargin))

  // ---- h3 index math (reference geo_h3.rs; graft.functions.H3) -------
  // Both engines derive cells as parents of two fixed golden cells (one
  // hexagon chain, one pentagon chain) across all 16 resolutions; the
  // oracle re-implements the H3 bit layout in raw DuckDB bit arithmetic
  // — an independent cross-engine check of the index math (the
  // h3o-golden vectors live in H3Spec).
  private val pentBases = "4,14,24,38,49,58,63,72,83,97,107,117"
  private val h3 = Q(
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val x = t(spark, dir)
      x.nation
        .selectExpr("n_nationkey",
          "h3_to_parent(CAST(644325524701193974 AS BIGINT), CAST(n_nationkey % 16 AS INT)) AS cell",
          "h3_to_parent(CAST(599119489002373119 AS BIGINT), CAST(n_nationkey % 6 AS INT)) AS pcell")
        .selectExpr("n_nationkey", "cell", "pcell",
          "h3_get_resolution(cell) AS res",
          "h3_get_base_cell(cell) AS base_cell",
          "h3_to_string(cell) AS cell_str",
          "h3_is_res_class_iii(cell) AS class_iii",
          "h3_is_pentagon(cell) AS hex_pent",
          "h3_is_pentagon(pcell) AS pent_pent",
          "h3_num_hexagons(h3_get_resolution(cell)) AS n_cells",
          "h3_to_parent(cell, CAST(greatest(h3_get_resolution(cell) - 2, 0) AS INT)) AS parent2",
          "h3_is_valid(cell) AS valid")
        .orderBy(col("n_nationkey"))
    },
    Some(s"""WITH base AS (
      |  SELECT n_nationkey,
      |         CAST(n_nationkey % 16 AS BIGINT) AS r,
      |         CAST(n_nationkey % 6 AS BIGINT) AS pr
      |  FROM nation
      |), cells AS (
      |  SELECT n_nationkey, r,
      |    ((644325524701193974 & ~(CAST(15 AS BIGINT) << 52) & ~((CAST(1 AS BIGINT) << CAST(45 - 3*r AS INT)) - 1))
      |      | (r << 52) | ((CAST(1 AS BIGINT) << CAST(45 - 3*r AS INT)) - 1)) AS cell,
      |    ((599119489002373119 & ~(CAST(15 AS BIGINT) << 52) & ~((CAST(1 AS BIGINT) << CAST(45 - 3*pr AS INT)) - 1))
      |      | (pr << 52) | ((CAST(1 AS BIGINT) << CAST(45 - 3*pr AS INT)) - 1)) AS pcell,
      |    pr
      |  FROM base
      |)
      |SELECT n_nationkey, cell, pcell,
      |  CAST(r AS INT) AS res,
      |  CAST((cell >> 45) & 127 AS INT) AS base_cell,
      |  printf('%x', cell) AS cell_str,
      |  r % 2 = 1 AS class_iii,
      |  ((cell >> 45) & 127) IN ($pentBases)
      |    AND (cell & (((CAST(1 AS BIGINT) << 45) - 1) & ~((CAST(1 AS BIGINT) << CAST(45 - 3*r AS INT)) - 1))) = 0 AS hex_pent,
      |  ((pcell >> 45) & 127) IN ($pentBases)
      |    AND (pcell & (((CAST(1 AS BIGINT) << 45) - 1) & ~((CAST(1 AS BIGINT) << CAST(45 - 3*pr AS INT)) - 1))) = 0 AS pent_pent,
      |  CAST(2 + 120 * power(7, r) AS BIGINT) AS n_cells,
      |  ((cell & ~(CAST(15 AS BIGINT) << 52) & ~((CAST(1 AS BIGINT) << CAST(45 - 3*greatest(r-2,0) AS INT)) - 1))
      |    | (greatest(r-2,0) << 52) | ((CAST(1 AS BIGINT) << CAST(45 - 3*greatest(r-2,0) AS INT)) - 1)) AS parent2,
      |  TRUE AS valid
      |FROM cells ORDER BY n_nationkey""".stripMargin))

  // ---- geography tier (reference geography.rs; functions/Geography) --
  // customer-derived lon/lat become GEOGRAPHY points; st_distance on the
  // SRID-4326 tag is spherical meters (haversine closest-point, radius
  // 6371008.8 m) — the oracle replays the same haversine arithmetic in
  // raw SQL, so values are exact to the shared rounding
  private val geography = Q(
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val x = t(spark, dir)
      x.customer.filter(col("c_custkey") < 150)
        .select(col("c_custkey"),
          lon("c_custkey").as("lon"), lat("c_custkey").as("lat"))
        .selectExpr("c_custkey", "lon", "lat",
          "st_geographyfromwkt(concat('POINT(', lon, ' ', lat, ')')) AS g")
        .selectExpr("c_custkey", "lon", "lat",
          "round(st_distance(g, st_geographyfromwkt('POINT(2.35 48.85)')), 3) AS m_to_paris",
          "st_srid(g) AS srid",
          "st_dwithin(g, st_geographyfromwkt('POINT(2.35 48.85)'), 5000000.0) AS within_5000km",
          "round(st_length(st_geographyfromwkt(concat('LINESTRING(', lon, ' ', lat, ', 0 0)'))), 3) AS seg_len_m")
        .orderBy(col("c_custkey"))
    },
    Some(s"""WITH pts AS (
      |  SELECT c_custkey,
      |    ${lonSql("c_custkey")} AS lon,
      |    ${latSql("c_custkey")} AS lat
      |  FROM customer WHERE c_custkey < 150
      |), d AS (
      |  SELECT c_custkey, lon, lat,
      |    2 * 6371008.8 * asin(least(1.0, sqrt(
      |      pow(sin(radians(48.85 - lat) / 2), 2) +
      |      cos(radians(lat)) * cos(radians(48.85)) * pow(sin(radians(2.35 - lon) / 2), 2)))) AS paris,
      |    2 * 6371008.8 * asin(least(1.0, sqrt(
      |      pow(sin(radians(0 - lat) / 2), 2) +
      |      cos(radians(lat)) * cos(radians(0)) * pow(sin(radians(0 - lon) / 2), 2)))) AS seg
      |  FROM pts
      |)
      |SELECT c_custkey, lon, lat,
      |  round(round(paris * 1e9) / 1e9, 3) AS m_to_paris,
      |  4326 AS srid,
      |  round(paris * 1e9) / 1e9 <= 5000000.0 AS within_5000km,
      |  round(round(seg * 1e9) / 1e9, 3) AS seg_len_m
      |FROM d ORDER BY c_custkey""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "geo_fns" -> geoFns,
    "geo_radius_join" -> radiusJoin.copy(headline = true),
    "geo_envelope" -> envelope,
    "geo_geometry" -> geometry,
    "geo_geom_agg" -> geomAgg,
    "geo_clip" -> clip.copy(headline = true),
    "geo_clip_agg" -> clipAgg,
    "geo_h3" -> h3,
    "geo_geography" -> geography)
}
