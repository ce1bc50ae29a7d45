package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Queries exercising the databend-name function registry and the
  * custom Catalyst pieces (bitmap aggregates, hamming64 codegen
  * expression).
  */
object RegistryQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = {
    GraftFunctions.register(spark)
    Tables(spark, dir)
  }

  // databend-spelled SQL runs through the alias registry
  private val aliasNames = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT o_orderkey,
          |  to_year(o_orderdate) AS y,
          |  to_day_of_month(o_orderdate) AS dom,
          |  to_quarter(o_orderdate) AS q,
          |  to_start_of_month(o_orderdate) AS som,
          |  ucase(o_orderpriority) AS up,
          |  lcase(o_orderstatus) AS lo,
          |  mid(o_orderpriority, 3, 4) AS mid_,
          |  ceiling(o_totalprice / 1000.0) AS ceil_k,
          |  to_string(o_orderkey) AS key_str,
          |  ifnull(nullif(o_orderstatus, 'P'), 'PENDING') AS status
          |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
      |  upper(o_orderpriority) AS up,
      |  lower(o_orderstatus) AS lo,
      |  substring(o_orderpriority, 3, 4) AS mid_,
      |  CAST(ceiling(o_totalprice / 1000.0) AS BIGINT) AS ceil_k,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status
      |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin))

  // bitmap aggregates: distinct-count semantics checked against plain
  // COUNT(DISTINCT ...) in the oracle
  private val bitmap = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """WITH per_nation AS (
          |  SELECT c_nationkey, bitmap_agg(CAST(c_custkey AS INT)) AS bm
          |  FROM customer JOIN orders ON c_custkey = o_custkey
          |  WHERE o_totalprice > 200000.0
          |  GROUP BY c_nationkey)
          |SELECT c_nationkey,
          |  bitmap_count(bm) AS n_active,
          |  bitmap_contains(bm, 1) AS has_cust1
          |FROM per_nation ORDER BY c_nationkey""".stripMargin)
    },
    Some("""SELECT c_nationkey,
      |  count(DISTINCT c_custkey) AS n_active,
      |  bool_or(c_custkey = 1) AS has_cust1
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |WHERE o_totalprice > 200000.0
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  // bitmap union/intersect across groups: customers active in BOTH
  // halves of the year, via bitmap_intersect_agg over per-month bitmaps
  private val bitmapSetOps = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """WITH per_q AS (
          |  SELECT quarter(o_orderdate) AS qr, bitmap_agg(CAST(o_custkey AS INT)) AS bm
          |  FROM orders WHERE year(o_orderdate) = 1996
          |  GROUP BY quarter(o_orderdate))
          |SELECT
          |  bitmap_count(bitmap_union_agg(bm)) AS n_any_quarter,
          |  bitmap_count(bitmap_intersect_agg(bm)) AS n_all_quarters
          |FROM per_q""".stripMargin)
    },
    Some("""WITH base AS (
      |  SELECT o_custkey, count(DISTINCT quarter(o_orderdate)) AS nq
      |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
      |SELECT count(*) AS n_any_quarter,
      |  CAST(sum(CASE WHEN nq = 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_quarters
      |FROM base""".stripMargin))

  // the full scalar bitmap algebra (and/or/xor/and_not, min/max,
  // has_any/has_all, subsets, to_bitmap) with a set-algebra oracle:
  // two per-nation customer sets (big spenders vs urgent-priority),
  // bitmap ops vs DuckDB full-join set arithmetic
  private val bitmapAlgebra = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """WITH hi AS (
          |  SELECT c_nationkey AS nk, bitmap_agg(CAST(o_custkey AS INT)) AS bm
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  WHERE o_totalprice > 200000.0 GROUP BY c_nationkey),
          |urg AS (
          |  SELECT c_nationkey AS nk, bitmap_agg(CAST(o_custkey AS INT)) AS bm
          |  FROM orders JOIN customer ON c_custkey = o_custkey
          |  WHERE o_orderpriority = '1-URGENT' GROUP BY c_nationkey)
          |SELECT hi.nk,
          |  bitmap_count(bitmap_and(hi.bm, urg.bm)) AS n_and,
          |  bitmap_count(bitmap_or(hi.bm, urg.bm)) AS n_or,
          |  bitmap_count(bitmap_xor(hi.bm, urg.bm)) AS n_xor,
          |  bitmap_count(bitmap_and_not(hi.bm, urg.bm)) AS n_hi_only,
          |  bitmap_min(bitmap_or(hi.bm, urg.bm)) AS mn,
          |  bitmap_max(bitmap_or(hi.bm, urg.bm)) AS mx,
          |  bitmap_has_any(hi.bm, urg.bm) AS any_common,
          |  bitmap_has_all(hi.bm, bitmap_and(hi.bm, urg.bm)) AS all_and_in_hi,
          |  bitmap_count(bitmap_subset_in_range(hi.bm, 0, 500)) AS n_lt500,
          |  bitmap_count(sub_bitmap(hi.bm, 0, 3)) AS n_first3,
          |  bitmap_to_string(bitmap_subset_limit(bitmap_and(hi.bm, urg.bm), 0, 2)) AS first2_and
          |FROM hi JOIN urg ON hi.nk = urg.nk
          |ORDER BY hi.nk""".stripMargin)
    },
    Some("""WITH hi AS (
      |  SELECT DISTINCT c_nationkey AS nk, o_custkey AS ck
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  WHERE o_totalprice > 200000.0),
      |urg AS (
      |  SELECT DISTINCT c_nationkey AS nk, o_custkey AS ck
      |  FROM orders JOIN customer ON c_custkey = o_custkey
      |  WHERE o_orderpriority = '1-URGENT'),
      |j AS (
      |  SELECT coalesce(hi.nk, urg.nk) AS nk,
      |         hi.ck AS hck, urg.ck AS uck, coalesce(hi.ck, urg.ck) AS ck
      |  FROM hi FULL JOIN urg ON hi.nk = urg.nk AND hi.ck = urg.ck
      |  WHERE coalesce(hi.nk, urg.nk) IN (SELECT nk FROM hi)
      |    AND coalesce(hi.nk, urg.nk) IN (SELECT nk FROM urg))
      |SELECT nk,
      |  count(*) FILTER (WHERE hck IS NOT NULL AND uck IS NOT NULL) AS n_and,
      |  count(*) AS n_or,
      |  count(*) FILTER (WHERE hck IS NULL OR uck IS NULL) AS n_xor,
      |  count(*) FILTER (WHERE hck IS NOT NULL AND uck IS NULL) AS n_hi_only,
      |  min(ck) AS mn,
      |  max(ck) AS mx,
      |  count(*) FILTER (WHERE hck IS NOT NULL AND uck IS NOT NULL) > 0 AS any_common,
      |  true AS all_and_in_hi,
      |  count(*) FILTER (WHERE hck IS NOT NULL AND ck < 500) AS n_lt500,
      |  CAST(least(count(*) FILTER (WHERE hck IS NOT NULL), 3) AS BIGINT) AS n_first3,
      |  array_to_string(list_sort(list(ck) FILTER (WHERE hck IS NOT NULL AND uck IS NOT NULL))[1:2], ',') AS first2_and
      |FROM j GROUP BY nk ORDER BY nk""".stripMargin))

  // hamming64 native (codegen) expression, verified against DuckDB's
  // bit_count(xor(...)) on deterministic arithmetic-derived longs
  private val hamming = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT doc_id,
          |  hamming64(CAST(doc_id * 2654435761 AS BIGINT), CAST(doc_id * 40503 AS BIGINT)) AS hd,
          |  hamming64(CAST(doc_id AS BIGINT), CAST(doc_id AS BIGINT)) AS hd_self
          |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin)
    },
    Some("""SELECT doc_id,
      |  CAST(bit_count(xor(doc_id * 2654435761, doc_id * 40503)) AS INT) AS hd,
      |  CAST(bit_count(xor(doc_id, doc_id)) AS INT) AS hd_self
      |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  // the wider alias surface: arithmetic/array/encoding spellings,
  // ClickHouse-style yyyymm shorthands, JSON constructors, IPv4
  private val aliasNames2 = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT o_orderkey,
          |  add(o_orderkey, 1) AS k1,
          |  subtract(o_orderkey, 1) AS km1,
          |  modulo(o_orderkey, 7) AS mod7,
          |  neg(o_orderkey) AS negk,
          |  pow(2.0, 3.0) AS p8,
          |  to_yyyymm(o_orderdate) AS ym,
          |  to_yyyymmdd(o_orderdate) AS ymd,
          |  to_monday(o_orderdate) AS monday,
          |  to_day_of_week(o_orderdate) AS dow,
          |  to_unix_timestamp(o_orderdate) AS epoch_s,
          |  array_get(split(o_orderpriority, '-'), 1) AS prio_num,
          |  array_length(split(o_orderpriority, '-')) AS prio_parts,
          |  hex_encode(o_orderstatus) AS status_hex,
          |  base64_encode(o_orderstatus) AS status_b64,
          |  chr(65 + CAST(modulo(o_orderkey, 26) AS INT)) AS letter,
          |  json_object('s', o_orderstatus) AS jo,
          |  json_array(o_orderkey) AS ja,
          |  inet_ntoa(o_orderkey + 167772160) AS ip,
          |  inet_aton('10.0.0.1') AS ipnum
          |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey,
      |  o_orderkey + 1 AS k1,
      |  o_orderkey - 1 AS km1,
      |  o_orderkey % 7 AS mod7,
      |  -o_orderkey AS negk,
      |  pow(2.0, 3.0) AS p8,
      |  CAST(strftime(o_orderdate, '%Y%m') AS INT) AS ym,
      |  CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS ymd,
      |  CAST(date_trunc('week', o_orderdate) AS DATE) AS monday,
      |  CAST(isodow(o_orderdate) AS INT) AS dow,
      |  CAST(epoch(CAST(o_orderdate AS TIMESTAMP)) AS BIGINT) AS epoch_s,
      |  split_part(o_orderpriority, '-', 1) AS prio_num,
      |  CAST(len(string_split(o_orderpriority, '-')) AS INT) AS prio_parts,
      |  hex(o_orderstatus) AS status_hex,
      |  base64(encode(o_orderstatus)) AS status_b64,
      |  chr(65 + CAST(o_orderkey % 26 AS INT)) AS letter,
      |  '{"s":"' || o_orderstatus || '"}' AS jo,
      |  '[' || CAST(o_orderkey AS VARCHAR) || ']' AS ja,
      |  CAST((o_orderkey + 167772160) // 16777216 % 256 AS VARCHAR) || '.' ||
      |    CAST((o_orderkey + 167772160) // 65536 % 256 AS VARCHAR) || '.' ||
      |    CAST((o_orderkey + 167772160) // 256 % 256 AS VARCHAR) || '.' ||
      |    CAST((o_orderkey + 167772160) % 256 AS VARCHAR) AS ip,
      |  CAST(167772161 AS BIGINT) AS ipnum
      |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin))

  // round-4 surface (functions.MoreAliases): comparisons-as-names,
  // cast spellings incl. unsigned widening, trim/insert, datetime
  // add/diff units, calendar anchors, variant accessors, vector
  // distances, jaro_winkler/humanize
  private val aliasNames3 = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT o_orderkey,
          |  eq(o_orderkey, 5) AS is5,
          |  gt(o_orderkey, 10) AS gt10,
          |  lte(o_orderkey, 10) AS lte10,
          |  noteq(o_orderkey, 3) AS ne3,
          |  xor(eq(o_orderkey % 2, 0), eq(o_orderkey % 3, 0)) AS x23,
          |  div0(CAST(o_orderkey AS DOUBLE), 0.0) AS dz,
          |  divnull(CAST(o_orderkey AS DOUBLE), 0.0) AS dn,
          |  oct(64) AS o64,
          |  strcmp(o_orderstatus, 'O') AS sc,
          |  isinf(CAST('Infinity' AS DOUBLE)) AS inf,
          |  to_int16(o_orderkey % 100) AS i16,
          |  to_string(to_uint64(o_orderkey)) AS u64s,
          |  try_to_int32(o_orderpriority) AS bad_int,
          |  try_to_int32('42') AS good_int,
          |  trim_both(concat('xx', o_orderstatus, 'x'), 'x') AS tb,
          |  trim_leading(concat('xx', o_orderstatus), 'x') AS tl,
          |  trim_trailing(concat(o_orderstatus, 'xx'), 'x') AS tt,
          |  insert('abcdef', 2, 3, 'ZZ') AS ins,
          |  CAST(add_days(o_orderdate, 10) AS TIMESTAMP) AS d10,
          |  CAST(add_hours(CAST(o_orderdate AS TIMESTAMP), 5) AS TIMESTAMP) AS h5,
          |  CAST(subtract_weeks(o_orderdate, 2) AS TIMESTAMP) AS wm2,
          |  CAST(add_quarters(o_orderdate, 1) AS TIMESTAMP) AS q1,
          |  diff_weeks(o_orderdate, DATE '1995-01-02') AS dw,
          |  between_months(o_orderdate, DATE '1995-06-15') AS bm,
          |  diff_quarters(o_orderdate, DATE '1995-06-15') AS dq,
          |  between_years(o_orderdate, DATE '1995-06-15') AS by_,
          |  yearweek(o_orderdate) AS yw,
          |  to_iso_year(o_orderdate) AS iy,
          |  millennium(o_orderdate) AS mil,
          |  CAST(to_last_of_month(o_orderdate) AS TIMESTAMP) AS lom,
          |  CAST(to_last_of_quarter(o_orderdate) AS TIMESTAMP) AS loq,
          |  CAST(to_next_friday(o_orderdate) AS TIMESTAMP) AS nf,
          |  CAST(to_previous_monday(o_orderdate) AS TIMESTAMP) AS pm,
          |  CAST(to_start_of_five_minutes(add_minutes(CAST(o_orderdate AS TIMESTAMP), o_orderkey % 60)) AS TIMESTAMP) AS s5m,
          |  round(jaro_winkler(o_orderpriority, 'URGENT'), 4) AS jw,
          |  humanize_number(1234567.0) AS hn,
          |  humanize_size(1048576.0) AS hs,
          |  json_typeof(parse_json('{"a":1}')) AS jt,
          |  as_integer(parse_json(CAST(o_orderkey AS STRING))) AS ai,
          |  as_string(parse_json('"hi"')) AS astr,
          |  json_exists_key(parse_json('{"a":1,"b":2}'), 'a') AS jek,
          |  CAST(get_path(parse_json('{"a":{"b":2}}'), 'a.b') AS STRING) AS gp,
          |  l2_distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l2,
          |  l1_distance(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l1,
          |  inner_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS ip,
          |  round(cosine_distance(array(1.0D, 0.0D), array(0.0D, 1.0D)), 6) AS cd
          |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey,
      |  o_orderkey = 5 AS is5,
      |  o_orderkey > 10 AS gt10,
      |  o_orderkey <= 10 AS lte10,
      |  o_orderkey <> 3 AS ne3,
      |  (o_orderkey % 2 = 0) <> (o_orderkey % 3 = 0) AS x23,
      |  0.0 AS dz,
      |  CAST(NULL AS DOUBLE) AS dn,
      |  to_base(64, 8) AS o64,
      |  CASE WHEN o_orderstatus < 'O' THEN -1 WHEN o_orderstatus > 'O' THEN 1 ELSE 0 END AS sc,
      |  isinf(CAST('Infinity' AS DOUBLE)) AS inf,
      |  CAST(o_orderkey % 100 AS SMALLINT) AS i16,
      |  CAST(CAST(o_orderkey AS DECIMAL(20,0)) AS VARCHAR) AS u64s,
      |  try_cast(o_orderpriority AS INT) AS bad_int,
      |  CAST(42 AS INT) AS good_int,
      |  trim(('xx' || o_orderstatus || 'x'), 'x') AS tb,
      |  ltrim(('xx' || o_orderstatus), 'x') AS tl,
      |  rtrim((o_orderstatus || 'xx'), 'x') AS tt,
      |  'aZZef' AS ins,
      |  CAST(CAST(o_orderdate AS DATE) + 10 AS TIMESTAMP) AS d10,
      |  CAST(o_orderdate AS TIMESTAMP) + INTERVAL 5 HOUR AS h5,
      |  CAST(CAST(o_orderdate AS DATE) - 14 AS TIMESTAMP) AS wm2,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS q1,
      |  datediff('week', DATE '1995-01-02', CAST(o_orderdate AS DATE)) AS dw,
      |  datediff('month', DATE '1995-06-15', CAST(o_orderdate AS DATE)) AS bm,
      |  datediff('quarter', DATE '1995-06-15', CAST(o_orderdate AS DATE)) AS dq,
      |  datediff('year', DATE '1995-06-15', CAST(o_orderdate AS DATE)) AS by_,
      |  CAST(isoyear(o_orderdate) * 100 + week(o_orderdate) AS INT) AS yw,
      |  CAST(isoyear(o_orderdate) AS INT) AS iy,
      |  CAST(millennium(o_orderdate) AS INT) AS mil,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS lom,
      |  CAST(last_day(CAST(date_trunc('quarter', o_orderdate) AS DATE) + INTERVAL 2 MONTH) AS TIMESTAMP) AS loq,
      |  CAST(CAST(o_orderdate AS DATE) + CAST((((5 - isodow(o_orderdate) + 6) % 7) + 1) AS INTEGER) AS TIMESTAMP) AS nf,
      |  CAST(CAST(o_orderdate AS DATE) - CAST((((isodow(o_orderdate) - 1 + 6) % 7) + 1) AS INTEGER) AS TIMESTAMP) AS pm,
      |  time_bucket(INTERVAL 5 MINUTE, CAST(o_orderdate AS TIMESTAMP) + (o_orderkey % 60) * INTERVAL 1 MINUTE) AS s5m,
      |  round(jaro_winkler_similarity(o_orderpriority, 'URGENT'), 4) AS jw,
      |  '1.23 million' AS hn,
      |  '1.00 MiB' AS hs,
      |  'OBJECT' AS jt,
      |  o_orderkey AS ai,
      |  'hi' AS astr,
      |  true AS jek,
      |  '2' AS gp,
      |  5.0 AS l2,
      |  7.0 AS l1,
      |  11.0 AS ip,
      |  1.0 AS cd
      |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin))

  // round-4 batch 2: array aggregates-as-scalars, JSON object edits,
  // variadic predicates, vector norms (functions.MoreAliases2)
  private val aliasNames4 = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT o_orderkey,
          |  and_filters(o_orderkey > 10, o_orderkey < 50) AS af,
          |  or_filters(o_orderkey < 10, o_orderkey > 50) AS orf,
          |  to_json(array_construct(1, 2, CAST(o_orderkey AS INT))) AS arr,
          |  array_sum(array(1.0, 2.0, CAST(o_orderkey AS DOUBLE))) AS asum,
          |  round(array_avg(array(1.0, 2.0, CAST(o_orderkey AS DOUBLE))), 6) AS aavg,
          |  array_count(array(1.0, CAST(NULL AS DOUBLE), CAST(o_orderkey AS DOUBLE))) AS acnt,
          |  array_median(array(1.0, 9.0, CAST(o_orderkey AS DOUBLE), 4.0)) AS amed,
          |  round(array_stddev_samp(array(1.0, 5.0, CAST(o_orderkey AS DOUBLE))), 6) AS asd,
          |  round(array_stddev_pop(array(1.0, 5.0, CAST(o_orderkey AS DOUBLE))), 6) AS asdp,
          |  array_approx_count_distinct(array(1, 1, 2, CAST(o_orderkey % 3 AS INT))) AS aacd,
          |  to_json(generate_series(1, 4)) AS gs,
          |  ilike(o_orderpriority, '%URGENT%') AS il,
          |  like_any(o_orderpriority, '1%', '2%') AS la,
          |  ilike_any(o_orderpriority, '%urgent%', '%high%') AS ila,
          |  CAST(to_decimal(o_totalprice, 18, 2) AS DOUBLE) AS dec2,
          |  json_object_delete('{"a":1,"b":2,"c":3}', 'a', 'c') AS jdel,
          |  json_object_pick('{"a":1,"b":2,"c":3}', 'b') AS jpick,
          |  json_object_insert('{"a":1}', 'b', '2') AS jins,
          |  json_strip_nulls('{"a":null,"b":1}') AS jstrip,
          |  json_contains_in_right('{"a":1,"b":2}', '{"a":1}') AS jcr,
          |  json_contains_in_left('{"a":1}', '{"a":1,"b":2}') AS jcl,
          |  json_path_exists('{"a":[1,2]}', '$.a[1]') AS jpe,
          |  CAST(get_ignore_case('{"Aa":5}', 'aA') AS STRING) AS gic,
          |  CAST(vector_dims(array(1.0, 2.0, 3.0)) AS INT) AS vd,
          |  round(vector_norm(array(3.0, 4.0)), 6) AS vn,
          |  point_in_polygon((o_orderkey % 20) / 10.0 + 0.05, 0.5,
          |    array(array(0.0, 0.0), array(1.0, 0.0), array(1.0, 1.0), array(0.0, 1.0))) AS pip,
          |  to_uuid('550E8400-E29B-41D4-A716-446655440000') AS uu,
          |  is_not_error(try_to_int32(o_orderstatus)) AS ine
          |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey,
      |  (o_orderkey > 10 AND o_orderkey < 50) AS af,
      |  (o_orderkey < 10 OR o_orderkey > 50) AS orf,
      |  CAST(to_json([1, 2, CAST(o_orderkey AS INT)]) AS STRING) AS arr,
      |  1.0 + 2.0 + o_orderkey AS asum,
      |  round((1.0 + 2.0 + o_orderkey) / 3, 6) AS aavg,
      |  CAST(2 AS BIGINT) AS acnt,
      |  CASE WHEN o_orderkey <= 1 THEN 2.5
      |       WHEN o_orderkey <= 4 THEN (o_orderkey + 4.0) / 2
      |       WHEN o_orderkey <= 9 THEN (4.0 + o_orderkey) / 2
      |       ELSE 6.5 END AS amed,
      |  round(stddev_samp(CAST(x AS DOUBLE)), 6) AS asd,
      |  round(stddev_pop(CAST(x AS DOUBLE)), 6) AS asdp,
      |  CAST(len(list_distinct([1, 1, 2, CAST(o_orderkey % 3 AS INT)])) AS BIGINT) AS aacd,
      |  CAST(to_json([1, 2, 3, 4]) AS STRING) AS gs,
      |  o_orderpriority ILIKE '%URGENT%' AS il,
      |  (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') AS la,
      |  (o_orderpriority ILIKE '%urgent%' OR o_orderpriority ILIKE '%high%') AS ila,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS dec2,
      |  '{"b":2}' AS jdel,
      |  '{"b":2}' AS jpick,
      |  '{"a":1,"b":2}' AS jins,
      |  '{"b":1}' AS jstrip,
      |  true AS jcr,
      |  true AS jcl,
      |  true AS jpe,
      |  '5' AS gic,
      |  3 AS vd,
      |  5.0 AS vn,
      |  ((o_orderkey % 20) / 10.0 + 0.05) < 1.0 AS pip,
      |  '550e8400-e29b-41d4-a716-446655440000' AS uu,
      |  false AS ine
      |FROM orders, LATERAL (SELECT unnest([1.0, 5.0, CAST(o_orderkey AS DOUBLE)]) AS x) u
      |WHERE o_orderkey < 60
      |GROUP BY ALL
      |ORDER BY o_orderkey""".stripMargin))

  // markov masking pair (functions/Markov — reference OBFUSCATE flow:
  // markov_train aggregate feeds markov_generate; values are
  // crc32/siphash-derived so the check is rows-only; bit-exactness vs
  // the reference's own slt goldens is proven in MarkovSpec)
  private val markovMask = Q(
    (spark, dir) => {
      val x = graft.Tables(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql("""
        |WITH src AS (SELECT c_name FROM customer WHERE c_custkey <= 200),
        |model AS (SELECT markov_train(c_name) AS m FROM src)
        |SELECT c_name,
        |  markov_generate(m, '{"order":5,"sliding_window_size":8}',
        |                  CAST(42 AS BIGINT), c_name) AS masked
        |FROM (SELECT c_name FROM src ORDER BY c_name LIMIT 50) s
        |CROSS JOIN model
        |ORDER BY c_name""".stripMargin)
    },
    None)

  override def queries: Seq[(String, Q)] = Seq(
    "reg_markov_mask" -> markovMask,
    "reg_alias_names" -> aliasNames,
    "reg_alias_names2" -> aliasNames2,
    "reg_alias_names3" -> aliasNames3,
    "reg_alias_names4" -> aliasNames4,
    "reg_bitmap_count" -> bitmap,
    "reg_bitmap_setops" -> bitmapSetOps,
    "reg_bitmap_algebra" -> bitmapAlgebra,
    "reg_hamming64" -> hamming)
}
