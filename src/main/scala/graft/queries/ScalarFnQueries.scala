package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.9; reference registry
  * src/query/functions/src/scalars/mod.rs:56-89, 549 names): one query
  * per family — string, math, datetime, conditional/cast, JSON, hash,
  * array (+ higher-order lambdas), struct/map.
  *
  * Transcendental results are rounded to 10 dp (JVM libm vs DuckDB libm
  * may differ in the last ulp); everything else compares exactly.
  */
object ScalarFnQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private val stringFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 30)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 12)).as("up"),
          lower(left(col("text"), lit(8))).as("lo"),
          length(col("text")).as("len"),
          trim(lit("  pad  ")).as("trimmed"),
          lpad(col("lang"), 5, "_").as("lpadded"),
          rpad(col("lang"), 5, "*").as("rpadded"),
          regexp_replace(col("text"), "a", "4").substr(1, 20).as("leeted"),
          reverse(col("lang")).as("rev"),
          repeat(col("lang"), 3).as("rep"),
          expr("split_part(text, ' ', 2)").as("second_word"),
          instr(col("text"), "data").as("data_pos"),
          translate(col("lang"), "en", "EN").as("trans"),
          concat_ws("|", col("lang"), col("source")).as("cat"),
          ascii(col("lang")).as("asc"),
          regexp_extract(col("text"), "([a-z]{5,})", 1).as("long_word"),
          col("text").like("%join%").as("has_join"),
          expr("position('a' in lang)").as("a_pos"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  upper(substring(text, 1, 12)) AS up,
      |  lower(left(text, 8)) AS lo,
      |  length(text) AS len,
      |  trim('  pad  ') AS trimmed,
      |  lpad(lang, 5, '_') AS lpadded,
      |  rpad(lang, 5, '*') AS rpadded,
      |  substring(regexp_replace(text, 'a', '4', 'g'), 1, 20) AS leeted,
      |  reverse(lang) AS rev,
      |  repeat(lang, 3) AS rep,
      |  split_part(text, ' ', 2) AS second_word,
      |  CAST(strpos(text, 'data') AS INT) AS data_pos,
      |  translate(lang, 'en', 'EN') AS trans,
      |  concat_ws('|', lang, source) AS cat,
      |  ascii(lang) AS asc,
      |  regexp_extract(text, '([a-z]{5,})', 1) AS long_word,
      |  text LIKE '%join%' AS has_join,
      |  CAST(strpos(lang, 'a') AS INT) AS a_pos
      |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin))

  private val mathFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.filter(col("l_orderkey") < 40)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("abs_d"),
          ceil(col("l_quantity") / 7).as("ceil_q"),
          floor(col("l_quantity") / 7).as("floor_q"),
          round(col("l_extendedprice") / 1000, 1).as("price_k"),
          round(sqrt(col("l_quantity")), 10).as("sqrt_q"),
          round(exp(col("l_discount")), 10).as("exp_d"),
          round(log(col("l_quantity")), 10).as("ln_q"),
          round(log10(col("l_extendedprice")), 10).as("log10_p"),
          round(pow(col("l_quantity"), 1.5), 8).as("pow_q"),
          signum(col("l_discount") - 0.05).as("sign_d"),
          expr("mod(l_orderkey, 7)").as("mod7"),
          greatest(col("l_quantity"), col("l_linenumber") * 10).as("great"),
          least(col("l_quantity"), col("l_linenumber") * 10.0).as("least_"),
          round(sin(col("l_quantity")), 10).as("sin_q"),
          round(atan2(col("l_quantity"), lit(2.0)), 10).as("atan2_q"),
          expr("l_orderkey & 255").as("band"),
          expr("l_orderkey | 16").as("bor"),
          expr("shiftleft(l_linenumber, 3)").as("shl"),
          round(radians(col("l_quantity")), 10).as("rad"),
          lit(math.Pi).as("pi_val"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_orderkey, l_linenumber,
      |  abs(l_discount - 0.05) AS abs_d,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS ceil_q,
      |  CAST(floor(l_quantity / 7) AS BIGINT) AS floor_q,
      |  round(l_extendedprice / 1000, 1) AS price_k,
      |  round(sqrt(l_quantity), 10) AS sqrt_q,
      |  round(exp(l_discount), 10) AS exp_d,
      |  round(ln(l_quantity), 10) AS ln_q,
      |  round(log10(l_extendedprice), 10) AS log10_p,
      |  round(pow(l_quantity, 1.5), 8) AS pow_q,
      |  CAST(CASE WHEN l_discount - 0.05 > 0 THEN 1.0 WHEN l_discount - 0.05 < 0 THEN -1.0 ELSE 0.0 END AS DOUBLE) AS sign_d,
      |  mod(l_orderkey, 7) AS mod7,
      |  greatest(l_quantity, l_linenumber * 10) AS great,
      |  least(l_quantity, l_linenumber * 10.0) AS least_,
      |  round(sin(l_quantity), 10) AS sin_q,
      |  round(atan2(l_quantity, 2.0), 10) AS atan2_q,
      |  l_orderkey & 255 AS band,
      |  l_orderkey | 16 AS bor,
      |  CAST(l_linenumber * 8 AS INT) AS shl,
      |  round(radians(l_quantity), 10) AS rad,
      |  pi() AS pi_val
      |FROM lineitem WHERE l_orderkey < 40 ORDER BY l_orderkey, l_linenumber""".stripMargin))

  private val datetimeFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_orderkey") < 60)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          dayofyear(col("o_orderdate")).as("doy"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          weekofyear(col("o_orderdate")).as("woy"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate"), 30).cast("timestamp").as("plus30"),
          (col("o_orderdate") + expr("INTERVAL 2 MONTH")).as("plus2m"),
          last_day(col("o_orderdate")).cast("timestamp").as("eom"),
          datediff(lit("1999-01-01"), col("o_orderdate")).as("days_to_99"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
          make_date(lit(2020), month(col("o_orderdate")), lit(1)).cast("timestamp").as("made"),
          date_trunc("day", col("o_orderdate")).as("as_date"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(isodow(o_orderdate) AS INT) AS isodow,
      |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  o_orderdate + INTERVAL 30 DAY AS plus30,
      |  o_orderdate + INTERVAL 2 MONTH AS plus2m,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS INT) AS days_to_99,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      |  strftime(o_orderdate, '%Y-%m') AS ym,
      |  CAST(make_date(2020, CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP) AS made,
      |  date_trunc('day', o_orderdate) AS as_date
      |FROM orders WHERE o_orderkey < 60 ORDER BY o_orderkey""".stripMargin))

  private val condCast = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.filter(col("c_custkey") < 80)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") > 5000, "gold")
            .when(col("c_acctbal") > 0, "silver")
            .otherwise("bronze").as("tier"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg_or_other"),
          col("c_custkey").cast("string").as("key_str"),
          concat(lit("k"), col("c_custkey")).as("k_cat"),
          expr("try_cast(c_name AS INT)").as("bad_int"),
          expr("try_cast(substring(c_name, 10) AS DOUBLE)").as("maybe_num"),
          col("c_acctbal").cast("decimal(12,2)").cast("double").as("bal_dec"),
          (col("c_acctbal") > 1000.0).cast("int").as("rich_flag"),
          isnull(nullif(col("c_mktsegment"), lit("MACHINERY"))).as("is_mach"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey,
      |  CASE WHEN c_acctbal > 5000 THEN 'gold' WHEN c_acctbal > 0 THEN 'silver' ELSE 'bronze' END AS tier,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
      |  CAST(c_custkey AS VARCHAR) AS key_str,
      |  'k' || CAST(c_custkey AS VARCHAR) AS k_cat,
      |  try_cast(c_name AS INT) AS bad_int,
      |  try_cast(substring(c_name, 10) AS DOUBLE) AS maybe_num,
      |  CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS bal_dec,
      |  CAST(c_acctbal > 1000.0 AS INT) AS rich_flag,
      |  nullif(c_mktsegment, 'MACHINERY') IS NULL AS is_mach
      |FROM customer WHERE c_custkey < 80 ORDER BY c_custkey""".stripMargin))

  private val jsonFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.filter(col("event_id") < 50)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          get_json_object(col("props"), "$.missing").as("missing"),
          get_json_object(
            lit("""{"a":{"b":[10,20,30]},"c":"x"}"""), "$.a.b[1]").as("nested"),
          expr("""json_array_length('[1,2,3,4]')""").as("arr_len"),
          to_json(struct(col("event_id").as("id"), col("event_type").as("ty"))).as("as_json"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  json_extract_string(props, '$.missing') AS missing,
      |  json_extract_string('{"a":{"b":[10,20,30]},"c":"x"}', '$.a.b[1]') AS nested,
      |  CAST(json_array_length('[1,2,3,4]') AS INT) AS arr_len,
      |  to_json(struct_pack(id := event_id, ty := event_type)) AS as_json
      |FROM events WHERE event_id < 50 ORDER BY event_id""".stripMargin))

  private val hashFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 30)
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("md5_hex"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"),
          length(col("text").cast("binary")).as("n_bytes"),
          bit_length(col("lang")).as("n_bits"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  md5(text) AS md5_hex,
      |  sha256(text) AS sha256_hex,
      |  CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes,
      |  CAST(bit_length(lang) AS INT) AS n_bits
      |FROM documents WHERE doc_id < 30 ORDER BY doc_id""".stripMargin))

  private val arrayFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.filter(col("l_orderkey") < 30)
        .select(col("l_orderkey"), col("l_linenumber"),
          sequence(lit(1), col("l_linenumber")).as("seq"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          size(col("seq")).as("n"),
          array_contains(col("seq"), 3).as("has3"),
          element_at(col("seq"), 1).as("first_el"),
          // array results as JSON text — the harness compares cells via
          // pandas, which cannot sort/hash raw array cells
          to_json(slice(col("seq"), 1, 2)).as("first2"),
          to_json(reverse(col("seq"))).as("rev"),
          array_max(col("seq")).as("mx"),
          array_min(col("seq")).as("mn"),
          to_json(expr("transform(seq, x -> x * 10)")).as("x10"),
          to_json(expr("filter(seq, x -> x % 2 = 0)")).as("evens"),
          expr("aggregate(seq, 0, (a, x) -> a + x * x)").as("sum_sq"),
          to_json(concat(col("seq"), col("seq"))).as("doubled"),
          to_json(sort_array(array_distinct(concat(col("seq"), col("seq"))))).as("dedup"),
          to_json(sort_array(reverse(col("seq")))).as("resorted"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""WITH b AS (SELECT l_orderkey, l_linenumber,
      |    range(1, l_linenumber + 1) AS seq
      |  FROM lineitem WHERE l_orderkey < 30)
      |SELECT l_orderkey, l_linenumber,
      |  CAST(len(seq) AS INT) AS n,
      |  list_contains(seq, 3) AS has3,
      |  CAST(seq[1] AS INT) AS first_el,
      |  CAST(to_json(CAST(list_slice(seq, 1, 2) AS INT[])) AS VARCHAR) AS first2,
      |  CAST(to_json(CAST(list_reverse(seq) AS INT[])) AS VARCHAR) AS rev,
      |  CAST(list_max(seq) AS INT) AS mx,
      |  CAST(list_min(seq) AS INT) AS mn,
      |  CAST(to_json(CAST(list_transform(seq, x -> x * 10) AS INT[])) AS VARCHAR) AS x10,
      |  CAST(to_json(CAST(list_filter(seq, x -> x % 2 = 0) AS INT[])) AS VARCHAR) AS evens,
      |  CAST(list_reduce(list_prepend(0, list_transform(seq, x -> x * x)), (a, x) -> a + x) AS INT) AS sum_sq,
      |  CAST(to_json(CAST(list_concat(seq, seq) AS INT[])) AS VARCHAR) AS doubled,
      |  CAST(to_json(CAST(list_sort(list_distinct(list_concat(seq, seq))) AS INT[])) AS VARCHAR) AS dedup,
      |  CAST(to_json(CAST(list_sort(list_reverse(seq)) AS INT[])) AS VARCHAR) AS resorted
      |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin))

  private val structMap = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.nation.select(
          col("n_nationkey"),
          struct(col("n_name").as("name"), col("n_regionkey").as("rk")).as("info"),
          map_keys(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey"))).as("mkeys"),
          element_at(map(lit("a"), col("n_nationkey"), lit("b"), col("n_regionkey")), "b").as("b_val"),
          col("n_name").as("plain_name"))
        .select(col("n_nationkey"), col("info.name").as("info_name"),
          col("info.rk").as("info_rk"), to_json(col("mkeys")).as("mkeys"),
          col("b_val"), col("plain_name"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey,
      |  struct_extract(struct_pack(name := n_name, rk := n_regionkey), 'name') AS info_name,
      |  struct_extract(struct_pack(name := n_name, rk := n_regionkey), 'rk') AS info_rk,
      |  CAST(to_json(map_keys(map(['a','b'], [n_nationkey, n_regionkey]))) AS VARCHAR) AS mkeys,
      |  map_extract(map(['a','b'], [n_nationkey, n_regionkey]), 'b')[1] AS b_val,
      |  n_name AS plain_name
      |FROM nation ORDER BY n_nationkey""".stripMargin))

  // ---- decimal exactness (SURVEY known-hard #1) -----------------------
  // Money as DECIMAL built from exact integer cents: multiplication
  // scale rules (s1+s2) and decimal SUM/MIN/MAX agree bit-exactly with
  // DuckDB — the decimal path of the reference's Decimal128 arithmetic
  // (reference: src/query/expression/src/types/decimal.rs).
  private val decimalFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val priceD = (Exact.cents(col("l_extendedprice")) * lit(BigDecimal("0.01"))).as("price_d")
      x.lineitem
        .select(col("l_returnflag"), priceD,
          (Exact.cents(col("l_discount") * 100) * lit(BigDecimal("0.0001"))).as("disc_d"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("price_d")).as("sum_d"),
          min(col("price_d")).as("min_d"),
          max(col("price_d")).as("max_d"),
          sum(col("disc_d")).as("sumdisc_d"),
          count(lit(1)).as("n"))
        // aggregate IN decimal (exact), compare as canonical strings —
        // pandas turns small-precision DuckDB decimals into float64
        .select(col("l_returnflag"),
          col("sum_d").cast("string").as("sum_price_d"),
          col("min_d").cast("string").as("min_price_d"),
          col("max_d").cast("string").as("max_price_d"),
          col("sumdisc_d").cast("string").as("sum_disc_d"),
          col("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(0.01 AS DECIMAL(3,2))) AS VARCHAR) AS sum_price_d,
      |  CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(0.01 AS DECIMAL(3,2))) AS VARCHAR) AS min_price_d,
      |  CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT) * CAST(0.01 AS DECIMAL(3,2))) AS VARCHAR) AS max_price_d,
      |  CAST(sum(CAST(round(l_discount * 100 * 100) AS BIGINT) * CAST(0.0001 AS DECIMAL(5,4))) AS VARCHAR) AS sum_disc_d,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // ---- interval arithmetic (reference scalars/timestamp interval) -----
  private val intervalFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          expr("o_orderdate + INTERVAL 3 MONTH").as("plus_3m"),
          expr("o_orderdate - INTERVAL 90 DAY").as("minus_90d"),
          add_months(to_date(col("o_orderdate")), 14).cast("timestamp").as("plus_14m_d"),
          last_day(to_date(col("o_orderdate"))).cast("timestamp").as("eom"),
          datediff(lit("1998-01-01").cast("date"), to_date(col("o_orderdate"))).as("days_to_98"),
          date_trunc("quarter", col("o_orderdate")).as("qstart"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      |  o_orderdate + INTERVAL 3 MONTH AS plus_3m,
      |  o_orderdate - INTERVAL 90 DAY AS minus_90d,
      |  CAST(CAST(o_orderdate + INTERVAL 14 MONTH AS DATE) AS TIMESTAMP) AS plus_14m_d,
      |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
      |  date_trunc('quarter', o_orderdate) AS qstart
      |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin))

  // TIMESTAMP_TZ tier (functions/TimestampTz — reference datetime.rs
  // to_timestamp_tz/timestamp_tz_from_parts/casts): offset-preserving
  // STRUCT<us,offset_minutes> model. The oracle recomputes the UTC
  // instant arithmetically (epoch of the wall time minus the offset),
  // so the check is timezone-independent on both engines.
  private val timestampTz = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.functions.GraftFunctions.register(spark)
      x.registerAll()
      spark.sql("""
        |WITH s AS (
        |  SELECT o_orderkey AS k,
        |    concat('2024-', lpad(CAST(1 + o_orderkey % 12 AS STRING), 2, '0'), '-',
        |           lpad(CAST(1 + o_orderkey % 28 AS STRING), 2, '0'), ' ',
        |           lpad(CAST(o_orderkey % 24 AS STRING), 2, '0'), ':',
        |           lpad(CAST(o_orderkey % 60 AS STRING), 2, '0'), ':',
        |           lpad(CAST((o_orderkey * 7) % 60 AS STRING), 2, '0'),
        |           CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'Z' WHEN 1 THEN '+05:30'
        |                WHEN 2 THEN '-08:00' ELSE '+00:45' END) AS ts
        |  FROM orders WHERE o_orderkey < 300),
        |p AS (SELECT k, ts, to_timestamp_tz(ts) AS tz FROM s)
        |SELECT k, ts,
        |  tz.us AS us,
        |  timestamp_tz_offset(tz) AS off_min,
        |  CAST(timestamp_tz_to_date(tz) AS STRING) AS local_date,
        |  timestamp_tz_to_string(tz) AS formatted,
        |  timestamp_tz_from_parts(2024, 1, 15, 10, 30, 45, 0, 'UTC').us AS parts_us,
        |  try_to_timestamp_tz('nonsense') IS NULL AS bad_is_null
        |FROM p ORDER BY k""".stripMargin)
    },
    Some("""WITH s AS (
      |  SELECT o_orderkey AS k,
      |    concat('2024-', lpad(CAST(1 + o_orderkey % 12 AS VARCHAR), 2, '0'), '-',
      |           lpad(CAST(1 + o_orderkey % 28 AS VARCHAR), 2, '0'), ' ',
      |           lpad(CAST(o_orderkey % 24 AS VARCHAR), 2, '0'), ':',
      |           lpad(CAST(o_orderkey % 60 AS VARCHAR), 2, '0'), ':',
      |           lpad(CAST((o_orderkey * 7) % 60 AS VARCHAR), 2, '0'),
      |           CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 'Z' WHEN 1 THEN '+05:30'
      |                WHEN 2 THEN '-08:00' ELSE '+00:45' END) AS ts,
      |    CASE CAST(o_orderkey % 4 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 330
      |         WHEN 2 THEN -480 ELSE 45 END AS offm
      |  FROM orders WHERE o_orderkey < 300)
      |SELECT k, ts,
      |  epoch_us(strptime(substr(ts, 1, 19), '%Y-%m-%d %H:%M:%S'))
      |    - CAST(offm AS BIGINT) * 60 * 1000000 AS us,
      |  CAST(offm AS INT) AS off_min,
      |  substr(ts, 1, 10) AS local_date,
      |  concat(substr(ts, 1, 19),
      |    CASE WHEN offm < 0 THEN '-' ELSE '+' END,
      |    lpad(CAST(abs(offm) // 60 AS VARCHAR), 2, '0'), ':',
      |    lpad(CAST(abs(offm) % 60 AS VARCHAR), 2, '0')) AS formatted,
      |  epoch_us(TIMESTAMP '2024-01-15 10:30:45') AS parts_us,
      |  true AS bad_is_null
      |FROM s ORDER BY k""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "sfn_timestamp_tz" -> timestampTz,
    "sfn_decimal" -> decimalFns,
    "sfn_interval" -> intervalFns,
    "sfn_string" -> stringFns,
    "sfn_math" -> mathFns,
    "sfn_datetime" -> datetimeFns,
    "sfn_cond_cast" -> condCast,
    "sfn_json" -> jsonFns,
    "sfn_hash" -> hashFns,
    "sfn_array_lambda" -> arrayFns,
    "sfn_struct_map" -> structMap)
}
