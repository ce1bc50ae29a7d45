package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Additional scalar-function families from the reference registry
  * (SURVEY.md §2.9; registration root
  * src/query/functions/src/scalars/mod.rs:56-89): bitwise operators
  * (scalars/arithmetic bit ops), the regexp family (scalars/string.rs
  * regexp_* registrations), pad/trim string surface, and date
  * arithmetic (scalars/timestamp add_/diff families). All built-in
  * Spark expressions — fully codegen'd, no UDFs.
  */
object MoreScalarQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // bitwise ops (reference scalars: bit_and/bit_or/bit_xor/bit_shift)
  private val bitFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          expr("o_orderkey & 255").as("band"),
          expr("o_orderkey | 16").as("bor"),
          expr("o_orderkey ^ 85").as("bxor"),
          expr("~o_orderkey").as("bnot"),
          expr("shiftleft(o_orderkey, 3)").as("shl"),
          expr("shiftright(o_orderkey, 2)").as("shr"),
          expr("cast(bit_count(o_orderkey) as int)").as("popcnt"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      |  o_orderkey & 255 AS band,
      |  o_orderkey | 16 AS bor,
      |  xor(o_orderkey, 85) AS bxor,
      |  ~o_orderkey AS bnot,
      |  o_orderkey << 3 AS shl,
      |  o_orderkey >> 2 AS shr,
      |  CAST(bit_count(o_orderkey) AS INT) AS popcnt
      |FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey""".stripMargin))

  // regexp family (reference scalars/string.rs regexp_* registrations)
  private val regexpFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 40)
        .select(col("doc_id"),
          regexp_replace(col("text"), "[aeiou]", "_").as("devoweled"),
          regexp_extract(col("text"), "(\\w+)", 1).as("first_word"),
          expr("cast(regexp_count(text, 'the') as bigint)").as("n_the"),
          col("text").rlike("data").as("has_data"),
          expr("split_part(text, ' ', 1)").as("tok1"),
          expr("split_part(text, ' ', 3)").as("tok3"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      |  regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
      |  coalesce(regexp_extract(text, '(\w+)', 1), '') AS first_word,
      |  CAST(len(regexp_extract_all(text, 'the')) AS BIGINT) AS n_the,
      |  regexp_matches(text, 'data') AS has_data,
      |  split_part(text, ' ', 1) AS tok1,
      |  split_part(text, ' ', 3) AS tok3
      |FROM documents WHERE doc_id < 40 ORDER BY doc_id""".stripMargin))

  // pad/trim/position string surface (reference scalars/string.rs:
  // lpad/rpad/trim variants/position/repeat/translate/ascii)
  private val padTrim = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.nation.select(col("n_nationkey"),
          lpad(col("n_name"), 12, ".").as("padded_l"),
          rpad(col("n_name"), 12, ".").as("padded_r"),
          ltrim(lit("  x  ")).as("lt"),
          rtrim(lit("  x  ")).as("rt"),
          trim(lit("  x  ")).as("tr"),
          expr("trim(BOTH 'A' FROM n_name)").as("tr_a"),
          repeat(left(col("n_name"), lit(2)), 3).as("rep"),
          reverse(col("n_name")).as("rev_name"),
          translate(col("n_name"), "AEIOU", "aeiou").as("lower_vowels"),
          ascii(col("n_name")).as("first_code"),
          expr("position('A' in n_name)").as("pos_a"),
          left(col("n_name"), lit(3)).as("l3"),
          right(col("n_name"), lit(3)).as("r3"),
          col("n_name").startsWith("A").as("sw_a"),
          col("n_name").endsWith("A").as("ew_a"))
        .orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey,
      |  lpad(n_name, 12, '.') AS padded_l,
      |  rpad(n_name, 12, '.') AS padded_r,
      |  ltrim('  x  ') AS lt,
      |  rtrim('  x  ') AS rt,
      |  trim('  x  ') AS tr,
      |  trim(n_name, 'A') AS tr_a,
      |  repeat(left(n_name, 2), 3) AS rep,
      |  reverse(n_name) AS rev_name,
      |  translate(n_name, 'AEIOU', 'aeiou') AS lower_vowels,
      |  CAST(ascii(n_name) AS INT) AS first_code,
      |  CAST(position('A' in n_name) AS INT) AS pos_a,
      |  left(n_name, 3) AS l3,
      |  right(n_name, 3) AS r3,
      |  starts_with(n_name, 'A') AS sw_a,
      |  ends_with(n_name, 'A') AS ew_a
      |FROM nation ORDER BY n_nationkey""".stripMargin))

  // date arithmetic (reference scalars/timestamp add_/between_/diff)
  private val dateArith = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_orderkey") < 120)
        // date results cast to timestamp: the harness reads both sides
        // via pandas, where a Spark DATE (datetime.date) never equals a
        // DuckDB DATE (datetime64) — timestamps compare cleanly
        .select(col("o_orderkey"),
          last_day(col("o_orderdate")).cast("timestamp").as("eom"),
          // resolves to graft's add_months (reference date_helper.rs
          // semantics: an end-of-month input snaps to the end of the
          // result month) — the oracle encodes the snap via CASE
          add_months(col("o_orderdate"), 2).cast("timestamp").as("plus2m"),
          date_add(col("o_orderdate"), 45).cast("timestamp").as("plus45d"),
          datediff(lit(java.sql.Date.valueOf("1998-12-31")), col("o_orderdate"))
            .cast("long").as("days_to_end"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym_str"),
          (floor(month(col("o_orderdate")).cast("long") / lit(4)) + 1).as("tertile"),
          greatest(col("o_orderdate"), lit(java.sql.Date.valueOf("1995-01-01")))
            .cast("timestamp").as("clamped"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
      |  last_day(o_orderdate) AS eom,
      |  CAST(CASE WHEN o_orderdate = last_day(o_orderdate)
      |       THEN last_day(CAST(o_orderdate + INTERVAL 2 MONTH AS DATE))
      |       ELSE CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) END AS DATE) AS plus2m,
      |  CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus45d,
      |  date_diff('day', o_orderdate, DATE '1998-12-31') AS days_to_end,
      |  strftime(o_orderdate, '%Y-%m') AS ym_str,
      |  CAST(floor(month(o_orderdate) / 4) + 1 AS BIGINT) AS tertile,
      |  greatest(o_orderdate, DATE '1995-01-01') AS clamped
      |FROM orders WHERE o_orderkey < 120 ORDER BY o_orderkey""".stripMargin))

  // VARIANT type (reference: Variant JSONB columns, values.rs:210,
  // scalars/variant.rs) — Spark 4 native VariantType: parse once,
  // typed-path extraction, canonical JSON round-trip. The binary
  // variant encoding is the columnar analog of the reference's JSONB.
  private val variantFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.filter(col("event_id") < 500)
        .select(col("event_id"), expr("parse_json(props)").as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("try_variant_get(v, '$.missing', 'int')").as("missing"),
          expr("is_variant_null(v)").as("is_null_v"),
          expr("cast(v as string)").as("canon"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
      |  CAST(json_extract(props, '$.k') AS INT) AS k_int,
      |  CAST(NULL AS INT) AS missing,
      |  false AS is_null_v,
      |  replace(props, ': ', ':') AS canon
      |FROM events WHERE event_id < 500 ORDER BY event_id""".stripMargin))

  // unsigned widening rules (SURVEY §1.2 / functions.Types): u8->Short
  // u16->Int u32->Long u64->Decimal(20,0), exercised at the type
  // boundaries incl. the 2^63..2^64-1 band signed 64-bit can't hold.
  // Values compare as strings (pandas decodes Spark DECIMAL and DuckDB
  // DECIMAL differently, but their canonical text forms agree).
  private val unsignedFns = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      graft.functions.GraftFunctions.register(spark)
      spark.sql(
        """SELECT o_orderkey,
          |  to_string(to_uint8('255')) AS u8max,
          |  to_string(to_uint16('65535')) AS u16max,
          |  to_string(to_uint32('4294967295')) AS u32max,
          |  to_string(to_uint64('18446744073709551615')) AS u64max,
          |  to_string(to_uint64('9223372036854775808')) AS two63,
          |  to_string(to_uint64('18446744073709551615') + 1) AS u64max_plus1,
          |  to_string(to_uint64('9223372036854775807') + to_uint64(o_orderkey)) AS cross63,
          |  to_uint64('18446744073709551615') > to_uint64('9223372036854775808') AS cmp_hi,
          |  to_string(to_uint64('18446744073709551615') % to_uint64('4294967296')) AS mod32,
          |  try_to_uint8('256') IS NULL AS u8_overflow_nulls,
          |  try_to_uint64('not a number') IS NULL AS bad_parse_nulls
          |FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey""".stripMargin)
    },
    Some("""SELECT o_orderkey,
      |  '255' AS u8max,
      |  '65535' AS u16max,
      |  '4294967295' AS u32max,
      |  '18446744073709551615' AS u64max,
      |  '9223372036854775808' AS two63,
      |  CAST(CAST('18446744073709551615' AS DECIMAL(21,0)) + 1 AS VARCHAR) AS u64max_plus1,
      |  CAST(CAST('9223372036854775807' AS DECIMAL(21,0)) + o_orderkey AS VARCHAR) AS cross63,
      |  true AS cmp_hi,
      |  CAST(CAST('18446744073709551615' AS DECIMAL(20,0)) % CAST('4294967296' AS DECIMAL(20,0)) AS VARCHAR) AS mod32,
      |  true AS u8_overflow_nulls,
      |  true AS bad_parse_nulls
      |FROM orders WHERE o_orderkey < 40 ORDER BY o_orderkey""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "sfn_bit" -> bitFns,
    "sfn_regexp" -> regexpFns,
    "sfn_pad_trim" -> padTrim,
    "sfn_date_arith" -> dateArith,
    "sfn_variant" -> variantFns,
    "sfn_unsigned" -> unsignedFns)
}
