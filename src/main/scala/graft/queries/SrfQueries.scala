package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Set-returning functions (SURVEY.md §2.10; reference ProjectSet
  * operator, src/query/sql/src/planner/plans/project_set.rs): unnest /
  * explode (+ position), generate_series, regexp_split_to_table,
  * json->map explode, lateral word-count, and the numbers() TVF.
  */
object SrfQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // unnest with ordinality == posexplode (1-based to match DuckDB)
  private val explodeWords = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 15)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("word"))
        .orderBy(col("doc_id"), col("pos"))
    },
    Some("""SELECT doc_id,
      |  CAST(generate_subscripts(string_split(text, ' '), 1) AS INT) AS pos,
      |  unnest(string_split(text, ' ')) AS word
      |FROM documents WHERE doc_id < 15 ORDER BY doc_id, pos""".stripMargin))

  // generate_series / range TVF (reference srfs/range.rs:108-115)
  private val series = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.region
        .select(col("r_regionkey"), explode(sequence(lit(0), col("r_regionkey"))).as("i"))
        .orderBy(col("r_regionkey"), col("i"))
    },
    Some("""SELECT r_regionkey, CAST(unnest(range(0, r_regionkey + 1)) AS INT) AS i
      |FROM region ORDER BY r_regionkey, i""".stripMargin))

  // numbers(N) table function (reference table_functions/numbers/) ==
  // spark.range: a parallel iota with no storage underneath
  private val numbers = Q(
    (spark, _) => {
      spark.range(100000)
        .agg(
          count(lit(1)).as("n"),
          sum(col("id")).as("total"),
          sum(when(col("id") % 7 === 0, col("id"))).as("by7"))
    },
    Some("""SELECT count(*) AS n, CAST(sum(range) AS BIGINT) AS total,
      |  CAST(sum(CASE WHEN range % 7 = 0 THEN range END) AS BIGINT) AS by7
      |FROM range(100000)""".stripMargin))

  // regexp_split_to_table (reference srfs/string.rs:38)
  private val regexpSplit = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.documents.filter(col("doc_id") < 10)
        .select(col("doc_id"), explode(split(col("text"), "[ ]+")).as("tok"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"), countDistinct(col("tok")).as("n_uniq"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_uniq
      |FROM (SELECT doc_id, unnest(regexp_split_to_array(text, '[ ]+')) AS tok
      |      FROM documents WHERE doc_id < 10) t
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  // json_each-shaped: explode a JSON object into (key, value) rows
  // (reference srfs/variant.rs:58-190)
  private val jsonExplode = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.filter(col("event_id") < 40)
        .select(col("event_id"),
          explode(from_json(col("props"),
            org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.IntegerType))).as(Seq("key", "value")))
        .orderBy(col("event_id"), col("key"))
    },
    Some("""SELECT event_id, 'k' AS key, CAST(json_extract_string(props, '$.k') AS INT) AS value
      |FROM events WHERE event_id < 40 ORDER BY event_id, key""".stripMargin))

  // LATERAL VIEW word frequency (reference lateral.test suite)
  private val lateralWords = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT word, count(*) AS n
          |FROM documents LATERAL VIEW explode(split(text, ' ')) w AS word
          |WHERE lang = 'en'
          |GROUP BY word ORDER BY n DESC, word LIMIT 25""".stripMargin)
    },
    Some("""SELECT word, count(*) AS n
      |FROM (SELECT unnest(string_split(text, ' ')) AS word
      |      FROM documents WHERE lang = 'en') t
      |GROUP BY word ORDER BY n DESC, word LIMIT 25""".stripMargin),
    headline = true)

  // explode_outer: empty arrays keep the parent row (null element)
  private val explodeOuter = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.nation
        .select(col("n_nationkey"),
          when(col("n_nationkey") % 5 === 0, expr("CAST(array() AS ARRAY<INT>)")).otherwise(
            sequence(lit(1), col("n_nationkey") % 5)).as("arr"))
        .select(col("n_nationkey"), explode_outer(col("arr")).as("v"))
        .orderBy(col("n_nationkey"), col("v"))
    },
    Some("""WITH b AS (SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 5 = 0 THEN [] ELSE range(1, (n_nationkey % 5) + 1) END AS arr
      |  FROM nation)
      |SELECT n_nationkey,
      |  CAST(unnest(CASE WHEN len(arr) = 0 THEN [NULL] ELSE arr END) AS INT) AS v
      |FROM b ORDER BY n_nationkey, v NULLS FIRST""".stripMargin))

  // Snowflake/databend-style FLATTEN via the custom JsonFlatten
  // Generator: recursive walk of a constructed nested document
  private val flatten = Q(
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT n_nationkey, f.key, f.path, f.index, f.value
          |FROM nation
          |LATERAL VIEW flatten_json_recursive(
          |  concat('{"k": ', n_nationkey, ', "arr": [', n_nationkey, ', ', n_nationkey + 1, ']}')
          |) f AS key, path, index, value
          |WHERE n_nationkey < 5
          |ORDER BY n_nationkey, path""".stripMargin)
    },
    Some("""WITH f AS (
      |  SELECT n_nationkey, 'k' AS key, 'k' AS path, CAST(NULL AS INT) AS index,
      |    CAST(n_nationkey AS VARCHAR) AS value FROM nation
      |  UNION ALL
      |  SELECT n_nationkey, 'arr', 'arr', NULL,
      |    '[' || n_nationkey || ',' || (n_nationkey + 1) || ']' FROM nation
      |  UNION ALL
      |  SELECT n_nationkey, NULL, 'arr[0]', 0, CAST(n_nationkey AS VARCHAR) FROM nation
      |  UNION ALL
      |  SELECT n_nationkey, NULL, 'arr[1]', 1, CAST(n_nationkey + 1 AS VARCHAR) FROM nation)
      |SELECT n_nationkey, key, path, index, value FROM f
      |WHERE n_nationkey < 5 ORDER BY n_nationkey, path""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "srf_flatten" -> flatten,
    "srf_posexplode" -> explodeWords,
    "srf_generate_series" -> series,
    "srf_numbers_tvf" -> numbers,
    "srf_regexp_split" -> regexpSplit,
    "srf_json_explode" -> jsonExplode,
    "srf_lateral_words" -> lateralWords,
    "srf_explode_outer" -> explodeOuter)
}
