package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import Exact._

/** ClickBench-"hits"-shaped queries over the denormalized events table
  * (reference: benchmark/hits/queries/, 43 queries over one wide
  * clickstream table). The shapes that matter at 100 TB: high-
  * cardinality group-by, count-distinct top-k, filtered funnels over a
  * LIKE'd string column, and time-bucketed traffic.
  */
object HitsQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // hits Q: top users by event volume + value
  private val topUsers = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
        .orderBy(col("n").desc, col("user_id"))
        .limit(10)
    },
    Some("""SELECT user_id, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""".stripMargin),
    headline = true)

  // hits Q: daily traffic with distinct users (dashboard shape)
  private val dailyTraffic = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("nu"))
        .filter(col("n") > 5)
        .orderBy(col("day"), col("event_type"))
    },
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day, event_type,
      |  count(*) AS n, count(DISTINCT user_id) AS nu
      |FROM events GROUP BY day, event_type
      |HAVING count(*) > 5
      |ORDER BY day, event_type""".stripMargin),
    headline = true)

  // hits Q: filtered search over the JSON props (string matching path)
  private val propsSearch = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .filter(col("props").like("%\"k\": 9%") && col("event_type") =!= "error")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(get_json_object(col("props"), "$.k")).as("distinct_k"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
      |  count(DISTINCT json_extract_string(props, '$.k')) AS distinct_k
      |FROM events
      |WHERE props LIKE '%"k": 9%' AND event_type <> 'error'
      |GROUP BY event_type ORDER BY event_type""".stripMargin))

  // hits Q: hour-of-day histogram by type (wide group-by + pivot shape)
  private val hourHistogram = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(hour(col("ts")).as("h"))
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("purchases"),
          round(avg(col("value")), 5).as("avg_value"))
        .orderBy(col("h"))
    },
    Some("""SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h, count(*) AS n,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchases,
      |  round(avg(value), 5) AS avg_value
      |FROM events GROUP BY h ORDER BY h""".stripMargin))

  // hits Q: per-user event-type diversity top-k (count distinct heavy)
  private val userDiversity = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("user_id"))
        .agg(countDistinct(col("event_type")).as("n_types"),
          max(col("ts")).as("last_seen"))
        .orderBy(col("n_types").desc, col("user_id"))
        .limit(25)
    },
    Some("""SELECT user_id, count(DISTINCT event_type) AS n_types,
      |  max(CAST(ts AS TIMESTAMP)) AS last_seen
      |FROM events GROUP BY user_id ORDER BY n_types DESC, user_id LIMIT 25""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "hits_top_users" -> topUsers,
    "hits_daily_traffic" -> dailyTraffic,
    "hits_props_search" -> propsSearch,
    "hits_hour_histogram" -> hourHistogram,
    "hits_user_diversity" -> userDiversity)
}
