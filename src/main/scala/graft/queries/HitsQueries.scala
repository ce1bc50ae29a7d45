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

  /** events ingested ONCE into a graft-managed table with `$.k`
    * declared as a virtual column (reference: fuse virtual columns) —
    * the dogfooding path for hits_top_props: the hot JSON key is
    * materialized at write, so the aggregate reads a narrow stored
    * column with parquet stats instead of parsing `props` per row.
    * Idempotent per sf dir, same pattern as Tpcds.ensure.
    */
  private def eventsVc(spark: SparkSession, dir: String): graft.sources.GraftTable =
    HitsQueries.synchronized {
      val path = s"/tmp/graft_stage/${new java.io.File(dir).getName}/events_vc"
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
      val tbl = graft.sources.GraftTable.open(spark, path)
      if (tbl.currentVersion < 0) {
        tbl.setVirtualColumns("props", Seq("$.k"))
        tbl.append(t(spark, dir).events)
      }
      tbl
    }

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

  // hits Q0-2 shape: whole-table scan stats (count/sum/avg/min/max)
  private val scanStats = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("nu"),
        sum(cents(col("value"))).as("value_c"),
        round(avg(col("value")), 5).as("avg_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
    },
    Some("""SELECT count(*) AS n, count(DISTINCT user_id) AS nu,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
      |  round(avg(value), 5) AS avg_value,
      |  min(CAST(ts AS TIMESTAMP)) AS first_ts,
      |  max(CAST(ts AS TIMESTAMP)) AS last_ts
      |FROM events""".stripMargin))

  // hits quantile shape: per-type value percentiles (exact interpolated,
  // distributed sort — see operators.Quantiles scaladoc)
  private val valueQuantiles = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      graft.operators.Quantiles.cont(x.events,
          Seq("event_type"), "value",
          Seq(0.5, 0.9, 0.99), Seq("p50r", "p90r", "p99r"))
        .select(col("event_type"),
          round(col("p50r"), 5).as("p50"),
          round(col("p90r"), 5).as("p90"),
          round(col("p99r"), 5).as("p99"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      |  round(quantile_cont(value, 0.5), 5) AS p50,
      |  round(quantile_cont(value, 0.9), 5) AS p90,
      |  round(quantile_cont(value, 0.99), 5) AS p99
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin),
    headline = true)

  // hits top-k URL shape: high-cardinality group-by on an extracted key.
  // The JSON path is declared as a VIRTUAL COLUMN on the ingested table,
  // so VirtualColumnRule rewrites get_json_object to the stored column
  // and the scan never reads `props` (PlanSpec pins both properties) —
  // the round-5 per-row-JSON-in-the-hot-aggregate shape is gone.
  private val topProps = Q(
    (spark, dir) => {
      eventsVc(spark, dir).read()
        .withColumn("k", get_json_object(col("props"), "$.k"))
        .filter(col("k").isNotNull)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("nu"))
        .orderBy(col("n").desc, col("k"))
        .limit(20)
    },
    Some("""SELECT json_extract_string(props, '$.k') AS k, count(*) AS n,
      |  count(DISTINCT user_id) AS nu
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |GROUP BY k ORDER BY n DESC, k LIMIT 20""".stripMargin),
    headline = true)

  // hits argMin/argMax shape: first and last event type per user
  // (databend arg_min/arg_max — reference:
  //  src/query/functions/src/aggregates/aggregator.rs:84-85)
  private val firstLast = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("user_id"))
        .agg(
          min_by(col("event_type"), col("ts")).as("first_type"),
          max_by(col("event_type"), col("ts")).as("last_type"),
          count(lit(1)).as("n"))
        .filter(col("n") >= 10)
        .orderBy(col("user_id"))
    },
    // (user_id, ts) is unique in the synthetic data, so ts alone is a
    // deterministic ordering key for arg_min/arg_max.
    Some("""SELECT user_id,
      |  arg_min(event_type, CAST(ts AS TIMESTAMP)) AS first_type,
      |  arg_max(event_type, CAST(ts AS TIMESTAMP)) AS last_type,
      |  count(*) AS n
      |FROM events GROUP BY user_id HAVING count(*) >= 10
      |ORDER BY user_id""".stripMargin))

  // hits share-of-total shape: per-type share via window over aggregate
  private val typeShare = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = t(spark, dir)
      x.events.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_pct",
          round(col("n") * 100.0 / sum(col("n")).over(Window.partitionBy()), 4))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
      |  round(count(*) * 100.0 / sum(count(*)) OVER (), 4) AS share_pct
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // hits WoW shape: weekly active users + lag delta (window over agg)
  private val weeklyActive = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = t(spark, dir)
      x.events
        .groupBy(date_trunc("week", col("ts")).as("wk"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .withColumn("prev_wau", lag(col("wau"), 1).over(Window.orderBy(col("wk"))))
        .withColumn("delta", col("wau") - coalesce(col("prev_wau"), lit(0L)))
        .orderBy(col("wk"))
    },
    Some("""SELECT wk, wau,
      |  lag(wau, 1) OVER (ORDER BY wk) AS prev_wau,
      |  wau - coalesce(lag(wau, 1) OVER (ORDER BY wk), 0) AS delta
      |FROM (
      |  SELECT date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk,
      |    count(DISTINCT user_id) AS wau
      |  FROM events GROUP BY wk)
      |ORDER BY wk""".stripMargin))

  // hits regexp shape: extract digits from the JSON text by regex
  private val regexpExtract = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .withColumn("kv", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int"))
        .filter(col("kv").isNotNull)
        .groupBy((col("kv") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("value_c"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CAST(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) % 10 AS INT) AS bucket,
      |  count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
      |FROM events
      |WHERE regexp_extract(props, '"k": (\d+)', 1) IS NOT NULL
      |GROUP BY bucket ORDER BY bucket""".stripMargin))

  // hits gap shape: median inter-event gap per heavy user (lag + agg)
  private val interEventGap = Q(
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val x = t(spark, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      x.events
        .withColumn("gap_us",
          unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
        .filter(col("gap_us").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_gaps"),
          round(expr("percentile(gap_us, 0.5)"), 2).as("median_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .filter(col("n_gaps") >= 20)
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, count(*) AS n_gaps,
      |  round(quantile_cont(gap_us, 0.5), 2) AS median_gap_us,
      |  max(gap_us) AS max_gap_us
      |FROM (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |              OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
      |  FROM events)
      |WHERE gap_us IS NOT NULL
      |GROUP BY user_id HAVING count(*) >= 20
      |ORDER BY user_id""".stripMargin),
    headline = true)

  // hits LIKE shape: pattern-filtered counts (ClickBench URL LIKE)
  private val likeCounts = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .agg(
          sum(when(col("props").like("%\"k\": 1%"), 1L).otherwise(0L)).as("k1x"),
          sum(when(col("props").like("%\"k\": 42%"), 1L).otherwise(0L)).as("k42"),
          sum(when(col("event_type").like("p%"), 1L).otherwise(0L)).as("p_types"))
    },
    Some("""SELECT
      |  CAST(sum(CASE WHEN props LIKE '%"k": 1%' THEN 1 ELSE 0 END) AS BIGINT) AS k1x,
      |  CAST(sum(CASE WHEN props LIKE '%"k": 42%' THEN 1 ELSE 0 END) AS BIGINT) AS k42,
      |  CAST(sum(CASE WHEN event_type LIKE 'p%' THEN 1 ELSE 0 END) AS BIGINT) AS p_types
      |FROM events""".stripMargin))

  // hits multi-key top-k: (type, hour) cells ranked by volume
  private val twoKeyTopk = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(col("event_type"), hour(col("ts")).as("h"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("event_type"), col("h"))
        .limit(10)
    },
    Some("""SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS INT) AS h, count(*) AS n
      |FROM events GROUP BY event_type, h
      |ORDER BY n DESC, event_type, h LIMIT 10""".stripMargin))

  // hits behavior shape: users who both viewed and purchased
  private val usersWithBoth = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("has_view"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("has_purchase"))
        .filter(col("has_view") === 1 && col("has_purchase") === 1)
        .agg(count(lit(1)).as("n_users"))
    },
    Some("""SELECT count(*) AS n_users FROM (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp
      |  FROM events GROUP BY user_id)
      |WHERE hv = 1 AND hp = 1""".stripMargin))

  // hits histogram shape: fixed-width value buckets
  private val valueHistogram = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(least(floor(col("value") / 100.0), lit(9L)).as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("value")), 5).as("avg_v"))
        .orderBy(col("bucket"))
    },
    Some("""SELECT CAST(least(floor(value / 100.0), 9) AS BIGINT) AS bucket,
      |  count(*) AS n, round(avg(value), 5) AS avg_v
      |FROM events GROUP BY bucket ORDER BY bucket""".stripMargin))

  // hits rollup shape: month x type distinct users with subtotals
  private val monthRollup = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .rollup(date_trunc("month", col("ts")).as("m"), col("event_type"))
        .agg(countDistinct(col("user_id")).as("nu"))
        .orderBy(col("m").asc_nulls_first, col("event_type").asc_nulls_first)
    },
    Some("""SELECT date_trunc('month', CAST(ts AS TIMESTAMP)) AS m, event_type,
      |  count(DISTINCT user_id) AS nu
      |FROM events GROUP BY ROLLUP(m, event_type)
      |ORDER BY m NULLS FIRST, event_type NULLS FIRST""".stripMargin))

  // hits raw-fetch shape (ClickBench Q24-ish): latest events, no agg —
  // a fused TakeOrderedAndProject, not a global sort
  private val latestRows = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .orderBy(col("ts").desc, col("event_id"))
        .limit(10)
    },
    Some("""SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value
      |FROM events WHERE event_type = 'purchase'
      |ORDER BY ts DESC, event_id LIMIT 10""".stripMargin))

  // hits minute-grain shape (ClickBench Q18-ish): per (user, minute)
  // event counts — very high-cardinality group-by, top-k
  private val userMinute = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(col("user_id"), date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)
        .orderBy(col("n").desc, col("user_id"), col("m"))
        .limit(20)
    },
    Some("""SELECT user_id, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS m,
      |  count(*) AS n
      |FROM events GROUP BY user_id, m HAVING count(*) > 1
      |ORDER BY n DESC, user_id, m LIMIT 20""".stripMargin))

  // hits wide conditional-agg shape (ClickBench Q30-ish): one pass,
  // many filtered sums — partial aggregation keeps it single-shuffle
  private val wideCondAgg = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      def slot(h0: Int, h1: Int) =
        sum(when(hour(col("ts")).between(h0, h1), cents(col("value"))).otherwise(0L))
      x.events.groupBy(col("event_type"))
        .agg(
          slot(0, 5).as("night_c"), slot(6, 11).as("morning_c"),
          slot(12, 17).as("afternoon_c"), slot(18, 23).as("evening_c"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type,
      |  CAST(sum(CASE WHEN hour(CAST(ts AS TIMESTAMP)) BETWEEN 0 AND 5 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS night_c,
      |  CAST(sum(CASE WHEN hour(CAST(ts AS TIMESTAMP)) BETWEEN 6 AND 11 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS morning_c,
      |  CAST(sum(CASE WHEN hour(CAST(ts AS TIMESTAMP)) BETWEEN 12 AND 17 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS afternoon_c,
      |  CAST(sum(CASE WHEN hour(CAST(ts AS TIMESTAMP)) BETWEEN 18 AND 23 THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS evening_c,
      |  count(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // hits pagination shape (ClickBench Q38/39-ish): LIMIT + OFFSET over
  // a ranked aggregate (offset pushes into the fused top-n)
  private val pagination = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("user_id"))
        .offset(50)
        .limit(10)
    },
    Some("""SELECT user_id, count(*) AS n FROM events GROUP BY user_id
      |ORDER BY n DESC, user_id LIMIT 10 OFFSET 50""".stripMargin))

  // hits distinct-user ranking (ClickBench Q8-ish): types by reach
  private val typeReach = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("nu"))
        .orderBy(col("nu").desc, col("event_type"))
    },
    Some("""SELECT event_type, count(DISTINCT user_id) AS nu
      |FROM events GROUP BY event_type ORDER BY nu DESC, event_type""".stripMargin))

  // hits normalize-then-group shape (ClickBench Q28-ish): strip the
  // numbers out of props, group by the pattern skeleton
  private val patternGroup = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(regexp_replace(col("props"), "\\d+", "#").as("skeleton"))
        .agg(count(lit(1)).as("n"), min(length(col("props"))).as("min_len"))
        .orderBy(col("n").desc, col("skeleton"))
        .limit(5)
    },
    Some("""SELECT regexp_replace(props, '\d+', '#', 'g') AS skeleton,
      |  count(*) AS n, CAST(min(length(props)) AS INT) AS min_len
      |FROM events GROUP BY skeleton ORDER BY n DESC, skeleton LIMIT 5""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "hits_latest_rows" -> latestRows,
    "hits_user_minute" -> userMinute,
    "hits_wide_cond_agg" -> wideCondAgg,
    "hits_pagination" -> pagination,
    "hits_type_reach" -> typeReach,
    "hits_pattern_group" -> patternGroup,
    "hits_like_counts" -> likeCounts,
    "hits_two_key_topk" -> twoKeyTopk,
    "hits_users_with_both" -> usersWithBoth,
    "hits_value_histogram" -> valueHistogram,
    "hits_month_rollup" -> monthRollup,
    "hits_top_users" -> topUsers,
    "hits_daily_traffic" -> dailyTraffic,
    "hits_props_search" -> propsSearch,
    "hits_hour_histogram" -> hourHistogram,
    "hits_user_diversity" -> userDiversity,
    "hits_scan_stats" -> scanStats,
    "hits_value_quantiles" -> valueQuantiles,
    "hits_top_props" -> topProps,
    "hits_first_last" -> firstLast,
    "hits_type_share" -> typeShare,
    "hits_weekly_active" -> weeklyActive,
    "hits_regexp_extract" -> regexpExtract,
    "hits_inter_event_gap" -> interEventGap)
}
