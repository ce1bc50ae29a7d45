package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.functions.{FunnelIn, WindowFunnel}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream table: window_funnel,
  * retention (reference aggregates window_funnel/retention,
  * src/query/functions/src/aggregates/aggregator.rs:120,126), gap
  * sessionization, and tumbling-window time aggregation.
  */
object EventQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private val HourUs = 3600L * 1000000L

  // window_funnel(1h, view -> click -> purchase): distribution of max
  // funnel level per user. The oracle replicates the DP with running-max
  // window functions — identical semantics, pure SQL.
  private val funnel = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val step = when(col("event_type") === "view", 1)
        .when(col("event_type") === "click", 2)
        .when(col("event_type") === "purchase", 3)
        .otherwise(0)
      val funnelUdaf = udaf(new WindowFunnel(HourUs, 3))
      x.events
        .select(col("user_id"), unix_micros(col("ts")).as("tus"), step.as("step"))
        .groupBy(col("user_id"))
        .agg(funnelUdaf(col("tus"), col("step")).as("level"))
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("level"))
    },
    Some("""WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 ELSE 0 END AS step
      |  FROM events),
      |r1 AS (SELECT *, max(CASE WHEN step = 1 THEN tus END) OVER
      |  (PARTITION BY user_id ORDER BY tus, step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mv FROM e),
      |r2 AS (SELECT *, max(CASE WHEN step = 2 THEN mv END) OVER
      |  (PARTITION BY user_id ORDER BY tus, step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mvc FROM r1),
      |lvl AS (SELECT user_id, max(CASE
      |    WHEN step = 3 AND mvc IS NOT NULL AND mvc >= tus - 3600000000 THEN 3
      |    WHEN step = 2 AND mv IS NOT NULL AND mv >= tus - 3600000000 THEN 2
      |    WHEN step = 1 THEN 1 ELSE 0 END) AS level
      |  FROM r2 GROUP BY user_id)
      |SELECT level, count(*) AS n_users FROM lvl GROUP BY level ORDER BY level""".stripMargin),
    headline = true)

  // retention(signup, view, purchase): per-user condition flags, summed.
  private val retention = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val per = x.events.groupBy(col("user_id")).agg(
        max(when(col("event_type") === "signup", 1).otherwise(0)).as("r1"),
        max(when(col("event_type") === "view", 1).otherwise(0)).as("c2"),
        max(when(col("event_type") === "purchase", 1).otherwise(0)).as("c3"))
      per.agg(
        sum(col("r1")).cast("long").as("n_signup"),
        sum(col("r1") * col("c2")).cast("long").as("n_signup_view"),
        sum(col("r1") * col("c3")).cast("long").as("n_signup_purchase"))
    },
    Some("""WITH per AS (
      |  SELECT user_id,
      |    max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
      |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2,
      |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c3
      |  FROM events GROUP BY user_id)
      |SELECT CAST(sum(r1) AS BIGINT) AS n_signup,
      |  CAST(sum(r1 * c2) AS BIGINT) AS n_signup_view,
      |  CAST(sum(r1 * c3) AS BIGINT) AS n_signup_purchase
      |FROM per""".stripMargin))

  // gap-based sessionization (30 min): layered window functions —
  // lag -> new-session flag -> running sum = session id.
  private val sessionize = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val byTs = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
      val e = x.events.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
      val flagged = e.withColumn("prev", lag(col("tus"), 1).over(byTs))
        .withColumn("new_s",
          when(col("prev").isNull || col("tus") - col("prev") > 30L * 60 * 1000000, 1L).otherwise(0L))
      val sessions = flagged
        .withColumn("sid", sum(col("new_s")).over(
          byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(count(lit(1)).as("n_ev"))
      sessions.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"), max(col("n_ev")).as("max_sess_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH e AS (
      |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tus FROM events),
      |d AS (SELECT *, lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) AS prev FROM e),
      |f AS (SELECT *, CASE WHEN prev IS NULL OR tus - prev > 1800000000 THEN 1 ELSE 0 END AS new_s FROM d),
      |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY tus, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
      |per AS (SELECT user_id, sid, count(*) AS n_ev FROM s GROUP BY user_id, sid)
      |SELECT user_id, count(*) AS n_sessions, CAST(max(n_ev) AS BIGINT) AS max_sess_events
      |FROM per GROUP BY user_id ORDER BY user_id""".stripMargin),
    headline = true)

  // tumbling 1-day window aggregation (Structured-Streaming-shaped,
  // run in batch): window(ts, '1 day') == date_trunc('day').
  private val tumbling = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(Exact.cents(col("value"))).as("sum_value_c"))
        .select(col("window.start").as("day_start"), col("event_type"), col("n"), col("sum_value_c"))
        .orderBy(col("day_start"), col("event_type"))
    },
    Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day_start, event_type,
      |  count(*) AS n, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
      |FROM events GROUP BY day_start, event_type ORDER BY day_start, event_type""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "evt_window_funnel" -> funnel,
    "evt_retention" -> retention,
    "evt_sessionize" -> sessionize,
    "evt_tumbling_day" -> tumbling)
}
