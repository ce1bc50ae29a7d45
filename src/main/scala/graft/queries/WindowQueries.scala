package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Exact._

/** Window function coverage (SURVEY.md §2.6; reference WindowFuncType,
  * src/query/sql/src/planner/plans/window.rs:672-681): ranking, offset
  * (lag/lead/nth_value), frames (rows / range), aggregates over
  * windows, and the top-n-per-group pattern the reference optimizes
  * with partial-top-n exchanges — Spark's WindowGroupLimit does the
  * same when rank filters follow a window.
  */
object WindowQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private val ranking = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_custkey"))
      x.customer.filter(col("c_custkey") < 300)
        .select(
          col("c_nationkey"), col("c_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          round(percent_rank().over(w), 8).as("prk"),
          round(cume_dist().over(w), 8).as("cd"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },
    Some("""SELECT c_nationkey, c_custkey,
      |  row_number() OVER w AS rn,
      |  rank() OVER w AS rk,
      |  dense_rank() OVER w AS drk,
      |  round(percent_rank() OVER w, 8) AS prk,
      |  round(cume_dist() OVER w, 8) AS cd,
      |  ntile(4) OVER w AS quartile
      |FROM customer WHERE c_custkey < 300
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_custkey)
      |ORDER BY c_nationkey, c_custkey""".stripMargin))

  // rank vs dense_rank with real ties (order key has duplicates)
  private val rankTies = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(round(col("o_totalprice") / 100000).cast("long"))
      x.orders.filter(col("o_orderkey") < 500)
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },
    Some("""SELECT o_orderstatus, o_orderkey,
      |  rank() OVER w AS rk, dense_rank() OVER w AS drk
      |FROM orders WHERE o_orderkey < 500
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY CAST(round(o_totalprice / 100000) AS BIGINT))
      |ORDER BY o_orderstatus, o_orderkey""".stripMargin))

  private val offsets = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      x.events.filter(col("user_id") < 20)
        .select(
          col("user_id"), col("event_id"),
          lag(col("event_type"), 1).over(w).as("prev_type"),
          lead(col("event_type"), 1, "none").over(w).as("next_type"),
          lag(cents(col("value")), 2, 0L).over(w).as("prev2_value_c"),
          first(col("event_id")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("first_id"),
          nth_value(col("event_id"), 3).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("third_id"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
      |  lag(event_type, 1) OVER w AS prev_type,
      |  lead(event_type, 1, 'none') OVER w AS next_type,
      |  lag(CAST(round(value * 100) AS BIGINT), 2, 0) OVER w AS prev2_value_c,
      |  first_value(event_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_id,
      |  nth_value(event_id, 3) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_id
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, event_id""".stripMargin))

  private val frames = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      x.orders.filter(col("o_custkey") < 100)
        .select(
          col("o_custkey"), col("o_orderkey"),
          sum(cents(col("o_totalprice"))).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("running_c"),
          sum(cents(col("o_totalprice"))).over(
            w.rowsBetween(-2, Window.currentRow)).as("last3_c"),
          count(lit(1)).over(
            w.rowsBetween(Window.currentRow, Window.unboundedFollowing)).as("remaining"),
          sum(cents(col("o_totalprice"))).over(
            Window.partitionBy(col("o_custkey"))).as("cust_total_c"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_c,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS last3_c,
      |  count(*) OVER (w ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS remaining,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (PARTITION BY o_custkey) AS BIGINT) AS cust_total_c
      |FROM orders WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin))

  // RANGE frame over a numeric ordering
  private val rangeFrame = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val qty = round(col("l_quantity")).cast("long")
      val w = Window.partitionBy(col("l_returnflag")).orderBy(qty)
      x.lineitem.filter(col("l_orderkey") < 200)
        .select(
          col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          qty.as("qty"),
          count(lit(1)).over(w.rangeBetween(-5, 0)).as("n_within5"))
        .orderBy(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"))
    },
    Some("""SELECT l_returnflag, l_orderkey, l_linenumber,
      |  CAST(round(l_quantity) AS BIGINT) AS qty,
      |  count(*) OVER (PARTITION BY l_returnflag ORDER BY CAST(round(l_quantity) AS BIGINT)
      |    RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS n_within5
      |FROM lineitem WHERE l_orderkey < 200
      |ORDER BY l_returnflag, l_orderkey, l_linenumber""".stripMargin))

  // top-n per group: rank + filter (Spark plans WindowGroupLimit)
  private val topnPerGroup = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      x.orders
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 && col("o_custkey") < 50)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), cents(col("o_totalprice")).as("price_c"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 3 AND o_custkey < 50
      |ORDER BY o_custkey, rn""".stripMargin),
    headline = true)

  override def queries: Seq[(String, Q)] = Seq(
    "win_ranking" -> ranking,
    "win_rank_ties" -> rankTies,
    "win_offsets" -> offsets,
    "win_frames" -> frames,
    "win_range_frame" -> rangeFrame,
    "win_topn_per_group" -> topnPerGroup)
}
