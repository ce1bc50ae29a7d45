package graft.queries

import graft.{Q, QueryModule, Tables}
import graft.operators.AsofJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Join operator coverage (SURVEY.md §2.4): inner/left/right/full,
  * semi/anti, cross, null-aware NOT IN (mark join), scalar subqueries
  * (single join), range θ-join, ASOF join.
  *
  * Reference: databend JoinType
  * (src/query/sql/src/planner/plans/join.rs:48-76). Mark joins are
  * never exposed as an API — they are bound from SQL IN/EXISTS
  * (SURVEY §2.4), so those cases go through spark.sql and Catalyst's
  * ExistenceJoin, which is the Spark-native equivalent.
  */
object JoinQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  // -- inner ------------------------------------------------------------
  private val inner = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.join(x.customer, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // -- left outer (unmatched rows preserved, null-counted) --------------
  private val left = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val big = x.orders.filter(col("o_totalprice") > 250000.0)
      x.customer.join(big, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(
          countDistinct(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_big_orders"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_null_rows"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(DISTINCT c_custkey) AS n_cust,
      |  count(o_orderkey) AS n_big_orders,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey AND o_totalprice > 250000.0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // -- right outer ------------------------------------------------------
  private val right = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.filter(col("o_totalprice") > 250000.0)
        .join(x.customer, col("o_custkey") === col("c_custkey"), "right")
        .groupBy(col("c_mktsegment"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_unmatched"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      |FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_totalprice > 250000.0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // -- full outer -------------------------------------------------------
  private val full = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val ca = x.customer.filter(col("c_acctbal") > 4000.0)
        .groupBy(col("c_nationkey").as("nk_c")).agg(count(lit(1)).as("n_cust"))
      val sa = x.supplier.filter(col("s_acctbal") > 4000.0)
        .groupBy(col("s_nationkey").as("nk_s")).agg(count(lit(1)).as("n_supp"))
      ca.join(sa, col("nk_c") === col("nk_s"), "full")
        .select(
          coalesce(col("nk_c"), col("nk_s")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    },
    Some("""SELECT coalesce(nk_c, nk_s) AS nationkey,
      |  coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer WHERE c_acctbal > 4000.0 GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier WHERE s_acctbal > 4000.0 GROUP BY 1) s
      |ON nk_c = nk_s
      |ORDER BY nationkey""".stripMargin))

  // -- left semi (EXISTS) ----------------------------------------------
  private val semi = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.join(x.orders.filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  // -- left anti (NOT EXISTS) ------------------------------------------
  private val anti = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.join(x.orders.filter(col("o_totalprice") > 400000.0),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_cust"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  // -- cross ------------------------------------------------------------
  private val cross = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val r1 = x.region.select(col("r_name").as("r1"))
      val r2 = x.region.select(col("r_name").as("r2"))
      r1.crossJoin(r2).filter(col("r1") < col("r2")).orderBy(col("r1"), col("r2"))
    },
    Some("""SELECT a.r_name AS r1, b.r_name AS r2
      |FROM region a CROSS JOIN region b WHERE a.r_name < b.r_name
      |ORDER BY r1, r2""".stripMargin))

  // -- null-aware anti join: NOT IN over a subquery containing NULLs ----
  // Catalyst plans this as a null-aware anti join (mark-join semantics:
  // reference src/query/sql/src/planner/plans/join.rs:62-68). Any NULL
  // in the subquery makes NOT IN yield no rows — the count must be 0.
  private val notinNulls = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT count(*) AS n FROM customer
          |WHERE c_custkey NOT IN
          |  (SELECT CASE WHEN o_totalprice > 300000.0 THEN o_custkey END FROM orders)""".stripMargin)
    },
    Some("""SELECT count(*) AS n FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_totalprice > 300000.0 THEN o_custkey END FROM orders)""".stripMargin))

  // -- IN subquery (mark join, positive form) ---------------------------
  private val inSubq = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT c_nationkey, count(*) AS n_cust FROM customer
          |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
          |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
    },
    Some("""SELECT c_nationkey, count(*) AS n_cust FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  // -- correlated scalar subquery (single join) -------------------------
  private val scalarSubq = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT c_custkey,
          |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
          |  (SELECT CAST(coalesce(max(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
          |     FROM orders WHERE o_custkey = c_custkey) AS max_price_c
          |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin)
    },
    Some("""SELECT c_custkey,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT CAST(coalesce(max(CAST(round(o_totalprice * 100) AS BIGINT)), 0) AS BIGINT)
      |     FROM orders WHERE o_custkey = c_custkey) AS max_price_c
      |FROM customer ORDER BY c_custkey LIMIT 50""".stripMargin))

  // -- range θ-join against a VALUES band table -------------------------
  // ConstantTableScan (reference plans/constant_table_scan.rs) + banded
  // non-equi join; tiny build side => broadcast nested loop is the
  // right plan at any scale.
  private val range = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      import spark.implicits._
      val bands = Seq(
        ("low", 0.0, 100000.0),
        ("mid", 100000.0, 300000.0),
        ("high", 300000.0, 1e12)).toDF("band", "lo", "hi")
      x.orders.join(broadcast(bands),
          col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy(col("band"))
    },
    Some("""SELECT band, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders
      |JOIN (VALUES ('low', 0.0, 100000.0), ('mid', 100000.0, 300000.0), ('high', 300000.0, 1e12))
      |  b(band, lo, hi) ON o_totalprice >= lo AND o_totalprice < hi
      |GROUP BY band ORDER BY band""".stripMargin))

  // -- ASOF join: latest view event at-or-before each purchase ----------
  private val asof = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val purchases = x.events.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // unique (user, ts) on the right: keep max event_id per instant
      val views = x.events.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
        .agg(max(col("event_id")).as("v_id"))
      AsofJoin.leftAsof(
          purchases, views,
          leftKey = col("user_id"), rightKey = col("v_user"),
          leftTime = col("ts"), rightTime = col("v_ts"),
          rightPayload = Seq(col("v_ts") -> "last_view_ts", col("v_id") -> "last_view_id"))
        .drop("asof_matched")
        .orderBy(col("event_id"))
    },
    Some("""SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  (SELECT max(CAST(v.ts AS TIMESTAMP)) FROM events v
      |    WHERE v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts) AS last_view_ts,
      |  (SELECT max(v.event_id) FROM events v
      |    WHERE v.user_id = p.user_id AND v.event_type = 'view'
      |      AND CAST(v.ts AS TIMESTAMP) = (SELECT max(CAST(v2.ts AS TIMESTAMP)) FROM events v2
      |        WHERE v2.user_id = p.user_id AND v2.event_type = 'view' AND v2.ts <= p.ts)) AS last_view_id
      |FROM events p WHERE p.event_type = 'purchase'
      |ORDER BY p.event_id""".stripMargin))

  // ---- large-large interval self-join via time-bucketing --------------
  // The scale path for non-equi joins when NEITHER side broadcasts
  // (reference: IEJoin, physical_range_join.rs / ie_join_state.rs —
  // re-expressed as the bucketed-equi-join decomposition): bucket the
  // left side by a window of the join bound, replicate the right side
  // to its bucket ± 1, hash-join on (key, bucket), then apply the exact
  // interval predicate. Each pair matches exactly once; the pairwise
  // work is bounded per bucket instead of O(n^2) global.
  private val intervalBucket = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      val winUs = 7200L * 1000000L // 2 hours
      val e = x.events.select(col("event_id"), col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("tus"))
      val a = e.withColumn("bucket", floor(col("tus") / winUs))
        .select(col("bucket"), col("event_type"),
          col("event_id").as("id_a"), col("user_id").as("u_a"), col("tus").as("t_a"))
      val b = e
        .select(col("event_type"), col("event_id").as("id_b"), col("user_id").as("u_b"),
          col("tus").as("t_b"),
          explode(array(floor(col("tus") / winUs) - 1, floor(col("tus") / winUs),
            floor(col("tus") / winUs) + 1)).as("bucket"))
      a.join(b, Seq("event_type", "bucket"))
        .filter(col("id_a") < col("id_b") && col("u_a") =!= col("u_b") &&
          abs(col("t_a") - col("t_b")) <= winUs)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT a.event_type, count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.event_type = b.event_type
      | AND a.event_id < b.event_id
      | AND a.user_id <> b.user_id
      | AND abs(epoch_us(CAST(a.ts AS TIMESTAMP)) - epoch_us(CAST(b.ts AS TIMESTAMP))) <= 7200000000
      |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin),
    headline = true)

  override def queries: Seq[(String, Q)] = Seq(
    "join_interval_bucket" -> intervalBucket,
    "join_inner" -> inner,
    "join_left" -> left,
    "join_right" -> right,
    "join_full" -> full,
    "join_semi" -> semi,
    "join_anti" -> anti,
    "join_cross" -> cross,
    "join_notin_nulls" -> notinNulls,
    "join_in_subq" -> inSubq,
    "join_scalar_subq" -> scalarSubq,
    "join_range_bands" -> range.copy(headline = true),
    "join_asof" -> asof.copy(headline = true))
}
