package graft.queries

import graft.{Q, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Exact._

/** Aggregate function coverage (SURVEY.md §2.5; reference registrations
  * src/query/functions/src/aggregates/aggregator.rs:73-187): basic,
  * arg-min/max, boolean, statistical, quantile, distinct, conditional,
  * collection, grouping sets / rollup / cube, histogram/mode, approx.
  *
  * Statistical moments use small-magnitude columns (quantity, discount)
  * so double rounding at 5-6 decimals is stable across engines; money
  * sums use exact integer cents (Exact).
  */
object AggQueries extends QueryModule {

  private def t(spark: SparkSession, dir: String) = Tables(spark, dir)

  private val basic = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.events.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(cents(col("value"))).as("sum_value_c"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"),
          round(avg(col("value")), 5).as("avg_value"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
      |  min(value) AS min_value, max(value) AS max_value,
      |  round(avg(value), 5) AS avg_value,
      |  count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))

  // arg_min/arg_max (reference aggregator.rs:84-85) -> min_by/max_by.
  // Ordering value is the unique key so ties cannot occur.
  private val minmaxBy = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.groupBy(col("c_nationkey"))
        .agg(
          max_by(col("c_name"), col("c_custkey")).as("latest_cust"),
          min_by(col("c_name"), col("c_custkey")).as("first_cust"),
          max_by(col("c_custkey"), col("c_acctbal")).as("richest_key"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey,
      |  max_by(c_name, c_custkey) AS latest_cust,
      |  min_by(c_name, c_custkey) AS first_cust,
      |  max_by(c_custkey, c_acctbal) AS richest_key
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  private val bool = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.customer.groupBy(col("c_nationkey"))
        .agg(
          bool_and(col("c_acctbal") > 0.0).as("all_positive"),
          bool_or(col("c_acctbal") > 9000.0).as("any_rich"),
          sum(when(col("c_acctbal") < 0.0, 1L).otherwise(0L)).as("n_negative"))
        .orderBy(col("c_nationkey"))
    },
    Some("""SELECT c_nationkey,
      |  bool_and(c_acctbal > 0.0) AS all_positive,
      |  bool_or(c_acctbal > 9000.0) AS any_rich,
      |  CAST(sum(CASE WHEN c_acctbal < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin))

  private val stats = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty"),
          round(var_pop(col("l_quantity")), 6).as("varp_qty"),
          round(covar_samp(col("l_quantity"), col("l_discount")), 8).as("cov_qd"),
          round(covar_pop(col("l_quantity"), col("l_discount")), 8).as("covp_qd"),
          round(corr(col("l_quantity"), col("l_discount")), 8).as("corr_qd"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      |  round(stddev_samp(l_quantity), 6) AS sd_qty,
      |  round(stddev_pop(l_quantity), 6) AS sdp_qty,
      |  round(var_samp(l_quantity), 6) AS var_qty,
      |  round(var_pop(l_quantity), 6) AS varp_qty,
      |  round(covar_samp(l_quantity, l_discount), 8) AS cov_qd,
      |  round(covar_pop(l_quantity, l_discount), 8) AS covp_qd,
      |  round(corr(l_quantity, l_discount), 8) AS corr_qd
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // Spark skewness/kurtosis are population moments (g1, g2-3); DuckDB's
  // named fns are sample-adjusted, so the oracle recomputes Spark's
  // definition from raw moments.
  private val skewKurt = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem
        .agg(
          round(skewness(col("l_quantity")), 6).as("skew_qty"),
          round(kurtosis(col("l_quantity")), 6).as("kurt_qty"))
    },
    Some("""WITH m AS (SELECT avg(l_quantity) AS mu FROM lineitem),
      |mom AS (SELECT
      |    avg(pow(l_quantity - mu, 2)) AS m2,
      |    avg(pow(l_quantity - mu, 3)) AS m3,
      |    avg(pow(l_quantity - mu, 4)) AS m4
      |  FROM lineitem, m)
      |SELECT round(m3 / pow(m2, 1.5), 6) AS skew_qty,
      |       round(m4 / (m2 * m2) - 3.0, 6) AS kurt_qty
      |FROM mom""".stripMargin))

  private val quantiles = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      // distributed sort-based exact quantiles (operators.Quantiles):
      // Spark's built-in `percentile` merges per-group value maps on a
      // single reducer — for the ~all-distinct price column that map is
      // the whole column. The sort-based plan stays distributed.
      //
      // ONE pass for both measures (round-13, guide §2.4): tag each
      // measure with stack() and group by (l_linestatus, tag) instead
      // of running the whole dedup+sort pipeline once per column and
      // joining — per-group quantiles are unchanged because each
      // (group, tag) slice holds exactly the rows of one measure.
      val tagged = x.lineitem.selectExpr("l_linestatus",
        "stack(2, 'q', CAST(l_quantity AS DOUBLE), 'p', CAST(l_extendedprice AS DOUBLE)) AS (which, v)")
      val qr = graft.operators.Quantiles.cont(tagged,
        Seq("l_linestatus", "which"), "v",
        Seq(0.25, 0.5, 0.75, 0.9), Seq("q25r", "q50r", "q75r", "p90r"))
      qr.groupBy(col("l_linestatus"))
        .agg(
          min(when(col("which") === "q", col("q25r"))).as("q25m"),
          min(when(col("which") === "q", col("q50r"))).as("q50m"),
          min(when(col("which") === "q", col("q75r"))).as("q75m"),
          min(when(col("which") === "p", col("p90r"))).as("p90m"))
        .select(col("l_linestatus"),
          round(col("q25m"), 6).as("q25"),
          round(col("q50m"), 6).as("q50"),
          round(col("q75m"), 6).as("q75"),
          round(col("p90m"), 4).as("p90_price"),
          round(col("q50m"), 6).as("med_qty"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS q25,
      |  round(quantile_cont(l_quantity, 0.5), 6) AS q50,
      |  round(quantile_cont(l_quantity, 0.75), 6) AS q75,
      |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
      |  round(median(l_quantity), 6) AS med_qty
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  private val distinctAgg = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("nd_supp"),
          countDistinct(col("l_partkey"), col("l_suppkey")).as("nd_ps"),
          sum_distinct(round(col("l_quantity")).cast("long")).as("sum_d_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS nd_supp,
      |  count(DISTINCT (l_partkey, l_suppkey)) AS nd_ps,
      |  CAST(sum(DISTINCT CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_d_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // _if combinator (reference aggregator.rs:194) == filtered aggregation
  private val condAgg = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.groupBy(col("o_orderstatus"))
        .agg(
          expr("count_if(o_totalprice > 200000.0)").as("n_big"),
          sum(when(col("o_orderpriority") === "1-URGENT", cents(col("o_totalprice"))).otherwise(0L)).as("urgent_c"),
          round(avg(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))), 4).as("urgent_avg"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      |  count(*) FILTER (WHERE o_totalprice > 200000.0) AS n_big,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS urgent_c,
      |  round(avg(o_totalprice) FILTER (WHERE o_orderpriority = '1-URGENT'), 4) AS urgent_avg
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  // array_agg / string_agg (reference aggregator.rs:127-144); sorted for
  // deterministic cross-engine comparison
  private val collect = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      // arrays serialized to JSON text: the harness compares cell
      // values via pandas, which cannot sort/hash raw array cells
      x.nation.groupBy(col("n_regionkey"))
        .agg(
          to_json(array_sort(collect_list(col("n_name")))).as("nations"),
          concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations_csv"),
          count(lit(1)).as("n"))
        .orderBy(col("n_regionkey"))
    },
    Some("""SELECT n_regionkey,
      |  CAST(to_json(list_sort(list(n_name))) AS VARCHAR) AS nations,
      |  string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin))

  private val groupingSets = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.registerAll()
      spark.sql(
        """SELECT n_name, c_mktsegment, count(*) AS n,
          |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
          |FROM customer JOIN nation ON c_nationkey = n_nationkey
          |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
          |ORDER BY n_name, c_mktsegment""".stripMargin)
    },
    Some("""SELECT n_name, c_mktsegment, count(*) AS n,
      |  CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_c
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (c_mktsegment), ())
      |ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin))

  private val rollup = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("total_c"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  private val cube = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.orders.cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"), col("o_orderpriority"))
    },
    Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin))

  private val mode_ = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.groupBy(col("l_linestatus"))
        .agg(
          expr("mode(l_returnflag)").as("mode_flag"),
          expr("mode(cast(round(l_quantity) as bigint))").as("mode_qty"))
        .orderBy(col("l_linestatus"))
    },
    Some("""SELECT l_linestatus, mode(l_returnflag) AS mode_flag,
      |  mode(CAST(round(l_quantity) AS BIGINT)) AS mode_qty
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin))

  // approx sketches don't hash-match another engine — rows-only check
  private val approx = Q(
    (spark, dir) => {
      val x = t(spark, dir)
      x.lineitem.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_med"),
          expr("any_value(l_suppkey)").as("any_supp"),
          to_json(expr("histogram_numeric(l_quantity, 5)")).as("hist"))
        .orderBy(col("l_returnflag"))
    },
    None)

  // round-6 aggregate name surface (aggregator.rs spellings registered
  // in GraftFunctions): sum0, quantile_disc/quantile/quantile_cont —
  // gated against DuckDB's identically-named aggregates
  private val nameSpellings = Q(
    (spark, dir) => {
      graft.functions.GraftFunctions.register(spark)
      val x = t(spark, dir)
      x.lineitem.groupBy(col("l_returnflag"))
        .agg(
          expr("CAST(sum0(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)").as("sum0_qty_c"),
          expr("quantile_disc(l_quantity, 0.5)").as("qd50"),
          expr("quantile_disc(l_quantity, 0.95)").as("qd95"),
          expr("round(quantile_cont(l_quantity, 0.25), 6)").as("qc25"),
          expr("round(std(l_quantity), 6)").as("std_pop_qty"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      |  CAST(coalesce(sum(CAST(round(l_quantity * 100) AS BIGINT)), 0) AS BIGINT) AS sum0_qty_c,
      |  quantile_disc(l_quantity, 0.5) AS qd50,
      |  quantile_disc(l_quantity, 0.95) AS qd95,
      |  round(quantile_cont(l_quantity, 0.25), 6) AS qc25,
      |  round(stddev_pop(l_quantity), 6) AS std_pop_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  override def queries: Seq[(String, Q)] = Seq(
    "agg_basic" -> basic.copy(headline = true),
    "agg_minmax_by" -> minmaxBy,
    "agg_bool" -> bool,
    "agg_stats" -> stats,
    "agg_skew_kurt" -> skewKurt,
    "agg_quantiles" -> quantiles.copy(headline = true),
    "agg_distinct" -> distinctAgg,
    "agg_cond" -> condAgg,
    "agg_collect" -> collect,
    "agg_grouping_sets" -> groupingSets,
    "agg_rollup" -> rollup,
    "agg_cube" -> cube,
    "agg_mode" -> mode_,
    "agg_approx" -> approx,
    "agg_name_spellings" -> nameSpellings)
}
